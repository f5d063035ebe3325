"""Advection scheme tests: reconstruction exactness/order, upwinding
direction, conservation (reference analogue: test/test_advection_schemes.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import Centered, UpwindBiased, WENO, div_Uc
from oceananigans_tpu.advection.reconstruction import (eno_coefficients,
                                                       optimal_weights,
                                                       smoothness_factors)
from oceananigans_tpu.fields import CenterField, XFaceField
from oceananigans_tpu.boundary_conditions import (
    fill_halo_regions, regularize_field_boundary_conditions)


def grid1d(n):
    return RectilinearGrid(size=(n, 1, 1), x=(0, 1), y=None, z=None,
                           topology=("periodic", "flat", "flat"), halo=6)


def test_known_coefficients():
    assert eno_coefficients(3, 2) == (1/3, -7/6, 11/6)
    assert eno_coefficients(3, 1) == (-1/6, 5/6, 1/3)
    assert optimal_weights(3) == (0.3, 0.6, 0.1)
    assert optimal_weights(2) == (2/3, 1/3)
    # Balsara-Shu WENO-9 weights (reference weno_interpolants.jl C★ WENO{5})
    g5 = optimal_weights(5)
    assert np.allclose(g5, (5/126, 20/63, 10/21, 10/63, 1/126))


def test_smoothness_factors_match_jiang_shu():
    f = smoothness_factors(3, 2)
    rng = np.random.default_rng(3)
    for _ in range(5):
        a = rng.normal(size=3)
        beta = sum(np.dot(w, a) ** 2 for w in f)
        ref = (13/12 * (a[0] - 2*a[1] + a[2])**2
               + 0.25 * (a[0] - 4*a[1] + 3*a[2])**2)
        assert np.isclose(beta, ref)


@pytest.mark.parametrize("scheme,tol_order", [
    (Centered(2), 2), (Centered(4), 4),
    (UpwindBiased(3), 3), (UpwindBiased(5), 5),
    (WENO(5, smoothness_dtype=jnp.float64), 5),
    (WENO(7, smoothness_dtype=jnp.float64), 7),
])
def test_reconstruction_convergence_order(scheme, tol_order):
    errs = []
    ns = (16, 32)
    for n in ns:
        g = grid1d(n)
        # the schemes reconstruct FACE POINT VALUES from CELL AVERAGES
        # (finite-volume reconstruction, as in the reference's Balsara-Shu
        # coefficients) — so feed exact cell averages of sin(2πx)
        dx = 1.0 / n
        k = 2 * np.pi

        def cell_avg(x, y, z, dx=dx, k=k):
            return (jnp.cos(k * (x - dx / 2)) - jnp.cos(k * (x + dx / 2))) / (k * dx)

        c = CenterField(g).set(cell_avg)
        if isinstance(scheme, Centered):
            rec = scheme.symmetric(g, c.data, 0, 0)
        else:
            rec = scheme.biased(g, c.data, 0, 0, "left")
        xf = g.coord_padded(0, "f").reshape(-1, 1, 1)
        exact = np.sin(2 * np.pi * xf) * np.ones(g.padded_shape)
        errs.append(float(np.max(np.abs(g.interior(rec) - g.interior(exact)))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > tol_order - 0.7, (errs, rate)


def test_weno_nonoscillatory_step():
    # WENO reconstruction of a step must not overshoot significantly
    g = grid1d(32)
    c = CenterField(g).set(lambda x, y, z: jnp.where(x < 0.5, 1.0, 0.0))
    w = WENO(5)
    rec = w.biased(g, c.data, 0, 0, "left")
    vals = np.asarray(g.interior(rec))
    assert vals.max() < 1.0 + 1e-6
    assert vals.min() > -1e-6


def test_upwind_direction_sensitivity():
    # advecting a tracer bump with u > 0 must use upstream cells
    g = RectilinearGrid(size=(32, 1, 1), x=(0, 1), y=None, z=None,
                        topology=("periodic", "flat", "flat"), halo=3)
    c = CenterField(g).set(lambda x, y, z: jnp.exp(-100 * (x - 0.5) ** 2))
    u = XFaceField(g).set(1.0)
    tend = -div_Uc(g, UpwindBiased(3), u.data, jnp.zeros_like(u.data),
                   jnp.zeros_like(u.data), c.data)
    # with u>0, tendency is positive downstream of the bump (x>0.5)
    xc = g.xnodes("c")
    t = np.asarray(g.interior(tend))[:, 0, 0]
    i_peak = np.argmax(np.asarray(g.interior(c.data))[:, 0, 0])
    assert t[i_peak + 1] > 0       # bump moves right
    assert t[i_peak - 1] < 0


def test_tracer_advection_conservation():
    # periodic advection conserves the tracer integral exactly
    g = RectilinearGrid(size=(16, 16, 1), x=(0, 1), y=(0, 1), z=None,
                        topology=("periodic", "periodic", "flat"), halo=3)
    rng = np.random.default_rng(7)
    c = CenterField(g).set(rng.normal(size=(16, 16, 1)))
    u = XFaceField(g).set(lambda x, y, z: jnp.sin(2 * jnp.pi * y))
    from oceananigans_tpu.fields import YFaceField
    v = YFaceField(g).set(lambda x, y, z: jnp.cos(2 * jnp.pi * x))
    for scheme in (Centered(2), UpwindBiased(3), WENO(5)):
        G = div_Uc(g, scheme, u.data, v.data, jnp.zeros_like(c.data), c.data)
        tot = float(jnp.sum(g.interior(G)))
        assert abs(tot) < 1e-10, (scheme, tot)


def test_advection_translation_accuracy():
    # step a Gaussian one revolution with RK4 (hand-rolled) and Centered(2):
    # it should come back close to itself
    g = RectilinearGrid(size=(64, 1, 1), x=(0, 1), y=None, z=None,
                        topology=("periodic", "flat", "flat"), halo=3)
    c0 = CenterField(g).set(lambda x, y, z: jnp.exp(-200 * (x - 0.5) ** 2))
    u = XFaceField(g).set(1.0)
    zero = jnp.zeros_like(u.data)
    bcs = regularize_field_boundary_conditions(None, g, ("c", "c", "c"))
    scheme = WENO(5, smoothness_dtype=jnp.float64)

    @jax.jit
    def rhs(c):
        c = fill_halo_regions(c, g, ("c", "c", "c"), bcs)
        return -div_Uc(g, scheme, u.data, zero, zero, c)

    @jax.jit
    def rk4_step(c, dt):
        k1 = rhs(c)
        k2 = rhs(c + 0.5 * dt * k1)
        k3 = rhs(c + 0.5 * dt * k2)
        k4 = rhs(c + dt * k3)
        return c + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    dt = 0.5 * (1 / 64)
    n = int(round(1.0 / dt))
    c = c0.data
    for _ in range(n):
        c = rk4_step(c, dt)
    err = np.max(np.abs(np.asarray(g.interior(c) - g.interior(c0.data))))
    assert err < 0.05, err


def test_adapt_advection_order():
    """Reference: src/Advection/adapt_advection_order.jl — schemes shrink to
    fit grids with fewer points than the stencil buffer."""
    from oceananigans_tpu.advection import (FluxFormAdvection, WENO,
                                            adapt_advection_order)
    from oceananigans_tpu import RectilinearGrid

    grid = RectilinearGrid(size=(64, 64, 2), extent=(1, 1, 1))
    adapted = adapt_advection_order(WENO(9), grid)
    assert isinstance(adapted, FluxFormAdvection)
    assert adapted.schemes[0].order == 9
    assert adapted.schemes[2].order == 3      # Nz=2 -> WENO(3)

    big = RectilinearGrid(size=(64, 64, 64), extent=(1, 1, 1))
    same = adapt_advection_order(WENO(9), big)
    assert same.order == 9 and not isinstance(same, FluxFormAdvection)


def test_bounds_preserving_weno_tracer():
    """WENO(bounds=(0,1)) keeps a step-function tracer inside its bounds
    (reference: bounds_preserving_tracer_advection_operators.jl); plain WENO
    overshoots."""
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu import RectilinearGrid

    def run(scheme):
        grid = RectilinearGrid(size=(64,), extent=(1.0,),
                               topology=("periodic", "flat", "flat"))
        m = NonhydrostaticModel(grid=grid, advection=scheme, tracers=("c",))
        m.set(u=1.0, c=lambda x, y, z: np.where((x > 0.25) & (x < 0.5), 1.0, 0.0),
              enforce_incompressibility=False)
        for _ in range(100):
            m.time_step(1e-3)
        return np.asarray(m.field("c").interior)

    c_plain = run(WENO(5))
    c_lim = run(WENO(5, bounds=(0.0, 1.0)))
    eps = 1e-10
    assert c_lim.min() >= -eps and c_lim.max() <= 1 + eps, \
        (c_lim.min(), c_lim.max())
    # limiter must not destroy the profile
    assert abs(c_lim.sum() - c_plain.sum()) < 1e-6  # conservative
    assert c_lim.max() > 0.9


def test_stretched_grid_reconstruction_exact():
    """On stretched axes the schemes automatically use exact nonuniform ENO
    coefficients (reference analogue: grid-aware tables of
    reconstruction_coefficients.jl): cell-average reconstructions of a degree
    ≤ k-1 polynomial are exact at the faces."""
    from oceananigans_tpu import RectilinearGrid

    N = 32
    zf = -1.0 + (np.linspace(0, 1, N + 1)) ** 2.2
    grid = RectilinearGrid(size=(4, 4, N), x=(0, 1), y=(0, 1), z=zf,
                           halo=(3, 3, 3))
    polys = {
        2: (lambda z: 1.0 + 2 * z + 3 * z ** 2,
            lambda z: z + z ** 2 + z ** 3),
        3: (lambda z: 1.0 + 2 * z + 3 * z ** 2 + 0.5 * z ** 3,
            lambda z: z + z ** 2 + z ** 3 + 0.125 * z ** 4),
    }
    h = grid.H[2]
    zf_pad = np.asarray(grid.coord_padded(2, "f"))
    zf_all = np.append(zf_pad, zf_pad[-1] + (zf_pad[-1] - zf_pad[-2]))

    for scheme, deg in ((UpwindBiased(3), 2),
                        (WENO(5, smoothness_dtype=jnp.float64), 2),
                        (Centered(4), 3)):
        f, F = polys[deg]
        avg = (F(zf_all[1:]) - F(zf_all[:-1])) / (zf_all[1:] - zf_all[:-1])
        a = jnp.asarray(np.broadcast_to(avg[None, None, :],
                                        grid.padded_shape).copy())
        l, r = scheme.biased_pair(grid, a, 2, 0)
        want = f(zf_pad)
        ii = slice(h + 3, h + N - 3)
        assert np.abs(np.asarray(l)[2, 2, ii] - want[ii]).max() < 1e-12
        assert np.abs(np.asarray(r)[2, 2, ii] - want[ii]).max() < 1e-12
        # biased_by must agree with the explicit two-sided select
        q = jnp.asarray(np.random.default_rng(0).standard_normal(
            grid.padded_shape))
        got = np.asarray(scheme.biased_by(grid, a, 2, 0, q))
        sel = np.where(np.asarray(q) > 0, np.asarray(l), np.asarray(r))
        assert np.abs(got - sel)[grid.interior_slices].max() < 1e-14


def test_bounds_preserved_under_flux_form_wrapping():
    """Bounds survive FluxFormAdvection wrapping (round-5 review finding:
    adapt_advection_order wraps per-axis schemes in FluxFormAdvection,
    which silently dropped the limiter from div_Uc's dispatch)."""
    from oceananigans_tpu.advection.schemes import FluxFormAdvection
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu import RectilinearGrid

    ff = FluxFormAdvection(WENO(5, bounds=(0.0, 1.0)))
    assert ff.bounds == (0.0, 1.0)

    grid = RectilinearGrid(size=(64,), extent=(1.0,),
                           topology=("periodic", "flat", "flat"))
    m = NonhydrostaticModel(grid=grid, advection=ff, tracers=("c",))
    m.set(u=1.0, c=lambda x, y, z: np.where((x > 0.25) & (x < 0.5),
                                            1.0, 0.0),
          enforce_incompressibility=False)
    for _ in range(100):
        m.time_step(1e-3)
    c = np.asarray(m.field("c").interior)
    eps = 1e-10
    assert c.min() >= -eps and c.max() <= 1 + eps, (c.min(), c.max())

    import pytest as _pytest
    with _pytest.raises(ValueError, match="different bounds"):
        FluxFormAdvection(WENO(5, bounds=(0.0, 1.0)),
                          WENO(5, bounds=(0.0, 2.0)))


def test_vector_invariant_energy_scheme_vorticity_zero_work():
    """The EnergyConserving vorticity flux of the vector-invariant form does
    no net work (Sadourny): sum(u*adv_u*dV) + sum(v*adv_v*dV) = 0 on a
    doubly periodic domain (reference: vector_invariant_advection.jl
    EnergyConserving vorticity scheme). The enstrophy form does not share
    the property pointwise."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.advection.vector_invariant import VectorInvariant
    from oceananigans_tpu.boundary_conditions import (
        fill_halo_regions, regularize_field_boundary_conditions)
    from oceananigans_tpu.grids.topology import LOC_CFC, LOC_FCC

    grid = RectilinearGrid(size=(16, 12, 4), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=("periodic", "periodic", "bounded"))
    rng = np.random.default_rng(3)

    def mk(loc):
        bcs = regularize_field_boundary_conditions(None, grid, loc)
        a = jnp.asarray(rng.standard_normal(grid.padded_shape))
        return fill_halo_regions(a, grid, loc, bcs)

    u, v = mk(LOC_FCC), mk(LOC_CFC)
    ii = grid.interior_slices
    wu = jnp.broadcast_to(jnp.asarray(grid.dx(LOC_FCC) * grid.dy(LOC_FCC)),
                          u.shape)
    wv = jnp.broadcast_to(jnp.asarray(grid.dx(LOC_CFC) * grid.dy(LOC_CFC)),
                          v.shape)

    def work(scheme):
        vi = VectorInvariant(vorticity_scheme=scheme)
        au, av = vi._horizontal(grid, u, v)
        # _horizontal returns the ADVECTIVE terms (tendency = -adv)
        w = float(jnp.sum((u * au * wu)[ii]) + jnp.sum((v * av * wv)[ii]))
        s = float(jnp.sum(jnp.abs(u * au * wu)[ii])
                  + jnp.sum(jnp.abs(v * av * wv)[ii]))
        return abs(w) / s

    assert work("energy_conserving") < 1e-6
    assert work("enstrophy_conserving") > 1e-5


def test_momentum_and_tracer_flux_form_telescoping():
    """Flux-form advection conserves the advected quantity exactly on a
    periodic domain: sum(div_Uc * V) = 0 and sum(div_Uu * V_fcc) = 0 to
    roundoff for ANY velocity field (the finite-volume telescoping the
    reference's flux operators guarantee, momentum_advection_operators.jl /
    tracer_advection_operators.jl)."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.advection import WENO, Centered, UpwindBiased
    from oceananigans_tpu.advection.fluxes import div_Uc, div_Uu, div_Uv
    from oceananigans_tpu.boundary_conditions import (
        fill_halo_regions, regularize_field_boundary_conditions)
    from oceananigans_tpu.grids.topology import LOC_CCC, LOC_CFC, LOC_FCC

    grid = RectilinearGrid(size=(12, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "periodic"))
    rng = np.random.default_rng(11)

    def mk(loc):
        bcs = regularize_field_boundary_conditions(None, grid, loc)
        a = jnp.asarray(rng.standard_normal(grid.padded_shape))
        return fill_halo_regions(a, grid, loc, bcs)

    u, v, w = mk(LOC_FCC), mk(LOC_CFC), mk(("c", "c", "f"))
    c = mk(LOC_CCC)
    ii = grid.interior_slices
    for scheme in (Centered(2), Centered(4), UpwindBiased(3), WENO(5)):
        Vc = jnp.asarray(grid.V(LOC_CCC))
        tot = float(jnp.sum((div_Uc(grid, scheme, u, v, w, c) * Vc)[ii]))
        mag = float(jnp.sum(jnp.abs(div_Uc(grid, scheme, u, v, w, c)
                                    * Vc)[ii]))
        assert abs(tot) / mag < 1e-6, (type(scheme).__name__, "tracer")
        Vu = jnp.asarray(grid.V(LOC_FCC))
        tu = float(jnp.sum((div_Uu(grid, scheme, u, v, w) * Vu)[ii]))
        mu = float(jnp.sum(jnp.abs(div_Uu(grid, scheme, u, v, w) * Vu)[ii]))
        assert abs(tu) / mu < 1e-6, (type(scheme).__name__, "u-momentum")
        Vv = jnp.asarray(grid.V(LOC_CFC))
        tv = float(jnp.sum((div_Uv(grid, scheme, u, v, w) * Vv)[ii]))
        mv = float(jnp.sum(jnp.abs(div_Uv(grid, scheme, u, v, w) * Vv)[ii]))
        assert abs(tv) / mv < 1e-6, (type(scheme).__name__, "v-momentum")

"""Split-explicit barotropic solver unit tests (reference analogues:
test/test_split_explicit_free_surface_solver.jl — one-substep gradient,
multi-substep standing gravity wave, averaging sanity — and
test/test_split_explicit_vertical_integrals.jl — depth integrals and the
barotropic corrector).  Round-4 additions guard the wet-column gating of
the corrector on immersed grids (dry columns must receive NO 1/H-scaled
increment) and wall/coast impermeability through the subcycle."""

import numpy as np
import pytest
import jax.numpy as jnp

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.boundary_conditions.boundary_condition import (
    regularize_field_boundary_conditions)
from oceananigans_tpu.boundary_conditions.fill_halos import fill_halo_axes
from oceananigans_tpu.grids.topology import LOC_CCC, LOC_CFC, LOC_FCC
from oceananigans_tpu.models.free_surfaces import SplitExplicitFreeSurface


def _setup(nx=128, ny=4, lx=2 * np.pi, ly=1.0):
    grid = RectilinearGrid(size=(nx, ny), x=(0.0, lx), y=(0.0, ly),
                           topology=("periodic", "periodic", "flat"),
                           dtype=jnp.float64)
    bcs = {loc: regularize_field_boundary_conditions(None, grid, loc)
           for loc in (LOC_CCC, LOC_FCC, LOC_CFC)}
    fills = (lambda a: fill_halo_axes(a, grid, LOC_CCC, bcs[LOC_CCC],
                                      0.0, (0, 1)),
             lambda a: fill_halo_axes(a, grid, LOC_FCC, bcs[LOC_FCC],
                                      0.0, (0, 1)),
             lambda a: fill_halo_axes(a, grid, LOC_CFC, bcs[LOC_CFC],
                                      0.0, (0, 1)))
    shape2 = (grid.padded_shape[0], grid.padded_shape[1], 1)
    h = grid.H
    x_c = np.asarray(grid.coord_padded(0, "c"))
    x_f = np.asarray(grid.coord_padded(0, "f"))
    return grid, fills, shape2, h, x_c, x_f


def test_one_substep_is_the_fv_gradient():
    """One substep from rest with η₀ = sin x and H = g = 1 must produce
    exactly U = −Δτ ∂x η = −Δτ cos x at the faces (reference: the
    'One timestep test')."""
    grid, (fe, fu, fv), shape2, H, x_c, x_f = _setup()
    fs = SplitExplicitFreeSurface(gravitational_acceleration=1.0,
                                  substeps=2)
    eta0 = np.zeros(shape2)
    eta0[:, :, 0] = np.sin(x_c)[:, None]
    eta0 = fe(jnp.asarray(eta0))
    Z = jnp.zeros(shape2)
    dtau = 0.01
    eta_f, U_f, V_f = fs.substep(
        grid, 1.0, 1.0, eta0, Z, Z, Z, Z, jnp.asarray(1.0),
        fe, fu, fv, frac=dtau, weights=np.array([1.0]))
    nx, ny = grid.N[0], grid.N[1]
    U = np.asarray(U_f)[H[0]:H[0] + nx, H[1]:H[1] + ny, 0]
    U_exact = -dtau * np.cos(x_f[H[0]:H[0] + nx])[:, None]
    # the discrete gradient of sin x differs from cos x at O(Δx²)
    assert np.abs(U - U_exact).max() < dtau * 1e-3


@pytest.mark.slow
def test_standing_gravity_wave_returns_after_one_period():
    """η₀ = sin x, U₀ = 0, c = √(gH) = 1: the standing wave returns to its
    initial state after T = 2π (reference: the 'Multi-timestep test').
    Weights put all mass on the LAST substep so the 'filtered' return is
    the raw final state."""
    grid, (fe, fu, fv), shape2, H, x_c, x_f = _setup(nx=128)
    fs = SplitExplicitFreeSurface(gravitational_acceleration=1.0,
                                  substeps=2)
    T = 2 * np.pi
    dtau = 2 * np.pi / 128 * 5e-2
    nt = int(np.floor(T / dtau))
    eta0 = np.zeros(shape2)
    eta0[:, :, 0] = np.sin(x_c)[:, None]
    eta = fe(jnp.asarray(eta0))
    Z = jnp.zeros(shape2)
    w = np.zeros(nt)
    w[-1] = 1.0
    eta_f, U_f, V_f = fs.substep(
        grid, 1.0, 1.0, eta, Z, Z, Z, Z, jnp.asarray(1.0),
        fe, fu, fv, frac=dtau, weights=w)
    # advance the remaining fraction in one extra substep
    rem = T - nt * dtau
    eta_f, U_f, V_f = fs.substep(
        grid, 1.0, 1.0, fe(eta_f), fu(U_f), fv(V_f), Z, Z,
        jnp.asarray(1.0), fe, fu, fv, frac=rem, weights=np.array([1.0]))
    nx, ny = grid.N[0], grid.N[1]
    sl = (slice(H[0], H[0] + nx), slice(H[1], H[1] + ny), 0)
    eta_err = np.abs(np.asarray(eta_f)[sl]
                     - np.asarray(eta0)[sl]).max()
    U_err = np.abs(np.asarray(U_f)[sl]).max()
    assert eta_err < 2e-3, eta_err
    assert U_err < 2e-3, U_err


def test_zero_state_does_nothing_and_weights_average():
    """From rest with flat η the subcycle is exactly a no-op, and the
    filtered η of a CONSTANT η field equals it times Σw (reference: the
    'Averaging / Do Nothing test')."""
    grid, (fe, fu, fv), shape2, H, x_c, x_f = _setup(nx=32)
    fs = SplitExplicitFreeSurface(gravitational_acceleration=1.0,
                                  substeps=2)
    const = 0.3
    eta = fe(jnp.full(shape2, const))
    Z = jnp.zeros(shape2)
    w = np.array([0.25, 0.25, 0.25, 0.25])
    eta_f, U_f, V_f = fs.substep(
        grid, 1.0, 1.0, eta, Z, Z, Z, Z, jnp.asarray(1.0),
        fe, fu, fv, frac=0.05, weights=w)
    nx, ny = grid.N[0], grid.N[1]
    sl = (slice(H[0], H[0] + nx), slice(H[1], H[1] + ny), 0)
    # interior only: the outermost pad slot of U holds a stale value from
    # the final (post-fill) substep update reading the zero-padded shift —
    # halos are a cache refreshed at the next fill, as everywhere else
    assert np.allclose(np.asarray(eta_f)[sl], const)
    assert np.abs(np.asarray(U_f)[sl]).max() == 0.0
    assert np.abs(np.asarray(V_f)[sl]).max() == 0.0


def test_subcycle_conserves_volume_on_periodic_grid():
    """Σ η Az is invariant under the η ← η − Δτ∇·U update on a periodic
    grid for ANY U (telescoping flux divergence)."""
    grid, (fe, fu, fv), shape2, H, x_c, x_f = _setup(nx=64, ny=8)
    fs = SplitExplicitFreeSurface(gravitational_acceleration=1.0,
                                  substeps=2)
    rng = np.random.default_rng(7)
    eta = fe(jnp.asarray(rng.normal(size=shape2)))
    U0 = fu(jnp.asarray(rng.normal(size=shape2)))
    V0 = fv(jnp.asarray(rng.normal(size=shape2)))
    GU = fu(jnp.asarray(rng.normal(size=shape2))) * 0.1
    GV = fv(jnp.asarray(rng.normal(size=shape2))) * 0.1
    w = np.zeros(20)
    w[-1] = 1.0
    eta_f, _, _ = fs.substep(
        grid, 1.0, 1.0, eta, U0, V0, GU, GV, jnp.asarray(1.0),
        fe, fu, fv, frac=0.01, weights=w)
    nx, ny = grid.N[0], grid.N[1]
    sl = (slice(H[0], H[0] + nx), slice(H[1], H[1] + ny), 0)
    before = float(np.sum(np.asarray(eta)[sl]))
    after = float(np.sum(np.asarray(eta_f)[sl]))
    assert abs(after - before) < 1e-10 * max(1.0, abs(before))


# -- model-level pieces: depth integrals + wet-gated corrector ---------------


def _immersed_model():
    from oceananigans_tpu import (GridFittedBottom, ImmersedBoundaryGrid)
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel)

    grid = RectilinearGrid(size=(16, 8, 8), extent=(1.0, 0.5, 1.0),
                           topology=("periodic", "bounded", "bounded"),
                           dtype=jnp.float64)
    # a ridge plus a fully-dry (land) column band
    def bottom(x, y):
        x = np.asarray(x, float)
        y = np.asarray(y, float)
        depth = np.full(np.broadcast_shapes(x.shape, y.shape), -1.0)
        depth = np.where((np.abs(x - 0.5) < 0.15), -0.4, depth)   # ridge
        depth = np.where((np.abs(x - 0.85) < 0.05), 0.2, depth)   # land
        return depth

    ibg = ImmersedBoundaryGrid(grid, GridFittedBottom(bottom))
    from oceananigans_tpu.models.free_surfaces import SplitExplicitFreeSurface
    m = HydrostaticFreeSurfaceModel(
        grid=ibg, tracers=(),
        free_surface=SplitExplicitFreeSurface(substeps=8))
    return m, ibg


def test_depth_integral_matches_fluid_sum():
    """∫u dz over the fluid column equals the mask-weighted Δz sum
    (reference: test_split_explicit_vertical_integrals.jl)."""
    m, ibg = _immersed_model()
    grid = m.grid
    h, n = grid.H[2], grid.N[2]
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=grid.padded_shape))
    U = np.asarray(m._depth_integral(u, LOC_FCC))
    dz = 1.0 / 8.0
    fluid = np.asarray(m._fluid_int[LOC_FCC])
    expect = (np.asarray(u)[:, :, h:h + n] * fluid * dz).sum(2,
                                                             keepdims=True)
    assert np.allclose(U, expect, atol=1e-12)


def test_corrector_sets_depth_mean_and_gates_dry_columns():
    """After the corrector, the fluid-column depth mean of u equals
    U_f / H on wet columns — and DRY columns receive exactly zero
    increment (the round-4 wet-gate: dividing halo transports by the
    1e-12-clamped land depth planted O(1e10) garbage in pad slots)."""
    m, ibg = _immersed_model()
    grid = m.grid
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=grid.padded_shape))
    v = jnp.asarray(rng.normal(size=grid.padded_shape))
    shape2 = (grid.padded_shape[0], grid.padded_shape[1], 1)
    U_f = jnp.asarray(rng.normal(size=shape2))
    V_f = jnp.asarray(rng.normal(size=shape2))
    u2, v2 = m._barotropic_corrector(u, v, U_f, V_f)

    wet = np.asarray(m._wet_fc)[:, :, 0] > 0
    H_fc = np.broadcast_to(np.asarray(m._H_fc, float),
                           shape2)[:, :, 0]
    # wet columns: depth integral of corrected u == U_f
    U2 = np.asarray(m._depth_integral(u2, LOC_FCC))[:, :, 0]
    assert np.allclose(U2[wet], np.asarray(U_f)[:, :, 0][wet], atol=1e-10)
    # dry columns: u unchanged everywhere in the column (no 1/H garbage)
    du = np.abs(np.asarray(u2) - np.asarray(u))
    assert du[~wet].max() == 0.0
    # and nothing anywhere blew past the physically-possible increment
    assert np.abs(np.asarray(u2)).max() < np.abs(np.asarray(u)).max() \
        + np.abs(np.asarray(U_f)).max() / H_fc[wet].min() + 1.0


def test_coastal_faces_stay_impermeable_through_a_step():
    """Time-stepping the immersed model from a sloshing η: the barotropic
    transports on solid (coast) faces stay exactly zero and the interior
    stays bounded — no flux leaks into land columns."""
    m, ibg = _immersed_model()
    grid = m.grid
    h = grid.H
    nx, ny = grid.N[0], grid.N[1]

    def eta0(x, y, z):
        return 0.01 * np.cos(2 * np.pi * x)

    m.set(eta=eta0)
    for _ in range(5):
        m.time_step(0.005)
    U = np.asarray(m.state["barotropic"]["U"])
    wet = np.asarray(m._wet_fc)[:, :, 0] > 0
    solid_cols = ~wet[h[0]:h[0] + nx, h[1]:h[1] + ny]
    Ui = U[h[0]:h[0] + nx, h[1]:h[1] + ny, 0]
    # solid faces carry the 1e-12-clamped depth, so their −gH∂η update is
    # O(1e-14) per step rather than exactly zero — bounded, not growing
    assert np.abs(Ui[solid_cols]).max() < 1e-9
    u = np.asarray(m.field("u").interior)
    eta = np.asarray(m.field("eta").interior)
    assert np.isfinite(u).all() and np.abs(u).max() < 1.0
    assert np.abs(eta).max() < 0.1


def test_substep_scan_path_matches_unrolled():
    """Above _UNROLL_LIMIT the barotropic subcycle runs as a chunked
    lax.scan (compile time O(K) instead of O(M) — round-5 review finding:
    FixedTimeStepSize can demand hundreds of substeps); the scan path must
    reproduce the unrolled path exactly."""
    import oceananigans_tpu.models.free_surfaces as fsmod
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)

    def run():
        grid = RectilinearGrid(size=(16, 8, 4), x=(0, 1e4), y=(0, 5e3),
                               z=(-100.0, 0.0),
                               topology=("periodic", "periodic", "bounded"))
        m = HydrostaticFreeSurfaceModel(
            grid=grid, free_surface=SplitExplicitFreeSurface(substeps=80),
            tracers=())
        m.set(eta=lambda x, y, z: 0.2 * jnp.sin(2 * jnp.pi * x / 1e4),
              u=0.05)
        for _ in range(3):
            m.time_step(20.0)
        return {k: np.asarray(v) for k, v in m.state["fields"].items()}

    saved = fsmod._UNROLL_LIMIT
    try:
        fsmod._UNROLL_LIMIT = 1000        # force full unroll
        ref = run()
        fsmod._UNROLL_LIMIT = 8           # force the chunked scan
        scan = run()
    finally:
        fsmod._UNROLL_LIMIT = saved
    for k in ref:
        assert np.allclose(ref[k], scan[k], atol=1e-12), \
            (k, np.abs(ref[k] - scan[k]).max())

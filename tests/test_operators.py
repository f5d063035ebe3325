"""Stencil micro-operator tests (reference analogue: test/test_operators.jl):
exact finite-volume identities on small grids."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.fields import CenterField, XFaceField, YFaceField, ZFaceField
from oceananigans_tpu.operators import (dx_c, dx_f, ix_c, ix_f, ddx, ddz,
                                        div_ccc, laplacian_ccc, zeta3_ffc)
from oceananigans_tpu.boundary_conditions import fill_halo_regions

CCC = ("c", "c", "c")
FCC = ("f", "c", "c")


def periodic_grid(n=8):
    return RectilinearGrid(size=(n, n, n), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                           z=(0, 2 * np.pi),
                           topology=("periodic", "periodic", "periodic"))


def test_difference_interp_exactness_linear():
    # δ and ℑ are exact for linear functions of the coordinate (3x is not
    # periodic, so skip the wrap-affected first interior row along x)
    g = periodic_grid()
    f = CenterField(g).set(lambda x, y, z: 3.0 * x)
    d = dx_f(g, f.data)
    assert np.allclose(g.interior(d)[1:], 3.0 * g.dx(CCC))
    interp = ix_f(g, f.data)
    xf = g.coord_padded(0, "f")[g.H[0]:g.H[0] + g.N[0]]
    assert np.allclose(g.interior(interp)[1:],
                       np.broadcast_to(3.0 * xf[:, None, None], (8, 8, 8))[1:])


def test_derivative_spectral_accuracy_sin():
    # second-order convergence of ∂x on sin(x)
    errs = []
    for n in (16, 32, 64):
        g = periodic_grid(n)
        c = CenterField(g).set(lambda x, y, z: jnp.sin(x))
        d = ddx(g, c.data, FCC)
        xf = g.coord_padded(0, "f").reshape(-1, 1, 1)
        exact = np.cos(xf) * np.ones(g.padded_shape)
        err = np.max(np.abs(g.interior(d) - g.interior(exact)))
        errs.append(err)
    rates = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert np.all(rates > 1.9)


def test_divergence_of_curl_is_zero():
    # u = ∂y ψ, v = -∂x ψ has zero discrete divergence on the C grid
    g = periodic_grid(16)
    psi = CenterField(g, None).set(
        lambda x, y, z: jnp.sin(x) * jnp.cos(y))  # at cell centers ≈ ψ at ffc?
    # Build u, v from a streamfunction at (f,f,c) so staggering is exact:
    xf = g.coord_padded(0, "f").reshape(-1, 1, 1)
    yf = g.coord_padded(1, "f").reshape(1, -1, 1)
    zc = g.coord_padded(2, "c").reshape(1, 1, -1)
    psi_ffc = jnp.sin(xf) * jnp.cos(yf) * jnp.ones_like(zc)
    from oceananigans_tpu.operators.shifts import shift
    # u(fcc)[j] = (ψ[j+1]-ψ[j])/Δy ; v(cfc)[i] = -(ψ[i+1]-ψ[i])/Δx
    dy = g.dy(CCC)
    dx = g.dx(CCC)
    u = (shift(psi_ffc, 1, 1) - psi_ffc) / dy
    v = -(shift(psi_ffc, 1, 0) - psi_ffc) / dx
    w = jnp.zeros_like(u)
    # refresh halos (periodic)
    from oceananigans_tpu.boundary_conditions.boundary_condition import (
        FieldBoundaryConditions, regularize_field_boundary_conditions)
    bcs_u = regularize_field_boundary_conditions(None, g, ("f", "c", "c"))
    bcs_v = regularize_field_boundary_conditions(None, g, ("c", "f", "c"))
    u = fill_halo_regions(u, g, ("f", "c", "c"), bcs_u)
    v = fill_halo_regions(v, g, ("c", "f", "c"), bcs_v)
    d = div_ccc(g, u, v, w)
    assert np.max(np.abs(g.interior(d))) < 1e-12


def test_laplacian_eigenfunction():
    # ∇² of sin(x) should converge to -sin(x) at 2nd order
    errs = []
    for n in (16, 32):
        g = periodic_grid(n)
        c = CenterField(g).set(lambda x, y, z: jnp.sin(x))
        lap = laplacian_ccc(g, c.data)
        xc = g.coord_padded(0, "c").reshape(-1, 1, 1)
        exact = -np.sin(xc) * np.ones(g.padded_shape)
        errs.append(np.max(np.abs(g.interior(lap) - g.interior(exact))))
    assert errs[1] < errs[0] / 3.5


def test_vorticity_solid_body_rotation():
    # u = -y, v = x → ζ = 2 exactly
    g = periodic_grid(8)
    yc = g.coord_padded(1, "c").reshape(1, -1, 1)
    xc = g.coord_padded(0, "c").reshape(-1, 1, 1)
    ones = jnp.ones(g.padded_shape)
    u = -yc * ones
    v = xc * ones
    z = zeta3_ffc(g, u, v)
    assert np.allclose(g.interior(z), 2.0)


def test_flat_direction_ops_are_zero():
    g = RectilinearGrid(size=(8, 8), x=(0, 1), y=(0, 1),
                        topology=("periodic", "periodic", "flat"))
    c = CenterField(g).set(lambda x, y, z: x * y)
    from oceananigans_tpu.operators import dz_f, iz_f
    assert np.allclose(dz_f(g, c.data), 0.0)
    assert np.allclose(iz_f(g, c.data), c.data)


def test_computed_field_status_caching():
    """ComputedField re-evaluates only when the time stamp changes
    (reference: computed_field.jl status caching)."""
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.abstract_operations import ComputedField
    from oceananigans_tpu.fields import CenterField

    grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1))
    f = CenterField(grid)

    calls = []

    class CountingOp:
        def __init__(self):
            self.grid, self.loc = grid, ("c", "c", "c")

        def compute(self):
            calls.append(1)
            return f

    cf = ComputedField(CountingOp())
    cf.compute(1.0)
    cf.compute(1.0)
    cf.compute(1.0)
    assert len(calls) == 1
    cf.compute(2.0)
    assert len(calls) == 2
    cf.compute()          # no stamp -> always recompute
    cf.compute()
    assert len(calls) == 4

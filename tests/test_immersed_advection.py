"""Advection over immersed boundaries (reference analogue:
test/test_immersed_advection.jl — interpolation near solid cells stays
exact for constant fields, and advecting a constant tracer over
topography keeps it exactly constant)."""

import numpy as np
import pytest
import jax.numpy as jnp

from oceananigans_tpu import (GridFittedBottom, ImmersedBoundaryGrid,
                              RectilinearGrid)
from oceananigans_tpu.advection import WENO, Centered, UpwindBiased
from oceananigans_tpu.models import NonhydrostaticModel

pytestmark = pytest.mark.slow  # full-tier study/equivalence battery (see README testing tiers)


def _bump_grid(nz=16):
    grid = RectilinearGrid(size=(32, 8, nz), extent=(2.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"),
                           dtype=jnp.float64)
    return ImmersedBoundaryGrid(
        grid, GridFittedBottom(
            lambda x, y: -1.0 + 0.5 * np.exp(-((np.asarray(x) - 1.0) ** 2)
                                             / 0.05)))


@pytest.mark.parametrize("scheme", [Centered(2), UpwindBiased(3), WENO(5)],
                         ids=["centered2", "upwind3", "weno5"])
def test_constant_tracer_stays_constant_over_topography(scheme):
    """Flux-form advection of c ≡ 1 must be exactly ∇·u, which the
    projection zeroes INCLUDING at immersed faces — so c stays exactly 1
    in every fluid cell through flow over a bump (reference:
    test_immersed_advection.jl's max/min/mean ≈ 1 assertions)."""
    ibg = _bump_grid()
    rng = np.random.default_rng(0)
    m = NonhydrostaticModel(grid=ibg, advection=scheme, tracers=("c",))
    m.set(u=0.1 * rng.standard_normal((32, 8, 16)),
          v=0.05 * rng.standard_normal((32, 8, 16)),
          c=1.0)
    for _ in range(10):
        m.time_step(0.01)
    c = m.field("c")
    fluid = np.asarray(ibg.fluid_mask(("c", "c", "c"),
                                      jnp.float64))[
        ibg.H[0]:ibg.H[0] + 32, ibg.H[1]:ibg.H[1] + 8,
        ibg.H[2]:ibg.H[2] + 16] > 0
    ci = np.asarray(c.interior)
    # constancy up to the CG-Poisson tolerance: the projection's residual
    # divergence (reltol ~1e-7 on immersed grids) feeds -c div(u) directly
    # (the reference's @test ... ≈ 1.0 is the same isapprox-scale bound)
    assert np.abs(ci[fluid] - 1.0).max() < 1e-7
    # the immersed-aware reductions see 1 at the same tolerance
    assert np.isclose(float(c.max()), 1.0, atol=1e-7)
    assert np.isclose(float(c.mean()), 1.0, atol=1e-7)


def test_tracer_integral_conserved_over_topography():
    """Σ c·V over fluid cells is invariant under flux-form advection with
    impenetrable immersed boundaries (fluxes through solid faces are
    zeroed — conditional_differences.jl semantics)."""
    from oceananigans_tpu import Integral

    ibg = _bump_grid()
    rng = np.random.default_rng(1)
    m = NonhydrostaticModel(grid=ibg, advection=WENO(5), tracers=("c",))
    m.set(u=0.1 * rng.standard_normal((32, 8, 16)),
          v=0.05 * rng.standard_normal((32, 8, 16)),
          c=lambda x, y, z: 1.0 + 0.5 * np.sin(np.pi * np.asarray(x)))
    I0 = float(np.asarray(Integral(m.field("c")).compute()).squeeze())
    for _ in range(10):
        m.time_step(0.01)
    I1 = float(np.asarray(Integral(m.field("c")).compute()).squeeze())
    assert np.isclose(I1, I0, rtol=1e-10), (I0, I1)


def test_no_spurious_extrema_near_immersed_boundary():
    """A smooth positive tracer advected over the bump with WENO must not
    develop large over/undershoots at the immersed boundary (the
    near-boundary order cascade keeps the reconstruction inside the
    data range up to small WENO wiggles)."""
    ibg = _bump_grid()
    m = NonhydrostaticModel(grid=ibg, advection=WENO(5), tracers=("c",))
    m.set(u=0.2, c=lambda x, y, z: 2.0 + np.sin(np.pi * np.asarray(x)))
    for _ in range(20):
        m.time_step(0.005)
    c = m.field("c")
    assert float(c.max()) < 3.0 + 0.05
    assert float(c.min(condition=None)) > 1.0 - 0.05 \
        if hasattr(c, "min") else True
    ci = np.asarray(c.interior)
    fluid = np.asarray(ibg.fluid_mask(("c", "c", "c"),
                                      jnp.float64))[
        ibg.H[0]:ibg.H[0] + 32, ibg.H[1]:ibg.H[1] + 8,
        ibg.H[2]:ibg.H[2] + 16] > 0
    assert np.isfinite(ci[fluid]).all()

"""Exact budgets under Flux boundary conditions (reference analogue:
test/test_boundary_conditions_integration.jl 'Budgets with Flux boundary
conditions'): imposing a constant boundary flux F on one side of a box
must change the volume mean of the field by exactly F·t/L after a step —
for tracers AND velocity components, on plain and immersed grids
(including a flux on the immersed boundary itself)."""

import numpy as np
import pytest
import jax.numpy as jnp

from oceananigans_tpu import (BoundaryCondition, FieldBoundaryConditions,
                              FluxBoundaryCondition, GridFittedBottom,
                              ImmersedBoundaryGrid, RectilinearGrid)
from oceananigans_tpu.models import NonhydrostaticModel

LX, LY, LZ = 0.3, 0.4, 0.5
FLUX = np.pi


def _mean(model, name):
    f = model.field(name)
    return float(f.mean())


def _run_budget(grid, name, side, L):
    direction = 1.0 if side in ("west", "south", "bottom", "immersed") \
        else -1.0
    bcs = FieldBoundaryConditions(**{side: FluxBoundaryCondition(
        FLUX * direction)})
    model = NonhydrostaticModel(grid=grid, tracers=("c",),
                                boundary_conditions={name: bcs})
    model.time_step(1.0)
    return _mean(model, name), FLUX * 1.0 / L


@pytest.mark.parametrize("name", ["c", "u"])
@pytest.mark.parametrize("side,L", [("north", LY), ("south", LY),
                                    ("top", LZ), ("bottom", LZ)])
def test_flux_budget_xperiodic(name, side, L):
    grid = RectilinearGrid(size=(2, 2, 2), x=(0, LX), y=(0, LY), z=(0, LZ),
                           topology=("periodic", "bounded", "bounded"),
                           dtype=jnp.float64)
    got, want = _run_budget(grid, name, side, L)
    assert np.isclose(got, want, rtol=1e-9), (name, side, got, want)


@pytest.mark.parametrize("name", ["c", "v"])
@pytest.mark.parametrize("side,L", [("east", LX), ("west", LX),
                                    ("top", LZ)])
def test_flux_budget_yperiodic(name, side, L):
    grid = RectilinearGrid(size=(2, 2, 2), x=(0, LX), y=(0, LY), z=(0, LZ),
                           topology=("bounded", "periodic", "bounded"),
                           dtype=jnp.float64)
    got, want = _run_budget(grid, name, side, L)
    assert np.isclose(got, want, rtol=1e-9), (name, side, got, want)


@pytest.mark.parametrize("name", ["c"])
@pytest.mark.parametrize("side", ["top", "immersed"])
def test_flux_budget_immersed(name, side):
    """Flat bottom at z = 0 inside a (−LZ, LZ) box: the fluid occupies the
    upper half, so the budget length is LZ. A flux on the IMMERSED side
    enters through the immersed boundary condition machinery rather than
    the domain-bottom fill (reference: the side == :immersed rows)."""
    under = RectilinearGrid(size=(2, 2, 4), x=(0, LX), y=(0, LY),
                            z=(-LZ, LZ),
                            topology=("periodic", "bounded", "bounded"),
                            dtype=jnp.float64)
    grid = ImmersedBoundaryGrid(under, GridFittedBottom(lambda x, y: 0.0))
    got, want = _run_budget(grid, name, side, LZ)
    assert np.isclose(got, want, rtol=1e-8), (name, side, got, want)


def test_flux_budget_uses_true_boundary_face_area_latlon():
    """On a curvilinear grid the boundary FACE area differs from the last
    interior face's (Ay ∝ cos φ): a north-wall tracer flux must change the
    σ-weighted total by exactly q·A_north·t, with A_north the area of the
    WALL face (slot H+N), not the face one row inside — a round-5
    review-found off-by-one (the two differ by O(tan φ·Δφ) ≈ 2% here)."""
    from oceananigans_tpu.grids.latlon import LatitudeLongitudeGrid
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel)
    from oceananigans_tpu.models.free_surfaces import ImplicitFreeSurface

    grid = LatitudeLongitudeGrid(size=(8, 8, 4), longitude=(0, 10),
                                 latitude=(40, 72), z=(-100.0, 0.0),
                                 topology=("periodic", "bounded", "bounded"))
    q = np.pi
    bcs = FieldBoundaryConditions(north=FluxBoundaryCondition(-q))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=None,
        free_surface=ImplicitFreeSurface(), tracers=("c",),
        boundary_conditions={"c": bcs})
    # total tracer content: sum c·V over the interior
    V = np.broadcast_to(np.asarray(grid.V(("c", "c", "c")), float),
                        grid.padded_shape)[grid.interior_slices]

    def total(m):
        return float((np.asarray(m.field("c").interior) * V).sum())

    t0, dt, n = total(model), 50.0, 4
    for _ in range(n):
        model.time_step(dt)
    t1 = total(model)
    # true wall-face area: Ay at the northern boundary face (slot H+N)
    Ay = np.broadcast_to(np.asarray(grid.Ay(("c", "f", "c")), float),
                         grid.padded_shape)
    sx, _, szz = grid.interior_slices
    H1, N1 = grid.H[1], grid.N[1]
    hz, nz = grid.H[2], grid.N[2]
    A_wall = Ay[sx, H1 + N1, hz:hz + nz].sum()
    A_inner = Ay[sx, H1 + N1 - 1, hz:hz + nz].sum()
    assert abs(A_wall / A_inner - 1.0) > 0.01, \
        "test lost discrimination: wall and inner face areas agree"
    expected = t0 + q * A_wall * dt * n
    wrong = t0 + q * A_inner * dt * n
    assert np.isclose(t1, expected, rtol=1e-10), (t1, expected, wrong)


def test_fluxes_with_diffusivity_boundary_conditions():
    """Port of test_boundary_conditions_integration.jl
    'Custom diffusivity boundary conditions': a Value BC on the AMD κₑ
    diffusivity field pins the wall diffusivity to κ₀, so with a bottom
    buoyancy-gradient BC ∂z b = bz the boundary diffusive flux is exactly
    −κ₀ bz and the mean buoyancy obeys <b> − <b₀> = flux·t/Lz."""
    from oceananigans_tpu import (RectilinearGrid, BuoyancyTracer,
                                  FieldBoundaryConditions,
                                  GradientBoundaryCondition,
                                  ValueBoundaryCondition)
    from oceananigans_tpu.closures import AnisotropicMinimumDissipation
    from oceananigans_tpu.models import NonhydrostaticModel

    Lz = 1.0
    kappa0 = float(np.exp(-3))
    bz = float(np.pi)
    flux = -kappa0 * bz

    grid = RectilinearGrid(size=(16, 16, 16), extent=(1.0, 1.0, Lz),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("b",),
        buoyancy=BuoyancyTracer(),
        timestepper="QuasiAdamsBashforth2",
        closure=AnisotropicMinimumDissipation(),
        boundary_conditions={
            "b": FieldBoundaryConditions(
                bottom=GradientBoundaryCondition(bz)),
            "kappa_e": {"b": FieldBoundaryConditions(
                bottom=ValueBoundaryCondition(kappa0))}})
    model.set(b=lambda x, y, z: z * bz)
    b0 = np.asarray(model.field("b").interior).mean()

    tau = Lz ** 2 / kappa0
    dt = 1e-6 * tau
    for _ in range(10):
        model.time_step(dt)
    b = np.asarray(model.field("b").interior).mean()
    expected = flux * model.time / Lz
    np.testing.assert_allclose(b - b0, expected, atol=1e-6)

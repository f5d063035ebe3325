"""Field-dependent flux boundary conditions (reference:
continuous_boundary_function.jl field_dependencies — e.g. the quadratic
bottom-drag law of examples/tilted_bottom_boundary_layer.jl)."""

import numpy as np
import pytest

from oceananigans_tpu import (FieldBoundaryConditions, FluxBoundaryCondition,
                              RectilinearGrid)
from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                     NonhydrostaticModel)

CD = 2.5e-3


def drag_u(x, y, t, u, v):
    return -CD * (u**2 + v**2) ** 0.5 * u


def drag_v(x, y, t, u, v):
    return -CD * (u**2 + v**2) ** 0.5 * v


def test_quadratic_bottom_drag_nonhydrostatic():
    """u-only flow, no closure: only the bottom cell feels the drag, so it
    obeys du_b/dt = -C_D u_b²/Δz with the exact Riccati solution
    u_b(t) = 1/(1/u0 + C_D t/Δz), and the depth mean is
    u0 - (Δz/L_z)(u0 - u_b(t))."""
    Lz, u0 = 10.0, 0.5
    grid = RectilinearGrid(size=(1, 1, 16), x=(0, 1.0), y=(0, 1.0),
                           z=(-Lz, 0.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(
        grid=grid,
        boundary_conditions={
            "u": FieldBoundaryConditions(bottom=FluxBoundaryCondition(
                drag_u, field_dependencies=("u", "v"))),
            "v": FieldBoundaryConditions(bottom=FluxBoundaryCondition(
                drag_v, field_dependencies=("u", "v")))})
    model.set(u=u0)
    dt, nsteps = 5.0, 200
    for _ in range(nsteps):
        model.time_step(dt)
    u = np.asarray(model.field("u").interior)
    ubar = u.mean()
    t = dt * nsteps
    dz = Lz / 16
    u_b = 1.0 / (1.0 / u0 + CD * t / dz)
    analytic = u0 - (dz / Lz) * (u0 - u_b)
    assert ubar < u0                      # drag decelerates
    assert ubar == pytest.approx(analytic, rel=2e-3)
    # the bottom cell itself follows the Riccati solution
    assert u[0, 0, 0] == pytest.approx(u_b, rel=2e-2)


def test_field_dependent_drag_hydrostatic():
    """The same drag law through the hydrostatic model's tendency path."""
    grid = RectilinearGrid(size=(4, 4, 8), extent=(1e3, 1e3, 50.0),
                           topology=("periodic", "periodic", "bounded"))
    model = HydrostaticFreeSurfaceModel(
        grid=grid,
        boundary_conditions={
            "u": FieldBoundaryConditions(bottom=FluxBoundaryCondition(
                drag_u, field_dependencies=("u", "v")))})
    model.set(u=0.2)
    for _ in range(20):
        model.time_step(30.0)
    u = np.asarray(model.field("u").interior)
    assert np.isfinite(u).all()
    assert u.mean() < 0.2


def test_missing_fields_raises():
    from oceananigans_tpu.boundary_conditions import apply_flux_bcs
    import jax.numpy as jnp
    grid = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "bounded"))
    bcs = FieldBoundaryConditions(bottom=FluxBoundaryCondition(
        drag_u, field_dependencies=("u", "v")))
    from oceananigans_tpu.boundary_conditions.boundary_condition import (
        regularize_field_boundary_conditions)
    rbcs = regularize_field_boundary_conditions(bcs, grid, ("f", "c", "c"))
    G = jnp.zeros(grid.padded_shape)
    with pytest.raises(ValueError):
        apply_flux_bcs(G, grid, ("f", "c", "c"), rbcs, 0.0)

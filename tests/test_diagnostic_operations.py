"""Forcing/BC diagnostic wrappers (reference: src/Models/
forcing_operation.jl, boundary_condition_operation.jl, boundary_mean.jl)."""

import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                  FluxBoundaryCondition)
from oceananigans_tpu.forcings import ContinuousForcing
from oceananigans_tpu.models import (NonhydrostaticModel, ForcingField,
                                     ForcingOperation,
                                     BoundaryConditionField,
                                     BoundaryConditionOperation,
                                     boundary_adjacent_mean)


def make_model():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    return grid


def test_forcing_operation_matches_forcing():
    """ForcingOperation evaluates model.forcing[name] at the current state
    (reference docstring example: damping c-forcing computes -c/tau)."""
    grid = make_model()
    tau = 60.0
    forcing = ContinuousForcing(lambda x, y, z, t, c: -c / tau,
                                field_dependencies="c")
    model = NonhydrostaticModel(grid=grid, tracers=("c",),
                                forcing={"c": forcing})
    model.set(c=1.0)
    f = ForcingField("c", model)
    out = np.asarray(f.interior)
    assert out.shape == (8, 8, 8)
    assert np.allclose(out, -1.0 / tau)
    # re-evaluates at the new state
    model.set(c=2.0)
    out2 = np.asarray(ForcingField("c", model).interior)
    assert np.allclose(out2, -2.0 / tau)


def test_forcing_operation_unknown_name_raises():
    model = NonhydrostaticModel(grid=make_model(), tracers=("c",))
    with pytest.raises(KeyError):
        ForcingOperation("c", model)


def test_boundary_condition_operation():
    """BoundaryConditionOperation evaluates a side's BC into a
    boundary-plane array (reference: boundary_condition_operation.jl)."""
    grid = make_model()
    flux = lambda x, y, t: 1e-4 * np.cos(2 * np.pi * x)
    model = NonhydrostaticModel(
        grid=grid, tracers=("c",),
        boundary_conditions={
            "c": FieldBoundaryConditions(top=FluxBoundaryCondition(flux),
                                         bottom=FluxBoundaryCondition(2.5))})
    op = BoundaryConditionOperation("c", "top", model)
    out = np.asarray(op.interior)
    assert out.shape == (8, 8, 1)
    x = np.asarray(grid.nodes1d(0, "c"))
    assert np.allclose(out[:, 0, 0], 1e-4 * np.cos(2 * np.pi * x), atol=1e-12)
    bot = np.asarray(
        BoundaryConditionField("c", "bottom", model).compute().interior)
    assert np.allclose(bot, 2.5)
    # a side with no condition evaluates to zero flux
    west = np.asarray(BoundaryConditionOperation("u", "west", model).interior)
    assert np.allclose(west, 0.0)


def test_boundary_adjacent_mean():
    """Area-weighted boundary-adjacent plane mean (reference:
    boundary_mean.jl docstring: sin(2πy/4) has zero east mean; a linear
    profile has mean equal to the plane value)."""
    grid = RectilinearGrid(size=(16, 16, 16), extent=(3.0, 4.0, 5.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, tracers=("c",))
    model.set(c=lambda x, y, z: np.sin(2 * np.pi * y / 4.0))
    m = boundary_adjacent_mean(model.field("c"), "east")
    assert abs(float(m)) < 1e-12
    model.set(c=lambda x, y, z: z)
    zc = np.asarray(grid.nodes1d(2, "c"))
    assert float(boundary_adjacent_mean(model.field("c"), "top")) == \
        pytest.approx(zc[-1], rel=1e-12)
    assert float(boundary_adjacent_mean(model.field("c"), "bottom")) == \
        pytest.approx(zc[0], rel=1e-12)


def test_boundary_adjacent_mean_face_right_side():
    """Round-5 review regression: on a bounded face-located axis the right
    side's boundary-ADJACENT plane is one face in from the boundary face
    (mirror of the left side's index 1; reference: boundary_mean.jl)."""
    from oceananigans_tpu import RectilinearGrid, Field
    from oceananigans_tpu.fields.field import set_on_padded
    from oceananigans_tpu.grids.topology import LOC_FCC
    from oceananigans_tpu.models.diagnostic_operations import (
        boundary_adjacent_mean)

    grid = RectilinearGrid(size=(4, 2, 2), extent=(1.0, 1.0, 1.0),
                           topology=("bounded", "periodic", "bounded"))
    data = set_on_padded(grid, LOC_FCC, lambda x, y, z: x)
    u = Field(grid, LOC_FCC, None, data)
    # x faces at 0, .25, .5, .75, 1: east-adjacent face is x=0.75 (NOT the
    # boundary face x=1), west-adjacent is x=0.25
    np.testing.assert_allclose(float(boundary_adjacent_mean(u, "east")),
                               0.75, rtol=1e-6)
    np.testing.assert_allclose(float(boundary_adjacent_mean(u, "west")),
                               0.25, rtol=1e-6)

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

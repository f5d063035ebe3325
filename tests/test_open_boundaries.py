"""The reference's PerturbationAdvection open-boundary matrix
(test/test_boundary_conditions_integration.jl:
test_perturbation_advection_open_boundary_conditions +
test_open_boundary_condition_mass_conservation): the relaxed upwind
boundary update per wall-normal orientation, convergence of the interior
to a ramping exterior value under forcing, and global mass conservation
with open walls."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (FieldBoundaryConditions, OpenBoundaryCondition,
                              RectilinearGrid)
from oceananigans_tpu.boundary_conditions import PerturbationAdvection
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.operators.operators import div_ccc

# orientation → (topology, normal velocity, BC side names)
ORIENTATIONS = {
    "x": (("bounded", "flat", "flat"), "u", ("west", "east")),
    "y": (("flat", "bounded", "flat"), "v", ("south", "north")),
    "z": (("flat", "flat", "bounded"), "w", ("bottom", "top")),
}


def _grid(topology):
    kw = dict(x=(0, 4.0), y=(0, 4.0), z=(0, 4.0))
    size = tuple(4 for t in topology if t != "flat")
    return RectilinearGrid(size=size, topology=topology,
                           **{d: kw[d] for d, t in zip("xyz", topology)
                              if t != "flat"})


@pytest.mark.parametrize("orientation", list(ORIENTATIONS))
def test_uniform_flow_through_open_wall_unchanged(orientation):
    """Steady uniform flow matching the exterior value passes through a
    PerturbationAdvection open wall bit-exactly (the reference's 'nothing
    going on' case)."""
    topology, name, (left, right) = ORIENTATIONS[orientation]
    grid = _grid(topology)
    obc = OpenBoundaryCondition(-1.0, scheme=PerturbationAdvection(
        inflow_timescale=10.0))
    bcs = FieldBoundaryConditions(**{left: obc, right: obc})
    model = NonhydrostaticModel(grid=grid, boundary_conditions={name: bcs},
                                timestepper="QuasiAdamsBashforth2",
                                advection=None)
    model.set(**{name: -1.0})
    model.time_step(1.0)
    vel = np.asarray(model.field(name).interior)
    assert np.allclose(vel, -1.0, atol=1e-12), vel


@pytest.mark.parametrize("orientation", list(ORIENTATIONS))
def test_interior_follows_ramping_exterior(orientation):
    """With exterior value 0.1·t, matching forcing 0.1 and a short inflow
    timescale, the interior converges to the exterior ramp: u ≈ 1 after
    t = 10 (the reference's second case, atol 0.1)."""
    topology, name, (left, right) = ORIENTATIONS[orientation]
    grid = _grid(topology)
    obc = OpenBoundaryCondition(
        lambda x1, x2, t: 0.1 * t,
        scheme=PerturbationAdvection(inflow_timescale=0.01,
                                     outflow_timescale=0.5))
    bcs = FieldBoundaryConditions(**{left: obc, right: obc})
    model = NonhydrostaticModel(grid=grid, boundary_conditions={name: bcs},
                                timestepper="QuasiAdamsBashforth2",
                                advection=None,
                                forcing={name: lambda g, f, t: 0.1})
    for _ in range(100):
        model.time_step(0.1)
    vel = np.asarray(model.field(name).interior)
    assert np.allclose(vel, 1.0, atol=0.1), vel


@pytest.mark.parametrize("dtype,tol_eps", [(jnp.float64, 5), (jnp.float32, 50)])
def test_open_boundary_mass_conservation(dtype, tol_eps):
    """Noisy through-flow in a fully bounded box with PerturbationAdvection
    west/east walls: the volume integral of the divergence vanishes — the
    boundary scheme's implied mass fluxes balance (the reference's
    test_open_boundary_condition_mass_conservation, RK3)."""
    N = 8
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=("bounded", "bounded", "bounded"),
                           dtype=dtype)
    pa = PerturbationAdvection(inflow_timescale=1e-1,
                               outflow_timescale=np.inf)
    u_bcs = FieldBoundaryConditions(
        west=OpenBoundaryCondition(1.0, scheme=pa),
        east=OpenBoundaryCondition(1.0, scheme=pa))
    model = NonhydrostaticModel(grid=grid, timestepper="RungeKutta3",
                                boundary_conditions={"u": u_bcs})
    rng = np.random.default_rng(11)
    model.set(u=(1.0 + 1e-2 * rng.random((N, N, N))).astype(np.float64))
    dz = 1.0 / N
    umax = float(np.abs(np.asarray(model.field("u").interior)).max())
    dt = 0.1 * dz / umax
    t, n = 0.0, 0
    while t < 1.0 and n < 200:
        model.time_step(dt)
        t += dt
        n += 1
    from oceananigans_tpu.boundary_conditions.fill_halos import \
        fill_halo_regions
    st = model.state["fields"]
    u = fill_halo_regions(st["u"], grid, ("f", "c", "c"), model.bcs["u"],
                          model.time)
    v = fill_halo_regions(st["v"], grid, ("c", "f", "c"), model.bcs["v"],
                          model.time)
    w = fill_halo_regions(st["w"], grid, ("c", "c", "f"), model.bcs["w"],
                          model.time)
    div = np.asarray(div_ccc(grid, u, v, w))[grid.interior_slices]
    V = (1.0 / N) ** 3
    total = float((div * V).sum())
    assert abs(total) < tol_eps * np.finfo(np.dtype(dtype)).eps, total

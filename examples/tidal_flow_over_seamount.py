"""Oscillating (tidal) flow over a Gaussian seamount (reference analogues:
examples/internal_tide.jl + validation/open_boundaries): stratified flow
driven through PerturbationAdvection open boundaries over PartialCellBottom
topography radiates internal waves.

Exercises: ImmersedBoundaryGrid + PartialCellBottom, open boundaries with
PerturbationAdvection, open-boundary mass-flux balancing, FFT-preconditioned
immersed CG Poisson solver, bounds-preserving WENO tracer."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (FieldBoundaryConditions, OpenBoundaryCondition,
                              RectilinearGrid)
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.boundary_conditions import PerturbationAdvection
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.immersed import ImmersedBoundaryGrid, PartialCellBottom
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.simulation import Callback
from oceananigans_tpu.utils.schedules import IterationInterval


def main(nx=64, nz=16, periods=1.0):
    Lx, Lz = 8000.0, 200.0
    U0, omega = 0.1, 1.4e-3              # tidal amplitude and frequency
    N2 = 1e-5

    grid = RectilinearGrid(size=(nx, 1, nz), x=(0.0, Lx), z=(-Lz, 0.0),
                           topology=("bounded", "flat", "bounded"))
    seamount = lambda x, y: -Lz + 100.0 * np.exp(-((x - Lx / 2) / 800.0) ** 2)
    ibg = ImmersedBoundaryGrid(grid, PartialCellBottom(seamount))

    tide = lambda y, z, t: U0 * jnp.sin(omega * t) * jnp.ones_like(z)
    pa = PerturbationAdvection(inflow_timescale=60.0,
                               outflow_timescale=np.inf)
    u_bcs = FieldBoundaryConditions(
        west=OpenBoundaryCondition(tide, scheme=pa),
        east=OpenBoundaryCondition(tide, scheme=pa))

    model = NonhydrostaticModel(
        grid=ibg, advection=WENO(5), buoyancy=BuoyancyTracer(),
        boundary_conditions={"u": u_bcs})
    model.set(b=lambda x, y, z: N2 * z)

    def progress(sim):
        w = np.asarray(sim.model.field("w").interior)
        print(f"iter {sim.model.iteration:5d}  t={sim.model.time/3600:.2f} h"
              f"  max|w|={np.abs(w).max():.5f} m/s", flush=True)

    T = 2 * np.pi / omega
    sim = Simulation(model, dt=20.0, stop_time=periods * T)
    sim.callbacks["progress"] = Callback(progress, IterationInterval(50))
    sim.run()
    return model


if __name__ == "__main__":
    main()

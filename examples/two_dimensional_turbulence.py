"""2D periodic turbulence (BASELINE config 1; reference:
examples/two_dimensional_turbulence.jl).

Random initial vorticity decays into coherent vortices; writes vorticity
snapshots with a FieldWriter."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.abstract_operations import KernelFunctionOperation
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.operators import zeta3_ffc
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.diagnostics import TimeStepWizard
from oceananigans_tpu.simulation.output_writers import FieldWriter
from oceananigans_tpu.utils.schedules import IterationInterval, TimeInterval


def main(n=128, stop_time=2.0, out="two_dimensional_turbulence_out"):
    grid = RectilinearGrid(size=(n, n), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid, advection=WENO(5))
    rng = np.random.default_rng(123)
    model.set(u=rng.standard_normal((n, n)), v=rng.standard_normal((n, n)))

    sim = Simulation(model, dt=0.01, stop_time=stop_time, verbose=True)
    sim.add_callback(TimeStepWizard(cfl=0.7), IterationInterval(10))

    vorticity = KernelFunctionOperation(
        lambda g, u, v: zeta3_ffc(g, u, v), model.grid,
        model.field("u"), model.field("v"), loc=("f", "f", "c"))
    writer = FieldWriter(model, outputs={"zeta": lambda m:
                                         vorticity.compute()},
                         path=out, schedule=TimeInterval(0.2))
    sim.add_output_writer(writer)

    def progress(s):
        zeta = np.asarray(vorticity.compute().interior)
        print(f"iter {s.model.iteration:5d}  t={s.model.time:.3f}  "
              f"max|ζ|={np.abs(zeta).max():.3f}  dt={s.dt:.4f}")

    sim.add_callback(progress, IterationInterval(50))
    sim.run()
    return sim


if __name__ == "__main__":
    main()

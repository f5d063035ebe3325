"""One-dimensional diffusion of a Gaussian temperature bump (reference:
examples/one_dimensional_diffusion.jl).

The simplest possible simulation: a (Flat, Flat, Bounded) column, a constant
scalar diffusivity, and a tracer that spreads diffusively."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.closures import ScalarDiffusivity
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.output_writers import FieldWriter
from oceananigans_tpu.utils.schedules import IterationInterval


def main(n=128, stop_iteration=1000, out=None):
    grid = RectilinearGrid(size=(1, 1, n), x=(0, 1.0), y=(0, 1.0),
                           z=(-0.5, 0.5),
                           topology=("flat", "flat", "bounded"))
    model = NonhydrostaticModel(grid=grid, tracers=("T",),
                                closure=ScalarDiffusivity(kappa=1.0))

    width = 0.1
    model.set(T=lambda x, y, z: np.exp(-z**2 / (2 * width**2)))

    # dt from the diffusive stability limit on the smallest spacing
    min_dz = 1.0 / n
    dt = 0.1 * min_dz**2 / 1.0
    sim = Simulation(model, dt=dt, stop_iteration=stop_iteration,
                     verbose=True)

    if out:
        sim.add_output_writer(FieldWriter(
            model, outputs={"T": lambda m: m.field("T")},
            path=out, schedule=IterationInterval(100)))

    def progress(s):
        T = np.asarray(s.model.field("T").interior)[0, 0]
        print(f"iter {s.model.iteration:5d}  t={s.model.time:.4f}  "
              f"max T={T.max():.4f}")

    sim.add_callback(progress, IterationInterval(200))
    sim.run()

    T = np.asarray(model.field("T").interior)[0, 0]
    # diffusion conserves the integral and flattens the peak
    assert T.max() < 1.0
    assert np.isfinite(T).all()
    return model


if __name__ == "__main__":
    main()

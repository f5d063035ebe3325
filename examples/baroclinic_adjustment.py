"""Baroclinic adjustment (BASELINE config 4; reference:
examples/baroclinic_adjustment.jl): an east-west buoyancy front on a
beta-less f-plane channel slumps and goes baroclinically unstable.

Exercises: LatitudeLongitudeGrid, HydrostaticFreeSurfaceModel with
SplitExplicitFreeSurface, WENOVectorInvariant momentum advection, WENO tracer
advection, HydrostaticSphericalCoriolis."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oceananigans_tpu import LatitudeLongitudeGrid
from oceananigans_tpu.advection import WENO, WENOVectorInvariant
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                     SplitExplicitFreeSurface)
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.simulation import Callback
from oceananigans_tpu.utils.schedules import IterationInterval


def main(nx=48, ny=48, nz=16, days=5.0, out="baroclinic_adjustment_out"):
    grid = LatitudeLongitudeGrid(size=(nx, ny, nz),
                                 longitude=(-10.0, 10.0),
                                 latitude=(-10.0, 10.0),
                                 z=(-1000.0, 0.0))

    model = HydrostaticFreeSurfaceModel(
        grid=grid,
        momentum_advection=WENOVectorInvariant(),
        tracer_advection=WENO(5),
        buoyancy=BuoyancyTracer(),
        coriolis=HydrostaticSphericalCoriolis(),
        free_surface=SplitExplicitFreeSurface(substeps=30))

    # front: b = N² z + Δb · ramp(y)
    N2, db, dy = 4e-6, 0.006, 1.0

    def ramp(y, d):
        return np.minimum(np.maximum(0.0, y / d + 0.5), 1.0)

    rng = np.random.default_rng(11)
    eps = 1e-2 * db * rng.standard_normal((nx, ny, nz))
    yc = grid.ynodes("c")
    b0 = (N2 * grid.znodes("c")[None, None, :]
          + db * ramp(yc, dy)[None, :, None] + eps)
    model.set(b=b0)

    def progress(sim):
        u = np.asarray(sim.model.field("u").interior)
        print(f"iter {sim.model.iteration:5d}  t={sim.model.time/86400:.2f} d"
              f"  max|u|={np.abs(u).max():.4f} m/s", flush=True)

    dt = 600.0
    sim = Simulation(model, dt=dt, stop_time=days * 86400)
    sim.callbacks["progress"] = Callback(progress, IterationInterval(72))
    sim.run()
    return model


if __name__ == "__main__":
    main()

"""An unstable Bickley jet in the shallow water model (BASELINE config 2;
reference: examples/shallow_water_Bickley_jet.jl).

A geostrophically balanced Bickley jet ū = U sech²(y), h̄ = H − (fU/g)tanh(y)
seeded with small noise; barotropic instability grows at the rate predicted
by linear theory (≈0.139 for these parameters — Poulin & Flierl 2003)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models.shallow_water import ShallowWaterModel
from oceananigans_tpu.simulation import Simulation


def main(nx=48, ny=128, stop_time=20.0, dt=1e-2):
    grid = RectilinearGrid(size=(nx, ny), x=(0, 2 * np.pi), y=(-10, 10),
                           topology=("periodic", "bounded", "flat"))
    U, H, f, g = 1.0, 10.0, 1.0, 1.0
    model = ShallowWaterModel(grid=grid, coriolis=FPlane(f),
                              gravitational_acceleration=g,
                              advection=WENO(5))
    d_eta = f * U / g

    rng = np.random.default_rng(42)
    yc = np.asarray(grid.ynodes("c"))
    xc = np.asarray(grid.xnodes("c"))
    X, Y = np.meshgrid(xc, yc, indexing="ij")
    hbar = H - d_eta * np.tanh(Y)
    ubar = U / np.cosh(Y) ** 2
    noise = 1e-4 * np.exp(-Y ** 2) * rng.standard_normal((nx, ny))
    model.set(uh=(ubar + noise) * hbar, h=hbar)

    # perturbation norm |v| tracks the instability growth
    norms, times = [], []

    def track(sim):
        vh = np.asarray(sim.model.field("vh").interior)[:, :, 0]
        h = np.asarray(sim.model.field("h").interior)[:, :, 0]
        norms.append(float(np.sqrt(np.mean((vh / h) ** 2))))
        times.append(sim.model.time)

    sim = Simulation(model, dt=dt, stop_time=stop_time, verbose=True)
    from oceananigans_tpu.simulation.simulation import Callback
    from oceananigans_tpu.utils.schedules import IterationInterval
    sim.callbacks["norm"] = Callback(track, IterationInterval(50))
    sim.run()

    h = np.asarray(model.field("h").interior)
    assert np.isfinite(h).all()
    if len(norms) > 4 and stop_time >= 20.0:
        # measured growth rate over the linear phase vs theory (~0.139)
        t = np.asarray(times[1:]),
        gr = np.polyfit(times[1:], np.log(norms[1:]), 1)[0]
        print(f"perturbation growth rate: {gr:.3f} (theory ~0.139)")
    return model, times, norms


if __name__ == "__main__":
    main()

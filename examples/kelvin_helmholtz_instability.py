"""Kelvin–Helmholtz instability of a stratified shear layer (reference:
examples/kelvin_helmholtz_instability.jl).

A hyperbolic-tangent shear layer U(z) = tanh(z) with stratification
Ri = N²/U'² below the instability threshold (Ri < 1/4) rolls up into
billows; the perturbation kinetic energy grows exponentially."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation


def main(nx=64, nz=64, stop_time=30.0, Ri=0.10, h=1.0):
    grid = RectilinearGrid(size=(nx, nz), x=(-5, 5), z=(-5, 5),
                           topology=("periodic", "flat", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                buoyancy=BuoyancyTracer(), tracers=("b",))

    rng = np.random.default_rng(7)
    noise = 1e-3 * rng.standard_normal((nx, 1, nz))
    model.set(u=lambda x, y, z: jnp.tanh(z / h),
              b=lambda x, y, z: Ri * jnp.tanh(z / h) / h,
              w=noise)

    ke0 = None
    kes, times = [], []

    def track(sim):
        w = np.asarray(sim.model.field("w").interior)
        kes.append(float(np.mean(w ** 2)))
        times.append(sim.model.time)

    from oceananigans_tpu.simulation.simulation import Callback
    from oceananigans_tpu.utils.schedules import IterationInterval
    sim = Simulation(model, dt=0.02, stop_time=stop_time, verbose=True)
    sim.callbacks["ke"] = Callback(track, IterationInterval(25))
    sim.run()

    u = np.asarray(model.field("u").interior)
    assert np.isfinite(u).all()
    if len(kes) > 3 and stop_time >= 20:
        growth = kes[-1] / max(kes[0], 1e-30)
        print(f"perturbation w-variance amplification: {growth:.1e} "
              f"(Ri = {Ri} < 1/4: unstable)")
        assert growth > 10.0
    return model, times, kes


if __name__ == "__main__":
    main()

"""Internal wave propagation (reference: examples/internal_wave.jl).

A wave packet in a rotating, uniformly stratified fluid propagates along a
beam at the angle set by the dispersion relation
ω² = (N² k² + f² m²)/(k² + m²)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import Centered
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation


def main(n=128, periods=1.5):
    # nondimensional: N = 1, f = 0.2 (reference parameters)
    N, f = 1.0, 0.2
    grid = RectilinearGrid(size=(n, n), x=(-np.pi, np.pi), z=(-np.pi, np.pi),
                           topology=("periodic", "flat", "periodic"))
    model = NonhydrostaticModel(grid=grid, advection=Centered(4),
                                coriolis=FPlane(f), buoyancy=BuoyancyTracer(),
                                background_fields={},
                                tracers=("b",))

    # wave packet: k = m = 16, amplitude a(x, z) Gaussian envelope
    k, m, A = 16.0, 16.0, 1e-6
    w2 = (N ** 2 * k ** 2 + f ** 2 * m ** 2) / (k ** 2 + m ** 2)
    om = np.sqrt(w2)

    def envelope(x, z):
        return A * jnp.exp(-(x ** 2 + z ** 2) / (2 * 0.25))

    # polarization relations (reference: internal_wave.jl)
    U = k * om / (om ** 2 - f ** 2)
    V = k * f / (om ** 2 - f ** 2)
    W = m / om
    B = m * N ** 2 / om ** 2

    model.set(
        u=lambda x, y, z: envelope(x, z) * U * jnp.cos(k * x + m * z),
        v=lambda x, y, z: envelope(x, z) * V * jnp.sin(k * x + m * z),
        w=lambda x, y, z: envelope(x, z) * W * jnp.cos(k * x + m * z),
        b=lambda x, y, z: N ** 2 * z
        + envelope(x, z) * B * jnp.sin(k * x + m * z))

    T = 2 * np.pi / om
    sim = Simulation(model, dt=T / 200, stop_time=periods * T, verbose=True)
    sim.run()
    w = np.asarray(model.field("w").interior)
    assert np.isfinite(w).all()
    # the packet travels at the group velocity along the beam: energy moved
    # away from the origin
    x = np.asarray(grid.xnodes("c"))
    weight = np.abs(w[:, 0, :]) ** 2
    print(f"max |w| = {np.abs(w).max():.2e}, energy radius = "
          f"{np.sqrt((weight * (x[:, None] ** 2)).sum() / weight.sum()):.2f}")
    return model


if __name__ == "__main__":
    main()

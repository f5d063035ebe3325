"""Horizontal convection (reference: examples/horizontal_convection.jl).

Flow driven by a horizontally-varying surface buoyancy
bˢ(x) = -b★ cos(2πx/Lx) at Rayleigh number Ra = b★Lx³/(νκ): buoyancy is
gained on one half of the surface and lost on the other, driving an
overturning cell with a plume at the buoyancy maximum."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                  ValueBoundaryCondition)
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures.scalar_diffusivity import ScalarDiffusivity
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation


def main(nx=128, nz=64, Ra=1e8, Pr=1.0, stop_time=10.0):
    Lx, H = 2.0, 1.0
    b_star = 1.0
    nu = np.sqrt(Pr * b_star * Lx ** 3 / Ra)
    kappa = np.sqrt(b_star * Lx ** 3 / (Pr * Ra))
    grid = RectilinearGrid(size=(nx, nz), x=(-Lx / 2, Lx / 2), z=(-H, 0),
                           topology=("bounded", "flat", "bounded"))
    b_bcs = FieldBoundaryConditions(
        top=ValueBoundaryCondition(
            lambda x, y, t: -b_star * jnp.cos(2 * jnp.pi * x / Lx)))
    model = NonhydrostaticModel(
        grid=grid, advection=WENO(5), buoyancy=BuoyancyTracer(),
        tracers=("b",), closure=ScalarDiffusivity(nu=nu, kappa={"b": kappa}),
        boundary_conditions={"b": b_bcs})

    sim = Simulation(model, dt=1e-2, stop_time=stop_time, verbose=True)
    sim.run()
    b = np.asarray(model.field("b").interior)
    w = np.asarray(model.field("w").interior)
    assert np.isfinite(b).all() and np.isfinite(w).all()
    # overturning: vertical motion correlates with the surface forcing sign
    print(f"max |w| = {np.abs(w).max():.3f}, surface b range "
          f"[{b[:, 0, -1].min():.2f}, {b[:, 0, -1].max():.2f}]")
    if stop_time >= 10:
        assert np.abs(w).max() > 1e-3
    return model


if __name__ == "__main__":
    main()

"""Langmuir turbulence LES (reference: examples/langmuir_turbulence.jl,
after McWilliams et al. 1997): wave-averaged Craik-Leibovich equations with a
uniform Stokes drift profile, wind stress aligned with the waves.

Exercises: UniformStokesDrift (CL vortex force), AMD closure, wind-stress and
buoyancy-flux boundary conditions, Coriolis."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                  FluxBoundaryCondition,
                                                  GradientBoundaryCondition)
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import AnisotropicMinimumDissipation
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.simulation import Callback
from oceananigans_tpu.stokes_drift import UniformStokesDrift
from oceananigans_tpu.utils.schedules import IterationInterval


def main(n=32, hours=1.0):
    grid = RectilinearGrid(size=(n, n, n), extent=(128.0, 128.0, 64.0))

    # monochromatic deep-water wave Stokes drift (McWilliams et al. 1997)
    amplitude = 0.8                       # m
    wavenumber = 2 * np.pi / 60.0         # rad/m
    g = 9.81
    sigma_w = np.sqrt(g * wavenumber)     # deep-water dispersion
    Us = amplitude ** 2 * wavenumber * sigma_w

    def dz_us(z, t):
        return 2 * wavenumber * Us * jnp.exp(2 * wavenumber * z)

    stokes = UniformStokesDrift(grad_z_us=dz_us)

    tau_x = -3.72e-5                      # kinematic wind stress m²/s²
    Jb = 2.31e-8                          # surface buoyancy flux m²/s³
    N2 = 1.936e-5
    u_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(tau_x))
    b_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(Jb),
                                    bottom=GradientBoundaryCondition(N2))

    model = NonhydrostaticModel(
        grid=grid, advection=WENO(5), coriolis=FPlane(f=1e-4),
        buoyancy=BuoyancyTracer(), stokes_drift=stokes,
        closure=AnisotropicMinimumDissipation(),
        boundary_conditions={"u": u_bcs, "b": b_bcs})

    rng = np.random.default_rng(3)
    zc = grid.znodes("c")
    mixed = zc > -33.0
    b0 = np.where(mixed[None, None, :], 0.0, N2 * (zc[None, None, :] + 33.0))
    noise = rng.standard_normal((n, n, n))
    model.set(b=b0 + 1e-8 * noise,
              u=1e-3 * rng.standard_normal((n, n, n)),
              w=1e-3 * rng.standard_normal((n, n, n + 1)))

    def progress(sim):
        w = np.asarray(sim.model.field("w").interior)
        print(f"iter {sim.model.iteration:5d}  t={sim.model.time/60:.1f} min"
              f"  max|w|={np.abs(w).max():.4f} m/s", flush=True)

    sim = Simulation(model, dt=10.0, stop_time=hours * 3600)
    sim.callbacks["progress"] = Callback(progress, IterationInterval(60))
    sim.run()
    return model


if __name__ == "__main__":
    main()

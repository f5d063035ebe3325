"""Ocean wind mixing and convection LES (BASELINE config 3; reference:
examples/ocean_wind_mixing_and_convection.jl).

Wind stress + surface cooling over a stratified column with SmagorinskyLilly."""

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
from oceananigans_tpu.buoyancy import SeawaterBuoyancy
from oceananigans_tpu.closures import AnisotropicMinimumDissipation
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.diagnostics import TimeStepWizard
from oceananigans_tpu.utils.schedules import IterationInterval


def main(n=32, hours=2.0):
    grid = RectilinearGrid(size=(n, n, n), extent=(128.0, 128.0, 64.0))

    Q = 200.0            # surface heat flux W/m²
    rho0, cp = 1026.0, 3991.0
    dTdz = 0.01
    T_flux = Q / (rho0 * cp)
    tau_x = -3.2e-5      # kinematic wind stress

    T_bcs = FieldBoundaryConditions(
        top=FluxBoundaryCondition(T_flux),
        bottom=GradientBoundaryCondition(dTdz))
    u_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(tau_x))

    model = NonhydrostaticModel(
        grid=grid, advection=WENO(5), coriolis=FPlane(f=1e-4),
        buoyancy=SeawaterBuoyancy(constant_salinity=35.0),
        closure=AnisotropicMinimumDissipation(),
        boundary_conditions={"T": T_bcs, "u": u_bcs})

    rng = np.random.default_rng(7)
    noise = 1e-4 * rng.standard_normal((n, n, n))
    zc = grid.znodes("c")
    T0 = 20.0 + dTdz * zc[None, None, :] + noise
    model.set(T=T0)

    sim = Simulation(model, dt=10.0, stop_time=hours * 3600, verbose=True)
    sim.add_callback(TimeStepWizard(cfl=0.7, max_dt=60.0),
                     IterationInterval(10))

    def progress(s):
        w = np.asarray(s.model.field("w").interior)
        print(f"iter {s.model.iteration:5d}  t={s.model.time/3600:.2f} h  "
              f"max|w|={np.abs(w).max():.4f} m/s")

    sim.add_callback(progress, IterationInterval(20))
    sim.run()
    return sim


if __name__ == "__main__":
    main()

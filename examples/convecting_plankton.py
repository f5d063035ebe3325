"""Convecting plankton (reference: examples/convecting_plankton.jl).

Convection driven by a surface buoyancy loss that shuts off after two hours
mixes a phytoplankton tracer P whose population grows near the sunlit surface
(growth rate decaying with depth) and dies at a constant mortality rate:

    ∂P/∂t + u·∇P = (μ₀ e^{z/λ} − m) P
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (FieldBoundaryConditions, FluxBoundaryCondition,
                              GradientBoundaryCondition, RectilinearGrid)
from oceananigans_tpu.advection import UpwindBiased
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import ScalarDiffusivity
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.forcings import ContinuousForcing
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.diagnostics import TimeStepWizard
from oceananigans_tpu.utils.schedules import IterationInterval

MINUTE, HOUR, DAY = 60.0, 3600.0, 86400.0


def main(n=64, stop_time=6 * HOUR):
    grid = RectilinearGrid(size=(n, 1, n), x=(0, 64.0), y=(0, 1.0),
                           z=(-64.0, 0.0),
                           topology=("periodic", "flat", "bounded"))

    # surface buoyancy loss that shuts off after ~2 hours (reference
    # buoyancy_flux with parameters)
    Qb0, shutoff = 1e-8, 2 * HOUR

    def buoyancy_flux(x, y, t):
        return Qb0 * jnp.exp(-t**4 / (24 * shutoff**4))

    N2 = 1e-4
    b_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(buoyancy_flux),
                                    bottom=GradientBoundaryCondition(N2))

    # plankton growth (sunlight-attenuated) and mortality (reference
    # growing_and_grazing Forcing with field_dependencies=:P)
    mu0, lam, m = 1.0 / DAY, 5.0, 0.1 / DAY
    plankton_dynamics = ContinuousForcing(
        lambda x, y, z, t, P: (mu0 * jnp.exp(z / lam) - m) * P,
        field_dependencies="P")

    model = NonhydrostaticModel(
        grid=grid, advection=UpwindBiased(5),
        closure=ScalarDiffusivity(nu=1e-4, kappa=1e-4),
        coriolis=FPlane(f=1e-4),
        tracers=("b", "P"), buoyancy=BuoyancyTracer(),
        forcing={"P": plankton_dynamics},
        boundary_conditions={"b": b_bcs})

    mixed_layer_depth = 32.0
    rng = np.random.default_rng(11)

    def initial_buoyancy(x, y, z):
        strat = np.where(z < -mixed_layer_depth, N2 * z,
                         -N2 * mixed_layer_depth)
        noise = (1e-4 * N2 * 64.0 * rng.standard_normal(
            np.broadcast_shapes(np.shape(x), np.shape(y), np.shape(z)))
            * np.exp(z / 4))
        return strat + noise

    model.set(b=initial_buoyancy, P=1.0)

    sim = Simulation(model, dt=2 * MINUTE, stop_time=stop_time, verbose=True)
    sim.add_callback(TimeStepWizard(cfl=1.0, max_dt=2 * MINUTE),
                     IterationInterval(10))

    def progress(s):
        P = np.asarray(s.model.field("P").interior)
        print(f"iter {s.model.iteration:5d}  t={s.model.time / HOUR:.2f}h  "
              f"P∈[{P.min():.3f}, {P.max():.3f}]")

    sim.add_callback(progress, IterationInterval(100))
    sim.run()

    P = np.asarray(model.field("P").interior)[:, 0, :]
    assert np.isfinite(P).all() and (P > 0).all()
    # surface growth beats mortality: P increases near the top, shrinks at
    # depth where only mortality acts
    assert P[:, -1].mean() > P[:, 0].mean()
    return model


if __name__ == "__main__":
    main()

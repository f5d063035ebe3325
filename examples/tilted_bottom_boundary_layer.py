"""Tilted bottom boundary layer (reference:
examples/tilted_bottom_boundary_layer.jl).

An Ekman-arrested oceanic bottom boundary layer over a slope tilted 3° from
horizontal, simulated in tilted coordinates: gravity and rotation act along an
arbitrary unit vector (BuoyancyForce(gravity_unit_vector=...),
ConstantCartesianCoriolis(rotation_axis=...)); the across-slope geostrophic
flow V∞ and the background stratification N² enter as BackgroundFields; a
quadratic drag law with field_dependencies acts at the bottom."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oceananigans_tpu import (BackgroundField, FieldBoundaryConditions,
                              FluxBoundaryCondition,
                              GradientBoundaryCondition, RectilinearGrid)
from oceananigans_tpu.advection import UpwindBiased
from oceananigans_tpu.buoyancy import BuoyancyForce, BuoyancyTracer
from oceananigans_tpu.closures import ScalarDiffusivity
from oceananigans_tpu.coriolis import ConstantCartesianCoriolis
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.diagnostics import TimeStepWizard
from oceananigans_tpu.utils.schedules import IterationInterval


def main(nx=64, nz=64, stop_time=3600.0):
    Lx, Lz = 200.0, 100.0
    # bottom-refined stretched z (reference z_faces: surface refinement 1.8,
    # bottom stretching rate 10)
    refinement, stretching = 1.8, 10.0
    k = np.arange(nz + 1)
    h = (nz - k) / nz
    zeta = 1 + (h - 1) / refinement
    Sig = (1 - np.exp(-stretching * h)) / (1 - np.exp(-stretching))
    z_faces = -Lz * (zeta * Sig - 1)

    grid = RectilinearGrid(size=(nx, 1, nz), x=(0, Lx), y=(0, 1.0),
                           z=z_faces,
                           topology=("periodic", "flat", "bounded"))

    theta = 3.0  # slope angle (degrees)
    zhat = (np.sin(np.radians(theta)), 0.0, np.cos(np.radians(theta)))
    buoyancy = BuoyancyForce(BuoyancyTracer(),
                             gravity_unit_vector=tuple(-g for g in zhat))
    coriolis = ConstantCartesianCoriolis(f=1e-4, rotation_axis=zhat)

    # background stratification along true-vertical: B∞ = N²(x ẑ₁ + z ẑ₃)
    N2 = 1e-5
    b_bg = BackgroundField(
        lambda x, y, z, t, p: p["N2"] * (x * p["z1"] + z * p["z3"]),
        parameters={"N2": N2, "z1": zhat[0], "z3": zhat[2]})

    V_inf = 0.1  # across-slope geostrophic flow
    v_bg = BackgroundField(V_inf)

    # bottom drag law on the TOTAL velocity (v + V∞), reference drag_u/drag_v
    z1 = float(0.5 * (z_faces[0] + z_faces[1]))  # first cell-center height
    z0 = 0.1                                     # roughness length
    cD = (0.4 / np.log(z1 / z0)) ** 2

    def drag_u(x, y, t, u, v):
        return -cD * (u**2 + (v + V_inf) ** 2) ** 0.5 * u

    def drag_v(x, y, t, u, v):
        return -cD * (u**2 + (v + V_inf) ** 2) ** 0.5 * (v + V_inf)

    # the background buoyancy's diffusive flux must not exit the bottom
    bcs = {
        "u": FieldBoundaryConditions(bottom=FluxBoundaryCondition(
            drag_u, field_dependencies=("u", "v"))),
        "v": FieldBoundaryConditions(bottom=FluxBoundaryCondition(
            drag_v, field_dependencies=("u", "v"))),
        "b": FieldBoundaryConditions(bottom=GradientBoundaryCondition(
            -N2 * zhat[2])),
    }

    model = NonhydrostaticModel(
        grid=grid, buoyancy=buoyancy, coriolis=coriolis,
        closure=ScalarDiffusivity(nu=1e-4, kappa=1e-4),
        advection=UpwindBiased(5), tracers=("b",),
        boundary_conditions=bcs,
        background_fields={"b": b_bg, "v": v_bg})

    rng = np.random.default_rng(7)
    def noise(x, y, z):
        return 1e-3 * rng.standard_normal(np.broadcast_shapes(
            np.shape(x), np.shape(y), np.shape(z))) * np.exp(
                -(10 * z) ** 2 / Lz ** 2)
    model.set(u=noise, w=noise)

    min_dz = float(np.diff(z_faces).min())
    dt0 = 0.5 * min(min_dz / V_inf, min_dz**2 / 1e-4)
    sim = Simulation(model, dt=dt0, stop_time=stop_time, verbose=True)
    sim.add_callback(TimeStepWizard(cfl=0.7, max_change=1.1),
                     IterationInterval(4))

    def progress(s):
        u = np.asarray(s.model.field("u").interior)
        v = np.asarray(s.model.field("v").interior)
        print(f"iter {s.model.iteration:5d} t={s.model.time:8.1f}s "
              f"max|u|={np.abs(u).max():.4f} max|v'|={np.abs(v).max():.4f}")

    sim.add_callback(progress, IterationInterval(50))
    sim.run()

    u = np.asarray(model.field("u").interior)
    v = np.asarray(model.field("v").interior)
    assert np.isfinite(u).all() and np.isfinite(v).all()
    # the drag spins down the near-bottom across-slope flow: v' < 0 there
    assert v[:, :, 0].mean() < 0.0
    return model


if __name__ == "__main__":
    main()

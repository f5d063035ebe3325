"""Background (mean-flow) field decomposition (reference:
src/Models/NonhydrostaticModels/background_fields.jl +
nonhydrostatic_tendency_kernel_functions.jl:93-94, 292-293)."""

import numpy as np
import pytest

from oceananigans_tpu import BackgroundField, RectilinearGrid
from oceananigans_tpu.advection import Centered
from oceananigans_tpu.models import NonhydrostaticModel


def test_constant_background_velocity_is_galilean():
    """A constant background velocity U must transport a perturbation tracer
    identically to giving the model total velocity u' + U directly
    (Galilean equivalence of the decomposition; the cross term
    div(u', U_bg) vanishes for constant U_bg)."""
    n = 16
    U = 0.3

    def blob(x, y, z):
        return np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.02)

    grid = RectilinearGrid(size=(n, n), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    bg = NonhydrostaticModel(grid=grid, tracers=("c",),
                             advection=Centered(2),
                             background_fields={"u": U})
    tot = NonhydrostaticModel(grid=grid, tracers=("c",),
                              advection=Centered(2))
    bg.set(c=blob)
    tot.set(c=blob, u=U)
    for _ in range(20):
        bg.time_step(0.005)
        tot.time_step(0.005)
    cb = np.asarray(bg.field("c").interior)
    ct = np.asarray(tot.field("c").interior)
    # pressure projection removes the mean flow in `tot` — compare the
    # tracers, which see the same advecting velocity in both runs
    assert np.allclose(cb, ct, atol=1e-6)


def test_background_tracer_cross_term():
    """With u' = const and a linear background tracer C(x) = Gx, the
    perturbation equation gains exactly -u'·G (the cross term; reference
    kernel :293). Total tendency check: dc'/dt = -u'G."""
    n = 16
    G = 2.0
    up = 0.1
    grid = RectilinearGrid(size=(n,), extent=(1.0,),
                           topology=("periodic", "flat", "flat"))
    model = NonhydrostaticModel(
        grid=grid, tracers=("c",), advection=Centered(2),
        background_fields={"c": BackgroundField(
            lambda x, y, z, t, p: p * x, parameters=G)})
    model.set(u=up, c=0.0)
    dt = 1e-3
    nsteps = 10
    for _ in range(nsteps):
        model.time_step(dt)
    c = np.asarray(model.field("c").interior)
    # NOTE: on a periodic domain the background C = Gx is discontinuous at
    # the wrap; restrict the check to interior cells away from the seam
    mid = c[n // 4: 3 * n // 4]
    expected = -up * G * dt * nsteps
    assert np.allclose(mid, expected, rtol=0.05), (mid.mean(), expected)


def test_time_dependent_background():
    """Backgrounds may be time-dependent callables f(x, y, z, t)."""
    n = 8
    grid = RectilinearGrid(size=(n, n), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(
        grid=grid, tracers=("c",), advection=Centered(2),
        background_fields={"u": lambda x, y, z, t: 0.1 * (1.0 + t)})
    model.set(c=lambda x, y, z: np.sin(2 * np.pi * x))
    for _ in range(5):
        model.time_step(0.01)
    c = np.asarray(model.field("c").interior)
    assert np.isfinite(c).all()
    # the sinusoid must have been advected (phase shift)
    c0 = np.sin(2 * np.pi * np.asarray(grid.nodes1d(0, "c")))
    assert not np.allclose(c[:, 0, 0] if c.ndim == 3 else c[:, 0], c0,
                           atol=1e-4)


def test_background_stratification_matches_initial_condition():
    """Port of test_background_flux_divergence.jl: a linear background
    stratification B̄ = N²z carried as a BackgroundField (with gradient BCs
    absorbing ∂z B̄ at the walls) evolves the TOTAL buoyancy B = B̄ + b
    identically to carrying the full stratification in the initial
    condition."""
    from oceananigans_tpu import (RectilinearGrid, BackgroundField,
                                  BuoyancyTracer, FieldBoundaryConditions,
                                  GradientBoundaryCondition)
    from oceananigans_tpu.models import NonhydrostaticModel

    N2 = (1e-3) ** 2
    grid = RectilinearGrid(size=(1, 1, 10), x=(0, 1), y=(0, 1), z=(0, 1),
                           topology=("flat", "flat", "bounded"))

    def run(with_background):
        if with_background:
            bcs = FieldBoundaryConditions(
                bottom=GradientBoundaryCondition(-N2),
                top=GradientBoundaryCondition(0.0))
            model = NonhydrostaticModel(
                grid=grid, advection=None, tracers=("b",),
                buoyancy=BuoyancyTracer(),
                background_fields={"b": BackgroundField(
                    lambda x, y, z, t, p: p * z, parameters=N2)},
                boundary_conditions={"b": bcs})
            zc = np.asarray(grid.coord_padded(2, "c"))
            zint = zc[grid.H[2]:grid.H[2] + 10]
            offset = N2 * zint
        else:
            bcs = FieldBoundaryConditions(
                bottom=GradientBoundaryCondition(0.0),
                top=GradientBoundaryCondition(N2))
            model = NonhydrostaticModel(
                grid=grid, advection=None, tracers=("b",),
                buoyancy=BuoyancyTracer(),
                boundary_conditions={"b": bcs})
            model.set(b=lambda x, y, z: N2 * z)
            offset = 0.0
        for _ in range(5):
            model.time_step(0.1)
        b = np.asarray(model.field("b").interior)[0, 0, :]
        return b + offset

    B_bg = run(True)
    B_ic = run(False)
    assert np.isfinite(B_bg).all() and np.isfinite(B_ic).all()
    np.testing.assert_allclose(B_bg, B_ic, atol=1e-10)

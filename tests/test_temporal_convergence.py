"""Temporal convergence of the time steppers and wave-dynamics phase speeds
(reference: validation/convergence_tests time-stepper orders; the
beta-plane Rossby wave complements the internal-wave and gravity-wave
dispersion checks in tests/test_validation.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import Centered
from oceananigans_tpu.coriolis import BetaPlane, FPlane
from oceananigans_tpu.models import NonhydrostaticModel, ShallowWaterModel
from oceananigans_tpu.timesteppers import QuasiAdamsBashforth2TimeStepper


def _inertial_phase_error(timestepper, dt, T):
    """Inertial oscillation u + iv = (u0 + iv0) e^{-ift}: spatially uniform,
    so advection/pressure vanish and the error is purely temporal."""
    f = 1.0
    grid = RectilinearGrid(size=(4, 4), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"),
                           dtype=jnp.float64)
    model = NonhydrostaticModel(grid=grid, coriolis=FPlane(f=f),
                                advection=Centered(2),
                                timestepper=timestepper)
    model.set(u=1.0, v=0.0)
    n = int(round(T / dt))
    for _ in range(n):
        model.time_step(dt)
    u = float(np.asarray(model.field("u").interior).mean())
    v = float(np.asarray(model.field("v").interior).mean())
    t = n * dt
    return np.hypot(u - np.cos(f * t), v + np.sin(f * t))


def _order(errors, dts):
    return np.polyfit(np.log(dts), np.log(errors), 1)[0]


def test_rk3_temporal_order():
    """RK3 converges at ~2nd order on the inertial oscillation (the
    reference's RK3 γ/ζ combination is 3rd order only for autonomous
    diagonal problems; on rotation it is formally 2nd order — same scheme,
    same constants)."""
    T = 1.0
    dts = np.array([T / 16, T / 32, T / 64, T / 128])
    errs = [_inertial_phase_error("RungeKutta3", dt, T) for dt in dts]
    p = _order(errs, dts)
    assert p > 1.7, (p, errs)


def test_ab2_temporal_order():
    """Quasi-AB2: pure AB2 (χ = 0) is 2nd order; the reference's default
    χ = 0.1 perturbs the LTE to −χΔt²u'' and is formally 1st order (the
    documented stability/accuracy trade, timestepper χ semantics)."""
    T = 1.0
    dts = np.array([T / 32, T / 64, T / 128, T / 256])
    errs2 = [_inertial_phase_error(QuasiAdamsBashforth2TimeStepper(chi=0.0),
                                   dt, T) for dt in dts]
    p2 = _order(errs2, dts)
    assert p2 > 1.8, (p2, errs2)
    errs1 = [_inertial_phase_error("QuasiAdamsBashforth2", dt, T)
             for dt in dts]
    p1 = _order(errs1, dts)
    assert 0.8 < p1 < 1.3, (p1, errs1)


def test_rossby_wave_westward_phase_speed():
    """Barotropic Rossby wave on a beta plane: η and ψ patterns propagate
    westward at c = -β/(k² + l²) (dispersion for the rigid-lid barotropic
    mode; the shallow-water model approximates it at small surface
    deflection). Checks sign and magnitude to ~20%."""
    nx, ny = 64, 64
    Lx = Ly = 2 * np.pi * 1e6
    beta = 2e-11
    f0 = 1e-4
    gH = 9.81 * 4000.0          # deep layer: fast gravity waves, slow Rossby
    k = 2 * np.pi / Lx
    l = 2 * np.pi / Ly
    # quasi-geostrophic dispersion with finite deformation radius:
    # c = -β/(k² + l² + f0²/gH)
    c_expected = -beta / (k**2 + l**2 + f0**2 / gH)
    grid = RectilinearGrid(size=(nx, ny), x=(0, Lx), y=(0, Ly),
                           topology=("periodic", "periodic", "flat"),
                           dtype=jnp.float64)
    model = ShallowWaterModel(grid=grid, coriolis=BetaPlane(f0=f0, beta=beta),
                              gravitational_acceleration=9.81,
                              formulation="vector_invariant")
    H = 4000.0
    eta0 = 0.1

    def eta_init(x, y, z):
        return np.sin(k * x) * np.sin(l * y)

    # geostrophic initialization: u = -g/f ∂y η, v = g/f ∂x η
    g = 9.81
    model.set(h=lambda x, y, z: H + eta0 * eta_init(x, y, 0.0),
              u=lambda x, y, z: -(g * eta0 / f0) * l
              * np.sin(k * x) * np.cos(l * y),
              v=lambda x, y, z: (g * eta0 / f0) * k
              * np.cos(k * x) * np.sin(l * y))

    # track the x-phase of the k,l Fourier component of h
    def phase(m):
        h = np.asarray(m.field("h").interior)[:, :, 0] - H
        x = np.asarray(grid.nodes1d(0, "c"))
        y = np.asarray(grid.nodes1d(1, "c"))
        X, Y = np.meshgrid(x, y, indexing="ij")
        a = np.sum(h * np.sin(k * X) * np.sin(l * Y))
        b = np.sum(h * np.cos(k * X) * np.sin(l * Y))
        return np.arctan2(b, a)

    p0 = phase(model)
    dt = 150.0            # CFL ~0.3 vs sqrt(gH) ~ 198 m/s
    T = 4 * 86400.0
    n = int(T / dt)
    for _ in range(n):
        model.time_step(dt)
    p1 = phase(model)
    dphi = np.angle(np.exp(1j * (p1 - p0)))
    # h = sin(kx + φ)sin(ly) with φ = -k c t, so c = -Δφ/(k Δt)
    c_measured = -dphi / k / (n * dt)
    assert c_measured < 0                      # westward
    assert c_measured == pytest.approx(c_expected, rel=0.2), \
        (c_measured, c_expected)

"""Physics validation against exact solutions (reference analogue:
test/test_dynamics.jl + validation/convergence_tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import Centered
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import ScalarDiffusivity
from oceananigans_tpu.models import NonhydrostaticModel


def _taylor_green_error(n, nu=0.05, T=0.5, dt=2.5e-3):
    """L∞ error of u against the exact decaying Taylor-Green vortex
    u = sin x cos y e^{-2νt}, v = -cos x sin y e^{-2νt}."""
    grid = RectilinearGrid(size=(n, n), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                closure=ScalarDiffusivity(nu=nu))
    xf, yc = np.meshgrid(grid.xnodes("f"), grid.ynodes("c"), indexing="ij")
    xc, yf = np.meshgrid(grid.xnodes("c"), grid.ynodes("f"), indexing="ij")
    model.set(u=np.sin(xf) * np.cos(yc), v=-np.cos(xc) * np.sin(yf))
    steps = int(round(T / dt))
    for _ in range(steps):
        model.time_step(dt)
    decay = np.exp(-2 * nu * steps * dt)
    u = np.asarray(model.field("u").interior)[:, :, 0]
    return np.abs(u - np.sin(xf) * np.cos(yc) * decay).max()


def test_taylor_green_decay_and_convergence():
    """The decaying Taylor-Green vortex is an exact Navier-Stokes solution:
    the full advection + projection + diffusion pipeline must reproduce it
    and converge at 2nd order (Centered(2))."""
    e32 = _taylor_green_error(32)
    e64 = _taylor_green_error(64)
    assert e32 < 5e-3
    rate = np.log2(e32 / e64)
    assert rate > 1.7, (e32, e64, rate)


def test_internal_wave_frequency():
    """Small-amplitude internal gravity wave: ω² = N² k²/(k² + m²)
    (reference: test_internal_wave_dynamics.jl). Track the phase of a single
    mode and compare its oscillation frequency to the dispersion relation."""
    N2 = 1.0
    n = 32
    grid = RectilinearGrid(size=(n, 1, n), x=(0, 2 * np.pi),
                           z=(-2 * np.pi, 0.0),
                           topology=("periodic", "flat", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None,
                                buoyancy=BuoyancyTracer(), tracers=("b",))
    k, m = 1.0, 1.0
    omega = np.sqrt(N2 * k ** 2 / (k ** 2 + m ** 2))
    a = 1e-6
    # initialize a w eigenmode on the stratified background b = N² z
    model.set(b=lambda x, y, z: N2 * z,
              w=lambda x, y, z: a * np.cos(k * x) * np.sin(m * z))
    dt = 0.01
    w0 = np.asarray(model.field("w").interior)
    # step to a quarter period: the mode converts w -> buoyancy anomaly;
    # at t = π/ω the mode has flipped sign
    T_half = np.pi / omega
    steps = int(round(T_half / dt))
    for _ in range(steps):
        model.time_step(dt)
    w1 = np.asarray(model.field("w").interior)
    # w(T/2) ≈ -w(0) for the linear mode
    num = (w0 * w1).sum()
    den = np.sqrt((w0 ** 2).sum() * (w1 ** 2).sum())
    corr = num / den
    assert corr < -0.97, corr       # anti-correlated: half-period flip
    # amplitude conserved to a few percent (no spurious damping)
    amp_ratio = np.sqrt((w1 ** 2).sum() / (w0 ** 2).sum())
    assert 0.9 < amp_ratio < 1.1, amp_ratio

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_stommel_gyre_steady_state():
    """Wind-driven Stommel (1948) gyre: linear barotropic vorticity balance
    β∂ψ/∂x + r∇²ψ = curl(τ)/ρH with bottom drag has the classic analytic
    western-intensified streamfunction. The hydrostatic model with an
    implicit free surface, beta-plane rotation, a steady zonal wind-stress
    body force, and a linear-drag forcing must spin up to it (reference
    analogue: validation/stommel_gyre)."""
    import jax.numpy as jnp

    from oceananigans_tpu.coriolis import BetaPlane
    from oceananigans_tpu.forcings import ContinuousForcing
    from oceananigans_tpu.models.free_surfaces import ImplicitFreeSurface
    from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel

    beta, r, tau0, n = 1.0, 0.12, 1e-4, 48
    grid = RectilinearGrid(size=(n, n, 1), x=(0.0, 1.0), y=(0.0, 1.0),
                           z=(-1.0, 0.0),
                           topology=("bounded", "bounded", "bounded"))
    wind = ContinuousForcing(
        lambda x, y, z, t: -tau0 * jnp.cos(jnp.pi * y), loc=("f", "c", "c"))
    drag_u = ContinuousForcing(lambda x, y, z, t, u: -r * u,
                               loc=("f", "c", "c"), field_dependencies=("u",))
    drag_v = ContinuousForcing(lambda x, y, z, t, v: -r * v,
                               loc=("c", "f", "c"), field_dependencies=("v",))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=None, tracers=(),
        coriolis=BetaPlane(f0=2.0, beta=beta),
        free_surface=ImplicitFreeSurface(gravitational_acceleration=10.0),
        forcing=dict(u=(wind, drag_u), v=drag_v))
    dt, T = 0.01, 10.0 / r
    for _ in range(int(T / dt)):
        model.time_step(dt)

    u = np.asarray(model.field("u").interior)[:, :, 0]
    v = np.asarray(model.field("v").interior)[:, :, 0]

    # analytic Stommel solution: ψ = γ(b/π)² sin(πy/b)(1 - p e^{Ax} - q e^{Bx})
    lam = b = 1.0
    gamma = tau0 * np.pi / (r * b)
    disc = np.sqrt(beta ** 2 + 4 * r ** 2 * (np.pi / b) ** 2)
    A = (-beta + disc) / (2 * r)
    B = (-beta - disc) / (2 * r)
    p = (1 - np.exp(B * lam)) / (np.exp(A * lam) - np.exp(B * lam))
    q = 1 - p
    xf = np.asarray(grid.xnodes("f"))
    yc = np.asarray(grid.ynodes("c"))
    xc = np.asarray(grid.xnodes("c"))
    yf = np.asarray(grid.ynodes("f"))
    Xf, Yc = np.meshgrid(xf, yc, indexing="ij")
    Xc, Yf = np.meshgrid(xc, yf, indexing="ij")
    u_exact = -gamma * (b / np.pi) * np.cos(np.pi * Yc / b) * (
        1 - p * np.exp(A * Xf) - q * np.exp(B * Xf))
    v_exact = -gamma * (b / np.pi) ** 2 * np.sin(np.pi * Yf / b) * (
        p * A * np.exp(A * Xc) + q * B * np.exp(B * Xc))

    for num, ex in ((u, u_exact), (v, v_exact)):
        corr = (num * ex).sum() / np.sqrt((num ** 2).sum() * (ex ** 2).sum())
        rel = np.linalg.norm(num - ex) / np.linalg.norm(ex)
        assert corr > 0.97, corr
        assert rel < 0.4, rel       # boundary-layer resolution limited
    # western intensification: the boundary current on the western quarter
    # dwarfs the eastern interior return flow
    v_west = np.abs(v[: n // 4]).max()
    v_east = np.abs(v[n // 2:]).max()
    assert v_west > 3 * v_east, (v_west, v_east)


def test_solid_body_rotation_cosine_bell():
    """Williamson et al. (1992) test case 1 (equatorial flow): a cosine bell
    advected once around the sphere by solid-body rotation u = U cos φ must
    return to its initial position with small shape error and exact mass
    conservation — an end-to-end check of the LatitudeLongitudeGrid metric
    terms (reference analogue: validation/solid_body_rotation)."""
    import jax.numpy as jnp

    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.advection import WENO
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel, PrescribedVelocityFields)

    R, U, nlam, nphi = 1.0, 1.0, 128, 64
    grid = LatitudeLongitudeGrid(size=(nlam, nphi, 1),
                                 longitude=(-180.0, 180.0),
                                 latitude=(-80.0, 80.0), z=(-1.0, 0.0),
                                 radius=R)
    vel = PrescribedVelocityFields(
        u=lambda lam, phi, z, t: U * jnp.cos(jnp.deg2rad(phi)))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("c",), tracer_advection=WENO(5), velocities=vel,
        timestepper="SplitRungeKutta3")

    lam0, phi0, rr = np.deg2rad(-90.0), 0.0, 0.5

    def bell(lam, phi, z):
        lamr, phir = jnp.deg2rad(lam), jnp.deg2rad(phi)
        d = R * jnp.arccos(jnp.clip(
            np.sin(phi0) * jnp.sin(phir)
            + np.cos(phi0) * jnp.cos(phir) * jnp.cos(lamr - lam0), -1, 1))
        return jnp.where(d < rr, 0.5 * (1 + jnp.cos(np.pi * d / rr)), 0.0)

    model.set(c=bell)
    c0 = np.asarray(model.field("c").interior)[:, :, 0]
    T = 2 * np.pi * R / U
    steps = int(round(T / (0.4 * (2 * np.pi * R / nlam) / U)))
    dt = T / steps
    for _ in range(steps):
        model.time_step(dt)
    c1 = np.asarray(model.field("c").interior)[:, :, 0]
    l2 = np.linalg.norm(c1 - c0) / np.linalg.norm(c0)
    assert l2 < 0.05, l2
    assert abs(c1.sum() - c0.sum()) < 1e-10 * abs(c0.sum())
    assert c1.min() > -1e-3                       # essentially non-oscillatory
    assert abs(c1.max() - 1.0) < 0.05             # peak retained


def test_vertically_implicit_w_diffusion_taylor_green():
    """x-z Taylor-Green vortex (u = sin x cos z, w = -cos x sin z) between
    free-slip walls decays as e^{-2νt}. With VerticallyImplicitTimeDiscretization
    the vertical half of w's dissipation comes from the face-located implicit
    solve (reference: vertically_implicit_diffusion_solver.jl ::Face
    coefficients) — if that solve were skipped, w would decay as e^{-νt}."""
    from oceananigans_tpu.closures import VerticalScalarDiffusivity
    from oceananigans_tpu.closures.scalar_diffusivity import ScalarDiffusivity

    nu, T, dt, n = 0.05, 0.5, 2.5e-3, 32
    for closure in (
            ScalarDiffusivity(nu=nu, time_discretization="vertically_implicit"),
            ScalarDiffusivity(nu=nu)):
        grid = RectilinearGrid(size=(n, 1, n), x=(0, 2 * np.pi),
                               z=(0, np.pi),
                               topology=("periodic", "flat", "bounded"))
        model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                    closure=closure)
        xf, zc = np.meshgrid(grid.xnodes("f"), grid.znodes("c"),
                             indexing="ij")
        xc, zf = np.meshgrid(grid.xnodes("c"), grid.znodes("f")[:n],
                             indexing="ij")
        model.set(u=np.sin(xf)[:, None, :] * np.cos(zc)[:, None, :],
                  w=-np.cos(xc)[:, None, :] * np.sin(zf)[:, None, :])
        steps = int(round(T / dt))
        for _ in range(steps):
            model.time_step(dt)
        decay = np.exp(-2 * nu * steps * dt)
        u = np.asarray(model.field("u").interior)[:, 0, :]
        w = np.asarray(model.field("w").interior)[:, 0, :n]
        eu = np.abs(u - np.sin(xf) * np.cos(zc) * decay).max()
        ew = np.abs(w + np.cos(xc) * np.sin(zf) * decay).max()
        assert eu < 6e-3, (closure.time_discretization, eu)
        assert ew < 6e-3, (closure.time_discretization, ew)


@pytest.mark.slow
def test_lid_driven_cavity_ghia():
    """Steady lid-driven cavity at Re = 100 vs the Ghia, Ghia & Shin (1982)
    benchmark (Table I/II): centerline velocity extrema and their positions
    (reference analogue: validation/lid_driven_cavity). Exercises Value
    (no-slip / moving-wall) boundary conditions, the pressure projection on
    a doubly-bounded grid, and viscous steady states."""
    from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                      ValueBoundaryCondition)
    from oceananigans_tpu.closures import ScalarDiffusivity as _SD

    Re, n, dt, T = 100.0, 64, 0.004, 25.0
    grid = RectilinearGrid(size=(n, 1, n), x=(0.0, 1.0), y=(0, 1),
                           z=(0.0, 1.0),
                           topology=("bounded", "flat", "bounded"))
    u_bcs = FieldBoundaryConditions(top=ValueBoundaryCondition(1.0),
                                    bottom=ValueBoundaryCondition(0.0))
    w_bcs = FieldBoundaryConditions(west=ValueBoundaryCondition(0.0),
                                    east=ValueBoundaryCondition(0.0))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                closure=_SD(nu=1.0 / Re),
                                boundary_conditions=dict(u=u_bcs, w=w_bcs))
    for _ in range(int(T / dt)):
        model.time_step(dt)

    u = np.asarray(model.field("u").interior)[:, 0, :]
    w = np.asarray(model.field("w").interior)[:, 0, :]
    zc = np.asarray(grid.znodes("c"))
    xc = np.asarray(grid.xnodes("c"))
    u_line = u[n // 2, :]      # vertical centerline x = 0.5
    w_line = w[:, n // 2]      # horizontal centerline z = 0.5

    # Ghia et al. (1982), Re = 100 (129² fine-grid reference values):
    # u_min = -0.21090 at y = 0.4531; v_max = 0.17527 at x = 0.2344;
    # v_min = -0.24533 at x = 0.8047
    assert abs(u_line.min() - (-0.21090)) < 0.01, u_line.min()
    assert abs(zc[np.argmin(u_line)] - 0.4531) < 2.5 / n
    assert abs(w_line.max() - 0.17527) < 0.01, w_line.max()
    assert abs(xc[np.argmax(w_line)] - 0.2344) < 2.5 / n
    assert abs(w_line.min() - (-0.24533)) < 0.012, w_line.min()
    assert abs(xc[np.argmin(w_line)] - 0.8047) < 2.5 / n


def test_ekman_spiral():
    """Steady Ekman (1905) spiral: wind stress over a rotating, uniformly
    viscous column gives u+iv = (τ/√(fν)) e^{z/d} e^{i(z/d − π/4)} with
    d = √(2ν/f) — surface current 45° to the right of the wind, speed
    τ/√(fν). Validates the Coriolis / vertically-implicit-diffusion /
    flux-BC interplay. Inertial oscillations are removed by averaging over
    one inertial period."""
    from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                      FluxBoundaryCondition)
    from oceananigans_tpu.closures import ScalarDiffusivity as _SD
    from oceananigans_tpu.coriolis import FPlane

    f, nu, tau = 1e-4, 1e-2, 1e-4
    d = np.sqrt(2 * nu / f)
    grid = RectilinearGrid(size=(1, 1, 50), x=(0, 1), y=(0, 1),
                           z=(-100.0, 0.0),
                           topology=("periodic", "periodic", "bounded"))
    # outward-flux convention: a wind along +x pumps u-momentum IN through
    # the top ⇒ negative top flux (reference: ocean_wind_mixing example)
    u_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(-tau))
    model = NonhydrostaticModel(
        grid=grid, advection=None, coriolis=FPlane(f),
        closure=_SD(nu=nu, time_discretization="vertically_implicit"),
        boundary_conditions=dict(u=u_bcs))
    dt = 300.0
    steps_per = int(2 * np.pi / f / dt)
    for _ in range(9 * steps_per):
        model.time_step(dt)
    acc = 0
    for _ in range(steps_per):
        model.time_step(dt)
        acc = acc + (np.asarray(model.field("u").interior)[0, 0, :]
                     + 1j * np.asarray(model.field("v").interior)[0, 0, :])
    w_num = acc / steps_per
    zc = np.asarray(grid.znodes("c"))
    w_exact = tau / np.sqrt(f * nu) * np.exp(zc / d) \
        * np.exp(1j * (zc / d - np.pi / 4))
    corr = np.abs(np.vdot(w_exact, w_num)) / (
        np.linalg.norm(w_exact) * np.linalg.norm(w_num))
    assert corr > 0.999, corr
    assert abs(np.abs(w_num[-1]) / np.abs(w_exact[-1]) - 1) < 0.02
    # surface deflection ≈ 45° to the right of the wind
    ang = np.angle(w_num[-1], deg=True)
    assert -55 < ang < -40, ang


def test_rossby_geostrophic_adjustment():
    """Rossby's geostrophic adjustment: an initial step in the free surface
    adjusts to the analytic steady state η∞ = -η₀ sgn(x)(1 - e^{-|x|/Lr})
    with the geostrophic jet v∞ = -(gη₀/fLr) e^{-|x|/Lr}, Lr = √(gH)/f
    (inertia-gravity transients removed by a one-inertial-period average)."""
    from oceananigans_tpu.coriolis import FPlane
    from oceananigans_tpu.models.shallow_water import ShallowWaterModel

    g, H0, f, n = 10.0, 1.0, 1.0, 1024
    Lr = np.sqrt(g * H0) / f
    L = 80 * Lr
    grid = RectilinearGrid(size=(n,), x=(-L / 2, L / 2),
                           topology=("periodic", "flat", "flat"))
    m = ShallowWaterModel(grid=grid, gravitational_acceleration=g,
                          coriolis=FPlane(f))
    eta0, a = 1e-3, 0.5
    xc = np.asarray(grid.xnodes("c"))
    etai = -eta0 * (np.tanh(xc / a) - np.tanh((xc - L / 2) / a)
                    - np.tanh((xc + L / 2) / a))
    m.set(h=(H0 + etai)[:, None, None], uh=0.0, vh=0.0)
    dt = 0.4 * (L / n) / np.sqrt(g * H0)
    for _ in range(int(5.0 / dt)):
        m.time_step(dt)
    acc_v = acc_e = 0.0
    ns = int(2 * np.pi / dt)
    for _ in range(ns):
        m.time_step(dt)
        h = np.asarray(m.field("h").interior).ravel()
        acc_e = acc_e + (h - H0)
        acc_v = acc_v + np.asarray(m.field("vh").interior).ravel() / h
    e_num, v = acc_e / ns, acc_v / ns
    sel = np.abs(xc) < 5 * Lr
    eta_inf = -eta0 * np.sign(xc) * (1 - np.exp(-np.abs(xc) / Lr))
    v_inf = -(g * eta0 / (f * Lr)) * np.exp(-np.abs(xc) / Lr)
    for num, ex, tol in ((e_num[sel], eta_inf[sel], 0.06),
                         (v[sel], v_inf[sel], 0.1)):
        corr = (num * ex).sum() / np.sqrt((num ** 2).sum() * (ex ** 2).sum())
        rel = np.linalg.norm(num - ex) / np.linalg.norm(ex)
        assert corr > 0.995, corr
        assert rel < tol, rel


def test_coastal_kelvin_wave():
    """A coastal Kelvin wave propagates along the wall (wall to its right,
    NH) at c = √(gH) without dispersion, trapped offshore with the
    deformation-radius e-folding (reference analogue: the Kelvin-wave
    dynamics the hydrostatic test suite exercises)."""
    from oceananigans_tpu.coriolis import FPlane
    from oceananigans_tpu.models.shallow_water import ShallowWaterModel

    g, H0, f = 10.0, 1.0, 1.0
    c = np.sqrt(g * H0)
    Lr = c / f
    Lx, Ly, nx, ny = 60 * Lr, 10 * Lr, 256, 64
    grid = RectilinearGrid(size=(nx, ny), x=(0, Lx), y=(0, Ly),
                           topology=("periodic", "bounded", "flat"))
    m = ShallowWaterModel(grid=grid, gravitational_acceleration=g,
                          coriolis=FPlane(f))
    eta0, x0, sx = 1e-3, 10 * Lr, 2 * Lr
    xc, yc = np.asarray(grid.xnodes("c")), np.asarray(grid.ynodes("c"))
    X, Y = np.meshgrid(xc, yc, indexing="ij")
    eta = eta0 * np.exp(-((X - x0) / sx) ** 2) * np.exp(-Y / Lr)
    xf = np.asarray(grid.xnodes("f"))
    Xf, Yf = np.meshgrid(xf, yc, indexing="ij")
    uf = (g / (f * Lr)) * eta0 * np.exp(-((Xf - x0) / sx) ** 2) \
        * np.exp(-Yf / Lr)
    m.set(h=(H0 + eta)[:, :, None], uh=(uf * H0)[:, :, None], vh=0.0)
    dt = 0.3 * (Lx / nx) / c
    travel = 20 * Lr
    for _ in range(int(travel / c / dt)):
        m.time_step(dt)
    eta1 = np.asarray(m.field("h").interior)[:, :, 0] - H0
    row = eta1[:, 0]
    ipk = int(np.argmax(row))
    assert abs(xc[ipk] - (x0 + travel)) < 3 * (Lx / nx), xc[ipk]
    assert 0.9 < row.max() / (eta0 * np.exp(-yc[0] / Lr)) < 1.05
    # offshore e-folding ≈ Lr over the first 3 Lr
    prof = eta1[ipk, :]
    k3 = int(np.searchsorted(yc, 3 * Lr))
    slope = np.polyfit(yc[:k3], np.log(prof[:k3]), 1)[0]
    assert abs(-1 / slope - Lr) / Lr < 0.15, -1 / slope


@pytest.mark.parametrize("time_discretization", ["explicit", "implicit"])
def test_stratified_startup_couette(time_discretization):
    """Impulsively-started stratified plane Couette flow vs the analytic
    transient (reference analogue: validation/stratified_couette_flow).

    u(ζ, t)/U = ζ + (2/π) Σₙ ((-1)ⁿ/n) e^{-n²π²νt/H²} sin(nπζ),  ζ=(z+H)/H,
    with u(top) = U, u(bottom) = 0 imposed as Value BCs. A linear buoyancy
    profile held by Value BCs at its endpoints is an exact steady state of
    the diffusion operator, so it must stay linear while u evolves —
    exercising Value BCs and the (explicit and vertically-implicit)
    diffusion solves against a nontrivial exact solution."""
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, ValueBoundaryCondition)
    from oceananigans_tpu.closures import (
        ExplicitTimeDiscretization, VerticallyImplicitTimeDiscretization)

    H, U, nu, nz = 1.0, 1.0, 1.0, 64
    grid = RectilinearGrid(size=(1, 1, nz), x=(0, 1.0), y=(0, 1.0),
                           z=(-H, 0.0),
                           topology=("flat", "flat", "bounded"))
    td = (ExplicitTimeDiscretization() if time_discretization == "explicit"
          else VerticallyImplicitTimeDiscretization())
    closure = ScalarDiffusivity(nu=nu, kappa=nu, time_discretization=td)
    u_bcs = FieldBoundaryConditions(top=ValueBoundaryCondition(U),
                                    bottom=ValueBoundaryCondition(0.0))
    N2 = 4.0
    b_bcs = FieldBoundaryConditions(top=ValueBoundaryCondition(0.0),
                                    bottom=ValueBoundaryCondition(-N2 * H))
    model = NonhydrostaticModel(grid=grid, closure=closure,
                                buoyancy=BuoyancyTracer(), tracers=("b",),
                                boundary_conditions={"u": u_bcs,
                                                     "b": b_bcs})
    model.set(u=0.0, b=lambda x, y, z: N2 * z)

    dz = H / nz
    dt = (0.2 * dz**2 / nu if time_discretization == "explicit"
          else 2.5e-4)
    T = 0.05
    steps = int(round(T / dt))
    for _ in range(steps):
        model.time_step(dt)
    t = steps * dt

    z = np.asarray(grid.znodes("c"))
    zeta = (z + H) / H
    exact = zeta.copy()
    for n in range(1, 200):
        exact += (2 / np.pi) * ((-1) ** n / n) \
            * np.exp(-(n * np.pi) ** 2 * nu * t / H**2) \
            * np.sin(n * np.pi * zeta)
    exact *= U

    u = np.asarray(model.field("u").interior)[0, 0]
    b = np.asarray(model.field("b").interior)[0, 0]
    err_u = np.abs(u - exact).max()
    err_b = np.abs(b - N2 * z).max()
    # 2nd-order space; implicit backward-Euler pays an O(dt) transient tax
    tol = 6e-3 if time_discretization == "explicit" else 2e-2
    assert err_u < tol, (time_discretization, err_u)
    assert err_b < 1e-6 * N2 * H, err_b


def test_vortex_exits_open_boundary_without_reflection():
    """Open-boundary validation breadth (reference: validation/
    open_boundaries/ — structures must EXIT through an Open +
    PerturbationAdvection boundary without reflecting): a Gaussian vortex
    carried by a uniform flow leaves through the east boundary; the
    interior enstrophy afterwards is a small fraction of the initial
    (reflection would trap rotational energy)."""
    from oceananigans_tpu import (FieldBoundaryConditions,
                                  OpenBoundaryCondition, RectilinearGrid)
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.boundary_conditions import PerturbationAdvection
    from oceananigans_tpu.models import NonhydrostaticModel

    U0, A, s = 0.5, 0.05, 0.3
    nx, ny = 64, 32
    grid = RectilinearGrid(size=(nx, ny), x=(0, 4.0), y=(-1.0, 1.0),
                           topology=("bounded", "periodic", "flat"))
    u_bcs = FieldBoundaryConditions(
        west=OpenBoundaryCondition(U0),
        east=OpenBoundaryCondition(U0, scheme=PerturbationAdvection(
            inflow_timescale=0.1)))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                boundary_conditions={"u": u_bcs})
    x0, y0 = 1.0, 0.0

    def psi(x, y):
        return A * np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / s ** 2)

    eps = 1e-5
    model.set(u=lambda x, y, z: U0 - (psi(x, y + eps) - psi(x, y - eps))
              / (2 * eps),
              v=lambda x, y, z: (psi(x + eps, y) - psi(x - eps, y))
              / (2 * eps))

    def enstrophy(m):
        # bounded x: u has nx+1 faces — trim to nx for the finite-difference
        u = np.asarray(m.field("u").interior)[..., 0][:nx]
        v = np.asarray(m.field("v").interior)[..., 0][:nx]
        dx, dy = 4.0 / nx, 2.0 / ny
        zeta = (np.gradient(v, dx, axis=0) - np.gradient(u, dy, axis=1))
        return float((zeta ** 2).sum())

    z0 = enstrophy(model)
    dt = 0.008
    # advect the vortex out: U0·t = 4.5 ≥ (Lx − x0) + a margin
    for _ in range(1125):
        model.time_step(dt)
    z1 = enstrophy(model)
    u = np.asarray(model.field("u").interior)
    assert np.isfinite(u).all()
    assert z1 < 0.06 * z0, z1 / z0
    assert np.abs(u - U0).max() < 0.3 * A / s, np.abs(u - U0).max()


def test_barotropic_gyre_on_the_sphere():
    """Wind-driven barotropic gyre on a spherical sector
    (validation/barotropic_gyre/barotropic_gyre.jl): lat-lon grid,
    enstrophy-conserving spherical Coriolis, implicit free surface
    (g = 0.1), a cosine surface wind-stress flux BC, linear bottom drag
    through a field-dependent flux BC, and horizontal Laplacian viscosity.
    During spin-up the circulation is western-intensified (the Munk
    boundary layer: meridional speeds on the western quarter dwarf the
    eastern interior) and the energy is bounded. The wind stress is scaled
    to the linear Munk regime (δ_Munk ≈ 2Δy > δ_inertial) so the gyre is
    resolvable at test resolution; the reference's τ₀ = 1e-2 at a marginal
    δ_Munk/Δ drives an inertial runaway on any grid this coarse."""
    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FluxBoundaryCondition)
    from oceananigans_tpu.closures import HorizontalScalarDiffusivity
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
    from oceananigans_tpu.models.free_surfaces import ImplicitFreeSurface
    from oceananigans_tpu.models.hydrostatic import \
        HydrostaticFreeSurfaceModel

    n = 32
    grid = LatitudeLongitudeGrid(size=(n, n, 1), longitude=(-30, 30),
                                 latitude=(15, 65), z=(-4000.0, 0.0))
    tau0, Lphi, phi0 = 1e-3, 50.0, 15.0

    def wind_stress(lam, phi, t):
        return tau0 * jnp.cos(2 * jnp.pi * (phi - phi0) / Lphi)

    mu = 1.0 / (60 * 24 * 3600.0)  # 1/60 days linear bottom drag

    def u_drag(lam, phi, t, u):
        return -mu * u

    def v_drag(lam, phi, t, v):
        return -mu * v

    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=(),
        coriolis=HydrostaticSphericalCoriolis(
            scheme="enstrophy_conserving"),
        free_surface=ImplicitFreeSurface(gravitational_acceleration=9.81),
        closure=HorizontalScalarDiffusivity(nu=5e5),
        boundary_conditions={
            "u": FieldBoundaryConditions(
                top=FluxBoundaryCondition(wind_stress),
                bottom=FluxBoundaryCondition(u_drag,
                                             field_dependencies=("u",))),
            "v": FieldBoundaryConditions(
                bottom=FluxBoundaryCondition(v_drag,
                                             field_dependencies=("v",)))})
    dt = 1800.0
    for _ in range(480):          # 10 days
        model.time_step(dt)

    u = np.asarray(model.field("u").interior)[:, :, 0]
    v = np.asarray(model.field("v").interior)[:, :, 0]
    eta = np.asarray(model.field("eta").interior)
    assert np.isfinite(u).all() and np.isfinite(v).all()
    assert np.isfinite(eta).all()
    # the gyre actually spun up
    assert np.abs(u).max() > 0.05, np.abs(u).max()
    # bounded by the viscous/drag balance (no runaway)
    assert np.abs(u).max() < 2.0 and np.abs(v).max() < 2.0
    # western intensification
    v_west = np.abs(v[: n // 4]).max()
    v_east = np.abs(v[n // 2:]).max()
    assert v_west > 2.5 * v_east, (v_west, v_east)

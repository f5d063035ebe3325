"""Cubed-sphere shallow-water model: Williamson et al. (1992) test case 2
(steady geostrophic flow) + exact global mass conservation.

Reference analogue: the cubed-sphere shallow-water validation cases in
validation/multi_region + test/test_cubed_spheres.jl."""

import numpy as np
import pytest

from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.models.cubed_sphere_shallow_water import \
    CubedSphereShallowWaterModel

R = 6.37122e6
OMEGA_E = 7.292e-5
G = 9.80616
U0 = 2 * np.pi * R / (12 * 86400.0)          # ~38.6 m/s
H0 = 2.94e4 / G                              # ~2998 m


@pytest.fixture(scope="module")
def tc2():
    grid = ConformalCubedSphereGrid((24, 24), radius=R)
    model = CubedSphereShallowWaterModel(grid, gravity=G,
                                         rotation_rate=OMEGA_E)
    model.set_geographic(
        h=lambda lam, phi: H0 - (R * OMEGA_E * U0 + 0.5 * U0 ** 2)
        * np.sin(phi) ** 2 / G,
        u_east=lambda lam, phi: U0 * np.cos(phi),
        v_north=lambda lam, phi: 0.0 * lam)
    return model


def _tc2_model(N, **kwargs):
    """Williamson TC2 balanced zonal jet on an N x N-panel sphere."""
    import jax.numpy as jnp
    a, Om, g = 6.37122e6, 7.292e-5, 9.80616
    U, H0 = 20.0, 8000.0
    grid = ConformalCubedSphereGrid((N, N), radius=a, dtype=jnp.float64)
    m = CubedSphereShallowWaterModel(grid, gravity=g, rotation_rate=Om,
                                     **kwargs)
    m.set_geographic(
        h=lambda lam, phi: H0 - (a * Om * U + 0.5 * U * U)
        * np.sin(phi) ** 2 / g,
        u_east=lambda lam, phi: U * np.cos(phi),
        v_north=lambda lam, phi: 0.0 * lam)
    dt = 0.3 * (2 * np.pi * a / (4 * N) * 0.6) / np.sqrt(g * H0)
    return m, grid, U, dt


def _tc2_drift(m, grid, U, dt, steps):
    u0 = np.asarray(m.state["u"]).copy()
    for _ in range(steps):
        m.time_step(dt)
    H, N = grid.H[0], grid.N[0]
    sl = (slice(None), slice(H, H + N), slice(H, H + N))
    return np.abs(np.asarray(m.state["u"]) - u0)[sl].max() / U


def test_williamson2_steady_state(tc2):
    """The zonal geostrophic state is an exact steady solution: after a day
    of integration the thickness field must stay put to discretization
    error — any inter-panel exchange inconsistency (sign, index, metric)
    destroys the balance within a few steps."""
    model = tc2
    h_init = np.asarray(model.state["h"]).copy()
    dt = 300.0
    steps = 288                               # one model day
    m0 = model.total_mass()
    for _ in range(steps):
        model.time_step(dt)
    h = np.asarray(model.state["h"])
    assert np.isfinite(h).all()
    grid = model.grid
    H, N = grid.H[0], grid.N[0]
    sl = (slice(None), slice(H, H + N), slice(H, H + N))
    rel = np.abs(h[sl] - h_init[sl]).max() / H0
    assert rel < 0.02, rel
    # global mass conservation to f32 update roundoff: shared-edge fluxes
    # cancel pairwise (synced duplicated faces), the only drift is the
    # (flux/Az)·Az round-trip in each cell update
    m1 = model.total_mass()
    assert abs(m1 / m0 - 1) < 2e-5, (m0, m1)


def test_duplicated_edge_faces_stay_consistent(tc2):
    """The shared boundary faces are stored once per adjacent panel; both
    copies must evolve identically (up to the edge-rotation sign)."""
    model = tc2
    grid = model.grid
    H, N = grid.H[0], grid.N[0]
    u = np.asarray(model.state["u"])
    v = np.asarray(model.state["v"])
    for (p, s), (q, t, rev) in grid.connectivity.items():
        if s != "east" or t != "west" or rev:
            continue
        R2 = grid.edge_rotations[(p, s)]
        mine = u[p, H + N, H:H + N, 0]
        theirs = u[q, H, H:H + N, 0]
        scale = np.abs(mine).max() + 1e-30
        assert np.abs(mine - R2[0, 0] * theirs).max() / scale < 1e-5, (p, q)


def test_rossby_haurwitz_tc6_phase_speed():
    """Williamson et al. (1992) test case 6: the wavenumber-4
    Rossby-Haurwitz wave translates eastward at the analytic angular speed
    nu = [R(3+R)w - 2*Omega]/[(1+R)(2+R)] with its shape retained — a
    global dynamics validation of the cubed-sphere shallow-water model
    (vorticity flux, vertex treatment, panel exchanges)."""
    import jax.numpy as jnp

    a, Om, g = 6.37122e6, 7.292e-5, 9.80616
    K = w = 7.848e-6
    Rw, h0 = 4.0, 8000.0

    def u_east(lam, phi):
        c = np.cos(phi)
        return a * w * c + a * K * c ** (Rw - 1) * (
            Rw * np.sin(phi) ** 2 - c ** 2) * np.cos(Rw * lam)

    def v_north(lam, phi):
        return -a * K * Rw * np.cos(phi) ** (Rw - 1) * np.sin(phi) \
            * np.sin(Rw * lam)

    def h_field(lam, phi):
        c = np.cos(phi)
        A = w / 2 * (2 * Om + w) * c ** 2 + 0.25 * K ** 2 * c ** (2 * Rw) \
            * ((Rw + 1) * c ** 2 + (2 * Rw ** 2 - Rw - 2)
               - 2 * Rw ** 2 * c ** (-2.0))
        B = (2 * (Om + w) * K) / ((Rw + 1) * (Rw + 2)) * c ** Rw * (
            (Rw ** 2 + 2 * Rw + 2) - (Rw + 1) ** 2 * c ** 2)
        C = 0.25 * K ** 2 * c ** (2 * Rw) * ((Rw + 1) * c ** 2 - (Rw + 2))
        return h0 + (a * a * A + a * a * B * np.cos(Rw * lam)
                     + a * a * C * np.cos(2 * Rw * lam)) / g

    N = 16
    grid = ConformalCubedSphereGrid((N, N), radius=a, dtype=jnp.float64)
    m = CubedSphereShallowWaterModel(grid, gravity=g, rotation_rate=Om)
    m.set_geographic(h=h_field, u_east=u_east, v_north=v_north)

    nu_rh = (Rw * (3 + Rw) * w - 2 * Om) / ((1 + Rw) * (2 + Rw))
    dt = 0.35 * (2 * np.pi * a / (4 * N) * 0.6) / np.sqrt(g * h0)
    steps = int(2.0 * 86400 / dt)
    for _ in range(steps):
        m.time_step(dt)
    t = m.time

    H = grid.H[0]
    sl = (slice(None), slice(H, H + N), slice(H, H + N))
    h_num = np.asarray(m.state["h"])[sl]
    lams, phis = [], []
    for p in range(6):
        ext = grid.extended_nodes[p]
        NP = N + 2 * H
        Pxm = ext[:-1] + ext[1:]
        Pxm = Pxm / np.linalg.norm(Pxm, axis=-1, keepdims=True)
        Pc = Pxm[:, :-1] + Pxm[:, 1:]
        Pc = (Pc / np.linalg.norm(Pc, axis=-1, keepdims=True))[:NP, :NP]
        lams.append(np.arctan2(Pc[..., 1], Pc[..., 0])[H:H + N, H:H + N])
        phis.append(np.arcsin(np.clip(Pc[..., 2], -1, 1))[H:H + N, H:H + N])
    lams, phis = np.stack(lams), np.stack(phis)

    def corr_with(shift):
        ref = h_field(lams - shift, phis)[..., None]
        x = (h_num - h_num.mean()).ravel()
        y = (ref - ref.mean()).ravel()
        return (x * y).sum() / np.sqrt((x * x).sum() * (y * y).sum())

    c_rot = corr_with(nu_rh * t)
    c_sta = corr_with(0.0)
    assert c_rot > 0.98, c_rot
    assert c_rot - c_sta > 0.15, (c_rot, c_sta)
    shifts = np.linspace(0, 2 * nu_rh * t, 41)
    best = shifts[int(np.argmax([corr_with(s) for s in shifts]))]
    assert abs(best - nu_rh * t) < 0.25 * nu_rh * t, (best, nu_rh * t)


def test_energy_and_mass_conservation():
    """The Sadourny energy-conserving PV flux + RK3 conserves total energy
    (KE + PE) to time-truncation level and mass to roundoff on a strongly
    nonlinear global state."""
    import jax.numpy as jnp

    from oceananigans_tpu.operators.operators import LOC_CCC, ix_c, iy_c

    a, Om, g = 6.37122e6, 7.292e-5, 9.80616
    grid = ConformalCubedSphereGrid((12, 12), radius=a, dtype=jnp.float64)
    m = CubedSphereShallowWaterModel(grid, gravity=g, rotation_rate=Om)
    m.set_geographic(
        h=lambda lam, phi: 3000 + 200 * np.cos(3 * lam) * np.cos(phi) ** 2,
        u_east=lambda lam, phi: 15 * np.cos(phi)
        + 5 * np.cos(2 * lam) * np.sin(2 * phi),
        v_north=lambda lam, phi: 5 * np.sin(lam) * np.cos(phi))
    H, N = grid.H[0], grid.N[0]

    def energy():
        tot = 0.0
        for p in range(6):
            gp = grid.panel_grids[p]
            h, u, v = (m.state[k][p] for k in ("h", "u", "v"))
            ke = 0.5 * h * (ix_c(gp, u * u) + iy_c(gp, v * v))
            pe = 0.5 * g * h * h
            Az = jnp.asarray(np.asarray(gp.Az(LOC_CCC)))
            tot += float(jnp.sum(((ke + pe) * Az)[H:H + N, H:H + N]))
        return tot

    E0, M0 = energy(), m.total_mass()
    dt = 0.3 * (2 * np.pi * a / 48 * 0.6) / np.sqrt(g * 3200)
    for _ in range(60):
        m.time_step(dt)
    assert abs(energy() - E0) / E0 < 1e-5
    assert abs(m.total_mass() - M0) / M0 < 1e-12


def test_enstrophy_conserving_pv_scheme():
    """The Sadourny enstrophy-conserving variant (reference:
    VectorInvariant EnstrophyConserving) runs stably, conserves mass to
    roundoff, and reproduces TC2 geostrophic balance like the energy form."""
    m, grid, U, dt = _tc2_model(12, pv_scheme="enstrophy_conserving")
    M0 = m.total_mass()
    drift = _tc2_drift(m, grid, U, dt, 40)
    assert drift < 0.02, drift
    assert abs(m.total_mass() - M0) / M0 < 1e-12


@pytest.mark.slow
def test_tc2_resolution_convergence():
    """TC2 geostrophic-balance drift converges with panel resolution
    (measured order ~1.8 from 8² to 16², ~1.5 to 32² — second-order
    interior scheme with the valence-3 vertex treatment)."""
    import jax.numpy as jnp

    T = 86400.0
    errs = {}
    for N in (8, 16):
        m, grid, U, dt = _tc2_model(N)
        errs[N] = _tc2_drift(m, grid, U, dt, int(T / dt))
    order = np.log2(errs[8] / errs[16])
    assert order > 1.4, (errs, order)

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

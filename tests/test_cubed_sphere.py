"""Cubed-sphere panel + composition tests (reference analogue:
test/test_cubed_spheres.jl, MultiRegion cubed-sphere connectivity)."""

import numpy as np
import jax.numpy as jnp

from oceananigans_tpu.grids.cubed_sphere import (
    ConformalCubedSpherePanel, ConformalCubedSphereGrid,
    derive_connectivity, fill_cubed_sphere_halos, panel_corner_coordinates)
from oceananigans_tpu.grids.orthogonal_spherical_shell import _sph2cart


def test_panel_geometry_and_total_area():
    """Six equiangular panels tile the sphere exactly: Σ spherical-excess
    cell areas = 4πR² to machine precision at any resolution."""
    R = 2.0

    def total_area(N):
        total = 0.0
        for p in range(6):
            g = ConformalCubedSpherePanel((N, N), panel=p, radius=R)
            Az = np.asarray(np.broadcast_to(g.Az(("c", "c", "c")),
                                            g.padded_shape))
            total += Az[g.interior_slices].sum()
        return total

    sphere = 4 * np.pi * R ** 2
    # spherical-excess areas tile the sphere EXACTLY at any resolution
    assert abs(total_area(16) / sphere - 1) < 1e-12
    assert abs(total_area(8) / sphere - 1) < 1e-12


def test_connectivity_complete_and_symmetric():
    conn = derive_connectivity(8)
    assert len(conn) == 24                      # 6 panels × 4 sides
    for (p, s), (q, t, rev) in conn.items():
        q2, s2, rev2 = conn[(q, t)]
        assert (q2, s2) == (p, s) and rev2 == rev   # symmetric pairing


def test_halo_exchange_continuity():
    """After the exchange, halo values of a smooth global function are
    continuous with the interior (catches orientation/reversal bugs)."""
    N = 16
    cs = ConformalCubedSphereGrid((N, N), halo=(3, 3, 0))
    g = cs.panel_grids[0]
    Hx, Hy = g.H[0], g.H[1]

    # smooth function of position sampled at cell centers, per panel
    f = np.zeros(cs.padded_shape)
    for p in range(6):
        lon, lat = panel_corner_coordinates(N, p)
        P = _sph2cart(lon, lat)
        centers = P[:-1, :-1] + P[1:, :-1] + P[:-1, 1:] + P[1:, 1:]
        centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
        val = centers[..., 0] * centers[..., 2] + 0.5 * centers[..., 1]
        f[p, Hx:Hx + N, Hy:Hy + N, 0] = val
    fj = fill_cubed_sphere_halos(jnp.asarray(f), cs)
    fn = np.asarray(fj)

    # halo rows must continue the interior smoothly: |halo - adjacent
    # interior| is O(Δ) ~ (π/2)/N, while a mis-oriented copy would give O(1)
    tol = 6.0 / N
    for p in range(6):
        west = np.abs(fn[p, Hx - 1, Hy:Hy + N, 0]
                      - fn[p, Hx, Hy:Hy + N, 0]).max()
        east = np.abs(fn[p, Hx + N, Hy:Hy + N, 0]
                      - fn[p, Hx + N - 1, Hy:Hy + N, 0]).max()
        south = np.abs(fn[p, Hx:Hx + N, Hy - 1, 0]
                       - fn[p, Hx:Hx + N, Hy, 0]).max()
        north = np.abs(fn[p, Hx:Hx + N, Hy + N, 0]
                       - fn[p, Hx:Hx + N, Hy + N - 1, 0]).max()
        assert max(west, east, south, north) < tol, \
            (p, west, east, south, north)
    # two-pass exchange leaves corner halo cells finite and continuous too
    for p in range(6):
        corner = fn[p, Hx - 1, Hy - 1, 0]
        assert np.isfinite(corner)
        assert abs(corner - fn[p, Hx, Hy, 0]) < 2 * tol

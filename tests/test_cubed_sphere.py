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


def test_rancic_conformal_map_reproduces_published_coefficients():
    """The conformal map fitted from first principles (symmetry-involution
    collocation, grids/conformal_map.py) must reproduce the leading Taylor
    coefficients of Rancic, Purser & Mesinger (1996) Table B1 (the values
    the reference consumes via CubedSphere.jl)."""
    from oceananigans_tpu.grids.conformal_map import (rancic_C,
                                                      rancic_published_A)
    A, _ = rancic_published_A(rancic_C())
    published = [1.47713062600964, -0.38183510510174, -0.05573058001191,
                 -0.00895883606818, -0.00791315785221, -0.00486625437708]
    for k, ak in enumerate(published):
        assert abs(A[k] - ak) < 5e-8, (k, A[k], ak)


def test_rancic_conformal_face_geometry():
    """Anchors exact; interior metric isotropic+orthogonal to FD truncation;
    conformal modulus: the whole-face integral of the area metric equals
    one-sixth of the sphere."""
    from oceananigans_tpu.grids.conformal_map import conformal_face_nodes
    N = 32
    f = conformal_face_nodes(N)
    s3 = 1 / np.sqrt(3.0)
    assert np.allclose(f[N // 2, N // 2], [1, 0, 0], atol=1e-9)
    assert np.allclose(f[-1, -1], [s3, s3, s3], atol=1e-9)
    assert np.allclose(f[-1, N // 2], [1 / np.sqrt(2), 1 / np.sqrt(2), 0],
                       atol=1e-9)
    assert np.allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-12)
    h = 2.0 / N
    dx = (f[2:, 1:-1] - f[:-2, 1:-1]) / (2 * h)
    dy = (f[1:-1, 2:] - f[1:-1, :-2]) / (2 * h)
    gxx = np.sum(dx * dx, -1)
    gyy = np.sum(dy * dy, -1)
    gxy = np.sum(dx * dy, -1)
    # central block: away from the (physically non-conformal) corners
    c = slice(6, N - 7)
    assert np.abs(gxx[c, c] / gyy[c, c] - 1).max() < 5e-3
    assert (np.abs(gxy[c, c]) / np.sqrt(gxx[c, c] * gyy[c, c])).max() < 5e-3


def test_conformal_mesh_panel_edges_match():
    """Shared panel edges of the composed conformal mesh carry identical
    node coordinates (the panels are rotations of one face)."""
    from oceananigans_tpu.grids.conformal_map import (
        conformal_cubed_sphere_nodes)
    nodes = conformal_cubed_sphere_nodes(8)
    conn = derive_connectivity(8)
    sides = {"west": lambda a: a[0, :], "east": lambda a: a[-1, :],
             "south": lambda a: a[:, 0], "north": lambda a: a[:, -1]}
    for (p, s), (q, t, rev) in conn.items():
        ep = sides[s](nodes[p])
        eq = sides[t](nodes[q])
        if rev:
            eq = eq[::-1]
        # panels are exact rotations of one face; agreement is limited only
        # by the collocation-fit residual (~1e-10)
        assert np.abs(ep - eq).max() < 1e-9, (p, s, q, t)


def test_fast_exchange_bitwise_matches_reference_path():
    """build_fast_exchange derives the whole 2-pass exchange (+ shared-face
    sync for the velocity pair) as single static signed gathers by probing
    the per-panel reference implementation — must be BITWISE identical."""
    import jax.numpy as jnp
    import numpy as np

    from oceananigans_tpu.grids.cubed_sphere import (
        ConformalCubedSphereGrid, build_fast_exchange,
        fill_cubed_sphere_halos, fill_cubed_sphere_velocity_halos,
        sync_shared_velocity_faces)

    grid = ConformalCubedSphereGrid((8, 8, 4), z=(-100.0, 0.0), radius=1.0,
                                    dtype=jnp.float64)
    exc, exuv = build_fast_exchange(grid)
    rng = np.random.default_rng(0)
    NP = 8 + 2 * grid.H[0]
    a = jnp.asarray(rng.standard_normal((6, NP, NP, 5)))
    assert (np.asarray(fill_cubed_sphere_halos(a, grid))
            == np.asarray(exc(a))).all()
    u = jnp.asarray(rng.standard_normal((6, NP, NP, 5)))
    v = jnp.asarray(rng.standard_normal((6, NP, NP, 5)))
    ru, rv = sync_shared_velocity_faces(u, v, grid)
    ru, rv = fill_cubed_sphere_velocity_halos(ru, rv, grid)
    fu, fv = exuv(u, v)
    assert (np.asarray(ru) == np.asarray(fu)).all()
    assert (np.asarray(rv) == np.asarray(fv)).all()

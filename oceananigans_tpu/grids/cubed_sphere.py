"""Cubed-sphere grids: panels + 6-panel composition with derived connectivity.

Reference semantics:
* `ConformalCubedSpherePanel` (src/Grids/orthogonal_spherical_shell_grid.jl
  ctor via CubedSphere.jl's Rancic conformal mapping) — ONE face of the cube
  projected to the sphere as an OrthogonalSphericalShellGrid.
* `ConformalCubedSphereGrid` (src/MultiRegion/cubed_sphere_grid.jl:465) — six
  panels composed with rotated inter-panel connectivity
  (cubed_sphere_connectivity.jl) and halo exchange
  (cubed_sphere_boundary_conditions.jl).

Map note (documented deviation): the reference's panels use the Rancic et al.
(1996) CONFORMAL map via the external CubedSphere.jl coefficient tables; here
panels use the EQUIANGULAR GNOMONIC map (the FV3/MITgcm-standard variant) —
its grid lines are not exactly orthogonal near panel corners (max deviation
~O(10°) at the corners themselves), and the finite-volume metrics treat the
grid as locally orthogonal. Swap `panel_corner_coordinates` for a conformal
map to recover the reference's grid exactly.

TPU-first composition: a cubed-sphere field is ONE array with a leading panel
axis (6, npx, npy, npz) — the panel axis is shardable across devices, and the
inter-panel halo exchange is a static gather (panel, index-slice, optional
reversal) derived NUMERICALLY from the panel corner geometry at construction
(no transcribed connectivity tables — each edge pairing and orientation is
found by matching corner points, which eliminates the classic source of
cubed-sphere bugs)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..defaults import defaults
from .orthogonal_spherical_shell import (OrthogonalSphericalShellGrid,
                                         _cart2sph)

# panel rotation matrices: panel 0 is the +x face; 1..3 the other equatorial
# faces; 4 north (+z), 5 south (-z)
def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


PANEL_ROTATIONS = [np.eye(3), _rz(np.pi / 2), _rz(np.pi), _rz(3 * np.pi / 2),
                   _ry(-np.pi / 2), _ry(np.pi / 2)]


def panel_corner_coordinates(N, panel):
    """(lon, lat) degree arrays of shape (N+1, N+1): the equiangular gnomonic
    cube face ``panel`` (0-5)."""
    xi = np.linspace(-np.pi / 4, np.pi / 4, N + 1)
    X, Y = np.tan(xi)[:, None], np.tan(xi)[None, :]
    d = np.stack(np.broadcast_arrays(np.ones_like(X * Y), X, Y), axis=-1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d = d @ PANEL_ROTATIONS[panel].T
    return _cart2sph(d)


def ConformalCubedSpherePanel(size, panel=0, z=None, radius=None, halo=None,
                              dtype=None):
    """One cubed-sphere panel as an OrthogonalSphericalShellGrid (reference:
    ConformalCubedSpherePanel, orthogonal_spherical_shell_grid.jl)."""
    N = size[0]
    if size[1] != N:
        raise ValueError("cubed-sphere panels are square: Nx == Ny")
    lon, lat = panel_corner_coordinates(N, panel)
    return OrthogonalSphericalShellGrid(lon, lat, z=z, size=size,
                                        radius=radius, halo=halo, dtype=dtype)


# -- connectivity ---------------------------------------------------------------

_SIDES = ("west", "east", "south", "north")


def _edge_points(lon, lat, side):
    """Ordered boundary corner points (unit vectors) of a panel side."""
    from .orthogonal_spherical_shell import _sph2cart
    P = _sph2cart(lon, lat)
    if side == "west":
        return P[0, :]
    if side == "east":
        return P[-1, :]
    if side == "south":
        return P[:, 0]
    return P[:, -1]


def derive_connectivity(N):
    """{(panel, side): (neighbor_panel, neighbor_side, reversed)} found by
    geometric corner matching (the numerically-derived analogue of the
    reference's cubed_sphere_connectivity.jl tables)."""
    corners = [panel_corner_coordinates(N, p) for p in range(6)]
    edges = {(p, s): _edge_points(*corners[p], s)
             for p in range(6) for s in _SIDES}
    conn = {}
    for (p, s), pts in edges.items():
        for (q, t), qts in edges.items():
            if q == p:
                continue
            if np.allclose(pts, qts, atol=1e-12):
                conn[(p, s)] = (q, t, False)
                break
            if np.allclose(pts, qts[::-1], atol=1e-12):
                conn[(p, s)] = (q, t, True)
                break
        else:
            raise RuntimeError(f"no neighbor found for panel {p} side {s}")
    return conn


class ConformalCubedSphereGrid:
    """Six-panel composition. Fields live as (6, npx, npy, npz) arrays; use
    ``fill_cubed_sphere_halos`` between steps. ``panel_grids[p]`` is the
    OrthogonalSphericalShellGrid of panel p (identical shapes/metrics up to
    rotation)."""

    def __init__(self, panel_size, z=None, radius=None, halo=None,
                 dtype=None):
        self.panel_grids = [ConformalCubedSpherePanel(panel_size, p, z=z,
                                                      radius=radius,
                                                      halo=halo, dtype=dtype)
                            for p in range(6)]
        self.N = self.panel_grids[0].N
        self.H = self.panel_grids[0].H
        self.connectivity = derive_connectivity(self.N[0])
        self.radius = self.panel_grids[0].radius
        self.dtype = self.panel_grids[0].dtype

    @property
    def padded_shape(self):
        return (6,) + self.panel_grids[0].padded_shape

    def interior(self, a):
        return a[(slice(None),) + self.panel_grids[0].interior_slices]


def _interior_strip(a, grid, side, depth):
    """Interior strip of width ``depth`` adjacent to ``side`` of panel array
    ``a`` (padded (npx, npy, ...)), ordered outward from the boundary."""
    Hx, Hy = grid.H[0], grid.H[1]
    Nx, Ny = grid.N[0], grid.N[1]
    if side == "west":
        return a[Hx:Hx + depth], 0
    if side == "east":
        return a[Hx + Nx - depth:Hx + Nx][::-1], 0
    if side == "south":
        return a[:, Hy:Hy + depth], 1
    return a[:, Hy + Ny - depth:Hy + Ny][:, ::-1], 1


def fill_cubed_sphere_halos(a, csgrid, loc=("c", "c", "c"), passes=2):
    """Inter-panel halo exchange for a CENTER-located cubed-sphere field
    (reference: cubed_sphere_boundary_conditions.jl — here as one static
    gather per side derived from the connectivity; staggered velocity
    exchange with component rotation is future work, see module docstring).

    Two passes by default: the second pass propagates freshly-filled
    tangential halos into the three-panel corner cells (the reference's
    multi-pass corner treatment)."""
    grid = csgrid.panel_grids[0]
    Hx, Hy = grid.H[0], grid.H[1]
    assert Hx == Hy, "cubed-sphere exchange needs equal x/y halos"
    Nx, Ny = grid.N[0], grid.N[1]
    out = a
    for _ in range(passes):
        src = out
        for p in range(6):
            panel = out[p]
            for side in _SIDES:
                q, t, rev = csgrid.connectivity[(p, side)]
                depth = Hx if side in ("west", "east") else Hy
                strip, axis_q = _interior_strip(src[q], grid, t, depth)
                # strip[0] = neighbor's boundary-adjacent row; align the
                # tangential direction to THIS panel's index direction
                if axis_q == 1:
                    strip = jnp.moveaxis(strip, 1, 0)
                if rev:
                    strip = strip[:, ::-1]
                if side == "west":
                    # halo slot Hx-1 is boundary-adjacent -> reversed depth
                    panel = panel.at[:Hx].set(strip[::-1])
                elif side == "east":
                    panel = panel.at[Hx + Nx:Hx + Nx + Hx].set(strip)
                elif side == "south":
                    dst = jnp.moveaxis(strip, 0, 1)   # (npx, depth, ...)
                    panel = panel.at[:, :Hy].set(dst[:, ::-1])
                else:
                    dst = jnp.moveaxis(strip, 0, 1)
                    panel = panel.at[:, Hy + Ny:Hy + Ny + Hy].set(dst)
            out = out.at[p].set(panel)
    return out

"""Halo filling and boundary-flux tendency application.

Reference semantics:
* periodic fill — src/BoundaryConditions/fill_halo_regions_periodic.jl
  (halo = opposite interior strip)
* flux / default no-flux fill — fill_halo_regions_flux.jl (mirror copy; the
  flux itself is applied to tendencies separately, see apply_flux_bcs)
* value / gradient fill — fill_halo_regions_value_gradient.jl (linear
  extrapolation from the first interior point with the boundary gradient)
* open fill — fill_halo_regions_open.jl (pin the boundary FACE value)
* flux application — compute_flux_bcs.jl (G += q·A/V on west/south/bottom,
  G -= q·A/V on east/north/top)

TPU-first design: one pure function ``a' = fill_halo_regions(a, grid, loc,
bcs, t)`` of the full padded array. Every side-fill is a static slice update
(`.at[].set`), so the whole fill fuses into a handful of XLA dynamic-update
-slices with no host logic. Halo depth is small and static, so per-slot Python
loops unroll at trace time.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..grids.base import broadcastable_1d
from ..grids.topology import BOUNDED, CENTER, FACE, PERIODIC
from .boundary_condition import (FLUX, GRADIENT, OPEN, PERIODIC_BC, VALUE,
                                 SIDE_AXIS)


def _idx(ndim, axis, sl):
    out = [slice(None)] * ndim
    out[axis] = sl
    return tuple(out)


def eval_bc(bc, grid, loc, axis, time):
    """Evaluate a BC's condition into something broadcastable against a
    keep-dims boundary slice. Returns None for a homogeneous condition."""
    cond = bc.condition
    if cond is None:
        return None
    if np.isscalar(cond):
        return cond
    t_axes = [ax for ax in range(3) if ax != axis]
    if callable(cond):
        x1 = broadcastable_1d(grid.coord_padded(t_axes[0], loc[t_axes[0]]), t_axes[0])
        x2 = broadcastable_1d(grid.coord_padded(t_axes[1], loc[t_axes[1]]), t_axes[1])
        return cond(x1, x2, time)
    arr = np.asarray(cond)
    exp = tuple(grid.N[ax] for ax in t_axes)
    if arr.shape == exp:
        arr = np.pad(arr, [(grid.H[ax], grid.H[ax]) for ax in t_axes], mode="edge")
    return np.expand_dims(arr, axis)


def _fill_axis(a, grid, loc, bcs, axis, time):
    H, N = grid.H[axis], grid.N[axis]
    nd = a.ndim
    left_bc, right_bc = bcs.pair(axis)
    topo = grid.topology[axis]

    def S(sl):
        return _idx(nd, axis, sl)

    if topo == PERIODIC:
        a = a.at[S(slice(0, H))].set(a[S(slice(N, N + H))])
        a = a.at[S(slice(H + N, 2 * H + N))].set(a[S(slice(H, 2 * H))])
        return a

    if topo != BOUNDED:
        return a

    face_loc = loc[axis] == FACE
    # Padded 1D center coordinates for extrapolation distances
    xC = grid.coord_padded(axis, CENTER)

    for is_left, bc in ((True, left_bc), (False, right_bc)):
        if bc is None:
            continue
        cls = bc.classification
        v = eval_bc(bc, grid, loc, axis, time)

        if not face_loc:
            if cls == FLUX or (cls == OPEN):
                # mirror copy (no-flux fill; actual flux applied to tendencies)
                if is_left:
                    a = a.at[S(slice(0, H))].set(
                        jnp.flip(a[S(slice(H, 2 * H))], axis=axis))
                else:
                    a = a.at[S(slice(H + N, 2 * H + N))].set(
                        jnp.flip(a[S(slice(N, H + N))], axis=axis))
            elif cls in (VALUE, GRADIENT):
                if is_left:
                    c1 = a[S(slice(H, H + 1))]
                    # boundary face spacing Δ between first interior center and
                    # first halo center
                    d0 = xC[H] - xC[H - 1]
                    if cls == VALUE:
                        vv = 0.0 if v is None else v
                        grad = (c1 - vv) / (d0 / 2)
                    else:
                        grad = 0.0 if v is None else v
                    for m in range(H):
                        dist = xC[H] - xC[H - 1 - m]
                        a = a.at[S(slice(H - 1 - m, H - m))].set(c1 - grad * dist)
                else:
                    cN = a[S(slice(H + N - 1, H + N))]
                    d0 = xC[H + N] - xC[H + N - 1]
                    if cls == VALUE:
                        vv = 0.0 if v is None else v
                        grad = (vv - cN) / (d0 / 2)
                    else:
                        grad = 0.0 if v is None else v
                    for m in range(H):
                        dist = xC[H + N + m] - xC[H + N - 1]
                        a = a.at[S(slice(H + N + m, H + N + m + 1))].set(cN + grad * dist)
            else:
                raise ValueError(f"unsupported BC {cls} for centered location")
        else:
            # Face location in its bounded direction: slot H is the left
            # boundary face, slot H+N the right boundary face (stored in the
            # first halo slot — see grids/base.py layout note).
            if cls in (OPEN, VALUE):
                vv = 0.0 if v is None else v
                if is_left:
                    a = a.at[S(slice(H, H + 1))].set(
                        jnp.broadcast_to(jnp.asarray(vv, a.dtype),
                                         a[S(slice(H, H + 1))].shape))
                    for m in range(1, H + 1):
                        a = a.at[S(slice(H - m, H - m + 1))].set(
                            2 * vv - a[S(slice(H + m, H + m + 1))])
                else:
                    a = a.at[S(slice(H + N, H + N + 1))].set(
                        jnp.broadcast_to(jnp.asarray(vv, a.dtype),
                                         a[S(slice(H + N, H + N + 1))].shape))
                    for m in range(1, H):
                        a = a.at[S(slice(H + N + m, H + N + m + 1))].set(
                            2 * vv - a[S(slice(H + N - m, H + N - m + 1))])
            else:
                # flux/gradient on a face field: even reflection about the
                # boundary face (free-slip-like fill)
                if is_left:
                    for m in range(1, H + 1):
                        a = a.at[S(slice(H - m, H - m + 1))].set(
                            a[S(slice(H + m, H + m + 1))])
                else:
                    for m in range(1, H):
                        a = a.at[S(slice(H + N + m, H + N + m + 1))].set(
                            a[S(slice(H + N - m, H + N - m + 1))])
    return a


def fill_halo_regions(a, grid, loc, bcs, time=0.0):
    """Refresh all halos of padded array ``a`` (reference:
    fill_halo_regions!, src/BoundaryConditions/fill_halo_regions.jl:25-41)."""
    for axis in range(3):
        if grid.is_flat(axis):
            continue
        a = _fill_axis(a, grid, loc, bcs, axis, time)
    return a


def apply_flux_bcs(G, grid, loc, bcs, time=0.0):
    """Add boundary-flux divergences to a tendency array (reference:
    compute_flux_bcs.jl — ``G[1] += q·A/V``, ``G[N] -= q·A/V``).

    Because tendency = -∇·flux, a positive left-side (west/south/bottom) flux
    increases the tendency in the boundary-adjacent cell; a positive
    right-side flux decreases it."""
    nd = G.ndim
    for side, (axis, is_left) in SIDE_AXIS.items():
        if grid.topology[axis] != BOUNDED:
            continue
        bc = bcs.side(side)
        if bc is None or bc.classification != FLUX or bc.condition is None:
            continue
        q = eval_bc(bc, grid, loc, axis, time)
        if q is None:
            continue
        H, N = grid.H[axis], grid.N[axis]
        # area of the boundary face at the flipped location in `axis`
        floc = list(loc)
        floc[axis] = FACE if loc[axis] == CENTER else CENTER
        floc = tuple(floc)
        A = (grid.Ax(floc), grid.Ay(floc), grid.Az(floc))[axis]
        V = grid.V(loc)
        AoV = _boundary_slice(A / V, nd, axis, H if is_left else H + N - 1)
        cell = H if is_left else H + N - 1
        idx = _idx(nd, axis, slice(cell, cell + 1))
        sgn = 1.0 if is_left else -1.0
        G = G.at[idx].add(sgn * q * AoV)
    return G


def _boundary_slice(metric, nd, axis, i):
    """Slice a (possibly scalar) broadcastable metric at padded index i along
    ``axis``, keeping dims."""
    if np.isscalar(metric) or np.ndim(metric) == 0:
        return metric
    m = np.asarray(metric) if isinstance(metric, np.ndarray) else metric
    if m.shape[axis] == 1:
        return m
    return m[_idx(nd, axis, slice(i, i + 1))]

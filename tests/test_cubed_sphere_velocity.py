"""Staggered cubed-sphere velocity halo exchange (component rotation across
panel edges) + exchanged halo metrics. Reference analogue:
test/test_cubed_spheres.jl (the solid-body-rotation vorticity check) and
src/MultiRegion/cubed_sphere_boundary_conditions.jl."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu.grids.cubed_sphere import (
    PANEL_ROTATIONS, ConformalCubedSphereGrid,
    fill_cubed_sphere_velocity_halos)
from oceananigans_tpu.operators.operators import zeta3_ffc

N, H = 32, 3
OMEGA = np.array([0.3, -0.5, 0.8])


def _point_and_basis(xi, eta, panel):
    """Exact position r and unit index-direction vectors (e_x, e_y) of the
    equiangular gnomonic map at angles (xi, eta) — analytic derivatives, no
    differencing."""
    t1, t2 = np.tan(xi), np.tan(eta)
    d = np.stack(np.broadcast_arrays(np.ones_like(t1 * t2), t1, t2), -1)
    nd = np.linalg.norm(d, axis=-1, keepdims=True)
    r = d / nd
    def tangent(dd):
        v = dd / nd - r * np.sum(r * dd, axis=-1, keepdims=True) / nd
        return v / np.linalg.norm(v, axis=-1, keepdims=True)
    ex = tangent(np.stack(np.broadcast_arrays(
        np.zeros_like(t1 * t2), 1 + t1 ** 2, np.zeros_like(t1 * t2)), -1))
    ey = tangent(np.stack(np.broadcast_arrays(
        np.zeros_like(t1 * t2), np.zeros_like(t1 * t2), 1 + t2 ** 2), -1))
    R = PANEL_ROTATIONS[panel]
    return r @ R.T, ex @ R.T, ey @ R.T


def _vel(r):
    """Solid-body rotation about OMEGA: V = Ω × r (vertical vorticity
    2 Ω·r̂)."""
    return np.cross(OMEGA, r)


def _staggered_analytic(panel):
    """(u[N+1, N], v[N, N+1]) interior staggered projections."""
    dq = (np.pi / 2) / N
    f = -np.pi / 4 + dq * np.arange(N + 1)
    c = -np.pi / 4 + dq * (np.arange(N) + 0.5)
    ru, exu, _ = _point_and_basis(f[:, None], c[None, :], panel)
    rv, _, eyv = _point_and_basis(c[:, None], f[None, :], panel)
    return (np.sum(_vel(ru) * exu, -1), np.sum(_vel(rv) * eyv, -1))


@pytest.fixture(scope="module")
def cs():
    return ConformalCubedSphereGrid((N, N), radius=1.0)


@pytest.fixture(scope="module")
def filled(cs):
    NP = N + 2 * H
    u = np.zeros((6, NP, NP, 1))
    v = np.zeros((6, NP, NP, 1))
    for p in range(6):
        up, vp = _staggered_analytic(p)
        u[p, H:H + N + 1, H:H + N, 0] = up
        v[p, H:H + N, H:H + N + 1, 0] = vp
    return fill_cubed_sphere_velocity_halos(jnp.asarray(u), jnp.asarray(v),
                                            cs)


def test_edge_rotations_are_inverse_pairs(cs):
    for (p, s), (q, t, rev) in cs.connectivity.items():
        assert cs.connectivity[(q, t)] == (p, s, rev)
        R1, R2 = cs.edge_rotations[(p, s)], cs.edge_rotations[(q, t)]
        assert np.array_equal(R1 @ R2, np.eye(2, dtype=int)), (p, s)


def test_halo_values_are_neighbor_components(cs, filled):
    """Panel 0's east halo u (identity rotation, unreversed edge) must be
    panel 1's own interior u one face in from its west edge, exactly."""
    u, _ = filled
    assert cs.connectivity[(0, "east")] == (1, "west", False)
    got = np.asarray(u[0, H + N + 1, H:H + N, 0])
    u1, _ = _staggered_analytic(1)
    np.testing.assert_allclose(got, u1[1, :], rtol=0, atol=1e-12)
    # panel 4's east halo comes from panel 1's NORTH side: my u <- +v there
    q, t, rev = cs.connectivity[(4, "east")]
    assert (q, t) == (1, "north")
    R = cs.edge_rotations[(4, "east")]
    _, v1 = _staggered_analytic(1)
    got = np.asarray(u[4, H + N + 1, H:H + N, 0])
    src = v1[:, N - 1] if not rev else v1[::-1, N - 1]
    np.testing.assert_allclose(got, R[0, 1] * src, rtol=0, atol=1e-12)


def _staggered_from_nodes(P):
    """(u-points, e_x there, v-points, e_y there) from a panel node array —
    midpoint positions and center-difference directions (one-sided at
    panel-boundary faces)."""
    def unit(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)
    Pxm = unit(P[:-1] + P[1:])
    Pym = unit(P[:, :-1] + P[:, 1:])
    Pc = unit(Pxm[:, :-1] + Pxm[:, 1:])
    def tangent(at, d):
        d = d - at * np.sum(d * at, -1, keepdims=True)
        return unit(d)
    exu = np.empty_like(Pym)
    exu[1:-1] = Pc[1:] - Pc[:-1]
    exu[0] = Pc[0] - Pym[0]
    exu[-1] = Pym[-1] - Pc[-1]
    eyv = np.empty_like(Pxm)
    eyv[:, 1:-1] = Pc[:, 1:] - Pc[:, :-1]
    eyv[:, 0] = Pc[:, 0] - Pxm[:, 0]
    eyv[:, -1] = Pxm[:, -1] - Pc[:, -1]
    return Pym, tangent(Pym, exu), Pxm, tangent(Pxm, eyv)


def test_solid_body_vorticity_across_edges(cs):
    """Discrete circulation vorticity of solid-body rotation must match
    2 Ω·r̂ everywhere INCLUDING the panel-edge rows — whose stencils consume
    exchanged velocity components and exchanged halo metrics. A
    sign/alignment bug produces O(1/Δ) garbage along whole edges. The
    default elliptic mesh crosses panel edges without grid-line kinks (the
    property the reference gets from the Rancic conformal map), so the edge
    rows stay consistent; only the 8 cube-vertex neighborhoods are excluded
    (the conformal-map scale factor is singular there — same limitation as
    the reference grid)."""
    # sample the velocity at the SAME mesh's staggered points as the grid
    # under test (cs defaults to the Rancic conformal mesh)
    nodes = [np.asarray(ext[H:H + N + 1, H:H + N + 1])
             for ext in cs.extended_nodes]
    NP = N + 2 * H
    u = np.zeros((6, NP, NP, 1))
    v = np.zeros((6, NP, NP, 1))
    for p in range(6):
        Pu, exu, Pv, eyv = _staggered_from_nodes(nodes[p])
        u[p, H:H + N + 1, H:H + N, 0] = np.sum(_vel(Pu) * exu, -1)
        v[p, H:H + N, H:H + N + 1, 0] = np.sum(_vel(Pv) * eyv, -1)
    u, v = fill_cubed_sphere_velocity_halos(jnp.asarray(u), jnp.asarray(v),
                                            cs)
    zmax = 2 * np.linalg.norm(OMEGA)
    K = 4                                  # vertex-exclusion radius (nodes)
    for p in range(6):
        zeta = np.asarray(zeta3_ffc(cs.panel_grids[p], u[p], v[p]))
        exact = 2 * (nodes[p] @ OMEGA)
        err = np.abs(zeta[H:H + N + 1, H:H + N + 1, 0] - exact)
        for (ci, cj) in ((0, 0), (0, N), (N, 0), (N, N)):
            ii = slice(max(ci - K, 0), ci + K + 1)
            jj = slice(max(cj - K, 0), cj + K + 1)
            err[ii, jj] = 0.0
        # strict interior: smooth 2nd-order accuracy
        assert err[3:-3, 3:-3].max() < 3e-3 * zmax, p
        # edge rows: consistent circulation across panel edges
        edge = np.concatenate([err[0], err[-1], err[:, 0], err[:, -1]])
        assert edge.max() < 8e-2 * zmax, (p, edge.max())

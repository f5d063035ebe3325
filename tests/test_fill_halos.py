"""Halo-fill tests (reference analogue: test/test_halo_regions.jl and
test/test_boundary_conditions.jl)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.boundary_conditions import (
    FieldBoundaryConditions, FluxBoundaryCondition, GradientBoundaryCondition,
    ValueBoundaryCondition, OpenBoundaryCondition, fill_halo_regions,
    apply_flux_bcs, regularize_field_boundary_conditions)
from oceananigans_tpu.fields import CenterField, ZFaceField

CCC = ("c", "c", "c")
CCF = ("c", "c", "f")


def test_periodic_fill():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1),
                        topology=("periodic", "periodic", "periodic"))
    rng = np.random.default_rng(0)
    c = CenterField(g).set(rng.normal(size=(4, 4, 4)))
    d = np.asarray(c.data)
    H, N = 3, 4
    # west halo == east interior
    assert np.allclose(d[:H, H:H+N, H:H+N], d[N:N+H, H:H+N, H:H+N])
    assert np.allclose(d[H+N:, H:H+N, H:H+N], d[H:2*H, H:H+N, H:H+N])


def test_no_flux_default_fill_is_mirror():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    rng = np.random.default_rng(1)
    c = CenterField(g).set(rng.normal(size=(4, 4, 4)))
    d = np.asarray(c.data)
    H, N = 3, 4
    # z bounded: bottom halo mirrors interior
    assert np.allclose(d[H:H+N, H:H+N, H-1], d[H:H+N, H:H+N, H])
    assert np.allclose(d[H:H+N, H:H+N, H-2], d[H:H+N, H:H+N, H+1])
    assert np.allclose(d[H:H+N, H:H+N, H+N], d[H:H+N, H:H+N, H+N-1])


def test_value_bc_fill():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    v_top = 2.5
    bcs = FieldBoundaryConditions(top=ValueBoundaryCondition(v_top))
    c = CenterField(g, bcs).set(1.0)
    d = np.asarray(c.data)
    H, N = 3, 4
    # first top halo point: 2v - c_interior
    assert np.allclose(d[H:H+N, H:H+N, H+N], 2 * v_top - 1.0)


def test_gradient_bc_fill():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    grad = 3.0
    dz = 0.25
    bcs = FieldBoundaryConditions(top=GradientBoundaryCondition(grad))
    c = CenterField(g, bcs).set(1.0)
    d = np.asarray(c.data)
    H, N = 3, 4
    assert np.allclose(d[H:H+N, H:H+N, H+N], 1.0 + grad * dz)
    assert np.allclose(d[H:H+N, H:H+N, H+N+1], 1.0 + grad * 2 * dz)


def test_impenetrable_face_fill():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    w = ZFaceField(g).set(lambda x, y, z: jnp.ones_like(x))
    d = np.asarray(w.data)
    H, N = 3, 4
    # boundary faces pinned to zero
    assert np.allclose(d[H:H+N, H:H+N, H], 0.0)
    assert np.allclose(d[H:H+N, H:H+N, H+N], 0.0)
    # odd reflection beyond the wall
    assert np.allclose(d[H:H+N, H:H+N, H-1], -d[H:H+N, H:H+N, H+1])


def test_continuous_boundary_function():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    bcs = FieldBoundaryConditions(
        top=ValueBoundaryCondition(lambda x, y, t: x * 0 + y * 0 + t))
    c = CenterField(g, bcs)
    data = fill_halo_regions(c.data, g, CCC, c.bcs, time=7.0)
    d = np.asarray(data)
    H, N = 3, 4
    assert np.allclose(d[H:H+N, H:H+N, H+N], 2 * 7.0 - d[H:H+N, H:H+N, H+N-1])


def test_apply_flux_bcs_signs():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    q = 0.5
    bcs = regularize_field_boundary_conditions(
        FieldBoundaryConditions(top=FluxBoundaryCondition(q),
                                bottom=FluxBoundaryCondition(q)), g, CCC)
    G = jnp.zeros(g.padded_shape)
    G = apply_flux_bcs(G, g, CCC, bcs)
    d = np.asarray(G)
    H, N = 3, 4
    dz = 0.25
    # tendency = -∇·flux: positive bottom flux increases G in bottom cell,
    # positive top flux decreases G in top cell
    assert np.allclose(d[H:H+N, H:H+N, H], q / dz)
    assert np.allclose(d[H:H+N, H:H+N, H+N-1], -q / dz)
    assert np.allclose(d[H:H+N, H:H+N, H+1:H+N-1], 0.0)

"""OrthogonalSphericalShellGrid / RotatedLatitudeLongitudeGrid tests
(reference analogue: test_orthogonal_spherical_shell_grids.jl)."""

import numpy as np

from oceananigans_tpu.grids import (OrthogonalSphericalShellGrid,
                                    RotatedLatitudeLongitudeGrid)


def test_ossg_from_latlon_corners_matches_latlon_metrics():
    # an unrotated shell must reproduce lat-lon great-circle spacings
    R = 6.371e6
    lam = np.linspace(0, 40, 9)
    phi = np.linspace(-20, 20, 9)
    L, P = np.meshgrid(lam, phi, indexing="ij")
    g = OrthogonalSphericalShellGrid(L, P, radius=R)
    dx = g.dx(("c", "c", "c"))
    h0, h1 = g.H[0], g.H[1]
    # Δx at the equator row ≈ R cos(φ_c) Δλ
    mid = h1 + 4  # φ centers: -17.5 ... 17.5; index 4 → 2.5
    expect = R * np.cos(np.deg2rad(2.5)) * np.deg2rad(5)
    assert np.isclose(dx[h0 + 4, mid, 0], expect, rtol=1e-3)
    dy = g.dy(("c", "c", "c"))
    assert np.allclose(dy[h0:h0+8, h1:h1+8, 0], R * np.deg2rad(5), rtol=1e-3)


def test_rotated_latlon_grid():
    g = RotatedLatitudeLongitudeGrid(size=(16, 16, 4), longitude=(-10, 10),
                                     latitude=(-10, 10), z=(-100, 0),
                                     north_pole=(0.0, 0.0))
    lam, phi = g.nodes2d(("f", "f"))
    # the grid center (originally 0N, 0E) rotates onto the equatorial pole
    # location's antipode region; just check the grid is valid + curved
    assert np.all(np.isfinite(lam)) and np.all(np.isfinite(phi))
    dx = g.dx(("c", "c", "c"))
    assert np.all(dx > 0)
    assert g.N == (16, 16, 4)


def test_ossg_runs_in_hydrostatic_model():
    import jax.numpy as jnp
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)
    g = RotatedLatitudeLongitudeGrid(size=(16, 16, 4), longitude=(-20, 20),
                                     latitude=(-20, 20), z=(-500.0, 0),
                                     north_pole=(180.0, 40.0))
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=SplitExplicitFreeSurface(substeps=20))
    model.set(eta=lambda lam, phi, z: 0.0 * lam)
    # kick the surface with an initial velocity
    model.set(u=0.01)
    for _ in range(5):
        model.time_step(60.0)
    for name in ("u", "v", "eta"):
        assert np.all(np.isfinite(np.asarray(model.field(name).interior))), name


def test_vector_rotation_operators():
    """rotate_to/from_geographic (reference: vector_rotation_operators.jl):
    identity on an unrotated grid, exact round-trip on a rotated one."""
    import jax.numpy as jnp
    from oceananigans_tpu.grids import RotatedLatitudeLongitudeGrid
    from oceananigans_tpu.grids.orthogonal_spherical_shell import (
        rotate_from_geographic, rotate_to_geographic)

    plain = RotatedLatitudeLongitudeGrid(
        size=(16, 16), longitude=(-20, 20), latitude=(-20, 20),
        north_pole=(0.0, 90.0))
    u = jnp.ones(plain.padded_shape)
    v = jnp.zeros(plain.padded_shape)
    ue, vn = rotate_to_geographic(plain, u, v)
    ii = plain.interior_slices
    assert np.allclose(np.asarray(ue)[ii], 1.0, atol=1e-6)
    assert np.allclose(np.asarray(vn)[ii], 0.0, atol=1e-6)

    rot = RotatedLatitudeLongitudeGrid(
        size=(16, 16), longitude=(-20, 20), latitude=(-20, 20),
        north_pole=(0.0, 0.0))
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal(rot.padded_shape))
    v = jnp.asarray(rng.standard_normal(rot.padded_shape))
    ue, vn = rotate_to_geographic(rot, u, v)
    ub, vb = rotate_from_geographic(rot, ue, vn)
    assert np.allclose(np.asarray(ub)[ii], np.asarray(u)[ii], atol=1e-10)
    assert np.allclose(np.asarray(vb)[ii], np.asarray(v)[ii], atol=1e-10)
    # the 90°-rotated grid's x-direction is (anti)parallel to geographic north
    cosr, sinr = np.asarray(ue)[ii].std(), None  # placeholder not used

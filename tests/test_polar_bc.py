"""Polar boundary conditions on pole-touching LatitudeLongitudeGrids.

Reference semantics: src/BoundaryConditions/polar_boundary_condition.jl —
center-located fields get a Value BC whose value is the zonal mean of the
boundary row (recomputed every fill); y-face fields (v) get an Open BC with
the same zonal-mean value pinning the pole face."""

import numpy as np
import jax.numpy as jnp

from oceananigans_tpu import LatitudeLongitudeGrid
from oceananigans_tpu.boundary_conditions import (PolarValue, default_bcs,
                                                  fill_halo_regions)
from oceananigans_tpu.grids.topology import (CENTER, FACE, LOC_CCC)

LOC_CFC = (CENTER, FACE, CENTER)


def _grid():
    return LatitudeLongitudeGrid(size=(16, 8, 4), longitude=(0, 360),
                                 latitude=(-90, 90), z=(-1.0, 0.0))


def test_polar_flags_and_defaults():
    g = _grid()
    assert g.polar_south and g.polar_north
    bcs_c = default_bcs(g, LOC_CCC)
    assert isinstance(bcs_c.north.condition, PolarValue)
    assert bcs_c.north.classification == "value"
    bcs_v = default_bcs(g, LOC_CFC)
    assert isinstance(bcs_v.south.condition, PolarValue)
    assert bcs_v.south.classification == "open"
    # a non-polar grid keeps the plain defaults
    g2 = LatitudeLongitudeGrid(size=(16, 8, 4), longitude=(0, 360),
                               latitude=(-60, 60), z=(-1.0, 0.0))
    assert not (g2.polar_south or g2.polar_north)
    assert default_bcs(g2, LOC_CCC).north.condition is None


def test_polar_center_fill_implies_zonal_mean_boundary_value(rng):
    g = _grid()
    Hx, Hy, Hz = g.H
    Nx, Ny, Nz = g.N
    a = jnp.zeros(g.padded_shape, g.dtype)
    interior = rng.standard_normal((Nx, Ny, Nz))
    a = a.at[g.interior_slices].set(interior)
    bcs = default_bcs(g, LOC_CCC)
    f = np.asarray(fill_halo_regions(a, g, LOC_CCC, bcs))
    # linear midpoint between last interior row and adjacent halo row == the
    # zonal mean of the boundary row, at every longitude and depth
    for is_north in (False, True):
        jin = Hy + Ny - 1 if is_north else Hy
        jh = Hy + Ny if is_north else Hy - 1
        want = interior[:, Ny - 1 if is_north else 0, :].mean(0)
        got = 0.5 * (f[Hx:Hx + Nx, jin, Hz:Hz + Nz] + f[Hx:Hx + Nx, jh, Hz:Hz + Nz])
        assert np.abs(got - want[None, :]).max() < 1e-12
    # constants are preserved exactly
    c = jnp.full(g.padded_shape, 3.25, g.dtype)
    fc = np.asarray(fill_halo_regions(c, g, LOC_CCC, bcs))
    assert np.abs(fc - 3.25).max() < 1e-13


def test_polar_face_fill_pins_pole_face_to_zonal_mean(rng):
    g = _grid()
    Hx, Hy, Hz = g.H
    Nx, Ny, Nz = g.N
    v = jnp.zeros(g.padded_shape, g.dtype)
    vin = rng.standard_normal((Nx, Ny + 1, Nz))
    v = v.at[Hx:Hx + Nx, Hy:Hy + Ny + 1, Hz:Hz + Nz].set(vin)
    bcs = default_bcs(g, LOC_CFC)
    f = np.asarray(fill_halo_regions(v, g, LOC_CFC, bcs))
    # south pole face (slot Hy): zonal-mean projection of face row 0
    want_s = vin[:, 0, :].mean(0)
    assert np.abs(f[Hx:Hx + Nx, Hy, Hz:Hz + Nz] - want_s[None, :]).max() < 1e-12
    # north pole face (slot Hy+Ny): zonal mean of the face row one inside
    want_n = vin[:, Ny - 1, :].mean(0)
    assert np.abs(f[Hx:Hx + Nx, Hy + Ny, Hz:Hz + Nz] - want_n[None, :]).max() < 1e-12
    # halos are the odd mirror about the pinned face value
    mirror = f[Hx:Hx + Nx, Hy + 1, Hz:Hz + Nz]
    assert np.abs(f[Hx:Hx + Nx, Hy - 1, Hz:Hz + Nz]
                  - (2 * want_s[None, :] - mirror)).max() < 1e-12


def test_hydrostatic_model_runs_to_the_poles(rng):
    from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis

    g = LatitudeLongitudeGrid(size=(16, 8, 3), longitude=(0, 360),
                              latitude=(-90, 90), z=(-100.0, 0.0))
    m = HydrostaticFreeSurfaceModel(grid=g,
                                    coriolis=HydrostaticSphericalCoriolis(),
                                    tracers=("T",))
    m.set(u=0.01 * rng.standard_normal((16, 8, 3)),
          T=lambda lam, phi, z: 10 + 0.01 * np.cos(np.deg2rad(phi)))
    for _ in range(10):
        m.time_step(60.0)
    u = np.asarray(m.field("u").interior)
    T = np.asarray(m.field("T").interior)
    assert np.isfinite(u).all() and np.isfinite(T).all()
    assert abs(u).max() < 1.0

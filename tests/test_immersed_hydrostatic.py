"""The reference's immersed-hydrostatic suite
(test/test_hydrostatic_free_surface_immersed_boundaries.jl): solid cells
stay exactly zero through steps for explicit AND vertically-implicit
diffusion with a GridFittedBoundary bump; wind-stressed lat-lon flow over
bathymetry runs; and the vertically-integrated lateral face areas over a
terraced bathymetry match the reference's exact tables (the min-rule face
depths that feed the implicit free surface and barotropic corrector)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (FieldBoundaryConditions, FluxBoundaryCondition,
                              RectilinearGrid, ScalarDiffusivity,
                              VerticallyImplicitTimeDiscretization)
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
from oceananigans_tpu.grids.latlon import LatitudeLongitudeGrid
from oceananigans_tpu.immersed import (GridFittedBottom, GridFittedBoundary,
                                       ImmersedBoundaryGrid)
from oceananigans_tpu.models.free_surfaces import (ImplicitFreeSurface,
                                                   SplitExplicitFreeSurface)
from oceananigans_tpu.models.hydrostatic import (HydrostaticFreeSurfaceModel,
                                                 immersed_column_geometry)


@pytest.mark.parametrize("implicit_diffusion", [False, True],
                         ids=["explicit", "vertically_implicit"])
def test_grid_fitted_boundary_keeps_solid_zero(implicit_diffusion):
    """Solid cells inside a Gaussian bump stay exactly 0 through steps
    (reference :17-51)."""
    under = RectilinearGrid(size=(8, 8, 8), x=(-5, 5), y=(-5, 5), z=(0, 2),
                            topology=("periodic", "periodic", "bounded"))
    grid = ImmersedBoundaryGrid(
        under, GridFittedBoundary(lambda x, y, z:
                                  z < np.exp(-x ** 2 - y ** 2)))
    td = (VerticallyImplicitTimeDiscretization() if implicit_diffusion
          else None)
    closure = (ScalarDiffusivity(td, nu=1.0, kappa=0.5) if td is not None
               else ScalarDiffusivity(nu=1.0, kappa=0.5))
    model = HydrostaticFreeSurfaceModel(grid=grid, tracers=("b",),
                                        buoyancy=BuoyancyTracer(),
                                        closure=closure)
    model.set(u=1.0, b=lambda x, y, z: 4 * z)
    solid = np.asarray(grid.solid_ccc)[grid.interior_slices]
    assert solid[3, 3, 1], "test cell is not inside the bump"
    b = np.asarray(model.field("b").interior)
    u = np.asarray(model.field("u").interior)
    assert b[3, 3, 1] == 0 and u[3, 3, 1] == 0
    for _ in range(2):
        model.time_step(1e-3)
    b = np.asarray(model.field("b").interior)
    u = np.asarray(model.field("u").interior)
    assert b[3, 3, 1] == 0 and u[3, 3, 1] == 0
    assert np.all(b[solid] == 0) and np.isfinite(b).all()


def test_surface_wind_stress_over_immersed_latlon():
    """Wind-stressed spherical flow over bathymetry steps stably
    (reference :53-113)."""
    under = LatitudeLongitudeGrid(size=(24, 24, 4), longitude=(-30, 30),
                                  latitude=(15, 75), z=(-4000.0, 0),
                                  topology=("bounded", "bounded", "bounded"))
    bowl = lambda lam, phi: -4000.0 * (1 - ((lam / 30) ** 2
                                            + ((phi - 45) / 30) ** 2) / 2)
    grid = ImmersedBoundaryGrid(under, GridFittedBottom(bowl))
    tau = FluxBoundaryCondition(lambda x, y, t: 1e-4 * np.cos(2 * np.pi
                                                              * (y - 15)
                                                              / 60))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, coriolis=HydrostaticSphericalCoriolis(),
        free_surface=SplitExplicitFreeSurface(substeps=10),
        boundary_conditions={"u": FieldBoundaryConditions(top=tau)})
    for _ in range(4):
        model.time_step(600.0)
    u = np.asarray(model.field("u").interior)
    assert np.isfinite(u).all() and np.abs(u).max() < 1.0


def test_vertically_integrated_lateral_face_depths():
    """The fluid face depths over a terraced bathymetry match the
    reference's exact tables (reference :115-163 — there as the implicit
    solver's ∫Ax/∫Ay; here the same quantities are the H_fc/H_cf column
    geometry feeding the implicit free surface and barotropic
    corrector)."""
    N = 5
    under = RectilinearGrid(size=(N, N, 3), extent=(N, N, 3.0),
                            topology=("periodic", "periodic", "bounded"))
    bath = -3.0 * np.ones((N, N))
    bath[1:N - 1, 1:N - 1] = -2.0
    bath[2:N - 2, 2:N - 2] = -1.0
    grid = ImmersedBoundaryGrid(under, GridFittedBottom(bath))
    H_fc, H_cf, _, _, _ = immersed_column_geometry(grid, jnp.float64)
    sx, sy = grid.interior_slices[0], grid.interior_slices[1]
    hfc = np.asarray(H_fc)[sx, sy, 0]
    hcf = np.asarray(H_cf)[sx, sy, 0]
    # face depth = min of the adjacent columns (periodic wrap)
    depth = -bath
    x_ref = np.minimum(depth, np.roll(depth, 1, 0))
    y_ref = np.minimum(depth, np.roll(depth, 1, 1))
    # the terraced expected values, spelled out (reference's tables)
    assert x_ref[2, 2] == 1.0 and x_ref[0, 0] == 3.0 and x_ref[1, 2] == 2.0
    assert np.allclose(hfc, x_ref), (hfc, x_ref)
    assert np.allclose(hcf, y_ref), (hcf, y_ref)

"""TripolarGrid + zipper fold tests (reference analogue:
test/test_tripolar_grid.jl, zipper tests)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu.grids import TripolarGrid
from oceananigans_tpu.boundary_conditions import (fill_halo_regions,
                                                  regularize_field_boundary_conditions)
from oceananigans_tpu.fields import CenterField, XFaceField, YFaceField


def test_tripolar_coordinates():
    g = TripolarGrid(size=(32, 16), north_poles_latitude=55.0,
                     first_pole_longitude=70.0)
    lam, phi = g.nodes2d(("f", "f"))
    assert np.all(np.isfinite(lam)) and np.all(np.isfinite(phi))
    assert phi.min() >= -80.1 and phi.max() <= 90.01
    # two pole rows: the northernmost row reaches ~the pole latitude band
    assert phi[:, -1].max() <= 90.01
    # metrics positive (non-degenerate away from the poles)
    dx = np.asarray(g.dx(("c", "c", "c")))
    assert np.all(dx >= 0)
    # southern portion ≈ regular lat-lon (mapping → identity away from poles)
    south = phi[:, 0]
    assert np.allclose(south, -80.0, atol=0.2)


def test_zipper_fold_tracer():
    g = TripolarGrid(size=(8, 6), halo=2)
    bcs = regularize_field_boundary_conditions(None, g, ("c", "c", "c"))
    assert bcs.north.classification == "zipper"
    rng = np.random.default_rng(0)
    c = CenterField(g, bcs).set(rng.normal(size=(8, 6, 1)))
    d = np.asarray(c.data)
    h = 2
    Nx, Ny = 8, 6
    # halo row m maps to interior row Ny-1-m with x reversed, same sign
    for m in (1, 2):
        dst = d[h:h + Nx, h + Ny - 1 + m, 0]
        src = d[h:h + Nx, h + Ny - 1 - m, 0]
        assert np.allclose(dst, src[::-1]), m


def test_zipper_fold_velocity_sign_flip():
    g = TripolarGrid(size=(8, 6), halo=2)
    bcs_u = regularize_field_boundary_conditions(None, g, ("f", "c", "c"))
    assert bcs_u.north.condition == -1.0
    rng = np.random.default_rng(1)
    u = XFaceField(g, bcs_u).set(rng.normal(size=(8, 6, 1)))
    d = np.asarray(u.data)
    h, Nx, Ny = 2, 8, 6
    m = 1
    dst = d[h:h + Nx, h + Ny - 1 + m, 0]
    src_row = d[h:h + Nx, h + Ny - 1 - m, 0]
    # Face-x fold: i′ = roll(flip(i), 1), sign flipped except the wrap element
    expect = -np.roll(src_row[::-1], 1)
    expect[0] = -expect[0]
    assert np.allclose(dst, expect)


def test_tripolar_hydrostatic_model_runs():
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    g = TripolarGrid(size=(24, 12, 4), z=(-1000.0, 0.0))
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=SplitExplicitFreeSurface(substeps=20),
        buoyancy=BuoyancyTracer())
    model.set(b=lambda lam, phi, z: 1e-6 * z,
              eta=lambda lam, phi, z: 0.01 * jnp.sin(jnp.deg2rad(lam)))
    for _ in range(5):
        model.time_step(120.0)
    for name in ("u", "v", "eta", "b"):
        vals = np.asarray(model.field(name).interior)
        assert np.all(np.isfinite(vals)), name


def test_seam_column_longitude_continuity():
    """The exact λ=0 column (i = Nx/2, present for every even Nx) must take
    the +90° arctan branch: the `<=` hemisphere split placed it on the
    antipodal meridian and blew the adjacent columns' Δx up to
    near-half-sphere great-circle distances (round-5 review finding)."""
    g = TripolarGrid((8, 4))
    dx = np.broadcast_to(np.asarray(g.dx(("c", "c", "c")), float),
                         g.padded_shape)[g.interior_slices[0],
                                         g.interior_slices[1], 0]
    # within each latitude row the cell widths must be comparable across
    # columns (the grid is zonally quasi-uniform away from the poles);
    # the broken branch gave ratios > 4 at the seam
    for j in range(dx.shape[1]):
        row = dx[:, j]
        # rows near the displaced poles legitimately vary up to ~1.8x;
        # the broken branch gave > 4x at the seam
        assert row.max() / row.min() < 2.5, (j, row)


def test_with_halo_preserves_tripolar_zipper():
    """Round-5 review finding: OSSG.with_halo rebuilt a plain shell grid,
    so a model whose halo inflation re-haloed a default-halo TripolarGrid
    silently lost the north fold. The re-haloed grid must stay a
    TripolarGrid and the model's BCs must still classify north as zipper."""
    import jax.numpy as jnp
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)

    g = TripolarGrid(size=(16, 10, 2), z=(-500.0, 0.0))
    g2 = g.with_halo((5, 5, g.H[2]))
    assert isinstance(g2, TripolarGrid)
    assert getattr(g2, "zipper_north", False)
    assert g2.north_poles_latitude == g.north_poles_latitude

    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=SplitExplicitFreeSurface(substeps=8))
    assert getattr(model.grid, "zipper_north", False), \
        "halo inflation dropped the tripolar fold"
    assert model.bcs["u"].north.classification == "zipper"

    # and a model built directly on a grid with the inflated halo is
    # bit-identical after the same initialization + steps
    gb = TripolarGrid(size=(16, 10, 2), z=(-500.0, 0.0), halo=model.grid.H)
    model_b = HydrostaticFreeSurfaceModel(
        grid=gb, free_surface=SplitExplicitFreeSurface(substeps=8))
    for m in (model, model_b):
        m.set(u=1.0, v=0.0)   # geographic eastward (extrinsic default)
        for _ in range(3):
            m.time_step(120.0)
    for n in ("u", "v", "eta"):
        a = np.asarray(model.field(n).interior)
        b = np.asarray(model_b.field(n).interior)
        assert np.all(np.isfinite(a)), n
        assert np.allclose(a, b, atol=1e-6), n


def test_extrinsic_set_velocity_sign_correct_at_fold():
    """Round-5 review finding: the extrinsic-velocity rotation filled the
    intermediate center-located components with tracer-signed (+1) zipper
    BCs, sign-flipping v in the fold halos. A uniform geographic eastward
    flow must round-trip to (east, north) ≈ (1, 0) away from the
    coordinate-pole singularities, including rows adjacent to the fold."""
    from oceananigans_tpu.grids.orthogonal_spherical_shell import (
        rotate_to_geographic)
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)
    from oceananigans_tpu.operators.operators import ix_c, iy_c

    g0 = TripolarGrid(size=(24, 12, 2), z=(-500.0, 0.0))
    model = HydrostaticFreeSurfaceModel(
        grid=g0, free_surface=SplitExplicitFreeSurface(substeps=8))
    model.set(u=1.0, v=0.0)
    g = model.grid
    ui = model.state["fields"]["u"]
    vi = model.state["fields"]["v"]
    ue, vn = rotate_to_geographic(g, ix_c(g, ui), iy_c(g, vi))
    sx, sy = g.interior_slices[:2]
    # all interior rows except the fold row itself (the geographic pole
    # lies on the fold, where east/north are undefined); mask the columns
    # nearest the two coordinate poles
    ii = (slice(sx.start + 1, sx.stop - 1), slice(sy.start, sy.stop - 1))
    ue = np.asarray(ue)[ii]
    vn = np.asarray(vn)[ii]
    lam_c, phi_c = g.nodes2d(("c", "c"))
    # keep cells equatorward of 45N: far from both poles and the fold
    mask = (phi_c[1:g.N[0] - 1, :g.N[1] - 1] < 45.0)[..., None]
    err_e = np.abs(np.where(mask, ue - 1.0, 0.0)).max()
    err_n = np.abs(np.where(mask, vn, 0.0)).max()
    assert err_e < 5e-2, err_e
    assert err_n < 5e-2, err_n

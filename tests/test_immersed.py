"""Immersed boundary tests (reference analogue:
test/test_immersed_boundary_grid.jl, test_conjugate_gradient_poisson_solver.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.abstract_operations import Average, partial_x
from oceananigans_tpu.immersed import (GridFittedBottom, GridFittedBoundary,
                                       ImmersedBoundaryGrid)
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.operators import div_ccc
from oceananigans_tpu.boundary_conditions import fill_halo_regions


def test_grid_fitted_bottom_mask():
    base = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    ibg = ImmersedBoundaryGrid(base, GridFittedBottom(
        lambda x, y: -0.5 + 0 * x))
    solid = ibg.solid_ccc
    h = base.H[2]
    # bottom half of the water column (z < -0.5) is solid
    ii = base.interior_slices
    s_int = solid[ii]
    assert s_int[:, :, :4].all()
    assert not s_int[:, :, 4:].any()
    # metric delegation works
    assert ibg.dx(("c", "c", "c")) == base.dx(("c", "c", "c"))
    assert ibg.N == base.N


def test_grid_fitted_boundary_sphere():
    base = RectilinearGrid(size=(16, 16, 16), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    ibg = ImmersedBoundaryGrid(base, GridFittedBoundary(
        lambda x, y, z: (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z + 0.5) ** 2
        < 0.2 ** 2))
    s = ibg.solid_ccc[base.interior_slices]
    assert 0 < s.sum() < s.size


def test_immersed_model_flow_over_bump():
    base = RectilinearGrid(size=(32, 1, 16), x=(0, 4), y=(0, 1), z=(-1, 0),
                           topology=("periodic", "flat", "bounded"))
    bump = lambda x, y: -1 + 0.4 * jnp.exp(-((x - 2) / 0.4) ** 2)
    ibg = ImmersedBoundaryGrid(base, GridFittedBottom(bump))
    model = NonhydrostaticModel(grid=ibg)
    model.set(u=0.1)
    for _ in range(5):
        model.time_step(0.01)
    u = np.asarray(model.state["fields"]["u"])
    assert np.all(np.isfinite(u))
    # velocity is masked inside the bump
    solid_u = ibg.solid_fcc
    assert np.abs(u[solid_u]).max() == 0.0
    # flow is (nearly) divergence-free in the fluid
    g = model.grid
    f = model.state["fields"]
    uu = fill_halo_regions(f["u"], g, ("f", "c", "c"), model.bcs["u"])
    ww = fill_halo_regions(f["w"], g, ("c", "c", "f"), model.bcs["w"])
    vv = jnp.zeros_like(uu)
    d = np.asarray(g.interior(div_ccc(g, uu, vv, ww)))
    fluid = ~ibg.solid_ccc[g.interior_slices]
    assert np.abs(d[fluid]).max() < 1e-5, np.abs(d[fluid]).max()
    # and the flow accelerates over the bump crest (mass conservation)
    h = g.H[0]
    u_int = np.asarray(model.field("u").interior)
    crest = u_int[16, 0, -1]
    upstream = u_int[0, 0, -1]
    assert crest > upstream


def test_abstract_operations_basics():
    g = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1),
                        topology=("periodic", "periodic", "periodic"))
    from oceananigans_tpu.fields import CenterField, XFaceField
    u = XFaceField(g).set(lambda x, y, z: jnp.sin(2 * jnp.pi * x))
    c = CenterField(g).set(lambda x, y, z: 2.0)
    prod = u * c
    vals = np.asarray(prod.interior)
    assert vals.shape == (8, 8, 8)
    du = partial_x(u)
    assert du.loc == ("c", "c", "c")
    # Average is volume-weighted; mean of sin over a period ≈ 0
    av = Average(u * u)
    m = float(np.asarray(av.materialize()).ravel()[0])
    assert abs(m - 0.5) < 0.05  # mean of sin² over a period = 1/2


@pytest.mark.slow
def test_partial_cell_bottom_geometry():
    """PartialCellBottom: effective Δz of the bottommost fluid cell equals
    z⁺ - z_b, floored at ϵΔz (reference: partial_cell_bottom.jl:143-167)."""
    from oceananigans_tpu.immersed import PartialCellBottom, ImmersedBoundaryGrid

    grid = RectilinearGrid(size=(4, 4, 10), extent=(1.0, 1.0, 1.0))
    dz = 0.1
    # bottom at z = -0.525: cell k=4 spans [-0.6, -0.5], fluid part 0.025
    pcb = PartialCellBottom(-0.525, minimum_fractional_cell_height=0.2)
    ibg = ImmersedBoundaryGrid(grid, pcb)

    h = grid.H[2]
    dzc = np.asarray(ibg.dz(("c", "c", "c")))
    solid = ibg.solid_ccc
    i, j = grid.H[0] + 1, grid.H[1] + 1
    # cells k=0..3 (z < -0.6... interior index) are solid, k=4 partial
    col_solid = solid[i, j, h:h + 10]
    assert col_solid[:4].all() and not col_solid[4:].any()
    assert np.isclose(dzc[i, j, h + 4], 0.025)
    assert np.isclose(dzc[i, j, h + 5], dz)

    # epsilon floor: bottom at -0.501 leaves a sliver 0.001 < 0.2·Δz; the
    # numerical bottom is capped so the cell stays FLUID at exactly ϵΔz
    # (reference: capped_zb = min(z⁺ - ϵΔz, zb), partial_cell_bottom.jl:96-100)
    pcb2 = PartialCellBottom(-0.501, minimum_fractional_cell_height=0.2)
    ibg2 = ImmersedBoundaryGrid(grid, pcb2)
    col2 = ibg2.solid_ccc[i, j, h:h + 10]
    assert col2[:4].all() and not col2[4:].any()
    dzc2 = np.asarray(ibg2.dz(("c", "c", "c")))
    assert np.isclose(dzc2[i, j, h + 4], 0.02)

    # a model runs on the partial-cell grid and conserves tracer mass
    from oceananigans_tpu.abstract_operations import Integral
    from oceananigans_tpu.advection import Centered
    model = NonhydrostaticModel(grid=ibg, advection=Centered(2), tracers=("c",))
    model.set(c=lambda x, y, z: 1.0 + 0.1 * np.sin(2 * np.pi * x),
              u=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x))
    model.time_step(0.01)  # first step masks c inside the topography
    m0 = float(np.asarray(Integral(model.field("c")).compute()).squeeze())
    for _ in range(5):
        model.time_step(0.01)
    m1 = float(np.asarray(Integral(model.field("c")).compute()).squeeze())
    assert np.isfinite(m1)
    assert abs(m1 - m0) / abs(m0) < 5e-4


def test_immersed_boundary_flux_condition():
    """ImmersedBoundaryCondition (reference: immersed_boundary_condition.jl):
    a top-side immersed flux deposits tracer into fluid cells sitting on the
    topography, conserving the injected total."""
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FluxBoundaryCondition,
        ImmersedBoundaryCondition)
    from oceananigans_tpu.immersed import GridFittedBottom, ImmersedBoundaryGrid
    from oceananigans_tpu.advection import Centered

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0))
    ibg = ImmersedBoundaryGrid(grid, GridFittedBottom(-0.55))
    q = 2e-3  # tracer flux out of the seafloor (geothermal-style)
    c_bcs = FieldBoundaryConditions(
        immersed=ImmersedBoundaryCondition(bottom=FluxBoundaryCondition(q)))
    model = NonhydrostaticModel(grid=ibg, advection=Centered(2),
                                tracers=("c",),
                                boundary_conditions={"c": c_bcs})
    model.set(c=0.0)
    nsteps, dt = 10, 0.05
    for _ in range(nsteps):
        model.time_step(dt)
    c = np.asarray(model.field("c").interior)
    assert np.isfinite(c).all()
    h = model.grid.H[2]
    solid = model.grid.solid_ccc[model.grid.interior_slices]
    # tracer appears only in the first fluid layer above the bottom
    kbot = solid[0, 0].sum()          # first fluid k index
    assert c[:, :, kbot].min() > 0
    assert np.abs(c[:, :, kbot + 2:]).max() < 1e-12
    # injected mass = q * A * t (per column: q * dx*dy * t / V = q*t/dz)
    dz = 1.0 / 8
    expect = q * nsteps * dt / dz
    assert np.allclose(c[:, :, kbot], expect, rtol=1e-6)


def test_immersed_value_and_gradient_conditions():
    """Value/Gradient immersed BCs (reference: immersed_diffusive_fluxes.jl):
    a heated immersed bottom (Value c_b) injects -κ·2(c - c_b)/Δ through the
    immersed face; a Gradient side injects -κ·g. Checked against the
    hand-computed first-step deposit and relaxation toward c_b."""
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, GradientBoundaryCondition,
        ImmersedBoundaryCondition, ValueBoundaryCondition)
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.immersed import GridFittedBottom, ImmersedBoundaryGrid
    from oceananigans_tpu.advection import Centered

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0))
    ibg = ImmersedBoundaryGrid(grid, GridFittedBottom(-0.55))
    kappa, cb = 1e-2, 2.0
    c_bcs = FieldBoundaryConditions(
        immersed=ImmersedBoundaryCondition(bottom=ValueBoundaryCondition(cb)))
    model = NonhydrostaticModel(grid=ibg, advection=None, tracers=("c",),
                                closure=ScalarDiffusivity(kappa=kappa),
                                boundary_conditions={"c": c_bcs})
    model.set(c=0.0)
    dz = 1.0 / 8
    dt = 1e-3
    model.time_step(dt)
    c = np.asarray(model.field("c").interior)
    solid = model.grid.solid_ccc[model.grid.interior_slices]
    kbot = solid[0, 0].sum()
    # first-step deposit (Euler first step): q·A·dt/V = 2κ(cb-0)/dz·dt/dz
    expect = 2 * kappa * cb / dz * dt / dz
    # rtol absorbs the RK3 multi-stage feedback (flux shrinks as c rises)
    assert np.allclose(c[:, :, kbot], expect, rtol=5e-3), \
        (c[0, 0, kbot], expect)
    # relaxation: bottom-layer c keeps rising toward cb, stays bounded by it
    for _ in range(200):
        model.time_step(0.05)
    c = np.asarray(model.field("c").interior)
    assert np.isfinite(c).all()
    assert (c[:, :, kbot] > 0.5).all() and (c[:, :, kbot] < cb + 1e-6).all()

    # Gradient condition: constant prescribed gradient g -> flux -κ g through
    # the immersed bottom face (deposit sign: lowers c for positive g)
    g = 3.0
    c_bcs2 = FieldBoundaryConditions(
        immersed=ImmersedBoundaryCondition(
            bottom=GradientBoundaryCondition(g)))
    model2 = NonhydrostaticModel(grid=ibg, advection=None, tracers=("c",),
                                 closure=ScalarDiffusivity(kappa=kappa),
                                 boundary_conditions={"c": c_bcs2})
    model2.set(c=0.0)
    model2.time_step(dt)
    c2 = np.asarray(model2.field("c").interior)
    expect2 = -kappa * g * dt / dz
    assert np.allclose(c2[:, :, kbot], expect2, rtol=5e-3), \
        (c2[0, 0, kbot], expect2)

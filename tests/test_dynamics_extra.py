"""Remaining test_dynamics.jl cases not mirrored elsewhere (reference:
test/test_dynamics.jl:263-400): the stratified-fluid-at-rest-with-tilted-
gravity exactness tests (buoyancy tracer AND temperature variants) and
inertial oscillations about an arbitrary rotation axis. The other dynamics
cases live in test_validation.py (Taylor-Green, internal waves),
test_advection.py (passive tracer), test_closures_extended.py (diffusion
budgets/cosine), test_background_fields.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (FieldBoundaryConditions,
                              GradientBoundaryCondition, RectilinearGrid)
from oceananigans_tpu.buoyancy import (BuoyancyForce, BuoyancyTracer,
                                       SeawaterBuoyancy)
from oceananigans_tpu.coriolis import ConstantCartesianCoriolis, FPlane
from oceananigans_tpu.models import NonhydrostaticModel


@pytest.mark.parametrize("tracer_kind", ["buoyancy", "temperature"])
def test_stratified_fluid_at_rest_with_tilted_gravity(tracer_kind):
    """A stratification aligned with a TILTED gravity vector is a steady
    state: after an hour of 10-minute steps the buoyancy gradient along
    each axis equals N²·g̃ exactly at every interior point and no flow
    develops (reference: test_dynamics.jl:263-355)."""
    N, L, theta, N2 = 16, 2000.0, 60.0, 1e-5
    grid = RectilinearGrid(size=(1, N, N), extent=(L, L, L),
                           topology=("periodic", "bounded", "bounded"))
    gy, gz = np.sin(np.deg2rad(theta)), np.cos(np.deg2rad(theta))

    if tracer_kind == "buoyancy":
        buoyancy = BuoyancyForce(BuoyancyTracer(),
                                 gravity_unit_vector=(0, -gy, -gz))
        tracers = ("b",)
        grad_y, grad_z = N2 * gy, N2 * gz
        name = "b"
    else:
        g0 = 9.80665
        alpha = 2e-4
        buoyancy = BuoyancyForce(
            SeawaterBuoyancy(constant_salinity=35.0),
            gravity_unit_vector=(0, -gy, -gz))
        tracers = ("T",)
        # b = g α T ⇒ ∂T = N²/(gα) per unit distance along g̃
        grad_y, grad_z = N2 * gy / (g0 * alpha), N2 * gz / (g0 * alpha)
        name = "T"

    y_bc = GradientBoundaryCondition(grad_y)
    z_bc = GradientBoundaryCondition(grad_z)
    bcs = FieldBoundaryConditions(bottom=z_bc, top=z_bc,
                                  south=y_bc, north=y_bc)
    model = NonhydrostaticModel(grid=grid, buoyancy=buoyancy,
                                tracers=tracers,
                                boundary_conditions={name: bcs})
    model.set(**{name: lambda x, y, z: grad_y * y + grad_z * z})

    for _ in range(6):
        model.time_step(600.0)

    from oceananigans_tpu.boundary_conditions.fill_halos import \
        fill_halo_regions
    from oceananigans_tpu.operators.operators import LOC_CCC, ddy, ddz
    c = fill_halo_regions(model.state["fields"][name], model.grid,
                          LOC_CCC, model.bcs[name], model.time)
    dyb = np.asarray(ddy(model.grid, c, ("c", "f", "c")))
    dzb = np.asarray(ddz(model.grid, c, ("c", "c", "f")))
    sl = model.grid.interior_slices
    # exact gradient preservation at EVERY interior point (reference
    # asserts all(...) with ≈)
    assert np.allclose(dyb[sl], grad_y, rtol=1e-8, atol=1e-13 * abs(grad_y))
    assert np.allclose(dzb[sl], grad_z, rtol=1e-8, atol=1e-13 * abs(grad_z))
    for vel in ("u", "v", "w"):
        v = np.asarray(model.field(vel).interior)
        assert np.abs(v).max() < 1e-9, f"{vel} developed flow"


def test_inertial_oscillations_rotation_about_x_axis():
    """A rotation axis along x̂ turns (v, w) the way ẑ turns (u, v): after
    half an inertial period the speed is preserved and the components map
    u_z→v_x, v_z→w_x (reference: test_dynamics.jl:357-397, RK3)."""
    grid = RectilinearGrid(size=(1, 1, 1), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "periodic"))
    f0, ub, dt = 1.0, 1.0, 1e-3
    stop = np.pi / f0          # T_inertial / 2
    n = int(round(stop / dt))

    mx = NonhydrostaticModel(grid=grid, timestepper="RungeKutta3",
                             coriolis=ConstantCartesianCoriolis(
                                 f=f0, rotation_axis=(1, 0, 0)))
    mx.set(v=ub)
    mz = NonhydrostaticModel(grid=grid, timestepper="RungeKutta3",
                             coriolis=FPlane(f=f0))
    mz.set(u=ub)
    for _ in range(n):
        mx.time_step(dt)
        mz.time_step(dt)

    def comp(m, name):
        return float(np.asarray(m.field(name).interior).ravel()[0])

    u_x, v_x, w_x = (comp(mx, c) for c in ("u", "v", "w"))
    u_z, v_z, w_z = (comp(mz, c) for c in ("u", "v", "w"))
    assert abs(u_x) < 1e-12 and abs(w_z) < 1e-12
    assert np.isclose(np.hypot(v_x, w_x), 1.0, rtol=1e-6)
    assert np.isclose(np.hypot(u_z, v_z), 1.0, rtol=1e-6)
    assert np.isclose(u_z, v_x, rtol=1e-6, atol=1e-9)
    assert np.isclose(v_z, w_x, rtol=1e-6, atol=1e-9)

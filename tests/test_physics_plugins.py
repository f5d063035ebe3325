"""Tests for forcings, Stokes drift, biogeochemistry, Lagrangian particles,
and the remaining closures (reference analogue: test_forcings.jl,
test_stokes_drift.jl, test_biogeochemistry.jl, test_lagrangian_particles.jl)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.biogeochemistry import SimpleBiogeochemistry
from oceananigans_tpu.closures import (AnisotropicMinimumDissipation,
                                       Smagorinsky)
from oceananigans_tpu.forcings import (ContinuousForcing, GaussianMask,
                                       LinearTarget, Relaxation)
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.particles import LagrangianParticles
from oceananigans_tpu.stokes_drift import UniformStokesDrift


def test_relaxation_forcing():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    rate = 10.0
    model = NonhydrostaticModel(
        grid=grid, tracers=("c",),
        forcing={"c": Relaxation(rate=rate, target=1.0)})
    model.set(c=0.0)
    for _ in range(20):
        model.time_step(0.01)
    c = np.asarray(model.field("c").interior)
    # c(t) = 1 - exp(-rate t): after t=0.2, ≈ 0.86
    assert np.allclose(c, 1 - np.exp(-rate * model.time), atol=0.01)


def test_relaxation_with_mask_and_target():
    grid = RectilinearGrid(size=(4, 4, 32), extent=(1, 1, 1))
    mask = GaussianMask(center=-0.1, width=0.05, axis=2)
    target = LinearTarget(intercept=0.0, gradient=1.0, axis=2)
    model = NonhydrostaticModel(
        grid=grid, tracers=("b",),
        forcing={"b": Relaxation(rate=1.0, mask=mask, target=target)})
    model.time_step(0.1)
    b = np.asarray(model.field("b").interior)
    assert np.all(np.isfinite(b))
    # forcing pulls b toward z near the surface sponge only
    assert abs(b[0, 0, -3]) > abs(b[0, 0, 2])


def test_continuous_forcing_with_field_dependencies():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))

    def damping(x, y, z, t, u):
        return -10.0 * u

    model = NonhydrostaticModel(
        grid=grid,
        forcing={"u": ContinuousForcing(damping, loc=("f", "c", "c"),
                                        field_dependencies="u")})
    model.set(u=0.1, enforce_incompressibility=False)
    for _ in range(10):
        model.time_step(0.01)
    u = float(np.mean(np.asarray(model.field("u").interior)))
    assert abs(u - 0.1 * np.exp(-10 * model.time)) < 0.005


def test_stokes_drift_tendencies():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    us = UniformStokesDrift(grad_z_us=lambda z, t: 0.1 * jnp.exp(4 * z))
    model = NonhydrostaticModel(grid=grid, stokes_drift=us)
    model.set(w=lambda x, y, z: 0.01 * jnp.sin(2 * jnp.pi * x),
              enforce_incompressibility=False)
    model.time_step(0.01)
    u = np.asarray(model.field("u").interior)
    assert np.all(np.isfinite(u))
    assert np.abs(u).max() > 0  # w ∂z uˢ forced u


def test_biogeochemistry_decay_and_sinking():
    grid = RectilinearGrid(size=(4, 4, 16), extent=(1, 1, 1))
    bgc = SimpleBiogeochemistry(
        tracers=("P",),
        reactions={"P": lambda x, y, z, t, P: -0.5 * P},
        drift={"P": -0.05})  # sinking
    model = NonhydrostaticModel(grid=grid, biogeochemistry=bgc)
    assert "P" in model.tracer_names
    model.set(P=lambda x, y, z: jnp.exp(-((z + 0.3) / 0.1) ** 2))
    z_com0 = _center_of_mass(model)
    for _ in range(10):
        model.time_step(0.05)
    P = np.asarray(model.field("P").interior)
    assert np.all(np.isfinite(P))
    # decay reduces total mass
    z_com1 = _center_of_mass(model)
    assert z_com1 < z_com0  # sinking moves the center of mass down


def _center_of_mass(model):
    P = np.asarray(model.field("P").interior)
    z = model.grid.znodes("c")
    return float((P.sum(axis=(0, 1)) * z).sum() / P.sum())


def test_lagrangian_particles_advect():
    grid = RectilinearGrid(size=(16, 16, 4), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    parts = LagrangianParticles(x=np.asarray([0.2, 0.5]),
                                y=np.asarray([0.5, 0.5]),
                                z=np.asarray([-0.5, -0.5]))
    model = NonhydrostaticModel(grid=grid, particles=parts)
    model.set(u=0.1, enforce_incompressibility=False)
    for _ in range(10):
        model.time_step(0.05)
    x = np.asarray(model.state["particles"]["x"])
    # uniform u = 0.1 for t=0.5 → displacement 0.05
    assert np.allclose(x, [0.25, 0.55], atol=1e-3), x


def test_lagrangian_particles_periodic_wrap():
    grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    parts = LagrangianParticles(x=np.asarray([0.95]), y=np.asarray([0.5]),
                                z=np.asarray([-0.5]))
    model = NonhydrostaticModel(grid=grid, particles=parts)
    model.set(u=0.5, enforce_incompressibility=False)
    for _ in range(4):
        model.time_step(0.1)
    x = float(np.asarray(model.state["particles"]["x"])[0])
    assert 0 <= x < 1
    assert abs(x - 0.15) < 0.01


def test_smagorinsky_and_amd_stable():
    grid = RectilinearGrid(size=(16, 16, 16), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    rng = np.random.default_rng(0)
    for closure in (Smagorinsky(), AnisotropicMinimumDissipation()):
        model = NonhydrostaticModel(grid=grid, closure=closure)
        model.set(u=0.1 * rng.standard_normal((16, 16, 16)),
                  v=0.1 * rng.standard_normal((16, 16, 16)))
        ke0 = float(np.sum(np.asarray(model.field("u").interior) ** 2))
        for _ in range(5):
            model.time_step(0.005)
        u = np.asarray(model.field("u").interior)
        assert np.all(np.isfinite(u)), closure
        # LES closures dissipate small-scale KE
        ke1 = float(np.sum(u ** 2))
        assert ke1 < ke0 * 1.05, closure


def test_perturbation_advection_open_channel():
    """Channel with imposed inflow + PerturbationAdvection outflow (reference:
    perturbation_advection.jl + boundary_mass_fluxes.jl): uniform flow passes
    through unchanged and a tracer blob advects out without reflection."""
    from oceananigans_tpu import (RectilinearGrid, FieldBoundaryConditions,
                                  OpenBoundaryCondition)
    from oceananigans_tpu.boundary_conditions import PerturbationAdvection
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.models import NonhydrostaticModel

    U0 = 0.3
    grid = RectilinearGrid(size=(32, 1, 8), x=(0, 4.0), z=(-1.0, 0.0),
                           topology=("bounded", "flat", "bounded"))
    u_bcs = FieldBoundaryConditions(
        west=OpenBoundaryCondition(U0),
        east=OpenBoundaryCondition(U0, scheme=PerturbationAdvection(
            inflow_timescale=0.1)))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                boundary_conditions={"u": u_bcs},
                                tracers=("c",))
    model.set(u=U0, c=lambda x, y, z: np.exp(-(x - 1.0) ** 2 / 0.05))
    for _ in range(100):
        model.time_step(0.01)
    u = np.asarray(model.field("u").interior)
    c = np.asarray(model.field("c").interior)
    assert np.isfinite(u).all() and np.isfinite(c).all()
    assert np.abs(u - U0).max() < 1e-10          # no reflection/distortion
    peak = np.unravel_index(c.argmax(), c.shape)[0]
    assert 9 <= peak <= 14                       # advected by ~U0·t


def test_buoyancy_force_tilted_gravity():
    """BuoyancyForce with a tilted gravity_unit_vector (reference:
    BuoyancyFormulations/buoyancy.jl): a buoyant blob accelerates along the
    negative gravity direction."""
    from oceananigans_tpu.buoyancy import BuoyancyForce, BuoyancyTracer
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.advection import Centered

    g = np.asarray([-np.sin(0.3), 0.0, -np.cos(0.3)])
    grid = RectilinearGrid(size=(16, 4, 16), extent=(1.0, 1.0, 1.0))
    model = NonhydrostaticModel(
        grid=grid, advection=Centered(2),
        buoyancy=BuoyancyForce(BuoyancyTracer(), gravity_unit_vector=g))
    model.set(b=lambda x, y, z: 0.1 * np.exp(
        -((x - 0.5) ** 2 + (z + 0.5) ** 2) / 0.01))
    for _ in range(10):
        model.time_step(0.01)
    u = np.asarray(model.field("u").interior)
    w = np.asarray(model.field("w").interior)
    # buoyant fluid accelerates opposite to gravity: +x and +z here
    assert u.mean() >= 0 and u.max() > 1e-4
    assert w.max() > 1e-4
    # the momentum ratio follows the tilt direction
    ratio = u.max() / w.max()
    assert 0.1 < ratio < 1.0   # sin(0.3)/cos(0.3) ≈ 0.31


def test_teos10_polynomial_check_value():
    """polyTEOS10-bsq published check value (Roquet et al. 2015, App. A.2):
    ρ(Sᴬ=30 g/kg, Θ=10°C, Z=-1000 m) = 1027.45140 kg/m³."""
    from oceananigans_tpu.buoyancy import TEOS10EquationOfState
    import jax.numpy as jnp
    eos = TEOS10EquationOfState()
    rho = float(eos.density(jnp.float64(10.0) if jnp.zeros(1).dtype == jnp.float64
                            else 10.0, 30.0, -1000.0))
    assert abs(rho - 1027.45140) < 2e-4
    # physical anchors: standard-ocean surface density, expansion coefficients
    assert abs(float(eos.density(0.0, 35.16504, 0.0)) - 1028.107) < 5e-2
    alpha = float(eos.thermal_expansion(15.0, 35.0, 0.0))
    beta = float(eos.haline_contraction(15.0, 35.0, 0.0))
    assert 1.9e-4 < alpha < 2.3e-4
    assert 7.0e-4 < beta < 7.9e-4


def test_teos10_buoyancy_in_model():
    """TEOS-10 EOS drives convection: cold water above warm sinks."""
    import numpy as np
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.buoyancy import (NonlinearSeawaterBuoyancy,
                                           TEOS10EquationOfState)
    from oceananigans_tpu.models import NonhydrostaticModel

    grid = RectilinearGrid(size=(16, 4, 16), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(
        grid=grid, advection=Centered(2),
        buoyancy=NonlinearSeawaterBuoyancy(
            equation_of_state=TEOS10EquationOfState()))
    # warm blob at the bottom in an otherwise cold, uniform-salinity ocean
    model.set(T=lambda x, y, z: 10.0 + 5.0 * np.exp(
        -((x - 0.5) ** 2 + (z + 0.8) ** 2) / 0.02), S=35.0)
    for _ in range(10):
        model.time_step(0.005)
    w = np.asarray(model.field("w").interior)
    assert np.isfinite(w).all()
    assert w.max() > 1e-5   # warm (light) water rises


def test_particles_bounce_off_immersed_boundary():
    """Particles advected into the topography bounce back into their
    previous wet cell (reference:
    lagrangian_particle_advection.jl bounce_immersed_particle)."""
    from oceananigans_tpu.immersed import (GridFittedBottom,
                                           ImmersedBoundaryGrid)
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.particles import LagrangianParticles
    base = RectilinearGrid(size=(16, 1, 16), x=(0, 1.0), y=(0, 1.0),
                           z=(-1.0, 0.0),
                           topology=("periodic", "flat", "bounded"))
    # a step bottom: solid below z = -0.5 for x > 0.5
    grid = ImmersedBoundaryGrid(
        base, GridFittedBottom(lambda x, y: np.where(x > 0.5, -0.5, -1.0)))
    parts = LagrangianParticles(x=[0.3], y=[0.5], z=[-0.75],
                                restitution=1.0)
    model = NonhydrostaticModel(grid=grid, advection=None, particles=parts)
    # uniform rightward flow at the particle depth would carry it into the
    # step; it must NOT end up inside the solid
    model.set(u=0.5)
    solid = np.asarray(grid.solid_ccc)
    for _ in range(40):
        model.time_step(0.05)
        p = model.state["particles"]
        x, z = float(p["x"][0]), float(p["z"][0])
        # locate the particle's cell and assert it is wet
        xf = np.asarray(grid.coord_padded(0, "f"))
        zf = np.asarray(grid.coord_padded(2, "f"))
        i = np.clip(np.searchsorted(xf, x) - 1, 0, solid.shape[0] - 1)
        k = np.clip(np.searchsorted(zf, z) - 1, 0, solid.shape[2] - 1)
        assert not solid[i, grid.H[1], k], (x, z)


def test_particles_custom_properties_and_dynamics():
    """Custom per-particle properties ride the state pytree and a custom
    dynamics callable can update them (reference: arbitrary particle
    struct fields + dynamics!)."""
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.particles import LagrangianParticles

    def age_dynamics(grid, fields, particles, dt):
        return dict(particles, age=particles["age"] + dt)

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    parts = LagrangianParticles(x=[0.1, 0.2], y=[0.5, 0.5], z=[-0.5, -0.3],
                                properties={"age": [0.0, 0.0]},
                                dynamics=age_dynamics)
    model = NonhydrostaticModel(grid=grid, advection=None, particles=parts)
    model.set(u=0.1)
    for _ in range(5):
        model.time_step(0.01)
    age = np.asarray(model.state["particles"]["age"])
    np.testing.assert_allclose(age, 0.05, rtol=1e-6)
    assert float(model.state["particles"]["x"][0]) > 0.1


def test_roquet_eos_thermobaric_sign():
    """Round-5 review regression: the μ₁ (thermobaric) term multiplies DEPTH
    (positive down), so warm water becomes MORE buoyant (less dense) at depth
    — the previous height-signed form inverted this (reference:
    SeawaterPolynomials second-order EOS via nonlinear_equation_of_state.jl)."""
    from oceananigans_tpu import RoquetSecondOrderEquationOfState
    eos = RoquetSecondOrderEquationOfState()
    rho_surface = float(eos.density_anomaly(10.0, 0.0, 0.0))
    rho_deep = float(eos.density_anomaly(10.0, 0.0, -1000.0))
    assert rho_deep < rho_surface
    # exact published-coefficient value: ρ' = -a0(1 + ½λ1Θ + μ1·d)Θ + b0 S
    d = 1000.0
    expect = -eos.a0 * (1 + 0.5 * eos.lambda1 * 10.0 + eos.mu1 * d) * 10.0
    np.testing.assert_allclose(rho_deep, expect, rtol=1e-12)


def test_nontraditional_beta_plane_reference_form():
    """Round-5 review regression: NonTraditionalBetaPlane follows the
    reference's 2Ωʸ/2Ωᶻ form (non_traditional_beta_plane.jl:55-66) — the
    previous version zeroed γ and attached it to the wrong component."""
    from oceananigans_tpu import NonTraditionalBetaPlane
    import jax.numpy as jnp
    grid = RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=("periodic", "periodic", "bounded"))
    cor = NonTraditionalBetaPlane(fz0=1e-4, beta=1e-11, fy0=2e-4,
                                  gamma=-3e-11, radius=6.4e6)
    u0, v0, w0 = 0.3, -0.2, 0.05
    shp = grid.padded_shape
    u, v, w = (jnp.full(shp, q) for q in (u0, v0, w0))
    H = grid.H[0]
    # analytic value at one interior cell (y at center, z at center)
    y = float(np.asarray(grid.coord_padded(1, "c"))[H + 1])
    z = float(np.asarray(grid.coord_padded(2, "c"))[H + 1])
    Oy = cor.fy0 * (1 - z / cor.R) + cor.gamma * y
    Oz = cor.fz0 * (1 + 2 * z / cor.R) + cor.beta * y
    x_got = float(np.asarray(cor.x_f_cross_U(grid, u, v, w))[H + 1, H + 1,
                                                             H + 1])
    np.testing.assert_allclose(x_got, Oy * w0 - Oz * v0, rtol=1e-6)
    y_got = float(np.asarray(cor.y_f_cross_U(grid, u, v, w))[H + 1, H + 1,
                                                             H + 1])
    np.testing.assert_allclose(y_got, Oz * u0, rtol=1e-6)
    # z-component at a z-face: −2Ωʸ·u
    zf = float(np.asarray(grid.coord_padded(2, "f"))[H + 1])
    Oy_f = cor.fy0 * (1 - zf / cor.R) + cor.gamma * y
    z_got = float(np.asarray(cor.z_f_cross_U(grid, u, v, w))[H + 1, H + 1,
                                                             H + 1])
    np.testing.assert_allclose(z_got, -Oy_f * u0, rtol=1e-6)


def test_relaxation_on_face_field_uses_face_coords():
    """Round-5 review regression: models bind the forced field's staggered
    location into the forcing, so a sponge on u evaluates its mask at x-FACE
    nodes (reference: relaxation.jl builds the forcing at the field's
    location), not half a cell off at centers."""
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu import Relaxation
    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(
        grid=grid, advection=None,
        forcing={"u": Relaxation(rate=2.0, mask=lambda x, y, z: x)})
    model.set(u=1.0)
    F = model.forcing["u"]
    assert F.loc == model.loc("u")
    out = np.asarray(F(grid, model.state["fields"], 0.0))
    H = grid.H[0]
    x_face = np.asarray(grid.coord_padded(0, "f"))[H:H + 4]
    got = out[H:H + 4, H + 1, H + 1]
    np.testing.assert_allclose(got, -2.0 * x_face * 1.0, rtol=1e-6)
    # face coords start at 0.0; center coords would start at 0.125
    assert abs(got[0]) < 1e-12


def test_advective_forcing_accepts_field_velocity():
    """Round-5 review regression: AdvectiveForcing unwraps Field settling
    velocities (reference: advective_forcing.jl accepts fields or numbers) —
    previously a Field crashed the scalar check inside the forcing."""
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu import AdvectiveForcing, ZFaceField
    grid = RectilinearGrid(size=(4, 4, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    ws = ZFaceField(grid).set(-0.01)
    model = NonhydrostaticModel(grid=grid, advection=None, tracers=("P",),
                                forcing={"P": AdvectiveForcing(w=ws)})
    model.set(P=lambda x, y, z: np.exp(-((z + 0.5) / 0.1) ** 2))
    for _ in range(3):
        model.time_step(0.1)
    P = np.asarray(model.field("P").interior)
    assert np.isfinite(P).all()
    # sinking: the profile's center of mass moves down
    z_c = np.asarray(grid.coord_padded(2, "c"))[grid.H[2]:grid.H[2] + 8]
    com = (P.mean((0, 1)) * z_c).sum() / P.mean((0, 1)).sum()
    assert com < -0.5


def test_hydrostatic_spherical_coriolis_latlon_schemes():
    """Round-5 review regression: on LatitudeLongitudeGrid the
    energy/enstrophy-conserving Sadourny forms apply (Δx-weighted, f at
    (f,f) nodes — hydrostatic_spherical_coriolis.jl:71-97); previously the
    scheme argument was silently ignored on 1D-latitude grids."""
    import jax.numpy as jnp
    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
    grid = LatitudeLongitudeGrid(size=(16, 16, 1), longitude=(-20, 20),
                                 latitude=(20, 60), z=(-100, 0),
                                 halo=(4, 4, 4))
    shp = grid.padded_shape
    u = jnp.ones(shp)
    # uniform u: both schemes reduce to +f(φ_f)·u for the v-tendency
    H = grid.H[1]
    phi_f = np.asarray(grid.coord_padded(1, "f"))[H + 3]
    f_expect = 2 * 7.292115e-5 * np.sin(np.deg2rad(phi_f))
    for scheme in ("energy_conserving", "enstrophy_conserving"):
        cor = HydrostaticSphericalCoriolis(scheme=scheme)
        y_got = float(np.asarray(cor.y_f_cross_U(grid, u, u, u))[8, H + 3, 2])
        np.testing.assert_allclose(y_got, f_expect, rtol=1e-5)
    # a zonally varying v distinguishes the two schemes in x
    x2d = np.zeros(shp)
    x2d[:] = np.sin(np.linspace(0, 4 * np.pi, shp[0]))[:, None, None]
    v = jnp.asarray(x2d)
    xe = np.asarray(HydrostaticSphericalCoriolis(
        scheme="energy_conserving").x_f_cross_U(grid, u, v, u))
    xz = np.asarray(HydrostaticSphericalCoriolis(
        scheme="enstrophy_conserving").x_f_cross_U(grid, u, v, u))
    assert np.max(np.abs(xe - xz)) > 1e-10


def test_biogeochemistry_in_hydrostatic_model():
    """Biogeochemistry applies to the hydrostatic model too (reference:
    Biogeochemistry.jl hooks are model-family agnostic): required tracers
    auto-added, reactions + sinking drift in the tendencies, host
    update_state hook called each step."""
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel
    from oceananigans_tpu.biogeochemistry import SimpleBiogeochemistry

    calls = []

    class Decay(SimpleBiogeochemistry):
        def update_state(self, model):
            calls.append(model.iteration)

    bgc = Decay(tracers=("P",),
                reactions={"P": lambda x, y, z, t, P: -0.5 * P},
                drift={"P": -0.02})
    grid = RectilinearGrid(size=(4, 4, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = HydrostaticFreeSurfaceModel(grid=grid, momentum_advection=None,
                                        biogeochemistry=bgc)
    assert "P" in model.tracer_names
    model.set(P=lambda x, y, z: np.exp(-((z + 0.3) / 0.1) ** 2))
    P0 = np.asarray(model.field("P").interior).mean()
    for _ in range(5):
        model.time_step(0.1)
    P = np.asarray(model.field("P").interior)
    assert np.isfinite(P).all()
    # decay at rate 0.5: mean drops by ~exp(-0.25)
    np.testing.assert_allclose(P.mean() / P0, np.exp(-0.25), rtol=0.05)
    # sinking: center of mass moves down
    z_c = np.asarray(grid.coord_padded(2, "c"))[grid.H[2]:grid.H[2] + 8]
    com = (P.mean((0, 1)) * z_c).sum() / P.mean((0, 1)).sum()
    assert com < -0.3
    assert calls == [1, 2, 3, 4, 5]


def test_forcing_arrays_and_fields():
    """Port of test_forcings.jl time_step_with_forcing_array: Fields (and
    bare padded arrays) used directly as constant forcings on u, v, w."""
    from oceananigans_tpu import XFaceField, YFaceField, ZFaceField
    from oceananigans_tpu.models import NonhydrostaticModel
    grid = RectilinearGrid(size=(2, 2, 2), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    Fu = XFaceField(grid).set(1.0)
    Fv = YFaceField(grid).set(1.0)
    Fw = ZFaceField(grid).set(1.0)
    model = NonhydrostaticModel(grid=grid, advection=None,
                                forcing={"u": Fu, "v": Fv, "w": Fw})
    model.time_step(1.0)
    assert np.isfinite(np.asarray(model.field("u").interior)).all()
    # the projection removes any divergent part; the uniform u-forcing
    # survives as a mean flow
    u = np.asarray(model.field("u").interior)
    np.testing.assert_allclose(u.mean(), 1.0, rtol=1e-5)


def test_forcing_with_auxiliary_field_dependencies():
    """Port of test_forcings.jl time_step_with_*_field_dependent_forcing:
    continuous forcings may depend on prognostic AND auxiliary fields;
    mutating the auxiliary field between steps changes the forcing without
    re-tracing (aux fields ride in as step inputs)."""
    from oceananigans_tpu import CenterField, Forcing
    from oceananigans_tpu.forcings import ContinuousForcing
    from oceananigans_tpu.models import NonhydrostaticModel

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    A = CenterField(grid).set(2.0)
    Fc = ContinuousForcing(lambda x, y, z, t, c, A: -c * 0.0 + A,
                           field_dependencies=("c", "A"))
    model = NonhydrostaticModel(grid=grid, advection=None, tracers=("c",),
                                forcing={"c": Fc},
                                auxiliary_fields={"A": A})
    model.time_step(0.1)
    c1 = np.asarray(model.field("c").interior).mean()
    np.testing.assert_allclose(c1, 0.2, rtol=1e-5)    # dt·A = 0.1·2
    A.set(4.0)                                        # host mutation
    model.time_step(0.1)
    c2 = np.asarray(model.field("c").interior).mean()
    np.testing.assert_allclose(c2 - c1, 0.4, rtol=1e-4)  # sees the new A


def test_forcing_aux_dependency_hydrostatic():
    from oceananigans_tpu import CenterField
    from oceananigans_tpu.forcings import ContinuousForcing
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    A = CenterField(grid).set(1.5)
    Fc = ContinuousForcing(lambda x, y, z, t, A: A,
                           field_dependencies=("A",))
    model = HydrostaticFreeSurfaceModel(grid=grid, momentum_advection=None,
                                        tracers=("c",), forcing={"c": Fc},
                                        auxiliary_fields={"A": A})
    for _ in range(2):
        model.time_step(0.1)
    c = np.asarray(model.field("c").interior).mean()
    np.testing.assert_allclose(c, 0.3, rtol=1e-5)

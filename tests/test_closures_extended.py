"""Tests for vertical-diffusivity closures: convective adjustment, Ri-based,
CATKE, Leith (reference analogue: test_turbulence_closures.jl)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import (CATKEVerticalDiffusivity,
                                       ConvectiveAdjustmentVerticalDiffusivity,
                                       RiBasedVerticalDiffusivity,
                                       TwoDimensionalLeith)
from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                     ImplicitFreeSurface, NonhydrostaticModel)


def test_convective_adjustment_mixes_unstable_column():
    grid = RectilinearGrid(size=(4, 4, 16), extent=(1, 1, 1))
    buoyancy = BuoyancyTracer()
    closure = ConvectiveAdjustmentVerticalDiffusivity(
        convective_kappa_z=1.0, buoyancy=buoyancy)
    model = NonhydrostaticModel(grid=grid, buoyancy=buoyancy, closure=closure)
    # unstable: buoyancy increasing downward (b decreasing upward)
    model.set(b=lambda x, y, z: -0.01 * z)  # ∂z b < 0... b = -0.01 z ⇒ ∂z b = -0.01 < 0 unstable
    b0_range = _b_range(model)
    for _ in range(20):
        model.time_step(0.05)
    b1_range = _b_range(model)
    assert b1_range < b0_range * 0.8  # column mixes toward homogeneous
    assert np.all(np.isfinite(np.asarray(model.field("b").interior)))


def _b_range(model):
    b = np.asarray(model.field("b").interior)
    prof = b.mean(axis=(0, 1))
    return float(prof.max() - prof.min())


def test_convective_adjustment_preserves_stable_column():
    grid = RectilinearGrid(size=(4, 4, 16), extent=(1, 1, 1))
    buoyancy = BuoyancyTracer()
    closure = ConvectiveAdjustmentVerticalDiffusivity(
        convective_kappa_z=1.0, background_kappa_z=0.0, buoyancy=buoyancy)
    model = NonhydrostaticModel(grid=grid, buoyancy=buoyancy, closure=closure)
    model.set(b=lambda x, y, z: 0.01 * z)  # stable stratification
    b0 = np.asarray(model.field("b").interior).copy()
    for _ in range(10):
        model.time_step(0.05)
    b1 = np.asarray(model.field("b").interior)
    assert np.allclose(b0, b1, atol=1e-8)  # nothing to mix


def test_ri_based_closure_runs():
    grid = RectilinearGrid(size=(4, 4, 16), extent=(200.0, 200.0, 100.0))
    buoyancy = BuoyancyTracer()
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ImplicitFreeSurface(),
        buoyancy=buoyancy,
        closure=RiBasedVerticalDiffusivity(buoyancy=buoyancy))
    model.set(b=lambda x, y, z: 1e-5 * z,
              u=lambda x, y, z: 0.1 * (1 + z / 100.0))
    for _ in range(10):
        model.time_step(10.0)
    assert np.all(np.isfinite(np.asarray(model.field("u").interior)))


def test_catke_wind_mixing_deepens_layer():
    # classic wind-driven mixed layer: stress at surface, stable strat below
    grid = RectilinearGrid(size=(4, 4, 32), extent=(200.0, 200.0, 64.0))
    buoyancy = BuoyancyTracer()
    closure = CATKEVerticalDiffusivity(buoyancy=buoyancy)
    from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                      FluxBoundaryCondition)
    u_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-4))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ImplicitFreeSurface(), buoyancy=buoyancy,
        closure=closure, boundary_conditions={"u": u_bcs})
    assert "e" in model.tracer_names
    N2 = 1e-5
    model.set(b=lambda x, y, z: N2 * z, e=1e-7)
    for _ in range(30):
        model.time_step(60.0)
    e = np.asarray(model.field("e").interior)
    b = np.asarray(model.field("b").interior)
    assert np.all(np.isfinite(e))
    assert e.max() > 1e-7          # TKE generated near the surface
    prof = e.mean(axis=(0, 1))
    assert prof[-1] > prof[0]      # concentrated near the top
    assert np.all(np.isfinite(b))


def test_leith_runs_2d():
    grid = RectilinearGrid(size=(32, 32), x=(0, 1), y=(0, 1),
                           topology=("periodic", "periodic", "flat"))
    rng = np.random.default_rng(0)
    model = NonhydrostaticModel(grid=grid, closure=TwoDimensionalLeith())
    model.set(u=0.1 * rng.standard_normal((32, 32)),
              v=0.1 * rng.standard_normal((32, 32)))
    for _ in range(5):
        model.time_step(0.002)
    assert np.all(np.isfinite(np.asarray(model.field("u").interior)))


def test_gm_redi_flattens_isopycnals():
    # a tilted buoyancy front with GM: the skew flux slumps the front
    # (releases APE) while conserving the tracer integral
    from oceananigans_tpu.closures import IsopycnalSkewSymmetricDiffusivity
    from oceananigans_tpu.models.hydrostatic import PrescribedVelocityFields
    grid = RectilinearGrid(size=(32, 1, 16), x=(0, 1e5), y=(0, 1e3),
                           z=(-1000.0, 0),
                           topology=("bounded", "periodic", "bounded"))
    buoyancy = BuoyancyTracer()
    clo = IsopycnalSkewSymmetricDiffusivity(kappa_redi=500.0, kappa_gm=500.0,
                                            buoyancy=buoyancy)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, buoyancy=buoyancy, closure=clo,
        velocities=PrescribedVelocityFields())  # no flow: closure only
    N2, M2 = 1e-5, 1e-7
    model.set(b=lambda x, y, z: N2 * z + M2 * (x - 5e4))
    b0 = np.asarray(model.field("b").interior)
    tot0 = b0.sum()
    for _ in range(20):
        model.time_step(3600.0)
    b1 = np.asarray(model.field("b").interior)
    assert np.all(np.isfinite(b1))
    assert np.isclose(b1.sum(), tot0, rtol=1e-9)     # conservative fluxes
    # horizontal buoyancy variance at mid depth decreases (front slumps)
    var0 = b0[:, 0, 8].std()
    var1 = b1[:, 0, 8].std()
    assert var1 < var0, (var0, var1)


def test_k_epsilon_wind_mixing():
    from oceananigans_tpu.closures import TKEDissipationVerticalDiffusivity
    from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                      FluxBoundaryCondition)
    grid = RectilinearGrid(size=(4, 4, 32), extent=(200.0, 200.0, 64.0))
    buoyancy = BuoyancyTracer()
    closure = TKEDissipationVerticalDiffusivity(buoyancy=buoyancy)
    u_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-4))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ImplicitFreeSurface(), buoyancy=buoyancy,
        closure=closure, boundary_conditions={"u": u_bcs})
    assert set(("e", "eps")).issubset(model.tracer_names)
    model.set(b=lambda x, y, z: 1e-5 * z, e=1e-7, eps=1e-9)
    for _ in range(30):
        model.time_step(60.0)
    e = np.asarray(model.field("e").interior)
    assert np.all(np.isfinite(e))
    prof = e.mean(axis=(0, 1))
    assert prof[-1] > prof[0]  # TKE near the surface


def test_dynamic_smagorinsky():
    """DynamicCoefficient (reference: Smagorinskys/dynamic_coefficient.jl):
    c² from the Germano identity. For pure solid-body-like uniform shear the
    resolved Leonard stress vanishes, so c² → 0; for a turbulent-like field
    c² is finite and the closure runs stably."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.closures.smagorinsky import (
        DynamicSmagorinsky, dynamic_coefficient_sq)
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.advection import Centered

    grid = RectilinearGrid(size=(16, 16, 16), extent=(1, 1, 1))
    rng = np.random.default_rng(8)

    # linear velocity field: filters are exact for linear fields => L = 0
    model = NonhydrostaticModel(grid=grid, closure=DynamicSmagorinsky())
    model.set(u=lambda x, y, z: 0.3 * z, enforce_incompressibility=False)
    f = model._fill_all(model.state["fields"], 0.0)
    csq = np.asarray(dynamic_coefficient_sq(
        grid.with_halo(model.grid.H), f["u"], f["v"], f["w"],
        (0, 1, 2), 1e-32))
    ii = model.grid.interior_slices
    assert np.abs(csq[ii]).max() < 1e-3, csq[ii].max()

    # turbulent-like field: finite coefficient, stable stepping
    model2 = NonhydrostaticModel(grid=grid, closure=DynamicSmagorinsky(),
                                 advection=Centered(2))
    model2.set(u=0.1 * rng.standard_normal((16, 16, 16)),
               v=0.1 * rng.standard_normal((16, 16, 16)))
    for _ in range(3):
        model2.time_step(1e-3)
    u = np.asarray(model2.field("u").interior)
    assert np.isfinite(u).all()
    aux = model2.closure.compute_diffusivities(
        model2.grid, model2._fill_all(model2.state["fields"], 0.0), 0.0)
    nu = np.asarray(aux["nu_e"])[model2.grid.interior_slices]
    assert np.isfinite(nu).all() and nu.max() > 0


def test_catke_convective_boundary_layer():
    """Surface buoyancy LOSS (Jᵇ > 0) drives convective mixing: the CATKE
    convective length (Deardorff scaling, catke_mixing_length.jl:96-145)
    activates and deepens a mixed layer faster than without the flux."""
    from oceananigans_tpu.boundary_conditions import (FieldBoundaryConditions,
                                                      FluxBoundaryCondition)

    def run(Jb):
        grid = RectilinearGrid(size=(4, 4, 32), extent=(200.0, 200.0, 64.0))
        buoyancy = BuoyancyTracer()
        closure = CATKEVerticalDiffusivity(buoyancy=buoyancy,
                                           surface_buoyancy_flux=Jb)
        b_bcs = FieldBoundaryConditions(top=FluxBoundaryCondition(Jb))
        model = HydrostaticFreeSurfaceModel(
            grid=grid, free_surface=ImplicitFreeSurface(), buoyancy=buoyancy,
            closure=closure, boundary_conditions={"b": b_bcs})
        model.set(b=lambda x, y, z: 1e-5 * z, e=1e-7)
        for _ in range(30):
            model.time_step(60.0)
        return (np.asarray(model.field("e").interior),
                np.asarray(model.field("b").interior))

    e_conv, b_conv = run(5e-8)
    e_none, b_none = run(0.0)
    assert np.isfinite(e_conv).all() and np.isfinite(b_conv).all()
    # convective forcing must produce much more TKE
    assert e_conv.max() > 5 * max(e_none.max(), 1e-9)
    # and a deeper (more homogenized) near-surface buoyancy profile
    prof = b_conv.mean(axis=(0, 1))
    top_strat = prof[-1] - prof[-6]
    assert top_strat < 0.8 * 1e-5 * (64.0 / 32 * 5)


def test_lagrangian_averaged_dynamic_smagorinsky():
    """Lagrangian-averaged dynamic Smagorinsky (reference:
    dynamic_coefficient.jl:233-330, Bou-Zeid et al. 2005): the JLM/JMM state
    fields spin up from spatial means, relax along trajectories, and produce
    a bounded positive eddy viscosity comparable to the volume-averaged
    dynamic coefficient."""
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.closures import (DynamicSmagorinsky,
                                           LagrangianAveraging)
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.models import NonhydrostaticModel

    rng = np.random.default_rng(11)
    grid = RectilinearGrid(size=(16, 16, 16), extent=(1.0, 1.0, 1.0))
    u0 = 0.2 * rng.standard_normal((16, 16, 16))
    v0 = 0.2 * rng.standard_normal((16, 16, 16))

    model = NonhydrostaticModel(
        grid=grid, advection=Centered(2),
        closure=DynamicSmagorinsky(averaging=LagrangianAveraging()))
    assert model.closure.state_fields == ("JLM", "JMM")
    model.set(u=u0, v=v0)
    model.time_step(1e-3)
    JLM = np.asarray(model.state["fields"]["JLM"])
    JMM = np.asarray(model.state["fields"]["JMM"])
    ii = model.grid.interior_slices
    # first step: initialized to the (positive) spatial means
    assert JMM[ii].min() > 0
    assert np.allclose(JLM[ii], JLM[ii].flat[0])
    for _ in range(10):
        model.time_step(1e-3)
    JLM = np.asarray(model.state["fields"]["JLM"])[ii]
    JMM = np.asarray(model.state["fields"]["JMM"])[ii]
    assert np.isfinite(JLM).all() and np.isfinite(JMM).all()
    # after relaxation the fields have developed spatial structure
    assert JLM.std() > 0 and JMM.std() > 0
    u = np.asarray(model.field("u").interior)
    assert np.isfinite(u).all() and np.abs(u).max() < 1.0
    # eddy viscosity: positive, same order as the volume-averaged variant
    from oceananigans_tpu.closures.smagorinsky import filter_width_sq
    ff = model._fill_all(model.state["fields"], 0.0)
    aux = model.closure.compute_diffusivities(model.grid, ff, 0.0)
    nu = np.asarray(aux["nu_e"])[ii]
    assert (nu >= 0).all() and np.isfinite(nu).all()

    mvol = NonhydrostaticModel(grid=grid, advection=Centered(2),
                               closure=DynamicSmagorinsky())
    mvol.set(u=u0, v=v0)
    for _ in range(11):
        mvol.time_step(1e-3)
    ffv = mvol._fill_all(mvol.state["fields"], 0.0)
    nuv = np.asarray(mvol.closure.compute_diffusivities(
        mvol.grid, ffv, 0.0)["nu_e"])[ii]
    assert nu.mean() < 50 * max(nuv.mean(), 1e-10)
    assert nu.mean() > 0.02 * nuv.mean()


def test_triad_isoneutral_exactness():
    """Griffies triads: when c == b every triad flux vanishes EXACTLY
    (Fx-triad ∝ ∂x b + Sx ∂z b = 0 per triad) — the discrete isoneutrality
    property that motivates the triad scheme (reference:
    isopycnal_skew_symmetric_diffusivity_with_triads.jl)."""
    from oceananigans_tpu.closures import (
        TriadIsopycnalSkewSymmetricDiffusivity)
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel, PrescribedVelocityFields)
    grid = RectilinearGrid(size=(24, 1, 12), x=(0, 1e5), y=(0, 1e3),
                           z=(-1000.0, 0),
                           topology=("bounded", "periodic", "bounded"))
    buoyancy = BuoyancyTracer()
    clo = TriadIsopycnalSkewSymmetricDiffusivity(
        kappa_symmetric=1000.0, maximum_slope=1e-2, buoyancy=buoyancy)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, buoyancy=buoyancy, closure=clo,
        velocities=PrescribedVelocityFields())
    N2, M2 = 1e-5, 5e-8   # |S| = M2/N2 = 5e-3 < max slope (no taper)
    model.set(b=lambda x, y, z: N2 * z + M2 * (x - 5e4))
    ff = model._fill_all(model.state["fields"], 0.0)
    aux = clo.compute_diffusivities(model.grid, ff, 0.0)
    G = clo.tracer_tendency(model.grid, "b", ff, aux)
    # interior away from boundaries (triads near walls are masked)
    Gi = np.asarray(model.grid.interior(G))[2:-2, :, 2:-2]
    assert np.abs(Gi).max() < 1e-17, np.abs(Gi).max()


def test_triad_front_slumping_and_conservation():
    from oceananigans_tpu.closures import (
        TriadIsopycnalSkewSymmetricDiffusivity)
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel, PrescribedVelocityFields)
    grid = RectilinearGrid(size=(32, 1, 16), x=(0, 1e5), y=(0, 1e3),
                           z=(-1000.0, 0),
                           topology=("bounded", "periodic", "bounded"))
    buoyancy = BuoyancyTracer()
    clo = TriadIsopycnalSkewSymmetricDiffusivity(
        kappa_symmetric=500.0, kappa_skew=500.0, buoyancy=buoyancy)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, buoyancy=buoyancy, closure=clo,
        velocities=PrescribedVelocityFields())
    model.set(b=lambda x, y, z: 1e-5 * z + 1e-7 * (x - 5e4))
    b0 = np.asarray(model.field("b").interior)
    for _ in range(20):
        model.time_step(3600.0)
    b1 = np.asarray(model.field("b").interior)
    assert np.all(np.isfinite(b1))
    assert np.isclose(b1.sum(), b0.sum(), rtol=1e-9)
    assert b1[:, 0, 8].std() < b0[:, 0, 8].std()


def test_gm_advective_skew_form():
    """AdvectiveFormulation (reference: advective_skew_diffusion.jl): the
    eddy transport velocities are discretely non-divergent and slump the
    front like the flux form while conserving the tracer."""
    from oceananigans_tpu.closures import IsopycnalSkewSymmetricDiffusivity
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel, PrescribedVelocityFields)
    from oceananigans_tpu.operators.operators import div_ccc
    grid = RectilinearGrid(size=(32, 1, 16), x=(0, 1e5), y=(0, 1e3),
                           z=(-1000.0, 0),
                           topology=("periodic", "periodic", "bounded"))
    buoyancy = BuoyancyTracer()
    clo = IsopycnalSkewSymmetricDiffusivity(
        kappa_redi=0.0, kappa_gm=500.0, buoyancy=buoyancy,
        skew_flux_formulation="advective")
    assert clo.has_eddy_velocities
    model = HydrostaticFreeSurfaceModel(grid=grid, buoyancy=buoyancy,
                                        closure=clo,
                                        velocities=PrescribedVelocityFields())
    model.set(b=lambda x, y, z: 1e-5 * z
              + 1e-7 * 5e4 * jnp.sin(2 * jnp.pi * x / 1e5))
    ff = model._fill_all(model.state["fields"], 0.0)
    ue, ve, we = clo.eddy_velocities(model.grid, ff)
    div = np.asarray(model.grid.interior(
        div_ccc(model.grid, ue, ve, we)))[2:-2, :, 1:-1]
    assert np.abs(div).max() < 1e-16, np.abs(div).max()
    b0 = np.asarray(model.field("b").interior)
    for _ in range(10):
        model.time_step(3600.0)
    b1 = np.asarray(model.field("b").interior)
    assert np.all(np.isfinite(b1))
    assert np.isclose(b1.sum(), b0.sum(), rtol=1e-6)


def test_isopycnal_kappa_field():
    """κ_symmetric/κ_skew as callables of (x, y, z) (reference: κ 'may be
    constants, arrays, fields, or functions'): a spatially-varying κ still
    conserves the tracer and reduces to the scalar case where constant."""
    from oceananigans_tpu.closures import (
        TriadIsopycnalSkewSymmetricDiffusivity)
    from oceananigans_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel, PrescribedVelocityFields)
    grid = RectilinearGrid(size=(24, 1, 12), x=(0, 1e5), y=(0, 1e3),
                           z=(-1000.0, 0),
                           topology=("bounded", "periodic", "bounded"))
    buoyancy = BuoyancyTracer()

    def build(kappa):
        clo = TriadIsopycnalSkewSymmetricDiffusivity(
            kappa_symmetric=kappa, kappa_skew=kappa, buoyancy=buoyancy)
        m = HydrostaticFreeSurfaceModel(
            grid=grid, buoyancy=buoyancy, closure=clo,
            velocities=PrescribedVelocityFields())
        m.set(b=lambda x, y, z: 1e-5 * z + 1e-7 * (x - 5e4))
        return m

    m_const = build(500.0)
    m_fn = build(lambda x, y, z: 500.0 + 0.0 * x)
    m_var = build(lambda x, y, z: 500.0 * (1 + 0.5 * jnp.sin(
        2 * jnp.pi * x / 1e5)))
    b0 = np.asarray(m_var.field("b").interior).sum()
    for _ in range(10):
        m_const.time_step(3600.0)
        m_fn.time_step(3600.0)
        m_var.time_step(3600.0)
    bc = np.asarray(m_const.field("b").interior)
    bf = np.asarray(m_fn.field("b").interior)
    bv = np.asarray(m_var.field("b").interior)
    np.testing.assert_allclose(bf, bc, rtol=1e-12)  # constant fn == scalar
    assert np.isfinite(bv).all()
    assert np.isclose(bv.sum(), b0, rtol=1e-9)      # conservative


def test_horizontal_vitd_has_no_implicit_kappas():
    # ADVICE r2: a HORIZONTAL formulation has no z-diffusivity for the
    # implicit solve to own (reference: z-diffusivity ≡ 0 for
    # HorizontalFormulation)
    from oceananigans_tpu.closures import ScalarDiffusivity
    c = ScalarDiffusivity(nu=1.0, kappa=1.0, formulation="horizontal",
                          time_discretization="vertically_implicit")
    assert c.vertical_implicit_kappas(None, {"u": 0, "b": 0}, {}) == {}


def test_implicit_only_closure_rejects_value_z_bc():
    # ADVICE r2: always-implicit closures assume Flux z BCs; Value/Gradient
    # top/bottom BCs must be refused, not silently dropped
    import pytest
    from oceananigans_tpu.boundary_conditions import (
        BoundaryCondition, FieldBoundaryConditions)
    from oceananigans_tpu.boundary_conditions.boundary_condition import VALUE
    grid = RectilinearGrid(size=(4, 4, 8), x=(0, 1), y=(0, 1), z=(-1, 0))
    with pytest.raises(NotImplementedError):
        HydrostaticFreeSurfaceModel(
            grid, tracers=("b",), buoyancy=BuoyancyTracer(),
            closure=CATKEVerticalDiffusivity(),
            boundary_conditions={"b": FieldBoundaryConditions(
                top=BoundaryCondition(VALUE, 1.0))})


def test_vitd_rejects_periodic_z():
    # ADVICE r2: the implicit tridiagonal assumes walls; z-periodic + VITD
    # must raise instead of silently mis-diffusing
    import pytest
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.models import NonhydrostaticModel
    grid = RectilinearGrid(size=(4, 4, 8), x=(0, 1), y=(0, 1), z=(0, 1),
                           topology=("periodic", "periodic", "periodic"))
    model = NonhydrostaticModel(
        grid, closure=ScalarDiffusivity(
            nu=1e-3, time_discretization="vertically_implicit"))
    with pytest.raises(ValueError):
        model.time_step(0.1)


def test_ri_based_entrainment_diffusivity():
    """Penetrative entrainment (reference:
    ri_based_vertical_diffusivity.jl κᵉⁿ = Cᵉⁿ Jᵇ/N² where the stable cell
    below a convecting one entrains under destabilizing surface flux; the
    parameter was previously accepted and silently dropped)."""
    import jax.numpy as jnp
    import numpy as np
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.closures.vertical_diffusivities import (
        RiBasedVerticalDiffusivity)

    grid = RectilinearGrid(size=(4, 4, 16), extent=(1.0, 1.0, 100.0))
    # convecting upper half (N² < 0) over a stable lower half
    b = np.zeros((4, 4, 16))
    z = np.linspace(-100, 0, 16)
    for k, zk in enumerate(z):
        b[:, :, k] = 1e-4 * zk if zk < -50 else -1e-5 * (zk + 50)
    fields = {"b": jnp.asarray(np.pad(b, [(3, 3), (3, 3),
                                          (grid.H[2],
                                           grid.padded_shape[2] - 16
                                           - grid.H[2])]))}
    fields["u"] = jnp.zeros(grid.padded_shape)
    fields["v"] = jnp.zeros(grid.padded_shape)

    def run(Jb):
        clo = RiBasedVerticalDiffusivity(buoyancy=BuoyancyTracer(),
                                         surface_buoyancy_flux=Jb)
        aux = clo.compute_diffusivities(grid, fields, 0.0)
        return np.asarray(aux["kappa_z_ccf"])[grid.interior_slices]

    k_off = run(0.0)
    k_on = run(1e-7)
    extra = k_on - k_off
    assert extra.max() > 0, "entrainment diffusivity never engaged"
    # it engages only at stable faces below the convecting layer
    assert (extra > 1e-12).sum() <= 4 * 4 * 3, (extra > 1e-12).sum()


def test_amd_buoyancy_modification_changes_nu():
    """AMD's Cb buoyancy counter-term (reference:
    Cb_norm_wᵢ_bᵢᶜᶜᶜ, anisotropic_minimum_dissipation.jl:310-323) must
    actually alter ν — it was previously fingerprinted but never applied."""
    import jax.numpy as jnp
    import numpy as np
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.closures import AnisotropicMinimumDissipation

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0))
    rng = np.random.default_rng(3)

    def pad(a):
        return jnp.asarray(np.pad(a, [(grid.H[0],) * 2, (grid.H[1],) * 2,
                                      (grid.H[2],
                                       grid.padded_shape[2] - 8
                                       - grid.H[2])]))

    fields = {n: pad(0.1 * rng.standard_normal((8, 8, 8)))
              for n in ("u", "v", "w")}
    fields["b"] = pad(1e-3 * rng.standard_normal((8, 8, 8)))

    nu0 = np.asarray(AnisotropicMinimumDissipation(
        buoyancy=BuoyancyTracer()).compute_diffusivities(
        grid, fields, 0.0)["nu_e"])
    nu1 = np.asarray(AnisotropicMinimumDissipation(
        Cb=1.0, buoyancy=BuoyancyTracer()).compute_diffusivities(
        grid, fields, 0.0)["nu_e"])
    assert np.abs(nu1 - nu0).max() > 0, "Cb had no effect"
    assert np.isfinite(nu1).all() and (nu1 >= 0).all()


def test_timestep_wizard_enforces_diffusive_cfl():
    """diffusive_cfl was accepted but never applied (round-5 review)."""
    import numpy as np
    from oceananigans_tpu import RectilinearGrid, ScalarDiffusivity
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.diagnostics import TimeStepWizard

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0))
    model = NonhydrostaticModel(grid=grid,
                                closure=ScalarDiffusivity(nu=1.0))
    model.set(u=1e-6)            # nearly still: advective limit is huge
    wiz = TimeStepWizard(cfl=0.7, diffusive_cfl=0.2, max_change=1e6,
                         min_change=1e-9, max_dt=1e6)
    dt = wiz.new_dt(model, 1.0)
    dmin = 1.0 / 8
    assert dt <= 0.2 * dmin ** 2 / 1.0 + 1e-12, dt


def test_gm_advective_eddy_velocities_zero_in_unstable_columns():
    """Round-5 review regression: the advective-GM eddy velocities force the
    isopycnal slope to zero where ∂z b ≤ N²min (unstable columns), matching
    the flux-form rotation tensor (reference:
    isopycnal_rotation_tensor_components.jl) — a signed slope there pumps
    energy INTO the front."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid, BuoyancyTracer
    from oceananigans_tpu.closures import IsopycnalSkewSymmetricDiffusivity
    from oceananigans_tpu.closures.isopycnal import _skew_eddy_velocities
    from oceananigans_tpu.fields.field import set_on_padded
    from oceananigans_tpu.grids.topology import LOC_CCC

    grid = RectilinearGrid(size=(8, 1, 8), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=("periodic", "flat", "bounded"))
    cl = IsopycnalSkewSymmetricDiffusivity(
        kappa_gm=100.0, skew_flux_formulation="advective",
        buoyancy=BuoyancyTracer())
    # UNSTABLE stratification (b increases downward) with a lateral gradient
    b = set_on_padded(grid, LOC_CCC, lambda x, y, z: -0.01 * z + 0.001 * x)
    fields = {"b": b, "u": jnp.zeros_like(b), "v": jnp.zeros_like(b),
              "w": jnp.zeros_like(b)}
    ue, ve, we = _skew_eddy_velocities(grid, cl, fields)
    H = grid.H
    assert float(jnp.abs(ue[H[0]:-H[0], :, H[2]:-H[2]]).max()) == 0.0
    assert float(jnp.abs(we[H[0]:-H[0], :, H[2]:-H[2]]).max()) == 0.0


def test_function_scalar_diffusivity():
    """Port of test_turbulence_closures.jl test_function_scalar_diffusivity:
    continuous-form ν(x, y, z, t)/κ(x, y, z, t) run in a model, and the
    diffusive timescale uses the grid MAXIMUM of the function."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid, BuoyancyTracer
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.diagnostics import DiffusiveCFL

    depth_scale = 120.0
    nu = lambda x, y, z, t: 2000.0 * jnp.exp(z / depth_scale)
    closure = ScalarDiffusivity(nu=nu, kappa=nu)
    grid = RectilinearGrid(size=(2, 2, 2), extent=(1.0, 2.0, 3.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None, tracers=("b",),
                                buoyancy=BuoyancyTracer(), closure=closure)
    model.set(b=lambda x, y, z: 1e-5 * z, u=0.01)
    for _ in range(3):
        model.time_step(1e-5)
    b = np.asarray(model.field("b").interior)
    assert np.isfinite(b).all()

    # diffusive CFL uses max ν over the grid (z centers)
    zc = np.asarray(grid.coord_padded(2, "c"))[grid.H[2]:grid.H[2] + 2]
    max_nu = float(np.max(2000.0 * np.exp(zc / depth_scale)))
    dmin = min(grid.minimum_spacing(i) for i in range(3))
    dt = 0.1
    got = DiffusiveCFL(dt)(model)
    np.testing.assert_allclose(got, dt * max_nu / dmin ** 2, rtol=1e-6)


def test_function_diffusivity_taylor_green_decay():
    """A spatially-CONSTANT function ν(x,y,z,t)=ν₀ must reproduce the scalar
    path bit-for-bit physics: Taylor-Green x-y decay at rate 2νk²."""
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.models import NonhydrostaticModel

    nu0 = 0.02
    grid = RectilinearGrid(size=(16, 16, 1), x=(0, 2 * np.pi),
                           y=(0, 2 * np.pi), z=(0, 1),
                           topology=("periodic", "periodic", "flat"))

    def run(closure):
        model = NonhydrostaticModel(grid=grid, advection=None,
                                    closure=closure)
        model.set(u=lambda x, y, z: np.sin(x) * np.cos(y),
                  v=lambda x, y, z: -np.cos(x) * np.sin(y))
        for _ in range(20):
            model.time_step(0.01)
        return np.asarray(model.field("u").interior)

    u_fn = run(ScalarDiffusivity(nu=lambda x, y, z, t: nu0 + 0 * x))
    u_sc = run(ScalarDiffusivity(nu=nu0))
    np.testing.assert_allclose(u_fn, u_sc, rtol=1e-6, atol=1e-10)
    # Taylor-Green amplitude decays as e^{-2νt} (k² = 2, strain form)
    amp = np.abs(u_fn).max()
    x_f = np.asarray(grid.coord_padded(0, "f"))[grid.H[0]:grid.H[0] + 16]
    np.testing.assert_allclose(amp / np.abs(np.sin(x_f)).max(),
                               np.exp(-2 * nu0 * 0.2), rtol=0.05)


def test_array_and_discrete_form_diffusivities():
    """Array ν (center-located, interpolated onto the stress locations) and
    the discrete form ν(grid, fields, t, p) (reference:
    test_discrete_function_scalar_diffusivity + array diffusivities) agree
    with the continuous-form function for the same profile."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid, BuoyancyTracer
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.fields.field import set_on_padded
    from oceananigans_tpu.grids.topology import LOC_CCC

    grid = RectilinearGrid(size=(8, 1, 8), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=("periodic", "flat", "bounded"))
    prof = lambda x, y, z, t: 0.01 * jnp.exp(z / 0.5)
    nu_arr = set_on_padded(grid, LOC_CCC, lambda x, y, z: 0.01 * np.exp(z / 0.5))

    def disc(g, fields, t, p):
        z = np.asarray(g.coord_padded(2, "c")).reshape(1, 1, -1)
        return jnp.broadcast_to(jnp.asarray(p["nu0"] * np.exp(z / 0.5),
                                            g.dtype), g.padded_shape)

    def run(closure):
        model = NonhydrostaticModel(grid=grid, advection=None, tracers=("b",),
                                    buoyancy=BuoyancyTracer(),
                                    closure=closure)
        model.set(b=lambda x, y, z: 0.01 * z + 1e-3 * np.sin(2 * np.pi * x),
                  u=lambda x, y, z: 0.01 * np.cos(2 * np.pi * x))
        for _ in range(5):
            model.time_step(0.01)
        return (np.asarray(model.field("u").interior),
                np.asarray(model.field("b").interior))

    u_fn, b_fn = run(ScalarDiffusivity(nu=prof, kappa=prof))
    u_ar, b_ar = run(ScalarDiffusivity(nu=nu_arr, kappa=nu_arr))
    u_dc, b_dc = run(ScalarDiffusivity(nu=disc, kappa=disc,
                                       discrete_form=True,
                                       parameters={"nu0": 0.01}))
    # array/discrete paths interpolate a ccc profile, the continuous path
    # evaluates at the exact staggered nodes — agree to interpolation error
    np.testing.assert_allclose(u_ar, u_fn, rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(b_ar, b_fn, rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(u_dc, u_ar, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(b_dc, b_ar, rtol=1e-6, atol=1e-12)


def test_diffusive_cfl_over_closure_families_and_tuples():
    """Port of test_turbulence_closures.jl 'Diagnostics':
    DiffusiveCFL works for every closure family, including
    diagnostic-viscosity closures and tuples (biharmonic uses the d⁴
    timescale)."""
    from oceananigans_tpu import RectilinearGrid, BuoyancyTracer
    from oceananigans_tpu.closures import (
        ScalarDiffusivity, ScalarBiharmonicDiffusivity, SmagorinskyLilly,
        AnisotropicMinimumDissipation)
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.diagnostics import DiffusiveCFL

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    dmin = min(grid.minimum_spacing(i) for i in range(3))
    for closure in (ScalarDiffusivity(nu=1e-3),
                    ScalarBiharmonicDiffusivity(nu=1e-7),
                    SmagorinskyLilly(),
                    AnisotropicMinimumDissipation(),
                    (ScalarDiffusivity(nu=1e-3),
                     ScalarBiharmonicDiffusivity(nu=1e-7),
                     SmagorinskyLilly(),
                     AnisotropicMinimumDissipation())):
        model = NonhydrostaticModel(grid=grid, advection=None,
                                    tracers=("b",),
                                    buoyancy=BuoyancyTracer(),
                                    closure=closure)
        model.set(u=lambda x, y, z: 0.1 * np.sin(2 * np.pi * x),
                  b=lambda x, y, z: 1e-4 * z)
        c = DiffusiveCFL(1.0)(model)
        assert np.isfinite(c) and c >= 0.0, type(closure).__name__
    # scalar sanity: dt·ν/d² and the biharmonic d⁴ scale
    m1 = NonhydrostaticModel(grid=grid, advection=None,
                             closure=ScalarDiffusivity(nu=1e-3))
    np.testing.assert_allclose(DiffusiveCFL(1.0)(m1), 1e-3 / dmin ** 2,
                               rtol=1e-12)
    m2 = NonhydrostaticModel(grid=grid, advection=None,
                             closure=ScalarBiharmonicDiffusivity(nu=1e-7))
    np.testing.assert_allclose(DiffusiveCFL(1.0)(m2), 1e-7 / dmin ** 4,
                               rtol=1e-12)


def test_implicit_vertical_diffusion_conserves_column_integral():
    """The vertically-implicit tridiagonal diffusion solve with no-flux
    walls conserves each column's dz-weighted tracer integral to roundoff
    (reference: vertically_implicit_diffusion_solver.jl builds a flux-form
    operator whose boundary faces carry no flux) — on uniform AND
    stretched z, with scalar and 3D-array kappa."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models.nonhydrostatic import (
        implicit_vertical_diffusion)

    rng = np.random.default_rng(5)
    zf = -np.cos(np.linspace(0, np.pi / 2, 13))   # stretched faces
    for zspec in ((-1.0, 0.0), zf):
        grid = RectilinearGrid(size=(4, 4, 12), x=(0, 1), y=(0, 1), z=zspec,
                               topology=("periodic", "periodic", "bounded"))
        q = jnp.asarray(rng.standard_normal(grid.padded_shape))
        dz = jnp.broadcast_to(jnp.asarray(grid.dz(("c", "c", "c"))),
                              grid.padded_shape)
        ii = grid.interior_slices
        for kappa in (1e-2,
                      jnp.asarray(abs(rng.standard_normal(
                          grid.padded_shape)) * 1e-2)):
            out = implicit_vertical_diffusion(grid, q, kappa, 0.5)
            tot0 = jnp.sum((q * dz)[ii], axis=2)
            tot1 = jnp.sum((out * dz)[ii], axis=2)
            np.testing.assert_allclose(np.asarray(tot1), np.asarray(tot0),
                                       rtol=2e-6, atol=1e-7)
            # and it actually diffuses (columns approach their mean)
            var0 = float(jnp.var(q[ii], axis=2).mean())
            var1 = float(jnp.var(out[ii], axis=2).mean())
            assert var1 < var0

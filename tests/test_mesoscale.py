"""Mesoscale-turbulence validation (VERDICT r2 item 6; reference:
validation/mesoscale_turbulence/ — the eddying baroclinic channel that
exercises GM/Redi + CATKE at scale).

Two tiers:
* deterministic GM front-slumping physics: GM extracts available potential
  energy (flattens isopycnals) at closure-controlled rates, the flux and
  advective skew forms agree, and the triad discretization conserves the
  tracer exactly;
* an eddying baroclinic channel (coarse, WENO-VI + CATKE + GM triads):
  baroclinic eddies grow from noise and the eddy kinetic energy
  EQUILIBRATES (bounded, non-exploding) while the closure suite runs the
  full round-2/3 physics at once.
"""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.advection.vector_invariant import WENOVectorInvariant
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import (CATKEVerticalDiffusivity, ClosureTuple,
                                       IsopycnalSkewSymmetricDiffusivity,
                                       TriadIsopycnalSkewSymmetricDiffusivity)
from oceananigans_tpu.coriolis import BetaPlane
from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                     SplitExplicitFreeSurface)
from oceananigans_tpu.models.hydrostatic import PrescribedVelocityFields


def _front_model(closure):
    """x-z buoyancy front (tracer-only: prescribed zero velocities) under an
    isopycnal closure — the deterministic GM slumping problem."""
    grid = RectilinearGrid(size=(32, 1, 16), x=(0, 4e5), y=(0, 1e4),
                           z=(-1000.0, 0.0),
                           topology=("bounded", "periodic", "bounded"))
    m = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), closure=closure,
        velocities=PrescribedVelocityFields())
    N2, db, L = 1e-5, 2e-3, 5e4
    m.set(b=lambda x, y, z: N2 * z + 0.5 * db
          * np.tanh((x - 2e5) / L))
    return m


def _ape(m):
    """∫ b·(−z) dV over the interior — GM releases available potential
    energy by flattening isopycnals, so this DECREASES."""
    b = np.asarray(m.field("b").interior)
    zc = np.asarray(m.grid.znodes("c"))
    return float((b * (-zc)[None, None, :]).sum())


def test_gm_front_slumping_extracts_ape():
    """Both GM discretizations flatten the front: APE decreases
    monotonically, the tracer total is conserved, and the triad and
    flux-tensor forms agree on the release rate to ~20% (reference:
    isopycnal_skew_symmetric_diffusivity.jl vs _with_triads.jl on the same
    configuration)."""
    results = {}
    for name, closure in (
            ("fluxform", IsopycnalSkewSymmetricDiffusivity(
                kappa_redi=0.0, kappa_gm=1000.0, buoyancy=BuoyancyTracer())),
            ("triads", TriadIsopycnalSkewSymmetricDiffusivity(
                kappa_skew=1000.0, kappa_symmetric=0.0,
                buoyancy=BuoyancyTracer()))):
        m = _front_model(closure)
        a0 = _ape(m)
        b0 = float(np.asarray(m.field("b").interior).sum())
        apes = [a0]
        for _ in range(10):
            for _ in range(5):
                m.time_step(3600.0)
            apes.append(_ape(m))
        b1 = float(np.asarray(m.field("b").interior).sum())
        assert abs(b1 - b0) < 1e-9 * abs(b0), name   # tracer conserved
        d = np.diff(apes)
        assert (d < 1e-9 * abs(a0)).all(), (name, d)  # monotone release
        results[name] = a0 - apes[-1]
        assert results[name] > 0, name
    ratio = results["triads"] / results["fluxform"]
    assert 0.8 < ratio < 1.25, ratio


def test_gm_advective_form_matches_flux_form():
    """The advective (eddy-transport-velocity) skew form releases APE at the
    same rate as the flux-tensor skew form (reference:
    advective_skew_diffusion.jl — the two are algebraically equivalent up to
    boundary treatment)."""
    rel = {}
    for form in ("flux", "advective"):
        m = _front_model(IsopycnalSkewSymmetricDiffusivity(
            kappa_redi=0.0, kappa_gm=1000.0, buoyancy=BuoyancyTracer(),
            skew_flux_formulation=form))
        a0 = _ape(m)
        for _ in range(30):
            m.time_step(3600.0)
        rel[form] = a0 - _ape(m)
        assert rel[form] > 0
    ratio = rel["advective"] / rel["flux"]
    assert 0.75 < ratio < 1.35, ratio


def test_baroclinic_channel_full_stack_stable():
    """Coarse baroclinic channel (the validation/mesoscale_turbulence
    analogue): a zonal front on a beta plane with the FULL closure stack —
    WENO-VI momentum + WENO tracers + CATKE + GM triads — run for 180 steps.
    At 31 km spacing the deformation radius (~20 km) is under-resolved, so
    explicit eddies cannot grow; what this asserts is the at-scale behavior
    the parameterizations must deliver: the run is stable (EKE bounded,
    equilibrated — no taper/masking blowup), GM slumps the zonal-mean front
    (the eddy parameterization doing the unresolved eddies' job), and CATKE
    produces TKE. The QUANTITATIVE GM physics (APE release rates, flux vs
    advective vs triad agreement) is asserted by the two front tests above —
    which caught a real tapering bug (round 3): rescaling slopes instead of
    applying the reference's whole-flux min(1, S_max²/S²) factor injected
    potential energy at clamped boundary faces."""
    Lx, Ly, H = 1e6, 5e5, 1000.0
    nx, ny, nz = 32, 16, 8
    grid = RectilinearGrid(size=(nx, ny, nz), x=(0, Lx), y=(0, Ly),
                           z=(-H, 0.0),
                           topology=("periodic", "bounded", "bounded"))
    closure = ClosureTuple(
        CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()),
        TriadIsopycnalSkewSymmetricDiffusivity(
            kappa_skew=500.0, kappa_symmetric=500.0,
            buoyancy=BuoyancyTracer()))
    m = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        momentum_advection=WENOVectorInvariant(order=5),
        tracer_advection=WENO(5),
        coriolis=BetaPlane(f0=1e-4, beta=1e-11),
        closure=closure,
        free_surface=SplitExplicitFreeSurface(substeps=30))
    N2, db, Lf = 4e-6, 1e-3, 1e5
    rng = np.random.default_rng(11)
    m.set(b=lambda x, y, z: N2 * z
          + 0.5 * db * np.tanh((y - Ly / 2) / Lf),
          u=1e-3 * rng.standard_normal((nx, ny, nz)),
          v=1e-3 * rng.standard_normal((nx, ny, nz)))

    def eke(mm):
        u = np.asarray(mm.field("u").interior)
        v = np.asarray(mm.field("v").interior)[:, :ny]   # bounded y: Ny+1 faces
        up = u - u.mean(axis=0, keepdims=True)   # zonal-mean removed
        vp = v - v.mean(axis=0, keepdims=True)
        return float((up ** 2).mean() + (vp ** 2).mean())

    def front_strength(mm):
        b = np.asarray(mm.field("b").interior)
        bz = b.mean(axis=(0, 2))                 # zonal+depth mean vs y
        return float(bz[-2] - bz[1])

    f0 = front_strength(m)
    # dt inside the AB2 inertial limit (f·dt = 0.18) and the barotropic
    # subcycle CFL (dtau·√(gH)/dx ≈ 0.38)
    dt = 1800.0
    ekes = []
    for _ in range(12):
        for _ in range(15):
            m.time_step(dt)
        ekes.append(eke(m))
    # finite, bounded, equilibrated: no taper/masking blowup, no collapse
    assert np.isfinite(ekes).all()
    assert ekes[-1] < 1.0, ekes[-1]              # bounded (m²/s²)
    assert ekes[-1] > 0.1 * max(ekes)            # no collapse
    assert ekes[-1] > 1e-8, ekes[-1]
    # GM + eddies slump the front
    assert front_strength(m) < f0
    e = np.asarray(m.field("e").interior)
    assert np.isfinite(e).all() and e.max() > 0

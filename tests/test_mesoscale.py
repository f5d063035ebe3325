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
import pytest

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

pytestmark = pytest.mark.slow  # full-tier study/equivalence battery (see README testing tiers)


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


def test_baroclinic_instability_grows_at_resolved_deformation_radius():
    """True eddy growth (the quantitative half the coarse channel above
    cannot do): at 10 km spacing with Ld = NH/(πf) ≈ 30 km the deformation
    radius IS resolved, so a thermal-wind-balanced front (Ri ≈ 7) must be
    baroclinically unstable — EKE grows by more than an order of magnitude
    from the noise seed and saturates bounded (reference:
    validation/mesoscale_turbulence + the baroclinic adjustment example).
    Ri = N²/U_z² ≈ 2.9 (strongly unstable); time scales: N·dt = 0.47,
    f·dt = 0.02, advective CFL ≈ 0.11, barotropic subcycle CFL 0.5."""
    from oceananigans_tpu.coriolis import FPlane

    Lx, Ly, H = 4.8e5, 2.4e5, 4000.0
    nx, ny, nz = 48, 24, 8
    f0, N2 = 1e-4, 5.6e-6
    db, Lf = 1.4e-2, 5e4
    grid = RectilinearGrid(size=(nx, ny, nz), x=(0, Lx), y=(0, Ly),
                           z=(-H, 0.0),
                           topology=("periodic", "bounded", "bounded"))
    m = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        momentum_advection=WENOVectorInvariant(order=5),
        tracer_advection=WENO(5), coriolis=FPlane(f0),
        free_surface=SplitExplicitFreeSurface(substeps=16))
    rng = np.random.default_rng(3)
    Uz = 0.5 * db / Lf / f0          # thermal-wind shear at the front center

    def bfront(x, y, z):
        return N2 * z + 0.5 * db * np.tanh((y - Ly / 2) / Lf)

    def uthermal(x, y, z):
        dyb = 0.5 * db / Lf / np.cosh((y - Ly / 2) / Lf) ** 2
        return -(dyb / f0) * (z + H)

    def eta_balanced(x, y, z):
        # barotropic geostrophy: g ∂y η = -f ū, ū = depth mean of uthermal
        return (f0 / 9.81) * (Uz * H / 2) * Lf * np.tanh((y - Ly / 2) / Lf)

    m.set(b=bfront, eta=eta_balanced,
          u=lambda x, y, z: uthermal(x, y, z)
          + 1e-3 * np.sin(8 * np.pi * x / Lx) * np.cos(np.pi * z / H),
          v=1e-3 * rng.standard_normal((nx, ny, nz)))

    def eke(mm):
        u = np.asarray(mm.field("u").interior)
        v = np.asarray(mm.field("v").interior)[:, :ny]
        up = u - u.mean(axis=0, keepdims=True)
        vp = v - v.mean(axis=0, keepdims=True)
        return float((up ** 2).mean() + (vp ** 2).mean())

    e0 = eke(m)
    dt = 200.0
    ekes = []
    for _ in range(20):
        for _ in range(216):
            m.time_step(dt)        # 20 × 12 h = 10 days
        ekes.append(eke(m))
    assert np.isfinite(ekes).all(), ekes
    assert max(ekes) > 10 * e0, (e0, ekes)   # instability grew
    assert ekes[-1] < 10.0, ekes[-1]         # saturated bounded

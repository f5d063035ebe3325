"""Near-global wind-driven ocean spin-up with idealized continents.

The analogue of the reference's `validation/near_global_lat_lon` study
(VERDICT r3 item 9): a coarse near-global LatitudeLongitudeGrid with
idealized continental bathymetry (two meridional land barriers with a
Drake-passage-like gap), zonal wind stress with easterlies/westerlies
structure, surface buoyancy restoring, GM/Redi + CATKE closures and a
split-explicit free surface — the configuration where z-bathymetry,
split-explicit barotropic dynamics and mesoscale/vertical closures all
interact at global scale.

The diagnostic is the circumpolar ("ACC-like") transport through the gap:
it spins up eastward under the westerlies and levels off, bounded, as
bottom drag and GM slumping balance the wind input.

Run:  JAX_PLATFORMS=cpu python examples/near_global_ocean.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from oceananigans_tpu import (FieldBoundaryConditions, LatitudeLongitudeGrid,
                              ImmersedBoundaryGrid, GridFittedBottom)
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.advection.vector_invariant import WENOVectorInvariant
from oceananigans_tpu.boundary_conditions import FluxBoundaryCondition
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import (CATKEVerticalDiffusivity, ClosureTuple,
                                        ScalarDiffusivity,
                                       TriadIsopycnalSkewSymmetricDiffusivity)
from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
from oceananigans_tpu.models.free_surfaces import SplitExplicitFreeSurface
from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel


def build_model(nx=128, ny=64, nz=16, dtype=jnp.float64):
    H0 = 3000.0
    grid = LatitudeLongitudeGrid(size=(nx, ny, nz), longitude=(-180, 180),
                                 latitude=(-75, 75), z=(-H0, 0.0),
                                 dtype=dtype)

    def bottom(lam, phi):
        """Idealized continents: two meridional barriers (an "Americas" at
        -60° and an "Afro-Eurasia" at 20°) rising to land, with a Drake-
        passage-like gap south of -55° in the first, plus a shallow
        Scotia-ridge sill (1500 m) in the gap and polar shelves."""
        lam = np.asarray(lam, float)
        phi = np.asarray(phi, float)
        depth = np.full(np.broadcast_shapes(lam.shape, phi.shape), -H0)
        barrier1 = (np.abs(lam - (-60.0)) < 12.0) & (phi > -55.0)
        barrier2 = (np.abs(lam - 20.0) < 15.0) & (phi > -35.0)
        depth = np.where(barrier1 | barrier2, 200.0, depth)
        sill = (np.abs(lam - (-60.0)) < 12.0) & (phi <= -55.0)
        depth = np.where(sill, -1500.0, depth)
        shelf = np.abs(phi) > 71.0
        depth = np.where(shelf, np.maximum(depth, -500.0), depth)
        return depth

    ibg = ImmersedBoundaryGrid(grid, GridFittedBottom(bottom))

    # zonal wind stress: trades/westerlies/polar easterlies. The flux BC
    # imposes the NEGATIVE of the physical eastward stress (positive top
    # flux decelerates u — same convention as the reference, which loads
    # `-τˣ` into its FluxBoundaryConditions,
    # validation/multi_region/multi_region_near_global_quarter_degree.jl:116)
    def tau_x(lam, phi, t):
        phi_r = np.deg2rad(phi)
        return -1.2e-4 * (-np.cos(3.0 * phi_r)) * np.cos(phi_r) ** 2

    # surface buoyancy restoring to a warm-equator/cold-pole profile
    def b_star(phi):
        return 6.0e-2 * np.cos(np.deg2rad(phi)) ** 2

    dz_top = H0 / nz

    def b_flux(lam, phi, t, b):
        # positive top flux REMOVES buoyancy (flux divergence convention,
        # fill_halos._apply_flux_bcs) — restoring toward b* therefore needs
        # q ∝ +(b − b*): warm anomalies lose buoyancy, cold ones gain
        return (1.0 / (86400.0 * 30)) * dz_top * (b - b_star(phi))

    u_bcs = FieldBoundaryConditions(
        top=FluxBoundaryCondition(tau_x),
        bottom=FluxBoundaryCondition(
            # quadratic drag opposing the flow (reference sign:
            # u_bottom_drag = -μ u, barotropic_gyre.jl:44)
            lambda lam, phi, t, u: -3e-3 * u * abs(u),
            field_dependencies="u"))
    b_bcs = FieldBoundaryConditions(
        top=FluxBoundaryCondition(b_flux, field_dependencies="b"))

    model = HydrostaticFreeSurfaceModel(
        grid=ibg, tracers=("b",),
        momentum_advection=WENOVectorInvariant(order=5),
        tracer_advection=WENO(5),
        coriolis=HydrostaticSphericalCoriolis(),
        buoyancy=BuoyancyTracer(),
        closure=ClosureTuple(
            CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()),
            # horizontal Laplacian viscosity: nu_h ~ u dx / 2 ~ 1e5 m^2/s,
            # the classic coarse-OGCM value (grid Reynolds number ~ 2) —
            # CATKE is vertical-only and GM acts on tracers, so this is the
            # only lateral momentum dissipation at ~5 deg
            ScalarDiffusivity(nu=1.0e5, formulation="horizontal"),
            TriadIsopycnalSkewSymmetricDiffusivity(
                kappa_skew=1000.0, kappa_symmetric=1000.0,
                buoyancy=BuoyancyTracer())),
        free_surface=SplitExplicitFreeSurface(substeps=30),
        boundary_conditions={"u": u_bcs, "b": b_bcs})
    model.set(b=lambda lam, phi, z: 6.0e-2 * np.cos(np.deg2rad(phi)) ** 2
              * np.exp(z / 800.0))
    return model, ibg


def drake_transport_sv(model, ibg):
    """Zonal volume transport (Sv) through the Drake-passage gap, measured
    at the gap's central longitude: T = Σ u Δy Δz over fluid cells."""
    grid = ibg.underlying_grid
    u = np.asarray(model.field("u").interior)
    nx = u.shape[0]
    i0 = int(((-60.0 + 180.0) / 360.0) * nx)        # gap longitude
    lat = np.asarray(grid.nodes1d(1, "c"))
    jgap = np.where(lat < -55.0)[0]
    H = grid.H
    dy = np.broadcast_to(np.asarray(grid.dy(("f", "c", "c")), float),
                         grid.padded_shape)[
        H[0] + i0, H[1]:H[1] + grid.N[1], 0]
    dz = np.broadcast_to(np.asarray(ibg.dz(("f", "c", "c")), float),
                         grid.padded_shape)[
        H[0] + i0, H[1]:H[1] + grid.N[1], H[2]:H[2] + grid.N[2]]
    fluid = ~np.asarray(ibg.solid_fcc)[H[0] + i0, H[1]:H[1] + grid.N[1],
                                       H[2]:H[2] + grid.N[2]]
    sec = u[i0, jgap][:, :] * dz[jgap] * fluid[jgap] * dy[jgap][:, None]
    return float(sec.sum()) / 1e6


def main():
    """Time-step guidance: the explicit-Coriolis QAB2 stepper is weakly
    unstable for undamped oscillations — at 75° latitude the amplification
    root of z² − (1+(1.5+χ)iθ)z + (0.5+χ)iθ (θ = f·Δt, χ = 0.1) crosses
    |z| = 1 near θ ≈ 0.35, so Δt = 3600 s (θ = 0.53, |z| = 1.007/step)
    doubles the inertial modes every ~4 days while Δt ≤ 1800 s (θ ≤ 0.26)
    is damped. The reference has the same property (quasi_adams_bashforth_2.jl
    with explicit Coriolis); its near-global studies use Δt of minutes."""
    model, ibg = build_model()
    dt = 1800.0
    n_days = int(os.environ.get("NEAR_GLOBAL_DAYS", "10"))
    steps = int(n_days * 86400 / dt)
    for i in range(steps):
        model.time_step(dt)
        if (i + 1) % 48 == 0:
            T = drake_transport_sv(model, ibg)
            u = np.asarray(model.field("u").interior)
            print(f"day {(i + 1) * dt / 86400:5.1f}: Drake transport "
                  f"{T:8.2f} Sv, |u|max {np.abs(u).max():.3f} m/s",
                  flush=True)


if __name__ == "__main__":
    main()

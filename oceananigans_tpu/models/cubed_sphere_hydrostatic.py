"""Hydrostatic primitive equations on the composed (6-panel) cubed sphere.

Reference analogue: the FULL HydrostaticFreeSurfaceModel running on a
MultiRegion ConformalCubedSphereGrid (src/MultiRegion/multi_region_models.jl:
34-46 — the reference runs the SAME model, with the whole advection/closure/
free-surface capability set, per region with connectivity-driven halo
exchange; src/MultiRegion/cubed_sphere_boundary_conditions.jl;
multi_region_split_explicit_free_surface.jl).

TPU-native composition: ONE stacked (6, NP, NP, ZP) array per field, panels
unrolled inside a single jitted step, static-gather inter-panel exchanges
between stages (grids/cubed_sphere.py). The physics per panel is the SAME
code path as the rectilinear/lat-lon model: each panel gets a
:class:`_PanelPhysics` adapter that borrows
``HydrostaticFreeSurfaceModel._compute_tendencies`` — so WENO /
WENOVectorInvariant momentum, any tracer advection scheme, every closure
(CATKE with substepped TKE, k-ε, GM/Redi triads and the advective skew form,
Smagorinsky family, scalar/biharmonic), buoyancy formulations, forcings and
top/bottom boundary conditions all work on the sphere exactly as they do on
the other grids (hydrostatic_free_surface_tendency_kernel_functions.jl:27-140
is evaluated once per panel).

Cubed-sphere-specific pieces kept out of the shared path:
* inter-panel halo exchange with staggered-component rotation
  (fill_cubed_sphere_velocity_halos) replacing fill_halo_regions in x/y;
  panels are FULLY_CONNECTED horizontally so advection keeps full order
  through panel edges;
* the valence-3 cube-vertex vorticity (dual-triangle circulation,
  cubed_sphere_shallow_water._vertex_zeta) injected into the shared
  VectorInvariant via its ``zeta=`` override;
* GridFittedBottom / PartialCellBottom bathymetry: per-panel
  ImmersedBoundaryGrids built from the bottom height evaluated on the
  exchanged (exact-halo) panel nodes, with fluid-column depths feeding the
  barotropic mode (reference: column_depthᶠᶜᵃ on immersed MultiRegion
  grids);
* the z* moving vertical coordinate (vertical_coordinate="zstar"):
  per-panel, per-staggering σ = (H + η)/H with fluid-column depths, the
  lagged Az·Δr·∂t_σ grid-motion terms, and the conservative σ-weighted
  tracer update — the same machinery as the lat-lon model
  (z_star_vertical_spacing.jl), run per panel;
* free surfaces on the composed sphere: explicit (forward-backward),
  backward-Euler implicit by matrix-free CG with the panel exchange inside
  the operator (pcg_implicit_free_surface_solver.jl), and split-explicit
  barotropic subcycling with Shchepetkin averaging and per-column depths
  (multi_region_split_explicit_free_surface.jl).

Stepping: quasi-AB2 with the χ correction (default for split-explicit /
substepped closures) or Wicker-Skamarock RK3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..advection import Centered
from ..advection.vector_invariant import VectorInvariant
from ..boundary_conditions import regularize_field_boundary_conditions
from ..boundary_conditions.fill_halos import fill_halo_axes
from ..defaults import defaults
from ..grids.cubed_sphere import (ConformalCubedSphereGrid,
                                  fast_exchange, fill_cubed_sphere_halos,
                                  fill_cubed_sphere_velocity_halos,
                                  sync_shared_velocity_faces)
from ..grids.topology import LOC_CCC, LOC_CCF, LOC_CFC, LOC_FCC
from ..operators.operators import (ddx, ddy, div_xy_ccc, dx_c, dy_c,
                                   zeta3_ffc)
from .cubed_sphere_shallow_water import (CubedSphereShallowWaterModel,
                                         _vertex_corner_info,
                                         staggered_points_and_bases)
from .free_surfaces import (ExplicitFreeSurface, ImplicitFreeSurface,
                            SplitExplicitFreeSurface)
from .hydrostatic import (HydrostaticFreeSurfaceModel, PROGNOSTIC_LOCS,
                          immersed_column_geometry)
from .nonhydrostatic import implicit_vertical_diffusion, _vertical_spacings


def _dzc_all_columns(grid):
    """Interior Δz at centers over EVERY column: (n,) for 1D spacings, or
    the full padded (NPX, NPY, n) block when the grid carries
    horizontally-varying effective Δz (PartialCellBottom, immersed.py)."""
    h, n = grid.H[2], grid.N[2]
    dz = np.asarray(grid.dz(("c", "c", "c")), np.float64)
    if dz.ndim == 3 and (dz.shape[0] > 1 or dz.shape[1] > 1):
        return np.ascontiguousarray(
            np.broadcast_to(dz, grid.padded_shape)[:, :, h:h + n])
    return _vertical_spacings(grid)[0]


class _AllColumnsProxy:
    """Grid view whose 'interior' spans every (x, y) column but only the
    interior z window — lets the batched tridiagonal solve cover halo-slot
    columns (shared-edge faces) too."""

    def __init__(self, g):
        self._g = g
        self.H, self.N = g.H, g.N
        self.padded_shape = g.padded_shape

    def dz(self, loc):
        return self._g.dz(loc)

    def is_flat(self, axis):
        return self._g.is_flat(axis)

    @property
    def topology(self):
        return getattr(self._g, "topology", None)

    @property
    def interior_slices(self):
        h, n = self._g.H[2], self._g.N[2]
        return (slice(None), slice(None), slice(h, h + n))

    def interior(self, a):
        return a[self.interior_slices]


class _NamedBuoyancyTracer:
    """BuoyancyTracer semantics on a tracer with a custom name."""

    def __init__(self, name):
        self.name = name
        self.required_tracers = (name,)

    def _fp(self):
        return ("NamedBuoyancyTracer", self.name)

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()

    def buoyancy_ccc(self, grid, tracers):
        return tracers[self.name]

    def z_buoyancy(self, grid, tracers):
        from ..operators.operators import iz_f
        return iz_f(grid, tracers[self.name])


class _PanelPhysics:
    """Per-panel adapter: the SAME tendency assembly as the
    rectilinear/lat-lon HydrostaticFreeSurfaceModel, evaluated on one
    exchanged-halo panel (the analogue of the reference launching its
    tendency kernels per MultiRegion region). Borrowed methods see a panel
    grid (possibly immersed-wrapped); only the two z-integral diagnostics
    are overridden to run over EVERY column — halo columns carry
    exchange-valid velocities/buoyancy, so their w and pHY′ come out valid
    without an extra exchange."""

    # shared code path (models/hydrostatic.py)
    _compute_tendencies = HydrostaticFreeSurfaceModel._compute_tendencies
    _moving_grid = HydrostaticFreeSurfaceModel._moving_grid
    _depth_integral = HydrostaticFreeSurfaceModel._depth_integral
    _cum_matmul = HydrostaticFreeSurfaceModel._cum_matmul
    _mask_state = HydrostaticFreeSurfaceModel._mask_state
    _mask_kz = HydrostaticFreeSurfaceModel._mask_kz
    _install_tke_surface_flux = \
        HydrostaticFreeSurfaceModel._install_tke_surface_flux
    _sigma_fields = HydrostaticFreeSurfaceModel._sigma_fields
    loc = HydrostaticFreeSurfaceModel.loc

    def __init__(self, parent, grid, bcs):
        self.parent = parent
        self.grid = grid                      # panel OSSG or ImmersedBoundaryGrid
        self.bcs = bcs
        self.vertical_coordinate = parent.vertical_coordinate
        self._fused_vi = None
        self._zeta_override = None            # set per tendency call
        self.momentum_advection = parent.momentum_advection
        self.tracer_advection = parent.tracer_advection
        self.coriolis = parent.coriolis
        self.buoyancy = parent.buoyancy
        self.closure = parent.closure
        self.forcing = parent.forcing
        self.free_surface = parent._fs_for_tendencies
        self.tracer_names = parent.tracer_names
        self._substepped_names = parent._substepped_names
        self._substepped_tke = parent._substepped_tke
        from ..immersed import ImmersedBoundaryGrid
        self._immersed = isinstance(grid, ImmersedBoundaryGrid)
        dtype = grid.dtype
        if self._immersed:
            self._H_fc, self._H_cf, self._fluid_int = \
                immersed_column_geometry(grid, dtype)
        else:
            self._H_fc = self._H_cf = abs(grid.extent[2])
        if self.vertical_coordinate == "zstar":
            from .hydrostatic import zstar_column_geometry
            self._zstar_geo = zstar_column_geometry(
                grid, dtype, self._H_fc, self._H_cf, self._immersed)
        self._proxy = _AllColumnsProxy(grid)

    # -- all-column diagnostics ------------------------------------------------

    def _w_from_continuity(self, u, v, dt_sigma=None):
        """w at (c,c,f) by the upward continuity integral over EVERY column
        (compute_w_from_continuity.jl); valid in all but the outermost halo
        ring because u, v are exchange-valid there. On a moving z* grid the
        grid-motion term -Δr·∂t_σ accumulates per layer (reference:
        Az_Δr_∂t_σ, z_star_vertical_spacing.jl)."""
        grid = self.grid
        h, n = grid.H[2], grid.N[2]
        dzc = _dzc_all_columns(grid)
        div_h = div_xy_ccc(grid, u, v)
        d = div_h[:, :, h:h + n] * jnp.asarray(dzc, div_h.dtype)
        if dt_sigma is not None:
            gm = dt_sigma * jnp.asarray(dzc, div_h.dtype)
            if self._immersed:
                gm = gm * self._fluid_int[LOC_CCC].astype(gm.dtype)
            d = d + gm
        w_faces = -self._cum_matmul(d, self.parent._cumsum_tri)
        w = jnp.zeros(grid.padded_shape, u.dtype)
        return w.at[:, :, h + 1:h + n + 1].set(w_faces)

    def _hydrostatic_pressure(self, fields, time):
        """pHY′ = -∫_z^0 b dz′ over EVERY column (halo-valid b in, halo-valid
        pHY′ out — no horizontal fill needed; update_hydrostatic_pressure.jl)."""
        grid = self.grid
        if self.buoyancy is None:
            return None
        b = self.buoyancy.buoyancy_ccc(grid, fields)
        h, n = grid.H[2], grid.N[2]
        dzc = _dzc_all_columns(grid)
        bdz = b[:, :, h:h + n] * jnp.asarray(dzc, b.dtype)
        p_int = -self._cum_matmul(bdz, self.parent._ph_tri)
        p = jnp.zeros(grid.padded_shape, b.dtype)
        return p.at[:, :, h:h + n].set(p_int)

    def implicit_step(self, st_panel, aux, sdt, dampings=None):
        """Vertically-implicit diffusion over every column (implicit_step!;
        the solve covers halo-slot columns so duplicated shared-edge faces
        diffuse identically on both panels)."""
        kappas = self.closure.vertical_implicit_kappas(self.grid, st_panel,
                                                       aux)
        for nm in self._substepped_names:
            kappas.pop(nm, None)
        out = dict(st_panel)
        for name, kz in kappas.items():
            if name in ("w", "eta") or name not in out:
                continue
            damp = (dampings or {}).get(name)
            out[name] = implicit_vertical_diffusion(
                self._proxy, out[name], self._mask_kz(kz), sdt, damping=damp)
        return out


def _as_free_surface(fs, gravity):
    """Normalize the ``free_surface`` argument: the legacy strings or the
    ExplicitFreeSurface/ImplicitFreeSurface/SplitExplicitFreeSurface
    objects (models/free_surfaces.py)."""
    if isinstance(fs, str):
        if fs == "explicit":
            return ExplicitFreeSurface(gravity)
        if fs == "implicit":
            return ImplicitFreeSurface(gravity)
        if fs == "split_explicit":
            return SplitExplicitFreeSurface(gravity)
        raise ValueError(fs)
    if isinstance(fs, (ExplicitFreeSurface, ImplicitFreeSurface,
                       SplitExplicitFreeSurface)):
        return fs
    raise ValueError(f"unknown free surface {fs!r}")


class CubedSphereHydrostaticModel:
    """The full HydrostaticFreeSurfaceModel capability set on a
    :class:`ConformalCubedSphereGrid` built with a z coordinate
    (reference: HydrostaticFreeSurfaceModel on a MultiRegion
    ConformalCubedSphereGrid, src/MultiRegion/multi_region_models.jl).

    state: ``u``/``v`` (staggered local components), tracers (centers),
    ``eta`` ((6, NP, NP, 1)); ``w`` diagnosed from continuity.

    Capabilities shared with the rectilinear/lat-lon model (same code):
    ``momentum_advection`` — any VectorInvariant (incl. WENOVectorInvariant;
    the grid halo must cover its ``required_halo``); ``tracer_advection`` —
    any scheme (WENO/UpwindBiased/Centered); ``closure`` — any closure or
    tuple (CATKE and k-ε substep their turbulence fields exactly as on other
    grids); ``buoyancy`` (default: BuoyancyTracer semantics on
    ``buoyancy_tracer``); ``boundary_conditions`` — top/bottom Flux BCs
    (wind stress, buoyancy fluxes; callables get the panel's true (λ°, φ°)
    nodes); ``bottom_height`` — bathymetry as a callable of (λ_rad, φ_rad)
    or per-panel array (wrapped as GridFittedBottom), or an explicit
    GridFittedBottom/PartialCellBottom instance; ``vertical_coordinate`` —
    "z" (static) or "zstar" (free-surface-following, AB2 only);
    ``forcing`` — discrete forcings.

    ``rotation_rate``: builds a HydrostaticSphericalCoriolis (exact f at the
    panel ffc nodes) unless ``coriolis`` is given."""

    def __init__(self, grid: ConformalCubedSphereGrid, tracers=("b",),
                 gravity=None, rotation_rate=0.0, momentum_advection=None,
                 tracer_advection=None, coriolis=None, buoyancy=None,
                 buoyancy_tracer="b", closure=None, forcing=None,
                 boundary_conditions=None, bottom_height=None,
                 free_surface="explicit", implicit_solver_tol=1e-8,
                 substeps=30, timestepper="WickerSkamarockRK3",
                 vertical_coordinate="z", reference_datetime=None):
        if grid.panel_grids[0].is_flat(2):
            raise ValueError("CubedSphereHydrostaticModel needs a grid "
                             "built with z=(bottom, top)")
        if vertical_coordinate not in ("z", "zstar"):
            raise ValueError("vertical_coordinate must be 'z' or 'zstar'")
        if vertical_coordinate == "zstar" \
                and timestepper != "QuasiAdamsBashforth2":
            # the σ-weighted conservative tracer update is tied to the AB2
            # substructure (hydrostatic_free_surface_ab2_step.jl:116-130);
            # the reference's z* validation cases all run AB2
            raise ValueError("vertical_coordinate='zstar' requires "
                             "timestepper='QuasiAdamsBashforth2'")
        self.vertical_coordinate = vertical_coordinate
        self.reference_datetime = reference_datetime
        self.grid = grid
        self.gravity = float(gravity if gravity is not None
                             else defaults.gravitational_acceleration)
        self.rotation_rate = float(rotation_rate)

        # -- physics configuration (the shared-model surface) ----------------
        self.momentum_advection = (
            momentum_advection if momentum_advection is not None
            else VectorInvariant(vorticity_scheme="energy_conserving"))
        if not isinstance(self.momentum_advection, VectorInvariant):
            raise ValueError("cubed-sphere momentum advection must be a "
                             "VectorInvariant form (as in the reference's "
                             "hydrostatic model)")
        self.tracer_advection = (tracer_advection if tracer_advection
                                 is not None else Centered(2))
        if coriolis is None and rotation_rate:
            from ..coriolis import HydrostaticSphericalCoriolis
            coriolis = HydrostaticSphericalCoriolis(self.rotation_rate)
        self.coriolis = coriolis
        if isinstance(tracers, str):
            tracers = (tracers,)
        tracers = tuple(tracers)
        if buoyancy is None and buoyancy_tracer is not None \
                and buoyancy_tracer in tracers:
            from ..buoyancy import BuoyancyTracer
            buoyancy = (BuoyancyTracer() if buoyancy_tracer == "b"
                        else _NamedBuoyancyTracer(buoyancy_tracer))
        self.buoyancy = buoyancy
        self.closure = closure
        if closure is not None:
            for name in getattr(closure, "required_tracers", ()):
                if name not in tracers:
                    tracers = tracers + (name,)
            _cls = getattr(closure, "closures", (closure,))
            for _c in _cls:
                if getattr(_c, "buoyancy", "missing") is None:
                    _c.buoyancy = buoyancy
        self.tracer_names = tracers
        from ..forcings.forcings import regularize_forcing
        self.forcing = regularize_forcing(forcing)
        self._substepped_tke = (closure is not None and
                                getattr(closure, "substepped_tke", False))
        self._substepped_names = (
            tuple(getattr(closure, "substepped_tracers", ("e",)))
            if self._substepped_tke else ())

        # -- free surface ------------------------------------------------------
        self.free_surface = _as_free_surface(free_surface, self.gravity)
        self.implicit_solver_tol = float(implicit_solver_tol)
        if isinstance(self.free_surface, SplitExplicitFreeSurface):
            timestepper = "QuasiAdamsBashforth2"
            if free_surface == "split_explicit":   # legacy substeps= kwarg
                self.free_surface = SplitExplicitFreeSurface(
                    self.gravity, substeps=substeps)
            self.free_surface.materialize(grid.panel_grids[0])
        # the tendency assembly adds −g∇η for the explicit surface AND for
        # the implicit one: the CS implicit step solves the INCREMENT (θ=1)
        # form — u* must carry the explicit −g∇η⁰, then the CG solve finds
        # δ = η¹ − η⁰ and corrects by −gΔt∂δ (algebraically the same
        # backward-Euler as the reference's full-form PCG solve; for a
        # balanced state ∇·U* ≈ 0 ⇒ δ ≈ 0, no splitting noise). Only the
        # split-explicit surface excludes the gradient (it lives in the
        # barotropic subcycle).
        self._fs_for_tendencies = (
            ExplicitFreeSurface(self.gravity)
            if isinstance(self.free_surface, ImplicitFreeSurface)
            else self.free_surface)
        if self._substepped_tke:
            timestepper = "QuasiAdamsBashforth2"
        if timestepper not in ("WickerSkamarockRK3", "QuasiAdamsBashforth2"):
            raise ValueError(timestepper)
        self.timestepper = timestepper

        # -- halo capacity check -----------------------------------------------
        required = max(getattr(self.tracer_advection, "required_halo", 1),
                       getattr(self.momentum_advection, "required_halo", 1))
        if closure is not None:
            required = max(required, getattr(closure, "required_halo", 1))
        if grid.H[0] < required:
            raise ValueError(
                f"this configuration needs halo >= {required} but the grid "
                f"was built with halo={grid.H[0]}; pass halo={required} to "
                f"ConformalCubedSphereGrid")

        # -- per-panel grids (immersed-wrapped when bathymetry given) ---------
        H, N = grid.H[0], grid.N[0]
        NP = N + 2 * H
        ZP = grid.panel_grids[0].padded_shape[2]
        dtype = grid.dtype
        self._immersed = bottom_height is not None
        panel_grids = list(grid.panel_grids)
        if self._immersed:
            from ..immersed import (GridFittedBottom, ImmersedBoundaryGrid,
                                    PartialCellBottom)
            # bottom_height may be a bare height (callable of geographic
            # (lon_rad, lat_rad) or a (6, N, N) array) — wrapped as
            # GridFittedBottom — or an explicit GridFittedBottom /
            # PartialCellBottom instance whose own bottom_height is
            # interpreted the same way (reference: both immersed-boundary
            # types run under the MultiRegion cubed-sphere model,
            # multi_region_models.jl)
            ib_cls, ib_kw = GridFittedBottom, {}
            if isinstance(bottom_height, PartialCellBottom):
                ib_cls = PartialCellBottom
                ib_kw = {"minimum_fractional_cell_height":
                         bottom_height.epsilon}
                bottom_height = bottom_height.bottom_height
            elif isinstance(bottom_height, GridFittedBottom):
                bottom_height = bottom_height.bottom_height
            wrapped = []
            for p in range(6):
                g = grid.panel_grids[p]
                if callable(bottom_height):
                    lam, phi = g.nodes2d_padded(("c", "c"))
                    zb = np.asarray(bottom_height(np.deg2rad(lam),
                                                  np.deg2rad(phi)),
                                    np.float64)
                    zb = np.broadcast_to(zb, (NP, NP))
                else:
                    zb = np.asarray(bottom_height, np.float64)
                    if zb.shape[:3] == (6, N, N):
                        full = np.full((NP, NP), np.asarray(zb).min())
                        full[H:H + N, H:H + N] = zb[p].reshape(N, N)
                        zb = full
                    elif zb.shape[:3] == (6, NP, NP):
                        zb = zb[p].reshape(NP, NP)
                    else:
                        raise ValueError("bottom_height array must be "
                                         "(6, N, N) or (6, NP, NP)")
                wrapped.append(ImmersedBoundaryGrid(g, ib_cls(zb, **ib_kw)))
            panel_grids = wrapped

        # -- boundary conditions (per panel — conditions evaluate on the
        #    panel's true 2D nodes) -------------------------------------------
        bcs_in = dict(boundary_conditions or {})
        g0 = grid.panel_grids[0]
        # z-integral scan matrices shared by all panels
        nz = g0.N[2]
        self._cumsum_tri = np.tril(np.ones((nz, nz), np.float64), 0).T
        self._ph_tri = (np.tril(np.ones((nz, nz), np.float64), -1)
                        + 0.5 * np.eye(nz))
        # CATKE-family: derive surface TKE flux / buoyancy flux from the
        # user BCs (same machinery as the main model; dz is panel-independent
        # so the prototype adapter's grid stands in for all panels)
        self.panels = []
        proto_bcs = {}
        for name, loc in PROGNOSTIC_LOCS.items():
            proto_bcs[name] = regularize_field_boundary_conditions(
                bcs_in.get(name), panel_grids[0], loc)
        proto = _PanelPhysics.__new__(_PanelPhysics)
        proto.grid, proto.closure, proto.buoyancy = (panel_grids[0],
                                                     closure, buoyancy)
        proto._substepped_tke = self._substepped_tke
        if self._substepped_tke:
            bcs_in = HydrostaticFreeSurfaceModel._install_tke_surface_flux(
                proto, bcs_in)
        from ..closures.scalar_diffusivity import \
            validate_implicit_closure_z_bcs

        def panel_bcs(g):
            bcs = {}
            for name, loc in PROGNOSTIC_LOCS.items():
                bcs[name] = regularize_field_boundary_conditions(
                    bcs_in.get(name), g, loc)
            for name in self.tracer_names:
                bcs[name] = regularize_field_boundary_conditions(
                    bcs_in.get(name), g, LOC_CCC)
            bcs["w"] = regularize_field_boundary_conditions(None, g, LOC_CCF)
            bcs["eta"] = regularize_field_boundary_conditions(None, g,
                                                              LOC_CCC)
            return bcs

        for p in range(6):
            bcs = panel_bcs(panel_grids[p])
            if p == 0:
                validate_implicit_closure_z_bcs(closure, bcs)
            self.panels.append(_PanelPhysics(self, panel_grids[p], bcs))

        # -- barotropic geometry -----------------------------------------------
        dzr = np.asarray(g0.dz(LOC_CCC)).reshape(-1)
        if dzr.size == 1:
            dzr = np.full(nz, dzr[0])
        elif dzr.size == ZP:
            dzr = dzr[g0.H[2]:g0.H[2] + nz]
        self._dz_c = jnp.asarray(dzr, dtype)
        # per-column fluid depths at (f,c)/(c,f), stacked over panels
        if self._immersed:
            self._H_fc = jnp.asarray(
                np.stack([np.asarray(pp._H_fc) for pp in self.panels]), dtype)
            self._H_cf = jnp.asarray(
                np.stack([np.asarray(pp._H_cf) for pp in self.panels]), dtype)
        else:
            Hd = float(np.sum(dzr))
            self._H_fc = Hd
            self._H_cf = Hd

        # -- state --------------------------------------------------------------
        shape3 = (6, NP, NP, ZP)
        self.state = {"u": jnp.zeros(shape3, dtype),
                      "v": jnp.zeros(shape3, dtype),
                      "eta": jnp.zeros((6, NP, NP, 1), dtype),
                      "time": jnp.zeros((), dtype),
                      "iteration": jnp.zeros((), jnp.int32)}
        for name in self.tracer_names:
            self.state[name] = jnp.zeros(shape3, dtype)
        if timestepper == "QuasiAdamsBashforth2":
            self.state["Gm"] = {n: jnp.zeros_like(self.state[n])
                                for n in ("u", "v") + self.tracer_names}
        if isinstance(self.free_surface, SplitExplicitFreeSurface):
            self.state["barotropic"] = {
                "U": jnp.zeros((6, NP, NP, 1), dtype),
                "V": jnp.zeros((6, NP, NP, 1), dtype)}
        if vertical_coordinate == "zstar":
            # lagged grid-motion rate ∂t_σ at cell centers, per panel
            self.state["dt_sigma"] = jnp.zeros((6, NP, NP, 1), dtype)
        self._geom = staggered_points_and_bases(grid)
        self._corner_info = _vertex_corner_info(grid)
        # the exchange as single static gathers (bitwise == the per-panel
        # reference path; collapses the ~48-op .at[].set chains that made
        # 6-panel XLA graphs enormous — grids/cubed_sphere.py
        # build_fast_exchange)
        self._exc, self._exuv = fast_exchange(grid)
        self._step = jax.jit(self._build_step())

    # -- initialization -------------------------------------------------------

    def set_geographic(self, h=None, u_east=None, v_north=None):
        """Initialize (u, v) from zonal/meridional velocity functions of
        geographic (lon_rad, lat_rad) — depth-independent (barotropic)
        profiles broadcast over the interior z levels."""
        CubedSphereShallowWaterModel.set_geographic(
            self, h=h, u_east=u_east, v_north=v_north)
        g0 = self.grid.panel_grids[0]
        hz, nz = g0.H[2], g0.N[2]
        ZP = g0.padded_shape[2]
        st = dict(self.state)
        for n in ("u", "v"):
            a = st[n]
            if a.shape[-1] != ZP:          # the SW setter wrote (…, 1)
                col = jnp.zeros((ZP,), a.dtype).at[hz:hz + nz].set(1.0)
                st[n] = a * col
        self.state = st
        self._post_set()

    def _post_set(self):
        st = dict(self.state)
        if self._immersed:
            for p in range(6):
                g = self.panels[p].grid
                for n in ("u", "v") + self.tracer_names:
                    st[n] = st[n].at[p].set(
                        g.mask_immersed(st[n][p], self.panels[p].loc(n)))
        if "Gm" in st:
            # replacing prognostics abandons the trajectory: restart AB2
            st["Gm"] = {n: jnp.zeros_like(v) for n, v in st["Gm"].items()}
            st["iteration"] = jnp.zeros((), jnp.int32)
        if "dt_sigma" in st:
            st["dt_sigma"] = jnp.zeros_like(st["dt_sigma"])
        if "barotropic" in st:
            # (re)initialize the persistent barotropic transports from
            # ∫u dz (initialize_split_explicit_substepping.jl:15-27)
            U = jnp.stack([self.panels[p]._depth_integral(st["u"][p],
                                                          LOC_FCC)
                           for p in range(6)])
            V = jnp.stack([self.panels[p]._depth_integral(st["v"][p],
                                                          LOC_CFC)
                           for p in range(6)])
            st["barotropic"] = {"U": U, "V": V}
        self.state = st

    def set(self, **fields):
        """Set fields from arrays (interior (6, N, N, Nz) or padded) or
        callables of geographic (lon_rad, lat_rad, z)."""
        grid = self.grid
        H, N = grid.H[0], grid.N[0]
        g0 = grid.panel_grids[0]
        hz, nz = g0.H[2], g0.N[2]
        zc = np.asarray(g0.znodes("c"))
        st = dict(self.state)
        for name, val in fields.items():
            tgt = st[name]
            if callable(val):
                panels = []
                for p in range(6):
                    lam, phi = grid.panel_grids[p].nodes2d_padded(("c", "c"))
                    lam = np.deg2rad(lam)
                    phi = np.deg2rad(phi)
                    if name == "eta":
                        panels.append(np.broadcast_to(
                            np.asarray(val(lam, phi), np.float64),
                            lam.shape)[..., None])
                    else:
                        panels.append(np.stack(
                            [np.broadcast_to(
                                np.asarray(val(lam, phi, z), np.float64),
                                lam.shape) for z in zc], axis=-1))
                arr = np.stack(panels)
                if name != "eta":
                    full = np.zeros(tgt.shape, np.float64)
                    full[..., hz:hz + nz] = arr
                    arr = full
                st[name] = jnp.asarray(arr, grid.dtype)
            else:
                val = np.asarray(val)
                if val.shape == tgt.shape:
                    st[name] = jnp.asarray(val, grid.dtype)
                else:
                    full = np.zeros(tgt.shape, np.float64)
                    if name == "eta":
                        full[:, H:H + N, H:H + N, :] = val.reshape(
                            (6, N, N, 1))
                    else:
                        full[:, H:H + N, H:H + N, hz:hz + nz] = val
                    st[name] = jnp.asarray(full, grid.dtype)
        self.state = st
        self._post_set()

    # -- halo management --------------------------------------------------------

    def _filled(self, st, time):
        """Exchange panel halos (staggered rotation for u/v), fill z halos
        per the top/bottom BCs, and mask immersed cells."""
        grid = self.grid
        out = dict(st)
        u, v = st["u"], st["v"]
        if self._immersed:
            u = jnp.stack([self.panels[p].grid.mask_immersed(u[p], LOC_FCC)
                           for p in range(6)])
            v = jnp.stack([self.panels[p].grid.mask_immersed(v[p], LOC_CFC)
                           for p in range(6)])
        u, v = self._exuv(u, v)
        u = jnp.stack([fill_halo_axes(u[p], self.panels[p].grid, LOC_FCC,
                                      self.panels[p].bcs["u"], time,
                                      axes=(2,)) for p in range(6)])
        v = jnp.stack([fill_halo_axes(v[p], self.panels[p].grid, LOC_CFC,
                                      self.panels[p].bcs["v"], time,
                                      axes=(2,)) for p in range(6)])
        out["u"], out["v"] = u, v
        out["eta"] = self._exc(st["eta"])
        for name in self.tracer_names:
            c = st[name]
            if self._immersed:
                c = jnp.stack([self.panels[p].grid.mask_immersed(c[p],
                                                                 LOC_CCC)
                               for p in range(6)])
            c = self._exc(c)
            c = jnp.stack([fill_halo_axes(c[p], self.panels[p].grid, LOC_CCC,
                                          self.panels[p].bcs[name], time,
                                          axes=(2,)) for p in range(6)])
            out[name] = c
        return out

    # -- dynamics ----------------------------------------------------------------

    def _vertex_zetas(self, u, v):
        """Per-panel ffc vorticity with the valence-3 cube-vertex fix
        (dual-triangle circulation — cubed_sphere_shallow_water)."""
        zetas, ones_ff = [], []
        for p in range(6):
            g = self.grid.panel_grids[p]
            zetas.append(zeta3_ffc(g, u[p], v[p]))
            ones_ff.append(jnp.ones_like(zetas[p]))
        sw = CubedSphereShallowWaterModel
        zetas, _ = sw._vertex_zeta(self, zetas, ones_ff,
                                   jnp.ones_like(u), u, v)
        return zetas

    def _tendencies(self, sf, w, time, dt_sigma=None):
        """Per-panel shared-path tendencies. Returns (G stacked dict over
        u/v/tracers, aux list per panel)."""
        zetas = self._vertex_zetas(sf["u"], sf["v"])
        names = ("u", "v") + self.tracer_names
        G = {n: [] for n in names}
        auxs = []
        for p in range(6):
            pp = self.panels[p]
            fields_p = {n: sf[n][p] for n in names}
            fields_p["eta"] = sf["eta"][p]
            pp._zeta_override = zetas[p]
            Gp, aux = pp._compute_tendencies(
                fields_p, w[p], time,
                dt_sigma=None if dt_sigma is None else dt_sigma[p])
            pp._zeta_override = None
            auxs.append(aux)
            for n in names:
                G[n].append(Gp[n])
        return {n: jnp.stack(vs) for n, vs in G.items()}, auxs

    def _w(self, sf, dt_sigma=None):
        return jnp.stack([self.panels[p]._w_from_continuity(
            sf["u"][p], sf["v"][p],
            dt_sigma=None if dt_sigma is None else dt_sigma[p])
            for p in range(6)])

    # -- free surfaces ------------------------------------------------------------

    def _explicit_eta(self, eta0, u, v, sdt):
        """Forward-backward explicit step: η ← η − Δt ∇·∫u dz with the
        UPDATED velocities (explicit_free_surface.jl). Shared-edge faces are
        synced first so both panels compute bitwise-identical fluxes through
        a shared face (global mass conservation to summation roundoff)."""
        u, v = sync_shared_velocity_faces(u, v, self.grid)
        divs = []
        for p in range(6):
            pp = self.panels[p]
            g = self.grid.panel_grids[p]
            U = pp._depth_integral(u[p], LOC_FCC)
            V = pp._depth_integral(v[p], LOC_CFC)
            divs.append((dx_c(g, g.dy(LOC_FCC)[..., :1] * U)
                         + dy_c(g, g.dx(LOC_CFC)[..., :1] * V))
                        / g.Az(LOC_CCC)[..., :1])
        return eta0 - sdt * jnp.stack(divs)

    def _split_explicit_substep(self, eta, U, V, GU, GV, dt, frac, weights):
        """Forward-backward barotropic subcycle on the composed panels with
        per-column fluid depths and Shchepetkin averaging (reference:
        multi_region_split_explicit_free_surface.jl +
        step_split_explicit_free_surface.jl). ``GU/GV`` EXCLUDE the surface
        gradient (applied here). Returns the filtered (η̄, Ū, V̄)."""
        grid = self.grid
        gy = self.free_surface.g
        dtau = frac * dt
        H_fc = self._H_fc if not np.isscalar(self._H_fc) else self._H_fc
        H_cf = self._H_cf
        GU, GV = self._exuv(GU, GV)

        # the substep body is identical for every substep (the weight enters
        # only the filtered accumulation), so the loop runs as a lax.scan —
        # at 6 panels × tens of substeps the unrolled graph made remote XLA
        # compiles take tens of minutes (the rectilinear fs.substep unrolls
        # for its ring-budget fill optimization; the CS exchange is a static
        # gather with no such budget, so scan costs nothing)
        def body(carry, w):
            eta, U, V, eta_f, U_f, V_f = carry
            U, V = self._exuv(U, V)
            eta = self._exc(eta)
            divs = []
            for p in range(6):
                g = grid.panel_grids[p]
                divs.append((dx_c(g, g.dy(LOC_FCC)[..., :1] * U[p])
                             + dy_c(g, g.dx(LOC_CFC)[..., :1] * V[p]))
                            / g.Az(LOC_CCC)[..., :1])
            eta = eta - dtau * jnp.stack(divs)
            eta = self._exc(eta)
            un, vn = [], []
            for p in range(6):
                g = grid.panel_grids[p]
                hf = H_fc if np.isscalar(H_fc) else H_fc[p]
                hc = H_cf if np.isscalar(H_cf) else H_cf[p]
                un.append(U[p] + dtau * (-gy * hf
                                         * ddx(g, eta[p], LOC_FCC) + GU[p]))
                vn.append(V[p] + dtau * (-gy * hc
                                         * ddy(g, eta[p], LOC_CFC) + GV[p]))
            U, V = jnp.stack(un), jnp.stack(vn)
            eta_f = eta_f + w * eta
            U_f = U_f + w * U
            V_f = V_f + w * V
            return (eta, U, V, eta_f, U_f, V_f), None

        carry0 = (eta, U, V, jnp.zeros_like(eta), jnp.zeros_like(U),
                  jnp.zeros_like(V))
        ws = jnp.asarray(np.asarray(weights), eta.dtype)
        (eta, U, V, eta_f, U_f, V_f), _ = jax.lax.scan(body, carry0, ws)
        return eta_f, U_f, V_f

    def _barotropic_corrector(self, u, v, U_f, V_f):
        """Replace the depth mean of (u, v) with the filtered barotropic
        transports (barotropic_split_explicit_corrector.jl); per-column
        fluid depths on immersed panels. zmask also zeroes the unused
        z-halo slots (they would otherwise accumulate unbalanced Coriolis)."""
        g0 = self.grid.panel_grids[0]
        hz, nz = g0.H[2], g0.N[2]
        zmask = jnp.zeros((g0.padded_shape[2],), u.dtype
                          ).at[hz:hz + nz].set(1.0)
        un, vn = [], []
        for p in range(6):
            pp = self.panels[p]
            Ustar = pp._depth_integral(u[p], LOC_FCC)
            Vstar = pp._depth_integral(v[p], LOC_CFC)
            hf = self._H_fc if np.isscalar(self._H_fc) else self._H_fc[p]
            hc = self._H_cf if np.isscalar(self._H_cf) else self._H_cf[p]
            up = (u[p] + (U_f[p] - Ustar) / hf) * zmask
            vp = (v[p] + (V_f[p] - Vstar) / hc) * zmask
            if self._immersed:
                up = pp.grid.mask_immersed(up, LOC_FCC)
                vp = pp.grid.mask_immersed(vp, LOC_CFC)
            un.append(up)
            vn.append(vp)
        return jnp.stack(un), jnp.stack(vn)

    def _implicit_eta_step(self, st, sdt):
        """Backward-Euler free-surface step on the composed sphere in
        increment (θ = 1) form: solve
        Az·δ − gΔt² δᵢ(H A_edge ∂δ) = −Δt δᵢ(A_edge ∫u* dz) by matrix-free
        CG with the inter-panel exchange inside the operator and PER-COLUMN
        fluid depths (pcg_implicit_free_surface_solver.jl), then correct
        u ← u* − gΔt ∂δ."""
        from ..solvers.conjugate_gradient import conjugate_gradient
        grid = self.grid
        gy = self.free_surface.g
        u, v, eta0 = st["u"], st["v"], st["eta"]
        u, v = sync_shared_velocity_faces(u, v, grid)

        def div_transport(a_fcc, a_cfc):
            outs = []
            for p in range(6):
                g = grid.panel_grids[p]
                outs.append(dx_c(g, g.dy(LOC_FCC)[..., :1] * a_fcc[p])
                            + dy_c(g, g.dx(LOC_CFC)[..., :1] * a_cfc[p]))
            return jnp.stack(outs)

        Ustar = jnp.stack([self.panels[p]._depth_integral(u[p], LOC_FCC)
                           for p in range(6)])
        Vstar = jnp.stack([self.panels[p]._depth_integral(v[p], LOC_CFC)
                           for p in range(6)])
        Az = jnp.stack([jnp.broadcast_to(
            jnp.asarray(np.asarray(grid.panel_grids[p].Az(LOC_CCC)),
                        grid.dtype), eta0[p].shape) for p in range(6)])
        Hh, N = grid.H[0], grid.N[0]
        mask = np.zeros(eta0.shape, bool)
        mask[:, Hh:Hh + N, Hh:Hh + N] = True
        mask = jnp.asarray(mask)
        rhs = jnp.where(mask, -sdt * div_transport(Ustar, Vstar), 0.0)

        def A(x):
            xf = self._exc(jnp.where(mask, x, 0.0))
            gx, gyy = [], []
            for p in range(6):
                g = grid.panel_grids[p]
                hf = self._H_fc if np.isscalar(self._H_fc) else self._H_fc[p]
                hc = self._H_cf if np.isscalar(self._H_cf) else self._H_cf[p]
                gx.append(hf * ddx(g, xf[p], LOC_FCC))
                gyy.append(hc * ddy(g, xf[p], LOC_CFC))
            lap = div_transport(jnp.stack(gx), jnp.stack(gyy))
            return jnp.where(mask, Az * x - gy * sdt * sdt * lap, 0.0)

        delta, _, _ = conjugate_gradient(A, rhs,
                                         reltol=self.implicit_solver_tol,
                                         maxiter=200)
        deltaf = self._exc(delta)
        un, vn = [], []
        for p in range(6):
            g = grid.panel_grids[p]
            up = u[p] - gy * sdt * ddx(g, deltaf[p], LOC_FCC)
            vp = v[p] - gy * sdt * ddy(g, deltaf[p], LOC_CFC)
            if self._immersed:
                up = self.panels[p].grid.mask_immersed(up, LOC_FCC)
                vp = self.panels[p].grid.mask_immersed(vp, LOC_CFC)
            un.append(up)
            vn.append(vp)
        out = dict(st)
        out["u"], out["v"] = jnp.stack(un), jnp.stack(vn)
        out["eta"] = eta0 + delta
        return out

    # -- step -----------------------------------------------------------------

    def _mask_prognostics(self, st):
        if not self._immersed:
            return st
        out = dict(st)
        for n in ("u", "v") + self.tracer_names:
            out[n] = jnp.stack([self.panels[p].grid.mask_immersed(
                st[n][p], self.panels[p].loc(n)) for p in range(6)])
        return out

    def _build_step(self, se_settings=None, catke_substeps=1):
        grid = self.grid
        prog = ("u", "v", "eta") + self.tracer_names
        fs = self.free_surface
        split_explicit = isinstance(fs, SplitExplicitFreeSurface)
        implicit = isinstance(fs, ImplicitFreeSurface)

        def implicit_all(st, auxs, sdt, G=None, Gm=None, chi=None,
                         euler=None):
            if self.closure is None:
                return st
            out = dict(st)
            names = None
            dampings = [None] * 6
            if hasattr(self.closure, "vertical_implicit_damping") \
                    and not self._substepped_tke:
                dampings = [self.closure.vertical_implicit_damping(
                    self.panels[p].grid,
                    {n: st[n][p] for n in prog if n in st}, auxs[p])
                    for p in range(6)]
            cols = {}
            for p in range(6):
                pp = self.panels[p]
                st_p = {n: st[n][p] for n in prog if n in st}
                new_p = pp.implicit_step(st_p, auxs[p], sdt,
                                         dampings=dampings[p])
                if names is None:
                    names = [n for n in new_p
                             if n in st and new_p[n] is not st_p[n]]
                for n in names:
                    cols.setdefault(n, []).append(new_p[n])
            for n, vs in cols.items():
                out[n] = jnp.stack(vs)
            if hasattr(self.closure, "clip_fields") \
                    and not self._substepped_tke:
                out = self.closure.clip_fields(out)
            return out

        def step_turbulence_all(sf, new, G, Gm, dt, chi, euler, time):
            """Substepped turbulence (CATKE/k-ε) per panel with the UPDATED,
            exchange-and-z-filled velocities (time_step_catke_equation.jl)."""
            nf = self._filled(new, time)
            upds = {nm: [] for nm in self._substepped_names}
            Gts = {nm: [] for nm in self._substepped_names}
            for p in range(6):
                pp = self.panels[p]
                fields_p = {n: sf[n][p] for n in prog}
                fnew = {n: new[n][p] for n in prog}
                fnew.update(u=nf["u"][p], v=nf["v"][p],
                            **{nm: sf[nm][p]
                               for nm in self._substepped_names})
                slow = {nm: G[nm][p] for nm in self._substepped_names}
                prev = {nm: Gm[nm][p] for nm in self._substepped_names}
                upd, Gm_t = self.closure.step_turbulence(
                    pp.grid, fields_p, fnew, slow, prev, dt, chi,
                    euler, catke_substeps, time)
                for nm, val in upd.items():
                    if self._immersed:
                        val = pp.grid.mask_immersed(val, LOC_CCC)
                    upds[nm].append(val)
                    Gts[nm].append(Gm_t[nm])
            return ({nm: jnp.stack(vs) for nm, vs in upds.items()},
                    {nm: jnp.stack(vs) for nm, vs in Gts.items()})

        if self.timestepper == "QuasiAdamsBashforth2":
            chi0 = 0.1

            def step(state, dt):
                st0 = {n: state[n] for n in prog}
                Gm = state["Gm"]
                time = state["time"]
                euler = state["iteration"] == 0
                chi = jnp.where(euler, -0.5, chi0)
                not_euler = jnp.where(euler, 0.0, 1.0)
                dts = state.get("dt_sigma")       # lagged ∂t_σ (z* only)
                sf = self._filled(st0, time)
                w = self._w(sf, dt_sigma=dts)
                G, auxs = self._tendencies(sf, w, time, dt_sigma=dts)
                stepped = ("u", "v") + self.tracer_names
                ab2G = {n: (1.5 + chi) * G[n]
                        - (0.5 + chi) * Gm[n] * not_euler for n in stepped}
                ab2G = jax.lax.optimization_barrier(ab2G)
                st = dict(st0)
                for n in stepped:
                    st[n] = st0[n] + dt * ab2G[n]
                st = implicit_all(st, auxs, dt)
                bt = None
                if split_explicit:
                    GU = jnp.stack([self.panels[p]._depth_integral(
                        ab2G["u"][p], LOC_FCC) for p in range(6)])
                    GV = jnp.stack([self.panels[p]._depth_integral(
                        ab2G["v"][p], LOC_CFC) for p in range(6)])
                    frac, weights = (se_settings if se_settings is not None
                                     else fs.settings(None))
                    bt0 = state["barotropic"]
                    eta_f, U_f, V_f = self._split_explicit_substep(
                        st0["eta"], bt0["U"], bt0["V"], GU, GV, dt,
                        frac, weights)
                    uc, vc = self._barotropic_corrector(st["u"], st["v"],
                                                        U_f, V_f)
                    st.update(u=uc, v=vc, eta=eta_f)
                    bt = {"U": U_f, "V": V_f}
                elif implicit:
                    st = self._implicit_eta_step(st, dt)
                else:
                    st["eta"] = self._explicit_eta(st0["eta"], st["u"],
                                                   st["v"], dt)
                if self._substepped_tke:
                    upd, Gm_t = step_turbulence_all(sf, st, G, Gm, dt,
                                                    chi0, euler, time)
                    G = dict(G)
                    for nm, val in upd.items():
                        st[nm] = val
                        G[nm] = Gm_t[nm]
                st = self._mask_prognostics(st)
                out = dict(self._filled(st, time))
                if dts is not None:
                    # conservative σ-weighted tracer update c ← c σⁿ/σⁿ⁺¹
                    # (hydrostatic_free_surface_ab2_step.jl:116-130), applied
                    # to the EXCHANGED fields so halo columns carry their
                    # owning panel's ratio; ∂t_σ persists for the next
                    # step's grid-motion terms
                    sig_n = jnp.stack([
                        self.panels[p]._sigma_fields(
                            sf["eta"][p])[("c", "c")] for p in range(6)])
                    sig_np1 = jnp.stack([
                        self.panels[p]._sigma_fields(
                            out["eta"][p])[("c", "c")] for p in range(6)])
                    ratio = sig_n / sig_np1
                    for nm in self.tracer_names:
                        out[nm] = out[nm] * ratio
                    out["dt_sigma"] = (sig_np1 - sig_n) / dt
                out["Gm"] = {n: G[n] for n in stepped}
                out["time"] = time + dt
                out["iteration"] = state["iteration"] + 1
                if bt is not None:
                    out["barotropic"] = bt
                return out

            return step

        def step(state, dt):
            st0 = {n: state[n] for n in prog}
            time = state["time"]
            st = st0
            for frac in (1.0 / 3.0, 0.5, 1.0):   # Wicker-Skamarock RK3
                sdt = frac * dt
                sf = self._filled(st, time)
                w = self._w(sf)
                G, auxs = self._tendencies(sf, w, time)
                st = dict(st0)
                for n in ("u", "v") + self.tracer_names:
                    st[n] = st0[n] + sdt * G[n]
                st = implicit_all(st, auxs, sdt)
                if implicit:
                    st = self._implicit_eta_step(st, sdt)
                else:
                    st["eta"] = self._explicit_eta(st0["eta"], st["u"],
                                                   st["v"], sdt)
                st = self._mask_prognostics(st)
            st = self._filled(st, time)
            out = dict(st)
            out["time"] = time + dt
            out["iteration"] = state["iteration"] + 1
            return out

        return step

    def _step_for(self, dt):
        """Per-Δt compiled step: split-explicit FixedTimeStepSize substep
        counts and the CATKE substep count M = ceil(Δt/Δτ) are static."""
        from .free_surfaces import FixedTimeStepSize
        fs = self.free_surface
        dyn_se = (isinstance(fs, SplitExplicitFreeSurface)
                  and isinstance(fs.substepping, FixedTimeStepSize))
        M = (self.closure.substeps_for(dt)
             if self._substepped_tke
             and getattr(self.closure, "tke_time_step", None) is not None
             else 1)
        if not dyn_se and M == 1:
            return self._step
        se = fs.settings(float(dt)) if dyn_se else None
        key = ((len(se[1]), se[0]) if se else None, M)
        if not hasattr(self, "_se_step_cache"):
            self._se_step_cache = {}
        if key not in self._se_step_cache:
            self._se_step_cache[key] = jax.jit(
                self._build_step(se_settings=se, catke_substeps=M))
        return self._se_step_cache[key]

    def time_step(self, dt):
        step = self._step_for(dt)
        self.state = step(self.state, jnp.asarray(dt, self.grid.dtype))

    # -- diagnostics ------------------------------------------------------------

    @property
    def time(self):
        return float(self.state["time"])

    @property
    def datetime(self):
        from ..utils.dateclock import datetime_of
        return datetime_of(self.time, self.reference_datetime)

    @property
    def iteration(self):
        return int(self.state["iteration"])

    def diagnose_w(self):
        """(6, NP, NP, ZP) grid-relative w from continuity."""
        sf = self._filled({n: self.state[n]
                           for n in ("u", "v", "eta") + self.tracer_names},
                          self.state["time"])
        return self._w(sf, dt_sigma=self.state.get("dt_sigma"))

    def field(self, name):
        """Writer/diagnostic accessor (fetch_output protocol). 2D fields
        (eta) keep their size-1 z axis un-sliced; "w" is diagnosed."""
        from .cubed_sphere_shallow_water import _PanelFieldView
        g0 = self.grid.panel_grids[0]
        H, N = self.grid.H[0], self.grid.N[0]
        a = self.diagnose_w() if name == "w" else self.state[name]
        zsl = (slice(g0.H[2], g0.H[2] + g0.N[2])
               if a.shape[-1] == g0.padded_shape[2] else slice(None))
        return _PanelFieldView(a[:, H:H + N, H:H + N, zsl])

    def total_tracer(self, name):
        """Global volume integral of a tracer (exactly conserved by the
        flux-form advection with exchanged shared-face values). Uses the
        effective Δz on PartialCellBottom panels, and the σ-weighted cell
        volumes under z* (the conserved quantity is ∑ c σ V)."""
        grid = self.grid
        H, N = grid.H[0], grid.N[0]
        g0 = grid.panel_grids[0]
        hz, nz = g0.H[2], g0.N[2]
        zstar = self.vertical_coordinate == "zstar"
        tot = 0.0
        for p in range(6):
            gp = self.panels[p].grid
            dz = np.asarray(gp.dz(LOC_CCC), np.float64)
            if dz.ndim == 3 and (dz.shape[0] > 1 or dz.shape[1] > 1):
                dzp = np.broadcast_to(dz, gp.padded_shape)[
                    H:H + N, H:H + N, hz:hz + nz]
            else:
                dzp = np.asarray(self._dz_c)
            Azp = np.asarray(grid.panel_grids[p].Az(LOC_CCC))[..., 0]
            cp = np.asarray(self.state[name][p])[H:H + N, H:H + N,
                                                 hz:hz + nz]
            if self._immersed:
                fm = np.asarray(self.panels[p]._fluid_int[LOC_CCC])[
                    H:H + N, H:H + N]
                cp = cp * fm
            w = cp * dzp
            if zstar:
                sig = np.asarray(self.panels[p]._sigma_fields(
                    self.state["eta"][p])[("c", "c")])[H:H + N, H:H + N]
                w = w * sig
            col = w.sum(axis=-1)
            tot += float((col * Azp[H:H + N, H:H + N]).sum())
        return tot

"""ScalarDiffusivity and ScalarBiharmonicDiffusivity closures.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
scalar_diffusivity.jl (iso/horizontal/vertical formulations, ν and per-tracer
κ, Explicit or VerticallyImplicit time discretization) and
scalar_biharmonic_diffusivity.jl.

Closure protocol (consumed by models):

    compute_diffusivities(grid, fields, time)      -> aux dict (static-shaped)
    momentum_tendencies(grid, fields, aux)          -> dict u/v/w contributions
    tracer_tendency(grid, name, fields, aux)        -> Gc contribution
    vertical_implicit_kappas(grid, fields, aux)     -> dict of κz for the
        implicit vertical solve, or {} when fully explicit (reference:
        implicit_explicit_time_discretization.jl + vertically_implicit_
        diffusion_solver.jl)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..operators.operators import ddx, ddy, div_xy_ccc
from .diffusion_operators import (LOC_CFF, LOC_FCF, div_2nu_strain_u,
                                  div_2nu_strain_v, div_2nu_strain_w,
                                  div_kappa_grad, vitd_explicit_z_term)
from ..grids.topology import LOC_CCC, LOC_CFC, LOC_FCC

ISO = "iso"
HORIZONTAL = "horizontal"
VERTICAL = "vertical"


class _ClosureBase:
    # BCs on the closure's DIAGNOSTIC diffusivity fields (reference:
    # boundary_conditions = (b=..., κₑ=(b=κₑ_bcs,)) — a Value BC on κₑ
    # pins the wall diffusivity so the boundary diffusive flux is exact;
    # test_boundary_conditions_integration.jl "Custom diffusivity boundary
    # conditions"). Structure: {"nu_e": FieldBCs, "kappa_e": {tracer: FieldBCs}}
    diffusivity_boundary_conditions = None

    def _fill_diffusivity(self, grid, arr, key, tracer=None, time=0.0):
        bcs = self.diffusivity_boundary_conditions or {}
        spec = bcs.get(key)
        if isinstance(spec, dict):
            spec = spec.get(tracer)
        if spec is None:
            return arr
        from ..boundary_conditions import fill_halo_regions
        from ..grids.topology import LOC_CCC
        return fill_halo_regions(arr, grid, LOC_CCC, spec, time)

    def _fp(self):
        raise NotImplementedError

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()

    def compute_diffusivities(self, grid, fields, time):
        return {}

    def vertical_implicit_kappas(self, grid, fields, aux):
        return {}

    required_halo = 1

    # True for the always-implicit 3D-κ closures (CATKE / k-ε / RiBased /
    # ConvectiveAdjustment) whose implicit solve assumes Flux z BCs — see
    # validate_implicit_closure_z_bcs
    implicit_only_z = False


def validate_implicit_closure_z_bcs(closure, bcs):
    """Refuse Value/Gradient top/bottom BCs on fields diffused by an
    always-implicit 3D-κ closure: the implicit tridiagonal drops the
    boundary z faces and (unlike the ScalarDiffusivity family, which adds
    the explicit boundary-face remainder via vitd_explicit_z_term) no
    explicit term restores them, so the BC would silently not act
    (reference: the generic explicit-boundary VITD branch of
    abstract_scalar_diffusivity_closure.jl:263-292 covers all implicit
    closures; here the remainder exists only for ScalarDiffusivity).

    ``bcs``: {name: FieldBoundaryConditions} of the regularized prognostic
    BCs."""
    if closure is None:
        return
    members = getattr(closure, "closures", (closure,))
    if not any(getattr(c, "implicit_only_z", False) for c in members):
        return
    from ..boundary_conditions.boundary_condition import GRADIENT, VALUE
    for name, fb in bcs.items():
        if name in ("eta", "ph", "w"):
            continue
        for side in ("bottom", "top"):
            bc = getattr(fb, side, None)
            if bc is not None and bc.classification in (VALUE, GRADIENT):
                raise NotImplementedError(
                    f"{side} {bc.classification} boundary condition on "
                    f"{name!r} combined with an always-implicit closure "
                    f"(CATKE/k-epsilon/RiBased/ConvectiveAdjustment): the "
                    f"implicit vertical solve assumes Flux z BCs and would "
                    f"silently drop this condition. Use a Flux BC, or an "
                    f"explicit ScalarDiffusivity for the z direction.")


def _kappa_for(kappa, name):
    if isinstance(kappa, dict):
        return kappa.get(name, 0.0)
    return kappa


def resolve_coefficient(grid, k, loc, time=0.0):
    """Diffusivity coefficient as scalar / padded array / continuous-form
    callable ν(x, y, z, t) evaluated at ``loc`` (reference:
    scalar_diffusivity.jl — ν/κ 'may be constants, arrays, fields, or
    functions of (x, y, z, t)')."""
    if callable(k) and not hasattr(k, "ndim"):
        import jax.numpy as _jnp
        from ..grids.base import broadcastable_1d
        coords = [broadcastable_1d(grid.coord_padded(ax, loc[ax]), ax)
                  for ax in range(3)]
        return _jnp.broadcast_to(_jnp.asarray(k(*coords, time), grid.dtype),
                                 grid.padded_shape)
    return k


def time_discretization_str(td):
    """Normalize a time-discretization spec: the reference's
    ExplicitTimeDiscretization() / VerticallyImplicitTimeDiscretization()
    marker objects or the strings used internally."""
    return getattr(td, "name", td)


class ExplicitTimeDiscretization:
    """Marker matching the reference's trait type
    (implicit_explicit_time_discretization.jl)."""
    name = "explicit"


class VerticallyImplicitTimeDiscretization:
    name = "vertically_implicit"


class ScalarDiffusivity(_ClosureBase):
    def __init__(self, *args, nu=0.0, kappa=0.0, formulation=ISO,
                 time_discretization="explicit", discrete_form=False,
                 loc=None, parameters=None):
        """``discrete_form=True``: ν/κ are ``f(grid, fields, time[, p])``
        returning a padded center-located array (the whole-array analogue of
        the reference's discrete form f(i, j, k, grid, clock, fields, p),
        scalar_diffusivity.jl). ``parameters`` is passed as the trailing
        argument when given; ``loc`` is accepted for reference-API
        compatibility (whole-array coefficients are center-located)."""
        # reference calling convention: the time discretization may come
        # FIRST positionally — ScalarDiffusivity(
        # VerticallyImplicitTimeDiscretization(), nu=..., kappa=...)
        # (scalar_diffusivity.jl's constructor); plain positional
        # (nu, kappa[, formulation]) also accepted
        if args and isinstance(args[0], (ExplicitTimeDiscretization,
                                         VerticallyImplicitTimeDiscretization)):
            time_discretization, args = args[0], args[1:]
        if len(args) > 0:
            nu = args[0]
        if len(args) > 1:
            kappa = args[1]
        if len(args) > 2:
            formulation = args[2]
        if len(args) > 3:
            time_discretization = args[3]
        if len(args) > 4:
            raise TypeError("too many positional arguments")
        self.nu = nu
        self.kappa = kappa
        self.discrete_form = bool(discrete_form)
        self.parameters = parameters
        self.formulation = formulation
        self.time_discretization = time_discretization_str(time_discretization)
        if formulation not in (ISO, HORIZONTAL, VERTICAL):
            raise ValueError(formulation)

    @staticmethod
    def _coef_fp(k):
        # arrays aren't hashable: fingerprint by identity (same convention
        # as callables — a new array object is a new configuration)
        return id(k) if getattr(k, "ndim", 0) >= 1 else k

    def _fp(self):
        if isinstance(self.kappa, dict):
            k = tuple(sorted((n, self._coef_fp(v))
                             for n, v in self.kappa.items()))
        else:
            k = self._coef_fp(self.kappa)
        return ("ScalarDiffusivity", self._coef_fp(self.nu), k,
                self.formulation, self.time_discretization,
                self.discrete_form)

    @property
    def _axes(self):
        return {ISO: (0, 1, 2), HORIZONTAL: (0, 1), VERTICAL: (2,)}[
            self.formulation]

    @property
    def _explicit_axes(self):
        if self.time_discretization == "vertically_implicit":
            return tuple(a for a in self._axes if a != 2)
        return self._axes

    @property
    def _vitd_z(self):
        return (self.time_discretization == "vertically_implicit"
                and 2 in self._axes)

    def _resolve(self, grid, k, loc, fields, time):
        if self.discrete_form and callable(k):
            args = (grid, fields, time)
            if self.parameters is not None:
                args = args + (self.parameters,)
            arr = k(*args)           # center-located padded array
        elif callable(k) and not hasattr(k, "ndim"):
            return resolve_coefficient(grid, k, loc, time)
        else:
            arr = k
        if np.isscalar(arr) or getattr(arr, "ndim", 0) == 0:
            return arr
        # center-located ARRAY coefficient: interpolate to the requested
        # staggering (reference: ℑ of νᶜᶜᶜ array diffusivities onto the
        # stress locations — previously the raw ccc array was used at
        # ffc/fcf, a half-cell mislocation)
        from ..operators.operators import interp_to
        return interp_to(grid, arr, LOC_CCC, loc)

    def compute_diffusivities(self, grid, fields, time):
        # function/array ν/κ resolve ONCE per step at the stress locations
        # (reference: continuous f(x, y, z, t), discrete f(i, j, k, ...),
        # and array diffusivities)
        aux = {}
        nu_varies = (callable(self.nu)
                     or getattr(self.nu, "ndim", 0) >= 1)
        if nu_varies:
            for key, loc in (("nu_ccc", LOC_CCC), ("nu_ffc", ("f", "f", "c")),
                             ("nu_fcf", ("f", "c", "f")),
                             ("nu_cff", ("c", "f", "f")),
                             ("nu_ccf", ("c", "c", "f"))):
                aux[key] = self._resolve(grid, self.nu, loc, fields, time)
        kappas = (self.kappa if isinstance(self.kappa, dict)
                  else {None: self.kappa})
        for name, k in kappas.items():
            if callable(k) or getattr(k, "ndim", 0) >= 1:
                key = "kappa_ccc" if name is None else f"kappa_ccc_{name}"
                aux[key] = self._resolve(grid, k, LOC_CCC, fields, time)
        return aux

    def _nu_at(self, aux, key):
        if callable(self.nu) or getattr(self.nu, "ndim", 0) >= 1:
            return aux[key]
        return self.nu

    def momentum_tendencies(self, grid, fields, aux):
        u, v, w = fields["u"], fields["v"], fields["w"]
        nu = self._nu_at(aux, "nu_ccc")
        axes = self._explicit_axes
        if self.formulation == ISO:
            nu_ffc = self._nu_at(aux, "nu_ffc")
            nu_fcf = self._nu_at(aux, "nu_fcf")
            nu_cff = self._nu_at(aux, "nu_cff")
            out = dict(
                u=div_2nu_strain_u(grid, u, v, w, nu, nu_ffc, nu_fcf, axes),
                v=div_2nu_strain_v(grid, u, v, w, nu, nu_ffc, nu_cff, axes),
                w=div_2nu_strain_w(grid, u, v, w, nu, nu_fcf, nu_cff, axes))
            if self._vitd_z:
                # 2νSxz = ν(∂z u + ∂x w): the tridiagonal owns ν ∂z u on
                # interior faces; ν ∂x w stays explicit everywhere and the
                # walls keep the full flux (reference ivd_viscous_flux_uz +
                # the k==1 | k==Nz+1 explicit-boundary branch)
                tu = vitd_explicit_z_term(grid, u, LOC_FCC, nu,
                                          cross_grad=ddx(grid, w, LOC_FCF))
                tv = vitd_explicit_z_term(grid, v, LOC_CFC, nu,
                                          cross_grad=ddy(grid, w, LOC_CFF))
                if tu is not None:
                    out["u"] = out["u"] + tu
                    out["v"] = out["v"] + tv
            return out
        # horizontal / vertical formulations use the gradient (Laplacian) form
        out = dict(
            u=div_kappa_grad(grid, u, ("f", "c", "c"), nu, axes),
            v=div_kappa_grad(grid, v, ("c", "f", "c"), nu, axes),
            w=div_kappa_grad(grid, w, ("c", "c", "f"), nu, axes))
        if self._vitd_z:
            tu = vitd_explicit_z_term(grid, u, LOC_FCC, nu)
            tv = vitd_explicit_z_term(grid, v, LOC_CFC, nu)
            if tu is not None:
                out["u"] = out["u"] + tu
                out["v"] = out["v"] + tv
        return out

    def tracer_tendency(self, grid, name, fields, aux):
        k = _kappa_for(self.kappa, name)
        if callable(k) or getattr(k, "ndim", 0) >= 1:
            key = ("kappa_ccc" if not isinstance(self.kappa, dict)
                   else f"kappa_ccc_{name}")
            k = aux[key]
        g = div_kappa_grad(grid, fields[name], ("c", "c", "c"), k,
                           self._explicit_axes)
        if self._vitd_z:
            t = vitd_explicit_z_term(grid, fields[name], LOC_CCC, k)
            if t is not None:
                g = g + t
        return g

    def vertical_implicit_kappas(self, grid, fields, aux):
        if self.time_discretization != "vertically_implicit":
            return {}
        if 2 not in self._axes:
            # a HORIZONTAL formulation has no z-diffusivity for the implicit
            # solve to own (reference: νᶻ ≡ 0 for HorizontalFormulation,
            # abstract_scalar_diffusivity_closure.jl z-diffusivity extractors)
            return {}
        nu_z = (aux["nu_ccf"] if (callable(self.nu) or
                                  getattr(self.nu, "ndim", 0) >= 1)
                else self.nu)
        out = {"u": nu_z, "v": nu_z}
        if "w" in fields:
            # under the isotropic strain form τ₃₃ = 2ν ∂z w, so the implicit
            # operator owns 2ν; the reference's νᶜᶜᶜ coefficient
            # (vertically_implicit_diffusion_solver.jl ivd_diffusivity
            # ::C::C::C with viscous_flux_wz ≡ 0 on interior faces) silently
            # halves w's vertical dissipation under VITD — kept exact here
            # (the x-z Taylor-Green VITD test asserts the e^{-2νt} decay)
            out["w"] = 2 * nu_z if self.formulation == ISO else nu_z
        for name in fields:
            if name not in ("u", "v", "w"):
                k = _kappa_for(self.kappa, name)
                if callable(k) or getattr(k, "ndim", 0) >= 1:
                    key = ("kappa_ccc" if not isinstance(self.kappa, dict)
                           else f"kappa_ccc_{name}")
                    k = aux[key]
                out[name] = k
        return out


def VerticalScalarDiffusivity(*args, nu=0.0, kappa=0.0,
                              time_discretization="explicit"):
    # accepts the reference's td-first positional form AND the legacy
    # (nu, kappa, time_discretization) positional order
    if args and isinstance(args[0], (ExplicitTimeDiscretization,
                                     VerticallyImplicitTimeDiscretization)):
        time_discretization, args = args[0], args[1:]
    if len(args) > 0:
        nu = args[0]
    if len(args) > 1:
        kappa = args[1]
    if len(args) > 2:
        time_discretization = args[2]
    if len(args) > 3:
        raise TypeError("too many positional arguments")
    return ScalarDiffusivity(nu=nu, kappa=kappa, formulation=VERTICAL,
                             time_discretization=time_discretization)


def HorizontalScalarDiffusivity(*args, nu=0.0, kappa=0.0,
                                time_discretization="explicit"):
    if args and isinstance(args[0], (ExplicitTimeDiscretization,
                                     VerticallyImplicitTimeDiscretization)):
        time_discretization, args = args[0], args[1:]
    if len(args) > 0:
        nu = args[0]
    if len(args) > 1:
        kappa = args[1]
    if len(args) > 2:
        raise TypeError("too many positional arguments")
    return ScalarDiffusivity(nu=nu, kappa=kappa, formulation=HORIZONTAL,
                             time_discretization=time_discretization)


class ScalarBiharmonicDiffusivity(_ClosureBase):
    """4th-order hyperdiffusion: tendency -= ∇·(ν ∇(∇²q)) with a sign such
    that it damps (reference: scalar_biharmonic_diffusivity.jl)."""

    required_halo = 2

    def __init__(self, nu=0.0, kappa=0.0, formulation=ISO):
        self.nu = nu
        self.kappa = kappa
        self.discrete_form = False
        self.parameters = None
        self.formulation = formulation

    def _fp(self):
        k = tuple(sorted(self.kappa.items())) if isinstance(self.kappa, dict) \
            else self.kappa
        return ("ScalarBiharmonicDiffusivity", self.nu, k, self.formulation)

    @property
    def _axes(self):
        return {ISO: (0, 1, 2), HORIZONTAL: (0, 1), VERTICAL: (2,)}[
            self.formulation]

    def _biharm(self, grid, q, loc, kappa):
        lap = div_kappa_grad(grid, q, loc, 1.0, self._axes)
        return -div_kappa_grad(grid, lap, loc, kappa, self._axes)

    def momentum_tendencies(self, grid, fields, aux):
        return dict(
            u=self._biharm(grid, fields["u"], ("f", "c", "c"), self.nu),
            v=self._biharm(grid, fields["v"], ("c", "f", "c"), self.nu),
            w=self._biharm(grid, fields["w"], ("c", "c", "f"), self.nu))

    def tracer_tendency(self, grid, name, fields, aux):
        k = _kappa_for(self.kappa, name)
        return self._biharm(grid, fields[name], ("c", "c", "c"), k)


def VerticalScalarBiharmonicDiffusivity(nu=0.0, kappa=0.0):
    return ScalarBiharmonicDiffusivity(nu, kappa, VERTICAL)


def HorizontalScalarBiharmonicDiffusivity(nu=0.0, kappa=0.0):
    return ScalarBiharmonicDiffusivity(nu, kappa, HORIZONTAL)


class ClosureTuple(_ClosureBase):
    """Sum of closures (reference: closure tuples,
    src/TurbulenceClosures/closure_tuples.jl)."""

    def __init__(self, *closures):
        self.closures = tuple(closures)
        self.required_halo = max(getattr(c, "required_halo", 1)
                                 for c in closures)
        names = []
        for c in closures:
            for n in getattr(c, "required_tracers", ()):
                if n not in names:
                    names.append(n)
        self.required_tracers = tuple(names)

    def _fp(self):
        return ("ClosureTuple",) + tuple(c._fp() for c in self.closures)

    def compute_diffusivities(self, grid, fields, time):
        return [c.compute_diffusivities(grid, fields, time)
                for c in self.closures]

    def momentum_tendencies(self, grid, fields, aux):
        outs = [c.momentum_tendencies(grid, fields, a)
                for c, a in zip(self.closures, aux)]
        return {k: sum(o[k] for o in outs) for k in ("u", "v", "w")}

    def tracer_tendency(self, grid, name, fields, aux):
        return sum(c.tracer_tendency(grid, name, fields, a)
                   for c, a in zip(self.closures, aux))

    def vertical_implicit_kappas(self, grid, fields, aux):
        combined = {}
        for c, a in zip(self.closures, aux):
            for k, v in c.vertical_implicit_kappas(grid, fields, a).items():
                combined[k] = combined.get(k, 0.0) + v
        return combined

    def vertical_implicit_damping(self, grid, fields, aux):
        combined = {}
        for c, a in zip(self.closures, aux):
            if hasattr(c, "vertical_implicit_damping"):
                for k, v in c.vertical_implicit_damping(grid, fields,
                                                        a).items():
                    combined[k] = combined.get(k, 0.0) + v
        return combined

    def clip_fields(self, fields):
        for c in self.closures:
            if hasattr(c, "clip_fields"):
                fields = c.clip_fields(fields)
        return fields

    # -- substepped-turbulence delegation ----------------------------------------
    # A tuple containing one substepped TKE-family member (CATKE or k-ε)
    # exposes that member's substepping interface so the model drives it
    # exactly as it would the bare closure (reference: closure tuples are
    # unwrapped by time_step_catke_equation.jl's `catke_in_closures`).

    @property
    def tke_member(self):
        for c in self.closures:
            if getattr(c, "substepped_tke", False):
                return c
        return None

    @property
    def substepped_tke(self):
        return self.tke_member is not None

    @property
    def substepped_tracers(self):
        m = self.tke_member
        return m.substepped_tracers if m is not None else ()

    @property
    def tke_time_step(self):
        return self.tke_member.tke_time_step

    def substeps_for(self, dt):
        return self.tke_member.substeps_for(dt)

    def step_turbulence(self, grid, fields_old, fields_new, slow_G, Gm, dt,
                        chi0, euler, M, time):
        return self.tke_member.step_turbulence(
            grid, fields_old, fields_new, slow_G, Gm, dt, chi0, euler, M,
            time)

    def tracer_tendency_excluding_tke(self, grid, name, fields, aux):
        """Slow tendency contributions for a substepped tracer from the
        NON-substepped members (e.g. horizontal diffusion of ``e`` by an
        accompanying ScalarDiffusivity); the substepped member's fast terms
        live inside step_turbulence."""
        tke = self.tke_member
        return sum((c.tracer_tendency(grid, name, fields, a)
                    for c, a in zip(self.closures, aux) if c is not tke),
                   start=jnp.zeros_like(fields[name]))


class HorizontalDivergenceScalarDiffusivity(_ClosureBase):
    """Divergence damping: momentum tendency (∂x, ∂y) of ν·∇h·u — damps the
    horizontally-divergent mode only (reference: scalar_diffusivity.jl
    HorizontalDivergenceFormulation)."""

    def __init__(self, nu=0.0):
        self.nu = nu

    def _fp(self):
        return ("HorizontalDivergenceScalarDiffusivity", self.nu)

    def _delta(self, grid, fields):
        return div_xy_ccc(grid, fields["u"], fields["v"])

    def momentum_tendencies(self, grid, fields, aux):
        q = self.nu * self._delta(grid, fields)
        out = dict(u=ddx(grid, q, ("f", "c", "c")),
                   v=ddy(grid, q, ("c", "f", "c")))
        if "w" in fields:
            out["w"] = jnp.zeros_like(fields["w"])
        return out

    def tracer_tendency(self, grid, name, fields, aux):
        return 0.0


class HorizontalDivergenceScalarBiharmonicDiffusivity(
        HorizontalDivergenceScalarDiffusivity):
    """Biharmonic divergence damping: -(∂x, ∂y) of ν·∇h²(∇h·u)
    (reference: scalar_biharmonic_diffusivity.jl
    HorizontalDivergenceFormulation)."""

    required_halo = 2

    def _fp(self):
        return ("HorizontalDivergenceScalarBiharmonicDiffusivity", self.nu)

    def momentum_tendencies(self, grid, fields, aux):
        delta = self._delta(grid, fields)
        lap = div_kappa_grad(grid, delta, ("c", "c", "c"), 1.0, (0, 1))
        q = -self.nu * lap
        out = dict(u=ddx(grid, q, ("f", "c", "c")),
                   v=ddy(grid, q, ("c", "f", "c")))
        if "w" in fields:
            out["w"] = jnp.zeros_like(fields["w"])
        return out


class FluxTapering:
    """Isopycnal slope-tapering spec (reference: FluxTapering(max_slope) —
    isopycnal_skew_symmetric_diffusivity.jl): pass as ``slope_limiter=`` to
    the isopycnal closures."""

    def __init__(self, max_slope):
        self.max_slope = float(max_slope)


def viscosity(closure, diffusivity_fields):
    """The closure's (eddy) viscosity — a constant or the aux field
    (reference: TurbulenceClosures.viscosity)."""
    if isinstance(diffusivity_fields, dict) and "nu_e" in diffusivity_fields:
        return diffusivity_fields["nu_e"]
    return getattr(closure, "nu", 0.0)


def diffusivity(closure, diffusivity_fields, tracer="b"):
    """The closure's (eddy) tracer diffusivity (reference:
    TurbulenceClosures.diffusivity)."""
    if isinstance(diffusivity_fields, dict):
        for key in (f"kappa_{tracer}", "kappa_e", "nu_e"):
            if key in diffusivity_fields:
                return diffusivity_fields[key]
    return _kappa_for(getattr(closure, "kappa", 0.0), tracer)

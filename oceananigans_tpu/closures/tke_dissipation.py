"""k-ε vertical diffusivity: prognostic TKE ``e`` and dissipation ``eps``
with Umlauf & Burchard second-order stability functions.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
TKEBasedVerticalDiffusivities/ —
* tke_dissipation_vertical_diffusivity.jl (401 LoC): κ_u = 𝕊u·e²/ε,
  κ_c = 𝕊c·e²/ε, κ_e = 𝕊u/Cσe·e²/ε, κ_ε = 𝕊u/Cσϵ·e²/ε at (c,c,f), with a
  stratified-displacement dissipation floor
  ε ≥ 𝕊u₀³ e^{3/2} / min(Lz, Cᴺ√(e/N²⁺)) (:300-333).
* tke_dissipation_stability_functions.jl (292 LoC): the variable stability
  functions 𝕊u(αᴺ, αᴹ) = (Cu₀+Cu₁αᴺ+Cu₂αᴹ)/D and 𝕊c = (Cc₀+Cc₁αᴺ+Cc₂αᴹ)/D
  with D = Cd₀+Cd₁αᴺ+Cd₂αᴹ+Cd₃αᴺαᴹ+Cd₄αᴺ²+Cd₅αᴹ², evaluated on the
  nondimensional stratification αᴺ = τ²N² and shear αᴹ = τ²S² numbers
  (τ = e/ε), with αᴺ clamped to the free-convection minimum (eq. A.22 of
  Umlauf & Burchard 2005, ×0.73 safety) and αᴹ to the shear-anisotropy
  maximum (eq. 44); 𝕊u₀ from the log-layer balance (eq. 13, U&B 2003).
* tke_dissipation_equations.jl (315 LoC): ∂t e = P + wb − ε,
  ∂t ε = (ε/e)(Cᴾϵ P + Cᵇϵ wb − Cᵋϵ ε); sinks and the negative buoyancy
  flux treated implicitly as linear damping.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..operators.operators import iz_c, iz_f
from .catke import shear_production
from .scalar_diffusivity import _ClosureBase
from .vertical_diffusivities import _N2_ccf, _shear2_ccf


class VariableStabilityFunctions:
    """Second-order closure stability functions (reference:
    tke_dissipation_stability_functions.jl:40-102, Umlauf & Burchard
    coefficients)."""

    def __init__(self, Csigma_e=1.0, Csigma_eps=1.2,
                 Cu0=0.1067, Cu1=0.0173, Cu2=-0.0001205,
                 Cc0=0.1120, Cc1=0.003766, Cc2=0.0008871,
                 Cd0=1.0, Cd1=0.2398, Cd2=0.02872, Cd3=0.005154,
                 Cd4=0.006930, Cd5=-0.0003372, Su0=None):
        self.Csigma_e, self.Csigma_eps = Csigma_e, Csigma_eps
        self.Cu = (Cu0, Cu1, Cu2)
        self.Cc = (Cc0, Cc1, Cc2)
        self.Cd = (Cd0, Cd1, Cd2, Cd3, Cd4, Cd5)
        if Su0 is None:
            # log-layer balance (reference:
            # tke_dissipation_stability_functions.jl:76-84)
            a = Cd5 - Cu2
            b = Cd2 - Cu0
            c = Cd0
            Su0 = (2 * a / (-b - np.sqrt(b * b - 4 * a * c))) ** 0.25
        self.Su0 = float(Su0)
        self.variable = True

    def _fp(self):
        return ("VariableStabilityFunctions", self.Csigma_e, self.Csigma_eps,
                self.Cu, self.Cc, self.Cd, self.Su0)

    def minimum_stratification_number(self, safety=0.73):
        """Free-convection bound on αᴺ (reference: eq. A.22 of U&B 2005,
        tke_dissipation_stability_functions.jl:140-165)."""
        m0, m1, _ = self.Cc
        d0, d1, d2, d3, d4, d5 = self.Cd
        a = d4 + m1
        b = d1 + m0
        c = d0
        return safety * (-b + np.sqrt(b * b - 4 * a * c)) / (2 * a)

    def maximum_shear_number(self, aN):
        """Shear-anisotropy bound on αᴹ (reference: eq. 44 of U&B 2005,
        tke_dissipation_stability_functions.jl:175-200)."""
        n0, n1, _ = self.Cu
        d0, d1, d2, d3, d4, d5 = self.Cd
        e0 = d0 * n0
        e1 = d0 * n1 + d1 * n0
        e2 = d1 * n1 + d4 * n0
        e3 = d4 * n1
        e4 = d2 * n0
        e5 = d2 * n1 + d3 * n0
        e6 = d3 * n1
        num = e0 + e1 * aN + e2 * aN ** 2 + e3 * aN ** 3
        den = e4 + e5 * aN + e6 * aN ** 2
        return num / den

    def evaluate(self, aN, aM):
        """(𝕊u, 𝕊c) on clamped (αᴺ, αᴹ)."""
        Cu0, Cu1, Cu2 = self.Cu
        Cc0, Cc1, Cc2 = self.Cc
        d0, d1, d2, d3, d4, d5 = self.Cd
        den = (d0 + d1 * aN + d2 * aM + d3 * aN * aM + d4 * aN ** 2
               + d5 * aM ** 2)
        Su = (Cu0 + Cu1 * aN + Cu2 * aM) / den
        Sc = (Cc0 + Cc1 * aN + Cc2 * aM) / den
        return Su, Sc


class ConstantStabilityFunctions(VariableStabilityFunctions):
    """Constant-coefficient limit (reference:
    tke_dissipation_stability_functions.jl:17-37): 𝕊u = Cu₀, 𝕊c = Cc₀."""

    def __init__(self, Csigma_e=1.0, Csigma_eps=1.2, Cu0=0.53, Cc0=0.53,
                 Su0=0.53):
        self.Csigma_e, self.Csigma_eps = Csigma_e, Csigma_eps
        self.Cu = (Cu0, 0.0, 0.0)
        self.Cc = (Cc0, 0.0, 0.0)
        self.Cd = (1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        self.Su0 = float(Su0)
        self.variable = False

    def _fp(self):
        return ("ConstantStabilityFunctions", self.Csigma_e, self.Csigma_eps,
                self.Cu[0], self.Cc[0], self.Su0)

    def evaluate(self, aN, aM):
        return self.Cu[0], self.Cc[0]


class TKEDissipationEquations:
    """e/ε equation coefficients (reference:
    tke_dissipation_equations.jl:9-19)."""

    def __init__(self, Ceps_eps=1.92, CP_eps=1.44, Cb_eps_plus=-0.65,
                 Cb_eps_minus=-0.65, Cwu=0.0, CwD=0.0, Cw_alpha=0.11,
                 gravitational_acceleration=9.8065,
                 minimum_roughness_length=1e-4):
        self.Ceps_eps = Ceps_eps
        self.CP_eps = CP_eps
        self.Cb_plus = Cb_eps_plus
        self.Cb_minus = Cb_eps_minus
        # surface-flux constants: Cᵂu★/CᵂwΔ (both 0 by default in the
        # reference), the Charnock parameter Cᵂα, g, and ℓmin
        self.Cwu = Cwu
        self.CwD = CwD
        self.Cw_alpha = Cw_alpha
        self.g = gravitational_acceleration
        self.min_roughness = minimum_roughness_length

    def _fp(self):
        return ("TKEDissipationEquations", self.Ceps_eps, self.CP_eps,
                self.Cb_plus, self.Cb_minus, self.Cwu, self.CwD,
                self.Cw_alpha, self.g, self.min_roughness)


class TKEDissipationVerticalDiffusivity(_ClosureBase):
    required_tracers = ("e", "eps")
    implicit_only_z = True  # assumes Flux z BCs (validate_implicit_closure_z_bcs)

    # e and ε are substepped by the model with per-substep diffusivity
    # refresh (reference: time_step_tke_dissipation_equations!,
    # tke_dissipation_equations.jl:23-98)
    substepped_tke = True
    substepped_tracers = ("e", "eps")

    def __init__(self, stability_functions=None, tke_dissipation_equations=None,
                 minimum_tke=1e-6, CN=0.75, minimum_buoyancy_frequency=1e-14,
                 maximum_viscosity=np.inf, maximum_diffusivity=np.inf,
                 buoyancy=None, negative_tke_damping_time_scale=60.0,
                 tke_dissipation_time_step=None, friction_velocity=None):
        self.stability_functions = (stability_functions
                                    or VariableStabilityFunctions())
        self.equations = (tke_dissipation_equations
                          or TKEDissipationEquations())
        self.minimum_tke = float(minimum_tke)
        self.CN = float(CN)
        self.N2_min = float(minimum_buoyancy_frequency)
        self.max_visc = float(maximum_viscosity)
        self.max_diff = float(maximum_diffusivity)
        self.buoyancy = buoyancy
        # ω for damping negative TKE back toward 0 (reference default:
        # 1minute, tke_dissipation_vertical_diffusivity.jl:61)
        self.omega_neg = 1.0 / float(negative_tke_damping_time_scale)
        # Δτ for (e, ε) substepping: M = ceil(Δt/Δτ) substeps per step
        # (reference: get_time_step, tke_dissipation_equations.jl:21)
        self.tke_time_step = (None if tke_dissipation_time_step is None
                              else float(tke_dissipation_time_step))
        # surface friction velocity u★ for the ε Charnock roughness length
        # (scalar or (x, y, t)-callable; the model derives it from the u/v
        # top flux BCs at construction — reference: friction_velocity,
        # tke_top_boundary_condition.jl)
        self.friction_velocity = friction_velocity

    def substeps_for(self, dt):
        if self.tke_time_step is None:
            return 1
        return max(1, int(np.ceil(float(dt) / self.tke_time_step)))

    def _fp(self):
        return ("TKEDissipation", self.stability_functions._fp(),
                self.equations._fp(), self.minimum_tke, self.CN,
                self.N2_min, self.max_visc, self.max_diff,
                self.omega_neg, self.tke_time_step)

    # -- state clipping ---------------------------------------------------------

    def _estar(self, fields):
        return jnp.maximum(fields["e"], self.minimum_tke)

    def _epsstar(self, grid, fields, N2_ccf):
        """ε clamped below by the stratified-displacement minimum
        (reference: minimum_dissipation,
        tke_dissipation_vertical_diffusivity.jl:310-326)."""
        e = self._estar(fields)
        N2p = iz_c(grid, jnp.maximum(N2_ccf, self.N2_min))
        ell_st = self.CN * jnp.sqrt(e / N2p)
        Lz = abs(grid.extent[2])
        ell_min = jnp.minimum(Lz, ell_st)
        Su0 = self.stability_functions.Su0
        eps_min = jnp.maximum(1e-12, Su0 ** 3 * e ** 1.5 / ell_min)
        return jnp.maximum(fields["eps"], eps_min)

    # -- diffusivities ----------------------------------------------------------

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("TKEDissipationVerticalDiffusivity needs "
                             "buoyancy=…")
        sf = self.stability_functions
        N2 = _N2_ccf(grid, self.buoyancy, fields)
        S2 = _shear2_ccf(grid, fields)
        e = self._estar(fields)
        eps = self._epsstar(grid, fields, N2)
        tau2_f = iz_f(grid, (e / eps) ** 2)          # squared time scale, ccf
        aN = tau2_f * N2
        aM = tau2_f * S2
        if sf.variable:
            aN = jnp.clip(aN, sf.minimum_stratification_number(), 1e10)
            aM = jnp.clip(aM, 0.0, sf.maximum_shear_number(aN))
        Su, Sc = sf.evaluate(aN, aM)
        e2_over_eps = iz_f(grid, e * e) / iz_f(grid, eps)
        ku = jnp.minimum(Su * e2_over_eps, self.max_visc)
        kc = jnp.minimum(Sc * e2_over_eps, self.max_diff)
        ke = jnp.minimum(Su / sf.Csigma_e * e2_over_eps, self.max_diff)
        keps = jnp.minimum(Su / sf.Csigma_eps * e2_over_eps, self.max_diff)
        return {"nu_ccf": ku, "kappa_ccf": kc, "nu_e_ccf": ke,
                "nu_eps_ccf": keps, "N2_ccf": N2}

    # -- tendencies -------------------------------------------------------------

    def momentum_tendencies(self, grid, fields, aux):
        z = jnp.zeros_like(fields["u"])
        return dict(u=z, v=z, w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        if name not in ("e", "eps"):
            return jnp.zeros_like(fields[name])
        eq = self.equations
        e = self._estar(fields)
        eps = self._epsstar(grid, fields, aux["N2_ccf"])
        S2 = _shear2_ccf(grid, fields)
        N2 = aux["N2_ccf"]
        P = iz_c(grid, aux["nu_ccf"] * S2)
        wb = iz_c(grid, -aux["kappa_ccf"] * N2)
        wb_plus = jnp.maximum(wb, 0.0)
        if name == "e":
            # sink -ε and wb⁻ handled implicitly
            return P + wb_plus
        # ε equation (reference: tke_dissipation_equations.jl:140-180):
        # ωϵ(Cᴾϵ P + Cᵇϵ wb⁺); the Cᵋϵ ωϵ ε sink and Cᵇϵ wb⁻ are implicit
        Cb = jnp.where(iz_c(grid, N2) >= 0, eq.Cb_plus, eq.Cb_minus)
        Cb_wb_plus = jnp.maximum(Cb * wb, 0.0)
        omega_eps = eps / e
        return omega_eps * (eq.CP_eps * P + Cb_wb_plus)

    def vertical_implicit_damping(self, grid, fields, aux):
        eq = self.equations
        e = self._estar(fields)
        eps = self._epsstar(grid, fields, aux["N2_ccf"])
        omega = eps / e
        wb = iz_c(grid, -aux["kappa_ccf"] * aux["N2_ccf"])
        wb_minus_e = jnp.minimum(wb, 0.0) / e
        Cb = jnp.where(iz_c(grid, aux["N2_ccf"]) >= 0, eq.Cb_plus,
                       eq.Cb_minus)
        Cb_wb_minus_e = jnp.minimum(Cb * wb, 0.0) / e
        return {"e": omega - wb_minus_e,
                "eps": eq.Ceps_eps * omega - Cb_wb_minus_e}

    def clip_fields(self, fields):
        out = dict(fields)
        out["e"] = jnp.maximum(fields["e"], self.minimum_tke)
        out["eps"] = jnp.maximum(fields["eps"], 1e-12)
        return out

    # -- substepped (e, ε) equations ---------------------------------------------

    def step_turbulence(self, grid, fields_old, fields_new, slow_G, Gm, dt,
                        chi0, euler, M, time):
        """Advance (e, ε) over one baroclinic step in ``M`` AB2 substeps
        with per-substep diffusivity/stability-function refresh (reference:
        time_step_tke_dissipation_equations! + substep_tke_dissipation!,
        tke_dissipation_equations.jl:23-196). ``fields_new`` holds the
        already-updated halo-filled velocities; sinks (ω e, Cᵋϵ ωϵ ε) and
        the Patankar-trick negative buoyancy fluxes are implicit linear
        dampings inside the vertical implicit solve."""
        from ..models.nonhydrostatic import implicit_vertical_diffusion
        eq = self.equations
        e = fields_new["e"]
        eps = fields_new["eps"]
        dtau = dt / M
        Gm_e, Gm_eps = Gm["e"], Gm["eps"]
        # ε surface flux −(𝕊u₀⁴/σϵ)·e★²/(d+ℓᵣ) with the Charnock roughness
        # ℓᵣ = max(ℓmin, Cᵂα u★²/g) (reference: _top_dissipation_flux,
        # tke_dissipation_equations.jl:242-263; d there is −z of the top
        # cell center assuming the surface at z = 0 — here the equivalent
        # surface distance Δz_top/2). Applied as a top-cell source
        # G_ε[top] += |q|/Δz_top.
        h, n = grid.H[2], grid.N[2]
        kt = h + n - 1
        dz_all = np.broadcast_to(np.asarray(grid.dz(("c", "c", "c")), float),
                                 grid.padded_shape)
        dz_top = float(dz_all[0, 0, kt])
        top = np.zeros(grid.padded_shape, bool)
        top[:, :, kt] = True
        top = jnp.asarray(top, e.dtype)
        ustar = self.friction_velocity
        if callable(ustar):
            from ..grids.base import broadcastable_1d
            if hasattr(grid, "nodes2d_padded"):
                # curvilinear 2D-latitude grids: true (λ, φ) nodes
                lam, phi = grid.nodes2d_padded(("c", "c"))
                ustar = ustar(lam[..., None], phi[..., None], time)
            else:
                x1 = broadcastable_1d(grid.coord_padded(0, "c"), 0)
                x2 = broadcastable_1d(grid.coord_padded(1, "c"), 1)
                ustar = ustar(x1, x2, time)
        ell_r = eq.min_roughness if ustar is None else jnp.maximum(
            eq.min_roughness, eq.Cw_alpha * jnp.square(ustar) / eq.g)
        Su0 = self.stability_functions.Su0
        eps_srf_coeff = (Su0 ** 4 / self.stability_functions.Csigma_eps
                         / (0.5 * dz_top + ell_r) / dz_top)
        for m in range(M):
            if M > 1 and m == 0:
                chi = -0.5  # Euler first substep (β = 0 kills G⁻)
            elif M > 1:
                chi = chi0
            else:
                chi = jnp.where(euler, -0.5, chi0)
            fe = dict(fields_new)
            fe["e"] = e
            fe["eps"] = eps
            aux = self.compute_diffusivities(grid, fe, time)
            N2 = aux["N2_ccf"]
            estar = self._estar(fe)
            epsstar = self._epsstar(grid, fe, N2)
            # destruction time scales: ω★ = ε★/e★ for e (with the
            # negative-TKE damping rate when e < 0), ωϵ = ε/e★ for ε
            omega_star = epsstar / estar
            omega_e = jnp.where(e < 0, self.omega_neg, omega_star)
            omega_eps = eps / estar
            wb = iz_c(grid, -aux["kappa_ccf"] * N2)
            wb_plus = jnp.maximum(wb, 0.0)
            wb_minus = jnp.minimum(wb, 0.0)
            wb_minus_e = wb_minus / estar * (e > self.minimum_tke)
            Cb = jnp.where(iz_c(grid, N2) >= 0, eq.Cb_plus, eq.Cb_minus)
            Cb_wb_plus = jnp.maximum(Cb * wb, 0.0)
            Cb_wb_minus = jnp.minimum(Cb * wb, 0.0)
            P = shear_production(grid, aux["nu_ccf"],
                                 fields_old["u"], fields_new["u"],
                                 fields_old["v"], fields_new["v"])
            fast_Ge = P + wb_plus
            fast_Geps = omega_eps * (eq.CP_eps * P + Cb_wb_plus) \
                + top * eps_srf_coeff * jnp.square(estar)
            total_Ge = slow_G["e"] + fast_Ge
            total_Geps = slow_G["eps"] + fast_Geps
            alpha = 1.5 + chi
            beta = 0.5 + chi
            e_star_rhs = e + dtau * (alpha * total_Ge - beta * Gm_e)
            eps_star_rhs = eps + dtau * (alpha * total_Geps - beta * Gm_eps)
            Gm_e, Gm_eps = total_Ge, total_Geps
            # implicit linear operators −Le, −Lϵ as positive damping rates
            lam_e = omega_e - wb_minus_e
            lam_eps = eq.Ceps_eps * omega_eps - Cb_wb_minus / estar
            ke = aux["nu_e_ccf"]
            keps = aux["nu_eps_ccf"]
            if hasattr(grid, "fluid_mask"):
                m_ccf = grid.fluid_mask(("c", "c", "f"), e.dtype)
                ke = ke * m_ccf
                keps = keps * m_ccf
            e = implicit_vertical_diffusion(grid, e_star_rhs, ke, dtau,
                                            damping=lam_e)
            eps = implicit_vertical_diffusion(grid, eps_star_rhs, keps, dtau,
                                              damping=lam_eps)
            e = jnp.maximum(e, self.minimum_tke)
            eps = jnp.maximum(eps, 1e-12)
        return {"e": e, "eps": eps}, {"e": Gm_e, "eps": Gm_eps}

    def vertical_implicit_kappas(self, grid, fields, aux):
        out = {"u": aux["nu_ccf"], "v": aux["nu_ccf"]}
        for name in fields:
            if name in ("u", "v", "w", "eta"):
                continue
            if name == "e":
                out[name] = aux["nu_e_ccf"]
            elif name == "eps":
                out[name] = aux["nu_eps_ccf"]
            else:
                out[name] = aux["kappa_ccf"]
        return out

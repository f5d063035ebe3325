"""CATKE: TKE-based vertical diffusivity with a prognostic turbulent kinetic
energy tracer ``e``.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
TKEBasedVerticalDiffusivities/ —
* catke_vertical_diffusivity.jl: κ_q = ℓ_q·w★ at (c,c,f) with w★ = √max(e_min, e)
* catke_mixing_length.jl:15-37 (the 19 calibrated CATKEMixingLength constants)
  and :40-280: per-quantity mixing lengths ℓ_q = min(H, max(σ_q·ℓ★, ℓʰ_q)) where
  - ℓ★ = min(Cˢ·depth, Cᵇ·height_above_bottom, w★/√N²⁺) (stable limit),
  - σ_q(Ri) = Cᵘⁿ (Ri<0) | Cˡᵒ + (Cʰⁱ−Cˡᵒ)·step(Ri, CRi⁰, CRiᵟ) (stability fn),
  - ℓʰ = Deardorff convective length Cᶜ w★³/Jᵇ with the sheared-convection
    factor 1−Cˢᵖ·Riᶠ, or the entrainment length Cᵉ Jᵇ/(w★N²) in the
    entrainment layer (catke_mixing_length.jl:96-196).
* catke_equation.jl:7-16 (CATKEEquation dissipation/flux constants) and
  :38-95: dissipation ε = e³ᐟ²/ℓᴰ handled IMPLICITLY as a linear damping
  λ = w★/ℓᴰ frozen over the step (time_step_catke_equation.jl).

The surface buoyancy flux Jᵇ driving the convective lengths is supplied by
the user via ``surface_buoyancy_flux`` (scalar or (x, y)-callable); the
reference derives it from the buoyancy-tracer boundary conditions. The
reference's surface TKE flux (Cᵂu★, CᵂwΔ) is expressed here by imposing a
flux boundary condition on ``e`` directly."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grids.base import broadcastable_1d
from ..operators.operators import iz_c, iz_f
from ..operators.shifts import shift
from .scalar_diffusivity import _ClosureBase
from .vertical_diffusivities import _N2_ccf, _shear2_ccf


def shear_production(grid, nu_ccf, u_old, u_new, v_old, v_new):
    """'Approximately conservative' shear production at cell centers
    (reference: shear_production, TKEBasedVerticalDiffusivities.jl:121-143):
    P = ℑx[ℑz(ℑx(ν)·∂z uⁿ·Δz·∂z u⁺ averaged with (u⁺,u⁺))/Δz] + the y
    analogue. Shared by CATKE and the k-ε closure."""
    from ..operators.operators import ddz, ix_c, ix_f, iy_c, iy_f
    fcf = ("f", "c", "f")
    cff = ("c", "f", "f")

    def Px(un, up):
        nu_f = ix_f(grid, nu_ccf)
        dzn = ddz(grid, un, fcf)
        dzp = ddz(grid, up, fcf)
        dz_f = grid.dz(fcf)
        return nu_f * dzn * dz_f * dzp

    def Py(vn, vp):
        nu_f = iy_f(grid, nu_ccf)
        dzn = ddz(grid, vn, cff)
        dzp = ddz(grid, vp, cff)
        dz_f = grid.dz(cff)
        return nu_f * dzn * dz_f * dzp

    Px_fcc = iz_c(grid, 0.5 * (Px(u_old, u_new) + Px(u_new, u_new))) \
        / grid.dz(("f", "c", "c"))
    Py_cfc = iz_c(grid, 0.5 * (Py(v_old, v_new) + Py(v_new, v_new))) \
        / grid.dz(("c", "f", "c"))
    return ix_c(grid, Px_fcc) + iy_c(grid, Py_cfc)


class CATKEMixingLength:
    """The 19 calibrated mixing-length constants (reference:
    catke_mixing_length.jl:15-37)."""

    def __init__(self, Cs=1.131, Cb=0.28, Csp=0.505, CRid=1.02, CRi0=0.254,
                 Chi_u=0.242, Clo_u=0.361, Cun_u=0.370, Cc_u=3.705, Ce_u=0.0,
                 Chi_c=0.098, Clo_c=0.369, Cun_c=0.572, Cc_c=4.793, Ce_c=0.112,
                 Chi_e=0.548, Clo_e=7.863, Cun_e=1.447, Cc_e=3.642, Ce_e=0.0):
        self.Cs, self.Cb, self.Csp = Cs, Cb, Csp
        self.CRid, self.CRi0 = CRid, CRi0
        self.u = (Cun_u, Clo_u, Chi_u, Cc_u, Ce_u)
        self.c = (Cun_c, Clo_c, Chi_c, Cc_c, Ce_c)
        self.e = (Cun_e, Clo_e, Chi_e, Cc_e, Ce_e)

    def _fp(self):
        return ("CATKEMixingLength", self.Cs, self.Cb, self.Csp, self.CRid,
                self.CRi0, self.u, self.c, self.e)


class CATKEEquation:
    """Dissipation/TKE-flux constants (reference: catke_equation.jl:7-16):
    CᵂwΔ/Cᵂu★ the surface convective/shear TKE flux coefficients, Cᵂϵ the
    dissipative near-bottom TKE flux coefficient."""

    def __init__(self, Chi_D=0.579, Clo_D=1.604, Cun_D=0.923, Cc_D=3.254,
                 Ce_D=0.0, CwD=0.383, Cwu=3.179, Cweps=1.0):
        self.D = (Cun_D, Clo_D, Chi_D, Cc_D, Ce_D)
        self.CwD, self.Cwu, self.Cweps = CwD, Cwu, Cweps

    def _fp(self):
        return ("CATKEEquation",) + self.D + (self.CwD, self.Cwu,
                                              self.Cweps)


def _step(x, c, w):
    """Piecewise linear 0→1 over [c, c+w] (reference:
    catke_mixing_length.jl:198)."""
    return jnp.clip((x - c) / w, 0.0, 1.0)


class CATKEVerticalDiffusivity(_ClosureBase):
    required_tracers = ("e",)
    implicit_only_z = True  # assumes Flux z BCs (validate_implicit_closure_z_bcs)

    # the TKE equation is substepped by the model rather than advanced as an
    # ordinary tracer (reference: time_step_catke_equation.jl)
    substepped_tke = True
    substepped_tracers = ("e",)

    def __init__(self, mixing_length=None, tke_equation=None,
                 minimum_tke=1e-9, minimum_convective_buoyancy_flux=1e-11,
                 surface_buoyancy_flux=None, buoyancy=None,
                 tke_time_step=None):
        self.mixing_length = mixing_length or CATKEMixingLength()
        self.tke_equation = tke_equation or CATKEEquation()
        self.minimum_tke = float(minimum_tke)
        self.Jb_eps = float(minimum_convective_buoyancy_flux)
        self.surface_buoyancy_flux = surface_buoyancy_flux
        self.buoyancy = buoyancy
        # Δτ for TKE substepping (reference: tke_time_step, get_time_step —
        # M = ceil(Δt/Δτ) substeps per baroclinic step; None = one substep)
        self.tke_time_step = (None if tke_time_step is None
                              else float(tke_time_step))

    def substeps_for(self, dt):
        """Host-side substep count (reference: calculate M,
        time_step_catke_equation.jl:40-46)."""
        if self.tke_time_step is None:
            return 1
        return max(1, int(np.ceil(float(dt) / self.tke_time_step)))

    def _fp(self):
        return ("CATKE", self.mixing_length._fp(), self.tke_equation._fp(),
                self.minimum_tke, self.Jb_eps, self.tke_time_step,
                id(self.surface_buoyancy_flux)
                if callable(self.surface_buoyancy_flux)
                else self.surface_buoyancy_flux)

    # -- geometry helpers -------------------------------------------------------

    def _depths_ccf(self, grid):
        """(depth below surface, height above bottom, column depth H) at
        z-faces, padded broadcastables."""
        h, n = grid.H[2], grid.N[2]
        zf = np.asarray(grid.coord_padded(2, "f"), np.float64)
        z_top = zf[h + n]
        z_bot = zf[h]
        depth = np.maximum(z_top - zf, 0.0)
        above = np.maximum(zf - z_bot, 0.0)
        H = z_top - z_bot
        return (broadcastable_1d(depth, 2), broadcastable_1d(above, 2), H)

    def _Jb(self, grid, time, fields=None):
        Jb = self.surface_buoyancy_flux
        if Jb is None:
            return 0.0
        if callable(Jb):
            # field-dependent flux BCs (model wiring marks the callable):
            # trailing args are the dependencies' surface-cell slices
            dep_args = ()
            deps = tuple(getattr(Jb, "field_dependencies", ()))
            if deps:
                if fields is None:
                    return 0.0
                h, n = grid.H[2], grid.N[2]
                dep_args = tuple(fields[d][:, :, h + n - 1:h + n]
                                 for d in deps)
            if hasattr(grid, "nodes2d_padded"):
                # curvilinear 2D-latitude grids: true (λ, φ) nodes, as the
                # z-boundary fills pass them (fill_halos.eval_bc)
                lam, phi = grid.nodes2d_padded(("c", "c"))
                return Jb(lam[..., None], phi[..., None], time, *dep_args)
            x = broadcastable_1d(grid.coord_padded(0, "c"), 0)
            y = broadcastable_1d(grid.coord_padded(1, "c"), 1)
            return Jb(x, y, time, *dep_args)
        return float(Jb)

    # -- mixing lengths ---------------------------------------------------------

    def _lengths(self, grid, fields, time):
        ml = self.mixing_length
        e = jnp.maximum(fields["e"], self.minimum_tke)
        wstar_ccc = jnp.sqrt(e)
        wstar = iz_f(grid, wstar_ccc)                       # ccf
        wstar3 = iz_f(grid, wstar_ccc ** 3)
        N2 = _N2_ccf(grid, self.buoyancy, fields)
        S2 = _shear2_ccf(grid, fields)
        Ri = jnp.where(N2 == 0, 0.0, N2 / jnp.where(S2 == 0, 1e-30, S2))

        depth, above, H = self._depths_ccf(grid)
        d = jnp.minimum(ml.Cs * depth, ml.Cb * above)
        N2p = jnp.maximum(N2, 0.0)
        ellN = jnp.where(N2p > 0, wstar / jnp.sqrt(jnp.where(N2p > 0, N2p, 1.0)),
                         jnp.inf)
        ell_stable = jnp.minimum(d, ellN)

        Jb = self._Jb(grid, time, fields)
        Jbe = self.Jb_eps
        N2_above = shift(N2, +1, 2)
        convecting = (Jb > Jbe) & (N2 < 0)
        entraining = (Jb > Jbe) & (N2 > 0) & (N2_above < 0)
        Rif = depth * wstar * S2 / (Jb + Jbe)               # flux Ri number

        def length(consts):
            Cun, Clo, Chi, Cc, Ce = consts
            sigma = jnp.where(Ri < 0, Cun,
                              Clo + (Chi - Clo) * _step(Ri, ml.CRi0, ml.CRid))
            lc = jnp.maximum((1.0 - ml.Csp * Rif) * Cc * wstar3 / (Jb + Jbe),
                             0.0)
            le = Ce * Jb / (wstar * N2 + Jbe)
            lh = jnp.where(convecting, lc, jnp.where(entraining, le, 0.0))
            return jnp.minimum(H, jnp.maximum(sigma * ell_stable, lh))

        return (length(ml.u), length(ml.c), length(ml.e),
                length(self.tke_equation.D), wstar, N2)

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("CATKEVerticalDiffusivity needs buoyancy=…")
        lu, lc, le, lD, wstar, N2 = self._lengths(grid, fields, time)
        return {"nu_z_ccf": lu * wstar, "kappa_z_ccf": lc * wstar,
                "kappa_e_ccf": le * wstar, "ell_D_ccf": lD,
                "N2_ccf": N2}

    # -- TKE budget ---------------------------------------------------------------

    def momentum_tendencies(self, grid, fields, aux):
        z = jnp.zeros_like(fields["u"])
        return dict(u=z, v=z, w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        if name != "e":
            return jnp.zeros_like(fields[name])
        # P_shear + P_buoy; dissipation handled implicitly (reference:
        # catke_equation.jl shear_production/buoyancy_flux + implicit ε)
        S2 = _shear2_ccf(grid, fields)
        N2 = aux["N2_ccf"]
        P_shear = iz_c(grid, aux["nu_z_ccf"] * S2)
        P_buoy = iz_c(grid, -aux["kappa_z_ccf"] * N2)
        return P_shear + P_buoy

    def vertical_implicit_damping(self, grid, fields, aux):
        """λ = w★/ℓᴰ at cell centers (reference: dissipation_rate,
        catke_equation.jl:65-86 — ε = e·w★/ℓᴰ treated as linear damping)."""
        e = jnp.maximum(fields["e"], self.minimum_tke)
        ellD_c = iz_c(grid, aux["ell_D_ccf"])
        lam = jnp.sqrt(e) / jnp.maximum(ellD_c, 1e-10)
        return {"e": lam}

    def clip_fields(self, fields):
        """Floor the TKE after the implicit step (reference clips e ≥ 0)."""
        out = dict(fields)
        out["e"] = jnp.maximum(fields["e"], 0.0)
        return out

    def vertical_implicit_kappas(self, grid, fields, aux):
        out = {"u": aux["nu_z_ccf"], "v": aux["nu_z_ccf"]}
        for name in fields:
            if name in ("u", "v", "w", "eta"):
                continue
            out[name] = aux["kappa_e_ccf"] if name == "e" \
                else aux["kappa_z_ccf"]
        return out

    # -- substepped TKE equation ------------------------------------------------
    # reference: time_step_catke_equation.jl — M = ceil(Δt/Δτ) AB2 substeps,
    # each refreshing κe and the linear implicit operator
    # Le = wb⁻/e − ω + δ(bottom)·Cᵂϵ√e/Δz, with the fast explicit tendency
    # P + wb⁺ (dissipation is fully implicit under VITD).

    def _shear_production(self, grid, nu_ccf, u_old, u_new, v_old, v_new):
        return shear_production(grid, nu_ccf, u_old, u_new, v_old, v_new)

    def _bottom_mask_ccc(self, grid):
        """1 at the bottommost active cell of each column (reference:
        bottommost_active_node)."""
        h, n = grid.H[2], grid.N[2]
        mask = np.zeros(grid.padded_shape, bool)
        if hasattr(grid, "solid_ccc"):
            fluid = ~grid.solid_ccc
            below = np.ones_like(fluid)
            below[:, :, 1:] = ~fluid[:, :, :-1]
            mask = fluid & below
        else:
            mask[:, :, h] = True
        return mask

    def step_turbulence(self, grid, fields_old, fields_new, slow_G, Gm, dt,
                        chi0, euler, M, time):
        """Dict-contract wrapper over :meth:`step_tke` (the model drives all
        substepped closures — CATKE's single ``e``, k-ε's ``(e, eps)`` —
        through this uniform interface)."""
        e_new, Gm_e = self.step_tke(grid, fields_old, fields_new,
                                    slow_G["e"], Gm["e"], dt, chi0, euler,
                                    M, time)
        return {"e": e_new}, {"e": Gm_e}

    def step_tke(self, grid, fields_old, fields_new, slow_Ge, Gm_e, dt,
                 chi0, euler, M, time):
        """Advance the TKE ``e`` over one baroclinic step in ``M`` AB2
        substeps with per-substep diffusivity refresh (reference:
        time_step_catke_equation.jl:14-86). ``fields_new`` holds the already-
        updated (and halo-filled) velocities; ``fields_old`` the start-of-
        step state; ``slow_Ge`` the advective (+ boundary-flux) slow
        tendency; ``Gm_e`` the stored previous TKE tendency. Returns
        (e_new, G_minus_e) for the state pytree."""
        from ..models.nonhydrostatic import implicit_vertical_diffusion
        e = fields_new["e"]
        dtau = dt / M
        bottom = jnp.asarray(self._bottom_mask_ccc(grid), e.dtype)
        dz_c = jnp.asarray(np.broadcast_to(
            np.asarray(grid.dz(("c", "c", "c")), float), grid.padded_shape),
            e.dtype)
        Cweps = self.tke_equation.Cweps
        for m in range(M):
            if M > 1 and m == 0:
                chi = -0.5  # Euler first substep (β = 0 kills G⁻)
            elif M > 1:
                chi = chi0
            else:
                chi = jnp.where(euler, -0.5, chi0)
            fe = dict(fields_new)
            fe["e"] = e
            aux = self.compute_diffusivities(grid, fe, time)
            wb = iz_c(grid, -aux["kappa_z_ccf"] * aux["N2_ccf"])
            wb_plus = jnp.maximum(wb, 0.0)
            wb_minus = jnp.minimum(wb, 0.0)
            P = self._shear_production(grid, aux["nu_z_ccf"],
                                       fields_old["u"], fields_new["u"],
                                       fields_old["v"], fields_new["v"])
            fast_G = P + wb_plus
            total_G = slow_Ge + fast_G
            alpha = 1.5 + chi
            beta = 0.5 + chi
            e_star = e + dtau * (alpha * total_G - beta * Gm_e)
            Gm_e = total_G
            # linear implicit operator −Le as a positive damping rate
            e_floor = jnp.maximum(e, self.minimum_tke)
            wb_minus_e = wb_minus / e_floor * (e > self.minimum_tke)
            ellD_c = iz_c(grid, aux["ell_D_ccf"])
            omega = jnp.sqrt(e_floor) / jnp.maximum(ellD_c, 1e-10)
            wstar = jnp.sqrt(jnp.maximum(e, 0.0))
            lam = omega - wb_minus_e + bottom * Cweps * wstar / dz_c
            kz = aux["kappa_e_ccf"]
            if hasattr(grid, "fluid_mask"):
                kz = kz * grid.fluid_mask(("c", "c", "f"), e.dtype)
            e = implicit_vertical_diffusion(grid, e_star, kz, dtau,
                                            damping=lam)
            e = jnp.maximum(e, 0.0)
        return e, Gm_e

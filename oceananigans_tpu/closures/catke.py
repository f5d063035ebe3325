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
    """Dissipation/TKE-flux constants (reference: catke_equation.jl:7-16)."""

    def __init__(self, Chi_D=0.579, Clo_D=1.604, Cun_D=0.923, Cc_D=3.254,
                 Ce_D=0.0):
        self.D = (Cun_D, Clo_D, Chi_D, Cc_D, Ce_D)

    def _fp(self):
        return ("CATKEEquation",) + self.D


def _step(x, c, w):
    """Piecewise linear 0→1 over [c, c+w] (reference:
    catke_mixing_length.jl:198)."""
    return jnp.clip((x - c) / w, 0.0, 1.0)


class CATKEVerticalDiffusivity(_ClosureBase):
    required_tracers = ("e",)

    def __init__(self, mixing_length=None, tke_equation=None,
                 minimum_tke=1e-9, minimum_convective_buoyancy_flux=1e-11,
                 surface_buoyancy_flux=None, buoyancy=None):
        self.mixing_length = mixing_length or CATKEMixingLength()
        self.tke_equation = tke_equation or CATKEEquation()
        self.minimum_tke = float(minimum_tke)
        self.Jb_eps = float(minimum_convective_buoyancy_flux)
        self.surface_buoyancy_flux = surface_buoyancy_flux
        self.buoyancy = buoyancy

    def _fp(self):
        return ("CATKE", self.mixing_length._fp(), self.tke_equation._fp(),
                self.minimum_tke, self.Jb_eps,
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

    def _Jb(self, grid, time):
        Jb = self.surface_buoyancy_flux
        if Jb is None:
            return 0.0
        if callable(Jb):
            x = broadcastable_1d(grid.coord_padded(0, "c"), 0)
            y = broadcastable_1d(grid.coord_padded(1, "c"), 1)
            return Jb(x, y, time)
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

        Jb = self._Jb(grid, time)
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

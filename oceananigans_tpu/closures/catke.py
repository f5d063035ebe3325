"""CATKE: TKE-based vertical diffusivity with a prognostic turbulent kinetic
energy tracer ``e``.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
TKEBasedVerticalDiffusivities/ — catke_vertical_diffusivity.jl:1-39 (κ = ℓ √e
with stability-dependent mixing length), catke_mixing_length.jl (length scale
blending shear/convective/stable limits), catke_equation.jl (TKE budget:
shear production + buoyancy flux - dissipation Cᴰ e³ᐟ²/ℓ),
time_step_catke_equation.jl (substepped/implicit TKE step).

This is a first-order implementation of the CATKE family: the TKE budget and
κ = ℓ√e structure match the reference; the mixing-length blending uses the
harmonic composition of the stable stratification limit ℓ_N = C_N √e/N and a
grid/column scale, rather than the reference's full 7-coefficient stability
functions (documented deviation — refine toward bitwise parity later).

``e`` is advected/diffused like any tracer; its sources enter through
``tracer_tendency`` and its vertical diffusion is implicit (κₑ)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..operators.operators import iz_c, iz_f
from .scalar_diffusivity import _ClosureBase
from .vertical_diffusivities import _N2_ccf, _shear2_ccf


class CATKEVerticalDiffusivity(_ClosureBase):
    required_tracers = ("e",)

    def __init__(self, C_kappa=0.7, C_nu=0.7, C_e=1.4, C_diss=2.9,
                 C_N=0.75, C_surface=1.0, minimum_tke=1e-9, buoyancy=None):
        self.C_kappa = float(C_kappa)
        self.C_nu = float(C_nu)
        self.C_e = float(C_e)
        self.C_diss = float(C_diss)
        self.C_N = float(C_N)
        self.C_surface = float(C_surface)
        self.minimum_tke = float(minimum_tke)
        self.buoyancy = buoyancy

    def _fp(self):
        return ("CATKE", self.C_kappa, self.C_nu, self.C_e, self.C_diss,
                self.C_N, self.minimum_tke)

    def _mixing_length(self, grid, e_ccf, N2):
        """ℓ = harmonic blend of the stable limit C_N √e/N and the distance
        to the surface (convective/neutral limit)."""
        sqrt_e = jnp.sqrt(e_ccf)
        Nplus = jnp.sqrt(jnp.maximum(N2, 1e-14))
        ell_N = self.C_N * sqrt_e / Nplus
        # distance to surface at z-faces (padded)
        zf = grid.coord_padded(2, "f")
        d = np.maximum(-(zf - zf[grid.H[2] + grid.N[2]]), 1e-3)
        d = jnp.asarray(d.reshape(1, 1, -1), e_ccf.dtype)
        return 1.0 / (1.0 / jnp.maximum(ell_N, 1e-10) + 1.0 / d)

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("CATKEVerticalDiffusivity needs buoyancy=…")
        e = jnp.maximum(fields["e"], self.minimum_tke)
        e_ccf = iz_f(grid, e)
        N2 = _N2_ccf(grid, self.buoyancy, fields)
        ell = self._mixing_length(grid, e_ccf, N2)
        sqrt_e = jnp.sqrt(e_ccf)
        kz = self.C_kappa * ell * sqrt_e
        nz = self.C_nu * ell * sqrt_e
        ke = self.C_e * ell * sqrt_e
        return {"kappa_z_ccf": kz, "nu_z_ccf": nz, "kappa_e_ccf": ke,
                "ell_ccf": ell, "N2_ccf": N2}

    def momentum_tendencies(self, grid, fields, aux):
        z = jnp.zeros_like(fields["u"])
        return dict(u=z, v=z, w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        if name != "e":
            return jnp.zeros_like(fields[name])
        # TKE budget (reference: catke_equation.jl):
        #   ∂t e = P_shear + P_buoy - ε;  the dissipation ε = C_diss e³ᐟ²/ℓ is
        #   treated IMPLICITLY as a linear damping λ e with λ = C_diss √e/ℓ
        #   frozen over the step (reference: time_step_catke_equation.jl) —
        #   see vertical_implicit_damping.
        S2 = _shear2_ccf(grid, fields)
        N2 = aux["N2_ccf"]
        P_shear = iz_c(grid, aux["nu_z_ccf"] * S2)
        P_buoy = iz_c(grid, -aux["kappa_z_ccf"] * N2)
        return P_shear + P_buoy

    def vertical_implicit_damping(self, grid, fields, aux):
        """λ = C_diss √e/ℓ at cell centers: the implicit dissipation rate."""
        e = jnp.maximum(fields["e"], self.minimum_tke)
        ell_c = iz_c(grid, aux["ell_ccf"])
        lam = self.C_diss * jnp.sqrt(e) / jnp.maximum(ell_c, 1e-10)
        return {"e": lam}

    def clip_fields(self, fields):
        """Floor the TKE after the implicit step (reference clips e ≥ 0)."""
        out = dict(fields)
        out["e"] = jnp.maximum(fields["e"], self.minimum_tke)
        return out

    def vertical_implicit_kappas(self, grid, fields, aux):
        out = {"u": aux["nu_z_ccf"], "v": aux["nu_z_ccf"]}
        for name in fields:
            if name in ("u", "v", "w", "eta"):
                continue
            out[name] = aux["kappa_e_ccf"] if name == "e" \
                else aux["kappa_z_ccf"]
        return out

"""k-ε vertical diffusivity: prognostic TKE ``e`` and dissipation ``eps``.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
TKEBasedVerticalDiffusivities/tke_dissipation_vertical_diffusivity.jl (:401)
and tke_dissipation_equations.jl (:315) — the standard two-equation model

    νt = C_μ e²/ε,  κt = νt/σ_t
    ∂t e   = P + B - ε                 (+ vertical diffusion νt/σ_k)
    ∂t eps = (C_1ε P + C_3ε B - C_2ε ε) ε/e   (+ vertical diffusion νt/σ_ε)

with shear production P = νt S² and buoyancy flux B = -κt N². Sink terms are
treated implicitly as linear damping (λ_e = ε/e, λ_ε = C_2ε ε/e — the
reference's implicit treatment), and both fields are floored after the
implicit solve."""

from __future__ import annotations

import jax.numpy as jnp

from ..operators.operators import iz_c, iz_f
from .scalar_diffusivity import _ClosureBase
from .vertical_diffusivities import _N2_ccf, _shear2_ccf


class TKEDissipationVerticalDiffusivity(_ClosureBase):
    required_tracers = ("e", "eps")

    def __init__(self, C_mu=0.09, C_1e=1.44, C_2e=1.92, C_3e=-0.65,
                 sigma_k=1.0, sigma_e=1.3, sigma_t=1.0,
                 minimum_tke=1e-9, minimum_eps=1e-12, buoyancy=None):
        self.C_mu = float(C_mu)
        self.C_1e = float(C_1e)
        self.C_2e = float(C_2e)
        self.C_3e = float(C_3e)
        self.sigma_k = float(sigma_k)
        self.sigma_e = float(sigma_e)
        self.sigma_t = float(sigma_t)
        self.minimum_tke = float(minimum_tke)
        self.minimum_eps = float(minimum_eps)
        self.buoyancy = buoyancy

    def _fp(self):
        return ("TKEDissipation", self.C_mu, self.C_1e, self.C_2e, self.C_3e,
                self.sigma_k, self.sigma_e, self.sigma_t)

    def _clipped(self, fields):
        e = jnp.maximum(fields["e"], self.minimum_tke)
        eps = jnp.maximum(fields["eps"], self.minimum_eps)
        return e, eps

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("TKEDissipationVerticalDiffusivity needs "
                             "buoyancy=…")
        e, eps = self._clipped(fields)
        nut_ccc = self.C_mu * e * e / eps
        # cap νt to a numerically sane range
        nut_ccc = jnp.clip(nut_ccc, 0.0, 10.0)
        nut = iz_f(grid, nut_ccc)
        N2 = _N2_ccf(grid, self.buoyancy, fields)
        return {"nu_ccf": nut, "kappa_ccf": nut / self.sigma_t,
                "nu_e_ccf": nut / self.sigma_k,
                "nu_eps_ccf": nut / self.sigma_e, "N2_ccf": N2}

    def momentum_tendencies(self, grid, fields, aux):
        z = jnp.zeros_like(fields["u"])
        return dict(u=z, v=z, w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        if name not in ("e", "eps"):
            return jnp.zeros_like(fields[name])
        e, eps = self._clipped(fields)
        S2 = _shear2_ccf(grid, fields)
        N2 = aux["N2_ccf"]
        P = iz_c(grid, aux["nu_ccf"] * S2)
        B = iz_c(grid, -aux["kappa_ccf"] * N2)
        if name == "e":
            # sink -ε handled implicitly (vertical_implicit_damping)
            return P + B
        # ε equation: (C_1ε P + C_3ε B) ε/e; the -C_2ε ε²/e sink is implicit
        ratio = eps / e
        return (self.C_1e * P + self.C_3e * B) * ratio

    def vertical_implicit_damping(self, grid, fields, aux):
        e, eps = self._clipped(fields)
        ratio = eps / e
        return {"e": ratio, "eps": self.C_2e * ratio}

    def clip_fields(self, fields):
        out = dict(fields)
        out["e"] = jnp.maximum(fields["e"], self.minimum_tke)
        out["eps"] = jnp.maximum(fields["eps"], self.minimum_eps)
        return out

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

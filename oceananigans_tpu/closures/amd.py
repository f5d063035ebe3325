"""Anisotropic Minimum Dissipation (AMD) LES closure.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
anisotropic_minimum_dissipation.jl (Verstappen/Rozema AMD as used by
Vreugdenhil & Taylor 2018):

    νₑ = max(0, -Σᵢⱼₖ Ĉ Δₖ² (∂ₖûᵢ)(∂ₖûⱼ) Σ̂ᵢⱼ / Σₗₘ (∂ₗûₘ)²)
    κₑ = max(0, -Σᵢₖ  Ĉ Δₖ² (∂ₖûᵢ)(∂ₖĉ) ∂ᵢĉ / Σₗ (∂ₗĉ)²)

with the Poincaré coefficient Ĉ = 1/12 (per direction) and all hatted
quantities evaluated/interpolated at cell centers. An optional background
diffusivity ν_b/κ_b is added (the reference default 1e-6 m²/s / 1e-7 m²/s)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..operators.operators import LOC_CCC, ddx, ddy, ddz, interp
from .diffusion_operators import (div_2nu_strain_u, div_2nu_strain_v,
                                  div_2nu_strain_w, div_kappa_grad)
from .scalar_diffusivity import _ClosureBase

EPS = 1e-20


def _grad_ccc(grid, q, loc):
    """(∂x q, ∂y q, ∂z q) all interpolated to cell centers."""
    out = []
    for axis, dd in enumerate((ddx, ddy, ddz)):
        gloc = list(loc)
        gloc[axis] = "f" if loc[axis] == "c" else "c"
        g = dd(grid, q, tuple(gloc))
        for ax2 in range(3):
            if tuple(gloc)[ax2] == "f":
                g = interp(grid, g, ax2, "c")
        out.append(g)
    return out


def _delta_sq(grid):
    """Per-direction squared grid spacings at ccc (broadcastable)."""
    out = []
    for axis, d in enumerate((grid.dx, grid.dy, grid.dz)):
        if grid.is_flat(axis):
            out.append(0.0)
        else:
            s = d(LOC_CCC)
            out.append(s * s if np.isscalar(s) else np.asarray(s) ** 2)
    return out


class AnisotropicMinimumDissipation(_ClosureBase):
    def __init__(self, C=1.0 / 12.0, Cb=0.0, background_nu=1e-6,
                 background_kappa=1e-7, buoyancy=None):
        self.C = float(C)
        self.Cb = float(Cb)
        self.background_nu = float(background_nu)
        self.background_kappa = float(background_kappa)
        # filled by the model when None (like SmagorinskyLilly/CATKE)
        self.buoyancy = buoyancy

    def _fp(self):
        return ("AMD", self.C, self.Cb, self.background_nu,
                self.background_kappa)

    def compute_diffusivities(self, grid, fields, time):
        u, v, w = fields["u"], fields["v"], fields["w"]
        du = _grad_ccc(grid, u, ("f", "c", "c"))
        dv = _grad_ccc(grid, v, ("c", "f", "c"))
        dw = _grad_ccc(grid, w, ("c", "c", "f"))
        grads = (du, dv, dw)  # grads[i][k] = ∂ₖ uᵢ at ccc
        d2 = _delta_sq(grid)

        denom = None
        for i in range(3):
            for k in range(3):
                t = grads[i][k] * grads[i][k]
                denom = t if denom is None else denom + t

        num = None
        for i in range(3):
            for j in range(3):
                Sij = 0.5 * (grads[i][j] + grads[j][i])
                for k in range(3):
                    if np.isscalar(d2[k]) and d2[k] == 0.0:
                        continue
                    t = d2[k] * grads[i][k] * grads[j][k] * Sij
                    num = t if num is None else num + t

        if self.Cb and self.buoyancy is not None:
            # buoyancy modification (reference: Cb_norm_wᵢ_bᵢᶜᶜᶜ,
            # anisotropic_minimum_dissipation.jl:310-323 — Abkar & Moin's
            # +Cb Σₖ Δₖ² (∂ₖw)(∂ₖb) counter-term; previously Cb was
            # accepted and fingerprinted but never applied, round-5 review)
            b = self.buoyancy.buoyancy_ccc(grid, fields)
            db = _grad_ccc(grid, b, ("c", "c", "c"))
            num_b = None
            for k in range(3):
                if np.isscalar(d2[k]) and d2[k] == 0.0:
                    continue
                t = d2[k] * dw[k] * db[k]
                num_b = t if num_b is None else num_b + t
            if num_b is not None:
                num = num - self.Cb * num_b
        nu_e = jnp.maximum(0.0, -self.C * num / (denom + EPS)) \
            + self.background_nu
        nu_e = self._fill_diffusivity(grid, nu_e, "nu_e")
        aux = {"nu_e": nu_e, "_grads": grads, "_d2": d2, "_denom_u": denom}
        return aux

    def momentum_tendencies(self, grid, fields, aux):
        u, v, w = fields["u"], fields["v"], fields["w"]
        nu = aux["nu_e"]
        nu_ffc = interp(grid, interp(grid, nu, 0, "f"), 1, "f")
        nu_fcf = interp(grid, interp(grid, nu, 0, "f"), 2, "f")
        nu_cff = interp(grid, interp(grid, nu, 1, "f"), 2, "f")
        return dict(
            u=div_2nu_strain_u(grid, u, v, w, nu, nu_ffc, nu_fcf),
            v=div_2nu_strain_v(grid, u, v, w, nu, nu_ffc, nu_cff),
            w=div_2nu_strain_w(grid, u, v, w, nu, nu_fcf, nu_cff))

    def tracer_tendency(self, grid, name, fields, aux):
        grads = aux["_grads"]
        d2 = aux["_d2"]
        dc = _grad_ccc(grid, fields[name], ("c", "c", "c"))
        denom = dc[0] ** 2 + dc[1] ** 2 + dc[2] ** 2
        num = None
        for i in range(3):
            for k in range(3):
                if np.isscalar(d2[k]) and d2[k] == 0.0:
                    continue
                t = d2[k] * grads[i][k] * dc[k] * dc[i]
                num = t if num is None else num + t
        kappa_e = jnp.maximum(0.0, -self.C * num / (denom + EPS)) \
            + self.background_kappa
        kappa_e = self._fill_diffusivity(grid, kappa_e, "kappa_e", name)
        return div_kappa_grad(grid, fields[name], LOC_CCC, kappa_e)

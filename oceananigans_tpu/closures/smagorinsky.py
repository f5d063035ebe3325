"""Smagorinsky LES closures.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
Smagorinskys/smagorinsky.jl (νₑ = (C Δ)² √(2 ΣᵢⱼΣᵢⱼ) with Δ the filter width
= V^(1/3)), lilly_coefficient.jl (buoyancy-modified coefficient:
ς² = max(0, 1 - Ri/Pr) factor under the root), and the `SmagorinskyLilly`
alias. The eddy diffusivity is κₑ = νₑ/Pr per tracer.

TPU-first: all strain components are interpolated to cell centers and the
eddy viscosity is ONE ccc array in the aux dict — XLA fuses the whole
|Σ|-evaluation into the tendency kernel."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..operators.operators import LOC_CCC, interp, ix_c, iy_c, iz_c
from .diffusion_operators import (Sxx_ccc, Sxy_ffc, Sxz_fcf, Syy_ccc,
                                  Syz_cff, Szz_ccc, div_2nu_strain_u,
                                  div_2nu_strain_v, div_2nu_strain_w,
                                  div_kappa_grad)
from .scalar_diffusivity import _ClosureBase


def _sq_interp_ccc(grid, a, from_loc):
    """Interpolate a² from its location to ccc (the reference interpolates the
    squared off-diagonal strain components)."""
    out = a * a
    for axis in range(3):
        if from_loc[axis] == "f":
            out = interp(grid, out, axis, "c")
    return out


def strain_rate_sq_ccc(grid, u, v, w):
    """2 Σᵢⱼ Σᵢⱼ at cell centers."""
    diag = (Sxx_ccc(grid, u) ** 2 + Syy_ccc(grid, v) ** 2
            + Szz_ccc(grid, w) ** 2)
    off = (_sq_interp_ccc(grid, Sxy_ffc(grid, u, v), ("f", "f", "c"))
           + _sq_interp_ccc(grid, Sxz_fcf(grid, u, w), ("f", "c", "f"))
           + _sq_interp_ccc(grid, Syz_cff(grid, v, w), ("c", "f", "f")))
    return 2 * (diag + 2 * off)


def filter_width_sq(grid):
    """Δ² = V^(2/3) (reference: Δᶠ cube-root-of-volume filter width)."""
    V = grid.V(LOC_CCC)
    if np.isscalar(V):
        return float(V) ** (2.0 / 3.0)
    return np.asarray(V) ** (2.0 / 3.0)


class Smagorinsky(_ClosureBase):
    """Constant-coefficient Smagorinsky (C=0.16 default, Lilly's value) with
    optional buoyancy modification (SmagorinskyLilly)."""

    def __init__(self, coefficient=0.16, Pr=1.0, buoyancy_modified=False,
                 buoyancy=None):
        self.C = float(coefficient)
        self.Pr = Pr
        self.buoyancy_modified = buoyancy_modified
        self.buoyancy = buoyancy

    def _fp(self):
        pr = tuple(sorted(self.Pr.items())) if isinstance(self.Pr, dict) \
            else self.Pr
        return ("Smagorinsky", self.C, pr, self.buoyancy_modified)

    def _pr_for(self, name):
        if isinstance(self.Pr, dict):
            return self.Pr.get(name, 1.0)
        return self.Pr

    def compute_diffusivities(self, grid, fields, time):
        u, v, w = fields["u"], fields["v"], fields["w"]
        S2 = strain_rate_sq_ccc(grid, u, v, w)
        if self.buoyancy_modified and self.buoyancy is not None:
            # Lilly's stability correction: ς² = max(0, 1 - N²/(Pr |Σ|²))
            from ..operators.operators import ddz, iz_c
            b = self.buoyancy.buoyancy_ccc(grid, fields)
            N2 = iz_c(grid, ddz(grid, b, ("c", "c", "f")))
            pr = self._pr_for("b") if not isinstance(self.Pr, dict) else 1.0
            zeta2 = jnp.maximum(0.0, 1.0 - N2 / (pr * jnp.maximum(S2, 1e-20)))
            S2 = S2 * zeta2
        nu_e = (self.C ** 2) * filter_width_sq(grid) * jnp.sqrt(S2)
        return {"nu_e": nu_e}

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
        kappa = aux["nu_e"] / self._pr_for(name)
        return div_kappa_grad(grid, fields[name], LOC_CCC, kappa)


def SmagorinskyLilly(coefficient=0.16, Pr=1.0, buoyancy=None):
    """Reference alias: Smagorinsky with the Lilly coefficient including the
    buoyancy correction when a buoyancy model is supplied."""
    return Smagorinsky(coefficient=coefficient, Pr=Pr,
                       buoyancy_modified=buoyancy is not None,
                       buoyancy=buoyancy)

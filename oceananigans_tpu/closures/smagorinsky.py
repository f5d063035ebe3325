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
        self.C = (coefficient if hasattr(coefficient, "_fp")
                  else float(coefficient))
        self.Pr = Pr
        self.buoyancy_modified = buoyancy_modified
        self.buoyancy = buoyancy

    def _fp(self):
        pr = tuple(sorted(self.Pr.items())) if isinstance(self.Pr, dict) \
            else self.Pr
        c = self.C._fp() if hasattr(self.C, "_fp") else self.C
        return ("Smagorinsky", c, pr, self.buoyancy_modified)

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
        if isinstance(self.C, DynamicCoefficient):
            csq = dynamic_coefficient_sq(grid, u, v, w, self.C.averaging,
                                         self.C.minimum_numerator)
        else:
            csq = self.C ** 2
        nu_e = csq * filter_width_sq(grid) * jnp.sqrt(S2)
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


# -- dynamic (Germano/Lilly) coefficient ----------------------------------------
# reference: Smagorinskys/dynamic_coefficient.jl + scale_invariant_operators.jl

class DynamicCoefficient:
    """Germano-identity dynamic Smagorinsky coefficient with directional
    averaging of the LM/MM contractions (reference: dynamic_coefficient.jl —
    `DynamicCoefficient(averaging=(1,2))`; dims here are 0-based):

        c² = max(⟨LᵢⱼMᵢⱼ⟩, min) / ⟨MᵢⱼMᵢⱼ⟩
    """

    def __init__(self, averaging=(0, 1, 2), minimum_numerator=1e-32):
        self.averaging = (tuple(averaging) if np.iterable(averaging)
                          else (int(averaging),))
        self.minimum_numerator = float(minimum_numerator)

    def _fp(self):
        return ("DynamicCoefficient", self.averaging, self.minimum_numerator)


def test_filter(grid, a):
    """7-point box test filter of scale 2Δ (reference:
    scale_invariant_operators.jl: (6a + Σ₆ neighbors)/12)."""
    from ..operators.shifts import shift
    out = 6.0 * a
    for axis in range(3):
        if grid.is_flat(axis):
            out = out + 2.0 * a
        else:
            out = out + shift(a, +1, axis) + shift(a, -1, axis)
    return out / 12.0


def _strain_components_ccc(grid, u, v, w):
    """All six strain components interpolated to ccc."""
    from ..operators.operators import ddx, ddy, ddz
    S11 = ddx(grid, u, LOC_CCC)
    S22 = ddy(grid, v, LOC_CCC)
    S33 = ddz(grid, w, LOC_CCC)
    S12 = ix_c(grid, iy_c(grid, Sxy_ffc(grid, u, v)))
    S13 = ix_c(grid, iz_c(grid, Sxz_fcf(grid, u, w)))
    S23 = iy_c(grid, iz_c(grid, Syz_cff(grid, v, w)))
    return S11, S22, S33, S12, S13, S23


def dynamic_coefficient_sq(grid, u, v, w, averaging, minimum_numerator):
    """c² = ⟨LM⟩/⟨MM⟩ padded field (reference: square_smagorinsky_coefficient
    + LM_and_MM, dynamic_coefficient.jl:129-187). ᾱ²β = 4 (test/grid filter
    scale ratio squared)."""
    fu, fv, fw = test_filter(grid, u), test_filter(grid, v), test_filter(grid, w)

    sigma = jnp.sqrt(strain_rate_sq_ccc(grid, u, v, w) / 2)
    sigma_f = jnp.sqrt(strain_rate_sq_ccc(grid, fu, fv, fw) / 2)
    S = _strain_components_ccc(grid, u, v, w)
    Sf = _strain_components_ccc(grid, fu, fv, fw)
    d2 = filter_width_sq(grid)

    # resolved-stress (Leonard) tensor at ccc
    uc, vc, wc = ix_c(grid, u), iy_c(grid, v), iz_c(grid, w)
    fuc, fvc, fwc = ix_c(grid, fu), iy_c(grid, fv), iz_c(grid, fw)
    L = [test_filter(grid, ix_c(grid, u * u)) - ix_c(grid, fu * fu),
         test_filter(grid, iy_c(grid, v * v)) - iy_c(grid, fv * fv),
         test_filter(grid, iz_c(grid, w * w)) - iz_c(grid, fw * fw),
         test_filter(grid, uc * vc) - fuc * fvc,
         test_filter(grid, uc * wc) - fuc * fwc,
         test_filter(grid, vc * wc) - fvc * fwc]
    M = [2 * d2 * (test_filter(grid, sigma * s) - 4.0 * sigma_f * sf)
         for s, sf in zip(S, Sf)]

    weights = (1, 1, 1, 2, 2, 2)
    LM = sum(wgt * l * m for wgt, l, m in zip(weights, L, M))
    MM = sum(wgt * m * m for wgt, m, _ in zip(weights, M, M))

    # directional averaging over the INTERIOR, edge-padded back
    ii = grid.interior_slices
    JLM = jnp.mean(LM[ii], axis=averaging, keepdims=True)
    JMM = jnp.mean(MM[ii], axis=averaging, keepdims=True)
    csq_int = jnp.where(JMM > 0,
                        jnp.maximum(JLM, minimum_numerator)
                        / jnp.where(JMM == 0, 1.0, JMM), 0.0)
    csq_int = jnp.broadcast_to(csq_int, LM[ii].shape)
    pads = [(h, grid.padded_shape[ax] - grid.N[ax] - h)
            for ax, h in enumerate(grid.H)]
    return jnp.pad(csq_int, pads, mode="edge")


def DynamicSmagorinsky(averaging=(0, 1, 2), Pr=1.0,
                       minimum_numerator=1e-32):
    """Reference convenience constructor (dynamic_coefficient.jl:20-28)."""
    return Smagorinsky(coefficient=DynamicCoefficient(
        averaging=averaging, minimum_numerator=minimum_numerator), Pr=Pr)

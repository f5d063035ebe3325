"""Isopycnal skew-symmetric (Gent-McWilliams + Redi) tracer diffusivity.

Reference semantics: src/TurbulenceClosures/turbulence_closure_implementations/
isopycnal_skew_symmetric_diffusivity.jl (:360 — small-slope Redi rotation
tensor + GM skew fluxes, with slope tapering via FluxTapering).

Small-slope Griffies (1998) combined flux of a tracer c with Redi diffusivity
κ_R and GM (skew) diffusivity κ_GM:

    Fx = -κ_R ∂x c - (κ_R - κ_GM) Sx ∂z c
    Fy = -κ_R ∂y c - (κ_R - κ_GM) Sy ∂z c
    Fz = -(κ_R + κ_GM)(Sx ∂x c + Sy ∂y c) - κ_R |S|² ∂z c

with isopycnal slopes Sx = -∂x b / ∂z b, Sy = -∂y b / ∂z b, and the slope
magnitude tapered to ``maximum_slope`` (the reference's FluxTapering
analogue). The tendency contribution is -∇·F.

Momentum is untouched (as in the reference)."""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.topology import LOC_CCC
from ..operators.operators import (_delta_c, _delta_f, ddx, ddy, ddz, interp,
                                   ix_c, ix_f, iy_c, iy_f, iz_c, iz_f)
from .scalar_diffusivity import _ClosureBase

LOC_FCC = ("f", "c", "c")
LOC_CFC = ("c", "f", "c")
LOC_CCF = ("c", "c", "f")


class IsopycnalSkewSymmetricDiffusivity(_ClosureBase):
    def __init__(self, kappa_redi=0.0, kappa_gm=0.0, maximum_slope=1e-2,
                 minimum_N2=1e-11, buoyancy=None):
        self.kappa_redi = float(kappa_redi)
        self.kappa_gm = float(kappa_gm)
        self.maximum_slope = float(maximum_slope)
        self.minimum_N2 = float(minimum_N2)
        self.buoyancy = buoyancy

    def _fp(self):
        return ("IsopycnalSkewSymmetric", self.kappa_redi, self.kappa_gm,
                self.maximum_slope, self.minimum_N2)

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("IsopycnalSkewSymmetricDiffusivity needs "
                             "buoyancy=…")
        b = self.buoyancy.buoyancy_ccc(grid, fields)
        # slopes at the flux locations
        bz_ccf = ddz(grid, b, LOC_CCF)
        bz_safe = jnp.maximum(bz_ccf, self.minimum_N2)   # stable-side floor
        # Sx at (f,c,c): -∂x b / ∂z b (∂z b interpolated to fcc)
        bx_fcc = ddx(grid, b, LOC_FCC)
        bz_fcc = jnp.maximum(ix_f(grid, iz_c(grid, bz_ccf)), self.minimum_N2)
        Sx_fcc = -bx_fcc / bz_fcc
        by_cfc = ddy(grid, b, LOC_CFC)
        bz_cfc = jnp.maximum(iy_f(grid, iz_c(grid, bz_ccf)), self.minimum_N2)
        Sy_cfc = -by_cfc / bz_cfc
        # slopes at (c,c,f) for the vertical flux
        Sx_ccf = -iz_f(grid, ix_c(grid, bx_fcc)) / bz_safe
        Sy_ccf = -iz_f(grid, iy_c(grid, by_cfc)) / bz_safe

        # taper: scale slopes so |S| ≤ maximum_slope (reference FluxTapering)
        def taper(Sx, Sy):
            S = jnp.sqrt(Sx * Sx + Sy * Sy)
            fac = jnp.minimum(1.0, self.maximum_slope
                              / jnp.maximum(S, 1e-30))
            return Sx * fac, Sy * fac

        Sx_fcc, _ = taper(Sx_fcc, jnp.zeros_like(Sx_fcc))
        Sy_cfc, _ = taper(Sy_cfc, jnp.zeros_like(Sy_cfc))
        Sx_ccf, Sy_ccf = taper(Sx_ccf, Sy_ccf)
        return {"Sx_fcc": Sx_fcc, "Sy_cfc": Sy_cfc,
                "Sx_ccf": Sx_ccf, "Sy_ccf": Sy_ccf}

    def momentum_tendencies(self, grid, fields, aux):
        z = jnp.zeros_like(fields["u"])
        return dict(u=z, v=z, w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        if name == "e":
            return jnp.zeros_like(fields[name])
        c = fields[name]
        kR, kG = self.kappa_redi, self.kappa_gm
        cx = ddx(grid, c, LOC_FCC)
        cy = ddy(grid, c, LOC_CFC)
        cz_ccf = ddz(grid, c, LOC_CCF)

        Fx = -kR * cx - (kR - kG) * aux["Sx_fcc"] \
            * ix_f(grid, iz_c(grid, cz_ccf))
        Fy = -kR * cy - (kR - kG) * aux["Sy_cfc"] \
            * iy_f(grid, iz_c(grid, cz_ccf))
        Sx, Sy = aux["Sx_ccf"], aux["Sy_ccf"]
        S2 = Sx * Sx + Sy * Sy
        Fz = -(kR + kG) * (Sx * iz_f(grid, ix_c(grid, cx))
                           + Sy * iz_f(grid, iy_c(grid, cy))) \
            - kR * S2 * cz_ccf

        div = (_delta_c(grid, grid.Ax(LOC_FCC) * Fx, 0)
               + _delta_c(grid, grid.Ay(LOC_CFC) * Fy, 1)
               + _delta_c(grid, grid.Az(LOC_CCF) * Fz, 2)) / grid.V(LOC_CCC)
        return -div

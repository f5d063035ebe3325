"""Simple vertical diffusivity closures: ConvectiveAdjustment and Ri-based.

Reference semantics:
* `ConvectiveAdjustmentVerticalDiffusivity` (turbulence_closure_implementations/
  convective_adjustment_vertical_diffusivity.jl): large κ/ν where the water
  column is statically unstable (N² < 0), background values elsewhere.
* `RiBasedVerticalDiffusivity` (ri_based_vertical_diffusivity.jl): diffusivity
  as a smooth decreasing function of the local Richardson number
  Ri = N²/(∂z u)², with a convective-adjustment boost for Ri < 0.

Both produce a (c,c,f)-located κ field consumed by the vertically-implicit
tridiagonal solve; they require a buoyancy model to evaluate N²."""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.topology import LOC_CCC
from ..operators.operators import ddz, interp, ix_c, iy_c, iz_f
from .diffusion_operators import div_kappa_grad
from .scalar_diffusivity import _ClosureBase


def _N2_ccf(grid, buoyancy, fields):
    b = buoyancy.buoyancy_ccc(grid, fields)
    return ddz(grid, b, ("c", "c", "f"))


def _shear2_ccf(grid, fields):
    """(∂z u)² + (∂z v)² at (c,c,f)."""
    du = ddz(grid, fields["u"], ("f", "c", "f"))
    dv = ddz(grid, fields["v"], ("c", "f", "f"))
    return ix_c(grid, du * du) + iy_c(grid, dv * dv)


class ConvectiveAdjustmentVerticalDiffusivity(_ClosureBase):
    implicit_only_z = True  # assumes Flux z BCs (validate_implicit_closure_z_bcs)

    def __init__(self, convective_kappa_z=1.0, convective_nu_z=None,
                 background_kappa_z=0.0, background_nu_z=0.0, buoyancy=None):
        self.convective_kappa_z = float(convective_kappa_z)
        self.convective_nu_z = float(convective_nu_z
                                     if convective_nu_z is not None
                                     else convective_kappa_z)
        self.background_kappa_z = float(background_kappa_z)
        self.background_nu_z = float(background_nu_z)
        self.buoyancy = buoyancy

    def _fp(self):
        return ("ConvectiveAdjustment", self.convective_kappa_z,
                self.convective_nu_z, self.background_kappa_z,
                self.background_nu_z)

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("ConvectiveAdjustmentVerticalDiffusivity needs "
                             "buoyancy=<buoyancy model>")
        N2 = _N2_ccf(grid, self.buoyancy, fields)
        unstable = N2 < 0
        kz = jnp.where(unstable, self.convective_kappa_z,
                       self.background_kappa_z)
        nz = jnp.where(unstable, self.convective_nu_z, self.background_nu_z)
        return {"kappa_z_ccf": kz, "nu_z_ccf": nz}

    def momentum_tendencies(self, grid, fields, aux):
        # handled implicitly
        z = jnp.zeros_like(fields["u"])
        return dict(u=z, v=z, w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        return jnp.zeros_like(fields[name])

    def vertical_implicit_kappas(self, grid, fields, aux):
        out = {"u": aux["nu_z_ccf"], "v": aux["nu_z_ccf"]}
        for name in fields:
            if name not in ("u", "v", "w", "eta"):
                out[name] = aux["kappa_z_ccf"]
        return out


class RiBasedVerticalDiffusivity(_ClosureBase):
    """κ = κ₀ · step(Ri) + κᶜᵃ·(N²<0), with the smooth step
    (1 - tanh((Ri - Ri₀)/δ))/2 (reference: ri_based_vertical_diffusivity.jl
    default parameters)."""

    implicit_only_z = True  # assumes Flux z BCs (validate_implicit_closure_z_bcs)

    def __init__(self, nu_0=0.7, kappa_0=0.5, Ri_0=0.1, Ri_delta=0.4,
                 convective_kappa=2.8, Cen=0.1,
                 minimum_entrainment=1e-10,
                 surface_buoyancy_flux=None, buoyancy=None):
        self.nu_0 = float(nu_0)
        self.kappa_0 = float(kappa_0)
        self.Ri_0 = float(Ri_0)
        self.Ri_delta = float(Ri_delta)
        self.convective_kappa = float(convective_kappa)
        # penetrative entrainment κᵉⁿ = Cᵉⁿ·Jᵇ/N² where (N² > N²ᵉⁿ) below
        # a convecting cell under destabilizing surface flux (reference:
        # ri_based_vertical_diffusivity.jl Cᵉⁿ = 0.1,
        # minimum_entrainment_buoyancy_gradient = 1e-10; the kwarg was
        # previously accepted and DROPPED — round-5 review finding)
        self.Cen = float(Cen)
        self.minimum_entrainment = float(minimum_entrainment)
        self.surface_buoyancy_flux = surface_buoyancy_flux
        self.buoyancy = buoyancy

    def _fp(self):
        return ("RiBased", self.nu_0, self.kappa_0, self.Ri_0,
                self.Ri_delta, self.convective_kappa, self.Cen,
                self.minimum_entrainment,
                id(self.surface_buoyancy_flux)
                if callable(self.surface_buoyancy_flux)
                else self.surface_buoyancy_flux)

    def _step(self, Ri):
        return 0.5 * (1 - jnp.tanh((Ri - self.Ri_0) / self.Ri_delta))

    # CATKE's surface-flux evaluation handles scalars, (x, y, t) callables,
    # field-dependent conditions and curvilinear nodes alike
    from .catke import CATKEVerticalDiffusivity as _CK
    _Jb = _CK._Jb
    del _CK

    def compute_diffusivities(self, grid, fields, time):
        if self.buoyancy is None:
            raise ValueError("RiBasedVerticalDiffusivity needs buoyancy")
        N2 = _N2_ccf(grid, self.buoyancy, fields)
        S2 = _shear2_ccf(grid, fields)
        Ri = N2 / jnp.maximum(S2, 1e-16)
        conv = jnp.where(N2 < 0, self.convective_kappa, 0.0)
        kz = self.kappa_0 * self._step(Ri) + conv
        if self.Cen and self.surface_buoyancy_flux is not None:
            Jb = self._Jb(grid, time, fields)
            # N² at the face ABOVE (shift by -1 along z brings k+1 down)
            N2_above = jnp.roll(N2, -1, axis=2)
            entraining = ((N2 > self.minimum_entrainment)
                          & (N2_above < 0))
            k_en = jnp.where(entraining & (jnp.asarray(Jb) > 0),
                             self.Cen * Jb / jnp.maximum(N2, 1e-30), 0.0)
            kz = kz + k_en
        nz = self.nu_0 * self._step(Ri)
        return {"kappa_z_ccf": kz, "nu_z_ccf": nz}

    momentum_tendencies = ConvectiveAdjustmentVerticalDiffusivity.momentum_tendencies
    tracer_tendency = ConvectiveAdjustmentVerticalDiffusivity.tracer_tendency
    vertical_implicit_kappas = \
        ConvectiveAdjustmentVerticalDiffusivity.vertical_implicit_kappas


class TwoDimensionalLeith(_ClosureBase):
    """Leith enstrophy-based horizontal eddy viscosity:
    νₑ = (C Δ)³ |∇ζ| (reference: leith_enstrophy_diffusivity.jl)."""

    def __init__(self, C=0.3, C_redi=1.0):
        self.C = float(C)
        self.C_redi = float(C_redi)

    def _fp(self):
        return ("Leith2D", self.C, self.C_redi)

    def compute_diffusivities(self, grid, fields, time):
        from ..operators.operators import zeta3_ffc, ddx, ddy, ix_c, iy_c
        zeta = zeta3_ffc(grid, fields["u"], fields["v"])
        dzx = ddx(grid, zeta, ("c", "f", "c"))
        dzy = ddy(grid, zeta, ("f", "c", "c"))
        # ∂xζ is at (c,f,c) → one iy_c reaches ccc; ∂yζ at (f,c,c) → one
        # ix_c (the old double interpolation displaced each term half a
        # cell off-center — round-5 review finding)
        grad2 = iy_c(grid, dzx * dzx) + ix_c(grid, dzy * dzy)
        import numpy as np
        dx = grid.dx(LOC_CCC)
        dy = grid.dy(LOC_CCC)
        delta2 = dx * dy if np.isscalar(dx) else np.asarray(dx) * np.asarray(dy)
        nu = (self.C ** 3) * delta2 ** 1.5 * jnp.sqrt(grad2)
        return {"nu_e": nu}

    def momentum_tendencies(self, grid, fields, aux):
        nu = aux["nu_e"]
        return dict(
            u=div_kappa_grad(grid, fields["u"], ("f", "c", "c"), nu, (0, 1)),
            v=div_kappa_grad(grid, fields["v"], ("c", "f", "c"), nu, (0, 1)),
            w=jnp.zeros_like(fields["w"]))

    def tracer_tendency(self, grid, name, fields, aux):
        return div_kappa_grad(grid, fields[name], LOC_CCC,
                              self.C_redi * aux["nu_e"], (0, 1))

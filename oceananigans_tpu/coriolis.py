"""Coriolis forces.

Reference semantics: src/Coriolis/ — `FPlane` (fplane.jl), `BetaPlane`
(beta_plane.jl), `ConstantCartesianCoriolis` (constant_cartesian_coriolis.jl),
`NonTraditionalBetaPlane` (non_traditional_beta_plane.jl). The interface is
the tendency contributions x_f_cross_U / y_f_cross_U / z_f_cross_U at the
(f,c,c)/(c,f,c)/(c,c,f) locations, built from 4-point interpolations of the
staggered transverse velocities (energy-conserving discretization).

Each object is static config; methods take (grid, u, v, w) padded arrays and
return the MINUS-f×U contribution is NOT applied here — these return the
components of f×U, which the tendency assembly subtracts."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .defaults import defaults
from .operators.operators import (ix_c, ix_f, iy_c, iy_f, iz_c, iz_f)


def _bake(grid, m):
    """Route metric-like constant arrays through the grid's ``bake_metric``
    hook when present (the Pallas kernel metric proxy,
    kernels/fused_vector_invariant.py) so they become kernel inputs instead
    of captured constants."""
    bake = getattr(grid, "bake_metric", None)
    if bake is not None and not np.isscalar(m):
        return bake(m)
    return m


def _v_at_fcc(grid, v):
    # (c,f,c) → (f,c,c): interp x to face, y to center
    return ix_f(grid, iy_c(grid, v))


def _u_at_cfc(grid, u):
    return iy_f(grid, ix_c(grid, u))


def _w_at_fcc(grid, w):
    return ix_f(grid, iz_c(grid, w))


def _u_at_ccf(grid, u):
    return iz_f(grid, ix_c(grid, u))


def _w_at_cfc(grid, w):
    return iy_f(grid, iz_c(grid, w))


def _v_at_ccf(grid, v):
    return iz_f(grid, iy_c(grid, v))


class FPlane:
    """f-plane: f×U = (-f v, f u, 0) (reference: src/Coriolis/fplane.jl)."""

    def __init__(self, f=None, rotation_rate=None, latitude=None):
        if f is None:
            rr = defaults.rotation_rate if rotation_rate is None else rotation_rate
            if latitude is None:
                raise ValueError("provide f or latitude")
            f = 2 * rr * np.sin(np.deg2rad(latitude))
        self.f = float(f)

    def _fp(self):
        return ("FPlane", self.f)

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()

    def x_f_cross_U(self, grid, u, v, w):
        return -self.f * _v_at_fcc(grid, v)

    def y_f_cross_U(self, grid, u, v, w):
        return self.f * _u_at_cfc(grid, u)

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)


class ConstantCartesianCoriolis:
    """Rotation axis in an arbitrary direction: f×U with
    f = (fx, fy, fz) (reference: constant_cartesian_coriolis.jl)."""

    def __init__(self, fx=0.0, fy=0.0, fz=0.0, f=None, rotation_axis=None):
        if f is not None:
            ax = np.asarray(rotation_axis if rotation_axis is not None
                            else (0, 0, 1.0), float)
            ax = ax / np.linalg.norm(ax)
            fx, fy, fz = f * ax
        self.fx, self.fy, self.fz = float(fx), float(fy), float(fz)

    def _fp(self):
        return ("ConstantCartesianCoriolis", self.fx, self.fy, self.fz)

    __hash__ = FPlane.__hash__
    __eq__ = FPlane.__eq__

    def x_f_cross_U(self, grid, u, v, w):
        return self.fy * _w_at_fcc(grid, w) - self.fz * _v_at_fcc(grid, v)

    def y_f_cross_U(self, grid, u, v, w):
        return self.fz * _u_at_cfc(grid, u) - self.fx * _w_at_cfc(grid, w)

    def z_f_cross_U(self, grid, u, v, w):
        return self.fx * _v_at_ccf(grid, v) - self.fy * _u_at_ccf(grid, u)


class BetaPlane:
    """f = f₀ + βy (reference: beta_plane.jl)."""

    def __init__(self, f0=None, beta=None, rotation_rate=None, latitude=None,
                 radius=None):
        if f0 is None or beta is None:
            rr = defaults.rotation_rate if rotation_rate is None else rotation_rate
            R = defaults.planet_radius if radius is None else radius
            phi = np.deg2rad(latitude)
            f0 = 2 * rr * np.sin(phi)
            beta = 2 * rr * np.cos(phi) / R
        self.f0, self.beta = float(f0), float(beta)

    def _fp(self):
        return ("BetaPlane", self.f0, self.beta)

    __hash__ = FPlane.__hash__
    __eq__ = FPlane.__eq__

    def _f_at(self, grid, yloc):
        y = grid.coord_padded(1, yloc).reshape(1, -1, 1)
        return _bake(grid, self.f0 + self.beta * y)

    def x_f_cross_U(self, grid, u, v, w):
        return -self._f_at(grid, "c") * _v_at_fcc(grid, v)

    def y_f_cross_U(self, grid, u, v, w):
        return self._f_at(grid, "f") * _u_at_cfc(grid, u)

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)


class NonTraditionalBetaPlane:
    """Full-Coriolis beta plane retaining the horizontal rotation components
    (reference: non_traditional_beta_plane.jl): with
    fz = f₀ + β y - f₀ z γ-terms; here the standard form
    fz(y) = f₀ + βy, fy(z) = 2Ωcosφ₀ - γ... simplified to the reference's
    (fx=0, fy = 2Ω cosφ₀ (1 - z/R…)) leading-order form:
    f×U with fy = F₀ + γ·z-dependence omitted at leading order."""

    def __init__(self, fz0=None, beta=None, fy0=None, gamma=None,
                 rotation_rate=None, latitude=None, radius=None):
        rr = defaults.rotation_rate if rotation_rate is None else rotation_rate
        R = defaults.planet_radius if radius is None else radius
        if latitude is not None:
            phi = np.deg2rad(latitude)
            fz0 = 2 * rr * np.sin(phi) if fz0 is None else fz0
            beta = 2 * rr * np.cos(phi) / R if beta is None else beta
            fy0 = 2 * rr * np.cos(phi) if fy0 is None else fy0
            gamma = -4 * rr * np.sin(phi) / R if gamma is None else gamma
        self.fz0, self.beta = float(fz0), float(beta)
        self.fy0, self.gamma = float(fy0), float(gamma or 0.0)

    def _fp(self):
        return ("NonTraditionalBetaPlane", self.fz0, self.beta, self.fy0,
                self.gamma)

    __hash__ = FPlane.__hash__
    __eq__ = FPlane.__eq__

    def _fz(self, grid, yloc, zloc):
        y = grid.coord_padded(1, yloc).reshape(1, -1, 1)
        z = grid.coord_padded(2, zloc).reshape(1, 1, -1)
        return _bake(grid, self.fz0 + self.beta * y + self.gamma * z / 2 * 0)  # leading order

    def _fy(self, grid, zloc):
        z = grid.coord_padded(2, zloc).reshape(1, 1, -1)
        return _bake(grid, self.fy0 + self.gamma * z)

    def x_f_cross_U(self, grid, u, v, w):
        return (self._fy(grid, "c") * _w_at_fcc(grid, w)
                - self._fz(grid, "c", "c") * _v_at_fcc(grid, v))

    def y_f_cross_U(self, grid, u, v, w):
        return self._fz(grid, "f", "c") * _u_at_cfc(grid, u)

    def z_f_cross_U(self, grid, u, v, w):
        return -self._fy(grid, "f") * _u_at_ccf(grid, u)


class HydrostaticSphericalCoriolis:
    """f = 2Ω sin(φ) on a spherical grid (reference:
    src/Coriolis/hydrostatic_spherical_coriolis.jl).

    On a LatitudeLongitudeGrid (1D latitude) the transverse velocity is the
    plain 4-point mean. On curvilinear 2D-latitude grids
    (OrthogonalSphericalShellGrid: cubed-sphere panels, tripolar) f is
    evaluated at the exact (f,f) nodes and the reference's
    ENERGY-CONSERVING discretization applies: the Coriolis acceleration is
    the f-flux of the metric-weighted transport,
    fᶠᶠ·ℑx(Δx_cfc v) averaged to fcc / Δx_fcc (the f-part of the Sadourny
    vorticity flux — hydrostatic_spherical_coriolis.jl
    EnergyConserving scheme)."""

    def __init__(self, rotation_rate=None, scheme="energy_conserving"):
        self.rotation_rate = (defaults.rotation_rate if rotation_rate is None
                              else float(rotation_rate))
        if scheme not in ("energy_conserving", "enstrophy_conserving"):
            raise ValueError(scheme)
        self.scheme = scheme

    def _fp(self):
        return ("HydrostaticSphericalCoriolis", self.rotation_rate,
                self.scheme)

    __hash__ = FPlane.__hash__
    __eq__ = FPlane.__eq__

    def _f(self, grid, yloc):
        phi = grid.coord_padded(1, yloc).reshape(1, -1, 1)
        return _bake(grid, 2 * self.rotation_rate * np.sin(np.deg2rad(
            np.clip(phi, -90, 90))))

    def _f_ffc(self, grid):
        _, phi = grid.nodes2d_padded(("f", "f"))
        return _bake(grid, 2 * self.rotation_rate
                     * np.sin(np.deg2rad(phi))[..., None])

    @staticmethod
    def _curvilinear(grid):
        return hasattr(grid, "nodes2d_padded")

    def x_f_cross_U(self, grid, u, v, w):
        if self._curvilinear(grid):
            from .grids.topology import LOC_CFC, LOC_FCC
            f = self._f_ffc(grid)
            dx_cfc, dx_fcc = grid.dx(LOC_CFC), grid.dx(LOC_FCC)
            if self.scheme == "energy_conserving":
                return -iy_c(grid, f * ix_f(grid, dx_cfc * v)) / dx_fcc
            return -iy_c(grid, f) * ix_f(grid, iy_c(grid, dx_cfc * v)) \
                / dx_fcc
        return -self._f(grid, "c") * _v_at_fcc(grid, v)

    def y_f_cross_U(self, grid, u, v, w):
        if self._curvilinear(grid):
            from .grids.topology import LOC_CFC, LOC_FCC
            f = self._f_ffc(grid)
            dy_fcc, dy_cfc = grid.dy(LOC_FCC), grid.dy(LOC_CFC)
            if self.scheme == "energy_conserving":
                return ix_c(grid, f * iy_f(grid, dy_fcc * u)) / dy_cfc
            return ix_c(grid, f) * iy_f(grid, ix_c(grid, dy_fcc * u)) \
                / dy_cfc
        return self._f(grid, "f") * _u_at_cfc(grid, u)

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)

"""TripolarGrid: global ocean grid with two northern coordinate poles over
land and a zipper fold along the northern edge.

Reference semantics: src/OrthogonalSphericalShellGrids/tripolar_grid.jl
(:11-79) + generate_tripolar_coordinates.jl — Murray (1996) cofocal
ellipse/hyperbola construction: with focal distance a = tand((90-φₚ)/2), the
stereographic-plane points

    ψ = asinh( tand((90-φ)/2) / a ),
    x = a sind(λ) cosh ψ,  y = a cosd(λ) sinh ψ,

map back to (λ', φ') = (-atand(y/x) ± 90 + λ₀, 90 - (360/π) atan√(x²+y²)),
placing two coordinate poles at latitude φₚ on longitudes λ₀ and λ₀+180. The
mapping is asymptotically the identity away from the poles, so the southern
portion matches a standard lat-lon grid.

The north edge carries Zipper boundary conditions (fill_halos), the x
direction is periodic."""

from __future__ import annotations

import numpy as np

from .orthogonal_spherical_shell import OrthogonalSphericalShellGrid
from . import topology as topo

DEG = np.pi / 180.0


def _tripolar_lambda_phi(lam1d, phi1d, first_pole_longitude, focal_a, Nlam):
    lam, phi = np.meshgrid(lam1d, phi1d, indexing="ij")
    psi = np.arcsinh(np.tan((90 - phi) * DEG / 2) / focal_a)
    x = focal_a * np.sin(lam * DEG) * np.cosh(psi)
    y = focal_a * np.cos(lam * DEG) * np.sinh(psi)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam2 = -np.degrees(np.arctan(y / x))
    # at the exact pole the longitude is arbitrary; keep continuity
    pole = (x == 0) & (y == 0)
    iidx = np.arange(lam.shape[0])[:, None] * np.ones_like(lam2)
    lam2 = np.where(pole, np.where(iidx == 0, -90.0, 90.0), lam2)
    # hemisphere branch of the arctan: columns with λ < 0 (x < 0) take the
    # -90 offset; the EXACT λ = 0 column (x = +0.0 → arctan = +90) belongs
    # to the +90 branch — `<=` placed it on the antipodal meridian and
    # corrupted the metrics of the two adjacent columns (round-5 review
    # finding, verified: dx jumped to near-half-sphere distances there)
    lam2 += np.where(np.arange(lam.shape[0])[:, None] < Nlam // 2, -90.0,
                     90.0)
    lam2 += first_pole_longitude + 90.0
    lam2 = np.mod(lam2, 360.0)
    phi2 = 90 - np.degrees(2 * np.arctan(np.sqrt(x ** 2 + y ** 2)))
    return lam2, phi2


class TripolarGrid(OrthogonalSphericalShellGrid):
    zipper_north = True

    def __init__(self, size, southernmost_latitude=-80.0,
                 north_poles_latitude=55.0, first_pole_longitude=70.0,
                 z=None, radius=None, halo=None):
        Nx, Ny = size[0], size[1]
        a = np.tan((90 - north_poles_latitude) * DEG / 2)
        lamF = np.linspace(-180.0, 180.0, Nx + 1)
        phiF = np.linspace(southernmost_latitude, 90.0, Ny + 1)
        lam2, phi2 = _tripolar_lambda_phi(lamF, phiF, first_pole_longitude,
                                          a, Nx)
        super().__init__(lam2, phi2, z=z, size=size, radius=radius,
                         topology=(topo.PERIODIC, topo.BOUNDED,
                                   topo.BOUNDED if z is not None
                                   else topo.FLAT),
                         halo=halo)
        self.north_poles_latitude = float(north_poles_latitude)
        self.first_pole_longitude = float(first_pole_longitude)
        self.southernmost_latitude = float(southernmost_latitude)

    def with_halo(self, halo):
        """Re-halo preserving the TripolarGrid subclass — the base
        implementation rebuilds a plain OrthogonalSphericalShellGrid, which
        silently drops ``zipper_north`` and with it the whole north-fold
        boundary condition (round-5 review finding: any model whose halo
        inflation re-haloed a default-halo tripolar grid lost the zipper)."""
        if tuple(halo) == self.H:
            return self
        zspec = None
        if not self.is_flat(2):
            c = self._zc
            zspec = ((c.origin, c.origin + c.extent) if c.regular
                     else c.xF[self.H[2]:self.H[2] + self.N[2] + 1].copy())
        return TripolarGrid(
            size=self.N if zspec is not None else self.N[:2],
            southernmost_latitude=self.southernmost_latitude,
            north_poles_latitude=self.north_poles_latitude,
            first_pole_longitude=self.first_pole_longitude,
            z=zspec, radius=self.radius, halo=halo)

    def _fingerprint(self):
        return ("TripolarGrid",) + super()._fingerprint()[1:]

    def __repr__(self):
        return (f"TripolarGrid(size={self.N}, poles at "
                f"{self.north_poles_latitude}N)")

"""Multi-dimensional (2D horizontal) WENO reconstruction.

Reference semantics: src/Advection/multi_dimensional_reconstruction.jl — a
5th-order CENTERED WENO point-value filter applied in the direction
TANGENTIAL to a 1D interpolation (used by
`VectorInvariant(multi_dimensional_stencil=true)` for vorticity/divergence/
kinetic-energy reconstructions). The three 3-point stencils are combined
with the split positive/negative centered weights of the reference
(:16-48 constants; σ± splitting avoids the negative centered optimal
weights)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..operators.shifts import shift

_SQ15 = np.sqrt(15.0)
EPS = 1e-8

# optimal weights for the three 3-point stencils, for evaluation points
# ξ = -√15/10 (1), center-split (2±), +√15/10 (3)
# (multi_dimensional_reconstruction.jl:16-33)
G1 = ((1008 + 71 * _SQ15) / 5240, 408 / 655, (1008 - 71 * _SQ15) / 5240)
G3 = ((1008 - 71 * _SQ15) / 5240, 408 / 655, (1008 + 71 * _SQ15) / 5240)
SIG_P = 214.0 / 80.0
SIG_M = 67.0 / 40.0
G2P = (9 / 80 / SIG_P, 49 / 20 / SIG_P, 9 / 80 / SIG_P)
G2M = (9 / 40 / SIG_M, 49 / 40 / SIG_M, 9 / 40 / SIG_M)

# per-stencil reconstruction coefficients (:35-48)
A1 = (((2 - 3 * _SQ15) / 60, (-4 + 12 * _SQ15) / 60, (62 - 9 * _SQ15) / 60),
      ((2 + 3 * _SQ15) / 60, 56 / 60, (2 - 3 * _SQ15) / 60),
      ((62 + 9 * _SQ15) / 60, (-4 - 12 * _SQ15) / 60, (2 + 3 * _SQ15) / 60))
A2 = ((-1 / 24, 2 / 24, 23 / 24),
      (-1 / 24, 26 / 24, -1 / 24),
      (23 / 24, 2 / 24, -1 / 24))
A3 = (((2 + 3 * _SQ15) / 60, (-4 - 12 * _SQ15) / 60, (62 + 9 * _SQ15) / 60),
      ((2 - 3 * _SQ15) / 60, 56 / 60, (2 + 3 * _SQ15) / 60),
      ((62 - 9 * _SQ15) / 60, (-4 + 12 * _SQ15) / 60, (2 - 3 * _SQ15) / 60))


def _beta(kind, p0, p1, p2):
    d2 = p0 - 2 * p1 + p2
    if kind == "left":
        d1 = p0 - 4 * p1 + 3 * p2
    elif kind == "center":
        d1 = p0 - p2
    else:
        d1 = 3 * p0 - 4 * p1 + p2
    return (13.0 / 12.0) * d2 * d2 + 0.25 * d1 * d1


def _weights(b0, b1, b2, g):
    a0 = g[0] / (b0 + EPS) ** 2
    a1 = g[1] / (b1 + EPS) ** 2
    a2 = g[2] / (b2 + EPS) ** 2
    s = a0 + a1 + a2
    return a0 / s, a1 / s, a2 / s


def centered_weno5_filter(a, axis):
    """Apply the reference's 5th-order centered WENO point filter along
    ``axis`` (fifth_order_weno_reconstruction, :68-101)."""
    Qm2, Qm1 = shift(a, -2, axis), shift(a, -1, axis)
    Qp1, Qp2 = shift(a, +1, axis), shift(a, +2, axis)
    S = ((Qm2, Qm1, a), (Qm1, a, Qp1), (a, Qp1, Qp2))

    def recon(A, s):
        return A[s][0] * S[s][0] + A[s][1] * S[s][1] + A[s][2] * S[s][2]

    b0 = _beta("left", *S[0])
    b1 = _beta("center", *S[1])
    b2 = _beta("right", *S[2])

    w1 = _weights(b0, b1, b2, G1)
    w3 = _weights(b0, b1, b2, G3)
    w2p = _weights(b0, b1, b2, G2P)
    w2m = _weights(b0, b1, b2, G2M)

    q1 = sum(w1[s] * recon(A1, s) for s in range(3))
    q3 = sum(w3[s] * recon(A3, s) for s in range(3))
    q2p = sum(w2p[s] * recon(A2, s) for s in range(3))
    q2m = sum(w2m[s] * recon(A2, s) for s in range(3))
    q2 = SIG_P * q2p - SIG_M * q2m

    return q1 / 6 + 2 * q2 / 3 + q3 / 6

"""Free surface treatments for the HydrostaticFreeSurfaceModel.

Reference semantics: src/Models/HydrostaticFreeSurfaceModels/ —
* `ExplicitFreeSurface` (explicit_free_surface.jl): ∂t η = -∇·U with the
  barotropic pressure gradient -g∇η in the momentum tendencies (gravity-wave
  CFL limited).
* `ImplicitFreeSurface` (implicit_free_surface.jl:35-110 with the
  :FastFourierTransform solver, fft_based_implicit_free_surface_solver.jl):
  backward-Euler step of the barotropic mode — solve
  (1 - g H Δt² ∇²) ηⁿ⁺¹ = ηⁿ - Δt ∇·∫u* dz on a regular grid by FFT/DCT
  eigenvalue division, then correct u ← u* - Δt g ∇ηⁿ⁺¹.
* `SplitExplicitFreeSurface` (SplitExplicitFreeSurfaces/): barotropic
  substepping — forward-backward substeps of (η, U, V) with Δτ spanning
  (t, t+2Δt), Shchepetkin averaging-shape weights
  (split_explicit_free_surface.jl:227-231, weights_from_substeps :268), slow
  forcing Gᵁ = ∫ G_u dz, and the barotropic corrector replacing the depth
  mean of u with the filtered Ū (barotropic_split_explicit_corrector.jl).

TPU-first: the substep loop is a `lax.scan` over a stacked weights array —
two tiny fused 2D kernels per substep with no host round trips (the
reference hand-unrolls and pre-converts kernel arguments for the same reason,
step_split_explicit_free_surface.jl:65-107)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..defaults import defaults
from ..grids.topology import LOC_CCC, LOC_CFC, LOC_FCC
from ..operators.operators import (ddx, ddy, dx_c, dx_f, dy_c, dy_f, ix_f,
                                   iy_f)

# substep counts above this unroll limit run as a chunked lax.scan (one
# halo fill per K-substep chunk); below it the loop fully unrolls — the
# measured-faster form at production counts
_UNROLL_LIMIT = 64


def averaging_shape_function(tau, p=2, q=4, r=0.18927):
    """Shchepetkin & McWilliams (2005) minimal-dispersion averaging kernel
    (reference: split_explicit_free_surface.jl:227-231)."""
    tau0 = (p + 2) * (p + q + 2) / (p + 1) / (p + q + 1)
    return (tau / tau0) ** p * (1 - (tau / tau0) ** q) - r * (tau / tau0)


def weights_from_substeps(substeps, kernel=averaging_shape_function):
    """Fractional substep size and normalized averaging weights (reference:
    weights_from_substeps, split_explicit_free_surface.jl:268-280)."""
    tau_f = np.linspace(0.0, 2.0, substeps + 1)
    dtau = tau_f[1] - tau_f[0]
    w = np.array([kernel(t) for t in tau_f[1:]])
    # truncate where the kernel goes non-positive at the tail
    idx = len(w)
    while idx > 1 and w[idx - 1] <= 0:
        idx -= 1
    w = w[:idx]
    w = w / w.sum()
    return float(dtau), w


class ExplicitFreeSurface:
    def __init__(self, gravitational_acceleration=None):
        self.g = (defaults.gravitational_acceleration
                  if gravitational_acceleration is None
                  else float(gravitational_acceleration))

    def _fp(self):
        return ("ExplicitFreeSurface", self.g)

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()


class ImplicitFreeSurface:
    def __init__(self, gravitational_acceleration=None,
                 solver_method="Default"):
        self.g = (defaults.gravitational_acceleration
                  if gravitational_acceleration is None
                  else float(gravitational_acceleration))
        self.solver_method = solver_method

    def _fp(self):
        return ("ImplicitFreeSurface", self.g, self.solver_method)

    __hash__ = ExplicitFreeSurface.__hash__
    __eq__ = ExplicitFreeSurface.__eq__


# since weights can be negative in the first few substeps (as in the default
# averaging kernel), the reference sets a minimum number of substeps
# (step_split_explicit_free_surface.jl:57)
MINIMUM_SUBSTEPS = 5


class FixedSubstepNumber:
    """Substepping with a fixed substep count (reference:
    split_explicit_timesteppers.jl / split_explicit_free_surface.jl:253)."""

    def __init__(self, substeps, averaging_kernel=averaging_shape_function):
        self.substeps = int(substeps)
        self.fractional_step, self.weights = weights_from_substeps(
            self.substeps, averaging_kernel)

    def settings(self, dt):
        return self.fractional_step, self.weights

    def _fp(self):
        return ("FixedSubstepNumber", self.substeps)


class FixedTimeStepSize:
    """Substepping with a fixed barotropic Δτ derived from a gravity-wave CFL
    (reference: split_explicit_free_surface.jl:238-265): Δτ = cfl·Δs/√(g·Lz)
    with Δs the harmonic-mean minimum horizontal spacing. The substep count
    is then ceil(2Δt/Δτ) per baroclinic step (calculate_substeps,
    step_split_explicit_free_surface.jl:60-64) — computed on HOST each
    `time_step` (a new substep count recompiles the jitted step; Δt rarely
    changes in practice)."""

    def __init__(self, cfl, averaging_kernel=averaging_shape_function):
        self.cfl = float(cfl)
        self.averaging_kernel = averaging_kernel
        self.dt_barotropic = None  # set by materialize(grid, g)

    def materialize(self, grid, g):
        dx2 = 0.0 if grid.is_flat(0) else 1.0 / grid.minimum_spacing(0) ** 2
        dy2 = 0.0 if grid.is_flat(1) else 1.0 / grid.minimum_spacing(1) ** 2
        ds = np.sqrt(1.0 / (dx2 + dy2))
        wave_speed = np.sqrt(g * abs(grid.extent[2]))
        self.dt_barotropic = float(self.cfl * ds / wave_speed)

    def settings(self, dt):
        if self.dt_barotropic is None:
            raise RuntimeError("FixedTimeStepSize.materialize(grid, g) must "
                               "run before stepping (the model constructor "
                               "does this)")
        n = max(MINIMUM_SUBSTEPS, int(np.ceil(2.0 * float(dt)
                                              / self.dt_barotropic)))
        return weights_from_substeps(n, self.averaging_kernel)

    def _fp(self):
        return ("FixedTimeStepSize", self.cfl)


class SplitExplicitFreeSurface:
    """Reference: split_explicit_free_surface.jl:85-130 — `substeps=N` picks
    FixedSubstepNumber; `cfl=` picks FixedTimeStepSize (the reference's
    default pathway for choosing substep counts); `cfl=` + `fixed_dt=`
    converts to a fixed substep count at construction."""

    def __init__(self, gravitational_acceleration=None, substeps=None,
                 cfl=None, fixed_dt=None, grid=None,
                 averaging_kernel=averaging_shape_function):
        self.g = (defaults.gravitational_acceleration
                  if gravitational_acceleration is None
                  else float(gravitational_acceleration))
        if cfl is not None and substeps is not None:
            raise ValueError("give either substeps= or cfl=, not both")
        if cfl is None:
            self.substepping = FixedSubstepNumber(
                30 if substeps is None else substeps, averaging_kernel)
        else:
            self.substepping = FixedTimeStepSize(cfl, averaging_kernel)
            self._fixed_dt = fixed_dt
            if grid is not None:
                self.materialize(grid)

    def materialize(self, grid):
        """Resolve grid-dependent substepping (called by the model ctor;
        reference: materialize_free_surface + split_explicit_substepping)."""
        sub = self.substepping
        if isinstance(sub, FixedTimeStepSize) and sub.dt_barotropic is None:
            sub.materialize(grid, self.g)
            if getattr(self, "_fixed_dt", None) is not None:
                n = max(MINIMUM_SUBSTEPS,
                        int(np.ceil(2.0 * float(self._fixed_dt)
                                    / sub.dt_barotropic)))
                self.substepping = FixedSubstepNumber(n, sub.averaging_kernel)

    # legacy accessors (tests/examples poke .substeps/.weights)
    @property
    def substeps(self):
        return self.substepping.substeps

    @property
    def weights(self):
        return self.substepping.weights

    @property
    def fractional_step(self):
        return self.substepping.fractional_step

    def settings(self, dt):
        """(fractional_step, weights) for a baroclinic Δt — host-side."""
        return self.substepping.settings(dt)

    def _fp(self):
        return ("SplitExplicitFreeSurface", self.g, self.substepping._fp())

    __hash__ = ExplicitFreeSurface.__hash__
    __eq__ = ExplicitFreeSurface.__eq__

    def substep(self, grid, H_fc, H_cf, eta, U0, V0, GU, GV, dt,
                fill_eta, fill_U, fill_V, frac=None, weights=None):
        """Run the barotropic substep loop.

        Inputs are padded 2D-ish arrays (shape (Nx+2H, Ny+2H, 1)):
        ``eta`` the free surface, ``U0/V0`` the initial barotropic
        transports (∫u dz), ``GU/GV`` the depth-integrated slow tendencies,
        ``H_fc/H_cf`` the column depths at (f,c)/(c,f). ``fill_*`` refresh
        the 2D halos (cheap slice updates — stencils consume one halo ring
        per substep otherwise; the reference instead extends halos by the
        substep count in distributed runs, maybe_extend_halos).

        ``frac``/``weights`` override the substep settings (traced-safe;
        the model passes per-Δt values for FixedTimeStepSize substepping).

        Halo fills run every K substeps, not every substep: each substep's
        ±1 stencils consume two halo rings (η from U/V, then U/V from η), so
        a fresh fill stays valid for ⌊H/2⌋ substeps — the whole-array
        analogue of the reference's halo extension trick
        (maybe_extend_halos, split_explicit_free_surface.jl:300-330), and
        the main latency lever of the 2D loop on TPU.

        Returns (eta_filtered, U_filtered, V_filtered)."""
        g = self.g
        if frac is None:
            frac, weights = self.settings(None)
        dtau = frac * dt  # python float * traced scalar: no promotion
        dtype = eta.dtype
        weights = np.asarray(weights)

        def mcast(m):
            # metric constants arrive as numpy float64 (e.g. latitude-
            # dependent Δx on lat-lon grids); cast so x64-enabled runs don't
            # promote the f32 carry
            return m if np.isscalar(m) else jnp.asarray(np.asarray(m), dtype)

        dy_fc = mcast(grid.dy(LOC_FCC))
        dx_cf = mcast(grid.dx(LOC_CFC))
        az_cc = mcast(grid.Az(LOC_CCC))
        dx_fc = mcast(grid.dx(LOC_FCC))
        dy_cf = mcast(grid.dy(LOC_CFC))
        H_fc = mcast(H_fc)
        H_cf = mcast(H_cf)

        # ring budget: substeps per fill round. Valid only when the stale
        # halo evolves exactly like its source — true for PERIODIC axes
        # (the halo slot updates with the same formula as its image, all
        # inputs being ring-valid); bounded-wall reflections do not commute
        # with the update under varying metrics, so bounded grids fill
        # every substep.
        halos = [grid.H[ax] for ax in (0, 1) if not grid.is_flat(ax)]
        all_periodic = all(grid.topology[ax] == "periodic"
                           for ax in (0, 1) if not grid.is_flat(ax))
        K = max(1, min(halos) // 2) if (all_periodic and halos) else 1
        if K > 1:
            # the constant forcing's halos must be ring-valid too
            GU = fill_U(GU)
            GV = fill_V(GV)

        U, V = U0, V0
        eta_f = jnp.zeros_like(eta)
        U_f = jnp.zeros_like(U0)
        V_f = jnp.zeros_like(V0)

        def body(carry, w):
            eta, U, V, eta_f, U_f, V_f = carry
            # η ← η - Δτ ∇·U   (δx(Δy U) + δy(Δx V)) / Az
            div = (dx_c(grid, dy_fc * U) + dy_c(grid, dx_cf * V)) / az_cc
            eta = eta - dtau * div
            # U ← U + Δτ(-g H ∂x η + Gᵁ)
            U = U + dtau * (-g * H_fc * dx_f(grid, eta) / dx_fc + GU)
            V = V + dtau * (-g * H_cf * dy_f(grid, eta) / dy_cf + GV)
            return (eta, U, V, eta_f + w * eta, U_f + w * U, V_f + w * V)

        M = len(weights)
        if M <= _UNROLL_LIMIT:
            # small counts: full unroll (the measured-faster form — the
            # scan's per-iteration barrier costs ~latency per substep)
            carry = (eta, U, V, eta_f, U_f, V_f)
            for m, w in enumerate(weights):
                if m % K == 0:
                    carry = (fill_eta(carry[0]), fill_U(carry[1]),
                             fill_V(carry[2])) + carry[3:]
                carry = body(carry, float(w))
            return carry[3], carry[4], carry[5]

        # large counts (FixedTimeStepSize can demand hundreds): a chunked
        # lax.scan — one fill per K-substep chunk, the chunk body unrolled —
        # keeps compile time O(K) instead of O(M) (the module docstring's
        # promised design; the loop was fully unrolled for ANY M before —
        # round-5 review finding)
        n_full, rem = divmod(M, K)
        ws = jnp.asarray(np.asarray(weights[:n_full * K], float)
                         .reshape(n_full, K), dtype)

        def chunk(carry, wchunk):
            carry = (fill_eta(carry[0]), fill_U(carry[1]),
                     fill_V(carry[2])) + carry[3:]
            for j in range(K):
                carry = body(carry, wchunk[j])
            return carry, None

        carry = (eta, U, V, eta_f, U_f, V_f)
        carry, _ = jax.lax.scan(chunk, carry, ws)
        for m in range(rem):     # tail substeps, one fill opening them
            if m % K == 0:
                carry = (fill_eta(carry[0]), fill_U(carry[1]),
                         fill_V(carry[2])) + carry[3:]
            carry = body(carry, float(weights[n_full * K + m]))
        return carry[3], carry[4], carry[5]

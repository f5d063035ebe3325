"""Buoyancy formulations and equations of state.

Reference semantics: src/BuoyancyFormulations/ — `BuoyancyTracer`
(buoyancy_tracer.jl: a prognostic tracer `b` IS the buoyancy),
`SeawaterBuoyancy` (seawater_buoyancy.jl: T, S tracers + an equation of
state; buoyancy perturbation b = g (α T - β S) for the linear EOS,
linear_equation_of_state.jl:81), and the interface
`buoyancy_perturbationᶜᶜᶜ` / vertical contribution at (c,c,f).

The tendency hook is ``z_buoyancy(grid, tracers)``: the buoyancy force that
enters Gw at (c,c,f) (gravity along -z; the reference's arbitrary
gravity-direction `BuoyancyForce` is a later extension)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .defaults import defaults
from .operators.operators import ix_f, iy_f, iz_f


class BuoyancyTracer:
    """Buoyancy is the prognostic tracer ``b`` [m/s²]."""

    required_tracers = ("b",)

    def _fp(self):
        return ("BuoyancyTracer",)

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()

    def buoyancy_ccc(self, grid, tracers):
        return tracers["b"]

    def z_buoyancy(self, grid, tracers):
        """Buoyancy at (c,c,f) for the Gw tendency."""
        return iz_f(grid, tracers["b"])


class LinearEquationOfState:
    """b = g (α (T - T₀) - β (S - S₀)) (reference:
    linear_equation_of_state.jl)."""

    def __init__(self, thermal_expansion=1.67e-4, haline_contraction=7.8e-4):
        self.alpha = float(thermal_expansion)
        self.beta = float(haline_contraction)

    def _fp(self):
        return ("LinearEOS", self.alpha, self.beta)

    __hash__ = BuoyancyTracer.__hash__
    __eq__ = BuoyancyTracer.__eq__


class SeawaterBuoyancy:
    """T, S tracers + equation of state (reference: seawater_buoyancy.jl).
    ``constant_temperature`` / ``constant_salinity`` drop the respective
    tracer."""

    def __init__(self, equation_of_state=None, gravitational_acceleration=None,
                 constant_temperature=None, constant_salinity=None):
        self.eos = equation_of_state or LinearEquationOfState()
        self.g = (defaults.gravitational_acceleration
                  if gravitational_acceleration is None
                  else float(gravitational_acceleration))
        self.constant_temperature = constant_temperature
        self.constant_salinity = constant_salinity
        names = []
        if constant_temperature is None:
            names.append("T")
        if constant_salinity is None:
            names.append("S")
        self.required_tracers = tuple(names)

    def _fp(self):
        return ("SeawaterBuoyancy", self.eos._fp(), self.g,
                self.constant_temperature, self.constant_salinity)

    __hash__ = BuoyancyTracer.__hash__
    __eq__ = BuoyancyTracer.__eq__

    def buoyancy_ccc(self, grid, tracers):
        T = (tracers["T"] if self.constant_temperature is None
             else self.constant_temperature)
        S = (tracers["S"] if self.constant_salinity is None
             else self.constant_salinity)
        return self.g * (self.eos.alpha * T - self.eos.beta * S)

    def z_buoyancy(self, grid, tracers):
        return iz_f(grid, self.buoyancy_ccc(grid, tracers))


class RoquetSecondOrderEquationOfState:
    """Simplified nonlinear (second-order polynomial) TEOS-10-like equation
    of state after Roquet et al. (2015), "Defining a Simplified yet Realistic
    Equation of State for Seawater" — the reference reaches the same family
    through SeawaterPolynomials.jl (nonlinear_equation_of_state.jl).

    Density anomaly (kg/m³), Θ conservative temperature, S absolute salinity,
    z height (negative downward):

        ρ′ = -a₀ (1 + ½ λ₁ Θ + μ₁ z) Θ + b₀ S

    capturing thermal expansion, cabbeling (λ₁) and thermobaricity (μ₁)."""

    def __init__(self, a0=1.6550e-1, b0=7.6554e-1, lambda1=5.9520e-2,
                 mu1=1.4970e-4, reference_density=1020.0):
        self.a0 = float(a0)
        self.b0 = float(b0)
        self.lambda1 = float(lambda1)
        self.mu1 = float(mu1)
        self.rho0 = float(reference_density)

    def _fp(self):
        return ("RoquetEOS2", self.a0, self.b0, self.lambda1, self.mu1,
                self.rho0)

    __hash__ = BuoyancyTracer.__hash__
    __eq__ = BuoyancyTracer.__eq__

    def density_anomaly(self, T, S, z):
        return -self.a0 * (1 + 0.5 * self.lambda1 * T + self.mu1 * z) * T \
            + self.b0 * S

    def buoyancy(self, g, T, S, z):
        return -g * self.density_anomaly(T, S, z) / self.rho0


class NonlinearSeawaterBuoyancy(SeawaterBuoyancy):
    """SeawaterBuoyancy with a nonlinear (z-dependent) equation of state."""

    def __init__(self, equation_of_state=None, **kw):
        eos = equation_of_state or RoquetSecondOrderEquationOfState()
        super().__init__(equation_of_state=eos, **kw)

    def buoyancy_ccc(self, grid, tracers):
        from .grids.base import broadcastable_1d
        T = (tracers["T"] if self.constant_temperature is None
             else self.constant_temperature)
        S = (tracers["S"] if self.constant_salinity is None
             else self.constant_salinity)
        z = broadcastable_1d(grid.coord_padded(2, "c"), 2)
        return self.eos.buoyancy(self.g, T, S, z)


def seawater_density(model, eos=None):
    """Diagnostic density field ρ = ρ₀ + ρ′(T, S, z) as a lazy operation
    (reference: src/Models/seawater_density.jl KernelFunctionOperation)."""
    from .abstract_operations import KernelFunctionOperation
    from .grids.base import broadcastable_1d
    eos = eos or RoquetSecondOrderEquationOfState()

    def rho(grid, T, S):
        z = broadcastable_1d(grid.coord_padded(2, "c"), 2)
        return eos.rho0 + eos.density_anomaly(T, S, z)

    return KernelFunctionOperation(rho, model.grid, model.field("T"),
                                   model.field("S"))


class BuoyancyForce:
    """Buoyancy with an arbitrary gravity direction (reference:
    src/BuoyancyFormulations/buoyancy.jl — `BuoyancyForce(formulation;
    gravity_unit_vector)`; the tendency terms are x_dot_g_bᶠᶜᶜ etc.).

    ``gravity_unit_vector`` points in the direction gravity ACTS (default
    (0, 0, -1)), so the buoyancy force is -ĝ·b along each axis."""

    def __init__(self, formulation, gravity_unit_vector=(0.0, 0.0, -1.0)):
        g = np.asarray(gravity_unit_vector, float)
        self.formulation = formulation
        self.g_unit = tuple(g / np.linalg.norm(g))

    @property
    def required_tracers(self):
        return self.formulation.required_tracers

    def _fp(self):
        return ("BuoyancyForce", self.formulation._fp(), self.g_unit)

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()

    def buoyancy_ccc(self, grid, tracers):
        return self.formulation.buoyancy_ccc(grid, tracers)

    def x_buoyancy(self, grid, tracers):
        """-ĝ_x · b at (f,c,c); zero when gravity is vertical."""
        if self.g_unit[0] == 0.0:
            return None
        return -self.g_unit[0] * ix_f(grid, self.buoyancy_ccc(grid, tracers))

    def y_buoyancy(self, grid, tracers):
        if self.g_unit[1] == 0.0:
            return None
        return -self.g_unit[1] * iy_f(grid, self.buoyancy_ccc(grid, tracers))

    def z_buoyancy(self, grid, tracers):
        if self.g_unit[2] == 0.0:
            return None
        return -self.g_unit[2] * iz_f(grid, self.buoyancy_ccc(grid, tracers))

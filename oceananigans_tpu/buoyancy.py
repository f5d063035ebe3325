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
        if callable(getattr(self.eos, "buoyancy", None)):
            # nonlinear (z-dependent) EOS: the reference's single
            # SeawaterBuoyancy handles both (seawater_buoyancy.jl
            # dispatching through SeawaterPolynomials); was an
            # AttributeError here before round 5. Dispatch on the declared
            # buoyancy method, not hasattr(eos, "alpha") — a nonlinear EOS
            # exposing an alpha diagnostic must not take the linear path
            from .grids.base import broadcastable_1d
            z = broadcastable_1d(grid.coord_padded(2, "c"), 2)
            return self.eos.buoyancy(self.g, T, S, z)
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
        # μ₁ multiplies DEPTH (positive down, d = −z): with height z the
        # thermobaric term was sign-inverted — α DEcreased with depth,
        # opposite to seawater and to the TEOS10 class in this module
        # (which negates z the same way); round-5 review finding, verified
        # numerically against the polyTEOS10 α(z) profile
        return -self.a0 * (1 + 0.5 * self.lambda1 * T
                           + self.mu1 * (-z)) * T + self.b0 * S

    def buoyancy(self, g, T, S, z):
        return -g * self.density_anomaly(T, S, z) / self.rho0


class TEOS10EquationOfState:
    """55-term polynomial TEOS-10 Boussinesq equation of state
    ("polyTEOS10-bsq", Roquet, Madec, McDougall & Barker 2015, Ocean
    Modelling 90:29-43, Appendix A.2) — the reference reaches the same
    polynomial through SeawaterPolynomials.jl's `TEOS10EquationOfState`
    (src/BuoyancyFormulations/nonlinear_equation_of_state.jl uses it via
    `ρ′(θ, sᴬ, Z, eos)`).

    In-situ Boussinesq density ρ(Θ, Sᴬ, Z) = r₀(Z) + r′(Θ, Sᴬ, Z) with a
    degree-(6,4,2,1) polynomial r′ in normalized (√S, Θ, Z) and a quintic
    vertical reference profile r₀. Coefficients are transcribed from the
    published polyTEOS10-bsq tables; the implementation reproduces the
    paper's check value ρ(Sᴬ=30 g/kg, Θ=10°C, Z=-1000 m) = 1027.45140 kg/m³
    to 8 significant digits (tests/test_physics_plugins.py)."""

    # normalization constants (Roquet et al. 2015, Appendix A.2)
    _SAu = 40.0 * 35.16504 / 35.0
    _CTu = 40.0
    _Zu = 1.0e4
    _deltaS = 32.0

    # r′ coefficients R[ijk]: (√S)^i Θ^j Z^k
    _R = dict(
        R000=8.0189615746e+02, R100=8.6672408165e+02, R200=-1.7864682637e+03,
        R300=2.0375295546e+03, R400=-1.2849161071e+03, R500=4.3227585684e+02,
        R600=-6.0579916612e+01,
        R010=2.6010145068e+01, R110=-6.5281885265e+01, R210=8.1770425108e+01,
        R310=-5.6888046321e+01, R410=1.7681814114e+01, R510=-1.9193502195e+00,
        R020=-3.7074170417e+01, R120=6.1548258127e+01, R220=-6.0362551501e+01,
        R320=2.9130021253e+01, R420=-5.4723692739e+00,
        R030=2.1661789529e+01, R130=-3.3449108469e+01, R230=1.9717078466e+01,
        R330=-3.1742946532e+00,
        R040=-8.3627885467e+00, R140=1.1311538584e+01, R240=-5.3563304045e+00,
        R050=5.4048723791e-01, R150=4.8169980163e-01,
        R060=-1.9083568888e-01,
        R001=1.9681925209e+01, R101=-4.2549998214e+01, R201=5.0774768218e+01,
        R301=-3.0938076334e+01, R401=6.6051753097e+00,
        R011=-1.3336301113e+01, R111=-4.4870114575e+00, R211=5.0042598061e+00,
        R311=-6.5399043664e-01,
        R021=6.7080479603e+00, R121=3.5063081279e+00, R221=-1.8795372996e+00,
        R031=-2.4649669534e+00, R131=-5.5077101279e-01,
        R041=5.5927935970e-01,
        R002=2.0660924175e+00, R102=-4.9527603989e+00, R202=2.5019633244e+00,
        R012=2.0564311499e+00, R112=-2.1311365518e-01,
        R022=-1.2419983026e+00,
        R003=-2.3342758797e-02, R103=-1.8507636718e-02, R013=3.7969820455e-01,
    )
    # vertical reference profile r₀(Z) coefficients
    _RZ = (4.6494977072e+01, -5.2099962525e+00, 2.2601900708e-01,
           6.4326772569e-02, 1.5616995503e-02, -1.7243708991e-03)

    def __init__(self, reference_density=1020.0):
        self.rho0 = float(reference_density)

    def _fp(self):
        return ("TEOS10", self.rho0)

    __hash__ = BuoyancyTracer.__hash__
    __eq__ = BuoyancyTracer.__eq__

    def density(self, T, S, z):
        """In-situ Boussinesq density ρ(Θ, Sᴬ, Z) [kg/m³]; T is conservative
        temperature [°C], S absolute salinity [g/kg], z geopotential height
        [m] (negative below the surface)."""
        g = self._R
        ss = jnp.sqrt((S + self._deltaS) / self._SAu)
        tt = T / self._CTu
        zz = -z / self._Zu
        rz3 = g["R013"] * tt + g["R103"] * ss + g["R003"]
        rz2 = ((g["R022"] * tt + g["R112"] * ss + g["R012"]) * tt
               + (g["R202"] * ss + g["R102"]) * ss + g["R002"])
        rz1 = ((((g["R041"] * tt + g["R131"] * ss + g["R031"]) * tt
                 + (g["R221"] * ss + g["R121"]) * ss + g["R021"]) * tt
                + ((g["R311"] * ss + g["R211"]) * ss + g["R111"]) * ss
                + g["R011"]) * tt
               + (((g["R401"] * ss + g["R301"]) * ss + g["R201"]) * ss
                  + g["R101"]) * ss + g["R001"])
        rz0 = (((((g["R060"] * tt + g["R150"] * ss + g["R050"]) * tt
                  + (g["R240"] * ss + g["R140"]) * ss + g["R040"]) * tt
                 + ((g["R330"] * ss + g["R230"]) * ss + g["R130"]) * ss
                 + g["R030"]) * tt
                + (((g["R420"] * ss + g["R320"]) * ss + g["R220"]) * ss
                   + g["R120"]) * ss + g["R020"]) * tt
               + ((((g["R510"] * ss + g["R410"]) * ss + g["R310"]) * ss
                   + g["R210"]) * ss + g["R110"]) * ss + g["R010"]) * tt \
            + (((((g["R600"] * ss + g["R500"]) * ss + g["R400"]) * ss
                 + g["R300"]) * ss + g["R200"]) * ss + g["R100"]) * ss \
            + g["R000"]
        r_prime = ((rz3 * zz + rz2) * zz + rz1) * zz + rz0
        c0, c1, c2, c3, c4, c5 = self._RZ
        r0 = zz * (c0 + zz * (c1 + zz * (c2 + zz * (c3 + zz * (c4 + zz * c5)))))
        return r0 + r_prime

    def density_anomaly(self, T, S, z):
        """ρ′ = ρ(Θ, Sᴬ, Z) − ρ₀ (the reference's SeawaterPolynomials ρ′)."""
        return self.density(T, S, z) - self.rho0

    def buoyancy(self, g, T, S, z):
        return -g * self.density_anomaly(T, S, z) / self.rho0

    def thermal_expansion(self, T, S, z, dT=1e-3):
        """α = −(∂ρ/∂Θ)/ρ via centered difference on the polynomial."""
        rho = self.density(T, S, z)
        return -(self.density(T + dT, S, z)
                 - self.density(T - dT, S, z)) / (2 * dT) / rho

    def haline_contraction(self, T, S, z, dS=1e-3):
        """β = (∂ρ/∂Sᴬ)/ρ."""
        rho = self.density(T, S, z)
        return (self.density(T, S + dS, z)
                - self.density(T, S - dS, z)) / (2 * dS) / rho


class NonlinearSeawaterBuoyancy(SeawaterBuoyancy):
    """SeawaterBuoyancy defaulting to a nonlinear equation of state.
    Kept as a convenience alias — since round 5 the base class dispatches
    on the EOS itself, so this adds only the Roquet default."""

    def __init__(self, equation_of_state=None, **kw):
        eos = equation_of_state or RoquetSecondOrderEquationOfState()
        super().__init__(equation_of_state=eos, **kw)


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

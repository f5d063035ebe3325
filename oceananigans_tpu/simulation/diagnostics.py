"""Diagnostics: CFL numbers, TimeStepWizard, StateChecker.

Reference semantics: src/Diagnostics/cfl.jl:8 (CFL = Δt/cell_advection_
timescale; AdvectiveCFL, DiffusiveCFL), src/Simulations/time_step_wizard.jl:
5-14,65-100 (CFL-adaptive Δt with max_change/min_change clamps), and
src/Diagnostics/state_checker.jl."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..advection.fluxes import cell_advection_timescale


class AdvectiveCFL:
    def __init__(self, dt):
        self.dt = dt

    def __call__(self, model):
        # accept a Simulation too (sim.diagnostics entries are called with
        # the simulation, reference: Diagnostics run in the time-step loop)
        model = getattr(model, "model", model)
        f = model.state["fields"]
        tau = cell_advection_timescale(model.grid, f["u"], f["v"], f["w"])
        dt = self.dt(model) if callable(self.dt) else self.dt
        return float(dt / tau)


CFL = AdvectiveCFL


def _closure_max_nu(model, closure):
    """(max ν, power) pairs for one closure: power 2 for Laplacian, 4 for
    biharmonic diffusivities (reference: cell_diffusion_timescale per
    closure, turbulence_closure_diagnostics.jl)."""
    grid = model.grid
    if closure is None:
        return []
    if hasattr(closure, "closures"):        # ClosureTuple
        out = []
        for c in closure.closures:
            out.extend(_closure_max_nu(model, c))
        return out
    power = 4 if type(closure).__name__ == "ScalarBiharmonicDiffusivity" \
        else 2

    def as_max(v):
        if callable(v) and not hasattr(v, "ndim"):
            if getattr(closure, "discrete_form", False):
                return None
            from ..closures.scalar_diffusivity import resolve_coefficient
            from ..grids.topology import LOC_CCC
            v = np.asarray(resolve_coefficient(
                grid, v, LOC_CCC, float(model.time)))[grid.interior_slices]
        if v is None or np.isscalar(v) and not np.isreal(v):
            return None
        return float(np.max(np.asarray(v)))

    vals = []
    nu = getattr(closure, "nu", None)
    m = as_max(nu) if nu is not None else None
    if m is not None:
        vals.append((m, power))
    kappa = getattr(closure, "kappa", None)
    if isinstance(kappa, dict):
        for v in kappa.values():
            m = as_max(v)
            if m is not None:
                vals.append((m, power))
    elif kappa is not None:
        m = as_max(kappa)
        if m is not None:
            vals.append((m, power))
    if not vals:
        # diagnostic-viscosity closures (Smagorinsky/AMD/CATKE/k-eps/...):
        # compute the current aux state and take the max over its
        # viscosity/diffusivity entries
        try:
            fields = dict(model.state["fields"])
            if "w" not in fields and "w" in model.state:
                fields["w"] = model.state["w"]
            aux = closure.compute_diffusivities(grid, fields,
                                                model.state["clock"]["time"])
        except Exception:
            return []
        for key, v in aux.items():
            if key.startswith(("nu", "kappa")) and hasattr(v, "ndim"):
                vals.append((float(np.max(np.asarray(v))), 2))
    return vals


class DiffusiveCFL:
    def __init__(self, dt):
        self.dt = dt

    def __call__(self, model):
        # accept a Simulation too (sim.diagnostics entries are called with
        # the simulation, reference: Diagnostics run in the time-step loop)
        model = getattr(model, "model", model)
        dmin = min(model.grid.minimum_spacing(i) for i in range(3)
                   if not model.grid.is_flat(i))
        dt = self.dt(model) if callable(self.dt) else self.dt
        # Δt / min timescale over every closure component: d²/ν for
        # Laplacian, d⁴/ν for biharmonic coefficients (reference:
        # DiffusiveCFL over closure tuples + turbulent-diffusivity closures,
        # test_turbulence_closures.jl "Diagnostics")
        cfl = 0.0
        for numax, power in _closure_max_nu(model, model.closure):
            cfl = max(cfl, dt * numax / dmin ** power)
        return float(cfl)


class TimeStepWizard:
    """Adapt Simulation.dt to hold a target CFL (reference:
    time_step_wizard.jl). Install with
    ``sim.add_callback(TimeStepWizard(cfl=0.7), IterationInterval(10))``.

    This is the one deliberate device→host sync in the loop: it reads one
    scalar (the min advection timescale) every N iterations."""

    def __init__(self, cfl=0.2, diffusive_cfl=np.inf, max_change=1.1,
                 min_change=0.5, max_dt=np.inf, min_dt=0.0):
        self.cfl = cfl
        self.diffusive_cfl = diffusive_cfl
        self.max_change = max_change
        self.min_change = min_change
        self.max_dt = max_dt
        self.min_dt = min_dt

    def new_dt(self, model, dt):
        f = model.state["fields"]
        tau = float(cell_advection_timescale(model.grid, f["u"], f["v"],
                                             f["w"]))
        new = self.cfl * tau
        if self.diffusive_cfl is not None and model.closure is not None:
            # honor the requested diffusive stability limit (reference:
            # time_step_wizard.jl min with cell_diffusion_timescale; the
            # kwarg was previously accepted but never applied)
            nu = getattr(model.closure, "nu", 0.0) or 0.0
            if not np.isscalar(nu):
                nu = float(np.max(np.asarray(nu)))
            if nu > 0:
                dmin = min(model.grid.minimum_spacing(i) for i in range(3)
                           if not model.grid.is_flat(i))
                new = min(new, self.diffusive_cfl * dmin ** 2 / nu)
        new = min(new, self.max_change * dt)
        new = max(new, self.min_change * dt)
        return float(np.clip(new, self.min_dt, self.max_dt))

    def __call__(self, sim):
        sim.dt = self.new_dt(sim.model, sim.dt)


class StateChecker:
    """Print min/max/mean of every prognostic field (reference:
    state_checker.jl)."""

    def __call__(self, sim):
        model = sim.model
        print(f"State check, iteration {model.iteration}, "
              f"time {model.time:.4g}:")
        for name in model.prognostic_names:
            fld = model.field(name)
            print(f"  {name:>4}: min {float(fld.min()):+.6e} "
                  f"max {float(fld.max()):+.6e} mean {float(fld.mean()):+.6e}")


def conjure_time_step_wizard(simulation, schedule=None, **wizard_kwargs):
    """Install a TimeStepWizard callback on the simulation (reference:
    simulation.jl conjure_time_step_wizard!(sim, schedule; kwargs...))."""
    from ..utils.schedules import IterationInterval
    wizard = TimeStepWizard(**wizard_kwargs)
    simulation.add_callback(wizard, schedule or IterationInterval(10),
                            name="time_step_wizard")
    return wizard

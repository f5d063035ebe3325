from .steppers import (Clock, RK3_GAMMAS, RK3_ZETAS, RungeKutta3TimeStepper,
                       QuasiAdamsBashforth2TimeStepper,
                       SplitRungeKutta3TimeStepper)

__all__ = ["Clock", "RK3_GAMMAS", "RK3_ZETAS", "RungeKutta3TimeStepper",
           "QuasiAdamsBashforth2TimeStepper", "SplitRungeKutta3TimeStepper"]

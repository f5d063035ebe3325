from .forcings import (Forcing, ContinuousForcing, DiscreteForcing,
                       Relaxation, AdvectiveForcing, MultipleForcings,
                       GaussianMask, LinearTarget)

__all__ = ["Forcing", "ContinuousForcing", "DiscreteForcing", "Relaxation",
           "AdvectiveForcing", "MultipleForcings", "GaussianMask",
           "LinearTarget"]

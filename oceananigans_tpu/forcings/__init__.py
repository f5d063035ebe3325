from .forcings import (Forcing, ContinuousForcing, DiscreteForcing,
                       Relaxation, AdvectiveForcing, MultipleForcings,
                       FieldTimeSeriesForcing,
                       GaussianMask, LinearTarget)

__all__ = ["Forcing", "ContinuousForcing", "DiscreteForcing", "Relaxation",
           "AdvectiveForcing", "MultipleForcings", "FieldTimeSeriesForcing",
           "GaussianMask",
           "LinearTarget"]

from .forcings import (Forcing, ContinuousForcing, DiscreteForcing,
                       Relaxation, AdvectiveForcing, MultipleForcings,
                       FieldTimeSeriesForcing,
                       GaussianMask, LinearTarget, make_forcing)

__all__ = ["Forcing", "ContinuousForcing", "DiscreteForcing", "Relaxation",
           "AdvectiveForcing", "MultipleForcings", "FieldTimeSeriesForcing",
           "GaussianMask",
           "LinearTarget", "make_forcing"]

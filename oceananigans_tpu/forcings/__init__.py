from .forcings import (Forcing, ContinuousForcing, DiscreteForcing,
                       Relaxation, AdvectiveForcing, MultipleForcings,
                       FieldTimeSeriesForcing,
                       GaussianMask, PiecewiseLinearMask, LinearTarget, make_forcing)

__all__ = ["Forcing", "ContinuousForcing", "DiscreteForcing", "Relaxation",
           "AdvectiveForcing", "MultipleForcings", "FieldTimeSeriesForcing",
           "GaussianMask", "PiecewiseLinearMask",
           "LinearTarget", "make_forcing"]

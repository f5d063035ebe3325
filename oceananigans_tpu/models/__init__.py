from .nonhydrostatic import NonhydrostaticModel
from .shallow_water import ShallowWaterModel
from .hydrostatic import HydrostaticFreeSurfaceModel
from .free_surfaces import (ExplicitFreeSurface, ImplicitFreeSurface,
                            SplitExplicitFreeSurface)

from .ensemble import EnsembleModel
from .diagnostic_operations import (ForcingOperation, ForcingField,
                                    BoundaryConditionOperation,
                                    BoundaryConditionField,
                                    BoundaryAdjacentMean,
                                    boundary_adjacent_mean)

__all__ = ["NonhydrostaticModel", "ShallowWaterModel",
           "HydrostaticFreeSurfaceModel", "ExplicitFreeSurface",
           "ImplicitFreeSurface", "SplitExplicitFreeSurface",
           "EnsembleModel", "ForcingOperation", "ForcingField",
           "BoundaryConditionOperation", "BoundaryConditionField",
           "BoundaryAdjacentMean", "boundary_adjacent_mean"]


from .nonhydrostatic import NonhydrostaticModel
from .shallow_water import ShallowWaterModel
from .hydrostatic import HydrostaticFreeSurfaceModel
from .free_surfaces import (ExplicitFreeSurface, ImplicitFreeSurface,
                            SplitExplicitFreeSurface)

from .cubed_sphere_shallow_water import CubedSphereShallowWaterModel
from .cubed_sphere_hydrostatic import CubedSphereHydrostaticModel
from .ensemble import EnsembleModel
from .diagnostic_operations import (ForcingOperation, ForcingField,
                                    BoundaryConditionOperation,
                                    BoundaryConditionField,
                                    BoundaryAdjacentMean,
                                    boundary_adjacent_mean)

__all__ = ["NonhydrostaticModel", "ShallowWaterModel",
           "HydrostaticFreeSurfaceModel", "ExplicitFreeSurface",
           "ImplicitFreeSurface", "SplitExplicitFreeSurface",
           "CubedSphereShallowWaterModel", "CubedSphereHydrostaticModel",
           "EnsembleModel", "ForcingOperation", "ForcingField",
           "BoundaryConditionOperation", "BoundaryConditionField",
           "BoundaryAdjacentMean", "boundary_adjacent_mean"]


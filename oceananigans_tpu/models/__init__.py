from .nonhydrostatic import NonhydrostaticModel
from .shallow_water import ShallowWaterModel
from .hydrostatic import HydrostaticFreeSurfaceModel
from .free_surfaces import (ExplicitFreeSurface, ImplicitFreeSurface,
                            SplitExplicitFreeSurface)

from .ensemble import EnsembleModel

__all__ = ["NonhydrostaticModel", "ShallowWaterModel",
           "HydrostaticFreeSurfaceModel", "ExplicitFreeSurface",
           "ImplicitFreeSurface", "SplitExplicitFreeSurface",
           "EnsembleModel"]


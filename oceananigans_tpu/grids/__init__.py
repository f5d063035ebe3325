from .topology import (PERIODIC, BOUNDED, FLAT, CENTER, FACE,
                       LOC_CCC, LOC_FCC, LOC_CFC, LOC_CCF, LOC_FFC)
from .base import AbstractGrid
from .rectilinear import RectilinearGrid
from .latlon import LatitudeLongitudeGrid
from .orthogonal_spherical_shell import (OrthogonalSphericalShellGrid,
                                         RotatedLatitudeLongitudeGrid)
from .tripolar import TripolarGrid
from .cubed_sphere import (ConformalCubedSpherePanel, ConformalCubedSphereGrid,
                           fill_cubed_sphere_halos,
                           fill_cubed_sphere_velocity_halos,
                           elliptic_cubed_sphere_nodes)
from .stretching import (ExponentialDiscretization, PowerLawStretching,
                         LinearStretching, ReferenceToStretchedDiscretization)

__all__ = ["PERIODIC", "BOUNDED", "FLAT", "CENTER", "FACE",
           "LOC_CCC", "LOC_FCC", "LOC_CFC", "LOC_CCF", "LOC_FFC",
           "AbstractGrid", "RectilinearGrid", "LatitudeLongitudeGrid",
           "OrthogonalSphericalShellGrid", "RotatedLatitudeLongitudeGrid",
           "TripolarGrid", "ConformalCubedSpherePanel",
           "ConformalCubedSphereGrid", "fill_cubed_sphere_halos",
           "fill_cubed_sphere_velocity_halos", "elliptic_cubed_sphere_nodes",
           "ExponentialDiscretization", "PowerLawStretching",
           "LinearStretching", "ReferenceToStretchedDiscretization"]

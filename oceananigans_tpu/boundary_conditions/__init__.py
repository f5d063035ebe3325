from .boundary_condition import (
    BoundaryCondition, FieldBoundaryConditions,
    PeriodicBoundaryCondition, FluxBoundaryCondition, ValueBoundaryCondition,
    FieldTimeSeriesBoundaryCondition,
    GradientBoundaryCondition, OpenBoundaryCondition, ImpenetrableBoundaryCondition,
    PerturbationAdvection, ImmersedBoundaryCondition,
    ZipperBoundaryCondition, PolarBoundaryCondition, PolarValue,
    regularize_field_boundary_conditions, default_bcs,
)
from .fill_halos import fill_halo_regions, apply_flux_bcs

__all__ = [
    "BoundaryCondition", "FieldBoundaryConditions",
    "PeriodicBoundaryCondition", "FluxBoundaryCondition", "ValueBoundaryCondition",
    "FieldTimeSeriesBoundaryCondition",
    "GradientBoundaryCondition", "OpenBoundaryCondition",
    "ImpenetrableBoundaryCondition", "ZipperBoundaryCondition",
    "PolarBoundaryCondition", "PolarValue",
    "PerturbationAdvection", "ImmersedBoundaryCondition",
    "regularize_field_boundary_conditions", "default_bcs",
    "fill_halo_regions", "apply_flux_bcs",
]

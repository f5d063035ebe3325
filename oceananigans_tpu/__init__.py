"""oceananigans_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
capabilities of Oceananigans.jl.

Layer map (mirrors SURVEY.md §1; reference: src/Oceananigans.jl:226-271):

    grids/                 L1  topology, coordinates, metrics, halos
    operators/             L2  finite-volume stencil micro-ops
    boundary_conditions/   L3  BC types + halo filling
    fields/                L4  Field wrapper, set, reductions
    timesteppers/          L6  Clock, RK3 / quasi-AB2
    advection/             L6  Centered / UpwindBiased / WENO / VectorInvariant
    solvers/               L6  FFT/DCT Poisson, batched tridiagonal, CG
    closures/              L9  ScalarDiffusivity, Smagorinsky, AMD, CATKE, …
    parallel/              L7  device mesh, shard_map halo exchange, pencil FFT
    models/                L10 Nonhydrostatic / HydrostaticFreeSurface / ShallowWater
    simulation/            L8  run loop, callbacks, output, checkpointing
"""

from .defaults import defaults
from .grids import RectilinearGrid, LatitudeLongitudeGrid, PERIODIC, BOUNDED, FLAT, CENTER, FACE
from .fields import (Field, CenterField, XFaceField, YFaceField, ZFaceField,
                     VelocityFields, TracerFields)
from .boundary_conditions import (
    BoundaryCondition, FieldBoundaryConditions, FluxBoundaryCondition,
    ValueBoundaryCondition, GradientBoundaryCondition, OpenBoundaryCondition,
    fill_halo_regions)
from .background_fields import BackgroundField

__version__ = "0.1.0"

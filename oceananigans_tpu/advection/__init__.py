from .schemes import (AdvectionScheme, Centered, UpwindBiased, WENO,
                      FluxFormAdvection, adapt_advection_order)
from .fluxes import (div_Uc, div_Uu, div_Uv, div_Uw, cell_advection_timescale)
from .vector_invariant import VectorInvariant, WENOVectorInvariant

__all__ = ["AdvectionScheme", "Centered", "UpwindBiased", "WENO",
           "FluxFormAdvection", "adapt_advection_order",
           "VectorInvariant", "WENOVectorInvariant",
           "div_Uc", "div_Uu", "div_Uv", "div_Uw", "cell_advection_timescale"]

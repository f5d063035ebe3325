from .scalar_diffusivity import (ScalarDiffusivity, VerticalScalarDiffusivity,
                                 HorizontalScalarDiffusivity,
                                 ScalarBiharmonicDiffusivity,
                                 VerticalScalarBiharmonicDiffusivity,
                                 HorizontalScalarBiharmonicDiffusivity,
                                 HorizontalDivergenceScalarDiffusivity,
                                 HorizontalDivergenceScalarBiharmonicDiffusivity,
                                 FluxTapering, viscosity, diffusivity,
                                 ExplicitTimeDiscretization,
                                 VerticallyImplicitTimeDiscretization,
                                 ClosureTuple)
from .smagorinsky import (Smagorinsky, SmagorinskyLilly, LillyCoefficient,
                          DynamicCoefficient, DynamicSmagorinsky,
                          LagrangianAveraging)
from .amd import AnisotropicMinimumDissipation
from .vertical_diffusivities import (ConvectiveAdjustmentVerticalDiffusivity,
                                     RiBasedVerticalDiffusivity,
                                     TwoDimensionalLeith)
from .catke import CATKEVerticalDiffusivity
from .isopycnal import (IsopycnalSkewSymmetricDiffusivity,
                        TriadIsopycnalSkewSymmetricDiffusivity)
from .tke_dissipation import TKEDissipationVerticalDiffusivity

__all__ = ["ScalarDiffusivity", "VerticalScalarDiffusivity",
           "HorizontalScalarDiffusivity", "ScalarBiharmonicDiffusivity",
           "VerticalScalarBiharmonicDiffusivity",
           "HorizontalScalarBiharmonicDiffusivity",
           "HorizontalDivergenceScalarDiffusivity",
           "HorizontalDivergenceScalarBiharmonicDiffusivity",
           "FluxTapering", "viscosity", "diffusivity",
           "ExplicitTimeDiscretization",
           "VerticallyImplicitTimeDiscretization", "LillyCoefficient",
           "Smagorinsky", "SmagorinskyLilly", "DynamicCoefficient",
           "DynamicSmagorinsky", "LagrangianAveraging",
           "AnisotropicMinimumDissipation",
           "ConvectiveAdjustmentVerticalDiffusivity",
           "RiBasedVerticalDiffusivity", "TwoDimensionalLeith",
           "CATKEVerticalDiffusivity", "ClosureTuple",
           "IsopycnalSkewSymmetricDiffusivity",
           "TriadIsopycnalSkewSymmetricDiffusivity",
           "TKEDissipationVerticalDiffusivity"]

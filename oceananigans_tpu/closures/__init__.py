from .scalar_diffusivity import (ScalarDiffusivity, VerticalScalarDiffusivity,
                                 HorizontalScalarDiffusivity,
                                 ScalarBiharmonicDiffusivity)
from .smagorinsky import Smagorinsky, SmagorinskyLilly
from .amd import AnisotropicMinimumDissipation

__all__ = ["ScalarDiffusivity", "VerticalScalarDiffusivity",
           "HorizontalScalarDiffusivity", "ScalarBiharmonicDiffusivity",
           "Smagorinsky", "SmagorinskyLilly", "AnisotropicMinimumDissipation"]

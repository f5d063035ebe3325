from .nonhydrostatic import NonhydrostaticModel

__all__ = ["NonhydrostaticModel"]

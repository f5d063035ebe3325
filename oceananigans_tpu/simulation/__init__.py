from .simulation import Simulation, Callback, NaNChecker

__all__ = ["Simulation", "Callback", "NaNChecker"]

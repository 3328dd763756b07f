from .simulator import Simulator, SimSettings

__all__ = ["Simulator", "SimSettings"]

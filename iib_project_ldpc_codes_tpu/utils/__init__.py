from . import theory
from .config import SimulationConfig
from .results import SimulationResult, load_result, save_result

__all__ = ["theory", "SimulationConfig", "SimulationResult", "load_result",
           "save_result"]

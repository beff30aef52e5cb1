from . import theory
from .config import SimulationConfig
from .results import SimulationResult, load_result, save_result
from .stats import clopper_pearson, compare_ber, compare_fer, fer_ci, wilson
from .combine import combine_directory, combine_results

__all__ = ["theory", "SimulationConfig", "SimulationResult", "load_result",
           "save_result", "clopper_pearson", "compare_ber", "compare_fer",
           "fer_ci", "wilson", "combine_directory", "combine_results"]

from pelvistim_fem_tpu.utils.config import load_params, get_placement, get_stim
from pelvistim_fem_tpu.utils.summary import save_results
from pelvistim_fem_tpu.utils.timing import PhaseTimer

__all__ = ["load_params", "get_placement", "get_stim", "save_results",
           "PhaseTimer"]

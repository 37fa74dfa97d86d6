from pelvistim_fem_tpu.ops.assembly import element_gradients
from pelvistim_fem_tpu.ops.solve import jacobi_pcg, solve_case, SolveResult

__all__ = ["element_gradients", "jacobi_pcg", "solve_case", "SolveResult"]

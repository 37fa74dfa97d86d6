"""pelvistim_fem_tpu — TPU-native bioelectric FEM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
pelvistim-fem reference pipeline (Gmsh + ElmerGrid + ElmerSolver/UMFPACK +
VTK): quasi-static current conduction  div(sigma grad phi) = 0  in layered
human tissue, with Dirichlet (voltage) and Neumann (current-density)
electrode boundary conditions, on-device post-processing (J = -sigma grad
phi, surface flux integrals, ROI statistics, compliance voltage, contact
impedance, charge density), and vmapped/sharded parameter sweeps.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  mesh/      structured lattice tet meshers + mesh interchange (replaces
             Gmsh .geo / ElmerGrid; ref: step0*/build_mesh, find_boundaries.py)
  ops/       P1 tet assembly, SpMV, BCs, PCG solver, field/metric ops
             (replaces ElmerSolver StatCurrentSolve + UMFPACK + VTK calc)
  models/    the four reference workloads as Case builders
             (step01_box, step02_electrodes, step03_ankle_layers,
             step04_pressure)
  parallel/  device-mesh sweep sharding and partitioned solves
             (the reference has no distributed layer; SURVEY.md section 2)
  utils/     params.yaml config, summary.csv/json writers, timers
  viz/       matplotlib figure families (ref: plot_layered_results.py etc.)
"""

__version__ = "0.1.0"

from pelvistim_fem_tpu.mesh.core import TetMesh
from pelvistim_fem_tpu.models.case import Case, build_case
from pelvistim_fem_tpu.ops.solve import solve_case, SolveResult

__all__ = [
    "TetMesh",
    "Case",
    "build_case",
    "solve_case",
    "SolveResult",
    "__version__",
]

from pelvistim_fem_tpu.parallel.sweep import (
    batched_material_solve,
    batched_material_solve_refined,
    device_mesh,
    sharded_material_solve,
    sharded_material_solve_refined,
)

__all__ = ["batched_material_solve", "batched_material_solve_refined",
           "device_mesh", "sharded_material_solve",
           "sharded_material_solve_refined"]

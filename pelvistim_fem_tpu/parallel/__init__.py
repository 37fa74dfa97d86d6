from pelvistim_fem_tpu.parallel.sweep import (
    batched_material_solve,
    device_mesh,
    sharded_material_solve,
)

__all__ = ["batched_material_solve", "device_mesh",
           "sharded_material_solve"]

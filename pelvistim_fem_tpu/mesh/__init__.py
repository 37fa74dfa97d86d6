from pelvistim_fem_tpu.mesh.core import TetMesh
from pelvistim_fem_tpu.mesh.grading import graded_axis, uniform_axis
from pelvistim_fem_tpu.mesh.generate import (
    box_mesh,
    layered_slab_mesh,
)
from pelvistim_fem_tpu.mesh.boundary import extract_boundary

__all__ = [
    "TetMesh",
    "graded_axis",
    "uniform_axis",
    "box_mesh",
    "layered_slab_mesh",
    "extract_boundary",
]

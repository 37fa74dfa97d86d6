"""step01_box workload: uniform box with analytic solution.

Reference: step01_box/{box.geo, case.sif, setup_case.py,
test_step01_baseline.py}.  Analytic solution phi(z) = z/Lz * V,
|J| = sigma*V/Lz = 10 A/m^2 for the default parameters
(step01_box/README.md:16).
"""

from __future__ import annotations

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import box_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.utils.config import default_params


def build_box_case(params: dict | None = None, *, h: float | None = None,
                   dtype=jnp.float64, with_mesh: bool = False):
    params = params or default_params("step01_box")
    g = params["geometry"]
    h = h or params["mesh"]["lc_m"]
    mesh = box_mesh(g["Lx"], g["Ly"], g["Lz"], h)
    st = params.get("stim", {})
    case = build_case(
        mesh,
        {1: params["conductivities"]["sigma"]},
        mode="voltage",
        active_V=st.get("v_active", 1.0),
        meta_extra=dict(z_skin_top=g["Lz"]),
        dtype=dtype,
    )
    if with_mesh:
        return case, params, mesh
    return case, params

"""step02_electrodes workload: bipolar surface electrodes on a 15x15x5 cm
slab, shape x radius sweep.

Reference: step02_electrodes/run_sweep.py:33-130 — tissue box, two
electrode patches on the top face (+1 V / 0 V), adaptive refinement
lc_elec = r/3.5 near the electrodes, lc_bulk = min(4r, 12 mm) elsewhere
(:109-121), here realized as graded lattice axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import layered_slab_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.utils.config import default_params, get_placement


def build_electrode_case(params: dict | None = None, *,
                         shape: str = "circle", r: float = 0.01,
                         dtype=jnp.float64, with_mesh: bool = False):
    params = params or default_params("step02_electrodes")
    g = params["geometry"]
    Lx, Ly, Lz = g["Lx"], g["Ly"], g["Lz"]
    pl = get_placement(params)
    sep = pl.get("separation", 0.06)
    e1 = (Lx / 2 - sep / 2, Ly / 2, r)
    e2 = (Lx / 2 + sep / 2, Ly / 2, r)

    lc_elec = r / 3.5
    lc_bulk = min(r * 4, params.get("mesh", {}).get("lc_bulk_max_m", 0.012))

    # Two z-bands of the same tissue body grade fine near the electrode
    # surface and coarse at depth (lattice analogue of the Distance/
    # Threshold field).
    z_fine = min(3 * lc_elec, Lz / 3)
    layers = [
        (core.BODY_TISSUE, Lz - z_fine, lc_bulk),
        (core.BODY_TISSUE, z_fine, lc_elec),
    ]
    mesh = layered_slab_mesh(
        Lx, Ly, Lz,
        layers=layers,
        electrodes=[e1, e2],
        elec_shape=shape,
        contact_t=0.0,
        h_fine=lc_elec,
        h_coarse=lc_bulk,
    )
    case = build_case(
        mesh,
        {core.BODY_TISSUE: params["conductivities"]["sigma"]},
        mode="voltage",
        active_V=params.get("stim", {}).get("v_active", 1.0),
        meta_extra=dict(
            elec_shape=shape,
            elec_r=float(r),
            e1_pos=(e1[0], e1[1], Lz),
            e2_pos=(e2[0], e2[1], Lz),
            z_skin_top=float(Lz),
            z_e1_elec_top=float(Lz),
            z_e2_elec_top=float(Lz),
        ),
        dtype=dtype,
    )
    if with_mesh:
        return case, params, mesh
    return case, params

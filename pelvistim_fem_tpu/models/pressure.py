"""step04_pressure workload: pressure-dependent contact impedance sweep.

The reference builds the mesh ONCE and re-runs ElmerSolver 15 times with
only Material 4 (sigma_contact) changed (run_pressure_sweep.py:664-740).
TPU-natively that becomes: ONE Case + a vmapped batched solve over the
sigma_contact material table — zero re-assembly, one compiled executable
(see parallel/sweep.py.pressure_sweep).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.ankle import build_layered_case
from pelvistim_fem_tpu.utils.config import default_params, get_placement


def build_pressure_case(params: dict | None = None, *, coarse: bool = False,
                        dtype=jnp.float64, with_mesh: bool = False,
                        to_device: bool = True):
    """One Case for the fixed step04 geometry (rect slab, t_fat = 5 mm,
    r = 10 mm, contact layers on)."""
    params = params or default_params("step04_pressure")
    pl = get_placement(params)
    elec_r = pl.get("electrode_r_mm", 10.0) * 1e-3
    if with_mesh:
        case, _, mesh = build_layered_case(params, elec_r=elec_r,
                                           coarse=coarse, dtype=dtype,
                                           with_mesh=True,
                                           to_device=to_device)
        return case, params, mesh
    case, _ = build_layered_case(params, elec_r=elec_r, coarse=coarse,
                                 dtype=dtype, to_device=to_device)
    return case, params


def build_pressure_spec(params: dict | None = None, *,
                        coarse: bool = False):
    """LatticeSpec for the fixed step04 geometry — front end for the
    device-side assembly fast path (see models/ankle.build_layered_spec)."""
    from pelvistim_fem_tpu.models.ankle import build_layered_spec
    params = params or default_params("step04_pressure")
    pl = get_placement(params)
    elec_r = pl.get("electrode_r_mm", 10.0) * 1e-3
    return build_layered_spec(params, elec_r=elec_r, coarse=coarse)


def sigma_skin_tables(case, params) -> jnp.ndarray:
    """(S, T) material tables varying the skin conductivity — the
    reference's sigma_skin_sweep axis (step03 params.yaml:33,
    run_layered_sweep.py sigma_skin_override).  Another zero-re-assembly
    vmapped sweep."""
    sweep = params["conductivities"].get("sigma_skin_sweep", [])
    base = np.asarray(case.sigma_table)
    tables = np.tile(base, (len(sweep), 1))
    for i, s in enumerate(sweep):
        tables[i, core.BODY_SKIN] = s
    return jnp.asarray(tables, case.sigma_table.dtype)


def sigma_tables_for_sweep(case, params) -> jnp.ndarray:
    """(S, T) batched material tables: rows identical except the contact
    bodies, which take each sweep value (ref pressure_sweep.sigma_contact_Spm,
    step04 params.yaml:51-56)."""
    sweep = params["pressure_sweep"]["sigma_contact_Spm"]
    base = np.asarray(case.sigma_table)
    tables = np.tile(base, (len(sweep), 1))
    for i, s in enumerate(sweep):
        tables[i, core.BODY_CONTACT_ACTIVE] = s
        tables[i, core.BODY_CONTACT_RETURN] = s
    return jnp.asarray(tables, case.sigma_table.dtype)

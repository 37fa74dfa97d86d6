"""Imported-mesh pipeline: arbitrary unstructured tet meshes through the
full detect-BCs -> build -> solve -> extract flow.

The reference runs its whole step03 pipeline on whatever Gmsh produced:
boundary ids after ElmerGrid conversion are arbitrary, so it *detects*
which ids are the electrodes (run_layered_sweep.py:366-455) and then
writes the case around them (:594-633).  This module is that path for
meshes read from disk (Gmsh .msh v2.2/v4.1 or an Elmer mesh DB): identify
the electrode patches geometrically, renumber bcids to the framework's
canonical 1/2/3, map body ids to conductivities, and assemble a
solver-ready Case whose metrics dict matches the lattice path's.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.boundary import detect_electrode_bcids
from pelvistim_fem_tpu.mesh.core import (BC_ACTIVE, BC_INSULATED, BC_RETURN,
                                         TetMesh)
from pelvistim_fem_tpu.models.case import Case, build_case
from pelvistim_fem_tpu.utils.config import (default_params, get_placement,
                                            get_stim)


def read_mesh_any(path) -> TetMesh:
    """Read a mesh from a Gmsh .msh file, an Elmer mesh DB directory, or
    a .vtu file (the reference's three interchange formats)."""
    p = Path(path)
    if p.is_dir():
        from pelvistim_fem_tpu.mesh.io_elmer import read_elmer_mesh
        return read_elmer_mesh(p)
    if p.suffix == ".msh":
        from pelvistim_fem_tpu.mesh.io_msh import read_msh
        return read_msh(p)
    if p.suffix == ".vtu":
        from pelvistim_fem_tpu.utils.vtu import read_vtu_mesh
        return read_vtu_mesh(p)
    raise ValueError(f"cannot read mesh from {p} "
                     f"(expect .msh, .vtu, or Elmer mesh directory)")


def build_imported_case(mesh: TetMesh, params: dict | None = None, *,
                        sigma_contact: float | None = None,
                        dtype=jnp.float64, verbose: bool = True,
                        with_mesh: bool = False) -> Case:
    """Assemble a Case from an imported mesh with ARBITRARY boundary
    numbering.

    Electrode patches are detected geometrically from the params
    placement (active_xy / return_xy / electrode_r_mm) exactly like the
    reference's detect_elec_bc_ids, then the whole face_bcid array is
    renumbered to the canonical 1=active / 2=return / 3=insulated before
    the standard build_case assembly.  Body ids keep the reference's
    convention (1=muscle, 2=fat, 3=skin, 4/5=contact —
    run_layered_sweep.py:128-133); bodies 4/5 get sigma_contact only if
    present in the mesh.
    """
    params = params or default_params("step03_ankle_layers")
    g = params["geometry"]
    Lz = g["Lz"]
    ls = params.get("layers", {})
    t_skin = float(ls.get("t_skin", 0.0))
    t_fat = float(ls.get("t_fat", 0.0))

    pl = get_placement(params)
    shape = pl.get("electrode_shape", pl.get("shape", "circle"))
    e1x, e1y = map(float, pl.get("active_xy", [0.025, g["Ly"] / 2]))
    e2x, e2y = map(float, pl.get("return_xy",
                                 [g["Lx"] - 0.025, g["Ly"] / 2]))
    elec_r = pl.get("electrode_r_mm", 10.0) * 1e-3

    bc1, bc2, a1, a2 = detect_electrode_bcids(
        mesh, (e1x, e1y), (e2x, e2y), elec_r)
    if verbose:
        print(f"  detected electrodes: active bcid {bc1} "
              f"({a1*1e4:.3f} cm^2), return bcid {bc2} "
              f"({a2*1e4:.3f} cm^2)")

    # Renumber to canonical ids (the imported numbering is arbitrary).
    bcid = np.full(mesh.face_bcid.shape, BC_INSULATED, np.int32)
    bcid[mesh.face_bcid == bc1] = BC_ACTIVE
    bcid[mesh.face_bcid == bc2] = BC_RETURN
    import dataclasses
    mesh = dataclasses.replace(mesh, face_bcid=bcid)

    c = params.get("conductivities", {})
    ct = params.get("contact", {})
    if sigma_contact is None:
        sigma_contact = ct.get("sigma_contact_Spm", 0.005)
    bodies_present = set(np.unique(mesh.tet_body).tolist())
    sigma_by_body = {}
    defaults = {1: c.get("sigma_muscle", 0.35),
                2: c.get("sigma_fat", 0.04),
                3: c.get("sigma_skin", 1e-3),
                4: sigma_contact, 5: sigma_contact}
    for b in sorted(bodies_present):
        if int(b) not in defaults:
            raise ValueError(f"mesh body id {int(b)} has no conductivity "
                             f"mapping (known: {sorted(defaults)})")
        sigma_by_body[int(b)] = float(defaults[int(b)])
    contact_enabled = 4 in bodies_present or 5 in bodies_present
    t_contact = (ct.get("t_contact_mm", 0.5) * 1e-3
                 if contact_enabled else 0.0)

    st = get_stim(params)
    mode = st.get("control_mode", "voltage")
    meta_extra = dict(
        elec_shape=shape,
        elec_r=float(elec_r),
        e1_pos=(e1x, e1y, Lz + t_contact),
        e2_pos=(e2x, e2y, Lz + t_contact),
        z_skin_top=float(Lz),
        z_e1_elec_top=Lz + t_contact,
        z_e2_elec_top=Lz + t_contact,
        contact_enabled=contact_enabled,
        t_skin=t_skin,
        t_fat=t_fat,
        compliance_limit_V=float(st.get("compliance_voltage_V", 100.0)),
    )
    case = build_case(
        mesh,
        sigma_by_body,
        mode=mode,
        active_V=1.0,
        injected_current_A=st.get("injected_current_mA", 5.0) * 1e-3,
        meta_extra=meta_extra,
        dtype=dtype,
    )
    if with_mesh:
        # the RENUMBERED mesh (canonical bcids) — host-data source for
        # the AMG hierarchy build (runner.solve_auto / ops/amg.py)
        return case, mesh
    return case


def solve_imported(path, params: dict | None = None, *, tol: float = 1e-8,
                   verbose: bool = True):
    """End-to-end: read mesh -> detect BCs -> assemble -> solve (full
    reference tolerance on any platform) -> full step03 metric dict.

    Returns (case, SolveResult, metrics dict, oriented mesh).  The
    runnable counterpart of the reference's arbitrary-Gmsh-mesh flow
    (run_layered_sweep.py:826-1030); CLI: `apps/meshtool.py solve`.
    """
    from pelvistim_fem_tpu import runner
    from pelvistim_fem_tpu.ops.metrics import extract_results

    params = params or default_params("step03_ankle_layers")
    mesh = read_mesh_any(path)
    mesh = mesh.with_positive_volumes()
    case, mesh_c = build_imported_case(mesh, params,
                                       dtype=runner.preferred_dtype(),
                                       verbose=verbose, with_mesh=True)
    # the canonical-bcid mesh feeds the AMG hierarchy build host-side
    # (lattice-less -> solve_auto routes through ops/amg.py)
    res = runner.solve_auto(case, mesh=mesh_c, tol=tol)
    row = extract_results(case, res.phi, params, verbose=verbose)
    return case, res, row, mesh

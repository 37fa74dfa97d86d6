"""Pelvic multi-tissue workload (stretch configuration).

Schematic transcutaneous sacral-stimulation model: skin/fat/muscle
layers over a visceral core with an embedded low-conductivity sacrum
(super-ellipsoid) and parasacral electrode pair; an S3-root nerve path
feeds the activating-function recruitment metric (ops/nerve.py).
Resolution is a free knob — at lc_global ~1.3 mm the model passes ~1M
tets (BASELINE.json stretch config).

The reference has no pelvic model; this extends its layered-slab family
(step03/step04) with an embedded heterogeneous body, exercising the
same lattice/stencil machinery on 6 tissue types.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.utils.config import (default_params, get_placement,
                                            get_stim)

BODY_CORE = 1
BODY_MUSCLE = 2
BODY_FAT = 3
BODY_SKIN = 4
BODY_BONE = 5
BODY_CONTACT_ACTIVE = 6
BODY_CONTACT_RETURN = 7


def _sacrum_mask(p, x, y, z):
    s = p["sacrum"]
    cx, cy = s["center_xy"]
    n = s.get("power", 3.0)
    r = (np.abs((x - cx) / s["half_width"]) ** n
         + np.abs((y - cy) / s["half_height"]) ** n)
    return (r < 1.0) & (z > s["z_bottom"]) & (z < s["z_top"])


def pelvis_recipe(params: dict | None = None, *, coarse: bool = False,
                  resolution_scale: float = 1.0):
    """LatticeRecipe for the pelvic model — the single source of truth
    for its geometry, shared by the TetMesh path (`recipe.mesh()`) and
    the lattice-spec device-assembly fast path (`build_pelvis_spec`).

    The pelvis-specific body classification (contact id remap 4/5 -> 6/7
    above the skin, sacrum super-ellipsoid -> BODY_BONE) is folded into
    the recipe's body_fn, so it applies to UNDEFORMED cell centroids in
    both paths — the same classify-before-deform convention every other
    lattice model uses (mesh/generate.py build_mesh_from_lattice).

    Returns (recipe, sigma_by_body, params).
    """
    from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe

    params = params or default_params("pelvis")
    g = params["geometry"]
    Lx, Ly, Lz = g["Lx"], g["Ly"], g["Lz"]
    ls = params["layers"]
    t_skin, t_fat, t_muscle = ls["t_skin"], ls["t_fat"], ls["t_muscle"]
    t_core = Lz - t_skin - t_fat - t_muscle
    if t_core <= 1e-4:
        raise ValueError("core thickness <= 0.1 mm — shrink layers")

    pl = get_placement(params)
    e1x, e1y = map(float, pl["active_xy"])
    e2x, e2y = map(float, pl["return_xy"])
    elec_r = pl.get("electrode_r_mm", 15.0) * 1e-3
    shape = pl.get("electrode_shape", "circle")

    ct = params.get("contact", {})
    t_contact = (ct.get("t_contact_mm", 0.5) * 1e-3
                 if ct.get("enabled", True) else 0.0)

    m = params.get("mesh", {})
    scale = (2.0 if coarse else 1.0) * resolution_scale
    lc_elec = m.get("lc_electrode_mm", 2.0) * 1e-3 * scale
    lc_bulk = m.get("lc_global_mm", 4.0) * 1e-3 * scale
    lc_min = m.get("lc_skin_min", 1.0) * 1e-3 * scale

    layers = [
        (BODY_CORE, t_core, lc_bulk),
        (BODY_MUSCLE, t_muscle, lc_bulk),
        (BODY_FAT, t_fat, min(lc_bulk, max(t_fat / 3, lc_min))),
        (BODY_SKIN, t_skin, max(t_skin / 2, lc_min / 2)),
    ]
    base = layered_slab_recipe(
        Lx, Ly, Lz,
        layers=layers,
        electrodes=[(e1x, e1y, elec_r), (e2x, e2y, elec_r)],
        elec_shape=shape,
        contact_t=t_contact,
        contact_h_z=t_contact if t_contact > 0 else None,
        h_fine=lc_elec,
        h_coarse=lc_bulk,
    )
    base_body_fn = base.body_fn

    def body_fn(cx, cy, cz):
        # The generic mesher tags contact cells with
        # core.BODY_CONTACT_ACTIVE/RETURN (4/5), which collide with our
        # skin(4)/bone(5) ids — disambiguate by z (contact sits above
        # Lz) and remap to 6/7; then embed the sacrum by reassigning
        # cells inside the super-ellipsoid.
        body = np.asarray(base_body_fn(cx, cy, cz), np.int32).copy()
        is_contact = cz > Lz + 1e-12
        body[is_contact & (body == core.BODY_CONTACT_ACTIVE)] = \
            BODY_CONTACT_ACTIVE
        body[is_contact & (body == core.BODY_CONTACT_RETURN)] = \
            BODY_CONTACT_RETURN
        sac = _sacrum_mask(params, cx, cy, cz) & ~is_contact & (body > 0)
        body[sac] = BODY_BONE
        return body

    recipe = dataclasses.replace(base, body_fn=body_fn)

    c = params["conductivities"]
    sigma_by_body = {
        BODY_CORE: c["sigma_core"],
        BODY_MUSCLE: c["sigma_muscle"],
        BODY_FAT: c["sigma_fat"],
        BODY_SKIN: c["sigma_skin"],
        BODY_BONE: c["sigma_bone"],
        BODY_CONTACT_ACTIVE: ct.get("sigma_contact_Spm", 0.02),
        BODY_CONTACT_RETURN: ct.get("sigma_contact_Spm", 0.02),
    }
    return recipe, sigma_by_body, params


def build_pelvis_spec(params: dict | None = None, *, coarse: bool = False,
                      resolution_scale: float = 1.0, recipe=None,
                      sigma_by_body=None):
    """Compact LatticeSpec for the pelvic model — feeds the device-side
    assembly (ops/lattice_assembly.solve_lattice_mg_refined): host builds
    only the ~MB-scale spec, one jitted call assembles coefficients + MG
    hierarchy + solves.  The fast path that makes the 6.8M-tet megatet
    configuration a sub-3-s per-case solve (VERDICT round-2 item 2;
    reference analogue: step04's build-once-reuse discipline,
    run_pressure_sweep.py:664-723).

    Pass recipe/sigma_by_body from a prior pelvis_recipe() call to share
    one geometry instance with the TetMesh metrics path."""
    from pelvistim_fem_tpu.mesh.spec import build_lattice_spec

    if recipe is None:
        recipe, sigma_by_body, params = pelvis_recipe(
            params, coarse=coarse, resolution_scale=resolution_scale)
    st = get_stim(params or default_params("pelvis"))
    spec = build_lattice_spec(
        recipe, sigma_by_body,
        mode=st.get("control_mode", "current"),
        injected_current_A=st.get("injected_current_mA", 20.0) * 1e-3)
    return spec, params


def build_pelvis_case(params: dict | None = None, *, coarse: bool = False,
                      resolution_scale: float = 1.0,
                      dtype=jnp.float64, with_mesh: bool = False,
                      to_device: bool = True):
    """Build the pelvic Case.  resolution_scale < 1 refines (0.33 gives
    ~1M tets); coarse=True doubles spacings for smoke runs.
    to_device=False keeps numpy leaves (host-data discipline for
    thermal assembly / metric index prep without device readbacks —
    same contract as build_pressure_case)."""
    recipe, sigma_by_body, params = pelvis_recipe(
        params, coarse=coarse, resolution_scale=resolution_scale)
    mesh = recipe.mesh()

    g = params["geometry"]
    Lz = g["Lz"]
    ls = params["layers"]
    t_skin, t_fat = ls["t_skin"], ls["t_fat"]
    pl = get_placement(params)
    e1x, e1y = map(float, pl["active_xy"])
    e2x, e2y = map(float, pl["return_xy"])
    elec_r = pl.get("electrode_r_mm", 15.0) * 1e-3
    shape = pl.get("electrode_shape", "circle")
    ct = params.get("contact", {})
    t_contact = (ct.get("t_contact_mm", 0.5) * 1e-3
                 if ct.get("enabled", True) else 0.0)

    st = get_stim(params)
    meta_extra = dict(
        elec_shape=shape,
        elec_r=float(elec_r),
        e1_pos=(e1x, e1y, Lz + t_contact),
        e2_pos=(e2x, e2y, Lz + t_contact),
        z_skin_top=float(Lz),
        z_e1_elec_top=Lz + t_contact,
        z_e2_elec_top=Lz + t_contact,
        contact_enabled=t_contact > 0,
        t_skin=float(t_skin),
        t_fat=float(t_fat),
        compliance_limit_V=float(st.get("compliance_voltage_V", 150.0)),
    )
    case = build_case(
        mesh,
        sigma_by_body,
        mode=st.get("control_mode", "current"),
        injected_current_A=st.get("injected_current_mA", 20.0) * 1e-3,
        meta_extra=meta_extra,
        dtype=dtype,
        to_device=to_device,
    )
    if with_mesh:
        return case, params, mesh
    return case, params


def nerve_path(params, n_points=None):
    """S3 root trajectory: a curved waypoint polyline when
    nerve.waypoints_xyz is given (real roots bend around the sacrum),
    else the straight start->end segment."""
    from pelvistim_fem_tpu.ops.nerve import polyline_path, straight_path
    nv = params["nerve"]
    n = n_points or nv.get("n_points", 201)
    wp = nv.get("waypoints_xyz")
    if wp:
        return polyline_path(wp, n)
    return straight_path(nv["start_xyz"], nv["end_xyz"], n)

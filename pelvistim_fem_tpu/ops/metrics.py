"""Post-processed metrics — full parity with the reference extractors.

Replicates, from on-device fields instead of VTU files:
  * surface flux integrals + KCL error   (compute_injected_current,
    step03 run_layered_sweep.py:704-761)
  * auto-expanding spherical ROI stats   (eval_roi, :765-822)
  * skin-surface peak |J| with/without electrode footprints (:849-871)
  * compliance voltage                   (:893-928)
  * the 37-column step03 result dict     (extract_results, :826-1030)
  * step04 extras: contact impedance Z = V/I, charge density
    Q = J*t_pulse*0.1 [mC/cm^2], safety flags (run_pressure_sweep.py:
    528-660)

Device work (gradients, magnitudes, masked reductions) is jax; the final
scalar dict assembly is host-side numpy on gathered values.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.core import BC_ACTIVE, BC_RETURN
from pelvistim_fem_tpu.ops import fields

ROI_EXPANSION = (1.0, 1.5, 2.0, 3.0)  # ref eval_roi multipliers (:796)


def injected_currents(case, phi, sigma_table=None, *, tolerance=0.2,
                      nodal_J=None):
    """Electrode patch currents + KCL flux error.

    The reference integrates over boundary cells within (1+tolerance)*r of
    each electrode center (:714-747); we integrate over the tagged BC faces
    directly — same patches, exact membership.
    Returns dict with I_active/I_return (abs + signed) and flux_err.
    """
    flux = np.asarray(fields.boundary_face_flux(case, phi, sigma_table,
                                                nodal_J=nodal_J))
    bcid = np.asarray(case.face_bcid)
    # Outward-normal convention: injected current at the active electrode
    # flows INTO the domain -> negative outward flux there.
    I_active_signed = float(flux[bcid == BC_ACTIVE].sum())
    I_return_signed = float(flux[bcid == BC_RETURN].sum())
    I_active = abs(I_active_signed)
    I_return = abs(I_return_signed)
    denom = max(I_active, I_return)
    flux_err = (abs(I_active_signed + I_return_signed) / denom
                if denom > 0 else np.nan)
    ia_c, ir_c = fields.consistent_electrode_currents(case, phi, sigma_table)
    ia_c, ir_c = float(ia_c), float(ir_c)
    denom_c = max(abs(ia_c), abs(ir_c))
    return dict(I_active=I_active, I_return=I_return,
                I_active_signed=I_active_signed,
                I_return_signed=I_return_signed, flux_err=flux_err,
                I_active_consistent=ia_c, I_return_consistent=ir_c,
                flux_err_consistent=(abs(ia_c - ir_c) / denom_c
                                     if denom_c > 0 else np.nan))


def eval_roi(case, phi, roi_center, roi_radius, sigma_table=None,
             min_cells=4, smooth_E=True, precomputed=None):
    """Mean |J| and |E| in a sphere, auto-expanding 1/1.5/2/3x until at
    least `min_cells` tets are inside (ref eval_roi contract: never-NaN,
    :765-822).

    smooth_E=True (default) evaluates E through a cell->point->cell
    smoothing pass, reproducing the reference's VTK gradient estimator
    (pyvista compute_derivative on nodal data, :786-789) — near tissue
    interfaces where E jumps 25x this matches the reference's numbers to
    ~6% where the raw per-tet P1 gradient sits ~20% lower (both are
    valid; see PARITY.md).  The raw value is exposed via
    extract_results as roi_mean_E_p1.

    Returns (mean_J, mean_E, n_cells, radius_used, warning_or_None).
    """
    if precomputed is not None:
        cen, Jmag, Emag = precomputed
    else:
        cen = np.asarray(fields.cell_centers(case))
        J = np.asarray(fields.cell_J(case, phi, sigma_table))
        E_cell = fields.cell_E(case, phi)
        if smooth_E:
            E = np.asarray(fields.point_to_cell(
                case, fields.nodal_average(case, E_cell)))
        else:
            E = np.asarray(E_cell)
        Jmag = np.linalg.norm(J, axis=1)
        Emag = np.linalg.norm(E, axis=1)
    dist = np.linalg.norm(cen - np.asarray(roi_center), axis=1)

    warning = None
    radius_used = roi_radius
    mask = dist < roi_radius
    for mult in ROI_EXPANSION:
        r_test = roi_radius * mult
        mask = dist < r_test
        n = int(mask.sum())
        if n >= min_cells:
            radius_used = r_test
            if mult > 1.0:
                warning = (f"ROI radius expanded {mult:.1f}x to "
                           f"{r_test*1000:.1f} mm ({n} cells)")
            break
    else:
        radius_used = roi_radius * ROI_EXPANSION[-1]
        mask = dist < radius_used
        warning = (f"ROI at 3x ({radius_used*1000:.1f} mm) has only "
                   f"{int(mask.sum())} cells — noisy")

    n = int(mask.sum())
    if n == 0:
        return np.nan, np.nan, 0, radius_used, "No cells in ROI even at 3x"
    return (float(Jmag[mask].mean()), float(Emag[mask].mean()), n,
            radius_used, warning)


def _in_footprint(x, y, cx, cy, r, shape):
    if shape == "square":
        return (np.abs(x - cx) < r) & (np.abs(y - cy) < r)
    return np.sqrt((x - cx) ** 2 + (y - cy) ** 2) < r


def skin_peak_J(case, phi, sigma_table=None, nodal_Jmag=None):
    """Peak nodal |J| in the top 20% of the skin layer, with and without
    the electrode footprints (ref :849-871).  Uses nodal-averaged J for
    VTU parity (Elmer writes nodal 'volume current')."""
    meta = case.meta
    pts = np.asarray(case.nodes)
    if nodal_Jmag is not None:
        Jmag = nodal_Jmag
    else:
        Jn = np.asarray(fields.nodal_average(
            case, fields.cell_J(case, phi, sigma_table)))
        Jmag = np.linalg.norm(Jn, axis=1)

    z0_skin = meta.z_skin_top - meta.t_skin
    skin_mask = pts[:, 2] > z0_skin + meta.t_skin * 0.80
    if not skin_mask.any():
        return np.nan, np.nan
    peak_with = float(Jmag[skin_mask].max())
    xp, yp = pts[skin_mask, 0], pts[skin_mask, 1]
    inside = (_in_footprint(xp, yp, meta.e1_pos[0], meta.e1_pos[1],
                            meta.elec_r, meta.elec_shape)
              | _in_footprint(xp, yp, meta.e2_pos[0], meta.e2_pos[1],
                              meta.elec_r, meta.elec_shape))
    outside = ~inside
    peak_no = (float(Jmag[skin_mask][outside].max()) if outside.any()
               else peak_with)
    return peak_with, peak_no


def compliance_voltage(case, phi):
    """Mean potential difference between active and return electrode node
    patches (ref :893-928: nodes with z > z_elec_top - tol within 1.5 r of
    the center).  We use the tagged BC nodes directly — the same patch."""
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    faces = np.asarray(case.faces)
    bcid = np.asarray(case.face_bcid)
    act, ret = electrode_node_masks(faces, bcid, case.nodes.shape[0])
    phi_np = np.asarray(phi)
    if not act.any():
        return np.nan
    v_act = float(phi_np[act].mean())
    v_ret = float(phi_np[ret].mean()) if ret.any() else 0.0
    return v_act - v_ret


def extract_results(case, phi, params, *, sigma_table=None,
                    pressure_label=None, sigma_contact=None,
                    verbose=True):
    """Full metric dict — the union of the reference's step03 37-column
    extract_results (:826-1030) and step04's extras (:528-660).

    `params` is the loaded params.yaml dict (utils.config.load_params).
    """
    meta = case.meta

    # Shared full-mesh fields, computed ONCE (skin peaks, flux, both ROI
    # estimators and layer fractions all reuse these).
    cen = np.asarray(fields.cell_centers(case))
    J_cell = fields.cell_J(case, phi, sigma_table)
    E_cell = fields.cell_E(case, phi)
    Jn_nodal = np.asarray(fields.nodal_average(case, J_cell))
    E_sm = np.asarray(fields.point_to_cell(
        case, fields.nodal_average(case, E_cell)))
    Jmag_cells = np.linalg.norm(np.asarray(J_cell), axis=1)
    Emag_sm = np.linalg.norm(E_sm, axis=1)
    Emag_p1 = np.linalg.norm(np.asarray(E_cell), axis=1)
    Jmag_nodal = np.linalg.norm(Jn_nodal, axis=1)

    peak_with, peak_no = skin_peak_J(case, phi, sigma_table,
                                     nodal_Jmag=Jmag_nodal)

    cur = injected_currents(case, phi, sigma_table, nodal_J=Jn_nodal)

    compliance_V = np.nan
    if meta.mode == "current":
        compliance_V = compliance_voltage(case, phi)

    r_cfg = params["roi"]
    z_nerve = meta.z_skin_top - r_cfg["z_target"]
    roi_cen = np.array([meta.e1_pos[0], meta.e1_pos[1], z_nerve])
    mean_J_roi, mean_E_roi, roi_n, roi_r_used, roi_warn = eval_roi(
        case, phi, roi_cen, r_cfg["roi_radius"], sigma_table,
        precomputed=(cen, Jmag_cells, Emag_sm))
    _, mean_E_p1, *_ = eval_roi(case, phi, roi_cen, r_cfg["roi_radius"],
                                sigma_table, smooth_E=False,
                                precomputed=(cen, Jmag_cells, Emag_p1))

    s = dict(
        peak_with=peak_with, peak_no=peak_no,
        I_active_signed=cur["I_active_signed"],
        I_return_signed=cur["I_return_signed"],
        I_active_consistent=cur["I_active_consistent"],
        I_return_consistent=cur["I_return_consistent"],
        compliance_V=compliance_V,
        mean_J_roi=mean_J_roi, mean_E_roi=mean_E_roi,
        mean_E_p1=mean_E_p1,
        roi_n=roi_n, roi_r_used=roi_r_used, roi_warn=roi_warn,
    )
    return _build_row(meta, params, s, cen=cen,
                      pressure_label=pressure_label,
                      sigma_contact=sigma_contact, verbose=verbose)


def _roi_layer_fractions(cen, roi_cen, roi_r_used, meta):
    """ROI layer fractions (ref :940-959); lane-independent geometry."""
    t_sk, t_fat = meta.t_skin, meta.t_fat
    z_fat_bot = meta.z_skin_top - t_sk - t_fat
    z_fat_top = meta.z_skin_top - t_sk
    dist = np.linalg.norm(cen - roi_cen, axis=1)
    roi_mask = dist < roi_r_used
    if roi_mask.any():
        z_roi = cen[roi_mask, 2]
        n_roi = roi_mask.sum()
        frac_skin = float((z_roi > z_fat_top).sum()) / n_roi
        frac_fat = float(((z_roi > z_fat_bot)
                          & (z_roi <= z_fat_top)).sum()) / n_roi
        frac_muscle = float((z_roi <= z_fat_bot).sum()) / n_roi
    else:
        frac_skin = frac_fat = frac_muscle = np.nan
    return frac_skin, frac_fat, frac_muscle, roi_mask


def _build_row(meta, params, s, *, cen, layer_fracs=None,
               pressure_label=None, sigma_contact=None, verbose=True):
    """Assemble the full row dict from named scalars `s` — shared by the
    serial extract_results and the batched on-device extractor so the
    two paths cannot drift."""
    from pelvistim_fem_tpu.utils.config import get_stim

    st = get_stim(params)
    mode = meta.mode

    I_active_signed = float(s["I_active_signed"])
    I_return_signed = float(s["I_return_signed"])
    I_active = abs(I_active_signed)
    I_return = abs(I_return_signed)
    denom = max(I_active, I_return)
    flux_err = (abs(I_active_signed + I_return_signed) / denom
                if denom > 0 else np.nan)
    ia_c = float(s["I_active_consistent"])
    ir_c = float(s["I_return_consistent"])
    denom_c = max(abs(ia_c), abs(ir_c))
    flux_err_c = abs(ia_c - ir_c) / denom_c if denom_c > 0 else np.nan
    if verbose:
        print(f"    I_active={I_active:.4e} A  I_return={I_return:.4e} A  "
              f"flux_err={flux_err:.2e}")

    # Hard 2% warning for current-mode deviations (ref :883-891).
    if mode == "current" and meta.I_target_A > 0 and np.isfinite(I_active):
        dev = abs(I_active - meta.I_target_A) / meta.I_target_A
        if dev > 0.02 and verbose:
            print(f"    *** CURRENT ERROR > 2%: measured {I_active*1e3:.3f}"
                  f" mA vs target {meta.I_target_A*1e3:.1f} mA "
                  f"({dev:.1%} deviation) ***")

    compliance_V = float(s["compliance_V"])
    exceeded_compliance = False
    if mode == "current" and np.isfinite(compliance_V):
        cmp_lim = st.get("compliance_voltage_V", 100.0)
        exceeded_compliance = bool(compliance_V > cmp_lim)
        if exceeded_compliance and verbose:
            print(f"    WARNING: compliance_V={compliance_V:.1f} V > "
                  f"limit {cmp_lim:.0f} V")

    r_cfg = params["roi"]
    z_nerve = meta.z_skin_top - r_cfg["z_target"]
    roi_cen = np.array([meta.e1_pos[0], meta.e1_pos[1], z_nerve])
    peak_with, peak_no = float(s["peak_with"]), float(s["peak_no"])
    mean_J_roi = float(s["mean_J_roi"])
    mean_E_roi = float(s["mean_E_roi"])
    mean_E_p1 = float(s["mean_E_p1"])
    roi_n, roi_r_used = int(s["roi_n"]), float(s["roi_r_used"])
    if s.get("roi_warn") and verbose:
        print(f"    ROI: {s['roi_warn']}")

    t_sk, t_fat = meta.t_skin, meta.t_fat
    z_fat_bot = meta.z_skin_top - t_sk - t_fat
    z_fat_top = meta.z_skin_top - t_sk
    if layer_fracs is not None:      # lane-independent, precomputed
        frac_skin, frac_fat, frac_muscle = layer_fracs
    else:
        frac_skin, frac_fat, frac_muscle, _ = _roi_layer_fractions(
            cen, roi_cen, roi_r_used, meta)

    area = (np.pi * meta.elec_r ** 2 if meta.elec_shape == "circle"
            else (2 * meta.elec_r) ** 2)
    efficiency = (float(mean_E_roi) / peak_no
                  if (np.isfinite(mean_E_roi) and np.isfinite(peak_no)
                      and peak_no > 0) else np.nan)
    I_ref = I_active if np.isfinite(I_active) and I_active > 0 else np.nan

    def _norm(v):
        v = float(v)
        return v / I_ref if np.isfinite(v) and np.isfinite(I_ref) else np.nan

    roi_layer = ("skin" if z_nerve > z_fat_top
                 else "fat" if z_nerve > z_fat_bot else "muscle")

    def _r(v, nd):
        v = float(v)
        return round(v, nd) if np.isfinite(v) else v

    cur = dict(I_active_signed=I_active_signed,
               I_return_signed=I_return_signed,
               I_active_consistent=ia_c, I_return_consistent=ir_c,
               flux_err_consistent=flux_err_c)
    c = params.get("conductivities", {})
    out = {
        "t_fat_mm": _r(t_fat * 1000, 2),
        "elec_r_mm": _r(meta.elec_r * 1000, 2),
        "elec_area_cm2": _r(area * 1e4, 4),
        "elec_area_mesh_cm2": _r(meta.elec_area_mesh * 1e4, 4),
        "return_area_mesh_cm2": _r(meta.return_area_mesh * 1e4, 4),
        "elec_shape": meta.elec_shape,
        "contact_enabled": meta.contact_enabled,
        "sigma_skin": c.get("sigma_skin"),
        "control_mode": mode,
        "jn_used": _r(meta.jn_used, 4) if meta.jn_used else None,
        "peak_J_skin_with_elec": _r(peak_with, 6),
        "peak_J_skin_no_elec": _r(peak_no, 6),
        "roi_mean_J": _r(mean_J_roi, 6),
        "roi_mean_E": _r(mean_E_roi, 4),
        "efficiency": _r(efficiency, 6),
        "compliance_V": _r(compliance_V, 3),
        "exceeded_compliance": exceeded_compliance,
        "total_current_A": _r(I_active, 8),
        "I_active_signed_A": _r(cur["I_active_signed"], 8),
        "I_return_A": _r(I_return, 8),
        "I_return_signed_A": _r(cur["I_return_signed"], 8),
        "peak_J_skin_per_A": _r(_norm(peak_no), 4),
        "roi_mean_J_per_A": _r(_norm(mean_J_roi), 4),
        "roi_mean_E_per_A": _r(_norm(mean_E_roi), 4),
        "efficiency_per_A": _r(efficiency, 6),
        "flux_err": _r(flux_err, 6),
        # Framework extras (no reference equivalent): exact discrete
        # electrode currents from the weak-form reaction.
        "roi_mean_E_p1": _r(mean_E_p1, 4),
        "I_active_consistent_A": _r(cur["I_active_consistent"], 10),
        "I_return_consistent_A": _r(cur["I_return_consistent"], 10),
        "flux_err_consistent": _r(cur["flux_err_consistent"], 10),
        "roi_layer": roi_layer,
        "roi_n_cells": roi_n,
        "roi_radius_used_mm": _r(roi_r_used * 1000, 2),
        "roi_center_z_mm": _r(z_nerve * 1000, 3),
        "dist_fat_muscle_mm": _r(abs(z_nerve - z_fat_bot) * 1000, 3),
        "roi_frac_muscle": _r(frac_muscle, 4),
        "roi_frac_fat": _r(frac_fat, 4),
        "roi_frac_skin": _r(frac_skin, 4),
        "active_boundary_id_used": BC_ACTIVE,
        "return_boundary_id_used": BC_RETURN,
    }

    # step04 extras (run_pressure_sweep.py:595-660).
    if pressure_label is not None or sigma_contact is not None:
        contact_Z = (float(compliance_V / I_active)
                     if (np.isfinite(compliance_V) and np.isfinite(I_active)
                         and I_active > 0) else np.nan)
        pw_us = st.get("pulse_width_us", 200.0)
        # C/m^2 -> mC/cm^2 is a factor 0.1 (ref comment :618-621).
        charge_density = (float(peak_with * pw_us * 1e-6 * 0.1)
                          if np.isfinite(peak_with) else np.nan)
        limit = params.get("safety", {}).get(
            "charge_density_limit_mC_cm2", 1.0)
        out.update({
            "pressure_label": pressure_label,
            "sigma_contact_Spm": sigma_contact,
            "contact_impedance_ohm": _r(contact_Z, 1),
            "jn_used_A_m2": _r(meta.jn_used, 6),
            "charge_density_mC_cm2": _r(charge_density, 6),
            "exceeds_charge_limit": bool(np.isfinite(charge_density)
                                         and charge_density > limit),
            "pulse_width_us": pw_us,
            "frequency_Hz": st.get("frequency_Hz", 10.0),
        })
    return out


_SCALAR_KEYS = ("I_active_signed", "I_return_signed",
                "I_active_consistent", "I_return_consistent",
                "peak_with", "peak_no", "mean_J_roi", "mean_E_roi",
                "mean_E_p1", "compliance_V")


def _batched_metric_scalars(case, phis, sigma_tables, masks):
    """Jitted vmapped per-lane metric scalars as a dict of (L,) numpy
    arrays.  The jitted kernel is module-level (not a per-call closure)
    so repeated extractions hit the jit cache — on the axon TPU backend
    a re-trace costs a ~30 s remote recompile per call."""
    stacked = np.asarray(
        _batched_metric_scalars_jit(case, phis, sigma_tables, masks))
    return {k: stacked[j] for j, k in enumerate(_SCALAR_KEYS)}


@jax.jit
def _batched_metric_scalars_jit(case, phis, sigma_tables, masks):
    def mmean(x, m, n):
        return jnp.sum(jnp.where(m, x, 0.0)) / n

    def lane(phi, sig):
        J_cell = fields.cell_J(case, phi, sig)
        E_cell = fields.cell_E(case, phi)
        Jn = fields.nodal_average(case, J_cell)
        E_sm = fields.point_to_cell(case,
                                    fields.nodal_average(case, E_cell))
        Jmag_n = jnp.linalg.norm(Jn, axis=1)
        Jmag_c = jnp.linalg.norm(J_cell, axis=1)
        Emag_sm = jnp.linalg.norm(E_sm, axis=1)
        Emag_p1 = jnp.linalg.norm(E_cell, axis=1)

        # surface flux (nodal VTK-parity scheme, boundary_face_flux)
        Jf = Jn[case.faces].mean(axis=1)
        flux = jnp.sum(Jf * case.face_normal, axis=1) * case.face_area
        Ia_s = jnp.sum(jnp.where(masks["face_act"], flux, 0.0))
        Ir_s = jnp.sum(jnp.where(masks["face_ret"], flux, 0.0))
        ia_c, ir_c = fields.consistent_electrode_currents(case, phi, sig)

        neg = jnp.asarray(-jnp.inf, Jmag_n.dtype)
        peak_with = jnp.max(jnp.where(masks["skin"], Jmag_n, neg))
        peak_no = jnp.max(jnp.where(masks["skin_no"], Jmag_n, neg))

        n_roi = jnp.maximum(jnp.sum(masks["roi"]), 1)
        mean_J = mmean(Jmag_c, masks["roi"], n_roi)
        mean_E = mmean(Emag_sm, masks["roi"], n_roi)
        mean_E_p1 = mmean(Emag_p1, masks["roi"], n_roi)

        n_act = jnp.maximum(jnp.sum(masks["act"]), 1)
        n_ret = jnp.maximum(jnp.sum(masks["ret"]), 1)
        compliance = (mmean(phi, masks["act"], n_act)
                      - mmean(phi, masks["ret"], n_ret))
        return dict(I_active_signed=Ia_s, I_return_signed=Ir_s,
                    I_active_consistent=ia_c, I_return_consistent=ir_c,
                    peak_with=peak_with, peak_no=peak_no,
                    mean_J_roi=mean_J, mean_E_roi=mean_E,
                    mean_E_p1=mean_E_p1, compliance_V=compliance)

    vals = jax.vmap(lane)(phis, sigma_tables)
    # ONE stacked output: per-array device->host readbacks each pay the
    # axon tunnel's latency
    return jnp.stack([vals[k] for k in _SCALAR_KEYS])


def extract_results_batched(case, phis, params, *, sigma_tables=None,
                            pressure_labels=None, sigma_contacts=None,
                            verbose=False):
    """Batched extract_results: ALL sweep lanes' metrics in ONE jitted
    vmapped device pass + a single host gather of (L,)-scalars.

    The serial extractor transfers several full-mesh fields to the host
    per lane; at 100 lanes that dominates end-to-end sweep time (VERDICT
    round-1 item 5).  Here the only lane-dependent host data are the
    final scalars.  Lane-INDEPENDENT geometry (ROI mask with the
    reference's auto-expansion, skin/footprint masks, electrode node
    masks) is computed once on the host; rows come out of the same
    _build_row as the serial path, so columns cannot drift.
    Reference analogue: extract_results per case,
    run_layered_sweep.py:826-1030.
    """
    meta = case.meta
    L = phis.shape[0]
    if sigma_tables is None:
        sigma_tables = jnp.broadcast_to(jnp.asarray(case.sigma_table),
                                        (L,) + case.sigma_table.shape)

    geom = _metric_geometry(case, params)
    out = _batched_metric_scalars(case, phis, sigma_tables,
                                  geom["masks"])
    # degenerate-mask parity with the serial path: empty ROI / skin
    # masks yield NaN there (eval_roi n==0, skin_peak_J no-skin), not
    # masked 0.0 / -inf
    if geom["roi_n"] == 0:
        for k in ("mean_J_roi", "mean_E_roi", "mean_E_p1"):
            out[k] = np.full_like(out[k], np.nan)
    if geom["skin_empty"]:
        out["peak_with"] = np.full_like(out["peak_with"], np.nan)
        out["peak_no"] = np.full_like(out["peak_no"], np.nan)

    rows = []
    for i in range(L):
        s = {k: v[i] for k, v in out.items()}
        if meta.mode != "current":
            s["compliance_V"] = np.nan
        s.update(roi_n=geom["roi_n"], roi_r_used=geom["roi_r_used"],
                 roi_warn=geom["roi_warn"])
        rows.append(_build_row(
            meta, params, s, cen=geom["cen"],
            layer_fracs=geom["layer_fracs"],
            pressure_label=(pressure_labels[i] if pressure_labels
                            else None),
            sigma_contact=(sigma_contacts[i] if sigma_contacts is not None
                           else None),
            verbose=verbose))
    return rows


def _metric_geometry(case, params):
    """Lane-independent extraction geometry (ROI mask with the
    reference's auto-expansion, skin/footprint masks, electrode node
    masks, layer fractions), CACHED on the case instance: recomputing it
    per call would read the device-resident mesh arrays back over the
    axon tunnel every sweep (~0.5 s), and it never changes for a given
    (case, roi config)."""
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks

    meta = case.meta
    r_cfg = params["roi"]
    key = (float(r_cfg["roi_radius"]), float(r_cfg["z_target"]))
    cached = getattr(case, "_metric_geom_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]

    nodes = np.asarray(case.nodes)
    tets_np = np.asarray(case.tets)
    cen = nodes[tets_np].mean(axis=1)
    z_nerve = meta.z_skin_top - r_cfg["z_target"]
    roi_cen = np.array([meta.e1_pos[0], meta.e1_pos[1], z_nerve])
    dist = np.linalg.norm(cen - roi_cen, axis=1)
    # reference auto-expansion (eval_roi contract, :765-822)
    roi_r_used = r_cfg["roi_radius"] * ROI_EXPANSION[-1]
    roi_warn = None
    for mult in ROI_EXPANSION:
        if int((dist < r_cfg["roi_radius"] * mult).sum()) >= 4:
            roi_r_used = r_cfg["roi_radius"] * mult
            if mult > 1.0:
                roi_warn = (f"ROI radius expanded {mult:.1f}x to "
                            f"{roi_r_used*1000:.1f} mm")
            break
    roi_mask = dist < roi_r_used
    roi_n = int(roi_mask.sum())

    z0_skin = meta.z_skin_top - meta.t_skin
    skin_mask = nodes[:, 2] > z0_skin + meta.t_skin * 0.80
    xp, yp = nodes[:, 0], nodes[:, 1]
    in_fp = (_in_footprint(xp, yp, meta.e1_pos[0], meta.e1_pos[1],
                           meta.elec_r, meta.elec_shape)
             | _in_footprint(xp, yp, meta.e2_pos[0], meta.e2_pos[1],
                             meta.elec_r, meta.elec_shape))
    skin_no = skin_mask & ~in_fp
    if not skin_no.any():
        skin_no = skin_mask
    faces_np = np.asarray(case.faces)
    bcid_np = np.asarray(case.face_bcid)
    act_nodes, ret_nodes = electrode_node_masks(faces_np, bcid_np,
                                                nodes.shape[0])
    face_act = bcid_np == BC_ACTIVE
    face_ret = bcid_np == BC_RETURN

    dev = lambda a: jnp.asarray(a)
    geom = dict(
        masks=dict(
            roi=dev(roi_mask), skin=dev(skin_mask), skin_no=dev(skin_no),
            act=dev(act_nodes), ret=dev(ret_nodes),
            face_act=dev(face_act), face_ret=dev(face_ret)),
        cen=cen, roi_n=roi_n, roi_r_used=roi_r_used, roi_warn=roi_warn,
        skin_empty=not bool(skin_mask.any()),   # host flag (bool-array
                                                # readbacks stall axon)
        layer_fracs=_roi_layer_fractions(cen, roi_cen, roi_r_used,
                                         meta)[:3],
    )
    object.__setattr__(case, "_metric_geom_cache", (key, geom))
    return geom

"""Publication figure families.

Re-creations of the reference's figure set from on-device fields instead
of VTU files:
  plot_step01_summary      — C6  (step01_box/visualize.py)
  plot_step02_sweep        — C9  (step02 run_sweep.py:346-472)
  plot_J_surface_maps      — C21 (plot_layered_results.py:97-347)
  plot_summary_metrics     — C22 (plot_layered_results.py:351-476)
  plot_depth_slice_E_maps  — C24 (plot_layered_results.py:572-749)
  plot_model_diagram       — C25 (plot_layered_results.py:753-1176)
  plot_pressure_results    — C29 (step04 plot_pressure_results.py:33-171)

All functions take in-memory solved data (case, mesh, phi) and/or summary
rows; figures are written as PNG into `out_dir`.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import matplotlib.tri as mtri  # noqa: E402
from matplotlib.colors import LogNorm, Normalize  # noqa: E402


def _save(fig, out_dir, name, **kw):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / name
    fig.savefig(path, dpi=150, bbox_inches="tight", **kw)
    plt.close(fig)
    print(f"  figure -> {path}")
    return path


def _nodal_Jmag(case, phi):
    from pelvistim_fem_tpu.ops import fields
    J = np.asarray(fields.nodal_average(case, fields.cell_J(case, phi)))
    return np.linalg.norm(J, axis=1)


# ── step01 (C6) ───────────────────────────────────────────────────────────────

def plot_step01_summary(case, mesh, phi, out_dir):
    """2x3 summary: V(z) vs analytic, |J| histogram, phi / |J| mid-slices,
    flux balance, metric table."""
    from pelvistim_fem_tpu.ops import fields
    pts = mesh.nodes
    phi_np = np.asarray(phi, np.float64)
    Jmag = _nodal_Jmag(case, phi)
    Lz = pts[:, 2].max()

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))

    ax = axes[0, 0]
    ax.plot(pts[:, 2] * 100, phi_np, ".", ms=1, alpha=0.3,
            label="FEM nodes")
    zz = np.linspace(0, Lz, 50)
    ax.plot(zz * 100, zz / Lz, "r--", lw=1.5, label="analytic z/Lz")
    ax.set_xlabel("z (cm)"); ax.set_ylabel("V (V)")
    ax.set_title("Potential profile"); ax.legend()

    ax = axes[0, 1]
    ax.hist(Jmag, bins=60, color="steelblue")
    ax.axvline(10.0, color="r", ls="--", label="analytic 10 A/m$^2$")
    ax.set_xlabel("|J| (A/m$^2$)"); ax.set_title("|J| distribution")
    ax.legend()

    ym = np.median(np.unique(pts[:, 1]))
    sl = np.abs(pts[:, 1] - ym) < 1e-9
    for ax, vals, name in [(axes[0, 2], phi_np, "V (V)"),
                           (axes[1, 0], Jmag, "|J| (A/m$^2$)")]:
        tri = mtri.Triangulation(pts[sl, 0] * 100, pts[sl, 2] * 100)
        tc = ax.tricontourf(tri, vals[sl], levels=30, cmap="viridis")
        fig.colorbar(tc, ax=ax, label=name)
        ax.set_xlabel("x (cm)"); ax.set_ylabel("z (cm)")
        ax.set_title(f"{name} at y mid-plane")

    ax = axes[1, 1]
    flux = np.asarray(fields.boundary_face_flux(case, phi))
    bcid = mesh.face_bcid
    vals = [abs(flux[bcid == 1].sum()), abs(flux[bcid == 2].sum()),
            abs(flux[bcid == 3].sum())]
    ax.bar(["top", "bottom", "sides"], vals, color=["C0", "C1", "C2"])
    ax.set_ylabel("|I| (A)"); ax.set_title("Boundary flux balance")

    ax = axes[1, 2]
    ax.axis("off")
    rows = [("nodes", f"{case.n_nodes}"), ("tets", f"{case.n_tets}"),
            ("mean |J|", f"{Jmag.mean():.6f} A/m$^2$"),
            ("CV |J|", f"{Jmag.std()/Jmag.mean():.2e}"),
            ("I top/bottom", f"{vals[0]:.3e} / {vals[1]:.3e} A")]
    ax.table(cellText=rows, loc="center", colWidths=[0.4, 0.6])
    ax.set_title("Metrics")

    fig.suptitle("step01 — analytic box baseline")
    return _save(fig, out_dir, "step01_summary.png")


# ── step02 (C9) ───────────────────────────────────────────────────────────────

def plot_step02_sweep(rows, maps, params, out_dir):
    """4x2 |J| heatmap grid with a shared log-percentile color scale +
    peak/mean-J vs electrode area summary (ref run_sweep.py:346-472)."""
    all_J = np.concatenate([J for _, _, J in maps.values()])
    vmin = np.percentile(all_J[all_J > 0], 1)
    vmax = np.percentile(all_J, 99.5)
    norm = LogNorm(vmin=max(vmin, 1e-6), vmax=vmax)

    n = len(maps)
    ncols = max(1, (n + 1) // 2)
    fig, axes = plt.subplots(2, ncols, figsize=(3.2 * ncols, 7),
                             squeeze=False)
    for ax, (label, (x, y, J)) in zip(axes.flat, maps.items()):
        tri = mtri.Triangulation(x * 100, y * 100)
        tc = ax.tricontourf(tri, np.maximum(J, norm.vmin), levels=40,
                            cmap="inferno", norm=norm)
        ax.set_title(label, fontsize=9)
        ax.set_aspect("equal")
    for ax in axes.flat[len(maps):]:
        ax.axis("off")
    fig.colorbar(tc, ax=axes, label="|J| (A/m$^2$)", shrink=0.8)
    fig.suptitle("step02 — top-surface |J| by electrode shape/size")
    _save(fig, out_dir, "sweep_J_maps.png")

    fig, ax = plt.subplots(figsize=(7, 5))
    for shape in sorted({r["shape"] for r in rows}):
        rs = [r for r in rows if r["shape"] == shape]
        areas = [r["area_cm2"] for r in rs]
        ax.loglog(areas, [r["peak_J"] for r in rs], "o-",
                  label=f"{shape} peak")
        ax.loglog(areas, [r["mean_J_top"] for r in rs], "s--",
                  label=f"{shape} mean")
    ax.set_xlabel("electrode area (cm$^2$)")
    ax.set_ylabel("|J| (A/m$^2$)")
    ax.set_title("Current density vs electrode area")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    return _save(fig, out_dir, "sweep_summary.png")


# ── step03 (C21) ──────────────────────────────────────────────────────────────

def _skin_surface_scatter(case, mesh, phi):
    """(x, y, |J|) on the top 20% of the skin layer (the reference plots
    nodal |J| at the skin surface)."""
    meta = case.meta
    pts = mesh.nodes
    z0 = meta.z_skin_top - meta.t_skin
    m = pts[:, 2] > z0 + meta.t_skin * 0.8
    Jmag = _nodal_Jmag(case, phi)
    return pts[m, 0], pts[m, 1], Jmag[m]


def plot_J_surface_maps(solutions, params, out_dir, *,
                        vmax_percentile=99.95):
    """Per-case skin-surface |J| maps with a GLOBAL percentile color scale
    across all cases (ref :117-139), in linear, log, and electrode-masked
    variants per the plotting config (params.yaml:96-99)."""
    data = []
    all_J = []
    for label, case, mesh, phi in solutions:
        x, y, J = _skin_surface_scatter(case, mesh, phi)
        data.append((label, case, x, y, J))
        all_J.append(J)
    all_J = np.concatenate(all_J)
    vmax = np.percentile(all_J, vmax_percentile)
    vmin = max(np.percentile(all_J[all_J > 0], 0.5), vmax * 1e-4)

    plot_cfg = params.get("plotting", {})
    variants = [("linear", Normalize(0, vmax), "J_surface_maps.png")]
    if plot_cfg.get("log_norm", True):
        variants.append(("log", LogNorm(vmin, vmax),
                         "J_surface_maps_log.png"))
    if plot_cfg.get("make_masked", True):
        variants.append(("masked", Normalize(0, vmax),
                         "J_surface_maps_masked.png"))

    n = len(data)
    ncols = min(3, n)
    nrows = -(-n // ncols)
    out_paths = []
    for kind, norm, fname in variants:
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(4.2 * ncols, 3.6 * nrows),
                                 squeeze=False)
        tc = None
        for ax, (label, case, x, y, J) in zip(axes.flat, data):
            Jp = J.copy()
            meta = case.meta
            if kind == "masked":
                for cx, cy, _ in (meta.e1_pos, meta.e2_pos):
                    if meta.elec_shape == "square":
                        inside = ((np.abs(x - cx) < meta.elec_r)
                                  & (np.abs(y - cy) < meta.elec_r))
                    else:
                        inside = np.hypot(x - cx, y - cy) < meta.elec_r
                    Jp[inside] = np.nan
            tri = mtri.Triangulation(x * 1000, y * 1000)
            good = ~np.isnan(Jp)
            if kind == "log":
                Jp = np.maximum(Jp, norm.vmin)
            tc = ax.tricontourf(
                mtri.Triangulation(x[good] * 1000, y[good] * 1000),
                Jp[good], levels=40, cmap="inferno", norm=norm)
            if kind == "masked" and good.sum() > 10:
                # 10/25/50% of vmax contours (ref :307-320)
                try:
                    ax.tricontour(
                        mtri.Triangulation(x[good] * 1000,
                                           y[good] * 1000),
                        Jp[good], levels=[0.1 * vmax, 0.25 * vmax,
                                          0.5 * vmax],
                        colors="cyan", linewidths=0.7)
                except Exception:
                    pass
            for cx, cy, _ in (meta.e1_pos, meta.e2_pos):
                circ = plt.Circle((cx * 1000, cy * 1000),
                                  meta.elec_r * 1000, fill=False,
                                  color="lime", lw=1.2)
                ax.add_patch(circ)
            ax.set_title(label, fontsize=9)
            ax.set_aspect("equal")
            ax.set_xlabel("x (mm)"); ax.set_ylabel("y (mm)")
        for ax in axes.flat[n:]:
            ax.axis("off")
        if tc is not None:
            fig.colorbar(tc, ax=axes, label="|J| (A/m$^2$)", shrink=0.8)
        fig.suptitle(f"Skin-surface |J| — {kind} scale")
        out_paths.append(_save(fig, out_dir, fname))
    return out_paths


# ── step03 (C22) ──────────────────────────────────────────────────────────────

def plot_summary_metrics(rows, params, out_dir):
    """2x3 summary panels: peak J / ROI E / efficiency vs sweep axes, and
    the mode-dependent row (current verification, E/I transfer,
    compliance vs limit) — ref :351-476."""
    from pelvistim_fem_tpu.utils.config import get_stim
    st = get_stim(params)
    mode = st.get("control_mode", "voltage")
    fats = sorted({r["t_fat_mm"] for r in rows})
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))

    def series(key):
        for f in fats:
            rs = sorted((r for r in rows if r["t_fat_mm"] == f),
                        key=lambda r: r["elec_r_mm"])
            yield f, [r["elec_r_mm"] for r in rs], [r.get(key) for r in rs]

    panels = [("peak_J_skin_no_elec", "peak |J| skin (A/m$^2$)"),
              ("roi_mean_E", "ROI mean |E| (V/m)"),
              ("efficiency", "efficiency (m)")]
    for ax, (key, name) in zip(axes[0], panels):
        for f, xs, ys in series(key):
            ax.plot(xs, ys, "o-", label=f"fat {f:.0f} mm")
        ax.set_xlabel("electrode radius (mm)"); ax.set_ylabel(name)
        ax.grid(alpha=0.3); ax.legend(fontsize=8)

    if mode == "current":
        I_target = st.get("injected_current_mA", 5.0)
        ax = axes[1, 0]
        for f, xs, ys in series("total_current_A"):
            ax.plot(xs, [y * 1e3 for y in ys], "o-",
                    label=f"fat {f:.0f} mm")
        ax.axhline(I_target, color="r", ls="--",
                   label=f"target {I_target:.1f} mA")
        ax.set_xlabel("electrode radius (mm)")
        ax.set_ylabel("delivered I (mA)")
        ax.set_title("Current verification"); ax.legend(fontsize=8)

        ax = axes[1, 1]
        for f, xs, ys in series("roi_mean_E_per_A"):
            ax.plot(xs, ys, "o-", label=f"fat {f:.0f} mm")
        ax.set_xlabel("electrode radius (mm)")
        ax.set_ylabel("ROI |E| per A (V/m/A)")
        ax.set_title("Transfer function"); ax.legend(fontsize=8)

        ax = axes[1, 2]
        lim = st.get("compliance_voltage_V", 100.0)
        for f, xs, ys in series("compliance_V"):
            ax.plot(xs, ys, "o-", label=f"fat {f:.0f} mm")
        ax.axhline(lim, color="r", ls="--", label=f"limit {lim:.0f} V")
        ax.set_xlabel("electrode radius (mm)")
        ax.set_ylabel("compliance V (V)")
        ax.set_title("Compliance voltage"); ax.legend(fontsize=8)
    else:
        for ax, (key, name) in zip(
                axes[1], [("peak_J_skin_per_A", "peak J per A"),
                          ("roi_mean_J_per_A", "ROI J per A"),
                          ("roi_mean_E_per_A", "ROI E per A")]):
            for f, xs, ys in series(key):
                ax.plot(xs, ys, "o-", label=f"fat {f:.0f} mm")
            ax.set_xlabel("electrode radius (mm)"); ax.set_ylabel(name)
            ax.grid(alpha=0.3); ax.legend(fontsize=8)

    for ax in axes.flat:
        ax.grid(alpha=0.3)
    fig.suptitle("step03 — summary metrics")
    return _save(fig, out_dir, "summary_metrics.png")


# ── step03 (C24) ──────────────────────────────────────────────────────────────

def plot_depth_slice_E_maps(solutions, params, out_dir):
    """Per-case |E| map on the z-slice at nerve depth, with the ROI circle
    (ref :572-749).  Uses cell values on cells straddling the slice."""
    from pelvistim_fem_tpu.ops import fields
    r_cfg = params["roi"]
    n = len(solutions)
    ncols = min(3, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4.2 * ncols, 3.6 * nrows),
                             squeeze=False)
    tc = None
    for ax, (label, case, mesh, phi) in zip(axes.flat, solutions):
        meta = case.meta
        z_n = meta.z_skin_top - r_cfg["z_target"]
        cen = np.asarray(fields.cell_centers(case))
        E = np.asarray(fields.cell_E(case, phi))
        Emag = np.linalg.norm(E, axis=1)
        dz = np.abs(cen[:, 2] - z_n)
        sl = dz < np.partition(dz, 2000)[2000] if len(dz) > 2000 else \
            dz < np.median(dz)
        tri = mtri.Triangulation(cen[sl, 0] * 1000, cen[sl, 1] * 1000)
        tc = ax.tricontourf(tri, Emag[sl], levels=40, cmap="viridis")
        circ = plt.Circle((meta.e1_pos[0] * 1000, meta.e1_pos[1] * 1000),
                          r_cfg["roi_radius"] * 1000, fill=False,
                          color="r", lw=1.2, label="ROI")
        ax.add_patch(circ)
        ax.set_title(f"{label}  z={z_n*1000:.0f} mm", fontsize=9)
        ax.set_aspect("equal")
    for ax in axes.flat[n:]:
        ax.axis("off")
    if tc is not None:
        fig.colorbar(tc, ax=axes, label="|E| (V/m)", shrink=0.8)
    fig.suptitle("|E| at nerve depth")
    return _save(fig, out_dir, "depth_slice_E_maps.png")


# ── step03 (C25) ──────────────────────────────────────────────────────────────

def plot_model_diagram(case, mesh, phi, params, out_dir):
    """Anatomy explainer: x-z side view with layers + ROI, top view with
    electrodes, and the data-driven |J|-vs-depth profile under the active
    electrode (ref :753-1176, profile at :992-1016)."""
    meta = case.meta
    g = params["geometry"]
    Lx, Ly, Lz = g["Lx"], g["Ly"], g["Lz"]
    t_sk, t_fat = meta.t_skin, meta.t_fat
    z_fat_top = Lz - t_sk
    z_fat_bot = z_fat_top - t_fat
    r_cfg = params["roi"]
    z_nerve = Lz - r_cfg["z_target"]

    fig, axes = plt.subplots(1, 3, figsize=(16, 4.6))

    ax = axes[0]
    for z0, z1, color, name in [(0, z_fat_bot, "#c26d5c", "muscle"),
                                (z_fat_bot, z_fat_top, "#ffe08a", "fat"),
                                (z_fat_top, Lz, "#e8b88a", "skin")]:
        ax.fill_between([0, Lx * 1000], z0 * 1000, z1 * 1000,
                        color=color, alpha=0.8)
        ax.text(Lx * 1000 * 0.01, (z0 + z1) / 2 * 1000, name, fontsize=9)
    for cx, _, _ in (meta.e1_pos, meta.e2_pos):
        ax.plot([(cx - meta.elec_r) * 1000, (cx + meta.elec_r) * 1000],
                [Lz * 1000 + 0.4] * 2, "k-", lw=4)
    roi = plt.Circle((meta.e1_pos[0] * 1000, z_nerve * 1000),
                     r_cfg["roi_radius"] * 1000, fill=False, color="r",
                     lw=1.5)
    ax.add_patch(roi)
    ax.annotate("ROI (tibial nerve)", (meta.e1_pos[0] * 1000,
                                       z_nerve * 1000),
                textcoords="offset points", xytext=(20, -16), color="r")
    ax.set_xlabel("x (mm)"); ax.set_ylabel("z (mm)")
    ax.set_title("Side view (x-z)")
    ax.set_aspect("equal")

    ax = axes[1]
    ax.add_patch(plt.Rectangle((0, 0), Lx * 1000, Ly * 1000,
                               fill=True, color="#e8b88a", alpha=0.6))
    for (cx, cy, _), name in [(meta.e1_pos, "active"),
                              (meta.e2_pos, "return")]:
        circ = plt.Circle((cx * 1000, cy * 1000), meta.elec_r * 1000,
                          color="k", fill=False, lw=2)
        ax.add_patch(circ)
        ax.text(cx * 1000, cy * 1000, name, ha="center", fontsize=9)
    ax.set_xlim(-2, Lx * 1000 + 2); ax.set_ylim(-2, Ly * 1000 + 2)
    ax.set_aspect("equal")
    ax.set_xlabel("x (mm)"); ax.set_ylabel("y (mm)")
    ax.set_title("Top view")

    ax = axes[2]
    pts = mesh.nodes
    Jmag = _nodal_Jmag(case, phi)
    under = (np.hypot(pts[:, 0] - meta.e1_pos[0],
                      pts[:, 1] - meta.e1_pos[1]) < meta.elec_r)
    depth = (Lz - pts[under, 2]) * 1000
    Ju = Jmag[under]
    bins = np.linspace(0, max(depth.max(), 1), 30)
    idx = np.digitize(depth, bins)
    prof = [Ju[idx == i].mean() if (idx == i).any() else np.nan
            for i in range(1, len(bins))]
    ax.plot(prof, 0.5 * (bins[1:] + bins[:-1]), "o-")
    ax.invert_yaxis()
    for z, name in [((Lz - z_fat_top) * 1000, "skin/fat"),
                    ((Lz - z_fat_bot) * 1000, "fat/muscle"),
                    ((Lz - z_nerve) * 1000, "nerve depth")]:
        ax.axhline(z, color="gray", ls="--", lw=0.8)
        ax.text(ax.get_xlim()[1], z, f" {name}", fontsize=8, va="center")
    ax.set_xlabel("mean |J| (A/m$^2$)"); ax.set_ylabel("depth (mm)")
    ax.set_title("|J| vs depth under active electrode")

    fig.suptitle("step03 — model diagram")
    return _save(fig, out_dir, "model_diagram.png")


# ── step04 (C29) ──────────────────────────────────────────────────────────────

def plot_pressure_results(rows, params, out_dir):
    """4 dark-theme panels vs sigma_contact (log-x): compliance w/ device
    limit + shading, impedance (log-log), charge density w/ safety limit,
    ROI |E| w/ nerve threshold + shading (ref step04
    plot_pressure_results.py:33-171)."""
    ps = params.get("pressure_sweep", {})
    comp_lim = ps.get("device_compliance_limit_V", 100.0)
    nerve_thr = ps.get("nerve_threshold_V_per_m", 10.0)
    q_lim = params.get("safety", {}).get("charge_density_limit_mC_cm2",
                                         1.0)
    x = [r["sigma_contact_Spm"] for r in rows]
    comp = [r["compliance_V"] for r in rows]
    Z = [r["contact_impedance_ohm"] for r in rows]
    q = [r["charge_density_mC_cm2"] for r in rows]
    roiE = [r["roi_mean_E"] for r in rows]

    fig, axes = plt.subplots(2, 2, figsize=(13, 9))
    fig.patch.set_facecolor("black")
    for ax in axes.flat:
        ax.set_facecolor("black")
        ax.tick_params(colors="white", labelsize=9)
        ax.xaxis.label.set_color("white")
        ax.yaxis.label.set_color("white")
        ax.title.set_color("white")
        for sp in ax.spines.values():
            sp.set_edgecolor("#444444")
        ax.grid(True, color="#333333", ls="--", alpha=0.5)
    kw = dict(marker="o", ms=5, lw=2)
    leg = dict(fontsize=8, labelcolor="white", facecolor="#111111",
               edgecolor="#444444")
    xl = "contact conductivity $\\sigma_c$ (S/m)   loose $\\to$ tight"

    ax = axes[0, 0]
    ax.semilogx(x, comp, color="#ff6b35", **kw)
    ax.axhline(comp_lim, color="#ff4444", ls="--",
               label=f"device limit {comp_lim:.0f} V")
    ax.fill_between(x, comp_lim, max(max(comp) * 1.05, comp_lim * 1.1),
                    color="#ff4444", alpha=0.10)
    ax.set_xlabel(xl); ax.set_ylabel("compliance voltage (V)")
    ax.set_title("Compliance Voltage vs Wrap Pressure"); ax.legend(**leg)

    ax = axes[0, 1]
    ax.loglog(x, Z, color="#4ecdc4", **kw)
    ax.set_xlabel(xl); ax.set_ylabel("contact impedance Z ($\\Omega$)")
    ax.set_title("Contact Impedance vs Wrap Pressure")

    ax = axes[1, 0]
    ax.semilogx(x, q, color="#ffd166", **kw)
    ax.axhline(q_lim, color="#ff4444", ls="--",
               label=f"tissue damage limit {q_lim} mC/cm$^2$")
    ax.set_xlabel(xl); ax.set_ylabel("peak charge density (mC/cm$^2$)")
    ax.set_title("Skin Charge Density vs Wrap Pressure"); ax.legend(**leg)

    ax = axes[1, 1]
    ax.semilogx(x, roiE, color="#a8dadc", **kw)
    ax.axhline(nerve_thr, color="#ff4444", ls="--",
               label=f"nerve threshold ~{nerve_thr:.0f} V/m")
    ax.fill_between(x, 0, nerve_thr, color="#ff4444", alpha=0.10)
    ax.set_ylim(bottom=0)
    ax.set_xlabel(xl); ax.set_ylabel("ROI mean |E| (V/m)")
    ax.set_title("Tibial Nerve E-field vs Wrap Pressure"); ax.legend(**leg)

    fig.suptitle("step04 — Pressure-Dependent Contact Impedance Sweep",
                 color="white", fontsize=13)
    return _save(fig, out_dir, "pressure_results.png",
                 facecolor="black", edgecolor="none")


# ── step03 (C23) ──────────────────────────────────────────────────────────────

def plot_3d_representative(case, mesh, phi, out_dir):
    """3-D skin-surface |J| render.  Uses pyvista when importable,
    otherwise a matplotlib 3-D trisurf fallback (ref :480-568 uses
    pyvista only)."""
    meta = case.meta
    pts = mesh.nodes
    Jmag = _nodal_Jmag(case, phi)
    z0 = meta.z_skin_top - meta.t_skin
    m = pts[:, 2] > z0 + meta.t_skin * 0.8

    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    p = ax.scatter(pts[m, 0] * 1000, pts[m, 1] * 1000, pts[m, 2] * 1000,
                   c=Jmag[m], s=4, cmap="inferno")
    fig.colorbar(p, ax=ax, label="|J| (A/m$^2$)", shrink=0.7)
    ax.set_xlabel("x (mm)"); ax.set_ylabel("y (mm)"); ax.set_zlabel("z (mm)")
    ax.set_title("Skin-surface |J| (3D)")
    return _save(fig, out_dir, "representative_3d.png")

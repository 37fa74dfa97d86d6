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

def _clipped_3d_panel(ax, mesh, phi_np, Ly):
    """Clipped 3-D potential render (ref step01_box/visualize.py:30-44,
    95-98): the y < Ly/2 half of the domain, cut plane exposed, faces
    colored by potential (RdYlBu_r), black outline, isometric view.
    matplotlib Poly3DCollection replaces the reference's pyvista
    clip + screenshot."""
    import matplotlib.colors as mcolors
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    from pelvistim_fem_tpu.mesh.boundary import extract_boundary

    pts = mesh.nodes
    cen_y = pts[mesh.tets].mean(axis=1)[:, 1]
    keep = cen_y <= Ly / 2
    sub = mesh.tets[keep] if keep.any() else mesh.tets
    faces, _ = extract_boundary(np.ascontiguousarray(sub))
    tri = pts[faces] * 100                               # cm
    phiF = phi_np[faces].mean(axis=1)
    # painter's sort along the isometric view direction
    view = np.array([1.0, -1.0, 1.0]) / np.sqrt(3)
    order = np.argsort(tri.mean(axis=1) @ view)
    tri, phiF = tri[order], phiF[order]
    norm = mcolors.Normalize(vmin=0.0, vmax=1.0)
    colors = plt.get_cmap("RdYlBu_r")(norm(phiF))
    # light lambert shading so the cut plane reads as 3-D
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1), 1e-30)[:, None]
    shade = 0.75 + 0.25 * np.abs(nrm @ view)
    colors[:, :3] *= shade[:, None]
    ax.computed_zorder = False
    ax.add_collection3d(Poly3DCollection(tri, facecolors=colors,
                                         edgecolors="none"))
    # full-box outline
    lo, hi = pts.min(axis=0) * 100, pts.max(axis=0) * 100
    for s, e in [((lo[0], lo[1], lo[2]), (hi[0], lo[1], lo[2])),
                 ((lo[0], lo[1], lo[2]), (lo[0], hi[1], lo[2])),
                 ((lo[0], lo[1], lo[2]), (lo[0], lo[1], hi[2])),
                 ((hi[0], hi[1], hi[2]), (lo[0], hi[1], hi[2])),
                 ((hi[0], hi[1], hi[2]), (hi[0], lo[1], hi[2])),
                 ((hi[0], hi[1], hi[2]), (hi[0], hi[1], lo[2])),
                 ((hi[0], lo[1], lo[2]), (hi[0], hi[1], lo[2])),
                 ((hi[0], lo[1], lo[2]), (hi[0], lo[1], hi[2])),
                 ((lo[0], hi[1], lo[2]), (hi[0], hi[1], lo[2])),
                 ((lo[0], hi[1], lo[2]), (lo[0], hi[1], hi[2])),
                 ((lo[0], lo[1], hi[2]), (hi[0], lo[1], hi[2])),
                 ((lo[0], lo[1], hi[2]), (lo[0], hi[1], hi[2]))]:
        ax.plot(*zip(s, e), color="black", lw=0.8)
    ax.set_xlim(lo[0], hi[0]); ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    ax.set_box_aspect(hi - lo)
    ax.view_init(elev=28, azim=-55)
    ax.set_axis_off()
    import matplotlib.cm as mcm
    sm = mcm.ScalarMappable(norm=norm, cmap="RdYlBu_r")
    plt.colorbar(sm, ax=ax, label="V (V)", shrink=0.6, pad=0.02)
    ax.set_title("3D potential field (clipped at y = Ly/2)", fontsize=10)


def plot_step01_summary(case, mesh, phi, out_dir):
    """2x4 summary: V(z) vs analytic, |J| histogram, phi / |J|
    mid-slices, clipped 3-D potential render, J-vector cross-section,
    flux balance, metric table (ref step01_box/visualize.py:17-205)."""
    from pelvistim_fem_tpu.ops import fields
    pts = mesh.nodes
    phi_np = np.asarray(phi, np.float64)
    Jmag = _nodal_Jmag(case, phi)
    Lz = pts[:, 2].max()

    fig = plt.figure(figsize=(20, 8))
    axes = np.empty((2, 4), object)
    for i in range(2):
        for j in range(4):
            if (i, j) == (0, 3):
                axes[i, j] = fig.add_subplot(2, 4, i * 4 + j + 1,
                                             projection="3d")
            else:
                axes[i, j] = fig.add_subplot(2, 4, i * 4 + j + 1)

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

    _clipped_3d_panel(axes[0, 3], mesh, phi_np, float(pts[:, 1].max()))

    # J vectors on the XZ mid-plane (ref visualize.py:101-128); J is
    # uniform (0, 0, -sigma/Lz) so unit-normalized arrows colored by |J|
    ax = axes[1, 1]
    Jvec = np.asarray(fields.nodal_average(case, fields.cell_J(case,
                                                              phi)))
    J_an = 10.0
    sl2 = np.abs(pts[:, 1] - np.median(np.unique(pts[:, 1]))) < 1e-9
    idx_all = np.flatnonzero(sl2)
    idx = idx_all[::max(1, len(idx_all) // 64)]
    q = ax.quiver(pts[idx, 0] * 100, pts[idx, 2] * 100,
                  Jvec[idx, 0] / J_an, Jvec[idx, 2] / J_an, Jmag[idx],
                  cmap="inferno", clim=(0, J_an * 1.05), pivot="mid",
                  scale=30, width=0.005, headwidth=3, headlength=4)
    fig.colorbar(q, ax=ax, label="|J| (A/m$^2$)")
    ax.set_aspect("equal")
    ax.set_xlabel("x (cm)"); ax.set_ylabel("z (cm)")
    ax.set_title("J vectors — XZ cross-section")

    ax = axes[1, 2]
    flux = np.asarray(fields.boundary_face_flux(case, phi))
    bcid = mesh.face_bcid
    vals = [abs(flux[bcid == 1].sum()), abs(flux[bcid == 2].sum()),
            abs(flux[bcid == 3].sum())]
    ax.bar(["top", "bottom", "sides"], vals, color=["C0", "C1", "C2"])
    ax.set_ylabel("|I| (A)"); ax.set_title("Boundary flux balance")

    ax = axes[1, 3]
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
        # INCLUSIVE threshold: lattice cells come in discrete z-layers,
        # so with a strict < the kth-smallest dz can equal the minimum
        # and select ZERO cells (qhull needs >= 3 points); <= picks the
        # whole nearest layer.
        # Cap k below len(dz)-1 on coarse meshes: k = len(dz)-1 would
        # set the threshold to max(dz) and turn the "slice" into a
        # full-volume projection.
        k = min(2000, max(3, len(dz) // 2))
        sl = dz <= np.partition(dz, k)[k]
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

_LAYER_COLORS = {"muscle": "#8B4513", "fat": "#D4A800",
                 "skin": "#C68B59", "contact": "#8080FF"}
_BG, _TC = "#111111", "white"


def _dark_ax(ax):
    ax.set_facecolor(_BG)
    ax.tick_params(colors=_TC, labelsize=8)
    ax.xaxis.label.set_color(_TC)
    ax.yaxis.label.set_color(_TC)
    ax.title.set_color(_TC)
    for sp in ax.spines.values():
        sp.set_edgecolor("#444444")


def plot_model_diagram(case, mesh, phi, params, out_dir):
    """4-panel anatomy explainer at the reference's information content
    (plot_layered_results.py:753-1176): side view with conductivity-
    labeled layers / current-path arrows / ROI sphere, top view with
    electrode footprints + spreading arcs + anatomical landmarks, the
    DATA-DRIVEN binned |J|-vs-depth profile under the active electrode
    with per-layer averages (:992-1070), and a 3-D layer-tagged mesh
    render (matplotlib trisurf replaces the reference's pyvista)."""
    import matplotlib.patches as mpatches
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    meta = case.meta
    g = params["geometry"]
    Lx, Ly, Lz = g["Lx"], g["Ly"], g["Lz"]
    t_sk, t_fat = meta.t_skin, meta.t_fat
    t_musc = Lz - t_sk - t_fat
    z_fat_top = Lz - t_sk
    z_fat_bot = z_fat_top - t_fat
    r_cfg = params["roi"]
    z_tgt = r_cfg["z_target"]
    z_nerve = Lz - z_tgt
    roi_r = r_cfg["roi_radius"]
    c = params.get("conductivities", {})
    e1x, e1y = meta.e1_pos[0], meta.e1_pos[1]
    e2x, e2y = meta.e2_pos[0], meta.e2_pos[1]
    r_m = meta.elec_r
    t_contact = (meta.z_e1_elec_top - Lz) if meta.contact_enabled else 0.0

    fig = plt.figure(figsize=(24, 6.6), constrained_layout=True)
    fig.patch.set_facecolor(_BG)
    gs = fig.add_gridspec(1, 4, width_ratios=[2.2, 1.8, 1.6, 2.0])
    ax_side = fig.add_subplot(gs[0])
    ax_top = fig.add_subplot(gs[1])
    ax_prof = fig.add_subplot(gs[2])
    ax_3d = fig.add_subplot(gs[3], projection="3d")
    for ax in (ax_side, ax_top, ax_prof):
        _dark_ax(ax)

    # ── Panel 1: side view (x-z) ──
    def _rect(ax, x0, z0, w, h, color, label=None, fs=9, alpha=0.82):
        ax.add_patch(mpatches.Rectangle((x0, z0), w, h, facecolor=color,
                                        edgecolor="white", lw=0.7,
                                        alpha=alpha))
        if label:
            ax.text(x0 + w / 2, z0 + h / 2, label, ha="center",
                    va="center", color="white", fontsize=fs,
                    fontweight="bold")

    _rect(ax_side, 0, 0, Lx, t_musc, _LAYER_COLORS["muscle"],
          label=f"MUSCLE\n$\\sigma$ = {c.get('sigma_muscle')} S/m\n"
                f"({t_musc*1000:.1f} mm thick)")
    _rect(ax_side, 0, t_musc, Lx, t_fat, _LAYER_COLORS["fat"],
          label=f"FAT  $\\sigma$={c.get('sigma_fat')} S/m  "
                f"({t_fat*1000:.1f}mm)", fs=8)
    _rect(ax_side, 0, z_fat_top, Lx, t_sk, _LAYER_COLORS["skin"],
          label=f"SKIN  $\\sigma$={c.get('sigma_skin')} S/m  "
                f"({t_sk*1000:.1f}mm)", fs=7.5)
    if t_contact > 0:
        sig_ct = params.get("contact", {}).get("sigma_contact_Spm", "?")
        for xc in (e1x, e2x):
            _rect(ax_side, xc - r_m, Lz, 2 * r_m, t_contact,
                  _LAYER_COLORS["contact"], alpha=0.75,
                  label=f"contact\n$\\sigma$={sig_ct}", fs=6)

    z_el = Lz + t_contact + 0.0008
    for xc, clr, lbl in [(e1x, "cyan", "+I\nactive"),
                         (e2x, "lime", "0V\nreturn")]:
        ax_side.plot([xc - r_m, xc + r_m], [z_el, z_el], color=clr, lw=5,
                     solid_capstyle="butt", zorder=5)
        ax_side.text(xc, z_el + 0.0018, lbl, ha="center", va="bottom",
                     color=clr, fontsize=8, fontweight="bold", zorder=6)
    # current-path arrows: active IN, return OUT, connecting arc
    ax_side.annotate("", xy=(e1x - 0.003, 0.002),
                     xytext=(e1x - 0.003, Lz),
                     arrowprops=dict(arrowstyle="-|>", color="cyan", lw=2))
    ax_side.annotate("", xy=(e2x + 0.003, Lz),
                     xytext=(e2x + 0.003, 0.002),
                     arrowprops=dict(arrowstyle="-|>", color="lime", lw=2))
    ax_side.annotate("", xy=(e2x + 0.003, 0.004),
                     xytext=(e1x - 0.003, 0.004),
                     arrowprops=dict(arrowstyle="-", color="white", lw=1.2,
                                     connectionstyle="arc3,rad=0.25",
                                     alpha=0.5))
    roi_c = plt.Circle((e1x, z_nerve), roi_r, color="yellow", fill=False,
                       lw=2, zorder=7,
                       label=f"ROI sphere r={roi_r*1000:.0f}mm")
    ax_side.add_patch(roi_c)
    ax_side.text(e1x + roi_r + 0.001, z_nerve,
                 f"ROI\n(tibial nerve\n$\\approx${z_tgt*1000:.0f}mm deep)",
                 ha="left", va="center", color="yellow", fontsize=7)
    for zz, lbl in [(t_musc, "fat | muscle"), (z_fat_top, "skin | fat"),
                    (Lz, "skin top")]:
        ax_side.axhline(zz, color="white", lw=0.7, ls="--", alpha=0.4)
        ax_side.text(Lx * 1.01, zz, lbl, color="white", fontsize=6.5,
                     va="center", alpha=0.8)
    ax_side.axhline(z_nerve, color="yellow", lw=1, ls=":", alpha=0.7)
    ax_side.set_xlim(-0.004, Lx + 0.022)
    ax_side.set_ylim(-0.003, Lz + t_contact + 0.010)
    ax_side.set_xlabel("Medial $\\to$ Lateral (m)", fontsize=9)
    ax_side.set_ylabel("Depth z (m, 0=base $\\to$ Lz=skin top)", fontsize=9)
    ax_side.set_title("ANATOMY (side view, x-z)\n"
                      "cyan/lime arrows = current IN / OUT of tissue",
                      fontsize=9, fontweight="bold")
    ax_side.legend(handles=[roi_c], loc="lower right", facecolor="#222",
                   edgecolor="white", labelcolor="white", fontsize=7)

    # ── Panel 2: top view (x-y) ──
    ax_top.add_patch(mpatches.Rectangle(
        (0, 0), Lx, Ly, facecolor=_LAYER_COLORS["skin"],
        edgecolor="white", lw=1, alpha=0.35))
    ax_top.text(Lx / 2, Ly / 2, "skin surface\n(z = Lz)", ha="center",
                va="center", color="white", fontsize=8, alpha=0.5)
    theta = np.linspace(0, 2 * np.pi, 361)
    for (xc, yc), clr, lbl in [
            ((e1x, e1y), "cyan",
             f"+I active\n({e1x*1000:.0f}, {e1y*1000:.0f}) mm"),
            ((e2x, e2y), "lime",
             f"0V return\n({e2x*1000:.0f}, {e2y*1000:.0f}) mm")]:
        ax_top.fill(xc + r_m * np.cos(theta), yc + r_m * np.sin(theta),
                    color=clr, alpha=0.25)
        ax_top.plot(xc + r_m * np.cos(theta), yc + r_m * np.sin(theta),
                    color=clr, lw=2)
        ax_top.text(xc, yc, lbl, ha="center", va="center", color=clr,
                    fontsize=7, fontweight="bold")
    for mult, alpha in [(1.5, 0.5), (2.5, 0.3), (4.0, 0.15)]:
        ax_top.plot(e1x + r_m * mult * np.cos(theta),
                    e1y + r_m * mult * np.sin(theta), color="cyan",
                    lw=0.6, ls="--", alpha=alpha)
    for ang in np.linspace(0, np.pi, 5):
        ax_top.annotate(
            "", xy=(e1x + r_m * 3 * np.cos(ang),
                    e1y + r_m * 3 * np.sin(ang)),
            xytext=(e1x + r_m * 1.2 * np.cos(ang),
                    e1y + r_m * 1.2 * np.sin(ang)),
            arrowprops=dict(arrowstyle="-|>", color="cyan", lw=0.8,
                            alpha=0.4))
    for mult, alpha in [(1.5, 0.4), (2.5, 0.25)]:
        ax_top.plot(e2x + r_m * mult * np.cos(theta),
                    e2y + r_m * mult * np.sin(theta), color="lime",
                    lw=0.6, ls="--", alpha=alpha)
    for x, y, txt, ha, va in [(0.003, Ly / 2, "Medial\nbone", "left",
                               "center"),
                              (Lx - 0.003, Ly / 2, "Lateral\nbone",
                               "right", "center"),
                              (Lx / 2, Ly - 0.002, "Posterior\n(Achilles)",
                               "center", "top"),
                              (Lx / 2, 0.002, "Anterior", "center",
                               "bottom")]:
        ax_top.text(x, y, txt, ha=ha, va=va, color="white", fontsize=7,
                    alpha=0.8)
    ax_top.plot(Lx * 0.50, Ly * 0.96, "^", color="white", ms=9)
    ax_top.text(Lx * 0.50, Ly * 0.90, "AT", ha="center", color="white",
                fontsize=8, fontweight="bold")
    ax_top.set_xlim(-0.002, Lx + 0.002)
    ax_top.set_ylim(-0.002, Ly + 0.002)
    ax_top.set_aspect("equal")
    ax_top.set_xlabel("Medial $\\to$ Lateral (m)", fontsize=9)
    ax_top.set_ylabel("Anterior $\\to$ Posterior (m)", fontsize=9)
    ax_top.set_title(f"SKIN SURFACE (top view, z = {Lz*1000:.0f} mm)\n"
                     f"dashed = current spreading  |  r = "
                     f"{r_m*1000:.0f} mm", fontsize=9, fontweight="bold")

    # ── Panel 3: data-driven |J| vs depth (mA/cm^2, ref :992-1070) ──
    ax = ax_prof
    pts = mesh.nodes
    Jmag = _nodal_Jmag(case, phi)
    tol_xy = max(r_m * 0.4, 0.003)
    near = ((np.abs(pts[:, 0] - e1x) < tol_xy)
            & (np.abs(pts[:, 1] - e1y) < tol_xy)
            & (pts[:, 2] <= Lz + t_contact + 1e-4))
    depth_mm = (Lz - pts[near, 2]) * 1000
    J_near = Jmag[near]
    bins = np.linspace(depth_mm.min(), depth_mm.max(), 60)
    idx = np.digitize(depth_mm, bins)
    prof = np.array([J_near[idx == i].mean() if (idx == i).any()
                     else np.nan for i in range(1, len(bins))])
    bin_d = 0.5 * (bins[:-1] + bins[1:])
    valid = np.isfinite(prof)
    depth_data, Jmag_data = bin_d[valid], prof[valid] * 0.1  # -> mA/cm^2
    ax.plot(Jmag_data, depth_data, color="cyan", lw=2.5, zorder=5,
            label="Simulated |J|")
    ax.fill_betweenx(depth_data, 0, Jmag_data, color="cyan", alpha=0.18)
    Jmax = float(Jmag_data.max()) if Jmag_data.size else 1.0
    ax.set_ylim(depth_data.max() + 1, min(depth_data.min(), 0) - 1)

    def _band(d0, d1, color, label):
        ax.axhspan(d0, d1, color=color, alpha=0.22, zorder=1)
        ax.text(Jmax * 1.02, (d0 + d1) / 2, label, ha="left",
                va="center", color=color, fontsize=7.5,
                fontweight="bold")

    if t_contact > 0:
        _band(-t_contact * 1000, 0, _LAYER_COLORS["contact"], "contact")
    _band(0, t_sk * 1000, _LAYER_COLORS["skin"], "SKIN")
    _band(t_sk * 1000, (t_sk + t_fat) * 1000, _LAYER_COLORS["fat"], "FAT")
    _band((t_sk + t_fat) * 1000, Lz * 1000, _LAYER_COLORS["muscle"],
          "MUSCLE")
    for d_mm, lbl in [(0, "skin surface"), (t_sk * 1000, "skin|fat"),
                      ((t_sk + t_fat) * 1000, "fat|muscle")]:
        ax.axhline(d_mm, color="white", lw=0.8, ls="--", alpha=0.5)
        ax.text(0, d_mm - 0.3, lbl, color="white", fontsize=6,
                va="bottom", alpha=0.7)
    ax.axhline(z_tgt * 1000, color="yellow", lw=1.5, ls="-.", alpha=0.85)
    ax.text(0, z_tgt * 1000 + 0.4, f"ROI (nerve)\n{z_tgt*1000:.0f} mm",
            color="yellow", fontsize=7, va="top")
    for d0, d1, lname, clr in [
            (0, t_sk * 1000, "Skin", _LAYER_COLORS["skin"]),
            (t_sk * 1000, (t_sk + t_fat) * 1000, "Fat",
             _LAYER_COLORS["fat"]),
            ((t_sk + t_fat) * 1000, Lz * 1000, "Muscle",
             _LAYER_COLORS["muscle"])]:
        m = (depth_data >= d0) & (depth_data < d1)
        if m.any():
            jav = float(Jmag_data[m].mean())
            ax.annotate(f"avg={jav:.3f}\nmA/cm$^2$",
                        xy=(jav, (d0 + d1) / 2),
                        xytext=(Jmax * 0.55, (d0 + d1) / 2), fontsize=7,
                        color=clr, ha="center", va="center",
                        arrowprops=dict(arrowstyle="->", color=clr,
                                        lw=0.7, alpha=0.6))
    ax.set_xlabel("|J| (mA/cm$^2$)", fontsize=9)
    ax.set_ylabel("Depth below skin surface (mm)", fontsize=9)
    ax.set_title("|J| vs depth below active electrode\n(simulated)",
                 fontsize=8.5, fontweight="bold")
    ax.legend(facecolor="#222", edgecolor="white", labelcolor="white",
              fontsize=8, loc="lower right")
    ax.set_xlim(left=0)

    # ── Panel 4: 3-D layer-tagged mesh (boundary surface, shaded) ──
    ax_3d.set_facecolor(_BG)
    faces = mesh.faces
    fz = pts[faces].mean(axis=1)[:, 2]
    col = np.where(fz >= z_fat_top - 1e-4, 2,
                   np.where(fz >= z_fat_bot, 1, 0))
    cmap = np.array([_LAYER_COLORS["muscle"], _LAYER_COLORS["fat"],
                     _LAYER_COLORS["skin"]])
    step = max(1, faces.shape[0] // 12000)   # cap polygon count
    tri = pts[faces[::step]]
    pc = Poly3DCollection(tri, facecolors=cmap[col[::step]], alpha=0.9,
                          edgecolors="none")
    ax_3d.add_collection3d(pc)
    for xc, yc, clr, lbl in [(e1x, e1y, "cyan", "+I"),
                             (e2x, e2y, "lime", "0V")]:
        ax_3d.plot(xc + r_m * np.cos(theta), yc + r_m * np.sin(theta),
                   np.full_like(theta, z_el + 0.001), color=clr, lw=3)
        ax_3d.text(xc, yc, z_el + 0.004, lbl, color=clr, fontsize=10,
                   fontweight="bold")
    ax_3d.set_xlim(0, Lx); ax_3d.set_ylim(0, Ly)
    ax_3d.set_zlim(0, max(Lz * 2.2, Lz + 0.01))
    ax_3d.view_init(elev=20, azim=-65)
    ax_3d.set_axis_off()
    ax_3d.set_title("3D ANKLE GEOMETRY (actual FEM mesh)\n"
                    "brown=muscle  gold=fat  tan=skin", color=_TC,
                    fontsize=9, fontweight="bold")

    fig.suptitle(
        "MODEL OVERVIEW — ankle 3-layer slab PTNS stimulation  "
        "(PLACEHOLDER conductivities — not validated)\n"
        f"Geometry: {Lx*100:.0f}x{Ly*100:.0f}x{Lz*100:.0f} cm  |  "
        f"skin {t_sk*1000:.1f}mm  fat {t_fat*1000:.1f}mm  muscle "
        f"{t_musc*1000:.1f}mm  |  Active: ({e1x*1000:.0f},"
        f"{e1y*1000:.0f})mm  Return: ({e2x*1000:.0f},{e2y*1000:.0f})mm  "
        f"r={r_m*1000:.0f}mm", fontsize=9.5, fontweight="bold",
        color=_TC)
    return _save(fig, out_dir, "model_diagram.png", facecolor=_BG)


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
    """SHADED 3-D skin-surface |J| render at the reference's information
    content (plot_layered_results.py:480-568): boundary-surface
    triangles facecolored by nodal |J| (inferno, clim [0, p99.9]) on a
    black background, cyan/lime electrode outline rings with
    '+I (active)' / '0V (return)' labels, top-down view.  matplotlib
    Poly3DCollection replaces the reference's pyvista plotter."""
    import matplotlib.cm as mcm
    import matplotlib.colors as mcolors
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    meta = case.meta
    pts = mesh.nodes
    Jmag = _nodal_Jmag(case, phi)

    # top skin-surface boundary faces (ref: extract_surface + top cells)
    z0_sk = meta.z_skin_top - meta.t_skin
    fcen_z = pts[mesh.faces].mean(axis=1)[:, 2]
    top = fcen_z > z0_sk + meta.t_skin * 0.80
    faces = mesh.faces[top] if top.sum() > 10 else mesh.faces
    Jf = Jmag[faces].mean(axis=1)
    vmax = float(np.percentile(Jmag[np.unique(faces)], 99.9)) or 1.0
    norm = mcolors.Normalize(vmin=0.0, vmax=vmax)
    colors = plt.get_cmap("inferno")(norm(Jf))

    fig = plt.figure(figsize=(9, 7.2))
    fig.patch.set_facecolor("black")
    ax = fig.add_subplot(projection="3d")
    ax.set_facecolor("black")
    # painterly order = insertion order: surface first, rings/labels on
    # top (mplot3d's computed z-order buries the rings under the skin)
    ax.computed_zorder = False
    pc = Poly3DCollection(pts[faces] * 1000, facecolors=colors,
                          edgecolors="none")
    ax.add_collection3d(pc)

    # electrode outline rings + labels at z slightly above the pads
    theta = np.linspace(0, 2 * np.pi, 60)
    z_el = (max(meta.z_e1_elec_top, meta.z_e2_elec_top) + 1e-4) * 1000
    for (cx, cy, _), clr, lbl in [(meta.e1_pos, "cyan", "+I (active)"),
                                  (meta.e2_pos, "lime", "0V (return)")]:
        r = meta.elec_r * 1000
        if meta.elec_shape == "circle":
            ax.plot(cx * 1000 + r * np.cos(theta),
                    cy * 1000 + r * np.sin(theta),
                    np.full_like(theta, z_el), color=clr, lw=3)
        else:
            sq = np.array([[-r, -r], [r, -r], [r, r], [-r, r], [-r, -r]])
            ax.plot(cx * 1000 + sq[:, 0], cy * 1000 + sq[:, 1],
                    np.full(5, z_el), color=clr, lw=3)
        ax.text(cx * 1000, cy * 1000, z_el + 2, lbl, color="white",
                fontsize=11, ha="center",
                bbox=dict(facecolor="black", edgecolor="none", pad=1))

    lo = pts[np.unique(faces)].min(axis=0) * 1000
    hi = pts[np.unique(faces)].max(axis=0) * 1000
    ax.set_xlim(lo[0], hi[0]); ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2] - 1, hi[2] + 4)
    ax.view_init(elev=88, azim=-90)     # ref view_xy: top-down
    ax.set_axis_off()
    sm = mcm.ScalarMappable(norm=norm, cmap="inferno")
    cb = fig.colorbar(sm, ax=ax, label="|J| (A/m$^2$)", shrink=0.55,
                      orientation="horizontal", pad=0.02)
    cb.ax.xaxis.label.set_color("white")
    cb.ax.tick_params(colors="white")
    ax.set_title("Skin-surface |J|", color="white")
    return _save(fig, out_dir, "representative_3d.png",
                 facecolor="black", edgecolor="none")


# ── electrode-array pattern design (run_array_opt) ────────────────────────────


def plot_array_opt(params, meta, pattern_mA, history, summary, outdir):
    """3-panel design summary: array layout with the optimized injected
    currents, the Frank-Wolfe convergence history, and the per-channel
    pattern against its constraints."""
    pos = np.asarray(meta["positions"]) * 1e3          # mm
    i_mA = np.asarray(pattern_mA)
    K = len(i_mA)
    fig, (ax0, ax1, ax2) = plt.subplots(
        1, 3, figsize=(13.5, 4.4),
        gridspec_kw={"width_ratios": [1.15, 1, 1]})

    # layout: discs sized by |i|, red = source, blue = sink
    Lx, Ly = params["L_mm"]
    r_e = params["elec_r_mm"]
    amax = max(np.abs(i_mA).max(), 1e-12)
    for k, (px, py) in enumerate(pos):
        c = "#d62728" if i_mA[k] > 0 else "#1f77b4"
        a = 0.15 + 0.85 * abs(i_mA[k]) / amax
        ax0.add_patch(plt.Circle((px, py), r_e, color=c, alpha=a))
        ax0.add_patch(plt.Circle((px, py), r_e, fill=False,
                                 color="k", lw=0.6))
        ax0.text(px, py, f"{k}\n{i_mA[k]:+.2f}", ha="center",
                 va="center", fontsize=7)
    roi = np.asarray(meta["roi_center"]) * 1e3
    ax0.add_patch(plt.Circle((roi[0], roi[1]), meta["roi_r"] * 1e3,
                             fill=False, color="green", lw=1.5,
                             ls="--"))
    ax0.text(roi[0], roi[1] - meta["roi_r"] * 1e3 - 3,
             f"ROI @ {summary['roi_vol_mm3']:.0f} mm$^3$"
             f" (depth {1e3*(meta['Lz']) - roi[2]:.0f} mm)",
             ha="center", fontsize=7, color="green")
    ax0.set_xlim(0, Lx)
    ax0.set_ylim(0, Ly)
    ax0.set_aspect("equal")
    ax0.set_xlabel("x (mm)")
    ax0.set_ylabel("y (mm)")
    ax0.set_title(f"optimized pattern (mA), gain "
                  f"{summary['gain']:.2f}x vs best pair", fontsize=9)

    hist = np.asarray(history)
    ax1.plot(hist, lw=1.2)
    ax1.axhline(summary["roi_E_best_single_Vpm"], color="gray", ls="--",
                lw=1, label="best single channel")
    ax1.set_xlabel("Frank-Wolfe step")
    ax1.set_ylabel("ROI mean E·target (V/m)")
    ax1.legend(fontsize=7)
    ax1.grid(alpha=0.3)
    ax1.set_title("design objective", fontsize=9)

    cols = ["#d62728" if v > 0 else "#1f77b4" for v in i_mA]
    ax2.bar(np.arange(K), i_mA, color=cols)
    for lim, lbl in ((summary["imax_mA"], "per-channel cap"),
                     (-summary["imax_mA"], None)):
        ax2.axhline(lim, color="k", ls=":", lw=1)
        if lbl:
            ax2.text(K - 0.5, lim, lbl, fontsize=7, va="bottom",
                     ha="right")
    ax2.set_xlabel("channel")
    ax2.set_ylabel("i (mA)")
    ax2.set_title(
        f"$\\Sigma|i|$={sum(abs(i_mA)):.2f}/{summary['budget_mA']} mA, "
        f"peak skin |J| {summary['peak_J_skin_Apm2']:.2f}/"
        f"{summary['jlimit_Apm2']:.2f} A/m$^2$", fontsize=9)
    ax2.grid(alpha=0.3, axis="y")

    fig.tight_layout()
    return _save(fig, outdir, "array_opt_summary.png")

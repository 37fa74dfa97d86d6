"""EIT fitting session: identify tissue + contact state from electrode
voltages alone.

The clinical problem: a stimulator measures only its own electrode
voltages, yet dose predictions hinge on tissue conductivities that are
1.3-3x uncertain (the reason the reference hand-sweeps sigma_skin /
sigma_contact — step03 params.yaml:33, step04 params.yaml:51-56) and
on contact impedances that drift with gel drying.  This app runs the
full loop the reference pipeline cannot: synthesize a measurement
session on a three-layer tissue slab with a patch array (complete
electrode model — ops/cem.py), then recover the three tissue
conductivities AND the per-patch contact impedances from the
electrode-voltage block alone (ops/eit.py: analytic lead-field
Jacobians, MINPACK trust region, every forward a vmapped batch of
certified CEM solves).  A difference-imaging demo localizes a skin-
layer conductivity change from the voltage shift, and --svd prints the
identifiability spectrum.

--spectral runs the multifrequency (fd-EIT) session instead: the same
slab measured at several frequencies with dispersive (Cole-Cole) skin
and CPE electrode interfaces, fitted on the STENCIL fast path
(ops/eit.py eit_recover_spectral).  Frequency breaks the static
series degeneracy, so the return pad's contact state — which the
static session must characterize separately and HOLD — is fitted
jointly with the tissue parameters.

--element runs the --spectral session through the ELEMENT path
(ops/eit.py eit_recover_spectral_case) — the backend an imported
.msh/Elmer-DB/VTU mesh uses, where no stencil exists.

Usage: python apps/run_eit.py [--full] [--noise R] [--seed S]
                              [--svd] [--plot] [--spectral]
                              [--element] [--outdir DIR]
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

L_XY = 0.12                       # m, lateral extent
LAYERS = (("muscle", 0.020, 0.35), ("fat", 0.010, 0.04),
          ("skin", 0.005, 0.10))  # name, thickness, literature sigma
PATCH_W = 0.010                   # half-width of the square patches
PATCH_XY = [(0.035, 0.035), (0.085, 0.035),
            (0.035, 0.085), (0.085, 0.085)]
PAD = 3                           # bcid-list index of the return pad
BCIDS = (1, 4, 5, 6, 2)           # four patches + bottom pad


def build_eit_case(full=False):
    import jax.numpy as jnp

    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
    from pelvistim_fem_tpu.models.case import build_case

    h = 0.0025 if full else 0.005
    hz = 0.00125 if full else 0.0025
    lz = sum(t for _, t, _ in LAYERS)
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, lz, int(lz / hz) + 1)
    tops = np.cumsum([t for _, t, _ in LAYERS])

    def body_fn(cx, cy, cz):
        return (np.searchsorted(tops, np.clip(cz, 0, lz)) + 1) \
            .astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        top = (nz > 0.5) & (np.abs(fz - lz) < 1e-9)
        for (px, py), b in zip(PATCH_XY, (1, 4, 5, 6)):
            m = top & (np.abs(fx - px) <= PATCH_W) \
                & (np.abs(fy - py) <= PATCH_W)
            out[m] = b
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, xs, zs, body_fn, bcid_fn)
    sigma = {i + 1: s for i, (_, _, s) in enumerate(LAYERS)}
    case = build_case(mesh, sigma, mode="current",
                      injected_current_A=1.0, dtype=jnp.float64)
    return mesh, case


def run_spectral(args):
    """Multifrequency fd-EIT session: dispersive skin + CPE contacts,
    jointly fitted — pad included — on the stencil fast path (default)
    or, with --element, on the element path any imported mesh runs."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops.cem import (cem_eqs_transfer_matrix,
                                           cem_weights_from_bcids,
                                           stencil_cem_eqs_transfer_matrix,
                                           stencil_cem_setup)
    from pelvistim_fem_tpu.ops.eit import (eit_recover_spectral,
                                           eit_recover_spectral_case)
    from pelvistim_fem_tpu.ops.eqs import cole_cole_kappa
    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    from pelvistim_fem_tpu.utils.summary import save_results

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    mesh, case = build_eit_case(full=args.full)
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    ground = len(BCIDS) - 1
    if args.element:
        path = "element path (imported-mesh backend)"
    else:
        hd = stencil_host_data(case, mesh)
        sc = build_stencil_case(case, mesh, dtype=jnp.float64,
                                host_data=hd)
        Wg, present, hier = stencil_cem_setup(hd, W, ground=ground)
        path = "stencil fast path"
    print(f"mesh: {case.n_nodes} nodes ({path}), "
          f"{len(BCIDS)} electrodes ({time.perf_counter() - t0:.1f} s)")

    freqs = np.logspace(3, 5, 5)                 # 1-100 kHz
    alpha = 0.8
    # truth: skin disperses (beta band), fat runs low, muscle held at
    # literature (still a deep series slab); every interface is a CPE
    lit = np.asarray(case.sigma_table, np.float64)
    skin_true = dict(sigma_s=lit[3] * 1.8, d_eps=2.8e4, tau=1.1e-5)
    fat_true = dict(sigma_s=lit[2] * 0.62)
    q_true = np.array([7e-3, 1.2e-2, 5e-3, 9e-3, 2.8e-2])
    z_ser = np.array([0.004] * 4 + [0.001])

    T = lit.shape[0]
    kr = np.tile(lit, (len(freqs), 1))
    ki = np.zeros((len(freqs), T))
    kap = cole_cole_kappa(freqs, skin_true["sigma_s"], 0.0,
                          [(skin_true["d_eps"], skin_true["tau"], 0.0)])
    kr[:, 3], ki[:, 3] = kap.real, kap.imag
    kr[:, 2] = fat_true["sigma_s"]
    w = 2 * np.pi * freqs
    zf = z_ser[None, :] + 1.0 / (q_true[None, :]
                                 * (1j * w[:, None]) ** alpha)

    t1 = time.perf_counter()
    if args.element:
        meas = cem_eqs_transfer_matrix(case, W, zf, ki_tables=ki,
                                       kr_tables=kr, ground=ground,
                                       tol=1e-10)
    else:
        meas = stencil_cem_eqs_transfer_matrix(
            sc, hier, Wg, present, zf, ki_tables=ki, kr_tables=kr,
            ground=ground, tol=1e-10)
    assert meas["converged"].all()
    dr = meas["drives"]
    M = meas["Z"][:, dr][:, :, dr]
    print(f"synthesized {len(freqs)}-frequency measurement tensor "
          f"({len(freqs) * len(dr)} certified complex CEM solves, "
          f"{time.perf_counter() - t1:.1f} s)")
    if args.noise > 0:
        M = M * (1 + args.noise * rng.standard_normal(M.shape)) \
            * np.exp(1j * args.noise * rng.standard_normal(M.shape))
        print(f"added {args.noise:.1%} amplitude + phase noise")

    t2 = time.perf_counter()
    fit_kw = dict(
        body_models={3: dict(sigma_s=lit[3], d_eps=1e4, tau=4e-6),
                     2: dict(sigma_s=lit[2])},
        z_ser=z_ser, q_cpe=np.full(len(BCIDS), 1.2e-2),
        alpha_cpe=alpha, fit_q=True, ground=ground, tol=1e-10,
        verbose=True)
    if args.element:
        rec = eit_recover_spectral_case(case, W, freqs, M, **fit_kw)
    else:
        rec = eit_recover_spectral(sc, hier, Wg, present, freqs, M,
                                   **fit_kw)
    dt = time.perf_counter() - t2
    print(f"recovered in {rec['n_forward']} complex solve batches, "
          f"{dt:.1f} s, final loss {rec['loss_history'][-1]:.2e}, "
          f"converged={rec['converged']}")

    names, truths, fits = [], [], []
    m3 = rec["body_models"][3]
    for key in ("sigma_s", "d_eps", "tau"):
        names.append(f"skin_{key}")
        truths.append(skin_true[key])
        fits.append(m3[key])
    names.append("fat_sigma_s")
    truths.append(fat_true["sigma_s"])
    fits.append(rec["body_models"][2]["sigma_s"])
    for m in range(len(BCIDS)):
        names.append(f"q_cpe_{m}" + ("_pad" if m == ground else ""))
        truths.append(q_true[m])
        fits.append(rec["q_cpe"][m])

    rows, n_bad = [], 0
    print(f"  {'parameter':>14s} {'truth':>11s} {'recovered':>11s} "
          f"{'rel err':>9s} {'+-(1sd)':>9s}")
    for k, (nm, tr, rv) in enumerate(zip(names, truths, fits)):
        err = abs(rv / tr - 1)
        sd = rec["log_std"][k]
        ok = err <= max(3.0 * sd, 1e-3)
        n_bad += not ok
        print(f"  {nm:>14s} {tr:11.4g} {rv:11.4g} {err:9.2%} "
              f"{sd:9.2%}" + ("" if ok else "  <-"))
        rows.append({"param": nm, "truth": tr, "recovered": rv,
                     "rel_err": err, "posterior_rel_std": float(sd)})
    print(("  PASS" if n_bad == 0 else f"  WARN ({n_bad} outside)")
          + ": every fitted parameter within max(3 posterior sd, 0.1%)"
          + " — including the return pad's CPE, which the static"
          " session must hold")
    save_results(rows, Path(args.outdir), stem="eit_spectral_fit")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fgrid = np.logspace(3, 5, 60)
        wg = 2 * np.pi * fgrid
        fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
        ax = axes[0]
        ax.semilogy(rec["loss_history"], "o-", ms=3, color="0.25")
        ax.set_xlabel("residual evaluation")
        ax.set_ylabel("normalized loss")
        ax.set_title("spectral Gauss-Newton convergence")
        ax.grid(alpha=0.3)

        ax = axes[1]
        for m in range(len(BCIDS)):
            zt = z_ser[m] + 1 / (q_true[m] * (1j * wg) ** alpha)
            zr = z_ser[m] + 1 / (rec["q_cpe"][m] * (1j * wg) ** alpha)
            ln, = ax.loglog(fgrid, np.abs(zt), lw=1.0)
            ax.loglog(fgrid, np.abs(zr), "--", lw=1.8,
                      color=ln.get_color(),
                      label=f"contact {m}" + (" (pad)"
                                              if m == ground else ""))
        ax.set_xlabel("frequency (Hz)")
        ax.set_ylabel("|z| (ohm m$^2$)")
        ax.set_title("contact CPE spectra: truth vs fit (dashed)")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3, which="both")

        ax = axes[2]
        kt = cole_cole_kappa(fgrid, skin_true["sigma_s"], 0.0,
                             [(skin_true["d_eps"], skin_true["tau"],
                               0.0)])
        kf = cole_cole_kappa(fgrid, m3["sigma_s"], 0.0,
                             [(m3["d_eps"], m3["tau"], 0.0)])
        ax.semilogx(fgrid, kt.real, lw=1.0, label="Re kappa truth")
        ax.semilogx(fgrid, kf.real, "--", lw=1.8, label="Re kappa fit")
        ax.semilogx(fgrid, kt.imag, lw=1.0, label="Im kappa truth")
        ax.semilogx(fgrid, kf.imag, "--", lw=1.8, label="Im kappa fit")
        ax.set_xlabel("frequency (Hz)")
        ax.set_ylabel("kappa (S/m)")
        ax.set_title("skin Cole-Cole dispersion: truth vs fit")
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        fig.suptitle("spectral (multifrequency) EIT session")
        fig.tight_layout()
        fp = Path(args.outdir) / "eit_spectral_summary.png"
        fig.savefig(fp, dpi=150, bbox_inches="tight")
        print(f"  figure -> {fp}")

    return 0 if n_bad == 0 else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="fine mesh (h=2.5 mm)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="relative measurement noise (e.g. 0.005)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--svd", action="store_true",
                    help="print the identifiability spectrum")
    ap.add_argument("--spectral", action="store_true",
                    help="multifrequency (fd-EIT) session instead")
    ap.add_argument("--element", action="store_true",
                    help="run --spectral on the element path (the "
                    "imported-mesh backend) instead of the stencil")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--outdir", default="results_eit")
    args = ap.parse_args()

    if args.spectral:
        return run_spectral(args)

    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops.cem import (cem_transfer_matrix,
                                           cem_weights_from_bcids)
    from pelvistim_fem_tpu.ops.eit import (eit_difference_image,
                                           eit_jacobians, eit_recover,
                                           eit_sensitivity_cells)
    from pelvistim_fem_tpu.utils.summary import save_results

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    mesh, case = build_eit_case(full=args.full)
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    ground = len(BCIDS) - 1                      # the bottom pad
    # NOTE: build_cem_amg is available for hard-contrast imported
    # meshes; at this slab's ~9x tissue contrast Jacobi-CG converges
    # in ~185 iterations and beats the V-cycle in wall time (measured)
    print(f"mesh: {case.n_nodes} nodes, {case.n_tets} tets, "
          f"{len(BCIDS)} electrodes ({time.perf_counter() - t0:.1f} s)")

    # ── the truth this session will have to find ────────────────────────────
    # Perturb what the protocol can SEE.  The deep muscle layer is a
    # near-uniform series slab under the array: its conductivity sits
    # 4 decades below the leading singular value of this protocol's
    # Jacobian (print with --svd) — a surface-array session cannot
    # identify it, so the fit HOLDS it at literature.  Identifying it
    # needs either interior data (run_calibration) or electrodes
    # flanking the layer; that finding is the point of the spectrum.
    lit = np.asarray(case.sigma_table, np.float64)     # literature start
    sig_true = lit.copy()
    sig_true[2] *= 0.62                                # fat runs low
    sig_true[3] *= 1.8                                 # skin hydrated
    z_true = np.array([0.020, 0.009, 0.035, 0.014, 0.004])
    z0 = np.full(len(BCIDS), 0.015)
    z0[ground] = z_true[ground]                        # pad characterized
    fit_bodies = [2, 3]                                # fat, skin

    out_true = cem_transfer_matrix(case, W, jnp.asarray(z_true),
                                   ground=ground,
                                   sigma_table=jnp.asarray(sig_true),
                                   tol=1e-11)
    assert out_true["converged"].all()
    dr = out_true["drives"]
    U_meas = out_true["Z"][np.ix_(dr, dr)]
    if args.noise > 0:
        U_meas = U_meas * (1 + args.noise
                           * rng.standard_normal(U_meas.shape))
        print(f"added {args.noise:.1%} relative measurement noise")

    if args.svd:
        J_sig, J_z = eit_jacobians(case, W, z_true, out_true)
        D = J_sig.shape[0]
        cols = [J_sig[:, :, b].reshape(D * D) * sig_true[b]
                for b in (1, 2, 3)]
        cols += [J_z[:, :, m].reshape(D * D) * z_true[m]
                 for m in range(len(BCIDS) - 1)]
        s = np.linalg.svd(np.stack(cols, 1), compute_uv=False)
        print("identifiability spectrum (all candidate log-params):",
              " ".join(f"{v:.2e}" for v in s),
              f" condition {s[0] / s[-1]:.1e}")
        print("  -> sigma_muscle rides the two smallest directions: "
              "held at literature (see module docstring)")

    # ── recover: fat + skin sigmas, 4 patch z; muscle + pad held ────────────
    t1 = time.perf_counter()
    rec = eit_recover(case, W, [(ground, U_meas)], bodies=fit_bodies,
                      z0=z0, fit_z=tuple(range(len(BCIDS) - 1)),
                      tol=1e-11)
    dt = time.perf_counter() - t1
    print(f"recovered in {rec['n_forward']} forward batches "
          f"({rec['n_forward'] * (len(BCIDS) - 1)} CEM solves), "
          f"{dt:.1f} s, final loss {rec['loss_history'][-1]:.2e}, "
          f"converged={rec['converged']}")

    # per-parameter gate: the recovered value must sit within
    # max(3 x the LINEARIZED posterior std, 0.1%) — the band is what
    # the measurements actually pin at the achieved residual level,
    # so with --noise the gate widens with the data quality
    names = [f"sigma_{LAYERS[b - 1][0]}" for b in fit_bodies] \
        + [f"z_patch{m}" for m in range(len(BCIDS) - 1)]
    truths = [sig_true[b] for b in fit_bodies] \
        + [z_true[m] for m in range(len(BCIDS) - 1)]
    starts = [lit[b] for b in fit_bodies] \
        + [z0[m] for m in range(len(BCIDS) - 1)]
    fits = [rec["sigma_table"][b] for b in fit_bodies] \
        + [rec["z"][m] for m in range(len(BCIDS) - 1)]

    rows, n_bad = [], 0
    print(f"  {'parameter':>14s} {'truth':>10s} {'start':>10s} "
          f"{'recovered':>10s} {'rel err':>9s} {'+-(1sd)':>9s}")
    for k, (nm, tr, st, rv) in enumerate(zip(names, truths, starts,
                                             fits)):
        err = abs(rv / tr - 1)
        sd = rec["log_std"][k]
        ok = err <= max(3.0 * sd, 1e-3)
        n_bad += not ok
        print(f"  {nm:>14s} {tr:10.4f} {st:10.4f} {rv:10.4f} "
              f"{err:9.2%} {sd:9.2%}" + ("" if ok else "  <-"))
        rows.append({"param": nm, "truth": tr, "start": st,
                     "recovered": rv, "rel_err": err,
                     "posterior_rel_std": float(sd)})
    print(f"  {'sigma_muscle':>14s} {sig_true[1]:10.4f} "
          f"{'(held)':>10s} {rec['sigma_table'][1]:10.4f} "
          "   not identifiable from this protocol")
    print(("  PASS" if n_bad == 0 else f"  WARN ({n_bad} outside)")
          + ": every fitted parameter within max(3 posterior sd, 0.1%)")
    save_results(rows, Path(args.outdir), stem="eit_fit")

    # ── difference imaging: skin drying under patch 2 shifts voltages ───────
    tab2 = sig_true.copy()
    tab2[3] *= 0.8                                     # skin sigma -20%
    Z2 = cem_transfer_matrix(case, W, jnp.asarray(z_true),
                             ground=ground,
                             sigma_table=jnp.asarray(tab2), tol=1e-11)
    dZ = Z2["Z"][np.ix_(dr, dr)] - out_true["Z"][np.ix_(dr, dr)]
    img = eit_difference_image(case, out_true, dZ)
    body = np.asarray(case.tet_body)
    vol = np.asarray(case.vol)
    means = [float((vol[body == b] * img[body == b]).sum()
                   / vol[body == b].sum()) for b in (1, 2, 3)]
    print("difference image (skin sigma -20%): layer-mean responses "
          + ", ".join(f"{nm} {m:+.3e}" for (nm, _, _), m
                      in zip(LAYERS, means)))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sens = eit_sensitivity_cells(case, out_true)
        cc = np.asarray(mesh.nodes)[np.asarray(case.tets)].mean(axis=1)
        lz = sum(t for _, t, _ in LAYERS)
        sel = cc[:, 2] > lz - 0.0045               # skin-depth slice

        fig, axes = plt.subplots(1, 3, figsize=(15, 4.4))
        ax = axes[0]
        ax.semilogy(rec["loss_history"], "o-", ms=3, color="0.25")
        ax.set_xlabel("residual evaluation")
        ax.set_ylabel("normalized loss")
        ax.set_title("Gauss-Newton convergence")
        ax.grid(alpha=0.3)

        for ax, val, name, cmap in (
                (axes[1], np.log10(np.maximum(sens[sel], 1e-30)),
                 "log10 sensitivity (skin slice)", "viridis"),
                (axes[2], img[sel],
                 "difference image (skin slice)", "RdBu_r")):
            lim = dict(vmin=-np.abs(img[sel]).max(),
                       vmax=np.abs(img[sel]).max()) \
                if cmap == "RdBu_r" else {}
            sc = ax.scatter(cc[sel, 0] * 1e3, cc[sel, 1] * 1e3,
                            c=val, s=8, cmap=cmap, **lim)
            for (px, py), b in zip(PATCH_XY, range(4)):
                ax.add_patch(plt.Rectangle(
                    ((px - PATCH_W) * 1e3, (py - PATCH_W) * 1e3),
                    2e3 * PATCH_W, 2e3 * PATCH_W, fill=False,
                    ec="k", lw=1.0))
            ax.set_aspect("equal")
            ax.set_xlabel("x (mm)")
            ax.set_title(name)
            fig.colorbar(sc, ax=ax, shrink=0.85)
        fig.suptitle("EIT fitting session (complete electrode model)")
        fig.tight_layout()
        fp = Path(args.outdir) / "eit_summary.png"
        fig.savefig(fp, dpi=150, bbox_inches="tight")
        print(f"  figure -> {fp}")

    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

"""Tissue-conductivity uncertainty quantification on the step04 case.

Literature tissue conductivities are uncertain by 1.3-3x (the very
reason the reference sweeps sigma_skin and sigma_contact by hand —
step03 params.yaml:33, step04 params.yaml:51-56).  This app propagates
that uncertainty properly: it samples log-normal conductivity tables
around the nominal values, solves EVERY sample as one vmapped
certified-1e-8 MG batch (zero re-assembly — the same engine as the
material sweeps), extracts the full metric row per sample in one
batched device pass, and reports dose percentiles plus adjoint-based
elasticities (d ln metric / d ln sigma_b from ONE extra
forward+adjoint solve, ops/adjoint.sigma_sensitivity).

The reference pipeline would need n_samples ElmerSolver subprocess
runs for the Monte-Carlo alone and a re-solve per tissue per probe for
the sensitivities.

Usage: python apps/run_uq.py [--full] [--n N] [--seed S] [--plot]
                             [--outdir DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.uq import DEFAULT_GSD as GSD  # noqa: E402


def run_recruitment_uq(args):
    """Does the programmed current recruit the target?  Tissue
    conductivities are 1.3-3x uncertain; this propagates that prior
    into the S3 recruitment-threshold distribution on the pelvic
    model: one vmapped certified solve batch over sigma samples, AF
    path profiles gathered on device (no full-field readbacks), Weiss
    strength-duration thresholds per sample -> threshold percentiles
    and P(recruited at I_target)."""
    from pelvistim_fem_tpu.models.pelvis import (build_pelvis_spec,
                                                 nerve_path)
    from pelvistim_fem_tpu.models import pelvis as pv
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined
    from pelvistim_fem_tpu.ops.nerve import (_path_ds, af_from_profile,
                                             path_interp_plan,
                                             strength_duration_factor)
    from pelvistim_fem_tpu.ops.uq import sample_sigma_tables

    spec, params = build_pelvis_spec(coarse=not args.full)
    scase, hier = assemble_lattice(spec, jnp.float64)
    nominal = np.asarray(spec.sigma_table)
    S = args.n
    tables = jnp.asarray(sample_sigma_tables(
        nominal,
        {pv.BODY_MUSCLE: GSD["muscle"], pv.BODY_FAT: GSD["fat"],
         pv.BODY_SKIN: GSD["skin"], pv.BODY_CORE: 1.5,
         pv.BODY_BONE: 1.5}, S, seed=args.seed), jnp.float64)

    t0 = time.perf_counter()
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8,
                                   maxiter=2000)
    float(np.asarray(out.phi[0, 0]))
    t_solve = time.perf_counter() - t0
    assert bool(np.asarray(out.converged).all()), "UQ solves diverged"
    res = float(np.asarray(out.residual).max())
    print(f"  {S} certified pelvis-sample solves in {t_solve:.2f} s "
          f"({S * 60 / t_solve:.0f}/min, max true residual {res:.2e})")

    path = nerve_path(params)
    ids, wts = path_interp_plan(spec.axes, spec.grid_index,
                                spec.grid_shape, path)
    vprof = np.asarray(jnp.einsum(
        "spk,pk->sp", out.phi[:, jnp.asarray(ids)], jnp.asarray(wts),
        precision=jax.lax.Precision.HIGHEST))
    ds = _path_ds(path)
    h_max = max(float(np.diff(np.asarray(a)).max()) for a in spec.axes)
    nv = params["nerve"]
    I_mA = params["stim"]["injected_current_mA"]
    sd = strength_duration_factor(
        params["stim"].get("pulse_width_us", 210.0) * 1e-6,
        nv.get("chronaxie_us", 150.0) * 1e-6)
    thr = np.full(S, np.inf)
    max_af = np.zeros(S)
    for i in range(S):
        af = af_from_profile(vprof[i], ds, 3.0 * h_max)
        max_af[i] = af["max_AF"]
        if np.isfinite(af["max_AF"]) and af["max_AF"] > 0:
            thr[i] = (nv["af_threshold_V_per_m2"] / af["max_AF"]) \
                * sd * I_mA
    p5, p50, p95 = np.percentile(thr, [5, 50, 95])
    p_recruit = float((thr <= I_mA).mean())
    print(f"  threshold current (d_ref fiber, PW-corrected): "
          f"p5 {p5:.0f} / p50 {p50:.0f} / p95 {p95:.0f} mA; "
          f"P(recruited at {I_mA:g} mA) = {100*p_recruit:.0f}%")

    ok = (np.isfinite(max_af).all() and (max_af > 0).all()
          and np.isfinite([p5, p50, p95]).all())
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir,
                           "recruitment_summary.json"), "w") as f:
        json.dump({
            "n_samples": S, "seed": args.seed, "tol": 1e-8,
            "max_true_residual": res,
            "solve_wall_s": round(t_solve, 3),
            "threshold_mA": {"p5": float(p5), "p50": float(p50),
                             "p95": float(p95)},
            "max_AF_V_per_m2": {"p5": float(np.percentile(max_af, 5)),
                                "p50": float(np.percentile(max_af, 50)),
                                "p95": float(np.percentile(max_af, 95))},
            "p_recruited_at_target": p_recruit,
            "I_target_mA": I_mA, "ok": bool(ok),
        }, f, indent=1)
    print(f"  summary -> {args.outdir}/recruitment_summary.json")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        fin = thr[np.isfinite(thr)]
        ax.hist(fin, bins=30, color="#4c72b0", alpha=0.85)
        ax.axvline(I_mA, color="k", ls="--", lw=1,
                   label=f"programmed {I_mA:g} mA")
        for p in (p5, p50, p95):
            ax.axvline(p, color="gray", ls=":", lw=0.9)
        ax.set_xlabel("recruitment threshold current (mA)")
        ax.set_ylabel("samples")
        ax.set_title(f"threshold distribution under sigma uncertainty "
                     f"({S} samples)")
        ax.legend()
        fig.tight_layout()
        p = os.path.join(args.outdir, "recruitment_uq.png")
        fig.savefig(p, dpi=140)
        print(f"  figure -> {p}")
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full step04 resolution (~172k tets)")
    ap.add_argument("--n", type=int, default=200,
                    help="Monte-Carlo samples")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--outdir", default="results_uq")
    ap.add_argument("--recruitment", action="store_true",
                    help="pelvis-model UQ: propagate tissue-sigma "
                         "uncertainty into nerve recruitment-threshold "
                         "percentiles")
    args = ap.parse_args()

    jax.config.update("jax_enable_x64", True)
    if args.recruitment:
        run_recruitment_uq(args)
        return
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                                   build_pressure_spec)
    from pelvistim_fem_tpu.ops.adjoint import sigma_sensitivity
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.metrics import extract_results_batched
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined

    body_name = {core.BODY_MUSCLE: "muscle", core.BODY_FAT: "fat",
                 core.BODY_SKIN: "skin",
                 core.BODY_CONTACT_ACTIVE: "contact_a",
                 core.BODY_CONTACT_RETURN: "contact_r"}

    spec, params = build_pressure_spec(coarse=not args.full)
    scase, hier = assemble_lattice(spec, jnp.float64)
    nominal = np.asarray(spec.sigma_table)

    from pelvistim_fem_tpu.ops.uq import sample_sigma_tables
    S = args.n
    tables = jnp.asarray(sample_sigma_tables(
        nominal, {core.BODY_MUSCLE: GSD["muscle"],
                  core.BODY_FAT: GSD["fat"],
                  core.BODY_SKIN: GSD["skin"]}, S, seed=args.seed),
        jnp.float64)

    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    float(np.asarray(out.phi[0, 0]))            # compile
    t0 = time.perf_counter()
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    float(np.asarray(out.phi[0, 0]))
    t_solve = time.perf_counter() - t0
    assert bool(np.asarray(out.converged).all()), "UQ solves diverged"
    res = float(np.asarray(out.residual).max())
    print(f"  {S} certified posterior-sample solves in {t_solve:.2f} s "
          f"({S * 60 / t_solve:.0f}/min, max true residual {res:.2e})")

    case, _ = build_pressure_case(coarse=not args.full,
                                  dtype=jnp.float32, to_device=False)
    case = jax.device_put(case)
    labels = [f"mc{i:03d}" for i in range(S)]
    t0 = time.perf_counter()
    rows = extract_results_batched(
        case, out.phi.astype(jnp.float32), params,
        sigma_tables=tables.astype(jnp.float32),
        pressure_labels=labels,
        sigma_contacts=[float(nominal[core.BODY_CONTACT_ACTIVE])] * S)
    t_extract = time.perf_counter() - t0

    keys = ("roi_mean_E", "roi_mean_J", "compliance_V",
            "peak_J_skin_no_elec", "flux_err")
    stats = {}
    print(f"  full metric rows extracted in {t_extract:.2f} s\n")
    print(f"  {'metric':<20} {'p5':>10} {'p50':>10} {'p95':>10} "
          f"{'mean':>10}")
    for k in keys:
        v = np.asarray([r[k] for r in rows], float)
        p5, p50, p95 = np.percentile(v, [5, 50, 95])
        stats[k] = {"p5": float(p5), "p50": float(p50),
                    "p95": float(p95), "mean": float(v.mean()),
                    "std": float(v.std())}
        print(f"  {k:<20} {p5:>10.4g} {p50:>10.4g} {p95:>10.4g} "
              f"{v.mean():>10.4g}")

    # discretization-vs-parameter honesty: the ZZ estimated relative
    # discretization error per posterior sample (one vmapped pass,
    # zero extra solves — the indicator is a metric like any other).
    # Metric spreads at or below this relative scale are mesh
    # artifacts, not tissue-parameter physics.
    from pelvistim_fem_tpu.ops.estimate import zz_global_error
    t0 = time.perf_counter()
    rels = np.asarray(jax.vmap(
        lambda ph, sg: zz_global_error(case, ph, sg)[1])(
            out.phi.astype(jnp.float32), tables.astype(jnp.float32)))
    t_zz = time.perf_counter() - t0
    stats["zz_rel_discretization_error"] = {
        "p50": float(np.median(rels)), "max": float(rels.max())}
    print(f"\n  ZZ discretization error (energy norm): median "
          f"{np.median(rels):.2%}, max {rels.max():.2%} across samples "
          f"({t_zz:.2f} s) — treat metric spreads at or below this "
          f"relative scale as mesh, not physics")

    # adjoint elasticities of the ROI dose at the nominal table:
    # ONE forward + ONE adjoint solve for ALL tissues at once
    r_cfg = params["roi"]
    meta = case.meta
    z_nerve = meta.z_skin_top - r_cfg["z_target"]
    roi_cen = np.array([meta.e1_pos[0], meta.e1_pos[1], z_nerve])
    cen = np.asarray(case.nodes)[np.asarray(case.tets)].mean(axis=1)
    mask = np.linalg.norm(cen - roi_cen, axis=1) < r_cfg["roi_radius"]
    if mask.sum() < 4:
        mask = np.linalg.norm(cen - roi_cen, axis=1) < \
            2 * r_cfg["roi_radius"]
    wvol = jnp.asarray(np.where(mask, np.asarray(case.vol), 0.0),
                       jnp.float64)
    grads = jnp.asarray(np.asarray(case.grads), jnp.float64)
    tets = jnp.asarray(np.asarray(case.tets))
    vol_roi = float(np.asarray(case.vol)[mask].sum())

    def roi_mean_E(phi, sig):
        E = -jnp.einsum("mid,mi->md", grads, phi[tets],
                        precision=jax.lax.Precision.HIGHEST)
        Emag = jnp.sqrt(jnp.sum(E * E, axis=1) + 1e-30)
        return jnp.sum(wvol * Emag) / vol_roi

    t0 = time.perf_counter()
    J0, g = sigma_sensitivity(roi_mean_E, scase, hier,
                              jnp.asarray(nominal))
    J0 = float(J0)
    g = np.asarray(g)
    t_sens = time.perf_counter() - t0
    elas = {body_name[b]: float(g[b] * nominal[b] / J0)
            for b in sorted(body_name) if b < len(nominal)}
    print(f"\n  nominal ROI mean |E| (P1) {J0:.4g} V/m; elasticities "
          f"d ln E / d ln sigma (1 fwd + 1 adj solve, {t_sens:.1f} s):")
    for nm, e in sorted(elas.items(), key=lambda kv: -abs(kv[1])):
        print(f"    {nm:<10} {e:+8.4f}")

    ok = (bool(np.asarray(out.converged).all())
          and all(np.isfinite(list(s.values())).all()
                  for s in stats.values())
          and stats["roi_mean_E"]["p5"] > 0
          and np.isfinite(list(elas.values())).all())

    os.makedirs(args.outdir, exist_ok=True)
    summary = {
        "n_samples": S, "seed": args.seed, "gsd": GSD,
        "tol": 1e-8, "max_true_residual": res,
        "solve_wall_s": round(t_solve, 3),
        "extract_wall_s": round(t_extract, 3),
        "solves_per_min": round(S * 60 / t_solve, 1),
        "stats": stats,
        "roi_mean_E_nominal_p1": J0,
        "elasticities": elas,
        "ok": bool(ok),
    }
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n  summary -> {args.outdir}/summary.json")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        v = np.asarray([r["roi_mean_E"] for r in rows], float)
        axes[0].hist(v, bins=30, color="#4c72b0", alpha=0.85)
        for p, c in ((stats["roi_mean_E"]["p5"], "gray"),
                     (stats["roi_mean_E"]["p50"], "k"),
                     (stats["roi_mean_E"]["p95"], "gray")):
            axes[0].axvline(p, color=c, ls="--", lw=1)
        axes[0].set_xlabel("ROI mean |E| (V/m)")
        axes[0].set_title(f"dose distribution ({S} samples)")
        c = np.asarray([r["compliance_V"] for r in rows], float)
        axes[1].hist(c, bins=30, color="#dd8452", alpha=0.85)
        axes[1].set_xlabel("compliance voltage (V)")
        axes[1].set_title("compliance distribution")
        names = [nm for nm, _ in
                 sorted(elas.items(), key=lambda kv: abs(kv[1]))]
        vals = [elas[nm] for nm in names]
        axes[2].barh(names, vals,
                     color=["#c44e52" if x < 0 else "#55a868"
                            for x in vals])
        axes[2].axvline(0, color="k", lw=0.8)
        axes[2].set_xlabel("d ln(ROI E) / d ln sigma")
        axes[2].set_title("adjoint elasticities (tornado)")
        fig.tight_layout()
        p = os.path.join(args.outdir, "uq_summary.png")
        fig.savefig(p, dpi=140)
        print(f"  figure -> {p}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

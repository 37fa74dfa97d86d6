"""Electrode-array stimulation design demo — lead fields + pattern
optimization.

Builds a K-disc electrode ring on the layered tissue slab
(models/array.py), solves all K lead-field basis problems as ONE
vmapped certified-1e-8 MG batch over the RHS axis (ops/leadfield.py),
and designs the injected current pattern that maximizes directional E
in a mid-muscle ROI subject to a total-current budget, per-channel
caps, and a skin current-density safety limit.

No reference analogue: the reference pipeline hard-codes one
active/return pair (step02 run_sweep.py:66-79) and would re-run the
Gmsh+ElmerGrid+ElmerSolver chain once per electrode to even form the
lead matrix.

Usage: python apps/run_array_opt.py [--full] [--k K] [--budget-mA B]
           [--imax-mA M] [--jlimit JLIM] [--plot] [--outdir DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="fine resolution (default: coarse)")
    ap.add_argument("--k", type=int, default=8,
                    help="number of ring electrodes")
    ap.add_argument("--budget-mA", type=float, default=4.0,
                    help="total delivered current budget (sum |i_k|)")
    ap.add_argument("--imax-mA", type=float, default=2.0,
                    help="per-channel current cap")
    ap.add_argument("--jlimit", type=float, default=0.0,
                    help="skin |J| safety limit in A/m^2 "
                         "(0 = 60%% of the best single-channel peak "
                         "at its feasible amplitude — binding)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--robust", type=int, default=0, metavar="S",
                    help="ALSO design against S log-normal conductivity "
                         "samples (worst-case objective, sample-wise "
                         "skin safety): S*K certified solves in one "
                         "vmapped batch")
    ap.add_argument("--pareto", type=int, default=0, metavar="P",
                    help="dose-vs-safety Pareto sweep over P skin-|J| "
                         "limits (no new FEM solves)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--outdir", default="results_array_opt")
    args = ap.parse_args()

    jax.config.update("jax_enable_x64", True)
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.array import (array_recipe,
                                                build_array_specs,
                                                default_array_params)
    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.leadfield import (lead_vectors,
                                                 optimize_pattern,
                                                 solve_basis_refined)

    params = default_array_params(coarse=not args.full)
    params["n_electrodes"] = args.k
    t0 = time.perf_counter()
    specs, params, meta = build_array_specs(params)
    t_specs = time.perf_counter() - t0
    K = len(specs)
    gx, gy, gz = specs[0].grid_shape
    print(f"  {K}-electrode array, grid {gx}x{gy}x{gz} "
          f"({int(np.sum(specs[0].body6 > 0))} tets), "
          f"specs built in {t_specs:.2f} s")

    # one shared operator + hierarchy; K loads
    scase, hier = assemble_lattice(specs[0], jnp.float64)
    loads = jnp.asarray(np.stack([s.b_neumann for s in specs]))

    out = solve_basis_refined(scase, hier, loads, tol=1e-8)  # compile
    float(np.asarray(out.phi[0, 0]))
    t0 = time.perf_counter()
    out = solve_basis_refined(scase, hier, loads, tol=1e-8)
    float(np.asarray(out.phi[0, 0]))
    t_basis = time.perf_counter() - t0
    assert bool(np.asarray(out.converged).all())
    res = float(np.asarray(out.residual).max())
    print(f"  {K} certified basis solves in {t_basis:.2f} s "
          f"(max true residual {res:.2e}, "
          f"iters {np.asarray(out.iterations).tolist()})")

    # element mesh (identical lattice) for field/lead extraction
    sigma_by_body = {
        core.BODY_MUSCLE: params["sigma_Spm"]["muscle"],
        core.BODY_FAT: params["sigma_Spm"]["fat"],
        core.BODY_SKIN: params["sigma_Spm"]["skin"],
    }
    # lead extraction runs in f32 (bench.py discipline: the certified
    # f64 phi casts exactly to ~1e-7, far below metric tolerances;
    # f64 einsums on TPU are emulated and memory-hungry at 676k tets)
    case = build_case(array_recipe(params, 0).mesh(), sigma_by_body,
                      mode="current", dtype=jnp.float32,
                      injected_current_A=params["I_unit_A"],
                      to_device=False)
    case = jax.device_put(case)
    w, J_skin, vol_roi = lead_vectors(
        case, out.phi.astype(jnp.float32),
        roi_center=meta["roi_center"],
        roi_r=meta["roi_r"], target_dir=meta["target_dir"])
    w_np = np.asarray(w)

    # constraint scales (units of I_unit_A = 1 mA per unit)
    budget = args.budget_mA
    i_max = args.imax_mA

    def single_peak(k, amp):
        J = amp * np.asarray(J_skin[k])
        return float(np.sqrt((J ** 2).sum(axis=1).max()))

    amp1 = min(i_max, budget)
    if args.jlimit > 0:
        j_limit = args.jlimit
    else:
        j_limit = float(0.6 * min(single_peak(k, amp1)
                                  for k in range(K)))

    # best feasible single channel (the conventional one-pair montage)
    best_single, best_k = 0.0, 0
    for k in range(K):
        for s in (+1.0, -1.0):
            e = s * amp1
            pk = single_peak(k, abs(e))
            scale = min(1.0, j_limit / pk)
            val = float(w_np[k] * e * scale)
            if val > best_single:
                best_single, best_k = val, k

    t0 = time.perf_counter()
    i_opt, info = optimize_pattern(w, J_skin, budget=budget,
                                   i_max=i_max, j_limit=j_limit,
                                   steps=args.steps)
    obj = float(info["objective"])
    t_opt = time.perf_counter() - t0
    i_np = np.asarray(i_opt)

    gain = obj / best_single if best_single > 0 else float("inf")
    print(f"\n  pattern optimized in {t_opt:.2f} s "
          f"({args.steps} Frank-Wolfe steps)")
    print(f"  ROI mean E.target  optimized: {obj:8.4f} V/m   "
          f"best single channel: {best_single:8.4f} V/m   "
          f"gain {gain:.2f}x")
    print(f"  constraints: sum|i| {float(info['l1']):.3f} mA "
          f"(budget {budget}), max|i| {float(info['linf']):.3f} mA "
          f"(cap {i_max}), peak skin |J| "
          f"{float(info['peak_J_skin']):.3f} A/m^2 "
          f"(limit {j_limit:.3f})")
    print("\n  ch    x_mm    y_mm    i_mA")
    for k, (px, py) in enumerate(meta["positions"]):
        print(f"  {k:2d} {1e3*px:7.1f} {1e3*py:7.1f} {i_np[k]:+8.4f}")

    ok = (float(info["l1"]) <= budget * (1 + 1e-9)
          and float(info["linf"]) <= i_max * (1 + 1e-9)
          and float(info["peak_J_skin"]) <= j_limit * (1 + 1e-9)
          and obj >= best_single * (1 - 1e-6))

    pareto = None
    if args.pareto > 0:
        # Dose-vs-safety tradeoff: re-run the Frank-Wolfe design over a
        # j_limit sweep.  The lead vectors are already in hand, so each
        # Pareto point costs only a 400-step jitted ascent — NO new FEM
        # solves (the reference would re-run its whole subprocess chain
        # per point).  The curve is the clinician's operating diagram:
        # how much ROI dose each increment of skin-safety margin buys.
        t0 = time.perf_counter()
        j_grid = np.logspace(np.log10(j_limit / 4),
                             np.log10(4 * j_limit), args.pareto)
        pareto_rows = []
        for jl in j_grid:
            ip, inf_p = optimize_pattern(w, J_skin, budget=budget,
                                         i_max=i_max, j_limit=jl,
                                         steps=args.steps)
            pareto_rows.append({
                "j_limit_Apm2": float(jl),
                "roi_E_Vpm": float(inf_p["objective"]),
                "peak_J_skin_Apm2": float(inf_p["peak_J_skin"]),
                "l1_mA": float(inf_p["l1"]),
            })
        t_par = time.perf_counter() - t0
        doses = [r["roi_E_Vpm"] for r in pareto_rows]
        # dose is nondecreasing in the safety limit (larger feasible set)
        ok &= all(a <= b + 1e-9 for a, b in zip(doses, doses[1:]))
        ok &= all(r["peak_J_skin_Apm2"] <= r["j_limit_Apm2"] * (1 + 1e-6)
                  for r in pareto_rows)
        print(f"\n  Pareto dose-vs-safety sweep: {args.pareto} limits "
              f"in {t_par:.2f} s (zero new solves); dose "
              f"{doses[0]:.3f} -> {doses[-1]:.3f} V/m over j_limit "
              f"{j_grid[0]:.3f} -> {j_grid[-1]:.3f} A/m^2")
        pareto = pareto_rows

    robust = None
    if args.robust > 0:
        from pelvistim_fem_tpu.ops.leadfield import (
            optimize_pattern_robust, solve_basis_ensemble_refined)
        from pelvistim_fem_tpu.ops.uq import (DEFAULT_GSD,
                                              sample_sigma_tables)
        S = args.robust
        gsd = {core.BODY_MUSCLE: DEFAULT_GSD["muscle"],
               core.BODY_FAT: DEFAULT_GSD["fat"],
               core.BODY_SKIN: DEFAULT_GSD["skin"]}
        samples = sample_sigma_tables(np.asarray(specs[0].sigma_table),
                                      gsd, S, seed=args.seed)
        tabs = jnp.asarray(samples, jnp.float64)
        ens = solve_basis_ensemble_refined(scase, hier, loads, tabs,
                                           tol=1e-8)    # compile
        float(np.asarray(ens.phi[0, 0, 0]))
        t0 = time.perf_counter()
        ens = solve_basis_ensemble_refined(scase, hier, loads, tabs,
                                           tol=1e-8)
        float(np.asarray(ens.phi[0, 0, 0]))
        t_ens = time.perf_counter() - t0
        assert bool(np.asarray(ens.converged).all())
        w_sk, Jsk = [], []
        for s in range(S):
            ws, Js, _ = lead_vectors(
                case, ens.phi[s].astype(jnp.float32),
                roi_center=meta["roi_center"], roi_r=meta["roi_r"],
                target_dir=meta["target_dir"],
                sigma_table=jnp.asarray(samples[s], jnp.float32))
            w_sk.append(ws)
            Jsk.append(Js)
        w_sk = jnp.stack(w_sk)
        Jsk = jnp.stack(Jsk)
        t0 = time.perf_counter()
        i_rob, rinfo = optimize_pattern_robust(
            w_sk, Jsk, budget=budget, i_max=i_max, j_limit=j_limit,
            steps=args.steps,
            candidates=jnp.asarray([i_np], w_sk.dtype))
        t_ropt = time.perf_counter() - t0
        # the NOMINAL pattern evaluated under the sampled worlds
        w_np_sk = np.asarray(w_sk)
        J_all = np.einsum("k,skmc->smc", i_np, np.asarray(Jsk))
        pk_nom = float(np.sqrt((J_all ** 2).sum(axis=2).max()))
        i_nom_feas = i_np * min(1.0, j_limit / max(pk_nom, 1e-30))
        nom_worst = float((w_np_sk @ i_nom_feas).min())
        rob_worst = float(rinfo["objective_worst"])
        print(f"\n  ROBUST design over {S} sigma samples "
              f"({S * K} certified solves in {t_ens:.2f} s, "
              f"worst-case FW in {t_ropt:.2f} s):")
        print(f"  worst-sample ROI dose  robust: {rob_worst:8.4f} V/m   "
              f"nominal pattern: {nom_worst:8.4f} V/m   "
              f"(+{100 * (rob_worst / max(nom_worst, 1e-30) - 1):.1f}%)")
        print(f"  sample-wise peak skin |J| "
              f"{float(rinfo['peak_J_skin']):.3f} <= {j_limit:.3f}")
        ok &= (rob_worst >= nom_worst * (1 - 1e-6)
               and float(rinfo["peak_J_skin"]) <= j_limit * (1 + 1e-9))
        robust = {
            "S": S, "seed": args.seed,
            "ensemble_wall_s": round(t_ens, 3),
            "opt_wall_s": round(t_ropt, 3),
            "pattern_mA": np.asarray(i_rob).tolist(),
            "worst_dose_robust_Vpm": rob_worst,
            "worst_dose_nominal_pattern_Vpm": nom_worst,
            "mean_dose_robust_Vpm": float(rinfo["objective_mean"]),
            "peak_J_skin_Apm2": float(rinfo["peak_J_skin"]),
        }

    os.makedirs(args.outdir, exist_ok=True)
    summary = {
        "K": K, "grid": [int(gx), int(gy), int(gz)],
        "n_tets": int(case.n_tets),
        "tol": 1e-8, "max_true_residual": res,
        "basis_wall_s": round(t_basis, 3),
        "opt_wall_s": round(t_opt, 3),
        "budget_mA": budget, "imax_mA": i_max,
        "jlimit_Apm2": j_limit,
        "roi_vol_mm3": float(vol_roi) * 1e9,
        "lead_w_Vpm_per_mA": w_np.tolist(),
        "pattern_mA": i_np.tolist(),
        "roi_E_optimized_Vpm": obj,
        "roi_E_best_single_Vpm": best_single,
        "gain": gain,
        "peak_J_skin_Apm2": float(info["peak_J_skin"]),
        "robust": robust,
        "pareto": pareto,
        "ok": bool(ok),
    }
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n  summary -> {args.outdir}/summary.json")

    if args.plot:
        from pelvistim_fem_tpu.viz.plots import plot_array_opt
        plot_array_opt(params, meta, i_np, np.asarray(info["history"]),
                       summary, outdir=args.outdir)
        if pareto:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(6, 4))
            jl = [r["j_limit_Apm2"] for r in pareto]
            dd = [r["roi_E_Vpm"] for r in pareto]
            ax.semilogx(jl, dd, marker="o", ms=4)
            ax.axvline(j_limit, color="gray", ls="--", lw=0.9,
                       label=f"operating limit {j_limit:.2f}")
            ax.set_xlabel("skin |J| safety limit (A/m$^2$)")
            ax.set_ylabel("achievable ROI dose (V/m)")
            ax.set_title("dose vs safety Pareto (fixed budget/caps)")
            ax.grid(alpha=0.3, which="both")
            ax.legend(fontsize=8)
            fig.tight_layout()
            fp = os.path.join(args.outdir, "pareto.png")
            fig.savefig(fp, dpi=140)
            print(f"  figure -> {fp}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

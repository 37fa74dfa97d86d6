#!/usr/bin/env python3
"""step03 — layered ankle sweep (fat thickness x electrode radius).

TPU-native replacement for the reference's run_layered_sweep.py main loop
(mesh -> ElmerGrid -> detect BCs -> write sif -> ElmerSolver -> extract,
:1034-1126): each case is one in-memory build + stencil PCG solve; output
contract (per-case dir with bc_debug_report.txt, results/summary.csv,
summary.json, run summary) matches the reference.

Usage:  python apps/run_step03.py [--smoke] [--outdir results_step03]
                                  [--plot] [--resume] [--save-vtu]
                                  [--export-elmer] [--profile DIR]
"""

import argparse
import contextlib
import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_enable_x64", True)


def run_adapt(args):
    """ZZ-driven mesh adaptation on the step03 anchor case.

    The reference picks characteristic lengths by hand (params.yaml:
    67-70) and has no way to know what accuracy they buy.  This mode
    closes the loop: solve -> per-element ZZ indicators (per-body
    recovery — naive recovery is O(1) wrong at the 7000x tissue
    interfaces, pinned in tests/test_estimate.py) -> equidistribute
    every lattice axis at the SAME cell count (layer-interface z-knots
    locked) -> re-solve.  Reports the estimated relative energy error
    and the geometric flux_err per cycle; exit 1 if adaptation ever
    makes the estimate >10% worse (the hand grading being already
    near-optimal is a PASS — the estimator then certifies it)."""
    import time

    import numpy as np

    from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe
    from pelvistim_fem_tpu.models.ankle import layered_model_inputs
    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops.estimate import (adapt_recipe,
                                                zz_error_indicators,
                                                zz_global_error)
    from pelvistim_fem_tpu.ops.metrics import extract_results
    from pelvistim_fem_tpu.runner import solve_auto
    from pelvistim_fem_tpu.utils.config import default_params, load_params

    p = (load_params(args.params) if args.params
         else default_params("step03_ankle_layers"))
    (Lx, Ly, Lz), rk, sigma_by_body, bc_kwargs, meta_extra, p = \
        layered_model_inputs(p, coarse=args.smoke)
    recipe = layered_slab_recipe(Lx, Ly, Lz, **rk)
    # locked z-knots: every layer interface (+ contact top) — bodies
    # classify by centroid, so these must stay exact grid planes
    keep_z = [0.0]
    for _b, t, _h in rk["layers"]:
        keep_z.append(keep_z[-1] + t)
    if rk.get("contact_t", 0.0) > 0:
        keep_z.append(Lz + rk["contact_t"])

    rel_hist, trace = [], []
    for cycle in range(args.adapt + 1):
        t0 = time.perf_counter()
        mesh = recipe.mesh()
        case = build_case(mesh, sigma_by_body, meta_extra=meta_extra,
                          **bc_kwargs)
        res = solve_auto(case, mesh, tol=1e-8)
        assert bool(np.asarray(res.converged))
        eta = zz_error_indicators(case, res.phi)
        _, rel = (float(v) for v in zz_global_error(case, res.phi))
        row = extract_results(case, res.phi, p, verbose=False)
        rel_hist.append(rel)
        from pelvistim_fem_tpu.ops.estimate import \
            lattice_axis_weights as _law
        knots = (recipe.xs, recipe.ys, recipe.zs)
        trace.append((knots, _law(case, mesh, knots, eta),
                      float(row["flux_err"])))
        print(f"cycle {cycle}: {mesh.n_tets:,} tets "
              f"({len(recipe.xs)}x{len(recipe.ys)}x{len(recipe.zs)} "
              f"knots)  est rel energy err {rel:.3%}  "
              f"flux_err {row['flux_err']:.2%}  "
              f"({time.perf_counter() - t0:.1f} s)")
        if cycle < args.adapt:
            recipe = adapt_recipe(recipe, case, mesh, eta,
                                  keep_z=keep_z)

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        ax = axes[0]
        ax.plot(range(len(rel_hist)), [100 * r for r in rel_hist],
                "o-", color="0.25", label="est energy err")
        ax.plot(range(len(trace)), [100 * t[2] for t in trace],
                "s--", color="tab:red", label="flux_err")
        ax.set_xlabel("adaptation cycle")
        ax.set_ylabel("%")
        ax.set_title("ZZ estimate + flux parity per cycle")
        ax.legend()
        ax.grid(alpha=0.3)

        for ax, axis_i, nm in ((axes[1], 0, "x"), (axes[2], 2, "z")):
            for k, (knots, w, _) in enumerate(
                    [trace[0], trace[-1]] if len(trace) > 1
                    else [trace[0]]):
                kk = np.asarray(knots[axis_i])
                dens = np.sqrt(w[axis_i]) / np.diff(kk)
                lbl = "initial" if k == 0 else "adapted"
                ax.stairs(dens / max(dens.max(), 1e-300), kk * 1e3,
                          label=f"{lbl} error density")
                ax.eventplot(kk * 1e3, lineoffsets=-0.08 - 0.1 * k,
                             linelengths=0.08,
                             color=f"C{k}")
            ax.set_xlabel(f"{nm} (mm)")
            ax.set_title(f"{nm}-axis error density + knots")
            ax.legend(fontsize=8)
            ax.grid(alpha=0.3)
        fig.suptitle("ZZ-driven lattice adaptation (step03 anchor)")
        fig.tight_layout()
        out = Path(args.outdir)
        out.mkdir(parents=True, exist_ok=True)
        fp = out / "adapt_summary.png"
        fig.savefig(fp, dpi=150, bbox_inches="tight")
        print(f"  figure -> {fp}")
    best = min(rel_hist[1:], default=rel_hist[0])
    if best > 1.10 * rel_hist[0]:
        print(f"FAIL: adaptation degraded the estimate "
              f"({rel_hist[0]:.3%} -> {best:.3%})")
        return 1
    verdict = ("improved" if best < 0.98 * rel_hist[0]
               else "certified near-optimal")
    print(f"PASS: hand grading {verdict} "
          f"({rel_hist[0]:.3%} -> {best:.3%} at equal cell count)")
    return 0


def run_adapt_local(args):
    """LOCAL (bisection) adaptation on the step03 anchor — the
    per-DOF-efficient twin of run_adapt (round-4 VERDICT item 4).

    Where --adapt regrades whole axis planes domain-wide, this mode
    bisects only the tets the ZZ indicators mark (Dorfler bulk
    chasing + conforming Maubach closure, mesh/refine.py): fine cells
    concentrate under the electrode rims the way the reference's Gmsh
    Distance/Threshold fields put them (run_sweep.py:112-121).  Each
    cycle re-solves on the certified AMG path (the refined mesh has no
    lattice provenance), re-classifies electrode faces on the finer
    boundary, and reports est energy error + geometric flux_err +
    rim-sensitive peak_J.  Exit 1 if the estimated error ever grows
    >10% cycle-over-cycle."""
    import time

    import numpy as np

    from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe
    from pelvistim_fem_tpu.mesh.refine import BisectionMesh, mark_doerfler
    from pelvistim_fem_tpu.models.ankle import layered_model_inputs
    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops.estimate import (zz_error_indicators,
                                                zz_global_error)
    from pelvistim_fem_tpu.ops.metrics import extract_results
    from pelvistim_fem_tpu.runner import solve_auto
    from pelvistim_fem_tpu.utils.config import default_params, load_params

    p = (load_params(args.params) if args.params
         else default_params("step03_ankle_layers"))
    (Lx, Ly, Lz), rk, sigma_by_body, bc_kwargs, meta_extra, p = \
        layered_model_inputs(p, coarse=args.smoke)
    recipe = layered_slab_recipe(Lx, Ly, Lz, **rk)
    bm = BisectionMesh.from_recipe(recipe)

    rel_prev = None
    failed = False
    for cycle in range(args.adapt_local + 1):
        t0 = time.perf_counter()
        mesh = bm.mesh()
        t_mesh = time.perf_counter() - t0
        t1 = time.perf_counter()
        case = build_case(mesh, sigma_by_body, meta_extra=meta_extra,
                          **bc_kwargs)
        t_case = time.perf_counter() - t1
        t1 = time.perf_counter()
        res = solve_auto(case, mesh, tol=1e-8)
        t_solve = time.perf_counter() - t1
        assert bool(np.asarray(res.converged))
        t1 = time.perf_counter()
        eta = np.asarray(zz_error_indicators(case, res.phi))
        _, rel = (float(v) for v in zz_global_error(case, res.phi))
        t_est = time.perf_counter() - t1
        t1 = time.perf_counter()
        row = extract_results(case, res.phi, p, verbose=False)
        t_ext = time.perf_counter() - t1
        print(f"cycle {cycle}: {mesh.n_tets:,} tets  "
              f"est rel energy err {rel:.3%}  "
              f"flux_err {row['flux_err']:.2%}  "
              f"peak_J_no_elec {row['peak_J_skin_no_elec']:.1f} A/m^2  "
              f"({time.perf_counter() - t0:.1f} s: mesh {t_mesh:.1f}, "
              f"case {t_case:.1f}, solve+amg {t_solve:.1f}, "
              f"zz {t_est:.1f}, extract {t_ext:.1f})", flush=True)
        if rel_prev is not None and rel > 1.10 * rel_prev:
            print(f"  FAIL: estimate grew >10% ({rel_prev:.3%} -> "
                  f"{rel:.3%})")
            failed = True
        rel_prev = rel
        if cycle < args.adapt_local:
            bm = bm.refine(mark_doerfler(eta, theta=args.theta))
    return 1 if failed else 0


def main():
    ap = argparse.ArgumentParser(description="Ankle layered slab sweep")
    ap.add_argument("--smoke", action="store_true",
                    help="Single coarse case for quick pipeline check")
    ap.add_argument("--outdir", default="results_step03")
    ap.add_argument("--params", default=None,
                    help="params.yaml path (default: bundled step03)")
    ap.add_argument("--plot", action="store_true",
                    help="write the step03 figure families")
    ap.add_argument("--resume", action="store_true",
                    help="skip cases whose per-case row.json already "
                         "exists (the reference's artifact-exists resume "
                         "pattern, SURVEY.md section 5)")
    ap.add_argument("--save-vtu", action="store_true",
                    help="write a solution VTU per case (ParaView/pyvista "
                         "interop)")
    ap.add_argument("--export-elmer", action="store_true",
                    help="also write elmer_mesh/ + case.sif per case for "
                         "cross-validation with ElmerSolver")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace into DIR")
    ap.add_argument("--batch", action="store_true",
                    help="solve each radius group's t_fat variants as ONE "
                         "vmapped batch on a shared lattice "
                         "(parallel/geometry_sweep.py) instead of the "
                         "serial per-case loop")
    ap.add_argument("--adapt-local", type=int, default=0, metavar="N",
                    help="N cycles of ZZ-driven LOCAL bisection "
                         "refinement on the anchor case (conforming "
                         "Maubach closure, certified AMG re-solves)")
    ap.add_argument("--theta", type=float, default=0.5,
                    help="Dorfler marking fraction for --adapt-local")
    ap.add_argument("--adapt", type=int, default=0, metavar="N",
                    help="run N ZZ estimate->regrade cycles on the "
                         "anchor case at EQUAL cell count instead of "
                         "the sweep (ops/estimate.py)")
    args = ap.parse_args()

    if args.adapt_local:
        return run_adapt_local(args)
    if args.adapt:
        return run_adapt(args)

    from pelvistim_fem_tpu.models.ankle import build_layered_case
    from pelvistim_fem_tpu.ops.metrics import extract_results
    from pelvistim_fem_tpu.runner import preferred_dtype, solve_auto
    from pelvistim_fem_tpu.utils.config import (default_params,
                                                get_placement, get_stim,
                                                load_params)
    from pelvistim_fem_tpu.utils.report import (print_run_summary,
                                                save_bc_debug_report)
    from pelvistim_fem_tpu.utils.summary import _NanToNullEncoder, \
        save_results
    from pelvistim_fem_tpu.utils.timing import PhaseTimer

    p = (load_params(args.params) if args.params
         else default_params("step03_ankle_layers"))
    pl = get_placement(p)
    st = get_stim(p)

    if args.smoke:
        t_fat_list = [p["layers"]["t_fat"]]
        r_list_mm = [pl.get("electrode_r_mm_list", [5, 10, 15])[1]]
        coarse = True
        print("=== SMOKE TEST (1 coarse case) ===")
    else:
        t_fat_list = p["layers"]["t_fat_sweep"]
        r_list_mm = pl.get("electrode_r_mm_list", [5, 10, 15])
        coarse = False
        print(f"=== FULL SWEEP: {len(t_fat_list)} fat thicknesses x "
              f"{len(r_list_mm)} electrode sizes = "
              f"{len(t_fat_list)*len(r_list_mm)} cases ===")

    mode = st.get("control_mode", "voltage")
    print(f"\n{'='*60}")
    if mode == "current":
        print("  CONTROL MODE : current")
        print(f"  Injected I   : {st.get('injected_current_mA', 5.0):.1f}"
              f" mA  (Neumann BC at active electrode)")
        print(f"  Compliance   : warn if V_active > "
              f"{st.get('compliance_voltage_V', 100.0):.0f} V")
    else:
        print("  CONTROL MODE : voltage")
        print("  V_active = 1.0 V  |  V_return = 0 V  (Dirichlet BCs)")
    print(f"{'='*60}\n")

    out_root = Path(args.outdir)
    timer = PhaseTimer(verbose=False)
    results = []
    solutions = []   # kept for --plot
    t_start = time.perf_counter()

    prof_ctx = contextlib.nullcontext()
    if args.profile:
        import jax.profiler
        prof_ctx = jax.profiler.trace(args.profile)

    if args.batch:
        # Same tolerance contract as the serial path (params.yaml:92):
        # 1e-8 via the vmapped mixed-precision refined solver (f64
        # master coefficients, f32 inner CG) — identical on CPU and TPU.
        import jax.numpy as _jnp
        with prof_ctx:
            from pelvistim_fem_tpu.parallel.geometry_sweep import \
                solve_t_fat_group
            for r_mm in r_list_mm:
                elec_r = r_mm * 1e-3
                labels = [(f"tfat{int(t_fat*1e6):04d}um_"
                           f"r{int(elec_r*1e6):04d}um")
                          for t_fat in t_fat_list]
                rows = [out_root / lb / "row.json" for lb in labels]
                if args.resume and not args.plot and \
                        all(rp.exists() for rp in rows):
                    # batch granularity: a radius group resumes only
                    # when EVERY case row is cached (partial groups
                    # re-solve — one vmapped solve is the unit of work)
                    print(f"\n[batch r={r_mm:.1f}mm] all "
                          f"{len(rows)} rows cached -> skipping group")
                    results.extend(json.loads(rp.read_text())
                                   for rp in rows)
                    continue
                print(f"\n[batch r={r_mm:.1f}mm] solving "
                      f"{len(t_fat_list)} t_fat variants as one batch "
                      f"(refined, tol 1e-8)")
                with timer.phase("batched solve"):
                    out, cases, meshes = solve_t_fat_group(
                        p, t_fat_list, elec_r, coarse=coarse,
                        dtype=_jnp.float64, tol=1e-8, refined=True)
                import numpy as _np
                print(f"    iters {_np.asarray(out.iterations).tolist()}"
                      f"  converged {bool(out.converged.all())}")
                for i, t_fat in enumerate(t_fat_list):
                    label = (f"tfat{int(t_fat*1e6):04d}um_"
                             f"r{int(elec_r*1e6):04d}um")
                    run_dir = out_root / label
                    save_bc_debug_report(run_dir, label, cases[i], p)
                    if args.export_elmer:
                        from pelvistim_fem_tpu.utils.sif import \
                            export_elmer_case
                        export_elmer_case(cases[i], meshes[i], run_dir)
                    with timer.phase("metrics"):
                        row = extract_results(cases[i], out.phi[i], p)
                    if args.save_vtu:
                        from pelvistim_fem_tpu.utils.vtu import \
                            write_solution_vtu
                        (run_dir / "results").mkdir(parents=True,
                                                    exist_ok=True)
                        write_solution_vtu(
                            run_dir / "results" / "case_t0001.vtu",
                            meshes[i], cases[i], out.phi[i])
                    (run_dir / "row.json").write_text(
                        json.dumps(row, cls=_NanToNullEncoder))
                    results.append(row)
                    if args.plot:
                        solutions.append((label, cases[i], meshes[i],
                                          out.phi[i]))
        _finish(args, p, results, solutions, out_root, timer, t_start)
        return

    with prof_ctx:
        for t_fat in t_fat_list:
            for r_mm in r_list_mm:
                elec_r = r_mm * 1e-3
                label = (f"tfat{int(t_fat*1e6):04d}um_"
                         f"r{int(elec_r*1e6):04d}um")
                run_dir = out_root / label
                row_path = run_dir / "row.json"
                if args.resume and row_path.exists() and not args.plot:
                    print(f"\n[{label}]  cached -> {row_path}")
                    results.append(json.loads(row_path.read_text()))
                    continue
                print(f"\n[{label}]  t_fat={t_fat*1000:.1f}mm  "
                      f"r={r_mm:.1f}mm")
                with timer.phase("mesh+assemble"):
                    case, _, mesh = build_layered_case(
                        p, t_fat=t_fat, elec_r=elec_r, coarse=coarse,
                        dtype=preferred_dtype(), with_mesh=True)
                print(f"    {case.n_nodes} nodes, {case.n_tets} tets, "
                      f"A_active={case.meta.elec_area_mesh*1e4:.4f} cm2")
                save_bc_debug_report(run_dir, label, case, p)
                if args.export_elmer:
                    from pelvistim_fem_tpu.utils.sif import \
                        export_elmer_case
                    export_elmer_case(case, mesh, run_dir)
                res = solve_auto(case, mesh, tol=1e-8, timer=timer)
                with timer.phase("metrics"):
                    row = extract_results(case, res.phi, p)
                if args.save_vtu:
                    from pelvistim_fem_tpu.utils.vtu import \
                        write_solution_vtu
                    (run_dir / "results").mkdir(parents=True,
                                                exist_ok=True)
                    write_solution_vtu(
                        run_dir / "results" / "case_t0001.vtu",
                        mesh, case, res.phi)
                row_path.write_text(json.dumps(row,
                                               cls=_NanToNullEncoder))
                results.append(row)
                if args.plot:
                    solutions.append((label, case, mesh, res.phi))
                print(f"    peak_J_no_elec="
                      f"{row['peak_J_skin_no_elec']:.4f}  "
                      f"roi_mean_E={row['roi_mean_E']:.4f}  "
                      f"flux_err={row['flux_err']:.3e}")

    _finish(args, p, results, solutions, out_root, timer, t_start)


def _finish(args, p, results, solutions, out_root, timer, t_start):
    from pelvistim_fem_tpu.utils.report import print_run_summary
    from pelvistim_fem_tpu.utils.summary import save_results

    wall = time.perf_counter() - t_start
    save_results(results, out_root)
    print_run_summary(results, p)
    if args.plot and solutions:
        from pelvistim_fem_tpu.utils.report import print_sanity_table
        from pelvistim_fem_tpu.viz.plots import (plot_depth_slice_E_maps,
                                                 plot_J_surface_maps,
                                                 plot_model_diagram,
                                                 plot_summary_metrics,
                                                 plot_3d_representative)
        plot_J_surface_maps(solutions, p, out_root)
        plot_summary_metrics(results, p, out_root)
        plot_depth_slice_E_maps(solutions, p, out_root)
        mid = solutions[len(solutions) // 2]
        plot_model_diagram(mid[1], mid[2], mid[3], p, out_root)
        plot_3d_representative(mid[1], mid[2], mid[3], out_root)
        print_sanity_table(results, p)
    n = len(results)
    print(f"  {n} case(s) in {wall:.1f} s = "
          f"{n*60/wall:.1f} solves/min   phases: "
          + ", ".join(f"{k}={v:.1f}s" for k, v in timer.report().items()))


if __name__ == "__main__":
    main()

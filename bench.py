"""Benchmark: 100-case conductivity sweep throughput on one chip.

Workload: the step04 pressure-sweep structure at full reference resolution
(~172k tets / ~32k nodes — the reference solves each case via
ElmerSolver+UMFPACK subprocesses, step04 run_pressure_sweep.py:709-738)
generalized to 100 log-spaced sigma_contact points, solved as ONE vmapped
multigrid-preconditioned CG batch on the structured 27-point stencil
operator (ops/stencil.py + ops/multigrid.py) with zero re-assembly and a
single sigma-independent MG hierarchy.  Problem build uses the
lattice-spec fast path: compact host spec (mesh/spec.py), coefficients +
hierarchy assembled on device (ops/lattice_assembly.py).

Baseline: the reference reports only qualitative runtimes — 9 cases in
20-60 min on a laptop (step03_ankle_layers/README.md:106) => 0.225
solves/min at the 40-min midpoint.  vs_baseline is measured solves/min
over that number.

Prints ONE JSON line.
"""

import glob
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    # x64 on: the sweep solves with mixed-precision refinement (f32 MG-CG
    # inner, f64 residual certification) — plain f32 CG's recursive
    # residual decouples from the true residual at the 7000x material
    # contrast (measured: "converged" 1e-6 lanes carrying 1e-2..1e-1
    # TRUE relative residual, i.e. >5% KCL error at the hard lanes).
    jax.config.update("jax_enable_x64", True)
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                                   build_pressure_spec)
    from pelvistim_fem_tpu.ops.lattice_assembly import (
        assemble_lattice, spec_device_arrays)
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined

    n_cases = 100
    tol = 1e-8           # the reference solver tolerance (params.yaml:92)
    # One-time problem build via the lattice-spec fast path: host numpy
    # builds only the compact spec; coefficients + MG hierarchy are
    # assembled on device (ops/lattice_assembly.py) in f64 (the master
    # operator for refinement; the inner V-cycle runs on f32 casts).
    # Timed warm, like every other number here (jit compile excluded —
    # axon remote-compile latency is documented-erratic).
    # Round-5 (VERDICT item 4): electrode-rim knot bands at h_fine/2
    # (mesh/generate.py) — the staircase rim held max_flux_err at ~1.9%
    # for three rounds; the banded mesh measures 0.56% at the worst
    # lane (3.5x inside the reference's 2% banner) at 2.1x nodes.  The
    # regression guard below compares only same-mesh priors, so the
    # mesh upgrade is surfaced as a comparability NOTE, not misread as
    # a throughput regression.
    from pelvistim_fem_tpu.utils.config import default_params
    p4 = default_params("step04_pressure")
    p4.setdefault("mesh", {})["rim_refine"] = 2.0
    t0 = time.perf_counter()
    spec, params = build_pressure_spec(p4)
    t_spec = time.perf_counter() - t0
    dev = spec_device_arrays(spec, jnp.float64)

    def force(scase, hier):
        # block_until_ready can return early on axon; a scalar readback
        # of the chain's last output is authoritative
        return float(np.asarray(hier.levels[-1].coeff[0, 13, 0, 0, 0]))

    scase, hier = assemble_lattice(spec, jnp.float64,
                                   device_arrays=dev)  # compile
    force(scase, hier)
    t0 = time.perf_counter()
    scase, hier = assemble_lattice(spec, jnp.float64, device_arrays=dev)
    force(scase, hier)
    t_build = t_spec + (time.perf_counter() - t0)

    sweep = params["pressure_sweep"]["sigma_contact_Spm"]
    sigmas = np.logspace(np.log10(sweep[0]), np.log10(sweep[-1]), n_cases)
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (n_cases, 1))
    tables[:, core.BODY_CONTACT_ACTIVE] = sigmas
    tables[:, core.BODY_CONTACT_RETURN] = sigmas
    tables = jnp.asarray(tables, jnp.float64)

    # Memory-aware routing: the per-lane-combined whole-batch program
    # materializes (L, 27, G) f64+f32 stacks with ~3x tile padding —
    # 30.3 G requested at the rim-banded grid (69k slots, measured
    # OOM); past ~1.2 GB raw stack the body-factored fused chunked
    # path (flat Pallas SpMV when in envelope) takes over at the same
    # certified contract (dev/rim_bench_routing.py: 3.30 s vs OOM;
    # the per-lane-combined form stays for small grids where it is
    # fastest — dev/step04_sweep_ab.py, PARITY round 3).
    G = int(np.prod(spec.grid_shape))
    stack_gb = n_cases * 27 * G * 12 / 1e9
    if stack_gb > 1.2:
        from pelvistim_fem_tpu.ops.multigrid import (
            batched_mg_solve_fused_refined_chunked, flat_batched_ok)
        spmv = ("flat" if flat_batched_ok(
            scase.coeff.astype(jnp.float32), 25) else None)
        solve_fn = lambda: batched_mg_solve_fused_refined_chunked(
            scase, hier, tables, lanes_per_chunk=25, tol=tol,
            **({"spmv": spmv} if spmv else {}))
    else:
        solve_fn = lambda: batched_mg_solve_refined(scase, hier, tables,
                                                    tol=tol)

    # Warm-up / compile.
    out = solve_fn()
    float(np.asarray(out.phi[0, 0]))   # force completion (axon quirk)

    # Best-of-3: axon wall times jitter by several percent run-to-run
    # (the r02->r03 "regression" was exactly this noise — identical
    # iteration counts, 0.680 vs 0.698 s); the minimum of repeated warm
    # runs is the standard de-noised estimator for a fixed program.
    t_solve = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = solve_fn()
        float(np.asarray(out.phi[0, 0]))
        t_solve = min(t_solve, time.perf_counter() - t0)

    assert bool(out.converged.all()), "bench solves did not converge"
    baseline = 9 / 40.0  # reference: 9 cases / 20-60 min midpoint
    it = np.asarray(out.iterations)
    max_true_res = float(np.asarray(out.residual).max())

    # End-to-end: solve + FULL per-case metric extraction (the
    # reference's extract_results, run_layered_sweep.py:826-1030) as one
    # vmapped device pass + a single scalar gather.
    from pelvistim_fem_tpu.ops.metrics import extract_results_batched
    labels = [f"s{i:03d}" for i in range(n_cases)]
    # The metric extractor works on the element mesh (flux integrals,
    # ROI reductions over tets) — build that Case on host once and give
    # it device residency (re-shipping per call would dominate).
    t0 = time.perf_counter()
    case, _ = build_pressure_case(p4, dtype=jnp.float32,
                                  to_device=False)
    t_case = time.perf_counter() - t0
    case = jax.device_put(case)
    # extraction runs in f32 (the refined phi is f64-certified to 1e-8;
    # its f32 cast is exact to ~1e-7, far below the metric tolerances)
    phi32 = out.phi.astype(jnp.float32)
    tables32 = tables.astype(jnp.float32)
    rows = extract_results_batched(case, phi32, params,
                                   sigma_tables=tables32,
                                   pressure_labels=labels,
                                   sigma_contacts=list(map(float, sigmas)))
    t0 = time.perf_counter()
    rows = extract_results_batched(case, phi32, params,
                                   sigma_tables=tables32,
                                   pressure_labels=labels,
                                   sigma_contacts=list(map(float, sigmas)))
    t_extract = time.perf_counter() - t0
    # Gate at the reference's own KCL contract (smoke_test.py:31:
    # flux_err < 5%).  With the f64-certified solve both flux metrics are
    # discretization-limited, not solver-limited.
    max_flux_err = max(r["flux_err"] for r in rows)
    max_flux_err_c = max(r["flux_err_consistent"] for r in rows)
    assert max_flux_err < 0.05, f"flux_err {max_flux_err}"
    e2e_per_min = n_cases * 60.0 / (t_solve + t_extract)

    # Secondary metric: the BASELINE.json north-star single case — a
    # ~1.8M-tet layered ankle model.  Round-2 path: host builds only the
    # compact lattice spec (~10 MB, ~0.2 s); ONE jitted device call then
    # re-assembles the per-body stencil coefficients from the cell
    # geometry, Galerkin-coarsens the MG hierarchy, and runs the MG-CG
    # solve (ops/lattice_assembly.py).  The warm call time IS the
    # per-case assemble+solve cost of a geometry-varying sweep (the
    # reference re-meshes + re-assembles + re-solves per case,
    # run_layered_sweep.py:1061-1124); the one-time jit compile is
    # excluded, as for every other timing here (axon remote-compile
    # latency is documented-erratic: 1.5 s to >9 min for the same
    # program).
    from pelvistim_fem_tpu.models.ankle import build_layered_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import (
        solve_lattice_mg_refined, spec_device_arrays)
    from pelvistim_fem_tpu.utils.config import default_params
    p3 = default_params("step03_ankle_layers")
    p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
                  "lc_skin_min": 0.4}
    # Host spec build: best-of-3 like the device legs — it is pure
    # numpy and sensitive to host load (measured 0.09-0.22 s for the
    # identical build under a concurrent process).
    t_spec_m = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        spec_m, _ = build_layered_spec(p3)
        t_spec_m = min(t_spec_m, time.perf_counter() - t0)
    # Certified megatet: f64 master + f32 MG-CG inner sweeps with the
    # lane-packed flat SpMV kernel (auto-selected) — the reported
    # residual is the TRUE f64 one at the reference tolerance 1e-8.
    dev_m = spec_device_arrays(spec_m, jnp.float64)
    r = solve_lattice_mg_refined(spec_m, tol=tol, device_arrays=dev_m)
    float(np.asarray(r.phi[0]))        # warm/compile
    t_asm_solve_m = np.inf             # best-of-3, as for the sweep
    for _ in range(3):
        t0 = time.perf_counter()
        r = solve_lattice_mg_refined(spec_m, tol=tol, device_arrays=dev_m)
        float(np.asarray(r.phi[0]))
        t_asm_solve_m = min(t_asm_solve_m, time.perf_counter() - t0)
    assert bool(np.asarray(r.converged)), "megatet solve did not converge"
    n_tets_m = int(np.sum(spec_m.body6 > 0))
    grid_m = spec_m.grid_shape

    # Round-over-round regression guard (VERDICT r03 item 7): compare
    # against the best prior driver-recorded BENCH_r*.json and FLAG any
    # >5% loss on the two headline numbers.  Flag, not fail: the driver
    # must still record the JSON line, and axon hardware variance is
    # real — but the flag makes a regression impossible to miss.
    regressions = []
    notes = []
    solves_per_min = n_cases * 60.0 / t_solve
    t_mega_total = t_spec_m + t_asm_solve_m
    # Sweep guard compares only against prior runs on the SAME mesh
    # (n_nodes within 2%): round 5 intentionally grew the sweep mesh
    # 2.1x (rim flux bands, max_flux_err 1.87% -> 0.56%), and raw
    # solves/min across different meshes measures the mesh trade, not
    # a code regression.  A mesh change is surfaced as a NOTE with the
    # last comparable numbers, so the trade stays visible without a
    # false regression flag (and a real same-mesh slowdown still
    # trips).
    prior_sweep, prior_mega = 0.0, np.inf
    prior_other_mesh = None
    for f in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            with open(f) as fh:
                p = json.load(fh)
            p = p.get("parsed", p)
            if float(p.get("tol", 0.0)) != tol:
                # rounds before the certified-1e-8 contract (r01 ran
                # uncertified f32 at 1e-6) are not comparable
                continue
            nn = float(p.get("n_nodes", 0))
            if abs(nn - case.n_nodes) <= 0.02 * case.n_nodes:
                prior_sweep = max(prior_sweep, float(p.get("value", 0.0)))
            else:
                prior_other_mesh = (float(p.get("value", 0.0)), int(nn),
                                    p.get("max_flux_err"))
            prior_mega = min(prior_mega,
                             float(p.get("megatet_case_s", np.inf)))
        except (ValueError, OSError):
            continue
    if prior_sweep and solves_per_min < 0.95 * prior_sweep:
        regressions.append(
            f"sweep {solves_per_min:.0f} < 95% of prior best "
            f"{prior_sweep:.0f} solves/min (same mesh)")
    if not prior_sweep and prior_other_mesh is not None:
        notes.append(
            f"sweep mesh changed ({prior_other_mesh[1]} -> "
            f"{case.n_nodes} nodes; prior {prior_other_mesh[0]:.0f} "
            f"solves/min at flux_err {prior_other_mesh[2]}): "
            "numbers not directly comparable")
    if np.isfinite(prior_mega) and t_mega_total > 1.05 * prior_mega:
        regressions.append(
            f"megatet {t_mega_total:.3f}s > 105% of prior best "
            f"{prior_mega:.3f}s")
    for msg in regressions:
        print(f"REGRESSION: {msg}", file=sys.stderr)

    print(json.dumps({
        "metric": "sweep_solves_per_min",
        "value": round(solves_per_min, 2),
        "unit": "solves/min",
        "vs_baseline": round(solves_per_min / baseline, 1),
        "n_cases": n_cases,
        "n_tets": int(case.n_tets),
        "n_nodes": int(case.n_nodes),
        "tol": tol,
        "max_true_residual": float(f"{max_true_res:.3g}"),
        "max_iters": int(it.max()),
        "mean_iters": round(float(it.mean()), 1),
        "build_s": round(t_build, 2),
        "metrics_case_build_s": round(t_case, 2),
        "sweep_wall_s": round(t_solve, 3),
        "extract_wall_s": round(t_extract, 3),
        "e2e_solves_per_min": round(e2e_per_min, 2),
        "max_flux_err": float(f"{max_flux_err:.3g}"),
        "max_flux_err_consistent": float(f"{max_flux_err_c:.3g}"),
        "megatet_case_tets": n_tets_m,
        "megatet_grid": list(grid_m),
        # host one-time prep (lattice spec build, numpy) + the warm
        # device call that re-assembles + re-coarsens + solves: their
        # sum is the per-case cost at megatet scale
        "megatet_host_spec_s": round(t_spec_m, 3),
        "megatet_assemble_solve_s": round(t_asm_solve_m, 3),
        "megatet_case_s": round(t_spec_m + t_asm_solve_m, 3),
        "megatet_iters": int(np.asarray(r.iterations)),
        "megatet_true_residual": float(f"{float(np.asarray(r.residual)):.3g}"),
        "regressions": regressions,
        "prior_best_sweep_same_mesh": round(prior_sweep, 2),
        "notes": notes,
        "prior_best_megatet_s": (None if not np.isfinite(prior_mega)
                                 else round(prior_mega, 3)),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

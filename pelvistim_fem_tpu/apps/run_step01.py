#!/usr/bin/env python3
"""step01 — analytic box baseline: run + validate + (optional) figures.

TPU-native replacement for the reference pipeline
  gmsh -3 box.geo; ElmerGrid 14 2 mesh.msh; setup_case.py; ElmerSolver
(step01_box/test_step01_baseline.py:42-55) and its tolerance gates
(:22-25).  Exit code 0 iff all gates pass.

Usage:  python apps/run_step01.py [--outdir results_step01] [--plot]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

# Gates — identical to reference test_step01_baseline.py:22-25.
TOL_REL_ERR = 1e-3
TOL_CV = 1e-2
TOL_R2 = 0.9999
TOL_FLUX = 1e-2
SIGMA, LZ, DV = 0.2, 0.02, 1.0
J_ANALYTIC = SIGMA * DV / LZ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="results_step01")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    from pelvistim_fem_tpu.models.box import build_box_case
    from pelvistim_fem_tpu.ops import fields
    from pelvistim_fem_tpu.runner import preferred_dtype, solve_auto
    from pelvistim_fem_tpu.utils.timing import PhaseTimer

    timer = PhaseTimer(verbose=False)
    with timer.phase("mesh+assemble"):
        case, params, mesh = build_box_case(dtype=preferred_dtype(),
                                            with_mesh=True)
    print(f"  mesh: {case.n_nodes} nodes, {case.n_tets} tets")
    res = solve_auto(case, mesh, tol=1e-10, timer=timer)
    phi = np.asarray(res.phi, np.float64)

    J = np.asarray(fields.cell_J(case, res.phi), np.float64)
    Jmag = np.linalg.norm(J, axis=1)
    rel_err = abs(Jmag.mean() - J_ANALYTIC) / J_ANALYTIC
    cv = Jmag.std() / Jmag.mean()

    pts = mesh.nodes
    col = (np.abs(pts[:, 0] - 0.02) < 1e-9) & (np.abs(pts[:, 1] - 0.02)
                                               < 1e-9)
    z, v = pts[col, 2], phi[col]
    A = np.vstack([z, np.ones_like(z)]).T
    coef, *_ = np.linalg.lstsq(A, v, rcond=None)
    v_fit = A @ coef
    r2 = 1 - ((v - v_fit) ** 2).sum() / ((v - v.mean()) ** 2).sum()

    flux = np.asarray(fields.boundary_face_flux(case, res.phi))
    bcid = mesh.face_bcid
    I_top, I_bot = flux[bcid == 1].sum(), flux[bcid == 2].sum()
    flux_mismatch = abs(abs(I_top) - abs(I_bot)) / max(abs(I_top),
                                                       abs(I_bot))
    exact = pts[:, 2] / LZ
    rel_l2 = np.linalg.norm(phi - exact) / np.linalg.norm(exact)

    gates = [
        ("rel_err(mean|J|) < 1e-3", rel_err, rel_err < TOL_REL_ERR),
        ("CV(|J|) < 1e-2", cv, cv < TOL_CV),
        ("R2(V(z)) > 0.9999", r2, r2 > TOL_R2),
        ("flux mismatch < 1e-2", flux_mismatch, flux_mismatch < TOL_FLUX),
        ("rel-L2 vs analytic <= 1e-6", rel_l2, rel_l2 <= 1e-6),
    ]
    print(f"\n  |J| mean = {Jmag.mean():.6f} A/m2 (analytic "
          f"{J_ANALYTIC})")
    ok = True
    for name, val, passed in gates:
        print(f"  [{'PASS' if passed else 'FAIL'}] {name:<32} "
              f"(got {val:.3e})")
        ok &= passed

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "metrics.json").write_text(json.dumps({
        "mean_J": Jmag.mean(), "rel_err": rel_err, "cv": cv, "r2": r2,
        "flux_mismatch": flux_mismatch, "rel_l2_vs_analytic": rel_l2,
        "phases_s": timer.report(), "passed": bool(ok),
    }, indent=2))
    print(f"\n  metrics -> {out / 'metrics.json'}")

    if args.plot:
        from pelvistim_fem_tpu.viz.plots import plot_step01_summary
        plot_step01_summary(case, mesh, res.phi, out)

    print("\n  RESULT:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

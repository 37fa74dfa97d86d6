#!/usr/bin/env python3
"""step03 end-to-end smoke test with colored PASS/FAIL checks.

Parity with the reference smoke tester (step03_ankle_layers/
smoke_test.py:38-207): runs one coarse case through the full pipeline
then asserts ~10 structural + physical invariants; exit code 0 iff all
pass.

Usage:  python apps/smoke_test.py
"""

import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

FLUX_TOL = 0.05  # ref smoke_test.py:31

GREEN, RED, RESET = "\033[92m", "\033[91m", "\033[0m"
_failures = []


def check(name, ok, detail=""):
    tag = (f"{GREEN}PASS{RESET}" if ok else f"{RED}FAIL{RESET}")
    print(f"  [{tag}] {name}" + (f"  ({detail})" if detail else ""))
    if not ok:
        _failures.append(name)
    return ok


def main():
    from pelvistim_fem_tpu.models.ankle import build_layered_case
    from pelvistim_fem_tpu.ops import fields, metrics
    from pelvistim_fem_tpu.runner import preferred_dtype, solve_auto
    from pelvistim_fem_tpu.utils.config import get_stim

    print("=== SMOKE TEST: one coarse layered-ankle case ===\n")
    case, params, mesh = build_layered_case(coarse=True,
                                            dtype=preferred_dtype(),
                                            with_mesh=True)
    print(f"  mesh: {case.n_nodes} nodes, {case.n_tets} tets")
    res = solve_auto(case, mesh, tol=1e-8)
    phi = np.asarray(res.phi, np.float64)
    mode = get_stim(params).get("control_mode", "voltage")

    check("solution produced", phi.size == case.n_nodes)
    check("phi finite", bool(np.isfinite(phi).all()))
    if mode == "voltage":
        check("phi in [-0.01, 1.01] (voltage mode)",
              -0.01 <= phi.min() and phi.max() <= 1.01,
              f"range [{phi.min():.3f}, {phi.max():.3f}]")
    else:
        check("max(phi) > 0 (current mode)", phi.max() > 0,
              f"max {phi.max():.3f} V")

    J = np.asarray(fields.cell_J(case, res.phi))
    check("J finite", bool(np.isfinite(J).all()))
    E = np.asarray(fields.cell_E(case, res.phi))
    check("E computable & finite", bool(np.isfinite(E).all()))

    out = metrics.extract_results(case, res.phi, params, verbose=False)
    check(f"flux_err < {FLUX_TOL:.0%}", out["flux_err"] < FLUX_TOL,
          f"{out['flux_err']:.4f}")
    # f32 case arrays (TPU) cap reaction-flux consistency near 1e-3
    # through conditioning; f64 reaches solver tolerance.
    cons_gate = 1e-6 if case.nodes.dtype == np.float64 else 1e-3
    check(f"flux_err_consistent < {cons_gate:g}",
          out["flux_err_consistent"] < cons_gate,
          f"{out['flux_err_consistent']:.2e}")
    check("I_active > 0", out["total_current_A"] > 0,
          f"{out['total_current_A']:.4e} A")
    check("ROI mean |J| > 1e-6", out["roi_mean_J"] > 1e-6,
          f"{out['roi_mean_J']:.4e} A/m2")
    if mode == "current":
        check("compliance_V finite & positive",
              np.isfinite(out["compliance_V"])
              and out["compliance_V"] > 0,
              f"{out['compliance_V']:.2f} V")

    print()
    if _failures:
        print(f"{RED}SMOKE TEST FAILED{RESET}: "
              + ", ".join(_failures))
        sys.exit(1)
    print(f"{GREEN}SMOKE TEST PASSED{RESET}")
    sys.exit(0)


if __name__ == "__main__":
    main()

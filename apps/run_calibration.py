"""Conductivity calibration demo — the inverse problem on the step04 case.

Synthesizes a "measurement session" on the pressure-sore model
(reference step04, run_pressure_sweep.py): solves the ground-truth
forward problem, samples surface potentials (optionally noisy), starts
the tissue conductivities off by the literature uncertainty (2-3x,
which is why the reference sweeps them, params.yaml sigma block), and
recovers them with the adjoint-gradient optimizer (ops/calibrate.py).

The reference has no analogue: its solver is an ElmerSolver subprocess,
so sensitivity = re-solve per parameter per probe.  Here the default
Levenberg-Marquardt fit costs ~3 MG-CG solves per iteration (primal +
vmapped Jacobian tangents + damped trial) independent of how many
conductivities are fit, and recovers the full tissue set in ~10
iterations; --adam selects the first-order adjoint loop (1 forward +
1 adjoint solve per step) for large parameter counts.

Usage: python apps/run_calibration.py [--full] [--noise REL] [--plot]
                                      [--adam] [--outdir DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full step04 resolution (~172k tets)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="relative measurement noise (e.g. 0.01)")
    ap.add_argument("--adam", action="store_true",
                    help="first-order adjoint loop instead of LM")
    ap.add_argument("--steps", type=int, default=0,
                    help="iterations (default: 15 LM / 200 Adam)")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--outdir", default="results_calibration")
    args = ap.parse_args()
    steps = args.steps or (200 if args.adam else 15)

    jax.config.update("jax_enable_x64", True)
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.adjoint import solve_stencil_mg_diff
    from pelvistim_fem_tpu.ops.calibrate import (calibrate_sigma,
                                                 calibrate_sigma_lm)
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice

    spec, params = build_pressure_spec(coarse=not args.full)
    scase, hier = assemble_lattice(spec, jnp.float64)
    truth = jnp.asarray(spec.sigma_table, jnp.float64)
    names = {1: "muscle", 2: "fat", 3: "skin"}
    bodies = tuple(names)

    # ground-truth forward solve -> sample the top (skin) surface,
    # where real surface electrodes would measure
    phi = solve_stencil_mg_diff(scase, hier, truth, tol=1e-10)
    obs_idx = np.arange(0, int(phi.shape[0]), 3)
    obs = np.asarray(phi)[obs_idx]
    rng = np.random.default_rng(0)
    if args.noise:
        obs = obs * (1 + args.noise * rng.standard_normal(obs.shape))
    obs_idx = jnp.asarray(obs_idx, jnp.int32)
    obs = jnp.asarray(obs, jnp.float64)

    # literature-uncertainty start: muscle 2.5x, fat 0.4x, skin 3x off
    off = np.array([2.5, 0.4, 3.0])
    sigma0 = jnp.asarray(np.asarray(truth)[list(bodies)] * off)

    t0 = time.perf_counter()
    if args.adam:
        fit, losses = calibrate_sigma(scase, hier, obs_idx, obs,
                                      bodies, sigma0, steps=steps,
                                      lr=0.1, tol=1e-9)
        per = "1 forward + 1 adjoint MG-CG solve"
    else:
        fit, losses = calibrate_sigma_lm(scase, hier, obs_idx, obs,
                                         bodies, sigma0, iters=steps,
                                         tol=1e-9)
        per = "primal + vmapped-Jacobian + trial MG-CG solves"
    float(np.asarray(losses)[-1])
    wall = time.perf_counter() - t0

    fit = np.asarray(fit)
    tr = np.asarray(truth)
    rows = {}
    kind = "Adam" if args.adam else "LM"
    print(f"\n  {steps} {kind} steps in {wall:.1f} s "
          f"({1e3 * wall / steps:.0f} ms/step = {per})")
    print(f"  final loss {float(np.asarray(losses)[-1]):.3e}\n")
    print(f"  {'tissue':<8} {'true':>10} {'start':>10} "
          f"{'recovered':>10} {'err':>8}")
    ok = True
    for k, (b, nm) in enumerate(names.items()):
        err = abs(fit[b] / tr[b] - 1)
        tol_rec = (1e-4 if not args.adam else 0.05) if not args.noise \
            else 10 * args.noise
        ok &= err < tol_rec
        rows[nm] = {"true_Spm": float(tr[b]),
                    "start_Spm": float(tr[b] * off[k]),
                    "recovered_Spm": float(fit[b]),
                    "rel_err": float(err)}
        print(f"  {nm:<8} {tr[b]:>10.4g} {tr[b]*off[k]:>10.4g} "
              f"{fit[b]:>10.4g} {100*err:>7.2f}%")

    os.makedirs(args.outdir, exist_ok=True)
    out = {"method": kind, "steps": steps, "wall_s": round(wall, 2),
           "noise_rel": args.noise, "n_obs": int(obs.shape[0]),
           "final_loss": float(np.asarray(losses)[-1]),
           "recovered": rows, "ok": bool(ok)}
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n  summary -> {args.outdir}/summary.json")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.semilogy(np.asarray(losses))
        ax.set_xlabel(f"{kind} step")
        ax.set_ylabel("normalized measurement MSE")
        ax.set_title("conductivity calibration convergence")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        p = os.path.join(args.outdir, "calibration_loss.png")
        fig.savefig(p, dpi=130)
        print(f"  figure -> {p}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

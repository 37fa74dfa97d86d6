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
    ap.add_argument("--fibers", action="store_true",
                    help="fit muscle FIBER ANISOTROPY (sigma_long, "
                         "sigma_trans) instead of scalar tissues — "
                         "gradients through the tensor device assembly "
                         "(ops/adjoint.solve_lattice_mg_diff)")
    ap.add_argument("--steps", type=int, default=0,
                    help="iterations (default: 15 LM / 200 Adam)")
    ap.add_argument("--spectrum", action="store_true",
                    help="bioimpedance-spectroscopy inverse problem: "
                         "fit the contact layer's Cole-Cole "
                         "(sigma_s, d_eps, tau) to a synthesized "
                         "measured Z(f) through the differentiable "
                         "complex solve")
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

    if args.fibers:
        _fit_fibers(args, spec, hier)
        return
    if args.spectrum:
        _fit_spectrum(args, spec, scase, hier, params)
        return

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


def _fit_fibers(args, spec, hier):
    """Recover muscle FIBER ANISOTROPY (sigma_long, sigma_trans) from
    synthetic surface potentials by damped Gauss-Newton, with gradients
    flowing THROUGH the tensor device assembly (the n_a^T Sigma n_b
    integrand in ops/lattice_assembly.lattice_coeff) via
    ops/adjoint.solve_lattice_mg_diff.  The reference's isotropic
    ElmerSolver pipeline cannot express this fit at all — anisotropy
    never enters its sigma block (step04 run_pressure_sweep.py
    params.yaml sigma entries are scalars)."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.ops.adjoint import solve_lattice_mg_diff
    from pelvistim_fem_tpu.ops.aniso import tensor_table
    from pelvistim_fem_tpu.ops.lattice_assembly import spec_device_arrays

    iters = args.steps or 12
    dev = spec_device_arrays(spec, jnp.float64)
    nb = spec.n_bodies
    base = jnp.asarray(tensor_table(spec.sigma_table))
    b = core.BODY_MUSCLE
    axis = jnp.asarray((0.0, 1.0, 0.0), jnp.float64)   # fibers along y

    def table_for(p):
        s_long, s_trans = jnp.exp(p[0]), jnp.exp(p[1])
        d = axis / jnp.linalg.norm(axis)
        Sig = (s_trans * jnp.eye(3, dtype=jnp.float64)
               + (s_long - s_trans) * jnp.outer(d, d))
        return base.at[b].set(Sig)

    # literature muscle anisotropy (longitudinal/transverse, S/m)
    truth = np.array([0.4, 0.09])
    phi_t = solve_lattice_mg_diff(
        dev, hier, table_for(jnp.log(jnp.asarray(truth))),
        n_bodies=nb, tol=1e-11)
    obs_idx = np.arange(0, int(phi_t.shape[0]), 3)
    obs = np.asarray(phi_t)[obs_idx]
    if args.noise:
        rng = np.random.default_rng(0)
        obs = obs * (1 + args.noise * rng.standard_normal(obs.shape))
    obs_idx = jnp.asarray(obs_idx, jnp.int32)
    obs = jnp.asarray(obs, jnp.float64)
    scale = jnp.sqrt(jnp.sum(obs * obs))

    def resid(p):
        phi = solve_lattice_mg_diff(dev, hier, table_for(p),
                                    n_bodies=nb, tol=1e-11)
        return (phi[obs_idx] - obs) / scale

    start = np.array([0.25, 0.15])         # near-isotropic guess
    p = jnp.log(jnp.asarray(start))
    lam = 1e-3
    losses = [float(jnp.sum(resid(p) ** 2))]
    t0 = time.perf_counter()
    for _ in range(iters):
        r, jvp = jax.linearize(resid, p)
        Jm = jax.vmap(jvp)(jnp.eye(2, dtype=p.dtype))        # (2, M)
        A = np.asarray(jnp.einsum("pm,qm->pq", Jm, Jm))
        g = np.asarray(jnp.einsum("pm,m->p", Jm, r))
        dp = np.linalg.solve(A + lam * np.diag(np.diag(A)), -g)
        p_try = p + jnp.asarray(dp)
        l_try = float(jnp.sum(resid(p_try) ** 2))
        if l_try < losses[-1]:
            p, lam = p_try, lam / 3
            losses.append(l_try)
        else:
            lam *= 4
            losses.append(losses[-1])
        if losses[-1] < 1e-18:
            break
    wall = time.perf_counter() - t0

    fit = np.exp(np.asarray(p))
    tol_rec = 1e-2 if not args.noise else 10 * args.noise
    names = ("sigma_long", "sigma_trans")
    print(f"\n  {len(losses)-1} Gauss-Newton steps in {wall:.1f} s "
          f"(primal + 2 tangent + trial MG-CG solves/step)")
    print(f"  final loss {losses[-1]:.3e}\n")
    print(f"  {'param':<12} {'true':>10} {'start':>10} "
          f"{'recovered':>10} {'err':>8}")
    ok = True
    rows = {}
    for k, nm in enumerate(names):
        err = abs(fit[k] / truth[k] - 1)
        ok &= err < tol_rec
        rows[nm] = {"true_Spm": float(truth[k]),
                    "start_Spm": float(start[k]),
                    "recovered_Spm": float(fit[k]),
                    "rel_err": float(err)}
        print(f"  {nm:<12} {truth[k]:>10.4g} {start[k]:>10.4g} "
              f"{fit[k]:>10.4g} {100*err:>7.2f}%")

    os.makedirs(args.outdir, exist_ok=True)
    out = {"method": "GN-fibers", "steps": len(losses) - 1,
           "wall_s": round(wall, 2), "noise_rel": args.noise,
           "n_obs": int(obs.shape[0]), "final_loss": losses[-1],
           "fiber_axis": [0, 1, 0], "recovered": rows, "ok": bool(ok)}
    with open(os.path.join(args.outdir, "summary_fibers.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n  summary -> {args.outdir}/summary_fibers.json")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.semilogy(np.asarray(losses))
        ax.set_xlabel("Gauss-Newton step")
        ax.set_ylabel("normalized measurement MSE")
        ax.set_title("fiber anisotropy calibration convergence")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        pth = os.path.join(args.outdir, "calibration_fibers_loss.png")
        fig.savefig(pth, dpi=130)
        print(f"  figure -> {pth}")

    sys.exit(0 if ok else 1)




def _fit_spectrum(args, spec, scase, hier, params):
    """Spectroscopy mode: synthesize a 'measured' Z(f) with known
    contact Cole-Cole parameters, start 3x off, recover by LM through
    the differentiable complex solves (ops/calibrate.
    calibrate_contact_dispersion)."""
    import time

    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    from pelvistim_fem_tpu.ops.calibrate import \
        calibrate_contact_dispersion
    from pelvistim_fem_tpu.ops.eqs import (batched_eqs_solve_refined,
                                           dispersive_tables)

    case, _ = build_pressure_case(coarse=not args.full,
                                  to_device=False)
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w_a, w_r = act / act.sum(), ret / ret.sum()
    bodies = (core.BODY_CONTACT_ACTIVE, core.BODY_CONTACT_RETURN)

    truth = (5.0e-3, 4.0e6, 2.0e-4)      # sigma_s [S/m], d_eps, tau [s]
    freqs = np.logspace(1, 4, 4)
    t = dispersive_tables(freqs, np.asarray(spec.sigma_table),
                          {b: (truth[0], 1.0e3,
                               [(truth[1], truth[2], 0.0)])
                           for b in bodies})
    out = batched_eqs_solve_refined(scase, hier, t.ki, t.kr, tol=1e-10)
    assert bool(np.asarray(out.converged).all())
    phi = np.asarray(out.phi)
    Z_meas = (phi @ w_a - phi @ w_r) / float(np.asarray(
        jnp.sum(scase.b_neumann)))
    rng = np.random.default_rng(0)
    if args.noise:
        Z_meas = Z_meas * (1 + args.noise * rng.standard_normal(
            Z_meas.shape))

    x0 = (truth[0] * 3, truth[1] / 3, truth[2] * 3)
    print(f"  truth   sigma_s={truth[0]:.3e}  d_eps={truth[1]:.3e}  "
          f"tau={truth[2]:.3e}")
    print(f"  start   sigma_s={x0[0]:.3e}  d_eps={x0[1]:.3e}  "
          f"tau={x0[2]:.3e}  (3x off everywhere)")
    t0 = time.time()
    fit, losses = calibrate_contact_dispersion(
        scase, hier, freqs, jnp.asarray(Z_meas), w_a, w_r, bodies, x0,
        iters=12)
    fit = np.asarray(fit)
    losses = np.asarray(losses)
    wall = time.time() - t0
    err = np.abs(fit / np.asarray(truth) - 1)
    print(f"  fit     sigma_s={fit[0]:.3e}  d_eps={fit[1]:.3e}  "
          f"tau={fit[2]:.3e}")
    print(f"  rel err {err[0]:.2e} / {err[1]:.2e} / {err[2]:.2e}; "
          f"loss {losses[-1]:.2e}; {wall:.1f} s "
          f"({len(losses)} LM iterations)")
    ok = bool((err < (0.05 if args.noise else 1e-2)).all())
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "spectrum_fit.json"), "w") as f:
        json.dump({"truth": list(truth), "start": list(x0),
                   "fit": fit.tolist(), "rel_err": err.tolist(),
                   "loss": losses.tolist(), "noise": args.noise,
                   "freqs_hz": freqs.tolist(), "ok": ok}, f, indent=1)
    print(f"  summary -> {args.outdir}/spectrum_fit.json")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

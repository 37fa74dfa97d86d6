#!/usr/bin/env python3
"""step04 — pressure-dependent contact-impedance sweep.

The reference builds its mesh once and re-runs ElmerSolver 15 times with
one material edited (run_pressure_sweep.py:664-740).  Here the host
builds one compact lattice spec, a single jitted device call assembles
the stencil coefficients + MG hierarchy, and the whole sweep is ONE
vmapped multigrid batch at the reference's own tolerance (params.yaml
solver tol 1e-8) with f64-CERTIFIED residuals — this sweep spans the
7000x contact contrast where plain f32 recursive residuals are provably
untrustworthy (PARITY.md).  Output contract (summary.csv/json with the
step04 column set, sanity prints) matches the reference.

Usage:  python apps/run_step04.py [--smoke] [--outdir results_step04]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)


def main():
    ap = argparse.ArgumentParser(description="Pressure sweep")
    ap.add_argument("--smoke", action="store_true",
                    help="coarse mesh for a quick pipeline check")
    ap.add_argument("--outdir", default="results_step04")
    ap.add_argument("--params", default=None)
    ap.add_argument("--plot", action="store_true",
                    help="write the 4-panel pressure figure")
    ap.add_argument("--thermal", action="store_true",
                    help="Pennes bioheat per case: Joule heating -> "
                         "skin temperature rise (duty-cycle scaled)")
    ap.add_argument("--nonlinear", action="store_true",
                    help="dynamic skin conductance: re-solve each case "
                         "with sigma_skin(|E|) (ops/nonlinear.py) and "
                         "report the compliance shift vs linear")
    ap.add_argument("--nl-amp", type=float, default=4.0,
                    help="saturating relative skin-conductance rise")
    ap.add_argument("--nl-e0", type=float, default=2000.0,
                    help="field threshold [V/m] of the skin law")
    ap.add_argument("--nl-w", type=float, default=500.0,
                    help="transition width [V/m] of the skin law")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                                   build_pressure_spec,
                                                   sigma_tables_for_sweep)
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.metrics import extract_results_batched
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined
    from pelvistim_fem_tpu.utils.config import default_params, load_params
    from pelvistim_fem_tpu.utils.report import print_sanity_table
    from pelvistim_fem_tpu.utils.summary import save_results

    p = (load_params(args.params) if args.params
         else default_params("step04_pressure"))
    sweep = p["pressure_sweep"]["sigma_contact_Spm"]
    labels = p["pressure_sweep"]["labels"]
    print(f"=== PRESSURE SWEEP: {len(sweep)} sigma_contact levels "
          f"({sweep[0]:g} .. {sweep[-1]:g} S/m) ===")

    # Host builds only the compact spec; one jitted device call
    # assembles coefficients + MG hierarchy (f64 master operator for
    # the certified refinement).  The element-path Case is built only
    # for the metric extractor (flux integrals / ROI are tet-based).
    t0 = time.perf_counter()
    spec, _ = build_pressure_spec(p, coarse=args.smoke)
    scase, hier = assemble_lattice(spec, jnp.float64)
    tables = sigma_tables_for_sweep(scase, p)
    case_host, _ = build_pressure_case(p, coarse=args.smoke,
                                       dtype=jnp.float32,
                                       to_device=False)
    case = jax.device_put(case_host)
    t_build = time.perf_counter() - t0
    print(f"  spec+assemble (ONCE, reused for all {len(sweep)} cases): "
          f"{case.n_nodes} nodes, {case.n_tets} tets, {t_build:.1f} s")

    t0 = time.perf_counter()
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    float(np.asarray(out.phi[0, 0]))   # force completion (axon quirk)
    t_solve = time.perf_counter() - t0
    conv = np.asarray(out.converged)
    print(f"  batched MG solve: {len(sweep)} cases in {t_solve:.2f} s = "
          f"{len(sweep)*60/t_solve:.1f} solves/min at CERTIFIED tol 1e-8 "
          f"(max true residual {float(np.asarray(out.residual).max()):.2e}, "
          f"iters {np.asarray(out.iterations).tolist()})")
    if not conv.all():
        print(f"  WARNING: lanes not converged: {np.where(~conv)[0]}")

    # ALL lanes' metrics in one vmapped device pass + one scalar gather
    # (extract_results_batched; same rows as the serial extractor).
    # Extraction runs in f32: the refined phi is f64-certified to 1e-8,
    # so its f32 cast is exact to ~1e-7, far below metric tolerances.
    t0 = time.perf_counter()
    results = extract_results_batched(case, out.phi.astype(jnp.float32), p,
                                      sigma_tables=tables.astype(jnp.float32),
                                      pressure_labels=list(labels),
                                      sigma_contacts=list(sweep))
    t_extract = time.perf_counter() - t0
    print(f"  batched extract: {len(sweep)} cases in {t_extract:.2f} s "
          f"(end-to-end {len(sweep)*60/(t_solve+t_extract):.1f} "
          f"cases/min)")
    for lab, s, row in zip(labels, sweep, results):
        print(f"[{lab}] sigma_contact = {s:g} S/m  "
              f"compliance_V={row['compliance_V']:.1f} V  "
              f"Z={row['contact_impedance_ohm']:.0f} ohm  "
              f"roi_E={row['roi_mean_E']:.2f} V/m  "
              f"Q={row['charge_density_mC_cm2']:.6f} mC/cm2")

    if args.thermal:
        # Electrical -> thermal chain: per-case Joule heating (duty-
        # cycle averaged) into ONE vmapped Pennes solve — the operator
        # is case-independent (thermal properties don't vary with
        # sigma_contact), only the heat load differs per lane.  The
        # reported safety quantity is what IEC 60601-2-10 actually
        # bounds (skin temperature rise), beyond the reference's
        # charge-density surrogate (run_pressure_sweep.py:617-625).
        from pelvistim_fem_tpu.mesh import core as mcore
        from pelvistim_fem_tpu.ops.bioheat import (
            DEFAULT_K, DEFAULT_PERFUSION, build_bioheat_case,
            skin_temperature_metrics, solve_bioheat, thermal_tables)
        from pelvistim_fem_tpu.ops.fields import cell_power_density
        duty = (p["stim"].get("pulse_width_us", 200.0) * 1e-6
                * p["stim"].get("frequency_Hz", 10.0))
        kt, pt = thermal_tables(
            case.meta.n_bodies,
            {mcore.BODY_MUSCLE: DEFAULT_K["muscle"],
             mcore.BODY_FAT: DEFAULT_K["fat"],
             mcore.BODY_SKIN: DEFAULT_K["skin"],
             mcore.BODY_CONTACT_ACTIVE: DEFAULT_K["contact"],
             mcore.BODY_CONTACT_RETURN: DEFAULT_K["contact"]},
            {mcore.BODY_MUSCLE: DEFAULT_PERFUSION["muscle"],
             mcore.BODY_FAT: DEFAULT_PERFUSION["fat"],
             mcore.BODY_SKIN: DEFAULT_PERFUSION["skin"],
             mcore.BODY_CONTACT_ACTIVE: 0.0,
             mcore.BODY_CONTACT_RETURN: 0.0})
        bh = build_bioheat_case(case_host, kt, pt)   # host arrays, no
        skin_tets = np.asarray(case_host.tets)[      # device readback
            np.asarray(case_host.tet_body) == mcore.BODY_SKIN]
        t0 = time.perf_counter()
        phis32 = out.phi.astype(jnp.float32)
        tabs32 = tables.astype(jnp.float32)
        q = jax.vmap(
            lambda ph, s: cell_power_density(case, ph, s) * duty)(
                phis32, tabs32)
        # f32 thermal solves at 3e-6: delta-T accurate to ~1e-4 degC.
        # Lane 0 = zero heating -> the NO-STIMULATION baseline field
        # (skin sits below core through air convection); the safety
        # number is the rise ABOVE that baseline.
        q = jnp.concatenate([jnp.zeros_like(q[:1]), q], axis=0)
        Ts = jax.vmap(lambda qc: solve_bioheat(case, bh, qc,
                                               tol=3e-6).phi)(q)
        Ts = np.asarray(Ts)
        T_base = Ts[0]
        t_th = time.perf_counter() - t0
        for i, row in enumerate(results):
            m = skin_temperature_metrics(case_host, Ts[i + 1],
                                         skin_body=mcore.BODY_SKIN,
                                         T_ref=T_base,
                                         skin_tets=skin_tets)
            row["dT_skin_max_C"] = m["dT_skin_max"]
            row["dT_max_C"] = m["dT_max"]
        print(f"  thermal (duty {100*duty:.2f}%): {len(results)} "
              f"Pennes solves in {t_th:.2f} s; dT_skin_max "
              f"{results[0]['dT_skin_max_C']:.4f} -> "
              f"{results[-1]['dT_skin_max_C']:.4f} degC "
              f"(guideline ~1 degC)")
        # heating time course for the WORST (dry) case: the bioheat
        # time constant rho_c/(w c) is ~20 min — a session may end
        # before the steady rise is reached
        from pelvistim_fem_tpu.ops.bioheat import \
            solve_bioheat_transient
        dt_s = 60.0
        skin_nodes = np.unique(skin_tets)
        T_base = jnp.asarray(Ts[0])
        _, trace = solve_bioheat_transient(
            case, bh, q[1], T_base, dt_s=dt_s, n_steps=45, tol=1e-7,
            trace_nodes=jnp.asarray(skin_nodes), trace_ref=T_base)
        trace = np.asarray(trace)       # pointwise skin rise per step
        rise = float((Ts[1] - Ts[0])[skin_nodes].max())
        if rise > 1e-9:
            hit = np.nonzero(trace >= 0.95 * rise)[0]
            t95 = (hit[0] + 1) * dt_s / 60.0 if hit.size else np.inf
            print(f"  heating time course (dry case): t95 = "
                  f"{t95:.0f} min to 95% of the steady "
                  f"{rise:.4f} degC skin rise")

    if args.nonlinear:
        # Dynamic skin conductance: skin impedance falls with local
        # field strength (stratum-corneum breakdown at TENS current
        # densities).  The reference is strictly linear (one
        # StatCurrentSolve per case, step01_box/case.sif:30-44), so the
        # compliance voltages it reports at low sigma_contact ignore
        # this relief entirely.  Each contact state re-solves with the
        # rebased logistic law sigma_skin(|E|) (ops/nonlinear.FieldLaw;
        # sigma(0) = sigma_skin exactly, so the nl/linear compliance
        # comparison below is pure field feedback, no law offset) — the
        # element path keeps sigma a leaf input, so all 15 fixed-point
        # loops share ONE jitted program (same shapes/statics).
        from pelvistim_fem_tpu.mesh import core as mcore
        from pelvistim_fem_tpu.ops import nonlinear as nl
        case64, _ = build_pressure_case(p, coarse=args.smoke,
                                        dtype=jnp.float64)
        amp_vec = np.zeros(case64.meta.n_bodies + 1)
        e0_vec = np.ones_like(amp_vec)
        w_vec = np.ones_like(amp_vec)
        amp_vec[mcore.BODY_SKIN] = args.nl_amp
        e0_vec[mcore.BODY_SKIN] = args.nl_e0
        w_vec[mcore.BODY_SKIN] = args.nl_w
        skin_cells = np.asarray(case64.tet_body) == mcore.BODY_SKIN
        # LATTICE fast path (round-4): per-cell sigma enters the
        # device-side stencil assembly and the inner solves are
        # MG-preconditioned (nl.solve_lattice_field_dependent) — the
        # fixed point runs at full resolution in sub-second warm calls
        # where the element path's Jacobi inner solves crawled.
        from pelvistim_fem_tpu.ops.lattice_assembly import \
            spec_device_arrays
        dev64 = spec_device_arrays(spec, jnp.float64)
        skin6 = np.asarray(spec.body6) == mcore.BODY_SKIN
        t0 = time.perf_counter()
        tabs64 = np.asarray(tables, np.float64)
        for i, row in enumerate(results):
            law = nl.FieldLaw(sigma0=jnp.asarray(tabs64[i]),
                              amp=jnp.asarray(amp_vec),
                              e0=jnp.asarray(e0_vec),
                              w=jnp.asarray(w_vec))
            r = nl.solve_lattice_field_dependent(spec, law, tol=1e-8,
                                                 device_arrays=dev64)
            from pelvistim_fem_tpu.ops.metrics import compliance_voltage
            v_nl = compliance_voltage(case64, r.phi)
            s_skin = np.asarray(r.sigma_e)[skin6]
            row["compliance_V_nl"] = v_nl
            row["skin_sigma_rise"] = float(
                s_skin.mean() / tabs64[i][mcore.BODY_SKIN])
            if not bool(r.converged):
                print(f"  WARNING: nonlinear lane {i} unconverged "
                      f"(residual {float(r.residual):.2e}, sigma "
                      f"change {float(r.sigma_change):.2e})")
        t_nl = time.perf_counter() - t0
        print(f"  nonlinear skin (amp {args.nl_amp:g}, e0 "
              f"{args.nl_e0:g} V/m): {len(results)} certified "
              f"fixed-point solves in {t_nl:.1f} s")
        print(f"  compliance_V nl/linear: "
              f"{results[0]['compliance_V_nl']:.1f}/"
              f"{results[0]['compliance_V']:.1f} -> "
              f"{results[-1]['compliance_V_nl']:.1f}/"
              f"{results[-1]['compliance_V']:.1f} V; skin sigma rise "
              f"x{results[0]['skin_sigma_rise']:.2f} -> "
              f"x{results[-1]['skin_sigma_rise']:.2f}")

    out_root = Path(args.outdir)
    save_results(results, out_root)
    print_sanity_table(results, p)
    if args.plot:
        from pelvistim_fem_tpu.viz.plots import plot_pressure_results
        plot_pressure_results(results, p, out_root)

    # End-of-run trend summary (ref run_pressure_sweep.py:762-779).
    print(f"  compliance_V : {results[0]['compliance_V']:.1f} -> "
          f"{results[-1]['compliance_V']:.1f} V")
    print(f"  impedance    : {results[0]['contact_impedance_ohm']:.0f} -> "
          f"{results[-1]['contact_impedance_ohm']:.0f} ohm")
    print(f"  roi_mean_E   : {results[0]['roi_mean_E']:.2f} -> "
          f"{results[-1]['roi_mean_E']:.2f} V/m")


if __name__ == "__main__":
    main()

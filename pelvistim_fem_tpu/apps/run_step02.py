#!/usr/bin/env python3
"""step02 — bipolar electrode shape x radius sweep (8 cases).

TPU-native replacement for step02_electrodes/run_sweep.py:299-341.  The
geometry varies per case (different graded lattices per radius), so the
default path pads every case's stencil problem onto one grid envelope
and solves the WHOLE sweep as one batched device call
(parallel/geometry_sweep.build_padded_group): one jit compile instead
of eight, with each lane solving exactly its serial operator (inert
padding planes).  --serial keeps the per-case loop.
Extracts top-surface |J| and the peak/mean-J-vs-area summary the
reference plots (:286-295, :346-472).

Usage:  python apps/run_step02.py [--outdir results_step02] [--plot]
                                  [--serial] [--quick]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)


def extract_top_J(case, mesh, phi):
    """(x, y, |J|) at nodes on the top face z > 0.99 Lz
    (ref run_sweep.py:286-295)."""
    from pelvistim_fem_tpu.ops import fields
    Lz = case.meta.z_skin_top
    pts = mesh.nodes
    Jn = np.asarray(fields.nodal_average(
        case, fields.cell_J(case, phi)))
    Jmag = np.linalg.norm(Jn, axis=1)
    m = pts[:, 2] > Lz * 0.99
    return pts[m, 0], pts[m, 1], Jmag[m]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="results_step02")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="2 cases only (circle/square at r=10mm)")
    ap.add_argument("--serial", action="store_true",
                    help="per-case solve loop (default: one padded batch)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.electrodes import build_electrode_case
    from pelvistim_fem_tpu.ops import metrics
    from pelvistim_fem_tpu.runner import preferred_dtype, solve_auto
    from pelvistim_fem_tpu.utils.config import default_params, get_placement
    from pelvistim_fem_tpu.utils.summary import save_results

    p = default_params("step02_electrodes")
    pl = get_placement(p)
    shapes = pl.get("shapes", ["circle", "square"])
    radii = pl.get("radii_m", [0.005, 0.010, 0.015, 0.020])
    if args.quick:
        shapes, radii = ["circle", "square"], [0.010]

    out_root = Path(args.outdir)
    rows, maps = [], {}
    t_start = time.perf_counter()

    labels, built = [], []
    for shape in shapes:
        for r in radii:
            label = f"{shape}_r{int(r*1000)}mm"
            case, _, mesh = build_electrode_case(
                p, shape=shape, r=r, dtype=preferred_dtype(),
                with_mesh=True)
            print(f"  [{label}] {case.n_nodes} nodes, "
                  f"{case.n_tets} tets")
            labels.append((label, shape, r))
            built.append((case, mesh))

    if args.serial:
        phis = []
        for (label, shape, r), (case, mesh) in zip(labels, built):
            print(f"\n[{label}]")
            res = solve_auto(case, mesh, tol=1e-8)
            phis.append(np.asarray(res.phi))
    else:
        # ONE padded batch: all 8 heterogeneous lattices solve in a
        # single compile + device call on exactly their serial
        # operators (inert padding planes).
        import jax

        from pelvistim_fem_tpu.ops.multigrid import (
            batched_group_solve_mg, batched_group_solve_mg_refined)
        from pelvistim_fem_tpu.parallel.geometry_sweep import (
            build_padded_group, build_padded_group_hierarchy)
        f64_ok = jax.config.jax_enable_x64
        dtype = jnp.float64 if f64_ok else jnp.float32
        t0 = time.perf_counter()
        stacked, extract = build_padded_group(built, dtype=dtype)
        # per-lane MG hierarchies on shared index-space transfers:
        # multigrid for the heterogeneous batch (certified residuals
        # come from the refinement, not the transfers); hierarchy probes
        # from the host stacks — no device readback
        bhier = build_padded_group_hierarchy(
            stacked, host_coeff=extract.host_coeff,
            host_free=extract.host_free)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        if f64_ok:
            out = batched_group_solve_mg_refined(stacked, bhier,
                                                 tol=1e-8,
                                                 maxiter=30_000)
        else:
            out = batched_group_solve_mg(stacked, bhier, tol=1e-6,
                                         maxiter=30_000)
        jax.block_until_ready(out.phi)
        t_solve = time.perf_counter() - t0
        print(f"\n  padded batch {tuple(stacked.free.shape)}: "
              f"assemble {t_build:.2f} s, solve {t_solve:.2f} s, "
              f"iters {np.asarray(out.iterations).tolist()}")
        assert bool(np.asarray(out.converged).all())
        phis = extract(out.phi)

    for (label, shape, r), (case, mesh), phi in zip(labels, built, phis):
        x, y, J = extract_top_J(case, mesh, phi)
        maps[label] = (x, y, J)
        cur = metrics.injected_currents(case, phi)
        area = np.pi * r * r if shape == "circle" else (2 * r) ** 2
        rows.append({
            "shape": shape,
            "r_mm": r * 1000,
            "area_cm2": area * 1e4,
            "area_mesh_cm2": case.meta.elec_area_mesh * 1e4,
            "peak_J": float(J.max()),
            "mean_J_top": float(J.mean()),
            "I_total_A": cur["I_active"],
            "I_consistent_A": cur["I_active_consistent"],
            "flux_err": cur["flux_err"],
        })
        print(f"  [{label}] peak_J={J.max():.3f} A/m2  "
              f"I={cur['I_active']:.4e} A  flux_err={cur['flux_err']:.2e}")

    wall = time.perf_counter() - t_start
    save_results(rows, out_root)
    print(f"\n  {len(rows)} cases in {wall:.1f} s")

    if args.plot:
        from pelvistim_fem_tpu.viz.plots import plot_step02_sweep
        plot_step02_sweep(rows, maps, p, out_root)


if __name__ == "__main__":
    main()

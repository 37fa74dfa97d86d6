"""TPU timing for grid-native ZZ estimation at megatet scale.

Run on the real chip when the axon tunnel is up:
    python dev/estimate_tpu_timing.py [--pelvis]

Measures (warm, scalar-readback-forced — CLAUDE.md timing rules):
  1. the 1.75M-tet ankle megatet estimate (grid-native, f32 and f64)
  2. with --pelvis: the 6.8M-tet pelvis spec estimate
and prints the estimator's cost relative to one certified solve — the
number that says whether --estimate is free enough to run per sweep
case or a once-per-study diagnostic.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def bench(spec, tag):
    from pelvistim_fem_tpu.ops.lattice_assembly import (
        solve_lattice_mg_refined, spec_device_arrays)
    from pelvistim_fem_tpu.ops.stencil_estimate import lattice_zz_error

    dev = spec_device_arrays(spec, jnp.float64)
    res = solve_lattice_mg_refined(spec, tol=1e-8, device_arrays=dev)
    float(np.asarray(res.residual))            # force completion
    t0 = time.perf_counter()
    res = solve_lattice_mg_refined(spec, tol=1e-8, device_arrays=dev)
    float(np.asarray(res.residual))
    t_solve = time.perf_counter() - t0
    phi = res.phi

    for dt in (jnp.float32, jnp.float64):
        out = lattice_zz_error(spec, phi, dtype=dt)   # compile
        float(np.asarray(out["eta"]))
        t0 = time.perf_counter()
        out = lattice_zz_error(spec, phi, dtype=dt)
        eta = float(np.asarray(out["eta"]))
        t_est = time.perf_counter() - t0
        print(f"{tag} [{jnp.dtype(dt).name}]: estimate {t_est:.3f} s "
              f"(solve {t_solve:.3f} s -> {t_est / t_solve:.2f}x), "
              f"eta {eta:.4e}, rel {float(np.asarray(out['rel'])):.2%}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pelvis", action="store_true")
    args = ap.parse_args()

    from pelvistim_fem_tpu.models.ankle import build_layered_spec
    from pelvistim_fem_tpu.utils.config import default_params
    p3 = default_params("step03_ankle_layers")
    p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
                  "lc_skin_min": 0.4}          # bench.py's megatet
    spec, _ = build_layered_spec(p3)
    n = int((np.asarray(spec.body6) > 0).sum())
    print(f"ankle megatet spec: {n:,} tets, grid {spec.used.shape}")
    bench(spec, "ankle-megatet")

    if args.pelvis:
        from pelvistim_fem_tpu.models.pelvis import build_pelvis_spec
        spec, _ = build_pelvis_spec(resolution_scale=0.42)
        n = int((np.asarray(spec.body6) > 0).sum())
        print(f"pelvis spec: {n:,} tets, grid {spec.used.shape}")
        bench(spec, "pelvis-6.8M")


if __name__ == "__main__":
    main()

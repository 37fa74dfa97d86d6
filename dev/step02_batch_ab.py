"""step02 padded-batch A/B: Jacobi-refined vs group-MG-refined.

The heterogeneous 8-lattice batch previously solved via
batched_case_solve_refined (vmapped Jacobi-PCG refinement).  The
group-MG path (per-lane hierarchies on shared index-space transfers,
parallel/geometry_sweep.build_padded_group_hierarchy) cuts iterations
~10-30x; this measures whether wall time follows at step02's sizes,
cold (compile included) and warm.

MEASURED (v5e, 2026-08-17, envelope (8, 67, 29, 8), certified 1e-8):
  jacobi-refined   warm 0.045 s  cold 724.7 s  iters 131-351
  group-MG-refined warm 0.058 s  cold  13.3 s  iters 9-26
At step02's tiny grids both are sub-0.1 s warm (Jacobi marginally
faster per call), but the Jacobi program's cold axon remote compile is
erratic up to ~12 MINUTES while the MG program compiles in ~13 s —
and the app pays exactly one cold call.  run_step02 therefore defaults
to the group-MG path (hierarchy build: 8.5 s host-side, probed from
the numpy stacks — never from device arrays, see
build_padded_group_hierarchy's host_coeff note).

Usage: python dev/step02_batch_ab.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from pelvistim_fem_tpu.models.electrodes import build_electrode_case
from pelvistim_fem_tpu.ops.multigrid import batched_group_solve_mg_refined
from pelvistim_fem_tpu.ops.stencil import batched_case_solve_refined
from pelvistim_fem_tpu.parallel.geometry_sweep import (
    build_padded_group, build_padded_group_hierarchy)
from pelvistim_fem_tpu.utils.config import default_params

p = default_params("step02_electrodes")
built = []
for shape in ("circle", "square"):
    for r in (0.005, 0.010, 0.015, 0.020):
        case, _, mesh = build_electrode_case(p, shape=shape, r=r,
                                             dtype=jnp.float64,
                                             with_mesh=True)
        built.append((case, mesh))

t0 = time.perf_counter()
stacked, extract = build_padded_group(built, dtype=jnp.float64)
t_pad = time.perf_counter() - t0
t0 = time.perf_counter()
bhier = build_padded_group_hierarchy(stacked,
                                     host_coeff=extract.host_coeff,
                                     host_free=extract.host_free)
t_hier = time.perf_counter() - t0
print(f"envelope {tuple(stacked.free.shape)}: pad {t_pad:.2f} s, "
      f"hierarchy {t_hier:.2f} s", flush=True)


def run(name, fn):
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi[0, 0]))
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi[0, 0]))
    t = time.perf_counter() - t0
    it = np.asarray(out.iterations)
    print(f"{name}: warm {t:.3f} s (cold {t_cold:.1f}) iters "
          f"{it.tolist()} max res "
          f"{np.asarray(out.residual).max():.2e} conv "
          f"{bool(np.asarray(out.converged).all())}", flush=True)
    return t, out


t_j, out_j = run("jacobi-refined",
                 lambda: batched_case_solve_refined(stacked, tol=1e-8,
                                                    maxiter=30_000))
t_m, out_m = run("group-MG-refined",
                 lambda: batched_group_solve_mg_refined(stacked, bhier,
                                                        tol=1e-8))
for pj, pm in zip(extract(out_j.phi), extract(out_m.phi)):
    np.testing.assert_allclose(pm, pj, rtol=0,
                               atol=1e-5 * float(np.abs(pj).max()))
print(f"solutions match; MG/jacobi warm {t_j/t_m:.2f}x", flush=True)

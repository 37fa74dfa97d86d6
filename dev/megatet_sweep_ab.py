"""Megatet WIDE-sweep A/B on v5e (VERDICT round-3 item 3 acceptance).

L=100 material sweep on the ~1.75M-tet step03 ankle grid:
  A) round-2 state of the art: body-factored fused Jacobi at 1e-6
     (PARITY.md round-2 table: 40.6 s, ~1095 iters at sigma extremes)
  B) lane-stacked fused MG at CERTIFIED 1e-8
     (ops.multigrid.batched_mg_solve_fused_refined)

Usage: python dev/megatet_sweep_ab.py [L] [--small] [--jacobi-only|--mg-only]
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

from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.ops.lattice_assembly import (
    assemble_lattice_refined, spec_device_arrays)
from pelvistim_fem_tpu.ops.multigrid import (
    batched_mg_solve_fused_refined,
    batched_mg_solve_fused_refined_chunked)
from pelvistim_fem_tpu.ops.stencil import batched_stencil_solve_fused
from pelvistim_fem_tpu.utils.config import default_params

L = int(_sys.argv[1]) if len(_sys.argv) > 1 and _sys.argv[1].isdigit() \
    else 100
p3 = default_params("step03_ankle_layers")
if "--small" in _sys.argv:
    p3["mesh"] = {"lc_global_mm": 3.0, "lc_electrode_mm": 2.0,
                  "lc_skin_min": 0.8}
else:
    p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
                  "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
G = int(np.prod(spec.grid_shape))
print(f"grid {spec.grid_shape} G={G} L={L}", flush=True)

dev = spec_device_arrays(spec, jnp.float64)
t0 = time.perf_counter()
scase, hier = assemble_lattice_refined(spec, device_arrays=dev)
float(np.asarray(hier.levels[-1].coeff[0, 13, 0, 0, 0]))
print(f"assemble+hierarchy {time.perf_counter()-t0:.2f} s "
      f"(levels {[tuple(l.free.shape) for l in hier.levels]})",
      flush=True)

tables = np.tile(np.asarray(spec.sigma_table), (L, 1))
tables[:, 4] = tables[:, 5] = np.logspace(-4.3, -1, L)
tables = jnp.asarray(tables)


def run(name, fn):
    print(f"compiling {name} ...", flush=True)
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi).ravel()[0])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi).ravel()[0])
    t_warm = time.perf_counter() - t0
    it = np.asarray(out.iterations)
    res = np.asarray(out.residual)
    print(f"{name}: warm {t_warm:.2f} s (cold {t_cold:.1f}), iters "
          f"min/mean/max {it.min()}/{it.mean():.0f}/{it.max()}, "
          f"max residual {res.max():.2e}, all converged "
          f"{bool(np.asarray(out.converged).all())}", flush=True)
    return out, t_warm


import jax.tree_util as jtu

sc32 = jtu.tree_map(
    lambda x: x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.floating) else x, scase)
tables32 = tables.astype(jnp.float32)
if "--mg-only" not in _sys.argv:
    # round-2 state of the art ran in f32 (uncertified recursive
    # residual); f64 Jacobi at L=100 OOMs the chip
    jac, t_jac = run(
        "fused Jacobi @1e-6 f32",
        lambda: batched_stencil_solve_fused(sc32, tables32, tol=1e-6,
                                            maxiter=4000))
if "--jacobi-only" not in _sys.argv:
    # whole-sweep L=100 at megatet OOMs HBM (tile padding 3.1x on the
    # Z=41 minor dim); lane chunks reuse one compiled program
    CH = 25 if L > 25 else L
    mg, t_mg = run(
        "fused MG-ref @1e-8   ",
        lambda: batched_mg_solve_fused_refined_chunked(
            scase, hier, tables, lanes_per_chunk=CH, tol=1e-8,
            maxiter=2000))
    from pelvistim_fem_tpu.ops.multigrid import flat_batched_ok
    coeff32 = scase.coeff.astype(jnp.float32)
    if "--flat" in _sys.argv and flat_batched_ok(coeff32, min(L, 25)):
        mgf, t_mgf = run(
            "fused MG-ref flat    ",
            lambda: batched_mg_solve_fused_refined_chunked(
                scase, hier, tables, lanes_per_chunk=CH, tol=1e-8,
                maxiter=2000, spmv="flat"))
        print(f"flat-kernel speedup over fused-XLA MG: "
              f"{t_mg/t_mgf:.2f}x", flush=True)
    elif "--flat" in _sys.argv:
        print(f"flat kernel outside envelope at L={L}", flush=True)
if "--mg-only" not in _sys.argv and "--jacobi-only" not in _sys.argv:
    print(f"speedup (certified 1e-8 MG vs uncertified 1e-6 Jacobi): "
          f"{t_jac/t_mg:.2f}x", flush=True)

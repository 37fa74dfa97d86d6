"""Megatet certified ROM sweep A/B on v5e (VERDICT round-3 item 9).

L-lane contact-conductivity sweep on the ~1.75M-tet step03 ankle grid,
both sides at the SAME certified TRUE-f64-residual 1e-8 contract:
  A) full-order: lane-chunked fused MG refinement
     (ops.multigrid.batched_mg_solve_fused_refined_chunked — the
     round-3 23.9 s path)
  B) reduced-basis greedy sweep in the LEAN (W-free) form
     (ops.rom.rom_sweep_refined(store_w=False)): ~rank full solves +
     direct-apply residual certificates; O(cap * G) memory, which is
     what composes with megatet/pelvis grids where the (B, cap, G)
     applied basis cannot exist.

Usage: python dev/rom_megatet_ab.py [L] [--small] [--rom-only|--full-only]
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
from pelvistim_fem_tpu.ops.multigrid import \
    batched_mg_solve_fused_refined_chunked
from pelvistim_fem_tpu.ops.rom import rom_sweep_refined
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
print(f"assemble+hierarchy {time.perf_counter()-t0:.2f} s", flush=True)

tables = np.tile(np.asarray(spec.sigma_table), (L, 1))
tables[:, 4] = tables[:, 5] = np.logspace(-4.3, -1, L)
tables = jnp.asarray(tables)

TOL = 1e-8
phi_full = None
if "--rom-only" not in _sys.argv:
    # strongest full-order baseline: flat lane-batched Pallas SpMV when
    # in envelope (the round-3 23.9 s configuration), else fused XLA
    from pelvistim_fem_tpu.ops.multigrid import flat_batched_ok
    CH = 25 if L > 25 else L
    spmv = ("flat" if flat_batched_ok(scase.coeff.astype(jnp.float32),
                                      min(L, CH)) else None)
    print(f"full-order spmv routing: {spmv or 'fused-XLA'}", flush=True)
    fn = lambda: batched_mg_solve_fused_refined_chunked(
        scase, hier, tables, lanes_per_chunk=CH, tol=TOL, maxiter=2000,
        **({"spmv": spmv} if spmv else {}))
    print("compiling full-order ...", flush=True)
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi).ravel()[0])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi).ravel()[0])
    t_full = time.perf_counter() - t0
    res = np.asarray(out.residual)
    print(f"full-order certified @1e-8: warm {t_full:.2f} s "
          f"(cold {t_cold:.1f}), max residual {res.max():.2e}, "
          f"converged {bool(np.asarray(out.converged).all())}", flush=True)
    phi_full = np.asarray(out.phi)

if "--full-only" not in _sys.argv:
    # ROM has no warm/cold split the full path has — the greedy loop
    # interleaves jitted full solves with jitted reduced evals, and the
    # FIRST run pays every compile.  Report both; the warm number is
    # the per-sweep cost once the programs are cached (same contract
    # as every other timing here).
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        rout = rom_sweep_refined(scase, hier, tables, tol=TOL,
                                 store_w=False, verbose=(label == "cold"))
        t_rom = time.perf_counter() - t0
        print(f"ROM lean certified @1e-8 ({label}): {t_rom:.2f} s, "
              f"{rout['n_full']} full + {rout['n_polish']} "
              f"warm-polish solves, rank "
              f"{int(rout['rom'].rank)}, max residual "
              f"{np.asarray(rout['residual']).max():.2e}, converged "
              f"{rout['converged']}", flush=True)
    if phi_full is not None:
        sub = np.arange(0, L, max(1, L // 8))
        pf = phi_full[sub]
        pr = np.asarray(rout["phi"])[sub]
        err = (np.linalg.norm(pr - pf, axis=1)
               / np.linalg.norm(pf, axis=1))
        print(f"field parity vs full-order (stride lanes): "
              f"max rel {err.max():.2e}", flush=True)
        print(f"speedup (same certified 1e-8 contract): "
              f"{t_full / t_rom:.2f}x", flush=True)

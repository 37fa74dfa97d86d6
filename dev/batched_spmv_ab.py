"""Megatet BATCHED sweep-matvec A/B on v5e: fused-XLA vs lane-batched
flat Pallas (VERDICT round-3 item 5).

The vmapped MG path hauls O(L*27*G) combined coefficients per matvec at
sweep width L; the fused-XLA path avoids that memory but re-reads the
B-body stacks per lane.  The lane-batched flat kernel
(pallas_stencil.batched_stencil_spmv_flat) keeps each row-block's
(B, 27, R, F) coefficients VMEM-resident across all L lanes, so HBM
coefficient traffic is O(B*27*G) per matvec regardless of L.

Usage: python dev/batched_spmv_ab.py [L] [--small]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import pelvistim_fem_tpu.ops.pallas_stencil as ps
from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.ops import stencil as st
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.utils.config import default_params

L = int(_sys.argv[1]) if len(_sys.argv) > 1 and _sys.argv[1].isdigit() \
    else 8
p3 = default_params("step03_ankle_layers")
if "--small" in _sys.argv:
    p3["mesh"] = {"lc_global_mm": 3.0, "lc_electrode_mm": 2.0,
                  "lc_skin_min": 0.8}
else:
    p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
                  "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
dev = spec_device_arrays(spec, jnp.float32)
scase, _ = assemble_lattice(spec, jnp.float32, device_arrays=dev)
X, Y, Z = spec.grid_shape
G = X * Y * Z
B = scase.coeff.shape[0]
print(f"grid {spec.grid_shape} G={G} B={B} L={L}", flush=True)

rng = np.random.default_rng(0)
tables = np.tile(np.asarray(spec.sigma_table, np.float32), (L, 1))
tables[:, 4] = tables[:, 5] = np.logspace(-4.3, -1, L)
tables = jnp.asarray(tables)
X4 = jnp.asarray(rng.standard_normal((L, X, Y, Z)), jnp.float32)
Cf = ps.pack_coeff_flat_bodies(scase.coeff)
jax.block_until_ready(Cf)

# traffic model: per matvec the fused-XLA path reads the lane vector +
# B-body coefficient planes per offset; the flat kernel reads vectors
# once per lane + coefficients once
bytes_xla = (27 * B * G + 2 * L * G) * 4
bytes_flat = (27 * B * G + 2 * L * G) * 4


def timeit(name, fn, *args, n=50):
    r = fn(*args)
    float(np.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    r = fn(*args)
    float(np.asarray(r).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.3f} ms/matvec", flush=True)
    return r, dt


@partial(jax.jit, static_argnames="n")
def xla_loop(x, coeff, tables, n=50):
    def body(_, x):
        y = st.batched_stencil_spmv_fused(x, coeff, tables)
        nrm = jnp.sqrt(jnp.sum(y * y, axis=(1, 2, 3), keepdims=True))
        return y / jnp.maximum(nrm, 1e-30)
    return jax.lax.fori_loop(0, n, body, x)


@partial(jax.jit, static_argnames="n")
def flat_loop(x, Cf, tables, n=50):
    def body(_, x):
        y = ps.batched_stencil_spmv_flat(x, Cf, tables)
        nrm = jnp.sqrt(jnp.sum(y * y, axis=(1, 2, 3), keepdims=True))
        return y / jnp.maximum(nrm, 1e-30)
    return jax.lax.fori_loop(0, n, body, x)


print("compiling fused-XLA ...", flush=True)
r_x, dt_x = timeit("fused-XLA ", xla_loop, X4, scase.coeff, tables)
print("compiling lane-batched flat Pallas ...", flush=True)
try:
    r_f, dt_f = timeit("flat-Pallas", flat_loop, X4, Cf, tables)
    d = float(jnp.abs(r_f - r_x).max())
    print(f"max |diff| {d:.2e}; speedup {dt_x/dt_f:.2f}x", flush=True)
except Exception as e:  # noqa: BLE001 — record the compile rejection
    print(f"flat-Pallas FAILED: {type(e).__name__}: "
          f"{str(e)[:500]}", flush=True)

"""Megatet SpMV A/B on v5e: XLA vs row-Pallas vs lane-packed flat."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.utils.config import default_params
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops import stencil as st
import pelvistim_fem_tpu.ops.pallas_stencil as ps

p3 = default_params("step03_ankle_layers")
p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
              "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
dev = spec_device_arrays(spec, jnp.float32)
scase, hier = assemble_lattice(spec, jnp.float32, device_arrays=dev)
X, Y, Z = spec.grid_shape
G = X * Y * Z
C = st.combine_coeffs(scase.coeff, scase.sigma_table)
jax.block_until_ready(C)
x0 = jnp.ones((X, Y, Z), jnp.float32) / np.sqrt(G)
bytes_per = (27 * G + 2 * G) * 4

def timeit(name, fn, *args, n=100):
    r = fn(*args); float(np.asarray(r).ravel()[0])
    t0 = time.perf_counter(); r = fn(*args)
    float(np.asarray(r).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.3f} ms/apply, {bytes_per/dt/1e9:.0f} GB/s "
          f"({bytes_per/dt/819e9*100:.1f}% of peak)", flush=True)
    return r

@partial(jax.jit, static_argnames="n")
def xla_loop(x, C, n=100):
    def body(_, x):
        y = st.stencil_spmv(x, C)
        return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
    return jax.lax.fori_loop(0, n, body, x)

@partial(jax.jit, static_argnames="n")
def flat_loop(x, Cf, n=100):
    def body(_, x):
        y = ps.stencil_spmv_flat(x, Cf)
        return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
    return jax.lax.fori_loop(0, n, body, x)

@partial(jax.jit, static_argnames="n")
def row_loop(x, C, n=20):
    def body(_, x):
        y = ps.stencil_spmv_pallas(x, C)
        return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
    return jax.lax.fori_loop(0, n, body, x)

Cf = ps.pack_coeff_flat(C)
jax.block_until_ready(Cf)
# correctness on-device first
y1 = st.stencil_spmv(x0, C)
y2 = ps.stencil_spmv_flat(x0, Cf)
err = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y1)))
print(f"flat-vs-xla max rel err: {err:.2e}", flush=True)

timeit("xla ", xla_loop, x0, C)
timeit("flat", flat_loop, x0, Cf)
timeit("rowp", row_loop, x0, C, n=20)

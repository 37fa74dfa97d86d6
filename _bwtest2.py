"""Clean kernel timing: scalar-only outputs, two loop lengths to
separate fixed dispatch/readback overhead from marginal per-iter cost."""
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
Cf = ps.pack_coeff_flat(C)
jax.block_until_ready((C, Cf))
x0 = jnp.ones((X, Y, Z), jnp.float32) / np.sqrt(G)
spmv_bytes = (27 + 2) * G * 4

def loop_factory(apply_fn, cmat):
    @partial(jax.jit, static_argnames="n")
    def loop(x, n=100):
        def body(_, x):
            y = apply_fn(x, cmat)
            return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))   # SCALAR out
    return loop

def marginal(name, loop, nbytes):
    for n in (20, 120):
        loop(x0, n=n) and None
    ts = {}
    for n in (20, 120):
        float(loop(x0, n=n))  # warm both compiles
        t0 = time.perf_counter(); float(loop(x0, n=n))
        ts[n] = time.perf_counter() - t0
    per = (ts[120] - ts[20]) / 100
    print(f"{name}: marginal {per*1e3:.3f} ms/apply "
          f"({nbytes/per/1e9:.0f} GB/s, {nbytes/per/819e9*100:.1f}% peak); "
          f"fixed {ts[20]-20*per:.4f} s", flush=True)

marginal("xla ", loop_factory(st.stencil_spmv, C), spmv_bytes)
marginal("flat", loop_factory(ps.stencil_spmv_flat, Cf), spmv_bytes)

# pure read-reduce marginal
@partial(jax.jit, static_argnames="n")
def red(C, n=100):
    def body(i, s):
        return s + jnp.sum(C * C) * (1.0 + 1e-9 * i)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
for n in (20, 120): float(red(C, n=n))
ts = {}
for n in (20, 120):
    t0 = time.perf_counter(); float(red(C, n=n))
    ts[n] = time.perf_counter() - t0
per = (ts[120] - ts[20]) / 100
print(f"reduce: marginal {per*1e3:.3f} ms ({27*G*4/per/1e9:.0f} GB/s)",
      flush=True)

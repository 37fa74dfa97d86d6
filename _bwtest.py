"""Diagnose the 45 GB/s wall: raw streaming bandwidth, dependency-free
stencil applies, and reduction cost on the axon v5e."""
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

def bench(name, fn, nbytes, *args, n=50):
    r = fn(*args); float(np.asarray(r).ravel()[0])
    t0 = time.perf_counter(); r = fn(*args)
    float(np.asarray(r).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.3f} ms, {nbytes/dt/1e9:.0f} GB/s", flush=True)

# 1. raw stream: s = s + C_flat * a  (read 34MB + read/write s)
Cbig = C.reshape(27 * G)
@partial(jax.jit, static_argnames="n")
def stream(C, n=50):
    def body(i, s):
        return s + C * (1.0 + 1e-9 * i)
    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(C))
bench("stream 3x34MB rw", stream, 3 * 27 * G * 4, Cbig)

# 2. reduction only: r = sum(C*C) repeatedly
@partial(jax.jit, static_argnames="n")
def reduce_loop(C, n=50):
    def body(i, s):
        return s + jnp.sum(C * C) * (1.0 + 1e-9 * i)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
bench("reduce 34MB", reduce_loop, 27 * G * 4, Cbig)

# 3. dependency-free stencil applies (sum of K(x_i) with trivially
#    varied x): measures kernel throughput without the serial chain
@partial(jax.jit, static_argnames="n")
def indep(x, C, n=50):
    def body(i, s):
        y = st.stencil_spmv(x * (1.0 + 1e-9 * i), C)
        return s + y
    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(x))
bench("xla indep", indep, (27 + 2) * G * 4, x0, C)

Cf = ps.pack_coeff_flat(C)
jax.block_until_ready(Cf)
@partial(jax.jit, static_argnames="n")
def indep_flat(x, Cf, n=50):
    def body(i, s):
        y = ps.stencil_spmv_flat(x * (1.0 + 1e-9 * i), Cf)
        return s + y
    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(x))
bench("flat indep", indep_flat, (27 + 2) * G * 4, x0, Cf)

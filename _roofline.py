"""Megatet roofline: time the 27-point SpMV, the V-cycle apply, and a
full MG-CG solve (hierarchy prebuilt) on one v5e; report achieved HBM
bandwidth vs the chip's ~819 GB/s peak.  XLA path and Pallas kernel."""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from functools import partial
from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.utils.config import default_params
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops import stencil as st
from pelvistim_fem_tpu.ops.multigrid import (make_v_cycle,
                                             solve_stencil_mg)

p3 = default_params("step03_ankle_layers")
p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
              "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
dev = spec_device_arrays(spec, jnp.float32)
scase, hier = assemble_lattice(spec, jnp.float32, device_arrays=dev)
float(np.asarray(hier.levels[-1].coeff[0, 13, 0, 0, 0]))
X, Y, Z = spec.grid_shape
G = X * Y * Z
print(f"grid {spec.grid_shape} G={G}", flush=True)

C = st.combine_coeffs(scase.coeff, scase.sigma_table)
jax.block_until_ready(C)

@partial(jax.jit, static_argnames="n")
def spmv_loop(x, C, n=100):
    def body(_, x):
        y = st.stencil_spmv(x, C)
        # renormalize to keep values finite without extra memory traffic
        return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
    return jax.lax.fori_loop(0, n, body, x)

x0 = jnp.ones((X, Y, Z), jnp.float32) / np.sqrt(G)
r = spmv_loop(x0, C); float(np.asarray(r[0, 0, 0]))
t0 = time.perf_counter(); r = spmv_loop(x0, C)
f = float(np.asarray(r[0, 0, 0])); dt = (time.perf_counter() - t0) / 100
bytes_per = (27 * G + 2 * G) * 4   # read C + read x + write y
print(f"spmv: {dt*1e3:.3f} ms/apply, {bytes_per/dt/1e9:.0f} GB/s "
      f"({bytes_per/dt/819e9*100:.0f}% of v5e HBM peak)", flush=True)

M = make_v_cycle(hier, scase.sigma_table)
@partial(jax.jit, static_argnames="n")
def vcycle_loop(r0, n=20):
    def body(_, r):
        z = M(r)
        return z / jnp.maximum(jnp.sqrt(jnp.sum(z * z)), 1e-30)
    return jax.lax.fori_loop(0, n, body, r0)
r = vcycle_loop(x0); float(np.asarray(r[0, 0, 0]))
t0 = time.perf_counter(); r = vcycle_loop(x0)
f = float(np.asarray(r[0, 0, 0])); dtv = (time.perf_counter() - t0) / 20
print(f"v-cycle: {dtv*1e3:.3f} ms/apply", flush=True)

res = solve_stencil_mg(scase, hier, tol=1e-6)
float(np.asarray(res.phi[0]))
t0 = time.perf_counter()
res = solve_stencil_mg(scase, hier, tol=1e-6)
float(np.asarray(res.phi[0])); dts = time.perf_counter() - t0
it = int(np.asarray(res.iterations))
print(f"mg-cg solve: {dts:.3f} s, {it} iters, {dts/it*1e3:.2f} ms/iter",
      flush=True)

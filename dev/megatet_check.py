import time
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.utils.config import default_params
from pelvistim_fem_tpu.ops.lattice_assembly import (
    solve_lattice_mg, solve_lattice_mg_refined, spec_device_arrays,
    _auto_spmv)

p3 = default_params("step03_ankle_layers")
p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
              "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
print("auto spmv:", _auto_spmv(spec), flush=True)
dev = spec_device_arrays(spec, jnp.float32)
r = solve_lattice_mg(spec, tol=1e-6, device_arrays=dev)
float(np.asarray(r.phi[0]))
t0 = time.perf_counter()
r = solve_lattice_mg(spec, tol=1e-6, device_arrays=dev)
float(np.asarray(r.phi[0]))
dt = time.perf_counter() - t0
print(f"megatet assemble+solve (flat auto): {dt:.3f} s, "
      f"{int(np.asarray(r.iterations))} iters, conv "
      f"{bool(np.asarray(r.converged))}", flush=True)

# refined (true 1e-8) megatet for the honesty story
dev64 = spec_device_arrays(spec, jnp.float64)
r2 = solve_lattice_mg_refined(spec, tol=1e-8, device_arrays=dev64)
float(np.asarray(r2.phi[0]))
t0 = time.perf_counter()
r2 = solve_lattice_mg_refined(spec, tol=1e-8, device_arrays=dev64)
float(np.asarray(r2.phi[0]))
dt2 = time.perf_counter() - t0
print(f"megatet refined 1e-8: {dt2:.3f} s, "
      f"{int(np.asarray(r2.iterations))} inner iters, true res "
      f"{float(np.asarray(r2.residual)):.2e}", flush=True)

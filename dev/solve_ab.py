"""A/B: megatet MG-CG solve with the XLA spmv vs the lane-packed flat
kernel — through the PRODUCTION spmv-parameterized API
(multigrid.solve_stencil_mg), so the measurement cannot diverge from
the shipped path.  Timing via repeated solves with scalar readback."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops.multigrid import solve_stencil_mg
from pelvistim_fem_tpu.utils.config import default_params

p3 = default_params("step03_ankle_layers")
p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
              "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
dev = spec_device_arrays(spec, jnp.float32)
scase, hier = assemble_lattice(spec, jnp.float32, device_arrays=dev)
jax.block_until_ready(scase.coeff)

for name, mode in (("xla ", None), ("flat", "flat")):
    r = solve_stencil_mg(scase, hier, tol=1e-6, spmv=mode)
    float(r.phi.ravel()[0])
    t0 = time.perf_counter()
    r = solve_stencil_mg(scase, hier, tol=1e-6, spmv=mode)
    float(r.phi.ravel()[0])
    dt = time.perf_counter() - t0
    it = int(np.asarray(r.iterations))
    print(f"{name}: solve {dt:.3f} s, {it} iters, {dt/it*1e3:.2f} ms/iter,"
          f" res {float(np.asarray(r.residual)):.2e}", flush=True)

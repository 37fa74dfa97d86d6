"""A/B: f64 outer MG-CG (f32 V-cycle preconditioner, no restarts) vs
the mixed-precision refinement path, on the bench sweep at tol 1e-8."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.pressure import build_pressure_spec
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops import stencil as st
from pelvistim_fem_tpu.ops.multigrid import make_v_cycle
from pelvistim_fem_tpu.ops.solve import preconditioned_cg, SolveResult
from functools import partial

spec, params = build_pressure_spec(coarse=False)
dev = spec_device_arrays(spec, jnp.float64)
scase, hier = assemble_lattice(spec, jnp.float64, device_arrays=dev)
float(np.asarray(hier.levels[-1].coeff[0, 13, 0, 0, 0]))

sweep = params["pressure_sweep"]["sigma_contact_Spm"]
sigmas = np.logspace(np.log10(sweep[0]), np.log10(sweep[-1]), 100)
base = np.asarray(spec.sigma_table)
tables = np.tile(base, (100, 1))
tables[:, core.BODY_CONTACT_ACTIVE] = sigmas
tables[:, core.BODY_CONTACT_RETURN] = sigmas
tables = jnp.asarray(tables, jnp.float64)

to32 = lambda a: jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
hier32 = to32(hier)

@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve_f64cg(sig, *, tol=1e-8, maxiter=2000):
    op64, _, b64 = st._operator(scase, sig)
    M32 = make_v_cycle(hier32, sig.astype(jnp.float32))
    free = scase.free
    def M(r):
        z = M32(jnp.where(free, r, 0.0).astype(jnp.float32))
        return jnp.where(free, z.astype(jnp.float64), r)
    x0 = jnp.where(free, 0.0, scase.dirichlet)
    return preconditioned_cg(op64, b64, M, x0, tol=tol, maxiter=maxiter)

batched = jax.jit(jax.vmap(lambda s: solve_f64cg(s)))
out = batched(tables); float(np.asarray(out.phi).ravel()[0])
t0 = time.perf_counter()
out = batched(tables); float(np.asarray(out.phi).ravel()[0])
dt = time.perf_counter() - t0
its = np.asarray(out.iterations); res = np.asarray(out.residual)
print(f"f64cg wall={dt:.3f}s mean_it={its.mean():.1f} max_it={its.max()}"
      f" max_res={res.max():.2e} conv={bool(np.asarray(out.converged).all())}",
      flush=True)

"""Smoother/nu scan for the 100-lane refined sweep at tol 1e-8: does a
stronger smoother cut the hard-lane (max) iteration count enough to
beat Jacobi nu=2's cheaper cycles?"""
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
from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined

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

for sm, nu in (("jacobi", 2), ("jacobi", 3), ("chebyshev", 3),
               ("chebyshev", 4)):
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8,
                                   smoother=sm, nu=nu)
    float(np.asarray(out.phi[0, 0]))
    t0 = time.perf_counter()
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8,
                                   smoother=sm, nu=nu)
    float(np.asarray(out.phi[0, 0]))
    dt = time.perf_counter() - t0
    its = np.asarray(out.iterations)
    print(f"{sm} nu={nu}: wall={dt:.3f}s mean_it={its.mean():.1f} "
          f"max_it={its.max()} "
          f"conv={bool(np.asarray(out.converged).all())}", flush=True)

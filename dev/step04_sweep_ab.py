"""bench.py sweep-leg A/B: per-lane-combined vs fused vs fused+flat.

The bench 100-case sweep (172k tets / ~32k nodes) currently solves via
batched_mg_solve_refined (per-lane combined coefficients).  The
round-3 fused machinery (combine-on-the-fly SpMV + the lane-batched
flat Pallas kernel) won 1.53x at megatet L=100 — measure whether it
also wins at the step04 grid, where the combined stack fits easily.

MEASURED (v5e, 2026-08-17, grid (55,31,19) L=100, certified 1e-8):
  per-lane combined  0.693 s  <- bench.py's path; WINS at this scale
  fused              1.108 s  (0.63x)
  fused + flat       1.022 s  (0.68x)
Re-measured 2026-08-19 with the smooth0 pre-smoother (one fewer apply
per level per V-cycle): per-lane combined 0.641 s, fused 1.044, flat
1.019.  A bfloat16-compressed V-cycle coefficient store (tested round
4) HALVES smoother traffic but was catastrophic on TPU (max iters
48 -> 4032, 22.4 s): independently rounding the 27 stencil planes
breaks the row-sum (near-nullspace) structure the V-cycle relies on;
on CPU x64 the same compression only cost ~20% more iterations.  Not
adopted; coefficient compression must preserve row sums to be viable.
At 32k nodes the per-lane combined stack (L*27*G ~ 350 MB f32) fits
easily and XLA's batched stencil fuses better than the combine-on-the-
fly forms, whose extra per-level lane work dominates on small grids.
The fused/flat machinery is a MEGATET-scale tool (where per-lane
combined coefficients are a 3.4 GB non-starter); bench.py's sweep-leg
routing stays per-lane combined.

Usage: python dev/step04_sweep_ab.py [L]
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

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.pressure import build_pressure_spec
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops.multigrid import (batched_mg_solve_fused_refined,
                                             batched_mg_solve_refined,
                                             flat_batched_ok)

L = int(_sys.argv[1]) if len(_sys.argv) > 1 else 100
spec, params = build_pressure_spec(coarse=False)
dev = spec_device_arrays(spec, jnp.float64)
scase, hier = assemble_lattice(spec, jnp.float64, device_arrays=dev)
print(f"grid {spec.grid_shape} L={L}", flush=True)

sweep = params["pressure_sweep"]["sigma_contact_Spm"]
sigmas = np.logspace(np.log10(sweep[0]), np.log10(sweep[-1]), L)
tables = np.tile(np.asarray(spec.sigma_table), (L, 1))
tables[:, core.BODY_CONTACT_ACTIVE] = sigmas
tables[:, core.BODY_CONTACT_RETURN] = sigmas
tables = jnp.asarray(tables, jnp.float64)


def run(name, fn):
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi[0, 0]))
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out.phi[0, 0]))
    t = time.perf_counter() - t0
    it = np.asarray(out.iterations)
    print(f"{name}: warm {t:.3f} s (cold {t_cold:.1f}) iters "
          f"mean/max {it.mean():.1f}/{it.max()} max res "
          f"{np.asarray(out.residual).max():.2e} conv "
          f"{bool(np.asarray(out.converged).all())}", flush=True)
    return t


t_a = run("per-lane combined (bench today)",
          lambda: batched_mg_solve_refined(scase, hier, tables, tol=1e-8))
t_b = run("fused (combine-on-the-fly)    ",
          lambda: batched_mg_solve_fused_refined(scase, hier, tables,
                                                 tol=1e-8))
c32 = scase.coeff.astype(jnp.float32)
if flat_batched_ok(c32, L):
    t_c = run("fused + flat Pallas kernel    ",
              lambda: batched_mg_solve_fused_refined(
                  scase, hier, tables, tol=1e-8, spmv="flat"))
    print(f"fused/combined {t_a/t_b:.2f}x, flat/combined {t_a/t_c:.2f}x",
          flush=True)
else:
    print(f"flat kernel outside envelope at L={L}", flush=True)
    print(f"fused/combined {t_a/t_b:.2f}x", flush=True)

"""TPU A/B: the 100-lane certified bench sweep on the rim-refined vs
base step04 lattice (round-4 VERDICT item 4) — through the production
path (build_pressure_spec -> assemble_lattice -> batched_mg_solve_refined).

Records: convergence at every lane (incl. the 7000x-contrast low end),
iteration counts, warm sweep wall, and sampled geometric flux_err.

Run on the axon TPU: python dev/rim_sweep_tpu_ab.py [rim_refine ...]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from pelvistim_fem_tpu.mesh import core  # noqa: E402
from pelvistim_fem_tpu.models.pressure import (build_pressure_case,  # noqa: E402
                                               build_pressure_spec)
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,  # noqa: E402
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops.metrics import injected_currents  # noqa: E402
from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined  # noqa: E402
from pelvistim_fem_tpu.utils.config import default_params  # noqa: E402


def run(rim):
    p = default_params("step04_pressure")
    p.setdefault("mesh", {})["rim_refine"] = rim
    t0 = time.perf_counter()
    spec, params = build_pressure_spec(p)
    print(f"rim={rim}: spec {spec.grid_shape} in "
          f"{time.perf_counter()-t0:.2f}s", flush=True)
    dev = spec_device_arrays(spec, jnp.float64)
    scase, hier = assemble_lattice(spec, jnp.float64, device_arrays=dev)
    float(np.asarray(hier.levels[-1].coeff[0, 13, 0, 0, 0]))
    print("  assembled", flush=True)
    sweep = params["pressure_sweep"]["sigma_contact_Spm"]
    sigmas = np.logspace(np.log10(sweep[0]), np.log10(sweep[-1]), 100)
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (100, 1))
    tables[:, core.BODY_CONTACT_ACTIVE] = sigmas
    tables[:, core.BODY_CONTACT_RETURN] = sigmas
    tables = jnp.asarray(tables, jnp.float64)
    t0 = time.perf_counter()
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    float(np.asarray(out.phi[0, 0]))
    print(f"  compile+first solve {time.perf_counter()-t0:.1f}s",
          flush=True)
    t = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
        float(np.asarray(out.phi[0, 0]))
        t = min(t, time.perf_counter() - t0)
    it = np.asarray(out.iterations)
    conv = bool(np.asarray(out.converged).all())
    print(f"  conv={conv} iters max={it.max()} mean={it.mean():.1f} "
          f"max_res={float(np.asarray(out.residual).max()):.2e} "
          f"wall={t:.3f}s -> {100*60/t:.0f} solves/min", flush=True)
    case, _, _ = build_pressure_case(p, with_mesh=True,
                                     dtype=jnp.float64)
    print(f"  case {case.n_nodes} nodes {case.n_tets} tets", flush=True)
    worst = 0.0
    for i in (0, 25, 50, 75, 99):
        cur = injected_currents(case, out.phi[i],
                                sigma_table=tables[i])
        worst = max(worst, cur["flux_err"])
        print(f"  lane {i} (sigma_c={sigmas[i]:.2e}): "
              f"flux_err={cur['flux_err']:.3%}", flush=True)
    print(f"  sampled max flux_err {worst:.3%}", flush=True)


if __name__ == "__main__":
    rims = [float(a) for a in sys.argv[1:]] or [0.0, 2.0]
    for r in rims:
        run(r)

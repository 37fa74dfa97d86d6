"""Sweep-path routing A/B on the rim-refined bench mesh (round 5).

The per-lane-combined batched_mg_solve_refined at L=100 on the
rim-banded grid (89,41,19) requests 30.3 G HBM (tile padding ~3x on
the (L,27,G) stacks) — OOM on one v5e.  Candidates at the same
certified 1e-8 contract:
  A) per-lane combined in lane chunks (4 x 25) — O(chunk*27*G) stacks
  B) body-factored fused chunked (+flat Pallas SpMV when in envelope)

Run on TPU: python dev/rim_bench_routing.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from pelvistim_fem_tpu.mesh import core  # noqa: E402
from pelvistim_fem_tpu.models.pressure import build_pressure_spec  # noqa: E402
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,  # noqa: E402
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops.multigrid import (  # noqa: E402
    batched_mg_solve_fused_refined_chunked, batched_mg_solve_refined,
    flat_batched_ok)
from pelvistim_fem_tpu.utils.config import default_params  # noqa: E402


def main():
    p = default_params("step04_pressure")
    p.setdefault("mesh", {})["rim_refine"] = 2.0
    spec, params = build_pressure_spec(p)
    G = int(np.prod(spec.grid_shape))
    print(f"grid {spec.grid_shape} G={G}", flush=True)
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

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(out.phi).ravel()[0])
        cold = time.perf_counter() - t0
        w = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(out.phi).ravel()[0])
            w = min(w, time.perf_counter() - t0)
        it = np.asarray(out.iterations)
        print(f"{name}: warm {w:.3f} s (cold {cold:.1f}) -> "
              f"{100*60/w:.0f} solves/min, iters max {it.max()} "
              f"mean {it.mean():.1f}, conv "
              f"{bool(np.asarray(out.converged).all())}, max res "
              f"{float(np.asarray(out.residual).max()):.2e}", flush=True)
        return w

    # A) per-lane combined, 25-lane chunks (stitch on host)
    def chunked_combined():
        outs = [batched_mg_solve_refined(scase, hier, tables[i:i + 25],
                                         tol=1e-8)
                for i in range(0, 100, 25)]
        import jax.numpy as jnp
        from pelvistim_fem_tpu.ops.solve import SolveResult
        return SolveResult(
            phi=jnp.concatenate([o.phi for o in outs]),
            iterations=jnp.concatenate([jnp.atleast_1d(o.iterations)
                                        for o in outs]),
            residual=jnp.concatenate([jnp.atleast_1d(o.residual)
                                      for o in outs]),
            converged=jnp.stack([o.converged.all() for o in outs]).all())
    timed("A per-lane-combined 4x25", chunked_combined)

    # B) fused chunked, flat SpMV when in envelope
    spmv = ("flat" if flat_batched_ok(scase.coeff.astype(jnp.float32), 25)
            else None)
    print(f"B spmv routing: {spmv or 'fused-XLA'}", flush=True)
    timed("B fused chunked 25", lambda: batched_mg_solve_fused_refined_chunked(
        scase, hier, tables, lanes_per_chunk=25, tol=1e-8,
        **({"spmv": spmv} if spmv else {})))


if __name__ == "__main__":
    main()

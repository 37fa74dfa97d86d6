"""High-level solve orchestration shared by the app entry points.

Picks the right execution strategy per platform:
  * CPU  — f64 arrays, direct PCG to the reference tolerance (1e-8).
  * TPU  — f32 stencil CG with f64 iterative refinement to 1e-8
           (native f64 is emulated/slow on TPU; see ops/solve.py).
and the right operator: structured stencil when the mesh has lattice
provenance (all generated meshes), element-based otherwise (imported
unstructured meshes).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.solve import solve_case, solve_case_refined
from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                           solve_stencil,
                                           solve_stencil_refined)


def on_tpu() -> bool:
    return jax.devices()[0].platform != "cpu"


def preferred_dtype():
    if on_tpu():
        return jnp.float32
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def solve_auto(case, mesh=None, *, tol=1e-8, maxiter=30_000, timer=None):
    """Solve a Case with the fastest valid strategy; returns SolveResult
    (phi in mesh-node ordering) with wall time recorded in `timer`."""
    t0 = time.perf_counter()
    use_stencil = mesh is not None and mesh.lattice is not None
    f64_ok = jax.config.jax_enable_x64

    if use_stencil:
        if f64_ok:
            # f64 master coefficients; the refined solver runs its inner
            # CG in f32 and only the residual corrections in f64.  (An
            # f32-rounded operator would cap the attainable reaction-flux
            # consistency at ~1e-4 through kappa amplification.)
            scase = build_stencil_case(case, mesh, dtype=jnp.float64)
            res = solve_stencil_refined(scase, tol=tol, inner_tol=1e-6,
                                        maxiter=maxiter)
        else:
            scase = build_stencil_case(case, mesh, dtype=jnp.float32)
            res = solve_stencil(scase, tol=max(tol, 1e-6), maxiter=maxiter)
    else:
        # Element path (no lattice provenance — imported meshes).  For
        # anything beyond trivial size, smoothed-aggregation AMG
        # (ops/amg.py) replaces UMFPACK's role: Jacobi-PCG pays
        # 100s-1000s of iterations at the reference's tissue contrasts
        # where AMG-CG takes ~15-30.  The hierarchy build needs HOST
        # problem data — engaged when the caller passed the mesh (or on
        # CPU, where device readback is free); tiny cases keep plain CG.
        use_amg = (case.n_nodes >= 2000
                   and (mesh is not None or not on_tpu()))
        if use_amg:
            from pelvistim_fem_tpu.ops.amg import (build_amg,
                                                   solve_case_amg,
                                                   solve_case_amg_refined)
            amg = build_amg(case, mesh=mesh, dtype=jnp.float32)
            if f64_ok:
                res = solve_case_amg_refined(case, amg, tol=tol,
                                             maxiter=maxiter)
            else:
                res = solve_case_amg(case, amg, tol=max(tol, 1e-6),
                                     maxiter=maxiter)
        elif f64_ok and not on_tpu():
            res = solve_case(case, tol=tol, maxiter=maxiter)
        elif f64_ok:
            # TPU + x64: mixed-precision refinement reaches the full
            # reference tolerance (params.yaml:92 -> 1e-8) on imported
            # meshes too — plain f32 CG stalls near 1e-6.
            res = solve_case_refined(case, tol=tol, inner_tol=1e-6,
                                     maxiter=maxiter)
        else:
            res = solve_case(case, tol=max(tol, 1e-6), maxiter=maxiter)
    jax.block_until_ready(res.phi)
    dt = time.perf_counter() - t0
    if timer is not None:
        timer.phases["solve"] = timer.phases.get("solve", 0.0) + dt
    n = case.n_nodes
    it = int(np.asarray(res.iterations))
    print(f"    solve: {dt*1e3:.0f} ms, {it} iters, "
          f"rel res {float(np.asarray(res.residual)):.2e}, "
          f"{n / max(dt, 1e-9):,.0f} DOF/s")
    if not bool(np.asarray(res.converged)):
        print("    WARNING: solver did not reach tolerance")
    return res

"""Imported-unstructured-mesh AMG solve timing on the real TPU
(round-4 VERDICT item 2: the one solver class with no hardware number).

Problem: a >=1M-tet box whose INTERIOR nodes are deterministically
jiggled by ~0.35h — the tets are genuinely unstructured (no lattice
provenance, irregular grads/volumes; exactly the mesh class the
reference hands to UMFPACK, step01_box/case.sif:41-42).  Hard contrast
via a two-body split (bone-like core).  Pipeline:

  host: build_amg (scipy CSR + smoothed aggregation)   [timed, one-time]
  TPU:  solve_case_amg_refined -> TRUE f64 residual <= 1e-8  [timed warm]

Timing uses the two-point marginal method where applicable; the solve
is a single call, so report best-of-3 warm wall (what a user pays).
Compare DOF/s against the lattice path on the same grid shape.

Usage: python dev/amg_tpu_timing.py [--small] [--n N]
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
if _os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")   # env alone unreliable

from pelvistim_fem_tpu.mesh.generate import box_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.amg import build_amg, solve_case_amg_refined


def unstructured_box(h, jig=0.18, seed=7):
    """box_mesh with interior nodes jiggled: no lattice provenance."""
    import dataclasses
    m = box_mesh(0.04, 0.04, 0.02, h)
    rng = np.random.default_rng(seed)
    nodes = m.nodes.copy()
    eps = 1e-9
    interior = ((nodes[:, 0] > eps) & (nodes[:, 0] < 0.04 - eps)
                & (nodes[:, 1] > eps) & (nodes[:, 1] < 0.04 - eps)
                & (nodes[:, 2] > eps) & (nodes[:, 2] < 0.02 - eps))
    nodes[interior] += (rng.uniform(-jig, jig,
                                    (int(interior.sum()), 3)) * h)
    # two-body hard contrast: a low-sigma core slab (bone-like)
    c = nodes[m.tets].mean(axis=1)
    body = np.where((c[:, 2] > 0.008) & (c[:, 2] < 0.012)
                    & (c[:, 0] > 0.01) & (c[:, 0] < 0.03),
                    2, 1).astype(np.int32)
    m2 = dataclasses.replace(m, nodes=nodes, tet_body=body,
                             lattice=None, _geom=None, _face_geom=None)
    return m2.with_positive_volumes()


def main():
    h = 0.02 / 18 if "--small" in _sys.argv else 0.04 / 70
    t0 = time.perf_counter()
    m = unstructured_box(h)
    t_mesh = time.perf_counter() - t0
    grads, vol = m.geometry()
    assert vol.min() > 0
    print(f"mesh: {m.n_tets} tets, {m.n_nodes} nodes "
          f"({t_mesh:.1f} s host build; min vol {vol.min():.2e})",
          flush=True)

    sigma = {1: 0.2, 2: 0.2 / 7000.0}         # 7000x contrast
    case = build_case(m, sigma, mode="voltage", active_V=1.0,
                      dtype=jnp.float64)
    t0 = time.perf_counter()
    amg = build_amg(case, mesh=m)
    t_amg = time.perf_counter() - t0
    lv = [int(l.diag.shape[0]) for l in amg.levels]
    print(f"AMG hierarchy: levels {lv} ({t_amg:.1f} s host)", flush=True)

    r = solve_case_amg_refined(case, amg, tol=1e-8)
    float(np.asarray(r.phi[0]))               # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        r = solve_case_amg_refined(case, amg, tol=1e-8)
        float(np.asarray(r.phi[0]))
        best = min(best, time.perf_counter() - t0)
    conv = bool(np.asarray(r.converged))
    res = float(np.asarray(r.residual))
    iters = int(np.asarray(r.iterations))
    dofs = int(np.asarray(case.free_mask).sum())
    print(f"solve_case_amg_refined: {best:.2f} s warm best-of-3, "
          f"{iters} inner iters, true res {res:.2e}, converged {conv}; "
          f"{dofs/best/1e6:.2f} MDOF/s", flush=True)
    assert conv


if __name__ == "__main__":
    main()

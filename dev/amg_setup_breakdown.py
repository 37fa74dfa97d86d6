"""AMG setup cost breakdown at >= 1M tets (round-4 VERDICT item 6):
which phase of build_amg dominates the 17 s-class host rebuild that
--adapt-local pays every cycle?

Phases: fine CSR assembly | RCM | per-level (strength + aggregation +
smoothed P + Galerkin triple product) | ELL conversion.

Run: python dev/amg_setup_breakdown.py [--small]
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import pelvistim_fem_tpu.ops.amg as amg_mod  # noqa: E402
from pelvistim_fem_tpu.models.ankle import build_layered_case  # noqa: E402
from pelvistim_fem_tpu.utils.config import default_params  # noqa: E402


def main():
    p = default_params("step03_ankle_layers")
    if "--small" not in sys.argv:
        p["mesh"] = {"lc_global_mm": 1.4, "lc_electrode_mm": 0.9,
                     "lc_skin_min": 0.45}
    t0 = time.perf_counter()
    case, _, mesh = build_layered_case(p, t_fat=0.005, elec_r=0.010,
                                       coarse=False, dtype=jnp.float64,
                                       with_mesh=True, to_device=False)
    print(f"mesh {case.n_tets:,} tets {case.n_nodes:,} nodes "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    import scipy.sparse as sp
    t0 = time.perf_counter()
    A, free_idx = amg_mod._assemble_csr(
        *amg_mod._host_problem(case, mesh, None))
    t_csr = time.perf_counter() - t0

    t0 = time.perf_counter()
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    A2 = A[perm][:, perm].tocsr()
    A2.sum_duplicates()
    t_rcm = time.perf_counter() - t0

    t_levels = []
    lvl_theta = 0.08
    Ac = A2
    while Ac.shape[0] > 400 and len(t_levels) < 12:
        t0 = time.perf_counter()
        S = amg_mod._strength_graph(Ac, lvl_theta)
        agg, n_agg = amg_mod._aggregate(S)
        if n_agg >= Ac.shape[0] or n_agg == 0:
            break
        T = sp.csr_matrix((np.ones(Ac.shape[0]),
                           (np.arange(Ac.shape[0]), agg)),
                          shape=(Ac.shape[0], n_agg))
        omega = 4.0 / (3.0 * max(amg_mod._rho_dinv_a(Ac), 1e-30))
        d = np.asarray(Ac.diagonal())
        Dinv = sp.diags(1.0 / np.where(d > 0, d, 1.0))
        P = (T - omega * (Dinv @ (Ac @ T))).tocsr()
        Ac = (P.T @ (Ac @ P)).tocsr()
        Ac.sum_duplicates()
        t_levels.append((time.perf_counter() - t0, Ac.shape[0]))
        lvl_theta *= 0.5

    t0 = time.perf_counter()
    amg_mod._to_ell(A2, jnp.float64)
    t_ell = time.perf_counter() - t0

    print(f"fine CSR assemble : {t_csr:6.2f}s")
    print(f"RCM permutation   : {t_rcm:6.2f}s")
    for i, (t, n) in enumerate(t_levels):
        print(f"level {i} coarsen   : {t:6.2f}s  (-> {n:,} dofs)")
    print(f"fine ELL convert  : {t_ell:6.2f}s")
    print(f"TOTAL             : "
          f"{t_csr + t_rcm + sum(t for t, _ in t_levels) + t_ell:6.2f}s")


if __name__ == "__main__":
    main()

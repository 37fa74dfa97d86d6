"""Rim-treatment A/B for the geometric flux_err plateau (round-4 VERDICT
item 4): the staircase electrode rim holds max_flux_err at ~1.9% across
rounds.  Variants on the step04 geometry:

  base      — the shipping lattice
  rim2      — rim bands at the tangency + 45-degree crossings, h_fine/2
  rim3      — same bands at h_fine/3
  half      — h_fine/2 across the whole footprint (cost ceiling control)

For each: solve certified 1e-8, report flux_err (geometric, the parity
metric), node count, and solve wall — the candidate must cut flux_err
without wrecking the sweep node budget.

Run CPU: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= JAX_ENABLE_X64=1 \
         python dev/rim_flux_ab.py [--full]
"""
import sys
import time

import numpy as np

import jax

if "axon" in str(jax.config.jax_platforms or ""):
    pass  # run on whatever backend is configured (TPU for --full)

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pelvistim_fem_tpu.mesh import core  # noqa: E402
from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe  # noqa: E402
from pelvistim_fem_tpu.models.ankle import layered_model_inputs  # noqa: E402
from pelvistim_fem_tpu.models.case import build_case  # noqa: E402
from pelvistim_fem_tpu.ops.metrics import injected_currents  # noqa: E402
from pelvistim_fem_tpu.runner import solve_auto  # noqa: E402
from pelvistim_fem_tpu.utils.config import default_params  # noqa: E402


def run_variant(name, coarse, sigma_contact=None, **extra):
    p = default_params("step04_pressure")
    (Lx, Ly, Lz), rk, sigma_by_body, bc_kwargs, meta_extra, p = \
        layered_model_inputs(p, elec_r=0.010, coarse=coarse)
    rk = dict(rk, **extra)
    t0 = time.perf_counter()
    recipe = layered_slab_recipe(Lx, Ly, Lz, **rk)
    mesh = recipe.mesh()
    if sigma_contact is not None:
        sigma_by_body = dict(sigma_by_body)
        sigma_by_body[core.BODY_CONTACT_ACTIVE] = sigma_contact
        sigma_by_body[core.BODY_CONTACT_RETURN] = sigma_contact
    case = build_case(mesh, sigma_by_body, meta_extra=meta_extra,
                      dtype=jnp.float64, **bc_kwargs)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solve_auto(case, mesh, tol=1e-8)
    assert bool(np.asarray(res.converged))
    t_solve = time.perf_counter() - t0
    cur = injected_currents(case, res.phi)
    print(f"{name:8s} nodes={case.n_nodes:7d} tets={case.n_tets:8d} "
          f"flux_err={cur['flux_err']:.3%} "
          f"(consistent {cur['flux_err_consistent']:.1e}) "
          f"build={t_build:.1f}s solve={t_solve:.1f}s", flush=True)
    return cur["flux_err"], case.n_nodes


def main():
    coarse = "--full" not in sys.argv
    # the bench's worst lane is the lowest sigma_contact (hard contrast)
    for sc in (None, 5e-5):
        tag = f" sigma_c={sc}" if sc else " (default sigma_c)"
        print(f"--- step04 r=10mm{tag} coarse={coarse}")
        p = default_params("step04_pressure")
        _, rk0, *_ = layered_model_inputs(p, elec_r=0.010, coarse=coarse)
        run_variant("base", coarse, sc)
        run_variant("rim2", coarse, sc, rim_refine=2.0)
        run_variant("rim3", coarse, sc, rim_refine=3.0)
        run_variant("half", coarse, sc, h_fine=rk0["h_fine"] / 2)


if __name__ == "__main__":
    main()

"""Diagnose the red path-7 dryrun: sharded vs single-device ROM economy
on the dryrun's 6-lane contact-sigma sweep (round-4 VERDICT item 1b).

Control experiment: run ops/rom.rom_sweep_refined (single-device, has
warm-polish) on the IDENTICAL scase/hier/tables the dryrun builds, and
rom_sweep_refined_sharded on a 8-virtual-CPU mesh.  If the single-device
greedy certifies from fewer full solves, rom_shard has a defect; if not,
the dryrun problem/assert were mis-chosen (VERDICT round 4).

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_ENABLE_X64=1 python dev/rom_dryrun_diag.py
"""
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from pelvistim_fem_tpu.mesh import core  # noqa: E402
from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe  # noqa: E402
from pelvistim_fem_tpu.models.case import build_case  # noqa: E402
from pelvistim_fem_tpu.ops.multigrid import build_hierarchy  # noqa: E402
from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,  # noqa: E402
                                           stencil_host_data)


def build_dryrun_problem():
    Lx, Ly, Lz = 0.08, 0.06, 0.04
    recipe = layered_slab_recipe(
        Lx, Ly, Lz,
        layers=[(core.BODY_MUSCLE, 0.0335, 0.012),
                (core.BODY_FAT, 0.005, 0.005),
                (core.BODY_SKIN, 0.0015, 0.0015)],
        electrodes=[(0.015, 0.045, 0.01), (0.065, 0.045, 0.01)],
        contact_t=0.0005, contact_h_z=0.0005,
        h_fine=0.006, h_coarse=0.012,
    )
    m = recipe.mesh()
    case = build_case(
        m,
        {core.BODY_MUSCLE: 0.35, core.BODY_FAT: 0.04, core.BODY_SKIN: 1e-3,
         core.BODY_CONTACT_ACTIVE: 5e-3, core.BODY_CONTACT_RETURN: 5e-3},
        mode="current", injected_current_A=5e-3, dtype=jnp.float64)
    hd = stencil_host_data(case, m)
    scase = build_stencil_case(case, m, dtype=jnp.float64, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float64)
    base = np.asarray(case.sigma_table)
    return scase, hier, base


def lanes(base, n, lo, hi):
    tabs = np.tile(base, (n, 1))
    tabs[:, core.BODY_CONTACT_ACTIVE] = np.logspace(lo, hi, n)
    tabs[:, core.BODY_CONTACT_RETURN] = tabs[:, core.BODY_CONTACT_ACTIVE]
    return tabs


def main():
    scase, hier, base = build_dryrun_problem()
    G = int(np.prod(scase.free.shape))
    print(f"grid {scase.free.shape} G={G}")

    from pelvistim_fem_tpu.ops.rom import rom_sweep_refined
    for (n, lo, hi) in [(6, -4, -2), (12, -4, -2), (8, -3, -2)]:
        tabs = lanes(base, n, lo, hi)
        out = rom_sweep_refined(scase, hier, tabs, tol=1e-8,
                                store_w=False, verbose=True)
        print(f"single-dev L={n} range 1e{lo}..1e{hi}: "
              f"n_full={out['n_full']} n_polish={out.get('n_polish')} "
              f"converged={out['converged']} "
              f"max_res={out['residual'].max():.2e}")

    from pelvistim_fem_tpu.parallel.rom_shard import \
        rom_sweep_refined_sharded
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("x",))
    for (n, lo, hi) in [(6, -4, -2)]:
        tabs = lanes(base, n, lo, hi)
        out = rom_sweep_refined_sharded(scase, hier, tabs, mesh,
                                        tol=1e-8, verbose=True)
        print(f"sharded   L={n} range 1e{lo}..1e{hi}: "
              f"n_full={out['n_full']} "
              f"n_polish={out.get('n_polish', 'N/A')} "
              f"converged={out['converged']} "
              f"max_res={out['residual'].max():.2e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""TPU timing probes for the round-3b additions (run when the axon
tunnel is back; CPU-correctness is already covered by tests/).

1. Pulse harmonic batch at step04 full resolution: wall for ~129
   certified complex solves as ONE vmapped batch (the quantity behind
   run_impedance --pulse / run_pelvis --pulse).
2. Stencil-path CEM at megatet (1.75M-tet ankle) scale: certified
   solve wall + iterations vs the meshed-contact MG solve (the
   preconditioner approximates the grounded patch as Dirichlet — watch
   the iteration count for degradation).
3. Lapicque threshold convergence in the harmonic cutoff on the
   full-res pelvis (128 vs 256: expect <1%).

Timing hygiene per CLAUDE.md: force completion with a SINGLE-ELEMENT
scalar readback; ignore the first (remote-compile) call.
"""

import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def probe_pulse_batch():
    from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                                   build_pressure_spec)
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.waveform import (biphasic_pulse_samples,
                                                pulse_response)

    spec, params = build_pressure_spec(coarse=False)
    scase, hier = assemble_lattice(spec, jnp.float64)
    case, _ = build_pressure_case(coarse=False, to_device=False)
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w = (act / act.sum() - ret / ret.sum())[None, :]
    epsr = np.zeros(spec.n_bodies + 1)
    epsr[3] = 3.0e4
    epsr[4] = 5.0e6
    epsr[5] = 5.0e6
    t, i = biphasic_pulse_samples(10e-3, 5e-3, 0.2e-3, n_samples=4096)

    for trial in range(2):
        t0 = time.perf_counter()
        res = pulse_response(scase, hier, i, 10e-3, w,
                             epsr_table=jnp.asarray(epsr), n_harm=128,
                             tol=1e-8)
        wall = time.perf_counter() - t0
        k = len(res["active_harmonics"])
        print(f"  pulse batch trial {trial}: {k} certified harmonic "
              f"solves in {wall:.2f} s ({k * 60 / wall:.0f}/min), max "
              f"true residual {res['residual'].max():.1e}")


def probe_stencil_cem_megatet():
    from pelvistim_fem_tpu.models.ankle import build_layered_spec
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.cem import (cem_weights_from_bcids,
                                           solve_stencil_cem_refined,
                                           stencil_cem_setup)
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.multigrid import solve_stencil_mg_refined
    from pelvistim_fem_tpu.ops.stencil import stencil_host_data
    from pelvistim_fem_tpu.utils.config import default_params

    # megatet ankle lattice (the bench.py geometry)
    params = default_params("step03_ankle_layers")
    from pelvistim_fem_tpu.models.ankle import build_layered_case
    case, _, mesh = build_layered_case(params, elec_r=10e-3,
                                       coarse=False, with_mesh=True,
                                       dtype=jnp.float64)
    hd = stencil_host_data(case, mesh)
    from pelvistim_fem_tpu.ops.stencil import build_stencil_case
    sc = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd)
    W = cem_weights_from_bcids(case)
    Wg, present, hier = stencil_cem_setup(hd, W, ground=1)
    z = jnp.asarray([0.01, 0.002])
    I = jnp.asarray([5e-3, 0.0])

    for trial in range(2):
        t0 = time.perf_counter()
        res = solve_stencil_cem_refined(sc, hier, Wg, present, z, I,
                                        ground=1, tol=1e-8)
        float(np.asarray(res.residual))
        wall = time.perf_counter() - t0
        print(f"  stencil CEM trial {trial}: {wall:.2f} s, "
              f"{int(np.asarray(res.iterations))} inner iters, true "
              f"residual {float(np.asarray(res.residual)):.1e}")

    from pelvistim_fem_tpu.ops.multigrid import build_hierarchy
    hier_bc = build_hierarchy(hd, dtype=jnp.float64)
    for trial in range(2):
        t0 = time.perf_counter()
        ref = solve_stencil_mg_refined(sc, hier_bc, tol=1e-8)
        float(np.asarray(ref.residual))
        wall = time.perf_counter() - t0
        print(f"  meshed-BC MG trial {trial}: {wall:.2f} s, "
              f"{int(np.asarray(ref.iterations))} inner iters")


if __name__ == "__main__":
    print("devices:", jax.devices())
    print("== pulse harmonic batch (step04 full-res)")
    probe_pulse_batch()
    print("== stencil CEM vs meshed-BC MG (megatet ankle)")
    probe_stencil_cem_megatet()

"""Timing harness for the round-3 physics additions (run on real TPU).

Measures, at full step04 resolution (~172k tets / 32k nodes):
  1. EQS impedance spectrum (11 certified complex COCG solves, one
     vmapped batch) — constant-epsr and Cole-Cole dispersive forms;
  2. the vmapped steady Pennes batch (16 lanes incl. baseline);
  3. the pelvis default-resolution sharded recruitment sweep leg.

All timings force completion with single-element scalar readbacks
(CLAUDE.md measurement hygiene); first calls are compile-excluded.
CPU-runnable for correctness (JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pelvistim_fem_tpu.mesh import core  # noqa: E402
from pelvistim_fem_tpu.models.pressure import (  # noqa: E402
    build_pressure_case, build_pressure_spec)
from pelvistim_fem_tpu.ops.bc import electrode_node_masks  # noqa: E402
from pelvistim_fem_tpu.ops.bioheat import (  # noqa: E402
    DEFAULT_K, DEFAULT_PERFUSION, build_bioheat_case, solve_bioheat,
    thermal_tables)
from pelvistim_fem_tpu.ops.eqs import (  # noqa: E402
    dispersive_tables, impedance_spectrum, impedance_spectrum_tables)
from pelvistim_fem_tpu.ops.fields import cell_power_density  # noqa: E402
from pelvistim_fem_tpu.ops.lattice_assembly import \
    assemble_lattice  # noqa: E402
from pelvistim_fem_tpu.ops.multigrid import \
    batched_mg_solve_refined  # noqa: E402


def main(full=True):
    spec, params = build_pressure_spec(coarse=not full)
    scase, hier = assemble_lattice(spec, jnp.float64)
    case_host, _ = build_pressure_case(coarse=not full,
                                       dtype=jnp.float32,
                                       to_device=False)
    case = jax.device_put(case_host)
    act, ret = electrode_node_masks(np.asarray(case_host.faces),
                                    np.asarray(case_host.face_bcid),
                                    case_host.n_nodes)
    w_act, w_ret = act / act.sum(), ret / ret.sum()
    n_b = spec.n_bodies
    base = np.asarray(spec.sigma_table)

    # 1) EQS spectra
    epsr = np.zeros(n_b + 1)
    epsr[core.BODY_CONTACT_ACTIVE] = 5e6
    epsr[core.BODY_CONTACT_RETURN] = 5e6
    freqs = np.logspace(0, 5, 11)
    for name, run in (
        ("eqs_const_epsr", lambda: impedance_spectrum(
            scase, hier, jnp.asarray(epsr), freqs, w_act=w_act,
            w_ret=w_ret, tol=1e-8)),
        # NB the solver APIs take ki FIRST (kr defaults to the static
        # sigma table) — unpack KappaTables by name
        ("eqs_dispersive", lambda: (lambda t: impedance_spectrum_tables(
            scase, hier, t.ki, t.kr, freqs, w_act=w_act, w_ret=w_ret,
            tol=1e-8))(dispersive_tables(freqs, base, {
                core.BODY_MUSCLE: (base[core.BODY_MUSCLE], 1e3,
                                   [(2e5, 3e-4, 0.1)]),
                core.BODY_CONTACT_ACTIVE: (
                    base[core.BODY_CONTACT_ACTIVE], 1e3,
                    [(5e6, 1e-3, 0.2)]),
                core.BODY_CONTACT_RETURN: (
                    base[core.BODY_CONTACT_RETURN], 1e3,
                    [(5e6, 1e-3, 0.2)]),
            }))),
    ):
        sp = run()                      # compile
        t0 = time.perf_counter()
        sp = run()
        dt = time.perf_counter() - t0
        assert sp["converged"].all(), name
        print(f"{name:>16}: {len(freqs)} certified complex solves "
              f"{dt:.3f} s ({len(freqs)*60/dt:.0f}/min), max res "
              f"{sp['residual'].max():.1e}, |Z| {sp['Z_abs'][0]:.0f}"
              f" -> {sp['Z_abs'][-1]:.0f} ohm")

    # 2) steady Pennes batch (Joule-sourced from a real sweep)
    sweep = params["pressure_sweep"]["sigma_contact_Spm"]
    tables = np.tile(base, (len(sweep), 1))
    tables[:, core.BODY_CONTACT_ACTIVE] = sweep
    tables[:, core.BODY_CONTACT_RETURN] = sweep
    tables = jnp.asarray(tables, jnp.float64)
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    kt, pt = thermal_tables(
        n_b,
        {core.BODY_MUSCLE: DEFAULT_K["muscle"],
         core.BODY_FAT: DEFAULT_K["fat"],
         core.BODY_SKIN: DEFAULT_K["skin"],
         core.BODY_CONTACT_ACTIVE: DEFAULT_K["contact"],
         core.BODY_CONTACT_RETURN: DEFAULT_K["contact"]},
        {core.BODY_MUSCLE: DEFAULT_PERFUSION["muscle"],
         core.BODY_FAT: DEFAULT_PERFUSION["fat"],
         core.BODY_SKIN: DEFAULT_PERFUSION["skin"],
         core.BODY_CONTACT_ACTIVE: 0.0, core.BODY_CONTACT_RETURN: 0.0})
    bh = build_bioheat_case(case_host, kt, pt)
    phis32 = out.phi.astype(jnp.float32)
    tabs32 = tables.astype(jnp.float32)

    def pennes():
        q = jax.vmap(lambda p, s: cell_power_density(case, p, s)
                     * 2e-3)(phis32, tabs32)
        q = jnp.concatenate([jnp.zeros_like(q[:1]), q], axis=0)
        Ts = jax.vmap(lambda qc: solve_bioheat(case, bh, qc,
                                               tol=3e-6).phi)(q)
        return float(np.asarray(Ts[1, 0]))

    pennes()                            # compile
    t0 = time.perf_counter()
    pennes()
    dt = time.perf_counter() - t0
    print(f"{'pennes_batch':>16}: {len(sweep)+1} solves {dt:.3f} s "
          f"({(len(sweep)+1)*60/dt:.0f}/min)")


if __name__ == "__main__":
    main(full="--coarse" not in sys.argv)

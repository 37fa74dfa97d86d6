"""Re-derive the PARITY.md step03 anchor table (round-4 VERDICT items
2+8): the full-res fat=5mm / r=10mm case at the certified 1e-8
contract, on (a) the shipping lattice, (b) the rim-refined lattice, and
(c) after N local-bisection cycles — printing exactly the metrics the
PARITY table cites (reference values: step03_ankle_layers/results/
summary.csv:6).

Run (CPU or TPU): python dev/parity_anchor.py [--cycles N]
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pelvistim_fem_tpu.models.ankle import build_layered_case  # noqa: E402
from pelvistim_fem_tpu.ops.metrics import extract_results  # noqa: E402
from pelvistim_fem_tpu.runner import solve_auto  # noqa: E402
from pelvistim_fem_tpu.utils.config import default_params  # noqa: E402

REF = dict(compliance_V=44.99, total_current_mA=5.27, flux_err=0.00883,
           roi_mean_E=50.73, peak_J_skin_no_elec=33.228)


def report(tag, case, mesh, phi, p):
    row = extract_results(case, phi, p, verbose=False)
    i_tot = row.get("total_current_A", row.get("I_active", float("nan")))
    print(f"{tag}: {case.n_tets:,} tets")
    for k, ours, ref in (
            ("compliance_V", row["compliance_V"], REF["compliance_V"]),
            ("total_current_mA", i_tot * 1e3, REF["total_current_mA"]),
            ("flux_err", row["flux_err"], REF["flux_err"]),
            ("roi_mean_E", row["roi_mean_E"], REF["roi_mean_E"]),
            ("roi_mean_E_p1", row.get("roi_mean_E_p1"), None),
            ("peak_J_skin_no_elec", row["peak_J_skin_no_elec"],
             REF["peak_J_skin_no_elec"])):
        extra = "" if ref is None else \
            f"   (ref {ref}, d {100*(ours-ref)/ref:+.1f}%)"
        print(f"   {k:22s} {ours:10.4f}{extra}")
    return row


def main():
    cycles = 0
    if "--cycles" in sys.argv:
        cycles = int(sys.argv[sys.argv.index("--cycles") + 1])

    p = default_params("step03_ankle_layers")
    for tag, rim in (("base lattice", 0.0), ("rim-refined (x2 bands)", 2.0)):
        p2 = default_params("step03_ankle_layers")
        p2.setdefault("mesh", {})["rim_refine"] = rim
        t0 = time.perf_counter()
        case, _, mesh = build_layered_case(p2, t_fat=0.005, elec_r=0.010,
                                           coarse=False,
                                           dtype=jnp.float64,
                                           with_mesh=True)
        res = solve_auto(case, mesh, tol=1e-8)
        assert bool(np.asarray(res.converged))
        assert float(np.asarray(res.residual)) <= 1e-8
        report(tag, case, mesh, res.phi, p2)
        print(f"   ({time.perf_counter()-t0:.1f} s)", flush=True)

    if cycles:
        from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe
        from pelvistim_fem_tpu.mesh.refine import (BisectionMesh,
                                                   mark_doerfler)
        from pelvistim_fem_tpu.models.ankle import layered_model_inputs
        from pelvistim_fem_tpu.models.case import build_case
        from pelvistim_fem_tpu.ops.estimate import zz_error_indicators
        (Lx, Ly, Lz), rk, sig, bck, meta, p = layered_model_inputs(
            default_params("step03_ankle_layers"), t_fat=0.005,
            elec_r=0.010, coarse=False)
        bm = BisectionMesh.from_recipe(
            layered_slab_recipe(Lx, Ly, Lz, **rk))
        for c in range(cycles + 1):
            mesh = bm.mesh()
            case = build_case(mesh, sig, meta_extra=meta,
                              dtype=jnp.float64, **bck)
            res = solve_auto(case, mesh, tol=1e-8)
            assert bool(np.asarray(res.converged))
            if c == cycles:
                report(f"bisection cycle {c}", case, mesh, res.phi, p)
            else:
                eta = np.asarray(zz_error_indicators(case, res.phi))
                bm = bm.refine(mark_doerfler(eta, theta=0.5))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Cross-validate an exported Elmer case against this framework.

Consumes the case directories written by `run_step03.py --export-elmer`
(elmer_mesh/ + case.sif + results/) and, when an ElmerSolver result VTU
is present (any encoding ElmerSolver emits — ascii, inline binary, or
appended raw/base64 with zlib), diffs its fields against our solve of
the SAME mesh:

  * potential: relative L2 over all nodes
  * nodal 'volume current': relative L2 of |J|
  * the full step03 metric dict computed from BOTH fields side by side

Without a reference VTU it solves the case and writes our solution VTU
into results/ so ElmerSolver output can be diffed later (externally or
by re-running this tool).

Usage:
  python apps/crossval_elmer.py CASE_DIR [--vtu RESULT.vtu]
                                [--params YAML] [--tol 1e-8]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

import jax

# x64 so the solve reaches the full 1e-8 contract
jax.config.update("jax_enable_x64", True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("case_dir")
    ap.add_argument("--vtu", default=None,
                    help="ElmerSolver result VTU (default: first *.vtu "
                         "under CASE_DIR/results/)")
    ap.add_argument("--params", default=None)
    ap.add_argument("--tol", type=float, default=1e-8)
    args = ap.parse_args()

    from pelvistim_fem_tpu import runner
    from pelvistim_fem_tpu.models.imported import build_imported_case
    from pelvistim_fem_tpu.mesh.io_elmer import read_elmer_mesh
    from pelvistim_fem_tpu.ops import fields
    from pelvistim_fem_tpu.ops.metrics import extract_results
    from pelvistim_fem_tpu.utils.config import default_params, load_params
    from pelvistim_fem_tpu.utils.vtu import read_vtu, write_solution_vtu

    case_dir = Path(args.case_dir)
    mesh_dir = case_dir / "elmer_mesh"
    if not mesh_dir.is_dir():
        raise SystemExit(f"{mesh_dir} not found (expected an "
                         f"--export-elmer case directory)")
    params = (load_params(args.params) if args.params
              else default_params("step03_ankle_layers"))

    mesh = read_elmer_mesh(mesh_dir).with_positive_volumes()
    case = build_imported_case(mesh, params,
                               dtype=runner.preferred_dtype())
    res = runner.solve_auto(case, mesh=None, tol=args.tol)
    row = extract_results(case, res.phi, params, verbose=False)
    print(f"  ours: compliance_V={row['compliance_V']:.3f}  "
          f"roi_mean_E={row['roi_mean_E']:.3f}  "
          f"I={row['total_current_A']:.4e}")

    vtu_path = Path(args.vtu) if args.vtu else next(
        iter(sorted((case_dir / "results").glob("*.vtu"))), None)
    if vtu_path is None or not vtu_path.exists():
        out = case_dir / "results" / "ours.vtu"
        write_solution_vtu(out, mesh, case, res.phi)
        print(f"  no reference VTU found — wrote {out} for external "
              f"comparison (re-run with --vtu once ElmerSolver output "
              f"exists)")
        return 0

    pts, pdata, *_ = read_vtu(vtu_path)
    pot_key = next((k for k in pdata
                    if k.lower() in ("potential", "phi")), None)
    if pot_key is None:
        raise SystemExit(f"{vtu_path} has no potential array "
                         f"(found: {sorted(pdata)})")
    # ElmerSolver preserves the mesh-DB node ordering; if the VTU's
    # points are permuted, match by lexicographic coordinate order
    # (identical point sets up to permutation).
    if pts.shape[0] != mesh.n_nodes:
        raise SystemExit(f"node count mismatch: VTU {pts.shape[0]} vs "
                         f"mesh {mesh.n_nodes}")
    if np.allclose(pts, mesh.nodes, atol=1e-9):
        order = np.arange(mesh.n_nodes)
    else:
        ref_order = np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))
        our_order = np.lexsort((mesh.nodes[:, 2], mesh.nodes[:, 1],
                                mesh.nodes[:, 0]))
        order = np.empty(mesh.n_nodes, np.int64)
        order[our_order] = ref_order
        if not np.allclose(pts[order], mesh.nodes, atol=1e-8):
            raise SystemExit("VTU points do not match the mesh nodes")
    phi_ref = np.asarray(pdata[pot_key])[order]
    phi = np.asarray(res.phi)
    # the potential is defined up to the reference's ground convention;
    # both pipelines ground the return electrode, so compare directly
    rel_phi = (np.linalg.norm(phi - phi_ref)
               / max(np.linalg.norm(phi_ref), 1e-300))
    print(f"  potential rel-L2 vs {vtu_path.name}: {rel_phi:.3e}")

    out = {"potential_rel_l2": rel_phi}
    jkey = next((k for k in pdata
                 if "volume current" in k.lower()), None)
    if jkey is not None:
        J_ref = np.asarray(pdata[jkey])[order]
        Jn = np.asarray(fields.nodal_average(
            case, fields.cell_J(case, res.phi)))
        num = np.linalg.norm(
            np.linalg.norm(Jn, axis=1) - np.linalg.norm(J_ref, axis=1))
        den = max(np.linalg.norm(np.linalg.norm(J_ref, axis=1)), 1e-300)
        out["Jmag_rel_l2"] = num / den
        print(f"  |J| rel-L2: {out['Jmag_rel_l2']:.3e}")
    ok = rel_phi < 0.02
    print("  CROSSVAL", "PASS" if ok else "FAIL",
          "(gate: potential rel-L2 < 2%)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

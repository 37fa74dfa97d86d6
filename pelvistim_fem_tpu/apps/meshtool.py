#!/usr/bin/env python3
"""Mesh interchange & inspection tool — the framework's ElmerGrid/
find_boundaries equivalent as a CLI.

Replaces the reference's external conversion step (`ElmerGrid 14 2
mesh.msh -out elmer_mesh`, step01_box/test_step01_baseline.py:49) and its
boundary reconstruction script (step01_box/find_boundaries.py): convert
between Gmsh .msh, Elmer mesh DB and VTU, rebuild boundary faces
topologically, classify BCs, and print mesh statistics.

Usage:
  python apps/meshtool.py convert IN OUT      # by extension/dirness
  python apps/meshtool.py inspect IN
  python apps/meshtool.py boundaries IN OUT   # rebuild + classify BCs
  python apps/meshtool.py solve IN [--params Y] [--out D] [--vtu]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

import jax

# x64 so `solve` reaches the full 1e-8 contract (f32-only clamps to 1e-6)
jax.config.update("jax_enable_x64", True)


def _read(path):
    from pelvistim_fem_tpu.models.imported import read_mesh_any
    try:
        return read_mesh_any(path)
    except ValueError as e:
        raise SystemExit(str(e))


def _write(mesh, path):
    from pelvistim_fem_tpu.mesh.io_elmer import write_elmer_mesh
    from pelvistim_fem_tpu.mesh.io_msh import write_msh2
    from pelvistim_fem_tpu.utils.vtu import write_vtu
    p = Path(path)
    if p.suffix == ".msh":
        write_msh2(mesh, p)
    elif p.suffix == ".vtu":
        write_vtu(p, mesh, cell_data={
            "GeometryIds": np.concatenate(
                [mesh.tet_body, mesh.face_bcid + 100]).astype(np.int32)},
            include_boundary=True)
    else:
        write_elmer_mesh(mesh, p)
    print(f"wrote {p}")


def cmd_convert(args):
    _write(_read(args.input), args.output)


def cmd_inspect(args):
    m = _read(args.input)
    m.validate()
    from pelvistim_fem_tpu.mesh.core import tet_volumes
    vols = tet_volumes(m.nodes, m.tets)
    areas, _ = m.face_areas_normals()
    bb = np.vstack([m.nodes.min(0), m.nodes.max(0)])
    print(f"nodes     : {m.n_nodes}")
    print(f"tets      : {m.n_tets}   (vol {vols.sum():.6e} m^3, "
          f"min/mean {vols.min()/vols.mean():.2e})")
    print(f"boundary  : {m.n_faces} faces, area {areas.sum():.6e} m^2")
    print(f"bbox      : {bb[0].tolist()} .. {bb[1].tolist()}")
    print(f"bodies    : "
          + ", ".join(f"{b}: {int((m.tet_body == b).sum())} tets"
                      for b in np.unique(m.tet_body)))
    print(f"bc ids    : "
          + ", ".join(f"{b}: {int((m.face_bcid == b).sum())} faces "
                      f"({areas[m.face_bcid == b].sum()*1e4:.3f} cm2)"
                      for b in np.unique(m.face_bcid)))
    from pelvistim_fem_tpu.mesh.core import tet_quality
    q = tet_quality(m.nodes, m.tets)
    rr, dh = q["radius_ratio"], q["min_dihedral"]
    n_sliver = int((rr < 0.1).sum())
    print(f"quality   : radius ratio min/median {rr.min():.3f}/"
          f"{np.median(rr):.3f} (1 = regular), min dihedral "
          f"{dh.min():.1f} deg"
          + (f"  WARNING: {n_sliver} slivers (ratio < 0.1)"
             if n_sliver else ""))


def cmd_boundaries(args):
    """Rebuild the boundary topologically (faces in exactly one tet) and
    classify flat z-extremes — the find_boundaries.py behavior."""
    import dataclasses

    from pelvistim_fem_tpu.mesh.boundary import (classify_flat_extremes,
                                                 extract_boundary)
    m = _read(args.input)
    faces, parent = extract_boundary(m.tets)
    bcid = classify_flat_extremes(m.nodes, faces)
    m2 = dataclasses.replace(m, faces=faces, face_bcid=bcid,
                             face_parent=parent)
    print(f"rebuilt {len(faces)} boundary faces; "
          f"top {int((bcid == 1).sum())}, bottom {int((bcid == 2).sum())},"
          f" sides {int((bcid == 3).sum())}")
    _write(m2, args.output)


def cmd_solve(args):
    """End-to-end on an IMPORTED mesh: detect electrode BCs, assemble,
    solve to the full reference tolerance, extract the step03 metric
    dict — the framework's equivalent of the reference's
    arbitrary-Gmsh-mesh pipeline (run_layered_sweep.py:366-455,
    826-1030)."""
    import json

    from pelvistim_fem_tpu.models.imported import solve_imported
    from pelvistim_fem_tpu.utils.config import default_params, load_params
    params = (load_params(args.params) if args.params
              else default_params("step03_ankle_layers"))

    if args.cem:
        # complete-electrode-model path: contact impedance as a thin
        # Robin interface (ops/cem.py) on the detected electrode
        # patches — no meshed gel, floating electrode potentials
        import jax.numpy as jnp

        from pelvistim_fem_tpu.models.imported import (build_imported_case,
                                                       read_mesh_any)
        from pelvistim_fem_tpu.ops.cem import (cem_weights_from_bcids,
                                               solve_case_cem)
        from pelvistim_fem_tpu.utils.config import get_stim
        z_act, z_ret = (float(v) for v in args.cem.split(","))
        mesh = read_mesh_any(args.input).with_positive_volumes()
        case, mesh = build_imported_case(mesh, params, with_mesh=True)
        I = get_stim(params).get("injected_current_mA", 5.0) * 1e-3
        W = cem_weights_from_bcids(case)
        res = solve_case_cem(case, W, jnp.asarray([z_act, z_ret]),
                             jnp.asarray([I, 0.0]), ground=1,
                             tol=args.tol)
        U = np.asarray(res.U); Iv = np.asarray(res.I)
        row = {"mode": "cem", "z_act_ohm_m2": z_act,
               "z_ret_ohm_m2": z_ret, "I_A": I,
               "U_act_V": float(U[0]), "U_ret_V": float(U[1]),
               "Z_total_ohm": float(U[0] / I),
               "I_recovered_A": Iv.tolist(),
               "iterations": int(np.asarray(res.iterations)),
               "residual": float(np.asarray(res.residual)),
               "converged": bool(np.asarray(res.converged))}
        print(f"CEM: U_act {row['U_act_V']:.3f} V, Z_total "
              f"{row['Z_total_ohm']:.1f} ohm, {row['iterations']} "
              f"iters, residual {row['residual']:.1e}")
    else:
        case, res, row, mesh = solve_imported(args.input, params,
                                              tol=args.tol)
        if args.estimate:
            # ZZ a-posteriori error: the mesh-accuracy number the
            # reference's flux banner cannot provide (ops/estimate.py)
            from pelvistim_fem_tpu.ops.estimate import (
                zz_error_indicators, zz_global_error)
            eta = np.asarray(zz_error_indicators(case, res.phi))
            eta_g, rel = (float(v) for v in
                          zz_global_error(case, res.phi))
            body = np.asarray(case.tet_body)
            per = np.sqrt(np.bincount(body, weights=eta ** 2))
            row["zz_error_energy"] = eta_g
            row["zz_error_rel"] = rel
            row["zz_error_per_body"] = per.tolist()
            print(f"ZZ estimated energy error {eta_g:.3e} "
                  f"({rel:.2%} of solution energy norm); per body: "
                  + ", ".join(f"b{b}={v:.2e}"
                              for b, v in enumerate(per) if v > 0))
    out = Path(args.out or ".")
    out.mkdir(parents=True, exist_ok=True)
    clean = {k: (None if isinstance(v, float) and not np.isfinite(v)
                 else v) for k, v in row.items()}
    (out / "summary.json").write_text(json.dumps(clean, indent=1))
    print(f"wrote {out / 'summary.json'}")
    if args.vtu:
        from pelvistim_fem_tpu.utils.vtu import write_solution_vtu
        # the mesh the solution was computed on (oriented), not a
        # second parse of the input
        write_solution_vtu(out / "solution.vtu", mesh, case, res.phi)
        print(f"wrote {out / 'solution.vtu'}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert"); c.add_argument("input")
    c.add_argument("output"); c.set_defaults(fn=cmd_convert)
    c = sub.add_parser("inspect"); c.add_argument("input")
    c.set_defaults(fn=cmd_inspect)
    c = sub.add_parser("boundaries"); c.add_argument("input")
    c.add_argument("output"); c.set_defaults(fn=cmd_boundaries)
    c = sub.add_parser("solve"); c.add_argument("input")
    c.add_argument("--params", default=None,
                   help="params yaml (default: bundled step03)")
    c.add_argument("--out", default=None)
    c.add_argument("--tol", type=float, default=1e-8)
    c.add_argument("--vtu", action="store_true",
                   help="also write solution.vtu")
    c.add_argument("--estimate", action="store_true",
                   help="ZZ a-posteriori energy-error estimate "
                   "(global + per body) on the solved field")
    c.add_argument("--cem", default=None, metavar="Z_ACT,Z_RET",
                   help="solve the complete electrode model with these "
                        "contact impedances [ohm m^2] on the detected "
                        "electrode patches (ops/cem.py) instead of the "
                        "meshed-BC problem")
    c.set_defaults(fn=cmd_solve)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

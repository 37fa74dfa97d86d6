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
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _read(path):
    from pelvistim_fem_tpu.mesh.io_elmer import read_elmer_mesh
    from pelvistim_fem_tpu.mesh.io_msh import read_msh
    p = Path(path)
    if p.is_dir():
        return read_elmer_mesh(p)
    if p.suffix == ".msh":
        return read_msh(p)
    raise SystemExit(f"cannot read {p} (expect .msh file or Elmer dir)")


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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert"); c.add_argument("input")
    c.add_argument("output"); c.set_defaults(fn=cmd_convert)
    c = sub.add_parser("inspect"); c.add_argument("input")
    c.set_defaults(fn=cmd_inspect)
    c = sub.add_parser("boundaries"); c.add_argument("input")
    c.add_argument("output"); c.set_defaults(fn=cmd_boundaries)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

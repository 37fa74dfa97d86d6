"""Minimal VTU (VTK XML UnstructuredGrid) writer + reader.

The reference's ElmerSolver writes results as VTU with nodal 'Potential'
and 'volume current' arrays plus geometry ids (case.sif Solver 2,
step01_box/case.sif:47-54); all its post-processing and plotting read
that file via pyvista.  This writer emits the same contract so VTU-based
tools (ParaView, pyvista) can consume our solutions; the reader supports
ASCII VTU for round-trips and ingesting reference outputs when present.
"""

from __future__ import annotations

import base64
import re
import struct
from pathlib import Path

import numpy as np

VTK_TETRA = 10
VTK_TRIANGLE = 5


def write_vtu(path, mesh, point_data=None, cell_data=None,
              include_boundary=False):
    """Write a TetMesh + nodal/cell arrays as ASCII VTU.

    point_data: {name: (N,) or (N, 3) array}; Elmer-parity names are
    'potential' and 'volume current'.  include_boundary embeds the
    boundary tri cells after the tets (VTK type 5 after 10) the way the
    reference relies on for its flux integrals (compute_injected_current
    uses only type-5/9 cells, step03 run_layered_sweep.py:717-726).
    """
    point_data = point_data or {}
    cell_data = cell_data or {}
    n = mesh.n_nodes

    cells = [np.asarray(mesh.tets)]
    types = [np.full(mesh.n_tets, VTK_TETRA, np.uint8)]
    if include_boundary and mesh.n_faces:
        cells.append(np.asarray(mesh.faces))
        types.append(np.full(mesh.n_faces, VTK_TRIANGLE, np.uint8))
    conn = np.concatenate([c.reshape(-1) for c in cells])
    sizes = np.concatenate([np.full(len(c), c.shape[1]) for c in cells])
    offsets = np.cumsum(sizes)
    types = np.concatenate(types)
    ncells = types.size

    def arr_text(a, fmt="%.10g"):
        a = np.asarray(a)
        return "\n".join(" ".join(fmt % v for v in np.atleast_1d(row))
                         for row in a)

    parts = ['<?xml version="1.0"?>',
             '<VTKFile type="UnstructuredGrid" version="0.1" '
             'byte_order="LittleEndian">',
             '<UnstructuredGrid>',
             f'<Piece NumberOfPoints="{n}" NumberOfCells="{ncells}">']

    parts.append("<PointData>")
    for name, a in point_data.items():
        a = np.asarray(a)
        ncomp = 1 if a.ndim == 1 else a.shape[1]
        parts.append(f'<DataArray type="Float64" Name="{name}" '
                     f'NumberOfComponents="{ncomp}" format="ascii">')
        parts.append(arr_text(a))
        parts.append("</DataArray>")
    parts.append("</PointData>")

    parts.append("<CellData>")
    for name, a in cell_data.items():
        a = np.asarray(a)
        if a.shape[0] != ncells:
            pad = np.zeros(ncells - a.shape[0], a.dtype)
            a = np.concatenate([a, pad])
        ncomp = 1 if a.ndim == 1 else a.shape[1]
        dt = "Int32" if np.issubdtype(a.dtype, np.integer) else "Float64"
        parts.append(f'<DataArray type="{dt}" Name="{name}" '
                     f'NumberOfComponents="{ncomp}" format="ascii">')
        parts.append(arr_text(a, "%d" if dt == "Int32" else "%.10g"))
        parts.append("</DataArray>")
    parts.append("</CellData>")

    parts.append("<Points>")
    parts.append('<DataArray type="Float64" NumberOfComponents="3" '
                 'format="ascii">')
    parts.append(arr_text(mesh.nodes))
    parts.append("</DataArray></Points>")

    parts.append("<Cells>")
    parts.append('<DataArray type="Int64" Name="connectivity" '
                 'format="ascii">')
    parts.append(" ".join(map(str, conn)))
    parts.append("</DataArray>")
    parts.append('<DataArray type="Int64" Name="offsets" format="ascii">')
    parts.append(" ".join(map(str, offsets)))
    parts.append("</DataArray>")
    parts.append('<DataArray type="UInt8" Name="types" format="ascii">')
    parts.append(" ".join(map(str, types)))
    parts.append("</DataArray>")
    parts.append("</Cells></Piece></UnstructuredGrid></VTKFile>")

    Path(path).write_text("\n".join(parts))


def write_solution_vtu(path, mesh, case, phi, sigma_table=None):
    """Solution VTU with the reference's array contract: nodal
    'potential' + 'volume current' (+ per-cell body/GeometryIds)."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops import fields
    phi = jnp.asarray(phi)
    Jn = np.asarray(fields.nodal_average(
        case, fields.cell_J(case, phi, sigma_table)))
    write_vtu(path, mesh,
              point_data={"potential": np.asarray(phi, np.float64),
                          "volume current": Jn.astype(np.float64)},
              cell_data={"GeometryIds": np.concatenate(
                  [np.asarray(mesh.tet_body),
                   np.asarray(mesh.face_bcid) + 100]).astype(np.int32)},
              include_boundary=True)


_DA_RE = re.compile(r"<DataArray(?P<attrs>[^>]*)>(?P<body>.*?)</DataArray>",
                    re.S)


def _attr(attrs, key, default=None):
    m = re.search(rf'{key}="([^"]*)"', attrs)
    return m.group(1) if m else default


def read_vtu(path):
    """Parse an ASCII (or inline base64) VTU into
    (points, {point_data}, connectivity, offsets, types, {cell_data}).
    Covers our own writer and ElmerSolver ASCII output."""
    text = Path(path).read_text()
    pm = re.search(r'NumberOfPoints="(\d+)"', text)
    cm = re.search(r'NumberOfCells="(\d+)"', text)
    npts, ncell = int(pm.group(1)), int(cm.group(1))

    pdata_m = re.search(r"<PointData.*?>(.*?)</PointData>", text, re.S)
    cdata_m = re.search(r"<CellData.*?>(.*?)</CellData>", text, re.S)
    pts_m = re.search(r"<Points>(.*?)</Points>", text, re.S)
    cells_m = re.search(r"<Cells>(.*?)</Cells>", text, re.S)

    def parse_block(block_text):
        out = {}
        for m in _DA_RE.finditer(block_text or ""):
            attrs = m.group("attrs")
            name = _attr(attrs, "Name", "Points")
            ncomp = int(_attr(attrs, "NumberOfComponents", "1"))
            fmt = _attr(attrs, "format", "ascii")
            body = m.group("body").strip()
            if fmt == "ascii":
                a = (np.asarray(body.split(), dtype=np.float64) if body
                     else np.empty(0))
            elif fmt == "binary":
                raw = base64.b64decode(body)
                (nbytes,) = struct.unpack("<I", raw[:4])
                dt = {"Float64": "<f8", "Float32": "<f4",
                      "Int64": "<i8", "Int32": "<i4",
                      "UInt8": "u1"}[_attr(attrs, "type", "Float64")]
                a = np.frombuffer(raw[4:4 + nbytes], dtype=dt).astype(
                    np.float64)
            else:
                continue
            if ncomp > 1:
                a = a.reshape(-1, ncomp)
            out[name] = a
        return out

    points = parse_block(pts_m.group(1))
    pts = next(iter(points.values())).reshape(npts, 3) if points else None
    cells = parse_block(cells_m.group(1))
    return (pts, parse_block(pdata_m.group(1) if pdata_m else ""),
            cells.get("connectivity"), cells.get("offsets"),
            cells.get("types"),
            parse_block(cdata_m.group(1) if cdata_m else ""))

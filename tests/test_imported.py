"""Imported-mesh end-to-end pipeline (VERDICT round-1 item 6) and VTU
appended-binary ingestion (item 7).

The reference runs its whole step03 flow on arbitrary Gmsh meshes whose
boundary ids are scrambled by ElmerGrid (run_layered_sweep.py:366-455);
here a generated mesh is written to an Elmer DB with deliberately
remapped bcids, re-read blind (no lattice provenance), and driven through
detect -> build -> refined solve -> extract_results.  Metrics must match
the lattice fast path.
"""

import dataclasses

import numpy as np
import pytest

from pelvistim_fem_tpu.mesh.io_elmer import write_elmer_mesh
from pelvistim_fem_tpu.models.ankle import build_layered_case
from pelvistim_fem_tpu.models.imported import (build_imported_case,
                                               solve_imported)
from pelvistim_fem_tpu.ops.metrics import extract_results
from pelvistim_fem_tpu.runner import solve_auto
from pelvistim_fem_tpu.utils.config import default_params


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """Coarse step03 case exported to an Elmer DB with SCRAMBLED bcids
    (1->7, 2->9, 3->3) so detection must actually work."""
    params = default_params("step03_ankle_layers")
    case, _, mesh = build_layered_case(params, coarse=True, with_mesh=True)
    scrambled = np.asarray(mesh.face_bcid).copy()
    scrambled[scrambled == 1] = 7
    scrambled[scrambled == 2] = 9
    m2 = dataclasses.replace(mesh, face_bcid=scrambled)
    d = tmp_path_factory.mktemp("imported") / "elmer_mesh"
    write_elmer_mesh(m2, d)
    # lattice-path reference row
    res = solve_auto(case, mesh, tol=1e-8)
    row = extract_results(case, res.phi, params, verbose=False)
    return d, params, row


def test_imported_end_to_end_matches_lattice_path(exported):
    d, params, ref = exported
    case, res, row, _mesh = solve_imported(d, params, tol=1e-8,
                                           verbose=False)
    assert bool(np.asarray(res.converged))
    assert float(np.asarray(res.residual)) <= 1e-8
    # Same mesh, same physics — metrics must agree tightly.  (The solves
    # run on the element vs stencil operators, so agreement is to solver
    # tolerance, not bitwise.)
    for key, rtol in [("compliance_V", 1e-5), ("total_current_A", 1e-5),
                      ("roi_mean_E", 1e-4), ("roi_mean_J", 1e-4),
                      ("peak_J_skin_no_elec", 1e-4),
                      ("elec_area_mesh_cm2", 1e-9)]:
        assert np.isfinite(row[key]), key
        np.testing.assert_allclose(row[key], ref[key], rtol=rtol,
                                   err_msg=key)
    assert row["flux_err_consistent"] < 1e-8
    # current-control contract: delivered current within 2% of target
    assert abs(row["total_current_A"] - 5e-3) / 5e-3 < 0.02


def test_imported_case_detects_scrambled_bcids(exported):
    from pelvistim_fem_tpu.mesh.core import BC_ACTIVE, BC_RETURN
    from pelvistim_fem_tpu.models.imported import read_mesh_any
    d, params, ref = exported
    mesh = read_mesh_any(d)
    assert mesh.lattice is None          # genuinely blind re-read
    case = build_imported_case(mesh, params, verbose=False)
    bcid = np.asarray(case.face_bcid)
    assert (bcid == BC_ACTIVE).any() and (bcid == BC_RETURN).any()
    np.testing.assert_allclose(case.meta.elec_area_mesh * 1e4,
                               ref["elec_area_mesh_cm2"], rtol=1e-9)


# ── VTU appended-format ingestion ────────────────────────────────────────────

def _synth_appended(path, *, encoding, compress, header_type):
    """Synthesize a VTU in the appended format (what ElmerSolver's vtu
    output writes) for a 2-tet mesh with potential + GeometryIds."""
    import base64
    import zlib

    hdt = np.dtype("<u8" if header_type == "UInt64" else "<u4")
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                    [1, 1, 1.0]])
    conn = np.array([0, 1, 2, 3, 1, 2, 3, 4], np.int64)
    offs = np.array([4, 8], np.int64)
    typs = np.array([10, 10], np.uint8)
    pot = np.linspace(0, 1, 5)
    geo = np.array([1, 2], np.int32)

    blocks = []

    def block(a):
        raw = np.ascontiguousarray(a).tobytes()
        off = sum(len(b) for b in blocks)
        if compress:
            cd = zlib.compress(raw)
            head = np.array([1, len(raw), len(raw), len(cd)],
                            hdt).tobytes()
            payload = (head, cd)
        else:
            payload = (np.array([len(raw)], hdt).tobytes(), raw)
        if encoding == "raw":
            blocks.append(b"".join(payload))
        else:
            blocks.append(b"".join(base64.b64encode(p) for p in payload))
        return off

    arrays = [
        ("PointData", "potential", "Float64", 1, pot),
        ("CellData", "GeometryIds", "Int32", 1, geo),
        ("Points", "Points", "Float64", 3, pts),
        ("Cells", "connectivity", "Int64", 1, conn),
        ("Cells", "offsets", "Int64", 1, offs),
        ("Cells", "types", "UInt8", 1, typs),
    ]
    comp = (' compressor="vtkZLibDataCompressor"' if compress else "")
    xml = [f'<VTKFile type="UnstructuredGrid" version="1.0" '
           f'byte_order="LittleEndian" header_type="{header_type}"{comp}>',
           "<UnstructuredGrid>",
           f'<Piece NumberOfPoints="5" NumberOfCells="2">']
    cur = None
    for sec, name, typ, ncomp, a in arrays:
        if sec != cur:
            if cur is not None:
                xml.append(f"</{cur}>")
            xml.append(f"<{sec}>")
            cur = sec
        off = block(a)
        xml.append(f'<DataArray type="{typ}" Name="{name}" '
                   f'NumberOfComponents="{ncomp}" format="appended" '
                   f'offset="{off}"/>')
    xml.append(f"</{cur}>")
    xml.append("</Piece></UnstructuredGrid>")
    body = b"".join(blocks)
    head = "\n".join(xml).encode() + \
        f'\n<AppendedData encoding="{encoding}">\n_'.encode()
    path.write_bytes(head + body + b"\n</AppendedData>\n</VTKFile>\n")
    return pts, pot, geo


@pytest.mark.parametrize("encoding,compress,header_type", [
    ("raw", False, "UInt32"),
    ("raw", True, "UInt64"),
    ("base64", False, "UInt32"),
    ("base64", True, "UInt64"),
])
def test_read_vtu_appended(tmp_path, encoding, compress, header_type):
    from pelvistim_fem_tpu.utils.vtu import read_vtu
    p = tmp_path / f"a_{encoding}_{compress}.vtu"
    pts, pot, geo = _synth_appended(p, encoding=encoding,
                                    compress=compress,
                                    header_type=header_type)
    rpts, pdata, conn, offs, typs, cdata = read_vtu(p)
    np.testing.assert_allclose(rpts, pts)
    np.testing.assert_allclose(pdata["potential"], pot)
    np.testing.assert_array_equal(cdata["GeometryIds"], geo)
    np.testing.assert_array_equal(conn, [0, 1, 2, 3, 1, 2, 3, 4])
    np.testing.assert_array_equal(typs, [10, 10])


def test_read_vtu_mesh_from_solution(tmp_path):
    """Our own solution VTU round-trips into a TetMesh with bodies and
    bcids intact (the cross-validation ingestion path)."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.solve import solve_case
    from pelvistim_fem_tpu.utils.vtu import read_vtu_mesh, write_solution_vtu
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    res = solve_case(case, tol=1e-8, maxiter=30_000)
    write_solution_vtu(tmp_path / "s.vtu", mesh, case, res.phi)
    back = read_vtu_mesh(tmp_path / "s.vtu")
    back.validate()
    np.testing.assert_allclose(back.nodes, mesh.nodes, rtol=1e-9)
    np.testing.assert_array_equal(back.tets, mesh.tets)
    np.testing.assert_array_equal(back.tet_body, mesh.tet_body)
    np.testing.assert_array_equal(back.face_bcid, mesh.face_bcid)


def test_read_vtu_appended_with_xml_declaration(tmp_path):
    """header_type/compressor are attributes of <VTKFile>, which a
    leading '<?xml ...?>' declaration must not shadow."""
    from pelvistim_fem_tpu.utils.vtu import read_vtu
    p = tmp_path / "decl.vtu"
    pts, pot, geo = _synth_appended(p, encoding="raw", compress=True,
                                    header_type="UInt64")
    p.write_bytes(b'<?xml version="1.0"?>\n' + p.read_bytes())
    rpts, pdata, conn, *_ = read_vtu(p)
    np.testing.assert_allclose(rpts, pts)
    np.testing.assert_allclose(pdata["potential"], pot)

"""Mesh interchange round-trips (Elmer DB / Gmsh .msh / VTU) and
imported-mesh boundary identification."""

import numpy as np
import pytest

from pelvistim_fem_tpu.mesh.boundary import (classify_flat_extremes,
                                             detect_electrode_bcids)
from pelvistim_fem_tpu.mesh.generate import box_mesh, layered_slab_mesh
from pelvistim_fem_tpu.mesh.io_elmer import (read_elmer_mesh,
                                             write_elmer_mesh)
from pelvistim_fem_tpu.mesh.io_msh import read_msh, write_msh2


@pytest.fixture(scope="module")
def slab():
    return layered_slab_mesh(
        0.08, 0.06, 0.04,
        layers=[(1, 0.0335, 0.008), (2, 0.005, 0.0025),
                (3, 0.0015, 0.00075)],
        electrodes=[(0.015, 0.045, 0.01), (0.065, 0.045, 0.01)],
        contact_t=0.0005, contact_h_z=0.0005,
        h_fine=0.004, h_coarse=0.008)


def _assert_mesh_equal(a, b, check_bcids=True):
    np.testing.assert_allclose(b.nodes, a.nodes, rtol=1e-12)
    np.testing.assert_array_equal(b.tets, a.tets)
    np.testing.assert_array_equal(b.tet_body, a.tet_body)
    assert b.n_faces == a.n_faces
    if check_bcids:
        np.testing.assert_array_equal(b.face_bcid, a.face_bcid)


def test_elmer_roundtrip(slab, tmp_path):
    write_elmer_mesh(slab, tmp_path / "elmer_mesh")
    back = read_elmer_mesh(tmp_path / "elmer_mesh")
    back.validate()
    _assert_mesh_equal(slab, back)


def test_msh2_roundtrip(slab, tmp_path):
    write_msh2(slab, tmp_path / "mesh.msh")
    back = read_msh(tmp_path / "mesh.msh")
    back.validate()
    _assert_mesh_equal(slab, back)


def test_solution_roundtrip_through_elmer_db(slab, tmp_path):
    """Import the written Elmer DB and confirm the solve matches the
    in-memory mesh's solve — the cross-toolchain validation path."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops.solve import solve_case
    write_elmer_mesh(slab, tmp_path / "elmer_mesh")
    imported = read_elmer_mesh(tmp_path / "elmer_mesh")
    sig = {1: 0.35, 2: 0.04, 3: 1e-3, 4: 5e-3, 5: 5e-3}
    c1 = build_case(slab, sig, mode="current", injected_current_A=5e-3)
    c2 = build_case(imported, sig, mode="current",
                    injected_current_A=5e-3)
    r1 = solve_case(c1, tol=1e-8, maxiter=30_000)
    r2 = solve_case(c2, tol=1e-8, maxiter=30_000)
    np.testing.assert_allclose(np.asarray(r2.phi), np.asarray(r1.phi),
                               rtol=1e-6, atol=1e-8)


def test_vtu_roundtrip(slab, tmp_path):
    from pelvistim_fem_tpu.utils.vtu import read_vtu, write_vtu
    rng = np.random.default_rng(0)
    pot = rng.standard_normal(slab.n_nodes)
    J = rng.standard_normal((slab.n_nodes, 3))
    write_vtu(tmp_path / "case.vtu", slab,
              point_data={"potential": pot, "volume current": J},
              include_boundary=True)
    pts, pdata, conn, offs, types, cdata = read_vtu(tmp_path / "case.vtu")
    np.testing.assert_allclose(pts, slab.nodes, rtol=1e-9)
    np.testing.assert_allclose(pdata["potential"], pot, rtol=1e-9)
    np.testing.assert_allclose(pdata["volume current"], J, rtol=1e-9)
    assert (types == 10).sum() == slab.n_tets
    assert (types == 5).sum() == slab.n_faces


def test_classify_flat_extremes():
    m = box_mesh(0.04, 0.04, 0.02, 0.004)
    bcid = classify_flat_extremes(m.nodes, m.faces)
    np.testing.assert_array_equal(bcid, m.face_bcid)


def test_detect_electrode_bcids_on_imported(slab, tmp_path):
    """Scramble bcids the way an ElmerGrid conversion would renumber
    them, then re-detect which are the electrodes."""
    import dataclasses
    remap = {1: 7, 2: 4, 3: 9}
    scr = dataclasses.replace(
        slab, face_bcid=np.vectorize(remap.get)(slab.face_bcid))
    b1, b2, a1, a2 = detect_electrode_bcids(
        scr, (0.015, 0.045, 0.0405), (0.065, 0.045, 0.0405), 0.01)
    assert (b1, b2) == (7, 4)
    areas, _ = slab.face_areas_normals()
    np.testing.assert_allclose(a1, areas[slab.face_bcid == 1].sum(),
                               rtol=1e-12)
    np.testing.assert_allclose(a2, areas[slab.face_bcid == 2].sum(),
                               rtol=1e-12)

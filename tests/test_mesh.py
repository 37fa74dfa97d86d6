"""Unit tests for the lattice meshers and boundary extraction."""

import numpy as np
import pytest

from pelvistim_fem_tpu.mesh.boundary import extract_boundary
from pelvistim_fem_tpu.mesh.core import tet_volumes
from pelvistim_fem_tpu.mesh.generate import (box_mesh, lattice_tets,
                                             layered_slab_mesh)
from pelvistim_fem_tpu.mesh.grading import graded_axis, layered_z_axis


def test_lattice_volume_partition():
    """Kuhn tets exactly tile the box: volumes sum to Lx*Ly*Lz."""
    xs = np.linspace(0, 2.0, 4)
    ys = np.linspace(0, 1.0, 3)
    zs = np.linspace(0, 0.5, 5)
    nodes, tets = lattice_tets(xs, ys, zs)
    vols = tet_volumes(nodes, tets)
    assert (vols > 0).all()
    np.testing.assert_allclose(vols.sum(), 2.0 * 1.0 * 0.5, rtol=1e-12)


def test_boundary_extraction_closed_surface():
    """External faces form a closed surface: total area = box surface,
    and the divergence theorem holds (sum of n*A = 0)."""
    m = box_mesh(1.0, 2.0, 3.0, 0.5)
    areas, normals = m.face_areas_normals()
    np.testing.assert_allclose(areas.sum(),
                               2 * (1 * 2 + 2 * 3 + 1 * 3), rtol=1e-12)
    np.testing.assert_allclose((normals * areas[:, None]).sum(axis=0),
                               0.0, atol=1e-10)


def test_box_bcid_classification():
    m = box_mesh(0.04, 0.04, 0.02, 0.004)
    areas, normals = m.face_areas_normals()
    for bcid, expected in [(1, 0.04 * 0.04), (2, 0.04 * 0.04)]:
        np.testing.assert_allclose(areas[m.face_bcid == bcid].sum(),
                                   expected, rtol=1e-12)
    # top faces have +z normals, bottom -z
    assert (normals[m.face_bcid == 1, 2] > 0.99).all()
    assert (normals[m.face_bcid == 2, 2] < -0.99).all()


def test_extract_boundary_counts():
    nodes, tets = lattice_tets(np.linspace(0, 1, 3), np.linspace(0, 1, 3),
                               np.linspace(0, 1, 3))
    faces, parent = extract_boundary(tets)
    # every boundary face's nodes must lie on the unit-cube surface
    p = nodes[faces].reshape(-1, 3)
    on_surf = ((np.abs(p) < 1e-12) | (np.abs(p - 1) < 1e-12)).any(axis=1)
    assert on_surf.all()


def test_graded_axis_covers_and_refines():
    xs = graded_axis(0, 0.08, [(0.005, 0.025)], 0.0015, 0.003)
    assert xs[0] == 0 and xs[-1] == 0.08
    assert (np.diff(xs) > 0).all()
    h = np.diff(xs)
    mids = 0.5 * (xs[:-1] + xs[1:])
    inside = (mids > 0.005) & (mids < 0.025)
    assert h[inside].max() <= 0.0015 * 1.01
    # endpoints of the fine region are exact knots
    assert np.min(np.abs(xs - 0.005)) < 1e-12
    assert np.min(np.abs(xs - 0.025)) < 1e-12


def test_layered_z_axis_interfaces_exact():
    zs = layered_z_axis([0.0, 0.0335, 0.0385, 0.04, 0.0405],
                        [0.003, 0.0015, 0.0005, 0.0005])
    for z in (0.0335, 0.0385, 0.04, 0.0405):
        assert np.min(np.abs(zs - z)) < 1e-12


def test_layered_slab_bodies_and_bcs():
    """3-layer slab + contact volumes: body volumes match layer thicknesses,
    BC faces only on contact tops inside the footprints."""
    Lx, Ly, Lz = 0.08, 0.06, 0.04
    t_skin, t_fat = 0.0015, 0.005
    t_muscle = Lz - t_skin - t_fat
    r = 0.01
    m = layered_slab_mesh(
        Lx, Ly, Lz,
        layers=[(1, t_muscle, 0.006), (2, t_fat, 0.0025),
                (3, t_skin, 0.00075)],
        electrodes=[(0.015, 0.045, r), (0.065, 0.045, r)],
        contact_t=0.0005, contact_h_z=0.0005,
        h_fine=0.003, h_coarse=0.006,
    )
    m.validate()
    vols = tet_volumes(m.nodes, m.tets)
    v_muscle = vols[m.tet_body == 1].sum()
    np.testing.assert_allclose(v_muscle, Lx * Ly * t_muscle, rtol=1e-9)
    v_skin = vols[m.tet_body == 3].sum()
    np.testing.assert_allclose(v_skin, Lx * Ly * t_skin, rtol=1e-9)
    # contact volumes present, disjoint, under their electrodes only
    assert (m.tet_body == 4).any() and (m.tet_body == 5).any()
    areas, normals = m.face_areas_normals()
    for bcid in (1, 2):
        sel = m.face_bcid == bcid
        assert sel.any()
        # BC faces are flat at z = Lz + t_contact with +z normal
        fz = m.nodes[m.faces[sel]].mean(axis=1)[:, 2]
        np.testing.assert_allclose(fz, Lz + 0.0005, atol=1e-12)
        assert (normals[sel, 2] > 0.99).all()
        # electrode mesh area within 15% of the analytic disk
        a = areas[sel].sum()
        assert abs(a - np.pi * r * r) / (np.pi * r * r) < 0.15


def test_ankle_cross_section_carving():
    from pelvistim_fem_tpu.models.ankle import (ankle_outline_pts,
                                                ankle_z_top)
    Lx, Ly, Lz = 0.08, 0.06, 0.04
    m = layered_slab_mesh(
        Lx, Ly, Lz,
        layers=[(1, 0.0335, 0.008), (2, 0.005, 0.005), (3, 0.0015, 0.0015)],
        electrodes=[(0.015, 0.045, 0.01), (0.065, 0.045, 0.01)],
        contact_t=0.0, h_fine=0.004, h_coarse=0.008,
        cross_section="ankle",
        ankle_z_top_fn=lambda x, y: ankle_z_top(x, y, Lx, Ly, Lz),
        outline_polygon=ankle_outline_pts(Lx, Ly),
    )
    m.validate()
    # volume strictly less than the full slab (corners carved away)
    vols = tet_volumes(m.nodes, m.tets)
    assert vols.sum() < Lx * Ly * Lz * 0.95
    # deformed top surface: max z above Lz (Achilles bump), min top dip
    assert m.nodes[:, 2].max() > Lz + 0.0005


def test_tet_quality_metrics():
    """Regular tet: radius ratio 1, dihedral 70.53 deg; squashed sliver
    degrades both; Kuhn lattice tets: 45-deg min dihedral, known ratio."""
    from pelvistim_fem_tpu.mesh.core import tet_quality
    # regular tetrahedron
    reg = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                   float)
    q = tet_quality(reg, np.array([[0, 1, 2, 3]]))
    np.testing.assert_allclose(q["radius_ratio"], 1.0, rtol=1e-12)
    np.testing.assert_allclose(q["min_dihedral"], 70.528779, atol=1e-4)
    # sliver: squash the regular tet 100x along z
    sliver = reg.copy()
    sliver[:, 2] *= 0.01
    qs = tet_quality(sliver, np.array([[0, 1, 2, 3]]))
    assert qs["radius_ratio"][0] < 0.1
    assert qs["min_dihedral"][0] < 10.0
    # Kuhn lattice: every tet shares the same quality class
    from pelvistim_fem_tpu.mesh.generate import box_mesh
    m = box_mesh(0.02, 0.02, 0.02, 0.01)
    qk = tet_quality(m.nodes, m.tets)
    np.testing.assert_allclose(qk["min_dihedral"], 45.0, atol=1e-9)
    assert 0.4 < qk["radius_ratio"].min() <= qk["radius_ratio"].max() < 0.8
    # all ratios identical on the uniform lattice (one Kuhn class shape)
    np.testing.assert_allclose(qk["radius_ratio"],
                               qk["radius_ratio"][0], rtol=1e-9)
    # exactly-degenerate (coplanar) tets must report 0, not raise
    # (LinAlgError regression: the batched circumcenter solve)
    bad = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                    [1, 1, 0]], float)
    qd = tet_quality(bad, np.array([[0, 1, 2, 3], [0, 1, 2, 4]]))
    assert qd["radius_ratio"][1] == 0.0
    assert qd["min_dihedral"][1] == 0.0
    assert qd["radius_ratio"][0] > 0.3

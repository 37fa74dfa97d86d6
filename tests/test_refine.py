"""Conforming local bisection refinement (mesh/refine.py).

Verifies the Maubach/Traxler machinery end to end: conformity (no
hanging nodes, watertight boundary), shape regularity across rounds,
BC re-classification on the refined boundary, exactness of the FEM
solve on a locally refined mesh, and that LOCAL refinement beats
uniform regrading per DOF on a problem with a concentrated feature.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import box_recipe
from pelvistim_fem_tpu.mesh.refine import BisectionMesh, mark_doerfler
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.solve import solve_case_refined

L = 0.01


def _hanging_count(m):
    """Edges whose midpoint coincides with a mesh node."""
    from scipy.spatial import cKDTree
    t, nodes = m.tets, m.nodes
    tree = cKDTree(nodes)
    bad = 0
    for a, b in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
        mids = 0.5 * (nodes[t[:, a]] + nodes[t[:, b]])
        d, _ = tree.query(mids)
        bad += int((d < 1e-12).sum())
    return bad


def test_bisection_conforming_and_shape_regular():
    bm = BisectionMesh.from_recipe(box_recipe(L, L, L, L / 4))
    rng = np.random.default_rng(0)
    vols0 = None
    for r in range(5):
        bm = bm.refine(rng.random(bm.n_tets) < 0.15)
        m = bm.mesh()
        assert _hanging_count(m) == 0, r
        # watertight: every face shared by exactly 1 (boundary) or 2 tets
        f = np.sort(np.concatenate(
            [np.delete(m.tets, i, axis=1) for i in range(4)]), axis=1)
        _, counts = np.unique(f, axis=0, return_counts=True)
        assert counts.max() <= 2
        _, vol = m.geometry()
        assert vol.min() > 0
        if vols0 is None:
            vols0 = vol
    # Maubach guarantee: finitely many similarity classes — volumes are
    # parent/2^k, so the quality never collapses below a fixed bound
    assert vol.min() / vol.max() >= 2.0 ** (-6)
    # boundary area preserved (watertight box): 6 L^2
    p = m.nodes[m.faces]
    area = 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1).sum()
    np.testing.assert_allclose(area, 6 * L * L, rtol=1e-12)


def test_refined_mesh_solves_exactly():
    """P1 reproduces the linear analytic solution on the refined mesh;
    electrode re-classification keeps the full plate areas."""
    bm = BisectionMesh.from_recipe(box_recipe(L, L, L, L / 4))
    rng = np.random.default_rng(1)
    for _ in range(3):
        bm = bm.refine(rng.random(bm.n_tets) < 0.2)
    m = bm.mesh()
    for bc in (1, 2):
        sel = m.face_bcid == bc
        p = m.nodes[m.faces[sel]]
        area = 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1).sum()
        np.testing.assert_allclose(area, L * L, rtol=1e-12)
    case = build_case(m, {1: 0.2}, mode="voltage", active_V=1.0,
                      dtype=jnp.float64)
    res = solve_case_refined(case, tol=1e-10)
    assert bool(np.asarray(res.converged))
    err = np.abs(np.asarray(res.phi) - m.nodes[:, 2] / L).max()
    assert err < 1e-6, err


def test_doerfler_marking():
    eta = np.array([3.0, 0.1, 0.1, 4.0, 0.05])
    # eta^2 = [9, .01, .01, 16, .0025], total 25.02: theta=0.6 is
    # carried by the single dominant indicator; theta=0.8 needs both
    m6 = mark_doerfler(eta, theta=0.6)
    assert m6[3] and m6.sum() == 1
    m8 = mark_doerfler(eta, theta=0.8)
    assert m8[3] and m8[0] and m8.sum() == 2


def test_local_beats_uniform_per_dof():
    """A small low-sigma inclusion concentrates the error; ZZ-driven
    Dorfler bisection must reach a lower estimated error than the
    UNIFORM refinement of the same recipe at comparable or fewer
    tets."""
    from pelvistim_fem_tpu.mesh.generate import LatticeRecipe
    from pelvistim_fem_tpu.ops.amg import build_amg, solve_case_amg_refined
    from pelvistim_fem_tpu.ops.estimate import (zz_error_indicators,
                                                zz_global_error)
    from pelvistim_fem_tpu.mesh import core

    h = L / 6
    xs = np.linspace(0, L, 7)

    def body_fn(cx, cy, cz):
        r2 = (cx - L / 2) ** 2 + (cy - L / 2) ** 2 + (cz - L / 2) ** 2
        return np.where(r2 < (L / 6) ** 2, 2, 1).astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        out[(nz > 0.5) & (np.abs(fz - L) < 1e-12)] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-12)] = core.BC_RETURN
        return out

    rec = LatticeRecipe(xs=xs, ys=xs, zs=xs, body_fn=body_fn,
                        bcid_fn=bcid_fn)
    sigma = {1: 0.35, 2: 0.35 / 1000}

    def solve_est(mesh):
        case = build_case(mesh, sigma, mode="voltage", active_V=1.0,
                          dtype=jnp.float64)
        amg = build_amg(case, mesh=mesh)
        res = solve_case_amg_refined(case, amg, tol=1e-8)
        assert bool(np.asarray(res.converged))
        eta = zz_error_indicators(case, res.phi)
        _, rel = (float(v) for v in zz_global_error(case, res.phi))
        return np.asarray(eta), rel

    # uniform: double each axis (8x tets of the base)
    xs2 = np.linspace(0, L, 13)
    rec2 = LatticeRecipe(xs=xs2, ys=xs2, zs=xs2, body_fn=body_fn,
                         bcid_fn=bcid_fn)
    mesh_u = rec2.mesh()
    _, rel_uniform = solve_est(mesh_u)

    # local: Dorfler-driven bisection until the budget matches uniform
    bm = BisectionMesh.from_recipe(rec)
    mesh = bm.mesh()
    for _ in range(10):
        eta, rel_local = solve_est(mesh)
        if mesh.n_tets >= 0.55 * mesh_u.n_tets:
            break
        bm = bm.refine(mark_doerfler(eta, theta=0.6))
        mesh = bm.mesh()

    # concentrated error: the adapted mesh reaches a LOWER estimated
    # error with barely more than half the uniform budget
    assert mesh.n_tets <= mesh_u.n_tets, (mesh.n_tets, mesh_u.n_tets)
    assert rel_local < rel_uniform, (rel_local, rel_uniform,
                                     mesh.n_tets, mesh_u.n_tets)

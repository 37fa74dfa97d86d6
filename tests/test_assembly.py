"""Assembly unit tests against dense/scipy references — the kernel-level
tier the reference lacks (SURVEY.md section 4 improvement slot)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import box_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops import assembly, fields
from pelvistim_fem_tpu.ops.solve import solve_case


def _scipy_stiffness(nodes, tets, sigma_e):
    """Straightforward COO assembly as oracle."""
    grads, vol = assembly.element_gradients(nodes, tets)
    ke = np.einsum("mid,mjd->mij", grads, grads) * (sigma_e * vol)[:, None,
                                                                   None]
    M = tets.shape[0]
    rows = np.repeat(tets, 4, axis=1).reshape(M, 4, 4)
    cols = np.tile(tets[:, None, :], (1, 4, 1))
    n = nodes.shape[0]
    return sp.coo_matrix(
        (ke.ravel(), (rows.ravel(), cols.ravel())), shape=(n, n)).tocsr()


def test_element_gradients_partition_of_unity():
    m = box_mesh(0.04, 0.04, 0.02, 0.008)
    grads, vol = assembly.element_gradients(m.nodes, m.tets)
    # shape-function gradients sum to zero per element
    np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-12)
    assert (vol > 0).all()
    np.testing.assert_allclose(vol.sum(), 0.04 * 0.04 * 0.02, rtol=1e-12)


def test_gradient_exact_for_linear_field():
    """P1 gradients reproduce a linear field exactly."""
    m = box_mesh(0.03, 0.02, 0.01, 0.005)
    case = build_case(m, {1: 1.0})
    a = np.array([1.5, -2.0, 3.0])
    phi = m.nodes @ a + 0.7
    g = np.asarray(fields.cell_gradient(case, jnp.asarray(phi)))
    np.testing.assert_allclose(g, np.tile(a, (m.n_tets, 1)), atol=1e-10)


def test_spmv_matches_scipy():
    m = box_mesh(0.04, 0.04, 0.02, 0.006)
    sigma_e = np.full(m.n_tets, 0.35)
    K = _scipy_stiffness(m.nodes, m.tets, sigma_e)
    case = build_case(m, {1: 0.35})
    rng = np.random.default_rng(0)
    x = rng.standard_normal(m.n_nodes)
    sigvol = jnp.asarray(sigma_e) * case.vol
    y = assembly.spmv(jnp.asarray(x), case.tets, case.grads, sigvol,
                      case.scatter_perm, case.scatter_segids, m.n_nodes)
    np.testing.assert_allclose(np.asarray(y), K @ x, rtol=1e-10, atol=1e-12)


def test_stiffness_diagonal_matches_scipy():
    m = box_mesh(0.04, 0.04, 0.02, 0.008)
    sigma_e = np.full(m.n_tets, 0.2)
    K = _scipy_stiffness(m.nodes, m.tets, sigma_e)
    case = build_case(m, {1: 0.2})
    d = assembly.stiffness_diagonal(
        case.tets, case.grads, jnp.asarray(sigma_e) * case.vol,
        case.scatter_perm, case.scatter_segids, m.n_nodes)
    np.testing.assert_allclose(np.asarray(d), K.diagonal(), rtol=1e-10)


def test_solution_matches_scipy_direct():
    """Full Dirichlet solve vs scipy spsolve — the UMFPACK-parity check."""
    m = box_mesh(0.04, 0.04, 0.02, 0.005)
    case = build_case(m, {1: 0.2}, mode="voltage")
    res = solve_case(case, tol=1e-12)
    K = _scipy_stiffness(m.nodes, m.tets, np.full(m.n_tets, 0.2))
    free = np.asarray(case.free_mask)
    g = np.asarray(case.dirichlet_vals)
    b = -K[:, ~free] @ g[~free]
    phi = g.copy()
    phi[free] = sp.linalg.spsolve(K[free][:, free].tocsc(), b[free])
    np.testing.assert_allclose(np.asarray(res.phi), phi, atol=1e-9)


def test_neumann_load_integrates_to_current():
    from pelvistim_fem_tpu.models.ankle import build_layered_case
    case, _ = build_layered_case(coarse=True)
    np.testing.assert_allclose(float(jnp.sum(case.b_neumann)), 5e-3,
                               rtol=1e-12)


def test_nodal_average_constant_field():
    m = box_mesh(0.02, 0.02, 0.01, 0.005)
    case = build_case(m, {1: 1.0})
    cell_vals = jnp.full((m.n_tets,), 3.25)
    nod = fields.nodal_average(case, cell_vals)
    np.testing.assert_allclose(np.asarray(nod), 3.25, rtol=1e-12)

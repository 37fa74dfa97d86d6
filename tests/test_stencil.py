"""Stencil-operator tests: exact agreement with the element-based
operator on every generated geometry class."""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import box_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                               sigma_tables_for_sweep)
from pelvistim_fem_tpu.ops import assembly
from pelvistim_fem_tpu.ops.solve import solve_case
from pelvistim_fem_tpu.ops.stencil import (batched_stencil_solve,
                                           build_stencil_case,
                                           combine_coeffs, solve_stencil,
                                           solve_stencil_refined,
                                           stencil_spmv)


def test_stencil_spmv_matches_element_spmv():
    m = box_mesh(0.04, 0.04, 0.02, 0.005)
    case = build_case(m, {1: 0.2})
    sc = build_stencil_case(case, m)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(case.n_nodes))
    sigvol = case.sigma_table[case.tet_body] * case.vol
    y_elem = assembly.spmv(x, case.tets, case.grads, sigvol,
                           case.scatter_perm, case.scatter_segids,
                           case.n_nodes)
    C = combine_coeffs(sc.coeff, sc.sigma_table)
    xg = jnp.zeros(int(np.prod(sc.grid_shape))).at[sc.grid_index].set(
        x).reshape(sc.grid_shape)
    y_sten = stencil_spmv(xg, C).reshape(-1)[sc.grid_index]
    np.testing.assert_allclose(np.asarray(y_sten), np.asarray(y_elem),
                               rtol=1e-10, atol=1e-12)


def test_stencil_solve_box():
    m = box_mesh(0.04, 0.04, 0.02, 0.004)
    case = build_case(m, {1: 0.2}, mode="voltage")
    sc = build_stencil_case(case, m)
    r1 = solve_case(case, tol=1e-10)
    r2 = solve_stencil(sc, tol=1e-10)
    np.testing.assert_allclose(np.asarray(r2.phi), np.asarray(r1.phi),
                               atol=1e-12)


def test_stencil_solve_layered_carved_multibody():
    """Carved contact volumes + graded axes + 5 bodies, current mode."""
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    sc = build_stencil_case(case, mesh)
    r1 = solve_case(case, tol=1e-8, maxiter=30_000)
    r2 = solve_stencil(sc, tol=1e-8, maxiter=30_000)
    rel = (np.abs(np.asarray(r2.phi) - np.asarray(r1.phi)).max()
           / np.abs(np.asarray(r1.phi)).max())
    assert rel < 1e-9, rel


def test_stencil_batched_sweep_matches_element():
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    sc = build_stencil_case(case, mesh)
    tables = sigma_tables_for_sweep(case, params)[::7]   # 3 lanes
    out = batched_stencil_solve(sc, tables, tol=1e-8, maxiter=30_000)
    assert bool(out.converged.all())
    for i in range(tables.shape[0]):
        s = solve_case(case, tables[i], tol=1e-8, maxiter=30_000)
        rel = (np.abs(np.asarray(out.phi[i]) - np.asarray(s.phi)).max()
               / np.abs(np.asarray(s.phi)).max())
        assert rel < 1e-7, (i, rel)


def test_stencil_refined_reaches_f64_tolerance():
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    sc = build_stencil_case(case, mesh)
    res = solve_stencil_refined(sc, tol=1e-10, inner_tol=1e-5,
                                maxiter=30_000, max_refinements=8)
    assert bool(res.converged)
    ref = solve_case(case, tol=1e-12, maxiter=60_000)
    rel = (np.abs(np.asarray(res.phi) - np.asarray(ref.phi)).max()
           / np.abs(np.asarray(ref.phi)).max())
    assert rel < 1e-8, rel


def test_stencil_ankle_deformed():
    """Deformation changes coefficients, not topology — stencil must agree
    on the deformed ankle geometry too."""
    from pelvistim_fem_tpu.models.ankle import build_layered_case
    from pelvistim_fem_tpu.utils.config import default_params
    p = default_params("step03_ankle_layers")
    p["geometry"]["cross_section"] = "ankle"
    case, params, mesh = build_layered_case(p, coarse=True, with_mesh=True)
    sc = build_stencil_case(case, mesh)
    r1 = solve_case(case, tol=1e-8, maxiter=30_000)
    r2 = solve_stencil(sc, tol=1e-8, maxiter=30_000)
    rel = (np.abs(np.asarray(r2.phi) - np.asarray(r1.phi)).max()
           / np.abs(np.asarray(r1.phi)).max())
    assert rel < 1e-9, rel


def test_ship_coeff_slab_transfer_exact():
    """Per-body z-slab transfer reproduces the full stack exactly."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops.stencil import _ship_coeff
    rng = np.random.default_rng(3)
    c = np.zeros((3, 27, 6, 5, 12))
    c[0, ..., 0:7] = rng.standard_normal((27, 6, 5, 7))
    c[1, ..., 6:10] = rng.standard_normal((27, 6, 5, 4))
    c[2, ..., 9:12] = rng.standard_normal((27, 6, 5, 3))
    out = _ship_coeff(c, jnp.float64)
    np.testing.assert_array_equal(np.asarray(out), c)
    # degenerate: an all-zero body and a full-span body
    c[1] = 0.0
    c[2] = rng.standard_normal(c[2].shape)
    out = _ship_coeff(c, jnp.float64)
    np.testing.assert_array_equal(np.asarray(out), c)


def test_precombined_single_sigma_solve_matches_factored():
    """B == 1 pre-combined coefficient stacks (the pelvis-megatet memory
    fix: combine_coeffs takes the elementwise fast path, no einsum
    intermediate) must solve identically to the body-factored form."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.multigrid import (build_hierarchy,
                                                 solve_stencil_mg)

    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float64)
    r_fact = solve_stencil_mg(sc, hier, tol=1e-10)

    sig = np.asarray(hd["sigma_table"], np.float64)
    hd1 = {**hd,
           "coeff": np.einsum("b,bo...->o...", sig[1:], hd["coeff"])[None],
           "sigma_table": np.array([0.0, 1.0])}
    sc1 = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd1)
    hier1 = build_hierarchy(hd1, dtype=jnp.float64)
    r_pre = solve_stencil_mg(sc1, hier1, tol=1e-10)

    assert abs(int(r_fact.iterations) - int(r_pre.iterations)) <= 1
    p1, p2 = np.asarray(r_fact.phi), np.asarray(r_pre.phi)
    np.testing.assert_allclose(p2, p1, atol=1e-9 * np.abs(p1).max())

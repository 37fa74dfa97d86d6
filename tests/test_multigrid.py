"""Geometric multigrid tests: Galerkin coarsening correctness and
iteration-count reduction on the high-contrast layered problem."""

import numpy as np
import pytest

import jax.numpy as jnp

from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                               sigma_tables_for_sweep)
from pelvistim_fem_tpu.ops.multigrid import (build_hierarchy,
                                             make_transfers,
                                             solve_stencil_mg)
from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                           solve_stencil,
                                           stencil_host_data)


@pytest.fixture(scope="module")
def problem():
    case, params, mesh = build_pressure_case(coarse=False, with_mesh=True)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float64)
    return case, params, sc, hier


def test_transfer_partition_of_unity():
    """Prolongation of the constant-1 coarse field is 1 on the fine grid
    (trilinear interpolation reproduces constants)."""
    axes = (np.array([0.0, 1.0, 2.5, 3.0, 5.0]),
            np.array([0.0, 0.5, 1.5, 2.0]),
            np.array([0.0, 1.0, 1.2, 2.0, 2.1]))
    coarse_axes, prolong, restrict = make_transfers(axes)
    ones_c = np.ones(tuple(len(a) for a in coarse_axes))
    np.testing.assert_allclose(prolong(ones_c), 1.0, rtol=1e-14)
    # R = P^T: <P xc, yf> == <xc, R yf>
    rng = np.random.default_rng(0)
    xc = rng.standard_normal(ones_c.shape)
    yf = rng.standard_normal(tuple(len(a) for a in axes))
    lhs = float((prolong(xc) * yf).sum())
    rhs = float((xc * restrict(yf)).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_mg_matches_jacobi_solution(problem):
    case, params, sc, hier = problem
    tables = sigma_tables_for_sweep(case, params)
    for i in (0, 14):
        r1 = solve_stencil(sc, tables[i], tol=1e-9, maxiter=30_000)
        r2 = solve_stencil_mg(sc, hier, tables[i], tol=1e-9,
                              maxiter=2_000)
        assert bool(r2.converged)
        rel = float(jnp.abs(r1.phi - r2.phi).max()
                    / jnp.abs(r1.phi).max())
        assert rel < 1e-8, (i, rel)


def test_mg_f32_stays_f32_under_x64():
    """With jax x64 enabled (tests run with it), an f32 hierarchy must
    not be promoted to f64 by the numpy transfer weights — that dtype
    mismatch broke the while_loop carry on the TPU pelvis run."""
    case, params, mesh = build_pressure_case(coarse=True,
                                             dtype=jnp.float32,
                                             with_mesh=True)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float32, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float32)
    r = solve_stencil_mg(sc, hier, tol=1e-5, maxiter=2_000)
    assert r.phi.dtype == jnp.float32
    assert bool(r.converged)


def test_mg_cuts_iterations(problem):
    """On the hardest lane (sigma_contact = 5e-5, 7000x contrast) the
    V-cycle must cut CG iterations by >5x vs Jacobi."""
    case, params, sc, hier = problem
    tables = sigma_tables_for_sweep(case, params)
    r1 = solve_stencil(sc, tables[0], tol=1e-8, maxiter=30_000)
    r2 = solve_stencil_mg(sc, hier, tables[0], tol=1e-8, maxiter=2_000)
    assert int(r2.iterations) * 5 < int(r1.iterations), \
        (int(r1.iterations), int(r2.iterations))
    assert int(r2.iterations) < 60


def test_chebyshev_smoother_converges_and_cuts_iterations(problem):
    """Chebyshev-smoothed V-cycle: same solution, fewer (or equal) CG
    iterations than damped Jacobi on the hard-contrast lane."""
    case, params, sc, hier = problem
    tables = sigma_tables_for_sweep(case, params)
    rj = solve_stencil_mg(sc, hier, tables[0], tol=1e-8, maxiter=2_000)
    rc = solve_stencil_mg(sc, hier, tables[0], tol=1e-8, maxiter=2_000,
                          smoother="chebyshev", nu=3)
    assert bool(rc.converged)
    rel = float(jnp.abs(rj.phi - rc.phi).max() / jnp.abs(rj.phi).max())
    assert rel < 1e-7, rel
    assert int(rc.iterations) <= int(rj.iterations)

"""Domain-decomposed (x-slab + halo exchange) stencil solve tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pelvistim_fem_tpu.models.pressure import build_pressure_case
from pelvistim_fem_tpu.ops.stencil import build_stencil_case, solve_stencil
from pelvistim_fem_tpu.parallel.stencil_shard import sharded_stencil_solve


@pytest.fixture(scope="module")
def problem():
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    sc = build_stencil_case(case, mesh)
    ref = solve_stencil(sc, tol=1e-9, maxiter=30_000)
    return sc, ref


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_slab_decomposition_matches_single(problem, n_dev):
    sc, ref = problem
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
    r = sharded_stencil_solve(sc, mesh, tol=1e-9, maxiter=30_000)
    assert bool(r.converged)
    # identical operator => identical CG trajectory and iterate count
    assert int(r.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(r.phi), np.asarray(ref.phi),
                               rtol=1e-12, atol=1e-12)


def test_padding_axis_not_divisible(problem):
    """X=30 over 7 devices forces padded inert planes."""
    sc, ref = problem
    mesh = Mesh(np.asarray(jax.devices()[:7]), ("x",))
    r = sharded_stencil_solve(sc, mesh, tol=1e-9, maxiter=30_000)
    assert bool(r.converged)
    np.testing.assert_allclose(np.asarray(r.phi), np.asarray(ref.phi),
                               rtol=1e-12, atol=1e-12)


@pytest.fixture(scope="module")
def mg_problem():
    from pelvistim_fem_tpu.ops.multigrid import (build_hierarchy,
                                                 solve_stencil_mg)
    from pelvistim_fem_tpu.ops.stencil import stencil_host_data
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, host_data=hd)
    hier = build_hierarchy(hd, dtype=sc.coeff.dtype)
    ref = solve_stencil_mg(sc, hier, tol=1e-8, maxiter=2000)
    return sc, hier, ref


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_mg_matches_single_device(mg_problem, n_dev):
    """Domain-decomposed MG-CG: same V-cycle math => iteration count
    within +-1 of solve_stencil_mg and matching solution (VERDICT round-1
    item 3 acceptance)."""
    from pelvistim_fem_tpu.parallel.stencil_shard import \
        sharded_stencil_solve_mg
    sc, hier, ref = mg_problem
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
    r = sharded_stencil_solve_mg(sc, hier, mesh, tol=1e-8, maxiter=2000)
    assert bool(r.converged)
    assert abs(int(r.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(r.phi), np.asarray(ref.phi),
                               rtol=0, atol=1e-8 * float(
                                   np.abs(np.asarray(ref.phi)).max()))


def test_sharded_mg_beats_jacobi_iterations(mg_problem):
    """MG preconditioning must cut the sharded iteration count by >=4x
    vs the Jacobi-PCG decomposition on the same problem."""
    from pelvistim_fem_tpu.parallel.stencil_shard import \
        sharded_stencil_solve_mg
    sc, hier, _ = mg_problem
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    rj = sharded_stencil_solve(sc, mesh, tol=1e-8, maxiter=30_000)
    rm = sharded_stencil_solve_mg(sc, hier, mesh, tol=1e-8, maxiter=2000)
    assert bool(rj.converged) and bool(rm.converged)
    assert int(rm.iterations) * 4 <= int(rj.iterations)

@pytest.fixture(scope="module")
def refined_ref(mg_problem):
    from pelvistim_fem_tpu.ops.multigrid import solve_stencil_mg_refined
    sc, hier, _ = mg_problem
    return solve_stencil_mg_refined(sc, hier, tol=1e-8, maxiter=2000)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_mg_refined_certified_1e8(mg_problem, refined_ref, n_dev):
    """Certified 1e-8 on multi-chip (VERDICT round-2 item 1): the
    sharded refined solve must report the TRUE f64 relative residual
    (independently recomputed on host) <= 1e-8, with inner-iteration
    parity +-1 vs the single-device solve_stencil_mg_refined."""
    from pelvistim_fem_tpu.ops.multigrid import _np_spmv
    from pelvistim_fem_tpu.parallel.stencil_shard import \
        sharded_stencil_solve_mg_refined
    sc, hier, _ = mg_problem
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
    r = sharded_stencil_solve_mg_refined(sc, hier, mesh, tol=1e-8,
                                         maxiter=2000)
    assert bool(r.converged)
    assert abs(int(r.iterations) - int(refined_ref.iterations)) <= 1

    # independent TRUE-residual check in host f64
    C = np.einsum("b,bo...->o...",
                  np.asarray(sc.sigma_table, np.float64)[1:],
                  np.asarray(sc.coeff, np.float64))
    free = np.asarray(sc.free)
    diri = np.asarray(sc.dirichlet, np.float64)
    b = np.asarray(sc.b_neumann, np.float64)
    gi = np.asarray(sc.grid_index)
    Xg = np.zeros(free.size)
    Xg[gi] = np.asarray(r.phi)
    Xg = Xg.reshape(free.shape)
    rr = np.where(free, b - _np_spmv(np.where(free, Xg, diri), C), 0.0)
    beff = np.where(free, b - _np_spmv(np.where(free, 0.0, diri), C), 0.0)
    true_rel = np.linalg.norm(rr) / np.linalg.norm(beff)
    assert true_rel <= 1.1e-8, true_rel
    np.testing.assert_allclose(true_rel, float(np.asarray(r.residual)),
                               rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(r.phi), np.asarray(refined_ref.phi),
        atol=2e-8 * float(np.abs(np.asarray(refined_ref.phi)).max()))


def test_sharded_mg_refined_warm_start(mg_problem, refined_ref):
    """x0 warm start (the sharded ROM's polish fallback, round-4
    VERDICT item 1a): starting the refined solve from a near-solution
    must (a) still meet the certified contract, (b) cost fewer inner
    iterations than the cold solve, (c) reproduce the cold fields."""
    from pelvistim_fem_tpu.parallel.stencil_shard import \
        sharded_stencil_solve_mg_refined
    sc, hier, _ = mg_problem
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    cold = sharded_stencil_solve_mg_refined(sc, hier, mesh, tol=1e-8,
                                            maxiter=2000)
    assert bool(cold.converged)
    # grid-shaped warm start: the converged solution + a 1e-3 relative
    # perturbation on the free slots (a "reduced reconstruction"-grade
    # initial guess)
    free = np.asarray(sc.free)
    gi = np.asarray(sc.grid_index)
    xg = np.zeros(free.size)
    xg[gi] = np.asarray(cold.phi)
    rng = np.random.default_rng(0)
    scale = 1e-3 * float(np.abs(xg).max())
    x0 = np.where(free.reshape(-1),
                  xg + scale * rng.standard_normal(free.size), 0.0)
    warm = sharded_stencil_solve_mg_refined(
        sc, hier, mesh, x0=jnp.asarray(x0.reshape(free.shape)),
        tol=1e-8, maxiter=2000)
    assert bool(warm.converged)
    assert float(np.asarray(warm.residual)) <= 1e-8
    assert int(warm.iterations) < int(cold.iterations), \
        (int(warm.iterations), int(cold.iterations))
    np.testing.assert_allclose(
        np.asarray(warm.phi), np.asarray(cold.phi),
        atol=2e-8 * float(np.abs(np.asarray(cold.phi)).max()))

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
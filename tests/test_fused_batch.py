"""Fused (body-factored, lane-stacked) batched solver vs the vmapped
reference path."""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                               sigma_tables_for_sweep)
from pelvistim_fem_tpu.ops.stencil import (batched_stencil_solve,
                                           batched_stencil_solve_fused,
                                           build_stencil_case)


def test_fused_matches_vmapped():
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    sc = build_stencil_case(case, mesh)
    tables = sigma_tables_for_sweep(case, params)
    a = batched_stencil_solve(sc, tables, tol=1e-8, maxiter=30_000)
    b = batched_stencil_solve_fused(sc, tables, tol=1e-8, maxiter=30_000)
    assert bool(b.converged.all())
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))
    rel = float(jnp.abs(a.phi - b.phi).max() / jnp.abs(a.phi).max())
    assert rel < 1e-10, rel


def test_fused_lminor_matches_vmapped():
    """Lane-minor Pallas-kernel sweep (interpret mode on CPU) matches the
    vmapped reference lanes."""
    import jax
    import pelvistim_fem_tpu.ops.pallas_stencil as ps
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    if jax.devices()[0].platform == "cpu":
        ps.pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        case, params, mesh = build_pressure_case(coarse=True,
                                                 with_mesh=True)
        sc = build_stencil_case(case, mesh)
        tables = sigma_tables_for_sweep(case, params)[:4]
        ref = batched_stencil_solve(sc, tables, tol=1e-9, maxiter=30_000)
        out = batched_stencil_solve_fused(sc, tables, tol=1e-9,
                                          maxiter=30_000, use_pallas=True)
        assert bool(np.asarray(out.converged).all())
        np.testing.assert_allclose(np.asarray(out.phi),
                                   np.asarray(ref.phi), rtol=0,
                                   atol=1e-7 * float(
                                       np.abs(np.asarray(ref.phi)).max()))
    finally:
        ps.pl.pallas_call = orig

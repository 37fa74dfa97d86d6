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


def test_fused_mg_matches_vmapped_mg():
    """Lane-stacked fused-SpMV MG sweep (VERDICT round-2 item 3): same
    V-cycle recursion as the vmapped batched_mg_solve with per-body
    coefficients never combined per lane — iteration counts must match
    exactly and solutions to f64 roundoff."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops import lattice_assembly as la
    from pelvistim_fem_tpu.ops.multigrid import (batched_mg_solve,
                                                 batched_mg_solve_fused)
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (4, 1))
    tables[:, 4] = tables[:, 5] = np.logspace(np.log10(5e-5), -1, 4)
    tables = jnp.asarray(tables)
    a = batched_mg_solve(scase, hier, tables, tol=1e-8)
    b = batched_mg_solve_fused(scase, hier, tables, tol=1e-8)
    assert bool(np.asarray(b.converged).all())
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))
    rel = float(jnp.abs(a.phi - b.phi).max() / jnp.abs(a.phi).max())
    assert rel < 1e-10, rel


def test_fused_mg_refined_certified_true_residual():
    """The fused refined sweep's reported residual must equal the TRUE
    f64 relative residual, independently recomputed — certified 1e-8 at
    the full material contrast with O(L*G + B*27*G) memory."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops import lattice_assembly as la
    from pelvistim_fem_tpu.ops.multigrid import (
        _np_spmv, batched_mg_solve_fused_refined)
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (3, 1))
    tables[:, 4] = tables[:, 5] = np.logspace(np.log10(5e-5), -1, 3)
    out = batched_mg_solve_fused_refined(scase, hier,
                                         jnp.asarray(tables), tol=1e-8)
    assert bool(np.asarray(out.converged).all())
    C0 = np.asarray(scase.coeff, np.float64)
    free = np.asarray(scase.free)
    diri = np.asarray(scase.dirichlet)
    b = np.asarray(scase.b_neumann)
    gi = np.asarray(scase.grid_index)
    for l in range(3):
        C = np.einsum("b,bo...->o...", tables[l][1:], C0)
        Xg = np.zeros(free.size)
        Xg[gi] = np.asarray(out.phi[l])
        Xg = Xg.reshape(free.shape)
        r = np.where(free, b - _np_spmv(np.where(free, Xg, diri), C), 0.0)
        beff = np.where(free,
                        b - _np_spmv(np.where(free, 0.0, diri), C), 0.0)
        true_rel = np.linalg.norm(r) / np.linalg.norm(beff)
        assert true_rel <= 1.1e-8, (l, true_rel)
        np.testing.assert_allclose(true_rel,
                                   float(np.asarray(out.residual[l])),
                                   rtol=0.05)


def test_assemble_lattice_refined_feeds_certified_sweep():
    """assemble_lattice_refined returns the f64-master / f32-probed
    split (the f64-probed hierarchy overflows scoped VMEM at megatet
    scale on the axon backend); the fused refined sweep must stay
    certified with it."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops import lattice_assembly as la
    from pelvistim_fem_tpu.ops.multigrid import (
        _np_spmv, batched_mg_solve_fused_refined)
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice_refined(spec)
    assert scase.coeff.dtype == jnp.float64
    assert hier.levels[0].coeff.dtype == jnp.float32
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (2, 1))
    tables[:, 4] = tables[:, 5] = [5e-5, 1e-2]
    out = batched_mg_solve_fused_refined(scase, hier,
                                         jnp.asarray(tables), tol=1e-8)
    assert bool(np.asarray(out.converged).all())
    C0 = np.asarray(scase.coeff, np.float64)
    free = np.asarray(scase.free)
    diri = np.asarray(scase.dirichlet)
    b = np.asarray(scase.b_neumann)
    gi = np.asarray(scase.grid_index)
    for l in range(2):
        C = np.einsum("b,bo...->o...", tables[l][1:], C0)
        Xg = np.zeros(free.size)
        Xg[gi] = np.asarray(out.phi[l])
        Xg = Xg.reshape(free.shape)
        r = np.where(free, b - _np_spmv(np.where(free, Xg, diri), C), 0.0)
        beff = np.where(free,
                        b - _np_spmv(np.where(free, 0.0, diri), C), 0.0)
        true_rel = np.linalg.norm(r) / np.linalg.norm(beff)
        assert true_rel <= 1.1e-8, (l, true_rel)


def test_chunked_fused_refined_matches_whole_batch():
    """Lane-chunked driver (HBM governor for megatet x wide sweeps):
    same results as one whole-batch call, including a padded tail
    chunk."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops import lattice_assembly as la
    from pelvistim_fem_tpu.ops.multigrid import (
        batched_mg_solve_fused_refined,
        batched_mg_solve_fused_refined_chunked)
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice_refined(spec)
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (5, 1))
    tables[:, 4] = tables[:, 5] = np.logspace(np.log10(5e-5), -1, 5)
    tables = jnp.asarray(tables)
    whole = batched_mg_solve_fused_refined(scase, hier, tables, tol=1e-8)
    chunked = batched_mg_solve_fused_refined_chunked(
        scase, hier, tables, lanes_per_chunk=2, tol=1e-8)
    assert bool(np.asarray(chunked.converged).all())
    assert chunked.phi.shape == whole.phi.shape
    # each chunk solves its lanes independently; identical programs on
    # identical lanes except reduction grouping -> agree to tolerance
    np.testing.assert_allclose(
        np.asarray(chunked.phi), np.asarray(whole.phi), rtol=0,
        atol=1e-6 * float(np.abs(np.asarray(whole.phi)).max()))

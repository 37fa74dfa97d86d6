"""Partitioned (element-sharded) solve tests on the virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pelvistim_fem_tpu.models.box import build_box_case
from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                               sigma_tables_for_sweep)
from pelvistim_fem_tpu.ops.solve import solve_case
from pelvistim_fem_tpu.parallel.partition import (partition_case,
                                                  sharded_solve,
                                                  sharded_sweep_solve)


def test_sharded_solve_matches_single_device():
    case, _ = build_box_case()
    ref = solve_case(case, tol=1e-10)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("shard",))
    pc = partition_case(case, 8)
    res = sharded_solve(pc, mesh, tol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.phi), np.asarray(ref.phi),
                               atol=1e-12)


def test_partition_padding_is_inert():
    """Padded zero-volume elements contribute nothing."""
    case, _ = build_box_case()
    pc = partition_case(case, 7)  # forces padding (3000 % 7 != 0)
    assert pc.tets.shape[0] == 7
    total = pc.tets.shape[0] * pc.tets.shape[1]
    assert total >= case.n_tets
    mesh = Mesh(np.asarray(jax.devices()[:7]).reshape(7), ("shard",))
    res = sharded_solve(pc, mesh, tol=1e-10)
    ref = solve_case(case, tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.phi), np.asarray(ref.phi),
                               atol=1e-12)


def test_2d_case_x_shard_sweep():
    """dp-over-cases x element-sharded solve on a (4, 2) mesh."""
    case, params = build_pressure_case(coarse=True)
    pc = partition_case(case, 2)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("case", "shard"))
    tables = sigma_tables_for_sweep(case, params)[:4]
    out = sharded_sweep_solve(pc, tables, mesh, tol=1e-8, maxiter=30_000)
    assert out.phi.shape == (4, case.n_nodes)
    assert bool(out.converged.all())
    single = solve_case(case, tables[2], tol=1e-8, maxiter=30_000)
    np.testing.assert_allclose(np.asarray(out.phi[2]),
                               np.asarray(single.phi), rtol=1e-6,
                               atol=1e-9)


def test_2d_case_x_shard_sweep_mg():
    """MG-preconditioned case x shard sweep: the replicated-nodal
    V-cycle preconditioner must reproduce the single-device MG solves
    (same solutions) at a fraction of the Jacobi iteration count."""
    from pelvistim_fem_tpu.ops.multigrid import (batched_mg_solve,
                                                 build_hierarchy)
    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    from pelvistim_fem_tpu.parallel.partition import \
        sharded_sweep_solve_mg

    case, params, mesh_t = build_pressure_case(coarse=True,
                                               with_mesh=True)
    hd = stencil_host_data(case, mesh_t)
    sc = build_stencil_case(case, mesh_t, host_data=hd)
    hier = build_hierarchy(hd, dtype=sc.coeff.dtype)
    tables = sigma_tables_for_sweep(case, params)[:4]

    ref = batched_mg_solve(sc, hier, tables, tol=1e-8, maxiter=2000)
    pcase = partition_case(case, 2)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("case", "shard"))
    out = sharded_sweep_solve_mg(pcase, tables, mesh, hier,
                                 mesh_t.lattice.grid_index, tol=1e-8,
                                 maxiter=2000)
    assert bool(np.asarray(out.converged).all())
    # element vs stencil operators: same matrix, solutions match to tol
    scale = float(np.abs(np.asarray(ref.phi)).max())
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               rtol=0, atol=1e-6 * scale)
    # MG effectiveness carries over to the sharded element layout
    jac = sharded_sweep_solve(pcase, tables, mesh, tol=1e-8,
                              maxiter=30_000)
    assert int(np.asarray(out.iterations).max()) * 3 <= \
        int(np.asarray(jac.iterations).max())

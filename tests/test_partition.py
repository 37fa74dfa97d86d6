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


def test_owned_partition_matches_replicated():
    """Node-owned halo partition (VERDICT round-2 item 7): per-device
    nodal storage is ~N/S + halo instead of replicated N, and the solve
    matches the replicated-node decomposition."""
    import jax
    from jax.sharding import Mesh

    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.solve import solve_case
    from pelvistim_fem_tpu.parallel.partition import (partition_case_owned,
                                                      sharded_solve_owned)
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    ref = solve_case(case, tol=1e-9, maxiter=30_000)
    for n_dev in (4, 8):
        pc = partition_case_owned(case, n_dev)
        N = pc.n_nodes
        # memory contract: window width ~ N/S (+ element-span halo)
        assert pc.free_w.shape == (n_dev, pc.Q + pc.hR)
        assert pc.Q == -(-N // n_dev)
        assert pc.hR <= pc.Q
        m = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
        r = sharded_solve_owned(pc, m, tol=1e-9, maxiter=30_000)
        assert bool(r.converged)
        np.testing.assert_allclose(
            np.asarray(r.phi), np.asarray(ref.phi), rtol=0,
            atol=1e-8 * float(np.abs(np.asarray(ref.phi)).max()))


def test_owned_partition_megatet_scale():
    """>= 1M-tet partition on the virtual CPU mesh: the host partition
    stays vectorized (no per-shard Python loops over elements) and one
    sharded matvec matches the reference element SpMV."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pelvistim_fem_tpu.mesh.generate import box_mesh
    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.parallel.partition import (partition_case_owned,
                                                      sharded_solve_owned)
    m = box_mesh(0.04, 0.04, 0.02, 0.04 / 70)       # 70x70x35 -> 1.03M tets
    case = build_case(m, {1: 0.2}, mode="voltage", active_V=1.0,
                      dtype=jnp.float64)
    assert case.n_tets >= 1_000_000
    pc = partition_case_owned(case, 8)
    N = pc.n_nodes
    assert pc.free_w.shape[1] <= -(-N // 8) + pc.hR
    assert pc.hR <= pc.Q
    devmesh = Mesh(np.asarray(jax.devices()[:8]), ("x",))
    # a loose-tolerance solve exercises the full halo-exchange matvec
    # path at scale; the analytic solution certifies correctness
    r = sharded_solve_owned(pc, devmesh, tol=1e-8, maxiter=30_000)
    assert bool(r.converged)
    z = m.nodes[:, 2] / 0.02
    err = np.abs(np.asarray(r.phi) - z).max()
    # P1 represents z/Lz exactly, so err is pure solver error: rel
    # residual 1e-8 times the grid's kappa (~1e4) — the bit-level
    # machinery parity is covered by the small-mesh test above
    assert err < 5e-4, err


def test_owned_partition_refined_certified():
    """sharded_solve_owned_refined (round-4 VERDICT item 3): the
    node-owned memory-scaling partition reports a TRUE f64 residual at
    the reference 1e-8 contract, matching the single-device certified
    solver, at 2/4/8 devices."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.solve import solve_case_refined
    from pelvistim_fem_tpu.parallel.partition import (
        partition_case_owned, sharded_solve_owned_refined)

    case, params = build_pressure_case(coarse=True, dtype=jnp.float64)
    ref = solve_case_refined(case, tol=1e-8)
    assert bool(np.asarray(ref.converged))
    for n_dev in (2, 4, 8):
        pc = partition_case_owned(case, n_dev)
        m = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
        r = sharded_solve_owned_refined(pc, m, tol=1e-8)
        assert bool(np.asarray(r.converged)), n_dev
        # the reported residual is a TRUE f64 relative residual
        assert float(np.asarray(r.residual)) <= 1e-8, n_dev
        scale = float(np.abs(np.asarray(ref.phi)).max())
        np.testing.assert_allclose(
            np.asarray(r.phi), np.asarray(ref.phi), rtol=0,
            atol=2e-7 * scale)


def test_owned_refined_true_residual_is_honest():
    """The residual sharded_solve_owned_refined reports must equal an
    independently recomputed f64 ||b - A x|| / ||b|| on the unpartitioned
    operator (no recursive-residual lying)."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.solve import _case_operator
    from pelvistim_fem_tpu.parallel.partition import (
        partition_case_owned, sharded_solve_owned_refined)

    case, _ = build_pressure_case(coarse=True, dtype=jnp.float64)
    pc = partition_case_owned(case, 4)
    m = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    r = sharded_solve_owned_refined(pc, m, tol=1e-8)
    assert bool(np.asarray(r.converged))

    op, _, b_eff = _case_operator(case, case.sigma_table)
    res = b_eff - op(jnp.asarray(np.asarray(r.phi)))
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(b_eff))
    assert rel <= 1.2e-8, rel
    assert abs(rel - float(np.asarray(r.residual))) <= 0.3 * max(rel, 1e-12)


def test_owned_refined_amg_preconditioned():
    """AMG-composed owned partition (round-4 VERDICT item 5): the
    node-owned refined solve with the AMG V-cycle (distributed fine
    smoothing + replicated coarse tail) keeps the certified contract,
    matches the Jacobi-inner fields, and cuts inner iterations by
    >= 2x at 2/4/8 devices."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.amg import build_amg
    from pelvistim_fem_tpu.parallel.partition import (
        partition_case_owned, sharded_solve_owned_refined)

    case, params, mesh = build_pressure_case(coarse=True,
                                             dtype=jnp.float64,
                                             with_mesh=True)
    amg = build_amg(case, mesh=mesh, fine_ell=False)
    assert len(amg.levels) >= 2
    for n_dev in (2, 4, 8):
        pc = partition_case_owned(case, n_dev)
        m = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
        rj = sharded_solve_owned_refined(pc, m, tol=1e-8)
        ra = sharded_solve_owned_refined(pc, m, tol=1e-8, amg=amg)
        assert bool(np.asarray(ra.converged)), n_dev
        assert float(np.asarray(ra.residual)) <= 1e-8, n_dev
        scale = float(np.abs(np.asarray(rj.phi)).max())
        np.testing.assert_allclose(
            np.asarray(ra.phi), np.asarray(rj.phi), rtol=0,
            atol=4e-7 * scale)
        it_j, it_a = int(rj.iterations), int(ra.iterations)
        assert it_a * 2 <= it_j, (n_dev, it_a, it_j)

"""Partitioned single-solve: element-sharded SpMV + psum CG over a mesh.

The reference never partitions one solve (SURVEY.md section 5: the scaling
analogue of sequence parallelism in this domain is DOF count).  Here a
single large case is sharded across devices:

  * elements are split into contiguous shards (padded with zero-volume
    dummies), each device owning its shard's gather/einsum/segment-sum;
  * nodal vectors stay replicated; a `psum` over the mesh axis reduces
    the per-device partial nodal sums — CG's dot products then need no
    extra communication (all-replicated);
  * combined with a batch ("case") mesh axis this gives the 2-D
    dp-over-cases x element-sharded layout used by dryrun_multichip.

This is compute/bandwidth scaling with replicated node storage — the
right first partition for FEM SpMV on ICI (one psum per matvec); a
halo-partitioned node-owned layout can come later for memory scaling.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pelvistim_fem_tpu.ops import bc as bc_ops
# Per-device partial SpMV / diagonal reuse the assembly kernels directly:
# they carry the load-bearing precision=HIGHEST on their einsums (a local
# reimplementation without it hits the bf16-under-vmap landmine
# documented in CLAUDE.md).
from pelvistim_fem_tpu.ops.assembly import spmv as _local_spmv
from pelvistim_fem_tpu.ops.assembly import \
    stiffness_diagonal as _local_diag
from pelvistim_fem_tpu.ops.solve import SolveResult, jacobi_pcg


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PartitionedCase:
    """Element arrays reshaped to (n_shards, Ms, ...) with per-shard
    sorted scatter plans; nodal/BC arrays replicated."""
    tets: jax.Array            # (S, Ms, 4) i32
    grads: jax.Array           # (S, Ms, 4, 3)
    vol: jax.Array             # (S, Ms)   — 0 for padding elements
    tet_body: jax.Array        # (S, Ms) i32
    scatter_perm: jax.Array    # (S, 4*Ms) i32
    scatter_segids: jax.Array  # (S, 4*Ms) i32
    free_mask: jax.Array       # (N,) bool
    dirichlet_vals: jax.Array  # (N,)
    b_neumann: jax.Array       # (N,)
    sigma_table: jax.Array     # (T,)
    n_nodes: int = dataclasses.field(metadata=dict(static=True), default=0)


def partition_case(case, n_shards: int) -> PartitionedCase:
    """Split a Case's elements into n_shards padded shards (host-side)."""
    tets = np.asarray(case.tets)
    grads = np.asarray(case.grads)
    vol = np.asarray(case.vol)
    body = np.asarray(case.tet_body)
    M = tets.shape[0]
    Ms = -(-M // n_shards)
    pad = Ms * n_shards - M
    if pad:
        tets = np.concatenate([tets, np.zeros((pad, 4), np.int32)])
        grads = np.concatenate([grads, np.zeros((pad, 4, 3), grads.dtype)])
        vol = np.concatenate([vol, np.zeros(pad, vol.dtype)])
        body = np.concatenate([body, np.zeros(pad, np.int32)])

    tets = tets.reshape(n_shards, Ms, 4)
    perms = np.empty((n_shards, Ms * 4), np.int32)
    segs = np.empty((n_shards, Ms * 4), np.int32)
    for s in range(n_shards):
        flat = tets[s].reshape(-1)
        p = np.argsort(flat, kind="stable").astype(np.int32)
        perms[s] = p
        segs[s] = flat[p]

    f = lambda a: jnp.asarray(a)
    return PartitionedCase(
        tets=jnp.asarray(tets, jnp.int32),
        grads=f(grads.reshape(n_shards, Ms, 4, 3)),
        vol=f(vol.reshape(n_shards, Ms)),
        tet_body=jnp.asarray(body.reshape(n_shards, Ms), jnp.int32),
        scatter_perm=jnp.asarray(perms),
        scatter_segids=jnp.asarray(segs),
        free_mask=case.free_mask,
        dirichlet_vals=case.dirichlet_vals,
        b_neumann=case.b_neumann,
        sigma_table=case.sigma_table,
        n_nodes=int(case.nodes.shape[0]),
    )




def sharded_solve(pcase: PartitionedCase, mesh: Mesh, *, axis: str = "shard",
                  sigma_table=None, tol: float = 1e-8,
                  maxiter: int = 10_000) -> SolveResult:
    """Jacobi-PCG with the SpMV sharded over `axis` of the device mesh.

    Nodal vectors replicated; one psum per matvec rides ICI.
    """
    if sigma_table is None:
        sigma_table = pcase.sigma_table
    n = pcase.n_nodes
    elem_spec = P(axis)
    repl = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, elem_spec, elem_spec, elem_spec, elem_spec,
                       elem_spec),
             out_specs=repl)
    def dist_spmv(x, tets, grads, sigvol, perm, segids):
        y = _local_spmv(x, tets[0], grads[0], sigvol[0], perm[0], segids[0],
                        n)
        return jax.lax.psum(y, axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(elem_spec, elem_spec, elem_spec, elem_spec,
                       elem_spec),
             out_specs=repl)
    def dist_diag(tets, grads, sigvol, perm, segids):
        d = _local_diag(tets[0], grads[0], sigvol[0], perm[0], segids[0], n)
        return jax.lax.psum(d, axis)

    sigvol = sigma_table[pcase.tet_body] * pcase.vol

    def raw_spmv(x):
        return dist_spmv(x, pcase.tets, pcase.grads, sigvol,
                         pcase.scatter_perm, pcase.scatter_segids)

    op = bc_ops.make_projected_operator(raw_spmv, pcase.free_mask)
    diag_raw = dist_diag(pcase.tets, pcase.grads, sigvol,
                         pcase.scatter_perm, pcase.scatter_segids)
    diag = jnp.where(pcase.free_mask, diag_raw, 1.0)
    b_eff = bc_ops.effective_rhs(raw_spmv, pcase.free_mask,
                                 pcase.dirichlet_vals, pcase.b_neumann)
    x0 = jnp.where(pcase.free_mask, 0.0, pcase.dirichlet_vals)
    return jacobi_pcg(op, b_eff, diag, x0, tol=tol, maxiter=maxiter)


def sharded_sweep_solve(pcase: PartitionedCase, sigma_tables, mesh: Mesh, *,
                        case_axis: str = "case", shard_axis: str = "shard",
                        tol: float = 1e-8, maxiter: int = 10_000):
    """2-D parallel sweep: sigma tables data-parallel over `case_axis`,
    each solve's SpMV element-sharded over `shard_axis`.

    One shard_map over the full mesh (no vmap-of-shard_map resharding):
    each device holds its case-batch slice and element shard; every matvec
    psums over `shard_axis`; CG state is replicated within a case group.
    sigma_tables (B, T) with B a multiple of the case-axis size.
    """
    n_case = mesh.shape[case_axis]
    B = sigma_tables.shape[0]
    if B % n_case:
        raise ValueError(f"batch {B} not divisible by case axis {n_case}")
    n = pcase.n_nodes
    elem = P(shard_axis)
    repl = P()

    # check_vma=False: the CG carry mixes replicated-derived scalars (the
    # iteration counter) with case-varying state; functional correctness is
    # asserted against single-device solves in tests/test_partition.py.
    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(case_axis), elem, elem, elem, elem, elem, elem,
                       repl, repl, repl),
             out_specs=jax.tree_util.tree_map(
                 lambda _: P(case_axis),
                 SolveResult(phi=0, iterations=0, residual=0, converged=0)))
    def run(tables, tets, grads, vol, body, perm, segids,
            free, diri, bneu):
        tets, grads, vol = tets[0], grads[0], vol[0]
        body, perm, segids = body[0], perm[0], segids[0]

        def solve_one(table):
            sigvol = table[body] * vol

            def raw_spmv(x):
                y = _local_spmv(x, tets, grads, sigvol, perm, segids, n)
                return jax.lax.psum(y, shard_axis)

            op = bc_ops.make_projected_operator(raw_spmv, free)
            d = _local_diag(tets, grads, sigvol, perm, segids, n)
            d = jax.lax.psum(d, shard_axis)
            diag = jnp.where(free, d, 1.0)
            b_eff = bc_ops.effective_rhs(raw_spmv, free, diri, bneu)
            x0 = jnp.where(free, 0.0, diri)
            return jacobi_pcg(op, b_eff, diag, x0, tol=tol, maxiter=maxiter)

        return jax.vmap(solve_one)(tables)

    return run(jnp.asarray(sigma_tables), pcase.tets, pcase.grads,
               pcase.vol, pcase.tet_body, pcase.scatter_perm,
               pcase.scatter_segids, pcase.free_mask, pcase.dirichlet_vals,
               pcase.b_neumann)


def sharded_sweep_solve_mg(pcase: PartitionedCase, sigma_tables,
                           mesh: Mesh, hier, grid_index, *,
                           case_axis: str = "case",
                           shard_axis: str = "shard", tol: float = 1e-8,
                           maxiter: int = 2_000, nu: int = 2,
                           coarse_iters: int = 24):
    """2-D parallel sweep with a MULTIGRID-preconditioned CG.

    Same layout as sharded_sweep_solve (cases dp over `case_axis`,
    element-sharded SpMV with one psum per matvec over `shard_axis`),
    but each lane's CG is preconditioned by the lattice V-cycle
    (ops/multigrid): nodal vectors are replicated in this layout, so the
    preconditioner lifts the residual onto the lattice grid
    (`grid_index`), runs the V-cycle locally on every device (zero
    extra communication), and gathers back.  Requires the case to have
    lattice provenance (hier built from the same stencil_host_data).

    Cuts the dryrun case's 91-143 Jacobi iterations to the ~16 of the
    single-device MG solve — the iteration count no longer grows when a
    solve is spread over ICI.
    """
    from pelvistim_fem_tpu.ops.multigrid import make_v_cycle
    from pelvistim_fem_tpu.ops.solve import preconditioned_cg

    n_case = mesh.shape[case_axis]
    B = sigma_tables.shape[0]
    if B % n_case:
        raise ValueError(f"batch {B} not divisible by case axis {n_case}")
    n = pcase.n_nodes
    gshape = hier.levels[0].free.shape
    gidx = jnp.asarray(grid_index, jnp.int32)
    elem = P(shard_axis)
    repl = P()

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(case_axis), elem, elem, elem, elem, elem, elem,
                       repl, repl, repl),
             out_specs=jax.tree_util.tree_map(
                 lambda _: P(case_axis),
                 SolveResult(phi=0, iterations=0, residual=0, converged=0)))
    def run(tables, tets, grads, vol, body, perm, segids,
            free, diri, bneu):
        tets, grads, vol = tets[0], grads[0], vol[0]
        body, perm, segids = body[0], perm[0], segids[0]

        def lift(r):
            g = jnp.zeros(int(np.prod(gshape)), r.dtype)
            return g.at[gidx].set(r).reshape(gshape)

        def solve_one(table):
            sigvol = table[body] * vol

            def raw_spmv(x):
                y = _local_spmv(x, tets, grads, sigvol, perm, segids, n)
                return jax.lax.psum(y, shard_axis)

            op = bc_ops.make_projected_operator(raw_spmv, free)
            b_eff = bc_ops.effective_rhs(raw_spmv, free, diri, bneu)
            x0 = jnp.where(free, 0.0, diri)

            vcycle = make_v_cycle(hier, table, nu=nu,
                                  coarse_iters=coarse_iters)

            def M(r):
                rm = jnp.where(free, r, 0.0)
                z = vcycle(lift(rm)).reshape(-1)[gidx]
                return jnp.where(free, z, r)

            return preconditioned_cg(op, b_eff, M, x0, tol=tol,
                                     maxiter=maxiter)

        return jax.vmap(solve_one)(tables)

    return run(jnp.asarray(sigma_tables), pcase.tets, pcase.grads,
               pcase.vol, pcase.tet_body, pcase.scatter_perm,
               pcase.scatter_segids, pcase.free_mask, pcase.dirichlet_vals,
               pcase.b_neumann)

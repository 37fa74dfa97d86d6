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
    # per-shard sorted scatter plans, vectorized over the shard axis
    # (the previous per-shard Python argsort loop was quadratic-ish
    # pain at megatet imported-mesh sizes)
    flat = tets.reshape(n_shards, Ms * 4)
    perms = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
    segs = np.take_along_axis(flat, perms, axis=1).astype(np.int32)

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


# ── Node-owned halo partitioning (memory-scaling variant) ──────────────


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OwnedPartition:
    """Element shards with NODE storage partitioned too.

    Unlike PartitionedCase (nodal vectors replicated — compute scaling
    only), every nodal vector here lives as per-shard windows of width
    W = Q + hR: shard s owns global nodes [s*Q, (s+1)*Q) and carries a
    read-only halo of the next hR nodes.  Elements are assigned to the
    shard owning their smallest node index, so all four corners of any
    element fall inside its shard's window (hR = max element node
    span past the owned range; requires a locality node ordering —
    generated lattices are x-major already, imported meshes can be
    permuted with locality_order()).  Memory per device is ~N/S.
    """
    tets_w: jax.Array          # (S, Ms, 4) i32 — window-relative
    grads: jax.Array           # (S, Ms, 4, 3)
    vol: jax.Array             # (S, Ms) — 0 for padding elements
    tet_body: jax.Array        # (S, Ms) i32
    scatter_perm: jax.Array    # (S, 4*Ms) i32
    scatter_segids: jax.Array  # (S, 4*Ms) i32 — window-relative
    free_w: jax.Array          # (S, W) bool
    diri_w: jax.Array          # (S, W)
    bneu_w: jax.Array          # (S, W)
    owned_w: jax.Array         # (S, W) bool — owned AND < n_nodes
    sigma_table: jax.Array     # (T,)
    n_nodes: int = dataclasses.field(metadata=dict(static=True),
                                     default=0)
    Q: int = dataclasses.field(metadata=dict(static=True), default=0)
    hR: int = dataclasses.field(metadata=dict(static=True), default=0)


def locality_order(mesh):
    """Reverse-Cuthill-McKee node permutation for imported meshes whose
    native ordering has no locality (perm[new] = old).  Generated
    lattice meshes are already x-major and need no reordering."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    t = np.asarray(mesh.tets)
    n = int(t.max()) + 1
    i = np.repeat(t, 4, axis=1).reshape(-1)
    j = np.tile(t, (1, 4)).reshape(-1)
    A = sp.coo_matrix((np.ones_like(i, np.int8), (i, j)),
                      shape=(n, n)).tocsr()
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def partition_case_owned(case, n_shards: int) -> OwnedPartition:
    """Host-side node-owned partition of a Case (see OwnedPartition)."""
    tets = np.asarray(case.tets)
    grads = np.asarray(case.grads)
    vol = np.asarray(case.vol)
    body = np.asarray(case.tet_body)
    N = int(case.free_mask.shape[0])
    S = n_shards
    Q = -(-N // S)

    emin = tets.min(axis=1)
    emax = tets.max(axis=1)
    shard_of = emin // Q                          # (M,)
    hR = max(1, int((emax - (shard_of + 1) * Q + 1).max()))
    if hR > Q:
        raise ValueError(
            f"element node span {hR} exceeds owned width {Q}: the mesh "
            "node ordering has no locality — permute with "
            "locality_order() first")
    W = Q + hR

    counts = np.bincount(shard_of, minlength=S)
    Ms = int(counts.max())
    order = np.argsort(shard_of, kind="stable")
    offs = np.zeros(S + 1, np.int64)
    offs[1:] = np.cumsum(counts)

    def shardify(a, fill=0):
        out = np.full((S, Ms) + a.shape[1:], fill, a.dtype)
        for s in range(S):
            sl = order[offs[s]:offs[s + 1]]
            out[s, :len(sl)] = a[sl]
        return out

    tw = shardify(tets)
    # window-relative indices; padding elements point at slot 0 with
    # zero volume
    tw = tw - (np.arange(S) * Q)[:, None, None]
    for s in range(S):
        tw[s, counts[s]:] = 0
    gw = shardify(grads, 0.0)
    vw = shardify(vol, 0.0)
    bw = shardify(body)

    flat = tw.reshape(S, Ms * 4)
    perms = np.argsort(flat, axis=1, kind="stable").astype(np.int32)
    segs = np.take_along_axis(flat, perms, axis=1).astype(np.int32)

    def window(a, fill=0.0):
        dt = a.dtype
        pad = np.full(S * Q + hR - N, fill, dt)
        g = np.concatenate([np.asarray(a), pad])
        idx = (np.arange(S) * Q)[:, None] + np.arange(W)[None]
        return g[idx]

    gidx = (np.arange(S) * Q)[:, None] + np.arange(W)[None]
    owned = (np.arange(W)[None] < Q) & (gidx < N)

    return OwnedPartition(
        tets_w=jnp.asarray(tw, jnp.int32),
        grads=jnp.asarray(gw),
        vol=jnp.asarray(vw),
        tet_body=jnp.asarray(bw, jnp.int32),
        scatter_perm=jnp.asarray(perms),
        scatter_segids=jnp.asarray(segs),
        free_w=jnp.asarray(window(np.asarray(case.free_mask), False)),
        diri_w=jnp.asarray(window(np.asarray(case.dirichlet_vals))),
        bneu_w=jnp.asarray(window(np.asarray(case.b_neumann))),
        owned_w=jnp.asarray(owned),
        sigma_table=case.sigma_table,
        n_nodes=N, Q=Q, hR=hR,
    )


def _owned_complete(y, Q, hR, axis):
    """Turn per-shard window partial sums into globally consistent
    windows: (1) tail partials [Q:] ride one ppermute to the right
    neighbor's owned head; (2) the completed head rides one ppermute
    back to the left neighbor's tail ghost slots."""
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    zero = jnp.zeros((hR,) + y.shape[1:], y.dtype)
    if n == 1:
        return y.at[Q:].set(zero)
    right = [(j, j + 1) for j in range(n - 1)]
    left = [(j, j - 1) for j in range(1, n)]
    from_left = jax.lax.ppermute(y[Q:], axis, right)
    y = y.at[:hR].add(jnp.where(i == 0, zero, from_left))
    from_right = jax.lax.ppermute(y[:hR], axis, left)
    return y.at[Q:].set(jnp.where(i == n - 1, zero, from_right))


def sharded_solve_owned(pc: OwnedPartition, mesh: Mesh, *,
                        axis: str = "x", sigma_table=None,
                        tol: float = 1e-8,
                        maxiter: int = 10_000) -> SolveResult:
    """Jacobi-PCG with BOTH elements and nodes partitioned (window
    layout, 2 ppermutes per matvec over ICI).  The memory-scaling
    element-path partition: per-device storage is ~N/S nodal entries +
    its element shard — no replicated nodal vectors.  phi is returned
    gathered, in mesh node ordering."""
    if sigma_table is None:
        sigma_table = pc.sigma_table
    Q, hR, W = pc.Q, pc.hR, pc.Q + pc.hR
    n = pc.n_nodes
    sigvol = sigma_table[pc.tet_body] * pc.vol
    sh = P(axis)
    repl = P()

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(sh, sh, sh, sh, sh, sh, sh, sh, sh),
             out_specs=(sh, P(), P(), P()))
    def run(tets, grads, sv, perm, segids, free, diri, bneu, owned):
        tets, grads, sv = tets[0], grads[0], sv[0]
        perm, segids = perm[0], segids[0]
        free, diri = free[0], diri[0]
        bneu, owned = bneu[0], owned[0]

        def raw_spmv(x):
            y = _local_spmv(x, tets, grads, sv, perm, segids, W)
            return _owned_complete(y, Q, hR, axis)

        def op(x):
            xm = jnp.where(free, x, 0.0)
            return jnp.where(free, raw_spmv(xm), x)

        red = lambda a: jax.lax.psum(jnp.sum(jnp.where(owned, a, 0.0)),
                                     axis)
        dot = lambda a, b: red(a * b)
        nrm = lambda a: jnp.sqrt(red(a * a))

        d = _local_diag(tets, grads, sv, perm, segids, W)
        d = _owned_complete(d, Q, hR, axis)
        diag = jnp.where(free & (d != 0), d, 1.0)
        minv = 1.0 / diag
        phi_d = jnp.where(free, 0.0, diri)
        b_eff = jnp.where(free, bneu - raw_spmv(phi_d), diri)
        x0 = phi_d

        bnorm = nrm(b_eff)
        tol_abs = tol * bnorm
        r0 = b_eff - op(x0)
        z0 = minv * r0
        state0 = (x0, r0, z0, dot(r0, z0), z0, jnp.int32(0),
                  nrm(r0) <= tol_abs)

        def cond(s):
            *_, k, done = s
            return jnp.logical_not(done) & (k < maxiter)

        def body(s):
            x, r, z, rz, p, k, _ = s
            ap = op(p)
            alpha = rz / dot(p, ap)
            x = x + alpha * p
            r = r - alpha * ap
            z = minv * r
            rz_n = dot(r, z)
            beta = rz_n / rz
            p = z + beta * p
            return (x, r, z, rz_n, p, k + 1, nrm(r) <= tol_abs)

        x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
        rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
        # gather owned slices -> (S*Q,) global vector
        return x[:Q], k, rel, rel <= tol

    xo, k, rel, conv = run(pc.tets_w, pc.grads, sigvol, pc.scatter_perm,
                           pc.scatter_segids, pc.free_w, pc.diri_w,
                           pc.bneu_w, pc.owned_w)
    phi = xo.reshape(-1)[:n]
    return SolveResult(phi=phi, iterations=k, residual=rel,
                       converged=conv)


def sharded_solve_owned_refined(pc: OwnedPartition, mesh: Mesh, *,
                                axis: str = "x", sigma_table=None,
                                tol: float = 1e-8, inner_tol: float = 3e-4,
                                maxiter: int = 10_000,
                                max_refinements: int = 8) -> SolveResult:
    """sharded_solve_owned at the TRUE f64-certified tolerance (round-4
    VERDICT item 3): an f64 window-layout master operator measures real
    residuals; f32 Jacobi-PCG solves each residual-correction system;
    the loop refines until ||b - A x||/||b|| <= tol in f64.  Same
    memory scaling as sharded_solve_owned (~N/S nodal storage per
    device, 2 ppermutes per matvec) — the reported residual now carries
    the same 1e-8 contract as every other solver axis (reference
    tolerance contract: step03 params.yaml:91-93).

    Requires jax_enable_x64 (window arrays are cast to both precisions
    here, whatever dtype pc holds)."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("sharded_solve_owned_refined")
    if sigma_table is None:
        sigma_table = pc.sigma_table
    Q, hR, W = pc.Q, pc.hR, pc.Q + pc.hR
    n = pc.n_nodes
    sigvol64 = (sigma_table.astype(jnp.float64)[pc.tet_body]
                * pc.vol.astype(jnp.float64))
    sh = P(axis)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(sh, sh, sh, sh, sh, sh, sh, sh, sh),
             out_specs=(sh, P(), P(), P()))
    def run(tets, grads64, sv64, perm, segids, free, diri, bneu, owned):
        tets, grads64, sv64 = tets[0], grads64[0], sv64[0]
        perm, segids = perm[0], segids[0]
        free, diri = free[0], diri[0].astype(jnp.float64)
        bneu, owned = bneu[0].astype(jnp.float64), owned[0]
        grads32 = grads64.astype(jnp.float32)
        sv32 = sv64.astype(jnp.float32)

        def make_op(grads, sv):
            def raw(x):
                y = _local_spmv(x, tets, grads, sv, perm, segids, W)
                return _owned_complete(y, Q, hR, axis)

            def op(x):
                xm = jnp.where(free, x, 0.0)
                return jnp.where(free, raw(xm), x)

            return raw, op

        raw64, op64 = make_op(grads64, sv64)
        _, op32 = make_op(grads32, sv32)

        red = lambda a: jax.lax.psum(jnp.sum(jnp.where(owned, a, 0.0)),
                                     axis)
        dot = lambda a, b: red(a * b)
        nrm = lambda a: jnp.sqrt(red(a * a))

        # Jacobi diagonal from the f32 operator (preconditioner only)
        d = _local_diag(tets, grads32, sv32, perm, segids, W)
        d = _owned_complete(d, Q, hR, axis)
        diag = jnp.where(free & (d != 0), d, 1.0)
        minv = 1.0 / diag

        phi_d = jnp.where(free, 0.0, diri)
        b64 = jnp.where(free, bneu - raw64(phi_d), diri)
        bnorm = nrm(b64)
        bsafe = jnp.where(bnorm > 0, bnorm, 1.0)

        def inner_cg(b32, tol_k):
            """f32 Jacobi-PCG on the correction system (x0 = 0)."""
            tol_abs = tol_k * nrm(b32)
            r0 = b32
            z0 = minv * r0
            st0 = (jnp.zeros_like(b32), r0, z0, dot(r0, z0), z0,
                   jnp.int32(0), nrm(r0) <= tol_abs)

            def cond(s):
                *_, k, done = s
                return jnp.logical_not(done) & (k < maxiter)

            def body(s):
                x, r, z, rz, p, k, _ = s
                ap = op32(p)
                den = dot(p, ap)
                alpha = rz / jnp.where(den != 0, den, 1.0)
                x = x + alpha * p
                r = r - alpha * ap
                z = minv * r
                rz_n = dot(r, z)
                beta = rz_n / jnp.where(rz != 0, rz, 1.0)
                return (x, r, z, rz_n, z + beta * p, k + 1,
                        nrm(r) <= tol_abs)

            x, *_, k, _ = jax.lax.while_loop(cond, body, st0)
            return x, k

        def refine(carry):
            x, rel_old, total_it, k = carry
            r64 = b64 - op64(x)
            # adaptive per-pass inner tolerance (the single-device
            # refined solvers' schedule, ops/multigrid.py)
            need = 0.25 * tol / jnp.minimum(rel_old, 1.0)
            tol_k = jnp.clip(need, inner_tol, 0.05)
            dx, it = inner_cg(r64.astype(jnp.float32), tol_k)
            x_n = x + dx.astype(jnp.float64)
            rel_n = nrm(b64 - op64(x_n)) / bsafe
            return (x_n, rel_n, total_it + it, k + 1)

        def cond(carry):
            _, rel, _, k = carry
            return (rel > tol) & (k < max_refinements)

        x, rel, total_it, _ = jax.lax.while_loop(
            cond, refine,
            (phi_d, nrm(b64 - op64(phi_d)) / bsafe, jnp.int32(0),
             jnp.int32(0)))
        return x[:Q], total_it, rel, rel <= tol

    xo, k, rel, conv = run(pc.tets_w, pc.grads.astype(jnp.float64),
                           sigvol64, pc.scatter_perm, pc.scatter_segids,
                           pc.free_w, pc.diri_w, pc.bneu_w, pc.owned_w)
    phi = xo.reshape(-1)[:n]
    return SolveResult(phi=phi, iterations=k, residual=rel,
                       converged=conv)

"""Domain-decomposed stencil solve: x-slab partitioning + halo exchange.

The stencil fast path's multi-chip form: the lattice is split into
contiguous x-slabs across the device mesh; every matvec exchanges one
boundary plane with each neighbor over ICI (two `ppermute`s) and CG dot
products reduce with `psum`.  Unlike parallel/partition.py (element
sharding with replicated nodal vectors), this partitions NODE storage
too — the layout that scales a single solve's memory footprint, the
lattice analogue of halo-partitioned FEM domain decomposition.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pelvistim_fem_tpu.ops.solve import SolveResult
from pelvistim_fem_tpu.ops.stencil import (DIAG_OFFSET, OFFSETS,
                                           StencilCase, combine_coeffs,
                                           stencil_spmv)


def _halo_spmv(x_local, C_local, axis):
    """Local 27-point stencil with x-halo exchange over `axis`.

    x_local (Xl, Y, Z); C_local (27, Xl, Y, Z).  The first/last x-planes
    of the neighboring shards arrive via ppermute (edge shards receive
    zeros, matching the global zero halo).
    """
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    down = [(j, (j + 1) % n) for j in range(n)]   # j -> j+1
    up = [(j, (j - 1) % n) for j in range(n)]     # j -> j-1

    last = x_local[-1]                             # plane sent down
    first = x_local[0]                             # plane sent up
    from_above = jax.lax.ppermute(last, axis, down)
    from_below = jax.lax.ppermute(first, axis, up)
    zero = jnp.zeros_like(first)
    from_above = jnp.where(i == 0, zero, from_above)
    from_below = jnp.where(i == n - 1, zero, from_below)

    Xl, Y, Z = x_local.shape
    xp = jnp.pad(x_local, ((0, 0), (1, 1), (1, 1)))
    xp = jnp.concatenate([
        jnp.pad(from_above, ((1, 1), (1, 1)))[None],
        xp,
        jnp.pad(from_below, ((1, 1), (1, 1)))[None],
    ], axis=0)                                     # (Xl+2, Y+2, Z+2)

    y = jnp.zeros_like(x_local)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        win = jax.lax.slice(xp, (1 + dx, 1 + dy, 1 + dz),
                            (1 + dx + Xl, 1 + dy + Y, 1 + dz + Z))
        y = y + C_local[o] * win
    return y


def sharded_stencil_solve(scase: StencilCase, mesh: Mesh, *,
                          axis: str = "x", sigma_table=None,
                          tol: float = 1e-8,
                          maxiter: int = 10_000) -> SolveResult:
    """Jacobi-PCG with the grid partitioned into x-slabs over `axis`.

    Pads X up to a multiple of the axis size with inert (non-free)
    planes.  phi is returned gathered, in mesh node ordering.
    """
    if sigma_table is None:
        sigma_table = scase.sigma_table
    n_dev = mesh.shape[axis]
    X, Y, Z = scase.grid_shape
    Xp = -(-X // n_dev) * n_dev
    pad = Xp - X

    def padx(a, fill=0.0):
        if pad == 0:
            return a
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    C = combine_coeffs(scase.coeff, sigma_table)
    C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    free = padx(scase.free, False)
    diri = padx(scase.dirichlet)
    bneu = padx(scase.b_neumann)

    spec3 = P(axis)      # shard leading (x) dim
    spec4 = P(None, axis)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec4, spec3, spec3, spec3),
             out_specs=(spec3, P(), P(), P()))
    def run(C_l, free_l, diri_l, bneu_l):
        def op(x):
            xm = jnp.where(free_l, x, 0.0)
            y = _halo_spmv(xm, C_l, axis)
            return jnp.where(free_l, y, x)

        red = lambda a: jax.lax.psum(jnp.sum(a), axis)
        dot = lambda a, b: red(a * b)
        nrm = lambda a: jnp.sqrt(red(a * a))

        diag = jnp.where(free_l & (C_l[DIAG_OFFSET] != 0),
                         C_l[DIAG_OFFSET], 1.0)
        minv = 1.0 / diag
        phi_d = jnp.where(free_l, 0.0, diri_l)
        b_eff = jnp.where(free_l,
                          bneu_l - _halo_spmv(phi_d, C_l, axis), diri_l)
        x0 = phi_d

        bnorm = nrm(b_eff)
        tol_abs = tol * bnorm
        r0 = b_eff - op(x0)
        z0 = minv * r0
        rz0 = dot(r0, z0)
        state0 = (x0, r0, z0, rz0, z0, jnp.int32(0),
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
            return (x, r, z, rz_n, p, k + 1,
                    nrm(r) <= tol_abs)

        x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
        rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
        return x, k, rel, rel <= tol

    x, k, rel, conv = run(C, free, diri, bneu)
    phi_nodes = x[:X].reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=conv)


def _fine_vcycle_setup(hier, sigma_table, X: int, Xp: int):
    """Host/device prep for the x-slab-sharded V-cycle (run OUTSIDE the
    shard_map): level-0 transfer factors split per axis — the sharded x
    factor as a (Xp, ncx) matrix padded with zero rows for inert planes —
    plus the REPLICATED coarse-level combined coefficients.

    Returns (tr: dict of static transfer constants, C_coarse, free_coarse).
    """
    tr0 = hier.prolongs[0]
    P0x_np = np.zeros((Xp, tr0.P_axis[0].shape[1]))
    P0x_np[:X] = tr0.P_axis[0]
    tr = dict(P0x=P0x_np, s1=tr0.slots[1], s2=tr0.slots[2],
              w1=tr0.weights[1], w2=tr0.weights[2],
              ncy=tr0.nc[1], ncz=tr0.nc[2])
    C_coarse = tuple(combine_coeffs(lv.coeff, sigma_table)
                     for lv in hier.levels[1:])
    free_coarse = tuple(lv.free for lv in hier.levels[1:])
    return tr, C_coarse, free_coarse


def _make_sharded_M(tr, hier, C_l, free_l, C_co, free_co, axis, *,
                    nu, omega, coarse_iters):
    """Build the V-cycle preconditioner apply M(b)->z INSIDE a shard_map
    body.

    Layout: the fine level (memory/bandwidth-dominant) smooths and takes
    residuals sharded with the 1-plane halo exchange; fine->coarse
    restriction applies the y/z trilinear factors locally and the x
    factor as a psum-reduced local GEMM into a REPLICATED coarse grid;
    levels 1..L run replicated on every device via
    ops.multigrid.cycle_impl — the exact recursion of the single-device
    V-cycle, so iteration counts match solve_stencil_mg.
    """
    from pelvistim_fem_tpu.ops.multigrid import cycle_impl

    dt = C_l.dtype
    i = jax.lax.axis_index(axis)
    Xl = C_l.shape[1]
    s1, s2 = tr["s1"], tr["s2"]
    ncy, ncz = tr["ncy"], tr["ncz"]
    v1 = jnp.asarray(tr["w1"], dt)
    v2 = jnp.asarray(tr["w2"], dt)

    def op(x):
        xm = jnp.where(free_l, x, 0.0)
        return jnp.where(free_l, _halo_spmv(xm, C_l, axis), x)

    diag_v = jnp.where(free_l & (C_l[DIAG_OFFSET] != 0),
                       C_l[DIAG_OFFSET], 1.0)
    dinv_v = 1.0 / diag_v

    def restrict_yz(x):
        y = (jnp.zeros((Xl, ncy, x.shape[2]), dt)
             .at[:, s1].add(x * v1[None, :, None])
             .at[:, s1 + 1].add(x * (1 - v1)[None, :, None]))
        y = (jnp.zeros((Xl, ncy, ncz), dt)
             .at[:, :, s2].add(y * v2[None, None, :])
             .at[:, :, s2 + 1].add(y * (1 - v2)[None, None, :]))
        return y

    def prolong_yz(x):
        a = (x[:, s1] * v1[None, :, None]
             + x[:, s1 + 1] * (1 - v1)[None, :, None])
        return (a[:, :, s2] * v2[None, None, :]
                + a[:, :, s2 + 1] * (1 - v2)[None, None, :])

    hi = jax.lax.Precision.HIGHEST
    Px = jnp.asarray(tr["P0x"], dt)                   # (Xp, ncx)
    start = (i * Xl).astype(jnp.int32)
    Ploc = jax.lax.dynamic_slice(Px, (start, jnp.int32(0)),
                                 (Xl, Px.shape[1]))

    def restrict_full(r):
        # local y/z factors, then psum-reduced x GEMM -> replicated
        t = restrict_yz(r)                            # (Xl, ncy, ncz)
        part = jnp.einsum("xc,xyz->cyz", Ploc, t, precision=hi)
        return jax.lax.psum(part, axis)

    def prolong_full(xc):
        t = jnp.einsum("xc,cyz->xyz", Ploc, xc, precision=hi)
        return prolong_yz(t)

    def smooth(x, b, n):
        return jax.lax.fori_loop(
            0, n, lambda _, x: x + omega * dinv_v * (b - op(x)), x)

    # replicated coarse-level ops (exactly _level_op's formulation)
    def coarse_op(l):
        Cc, fc = C_co[l], free_co[l]
        diag = jnp.where(fc & (Cc[DIAG_OFFSET] != 0),
                         Cc[DIAG_OFFSET], 1.0)

        def o(x):
            xm = jnp.where(fc, x, 0.0)
            return jnp.where(fc, stencil_spmv(xm, Cc), x)

        return o, diag

    coarse_ops = [coarse_op(l) for l in range(len(C_co))]

    def M(b):
        x = smooth(jnp.zeros_like(b), b, nu)
        rr = b - op(x)
        rc = restrict_full(rr)
        rc = jnp.where(free_co[0], rc, 0.0)
        xc = cycle_impl(coarse_ops, list(free_co),
                        hier.prolongs[1:], hier.restricts[1:], rc,
                        nu=nu, omega=omega, coarse_iters=coarse_iters)
        x = x + prolong_full(xc)
        return smooth(x, b, nu)

    return M


def _pcg_psum(op, b, M, x0, *, tol, maxiter, axis):
    """preconditioned_cg's exact recursion with psum-reduced dot
    products over `axis` (call inside a shard_map body).  `tol` may be a
    traced scalar (the refinement schedule's adaptive per-pass
    tolerance).  Returns (x, iterations)."""
    red = lambda a: jax.lax.psum(jnp.sum(a), axis)
    dot = lambda a, b: red(a * b)
    nrm = lambda a: jnp.sqrt(red(a * a))

    bnorm = nrm(b)
    tol_abs = jnp.maximum(tol * bnorm, 0.0)

    r0 = b - op(x0)
    z0 = M(r0)
    rz0 = dot(r0, z0)
    done0 = nrm(r0) <= tol_abs
    state0 = (x0, r0, z0, rz0, z0, jnp.int32(0), done0)

    def cond(state):
        *_, k, done = state
        return jnp.logical_not(done) & (k < maxiter)

    def body(state):
        x, r, z, rz, p, k, done = state
        ap = op(p)
        alpha = rz / dot(p, ap)
        x_n = x + alpha * p
        r_n = r - alpha * ap
        z_n = M(r_n)
        rz_n = dot(r_n, z_n)
        beta = rz_n / rz
        p_n = z_n + beta * p
        sel = lambda new, old: jnp.where(done, old, new)
        x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
        rz, p, k = sel(rz_n, rz), sel(p_n, p), sel(k + 1, k)
        done = done | (nrm(r) <= tol_abs)
        return (x, r, z, rz, p, k, done)

    x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
    return x, k


def sharded_stencil_solve_mg(scase: StencilCase, hier, mesh: Mesh, *,
                             axis: str = "x", sigma_table=None,
                             tol: float = 1e-8, maxiter: int = 2_000,
                             nu: int = 2, omega: float = 0.7,
                             coarse_iters: int = 24) -> SolveResult:
    """Multigrid-preconditioned CG with x-slab domain decomposition.

    V-cycle layout over the device mesh:
      * FINE level (the memory/bandwidth-dominant one): smoothing and
        residuals run sharded with the same 1-plane halo exchange the
        SpMV uses (_halo_spmv).
      * Fine->coarse restriction: the y/z trilinear factors apply
        locally (unsharded axes); the x factor is each device's local
        dense GEMM against its slice of the transfer matrix, psum-reduced
        over ICI into a REPLICATED coarse grid.
      * Levels 1..L run replicated on every device (identical redundant
        compute, zero communication) via ops.multigrid.cycle_impl — the
        exact recursion of the single-device V-cycle, so iteration
        counts match solve_stencil_mg.  One coarsening shrinks the grid
        ~8x, so the replicated tail is a rounding error in both memory
        and FLOPs — the standard coarse-level agglomeration trade.

    `hier` is the (sigma-independent) MGHierarchy built on the host from
    the same stencil_host_data as `scase`.  Replaces the role of the
    reference's UMFPACK direct solve at scales where Jacobi-CG iteration
    counts blow up (cf. VERDICT: 91-143 Jacobi iters vs ~16 MG-CG on the
    dryrun case).
    """
    if len(hier.levels) < 2:
        # Grid too small to have coarsened — MG degenerates; the plain
        # Jacobi-PCG decomposition is the right tool at that size.
        return sharded_stencil_solve(scase, mesh, axis=axis,
                                     sigma_table=sigma_table, tol=tol,
                                     maxiter=maxiter)
    if sigma_table is None:
        sigma_table = scase.sigma_table
    n_dev = mesh.shape[axis]
    X, Y, Z = scase.grid_shape
    Xp = -(-X // n_dev) * n_dev
    pad = Xp - X

    def padx(a, fill=0.0):
        if pad == 0:
            return a
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    C = combine_coeffs(scase.coeff, sigma_table)
    C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    free = padx(scase.free, False)
    diri = padx(scase.dirichlet)
    bneu = padx(scase.b_neumann)

    # Level-0 transfer factors + replicated coarse data (combined with
    # sigma once, outside the shard_map).  Padded fine x-planes get zero
    # transfer rows — they are inert (non-free, zero coefficients).
    tr, C_coarse, free_coarse = _fine_vcycle_setup(hier, sigma_table, X,
                                                   Xp)

    spec3 = P(axis)
    spec4 = P(None, axis)
    repl = jax.tree_util.tree_map(lambda _: P(), (C_coarse, free_coarse))

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec4, spec3, spec3, spec3) + repl,
             out_specs=(spec3, P(), P(), P()))
    def run(C_l, free_l, diri_l, bneu_l, C_co, free_co):
        def op(x):
            xm = jnp.where(free_l, x, 0.0)
            return jnp.where(free_l, _halo_spmv(xm, C_l, axis), x)

        red = lambda a: jax.lax.psum(jnp.sum(a), axis)
        dot = lambda a, b: red(a * b)
        nrm = lambda a: jnp.sqrt(red(a * a))

        M = _make_sharded_M(tr, hier, C_l, free_l, C_co, free_co, axis,
                            nu=nu, omega=omega,
                            coarse_iters=coarse_iters)

        # ── MG-PCG (mirrors ops.multigrid.solve_stencil_mg) ──
        phi_d = jnp.where(free_l, 0.0, diri_l)
        b_eff = jnp.where(free_l,
                          bneu_l - _halo_spmv(phi_d, C_l, axis), diri_l)
        x0 = phi_d
        bnorm = nrm(b_eff)
        tol_abs = tol * bnorm

        r0 = b_eff - op(x0)
        z0 = jnp.where(free_l, M(jnp.where(free_l, r0, 0.0)), r0)
        rz0 = dot(r0, z0)
        done0 = nrm(r0) <= tol_abs
        state0 = (x0, r0, z0, rz0, z0, jnp.int32(0), done0)

        def cond(state):
            *_, k, done = state
            return jnp.logical_not(done) & (k < maxiter)

        def body(state):
            x, r, z, rz, p, k, done = state
            ap = op(p)
            alpha = rz / dot(p, ap)
            x_n = x + alpha * p
            r_n = r - alpha * ap
            z_n = jnp.where(free_l, M(jnp.where(free_l, r_n, 0.0)), r_n)
            rz_n = dot(r_n, z_n)
            beta = rz_n / rz
            p_n = z_n + beta * p
            sel = lambda new, old: jnp.where(done, old, new)
            x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
            rz, p, k = sel(rz_n, rz), sel(p_n, p), sel(k + 1, k)
            done = done | (nrm(r) <= tol_abs)
            return (x, r, z, rz, p, k, done)

        x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
        rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
        return x, k, rel, rel <= tol

    x, k, rel, conv = run(C, free, diri, bneu, C_coarse, free_coarse)
    phi_nodes = x[:X].reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=conv)


def sharded_stencil_solve_mg_refined(scase: StencilCase, hier,
                                     mesh: Mesh, *, axis: str = "x",
                                     sigma_table=None, tol: float = 1e-8,
                                     inner_tol: float = 3e-4,
                                     maxiter: int = 2_000, nu: int = 2,
                                     omega: float = 0.7,
                                     coarse_iters: int = 24,
                                     max_refinements: int = 8
                                     ) -> SolveResult:
    """CERTIFIED 1e-8 on multi-chip: x-slab-sharded mixed-precision MG
    solve — f32 sharded MG-CG inner sweeps + f64 residual correction
    whose residual SpMV uses the SAME halo exchange.

    The reference solves EVERY case at tol 1e-8 with a direct LU whose
    residual is exact by construction (step03 params.yaml:92,
    step01_box/case.sif:41-44).  The single-device refined solvers
    (ops/multigrid.solve_stencil_mg_refined) honor that contract; this
    is their domain-decomposed form, so a solve spread over ICI meets
    the same certified TRUE-f64-residual tolerance instead of the
    single-precision recursive residual (untrustworthy at the 7000x
    material contrast — PARITY.md).

    Composition (exactly the single-device refinement recursion,
    distributed):
      * fine level x-slab sharded; f64 master operator C64 and f32
        inner operator C32 both local, 1-plane halo exchange per SpMV;
      * each refinement pass measures r64 = b64 - A64 x with psum-
        reduced f64 norms, then solves the correction with the f32
        MG-PCG of sharded_stencil_solve_mg (same V-cycle layout:
        sharded fine level, replicated coarse tail) to the adaptive
        per-pass tolerance of solve_stencil_mg_refined;
      * iteration counts therefore match solve_stencil_mg_refined
        within rounding of the distributed dot products (tested +-1 at
        2/4/8 devices).

    `scase`/`hier` may be f64 or f32 pytrees (sharded or not); both
    precisions are derived here.  Requires jax_enable_x64.
    """
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("sharded_stencil_solve_mg_refined")
    if sigma_table is None:
        sigma_table = scase.sigma_table
    sig64 = sigma_table.astype(jnp.float64)
    sig32 = sigma_table.astype(jnp.float32)

    if len(hier.levels) < 2:
        # Grid too small to have coarsened: run the Jacobi-PCG
        # decomposition on the FULL f64 operator — exact residual by
        # construction at that (tiny) size.
        to64 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, scase)
        return sharded_stencil_solve(to64, mesh, axis=axis,
                                     sigma_table=sig64, tol=tol,
                                     maxiter=10 * maxiter)

    n_dev = mesh.shape[axis]
    X, Y, Z = scase.grid_shape
    Xp = -(-X // n_dev) * n_dev
    pad = Xp - X

    def padx(a, fill=0.0):
        if pad == 0:
            return a
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    # Master (f64) and inner (f32) combined operators, both padded.
    # Mirrors solve_stencil_mg_refined: the f32 operator is combined
    # from the f32-cast per-body stacks, not rounded from C64.
    C64 = jnp.pad(combine_coeffs(scase.coeff.astype(jnp.float64), sig64),
                  ((0, 0), (0, pad), (0, 0), (0, 0)))
    C32 = jnp.pad(combine_coeffs(scase.coeff.astype(jnp.float32), sig32),
                  ((0, 0), (0, pad), (0, 0), (0, 0)))
    free = padx(scase.free, False)
    diri = padx(scase.dirichlet.astype(jnp.float64))
    bneu = padx(scase.b_neumann.astype(jnp.float64))

    hier32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, hier)
    tr, C_coarse, free_coarse = _fine_vcycle_setup(hier32, sig32, X, Xp)

    spec3 = P(axis)
    spec4 = P(None, axis)
    repl = jax.tree_util.tree_map(lambda _: P(), (C_coarse, free_coarse))

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec4, spec4, spec3, spec3, spec3) + repl,
             out_specs=(spec3, P(), P(), P()))
    def run(C64_l, C32_l, free_l, diri_l, bneu_l, C_co, free_co):
        red = lambda a: jax.lax.psum(jnp.sum(a), axis)
        nrm = lambda a: jnp.sqrt(red(a * a))

        def op64(x):
            xm = jnp.where(free_l, x, 0.0)
            return jnp.where(free_l, _halo_spmv(xm, C64_l, axis), x)

        def op32(x):
            xm = jnp.where(free_l, x, 0.0)
            return jnp.where(free_l, _halo_spmv(xm, C32_l, axis), x)

        M = _make_sharded_M(tr, hier32, C32_l, free_l, C_co, free_co,
                            axis, nu=nu, omega=omega,
                            coarse_iters=coarse_iters)
        Mp = lambda r: jnp.where(free_l, M(jnp.where(free_l, r, 0.0)), r)

        phi_d = jnp.where(free_l, 0.0, diri_l)
        b64 = jnp.where(free_l,
                        bneu_l - _halo_spmv(phi_d, C64_l, axis), diri_l)
        bnorm = nrm(b64)

        def refine(carry):
            x, rel_old, total_it, k = carry
            done = rel_old <= tol
            r64 = b64 - op64(x)
            # Adaptive inner tolerance (solve_stencil_mg_refined's
            # schedule): later passes only need tol/rel_old (x4 safety).
            need = 0.25 * tol / jnp.minimum(rel_old, 1.0)
            tol_k = jnp.clip(need, inner_tol, 0.05)
            dx, it = _pcg_psum(op32, r64.astype(jnp.float32), Mp,
                               jnp.zeros_like(r64, jnp.float32),
                               tol=tol_k, maxiter=maxiter, axis=axis)
            x_n = x + dx.astype(jnp.float64)
            rel_n = nrm(b64 - op64(x_n)) / jnp.where(bnorm > 0, bnorm,
                                                     1.0)
            sel = lambda new, old: jnp.where(done, old, new)
            return (sel(x_n, x), sel(rel_n, rel_old),
                    sel(total_it + it, total_it), k + 1)

        def cond(carry):
            _, rel, _, k = carry
            return (rel > tol) & (k < max_refinements)

        x, rel, total_it, _ = jax.lax.while_loop(
            cond, refine, (phi_d, jnp.float64(jnp.inf), jnp.int32(0),
                           jnp.int32(0)))
        return x, total_it, rel, rel <= tol

    x, k, rel, conv = run(C64, C32, free, diri, bneu, C_coarse,
                          free_coarse)
    phi_nodes = x[:X].reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=conv)

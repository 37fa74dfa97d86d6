"""Smoothed-aggregation AMG for unstructured (imported) meshes.

The reference's UMFPACK factors ANY mesh directly (selected at
step01_box/case.sif:41-42, used for every step03 case —
run_layered_sweep.py:459-504).  Generated lattices replace it with the
geometric-MG stencil path (ops/multigrid.py); imported unstructured
meshes previously had only Jacobi-PCG (ops/solve.py), which pays
100s-1000s of iterations at the reference's 7000x tissue contrast where
lattice MG-CG takes ~20.  This module closes that performance class:

  * HOST (numpy/scipy.sparse, one-time): assemble the free-dof stiffness
    CSR, drop weak couplings (|a_ij| >= theta sqrt(a_ii a_jj)), greedy
    Vanek aggregation, tentative piecewise-constant P smoothed by one
    damped-Jacobi step, Galerkin coarse operators A_c = P^T A P.
  * DEVICE (jitted): the V-cycle applies every level as a padded-ELL
    SpMV (row-major gather + multiply + sum — static shapes, no dynamic
    sparsity), damped-Jacobi smoothing, fixed-iteration CG on the
    coarsest level — the same SPD-preconditioner contract as
    multigrid.make_v_cycle, so it drops into preconditioned_cg and the
    mixed-precision refinement loop unchanged.

The hierarchy is sigma-dependent (built from the combined operator at
the case's sigma_table), unlike the body-factored lattice hierarchy —
imported-mesh workloads are single-case solves, not material sweeps.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops import assembly, bc as bc_ops
from pelvistim_fem_tpu.ops.solve import (SolveResult, preconditioned_cg,
                                         require_x64)


def _host_problem(case, mesh, sigma_table):
    """Host numpy (tets, grads, vol, tet_body, free, sigma) for the
    hierarchy build.

    Prefers the host TetMesh (mesh.geometry() + compute_bc_host) —
    reading Case device arrays back is slow over the axon tunnel and
    bool-mask readbacks specifically take minutes (CLAUDE.md); the
    device-readback fallback exists for callers without the mesh (CPU
    workflows like crossval_elmer)."""
    if mesh is not None:
        from pelvistim_fem_tpu.models.case import compute_bc_host
        grads, vol = mesh.geometry()
        free, *_ = compute_bc_host(
            mesh, mode=case.meta.mode, active_V=case.meta.active_V,
            injected_current_A=case.meta.I_target_A)
        tets, body = mesh.tets, mesh.tet_body
    else:
        tets = np.asarray(case.tets)
        grads = np.asarray(case.grads, np.float64)
        vol = np.asarray(case.vol, np.float64)
        body = np.asarray(case.tet_body)
        free = np.asarray(case.free_mask)
    if sigma_table is None:
        # the case's CURRENT table, not meta.sigma_table_host: callers
        # may have dataclasses.replace()d sigma_table after the build
        # (tests/test_amg.py does), and the fine-ELL operator assembled
        # here must match what the solve runs at.  (T,)-float readback
        # is a one-time ~RTT cost, unlike the bool-array landmine.
        sig = np.asarray(case.sigma_table, np.float64)
    else:
        sig = np.asarray(sigma_table, np.float64)
    return tets, grads, vol, body, np.asarray(free, bool), sig


def _assemble_csr(tets, grads, vol, body, free, sigma_table):
    """Free-dof stiffness CSR (host, f64) from element data.

    Same element stiffness K_e = sigma_e V_e G_e G_e^T the matrix-free
    SpMV applies (ops/assembly.py:86-99), materialized once for the
    hierarchy build.  Rows/cols restricted to free dofs (Dirichlet
    elimination = the projected-operator semantics of ops/bc.py).
    """
    import scipy.sparse as sp

    n = free.shape[0]
    free_idx = np.flatnonzero(free)
    sig_e = sigma_table[body]

    # Native path (csrc assemble_csr_free[_grads]): one counting pass +
    # per-row merge — the scipy coo->csr->slice chain below measured
    # 9.5 s of a 12 s hierarchy build at 870k tets
    # (dev/amg_setup_breakdown.py), i.e. the dominant cost of every
    # --adapt-local cycle.  The scalar-sigma form computes k_ab inline
    # from grads (no (M,16) Ke materialization at all).
    from pelvistim_fem_tpu import native
    fmap = np.full(n, -1, np.int32)
    fmap[free_idx] = np.arange(free_idx.size, dtype=np.int32)
    if sig_e.ndim != 3:
        nat = native.assemble_csr_free_grads(
            np.asarray(tets), np.asarray(grads, np.float64),
            np.asarray(sig_e * vol, np.float64), fmap, free_idx.size)
        if nat is not None:
            indptr, indices, data = nat
            A = sp.csr_matrix((data, indices, indptr),
                              shape=(free_idx.size, free_idx.size))
            return A, free_idx

    if sig_e.ndim == 3:          # (T, 3, 3) tensor table (ops/aniso.py)
        Ke = np.einsum("mid,mde,mje->mij", grads, sig_e,
                       grads) * vol[:, None, None]
    else:
        sigvol = sig_e * vol
        Ke = np.einsum("mid,mjd->mij", grads,
                       grads) * sigvol[:, None, None]
    nat = native.assemble_csr_free(np.asarray(tets), Ke, fmap,
                                   free_idx.size)
    if nat is not None:
        indptr, indices, data = nat
        A = sp.csr_matrix((data, indices, indptr),
                          shape=(free_idx.size, free_idx.size))
        return A, free_idx

    rows = np.repeat(tets, 4, axis=1).reshape(-1)         # (M*16,)
    cols = np.tile(tets, (1, 4)).reshape(-1)
    A = sp.coo_matrix((Ke.reshape(-1), (rows, cols)),
                      shape=(n, n)).tocsr()
    A = A[free_idx][:, free_idx].tocsr()
    A.sum_duplicates()
    return A, free_idx


def _strength_graph(A, theta):
    """Symmetric strength-of-connection filter: keep a_ij with
    |a_ij| >= theta * sqrt(a_ii * a_jj) (off-diagonal)."""
    import scipy.sparse as sp

    d = np.asarray(A.diagonal())
    d = np.where(d > 0, d, 1.0)
    C = A.tocoo()
    mask = (C.row != C.col) & (
        np.abs(C.data) >= theta * np.sqrt(d[C.row] * d[C.col]))
    return sp.csr_matrix(
        (np.ones(mask.sum()), (C.row[mask], C.col[mask])), shape=A.shape)


def _aggregate(S):
    """Greedy Vanek aggregation on the strength graph S (CSR).

    Pass 1: a root whose strong neighborhood is untouched becomes an
    aggregate with all its strong neighbors.  Pass 2: remaining nodes
    join an adjacent aggregate.  Pass 3: leftovers form aggregates from
    their unaggregated strong neighborhoods.  Returns (agg (n,) int64 in
    [0, n_agg), n_agg)."""
    n = S.shape[0]
    indptr, indices = S.indptr, S.indices
    agg = np.full(n, -1, np.int64)
    n_agg = 0
    # pass 1
    for i in range(n):
        if agg[i] != -1:
            continue
        nbr = indices[indptr[i]:indptr[i + 1]]
        if (agg[nbr] == -1).all():
            agg[i] = n_agg
            agg[nbr] = n_agg
            n_agg += 1
    # pass 2: attach to a neighboring aggregate
    unassigned = np.flatnonzero(agg == -1)
    pending = agg.copy()
    for i in unassigned:
        nbr = indices[indptr[i]:indptr[i + 1]]
        tagged = pending[nbr]
        tagged = tagged[tagged != -1]
        if tagged.size:
            agg[i] = tagged[0]
    # pass 3: leftovers (isolated clusters)
    for i in range(n):
        if agg[i] != -1:
            continue
        nbr = indices[indptr[i]:indptr[i + 1]]
        grp = np.concatenate([[i], nbr[agg[nbr] == -1]])
        agg[grp] = n_agg
        n_agg += 1
    return agg, n_agg


def _rho_dinv_a(A, iters=12):
    """Power-method estimate of rho(D^{-1} A) (host)."""
    d = np.asarray(A.diagonal())
    dinv = 1.0 / np.where(d > 0, d, 1.0)
    n = A.shape[0]
    v = np.sin(np.arange(n) * 12.9898 + 0.5)        # deterministic seed
    for _ in range(iters):
        w = dinv * (A @ v)
        nrm = np.linalg.norm(w)
        v = w / max(nrm, 1e-300)
    w = dinv * (A @ v)
    return float(v @ w / max(v @ v, 1e-300))


def _to_ell(A, dtype):
    """CSR -> padded ELL device arrays (cols (n, k) i32, vals (n, k)).

    Padding entries point at column 0 with value 0 — the gather stays
    in-bounds and contributes nothing."""
    A = A.tocsr()
    A.sum_duplicates()
    n = A.shape[0]
    nnz = np.diff(A.indptr)
    k = max(int(nnz.max()) if n else 1, 1)
    cols = np.zeros((n, k), np.int32)
    vals = np.zeros((n, k), np.float64)
    for i in range(n):
        s, e = A.indptr[i], A.indptr[i + 1]
        cols[i, :e - s] = A.indices[s:e]
        vals[i, :e - s] = A.data[s:e]
    return jnp.asarray(cols), jnp.asarray(vals, dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AMGLevel:
    a_cols: jax.Array      # (n, kA) i32 ELL of A (levels >= 1; level 0
    a_vals: jax.Array      # uses the matrix-free element SpMV instead)
    diag: jax.Array        # (n,)
    p_cols: jax.Array      # (n, kP) ELL of P (this level <- coarser)
    p_vals: jax.Array
    r_cols: jax.Array      # (nc, kR) ELL of R = P^T
    r_vals: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AMGHierarchy:
    levels: tuple          # tuple[AMGLevel]; levels[-1] has empty p/r
    free_idx: jax.Array    # (nf,) i32 free-dof gather indices
    # Row-sorted padded-ELL form of the FINE free-dof operator (round-4
    # VERDICT item 2): the per-element gather/einsum/segment-sum SpMV
    # measured ~290 ms/apply at 1M tets on v5e — TPU-hostile scatter —
    # while the nodal ELL form is one gather + row-sum.  f32 for the
    # hot inner V-cycle/CG, f64 for residual certification.  Empty
    # when built with fine_ell=False (callers fall back to the
    # matrix-free element SpMV).
    fine_cols: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 1), jnp.int32))
    fine_vals: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 1), jnp.float32))
    fine_vals64: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 1), jnp.float64))
    n_nodes: int = dataclasses.field(metadata=dict(static=True),
                                     default=0)
    theta: float = dataclasses.field(metadata=dict(static=True),
                                     default=0.0)


def build_amg(case, sigma_table=None, *, mesh=None, theta=0.08,
              coarse_n=400, max_levels=12, fine_ell=True, rcm=True,
              dtype=jnp.float32) -> AMGHierarchy:
    """Build the smoothed-aggregation hierarchy (host, one-time).

    mesh: the host TetMesh the case was built from — pass it when
    available to keep the build free of device readbacks (see
    _host_problem).
    theta: strength threshold (Vanek's 0.08 default, halved per level).
    coarse_n: stop coarsening below this many dofs (the V-cycle's fixed
    coarse CG must solve the coarsest level nearly exactly — same
    trade documented for the lattice hierarchy, multigrid.py:252-257).
    """
    import scipy.sparse as sp

    A, free_idx = _assemble_csr(*_host_problem(case, mesh, sigma_table))
    if rcm:
        # Reverse-Cuthill-McKee on the free dofs: imported meshes'
        # native numbering has no locality, which scatters the fine
        # ELL gather x[cols] across HBM.  The permutation lives only
        # inside the hierarchy's free-dof space (free_idx carries it
        # back to full vectors), so callers see nothing.
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
        A = A[perm][:, perm].tocsr()
        A.sum_duplicates()
        free_idx = free_idx[perm]

    levels_host = []
    lvl_theta = theta
    while True:
        n = A.shape[0]
        d = np.asarray(A.diagonal())
        levels_host.append(dict(A=A, diag=np.where(d > 0, d, 1.0)))
        if n <= coarse_n or len(levels_host) >= max_levels:
            break
        S = _strength_graph(A, lvl_theta)
        agg, n_agg = _aggregate(S)
        if n_agg >= n or n_agg == 0:
            break                      # no coarsening progress
        T = sp.csr_matrix((np.ones(n), (np.arange(n), agg)),
                          shape=(n, n_agg))
        # One damped-Jacobi smoothing step: P = (I - omega D^-1 A) T.
        # (Smoothing with the weak-coupling-FILTERED matrix — the
        # classic jump treatment — was measured NEUTRAL at theta=0.08
        # and harmful at 0.25 on the hard-contrast step04 case, so the
        # raw-A form stays.)
        omega = 4.0 / (3.0 * max(_rho_dinv_a(A), 1e-30))
        Dinv = sp.diags(1.0 / levels_host[-1]["diag"])
        P = (T - omega * (Dinv @ (A @ T))).tocsr()
        A = (P.T @ (A @ P)).tocsr()
        A.sum_duplicates()
        levels_host[-1]["P"] = P
        lvl_theta *= 0.5

    # ship: level-0 A stays matrix-free (the element SpMV); coarser
    # levels as ELL
    levels = []
    for li, lv in enumerate(levels_host):
        if li == 0:
            a_cols = jnp.zeros((0, 1), jnp.int32)
            a_vals = jnp.zeros((0, 1), dtype)
        else:
            a_cols, a_vals = _to_ell(lv["A"], dtype)
        if "P" in lv:
            p_cols, p_vals = _to_ell(lv["P"], dtype)
            r_cols, r_vals = _to_ell(lv["P"].T.tocsr(), dtype)
        else:
            p_cols = r_cols = jnp.zeros((0, 1), jnp.int32)
            p_vals = r_vals = jnp.zeros((0, 1), dtype)
        levels.append(AMGLevel(
            a_cols=a_cols, a_vals=a_vals,
            diag=jnp.asarray(lv["diag"], dtype),
            p_cols=p_cols, p_vals=p_vals,
            r_cols=r_cols, r_vals=r_vals))
    if fine_ell:
        f_cols, f_vals64 = _to_ell(levels_host[0]["A"], jnp.float64)
        f_vals32 = f_vals64.astype(jnp.float32)
    else:
        f_cols = jnp.zeros((0, 1), jnp.int32)
        f_vals32 = jnp.zeros((0, 1), jnp.float32)
        f_vals64 = jnp.zeros((0, 1), jnp.float64)
    return AMGHierarchy(levels=tuple(levels),
                        free_idx=jnp.asarray(free_idx, jnp.int32),
                        fine_cols=f_cols, fine_vals=f_vals32,
                        fine_vals64=f_vals64,
                        n_nodes=int(case.free_mask.shape[0]),
                        theta=theta)


def _ell_spmv(x, cols, vals):
    """y = A x for padded-ELL (n, k) arrays: one gather + row sum."""
    return jnp.sum(vals * x[cols], axis=1)


def make_amg_preconditioner(amg: AMGHierarchy, fine_op=None, *, nu=2,
                            omega=0.85, coarse_iters=24,
                            start_level=0):
    """SPD V-cycle apply M(r)->z on FREE-DOF vectors.

    fine_op: the level-0 free-dof operator apply (compressed (nf,)
    vectors).  None selects the hierarchy's fine ELL (f32) — the TPU
    fast form; CEM/EQS callers pass their own (complex / shunted)
    operators explicitly.

    start_level: return the cycle entered at this level instead of 0 —
    start_level=1 yields the COARSE-LEVELS-ONLY cycle (a (n1,)-vector
    apply) used by distributed solvers that smooth the sharded fine
    level themselves and run the replicated coarse tail per device
    (parallel/partition.sharded_solve_owned_refined, the composition
    SCALING.md's memory ladder defers to)."""
    n_levels = len(amg.levels)
    if fine_op is None and start_level == 0:
        if not amg.fine_cols.size:
            raise ValueError("hierarchy built with fine_ell=False "
                             "requires an explicit fine_op")
        fc, fv = amg.fine_cols, amg.fine_vals
        fine_op = lambda x: _ell_spmv(x, fc, fv.astype(x.dtype))

    def level_op(li):
        if li == 0:
            return fine_op
        lv = amg.levels[li]
        return lambda x: _ell_spmv(x, lv.a_cols, lv.a_vals)

    ops = [level_op(li) for li in range(n_levels)]

    def cycle(li, b):
        op = ops[li]
        dinv = 1.0 / amg.levels[li].diag
        if li == n_levels - 1:
            z0 = dinv * b

            def cg_body(_, st):
                x, r, p, rz = st
                ap = op(p)
                denom = jnp.sum(p * ap)
                alpha = rz / jnp.where(denom != 0, denom, 1.0)
                x = x + alpha * p
                r = r - alpha * ap
                z = dinv * r
                rz_n = jnp.sum(r * z)
                beta = rz_n / jnp.where(rz != 0, rz, 1.0)
                return (x, r, z + beta * p, rz_n)

            x, *_ = jax.lax.fori_loop(
                0, coarse_iters, cg_body,
                (jnp.zeros_like(b), b, z0, jnp.sum(b * z0)))
            return x

        def smooth(x, bb):
            return jax.lax.fori_loop(
                0, nu, lambda _, x: x + omega * dinv * (bb - op(x)), x)

        lv = amg.levels[li]
        x = smooth(jnp.zeros_like(b), b)
        r = b - op(x)
        rc = _ell_spmv(r, lv.r_cols, lv.r_vals)
        xc = cycle(li + 1, rc)
        x = x + _ell_spmv(xc, lv.p_cols, lv.p_vals)
        return smooth(x, b)

    return lambda r: cycle(start_level, r)


def _fine_pieces(case, sigma_table, amg):
    """(full-vector projected op, free-dof fine op, b_eff, diag_full).
    sigma_table (T,) scalar or (T, 3, 3) tensor per body."""
    sigma_e = sigma_table[case.tet_body]
    if sigma_e.ndim == 3:
        sigvol = sigma_e * case.vol[:, None, None]
    else:
        sigvol = sigma_e * case.vol
    n = case.free_mask.shape[0]

    def raw_spmv(x):
        return assembly.spmv(x, case.tets, case.grads, sigvol,
                             case.scatter_perm, case.scatter_segids, n)

    op = bc_ops.make_projected_operator(raw_spmv, case.free_mask)
    b_eff = bc_ops.effective_rhs(raw_spmv, case.free_mask,
                                 case.dirichlet_vals, case.b_neumann)
    fidx = amg.free_idx

    def fine_op(xf):
        x = jnp.zeros(n, xf.dtype).at[fidx].set(xf)
        return raw_spmv(x)[fidx]

    return op, fine_op, b_eff


def _ell_full_op(amg, free_mask, n, vals):
    """Full-vector projected operator from the fine free-dof ELL:
    identity on constrained dofs, A_ff on free dofs (the same
    semantics as bc.make_projected_operator composed with the
    free-dof gather/scatter)."""
    fidx = amg.free_idx
    cols = amg.fine_cols

    def op(x):
        yf = _ell_spmv(x[fidx], cols, vals.astype(x.dtype))
        y = jnp.zeros(n, x.dtype).at[fidx].set(yf)
        return jnp.where(free_mask, y, x)

    return op


def _lift_M(Mf, amg, free_mask, n):
    """Free-dof V-cycle -> full-vector SPD preconditioner."""
    fidx = amg.free_idx

    def M(r):
        rf = r[fidx]
        zf = Mf(rf)
        z = jnp.zeros(n, r.dtype).at[fidx].set(zf)
        return jnp.where(free_mask, z, r)

    return M


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu", "omega",
                                   "coarse_iters"))
def solve_case_amg(case, amg: AMGHierarchy, sigma_table=None, *,
                   tol=1e-8, maxiter=2_000, nu=2, omega=0.85,
                   coarse_iters=24) -> SolveResult:
    """AMG-preconditioned CG on the element path (drop-in for
    solve_case on meshes without lattice provenance)."""
    use_ell = sigma_table is None and amg.fine_cols.size
    if sigma_table is None:
        sigma_table = case.sigma_table
    n = case.free_mask.shape[0]
    op, fine_op, b_eff = _fine_pieces(case, sigma_table, amg)
    if use_ell:
        # TPU fast form: nodal ELL replaces the per-element
        # gather/scatter for every CG + smoother apply (b_eff above
        # still uses the element SpMV once, for the Dirichlet lift).
        # Valid ONLY at the hierarchy's own sigma (sigma_table=None);
        # explicit tables keep the exact matrix-free element operator.
        # Operator values at the CASE's precision (feeding the f32 copy
        # to an f64 case would make the converged recursive residual
        # lie by ~kappa * 1e-7 — measured 3.9e-9 recursive vs 2.9e-3
        # TRUE on the hard-contrast fixture).
        vals = (amg.fine_vals64
                if case.sigma_table.dtype == jnp.float64
                else amg.fine_vals)
        op = _ell_full_op(amg, case.free_mask, n, vals)
        fine_op = None
    Mf = make_amg_preconditioner(amg, fine_op, nu=nu, omega=omega,
                                 coarse_iters=coarse_iters)
    M = _lift_M(Mf, amg, case.free_mask, n)
    x0 = jnp.where(case.free_mask, 0.0, case.dirichlet_vals)
    return preconditioned_cg(op, b_eff, M, x0, tol=tol, maxiter=maxiter)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "omega", "coarse_iters",
                                   "max_refinements"))
def solve_case_amg_refined(case, amg: AMGHierarchy, sigma_table=None, *,
                           tol=1e-8, inner_tol=3e-4, maxiter=2_000,
                           nu=2, omega=0.85, coarse_iters=24,
                           max_refinements=8) -> SolveResult:
    """CERTIFIED 1e-8 on imported meshes: f32 AMG-CG inner sweeps + f64
    residual correction against the f64 element operator — the
    unstructured twin of multigrid.solve_stencil_mg_refined (same
    adaptive per-pass tolerance schedule; converged lanes freeze under
    vmap).  Requires jax_enable_x64; build `amg` in f32."""
    require_x64("solve_case_amg_refined")
    use_ell = sigma_table is None and amg.fine_cols.size
    if sigma_table is None:
        sigma_table = case.sigma_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    case64, case32 = to(case, jnp.float64), to(case, jnp.float32)
    # cast coarse levels to f32 but KEEP the dual-precision fine ELL
    amg32 = dataclasses.replace(
        to(amg, jnp.float32), fine_cols=amg.fine_cols,
        fine_vals=amg.fine_vals, fine_vals64=amg.fine_vals64)
    n = case.free_mask.shape[0]
    op64, _, b64 = _fine_pieces(case64, sigma_table.astype(jnp.float64),
                                amg32)
    op32, fine32, _ = _fine_pieces(case32,
                                   sigma_table.astype(jnp.float32),
                                   amg32)
    if use_ell:
        op64 = _ell_full_op(amg, case.free_mask, n, amg.fine_vals64)
        op32 = _ell_full_op(amg, case.free_mask, n, amg.fine_vals)
        fine32 = None
    Mf = make_amg_preconditioner(amg32, fine32, nu=nu, omega=omega,
                                 coarse_iters=coarse_iters)
    M32 = _lift_M(Mf, amg32, case.free_mask, n)

    bnorm = jnp.sqrt(jnp.sum(b64 * b64))
    x = jnp.where(case.free_mask, 0.0, case64.dirichlet_vals)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        tol_k = jnp.clip(0.25 * tol / jnp.minimum(rel_old, 1.0),
                         inner_tol, 0.05)
        res = preconditioned_cg(op32, r64.astype(jnp.float32), M32,
                                jnp.zeros_like(r64, jnp.float32),
                                tol=tol_k, maxiter=maxiter)
        x_n = x + res.phi.astype(jnp.float64)
        rel_n = jnp.sqrt(jnp.sum((b64 - op64(x_n)) ** 2)) / jnp.where(
            bnorm > 0, bnorm, 1.0)
        sel = lambda new, old: jnp.where(done, old, new)
        return (sel(x_n, x), sel(rel_n, rel_old),
                sel(total_it + res.iterations, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return (rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = jax.lax.while_loop(
        cond, refine, (x, jnp.float64(jnp.inf), jnp.int32(0),
                       jnp.int32(0)))
    return SolveResult(phi=x, iterations=total_it, residual=rel,
                       converged=rel <= tol)

"""Linear solvers: Jacobi-preconditioned CG in `lax.while_loop`.

This replaces the reference's UMFPACK sparse direct LU (selected at
step01_box/case.sif:41-42, parameterized at step03 params.yaml:91-93).
The conduction system is SPD, so preconditioned CG is the TPU-idiomatic
choice: the whole iteration is gathers, small einsums, a sorted
segment-sum and dot products — no factorization, no dynamic sparsity.

Convergence target mirrors the reference solver tolerance 1e-8
(params.yaml:92) as a relative residual ||r|| / ||b|| <= tol.  A
mixed-precision mode (f32 inner CG + f64 residual/iterative refinement)
is provided for TPU where native f64 is emulated and slow.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops import assembly, bc as bc_ops


def require_x64(fn_name: str) -> None:
    """Refined (certified-residual) solvers contractually measure their
    residual against an f64 master operator.  With jax_enable_x64 off,
    dtype canonicalization silently turns every 'f64' array into f32 and
    the reported residual becomes exactly the lying-f32 recursive
    residual these APIs exist to prevent — so fail loudly instead."""
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            f"{fn_name} requires jax_enable_x64: without it the 'f64 "
            "master operator' canonicalizes to f32 and the returned "
            "residual is no longer a certified true residual")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    phi: jax.Array          # (N,) potential
    iterations: jax.Array   # scalar i32
    residual: jax.Array     # scalar — final ||r|| / ||b||
    converged: jax.Array    # scalar bool


def jacobi_pcg(op, b, diag, x0, *, tol=1e-8, maxiter=10_000):
    """Preconditioned CG for SPD `op` with Jacobi preconditioner diag.

    Runs in the dtype of `b`. Returns SolveResult. `tol` is relative to
    ||b|| (matching the Elmer linear-system convergence semantics).
    """
    dtype = b.dtype
    minv = jnp.where(diag > 0, 1.0 / diag, jnp.asarray(1.0, dtype))
    return preconditioned_cg(op, b, lambda r: minv * r, x0, tol=tol,
                             maxiter=maxiter)


def preconditioned_cg(op, b, M, x0, *, tol=1e-8, maxiter=10_000):
    """CG for SPD `op` with a general SPD preconditioner apply M(r)->z
    (jacobi_pcg is the diagonal special case; ops/multigrid's V-cycle is
    the other caller).  Converged lanes FREEZE under vmap."""
    dtype = b.dtype

    # Elementwise multiply-reduce dots: under vmap, jnp.vdot would batch
    # into an MXU matmul at default (bf16-ish) precision and wreck CG
    # convergence; sum(a*b) stays a full-precision VPU reduction.
    dot = lambda a, b: jnp.sum(a * b)
    nrm = lambda a: jnp.sqrt(jnp.sum(a * a))

    bnorm = jnp.sqrt(jnp.sum(b * b))
    tol_abs = jnp.maximum(tol * bnorm, jnp.asarray(0.0, dtype))

    r0 = b - op(x0)
    z0 = M(r0)
    rz0 = dot(r0, z0)
    done0 = nrm(r0) <= tol_abs
    state0 = (x0, r0, z0, rz0, z0, jnp.int32(0), done0)

    def cond(state):
        *_, k, done = state
        return jnp.logical_not(done) & (k < maxiter)

    def body(state):
        # Once `done`, the state is frozen.  Under vmap the batched loop
        # runs until ALL lanes finish; without freezing, finished lanes
        # would keep iterating and (in f32) drift back above tolerance,
        # livelocking the batch at maxiter.
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

    x, r, _, _, _, k, _ = jax.lax.while_loop(cond, body, state0)
    rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
    return SolveResult(phi=x, iterations=k, residual=rel,
                       converged=rel <= tol)


def _case_operator(case, sigma_table):
    """(spmv closure incl. Dirichlet projection, diag, b_eff) for a Case.

    sigma_table (T,) scalar per body, or (T, 3, 3) SYMMETRIC tensor per
    body (anisotropic tissue — ops/aniso.py builds tables from fiber
    directions).  Tensor tables flow through every solve_case* entry
    point and the vmapped/sharded material sweeps unchanged."""
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
    diag_raw = assembly.stiffness_diagonal(
        case.tets, case.grads, sigvol,
        case.scatter_perm, case.scatter_segids, n)
    diag = jnp.where(case.free_mask, diag_raw, 1.0)
    b_eff = bc_ops.effective_rhs(raw_spmv, case.free_mask,
                                 case.dirichlet_vals, case.b_neumann)
    return op, diag, b_eff


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve_case(case, sigma_table=None, *, tol=1e-8, maxiter=10_000):
    """Solve div(sigma grad phi) = 0 with the Case's BCs.

    sigma_table (T,) overrides case.sigma_table — keep it a traced argument
    to vmap conductivity sweeps with zero re-assembly (the TPU-native form
    of step04's 15-case sigma_contact loop, run_pressure_sweep.py:709-738).
    """
    if sigma_table is None:
        sigma_table = case.sigma_table
    op, diag, b_eff = _case_operator(case, sigma_table)
    x0 = jnp.where(case.free_mask, 0.0, case.dirichlet_vals)
    return jacobi_pcg(op, b_eff, diag, x0, tol=tol, maxiter=maxiter)


@partial(jax.jit, static_argnames=("tol", "maxiter", "inner_tol",
                                   "max_refinements"))
def solve_case_refined(case, sigma_table=None, *, tol=1e-8,
                       inner_tol=1e-6, maxiter=10_000, max_refinements=4):
    """Mixed-precision solve: f32 CG inner iterations, f64 residual
    correction (iterative refinement) until the f64 relative residual
    meets `tol`.

    On TPU native f64 is software-emulated, so running the O(maxiter) CG
    loop in f32 and only the few refinement residuals in f64 reaches the
    reference's 1e-8 tolerance at f32 speed.  Converged lanes FREEZE
    under vmap (same contract as solve_stencil_refined).
    """
    require_x64("solve_case_refined")
    if sigma_table is None:
        sigma_table = case.sigma_table

    case64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype,
                                                          jnp.floating) else a,
        case)
    case32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if jnp.issubdtype(a.dtype,
                                                          jnp.floating) else a,
        case)
    op64, _, b64 = _case_operator(case64, sigma_table.astype(jnp.float64))
    op32, diag32, _ = _case_operator(case32, sigma_table.astype(jnp.float32))

    bnorm = jnp.linalg.norm(b64)
    x = jnp.where(case.free_mask, 0.0, case64.dirichlet_vals)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        # Adaptive inner tolerance: a pass starting at true rel_old only
        # needs a tol/rel_old reduction (x4 safety), not the full
        # inner_tol sweep — pass 1 (rel_old=inf) clips to inner_tol.
        tol_k = jnp.clip(0.25 * tol / jnp.minimum(rel_old, 1.0),
                         inner_tol, 0.05)
        res = jacobi_pcg(op32, r64.astype(jnp.float32), diag32,
                         jnp.zeros_like(r64, jnp.float32),
                         tol=tol_k, maxiter=maxiter)
        x_n = x + res.phi.astype(jnp.float64)
        rel_n = jnp.linalg.norm(b64 - op64(x_n)) / jnp.where(
            bnorm > 0, bnorm, 1.0)
        # Converged lanes freeze: under vmap the batched loop runs until
        # ALL lanes meet tol; without the freeze, finished lanes keep
        # running loose 5%-clipped correction passes (wasted iterations).
        sel = lambda new, old: jnp.where(done, old, new)
        return (sel(x_n, x), sel(rel_n, rel_old),
                sel(total_it + res.iterations, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return (rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = jax.lax.while_loop(
        cond, refine, (x, jnp.float64(jnp.inf), jnp.int32(0), jnp.int32(0)))
    return SolveResult(phi=x, iterations=total_it, residual=rel,
                       converged=rel <= tol)

"""Lead-field solves + injected-current-pattern optimization.

The lead-field matrix of a K-electrode array is K solves of ONE
operator (only the Neumann load differs — models/array.py builds the
basis specs on a shared lattice).  TPU-natively that is a single
vmapped certified-MG batch over the RHS axis — the same
zero-re-assembly discipline the material sweeps use
(ops/multigrid.batched_mg_solve_refined), batching the LOAD instead of
the sigma table.  The reference pipeline would re-run the
Gmsh+ElmerGrid+ElmerSolver subprocess chain per electrode (and has no
multi-electrode geometry at all — step02 run_sweep.py:66-79 hard-codes
one pair).

By superposition, phi(i) = sum_k i_k phi_k for any injected pattern
i in R^K (the return pad carries -sum i_k), so stimulation design —
maximize directional E in a target ROI subject to a total-current
budget, per-electrode caps, and a skin current-density safety limit —
becomes a small convex program over the lead vectors, solved with
jitted projected gradient ascent on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.multigrid import (MGHierarchy,
                                             solve_stencil_mg,
                                             solve_stencil_mg_refined)
from pelvistim_fem_tpu.ops.stencil import StencilCase


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "max_refinements"))
def solve_basis_refined(scase: StencilCase, hier: MGHierarchy, loads,
                        *, tol=1e-8, inner_tol=3e-4, maxiter=2_000,
                        nu=2, coarse_iters=24, max_refinements=8):
    """K certified solves of one operator with K Neumann loads.

    loads: (K, X, Y, Z) grid-form b_neumann stack (each basis spec's
    `b_neumann`).  Returns a K-batched SolveResult with TRUE
    f64-certified residuals (solve_stencil_mg_refined contract) —
    converged lanes freeze, so easy basis cases don't pay for hard
    ones.
    """
    return jax.vmap(
        lambda b: solve_stencil_mg_refined(
            dataclasses.replace(scase, b_neumann=b), hier, tol=tol,
            inner_tol=inner_tol, maxiter=maxiter, nu=nu,
            coarse_iters=coarse_iters, max_refinements=max_refinements)
    )(loads)


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu",
                                   "coarse_iters"))
def solve_basis(scase: StencilCase, hier: MGHierarchy, loads, *,
                tol=1e-8, maxiter=2_000, nu=2, coarse_iters=24):
    """Uncertified (single-precision-residual) variant of
    solve_basis_refined — for soft-contrast problems or f32 pipelines."""
    return jax.vmap(
        lambda b: solve_stencil_mg(
            dataclasses.replace(scase, b_neumann=b), hier, tol=tol,
            maxiter=maxiter, nu=nu, coarse_iters=coarse_iters)
    )(loads)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "max_refinements"))
def solve_basis_ensemble_refined(scase: StencilCase, hier: MGHierarchy,
                                 loads, sigma_tables, *, tol=1e-8,
                                 inner_tol=3e-4, maxiter=2_000, nu=2,
                                 coarse_iters=24, max_refinements=8):
    """(S, K)-batched certified solves: lead-field basis k under
    conductivity sample s — ONE vmapped-of-vmapped device call over the
    (sigma table x RHS load) product, zero re-assembly (sigma enters at
    combine time, the load at RHS build time).  The ingredient for
    ROBUST stimulation design: the reference would need S*K subprocess
    runs.  Returns a SolveResult with phi (S, K, N)."""
    def one(sig, b):
        return solve_stencil_mg_refined(
            dataclasses.replace(scase, b_neumann=b), hier, sig, tol=tol,
            inner_tol=inner_tol, maxiter=maxiter, nu=nu,
            coarse_iters=coarse_iters, max_refinements=max_refinements)
    return jax.vmap(lambda sig: jax.vmap(lambda b: one(sig, b))(loads))(
        sigma_tables)


@partial(jax.jit, static_argnames=("steps",))
def optimize_pattern_robust(w_sk, J_skin_sk, *, budget, i_max, j_limit,
                            steps: int = 400, candidates=None):
    """Worst-case Frank-Wolfe over conductivity samples.

        maximize   min_s  w_s . i          (worst-sample ROI dose)
        subject to the same box / l1 / skin-|J| constraints as
        optimize_pattern, with the skin peak taken over ALL samples.

    min_s of linear functions is concave, so Frank-Wolfe applies
    unchanged (gradient = the active sample's w); the skin penalty and
    the exact post-scaling see the sample-wise WORST peak, so the
    returned pattern is feasible for every sample.  w_sk: (S, K);
    J_skin_sk: (S, K, M, 3).  `candidates` (C, K), optional: box/l1-
    feasible warm starts (e.g. the nominal-sample design) also entered
    into the best-iterate tracking — FW's subgradient steps on the
    nonsmooth min converge slowly near the optimum, and seeding with
    the nominal design guarantees the robust pattern never scores
    below it.  Returns (i, info) — info carries the worst and mean
    objectives.
    """
    S, K = w_sk.shape
    w_sk = jnp.asarray(w_sk)
    budget = jnp.asarray(budget, w_sk.dtype)
    i_max = jnp.asarray(i_max, w_sk.dtype)
    j_limit = jnp.asarray(j_limit, w_sk.dtype)

    def lmo(g):
        a = jnp.abs(g)
        order = jnp.argsort(-a)
        fill = jnp.clip(budget - i_max * jnp.arange(K, dtype=w_sk.dtype),
                        0.0, i_max)
        alloc = jnp.zeros(K, w_sk.dtype).at[order].set(fill)
        return jnp.sign(g) * alloc

    def peak(i):
        J = jnp.einsum("k,skmc->smc", i, J_skin_sk,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(jnp.max(jnp.sum(J * J, axis=2)))

    def worst(i):
        return jnp.min(w_sk @ i)

    wbar = jnp.linalg.norm(w_sk.mean(axis=0))
    mu = jnp.maximum(wbar * budget, 1e-30) / \
        jnp.maximum(j_limit * j_limit, 1e-30)

    def obj(i):
        v = jnp.maximum(peak(i) - j_limit, 0.0)
        return worst(i) - mu * v * v

    def scaled_obj(i):
        s = jnp.minimum(1.0, j_limit / jnp.maximum(peak(i), 1e-30))
        return worst(s * i)

    g = jax.grad(obj)

    def step(carry, t):
        i, best_i, best_f = carry
        s = lmo(g(i))
        gam = 2.0 / (t + 2.0)
        i = (1.0 - gam) * i + gam * s
        f = scaled_obj(i)
        better = f > best_f
        best_i = jnp.where(better, i, best_i)
        best_f = jnp.where(better, f, best_f)
        return (i, best_i, best_f), f

    i0 = lmo(w_sk.mean(axis=0))
    best_i, best_f = i0, scaled_obj(i0)
    if candidates is not None:
        for c in jnp.asarray(candidates, w_sk.dtype):
            fc = scaled_obj(c)
            take = fc > best_f
            best_i = jnp.where(take, c, best_i)
            best_f = jnp.where(take, fc, best_f)
    (_, i, _), hist = jax.lax.scan(
        step, (i0, best_i, best_f),
        jnp.arange(steps, dtype=w_sk.dtype))
    i = i * jnp.minimum(1.0, j_limit / jnp.maximum(peak(i), 1e-30))
    info = {"objective_worst": worst(i),
            "objective_mean": jnp.mean(w_sk @ i),
            "peak_J_skin": peak(i), "l1": jnp.sum(jnp.abs(i)),
            "linf": jnp.max(jnp.abs(i)), "history": hist}
    return i, info


def element_patch_loads(case, patch_id, I_unit=1.0):
    """(K, N) basis Neumann loads for K electrode patches on an ELEMENT
    mesh (imported .msh/Elmer-DB/VTU meshes included — the off-lattice
    twin of models/array.py's per-spec loads).

    patch_id: (B,) int per boundary face — 0 = not an electrode,
    1..K = patch membership.  Each patch gets the P1-consistent load of
    a uniform injected current density jn = I_unit / patch_area (same
    construction as ops/bc.neumann_current_load, so the discrete
    delivered current is exact per patch).
    """
    faces = np.asarray(case.faces)
    area = np.asarray(case.face_area, np.float64)
    patch_id = np.asarray(patch_id)
    K = int(patch_id.max())
    n = int(case.free_mask.shape[0])
    loads = np.zeros((K, n))
    for k in range(1, K + 1):
        sel = patch_id == k
        A = float(area[sel].sum())
        if A <= 0:
            raise ValueError(f"patch {k} has zero area")
        contrib = (I_unit / A) * area[sel] / 3.0
        np.add.at(loads[k - 1], faces[sel].reshape(-1),
                  np.repeat(contrib, 3))
    return loads


def solve_basis_case_refined(case, loads, *, amg=None, tol=1e-8, **kw):
    """K certified element-path solves of one Case with K Neumann
    loads — lead fields for IMPORTED meshes.  Pass `amg`
    (ops/amg.build_amg) for the AMG-preconditioned form (the
    performance-class path at tissue contrast); without it the
    Jacobi-PCG refined solver is used."""
    from pelvistim_fem_tpu.ops.solve import solve_case_refined
    if amg is None:
        def one(b):
            return solve_case_refined(
                dataclasses.replace(case, b_neumann=b), tol=tol, **kw)
    else:
        from pelvistim_fem_tpu.ops.amg import solve_case_amg_refined

        def one(b):
            return solve_case_amg_refined(
                dataclasses.replace(case, b_neumann=b), amg, tol=tol,
                **kw)
    return jax.vmap(one)(jnp.asarray(loads, case.b_neumann.dtype))


def lead_vectors(case, phi_basis, *, roi_center, roi_r, target_dir,
                 sigma_table=None):
    """Reduce K basis potentials to optimization ingredients.

    Returns (w, J_skin, vol_roi):
      w      (K,)        mean E·target_dir over the ROI ball per unit
                         basis pattern (volume-weighted, V/m)
      J_skin (K, Ms, 3)  per-basis current-density lead vectors on the
                         skin-body cells (A/m^2) — the safety surface
      vol_roi            ROI volume actually covered (m^3)
    """
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.ops.fields import cell_E, cell_J, cell_centers

    cen = cell_centers(case)                       # (M, 3)
    d = cen - jnp.asarray(roi_center)[None, :]
    roi = jnp.sum(d * d, axis=1) <= roi_r * roi_r
    wvol = jnp.where(roi, case.vol, 0.0)
    vol_roi = jnp.sum(wvol)
    tdir = jnp.asarray(target_dir, phi_basis.dtype)
    tdir = tdir / jnp.linalg.norm(tdir)

    # compare on HOST from the int readback — never read a bool array
    # back from an axon device (documented minutes-long readback)
    body_host = np.asarray(case.tet_body)
    (skin_idx,) = np.nonzero(body_host == core.BODY_SKIN)
    skin_idx = jnp.asarray(skin_idx)

    def one(phi):
        E = cell_E(case, phi)                      # (M, 3)
        w_k = jnp.sum(wvol * jnp.einsum(
            "md,d->m", E, tdir,
            precision=jax.lax.Precision.HIGHEST)) / vol_roi
        J = cell_J(case, phi, sigma_table)
        return w_k, J[skin_idx]

    w, J_skin = jax.vmap(one)(phi_basis)
    return w, J_skin, vol_roi


@partial(jax.jit, static_argnames=("steps",))
def optimize_pattern(w, J_skin, *, budget, i_max, j_limit,
                     steps: int = 400):
    """Frank-Wolfe ascent for the injected current pattern.

        maximize   w . i                      (ROI directional E)
        subject to sum_k |i_k| <= budget      (total delivered current)
                   |i_k|       <= i_max       (per-channel compliance)
                   max_cell |sum_k i_k J_k|
                              <= j_limit      (skin safety limit)

    The box-cap-l1 set has an ANALYTIC linear-maximization oracle
    (greedy: fill channels in decreasing |gradient| at i_max until the
    budget runs out), so Frank-Wolfe needs no projection, every iterate
    is feasible by convexity, and a purely linear objective is solved
    EXACTLY at the first step (the oracle returns the optimal vertex).
    The skin limit enters as a smooth concave penalty during the ascent
    plus an EXACT post-scaling of the best iterate (scaling toward 0
    preserves box/l1 feasibility while the peak scales linearly), so
    the returned pattern is feasible by construction.  Returns
    (i, info dict of device scalars).
    """
    K = w.shape[0]
    w = jnp.asarray(w)
    budget = jnp.asarray(budget, w.dtype)
    i_max = jnp.asarray(i_max, w.dtype)
    j_limit = jnp.asarray(j_limit, w.dtype)

    def lmo(g):
        # argmax_{|i|<=i_max, ||i||_1<=budget} <g, i>: greedy fill by
        # descending |g_k|
        a = jnp.abs(g)
        order = jnp.argsort(-a)
        fill = jnp.clip(budget - i_max * jnp.arange(K, dtype=w.dtype),
                        0.0, i_max)
        alloc = jnp.zeros(K, w.dtype).at[order].set(fill)
        return jnp.sign(g) * alloc

    def peak(i):
        J = jnp.einsum("k,kmc->mc", i, J_skin,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(jnp.max(jnp.sum(J * J, axis=1)))

    # penalty scale: a unit-violation costs ~the whole objective range
    mu = jnp.maximum(jnp.linalg.norm(w) * budget, 1e-30) / \
        jnp.maximum(j_limit * j_limit, 1e-30)

    def obj(i):
        v = jnp.maximum(peak(i) - j_limit, 0.0)
        return jnp.dot(w, i) - mu * v * v

    def scaled_obj(i):
        # the feasible value of iterate i after the exact shrink below
        s = jnp.minimum(1.0, j_limit / jnp.maximum(peak(i), 1e-30))
        return jnp.dot(w, s * i)

    g = jax.grad(obj)

    def step(carry, t):
        i, best_i, best_f = carry
        s = lmo(g(i))
        gam = 2.0 / (t + 2.0)
        i = (1.0 - gam) * i + gam * s
        f = scaled_obj(i)
        better = f > best_f
        best_i = jnp.where(better, i, best_i)
        best_f = jnp.where(better, f, best_f)
        return (i, best_i, best_f), f

    i0 = lmo(w)
    (_, i, _), hist = jax.lax.scan(
        step, (i0, i0, scaled_obj(i0)),
        jnp.arange(steps, dtype=w.dtype))
    # exact feasibility: shrink onto the skin-limit surface if needed
    i = i * jnp.minimum(1.0, j_limit / jnp.maximum(peak(i), 1e-30))
    info = {"objective": jnp.dot(w, i), "peak_J_skin": peak(i),
            "l1": jnp.sum(jnp.abs(i)), "linf": jnp.max(jnp.abs(i)),
            "history": hist}
    return i, info

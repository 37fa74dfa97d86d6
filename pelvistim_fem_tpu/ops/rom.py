"""Certified reduced-order material sweeps (reduced basis).

The material factoring the whole framework is built on — K(sigma) =
sum_b sigma_b C_b (ops/stencil.combine_coeffs), with the load affine in
sigma too through the Dirichlet lift — is the textbook AFFINE
reduced-basis setting: project the system once onto a small basis of
full certified solutions, and every further sigma evaluation is an
r x r dense solve.  The reduced answer is then CERTIFIED exactly like
the refined solvers: its TRUE residual against the FULL operator is
one (B, r, G) contraction (computed as an explicit N-vector — the
algebraic expansion ||b||^2 - 2 b^T K V y + ... cancels catastrophically
at the 1e-8 level and cannot certify anything), with the same
relative-residual definition solve_stencil_mg uses (denominator
includes the Dirichlet slots).

Where it pays: sweeps/UQ with MANY sigma evaluations on one geometry.
A greedy loop (rom_sweep_refined) evaluates the whole table batch
reduced, full-solves only the worst offender, and repeats.  Measured
on the step04 contact family: the residual decays ~0.5 decades per
snapshot, so a 3-decade sweep at 1e-8 needs ~16 snapshots — and then
certifies ANY number of lanes in that range from those 16 solves.
The reference re-runs its solver binary per sweep point
(run_pressure_sweep.py:709-738); it has no counterpart.

TPU shape discipline: the basis lives in a FIXED-capacity padded
buffer (rows >= rank are zero; the reduced system gets an identity
diagonal on padded slots so their components solve to exactly 0).
Every jitted piece therefore compiles ONCE for the whole greedy loop —
a growing-shape basis would retrace per snapshot, and each retrace is
a ~30 s remote recompile on axon.

Memory: the per-body applied basis W (B, cap, G) dominates — fine at
sweep scale (step04 ~33k nodes), prohibitive at megatet (3.5M * 7 *
cap doubles).  The LEAN form (store_w=False, auto-selected above
~1.5 GB of W) therefore stores ONLY the basis V: the reduced blocks
VtW are built incrementally from the transient per-body applies of
each new snapshot (symmetric C_b makes one (B, cap) dot the whole
update), and the residual certificate applies the 27-point per-body
stencils directly to the reconstructed (L, G) fields — 27*B mul-adds
per grid point instead of a (B, cap, G) contraction, and O(cap * G)
memory instead of O(B * cap * G).  This is what lets reduced-basis
sweeps compose with the 1.75M-tet flagship (dev/rom_megatet_ab.py).

Scope (measured): the ROM pays for LOW-dimensional parameter families
— 1-D design sweeps (~16 snapshots certify any lane count over 3
decades) and frequency spectra (~10 complex snapshots over 7 decades).
It does NOT pay for the 3-body log-normal UQ sampling at 1e-8: the
Kolmogorov width in 3 simultaneous material axes decays too slowly
(rank 40 certified only 39/200 samples, worst residual 8e-6), so
run_uq keeps the full vmapped certified batch.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.stencil import StencilCase, stencil_spmv

__all__ = ["StencilROM", "build_stencil_rom", "rom_extend", "rom_solve",
           "rom_reconstruct", "rom_sweep_refined", "rom_solve_eqs",
           "rom_reconstruct_eqs", "rom_spectrum_refined",
           "rom_impedance_spectrum_tables"]

_HP = jax.lax.Precision.HIGHEST


def _gauss_solve(A, b):
    """Batched dense solve (A (L, n, n), b (L, n)) by Gauss-Jordan
    elimination WITHOUT pivoting.

    Replaces jnp.linalg.solve because TPU XLA implements LuDecomposition
    only for f32/c64 (measured on v5e: 'Only F32 and C64 types are
    implemented in LuDecomposition; got shape f64[100,40,40]') and the
    certificates require the reduced solve in f64.  Pivoting-free is
    valid for every system this module builds: the real reduced
    operators are SPD (sigma-weighted VtW blocks + identity on padded
    slots) and the EQS real-block form [[Ar,-Ai],[Ai,Ar]] has the
    positive-definite symmetric part diag(Ar, Ar) — either property
    makes all leading principal minors nonsingular."""
    n = A.shape[-1]
    M = jnp.concatenate([A, b[..., None]], axis=-1)   # (L, n, n+1)

    def step(M, k):
        piv = M[:, k, :] / M[:, k, k][:, None]        # normalized row k
        fac = M[:, :, k].at[:, k].set(0.0)            # keep row k itself
        M = M - fac[:, :, None] * piv[:, None, :]
        M = M.at[:, k, :].set(piv)
        return M, None

    M, _ = jax.lax.scan(step, M, jnp.arange(n))
    return M[:, :, n]


def _reduced_solve(A, rhs):
    """Reduced r x r solves: Jacobi-equilibrated Gauss-Jordan + one
    f64 iterative-refinement pass.

    The reduced diagonal inherits the sweep's decade span (A_ll ~
    sigma-weighted Rayleigh quotients), so raw elimination leaves a
    backward error of kappa * eps that FLOORS the N-vector certificate
    (measured at megatet: worst lanes plateaued at ~1.5e-8 > tol with
    the basis provably able to do better).  Symmetric equilibration
    removes the span from kappa and one refinement step pushes the
    reduced-solve error to machine precision, so the certificate is
    limited by the BASIS, not by the dense solve."""
    d = jnp.sqrt(jnp.maximum(
        jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), 1e-300))
    As = A / (d[:, :, None] * d[:, None, :])
    bs = rhs / d
    y = _gauss_solve(As, bs)
    r = bs - jnp.einsum("lrs,ls->lr", As, y, precision=_HP)
    y = y + _gauss_solve(As, r)
    return y / d


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StencilROM:
    """Fixed-capacity reduced basis + precomputed affine blocks.

    All arrays device f64; rows/cols >= rank are zero padding.
    W is None in the LEAN (megatet-scale) form — the reduced blocks
    are then maintained incrementally and residuals certified by
    direct per-body stencil applies (see module docstring)."""
    V: jax.Array          # (cap, G) orthonormal free-masked basis
    W: jax.Array          # (B, cap, G) masked per-body applies C_b v, or None
    VtW: jax.Array        # (B, cap, cap) reduced per-body operators
    b0: jax.Array         # (G,) free-masked Neumann load
    bb: jax.Array         # (B, G) per-body Dirichlet-lift loads
    r0: jax.Array         # (cap,)  V b0
    rb: jax.Array         # (B, cap) V bb
    dir2: jax.Array       # () ||dirichlet slots||^2 (denominator part)
    rank: jax.Array       # () int32 number of live basis rows

    @property
    def capacity(self):
        return self.V.shape[0]


def _free_parts(scase: StencilCase):
    free = scase.free
    phi_d = jnp.where(free, 0.0, scase.dirichlet).astype(jnp.float64)
    b0 = jnp.where(free, scase.b_neumann, 0.0).astype(jnp.float64) \
        .reshape(-1)
    coeff = scase.coeff.astype(jnp.float64)
    B = coeff.shape[0]
    bb = jnp.stack([
        -jnp.where(free, stencil_spmv(phi_d, coeff[b]), 0.0).reshape(-1)
        for b in range(B)])
    dir2 = jnp.sum(jnp.where(free, 0.0, scase.dirichlet
                             .astype(jnp.float64)) ** 2)
    return b0, bb, dir2


_LEAN_W_BYTES = 1.5e9     # auto-switch to the lean form above this W size


def build_stencil_rom(scase: StencilCase, capacity: int = 40,
                      store_w="auto"):
    """Empty rank-0 ROM with the affine load blocks precomputed.

    store_w: True keeps the (B, cap, G) applied basis (fastest reduced
    evals at sweep scale); False is the LEAN megatet form (V only);
    "auto" picks lean when W would exceed ~1.5 GB."""
    G = int(np.prod(scase.free.shape))
    B = scase.coeff.shape[0]
    b0, bb, dir2 = _free_parts(scase)
    cap = int(capacity)
    if store_w == "auto":
        store_w = B * cap * G * 8 <= _LEAN_W_BYTES
    z = jnp.zeros
    return StencilROM(
        V=z((cap, G), jnp.float64),
        W=z((B, cap, G), jnp.float64) if store_w else None,
        VtW=z((B, cap, cap), jnp.float64), b0=b0, bb=bb,
        r0=z((cap,), jnp.float64), rb=z((B, cap), jnp.float64),
        dir2=dir2, rank=jnp.int32(0))


@jax.jit
def _apply_bodies(scase: StencilCase, v_flat):
    """(B, G) masked per-body stencil applies of one basis vector."""
    free = scase.free
    vg = v_flat.reshape(free.shape)
    coeff = scase.coeff.astype(jnp.float64)
    return jnp.stack([
        jnp.where(free, stencil_spmv(vg, coeff[b]), 0.0).reshape(-1)
        for b in range(coeff.shape[0])])


def _snapshot_vector(scase: StencilCase, phi_nodes):
    """Free-masked grid vector of a full solve (mesh-node ordering in,
    the basis representation out)."""
    G = int(np.prod(scase.free.shape))
    xg = jnp.zeros(G, jnp.float64).at[scase.grid_index].set(
        jnp.asarray(phi_nodes, jnp.float64))
    return jnp.where(scase.free.reshape(-1), xg, 0.0)


@jax.jit
def _insert_row(rom: StencilROM, v, w):
    """Write (v, w) into row `rank`; rank+1.  One compiled shape."""
    k = rom.rank
    V = rom.V.at[k].set(v)
    W = rom.W.at[:, k].set(w)
    # padded V/W rows are zero, so the full einsum already carries
    # zeros on padded rows/cols — no masking needed here
    VtW = jnp.einsum("rg,bsg->brs", V, W, precision=_HP)
    return dataclasses.replace(
        rom, V=V, W=W, VtW=VtW, r0=V @ rom.b0,
        rb=jnp.einsum("bg,rg->br", rom.bb, V, precision=_HP),
        rank=k + 1)


@jax.jit
def _insert_row_lean(rom: StencilROM, v, w):
    """Lean insert: V grows a row; VtW grows one symmetric cross-column
    from the TRANSIENT per-body applies w (never stored).  C_b is
    symmetric and v, V rows are free-masked, so
    VtW[b, r, k] = V[r] . (C_b v) = v . (C_b V[r]) = VtW[b, k, r]."""
    k = rom.rank
    V = rom.V.at[k].set(v)
    col = jnp.einsum("rg,bg->br", V, w, precision=_HP)   # (B, cap)
    VtW = rom.VtW.at[:, :, k].set(col)   # column k: V . (C_b v)
    VtW = VtW.at[:, k, :].set(col)       # row k by symmetry
    return dataclasses.replace(
        rom, V=V, VtW=VtW, r0=V @ rom.b0,
        rb=jnp.einsum("bg,rg->br", rom.bb, V, precision=_HP),
        rank=k + 1)


@jax.jit
def _project_out(V, v):
    """2-pass MGS projection of v against V's live rows (padded rows
    are zero, so no rank masking is needed); returns (v_orth, ||v_orth||,
    ||v||) without ever shipping the basis to host — the host MGS this
    replaces pulled k * G f64 per extend (~30 MB at megatet rank 12),
    a multi-second axon readback per snapshot."""
    n0 = jnp.sqrt(jnp.sum(v * v))
    for _ in range(2):
        c = jnp.einsum("rg,g->r", V, v, precision=_HP)
        v = v - jnp.einsum("rg,r->g", V, c, precision=_HP)
    return v, jnp.sqrt(jnp.sum(v * v)), n0


def rom_extend(rom: StencilROM, scase: StencilCase, v_flat,
               drop_tol: float = 1e-12):
    """Orthonormalize v against the live basis (2-pass MGS, on device)
    and append; returns rom unchanged if v is already in the span or
    the capacity is full.

    drop_tol: relative remainder norm below which the snapshot counts
    as in-span.  Deliberately tiny by default: near-noise directions
    (remainder ~solver tol) sometimes measurably HELP certification at
    hard conditioning and sometimes degrade it, so the greedy loops
    guard with best-state tracking/revert instead of a threshold here
    (see rom_sweep_refined)."""
    k = int(rom.rank)
    if k >= rom.capacity:
        return rom
    vo, nv, n0 = _project_out(rom.V, jnp.asarray(v_flat, jnp.float64))
    nv, n0 = float(nv), float(n0)       # two scalar readbacks only
    if nv < drop_tol * max(1.0, n0):
        return rom                      # snapshot already in the span
    v = vo / nv
    insert = _insert_row if rom.W is not None else _insert_row_lean
    return insert(rom, v, _apply_bodies(scase, v))


@jax.jit
def _rom_eval(rom: StencilROM, tables):
    s = jnp.asarray(tables, jnp.float64)[:, 1:]       # (L, B)
    pad = (jnp.arange(rom.capacity) >= rom.rank)
    # padded rows of VtW/r0/rb are zero; identity on the padded
    # diagonal makes those components solve to exactly 0
    A = (jnp.einsum("lb,brs->lrs", s, rom.VtW, precision=_HP)
         + jnp.diag(pad.astype(jnp.float64))[None])
    rhs = rom.r0[None] + jnp.einsum("lb,br->lr", s, rom.rb,
                                    precision=_HP)
    y = _reduced_solve(A, rhs)                        # (L, cap)
    bfull = rom.b0[None] + jnp.einsum("lb,bg->lg", s, rom.bb,
                                      precision=_HP)
    t = jnp.einsum("lb,lr->lbr", s, y, precision=_HP)
    rvec = bfull - jnp.einsum("lbr,brg->lg", t, rom.W, precision=_HP)
    num = jnp.sqrt(jnp.sum(rvec * rvec, axis=1))
    den = jnp.sqrt(jnp.sum(bfull * bfull, axis=1) + rom.dir2)
    return y, num / jnp.maximum(den, 1e-300)


def _lean_apply_sum(scase: StencilCase, X, *svecs):
    """sum_b s[:, b] * masked(C_b @ X_l) for a batch X (L, G) of
    free-masked flat grid fields, for each weight table s in svecs —
    via the body-factored fused SpMV (stencil.batched_stencil_spmv_fused,
    the certified fused solvers' operator): the per-body stencils are
    read ONCE per apply and broadcast over lanes, ~(27 + B*27/L) * L*G
    traffic instead of the per-body vmapped form's ~B*27*L*G (measured
    at megatet L=100: the per-round certificate was the dominant cost
    of the whole greedy sweep).  No (B, cap, G) or (L, 27, G)
    intermediate is ever materialized."""
    from pelvistim_fem_tpu.ops.stencil import batched_stencil_spmv_fused
    free = scase.free
    Xg = X.reshape((-1,) + free.shape)
    coeff = scase.coeff.astype(jnp.float64)
    outs = []
    for s in svecs:
        # sigma_tables layout: body b lives at column b+1
        tab = jnp.concatenate(
            [jnp.zeros((s.shape[0], 1), s.dtype), s], axis=1)
        ap = batched_stencil_spmv_fused(Xg, coeff, tab)
        outs.append(jnp.where(free[None], ap, 0.0).reshape(X.shape))
    return outs[0] if len(svecs) == 1 else tuple(outs)


@jax.jit
def _rom_eval_lean(rom: StencilROM, scase: StencilCase, tables):
    """Lean reduced eval: same y as _rom_eval; the residual certificate
    reconstructs the (L, G) fields and applies the per-body stencils
    directly (27*B mul-adds per grid point, O(L*G) memory)."""
    s = jnp.asarray(tables, jnp.float64)[:, 1:]       # (L, B)
    pad = (jnp.arange(rom.capacity) >= rom.rank)
    A = (jnp.einsum("lb,brs->lrs", s, rom.VtW, precision=_HP)
         + jnp.diag(pad.astype(jnp.float64))[None])
    rhs = rom.r0[None] + jnp.einsum("lb,br->lr", s, rom.rb,
                                    precision=_HP)
    y = _reduced_solve(A, rhs)                        # (L, cap)
    bfull = rom.b0[None] + jnp.einsum("lb,bg->lg", s, rom.bb,
                                      precision=_HP)
    X = jnp.einsum("lr,rg->lg", y, rom.V, precision=_HP)
    rvec = bfull - _lean_apply_sum(scase, X, s)
    num = jnp.sqrt(jnp.sum(rvec * rvec, axis=1))
    den = jnp.sqrt(jnp.sum(bfull * bfull, axis=1) + rom.dir2)
    return y, num / jnp.maximum(den, 1e-300)


def rom_solve(rom: StencilROM, tables, scase: StencilCase = None):
    """Batched reduced solves: (y (L, cap), TRUE rel residual (L,)).

    The residual is the full-operator N-vector residual under the
    refined solvers' relative definition — a lane whose value is
    <= tol is certified at exactly the contract a full
    solve_stencil_mg_refined run would report.  A lean ROM (W=None)
    needs `scase` for the direct-apply certificate."""
    tabs = jnp.atleast_2d(jnp.asarray(tables))
    if rom.W is None:
        if scase is None:
            raise ValueError("lean ROM (W=None) requires scase")
        return _rom_eval_lean(rom, scase, tabs)
    return _rom_eval(rom, tabs)


@jax.jit
def _reconstruct(rom: StencilROM, scase: StencilCase, y):
    free = scase.free.reshape(-1)
    xg = jnp.where(free,
                   jnp.einsum("lr,rg->lg", y, rom.V, precision=_HP),
                   jnp.where(scase.free, 0.0, scase.dirichlet)
                   .astype(jnp.float64).reshape(-1)[None])
    return xg[:, scase.grid_index]                    # (L, N) mesh order


def rom_reconstruct(rom: StencilROM, scase: StencilCase, y):
    """(L, N) full fields in mesh-node ordering (drop-in for the
    batched solvers' phi, e.g. into extract_results_batched)."""
    return _reconstruct(rom, scase, jnp.atleast_2d(jnp.asarray(y)))


def rom_sweep_refined(scase: StencilCase, hier, tables, *, tol=1e-8,
                      max_snapshots=40, seed_tables=None,
                      store_w="auto", snapshots_per_round=4,
                      verbose=False):
    """Greedy certified sweep: reduced-evaluate every lane, full-solve
    a small BATCH of the worst uncertified ones, extend the basis,
    repeat; revert to the best-certifying state seen if extra
    directions stop helping; warm-polish whatever the basis cannot
    certify.

    store_w="auto" switches to the LEAN basis (V only, direct-apply
    certificates) above ~1.5 GB of applied-basis storage, which is what
    makes this compose with the megatet flagship (dev/rom_megatet_ab.py).

    snapshots_per_round: lanes full-solved per greedy round (as ONE
    batched refined solve), picked as the per-block argmax residuals
    over the uncertified index range — the certificate pass (B direct
    stencil applies over ALL lanes in the lean form) is the expensive
    step at megatet scale, so amortizing it over several snapshots cuts
    the sweep wall several-fold at identical certificates.

    Best-state tracking replaces a remainder threshold: directions with
    remainder ~solver-tol sometimes HELP (megatet rank 14 jumped
    certification 14 -> 27 lanes) and sometimes HURT (rank 18 dropped
    it 73 -> 23), so the loop keeps the (certified count, -worst
    residual) maximizer and reverts to it when two consecutive rounds
    fail to improve.

    Returns dict: phi (L, N) mesh-order fields, residual (L,) TRUE
    rel residuals (all <= tol on success), y, rom, n_full (full
    certified solves spent), n_polish (warm-started fallback lanes),
    converged.
    """
    from pelvistim_fem_tpu.ops.multigrid import (
        batched_mg_solve_fused_refined_chunked, solve_stencil_mg_refined)
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("rom_sweep_refined")
    tabs = jnp.asarray(np.atleast_2d(np.asarray(tables, np.float64)))

    rom = build_stencil_rom(scase, max_snapshots, store_w=store_w)
    n_full = 0
    seeds = ([np.asarray(t, np.float64) for t in seed_tables]
             if seed_tables is not None
             else [np.asarray(tabs[0])])
    for t in seeds:
        res = solve_stencil_mg_refined(scase, hier, jnp.asarray(t),
                                       tol=tol)
        n_full += 1
        assert bool(np.asarray(res.converged))
        rom = rom_extend(rom, scase, _snapshot_vector(scase, res.phi))

    best = None          # (score, y, rel_h, rom) — score maximized
    stall = 0
    while True:
        y, rel = rom_solve(rom, tabs, scase)
        rel_h = np.array(rel)               # writable host copy
        n_cert = int((rel_h <= tol).sum())
        worst = float(rel_h.max())
        if verbose:
            print(f"  [rom] rank {int(rom.rank)}: certified "
                  f"{n_cert}/{len(rel_h)} lanes, worst {worst:.2e}")
        score = (n_cert, -worst)
        if best is None or score > best[0]:
            best, stall = (score, y, rel_h, rom), 0
        else:
            stall += 1
        if worst <= tol or int(rom.rank) >= max_snapshots or stall >= 2:
            break
        # pick up to snapshots_per_round uncertified lanes, spread over
        # the family: per-block argmax of the residual profile (the
        # parameter family is 1-D and lane-ordered, so adjacent worst
        # lanes would be near-duplicate snapshots)
        bad = np.flatnonzero(rel_h > tol)
        kb = int(min(snapshots_per_round, bad.size,
                     max_snapshots - int(rom.rank)))
        pick = sorted({int(b[np.argmax(rel_h[b])])
                       for b in np.array_split(bad, kb) if b.size})
        res = batched_mg_solve_fused_refined_chunked(
            scase, hier, tabs[np.asarray(pick)],
            lanes_per_chunk=snapshots_per_round, tol=tol)
        assert bool(np.asarray(res.converged).all())
        n_full += len(pick)
        rank_before = int(rom.rank)
        for j in range(len(pick)):
            rom = rom_extend(rom, scase,
                             _snapshot_vector(scase, res.phi[j]))
        if int(rom.rank) == rank_before:    # span stalled: cannot improve
            break

    _, y, rel_h, rom = best                 # best-certifying state
    phi = np.array(rom_reconstruct(rom, scase, y))
    # Unconditional certificate: lanes the basis could not certify
    # (capacity exhausted / span stalled / the r x r solve's
    # kappa(K) * eps conditioning floor at megatet scale) are POLISHED
    # by the fused refined solver WARM-STARTED from the reduced
    # reconstruction — each costs the few inner iterations its own
    # ~10x-tol residual warrants, not a cold full solve.
    bad = np.flatnonzero(rel_h > tol)
    n_polish = int(bad.size)
    if bad.size:
        from pelvistim_fem_tpu.ops.multigrid import \
            batched_mg_solve_fused_refined_chunked
        free = np.asarray(scase.free)
        gi = np.asarray(scase.grid_index)
        lift = np.where(free, 0.0,
                        np.asarray(scase.dirichlet, np.float64)) \
            .reshape(-1)
        Xw = np.tile(lift[None], (n_polish, 1))
        Xw[:, gi] = phi[bad]                # mesh order -> grid slots
        Xw = np.where(free.reshape(-1)[None], Xw, lift[None])
        res = batched_mg_solve_fused_refined_chunked(
            scase, hier, jnp.asarray(np.asarray(tabs)[bad]),
            jnp.asarray(Xw.reshape((n_polish,) + free.shape)), tol=tol)
        assert bool(np.asarray(res.converged).all())
        phi[bad] = np.asarray(res.phi)
        rel_h[bad] = np.asarray(res.residual)
    return {"phi": phi, "y": y, "residual": rel_h, "rom": rom,
            "n_full": n_full, "n_polish": n_polish,
            "converged": bool((rel_h <= tol).all())}


# ── spectral (EQS) ROM ───────────────────────────────────────────────────────
#
# The complex operator K(omega) = sum_b kappa_b(omega) C_b is affine in
# the SAME per-body blocks as the real path, so a real basis V serves
# frequency sweeps too: each complex snapshot contributes its real and
# imaginary parts as two real basis vectors, and the reduced complex
# system reuses VtW/rb/bb verbatim (the Dirichlet drive is real, so the
# per-body lift loads bb are frequency-independent).  The complex
# 2r x 2r solve is expanded to real blocks [[Ar, -Ai], [Ai, Ar]] —
# TPU-friendly (no complex dtype on device), exactly like the stacked
# (2, ...) fields ops/eqs.py solves with.  The certificate matches
# solve_stencil_eqs_refined's Hermitian relative residual (eqs.py:281).


@jax.jit
def _rom_eval_eqs(rom: StencilROM, kr_tables, ki_tables):
    sr = jnp.asarray(kr_tables, jnp.float64)[:, 1:]   # (L, B)
    si = jnp.asarray(ki_tables, jnp.float64)[:, 1:]
    cap = rom.capacity
    pad = (jnp.arange(cap) >= rom.rank).astype(jnp.float64)
    Ar = (jnp.einsum("lb,brs->lrs", sr, rom.VtW, precision=_HP)
          + jnp.diag(pad)[None])
    Ai = jnp.einsum("lb,brs->lrs", si, rom.VtW, precision=_HP)
    M = jnp.concatenate([
        jnp.concatenate([Ar, -Ai], axis=2),
        jnp.concatenate([Ai, Ar], axis=2)], axis=1)   # (L, 2cap, 2cap)
    rhs_r = rom.r0[None] + jnp.einsum("lb,br->lr", sr, rom.rb,
                                      precision=_HP)
    rhs_i = jnp.einsum("lb,br->lr", si, rom.rb, precision=_HP)
    rhs = jnp.concatenate([rhs_r, rhs_i], axis=1)
    y = _reduced_solve(M, rhs)
    yr, yi = y[:, :cap], y[:, cap:]

    br = rom.b0[None] + jnp.einsum("lb,bg->lg", sr, rom.bb,
                                   precision=_HP)
    bi = jnp.einsum("lb,bg->lg", si, rom.bb, precision=_HP)
    app = lambda s, yy: jnp.einsum(
        "lbr,brg->lg", jnp.einsum("lb,lr->lbr", s, yy, precision=_HP),
        rom.W, precision=_HP)
    rv_r = br - (app(sr, yr) - app(si, yi))
    rv_i = bi - (app(si, yr) + app(sr, yi))
    num = jnp.sqrt(jnp.sum(rv_r * rv_r + rv_i * rv_i, axis=1))
    den = jnp.sqrt(jnp.sum(br * br + bi * bi, axis=1) + rom.dir2)
    return yr, yi, num / jnp.maximum(den, 1e-300)


@jax.jit
def _rom_eval_eqs_lean(rom: StencilROM, scase: StencilCase, kr_tables,
                       ki_tables):
    """Lean complex reduced eval: same real-block 2r x 2r solve as
    _rom_eval_eqs; the Hermitian residual certificate applies the
    per-body stencils directly to the reconstructed re/im fields
    (applies shared between the sr- and si-weighted sums)."""
    sr = jnp.asarray(kr_tables, jnp.float64)[:, 1:]   # (L, B)
    si = jnp.asarray(ki_tables, jnp.float64)[:, 1:]
    cap = rom.capacity
    pad = (jnp.arange(cap) >= rom.rank).astype(jnp.float64)
    Ar = (jnp.einsum("lb,brs->lrs", sr, rom.VtW, precision=_HP)
          + jnp.diag(pad)[None])
    Ai = jnp.einsum("lb,brs->lrs", si, rom.VtW, precision=_HP)
    M = jnp.concatenate([
        jnp.concatenate([Ar, -Ai], axis=2),
        jnp.concatenate([Ai, Ar], axis=2)], axis=1)   # (L, 2cap, 2cap)
    rhs_r = rom.r0[None] + jnp.einsum("lb,br->lr", sr, rom.rb,
                                      precision=_HP)
    rhs_i = jnp.einsum("lb,br->lr", si, rom.rb, precision=_HP)
    rhs = jnp.concatenate([rhs_r, rhs_i], axis=1)
    y = _reduced_solve(M, rhs)
    yr, yi = y[:, :cap], y[:, cap:]

    br = rom.b0[None] + jnp.einsum("lb,bg->lg", sr, rom.bb,
                                   precision=_HP)
    bi = jnp.einsum("lb,bg->lg", si, rom.bb, precision=_HP)
    Xr = jnp.einsum("lr,rg->lg", yr, rom.V, precision=_HP)
    Xi = jnp.einsum("lr,rg->lg", yi, rom.V, precision=_HP)
    P, Q = _lean_apply_sum(scase, Xr, sr, si)   # sum sr C xr, sum si C xr
    R, S = _lean_apply_sum(scase, Xi, sr, si)   # sum sr C xi, sum si C xi
    rv_r = br - (P - S)
    rv_i = bi - (Q + R)
    num = jnp.sqrt(jnp.sum(rv_r * rv_r + rv_i * rv_i, axis=1))
    den = jnp.sqrt(jnp.sum(br * br + bi * bi, axis=1) + rom.dir2)
    return yr, yi, num / jnp.maximum(den, 1e-300)


def rom_solve_eqs(rom: StencilROM, kr_tables, ki_tables,
                  scase: StencilCase = None):
    """Batched reduced complex solves: (yr, yi (L, cap), TRUE Hermitian
    rel residual (L,)) under solve_stencil_eqs_refined's definition.
    A lean ROM (W=None) needs `scase` for the direct-apply
    certificate."""
    kr = jnp.atleast_2d(jnp.asarray(kr_tables))
    ki = jnp.atleast_2d(jnp.asarray(ki_tables))
    if rom.W is None:
        if scase is None:
            raise ValueError("lean ROM (W=None) requires scase")
        return _rom_eval_eqs_lean(rom, scase, kr, ki)
    return _rom_eval_eqs(rom, kr, ki)


@jax.jit
def _reconstruct_eqs(rom: StencilROM, scase: StencilCase, yr, yi):
    free = scase.free.reshape(-1)
    phi_d = jnp.where(scase.free, 0.0, scase.dirichlet) \
        .astype(jnp.float64).reshape(-1)
    xr = jnp.where(free, jnp.einsum("lr,rg->lg", yr, rom.V,
                                    precision=_HP), phi_d[None])
    xi = jnp.where(free, jnp.einsum("lr,rg->lg", yi, rom.V,
                                    precision=_HP), 0.0)
    return jnp.stack([xr, xi], axis=1)[:, :, scase.grid_index]


def rom_reconstruct_eqs(rom: StencilROM, scase: StencilCase, yr, yi):
    """(L, 2, N) re/im fields in mesh-node ordering (drop-in for
    batched_eqs_solve_refined's phi)."""
    return _reconstruct_eqs(rom, scase, jnp.atleast_2d(jnp.asarray(yr)),
                            jnp.atleast_2d(jnp.asarray(yi)))


def rom_spectrum_refined(scase: StencilCase, hier, ki_tables,
                         kr_tables=None, *, tol=1e-8, max_snapshots=40,
                         rom=None, store_w="auto", verbose=False):
    """Greedy certified frequency sweep: reduced-evaluate every
    frequency, full-solve (solve_stencil_eqs_refined) only the worst
    uncertified one, extend the basis with the snapshot's re AND im
    parts, repeat.  A dispersive spectrum (dispersive_tables) is just
    a per-frequency (kr, ki) batch, so it routes through unchanged.

    `rom`: warm-start basis from a previous sweep on the SAME scase —
    the affine blocks are table-independent, so one basis serves every
    material/frequency family of the case (e.g. the contact states of
    run_impedance share it; later states certify almost for free).

    Returns dict: phi (F, 2, N), residual (F,) TRUE Hermitian rel
    residuals, yr, yi, rom, n_full, converged.
    """
    from pelvistim_fem_tpu.ops.eqs import solve_stencil_eqs_refined
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("rom_spectrum_refined")
    ki = jnp.asarray(np.atleast_2d(np.asarray(ki_tables, np.float64)))
    if kr_tables is None:
        kr = jnp.tile(scase.sigma_table.astype(jnp.float64)[None],
                      (ki.shape[0], 1))
    else:
        kr = jnp.asarray(np.atleast_2d(np.asarray(kr_tables,
                                                  np.float64)))

    if rom is None:
        rom = build_stencil_rom(scase, max_snapshots, store_w=store_w)
    n_full = 0

    def full_solve(i):
        res = solve_stencil_eqs_refined(scase, hier, ki[i], kr[i],
                                        tol=tol)
        assert bool(np.asarray(res.converged))
        r = rom_extend(rom, scase, _snapshot_vector(scase, res.phi[0]))
        return rom_extend(r, scase, _snapshot_vector(scase, res.phi[1]))

    if int(rom.rank) == 0:
        rom = full_solve(0)
        n_full += 1
    while True:
        yr, yi, rel = rom_solve_eqs(rom, kr, ki, scase)
        rel_h = np.array(rel)               # writable host copy
        worst = int(np.argmax(rel_h))
        if verbose:
            print(f"  [rom-eqs] rank {int(rom.rank)}: certified "
                  f"{(rel_h <= tol).sum()}/{len(rel_h)} freqs, "
                  f"worst {rel_h[worst]:.2e}")
        if rel_h[worst] <= tol or int(rom.rank) >= rom.capacity - 1:
            break
        rank_before = int(rom.rank)
        rom = full_solve(worst)
        n_full += 1
        if int(rom.rank) == rank_before:    # span stalled
            break

    phi = np.array(rom_reconstruct_eqs(rom, scase, yr, yi))
    # unconditional certificate: full-solve any lane the basis could
    # not certify (capacity exhausted / span stalled)
    for i in np.flatnonzero(rel_h > tol):
        res = solve_stencil_eqs_refined(scase, hier, ki[i], kr[i],
                                        tol=tol)
        n_full += 1
        assert bool(np.asarray(res.converged))
        phi[i] = np.asarray(res.phi)
        rel_h[i] = float(np.asarray(res.residual))
    return {"phi": phi, "yr": yr, "yi": yi, "residual": rel_h,
            "rom": rom, "n_full": n_full,
            "converged": bool((rel_h <= tol).all())}


def rom_impedance_spectrum_tables(scase: StencilCase, hier, ki_tables,
                                  kr_tables, freqs_hz, *, w_act, w_ret,
                                  I_inject_A=None, tol=1e-8,
                                  max_snapshots=40, rom=None,
                                  verbose=False):
    """impedance_spectrum_tables (eqs.py:529) on the greedy ROM: the
    full (F,) spectrum certified at `tol` from ~n_full << F complex
    solves (with a per-lane full-solve fallback if the basis capacity
    exhausts, so the certificate is unconditional)."""
    out = rom_spectrum_refined(scase, hier, ki_tables, kr_tables,
                               tol=tol, max_snapshots=max_snapshots,
                               rom=rom, verbose=verbose)
    rom = out["rom"]
    if I_inject_A is None:
        I_inject_A = float(jnp.sum(scase.b_neumann))
    # the electrode reduction over the returned fields (which include
    # any full-solve fallback lanes): V = w^T phi, (F, 2)
    dvec = np.asarray(w_act, np.float64) - np.asarray(w_ret, np.float64)
    V = np.einsum("fcn,n->fc", np.asarray(out["phi"]), dvec)
    Z = V / I_inject_A
    residual = out["residual"]
    return {
        "freq_hz": np.asarray(freqs_hz, np.float64),
        "Z": Z,
        "Z_abs": np.hypot(Z[:, 0], Z[:, 1]),
        "Z_phase_deg": np.degrees(np.arctan2(Z[:, 1], Z[:, 0])),
        "residual": residual,
        "converged": residual <= tol,
        "n_full": out["n_full"],
        "rom": rom,
    }

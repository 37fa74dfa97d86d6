"""Geometric multigrid preconditioner for the stencil operator.

The thin high-contrast layers of the reference problem (0.5 mm contact at
sigma 5e-5 S/m over muscle at 0.35 — a 7000x jump, step04 params.yaml)
make Jacobi-CG iteration counts grow into the hundreds.  A V-cycle over
the lattice hierarchy cuts that by an order of magnitude and is the
standard replacement for the reference's UMFPACK direct factorization at
scale.

Design (TPU-first, all static shapes):
  * Coarsening: every-other-knot on each lattice axis (factor ~2,
    non-uniform axes fine).
  * Transfers: trilinear prolongation P from knot positions; restriction
    R = P^T (rows renormalized on the coarse side).
  * Coarse operators by GALERKIN PROBING: a 27-point stencil is closed
    under R A P with factor-2 trilinear transfers (reach <= 3 fine cells
    = 1 coarse offset), so each coarse stencil entry is read off by
    applying the fine operator to 27 period-3 comb vectors.  Probing the
    PROJECTED operator folds Dirichlet/carved masks in automatically,
    and doing it per conductivity body keeps C_c(sigma) = sum_b sigma_b
    C_c_b — material sweeps reuse one hierarchy.
  * Smoother: damped Jacobi (omega = 0.7), fixed nu1 = nu2 = 2 so the
    V-cycle is a fixed SPD linear operator usable inside CG.
  * Coarsest level: fixed-iteration-count CG.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.solve import (SolveResult, jacobi_pcg,
                                         preconditioned_cg)
from pelvistim_fem_tpu.ops.stencil import (DIAG_OFFSET, OFFSETS,
                                           StencilCase, combine_coeffs,
                                           stencil_spmv)


def _axis_weights(fine: np.ndarray, coarse_idx: np.ndarray):
    """Per-fine-knot (left_coarse_slot, w_left) trilinear weights."""
    coarse = fine[coarse_idx]
    # fine knot positions between coarse knots
    slot = np.searchsorted(coarse, fine, side="right") - 1
    slot = np.clip(slot, 0, len(coarse) - 2)
    x0 = coarse[slot]
    x1 = coarse[slot + 1]
    t = (fine - x0) / np.maximum(x1 - x0, 1e-300)
    t = np.clip(t, 0.0, 1.0)
    return slot, 1.0 - t


def make_transfers(axes):
    """Build (coarse_axes, prolong_fn, restrict_fn) for one coarsening.

    prolong: (..., Xc, Yc, Zc) -> (..., X, Y, Z); restrict = P^T, both
    supporting leading batch axes (probing batches over bodies).

    Two implementations behind one closure pair:
      * numpy operands (hierarchy probing, host): trilinear transfers
        factor into three tiny per-axis 1-D interpolation matrices
        applied via tensordot (reshaped BLAS GEMM) — ~50x faster than
        the previous np.add.at scatter at megatet scale.
      * jnp tracers (the device V-cycle): per-axis two-slab gathers /
        index-adds with static shapes.  Measured on the axon TPU these
        beat the dense dot_general form by orders of magnitude (the
        moveaxis-wrapped contractions triggered pathological layouts:
        55 s vs 0.04 s per megatet solve), so the device path keeps the
        gather formulation.
    """
    idxs, slots, wls, mats = [], [], [], []
    for ax in axes:
        n = len(ax)
        ci = np.arange(0, n, 2)
        if ci[-1] != n - 1:
            ci = np.append(ci, n - 1)
        slot, wl = _axis_weights(ax, ci)
        P = np.zeros((n, len(ci)))
        P[np.arange(n), slot] = wl
        P[np.arange(n), slot + 1] += 1.0 - wl
        idxs.append(ci)
        slots.append(slot.astype(np.int32))
        wls.append(wl)
        mats.append(P)
    coarse_axes = tuple(a[i] for a, i in zip(axes, idxs))
    P0, P1, P2 = mats
    R0, R1, R2 = P0.T.copy(), P1.T.copy(), P2.T.copy()
    s0, s1, s2 = slots
    w0, w1, w2 = wls
    nc = tuple(len(i) for i in idxs)

    def _apply3_np(x, m0, m1, m2):
        x = np.moveaxis(np.tensordot(x, m0, axes=((-3,), (1,))), -1, -3)
        x = np.moveaxis(np.tensordot(x, m1, axes=((-2,), (1,))), -1, -2)
        return np.tensordot(x, m2, axes=((-1,), (1,)))

    def prolong(xc):
        if isinstance(xc, np.ndarray):
            return _apply3_np(xc, P0, P1, P2)
        # device path: weights cast to the operand dtype — with jax x64
        # enabled, multiplying f32 tracers by strong-f64 numpy constants
        # would silently promote the whole V-cycle to f64.
        v0 = jnp.asarray(w0, xc.dtype)
        v1 = jnp.asarray(w1, xc.dtype)
        v2 = jnp.asarray(w2, xc.dtype)
        a = (xc[..., s0, :, :] * v0[:, None, None]
             + xc[..., s0 + 1, :, :] * (1 - v0)[:, None, None])
        b = (a[..., :, s1, :] * v1[None, :, None]
             + a[..., :, s1 + 1, :] * (1 - v1)[None, :, None])
        return (b[..., :, :, s2] * v2[None, None, :]
                + b[..., :, :, s2 + 1] * (1 - v2)[None, None, :])

    def restrict(xf):
        if isinstance(xf, np.ndarray):
            return _apply3_np(xf, R0, R1, R2)
        return _restrict_jnp(xf)

    def _restrict_jnp(xf):
        dt = xf.dtype
        lead = xf.shape[:-3]
        y = (jnp.zeros(lead + (nc[0],) + xf.shape[-2:], dt)
             .at[..., s0, :, :].add(xf * jnp.asarray(
                 w0, dt)[:, None, None])
             .at[..., s0 + 1, :, :].add(xf * jnp.asarray(
                 1 - w0, dt)[:, None, None]))
        y = (jnp.zeros(lead + (nc[0], nc[1], y.shape[-1]), dt)
             .at[..., :, s1, :].add(y * jnp.asarray(
                 w1, dt)[None, :, None])
             .at[..., :, s1 + 1, :].add(y * jnp.asarray(
                 1 - w1, dt)[None, :, None]))
        y = (jnp.zeros(lead + nc, dt)
             .at[..., :, :, s2].add(y * jnp.asarray(
                 w2, dt)[None, None, :])
             .at[..., :, :, s2 + 1].add(y * jnp.asarray(
                 1 - w2, dt)[None, None, :]))
        return y

    # Per-axis factors for consumers that apply transfers axis-by-axis
    # (the domain-decomposed MG in parallel/stencil_shard.py applies the
    # sharded-x factor as a psum-reduced local GEMM and the y/z factors
    # locally).
    for fn in (prolong, restrict):
        fn.P_axis = tuple(mats)
        fn.slots = tuple(slots)
        fn.weights = tuple(wls)
        fn.nc = nc
    return coarse_axes, prolong, restrict


def _np_spmv(x, C):
    """Numpy twin of stencil_spmv for host-side probing."""
    X, Y, Z = x.shape
    xp = np.pad(x, 1)
    y = np.zeros_like(x)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        y += C[o] * xp[1 + dx:1 + dx + X, 1 + dy:1 + dy + Y,
                       1 + dz:1 + dz + Z]
    return y


def _probe_coarse_stencils(coeffs, free, prolong, restrict, coarse_shape,
                           dtype):
    """Read off the 27-point coarse Galerkin stencils R A_b P for ALL
    bodies by probing with period-3 combs.

    One batched device call per level: vmap over (n_bodies, 27 combs) —
    anything finer-grained suffers badly from per-dispatch compile
    latency on the axon TPU backend (observed 327 s vs ~5 s).
    """
    n_bodies = coeffs.shape[0]
    Xc, Yc, Zc = coarse_shape
    ix = np.arange(Xc)
    iy = np.arange(Yc)
    iz = np.arange(Zc)

    combs = np.zeros((27,) + coarse_shape)
    for c, (px, py, pz) in enumerate(OFFSETS):
        px, py, pz = px + 1, py + 1, pz + 1
        combs[c][np.ix_(ix[ix % 3 == px % 3], iy[iy % 3 == py % 3],
                        iz[iz % 3 == pz % 3])] = 1.0
    comb_phase = [((p[0] + 1) % 3, (p[1] + 1) % 3, (p[2] + 1) % 3)
                  for p in OFFSETS]

    # Pure host probing: hierarchy setup is one-time work; routing it
    # through the device would pay erratic remote-compile latency on the
    # axon backend (observed minutes) for milliseconds of math.  The
    # inner stencil application dispatches to the native kernel when
    # built (the numpy version dominated megatet hierarchy builds).
    from pelvistim_fem_tpu import native
    free_np = np.asarray(free)
    coeffs_np = np.asarray(coeffs, np.float64)
    ys = np.empty((n_bodies, 27) + coarse_shape)
    fine_shape = free_np.shape
    for c in range(27):
        pf = np.where(free_np, prolong(combs[c]), 0.0)
        outs = np.empty((n_bodies,) + fine_shape)
        for b in range(n_bodies):
            out = native.stencil_apply(pf, coeffs_np[b])
            if out is None:
                out = _np_spmv(pf, coeffs_np[b])
            outs[b] = out
        # one batched restriction over all bodies (leading batch axis)
        ys[:, c] = restrict(np.where(free_np[None], outs, 0.0))

    out = np.zeros((n_bodies, 27) + coarse_shape)
    for c, (px, py, pz) in enumerate(comb_phase):
        y = ys[:, c]
        for o, (dx, dy, dz) in enumerate(OFFSETS):
            # target n receives from source s = n + (dx,dy,dz) on comb c
            nx = ix[(ix + dx) % 3 == px]
            ny = iy[(iy + dy) % 3 == py]
            nz = iz[(iz + dz) % 3 == pz]
            nx = nx[(nx + dx >= 0) & (nx + dx < Xc)]
            ny = ny[(ny + dy >= 0) & (ny + dy < Yc)]
            nz = nz[(nz + dz >= 0) & (nz + dz < Zc)]
            sel = np.ix_(nx, ny, nz)
            out[(slice(None), o) + sel] = y[(slice(None),) + sel]
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MGLevel:
    coeff: jax.Array      # (n_bodies, 27, X, Y, Z)
    free: jax.Array       # (X, Y, Z) bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MGHierarchy:
    levels: tuple            # tuple[MGLevel] finest -> coarsest
    # transfer closures are static (captured arrays are jnp constants)
    prolongs: tuple = dataclasses.field(metadata=dict(static=True),
                                        default=())
    restricts: tuple = dataclasses.field(metadata=dict(static=True),
                                         default=())


def build_hierarchy(host_data: dict, *, dtype=None, min_nodes=100,
                    max_levels=8, level0=None) -> MGHierarchy:
    """Build per-body Galerkin-coarsened levels from stencil HOST data
    (ops.stencil.stencil_host_data output: numpy coeff/free + lattice
    axes).  All probing runs in numpy — one-time setup must not pay
    device round-trips or remote-compile latency.  Independent of sigma:
    one hierarchy serves a whole material sweep.

    min_nodes must stay small enough that the fixed coarse_iters CG in
    the V-cycle solves the coarsest level nearly exactly: a 728-node
    high-contrast coarsest level under 24 CG iterations made the
    V-cycle a WORSE preconditioner than plain Jacobi (459 vs 168 CG
    iterations on the coarse step04 case); at <=100 nodes the same
    problem takes 24.

    level0: optional (coeff, free) DEVICE arrays to reuse as the finest
    level — pass (scase.coeff, scase.free) to avoid re-shipping the
    ~170 MB fine coefficient stack the StencilCase already holds.
    """
    coeff0 = np.asarray(host_data["coeff"], np.float64)
    free0 = np.asarray(host_data["free"], bool)
    dtype = dtype or jnp.float32
    # coarse-level arrays are accumulated on host and shipped in ONE
    # device_put at the end (per-level puts each pay the axon tunnel's
    # dispatch latency)
    pending = []
    if level0 is not None:
        levels = [MGLevel(coeff=level0[0], free=level0[1])]
    else:
        pending.append((np.asarray(coeff0, dtype), free0))
        levels = [None]
    prolongs, restricts = [], []
    cur_axes = tuple(np.asarray(a) for a in host_data["axes"])
    cur_free = free0
    cur_coeff = coeff0

    while len(levels) < max_levels:
        shape = tuple(len(a) for a in cur_axes)
        if int(np.prod(shape)) <= min_nodes:
            break
        coarse_axes, prolong, restrict = make_transfers(cur_axes)
        cshape = tuple(len(a) for a in coarse_axes)

        coarse_coeff = _probe_coarse_stencils(
            cur_coeff, cur_free, prolong, restrict, cshape, dtype)

        # Coarse "free" = nodes with any stiffness (all-zero rows are
        # carved/fully-constrained regions -> identity).
        diag_sum = np.abs(coarse_coeff).sum(axis=(0, 1))
        coarse_free = diag_sum > 1e-300

        # host-side dtype cast first: shipping f64 and converting on
        # device would double the tunnel traffic and compile a convert op
        pending.append((np.asarray(coarse_coeff, dtype), coarse_free))
        levels.append(None)
        prolongs.append(prolong)
        restricts.append(restrict)
        cur_axes = coarse_axes
        cur_free = coarse_free
        cur_coeff = coarse_coeff

    shipped = jax.device_put(pending)
    it = iter(shipped)
    levels = [lv if lv is not None
              else MGLevel(*next(it)) for lv in levels]
    return MGHierarchy(levels=tuple(levels), prolongs=tuple(prolongs),
                       restricts=tuple(restricts))


# Below this many grid nodes the XLA fusion beats the flat Pallas
# kernel's fixed pipeline cost, so "flat" levels fall back to XLA.
FLAT_MIN_NODES = 64_000


def _level_op(level: MGLevel, sigma_table, spmv="xla"):
    C = combine_coeffs(level.coeff, sigma_table)
    free = level.free
    diag = jnp.where(free & (C[DIAG_OFFSET] != 0), C[DIAG_OFFSET], 1.0)

    if spmv == "flat" and free.size >= FLAT_MIN_NODES:
        from pelvistim_fem_tpu.ops.pallas_stencil import (
            pack_coeff_flat, stencil_spmv_flat)
        Cf = pack_coeff_flat(C)
        raw = lambda x: stencil_spmv_flat(x, Cf)
    else:
        raw = lambda x: stencil_spmv(x, C)

    def op(x):
        xm = jnp.where(free, x, 0.0)
        return jnp.where(free, raw(xm), x)

    return op, diag


def estimate_lmax(op, dinv, free, iters=10):
    """Deterministic power-method estimate of lambda_max(D^{-1} A) on
    the free dofs.  The start vector must NOT be the constant vector —
    that is (near-)null for the stiffness operator; an oscillatory
    deterministic ramp is spectrum-rich and keeps jit caching exact
    (no randomness)."""
    n = free.size
    seed = jnp.sin(jnp.arange(n, dtype=dinv.dtype) * 12.9898 + 0.5)
    v = jnp.where(free, seed.reshape(free.shape), 0.0)

    def it(_, v):
        w = dinv * op(v)
        return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-30)

    v = jax.lax.fori_loop(0, iters, it, v)
    w = dinv * op(v)
    return jnp.sum(v * w) / jnp.maximum(jnp.sum(v * v), 1e-30)


def chebyshev_smooth(op, dinv, x, b, degree, lmax):
    """Degree-`degree` Jacobi-preconditioned Chebyshev smoother on the
    eigenvalue band [lmax/4, 1.05*lmax] (the classic 4th-spectrum
    choice) — a fixed polynomial in D^{-1}A, hence a valid SPD
    building block for the CG preconditioner."""
    beta = 1.05 * lmax
    alpha = beta / 4.0
    theta = 0.5 * (beta + alpha)
    delta = 0.5 * (beta - alpha)
    sigma = theta / delta
    rho = 1.0 / sigma
    if x is None:          # start from x = 0: skip the zero apply
        r = dinv * b
        d = r / theta
        x = d
    else:
        r = dinv * (b - op(x))
        d = r / theta
        x = x + d

    def body(_, carry):
        x, d, rho = carry
        rho_n = 1.0 / (2.0 * sigma - rho)
        r = dinv * (b - op(x))
        d = rho_n * rho * d + (2.0 * rho_n / delta) * r
        return (x + d, d, rho_n)

    x, _, _ = jax.lax.fori_loop(0, degree - 1, body, (x, d, rho))
    return x


def cycle_impl(ops_diags, frees, prolongs, restricts, b, *, nu=2,
               omega=0.7, coarse_iters=24, smoother="jacobi",
               lmaxs=None):
    """One V-cycle over explicit level data (finest first).

    ops_diags: [(op, diag)] per level; frees: level free masks;
    prolongs/restricts: transfers between consecutive levels
    (len == n_levels - 1).  Factored out so the domain-decomposed solve
    (parallel/stencil_shard.py) can run the replicated coarse levels
    with EXACTLY the same recursion as the single-device V-cycle.

    smoother: "jacobi" (nu damped sweeps, omega) or "chebyshev"
    (degree-nu polynomial on [lmax/4, 1.05 lmax]; requires `lmaxs`, the
    per-level lambda_max(D^{-1}A) estimates)."""
    n_levels = len(ops_diags)

    if smoother == "chebyshev":
        def smooth(op, dinv, x, b, n, level=0):
            return chebyshev_smooth(op, dinv, x, b, max(n, 2),
                                    lmaxs[level])

        def smooth0(op, dinv, b, n, level=0):
            return chebyshev_smooth(op, dinv, None, b, max(n, 2),
                                    lmaxs[level])
    else:
        def smooth(op, dinv, x, b, n, level=0):
            return jax.lax.fori_loop(
                0, n, lambda _, x: x + omega * dinv * (b - op(x)), x)

        def smooth0(op, dinv, b, n, level=0):
            # pre-smooth from x = 0: the first damped-Jacobi sweep is
            # exactly omega*dinv*b — unrolling it saves one full
            # operator apply per level per V-cycle (op(0) inside the
            # fori_loop cannot be folded away: x is loop-carried, so
            # XLA must materialize the zero apply)
            x = omega * dinv * b
            return smooth(op, dinv, x, b, n - 1, level) if n > 1 else x

    def cycle(level, b):
        op, diag = ops_diags[level]
        dinv = 1.0 / diag
        if level == n_levels - 1:
            # coarsest: fixed-iteration CG (deterministic SPD approx).
            # fori_loop, not an unrolled python loop: unrolling 24
            # iterations inside an enclosing shard_map blew SPMD compile
            # time to minutes on the virtual-CPU mesh.
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
        x = smooth0(op, dinv, b, nu, level)
        r = b - op(x)
        rc = restricts[level](r)
        rc = jnp.where(frees[level + 1], rc, 0.0)
        xc = cycle(level + 1, rc)
        x = x + prolongs[level](xc)
        x = smooth(op, dinv, x, b, nu, level)
        return x

    return cycle(0, b)


def make_v_cycle(hier: MGHierarchy, sigma_table, *, nu=2, omega=0.7,
                 coarse_iters=24, smoother="jacobi", spmv="xla"):
    """Return an SPD preconditioner apply(r) -> z (one V-cycle).

    smoother="chebyshev" (degree nu) cuts CG iterations (12.3 vs 15.9
    mean over the step04 100-lane sweep at nu=3) but costs more matvecs
    per cycle than Jacobi nu=2, so wall time measured WORSE on v5e
    (0.27 s vs 0.20 s per sweep) — Jacobi stays the default; Chebyshev
    is the lever for problems where iteration count, not cycle cost,
    dominates (e.g. harder contrasts or communication-bound sharded
    solves)."""
    ops_diags = [_level_op(lv, sigma_table, spmv=spmv)
                 for lv in hier.levels]
    frees = [lv.free for lv in hier.levels]
    lmaxs = None
    if smoother == "chebyshev":
        # one-time (traced) power-method spectrum estimates per level;
        # sigma-dependent, so they live inside the jitted solve
        lmaxs = [estimate_lmax(op, 1.0 / diag, lv.free)
                 for (op, diag), lv in zip(ops_diags, hier.levels)]

    def apply(r):
        return cycle_impl(ops_diags, frees, hier.prolongs, hier.restricts,
                          r, nu=nu, omega=omega,
                          coarse_iters=coarse_iters, smoother=smoother,
                          lmaxs=lmaxs)

    return apply


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu",
                                   "coarse_iters", "smoother"))
def batched_mg_solve(scase: StencilCase, hier: MGHierarchy, sigma_tables,
                     *, tol=1e-8, maxiter=2_000, nu=2, coarse_iters=24,
                     smoother="jacobi"):
    """Material sweep with MG-preconditioned CG per lane — the fastest
    sweep path (measured 31.5k solves/min at 100 full-res lanes on one
    v5e vs 15k for the Jacobi sweep; <=31 iterations/lane).  One
    sigma-independent hierarchy serves every lane."""
    return jax.vmap(
        lambda s: solve_stencil_mg(scase, hier, s, tol=tol,
                                   maxiter=maxiter, nu=nu,
                                   coarse_iters=coarse_iters,
                                   smoother=smoother)
    )(sigma_tables)


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu",
                                   "coarse_iters", "smoother", "spmv"))
def solve_stencil_mg(scase: StencilCase, hier: MGHierarchy,
                     sigma_table=None, *, tol=1e-8, maxiter=2_000,
                     nu=2, coarse_iters=24, smoother="jacobi",
                     spmv=None) -> SolveResult:
    """MG-preconditioned CG on the stencil operator (phi in mesh node
    ordering, drop-in for solve_stencil).

    spmv="flat" routes every large-level stencil apply through the
    lane-packed Pallas kernel — 1.36x faster megatet iterations on v5e
    (2.91 vs 3.95 ms); use only for UNBATCHED solves (vmap serializes
    Pallas kernel grids)."""
    from pelvistim_fem_tpu.ops import stencil as st
    if sigma_table is None:
        sigma_table = scase.sigma_table
    op, diag, b_eff = st._operator(scase, sigma_table, spmv=spmv)
    M = make_v_cycle(hier, sigma_table, nu=nu, coarse_iters=coarse_iters,
                     smoother=smoother, spmv=spmv)
    x0 = jnp.where(scase.free, 0.0, scase.dirichlet)

    # PCG with the V-cycle preconditioner (generalizes jacobi_pcg's M).
    dot = lambda a, b: jnp.sum(a * b)
    nrm = lambda a: jnp.sqrt(jnp.sum(a * a))
    bnorm = nrm(b_eff)
    tol_abs = tol * bnorm

    r0 = b_eff - op(x0)
    z0 = jnp.where(scase.free, M(jnp.where(scase.free, r0, 0.0)), r0)
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
        z_n = jnp.where(scase.free, M(jnp.where(scase.free, r_n, 0.0)),
                        r_n)
        rz_n = dot(r_n, z_n)
        beta = rz_n / rz
        p_n = z_n + beta * p
        sel = lambda new, old: jnp.where(done, old, new)
        x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
        rz, p, k = sel(rz_n, rz), sel(p_n, p), sel(k + 1, k)
        done = done | (nrm(r) <= tol_abs)
        return (x, r, z, rz, p, k, done)

    x, r, *_ , k, _ = jax.lax.while_loop(cond, body, state0)
    rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
    phi_nodes = x.reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "smoother",
                                   "max_refinements", "spmv"))
def solve_stencil_mg_refined(scase: StencilCase, hier: MGHierarchy,
                             sigma_table=None, *, tol=1e-8,
                             inner_tol=3e-4, maxiter=2_000, nu=2,
                             coarse_iters=24, smoother="jacobi",
                             max_refinements=8, spmv=None) -> SolveResult:
    """Mixed-precision MG solve: f32 MG-CG inner sweeps + f64 residual
    correction (requires jax_enable_x64; pass scase/hier built in f64).

    WHY: at the reference's 7000x material contrast, f32 CG's recursive
    residual decouples from the true residual — a "converged" 1e-6 f32
    solve carries 1e-2..1e-1 TRUE relative residual at the hard lanes
    (measured on TPU v5e), which the reference's flux-conservation gate
    (smoke_test.py:31) sees as >5% KCL error.  Refinement measures the
    residual in f64 against the f64 operator and re-solves the
    correction in f32, so the returned `residual` IS the true one.
    Converged lanes FREEZE under vmap (same contract as
    solve_stencil_refined).

    inner_tol is the per-pass reduction FLOOR; the schedule is adaptive
    (see `refine`).  3e-4 measured fastest on the v5e step04 100-lane
    sweep at tol 1e-8 (floor 1e-6 -> 0.78 s, 3e-4 -> 0.70 s, 1e-3 ->
    0.92 s: looser floors cut f32 iterations 45 -> 33 mean but add f64
    correction passes).  A full-f64 outer CG with f32 V-cycle
    preconditioner needs only 20 mean iterations but runs 3.3x slower
    (2.3 s) — emulated-f64 SpMVs dominate — hence restart-based
    refinement."""
    from pelvistim_fem_tpu.ops import stencil as st
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("solve_stencil_mg_refined")
    if sigma_table is None:
        sigma_table = scase.sigma_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    sc64, sc32 = to(scase, jnp.float64), to(scase, jnp.float32)
    hier32 = to(hier, jnp.float32)
    sig64 = sigma_table.astype(jnp.float64)
    sig32 = sigma_table.astype(jnp.float32)
    # f64 residual SpMVs stay on the XLA path (no f64 Pallas on TPU);
    # spmv="flat" accelerates the f32 inner CG + V-cycle only.
    op64, _, b64 = st._operator(sc64, sig64)
    op32, _, _ = st._operator(sc32, sig32, spmv=spmv)
    M32 = make_v_cycle(hier32, sig32, nu=nu, coarse_iters=coarse_iters,
                       smoother=smoother, spmv=spmv)
    free = scase.free
    Mp = lambda r: jnp.where(free, M32(jnp.where(free, r, 0.0)), r)

    bnorm = jnp.sqrt(jnp.sum(b64 * b64))
    x = jnp.where(free, 0.0, sc64.dirichlet)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        # Adaptive inner tolerance: the correction solve only has to
        # shrink the TRUE residual from rel_old to tol, so later passes
        # ask for tol/rel_old (x4 safety) instead of the full inner_tol
        # reduction — measured ~2x fewer total inner iterations at the
        # step04 contrast (pass 1: rel_old=inf clips to inner_tol).
        need = 0.25 * tol / jnp.minimum(rel_old, 1.0)
        tol_k = jnp.clip(need, inner_tol, 0.05)
        res = preconditioned_cg(op32, r64.astype(jnp.float32), Mp,
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
    phi_nodes = x.reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=total_it, residual=rel,
                       converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "smoother",
                                   "max_refinements"))
def batched_mg_solve_refined(scase: StencilCase, hier: MGHierarchy,
                             sigma_tables, *, tol=1e-8, inner_tol=3e-4,
                             maxiter=2_000, nu=2, coarse_iters=24,
                             smoother="jacobi", max_refinements=8):
    """Material sweep at TRUE f64-certified tolerance: one vmapped
    mixed-precision MG solve per lane (see solve_stencil_mg_refined).
    The honest fast path for hard-contrast sweeps — bench.py uses it."""
    return jax.vmap(
        lambda s: solve_stencil_mg_refined(
            scase, hier, s, tol=tol, inner_tol=inner_tol,
            maxiter=maxiter, nu=nu, coarse_iters=coarse_iters,
            smoother=smoother, max_refinements=max_refinements)
    )(sigma_tables)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "smoother",
                                   "max_refinements"))
def batched_group_solve_mg_refined(stacked: StencilCase,
                                   bhier: MGHierarchy,
                                   sigma_tables=None, *, tol=1e-8,
                                   inner_tol=3e-4, maxiter=2_000, nu=2,
                                   coarse_iters=24, smoother="jacobi",
                                   max_refinements=8):
    """Heterogeneous-geometry batch at TRUE f64-certified tolerance:
    every leaf of `stacked` (parallel/geometry_sweep.build_padded_group)
    AND of `bhier` (build_padded_group_hierarchy) carries a leading case
    axis S — per-case operators, BCs, AND multigrid levels, vmapped
    through the same mixed-precision refinement as the material sweeps.
    Converged lanes freeze.  The MG form of batched_case_solve_refined
    (step02's padded batch was previously Jacobi-only)."""
    sig = stacked.sigma_table if sigma_tables is None else sigma_tables
    return jax.vmap(
        lambda sc, hr, s: solve_stencil_mg_refined(
            sc, hr, s, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
            nu=nu, coarse_iters=coarse_iters, smoother=smoother,
            max_refinements=max_refinements)
    )(stacked, bhier, sig)


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu",
                                   "coarse_iters", "smoother"))
def batched_group_solve_mg(stacked: StencilCase, bhier: MGHierarchy,
                           sigma_tables=None, *, tol=1e-8,
                           maxiter=2_000, nu=2, coarse_iters=24,
                           smoother="jacobi"):
    """batched_group_solve_mg_refined's plain (single-precision) twin —
    for workflows without x64 (recursive residual only; don't feed
    hard-contrast flux metrics from this)."""
    sig = stacked.sigma_table if sigma_tables is None else sigma_tables
    return jax.vmap(
        lambda sc, hr, s: solve_stencil_mg(
            sc, hr, s, tol=tol, maxiter=maxiter, nu=nu,
            coarse_iters=coarse_iters, smoother=smoother)
    )(stacked, bhier, sig)


# ── Lane-stacked fused-SpMV multigrid (megatet-scale WIDE sweeps) ──────
#
# batched_mg_solve materializes per-lane combined coefficients
# (O(L*27*G) — ~3.4 GB at L=100 on the 1.75M-tet grid), so MG was
# effectively unavailable for wide sweeps on megatet grids and the
# body-factored fused path had only Jacobi (~1095 iters at the sigma
# extremes, 40.6 s — PARITY.md round-2 table).  The V-cycle below runs
# every level on lane-stacked (L, X, Y, Z) arrays with the body-factored
# fused SpMV (ops.stencil.batched_stencil_spmv_fused): peak memory
# O(L*G + B*27*G), iteration counts identical to the vmapped MG path.


def flat_batched_ok(coeff, L) -> bool:
    """Whether the lane-batched flat Pallas kernel can serve a fused
    sweep of width L on this coefficient stack: TPU only, f32 only
    (Mosaic has no f64), and the operand set must fit the axon AOT
    scoped-VMEM accounting envelope (whole operands are charged against
    the 512 MB limit the kernel requests — ops/pallas_stencil.py)."""
    if jax.default_backend() == "cpu" or coeff.dtype != jnp.float32:
        return False
    B, _, X, Y, Z = coeff.shape
    F = -(-((Y + 2) * (Z + 2)) // 128) * 128
    Xr = -(-X // 8) * 8
    operand_bytes = 4 * (3 * L * (Xr + 2) * F     # xl/xm/xh views
                         + B * 27 * Xr * F        # packed coefficients
                         + L * Xr * F)            # output
    return operand_bytes <= 460 * 1024 * 1024


def _fused_level_pieces(coeff, free, sig, spmv=None):
    """(op, dinv, freeb) for one lane-stacked fused level.

    coeff (B, 27, X, Y, Z); free (X, Y, Z); sig (L, T) full sigma
    tables (body b at slot b+1).  spmv="flat" routes the matvec through
    the lane-batched flat Pallas kernel (coefficients VMEM-resident
    across lanes — 1.15-1.69x over the fused-XLA matvec on v5e at
    megatet scale, L=8-32)."""
    from pelvistim_fem_tpu.ops.stencil import batched_stencil_spmv_fused
    freeb = free[None]

    if spmv == "flat":
        from pelvistim_fem_tpu.ops.pallas_stencil import (
            batched_stencil_spmv_flat, pack_coeff_flat_bodies)
        Cf = pack_coeff_flat_bodies(coeff)

        def op(Xs):
            Xm = jnp.where(freeb, Xs, 0.0)
            Ys = batched_stencil_spmv_flat(Xm, Cf, sig)
            return jnp.where(freeb, Ys, Xs)
    else:
        def op(Xs):
            Xm = jnp.where(freeb, Xs, 0.0)
            Ys = batched_stencil_spmv_fused(Xm, coeff, sig)
            return jnp.where(freeb, Ys, Xs)

    diag_l = jnp.einsum("lb,bxyz->lxyz", sig[:, 1:1 + coeff.shape[0]],
                        coeff[:, DIAG_OFFSET],
                        precision=jax.lax.Precision.HIGHEST)
    diag = jnp.where(freeb & (diag_l != 0), diag_l, 1.0)
    return op, 1.0 / diag, freeb


def _fused_cycle(hier, sig, b, *, nu=2, omega=0.7, coarse_iters=24,
                 spmv=None):
    """One lane-stacked V-cycle (exact recursion of cycle_impl with
    lane-wise reductions).  b (L, X, Y, Z) -> z (L, X, Y, Z).

    spmv="flat" engages the lane-batched flat Pallas kernel on levels
    large enough to amortize its pipeline cost (FLAT_MIN_NODES, same
    rule as _level_op)."""
    levels = hier.levels
    n_levels = len(levels)
    red = lambda a: jnp.sum(a, axis=(1, 2, 3))          # -> (L,)
    ex = lambda v: v[:, None, None, None]
    pieces = [_fused_level_pieces(
        lv.coeff, lv.free, sig,
        spmv=spmv if (spmv == "flat"
                      and lv.free.size >= FLAT_MIN_NODES) else None)
        for lv in levels]

    def cycle(level, b):
        op, dinv, _ = pieces[level]
        if level == n_levels - 1:
            # coarsest: fixed-iteration lane-aware CG
            z0 = dinv * b

            def cg_body(_, st):
                x, r, p, rz = st
                ap = op(p)
                denom = red(p * ap)
                alpha = rz / jnp.where(denom != 0, denom, 1.0)
                x = x + ex(alpha) * p
                r = r - ex(alpha) * ap
                z = dinv * r
                rz_n = red(r * z)
                beta = rz_n / jnp.where(rz != 0, rz, 1.0)
                return (x, r, z + ex(beta) * p, rz_n)

            x, *_ = jax.lax.fori_loop(
                0, coarse_iters, cg_body,
                (jnp.zeros_like(b), b, z0, red(b * z0)))
            return x

        def smooth(x, bb):
            return jax.lax.fori_loop(
                0, nu, lambda _, x: x + omega * dinv * (bb - op(x)), x)

        x = smooth(jnp.zeros_like(b), b)
        r = b - op(x)
        rc = hier.restricts[level](r)       # transfers take batch axes
        rc = jnp.where(levels[level + 1].free[None], rc, 0.0)
        xc = cycle(level + 1, rc)
        x = x + hier.prolongs[level](xc)
        return smooth(x, b)

    return cycle(0, b)


def _fused_pcg(op, b, M, x0, *, tol, maxiter):
    """Lane-aware preconditioned CG on (L, X, Y, Z) state: dots reduce
    over grid axes only, converged lanes FREEZE.  `tol` may be a traced
    scalar or per-lane (L,) vector.  Returns (x, iterations (L,))."""
    red = lambda a: jnp.sum(a, axis=(1, 2, 3))
    dot = lambda a, b: red(a * b)
    nrm = lambda a: jnp.sqrt(red(a * a))
    ex = lambda v: v[:, None, None, None]
    L = b.shape[0]

    bnorm = nrm(b)
    tol_abs = tol * bnorm

    r0 = b - op(x0)
    z0 = M(r0)
    rz0 = dot(r0, z0)
    done0 = nrm(r0) <= tol_abs
    state0 = (x0, r0, z0, rz0, z0, jnp.zeros(L, jnp.int32), done0)

    def cond(state):
        *_, k, done = state
        return jnp.any(~done & (k < maxiter))

    def body(state):
        x, r, z, rz, p, k, done = state
        ap = op(p)
        alpha = rz / dot(p, ap)
        x_n = x + ex(alpha) * p
        r_n = r - ex(alpha) * ap
        z_n = M(r_n)
        rz_n = dot(r_n, z_n)
        beta = rz_n / rz
        p_n = z_n + ex(beta) * p
        sel = lambda new, old: jnp.where(ex(done), old, new)
        sel0 = lambda new, old: jnp.where(done, old, new)
        x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
        rz, p = sel0(rz_n, rz), sel(p_n, p)
        k = sel0(k + 1, k)
        done = done | (nrm(r) <= tol_abs)
        return (x, r, z, rz, p, k, done)

    x, *_, k, _ = jax.lax.while_loop(cond, body, state0)
    return x, k


def _fused_bc_pieces(scase, sig, spmv=None):
    """Fine-level (op, b_eff, x0, freeb) for the lane-stacked system.

    The operator comes from scase.coeff, NOT hier.levels[0]: the
    refined solver passes an f64 scase with an f32-probed hierarchy
    (assemble_lattice_refined), and the master operator must stay
    f64."""
    from pelvistim_fem_tpu.ops.stencil import batched_stencil_spmv_fused
    L = sig.shape[0]
    op, _, freeb = _fused_level_pieces(scase.coeff, scase.free,
                                       sig, spmv=spmv)
    phi_d = jnp.where(scase.free, 0.0, scase.dirichlet)
    Kphi_d = batched_stencil_spmv_fused(
        jnp.broadcast_to(phi_d, (L,) + phi_d.shape),
        scase.coeff, sig)
    b_eff = jnp.where(freeb, scase.b_neumann[None] - Kphi_d,
                      jnp.broadcast_to(scase.dirichlet[None],
                                       Kphi_d.shape))
    x0 = jnp.broadcast_to(jnp.where(scase.free, 0.0, scase.dirichlet),
                          b_eff.shape)
    return op, b_eff, x0, freeb


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu", "omega",
                                   "coarse_iters", "spmv"))
def batched_mg_solve_fused(scase: StencilCase, hier: MGHierarchy,
                           sigma_tables, *, tol=1e-8, maxiter=2_000,
                           nu=2, omega=0.7, coarse_iters=24, spmv=None):
    """Material sweep as ONE lane-stacked MG-preconditioned CG with the
    body-factored fused SpMV at every level — the MG form of
    ops.stencil.batched_stencil_solve_fused.  Use when per-lane combined
    coefficients (batched_mg_solve) would exhaust memory: peak is
    O(L*G + B*27*G) while iteration counts match the vmapped MG path."""
    sig = sigma_tables
    op, b_eff, x0, freeb = _fused_bc_pieces(scase, sig, spmv=spmv)

    def M(r):
        rm = jnp.where(freeb, r, 0.0)
        z = _fused_cycle(hier, sig, rm, nu=nu, omega=omega,
                         coarse_iters=coarse_iters, spmv=spmv)
        return jnp.where(freeb, z, r)

    red = lambda a: jnp.sum(a, axis=(1, 2, 3))
    bnorm = jnp.sqrt(red(b_eff * b_eff))
    x, k = _fused_pcg(op, b_eff, M, x0, tol=tol, maxiter=maxiter)
    rel = jnp.sqrt(red((b_eff - op(x)) ** 2)) / jnp.where(
        bnorm > 0, bnorm, 1.0)
    L = sig.shape[0]
    phi_nodes = x.reshape(L, -1)[:, scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "omega", "coarse_iters",
                                   "max_refinements", "spmv"))
def batched_mg_solve_fused_refined(scase: StencilCase, hier: MGHierarchy,
                                   sigma_tables, x_init=None, *, tol=1e-8,
                                   inner_tol=3e-4, maxiter=2_000, nu=2,
                                   omega=0.7, coarse_iters=24,
                                   max_refinements=8, spmv=None):
    """Megatet-scale WIDE sweeps at TRUE f64-certified 1e-8 (VERDICT
    round-2 item 3): f32 lane-stacked fused MG-CG inner sweeps + f64
    fused residual correction, lanes frozen on convergence.  Closes the
    last cell of the (problem-size x sweep-width) matrix — previously
    such sweeps had only the ~1095-iteration Jacobi fused path at a
    non-certified 1e-6.

    x_init: optional (L, X, Y, Z) f64 warm start (Dirichlet slots must
    carry their lifted values).  The refinement loop is a fixed point of
    the TRUE f64 residual, so a good warm start (e.g. a reduced-basis
    reconstruction, ops/rom.py) converges in the few inner iterations
    its own residual warrants — this is what makes ROM fallback lanes
    cheap instead of cold full solves.

    scase/hier may be any float dtype; the f64 master and f32 inner
    operators are both derived here.  Requires jax_enable_x64."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("batched_mg_solve_fused_refined")
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    sc64, sc32 = to(scase, jnp.float64), to(scase, jnp.float32)
    hier32 = to(hier, jnp.float32)
    sig64 = sigma_tables.astype(jnp.float64)
    sig32 = sigma_tables.astype(jnp.float32)
    L = sigma_tables.shape[0]

    # f64 residual SpMVs stay on the XLA path (no f64 Pallas on TPU);
    # spmv="flat" accelerates the f32 inner sweeps + V-cycle only.
    op64, b64, x0, freeb = _fused_bc_pieces(sc64, sig64)
    op32, _, _, _ = _fused_bc_pieces(sc32, sig32, spmv=spmv)

    def M32(r):
        rm = jnp.where(freeb, r, 0.0)
        z = _fused_cycle(hier32, sig32, rm, nu=nu, omega=omega,
                         coarse_iters=coarse_iters, spmv=spmv)
        return jnp.where(freeb, z, r)

    red = lambda a: jnp.sum(a, axis=(1, 2, 3))
    nrm = lambda a: jnp.sqrt(red(a * a))
    ex = lambda v: v[:, None, None, None]
    bnorm = nrm(b64)
    x = x0 if x_init is None else x_init.astype(jnp.float64)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        # solve_stencil_mg_refined's adaptive per-pass tolerance,
        # per lane
        need = 0.25 * tol / jnp.minimum(rel_old, 1.0)
        tol_k = jnp.clip(need, inner_tol, 0.05)
        dx, it = _fused_pcg(op32, r64.astype(jnp.float32), M32,
                            jnp.zeros_like(r64, jnp.float32),
                            tol=tol_k, maxiter=maxiter)
        x_n = x + dx.astype(jnp.float64)
        rel_n = nrm(b64 - op64(x_n)) / jnp.where(bnorm > 0, bnorm, 1.0)
        sel = lambda new, old: jnp.where(done, old, new)
        return (jnp.where(ex(done), x, x_n), sel(rel_n, rel_old),
                sel(total_it + it, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return jnp.any(rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = jax.lax.while_loop(
        cond, refine, (x, jnp.full(L, jnp.inf, jnp.float64),
                       jnp.zeros(L, jnp.int32), jnp.int32(0)))
    phi_nodes = x.reshape(L, -1)[:, scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=total_it, residual=rel,
                       converged=rel <= tol)


def batched_mg_solve_fused_refined_chunked(scase: StencilCase,
                                           hier: MGHierarchy,
                                           sigma_tables, x_init=None, *,
                                           lanes_per_chunk=25, **kw):
    """batched_mg_solve_fused_refined in lane chunks.

    At megatet x L=100 the whole-sweep working set exceeds one chip's
    HBM — not the data itself but the tile padding: every
    (..., Y, Z=41) array pads its minor dim to 128 (3.1x expansion,
    30.3 GB requested vs 15.75 GB on v5e).  Chunking lanes keeps memory
    O(lanes_per_chunk * G) while every chunk reuses the SAME compiled
    program (the last chunk is padded with repeated lanes and
    trimmed).  Results are concatenated in lane order.

    Unless overridden, spmv auto-selects the lane-batched flat Pallas
    kernel when the per-chunk operand set is inside the envelope
    (flat_batched_ok) — measured 1.53x over the fused-XLA MG at
    megatet L=100 (23.9 vs 36.6 s certified; the round-2 Jacobi
    baseline was 49 s at an UNCERTIFIED 1e-6)."""
    L = sigma_tables.shape[0]
    c = min(lanes_per_chunk, L)
    if "spmv" not in kw:
        c32 = scase.coeff.astype(jnp.float32)
        kw["spmv"] = "flat" if flat_batched_ok(c32, c) else None
    outs = []
    for i in range(0, L, c):
        chunk = sigma_tables[i:i + c]
        xi = None if x_init is None else x_init[i:i + c]
        pad = c - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], pad, axis=0)])
            if xi is not None:
                xi = jnp.concatenate(
                    [xi, jnp.repeat(xi[-1:], pad, axis=0)])
        r = batched_mg_solve_fused_refined(scase, hier, chunk, xi, **kw)
        if pad:
            r = jax.tree_util.tree_map(lambda a: a[:c - pad], r)
        outs.append(r)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *outs)

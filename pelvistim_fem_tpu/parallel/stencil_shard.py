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
                                           StencilCase, combine_coeffs)


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

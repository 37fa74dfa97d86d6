"""Pallas TPU kernel for the 27-point stencil SpMV.

The stencil matvec is the framework's hot op (every CG iteration).  The
XLA version (ops/stencil.py stencil_spmv) is a fused elementwise chain;
this kernel pins the schedule explicitly: output is computed row-by-row
along X, with the three needed padded-x rows and the 27 coefficient
planes for that row staged into VMEM per grid step (Pallas pipelines the
fetches), and the 27 shifted (Y, Z) windows are static VMEM slices, so
the inner loop is pure VPU multiply-adds.

The padded x rows arrive as three shifted single-row block views of the
same array (BlockSpec blocks cannot overlap, so the slab is expressed as
three inputs with index maps i, i+1, i+2).

Measured trade-off on TPU v5e (172k-tet case): 1.5-1.7x faster than the
XLA fusion per SINGLE solve iteration and ~100x faster to compile, but
~9x SLOWER inside a 100-lane vmapped sweep (vmap serializes the kernel
grid where XLA fuses the batch).  Hence opt-in (PELVISTIM_USE_PALLAS=1)
for single large solves; batched sweeps keep the XLA path.

Round-2 measurements for the BATCHED body-factored kernels (all on the
axon v5e backend, step04 full-res grid (55, 31, 19), L=100, tol 1e-6):
  vmapped Jacobi sweep         0.37 s warm   ~107 s cold compile
  fused XLA formulation        0.90 s warm    ~29 s cold compile
  fused Pallas lane-MAJOR      2.33 s warm    ~52 s cold compile
  fused Pallas lane-MINOR      1.41 s warm    ~11 s cold compile
Lane-minor is the right layout (lanes fill the 128-wide vector minor;
lane-major wastes almost every vector lane on these small (Y, Z)
planes), but at X=55 the ~55 grid steps' fixed pipeline latency still
dominates.  The intended big win — megatet grids, where the vmapped
path hauls O(L*27*G) combined coefficients per matvec — is blocked by
the axon AOT lowering, which charges pallas operands against scoped
VMEM far beyond their block footprints: megatet operand sets fail to
compile at ANY lane count (L=4, 84 MB operands, 100 MB limit).
batched_stencil_solve_fused therefore guards the Pallas route to
operand sets that compile and run, and keeps the XLA formulation
beyond.  Revisit when the backend's scoped-VMEM accounting is fixed.

At MEGATET scale the memory goal is already met without Pallas: on the
1.75M-tet grid (112, 68, 41) at L=100 (Jacobi, ~1095 iters at the
sigma extremes) the fused XLA path runs 40.6 s vs the vmapped path's
42.1 s — equal throughput with 0.3 GB of coefficients instead of
3.4 GB (the round-1 "3.5x slower" figure was a small-grid artifact).

Correctness of every kernel is pinned against the XLA path in
tests/test_pallas.py and tests/test_fused_batch.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pelvistim_fem_tpu.ops.stencil import OFFSETS


def _kernel(x0_ref, x1_ref, x2_ref, c_ref, y_ref):
    # x{0,1,2}_ref: (1, Y+2, Z+2) padded rows i, i+1, i+2
    # c_ref: (27, 1, Y, Z) coefficient planes for output row i
    # y_ref: (1, Y, Z)
    Y = y_ref.shape[1]
    Z = y_ref.shape[2]
    rows = (x0_ref, x1_ref, x2_ref)
    acc = jnp.zeros((Y, Z), y_ref.dtype)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        win = rows[1 + dx][0, 1 + dy:1 + dy + Y, 1 + dz:1 + dz + Z]
        acc = acc + c_ref[o, 0] * win
    y_ref[0] = acc


def stencil_spmv_pallas(x, C):
    """y = K x via the Pallas row kernel.  x (X, Y, Z), C (27, X, Y, Z)."""
    X, Y, Z = x.shape
    xp = jnp.pad(x, 1)                       # (X+2, Y+2, Z+2)

    row_spec = lambda shift: pl.BlockSpec(
        (1, Y + 2, Z + 2), lambda i, s=shift: (i + s, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(X,),
        in_specs=[row_spec(0), row_spec(1), row_spec(2),
                  pl.BlockSpec((27, 1, Y, Z), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Y, Z), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), x.dtype),
    )(xp, xp, xp, C)


def _make_fused_kernel_lminor(B):
    """Lane-MINOR body-factored batched row kernel.

    Arrays are laid out (X, Y, Z, L): the sweep-lane axis sits on the
    TPU's 128-wide vector minor dimension, so every multiply-add
    vectorizes over lanes while the 27 stencil windows are static major-
    dim slices.  The lane-major variant (grid (X, L), one (Y, Z) block
    per lane) measured 6x SLOWER than even the vmapped path on the
    reference grids — their (Y, Z) = (31, 19) planes are far below the
    (8, 128) VPU tile, so per-lane blocks waste almost every vector
    lane.  Lane-minor is the layout the hardware wants.
    """

    def kernel(sig_ref, x0_ref, x1_ref, x2_ref, c_ref, y_ref):
        # sig_ref: (B, L) full-array; x*_ref: (1, Y+2, Z+2, L) padded
        # rows; c_ref: (B, 27, 1, Y, Z); y_ref: (1, Y, Z, L)
        Y, Z = y_ref.shape[1], y_ref.shape[2]
        rows = (x0_ref, x1_ref, x2_ref)
        acc = jnp.zeros(y_ref.shape[1:], y_ref.dtype)
        for o, (dx, dy, dz) in enumerate(OFFSETS):
            win = rows[1 + dx][0, 1 + dy:1 + dy + Y,
                               1 + dz:1 + dz + Z, :]
            # per-lane combined coefficient: (Y, Z, 1) x (1, 1, L)
            co = c_ref[0, o, 0][:, :, None] * sig_ref[0][None, None, :]
            for b in range(1, B):
                co = co + (c_ref[b, o, 0][:, :, None]
                           * sig_ref[b][None, None, :])
            acc = acc + co * win
        y_ref[0] = acc

    return kernel


def batched_stencil_spmv_fused_lminor(Xm, coeff, sig):
    """Lane-minor fused SpMV.  Xm (Xg, Yg, Zg, L); coeff
    (B, 27, Xg, Yg, Zg); sig (B, L) (already sliced from the tables).
    Returns (Xg, Yg, Zg, L).

    Row-pipelined: one grid step per x-row streams the 3 padded input
    rows + that row's (B, 27, Y, Z) coefficient planes through VMEM —
    the layout that scales to megatet grids, where neither the
    coefficients (tiled ~0.5 GB) nor the lane-stacked vectors fit in
    VMEM whole.  Fixed per-step latency makes it lose to the vmapped
    path on SMALL grids (X~55: ~2 ms/matvec of pure step overhead); it
    exists for wide sweeps on grids where the vmapped path's per-lane
    combined coefficients (O(L*27*G) HBM traffic per matvec) dominate.
    """
    Xg, Yg, Zg, L = Xm.shape
    B = coeff.shape[0]
    Xp = jnp.pad(Xm, ((1, 1), (1, 1), (1, 1), (0, 0)))

    row_spec = lambda shift: pl.BlockSpec(
        (1, Yg + 2, Zg + 2, L), lambda i, s=shift: (i + s, 0, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fused_kernel_lminor(B),
        grid=(Xg,),
        in_specs=[
            pl.BlockSpec((B, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec(0), row_spec(1), row_spec(2),
            pl.BlockSpec((B, 27, 1, Yg, Zg), lambda i: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Yg, Zg, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Xg, Yg, Zg, L), Xm.dtype),
        # the axon AOT path charges whole operands against scoped VMEM;
        # the default 16M limit rejects lane-minor operand sets
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sig, Xp, Xp, Xp, coeff)


def _make_fused_kernel(B):
    """Body-factored batched row kernel: for one (row i, lane l) grid
    step, combine sigma with the B per-body coefficient planes ON THE
    FLY (135 multiply-adds at B=5) and apply the 27-point stencil — the
    kernel named as round-2 work at ops/stencil.py (batched_*_fused).

    No per-lane (27, G) combined-coefficient block ever exists: memory
    is O(L*G + B*27*G).  The lane axis is the INNER grid dimension, so
    the (B, 27, Y, Z) coefficient block's index map is constant across
    consecutive steps and Pallas keeps it resident in VMEM for all L
    lanes of a row."""

    def kernel(sig_ref, x0_ref, x1_ref, x2_ref, c_ref, y_ref):
        # sig_ref: (L, B) full array in SMEM (a (1, B) block would
        # violate the min-tile rule); x*_ref: (1, 1, Y+2, Z+2) padded
        # rows of lane l; c_ref: (B, 27, 1, Y, Z); y_ref: (1, 1, Y, Z)
        lane = pl.program_id(1)
        Y = y_ref.shape[2]
        Z = y_ref.shape[3]
        rows = (x0_ref, x1_ref, x2_ref)
        acc = jnp.zeros((Y, Z), y_ref.dtype)
        for o, (dx, dy, dz) in enumerate(OFFSETS):
            win = rows[1 + dx][0, 0, 1 + dy:1 + dy + Y,
                               1 + dz:1 + dz + Z]
            co = sig_ref[lane, 0] * c_ref[0, o, 0]
            for b in range(1, B):
                co = co + sig_ref[lane, b] * c_ref[b, o, 0]
            acc = acc + co * win
        y_ref[0, 0] = acc

    return kernel


def batched_stencil_spmv_fused_pallas(X, coeff, sigma_tables):
    """Lane-stacked body-factored SpMV:
        Y[l] = sum_b sigma[l, b] * (C_b * shift(X[l]))

    X (L, Xg, Yg, Zg); coeff (B, 27, Xg, Yg, Zg); sigma_tables (L, T)
    with body b at table index b+1.  Drop-in for
    ops.stencil.batched_stencil_spmv_fused (the XLA formulation, which
    materializes broadcast intermediates and measured 3.5x slower than
    the vmapped path on TPU)."""
    L, Xg, Yg, Zg = X.shape
    B = coeff.shape[0]
    sig = sigma_tables[:, 1:1 + B].astype(X.dtype)       # (L, B)
    Xp = jnp.pad(X, ((0, 0), (1, 1), (1, 1), (1, 1)))

    row_spec = lambda shift: pl.BlockSpec(
        (1, 1, Yg + 2, Zg + 2), lambda i, l, s=shift: (l, i + s, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fused_kernel(B),
        grid=(Xg, L),                 # lanes innermost: C row resident
        in_specs=[
            # whole (L, B) sigma table in SMEM (full-array blocks are
            # exempt from the min-tile constraint); kernel picks its
            # lane's row by program_id
            pl.BlockSpec((L, B), lambda i, l: (0, 0),
                         memory_space=pltpu.SMEM),
            row_spec(0), row_spec(1), row_spec(2),
            pl.BlockSpec((B, 27, 1, Yg, Zg),
                         lambda i, l: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Yg, Zg),
                               lambda i, l: (l, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Xg, Yg, Zg), X.dtype),
    )(sig, Xp, Xp, Xp, coeff)


# ---------------------------------------------------------------------------
# Lane-packed FLAT-layout kernel
#
# The row kernels above keep the (Y, Z) plane 2-D, so the VPU's 128-wide
# lane dimension holds only Z values (Z=41 on the megatet grid: 2/3 of
# every vector lane idle), and the grid has X steps (112) of fixed
# pipeline latency.
#
# BANDWIDTH ENVELOPE (corrected round 4, dev/roofline_probe.py +
# dev/spmv_kernels_ab.py): every jitted axon call carries a ~70-170 ms
# FIXED overhead (tunnel dispatch + scalar-readback RTT), which earlier
# micro-benchmarks divided across only ~100 applies — the round-3 "XLA
# SpMV at 39 GB/s = 5% of peak" was that artifact, not the kernel.
# Two-point MARGINAL timing (slope of wall vs rep count) on the megatet
# grid measures: XLA SpMV ~108 us/apply (~335 GB/s logical), this flat
# kernel ~56 us/apply (~650 GB/s logical ~ 80% of the 819 GB/s v5e
# roofline).  The hot op is essentially bandwidth-bound already; the
# remaining levers are fewer applies per V-cycle (multigrid.smooth0)
# and fewer calls, not kernel micro-optimization.  Two traffic-cutting
# variants were measured and REJECTED: shift-free phantom (bounds the
# roll cost at ~7%) and bfloat16 coefficient planes (halves traffic but
# independently rounding the 27 planes breaks row sums — the V-cycle
# lost its near-nullspace and iterations exploded 48 -> 4032 at the
# 7000x contrast; see dev/step04_sweep_ab.py).
#
# This kernel flattens the halo-padded plane: f = (y+1)*(Z+2) + (z+1),
# F = roundup((Y+2)*(Z+2), 128).  Then every stencil neighbor is ONE
# uniform flat offset off = dy*(Z+2) + dz, implemented as a lane roll of
# a fully-packed (R, F) row block — all 128 lanes busy, and R=8 x-rows
# per grid step cut the megatet grid from 112 steps to 14.  Circular
# wrap from the roll is harmless: C is zero at every halo/pad position,
# and interior positions never read a wrapped value (interior f spans
# [Z+3, (Y+1)(Z+2)-2]; |off| <= Z+3 <= F - interior_max).
# ---------------------------------------------------------------------------


def _round_up(n, m):
    return -(-n // m) * m


# x-rows per flat-kernel grid step.  8 measured best on the megatet
# grid (2.53 ms/MG-iter vs 2.5x-worse at 1 row); larger blocks trade
# fewer pipeline steps for more VMEM per step.
FLAT_ROWS = 8


def _flat_offsets(Z):
    return [dy * (Z + 2) + dz for (_, dy, dz) in OFFSETS]


def pack_coeff_flat(C, rows=None):
    """(27, X, Y, Z) -> (27, Xr, F) flat layout with zeroed halo/pad
    (Xr = roundup(X, rows), F = roundup((Y+2)*(Z+2), 128)).  One-time
    per solve; the result is what stencil_spmv_flat consumes."""
    rows = FLAT_ROWS if rows is None else rows
    _, X, Y, Z = C.shape
    Xr = _round_up(X, rows)
    F0 = (Y + 2) * (Z + 2)
    F = _round_up(F0, 128)
    Cp = jnp.pad(C, ((0, 0), (0, Xr - X), (1, 1), (1, 1)))
    Cf = Cp.reshape(27, Xr, F0)
    return jnp.pad(Cf, ((0, 0), (0, 0), (0, F - F0)))


def _make_flat_kernel(offs):
    def kernel(xl_ref, xm_ref, xh_ref, c_ref, y_ref):
        # x{l,m,h}_ref: (R, F) packed rows i-1 / i / i+1; c_ref:
        # (27, R, F); y_ref: (R, F)
        rows = (xl_ref, xm_ref, xh_ref)
        acc = jnp.zeros(y_ref.shape, y_ref.dtype)
        F = y_ref.shape[1]
        for o, (dx, _, _) in enumerate(OFFSETS):
            xs = rows[1 + dx][:, :]
            off = offs[o]
            if off != 0:
                # pltpu.roll wants a non-negative shift; (-off) % F is
                # the same circular rotation.  Explicit int32: under
                # jax_enable_x64 a bare Python int lowers to i64, which
                # tpu.dynamic_rotate rejects.
                xs = pltpu.roll(xs, jnp.int32((-off) % F), 1)
            acc = acc + c_ref[o] * xs
        y_ref[:, :] = acc

    return kernel


def stencil_spmv_flat(x, Cf, rows=None):
    """y = K x with the lane-packed flat kernel.  x (X, Y, Z); Cf from
    pack_coeff_flat(C, rows).  Returns (X, Y, Z).

    Per apply the packing adds two small copies of x (~4% of the
    coefficient traffic); Cf itself is packed once per solve."""
    rows = FLAT_ROWS if rows is None else rows
    X, Y, Z = x.shape
    Xr = Cf.shape[1]
    F = Cf.shape[2]
    if Xr % rows or Xr < X:
        raise ValueError(
            f"rows={rows} incompatible with packed Cf (Xr={Xr}, X={X}):"
            " pack_coeff_flat and stencil_spmv_flat must agree on a"
            " rows value dividing Xr, or trailing x-planes are dropped")
    F0 = (Y + 2) * (Z + 2)
    xp = jnp.pad(x, ((1, Xr - X + 1), (1, 1), (1, 1)))
    xf = jnp.pad(xp.reshape(Xr + 2, F0), ((0, 0), (0, F - F0)))
    xl, xm, xh = xf[0:Xr], xf[1:Xr + 1], xf[2:Xr + 2]

    # index maps return explicit int32 zeros: under jax_enable_x64 a
    # bare Python 0 traces as i64 and Mosaic rejects the lowering
    # ("failed to legalize func.return (i32, i64)").  numpy scalar, not
    # jnp: index maps may not capture jax Array constants.
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((rows, F), lambda i: (i, z32),
                               memory_space=pltpu.VMEM)
    yf = pl.pallas_call(
        _make_flat_kernel(tuple(_flat_offsets(Z))),
        grid=(Xr // rows,),
        in_specs=[blk(), blk(), blk(),
                  pl.BlockSpec((27, rows, F), lambda i: (z32, i, z32),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((Xr, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xl, xm, xh, Cf)
    return yf[:X, :F0].reshape(X, Y + 2, Z + 2)[:, 1:Y + 1, 1:Z + 1]


# ---------------------------------------------------------------------------
# BATCHED lane-packed flat kernel (round-3, VERDICT item 5)
#
# The flat kernel above is single-solve-only (vmap serializes Pallas
# grids into separate kernel launches).  This variant folds the sweep
# lanes into the KERNEL GRID instead: grid = (Xr/R, L) with lanes
# innermost, so the (B, 27, R, F) body-factored coefficient block's
# index map is constant across the inner lane steps and Pallas keeps it
# VMEM-resident while all L lanes of a row-block stream through.  Per
# matvec the coefficients are read from HBM ONCE (27*B*G) instead of
# per-lane (the vmapped path's O(L*27*G)) and the per-lane combine is
# B*27 VPU multiply-adds on fully-packed 128-lane vectors.
# ---------------------------------------------------------------------------


def pack_coeff_flat_bodies(coeff, rows=None):
    """(B, 27, X, Y, Z) per-body stacks -> (B, 27, Xr, F) flat layout
    (see pack_coeff_flat)."""
    return jnp.stack([pack_coeff_flat(c, rows) for c in coeff])


def _make_flat_fused_kernel(offs, B):
    def kernel(sig_ref, xl_ref, xm_ref, xh_ref, c_ref, y_ref):
        # sig_ref (L, B) SMEM; x*_ref (1, R, F) lane l's packed rows
        # i-1 / i / i+1; c_ref (B, 27, R, F); y_ref (1, R, F)
        lane = pl.program_id(1)
        rows3 = (xl_ref, xm_ref, xh_ref)
        F = y_ref.shape[2]
        acc = jnp.zeros(y_ref.shape[1:], y_ref.dtype)
        for o, (dx, _, _) in enumerate(OFFSETS):
            xs = rows3[1 + dx][0]
            off = offs[o]
            if off != 0:
                xs = pltpu.roll(xs, jnp.int32((-off) % F), 1)
            co = sig_ref[lane, 0] * c_ref[0, o]
            for b in range(1, B):
                co = co + sig_ref[lane, b] * c_ref[b, o]
            acc = acc + co * xs
        y_ref[0] = acc

    return kernel


def batched_stencil_spmv_flat(X4, Cf, sigma_tables, rows=None):
    """Lane-batched body-factored flat SpMV.

    X4 (L, Xg, Yg, Zg); Cf (B, 27, Xr, F) from pack_coeff_flat_bodies;
    sigma_tables (L, T) with body b at slot b+1.  Returns
    (L, Xg, Yg, Zg).

    Grid (Xr/R, L), lanes innermost: the coefficient block is fetched
    once per row-block and reused for every lane, so HBM coefficient
    traffic is O(B*27*G) per matvec regardless of L."""
    rows = FLAT_ROWS if rows is None else rows
    L, Xg, Yg, Zg = X4.shape
    B, _, Xr, F = Cf.shape
    if Xr % rows or Xr < Xg:
        raise ValueError(f"rows={rows} incompatible with packed Cf "
                         f"(Xr={Xr}, X={Xg})")
    F0 = (Yg + 2) * (Zg + 2)
    sig = sigma_tables[:, 1:1 + B].astype(X4.dtype)      # (L, B)
    xp = jnp.pad(X4, ((0, 0), (1, Xr - Xg + 1), (1, 1), (1, 1)))
    xf = jnp.pad(xp.reshape(L, Xr + 2, F0),
                 ((0, 0), (0, 0), (0, F - F0)))
    xl, xm, xh = xf[:, 0:Xr], xf[:, 1:Xr + 1], xf[:, 2:Xr + 2]

    z32 = np.int32(0)
    blk = lambda s: pl.BlockSpec(
        (1, rows, F), lambda i, l, s=s: (l, i, z32),
        memory_space=pltpu.VMEM)
    yf = pl.pallas_call(
        _make_flat_fused_kernel(tuple(_flat_offsets(Zg)), B),
        grid=(Xr // rows, L),
        in_specs=[
            pl.BlockSpec((L, B), lambda i, l: (z32, z32),
                         memory_space=pltpu.SMEM),
            blk(0), blk(0), blk(0),
            pl.BlockSpec((B, 27, rows, F),
                         lambda i, l: (z32, z32, i, z32),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk(0),
        out_shape=jax.ShapeDtypeStruct((L, Xr, F), X4.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=512 * 1024 * 1024),
    )(sig, xl, xm, xh, Cf)
    return yf[:, :Xg, :F0].reshape(
        L, Xg, Yg + 2, Zg + 2)[:, :, 1:Yg + 1, 1:Zg + 1]

"""Flat-kernel variant A/B on the megatet grid (round-4 VERDICT item 1).

Hypothesis under test: the lane-packed flat kernel (ops/pallas_stencil.
stencil_spmv_flat) sits at ~7% of HBM peak not because of bandwidth but
because its 26 pltpu.roll ops per grid step lower to tpu.dynamic_rotate
(the shift amount is a traced jnp constant).  Variants:

  v0      current flat kernel (baseline)
  v0r16   v0 with rows=16 (fewer grid steps)
  vnoop   PHANTOM: no shifts at all (wrong results) — bounds what the
          memory system + VPU FMAs alone cost; the roll cost is
          (v0 - vnoop)
  vslice  static-slice shifts: x rows packed with a 128-lane halo pad
          so every neighbor window is a STATIC contiguous slice
          x_ref[:, 64+off : 64+off+F] — no rotate at all
  vsl16   vslice with rows=16
  vbf16   vslice + bfloat16 coefficient planes (halves C traffic; the
          FMA accumulates in f32)

Usage: python dev/spmv_kernels_ab.py [--small]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.utils.config import default_params
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops import stencil as st
import pelvistim_fem_tpu.ops.pallas_stencil as ps

PAD = 64          # lane halo on the packed-F dim (>= max |off| = Z+3)


def _round_up(n, m):
    return -(-n // m) * m


# ── static-slice kernel ─────────────────────────────────────────────────
def _make_slice_kernel(offs, cast=None):
    def kernel(xl_ref, xm_ref, xh_ref, c_ref, y_ref):
        # x*_ref: (R, F + 2*PAD) halo-padded packed rows i-1/i/i+1
        # c_ref: (27, R, F); y_ref: (R, F)
        rows3 = (xl_ref, xm_ref, xh_ref)
        F = y_ref.shape[1]
        acc = jnp.zeros(y_ref.shape, y_ref.dtype)
        for o, (dx, _, _) in enumerate(ps.OFFSETS):
            xs = rows3[1 + dx][:, PAD + offs[o]:PAD + offs[o] + F]
            c = c_ref[o]
            if cast is not None:
                c = c.astype(cast)
            acc = acc + c * xs
        y_ref[:, :] = acc
    return kernel


def spmv_slice(x, Cf, rows=8, cdtype=None):
    """Static-slice flat SpMV.  x (X, Y, Z); Cf (27, Xr, F) packed
    (optionally bf16).  Returns (X, Y, Z)."""
    X, Y, Z = x.shape
    _, Xr, F = Cf.shape
    F0 = (Y + 2) * (Z + 2)
    xp = jnp.pad(x, ((1, Xr - X + 1), (1, 1), (1, 1)))
    xf = jnp.pad(xp.reshape(Xr + 2, F0), ((0, 0), (PAD, F - F0 + PAD)))
    xl, xm, xh = xf[0:Xr], xf[1:Xr + 1], xf[2:Xr + 2]

    z32 = np.int32(0)
    blkx = lambda: pl.BlockSpec((rows, F + 2 * PAD), lambda i: (i, z32),
                                memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((rows, F), lambda i: (i, z32),
                               memory_space=pltpu.VMEM)
    yf = pl.pallas_call(
        _make_slice_kernel(tuple(ps._flat_offsets(Z)),
                           cast=(x.dtype if cdtype else None)),
        grid=(Xr // rows,),
        in_specs=[blkx(), blkx(), blkx(),
                  pl.BlockSpec((27, rows, F), lambda i: (z32, i, z32),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((Xr, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xl, xm, xh, Cf)
    return yf[:X, :F0].reshape(X, Y + 2, Z + 2)[:, 1:Y + 1, 1:Z + 1]


# ── phantom no-shift kernel (WRONG results; memory/FMA bound only) ─────
def _noop_kernel(xl_ref, xm_ref, xh_ref, c_ref, y_ref):
    rows3 = (xl_ref, xm_ref, xh_ref)
    acc = jnp.zeros(y_ref.shape, y_ref.dtype)
    for o, (dx, _, _) in enumerate(ps.OFFSETS):
        acc = acc + c_ref[o] * rows3[1 + dx][:, :]
    y_ref[:, :] = acc


def spmv_noop(x, Cf, rows=8):
    X, Y, Z = x.shape
    _, Xr, F = Cf.shape
    F0 = (Y + 2) * (Z + 2)
    xp = jnp.pad(x, ((1, Xr - X + 1), (1, 1), (1, 1)))
    xf = jnp.pad(xp.reshape(Xr + 2, F0), ((0, 0), (0, F - F0)))
    xl, xm, xh = xf[0:Xr], xf[1:Xr + 1], xf[2:Xr + 2]
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((rows, F), lambda i: (i, z32),
                               memory_space=pltpu.VMEM)
    yf = pl.pallas_call(
        _noop_kernel, grid=(Xr // rows,),
        in_specs=[blk(), blk(), blk(),
                  pl.BlockSpec((27, rows, F), lambda i: (z32, i, z32),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((Xr, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xl, xm, xh, Cf)
    return yf[:X, :F0].reshape(X, Y + 2, Z + 2)[:, 1:Y + 1, 1:Z + 1]


def main():
    p3 = default_params("step03_ankle_layers")
    if "--small" in _sys.argv:
        p3["mesh"] = {"lc_global_mm": 3.0, "lc_electrode_mm": 2.0,
                      "lc_skin_min": 0.8}
    else:
        p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
                      "lc_skin_min": 0.4}
    spec, _ = build_layered_spec(p3)
    dev = spec_device_arrays(spec, jnp.float32)
    scase, hier = assemble_lattice(spec, jnp.float32, device_arrays=dev)
    X, Y, Z = spec.grid_shape
    G = X * Y * Z
    C = st.combine_coeffs(scase.coeff, scase.sigma_table)
    jax.block_until_ready(C)
    x0 = jnp.ones((X, Y, Z), jnp.float32) / np.sqrt(G)
    bytes_f32 = (27 * G + 2 * G) * 4
    print(f"grid {spec.grid_shape} G={G} logical f32 MB/apply "
          f"{bytes_f32/1e6:.1f}", flush=True)

    def loop(fn):
        @partial(jax.jit, static_argnames="n")
        def run(x, Cf, n=100):
            def body(_, x):
                y = fn(x, Cf)
                return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
            return jax.lax.fori_loop(0, n, body, x)
        return run

    def timeit(name, fn, x, Cf, n=100, nbytes=bytes_f32):
        # Two-point marginal timing: an axon jitted call carries a
        # ~70 ms FIXED overhead (tunnel dispatch + scalar-readback RTT)
        # that swamps per-apply costs at small rep counts (measured in
        # dev/roofline_probe.py: same kernel 0.735 ms/apply at n=100 vs
        # 0.213 at n=400).  The marginal slope (T(n2)-T(n1))/(n2-n1) is
        # the true on-device per-apply time.
        run = loop(fn)
        n1, n2 = 50, 450
        best1 = best2 = np.inf
        for nn in (n1, n2):
            run(x, Cf, n=nn)  # compile both loop lengths
        float(np.asarray(run(x, Cf, n=n1)).ravel()[0])
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(x, Cf, n=n1)).ravel()[0])
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(run(x, Cf, n=n2)).ravel()[0])
            best2 = min(best2, time.perf_counter() - t0)
        best = (best2 - best1) / (n2 - n1)
        print(f"{name}: {best*1e6:.0f} us/apply marginal "
              f"(call overhead {best1 - n1*best:.3f} s), "
              f"{nbytes/best/1e9:.0f} GB/s logical-f32 "
              f"({nbytes/best/819e9*100:.1f}% of v5e peak)", flush=True)
        return best

    y_ref = st.stencil_spmv(x0, C)

    def check(name, y):
        err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        print(f"  {name} max rel err vs XLA: {err:.2e}", flush=True)

    Cf8 = ps.pack_coeff_flat(C, rows=8)
    jax.block_until_ready(Cf8)
    check("v0", ps.stencil_spmv_flat(x0, Cf8, rows=8))
    check("vslice", spmv_slice(x0, Cf8, rows=8))
    Cb = Cf8.astype(jnp.bfloat16)
    check("vbf16", spmv_slice(x0, Cb, rows=8, cdtype="cast"))

    timeit("xla   ", lambda x, c: st.stencil_spmv(x, c), x0, C)
    timeit("v0    ", lambda x, c: ps.stencil_spmv_flat(x, c, rows=8),
           x0, Cf8)
    timeit("vnoop ", lambda x, c: spmv_noop(x, c, rows=8), x0, Cf8)
    timeit("vslice", lambda x, c: spmv_slice(x, c, rows=8), x0, Cf8)
    timeit("vbf16 ", lambda x, c: spmv_slice(x, c, rows=8, cdtype="c"),
           x0, Cb)
    Cf16 = ps.pack_coeff_flat(C, rows=16)
    jax.block_until_ready(Cf16)
    if Cf16.shape[1] % 16 == 0:
        timeit("v0r16 ", lambda x, c: ps.stencil_spmv_flat(x, c, rows=16),
               x0, Cf16)
        timeit("vsl16 ", lambda x, c: spmv_slice(x, c, rows=16),
               x0, Cf16)
        timeit("vb16r16", lambda x, c: spmv_slice(x, c, rows=16,
                                                  cdtype="c"),
               x0, Cf16.astype(jnp.bfloat16))


if __name__ == "__main__":
    main()

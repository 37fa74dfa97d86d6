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

Correctness is pinned against the XLA path in tests/test_pallas.py.
"""

from __future__ import annotations

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

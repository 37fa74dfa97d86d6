"""Device roofline probe for the axon v5e backend.

Measures, all warm and inside jitted fori_loops (no dispatch in the
timed region):
  1. XLA elementwise stream  y = 2x+1 over a large array (HBM ceiling)
  2. MXU matmul              (FLOPs ceiling; sanity check for real v5e)
  3. Pallas copy kernel      same grid/block structure as the flat
                             stencil kernel but 1 input plane (pipeline
                             overhead isolated from C traffic)
  4. Pallas 27-plane FMA     the vnoop kernel from spmv_kernels_ab at
                             several block heights / plane widths

Interprets: if (1) is ~peak but (3)/(4) are far below, the Pallas
pipeline is the problem; if (1) is also ~30 GB/s, the backend itself
caps streaming bandwidth and the roofline target must be re-derived.
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


def bestof(f, n=3):
    f()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


# 1. XLA elementwise stream over 128 MB f32
N = 32 * 1024 * 1024
x = jnp.arange(N, dtype=jnp.float32)


@partial(jax.jit, static_argnames="n")
def stream(x, n=50):
    def body(_, x):
        return 2.0 * x + 1.0
    return jax.lax.fori_loop(0, n, body, x)


t = bestof(lambda: float(np.asarray(stream(x)[0]))) / 50
print(f"xla stream: {t*1e3:.3f} ms/pass, "
      f"{2*4*N/t/1e9:.0f} GB/s (r+w)", flush=True)

# 2. MXU matmul 4096^3 bf16
A = jnp.ones((4096, 4096), jnp.bfloat16)


@partial(jax.jit, static_argnames="n")
def mm(A, n=20):
    def body(_, A):
        return jnp.tanh(A @ A)
    return jax.lax.fori_loop(0, n, body, A)


t = bestof(lambda: float(np.asarray(mm(A)[0, 0]))) / 20
flops = 2 * 4096**3
print(f"mxu matmul: {t*1e3:.3f} ms, {flops/t/1e12:.1f} TFLOP/s bf16",
      flush=True)

# 3/4. Pallas kernels with the flat-stencil structure
X, Y, Z = 112, 68, 41
F0 = (Y + 2) * (Z + 2)
F = -(-F0 // 128) * 128
G = X * Y * Z


def mk_fma_kernel(planes):
    def kernel(x_ref, c_ref, y_ref):
        acc = jnp.zeros(y_ref.shape, y_ref.dtype)
        for o in range(planes):
            acc = acc + c_ref[o] * x_ref[:, :]
        y_ref[:, :] = acc
    return kernel


def fma(xf, Cf, rows, planes):
    Xr = Cf.shape[1]
    z32 = np.int32(0)
    blk = lambda: pl.BlockSpec((rows, F), lambda i: (i, z32),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        mk_fma_kernel(planes),
        grid=(Xr // rows,),
        in_specs=[blk(),
                  pl.BlockSpec((planes, rows, F), lambda i: (z32, i, z32),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((Xr, F), xf.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=256 * 1024 * 1024),
    )(xf, Cf)


for rows, planes, reps in ((8, 1, 100), (8, 27, 100), (16, 27, 100),
                           (56, 27, 100), (8, 27, 400)):
    Xr = -(-X // rows) * rows
    xf = jnp.ones((Xr, F), jnp.float32)
    Cf = jnp.ones((planes, Xr, F), jnp.float32)
    jax.block_until_ready((xf, Cf))

    @partial(jax.jit, static_argnames=("n", "rows", "planes"))
    def loop(xf, Cf, n=100, rows=8, planes=27):
        def body(_, xf):
            y = fma(xf, Cf, rows, planes)
            return y / jnp.maximum(jnp.sqrt(jnp.sum(y * y)), 1e-30)
        return jax.lax.fori_loop(0, n, body, xf)

    nbytes = (planes + 2) * Xr * F * 4
    t = bestof(lambda: float(np.asarray(
        loop(xf, Cf, n=reps, rows=rows, planes=planes)).ravel()[0])) / reps
    print(f"pallas fma rows={rows} planes={planes} reps={reps}: "
          f"{t*1e3:.3f} ms/apply, {nbytes/t/1e9:.0f} GB/s "
          f"({nbytes/t/819e9*100:.1f}% of 819)", flush=True)

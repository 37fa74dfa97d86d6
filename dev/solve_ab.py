"""A/B: megatet MG-CG solve with XLA spmv vs lane-packed flat kernel on
the big levels.  Timing via repeated solves with scalar readback."""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.utils.config import default_params
from pelvistim_fem_tpu.ops.lattice_assembly import (assemble_lattice,
                                                    spec_device_arrays)
from pelvistim_fem_tpu.ops import stencil as st
from pelvistim_fem_tpu.ops import multigrid as mg
from pelvistim_fem_tpu.ops.solve import preconditioned_cg
import pelvistim_fem_tpu.ops.pallas_stencil as ps

p3 = default_params("step03_ankle_layers")
p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
              "lc_skin_min": 0.4}
spec, _ = build_layered_spec(p3)
dev = spec_device_arrays(spec, jnp.float32)
scase, hier = assemble_lattice(spec, jnp.float32, device_arrays=dev)
jax.block_until_ready(scase.coeff)

MIN_FLAT = 64_000   # nodes; below this the XLA fusion is fine

def level_op_flat(level, sigma_table):
    C = st.combine_coeffs(level.coeff, sigma_table)
    free = level.free
    if free.size >= MIN_FLAT:
        Cf = ps.pack_coeff_flat(C)
        raw = lambda x: ps.stencil_spmv_flat(x, Cf)
    else:
        raw = lambda x: st.stencil_spmv(x, C)
    def op(x):
        xm = jnp.where(free, x, 0.0)
        return jnp.where(free, raw(xm), x)
    diag = jnp.where(free & (C[mg.DIAG_OFFSET] != 0),
                     C[mg.DIAG_OFFSET], 1.0)
    return op, diag

@partial(jax.jit, static_argnames=("tol", "maxiter", "flat"))
def solve(scase, hier, *, tol=1e-6, maxiter=2000, flat=True):
    sig = scase.sigma_table
    lv_op = level_op_flat if flat else mg._level_op
    ops_diags = [lv_op(lv, sig) for lv in hier.levels]
    frees = [lv.free for lv in hier.levels]
    M = lambda r: mg.cycle_impl(ops_diags, frees, hier.prolongs,
                                hier.restricts, r, nu=2, coarse_iters=24)
    op, diag = ops_diags[0]
    free = scase.free
    C0 = st.combine_coeffs(scase.coeff, sig)
    if flat and free.size >= MIN_FLAT:
        Cf0 = ps.pack_coeff_flat(C0)
        raw = lambda x: ps.stencil_spmv_flat(x, Cf0)
    else:
        raw = lambda x: st.stencil_spmv(x, C0)
    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    b_eff = jnp.where(free, scase.b_neumann - raw(phi_d), scase.dirichlet)
    Mp = lambda r: jnp.where(free, M(jnp.where(free, r, 0.0)), r)
    x0 = jnp.where(free, 0.0, scase.dirichlet)
    opf = lambda x: jnp.where(free, raw(jnp.where(free, x, 0.0)), x)
    return preconditioned_cg(opf, b_eff, Mp, x0, tol=tol, maxiter=maxiter)

for name, fl in (("xla ", False), ("flat", True)):
    r = solve(scase, hier, flat=fl)
    float(r.phi.ravel()[0])
    t0 = time.perf_counter()
    r = solve(scase, hier, flat=fl)
    float(r.phi.ravel()[0])
    dt = time.perf_counter() - t0
    it = int(np.asarray(r.iterations))
    print(f"{name}: solve {dt:.3f} s, {it} iters, {dt/it*1e3:.2f} ms/iter,"
          f" res {float(np.asarray(r.residual)):.2e}", flush=True)

"""Anisotropic megatet: tensor-conductivity assemble+solve at scale.

Muscle-fiber tensors (0.4 S/m along y, 0.09 across) on the 1.75M-tet
step03-class lattice, through the tensor branch of the device assembly
(ops/lattice_assembly.lattice_coeff) + certified MG refinement — the
capability the reference's scalar-sigma Elmer configuration cannot
express, at the same per-case cost class as the scalar fast path.

MEASURED (v5e, 2026-08-17, grid (112, 68, 41), 1.75M tets):
  anisotropic assemble+solve warm 0.464 s, 42 inner iters, certified
  true residual 1.6e-9; scalar same-spec 0.106 s / 50 iters ->
  aniso/scalar 4.4x (the 9-component tensor accumulation vs 3-term
  isotropic) — still sub-half-second per megatet anisotropic case.

Usage: python dev/aniso_megatet.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.ankle import build_layered_spec
from pelvistim_fem_tpu.ops.aniso import check_spd, tensor_table
from pelvistim_fem_tpu.ops.lattice_assembly import (
    solve_lattice_mg_refined, spec_device_arrays)
from pelvistim_fem_tpu.utils.config import default_params

p3 = default_params("step03_ankle_layers")
p3["mesh"] = {"lc_global_mm": 1.1, "lc_electrode_mm": 0.7,
              "lc_skin_min": 0.4}
t0 = time.perf_counter()
spec, _ = build_layered_spec(p3)
t_spec = time.perf_counter() - t0
n_tets = int(np.sum(spec.body6 > 0))
print(f"spec {t_spec:.2f} s, grid {spec.grid_shape}, {n_tets} tets",
      flush=True)

tab = tensor_table(spec.sigma_table,
                   {core.BODY_MUSCLE: ((0, 1, 0), 0.4, 0.09)})
check_spd(tab)
tab = jnp.asarray(tab)
dev = spec_device_arrays(spec, jnp.float64)

r = solve_lattice_mg_refined(spec, tab, tol=1e-8, device_arrays=dev)
float(np.asarray(r.phi[0]))
t0 = time.perf_counter()
r = solve_lattice_mg_refined(spec, tab, tol=1e-8, device_arrays=dev)
float(np.asarray(r.phi[0]))
t_warm = time.perf_counter() - t0
print(f"anisotropic megatet assemble+solve (warm): {t_warm:.3f} s, "
      f"{int(np.asarray(r.iterations))} inner iters, true res "
      f"{float(np.asarray(r.residual)):.2e}, converged "
      f"{bool(np.asarray(r.converged))}", flush=True)

# scalar reference on the same spec for the cost-class comparison
rs = solve_lattice_mg_refined(spec, tol=1e-8, device_arrays=dev)
float(np.asarray(rs.phi[0]))
t0 = time.perf_counter()
rs = solve_lattice_mg_refined(spec, tol=1e-8, device_arrays=dev)
float(np.asarray(rs.phi[0]))
t_s = time.perf_counter() - t0
print(f"scalar same-spec (warm): {t_s:.3f} s, "
      f"{int(np.asarray(rs.iterations))} iters -> aniso/scalar "
      f"{t_warm/t_s:.2f}x", flush=True)

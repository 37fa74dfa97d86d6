"""Measure ZZ effectivity + adaptive-regrading improvement (CPU) to pin
test gates for tests/test_estimate.py.  Run:
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python dev/estimate_measure.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops import assembly
from pelvistim_fem_tpu.ops.estimate import (adapt_axis,
                                            lattice_axis_weights,
                                            zz_error_indicators,
                                            zz_global_error)
from pelvistim_fem_tpu.ops.solve import solve_case

L = 1.0


def _exact(nodes):
    k = np.pi / L
    return np.sin(k * nodes[:, 0]) * np.sinh(k * nodes[:, 2])


def _mesh(xs, ys, zs):
    body = lambda cx, cy, cz: np.ones(cx.shape, np.int32)
    bcid = lambda fx, fy, fz, nx, ny, nz: np.full(fx.shape, 3, np.int32)
    return build_mesh_from_lattice(xs, ys, zs, body, bcid)


def _solve(mesh):
    case = build_case(mesh, {1: 1.0}, mode="voltage", dtype=jnp.float64)
    exact = _exact(np.asarray(mesh.nodes))
    bn = np.unique(np.asarray(mesh.faces))
    free = np.ones(mesh.n_nodes, bool)
    free[bn] = False
    dir_ = np.zeros(mesh.n_nodes)
    dir_[bn] = exact[bn]
    case = dataclasses.replace(
        case, free_mask=jnp.asarray(free),
        dirichlet_vals=jnp.asarray(dir_, jnp.float64),
        b_neumann=jnp.zeros(mesh.n_nodes, jnp.float64))
    res = solve_case(case, tol=1e-11, maxiter=40_000)
    return case, np.asarray(res.phi), exact


def _exact_grad(p):
    k = np.pi / L
    return np.stack([k * np.cos(k * p[..., 0]) * np.sinh(k * p[..., 2]),
                     np.zeros(p.shape[:-1]),
                     k * np.sin(k * p[..., 0]) * np.cosh(k * p[..., 2])],
                    axis=-1)


def energy_err(case, mesh, phi):
    """TRUE energy error |u - u_h|_E via a degree-2 4-point tet rule
    with the exact continuous gradient (NOT the superconvergent
    discrete-nodal e^T K e, which is O(h^2) and not what ZZ targets)."""
    from pelvistim_fem_tpu.ops.fields import cell_gradient
    gh = np.asarray(cell_gradient(case, jnp.asarray(phi)))   # (M, 3)
    verts = np.asarray(mesh.nodes)[np.asarray(case.tets)]    # (M, 4, 3)
    a, b = 0.5854101966249685, 0.13819660112501053
    lam = np.full((4, 4), b)
    np.fill_diagonal(lam, a)
    pts = np.einsum("qi,mid->mqd", lam, verts)               # (M, 4, 3)
    d = _exact_grad(pts) - gh[:, None, :]
    vol = np.asarray(case.vol)
    return float(np.sqrt(np.sum(vol[:, None] / 4.0
                                * np.sum(d * d, axis=-1))))


print("== effectivity on smooth sin*sinh ==")
for n in (8, 12, 16, 24):
    xs = np.linspace(0, L, n + 1)
    mesh = _mesh(xs, xs, xs)
    case, phi, exact = _solve(mesh)
    eta = zz_error_indicators(case, jnp.asarray(phi))
    eta_g, rel = zz_global_error(case, jnp.asarray(phi))
    err = energy_err(case, mesh, phi)
    l2 = np.linalg.norm(phi - exact) / np.linalg.norm(exact)
    print(f"n={n:3d}  eta={float(eta_g):.4e}  true_E={err:.4e}  "
          f"effectivity={float(eta_g)/err:.3f}  rel={float(rel):.3e}  "
          f"relL2={l2:.3e}")

print("== adaptive z-axis vs uniform (same cell count) ==")
n = 12
xs = np.linspace(0, L, n + 1)
mesh0 = _mesh(xs, xs, xs)
case0, phi0, ex0 = _solve(mesh0)
eta0 = zz_error_indicators(case0, jnp.asarray(phi0))
wx, wy, wz = lattice_axis_weights(case0, mesh0, (xs, xs, xs), eta0)
print("z-axis weights:", np.round(wz / wz.max(), 3))
for cycle in range(2):
    zs = adapt_axis(xs if cycle == 0 else zs, wz, n)
    meshA = _mesh(xs, xs, zs)
    caseA, phiA, exA = _solve(meshA)
    etaA = zz_error_indicators(caseA, jnp.asarray(phiA))
    errU = energy_err(case0, mesh0, phi0)
    errA = energy_err(caseA, meshA, phiA)
    l2U = np.linalg.norm(phi0 - ex0) / np.linalg.norm(ex0)
    l2A = np.linalg.norm(phiA - exA) / np.linalg.norm(exA)
    print(f"cycle {cycle}: E {errU:.4e} -> {errA:.4e} "
          f"({errU/errA:.2f}x)  relL2 {l2U:.3e} -> {l2A:.3e} "
          f"({l2U/l2A:.2f}x)  n_knots={len(zs)}")
    _, _, wz = lattice_axis_weights(caseA, meshA, (xs, xs, zs), etaA)

print("== keep-knot preservation ==")
zk = adapt_axis(xs, wz[:n], n, keep=(0.25, 0.5))
print("0.25 in knots:", np.any(np.abs(zk - 0.25) < 1e-12),
      " 0.5 in knots:", np.any(np.abs(zk - 0.5) < 1e-12),
      " n_cells:", len(zk) - 1)

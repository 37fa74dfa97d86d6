"""Measure DWR goal-bound effectivity + goal-adaptation gains to pin
tests/test_estimate.py goal gates.  Run:
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python dev/goal_measure.py

Goal functional: J(u) = int_box u dV over box = [.25,.75]^2 x [0,.25]
(faces on knot planes, so the discrete integral of the P1 field is
EXACT vertex quadrature and J(u) has a closed form for sin*sinh).
The goal region sits at the BOTTOM while the energy error lives at the
TOP (sinh curvature) — the case where goal- and energy-driven
adaptation genuinely disagree.
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
from pelvistim_fem_tpu.ops.estimate import (adapt_axis, goal_dual_case,
                                            lattice_axis_weights,
                                            zz_error_indicators,
                                            zz_goal_bound,
                                            zz_goal_indicators)
from pelvistim_fem_tpu.ops.solve import solve_case

L = 1.0
K = np.pi / L
BOX = ((0.25, 0.75), (0.25, 0.75), (0.0, 0.25))


def _exact(nodes):
    return np.sin(K * nodes[:, 0]) * np.sinh(K * nodes[:, 2])


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
    assert bool(np.asarray(res.converged))
    return case, np.asarray(res.phi)


def goal_weights(case, mesh):
    """q_i = dJ/dphi_i for J = int_box phi dV (exact for P1 when box
    faces lie on knot planes): vol_e/4 scattered to box tets' verts."""
    cc = np.asarray(mesh.nodes)[np.asarray(case.tets)].mean(axis=1)
    inbox = np.ones(len(cc), bool)
    for d, (lo, hi) in enumerate(BOX):
        inbox &= (cc[:, d] > lo) & (cc[:, d] < hi)
    q = np.zeros(mesh.n_nodes)
    tets = np.asarray(case.tets)[inbox]
    w = np.asarray(case.vol)[inbox] / 4.0
    np.add.at(q, tets.ravel(), np.repeat(w, 4))
    return q


def J_exact():
    ix = (np.cos(K * BOX[0][0]) - np.cos(K * BOX[0][1])) / K
    iy = BOX[1][1] - BOX[1][0]
    iz = (np.cosh(K * BOX[2][1]) - np.cosh(K * BOX[2][0])) / K
    return ix * iy * iz


def run(xs, ys, zs, tag):
    mesh = _mesh(xs, ys, zs)
    case, phi = _solve(mesh)
    q = goal_weights(case, mesh)
    Jh = float(q @ phi)
    err = abs(J_exact() - Jh)
    dual = goal_dual_case(case, q)
    resz = solve_case(dual, tol=1e-11, maxiter=40_000)
    psi = np.asarray(resz.phi)
    w_goal = np.asarray(zz_goal_indicators(case, jnp.asarray(phi),
                                           jnp.asarray(psi)))
    bound = float(zz_goal_bound(case, jnp.asarray(phi),
                                jnp.asarray(psi)))
    eta_u = zz_error_indicators(case, jnp.asarray(phi))
    print(f"{tag:14s} |J err|={err:.4e}  DWR bound={bound:.4e}  "
          f"eff={bound/err:7.2f}  n_cells_z={len(zs)-1}")
    return case, mesh, phi, w_goal, eta_u, err


n = 12
xs = np.linspace(0, L, n + 1)
print(f"J_exact = {J_exact():.6f}")
case0, mesh0, phi0, w_goal0, eta0, err_u = run(xs, xs, xs, "uniform")

# energy-driven z-adaptation (keep the box face z=0.25)
_, _, wzE = lattice_axis_weights(case0, mesh0, (xs, xs, xs), eta0)
zsE = adapt_axis(xs, wzE, n, keep=(0.25,))
*_, errE = run(xs, xs, zsE, "energy-adapt")

# goal-driven z-adaptation
_, _, wzG = lattice_axis_weights(case0, mesh0, (xs, xs, xs), w_goal0,
                                 power=1)
zsG = adapt_axis(xs, wzG, n, keep=(0.25,))
*_, errG = run(xs, xs, zsG, "goal-adapt")

print(f"goal err: uniform {err_u:.3e}  energy {errE:.3e} "
      f"({err_u/errE:.2f}x)  goal {errG:.3e} ({err_u/errG:.2f}x)")
print("z knots goal-adapted:", np.round(zsG, 3))

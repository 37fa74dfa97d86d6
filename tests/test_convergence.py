"""Discretization-order certification: P1 solves converge at O(h^2).

The reference validates only the step01 box problem, whose exact solution
V(z) = z/Lz is LINEAR — a P1 discretization reproduces it to roundoff at
ANY mesh size (test_step01_baseline.py gates at 1e-3 without ever varying
h), so it certifies assembly/BC plumbing but says nothing about the
discretization order.  This test does the missing half: solve a problem
with a curved exact solution at three mesh sizes and measure the observed
convergence rate of the nodal L2 error.

Manufactured solution: phi(x, z) = sin(pi x / L) * sinh(pi z / L) is
harmonic (Laplace phi = 0) on the unit box with uniform sigma, driven
purely by inhomogeneous Dirichlet data on ALL boundary nodes — an exact
zero-source conduction solution the P1 elements cannot represent.
Expected nodal-L2 rate for P1 tets on a smooth solution: 2.  Measured
rates on the Kuhn lattice climb through the pre-asymptotic range —
1.72, 1.87 at n=(6,12,24); 1.80, 1.90 at n=(8,16,32) — so the gates are:
every rate superlinear (>= 1.6), the finest rate near-quadratic
(>= 1.8), and the rate sequence monotonically approaching 2 (any
plumbing/BC/assembly bug drops the rate to <= 1 or stalls it).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import (box_mesh,
                                             build_mesh_from_lattice)
from pelvistim_fem_tpu.mesh.grading import graded_axis
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.solve import solve_case


def _exact(nodes, L):
    # sin(kx) sinh(kz) with k = pi / L: separable harmonic, zero source.
    k = np.pi / L
    return np.sin(k * nodes[:, 0]) * np.sinh(k * nodes[:, 2])


def _dirichlet_solve(mesh, L):
    case = build_case(mesh, {1: 1.0}, mode="voltage", dtype=jnp.float64)
    exact = _exact(mesh.nodes, L)
    boundary_nodes = np.unique(mesh.faces)
    free = np.ones(mesh.n_nodes, dtype=bool)
    free[boundary_nodes] = False
    dirichlet = np.zeros(mesh.n_nodes)
    dirichlet[boundary_nodes] = exact[boundary_nodes]
    case = dataclasses.replace(
        case,
        free_mask=jnp.asarray(free),
        dirichlet_vals=jnp.asarray(dirichlet, jnp.float64),
        b_neumann=jnp.zeros(mesh.n_nodes, jnp.float64),
    )

    # Solver error must sit far below discretization error at the finest
    # mesh (rel-L2 ~ 3e-4 at n=24), hence tol 1e-10.
    res = solve_case(case, tol=1e-10, maxiter=20_000)
    assert bool(res.converged)
    phi = np.asarray(res.phi)
    return np.linalg.norm(phi - exact) / np.linalg.norm(exact)


def _solve_manufactured(n_cells):
    L = 1.0
    return _dirichlet_solve(box_mesh(L, L, L, L / n_cells), L)


@pytest.mark.parametrize("seq", [(6, 12, 24)])
def test_p1_box_converges_second_order(seq):
    errs = [_solve_manufactured(n) for n in seq]
    rates = [float(np.log2(errs[i] / errs[i + 1]))
             for i in range(len(errs) - 1)]
    # Sanity: errors strictly decrease and are in the expected band.
    assert errs[0] > errs[1] > errs[2] > 0
    assert errs[2] < 2e-3
    for r in rates:
        assert r >= 1.6, (errs, rates)
    assert rates[-1] >= 1.8, (errs, rates)
    assert rates == sorted(rates), (errs, rates)  # approaching 2 from below


def _refine_axis(xs):
    """Insert a midpoint into every knot interval: exact h-halving that
    preserves the grading structure (the right refinement sequence for
    rate measurement on a graded lattice)."""
    return np.sort(np.concatenate([xs, 0.5 * (xs[:-1] + xs[1:])]))


def _graded_deformed_mesh(level, L):
    """Graded knots (fine band mid-axis, geometric coarsening outside —
    the electrode-refinement machinery) + a smooth nodal deformation
    (the ankle z_top mechanism, run_layered_sweep.py:329-340), refined
    `level` times by midpoint insertion."""
    xs = graded_axis(0, L, [(0.35 * L, 0.6 * L)], L / 10, L / 5)
    ys = graded_axis(0, L, [(0.0, 0.3 * L)], L / 10, L / 5)
    zs = graded_axis(0, L, [(0.7 * L, L)], L / 10, L / 5)
    for _ in range(level):
        xs, ys, zs = map(_refine_axis, (xs, ys, zs))

    def body_fn(cx, cy, cz):
        return np.ones(cx.shape, np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        return np.full(fx.shape, 3, np.int32)

    def deform_fn(nodes):
        out = nodes.copy()
        # Smooth shear+bulge, zero on the z extremes so the domain stays
        # a deformed graph surface; magnitude well under the coarsest h.
        out[:, 2] = nodes[:, 2] + 0.04 * L * np.sin(
            np.pi * nodes[:, 0] / L) * np.sin(np.pi * nodes[:, 2] / L)
        return out

    return build_mesh_from_lattice(xs, ys, zs, body_fn, bcid_fn, deform_fn)


def test_graded_deformed_lattice_converges_second_order():
    """The generated-mesh machinery (graded axes, midpoint-refinable
    knots, smooth nodal deformation + re-orientation) must preserve the
    P1 order: the exact solution is harmonic in PHYSICAL coordinates, so
    the deformed lattice is just an unstructured tet mesh to the solver.
    """
    L = 1.0
    errs = [_dirichlet_solve(_graded_deformed_mesh(lvl, L), L)
            for lvl in (0, 1, 2)]
    rates = [float(np.log2(errs[i] / errs[i + 1]))
             for i in range(len(errs) - 1)]
    assert errs[0] > errs[1] > errs[2] > 0
    for r in rates:
        assert r >= 1.6, (errs, rates)
    assert rates[-1] >= 1.8, (errs, rates)

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

from pelvistim_fem_tpu.mesh.generate import box_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.solve import solve_case


def _exact(nodes, L):
    # sin(kx) sinh(kz) with k = pi / L: separable harmonic, zero source.
    k = np.pi / L
    return np.sin(k * nodes[:, 0]) * np.sinh(k * nodes[:, 2])


def _solve_manufactured(n_cells):
    L = 1.0
    mesh = box_mesh(L, L, L, L / n_cells)
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
    err = np.linalg.norm(phi - exact) / np.linalg.norm(exact)
    return err


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

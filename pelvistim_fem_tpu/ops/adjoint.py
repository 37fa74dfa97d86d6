"""Differentiable stencil solves — implicit-function-theorem adjoints.

The reference probes parameter sensitivity by re-solving: step04 sweeps
sigma_contact over 15 subprocess ElmerSolver runs
(run_pressure_sweep.py:709-738) because UMFPACK is a black box behind a
.sif file.  TPU-natively the solve is a jax function, so the derivative
of ANY scalar metric with respect to ANY conductivity comes from ONE
adjoint solve instead of N finite-difference re-solves:

    K(sigma) phi = b,  with  K = sum_b sigma_b C_b  (combine_coeffs)
    dJ/dsigma_b = -lambda^T C_b phi + explicit terms,  where
    K lambda = dJ/dphi  (K symmetric -> adjoint = one more MG-CG solve
    with the SAME hierarchy/preconditioner).

`lax.custom_linear_solve` wires both directions through the MG-PCG
below; gradients flow to every array the masked operator and effective
RHS close over — sigma_table via combine_coeffs, Dirichlet electrode
voltages via the K*phi_d lift, Neumann loads via b_neumann.  The inner
iteration is never differentiated (that is the point: unrolling 20-100
CG iterations through AD would cost 20-100x memory and drift in f32).

Accuracy: the gradient inherits the FORWARD and ADJOINT solve
tolerances — run in f64 with tol<=1e-10 for gradient checks.  The
preconditioner only shapes convergence, not the solution, so it uses
stop_gradient(sigma) and stays entirely out of the AD graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pelvistim_fem_tpu.ops.multigrid import MGHierarchy, make_v_cycle
from pelvistim_fem_tpu.ops.stencil import (StencilCase, combine_coeffs,
                                           stencil_spmv)


def _mg_pcg(op, M, b, x0, free, *, tol, maxiter):
    """Plain MG-preconditioned CG returning x only (no diagnostics) —
    the `solve` callable for custom_linear_solve.  Mirrors
    multigrid.solve_stencil_mg's loop (multigrid.py:494) including the
    free-node masking of the preconditioner."""
    dot = lambda a, b_: jnp.sum(a * b_)
    nrm = lambda a: jnp.sqrt(jnp.sum(a * a))
    tol_abs = tol * nrm(b)

    def precond(r):
        return jnp.where(free, M(jnp.where(free, r, 0.0)), r)

    r0 = b - op(x0)
    z0 = precond(r0)
    state0 = (x0, r0, z0, dot(r0, z0), z0, jnp.int32(0),
              nrm(r0) <= tol_abs)

    def cond(state):
        *_, k, done = state
        return jnp.logical_not(done) & (k < maxiter)

    def body(state):
        x, r, z, rz, p, k, _ = state
        ap = op(p)
        alpha = rz / dot(p, ap)
        x_n = x + alpha * p
        r_n = r - alpha * ap
        z_n = precond(r_n)
        rz_n = dot(r_n, z_n)
        p_n = z_n + (rz_n / rz) * p
        return (x_n, r_n, z_n, rz_n, p_n, k + 1, nrm(r_n) <= tol_abs)

    x, *_ = lax.while_loop(cond, body, state0)
    return x


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu",
                                   "coarse_iters"))
def solve_stencil_mg_diff(scase: StencilCase, hier: MGHierarchy,
                          sigma_table=None, *, tol=1e-10,
                          maxiter=2_000, nu=2, coarse_iters=24):
    """phi(sigma) in mesh node ordering, DIFFERENTIABLE w.r.t.
    sigma_table (and scase.dirichlet / scase.b_neumann).

    Drop-in for solve_stencil_mg when the caller needs jax.grad /
    jax.jvp through the solution — e.g. conductivity calibration from
    measured impedances, or electrode-design sensitivity maps.  Returns
    ONLY phi (wrap metrics around it; diagnostics live on the
    non-differentiable solvers).

    The masked operator where(free, K x|_{x_d=0}, x) is the symmetric
    block-diag(K_ff, I) system, so symmetric=True lets the transpose
    (adjoint) solve reuse the forward MG-PCG unchanged.
    """
    sig = scase.sigma_table if sigma_table is None else sigma_table
    free = scase.free

    C = combine_coeffs(scase.coeff, sig)          # linear in sigma

    def matvec(x):
        raw = stencil_spmv(jnp.where(free, x, 0.0), C)
        return jnp.where(free, raw, x)

    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    b_eff = jnp.where(free, scase.b_neumann - stencil_spmv(phi_d, C),
                      scase.dirichlet)

    # Preconditioner: convergence-only, so it lives OUTSIDE the AD
    # graph (custom_linear_solve never differentiates `solve`).
    M = make_v_cycle(hier, lax.stop_gradient(sig), nu=nu,
                     coarse_iters=coarse_iters)

    def solve_fn(mv, b):
        # fixed rows are identity: seeding x0 with b there zeroes their
        # residual for the forward (b=dirichlet) AND adjoint
        # (b=cotangent) solves alike
        return _mg_pcg(mv, M, b, jnp.where(free, 0.0, b), free,
                       tol=tol, maxiter=maxiter)

    x = lax.custom_linear_solve(matvec, b_eff, solve_fn, symmetric=True)
    return x.reshape(-1)[scase.grid_index]


@partial(jax.jit, static_argnames=("n_bodies", "tol", "maxiter", "nu",
                                   "coarse_iters"))
def solve_lattice_mg_diff(dev: dict, hier: MGHierarchy, sigma_table, *,
                          n_bodies: int, precond_sigma=None, tol=1e-10,
                          maxiter=2_000, nu=2, coarse_iters=24):
    """phi(sigma) through DEVICE ASSEMBLY, differentiable w.r.t. a
    scalar (T,) or TENSOR (T, 3, 3) table (ops/aniso.py).

    Unlike solve_stencil_mg_diff (which differentiates through the
    body-factored combine of a prebuilt stack), gradients here flow
    through the accumulation integrand itself — n_a^T Sigma n_b in
    lattice_coeff — so ANISOTROPIC parameters (fiber longitudinal/
    transverse conductivities, or full tensor components) are
    first-class optimization variables: e.g. fitting muscle fiber
    anisotropy from surface potentials, which no isotropic model can
    represent.  dev = spec_device_arrays(spec, jnp.float64); hier from
    assemble_lattice — its body-factored levels are combined with
    precond_sigma (a SCALAR (T,) table; default dev['sigma_table'],
    i.e. the spec's isotropic values).  The preconditioner only shapes
    convergence, so an isotropic-equivalent combine is fine for tensor
    solves; everything preconditioner-side is stop_gradient'ed.
    """
    from pelvistim_fem_tpu.ops.lattice_assembly import lattice_coeff
    C = lattice_coeff(dev["h_axes"], dev["coords_dev"], dev["body6"],
                      n_bodies, sigma_table=sigma_table)[0]   # combined
    free = dev["free"]

    def matvec(x):
        raw = stencil_spmv(jnp.where(free, x, 0.0), C)
        return jnp.where(free, raw, x)

    phi_d = jnp.where(free, 0.0, dev["dirichlet"])
    b_eff = jnp.where(free, dev["b_neumann"] - stencil_spmv(phi_d, C),
                      dev["dirichlet"])

    hier_sg = jax.tree_util.tree_map(lax.stop_gradient, hier)
    psig = dev["sigma_table"] if precond_sigma is None else precond_sigma
    M = make_v_cycle(hier_sg, lax.stop_gradient(psig), nu=nu,
                     coarse_iters=coarse_iters)

    def solve_fn(mv, b):
        return _mg_pcg(mv, M, b, jnp.where(free, 0.0, b), free,
                       tol=tol, maxiter=maxiter)

    x = lax.custom_linear_solve(matvec, b_eff, solve_fn, symmetric=True)
    return x.reshape(-1)[dev["grid_index"]]


def sigma_sensitivity(metric_fn, scase: StencilCase, hier: MGHierarchy,
                      sigma_table, **solve_kw):
    """(J, dJ/dsigma_table) for a scalar metric of the solution.

    metric_fn(phi, sigma_table) -> scalar.  One forward + one adjoint
    MG-CG solve regardless of len(sigma_table) — the reference needs a
    full re-solve per parameter per FD probe."""
    def J(sig):
        phi = solve_stencil_mg_diff(scase, hier, sig, **solve_kw)
        return metric_fn(phi, sig)
    return jax.value_and_grad(J)(sigma_table)

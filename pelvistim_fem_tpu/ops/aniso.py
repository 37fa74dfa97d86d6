"""Anisotropic (tensor) conductivity tables.

Skeletal muscle conducts ~4-5x better along fibers than across them
(longitudinal ~0.4 S/m vs transverse ~0.09 S/m — Gabriel et al. 1996),
a first-order effect for neuromuscular stimulation that the reference
pipeline cannot express (Elmer StatCurrentSolve is configured with one
scalar sigma per body, step01_box/case.sif:33-46; step03
params.yaml:29-48).  The element path here takes per-body 3x3 SYMMETRIC
tensors natively: `solve_case` / `solve_case_refined` / the vmapped and
dp-sharded material sweeps and `fields.cell_J` all accept a (T, 3, 3)
sigma_table (see ops/assembly.spmv), at essentially isotropic cost (one
extra (M,3,3)x(M,3) einsum per matvec).

This module only BUILDS such tables.  The structured-lattice stencil
path stays scalar-per-body (its per-body coefficient factorization is
scalar); anisotropic models route through the element path
(`runner.solve_auto` with a lattice-less mesh, or `solve_case*`
directly).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def uniaxial_tensor(direction, sigma_long, sigma_trans):
    """3x3 conductivity tensor for a fiber direction: sigma_long along
    `direction`, sigma_trans in the transverse plane.

    Sigma = sigma_trans I + (sigma_long - sigma_trans) d d^T — symmetric
    positive definite for positive conductivities."""
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    return (sigma_trans * np.eye(3)
            + (sigma_long - sigma_trans) * np.outer(d, d))


def tensor_table(sigma_table, fibers: dict | None = None):
    """(T, 3, 3) tensor table from a scalar (T,) table.

    fibers: {body_id: (direction, sigma_long, sigma_trans)} — bodies
    listed get the uniaxial tensor; every other body stays isotropic at
    its scalar value.  Returns numpy f64 (cast/ship at the call site
    like any sigma table).

    Example (muscle fibers along y on the layered model):
        tab = tensor_table(case.sigma_table,
                           {core.BODY_MUSCLE: ((0, 1, 0), 0.4, 0.09)})
        res = solve_case_refined(case, jnp.asarray(tab))
    """
    base = np.asarray(sigma_table, np.float64)
    T = base.shape[0]
    out = np.zeros((T, 3, 3))
    out[:, 0, 0] = out[:, 1, 1] = out[:, 2, 2] = base
    for body, (direction, s_long, s_trans) in (fibers or {}).items():
        out[body] = uniaxial_tensor(direction, s_long, s_trans)
    return out


def check_spd(table, tol=1e-12):
    """Raise if any body tensor is non-symmetric or non-PSD (K would
    lose the SPD property CG and the refined solvers depend on).
    Body 0 (carved/outside) may be all-zero."""
    t = np.asarray(table, np.float64)
    if t.ndim != 3 or t.shape[-2:] != (3, 3):
        raise ValueError(f"expected (T, 3, 3) tensor table, got {t.shape}")
    asym = np.abs(t - np.swapaxes(t, -1, -2)).max()
    if asym > tol:
        raise ValueError(f"tensor table not symmetric (max asym {asym:g})")
    for b, m in enumerate(t):
        w = np.linalg.eigvalsh(m)
        if b == 0 and np.allclose(m, 0):
            continue
        if w.min() < -tol:
            raise ValueError(
                f"body {b} tensor not PSD (eigenvalues {w})")
    return jnp.asarray(t)

"""P1 tetrahedral FEM assembly, matrix-free and TPU-first.

The reference delegates assembly of  div(sigma grad phi) = 0  to
ElmerSolver's Fortran StatCurrentSolve module (configured via .sif —
step01_box/case.sif:33-46) and factorizes with UMFPACK.  Here assembly is
split into a one-time geometric factor computation (host, float64) and a
matrix-free SpMV used inside CG:

  For tet e with vertices x0..x3, the P1 shape-function gradients
  G_e = [grad lambda_0 .. grad lambda_3]  (4, 3) are constant, and the
  element stiffness is  K_e = sigma_e * V_e * G_e @ G_e.T  (4, 4).

  K @ x is evaluated WITHOUT materializing K:
      q_e = G_e.T @ x[tets_e]            (M, 3)   gather + small einsum
      y_e = sigma_e V_e * G_e @ q_e      (M, 4)
      y   = segment_sum(y_e, tets)       scatter (pre-sorted, TPU-friendly)

  This keeps sigma a *leaf input*, so a conductivity sweep (step04's
  15-point sigma_contact sweep, run_pressure_sweep.py:664-740) is a pure
  vmap over the material table with zero re-assembly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def element_gradients(nodes: np.ndarray, tets: np.ndarray):
    """Per-element shape-function gradients and volumes (host, float64).

    Returns (grads (M, 4, 3), vol (M,)).  grads[m, i] = grad lambda_i on
    tet m; vol must be positive (mesh generators guarantee orientation).
    Closed-form adjugate (cross products) — ~5x faster than batched
    np.linalg.inv on million-tet meshes.  Dispatches to the native C++
    kernel when built (csrc/meshkernels.cpp tet_geometry — another ~15x
    on megatet meshes; the numpy path below is the reference fallback).
    """
    from pelvistim_fem_tpu import native
    out = native.tet_geometry(nodes, tets)
    if out is not None:
        return out
    x = nodes[tets].astype(np.float64)               # (M, 4, 3)
    e1 = x[:, 1] - x[:, 0]
    e2 = x[:, 2] - x[:, 0]
    e3 = x[:, 3] - x[:, 0]
    c23 = np.cross(e2, e3)
    det = np.einsum("md,md->m", e1, c23)             # det [e1; e2; e3]
    vol = det / 6.0
    inv_det = 1.0 / det
    # rows of d^{-T} = columns of adj(d)/det, d rows = (e1, e2, e3):
    # grad lambda_1 = (e2 x e3)/det, lambda_2 = (e3 x e1)/det,
    # lambda_3 = (e1 x e2)/det.
    g1 = c23 * inv_det[:, None]
    g2 = np.cross(e3, e1) * inv_det[:, None]
    g3 = np.cross(e1, e2) * inv_det[:, None]
    g0 = -(g1 + g2 + g3)
    return np.stack([g0, g1, g2, g3], axis=1), vol


def scatter_plan(tets: np.ndarray, n_nodes: int):
    """Precompute the sorted segment-sum plan for element→node scatter.

    TPUs dislike random scatter; sorting element-node contributions once on
    the host turns every scatter into a sorted `segment_sum`
    (indices_are_sorted=True), which XLA lowers efficiently.
    """
    flat = tets.reshape(-1).astype(np.int32)
    from pelvistim_fem_tpu import native
    perm = native.counting_sort_perm(flat, n_nodes)
    if perm is None:
        perm = np.argsort(flat, kind="stable").astype(np.int32)
    segids = flat[perm]
    return perm, segids


def scatter_to_nodes(values_per_elem_node, perm, segids, n_nodes):
    """segment-sum (M, 4) element-node values into (N,) nodal values."""
    flat = values_per_elem_node.reshape(-1)[perm]
    return jax.ops.segment_sum(flat, segids, num_segments=n_nodes,
                               indices_are_sorted=True)


def spmv(phi, tets, grads, sigvol, perm, segids, n_nodes):
    """Matrix-free y = K @ phi.

    sigvol: sigma_e * V_e — (M,) for scalar (isotropic) conductivity, or
    (M, 3, 3) for TENSOR conductivity (K_e = V_e G Sigma_e G^T; pass a
    SYMMETRIC Sigma or K loses the SPD property CG depends on).  The
    tensor form costs one extra (M, 3, 3)x(M, 3) einsum per apply —
    anisotropic tissue (muscle fibers: ~0.4 S/m along, ~0.09 across) at
    essentially isotropic speed.  The reference pipeline is
    isotropic-only (Elmer StatCurrentSolve scalar sigma,
    step01_box/case.sif:33-46).

    precision=HIGHEST: on TPU the default f32 contraction precision is
    bf16-based on the MXU; with contraction dims of only 3/4 these einsums
    are bandwidth-bound anyway, and full f32 keeps CG convergence intact
    (especially under vmap, where XLA batches them into MXU matmuls).
    """
    hi = jax.lax.Precision.HIGHEST
    xe = phi[tets]                                    # (M, 4)
    q = jnp.einsum("mid,mi->md", grads, xe, precision=hi)   # (M, 3)
    if sigvol.ndim == 3:
        s = jnp.einsum("mde,me->md", sigvol, q, precision=hi)
    else:
        s = sigvol[:, None] * q
    ye = jnp.einsum("mid,md->mi", grads, s, precision=hi)   # (M, 4)
    return scatter_to_nodes(ye, perm, segids, n_nodes)


def stiffness_diagonal(tets, grads, sigvol, perm, segids, n_nodes):
    """diag(K) for Jacobi preconditioning: V g_i^T Sigma g_i (tensor) /
    sigma V |grad lambda_i|^2 (scalar)."""
    hi = jax.lax.Precision.HIGHEST
    if sigvol.ndim == 3:
        de = jnp.einsum("mid,mde,mie->mi", grads, sigvol, grads,
                        precision=hi)
    else:
        de = sigvol[:, None] * jnp.sum(grads * grads, axis=2)   # (M, 4)
    return scatter_to_nodes(de, perm, segids, n_nodes)


def element_matrices(grads, sigvol):
    """Dense per-element stiffness K_e = V G Sigma G^T (M, 4, 4);
    sigvol (M,) scalar or (M, 3, 3) tensor.

    Not used on the CG hot path (matrix-free is cheaper in HBM traffic) but
    handy for tests against scipy/dense references.
    """
    if sigvol.ndim == 3:
        return jnp.einsum("mid,mde,mje->mij", grads, sigvol, grads)
    return jnp.einsum("mid,mjd->mij", grads, grads) * sigvol[:, None, None]

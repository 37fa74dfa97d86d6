"""Complete electrode model (CEM): contact impedance without a meshed gel.

The reference (and our parity path) models the electrode-skin interface
as a MESHED volumetric contact layer whose conductivity is swept
(step04 run_pressure_sweep.py:55-215).  The standard alternative in
bioimpedance/EIT — Somersalo, Cheney & Isaacson (1992) — models each
electrode as a perfect conductor at an unknown floating potential U_l
behind a thin contact impedance z_l [ohm m^2]:

    phi + z_l sigma dphi/dn = U_l      on electrode l,
    int_{E_l} sigma dphi/dn dS = I_l   (prescribed current),
    sigma dphi/dn = 0                  elsewhere.

With a LUMPED P1 surface mass (each boundary face contributes area/3
to its nodes; w_l is the (N,) weight vector, |E_l| = sum w_l), the
electrode potentials eliminate exactly:

    U_l = (z_l I_l + w_l . phi) / |E_l|,

leaving one SPD system whose operator is the plain stiffness spmv plus
a diagonal and one rank-1 correction per floating electrode:

    [K + sum_l diag(w_l)/z_l - sum_{l != g} w_l w_l^T/(z_l |E_l|)] phi
        = sum_{l != g} (I_l/|E_l|) w_l,

grounded at electrode g (U_g = 0; its Robin diagonal pins the constant
null space, making the operator strictly SPD).  Matrix-free and
material-table-parameterized like every element-path solve here: a
(z_l, I_l, sigma) sweep is a vmapped batch with zero re-assembly.

Physics the meshed-layer model cannot express: the metal SHUNT (a
well-conducting electrode short-circuits tangential current under its
footprint, redistributing current density toward the rim) and the
z -> infinity gap limit (uniform current density).  Both fall out of
the CEM naturally; tests pin the exact 1-D column solution, mutual-
impedance reciprocity, charge conservation, and z-monotonicity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops import assembly
from pelvistim_fem_tpu.ops.solve import preconditioned_cg

__all__ = ["CEMResult", "electrode_surface_weights",
           "cem_weights_from_bcids", "solve_case_cem"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CEMResult:
    phi: jax.Array          # (N,) potential (no Dirichlet rows: all free)
    U: jax.Array            # (E,) electrode potentials (U[ground] = 0)
    I: jax.Array            # (E,) recovered electrode currents
    iterations: jax.Array
    residual: jax.Array
    converged: jax.Array


def electrode_surface_weights(faces, face_area, face_mask, n_nodes):
    """(N,) lumped P1 surface weights of one electrode patch: every
    selected boundary face contributes area/3 to each of its 3 nodes;
    the weights sum to the patch area (host numpy — boundary-sized)."""
    faces = np.asarray(faces)
    a3 = np.where(np.asarray(face_mask), np.asarray(face_area), 0.0) / 3.0
    w = np.zeros(n_nodes)
    for k in range(3):
        np.add.at(w, faces[:, k], a3)
    return w


def cem_weights_from_bcids(case, bcids=(1, 2)):
    """(E, N) surface-weight rows for the electrodes tagged by the given
    face bcids (1 = active, 2 = return by framework convention)."""
    faces = np.asarray(case.faces)
    area = np.asarray(case.face_area)
    bcid = np.asarray(case.face_bcid)
    n = case.free_mask.shape[0]
    return np.stack([
        electrode_surface_weights(faces, area, bcid == b, n)
        for b in bcids])


@partial(jax.jit, static_argnames=("ground", "tol", "maxiter"))
def solve_case_cem(case, weights, z_contact, I_elec, *,
                   sigma_table=None, ground=0, tol=1e-10,
                   maxiter=20_000) -> CEMResult:
    """CEM forward solve on the element path (any imported mesh).

    weights: (E, N) electrode surface weights (cem_weights_from_bcids);
    z_contact: (E,) contact impedances [ohm m^2]; I_elec: (E,)
    prescribed currents [A] — the entry at `ground` is IGNORED (that
    electrode is grounded, U = 0, and absorbs the return current;
    the recovered I[ground] closes the balance to solver tolerance).
    Case Dirichlet/Neumann BCs are NOT used: the CEM replaces them
    (every node is free; non-electrode boundary is natural/insulated).

    Linearity: phi, U, I are all linear in I_elec, so multi-electrode
    stimulation patterns superpose and a (z, I, sigma) design sweep is
    one vmapped batch on this function.
    """
    if sigma_table is None:
        sigma_table = case.sigma_table
    n = case.free_mask.shape[0]
    W = jnp.asarray(weights)
    z = jnp.asarray(z_contact)
    I_in = jnp.asarray(I_elec)
    areas = W.sum(axis=1)                         # (E,) |E_l|
    E = W.shape[0]
    hp = jax.lax.Precision.HIGHEST        # TPU default dot is bf16-based

    flt = jnp.arange(E) != ground                 # floating electrodes
    sigvol = sigma_table[case.tet_body]
    sigvol = (sigvol * case.vol if sigvol.ndim == 1
              else sigvol * case.vol[:, None, None])
    robin_diag = (W / z[:, None]).sum(axis=0)     # (N,)

    def op(x):
        kx = assembly.spmv(x, case.tets, case.grads, sigvol,
                           case.scatter_perm, case.scatter_segids, n)
        wx = jnp.einsum("en,n->e", W, x, precision=hp)       # (E,)
        r1 = jnp.where(flt, wx / (z * areas), 0.0)
        return kx + robin_diag * x - jnp.einsum(
            "e,en->n", r1, W, precision=hp)

    b = jnp.einsum("e,en->n", jnp.where(flt, I_in / areas, 0.0), W,
                   precision=hp)

    diag_k = assembly.stiffness_diagonal(
        case.tets, case.grads, sigvol, case.scatter_perm,
        case.scatter_segids, n)
    minv = 1.0 / (diag_k + robin_diag)            # Jacobi (sans rank-1)
    res = preconditioned_cg(op, b, lambda r: minv * r,
                            jnp.zeros_like(b), tol=tol, maxiter=maxiter)

    wphi = jnp.einsum("en,n->e", W, res.phi, precision=hp)
    U = jnp.where(flt, (z * I_in + wphi) / areas, 0.0)
    # electrode currents from the eliminated stationarity relation;
    # at the grounded electrode this recovers the balancing return
    I_out = (U * areas - wphi) / z
    return CEMResult(phi=res.phi, U=U, I=I_out,
                     iterations=res.iterations, residual=res.residual,
                     converged=res.converged)

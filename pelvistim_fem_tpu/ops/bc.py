"""Boundary-condition application, on device.

Reference behavior being replicated (TPU-first, no .sif text files):

* Voltage mode — Dirichlet: active electrode phi = 1 V, return phi = 0 V
  (step03 run_layered_sweep.py:598, README "voltage" mode).
* Current mode — Neumann on the active electrode with uniform normal
  current density  Jn = I / A_mesh  where A_mesh is the TRUE mesh electrode
  area (sum of boundary-face areas), the lesson encoded in the reference's
  detect_elec_bc_ids + write_sif (run_layered_sweep.py:594-611): using the
  analytic area instead causes >2% current-delivery error on faceted
  footprints.  Return electrode grounded (Dirichlet 0).
* All other surfaces: natural zero-flux (do nothing — weak form).

Dirichlet is enforced by projection, which keeps the operator SPD on the
free subspace and is branch-free for jit:

  op(x)  = where(free, K @ where(free, x, 0), x)
  b_eff  = where(free, b - K @ phi_D, g)          phi_D = g on fixed nodes

CG started at x0 = phi_D then has zero residual on fixed nodes and solves
the eliminated system exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pelvistim_fem_tpu.mesh.core import BC_ACTIVE, BC_RETURN


def electrode_node_masks(faces, face_bcid, n_nodes):
    """Boolean (N,) masks of nodes lying on the active / return BC faces."""
    active = np.zeros(n_nodes, dtype=bool)
    ret = np.zeros(n_nodes, dtype=bool)
    active[faces[face_bcid == BC_ACTIVE].reshape(-1)] = True
    ret[faces[face_bcid == BC_RETURN].reshape(-1)] = True
    return active, ret


def electrode_mesh_areas(face_area, face_bcid):
    """True mesh areas of both electrode BC patches (the reference's
    elec_area_mesh / return_area_mesh, run_layered_sweep.py:428-449)."""
    a_act = float(face_area[face_bcid == BC_ACTIVE].sum())
    a_ret = float(face_area[face_bcid == BC_RETURN].sum())
    return a_act, a_ret


def neumann_current_load(faces, face_area, face_bcid, jn_active, n_nodes):
    """Load vector for uniform injected current density on the active patch.

    b_i = Jn * A_f / 3 for each node of each active face (P1 consistent
    load of a constant flux).  Sign: injected current (J into the domain)
    appears as +Jn in the weak form  int sigma dphi/dn v dGamma.
    """
    b = np.zeros(n_nodes, dtype=np.float64)
    sel = face_bcid == BC_ACTIVE
    contrib = (jn_active * face_area[sel] / 3.0)
    np.add.at(b, faces[sel].reshape(-1), np.repeat(contrib, 3))
    return b


def make_projected_operator(spmv_fn, free_mask):
    """SPD operator on the free subspace; identity on fixed dofs."""

    def op(x):
        xm = jnp.where(free_mask, x, 0.0)
        y = spmv_fn(xm)
        return jnp.where(free_mask, y, x)

    return op


def effective_rhs(spmv_fn, free_mask, dirichlet_vals, b_neumann):
    """b_eff = where(free, b - K phi_D, g)."""
    phi_d = jnp.where(free_mask, 0.0, dirichlet_vals)
    return jnp.where(free_mask, b_neumann - spmv_fn(phi_d), dirichlet_vals)

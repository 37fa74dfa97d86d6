"""Post-solve field operators: E = -grad phi, J = -sigma grad phi.

Replaces the reference's two-stage pipeline of ElmerSolver's
`Calculate Volume Current = True` (nodal J output, case.sif:39) plus
VTK/pyvista derivative filters (`compute_derivative`,
point_data_to_cell_data — step03 run_layered_sweep.py:765-790).  With P1
elements the gradient is constant per tet and comes directly from the
same shape-function gradients used in assembly — no finite-difference
filter needed, and everything stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops import assembly


def cell_gradient(case, phi):
    """(M, 3) constant gradient of phi per tet.

    precision=HIGHEST: under vmap (batched metric extraction) this
    einsum lowers to an MXU matmul whose f32 default is bf16-based —
    ~3-digit gradients would wreck metric parity."""
    xe = phi[case.tets]
    return jnp.einsum("mid,mi->md", case.grads, xe,
                      precision=jax.lax.Precision.HIGHEST)


def cell_E(case, phi):
    """E = -grad phi per tet (M, 3)."""
    return -cell_gradient(case, phi)


def cell_J(case, phi, sigma_table=None):
    """J = -sigma grad phi per tet (M, 3).  sigma_table (T,) scalar or
    (T, 3, 3) tensor per body (anisotropic tissue, ops/aniso.py)."""
    if sigma_table is None:
        sigma_table = case.sigma_table
    sigma_e = sigma_table[case.tet_body]
    E = cell_E(case, phi)
    if sigma_e.ndim == 3:
        return jnp.einsum("mde,me->md", sigma_e, E,
                          precision=jax.lax.Precision.HIGHEST)
    return sigma_e[:, None] * E


def cell_power_density(case, phi, sigma_table=None):
    """Dissipated power density p = J . E = E^T sigma E per tet
    [W/m^3] — the tissue-heating field (the safety quantity behind
    step04's charge-density limit, run_pressure_sweep.py:617-625, seen
    as actual Joule heating).  Tensor-aware like cell_J.

    Exact discrete invariant (tested): sum_m p_m vol_m = phi^T K phi =
    the injected current times the LOAD-weighted active-electrode
    potential (current mode, return grounded) — energy balance holds to
    solver tolerance, not just discretization order."""
    if sigma_table is None:
        sigma_table = case.sigma_table
    # one gradient pass (cell_J would recompute cell_E; callers vmap
    # this eagerly per sweep lane, where XLA cannot CSE the duplicate)
    E = cell_E(case, phi)
    sigma_e = sigma_table[case.tet_body]
    if sigma_e.ndim == 3:
        return jnp.einsum("mde,me,md->m", sigma_e, E, E,
                          precision=jax.lax.Precision.HIGHEST)
    return sigma_e * jnp.sum(E * E, axis=1)


def cell_centers(case):
    """(M, 3) tet centroids."""
    return case.nodes[case.tets].mean(axis=1)


def nodal_average(case, cell_values):
    """Volume-weighted average of per-cell values to nodes.

    The on-device equivalent of Elmer's nodal 'volume current' output /
    pyvista's cell->point conversion: each node receives the volume-weighted
    mean of its incident tets' values.  cell_values: (M,) or (M, K).
    """
    n = case.nodes.shape[0]
    v = cell_values
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    w = case.vol
    num = []
    for k in range(v.shape[1]):
        wk = (w * v[:, k])[:, None] * jnp.ones((1, 4), v.dtype)
        num.append(assembly.scatter_to_nodes(
            wk, case.scatter_perm, case.scatter_segids, n))
    den = assembly.scatter_to_nodes(
        w[:, None] * jnp.ones((1, 4), w.dtype),
        case.scatter_perm, case.scatter_segids, n)
    out = jnp.stack(num, axis=1) / jnp.maximum(den, 1e-300)[:, None]
    return out[:, 0] if squeeze else out


def point_to_cell(case, nodal_values):
    """Mean of the 4 vertex values per tet — the pyvista
    point_data_to_cell_data analogue (used by the reference's flux and ROI
    paths, run_layered_sweep.py:727, 771)."""
    return nodal_values[case.tets].mean(axis=1)


def boundary_face_flux(case, phi, sigma_table=None, *, scheme="nodal",
                       nodal_J=None):
    """Signed normal current through each boundary face.

    scheme="nodal" (default) reproduces the reference pipeline: Elmer's
    nodal 'volume current' averaged onto boundary cells
    (compute_injected_current, run_layered_sweep.py:704-761) — J at a face
    is the mean of its 3 vertices' volume-weighted nodal J.
    scheme="cell" uses the parent tet's constant J directly.
    Returns (B,) signed currents [A]; positive = current leaving the domain.
    """
    if scheme == "nodal":
        Jn = (nodal_J if nodal_J is not None
              else nodal_average(case, cell_J(case, phi, sigma_table)))
        Jf = Jn[case.faces].mean(axis=1)
    else:
        J = cell_J(case, phi, sigma_table)
        Jf = J[case.face_parent]
    return jnp.sum(Jf * case.face_normal, axis=1) * case.face_area


def consistent_electrode_currents(case, phi, sigma_table=None):
    """EXACT discrete electrode currents from the weak-form reaction.

    At a Dirichlet node i, rho_i = (K phi - b)_i equals the boundary term
    int sigma dphi/dn v_i, so the outward current through the return patch
    is -sum(rho) over its nodes — exact to solver tolerance (KCL holds by
    construction).  The Neumann active-patch current is exactly
    sum(b_neumann).  The reference has no equivalent (its flux_err is pure
    post-hoc surface integration error); this is a framework improvement
    used alongside the parity metric.
    Returns (I_active_in, I_return_out), both positive for forward flow.
    """
    from pelvistim_fem_tpu.ops import assembly as _asm
    if sigma_table is None:
        sigma_table = case.sigma_table
    sig_e = sigma_table[case.tet_body]
    if sig_e.ndim == 3:          # (T, 3, 3) tensor table (ops/aniso.py)
        sigvol = sig_e * case.vol[:, None, None]
    else:
        sigvol = sig_e * case.vol
    n = case.nodes.shape[0]
    kphi = _asm.spmv(phi, case.tets, case.grads, sigvol,
                     case.scatter_perm, case.scatter_segids, n)
    rho = kphi - case.b_neumann
    fixed = ~case.free_mask
    if case.meta.mode == "current":
        i_active = jnp.sum(case.b_neumann)
        i_return = -jnp.sum(jnp.where(fixed, rho, 0.0))
    else:
        # voltage mode: both electrodes Dirichlet; split by dirichlet value
        act = fixed & (case.dirichlet_vals > 0.5 * case.dirichlet_vals.max())
        ret = fixed & ~act
        i_active = jnp.sum(jnp.where(act, rho, 0.0))
        i_return = -jnp.sum(jnp.where(ret, rho, 0.0))
    return i_active, i_return

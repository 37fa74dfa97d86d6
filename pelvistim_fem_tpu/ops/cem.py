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
           "cem_weights_from_bcids", "solve_case_cem",
           "build_cem_amg", "cem_transfer_matrix",
           "stencil_cem_setup", "solve_stencil_cem_refined",
           "stencil_cem_transfer_matrix", "cpe_contact_impedance",
           "solve_stencil_cem_eqs_refined",
           "stencil_cem_eqs_transfer_matrix",
           "solve_case_cem_eqs_refined", "cem_eqs_transfer_matrix"]


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


def build_cem_amg(case, weights, *, ground=0, sigma_table=None,
                  mesh=None, **kw):
    """AMG hierarchy for the CEM preconditioner: the case's BC masks
    are replaced by 'everything free except the grounded patch'
    (approximating the grounded Robin contact as Dirichlet — exact as
    z_g -> 0, and it pins the constant mode).  Pass the result as
    solve_case_cem's `amg=` for hard-contrast imported meshes where
    Jacobi CG crawls."""
    import dataclasses as dc

    from pelvistim_fem_tpu.ops.amg import build_amg
    n = case.free_mask.shape[0]
    gw = np.asarray(weights)[ground]
    free = jnp.asarray(gw == 0)
    case2 = dc.replace(case, free_mask=free,
                       dirichlet_vals=jnp.zeros(n, case.dirichlet_vals.dtype),
                       b_neumann=jnp.zeros(n, case.b_neumann.dtype))
    return build_amg(case2, sigma_table, mesh=mesh, **kw)


@partial(jax.jit, static_argnames=("ground", "tol", "maxiter"))
def solve_case_cem(case, weights, z_contact, I_elec, *,
                   sigma_table=None, ground=0, amg=None, x0=None,
                   tol=1e-10, maxiter=20_000) -> CEMResult:
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
    if amg is None:
        M = lambda r: minv * r
    else:
        # AMG V-cycle on the ground-pinned subspace (build_cem_amg),
        # Jacobi on the grounded-patch rows — SPD, and the level-0 op
        # is the TRUE CEM operator restricted to that subspace
        from pelvistim_fem_tpu.ops.amg import make_amg_preconditioner
        fidx = amg.free_idx
        mask = jnp.zeros(n, bool).at[fidx].set(True)

        def fine_op(xf):
            xfull = jnp.zeros(n, b.dtype).at[fidx].set(xf)
            return op(xfull)[fidx]

        Mf = make_amg_preconditioner(amg, fine_op)

        def M(r):
            z = jnp.zeros_like(r).at[fidx].set(Mf(r[fidx]))
            return jnp.where(mask, z, minv * r)

    res = preconditioned_cg(op, b,
                            M, jnp.zeros_like(b) if x0 is None
                            else jnp.asarray(x0, b.dtype),
                            tol=tol, maxiter=maxiter)

    wphi = jnp.einsum("en,n->e", W, res.phi, precision=hp)
    U = jnp.where(flt, (z * I_in + wphi) / areas, 0.0)
    # electrode currents from the eliminated stationarity relation;
    # at the grounded electrode this recovers the balancing return
    I_out = (U * areas - wphi) / z
    return CEMResult(phi=res.phi, U=U, I=I_out,
                     iterations=res.iterations, residual=res.residual,
                     converged=res.converged)


# ── stencil fast path: CEM at generated-lattice (megatet) scale ──────────────

def stencil_cem_setup(host_data, weights, *, ground=0,
                      dtype=None):
    """Host prep for solve_stencil_cem_refined.

    host_data: ops.stencil.stencil_host_data output; weights: (E, N)
    electrode surface weights in mesh-node ordering
    (cem_weights_from_bcids).  Returns (weights_grid (E, X, Y, Z) f64,
    present (X, Y, Z) bool, hier) where the MG hierarchy's free mask
    treats the GROUNDED patch as Dirichlet — that approximates the
    grounded Robin contact (exact as z_g -> 0) and pins the constant
    mode, so the V-cycle is a nonsingular SPD preconditioner for the
    exact CEM operator.
    """
    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops.multigrid import build_hierarchy
    X, Y, Z = host_data["free"].shape
    gi = np.asarray(host_data["grid_index"])
    G = X * Y * Z
    E = np.asarray(weights).shape[0]
    Wg = np.zeros((E, G))
    Wg[:, gi] = np.asarray(weights)
    present = np.zeros(G, bool)
    present[gi] = True
    free_pre = present & (Wg[ground] == 0)
    hd2 = dict(host_data, free=free_pre.reshape(X, Y, Z),
               dirichlet=np.zeros((X, Y, Z)),
               b_neumann=np.zeros((X, Y, Z)))
    hier = build_hierarchy(hd2, dtype=dtype or jnp.float64)
    return (jnp.asarray(Wg.reshape(E, X, Y, Z)),
            jnp.asarray(present.reshape(X, Y, Z)),
            hier)


def _stencil_cem_operator(scase, sigma_table, Wg, present, z, areas,
                          flt):
    """Masked CEM operator on grid fields: exact stiffness spmv +
    Robin diagonal + rank-1 per floating electrode; identity on grid
    slots not present in the mesh."""
    import jax
    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops.stencil import combine_coeffs, stencil_spmv
    C = combine_coeffs(scase.coeff, sigma_table)
    hp = jax.lax.Precision.HIGHEST
    robin = (Wg / z[:, None, None, None]).sum(0)

    def op(x):
        xz = jnp.where(present, x, 0.0)
        kx = stencil_spmv(xz, C)
        wx = jnp.einsum("exyz,xyz->e", Wg, xz, precision=hp)
        r1 = jnp.where(flt, wx / (z * areas), 0.0)
        out = kx + robin * xz - jnp.einsum("e,exyz->xyz", r1, Wg,
                                           precision=hp)
        return jnp.where(present, out, x)

    return op


@partial(jax.jit, static_argnames=("ground", "tol", "inner_tol",
                                   "maxiter", "nu", "coarse_iters",
                                   "max_refinements"))
def solve_stencil_cem_refined(scase, hier, Wg, present, z_contact,
                              I_elec, *, sigma_table=None, ground=0,
                              tol=1e-8, inner_tol=3e-4, maxiter=2_000,
                              nu=2, coarse_iters=24,
                              max_refinements=8) -> CEMResult:
    """CEM on the stencil fast path: f32 MG-preconditioned inner CG +
    f64 residual correction against the f64 master CEM operator — the
    same certified-TRUE-residual contract as solve_stencil_mg_refined,
    at generated-lattice (megatet) scale.  Inputs from
    stencil_cem_setup; a (z, I, sigma) sweep vmaps over this function
    with zero re-assembly.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pelvistim_fem_tpu.ops.multigrid import make_v_cycle
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("solve_stencil_cem_refined")
    if sigma_table is None:
        sigma_table = scase.sigma_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    sc64, sc32 = to(scase, jnp.float64), to(scase, jnp.float32)
    hier32 = to(hier, jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    z = jnp.asarray(z_contact, jnp.float64)
    I_in = jnp.asarray(I_elec, jnp.float64)
    E = Wg.shape[0]
    flt = jnp.arange(E) != ground
    Wg64 = Wg.astype(jnp.float64)
    areas = Wg64.sum(axis=(1, 2, 3))

    op64 = _stencil_cem_operator(sc64, sigma_table.astype(jnp.float64),
                                 Wg64, present, z, areas, flt)
    op32 = _stencil_cem_operator(sc32, sigma_table.astype(jnp.float32),
                                 Wg.astype(jnp.float32), present,
                                 z.astype(jnp.float32),
                                 areas.astype(jnp.float32), flt)
    b64 = jnp.einsum("e,exyz->xyz", jnp.where(flt, I_in / areas, 0.0),
                     Wg64, precision=hp)
    M32 = make_v_cycle(hier32, sigma_table.astype(jnp.float32), nu=nu,
                       coarse_iters=coarse_iters)
    fp = hier32.levels[0].free   # present minus the grounded patch

    def Mp(r):
        return jnp.where(fp, M32(jnp.where(fp, r, 0.0)), r)

    from pelvistim_fem_tpu.ops.solve import preconditioned_cg
    bnorm = jnp.sqrt(jnp.sum(b64 * b64))
    x = jnp.zeros_like(b64)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        need = 0.25 * tol / jnp.minimum(rel_old, 1.0)
        tol_k = jnp.clip(need, inner_tol, 0.05)
        res = preconditioned_cg(op32, r64.astype(jnp.float32), Mp,
                                jnp.zeros_like(r64, jnp.float32),
                                tol=tol_k, maxiter=maxiter)
        x_n = x + res.phi.astype(jnp.float64)
        rel_n = jnp.sqrt(jnp.sum((b64 - op64(x_n)) ** 2)) / jnp.where(
            bnorm > 0, bnorm, 1.0)
        sel = lambda new, old: jnp.where(done, old, new)
        return (sel(x_n, x), sel(rel_n, rel_old),
                sel(total_it + res.iterations, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return (rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = lax.while_loop(
        cond, refine, (x, jnp.float64(jnp.inf), jnp.int32(0),
                       jnp.int32(0)))

    wphi = jnp.einsum("exyz,xyz->e", Wg64, x, precision=hp)
    U = jnp.where(flt, (z * I_in + wphi) / areas, 0.0)
    I_out = (U * areas - wphi) / z
    phi_nodes = x.reshape(-1)[scase.grid_index]
    return CEMResult(phi=phi_nodes, U=U, I=I_out,
                     iterations=total_it, residual=rel,
                     converged=rel <= tol)


@partial(jax.jit, static_argnames=("ground", "tol", "maxiter"))
def _cem_transfer_batch(case, weights, z_contact, patterns, sigma_table,
                        amg, phi0, *, ground, tol, maxiter):
    """Module-level jit for the E-1 drive batch: an inverse-problem
    outer loop calls the transfer matrix dozens of times, and a
    per-call vmap closure would re-trace (and on axon re-COMPILE)
    every call."""
    one = lambda Iv, x0: solve_case_cem(case, weights, z_contact, Iv,
                                        sigma_table=sigma_table,
                                        ground=ground, amg=amg, x0=x0,
                                        tol=tol, maxiter=maxiter)
    if phi0 is None:
        return jax.vmap(lambda Iv: one(Iv, None))(patterns)
    return jax.vmap(one)(patterns, phi0)


def cem_transfer_matrix(case, weights, z_contact, *, ground=0,
                        sigma_table=None, amg=None, phi0=None,
                        tol=1e-10, maxiter=20_000):
    """(E, E) CEM transfer-impedance matrix: Z[l, k] = U_k for unit
    current injected at floating electrode l (ground row/column zero
    by the U_ground = 0 gauge).  One vmapped batch of E-1 CEM solves;
    Z is symmetric over the floating block by reciprocity — the EIT
    forward measurement map on REALISTIC contacts, where every
    undriven electrode still shunts current (the lead-field
    idealization treats them as absent; models/array.py:67-70).

    Returns dict with Z, the (E-1, N) CEM lead fields (phi per unit
    drive, rows ordered by the floating indices in "drives"), and the
    solve diagnostics."""
    W = np.asarray(weights)
    E = W.shape[0]
    drives = np.array([e for e in range(E) if e != ground])
    patterns = np.eye(E)[drives]

    out = _cem_transfer_batch(case, jnp.asarray(weights), z_contact,
                              jnp.asarray(patterns), sigma_table, amg,
                              phi0, ground=ground, tol=tol,
                              maxiter=maxiter)
    residual = np.asarray(out.residual)
    Z = np.zeros((E, E))
    Z[drives] = np.asarray(out.U)
    return {
        "Z": Z,
        "drives": drives,
        "phi": out.phi,                    # (E-1, N) lead fields
        "U": np.asarray(out.U),
        "I": np.asarray(out.I),
        "iterations": np.asarray(out.iterations),
        "residual": residual,
        "converged": residual <= tol,      # host-derived (axon bools)
    }


@partial(jax.jit, static_argnames=("ground", "tol", "inner_tol",
                                   "maxiter", "nu", "coarse_iters",
                                   "max_refinements"))
def _stencil_cem_transfer_batch(scase, hier, Wg, present, z_contact,
                                patterns, sigma_table, *, ground, tol,
                                inner_tol, maxiter, nu, coarse_iters,
                                max_refinements):
    one = lambda Iv: solve_stencil_cem_refined(
        scase, hier, Wg, present, z_contact, Iv,
        sigma_table=sigma_table, ground=ground, tol=tol,
        inner_tol=inner_tol, maxiter=maxiter, nu=nu,
        coarse_iters=coarse_iters, max_refinements=max_refinements)
    return jax.vmap(one)(patterns)


def stencil_cem_transfer_matrix(scase, hier, Wg, present, z_contact, *,
                                ground=0, sigma_table=None, tol=1e-8,
                                inner_tol=3e-4, maxiter=2_000, nu=2,
                                coarse_iters=24, max_refinements=8):
    """cem_transfer_matrix on the stencil fast path: the (E, E) EIT
    measurement map at generated-lattice (megatet) scale as ONE
    vmapped batch of E-1 certified CEM solves (f32 MG inner + f64
    residual correction).  Inputs from stencil_cem_setup; same return
    contract as the element-path twin (phi rows are node-ordered lead
    fields)."""
    E = Wg.shape[0]
    drives = np.array([e for e in range(E) if e != ground])
    patterns = np.eye(E)[drives]
    if sigma_table is None:
        sigma_table = scase.sigma_table
    out = _stencil_cem_transfer_batch(
        scase, hier, Wg, present, jnp.asarray(z_contact),
        jnp.asarray(patterns), jnp.asarray(sigma_table),
        ground=ground, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
        nu=nu, coarse_iters=coarse_iters,
        max_refinements=max_refinements)
    residual = np.asarray(out.residual)
    Z = np.zeros((E, E))
    Z[drives] = np.asarray(out.U)
    return {
        "Z": Z,
        "drives": drives,
        "phi": out.phi,                    # (E-1, N) lead fields
        "U": np.asarray(out.U),
        "I": np.asarray(out.I),
        "iterations": np.asarray(out.iterations),
        "residual": residual,
        "converged": residual <= tol,      # host-derived (axon bools)
    }


# ── complex (EQS) CEM: frequency-dependent contact impedance ────────────────
#
# The real CEM above treats z_l as a resistance.  A physical electrode
# interface is CAPACITIVE (double layer / CPE): z_l = z_l(omega) is
# complex, and tissue itself is complex kappa = sigma + i omega eps0
# epsr (ops/eqs.py).  The complex CEM operator
#
#   A(x) = K(kappa) x + sum_m diag(W_m)/z_m x
#          - sum_{m != g} (w_m^T x)/(z_m |E_m|) w_m
#
# stays COMPLEX-SYMMETRIC (K symmetric, complex diagonal, symmetric
# rank-1 terms), so the same Smith-scaled COCG + real-sigma V-cycle
# machinery applies, under the f64-correction certified contract.
# This is the spectroscopy twin of the meshed dispersive contact layer
# (run_impedance --dispersive): the thin-layer equivalence
# z(omega) = t / kappa_c(omega) is pinned by test at every frequency.


def cpe_contact_impedance(freqs_hz, *, z_ser=0.0, q_cpe=1.0,
                          alpha=0.8):
    """(F, E?) -> (F,) complex contact impedance of a series
    resistance + constant-phase element:  z(w) = z_ser + 1/(q (i w)^a)
    [ohm m^2].  alpha = 1 is an ideal double-layer capacitor (q = C_dl
    per area), alpha ~ 0.7-0.9 matches real electrode interfaces."""
    w = 2 * np.pi * np.asarray(freqs_hz, np.float64)
    jw_a = np.power(1j * w, alpha)
    return z_ser + 1.0 / (q_cpe * jw_a)


def _stencil_cem_eqs_operator(scase, kr_table, ki_table, Wg, present,
                              z2, areas, flt):
    """Masked complex CEM operator on stacked (2, X, Y, Z) fields."""
    from pelvistim_fem_tpu.ops.eqs import _cdiv
    from pelvistim_fem_tpu.ops.stencil import combine_coeffs, stencil_spmv
    Cr = combine_coeffs(scase.coeff, kr_table)
    Ci = combine_coeffs(scase.coeff, ki_table)
    hp = jax.lax.Precision.HIGHEST
    # robin = sum_m W_m / z_m  (complex reciprocal, E-sized scalars)
    zmag2 = z2[0] ** 2 + z2[1] ** 2
    inv_z = jnp.stack([z2[0] / zmag2, -z2[1] / zmag2])     # (2, E)
    robin = jnp.einsum("ce,exyz->cxyz", inv_z, Wg, precision=hp)

    def op(x2):
        xz = jnp.where(present[None], x2, 0.0)
        xr, xi = xz[0], xz[1]
        kx = jnp.stack([stencil_spmv(xr, Cr) - stencil_spmv(xi, Ci),
                        stencil_spmv(xr, Ci) + stencil_spmv(xi, Cr)])
        wx = jnp.einsum("exyz,cxyz->ce", Wg, xz, precision=hp)
        den = jnp.stack([z2[0] * areas, z2[1] * areas])
        r1 = _cdiv(wx, den)                               # (2, E)
        r1 = jnp.where(flt[None], r1, 0.0)
        rob = jnp.stack([robin[0] * xr - robin[1] * xi,
                         robin[0] * xi + robin[1] * xr])
        out = kx + rob - jnp.einsum("ce,exyz->cxyz", r1, Wg,
                                    precision=hp)
        return jnp.where(present[None], out, x2)

    return op


@partial(jax.jit, static_argnames=("ground", "tol", "inner_tol",
                                   "maxiter", "nu", "coarse_iters",
                                   "max_refinements"))
def solve_stencil_cem_eqs_refined(scase, hier, Wg, present, z2,
                                  I_elec, *, ki_table, kr_table=None,
                                  ground=0, tol=1e-8, inner_tol=3e-4,
                                  maxiter=2_000, nu=2, coarse_iters=24,
                                  max_refinements=8) -> CEMResult:
    """Complex CEM on the stencil fast path: f32 COCG inner sweeps
    preconditioned per component by the REAL-kappa ground-pinned
    V-cycle, f64 residual correction against the f64 master complex
    CEM operator (certified TRUE residual).

    z2: (2, E) stacked complex contact impedances [ohm m^2];
    ki_table: (T,) omega*eps0*epsr admittivities; kr_table defaults to
    scase.sigma_table; I_elec: (E,) REAL drive currents.  Returns
    CEMResult with stacked complex phi (2, N), U (2, E), I (2, E).
    """
    from jax import lax

    from pelvistim_fem_tpu.ops.eqs import _cdiv, _cocg, _hnorm
    from pelvistim_fem_tpu.ops.multigrid import make_v_cycle
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("solve_stencil_cem_eqs_refined")
    kr = scase.sigma_table if kr_table is None else kr_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    sc64, sc32 = to(scase, jnp.float64), to(scase, jnp.float32)
    hier32 = to(hier, jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    z64 = jnp.asarray(z2, jnp.float64)
    I_in = jnp.asarray(I_elec, jnp.float64)
    E = Wg.shape[0]
    flt = jnp.arange(E) != ground
    Wg64 = Wg.astype(jnp.float64)
    areas = Wg64.sum(axis=(1, 2, 3))

    op64 = _stencil_cem_eqs_operator(
        sc64, kr.astype(jnp.float64), ki_table.astype(jnp.float64),
        Wg64, present, z64, areas, flt)
    op32 = _stencil_cem_eqs_operator(
        sc32, kr.astype(jnp.float32), ki_table.astype(jnp.float32),
        Wg.astype(jnp.float32), present, z64.astype(jnp.float32),
        areas.astype(jnp.float32), flt)
    breal = jnp.einsum("e,exyz->xyz", jnp.where(flt, I_in / areas, 0.0),
                       Wg64, precision=hp)
    b64 = jnp.stack([breal, jnp.zeros_like(breal)])

    M32 = make_v_cycle(hier32, kr.astype(jnp.float32), nu=nu,
                       coarse_iters=coarse_iters)
    fp = hier32.levels[0].free   # present minus the grounded patch

    def Mp(r2):
        zr = jnp.where(fp, M32(jnp.where(fp, r2[0], 0.0)), r2[0])
        zi = jnp.where(fp, M32(jnp.where(fp, r2[1], 0.0)), r2[1])
        return jnp.stack([zr, zi])

    bnorm = _hnorm(b64)
    x = jnp.zeros_like(b64)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        need = 0.25 * tol / jnp.minimum(rel_old, 1.0)
        tol_k = jnp.clip(need, inner_tol, 0.05)
        dx, it, _ = _cocg(op32, r64.astype(jnp.float32), Mp,
                          jnp.zeros_like(r64, jnp.float32),
                          tol=tol_k, maxiter=maxiter)
        x_n = x + dx.astype(jnp.float64)
        rel_n = _hnorm(b64 - op64(x_n)) / jnp.where(bnorm > 0, bnorm,
                                                    1.0)
        sel = lambda new, old: jnp.where(done, old, new)
        return (sel(x_n, x), sel(rel_n, rel_old),
                sel(total_it + it, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return (rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = lax.while_loop(
        cond, refine, (x, jnp.float64(jnp.inf), jnp.int32(0),
                       jnp.int32(0)))

    wphi = jnp.einsum("exyz,cxyz->ce", Wg64, x, precision=hp)  # (2, E)
    zI = jnp.stack([z64[0] * I_in, z64[1] * I_in])
    U = (zI + wphi) / areas[None]
    U = jnp.where(flt[None], U, 0.0)
    I_out = _cdiv(U * areas[None] - wphi, z64)
    phi_nodes = x.reshape(2, -1)[:, scase.grid_index]
    return CEMResult(phi=phi_nodes, U=U, I=I_out,
                     iterations=total_it, residual=rel,
                     converged=rel <= tol)


@partial(jax.jit, static_argnames=("ground", "tol", "inner_tol",
                                   "maxiter", "nu", "coarse_iters",
                                   "max_refinements"))
def _stencil_cem_eqs_transfer_batch(scase, hier, Wg, present, z2f,
                                    patterns, kr_tables, ki_tables, *,
                                    ground, tol, inner_tol, maxiter,
                                    nu, coarse_iters, max_refinements):
    """Module-level jit for the (frequency x drive) batch: the spectral
    EIT outer loop calls this dozens of times (ops/eit.py
    eit_recover_spectral), and a per-call closure would re-trace."""
    def one(z2, krt, kit, Iv):
        return solve_stencil_cem_eqs_refined(
            scase, hier, Wg, present, z2, Iv, kr_table=krt,
            ki_table=kit, ground=ground, tol=tol, inner_tol=inner_tol,
            maxiter=maxiter, nu=nu, coarse_iters=coarse_iters,
            max_refinements=max_refinements)

    def per_freq(z2, krt, kit):
        return jax.vmap(lambda Iv: one(z2, krt, kit, Iv))(patterns)

    return jax.vmap(per_freq)(z2f, kr_tables, ki_tables)


def stencil_cem_eqs_transfer_matrix(scase, hier, Wg, present,
                                    z_contact_f, *, ki_tables,
                                    kr_tables=None, ground=0, tol=1e-8,
                                    inner_tol=3e-4, maxiter=2_000,
                                    nu=2, coarse_iters=24,
                                    max_refinements=8):
    """Multifrequency COMPLEX transfer-impedance tensor Z (F, E, E):
    Z[f, l, k] = complex U_k for unit real current at floating
    electrode l, with per-frequency complex admittivity tables
    (ops/eqs.dispersive_tables) and complex contact impedances
    (cpe_contact_impedance) — the spectral-EIT forward measurement
    map.  ONE jitted (F x (E-1)) vmapped batch of certified complex
    CEM solves.

    z_contact_f: (F, E) complex [ohm m^2]; ki_tables: (F, T)
    omega*eps0*epsr per frequency; kr_tables: (F, T) Re(kappa),
    defaulting to the static sigma table at every frequency.

    Returns dict: Z (F, E, E) complex128, drives, phi (F, D, 2, N)
    stacked lead fields, U (F, D, 2, E), iterations / residual /
    converged per (f, drive).
    """
    E = Wg.shape[0]
    drives = np.array([e for e in range(E) if e != ground])
    patterns = np.eye(E)[drives]
    zf = np.asarray(z_contact_f, np.complex128)
    F = zf.shape[0]
    z2f = jnp.asarray(np.stack([zf.real, zf.imag], axis=1))  # (F, 2, E)
    ki = jnp.asarray(ki_tables, jnp.float64)
    if kr_tables is None:
        kr = jnp.tile(scase.sigma_table.astype(jnp.float64)[None],
                      (F, 1))
    else:
        kr = jnp.asarray(kr_tables, jnp.float64)

    out = _stencil_cem_eqs_transfer_batch(
        scase, hier, Wg, present, z2f, jnp.asarray(patterns), kr, ki,
        ground=ground, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
        nu=nu, coarse_iters=coarse_iters,
        max_refinements=max_refinements)
    U = np.asarray(out.U)                     # (F, D, 2, E)
    residual = np.asarray(out.residual)
    Z = np.zeros((F, E, E), np.complex128)
    Z[:, drives] = U[:, :, 0] + 1j * U[:, :, 1]
    return {
        "Z": Z,
        "drives": drives,
        "phi": out.phi,                       # (F, D, 2, N) lead fields
        "U": U,
        "I": np.asarray(out.I),
        "iterations": np.asarray(out.iterations),
        "residual": residual,
        "converged": residual <= tol,         # host-derived (axon bools)
    }


def _case_cem_eqs_operator(case, kr_table, ki_table, W, z2, areas, flt):
    """Element-path complex CEM operator on stacked (2, N) fields:
    complex stiffness spmv + complex Robin diagonal + complex
    symmetric rank-1 per floating electrode.  No BC masks — the CEM
    replaces them (every node free, non-electrode boundary natural)."""
    from pelvistim_fem_tpu.ops.eqs import _cdiv
    n = case.free_mask.shape[0]
    hp = jax.lax.Precision.HIGHEST

    def _sigvol(table):
        s = table[case.tet_body]
        if s.ndim == 3:
            return s * case.vol[:, None, None]
        return s * case.vol

    sig_r, sig_i = _sigvol(kr_table), _sigvol(ki_table)
    zmag2 = z2[0] ** 2 + z2[1] ** 2
    inv_z = jnp.stack([z2[0] / zmag2, -z2[1] / zmag2])       # (2, E)
    robin = jnp.einsum("ce,en->cn", inv_z, W, precision=hp)  # (2, N)

    def op(x2):
        def mv(x, sv):
            return assembly.spmv(x, case.tets, case.grads, sv,
                                 case.scatter_perm,
                                 case.scatter_segids, n)
        xr, xi = x2[0], x2[1]
        kx = jnp.stack([mv(xr, sig_r) - mv(xi, sig_i),
                        mv(xr, sig_i) + mv(xi, sig_r)])
        wx = jnp.einsum("en,cn->ce", W, x2, precision=hp)
        r1 = _cdiv(wx, jnp.stack([z2[0] * areas, z2[1] * areas]))
        r1 = jnp.where(flt[None], r1, 0.0)
        rob = jnp.stack([robin[0] * xr - robin[1] * xi,
                         robin[0] * xi + robin[1] * xr])
        return kx + rob - jnp.einsum("ce,en->cn", r1, W, precision=hp)

    return op


@partial(jax.jit, static_argnames=("ground", "tol", "inner_tol",
                                   "maxiter", "nu", "omega",
                                   "coarse_iters", "max_refinements"))
def solve_case_cem_eqs_refined(case, weights, z2, I_elec, *, ki_table,
                               kr_table=None, ground=0, amg=None,
                               tol=1e-8, inner_tol=3e-4, maxiter=5_000,
                               nu=2, omega=0.85, coarse_iters=24,
                               max_refinements=8) -> CEMResult:
    """Complex CEM on the ELEMENT path — frequency-dependent contact
    impedance + complex tissue admittivity on any imported mesh,
    under the certified f32-COCG-inner / f64-correction contract
    (the imported-mesh twin of solve_stencil_cem_eqs_refined).

    z2: (2, E) stacked complex contact impedances [ohm m^2];
    ki_table: (T,) omega*eps0*epsr (or (T, 3, 3) tensor — both tables
    dispatch on rank like the EQS element path); kr_table defaults to
    case.sigma_table.  Pass `amg` (build_cem_amg on the REAL sigma)
    for hard-contrast meshes; preconditioning is per component —
    complex-symmetric COCG tolerates the real-part-only M.
    """
    from jax import lax

    from pelvistim_fem_tpu.ops.eqs import _cdiv, _cocg, _hnorm
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("solve_case_cem_eqs_refined")
    kr = case.sigma_table if kr_table is None else kr_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    case64, case32 = to(case, jnp.float64), to(case, jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    n = case.free_mask.shape[0]
    W64 = jnp.asarray(weights, jnp.float64)
    z64 = jnp.asarray(z2, jnp.float64)
    I_in = jnp.asarray(I_elec, jnp.float64)
    E = W64.shape[0]
    flt = jnp.arange(E) != ground
    areas = W64.sum(axis=1)

    op64 = _case_cem_eqs_operator(
        case64, kr.astype(jnp.float64), ki_table.astype(jnp.float64),
        W64, z64, areas, flt)
    op32 = _case_cem_eqs_operator(
        case32, kr.astype(jnp.float32), ki_table.astype(jnp.float32),
        W64.astype(jnp.float32), z64.astype(jnp.float32),
        areas.astype(jnp.float32), flt)
    breal = jnp.einsum("e,en->n", jnp.where(flt, I_in / areas, 0.0),
                       W64, precision=hp)
    b64 = jnp.stack([breal, jnp.zeros_like(breal)])

    # real-part preconditioner: Jacobi on diag(K(Re kappa)) + Re robin,
    # or the ground-pinned AMG V-cycle of the REAL CEM operator
    kr32 = kr.astype(jnp.float32)
    sig_r32 = kr32[case.tet_body]
    sig_r32 = (sig_r32 * case32.vol if sig_r32.ndim == 1
               else sig_r32 * case32.vol[:, None, None])
    diag_k = assembly.stiffness_diagonal(
        case32.tets, case32.grads, sig_r32, case32.scatter_perm,
        case32.scatter_segids, n)
    zmag2 = (z64[0] ** 2 + z64[1] ** 2).astype(jnp.float32)
    re_invz = (z64[0].astype(jnp.float32)) / zmag2
    robin_r = jnp.einsum("e,en->n", re_invz,
                         W64.astype(jnp.float32), precision=hp)
    minv = 1.0 / (diag_k + robin_r)
    if amg is None:
        M32 = lambda r: minv * r
    else:
        from pelvistim_fem_tpu.ops.amg import make_amg_preconditioner
        amg32 = to(amg, jnp.float32)
        fidx = amg32.free_idx
        mask = jnp.zeros(n, bool).at[fidx].set(True)
        # real CEM operator with z_eff = 1/Re(1/z): SPD on the
        # ground-pinned subspace, the real part of the complex op
        W32 = W64.astype(jnp.float32)

        def op_r(x):
            kx = assembly.spmv(x, case32.tets, case32.grads, sig_r32,
                               case32.scatter_perm,
                               case32.scatter_segids, n)
            wx = jnp.einsum("en,n->e", W32, x, precision=hp)
            r1 = jnp.where(flt, wx * re_invz / areas.astype(jnp.float32),
                           0.0)
            return kx + robin_r * x - jnp.einsum("e,en->n", r1, W32,
                                                 precision=hp)

        def fine_op(xf):
            xfull = jnp.zeros(n, jnp.float32).at[fidx].set(xf)
            return op_r(xfull)[fidx]

        Mf = make_amg_preconditioner(amg32, fine_op, nu=nu, omega=omega,
                                     coarse_iters=coarse_iters)

        def M32(r):
            zv = jnp.zeros_like(r).at[fidx].set(Mf(r[fidx]))
            return jnp.where(mask, zv, minv * r)

    def Mp(r2):
        return jnp.stack([M32(r2[0]), M32(r2[1])])

    bnorm = _hnorm(b64)
    x = jnp.zeros_like(b64)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        tol_k = jnp.clip(0.25 * tol / jnp.minimum(rel_old, 1.0),
                         inner_tol, 0.05)
        dx, it, _ = _cocg(op32, r64.astype(jnp.float32), Mp,
                          jnp.zeros_like(r64, jnp.float32),
                          tol=tol_k, maxiter=maxiter)
        x_n = x + dx.astype(jnp.float64)
        rel_n = _hnorm(b64 - op64(x_n)) / jnp.where(bnorm > 0, bnorm,
                                                    1.0)
        sel = lambda new, old: jnp.where(done, old, new)
        return (sel(x_n, x), sel(rel_n, rel_old),
                sel(total_it + it, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return (rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = lax.while_loop(
        cond, refine, (x, jnp.float64(jnp.inf), jnp.int32(0),
                       jnp.int32(0)))

    wphi = jnp.einsum("en,cn->ce", W64, x, precision=hp)     # (2, E)
    zI = jnp.stack([z64[0] * I_in, z64[1] * I_in])
    U = jnp.where(flt[None], (zI + wphi) / areas[None], 0.0)
    I_out = _cdiv(U * areas[None] - wphi, z64)
    return CEMResult(phi=x, U=U, I=I_out, iterations=total_it,
                     residual=rel, converged=rel <= tol)


@partial(jax.jit, static_argnames=("ground", "tol", "inner_tol",
                                   "maxiter", "nu", "omega",
                                   "coarse_iters", "max_refinements"))
def _cem_eqs_transfer_batch(case, weights, z2f, patterns, kr_tables,
                            ki_tables, amg, *, ground, tol, inner_tol,
                            maxiter, nu, omega, coarse_iters,
                            max_refinements):
    def one(z2, krt, kit, Iv):
        return solve_case_cem_eqs_refined(
            case, weights, z2, Iv, kr_table=krt, ki_table=kit,
            ground=ground, amg=amg, tol=tol, inner_tol=inner_tol,
            maxiter=maxiter, nu=nu, omega=omega,
            coarse_iters=coarse_iters,
            max_refinements=max_refinements)

    def per_freq(z2, krt, kit):
        return jax.vmap(lambda Iv: one(z2, krt, kit, Iv))(patterns)

    return jax.vmap(per_freq)(z2f, kr_tables, ki_tables)


def cem_eqs_transfer_matrix(case, weights, z_contact_f, *, ki_tables,
                            kr_tables=None, ground=0, amg=None,
                            tol=1e-8, inner_tol=3e-4, maxiter=5_000,
                            nu=2, omega=0.85, coarse_iters=24,
                            max_refinements=8):
    """stencil_cem_eqs_transfer_matrix on the ELEMENT path: the
    multifrequency complex measurement tensor for IMPORTED meshes —
    one jitted (F x (E-1)) batch of certified complex CEM solves.
    Same return contract (Z (F, E, E) complex128, stacked phi/U)."""
    W = np.asarray(weights)
    E = W.shape[0]
    drives = np.array([e for e in range(E) if e != ground])
    patterns = np.eye(E)[drives]
    zf = np.asarray(z_contact_f, np.complex128)
    F = zf.shape[0]
    z2f = jnp.asarray(np.stack([zf.real, zf.imag], axis=1))
    ki = jnp.asarray(ki_tables, jnp.float64)
    if kr_tables is None:
        kr = jnp.tile(case.sigma_table.astype(jnp.float64)[None],
                      (F, 1))
    else:
        kr = jnp.asarray(kr_tables, jnp.float64)

    out = _cem_eqs_transfer_batch(
        case, jnp.asarray(weights), z2f, jnp.asarray(patterns), kr, ki,
        amg, ground=ground, tol=tol, inner_tol=inner_tol,
        maxiter=maxiter, nu=nu, omega=omega, coarse_iters=coarse_iters,
        max_refinements=max_refinements)
    U = np.asarray(out.U)
    residual = np.asarray(out.residual)
    Z = np.zeros((F, E, E), np.complex128)
    Z[:, drives] = U[:, :, 0] + 1j * U[:, :, 1]
    return {
        "Z": Z,
        "drives": drives,
        "phi": out.phi,                       # (F, D, 2, N) lead fields
        "U": U,
        "I": np.asarray(out.I),
        "iterations": np.asarray(out.iterations),
        "residual": residual,
        "converged": residual <= tol,         # host-derived (axon bools)
    }

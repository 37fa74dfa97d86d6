"""Electrical impedance tomography on the complete electrode model.

The framework's calibration path (ops/calibrate.py) fits conductivities
to INTERIOR potential observations — data a fitting session rarely has.
What a stimulator can actually measure is the electrode voltages under
programmed drives: exactly the CEM transfer-impedance matrix
(ops/cem.py cem_transfer_matrix).  This module closes the loop from
that measurement to the unknowns that matter clinically — per-body
tissue conductivities and per-electrode contact impedances — plus the
classic linear difference-EIT image.

The reference has no inverse capability at all (its sigma block is
literature constants, step03_ankle_layers/params.yaml; sensitivity is
brute-force sweeps, step04 run_pressure_sweep.py:709-738); this is a
framework extension enabled by the CEM.

Jacobians are ANALYTIC from the lead fields the forward map already
computed (reciprocity) — no extra solves and no autodiff through CG.
With phi_l the lead field of unit current at floating electrode l
(ground g fixed), U_m^l its electrode potentials, and the measurement
Z[l, k] = U_k under drive l:

    dZ[l,k]/dsigma_b = - int_{body b} grad phi_l . grad phi_k dx
    dZ[l,k]/dz_m     = (1/z_m^2) int_{E_m} (phi_l - U_m^l)
                                           (phi_k - U_m^k) dS

(first-order perturbation of the CEM bilinear form
a(u, v) = int sigma grad u . grad v + sum_m (1/z_m) int_{E_m}
(u - U_m)(v - V_m); both integrals are evaluated with the lumped P1
surface weights and element gradients the solver already carries, so
the full Jacobian is a handful of einsums).

Recovery is Levenberg-Marquardt Gauss-Newton on LOG parameters
(positivity + scale-free steps across the 7000x physiological
contrast), a host loop of ~10 vmapped forward batches.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.cem import cem_transfer_matrix

__all__ = ["eit_jacobians", "eit_recover", "eit_sensitivity_cells",
           "eit_difference_image", "stencil_eit_jacobians",
           "eit_recover_stencil", "stencil_eit_jacobians_eqs",
           "eit_recover_spectral", "eit_jacobians_eqs",
           "eit_recover_spectral_case"]

_HP = jax.lax.Precision.HIGHEST


def _lead_gradients(case, phi):
    """(D, M, 3) per-element gradients of the (D, N) lead fields."""
    return jnp.einsum("mkc,dmk->dmc", case.grads, phi[:, case.tets],
                      precision=_HP)


def _contact_jacobian(W2, phi2, U, z):
    """(D, D, E) dZ[l, k]/dz_m from lumped surface weights: W2 (E, M)
    and phi2 (D, M) share any indexing (mesh nodes or grid slots)."""
    area = W2.sum(axis=1)
    T = jnp.einsum("mn,ln->lm", W2, phi2, precision=_HP)     # (D, E)
    Q = jnp.einsum("mn,ln,kn->lkm", W2, phi2, phi2,
                   precision=_HP)                            # (D, D, E)
    # sum_n W[m,n] (phi_l - U[l,m]) (phi_k - U[k,m]), expanded
    s = (Q - U[None, :, :] * T[:, None, :]
         - U[:, None, :] * T[None, :, :]
         + U[:, None, :] * U[None, :, :] * area[None, None, :])
    return s / (z * z)[None, None, :]


def eit_jacobians(case, weights, z_contact, out, *, n_bodies=None):
    """Analytic Jacobians of the floating measurement block.

    out: cem_transfer_matrix(...) result (its "phi" rows are the lead
    fields of the drives in out["drives"]).  Returns
    (J_sigma (D, D, B), J_z (D, D, E)) with D = len(drives):
    J_sigma[l, k, b] = dZ[drives[l], drives[k]]/dsigma_b (sigma_table
    slot b), J_z[l, k, m] = dZ[.]/dz_m.  Derivatives w.r.t. LOG
    parameters are J_sigma * sigma_b / J_z * z_m (chain rule, done by
    eit_recover).
    """
    phi = jnp.asarray(out["phi"], jnp.float64)           # (D, N)
    drives = np.asarray(out["drives"])
    U = jnp.asarray(out["U"], jnp.float64)               # (D, E)
    W = jnp.asarray(weights, jnp.float64)                # (E, N)
    z = jnp.asarray(z_contact, jnp.float64)
    if n_bodies is None:
        n_bodies = int(case.sigma_table.shape[0])

    G = _lead_gradients(case, phi)                       # (D, M, 3)
    onehot = (case.tet_body[:, None]
              == jnp.arange(n_bodies)[None, :])          # (M, B)
    gv = case.vol.astype(jnp.float64)
    J_sigma = -jnp.einsum("lmc,kmc,m,mb->lkb", G, G, gv,
                          onehot.astype(jnp.float64), precision=_HP)

    J_z = _contact_jacobian(W, phi, U, z)
    del drives
    return np.asarray(J_sigma), np.asarray(J_z)


def eit_sensitivity_cells(case, out):
    """(M,) per-element EIT sensitivity map: RMS over measurement pairs
    of the volume-weighted lead-gradient products — where a
    conductivity change is visible from the electrodes at all (the
    standard distinguishability map)."""
    phi = jnp.asarray(out["phi"], jnp.float64)
    G = _lead_gradients(case, phi)
    gg = jnp.einsum("lmc,kmc->lkm", G, G, precision=_HP) \
        * case.vol.astype(jnp.float64)[None, None, :]
    return np.asarray(jnp.sqrt(jnp.mean(gg * gg, axis=(0, 1))))


def eit_difference_image(case, out, dZ, *, lam_rel=1e-3):
    """One-step linear difference-EIT image (per-ELEMENT delta sigma)
    from a change dZ (D, D) in the floating measurement block.

    Minimum-norm Tikhonov via the dual form: with J (P, M) the
    element-wise Jacobian (P = D^2 measurements, M elements),
    delta = J^T (J J^T + lam I)^-1 vec(dZ) — a (P, P) solve, so
    megatet-scale M costs one einsum.  lam_rel scales the damping by
    the largest eigenvalue surrogate trace(J J^T)/P."""
    phi = jnp.asarray(out["phi"], jnp.float64)
    G = _lead_gradients(case, phi)
    J = -(jnp.einsum("lmc,kmc->lkm", G, G, precision=_HP)
          * case.vol.astype(jnp.float64)[None, None, :])
    D = J.shape[0]
    P = D * D
    Jf = J.reshape(P, -1)
    JJt = Jf @ Jf.T
    lam = lam_rel * jnp.trace(JJt) / P
    y = jnp.linalg.solve(JJt + lam * jnp.eye(P),
                         jnp.asarray(dZ, jnp.float64).reshape(P))
    return np.asarray(Jf.T @ y)


def eit_recover(case, weights, measurements, *, bodies, z0, sigma0=None,
                fit_z=True, amg=None, max_nfev=60, tol=1e-11,
                verbose=False, forward_fn=None, jacobian_fn=None):
    """Recover sigma_table[bodies] (and optionally contact impedances)
    from measured electrode-voltage blocks by Levenberg-Marquardt on
    log parameters (scipy MINPACK drives the trust region host-side;
    every residual/Jacobian evaluation is a vmapped device batch of
    CEM solves plus the analytic lead-field einsums — the valley of
    the joint problem is curved enough that a naive damping schedule
    crawls where MINPACK's scaled trust region converges in ~8
    forwards).

    measurements: list of (ground, U_meas) pairs — U_meas is the
    floating (D, D) block measured with that electrode grounded,
    rows/cols ordered by the floating indices ascending
    (cem_transfer_matrix's Z[drives][:, drives]).  Multiple pairs
    (re-referenced protocols) concatenate into one residual.

    fit_z: True (fit every contact), False (hold all), or a sequence
    of electrode indices to fit.  IDENTIFIABILITY CAVEAT — hold what
    the data cannot see: (a) a low-impedance large return pad under
    kOhm spreading resistance contributes ~nothing to any voltage;
    (b) more fundamentally, a deep near-uniform layer and the contact
    BEHIND it enter every measurement only through the series sum
    d/sigma_layer + z_back — an exact trade no electrode arrangement
    on the far side can break.  Characterize the return pad separately
    and hold its z; eit_jacobians' SVD is the diagnostic (condition
    <~1e3 on log parameters is comfortable).

    z0: (E,) starting contact impedances.  sigma0 overrides the case
    table's values at `bodies` as the start.

    forward_fn(sigma_table, z, ground, phi0) -> transfer dict and
    jacobian_fn(z, out, sigma_table) -> (J_sigma, J_z) inject a
    different discretization backend (eit_recover_stencil wires the
    lattice fast path); defaults are the element-path
    cem_transfer_matrix / eit_jacobians.  `case` then only needs a
    .sigma_table attribute.

    Returns dict: sigma_table (full fitted table), z (E,), loss_history
    (normalized ||r||^2 per residual evaluation), n_forward, converged,
    log_std (linearized posterior std of each fitted LOG parameter —
    ~relative std — at the achieved residual rms; ordered fit_bodies
    then fit_zidx), residual_rms.
    """
    from scipy.optimize import least_squares

    base = np.asarray(case.sigma_table, np.float64).copy()
    bodies = list(bodies)
    nb = len(bodies)
    if sigma0 is not None:
        base[bodies] = np.asarray(sigma0, np.float64)
    z = np.asarray(z0, np.float64).copy()
    E = z.shape[0]
    if fit_z is True:
        zidx = list(range(E))
    elif fit_z is False:
        zidx = []
    else:
        zidx = list(fit_z)
    grounds = [g for g, _ in measurements]
    U_all = np.concatenate([np.asarray(u, np.float64).ravel()
                            for _, u in measurements])
    denom = float(U_all @ U_all)

    def unpack(p):
        tab = base.copy()
        tab[bodies] = np.exp(p[:nb])
        zv = z.copy()
        zv[zidx] = np.exp(p[nb:])
        return tab, zv

    if forward_fn is None:
        def forward_fn(tab, zv, g, phi0):
            return cem_transfer_matrix(case, weights, jnp.asarray(zv),
                                       ground=g, amg=amg,
                                       sigma_table=jnp.asarray(tab),
                                       phi0=phi0, tol=tol)
    if jacobian_fn is None:
        def jacobian_fn(zv, out, tab):
            return eit_jacobians(case, weights, zv, out,
                                 n_bodies=base.shape[0])

    state = {"n_forward": 0, "bad": False, "history": [], "phi": {}}
    cache = {}

    def forward(p):
        key = p.tobytes()
        if key not in cache:
            tab, zv = unpack(p)
            outs = []
            for g in grounds:
                # warm-start each drive's CG from the last evaluation's
                # lead field: LM probes nearby parameters, so CG only
                # pays for the DIFFERENCE (~3-5x fewer iterations)
                out = forward_fn(tab, zv, g, state["phi"].get(g))
                state["phi"][g] = out["phi"]
                outs.append(out)
            state["n_forward"] += len(grounds)
            cache.clear()            # keep exactly the current iterate
            cache[key] = outs
        return cache[key]

    def resid(p):
        outs = forward(p)
        if not all(o["converged"].all() for o in outs):
            # an unconverged solve (wild trial parameters): report a
            # uniformly inflated residual so the trust region shrinks
            state["bad"] = True
            return np.full(U_all.shape, 10.0 * np.sqrt(denom))
        r = np.concatenate(
            [o["Z"][np.ix_(o["drives"], o["drives"])].ravel()
             for o in outs]) - U_all
        loss = float(r @ r) / denom
        state["history"].append(loss)
        if verbose:
            print(f"  [eit] eval {state['n_forward']:3d} "
                  f"loss {loss:.3e}")
        return r

    def jac(p):
        outs = forward(p)
        tab, zv = unpack(p)
        rows = []
        for out in outs:
            J_sig, J_z = jacobian_fn(zv, out, tab)
            D = J_sig.shape[0]
            cols = [J_sig[:, :, b].reshape(D * D) * tab[b]
                    for b in bodies]
            cols += [J_z[:, :, m].reshape(D * D) * zv[m] for m in zidx]
            rows.append(np.stack(cols, axis=1))
        return np.concatenate(rows)

    p0 = np.log(np.r_[base[bodies], z[zidx]])
    res = least_squares(resid, p0, jac=jac, method="lm",
                        xtol=1e-15, ftol=1e-15, gtol=1e-14,
                        max_nfev=max_nfev)
    # linearized posterior: std of each LOG parameter (~ relative std)
    # for measurement noise at the achieved residual rms — what the
    # data can actually pin, which for weakly-observed parameters
    # (deep layers) is the honest error bar, not the point estimate.
    # The floor on "noise" even for synthetic data is the solver
    # tolerance amplified by the operator conditioning.
    Jf = jac(res.x)
    rms = np.sqrt(2.0 * res.cost / max(Jf.shape[0], 1))
    try:
        cov = np.linalg.inv(Jf.T @ Jf)
        log_std = rms * np.sqrt(np.maximum(np.diag(cov), 0.0))
    except np.linalg.LinAlgError:
        log_std = np.full(Jf.shape[1], np.inf)
    base, z = unpack(res.x)
    final_loss = 2.0 * res.cost / denom
    state["history"].append(final_loss)
    converged = bool(res.status > 0) and not state["bad"] or \
        final_loss <= 1e-14
    return {"sigma_table": base, "z": z,
            "loss_history": state["history"],
            "n_forward": state["n_forward"], "converged": converged,
            "log_std": log_std, "fit_bodies": list(bodies),
            "fit_zidx": list(zidx), "residual_rms": float(rms)}


def stencil_eit_jacobians(scase, Wg, z_contact, out):
    """Fast-path analytic Jacobians at generated-lattice scale.

    The stencil operator is already BODY-FACTORED (StencilCase.coeff:
    K(sigma) = sum_b sigma_b K_b), so the volume integral collapses to
        dZ[l, k]/dsigma_b = -phi_l^T K_b phi_k
    — one 27-point stencil apply per body per lead field and a dot
    product.  No per-element gradients exist or are needed; at megatet
    scale this is a handful of fused elementwise kernels.  Contact
    derivatives use the same lumped surface expansion as the element
    path, on grid slots.

    out: stencil_cem_transfer_matrix(...) result.  Returns
    (J_sigma (D, D, n_bodies + 1), J_z (D, D, E)) with the sigma axis
    aligned to sigma_table slots (slot 0 unused, zero column).
    """
    from pelvistim_fem_tpu.ops.stencil import stencil_spmv

    phi = jnp.asarray(out["phi"], jnp.float64)           # (D, N)
    E, X, Y, Z = Wg.shape
    G = X * Y * Z
    D = phi.shape[0]
    pg = jnp.zeros((D, G), jnp.float64) \
        .at[:, scase.grid_index].set(phi).reshape(D, X, Y, Z)
    coeff = scase.coeff.astype(jnp.float64)
    Kb = jax.vmap(lambda c: jax.vmap(
        lambda p: stencil_spmv(p, c))(pg))(coeff)        # (B, D, grid)
    Jb = -jnp.einsum("lxyz,bkxyz->lkb", pg, Kb, precision=_HP)
    J_sigma = jnp.concatenate(
        [jnp.zeros((D, D, 1), Jb.dtype), Jb], axis=2)
    J_z = _contact_jacobian(Wg.reshape(E, G).astype(jnp.float64),
                            pg.reshape(D, G),
                            jnp.asarray(out["U"], jnp.float64),
                            jnp.asarray(z_contact, jnp.float64))
    return np.asarray(J_sigma), np.asarray(J_z)


def eit_recover_stencil(scase, hier, Wg, present, measurements, *,
                        bodies, z0, tol=1e-8, **kw):
    """eit_recover on the lattice fast path: every forward is one
    vmapped batch of certified stencil CEM solves
    (cem.stencil_cem_transfer_matrix) and J_sigma comes straight from
    the body-factored stencil coefficients (stencil_eit_jacobians) —
    tissue + contact identification at megatet scale.

    All measurements must share the ground electrode that
    stencil_cem_setup pinned into `hier` (re-referenced protocols need
    one setup per reference).
    """
    from pelvistim_fem_tpu.ops.cem import stencil_cem_transfer_matrix

    def fwd(tab, zv, g, phi0):
        del phi0       # the refined stencil solve has no warm start
        return stencil_cem_transfer_matrix(
            scase, hier, Wg, present, zv, ground=g,
            sigma_table=jnp.asarray(tab), tol=tol)

    def jac(zv, out, tab):
        del tab
        return stencil_eit_jacobians(scase, Wg, zv, out)

    return eit_recover(scase, None, measurements, bodies=bodies,
                       z0=z0, tol=tol, forward_fn=fwd,
                       jacobian_fn=jac, **kw)


# ── spectral (multifrequency) EIT ────────────────────────────────────────────
#
# Single-frequency EIT carries an exact degeneracy: a near-uniform deep
# layer and the contact impedance BEHIND it enter every measurement
# only through the series sum d/sigma_layer + z_back (eit_recover's
# identifiability caveat).  FREQUENCY breaks it: a CPE contact moves as
# z(w) ~ w^-alpha while a resistive layer does not move at all, and a
# dispersive (Cole-Cole) tissue moves with its own signature.  Fitting
# the complex (F, D, D) transfer tensor therefore identifies parameter
# sets a single-frequency protocol cannot — this is fd-EIT /
# bioimpedance spectroscopy on the CEM, run entirely on the stencil
# fast path (ops/cem.py solve_stencil_cem_eqs_refined).
#
# The complex CEM bilinear form is COMPLEX-SYMMETRIC (no conjugation),
# so the same first-order perturbation identities hold verbatim with
# complex products:
#
#     dZ[l,k]/dkappa_b = - phi_l^T K_b phi_k          (K_b real)
#     dZ[l,k]/dz_m     = (1/z_m^2) sum_n W[m,n]
#                         (phi_l - U_l,m)(phi_k - U_k,m)
#
# and model parameters (Cole-Cole sigma_s/d_eps/tau per body; CPE
# z_ser/q per contact) chain through dkappa/dp(w), dz/dp(w) — tiny
# host-side complex scalars per frequency.


@jax.jit
def _eqs_stencil_vol_core(coeff, pg):
    """Volume term behind stencil_eit_jacobians_eqs: one REAL stencil
    apply per body per component per lead field, then the complex
    bilinear contraction in stacked-real einsums.  coeff
    (B, 27, X, Y, Z); pg (F, D, 2, X, Y, Z)."""
    from pelvistim_fem_tpu.ops.stencil import stencil_spmv
    r, i = pg[:, :, 0], pg[:, :, 1]                 # (F, D, X, Y, Z)
    spmv_all = jax.vmap(jax.vmap(jax.vmap(stencil_spmv, (0, None)),
                                 (0, None)), (None, 0))
    Kr = spmv_all(r, coeff)                          # (B, F, D, grid)
    Ki = spmv_all(i, coeff)
    Jr = -(jnp.einsum("flxyz,bfkxyz->flkb", r, Kr, precision=_HP)
           - jnp.einsum("flxyz,bfkxyz->flkb", i, Ki, precision=_HP))
    Ji = -(jnp.einsum("flxyz,bfkxyz->flkb", r, Ki, precision=_HP)
           + jnp.einsum("flxyz,bfkxyz->flkb", i, Kr, precision=_HP))
    return Jr, Ji


@jax.jit
def _eqs_surface_core(W2, rf, if_):
    """Surface moments of the complex lead fields (shared by the
    stencil and element paths): W2 (E, n) lumped weights on any
    indexing, rf/if_ (F, D, n) field components.  Returns the T
    (first) and Q (second, complex-bilinear) moments, stacked-real."""
    Tr = jnp.einsum("mg,flg->flm", W2, rf, precision=_HP)
    Ti = jnp.einsum("mg,flg->flm", W2, if_, precision=_HP)
    Qr = (jnp.einsum("mg,flg,fkg->flkm", W2, rf, rf, precision=_HP)
          - jnp.einsum("mg,flg,fkg->flkm", W2, if_, if_, precision=_HP))
    Qi = (jnp.einsum("mg,flg,fkg->flkm", W2, rf, if_, precision=_HP)
          + jnp.einsum("mg,flg,fkg->flkm", W2, if_, rf, precision=_HP))
    return Tr, Ti, Qr, Qi


def _contact_jacobian_complex(W2, rf, if_, U_c, zf):
    """dZ/dz_m (F, D, D, E) complex from the surface moments: the
    complex-bilinear expansion of (1/z^2) sum_n W (phi_l - U_l)
    (phi_k - U_k)."""
    Tr, Ti, Qr, Qi = _eqs_surface_core(W2, rf, if_)
    T = np.asarray(Tr) + 1j * np.asarray(Ti)         # (F, D, E)
    Q = np.asarray(Qr) + 1j * np.asarray(Qi)         # (F, D, D, E)
    area = np.asarray(jnp.sum(W2, axis=1))
    S = (Q - U_c[:, None, :, :] * T[:, :, None, :]
         - U_c[:, :, None, :] * T[:, None, :, :]
         + U_c[:, :, None, :] * U_c[:, None, :, :]
         * area[None, None, None, :])
    return S / (zf * zf)[:, None, None, :]


def stencil_eit_jacobians_eqs(scase, Wg, z_contact_f, out):
    """Analytic COMPLEX Jacobians of the multifrequency floating block.

    out: stencil_cem_eqs_transfer_matrix(...) result; z_contact_f:
    (F, E) complex.  Returns (J_kappa (F, D, D, B + 1) complex128 —
    dZ/dkappa_b aligned to sigma_table slots, slot 0 zero — and
    J_z (F, D, D, E) complex128 — dZ/dz_m).  The volume term is one
    REAL 27-point stencil apply per body per component per lead field
    (the operator is kappa-factored: K(kappa) = sum_b kappa_b K_b);
    no per-element gradients at any scale.
    """
    phi = jnp.asarray(out["phi"], jnp.float64)       # (F, D, 2, N)
    E, X, Y, Z = Wg.shape
    G = X * Y * Z
    F, D = phi.shape[:2]
    pg = jnp.zeros((F, D, 2, G), jnp.float64) \
        .at[:, :, :, scase.grid_index].set(phi) \
        .reshape(F, D, 2, X, Y, Z)
    zf = np.asarray(z_contact_f, np.complex128)      # (F, E)
    Jr, Ji = _eqs_stencil_vol_core(scase.coeff.astype(jnp.float64), pg)

    Jb = np.asarray(Jr) + 1j * np.asarray(Ji)        # (F, D, D, B)
    J_kappa = np.concatenate(
        [np.zeros((F, D, D, 1), np.complex128), Jb], axis=3)

    U = out["U"][:, :, 0] + 1j * out["U"][:, :, 1]   # (F, D, E)
    pf = pg.reshape(F, D, 2, G)
    J_z = _contact_jacobian_complex(
        Wg.reshape(E, G).astype(jnp.float64), pf[:, :, 0], pf[:, :, 1],
        U, zf)
    return J_kappa, J_z


@jax.jit
def _eqs_case_vol_core(tets, grads, vol, onehot, phi):
    """Element-path volume term: complex-bilinear grad-grad integrals
    per body in stacked-real einsums.  phi (F, D, 2, N)."""
    G = jnp.einsum("mkc,fdmk->fdmc", grads, phi[:, :, 0][:, :, tets],
                   precision=_HP)                    # (F, D, M, 3)
    H = jnp.einsum("mkc,fdmk->fdmc", grads, phi[:, :, 1][:, :, tets],
                   precision=_HP)
    gv = vol.astype(jnp.float64)
    w = onehot.astype(jnp.float64)
    Jr = -(jnp.einsum("flmc,fkmc,m,mb->flkb", G, G, gv, w,
                      precision=_HP)
           - jnp.einsum("flmc,fkmc,m,mb->flkb", H, H, gv, w,
                        precision=_HP))
    Ji = -(jnp.einsum("flmc,fkmc,m,mb->flkb", G, H, gv, w,
                      precision=_HP)
           + jnp.einsum("flmc,fkmc,m,mb->flkb", H, G, gv, w,
                        precision=_HP))
    return Jr, Ji


def eit_jacobians_eqs(case, weights, z_contact_f, out, *,
                      n_bodies=None):
    """stencil_eit_jacobians_eqs on the ELEMENT path (imported
    meshes): complex dZ/dkappa_b from per-element gradient bilinears,
    complex dZ/dz_m from the shared surface moments.  out:
    cem_eqs_transfer_matrix(...) result."""
    phi = jnp.asarray(out["phi"], jnp.float64)       # (F, D, 2, N)
    if n_bodies is None:
        n_bodies = int(case.sigma_table.shape[0])
    onehot = (case.tet_body[:, None]
              == jnp.arange(n_bodies)[None, :])      # (M, B)
    Jr, Ji = _eqs_case_vol_core(case.tets, case.grads, case.vol,
                                onehot, phi)
    J_kappa = np.asarray(Jr) + 1j * np.asarray(Ji)   # (F, D, D, B)

    zf = np.asarray(z_contact_f, np.complex128)
    U = out["U"][:, :, 0] + 1j * out["U"][:, :, 1]
    W = jnp.asarray(weights, jnp.float64)
    J_z = _contact_jacobian_complex(W, phi[:, :, 0], phi[:, :, 1], U,
                                    zf)
    return J_kappa, J_z


def eit_recover_spectral(scase, hier, Wg, present, freqs_hz, measured,
                         *, body_models, z_ser, q_cpe, alpha_cpe=0.8,
                         fit_q=True, ground=0, tol=1e-9, max_nfev=80,
                         n_tau_starts=1, verbose=False,
                         forward_fn=None, jacobian_fn=None):
    """Multifrequency (spectral / fd-) EIT on the stencil fast path:
    fit per-body Cole-Cole dispersion parameters AND per-contact CPE
    magnitudes to the measured complex transfer tensor.

    measured: (F, D, D) complex floating blocks of
    stencil_cem_eqs_transfer_matrix at freqs_hz (F,), ground matching
    the one pinned into `hier` by stencil_cem_setup.

    body_models: {body_id: dict(sigma_s, d_eps=0.0, tau=..,
    eps_inf=0.0, alpha=0.0)} — STARTING values; every listed body's
    sigma_s is fitted, and (d_eps, tau) too when d_eps > 0 (a single
    Cole-Cole pole per body; eps_inf and the pole alpha are held —
    they are rarely identifiable jointly with tau over a narrow band).
    Bodies not listed stay purely resistive at scase.sigma_table[b].

    Contacts are series-R + CPE: z_m(w) = z_ser[m] + 1/(q_cpe[m]
    (i w)^alpha_cpe).  z_ser (E,) and alpha_cpe are held; q_cpe is
    fitted on log scale for the electrodes in fit_q (True = all,
    False = none, or an index sequence).

    Every residual/Jacobian evaluation is ONE jitted (F x (E-1)) batch
    of certified complex CEM solves plus the analytic kappa-factored
    einsums (stencil_eit_jacobians_eqs); MINPACK-LM drives log
    parameters host-side.  WHY frequency: the static series degeneracy
    d/sigma_deep + z_back (eit_recover's caveat) is broken because the
    CPE moves ~w^-alpha while a resistive layer does not — the pad
    contact that single-frequency EIT must hold can be FITTED here
    (pinned by test).

    forward_fn(kr, ki, zf) -> transfer dict and jacobian_fn(zf, out) ->
    (J_kappa, J_z) inject a different discretization backend
    (eit_recover_spectral_case wires the element path for imported
    meshes); defaults are the stencil fast path.

    n_tau_starts: the tau axis is the MULTIMODAL one (classic
    Cole-Cole fitting pathology: from a start far off in tau, LM can
    kill the dispersion entirely — d_eps -> 0 with sigma_s and the
    CPEs absorbing the signal to a ~1e-6 plateau; measured on this
    very problem, where the truth point evaluates to 4e-29).  When
    > 1, the full LM reruns from tau starts scaled by log-spaced
    multipliers over +-1 decade (all dispersive bodies together) and
    the best final loss wins; a start that reaches the noiseless
    floor short-circuits the rest.

    Returns dict: body_models (fitted copies), q_cpe (E,),
    sigma_table (static limits written into the fitted bodies' slots),
    params (ordered (kind, index) list), loss_history, n_forward,
    converged, log_std, residual_rms.
    """
    from scipy.optimize import least_squares

    from pelvistim_fem_tpu.ops.cem import stencil_cem_eqs_transfer_matrix
    from pelvistim_fem_tpu.ops.eqs import EPS0, cole_cole_kappa

    if forward_fn is None:
        def forward_fn(kr, ki, zf):
            return stencil_cem_eqs_transfer_matrix(
                scase, hier, Wg, present, zf, ki_tables=ki,
                kr_tables=kr, ground=ground, tol=tol)
    if jacobian_fn is None:
        def jacobian_fn(zf, out):
            return stencil_eit_jacobians_eqs(scase, Wg, zf, out)

    freqs = np.asarray(freqs_hz, np.float64)
    w = 2 * np.pi * freqs
    F = freqs.shape[0]
    M = np.asarray(measured, np.complex128)
    base = np.asarray(scase.sigma_table, np.float64)
    E = Wg.shape[0]
    zs = np.asarray(z_ser, np.float64)
    q0 = np.asarray(q_cpe, np.float64)
    models = {b: dict(m) for b, m in body_models.items()}
    for m in models.values():
        m.setdefault("d_eps", 0.0)
        m.setdefault("tau", 1e-5)
        m.setdefault("eps_inf", 0.0)
        m.setdefault("alpha", 0.0)

    params = []                       # ordered (kind, id)
    for b in sorted(models):
        params.append(("sigma_s", b))
        if models[b]["d_eps"] > 0:
            params.append(("d_eps", b))
            params.append(("tau", b))
    if fit_q is True:
        qidx = list(range(E))
    elif fit_q is False:
        qidx = []
    else:
        qidx = list(fit_q)
    params += [("q", m) for m in qidx]

    def unpack(p):
        mods = {b: dict(m) for b, m in models.items()}
        q = q0.copy()
        # clip: LM trial steps can wander far enough to overflow exp;
        # the unconverged-solve guard then steers the trust region back
        for v, (kind, idx) in zip(np.exp(np.clip(p, -60, 60)), params):
            if kind == "q":
                q[idx] = v
            else:
                mods[idx][kind] = v
        return mods, q

    def tables(mods, q):
        kr = np.tile(base, (F, 1))
        ki = np.zeros_like(kr)
        for b, m in mods.items():
            poles = ([(m["d_eps"], m["tau"], m["alpha"])]
                     if m["d_eps"] > 0 else [])
            kap = cole_cole_kappa(freqs, m["sigma_s"], m["eps_inf"],
                                  poles)
            kr[:, b], ki[:, b] = kap.real, kap.imag
        zf = zs[None, :] + 1.0 / (q[None, :]
                                  * (1j * w[:, None]) ** alpha_cpe)
        return kr, ki, zf

    denom = float(np.sum(M.real ** 2) + np.sum(M.imag ** 2))
    state = {"n_forward": 0, "bad": False, "history": []}
    cache = {}

    def forward(p):
        key = p.tobytes()
        if key not in cache:
            mods, q = unpack(p)
            kr, ki, zf = tables(mods, q)
            out = forward_fn(kr, ki, zf)
            state["n_forward"] += F
            cache.clear()             # keep exactly the current iterate
            cache[key] = out
        return cache[key]

    def _blocks(out):
        d = out["drives"]
        return out["Z"][:, d][:, :, d]            # (F, D, D)

    def resid(p):
        out = forward(p)
        if not out["converged"].all():
            state["bad"] = True
            return np.full(2 * M.size, 10.0 * np.sqrt(denom))
        r = (_blocks(out) - M).ravel()
        rr = np.concatenate([r.real, r.imag])
        loss = float(rr @ rr) / denom
        state["history"].append(loss)
        if verbose:
            print(f"  [eit-f] eval {state['n_forward'] // F:3d} "
                  f"loss {loss:.3e}")
        return rr

    def jac(p):
        out = forward(p)
        mods, q = unpack(p)
        _, _, zf = tables(mods, q)
        J_kap, J_z = jacobian_fn(zf, out)
        cols = []
        for kind, idx in params:
            if kind == "q":
                # dz/dlog q = -(z - z_ser) = -1/(q (i w)^alpha)
                dz = -(zf[:, idx] - zs[idx])          # (F,)
                cols.append(J_z[:, :, :, idx] * dz[:, None, None])
                continue
            m = mods[idx]
            s = (1j * w * m["tau"]) ** (1.0 - m["alpha"])
            if kind == "sigma_s":
                c = np.full(F, m["sigma_s"], np.complex128)
            elif kind == "d_eps":
                c = 1j * w * EPS0 * m["d_eps"] / (1.0 + s)
            else:                                     # tau
                c = (-1j * w * EPS0 * m["d_eps"]
                     * (1.0 - m["alpha"]) * s / (1.0 + s) ** 2)
            cols.append(J_kap[:, :, :, idx] * c[:, None, None])
        Jc = np.stack([c.ravel() for c in cols], axis=1)  # (FDD, P)
        return np.concatenate([Jc.real, Jc.imag])

    p0 = np.log(np.array(
        [q0[i] if k == "q" else models[i][k] for k, i in params]))
    tau_slots = np.array([k == "tau" for k, _ in params])
    mults = (np.logspace(-1.0, 1.0, n_tau_starts)
             if n_tau_starts > 1 and tau_slots.any() else np.ones(1))
    mults = mults[np.argsort(np.abs(np.log(mults)))]  # caller's start 1st
    res, res_bad = None, False
    for mult in mults:
        pk = p0 + np.log(mult) * tau_slots
        state["bad"] = False
        rk = least_squares(resid, pk, jac=jac, method="lm",
                           xtol=1e-15, ftol=1e-15, gtol=1e-14,
                           max_nfev=max_nfev)
        if res is None or rk.cost < res.cost:
            res, res_bad = rk, state["bad"]
        if 2.0 * res.cost / denom <= 1e-14:
            break
    state["bad"] = res_bad
    Jf = jac(res.x)
    rms = np.sqrt(2.0 * res.cost / max(Jf.shape[0], 1))
    try:
        cov = np.linalg.inv(Jf.T @ Jf)
        log_std = rms * np.sqrt(np.maximum(np.diag(cov), 0.0))
    except np.linalg.LinAlgError:
        log_std = np.full(Jf.shape[1], np.inf)
    mods, q = unpack(res.x)
    tab = base.copy()
    for b, m in mods.items():
        tab[b] = m["sigma_s"]
    final_loss = 2.0 * res.cost / denom
    state["history"].append(final_loss)
    converged = bool(res.status > 0) and not state["bad"] or \
        final_loss <= 1e-14
    return {"body_models": mods, "q_cpe": q, "sigma_table": tab,
            "params": params, "loss_history": state["history"],
            "n_forward": state["n_forward"], "converged": converged,
            "log_std": log_std, "residual_rms": float(rms)}


def eit_recover_spectral_case(case, weights, freqs_hz, measured, *,
                              amg=None, ground=0, tol=1e-9, **kw):
    """eit_recover_spectral on the ELEMENT path: spectral EIT for
    imported .msh/Elmer-DB/VTU meshes — every forward one jitted
    (F x (E-1)) batch of certified complex element-path CEM solves
    (cem.cem_eqs_transfer_matrix, optional build_cem_amg
    preconditioner) and Jacobians from the per-element gradient
    bilinears (eit_jacobians_eqs)."""
    from pelvistim_fem_tpu.ops.cem import cem_eqs_transfer_matrix

    def fwd(kr, ki, zf):
        return cem_eqs_transfer_matrix(
            case, weights, zf, ki_tables=ki, kr_tables=kr,
            ground=ground, amg=amg, tol=tol)

    def jac(zf, out):
        return eit_jacobians_eqs(case, weights, zf, out)

    return eit_recover_spectral(case, None, np.asarray(weights), None,
                                freqs_hz, measured, ground=ground,
                                tol=tol, forward_fn=fwd,
                                jacobian_fn=jac, **kw)

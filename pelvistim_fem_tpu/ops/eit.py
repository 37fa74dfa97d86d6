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
           "eit_recover_stencil"]

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

"""Conductivity calibration — the inverse problem the adjoint unlocks.

The reference's workflow treats tissue conductivities as literature
constants (step03_ankle_layers/params.yaml sigma block) and quantifies
their influence by brute-force sweeps (step04's 15-point sigma_contact
sweep, run_pressure_sweep.py:709-738).  With the differentiable solve
(ops/adjoint.py) the framework can instead FIT conductivities to
measurements — e.g. electrode impedance + surface potentials from a
fitting session — at one forward + one adjoint MG-CG solve per
optimizer step, independent of the number of unknowns.

Optimization runs on log-sigma (positivity + scale-free steps across
the 7000x physiological contrast) with Adam, the whole loop jitted as
one lax.scan over steps: the TPU executes N steps without host
round-trips."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from pelvistim_fem_tpu.ops.adjoint import solve_stencil_mg_diff


@partial(jax.jit, static_argnames=("bodies", "steps", "lr", "tol",
                                   "maxiter"))
def calibrate_sigma(scase, hier, obs_idx, obs_phi, bodies: tuple,
                    sigma0=None, *, steps=120, lr=0.08, tol=1e-8,
                    maxiter=2_000):
    """Recover sigma_table[bodies] from potential measurements.

    obs_idx  (M,) int32 — mesh node indices of the observations
    obs_phi  (M,)       — measured potentials there
    bodies   tuple of sigma_table slots to fit (static)
    sigma0   (len(bodies),) starting guess; defaults to the table values

    Returns (sigma_table_fit, loss_history) where loss is the
    measurement-normalized MSE  sum((phi-obs)^2)/sum(obs^2).

    Requires f64 (the refined-solver honesty rule applies doubly here:
    gradients inherit the solve tolerance)."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("calibrate_sigma")
    base = scase.sigma_table.astype(jnp.float64)
    bidx = jnp.asarray(bodies, jnp.int32)
    start = base[bidx] if sigma0 is None else \
        jnp.asarray(sigma0, jnp.float64)
    denom = jnp.sum(obs_phi * obs_phi)

    def loss_fn(logsig):
        sig = base.at[bidx].set(jnp.exp(logsig))
        phi = solve_stencil_mg_diff(scase, hier, sig, tol=tol,
                                    maxiter=maxiter)
        r = phi[obs_idx] - obs_phi
        return jnp.sum(r * r) / denom

    opt = optax.adam(lr)
    p0 = jnp.log(start)

    def step(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, st = opt.update(g, st, p)
        return (optax.apply_updates(p, upd), st), loss

    (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), None,
                                  length=steps)
    return base.at[bidx].set(jnp.exp(p)), losses


def _spd_solve_small(A, b):
    """Unrolled Cholesky solve for a tiny static-P SPD system.  The TPU
    backend has no f64 LuDecomposition (jnp.linalg.solve fails to
    compile), but P is the number of FITTED conductivities (<=
    a handful), so an unrolled elementwise factorization is free and
    fully portable."""
    n = A.shape[0]
    L = jnp.zeros_like(A)
    for j in range(n):
        d = jnp.sqrt(A[j, j] - jnp.sum(L[j, :j] ** 2))
        L = L.at[j, j].set(d)
        for i in range(j + 1, n):
            L = L.at[i, j].set(
                (A[i, j] - jnp.sum(L[i, :j] * L[j, :j])) / d)
    y = jnp.zeros_like(b)
    for i in range(n):
        y = y.at[i].set((b[i] - jnp.sum(L[i, :i] * y[:i])) / L[i, i])
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        x = x.at[i].set(
            (y[i] - jnp.sum(L[i + 1:, i] * x[i + 1:])) / L[i, i])
    return x


@partial(jax.jit, static_argnames=("bodies", "iters", "tol", "maxiter"))
def calibrate_sigma_lm(scase, hier, obs_idx, obs_phi, bodies: tuple,
                       sigma0=None, *, iters=15, tol=1e-8,
                       maxiter=2_000, lam0=1e-2):
    """Levenberg-Marquardt variant of calibrate_sigma — the right tool
    when fitting a HANDFUL of conductivities: the tissue parameters are
    strongly correlated through the layered geometry (muscle sits
    behind fat/skin screening), so first-order steps crawl along the
    curved valley where Gauss-Newton jumps it (measured on the step04
    coarse case: loss 2e-5 after 400 Adam steps vs <1e-20 after ~10 LM
    iterations).

    Per iteration: ONE primal solve (jax.linearize through the
    implicit-diff solve), ONE vmapped tangent solve for all P Jacobian
    columns at once, and ONE trial solve for the damped accept/reject
    update — so cost stays ~3 solves/iter independent of P.  The whole
    loop is a lax.scan on device.

    Returns (sigma_table_fit, loss_history) like calibrate_sigma."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("calibrate_sigma_lm")
    base = scase.sigma_table.astype(jnp.float64)
    bidx = jnp.asarray(bodies, jnp.int32)
    P = len(bodies)
    start = base[bidx] if sigma0 is None else \
        jnp.asarray(sigma0, jnp.float64)
    scale = jnp.sqrt(jnp.sum(obs_phi * obs_phi))

    def resid(logsig):
        sig = base.at[bidx].set(jnp.exp(logsig))
        phi = solve_stencil_mg_diff(scase, hier, sig, tol=tol,
                                    maxiter=maxiter)
        return (phi[obs_idx] - obs_phi) / scale

    def step(carry, _):
        p, lam, l = carry
        r, jvp = jax.linearize(resid, p)
        J = jax.vmap(jvp)(jnp.eye(P, dtype=p.dtype))      # (P, M)
        hi = jax.lax.Precision.HIGHEST
        A = jnp.einsum("pm,qm->pq", J, J, precision=hi)   # (P, P)
        g = jnp.einsum("pm,m->p", J, r, precision=hi)
        dp = -_spd_solve_small(
            A + lam * jnp.diag(jnp.diag(A) + 1e-30), g)
        p_try = p + dp
        r_try = resid(p_try)
        l_try = jnp.sum(r_try * r_try)
        better = l_try < l
        return (jnp.where(better, p_try, p),
                jnp.where(better, lam / 3.0, lam * 4.0),
                jnp.where(better, l_try, l)), \
            jnp.where(better, l_try, l)

    p0 = jnp.log(start)
    r0 = resid(p0)
    l0 = jnp.sum(r0 * r0)
    (p, _, _), losses = jax.lax.scan(
        step, (p0, jnp.float64(lam0), l0), None, length=iters)
    return base.at[bidx].set(jnp.exp(p)), losses


@partial(jax.jit, static_argnames=("bodies", "alpha", "eps_inf",
                                   "iters", "tol", "maxiter"))
def calibrate_contact_dispersion(scase, hier, freqs_hz, Z_meas, w_act,
                                 w_ret, bodies: tuple, x0, *,
                                 alpha=0.0, eps_inf=1.0e3, iters=12,
                                 tol=1e-10, maxiter=4_000):
    """Bioimpedance-spectroscopy inverse problem: fit the contact
    layer's Cole-Cole parameters (sigma_s, d_eps, tau) to a MEASURED
    complex impedance spectrum Z(f) — the fit electrode-impedance
    hardware performs, now through the full 3-D field model instead of
    a lumped circuit.  Rides the differentiable complex solve
    (ops/eqs.solve_stencil_eqs_diff): each Levenberg-Marquardt
    iteration costs one primal + three tangent + one trial spectrum,
    every spectrum one vmapped batch of certified-path COCG solves.

    freqs_hz (W,); Z_meas (W, 2) re/im [ohm]; w_act/w_ret (N,)
    electrode averaging weights; bodies: sigma-table slots carrying the
    contact; x0 = (sigma_s, d_eps, tau) starting guess; alpha: fixed
    Cole-Cole broadening (0 = Debye).  Returns
    ((sigma_s, d_eps, tau) fit, loss history)."""
    from pelvistim_fem_tpu.ops.eqs import EPS0, solve_stencil_eqs_diff
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("calibrate_contact_dispersion")
    w = 2.0 * jnp.pi * jnp.asarray(freqs_hz, jnp.float64)
    Z_meas = jnp.asarray(Z_meas, jnp.float64)
    scale = jnp.sqrt(jnp.sum(Z_meas * Z_meas, axis=1))   # (W,) |Z|
    base = scase.sigma_table.astype(jnp.float64)
    bidx = jnp.asarray(bodies, jnp.int32)
    I = jnp.sum(scase.b_neumann.astype(jnp.float64))
    w_a = jnp.asarray(w_act, jnp.float64)
    w_r = jnp.asarray(w_ret, jnp.float64)
    hp = jax.lax.Precision.HIGHEST

    def kappa(p):
        """(W, 2) re/im contact admittivity from log-params."""
        sigma_s, d_eps, tau = jnp.exp(p[0]), jnp.exp(p[1]), jnp.exp(p[2])
        # (i w tau)^(1-alpha) decomposed in re/im (differentiable in tau)
        mag = (w * tau) ** (1.0 - alpha)
        th = (1.0 - alpha) * jnp.pi / 2.0
        dr, di = 1.0 + mag * jnp.cos(th), mag * jnp.sin(th)
        den = dr * dr + di * di
        eps_re = eps_inf + d_eps * dr / den
        eps_im = -d_eps * di / den
        # kappa = sigma_s + i w eps0 (eps_re + i eps_im)
        return (sigma_s - w * EPS0 * eps_im,
                w * EPS0 * eps_re)

    def resid(p):
        kre, kim = kappa(p)

        def one(kr_c, ki_c):
            kr = base.at[bidx].set(kr_c)
            ki = jnp.zeros_like(base).at[bidx].set(ki_c)
            phi = solve_stencil_eqs_diff(scase, hier, ki, kr, tol=tol,
                                         maxiter=maxiter)
            V = (jnp.einsum("cn,n->c", phi, w_a, precision=hp)
                 - jnp.einsum("cn,n->c", phi, w_r, precision=hp))
            return V / I

        Z = jax.vmap(one)(kre, kim)                     # (W, 2)
        return ((Z - Z_meas) / scale[:, None]).reshape(-1)

    def step(carry, _):
        p, lam, l = carry
        r, jvp = jax.linearize(resid, p)
        J = jax.vmap(jvp)(jnp.eye(3, dtype=p.dtype))    # (3, 2W)
        A = jnp.einsum("pm,qm->pq", J, J, precision=hp)
        g = jnp.einsum("pm,m->p", J, r, precision=hp)
        dp = -_spd_solve_small(
            A + lam * jnp.diag(jnp.diag(A) + 1e-30), g)
        p_try = p + dp
        r_try = resid(p_try)
        l_try = jnp.sum(r_try * r_try)
        better = l_try < l
        return (jnp.where(better, p_try, p),
                jnp.where(better, lam / 3.0, lam * 4.0),
                jnp.where(better, l_try, l)), \
            jnp.where(better, l_try, l)

    p0 = jnp.log(jnp.asarray(x0, jnp.float64))
    l0 = jnp.sum(resid(p0) ** 2)
    (p, _, _), losses = jax.lax.scan(
        step, (p0, jnp.float64(1e-2), l0), None, length=iters)
    return jnp.exp(p), losses

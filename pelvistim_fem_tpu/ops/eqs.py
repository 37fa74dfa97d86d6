"""Frequency-domain electro-quasistatic (EQS) solves: impedance spectra.

The reference models electrode-skin contact as a purely RESISTIVE layer
and probes it by sweeping a real sigma_contact (step04
run_pressure_sweep.py:55-215) — a static surrogate for what is
physically a capacitive interface.  The frequency-domain problem

    div((sigma + i omega eps0 epsr) grad phi) = 0

keeps the SAME body-factored stencils: K(omega) = sum_b kappa_b(omega)
C_b with kappa_b = sigma_b + i omega eps0 epsr_b and REAL C_b, so a
frequency sweep is — exactly like a conductivity sweep — a batch over
material tables with ZERO re-assembly.  Output: complex potentials,
electrode impedance spectra Z(omega) (magnitude + phase), the quantity
electrode impedance spectroscopy actually measures.

Numerics: K is complex SYMMETRIC (not Hermitian; K^T = K since each
C_b is symmetric), so CG does not apply.  We use COCG (van der Vorst &
Melissen 1990): the CG recurrence with the UNCONJUGATED bilinear form
<x, y> = sum x_k y_k, which exploits K^T = K the way CG exploits
K^H = K.  Fields are stacked real/imag (2, X, Y, Z) f32/f64 arrays —
TPUs have no native complex arithmetic worth routing through — and the
preconditioner is the existing REAL multigrid V-cycle on the
sigma-combined operator applied to each component (Ki is a
perturbation of order omega*eps/sigma, modest at tissue frequencies).
Residual honesty matches the rest of the framework: f32 inner COCG
sweeps + f64 residual correction against the f64 master operator; the
reported residual is the TRUE complex one.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pelvistim_fem_tpu.ops.multigrid import MGHierarchy, make_v_cycle
from pelvistim_fem_tpu.ops.solve import require_x64
from pelvistim_fem_tpu.ops.stencil import (StencilCase, combine_coeffs,
                                           stencil_spmv)

EPS0 = 8.8541878128e-12     # vacuum permittivity [F/m]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EQSResult:
    phi: jax.Array          # (2, N) real/imag potential, node ordering
    iterations: jax.Array   # scalar i32 — total inner COCG iterations
    residual: jax.Array     # scalar — final TRUE ||b - K x|| / ||b||
    converged: jax.Array    # scalar bool


def admittivity_imag_table(epsr_table, omega):
    """(T,) imaginary admittivity table ki = omega * eps0 * epsr."""
    return omega * EPS0 * jnp.asarray(epsr_table)


def cole_cole_kappa(freqs_hz, sigma_s, eps_inf, poles):
    """Complex admittivity kappa(f) of a Cole-Cole dispersive tissue.

    The standard bioimpedance model (Cole & Cole 1941; the form Gabriel
    et al. 1996 fit to every human tissue):

        eps*(w) = eps_inf + sum_k d_eps_k / (1 + (i w tau_k)^(1-a_k))
        kappa(w) = sigma_s + i w eps0 eps*(w)

    sigma_s: static (ionic) conductivity [S/m]; eps_inf: infinite-
    frequency relative permittivity; poles: iterable of
    (d_eps, tau_s, alpha) dispersion terms.  Returns (W,) complex128
    (host-side numpy — tables are tiny; the solver consumes
    re/im splits).  alpha = 0 reduces each pole to a Debye relaxation.
    """
    w = 2 * np.pi * np.asarray(freqs_hz, np.float64)
    eps = np.full(w.shape, eps_inf, np.complex128)
    for d_eps, tau, alpha in poles:
        if not 0.0 <= alpha < 1.0:
            raise ValueError(f"Cole-Cole alpha must be in [0, 1): {alpha}")
        eps = eps + d_eps / (1.0 + (1j * w * tau) ** (1.0 - alpha))
    return sigma_s + 1j * w * EPS0 * eps


class KappaTables(NamedTuple):
    """Per-frequency admittivity tables.  NOTE the solver APIs
    (batched_eqs_solve_refined, impedance_spectrum_tables) take ki
    FIRST (kr is optional, defaulting to the static sigma table) —
    unpack by NAME to avoid swapping: `t = dispersive_tables(...);
    solve(..., t.ki, t.kr)`."""
    kr: object   # (W, T) real part, sigma_eff(omega)
    ki: object   # (W, T) imaginary part, omega eps0 epsr_eff(omega)


def dispersive_tables(freqs_hz, base_sigma_table, dispersion_by_body):
    """KappaTables(kr (W, T), ki (W, T)) per-frequency admittivity.

    dispersion_by_body: {body_id: (sigma_s, eps_inf, poles)} — bodies
    not listed stay purely resistive at base_sigma_table[b].  Feed the
    result to batched_eqs_solve_refined / sharded_eqs_solve_refined as
    (ki_tables, kr_tables): a DISPERSIVE spectrum is still just a
    per-frequency material-table batch on one assembled operator.
    """
    base = np.asarray(base_sigma_table, np.float64)
    W = len(np.asarray(freqs_hz))
    kr = np.tile(base, (W, 1))
    ki = np.zeros_like(kr)
    for b, (sigma_s, eps_inf, poles) in dispersion_by_body.items():
        kap = cole_cole_kappa(freqs_hz, sigma_s, eps_inf, poles)
        kr[:, b] = kap.real
        ki[:, b] = kap.imag
    if np.any(kr[:, 1:] <= 0):      # index 0 is the unused slot
        raise ValueError("dispersive Re(kappa) must stay positive "
                         "(COCG needs an SPD real part)")
    return KappaTables(jnp.asarray(kr), jnp.asarray(ki))


# ── complex helpers on stacked (2, ...) arrays ───────────────────────────────

def _cmul(a, b):
    return jnp.stack([a[0] * b[0] - a[1] * b[1],
                      a[0] * b[1] + a[1] * b[0]])


def _cdiv(a, b):
    """Smith's scaled complex division.  The naive form divides by
    br^2 + bi^2, which UNDERFLOWS f32 once |b| < ~1e-19 (squaring halves
    the exponent range) — exactly the magnitude CG scalars reach in late
    refinement passes, turning a healthy iteration into 0/0 = NaN
    (measured: pass 3 of the zero-frequency solve).  Scaling by the
    larger component keeps every intermediate within f32 range whenever
    a/b itself is representable."""
    ar, ai, br, bi = a[0], a[1], b[0], b[1]
    big = jnp.abs(br) >= jnp.abs(bi)
    u = jnp.where(big, br, bi)
    t = jnp.where(big, bi, br) / u
    den = u * (1.0 + t * t)
    re = jnp.where(big, ar + ai * t, ar * t + ai) / den
    im = jnp.where(big, ai - ar * t, ai * t - ar) / den
    return jnp.stack([re, im])


def _csax(a, z):
    """Complex scalar (2,) times complex field (2, ...)."""
    return jnp.stack([a[0] * z[0] - a[1] * z[1],
                      a[0] * z[1] + a[1] * z[0]])


def _bdot(z1, z2):
    """UNCONJUGATED bilinear form sum(z1 * z2) -> complex scalar (2,)."""
    return jnp.stack([jnp.sum(z1[0] * z2[0] - z1[1] * z2[1]),
                      jnp.sum(z1[0] * z2[1] + z1[1] * z2[0])])


def _hnorm(z):
    """Hermitian (physical) norm sqrt(sum |z_k|^2)."""
    return jnp.sqrt(jnp.sum(z * z))


def _eqs_operator(scase: StencilCase, kr_table, ki_table):
    """(op on (2,X,Y,Z), b_eff (2,X,Y,Z)) for the masked complex system.

    Fixed (Dirichlet) rows are identity on BOTH components; the drive
    (dirichlet values, Neumann load) is real, so b = (b_r, -Ki phi_d)
    after the standard lift."""
    Cr = combine_coeffs(scase.coeff, kr_table)
    Ci = combine_coeffs(scase.coeff, ki_table)
    free = scase.free

    def raw(x2):
        xr, xi = x2[0], x2[1]
        return jnp.stack([stencil_spmv(xr, Cr) - stencil_spmv(xi, Ci),
                          stencil_spmv(xr, Ci) + stencil_spmv(xi, Cr)])

    def op(x2):
        z = jnp.where(free[None], x2, 0.0)
        return jnp.where(free[None], raw(z), x2)

    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    lift = raw(jnp.stack([phi_d, jnp.zeros_like(phi_d)]))
    b_eff = jnp.stack([
        jnp.where(free, scase.b_neumann - lift[0], scase.dirichlet),
        jnp.where(free, -lift[1], 0.0)])
    return op, b_eff


def _cocg(op, b, M, x0, *, tol, maxiter):
    """Preconditioned COCG on stacked (2, ...) fields.

    M: real symmetric preconditioner applied per component.  Converges
    on the Hermitian residual norm relative to ||b||; `tol` semantics
    match preconditioned_cg.  Returns (x, iterations, rel_residual).
    """
    nrm_b = _hnorm(b)
    tol_abs = tol * nrm_b

    r0 = b - op(x0)
    z0 = M(r0)
    rz0 = _bdot(r0, z0)
    state0 = (x0, r0, z0, rz0, z0, jnp.int32(0),
              _hnorm(r0) <= tol_abs)

    def cond(state):
        *_, k, done = state
        return jnp.logical_not(done) & (k < maxiter)

    def body(state):
        x, r, z, rz, p, k, done = state
        ap = op(p)
        alpha = _cdiv(rz, _bdot(p, ap))
        x_n = x + _csax(alpha, p)
        r_n = r - _csax(alpha, ap)
        z_n = M(r_n)
        rz_n = _bdot(r_n, z_n)
        beta = _cdiv(rz_n, rz)
        p_n = z_n + _csax(beta, p)
        sel = lambda new, old: jnp.where(done, old, new)
        x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
        rz, p, k = sel(rz_n, rz), sel(p_n, p), sel(k + 1, k)
        done = done | (_hnorm(r) <= tol_abs)
        return (x, r, z, rz, p, k, done)

    x, r, *_, k, _ = lax.while_loop(cond, body, state0)
    rel = _hnorm(r) / jnp.where(nrm_b > 0, nrm_b, 1.0)
    return x, k, rel


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "max_refinements"))
def solve_stencil_eqs_refined(scase: StencilCase, hier: MGHierarchy,
                              ki_table, kr_table=None, *, tol=1e-8,
                              inner_tol=3e-4, maxiter=2_000, nu=2,
                              coarse_iters=24,
                              max_refinements=8) -> EQSResult:
    """Certified complex solve: f32 COCG inner sweeps preconditioned by
    the REAL sigma V-cycle, f64 residual correction against the f64
    master K = Kr + i Ki.  Same honesty contract as
    solve_stencil_mg_refined: the returned residual IS the true one.

    ki_table: (T,) imaginary admittivities (omega * eps0 * epsr, see
    admittivity_imag_table); kr_table defaults to scase.sigma_table.
    """
    require_x64("solve_stencil_eqs_refined")
    kr = scase.sigma_table if kr_table is None else kr_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    sc64, sc32 = to(scase, jnp.float64), to(scase, jnp.float32)
    hier32 = to(hier, jnp.float32)
    kr64, ki64 = kr.astype(jnp.float64), ki_table.astype(jnp.float64)
    kr32, ki32 = kr.astype(jnp.float32), ki_table.astype(jnp.float32)

    op64, b64 = _eqs_operator(sc64, kr64, ki64)
    op32, _ = _eqs_operator(sc32, kr32, ki32)
    M32 = make_v_cycle(hier32, kr32, nu=nu, coarse_iters=coarse_iters)
    free = scase.free

    def Mp(r2):
        zr = jnp.where(free, M32(jnp.where(free, r2[0], 0.0)), r2[0])
        zi = jnp.where(free, M32(jnp.where(free, r2[1], 0.0)), r2[1])
        return jnp.stack([zr, zi])

    bnorm = _hnorm(b64)
    x = jnp.stack([jnp.where(free, 0.0, sc64.dirichlet),
                   jnp.zeros_like(sc64.dirichlet)])

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
    phi = x.reshape(2, -1)[:, scase.grid_index]
    return EQSResult(phi=phi, iterations=total_it, residual=rel,
                     converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "coarse_iters", "max_refinements"))
def batched_eqs_solve_refined(scase: StencilCase, hier: MGHierarchy,
                              ki_tables, kr_tables=None, *, tol=1e-8,
                              inner_tol=3e-4, maxiter=2_000, nu=2,
                              coarse_iters=24, max_refinements=8):
    """Frequency sweep as ONE vmapped certified batch over (W, T)
    imaginary-admittivity tables (and optionally per-lane real tables) —
    the EQS twin of batched_mg_solve_refined, zero re-assembly."""
    if kr_tables is None:
        one = lambda ki: solve_stencil_eqs_refined(
            scase, hier, ki, tol=tol, inner_tol=inner_tol,
            maxiter=maxiter, nu=nu, coarse_iters=coarse_iters,
            max_refinements=max_refinements)
        return jax.vmap(one)(ki_tables)
    one = lambda ki, kr: solve_stencil_eqs_refined(
        scase, hier, ki, kr, tol=tol, inner_tol=inner_tol,
        maxiter=maxiter, nu=nu, coarse_iters=coarse_iters,
        max_refinements=max_refinements)
    return jax.vmap(one)(ki_tables, kr_tables)


@partial(jax.jit, static_argnames=("tol", "maxiter", "nu",
                                   "coarse_iters"))
def solve_stencil_eqs_diff(scase: StencilCase, hier: MGHierarchy,
                           ki_table, kr_table=None, *, tol=1e-10,
                           maxiter=2_000, nu=2, coarse_iters=24):
    """(2, N) complex potential, DIFFERENTIABLE w.r.t. kr_table /
    ki_table (and the drives) — the EQS twin of
    adjoint.solve_stencil_mg_diff, unlocking spectrum-fitting inverse
    problems (bioimpedance spectroscopy: fit dispersion parameters to a
    measured Z(f)).

    K is complex symmetric, so the stacked real operator
    A = [[Kr, -Ki], [Ki, Kr]] is NOT symmetric (symmetric=True would be
    WRONG here): its transpose represents the CONJUGATE operator
    conj(K) = Kr - i Ki — itself complex symmetric, so the
    transpose_solve passed to `lax.custom_linear_solve` runs the same
    real-preconditioned COCG on the jax-transposed matvec.  The inner
    iterations are never differentiated; the preconditioner (real
    sigma V-cycle) sits behind stop_gradient."""
    kr = scase.sigma_table if kr_table is None else kr_table
    free = scase.free
    Cr = combine_coeffs(scase.coeff, kr)
    Ci = combine_coeffs(scase.coeff, ki_table)

    def raw(x2, Ci_):
        xr, xi = x2[0], x2[1]
        return jnp.stack(
            [stencil_spmv(xr, Cr) - stencil_spmv(xi, Ci_),
             stencil_spmv(xr, Ci_) + stencil_spmv(xi, Cr)])

    def matvec(x2):
        z = jnp.where(free[None], x2, 0.0)
        return jnp.where(free[None], raw(z, Ci), x2)

    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    lift = raw(jnp.stack([phi_d, jnp.zeros_like(phi_d)]), Ci)
    b_eff = jnp.stack([
        jnp.where(free, scase.b_neumann - lift[0], scase.dirichlet),
        jnp.where(free, -lift[1], 0.0)])

    M = make_v_cycle(jax.tree_util.tree_map(lax.stop_gradient, hier),
                     lax.stop_gradient(kr), nu=nu,
                     coarse_iters=coarse_iters)

    def Mp(r2):
        zr = jnp.where(free, M(jnp.where(free, r2[0], 0.0)), r2[0])
        zi = jnp.where(free, M(jnp.where(free, r2[1], 0.0)), r2[1])
        return jnp.stack([zr, zi])

    def solve_fn(mv, b):
        x, _, _ = _cocg(mv, b, Mp, jnp.where(free[None], 0.0, b),
                        tol=tol, maxiter=maxiter)
        return x

    def transpose_solve_fn(mv_t, b):
        x, _, _ = _cocg(mv_t, b, Mp, jnp.where(free[None], 0.0, b),
                        tol=tol, maxiter=maxiter)
        return x

    x = lax.custom_linear_solve(matvec, b_eff, solve_fn,
                                transpose_solve_fn)
    return x.reshape(2, -1)[:, scase.grid_index]


def _case_eqs_operator(case, kr_table, ki_table):
    """Element-path twin of _eqs_operator: masked complex operator and
    effective RHS on an arbitrary (imported) tet mesh.

    kr_table may be a (T,) scalar or (T, 3, 3) TENSOR table
    (ops/aniso.py — anisotropic muscle at frequency); ki_table may be
    either independently (assembly.spmv dispatches on sigvol rank)."""
    from pelvistim_fem_tpu.ops import assembly
    n = case.free_mask.shape[0]

    def _sigvol(table):
        s = table[case.tet_body]
        if s.ndim == 3:
            return s * case.vol[:, None, None]
        return s * case.vol

    sig_r = _sigvol(kr_table)
    sig_i = _sigvol(ki_table)

    def raw(x2):
        def mv(x, sv):
            return assembly.spmv(x, case.tets, case.grads, sv,
                                 case.scatter_perm, case.scatter_segids,
                                 n)
        xr, xi = x2[0], x2[1]
        return jnp.stack([mv(xr, sig_r) - mv(xi, sig_i),
                          mv(xr, sig_i) + mv(xi, sig_r)])

    free = case.free_mask

    def op(x2):
        z = jnp.where(free[None], x2, 0.0)
        return jnp.where(free[None], raw(z), x2)

    phi_d = jnp.where(free, 0.0, case.dirichlet_vals)
    lift = raw(jnp.stack([phi_d, jnp.zeros_like(phi_d)]))
    b_eff = jnp.stack([
        jnp.where(free, case.b_neumann - lift[0], case.dirichlet_vals),
        jnp.where(free, -lift[1], 0.0)])
    return op, b_eff


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter", "nu",
                                   "omega", "coarse_iters",
                                   "max_refinements"))
def solve_case_eqs_refined(case, ki_table, kr_table=None, amg=None, *,
                           tol=1e-8, inner_tol=3e-4, maxiter=5_000,
                           nu=2, omega=0.85, coarse_iters=24,
                           max_refinements=8) -> EQSResult:
    """Certified complex solve on the ELEMENT path — EQS for imported
    .msh/Elmer-DB/VTU meshes.  Pass `amg` (ops/amg.build_amg, built in
    f32 from the REAL sigma operator) for the performance-class
    preconditioner; without it a real-Jacobi COCG runs (fine for soft
    contrast / modest meshes)."""
    require_x64("solve_case_eqs_refined")
    kr = case.sigma_table if kr_table is None else kr_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    case64, case32 = to(case, jnp.float64), to(case, jnp.float32)
    kr64, ki64 = kr.astype(jnp.float64), ki_table.astype(jnp.float64)
    kr32, ki32 = kr.astype(jnp.float32), ki_table.astype(jnp.float32)

    op64, b64 = _case_eqs_operator(case64, kr64, ki64)
    op32, _ = _case_eqs_operator(case32, kr32, ki32)
    free = case.free_mask

    if amg is None:
        from pelvistim_fem_tpu.ops.solve import _case_operator
        _, diag32, _ = _case_operator(case32, kr32)
        minv = jnp.where(diag32 > 0, 1.0 / diag32,
                         jnp.asarray(1.0, jnp.float32))
        M32 = lambda r: minv * r
    else:
        from pelvistim_fem_tpu.ops.amg import (_fine_pieces, _lift_M,
                                               make_amg_preconditioner)
        amg32 = to(amg, jnp.float32)
        _, fine32, _ = _fine_pieces(case32, kr32, amg32)
        Mf = make_amg_preconditioner(amg32, fine32, nu=nu, omega=omega,
                                     coarse_iters=coarse_iters)
        M32 = _lift_M(Mf, amg32, free, case.free_mask.shape[0])

    def Mp(r2):
        zr = jnp.where(free, M32(jnp.where(free, r2[0], 0.0)), r2[0])
        zi = jnp.where(free, M32(jnp.where(free, r2[1], 0.0)), r2[1])
        return jnp.stack([zr, zi])

    bnorm = _hnorm(b64)
    x = jnp.stack([jnp.where(free, 0.0, case64.dirichlet_vals),
                   jnp.zeros_like(case64.dirichlet_vals)])

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
    return EQSResult(phi=x, iterations=total_it, residual=rel,
                     converged=rel <= tol)


def impedance_spectrum(scase: StencilCase, hier: MGHierarchy,
                       epsr_table, freqs_hz, *, w_act, w_ret,
                       sigma_table=None, I_inject_A=None, tol=1e-8,
                       **kw):
    """Electrode impedance spectrum Z(f) = V_hat / I of a
    current-driven case: one vmapped certified batch over frequencies.

    epsr_table: (T,) per-body relative permittivities (index 0 unused);
    w_act / w_ret: (N,) real averaging weights over the electrode node
    patches (each summing to 1); I_inject_A: injected current (defaults
    to sum(b_neumann), exact for current-mode cases).  Returns dict with
    Z (W, 2) real/imag, |Z|, phase, and the solve diagnostics.
    """
    omegas = 2.0 * np.pi * np.asarray(freqs_hz, np.float64)
    ki = jnp.asarray(omegas)[:, None] * (EPS0 * jnp.asarray(
        epsr_table, jnp.float64))[None, :]
    kr_tables = None
    if sigma_table is not None:
        kr_tables = jnp.tile(jnp.asarray(sigma_table, jnp.float64),
                             (len(omegas), 1))
    return impedance_spectrum_tables(scase, hier, ki, kr_tables,
                                     freqs_hz, w_act=w_act, w_ret=w_ret,
                                     I_inject_A=I_inject_A, tol=tol,
                                     **kw)


def impedance_spectrum_tables(scase: StencilCase, hier: MGHierarchy,
                              ki_tables, kr_tables, freqs_hz, *, w_act,
                              w_ret, I_inject_A=None, tol=1e-8, **kw):
    """impedance_spectrum's core on EXPLICIT per-frequency (kr, ki)
    tables — the entry point for DISPERSIVE tissue (dispersive_tables).
    Z is reduced on device (two weighted averages), so only (W, 2)
    scalars cross the tunnel — never the full potential field, and no
    device-bool readback (convergence derives from the residuals)."""
    out = batched_eqs_solve_refined(scase, hier, ki_tables, kr_tables,
                                    tol=tol, **kw)
    if I_inject_A is None:
        I_inject_A = float(jnp.sum(scase.b_neumann))
    w_a = jnp.asarray(w_act, out.phi.dtype)
    w_r = jnp.asarray(w_ret, out.phi.dtype)
    hp = jax.lax.Precision.HIGHEST     # TPU default contraction is bf16
    V = jnp.einsum("wcn,n->wc", out.phi, w_a, precision=hp) - jnp.einsum(
        "wcn,n->wc", out.phi, w_r, precision=hp)   # (W, 2) complex volts
    Z = np.asarray(V) / I_inject_A
    residual = np.asarray(out.residual)
    return {
        "freq_hz": np.asarray(freqs_hz, np.float64),
        "Z": Z,
        "Z_abs": np.hypot(Z[:, 0], Z[:, 1]),
        "Z_phase_deg": np.degrees(np.arctan2(Z[:, 1], Z[:, 0])),
        "iterations": np.asarray(out.iterations),
        "residual": residual,
        # derived host-side: never read a bool array back from an axon
        # device (documented minutes-long readback)
        "converged": residual <= tol,
    }

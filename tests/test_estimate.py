"""ZZ a-posteriori error estimation + adaptive lattice regrading.

The reference has no error estimation (resolution is a hand-picked
characteristic length, step03 params.yaml:67-70; its only mesh-quality
signal is the 2% flux-balance banner, run_layered_sweep.py:883-891).
These tests certify the capability the framework adds:

1. EFFECTIVITY: on a smooth manufactured harmonic (the
   test_convergence.py solution), the global ZZ estimate must track
   the TRUE energy error |u - u_h|_E to a few percent (measured
   1.010-1.016 across n=8..24, dev/estimate_measure.py) and converge
   at the P1 energy rate O(h).  The "true" error uses a degree-2
   quadrature of the exact continuous gradient — NOT the
   superconvergent discrete-nodal e^T K e, which is O(h^2) and 30-90x
   smaller (the first thing this test suite got wrong).
2. ADAPTIVITY: equidistributing the indicators (density
   (w/len^3)^(1/3) — the exponent matters, see adapt_axis docstring)
   beats a uniform axis AT THE SAME CELL COUNT on both energy and L2
   error.
3. LOCALIZATION: on an electrode problem the error mass sits at the
   patch rim (the field singularity), not the far field.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.estimate import (adapt_axis,
                                            lattice_axis_weights,
                                            zz_error_indicators,
                                            zz_global_error)
from pelvistim_fem_tpu.ops.solve import solve_case

L = 1.0
K = np.pi / L


def _exact(nodes):
    return np.sin(K * nodes[:, 0]) * np.sinh(K * nodes[:, 2])


def _exact_grad(p):
    return np.stack(
        [K * np.cos(K * p[..., 0]) * np.sinh(K * p[..., 2]),
         np.zeros(p.shape[:-1]),
         K * np.sin(K * p[..., 0]) * np.cosh(K * p[..., 2])], axis=-1)


def _mesh(xs, ys, zs):
    body = lambda cx, cy, cz: np.ones(cx.shape, np.int32)
    bcid = lambda fx, fy, fz, nx, ny, nz: np.full(fx.shape, 3, np.int32)
    return build_mesh_from_lattice(xs, ys, zs, body, bcid)


def _dirichlet_solve(mesh):
    case = build_case(mesh, {1: 1.0}, mode="voltage", dtype=jnp.float64)
    exact = _exact(np.asarray(mesh.nodes))
    bn = np.unique(np.asarray(mesh.faces))
    free = np.ones(mesh.n_nodes, bool)
    free[bn] = False
    dir_ = np.zeros(mesh.n_nodes)
    dir_[bn] = exact[bn]
    case = dataclasses.replace(
        case, free_mask=jnp.asarray(free),
        dirichlet_vals=jnp.asarray(dir_, jnp.float64),
        b_neumann=jnp.zeros(mesh.n_nodes, jnp.float64))
    res = solve_case(case, tol=1e-11, maxiter=40_000)
    assert bool(np.asarray(res.converged))
    return case, np.asarray(res.phi), exact


def _true_energy_error(case, mesh, phi):
    from pelvistim_fem_tpu.ops.fields import cell_gradient
    gh = np.asarray(cell_gradient(case, jnp.asarray(phi)))
    verts = np.asarray(mesh.nodes)[np.asarray(case.tets)]
    a, b = 0.5854101966249685, 0.13819660112501053
    lam = np.full((4, 4), b)
    np.fill_diagonal(lam, a)
    pts = np.einsum("qi,mid->mqd", lam, verts)
    d = _exact_grad(pts) - gh[:, None, :]
    vol = np.asarray(case.vol)
    return float(np.sqrt(np.sum(vol[:, None] / 4.0
                                * np.sum(d * d, axis=-1))))


def test_zz_effectivity_and_rate():
    """Effectivity within a few percent of 1 at both mesh sizes and
    O(h) convergence of the estimate (measured 1.016/1.013, rate
    0.995 — any recovery/quadrature bug lands far outside)."""
    etas, errs = [], []
    for n in (8, 16):
        xs = np.linspace(0, L, n + 1)
        mesh = _mesh(xs, xs, xs)
        case, phi, _ = _dirichlet_solve(mesh)
        eta_g, rel = (float(v) for v in
                      zz_global_error(case, jnp.asarray(phi)))
        err = _true_energy_error(case, mesh, phi)
        etas.append(eta_g)
        errs.append(err)
        assert 0.90 < eta_g / err < 1.12, (n, eta_g, err)
        assert 0 < rel < 1
    rate = np.log(etas[0] / etas[1]) / np.log(2.0)
    true_rate = np.log(errs[0] / errs[1]) / np.log(2.0)
    assert rate > 0.9, rate
    assert abs(rate - true_rate) < 0.1, (rate, true_rate)


def test_adapt_axis_beats_uniform_at_same_cost():
    """One estimate->equidistribute cycle on the z-axis must beat the
    uniform mesh at the SAME cell count on both error norms (measured
    1.16x energy, 3.0x nodal-L2)."""
    n = 12
    xs = np.linspace(0, L, n + 1)
    mesh0 = _mesh(xs, xs, xs)
    case0, phi0, ex0 = _dirichlet_solve(mesh0)
    eta0 = zz_error_indicators(case0, jnp.asarray(phi0))
    _, _, wz = lattice_axis_weights(case0, mesh0, (xs, xs, xs), eta0)
    # error mass must increase toward z = L (sinh curvature)
    assert np.all(np.diff(wz) > 0)

    zs = adapt_axis(xs, wz, n)
    assert len(zs) == n + 1                       # same cell count
    meshA = _mesh(xs, xs, zs)
    caseA, phiA, exA = _dirichlet_solve(meshA)

    eU = _true_energy_error(case0, mesh0, phi0)
    eA = _true_energy_error(caseA, meshA, phiA)
    l2U = np.linalg.norm(phi0 - ex0) / np.linalg.norm(ex0)
    l2A = np.linalg.norm(phiA - exA) / np.linalg.norm(exA)
    assert eA < 0.93 * eU, (eA, eU)
    assert l2A < 0.5 * l2U, (l2A, l2U)
    # and the estimator agrees with the true improvement direction
    etaA = float(zz_global_error(caseA, jnp.asarray(phiA))[0])
    eta0g = float(zz_global_error(case0, jnp.asarray(phi0))[0])
    assert etaA < eta0g


def test_adapt_axis_contract():
    """Kept knots survive verbatim, cell count is exact, knots are
    strictly monotone, h_min is honored."""
    xs = np.linspace(0, 1, 11)
    w = np.linspace(0.1, 2.0, 10) ** 2
    out = adapt_axis(xs, w, 14, keep=(0.3, 0.7))
    assert len(out) == 15
    assert np.all(np.diff(out) > 0)
    for kp in (0.0, 0.3, 0.7, 1.0):
        assert np.any(np.abs(out - kp) < 1e-12), kp
    out2 = adapt_axis(xs, w, 14, h_min=0.04)
    assert np.diff(out2).min() >= 0.04 - 1e-12
    with pytest.raises(ValueError):
        adapt_axis(xs, w[:-1], 14)
    with pytest.raises(ValueError):
        adapt_axis(xs, w, 1, keep=(0.3, 0.7))


def test_indicators_localize_at_electrode_rim():
    """Current injected through a small top patch: the flux-corner
    singularity at the patch rim must carry far more estimated error
    per volume than the far field."""
    n = 12
    xs = np.linspace(0, L, n + 1)
    mesh = _mesh(xs, xs, xs)

    def bcid(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, 3, np.int32)
        top = (nz > 0.5) & (np.abs(fz - L) < 1e-9)
        out[top & (np.abs(fx - 0.5) <= 0.17)
            & (np.abs(fy - 0.5) <= 0.17)] = 1
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = 2
        return out

    body = lambda cx, cy, cz: np.ones(cx.shape, np.int32)
    mesh = build_mesh_from_lattice(xs, xs, xs, body, bcid)
    case = build_case(mesh, {1: 1.0}, mode="current",
                      injected_current_A=1e-3, dtype=jnp.float64)
    res = solve_case(case, tol=1e-10, maxiter=40_000)
    assert bool(np.asarray(res.converged))
    eta = np.asarray(zz_error_indicators(case, res.phi))
    vol = np.asarray(case.vol)
    cc = np.asarray(mesh.nodes)[np.asarray(case.tets)].mean(axis=1)
    r_rim = np.sqrt(np.maximum(np.abs(cc[:, 0] - 0.5) - 0.17, 0) ** 2
                    + np.maximum(np.abs(cc[:, 1] - 0.5) - 0.17, 0) ** 2
                    + (cc[:, 2] - L) ** 2)
    near = r_rim < 0.18
    far = cc[:, 2] < 0.4
    dens_near = (eta[near] ** 2).sum() / vol[near].sum()
    dens_far = (eta[far] ** 2).sum() / vol[far].sum()
    assert dens_near > 30 * dens_far, (dens_near, dens_far)


def test_zz_vmaps_over_sweep_lanes():
    """The indicator is a metric: it must vmap over a material sweep
    (zero re-assembly) and match per-lane serial evaluation."""
    import jax

    xs = np.linspace(0, L, 7)
    mesh = _mesh(xs, xs, xs)
    case, phi, _ = _dirichlet_solve(mesh)
    phis = jnp.stack([jnp.asarray(phi), 2.0 * jnp.asarray(phi)])
    batched = jax.vmap(lambda p: zz_error_indicators(case, p))(phis)
    one = zz_error_indicators(case, jnp.asarray(phi))
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(one),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(batched[1]),
                               2.0 * np.asarray(one), rtol=1e-12)


# ── goal-oriented (dual-weighted residual) estimation ─────────────────────

BOX = ((0.25, 0.75), (0.25, 0.75), (0.0, 0.25))


def _goal_weights(case, mesh):
    """q = dJ/dphi for J = int_box phi dV — exact for P1 when the box
    faces lie on knot planes: vol_e/4 scattered to box tets' verts."""
    cc = np.asarray(mesh.nodes)[np.asarray(case.tets)].mean(axis=1)
    inbox = np.ones(len(cc), bool)
    for d, (lo, hi) in enumerate(BOX):
        inbox &= (cc[:, d] > lo) & (cc[:, d] < hi)
    q = np.zeros(mesh.n_nodes)
    tets = np.asarray(case.tets)[inbox]
    w = np.asarray(case.vol)[inbox] / 4.0
    np.add.at(q, tets.ravel(), np.repeat(w, 4))
    return q


def _J_exact():
    ix = (np.cos(K * BOX[0][0]) - np.cos(K * BOX[0][1])) / K
    iy = BOX[1][1] - BOX[1][0]
    iz = (np.cosh(K * BOX[2][1]) - np.cosh(K * BOX[2][0])) / K
    return ix * iy * iz


def _goal_run(xs, zs):
    from pelvistim_fem_tpu.ops.estimate import (goal_dual_case,
                                                zz_goal_bound,
                                                zz_goal_indicators)
    mesh = _mesh(xs, xs, zs)
    case, phi, _ = _dirichlet_solve(mesh)
    q = _goal_weights(case, mesh)
    err = abs(_J_exact() - float(q @ phi))
    dual = goal_dual_case(case, q)
    resz = solve_case(dual, tol=1e-11, maxiter=40_000)
    assert bool(np.asarray(resz.converged))
    psi = jnp.asarray(np.asarray(resz.phi))
    w_goal = np.asarray(zz_goal_indicators(case, jnp.asarray(phi), psi))
    bound = float(zz_goal_bound(case, jnp.asarray(phi), psi))
    return case, mesh, phi, w_goal, err, bound


def test_goal_dwr_bound_and_goal_aware_adaptation():
    """DWR machinery on a goal (int of phi over a BOTTOM box) that
    disagrees with the energy error (which lives at the TOP, sinh
    curvature).  Pinned claims (measured in dev/goal_measure.py):

    1. the Cauchy-Schwarz DWR bound covers the TRUE goal error with a
       modest overestimate (measured 8.7-11.2x) on all three meshes;
    2. goal-BLIND energy adaptation actively HURTS the goal (it moves
       cells to the top where this functional doesn't look: measured
       1.44x worse than uniform);
    3. goal-AWARE adaptation beats goal-blind on both the true goal
       error and the bound it optimizes.
    """
    from pelvistim_fem_tpu.ops.estimate import zz_error_indicators as zzei

    n = 12
    xs = np.linspace(0, L, n + 1)
    case0, mesh0, phi0, w_goal0, err_u, bound_u = _goal_run(xs, xs)
    assert 2.0 < bound_u / err_u < 40.0, (bound_u, err_u)

    eta0 = zzei(case0, jnp.asarray(phi0))
    _, _, wzE = lattice_axis_weights(case0, mesh0, (xs, xs, xs), eta0)
    zsE = adapt_axis(xs, wzE, n, keep=(0.25,))
    *_, errE, boundE = _goal_run(xs, zsE)
    assert 2.0 < boundE / errE < 40.0

    _, _, wzG = lattice_axis_weights(case0, mesh0, (xs, xs, xs),
                                     w_goal0, power=1)
    zsG = adapt_axis(xs, wzG, n, keep=(0.25,))
    assert np.any(np.abs(zsG - 0.25) < 1e-12)      # box face locked
    *_, errG, boundG = _goal_run(xs, zsG)
    assert 2.0 < boundG / errG < 40.0

    # energy adaptation chases the top; the goal pays for it
    assert errE > 1.1 * err_u, (errE, err_u)
    # goal-aware beats goal-blind on the truth AND on its own bound
    assert errG < 0.95 * errE, (errG, errE)
    assert boundG < 0.95 * boundE, (boundG, boundE)

    # mechanism: the two weight profiles genuinely disagree — energy
    # mass is top-heavy, goal mass keeps the bottom (box) half alive
    wzEn, wzGn = wzE / wzE.sum(), wzG / wzG.sum()
    bottom = slice(0, n // 2)
    assert wzGn[bottom].sum() > 1.5 * wzEn[bottom].sum()


def test_by_body_recovery_kills_spurious_interface_error():
    """Two-layer slab with a 10x sigma jump and a piecewise-LINEAR
    exact solution (1-D series divider): P1 reproduces it exactly, so
    any honest indicator must report ~zero error.  The naive global
    recovery averages the discontinuous gradient across the interface
    and reports O(1) spurious error there; the per-body recovery
    (default) does not — THE correctness requirement for adapting
    layered tissue meshes, where naive ZZ would pour cells into every
    exactly-resolved material interface forever."""
    from pelvistim_fem_tpu.ops.estimate import zz_global_error

    n = 8
    xs = np.linspace(0, 1, n + 1)

    def body(cx, cy, cz):
        return np.where(cz < 0.5, 1, 2).astype(np.int32)

    def bcid(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, 3, np.int32)
        out[(nz > 0.5) & (np.abs(fz - 1) < 1e-9)] = 1
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = 2
        return out

    mesh = build_mesh_from_lattice(xs, xs, xs, body, bcid)
    case = build_case(mesh, {1: 1.0, 2: 10.0}, mode="voltage",
                      dtype=jnp.float64)
    res = solve_case(case, tol=1e-12, maxiter=40_000)
    assert bool(np.asarray(res.converged))
    phi = np.asarray(res.phi)

    # P1-exactness of the series divider
    z = np.asarray(mesh.nodes)[:, 2]
    J = 1.0 / (0.5 / 1.0 + 0.5 / 10.0)
    exact = np.where(z < 0.5, J * z, J * 0.5 + J * (z - 0.5) / 10.0)
    np.testing.assert_allclose(phi, exact, atol=1e-9)

    _, rel_body = (float(v) for v in
                   zz_global_error(case, jnp.asarray(phi)))
    eta_naive = np.asarray(zz_error_indicators(
        case, jnp.asarray(phi), by_body=False))
    from pelvistim_fem_tpu.ops.fields import cell_gradient
    g = np.asarray(cell_gradient(case, jnp.asarray(phi)))
    sig = np.asarray(case.sigma_table)[np.asarray(case.tet_body)]
    en = np.sqrt(np.sum(np.asarray(case.vol) * sig
                        * np.sum(g * g, axis=1)))
    rel_naive = np.sqrt((eta_naive ** 2).sum()) / en

    assert rel_body < 1e-8, rel_body          # honest: exact is exact
    assert rel_naive > 1e-2, rel_naive        # naive: spurious O(1)


def test_eqs_indicators_vanish_on_complex_divider():
    """Complex (EQS) ZZ: the two-layer complex series divider is
    P1-exact in BOTH components, so the stacked-real indicator must
    vanish with by-body recovery and report spurious interface error
    without it — the complex twin of the real divider pin."""
    from pelvistim_fem_tpu.ops.estimate import (zz_error_indicators_eqs,
                                                zz_global_error_eqs)

    EPS0 = 8.8541878128e-12
    sig = np.array([0.0, 0.02, 0.35])
    epsr = np.array([0.0, 8.0e5, 1.0e4])
    omega = 2 * np.pi * 5.0e4
    da = db = 0.5
    n = 8
    xs = np.linspace(0, 1, n + 1)

    def body(cx, cy, cz):
        return np.where(cz < da, 1, 2).astype(np.int32)

    def bcid(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, 3, np.int32)
        out[(nz > 0.5) & (np.abs(fz - 1) < 1e-9)] = 1
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = 2
        return out

    mesh = build_mesh_from_lattice(xs, xs, xs, body, bcid)
    case = build_case(mesh, {1: sig[1], 2: sig[2]}, mode="voltage",
                      dtype=jnp.float64)
    kap = sig + 1j * omega * EPS0 * epsr
    vi = (kap[2] / db) / (kap[1] / da + kap[2] / db)
    assert abs(vi.imag) > 1e-3
    z = np.asarray(mesh.nodes)[:, 2]
    exact = np.where(z <= da + 1e-12, vi * z / da,
                     vi + (1 - vi) * (z - da) / db)
    phi2 = jnp.asarray(np.stack([exact.real, exact.imag]))
    kr = jnp.asarray(kap.real)
    ki = jnp.asarray(kap.imag)

    _, rel = (float(v) for v in
              zz_global_error_eqs(case, phi2, kr, ki))
    assert rel < 1e-12, rel
    eta_naive = np.asarray(zz_error_indicators_eqs(
        case, phi2, kr, ki, by_body=False))
    # spurious O(1) interface error without per-body recovery
    assert np.sqrt((eta_naive ** 2).sum()) > 1e-3 * abs(vi)


def test_tensor_sigma_indicators_reduce_to_scalar():
    """Anisotropic tensor tables flow through the estimator: with
    tensor = sigma * I the indicators must equal the scalar form
    exactly, and a genuinely anisotropic table must differ."""
    xs = np.linspace(0, L, 9)
    mesh = _mesh(xs, xs, xs)
    case, phi, _ = _dirichlet_solve(mesh)
    tab = np.asarray(case.sigma_table, np.float64)
    iso = np.einsum("t,ij->tij", tab, np.eye(3))
    e_scalar = np.asarray(zz_error_indicators(case, jnp.asarray(phi)))
    e_iso = np.asarray(zz_error_indicators(case, jnp.asarray(phi),
                                           jnp.asarray(iso)))
    np.testing.assert_allclose(e_iso, e_scalar, rtol=1e-12)
    aniso = iso.copy()
    aniso[:, 2, 2] *= 4.0
    e_a = np.asarray(zz_error_indicators(case, jnp.asarray(phi),
                                         jnp.asarray(aniso)))
    assert np.abs(e_a - e_scalar).max() > 0.1 * e_scalar.max()


def test_waveform_bound_composition():
    """Waveform triangle bound: (a) exact harmonic fields (the complex
    divider per harmonic) give bound == 0; (b) in the resistive limit
    all harmonics share one field, so the bound is EXACTLY
    sum|c_k| * eta_dc."""
    from pelvistim_fem_tpu.ops.estimate import (waveform_zz_bound,
                                                zz_global_error)

    EPS0 = 8.8541878128e-12
    sig = np.array([0.0, 0.02, 0.35])
    epsr = np.array([0.0, 8.0e5, 1.0e4])
    freqs = np.array([1e3, 3e3, 5e3])
    coeffs = np.array([1.0 - 0.5j, 0.3j, 0.1 + 0.1j])
    da = db = 0.5
    n = 6
    xs = np.linspace(0, 1, n + 1)

    def body(cx, cy, cz):
        return np.where(cz < da, 1, 2).astype(np.int32)

    def bcid(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, 3, np.int32)
        out[(nz > 0.5) & (np.abs(fz - 1) < 1e-9)] = 1
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = 2
        return out

    mesh = build_mesh_from_lattice(xs, xs, xs, body, bcid)
    case = build_case(mesh, {1: sig[1], 2: sig[2]}, mode="voltage",
                      dtype=jnp.float64)
    z = np.asarray(mesh.nodes)[:, 2]

    # (a) exact complex divider per harmonic -> bound vanishes
    kr = np.tile(sig, (3, 1))
    ki = 2 * np.pi * freqs[:, None] * EPS0 * epsr[None, :]
    ph = []
    for k in range(3):
        kap = kr[k] + 1j * ki[k]
        vi = (kap[2] / db) / (kap[1] / da + kap[2] / db)
        ex = np.where(z <= da + 1e-12, vi * z / da,
                      vi + (1 - vi) * (z - da) / db)
        ph.append(np.stack([ex.real, ex.imag]))
    out = waveform_zz_bound(case, np.stack(ph), coeffs, kr, ki)
    assert out["bound"] < 1e-12, out["bound"]

    # (b) resistive limit: one shared NON-exact field -> bound is
    # exactly sum|c| * eta_dc
    phi_dc = np.sin(3 * np.asarray(mesh.nodes)[:, 0]) * z ** 2
    ph_r = np.tile(np.stack([phi_dc, np.zeros_like(phi_dc)]),
                   (3, 1, 1))
    out_r = waveform_zz_bound(case, ph_r, coeffs, kr, 0.0 * ki)
    eta_dc = float(zz_global_error(case, jnp.asarray(phi_dc))[0])
    np.testing.assert_allclose(
        out_r["bound"], np.abs(coeffs).sum() * eta_dc, rtol=1e-12)
    assert 0 < out_r["rel"] < 1

"""Frequency-domain electro-quasistatic solves (ops/eqs.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.models.pressure import build_pressure_case
from pelvistim_fem_tpu.ops.eqs import (EPS0, batched_eqs_solve_refined,
                                       impedance_spectrum,
                                       solve_stencil_eqs_refined)
from pelvistim_fem_tpu.ops.multigrid import (build_hierarchy,
                                             solve_stencil_mg_refined)
from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                           stencil_host_data)


@pytest.fixture(scope="module")
def pressure_problem():
    case, params, mesh = build_pressure_case(coarse=True, with_mesh=True)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float64)
    return case, params, sc, hier


def test_eqs_zero_frequency_matches_real_solve(pressure_problem):
    """At omega = 0 the COCG complex solve must reduce to the real
    certified MG solve: zero imaginary part, real part matching."""
    case, params, sc, hier = pressure_problem
    ki = jnp.zeros_like(sc.sigma_table)
    out = solve_stencil_eqs_refined(sc, hier, ki, tol=1e-10)
    assert bool(np.asarray(out.converged))
    assert float(np.asarray(out.residual)) <= 1e-10
    ref = solve_stencil_mg_refined(sc, hier, tol=1e-10)
    phi = np.asarray(out.phi)
    np.testing.assert_allclose(phi[0], np.asarray(ref.phi),
                               atol=1e-8 * np.abs(ref.phi).max())
    assert np.abs(phi[1]).max() <= 1e-12 * np.abs(phi[0]).max() + 1e-15


def _two_layer_box(sig_a, sig_b, da=0.01, db=0.01, h=0.0025):
    """Two-body slab: body 1 (A) in z < da, body 2 (B) above, voltage
    drive top (V=1) / bottom (0) — exact solution piecewise linear in z
    (P1-exact), complex voltage divider at the interface."""
    L = 0.02
    xs = np.linspace(0, L, int(L / h) + 1)
    ys = np.linspace(0, L, int(L / h) + 1)
    zs = np.linspace(0, da + db, int((da + db) / h) + 1)
    assert np.any(np.isclose(zs, da)), "interface must be a knot plane"

    def body_fn(cx, cy, cz):
        return np.where(cz < da, 1, 2).astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        out[(nz > 0.5) & (np.abs(fz - (da + db)) < 1e-9)] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, ys, zs, body_fn, bcid_fn)
    case = build_case(mesh, {1: sig_a, 2: sig_b}, mode="voltage",
                      dtype=jnp.float64)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float64)
    return mesh, case, sc, hier, da, db


def test_eqs_two_layer_complex_divider_exact():
    """Complex series divider: with kappa = sigma + i omega eps0 epsr
    per layer, the interface potential is
    V_i = (kappa_b/d_b) / (kappa_a/d_a + kappa_b/d_b) — piecewise-linear
    exact solution, so the discrete solve must hit it to solver
    tolerance INCLUDING the phase."""
    sig_a, sig_b = 0.02, 0.35        # contact-ish vs muscle-ish
    epsr_a, epsr_b = 8.0e5, 1.0e4
    f = 5.0e4                        # 50 kHz: omega*eps comparable to sigma
    omega = 2 * np.pi * f

    mesh, case, sc, hier, da, db = _two_layer_box(sig_a, sig_b)
    ki = jnp.asarray([0.0, omega * EPS0 * epsr_a, omega * EPS0 * epsr_b],
                     jnp.float64)
    out = solve_stencil_eqs_refined(sc, hier, ki, tol=1e-10)
    assert bool(np.asarray(out.converged))

    ka = sig_a + 1j * omega * EPS0 * epsr_a
    kb = sig_b + 1j * omega * EPS0 * epsr_b
    vi_exact = (kb / db) / (ka / da + kb / db)
    assert abs(vi_exact.imag) > 1e-3      # the phase is actually probed

    z = mesh.nodes[:, 2]
    phi = np.asarray(out.phi)
    phi_c = phi[0] + 1j * phi[1]
    # exact complex field: linear 0 -> Vi in layer A, Vi -> 1 in layer B
    expected = np.where(z <= da + 1e-12, vi_exact * z / da,
                        vi_exact + (1 - vi_exact) * (z - da) / db)
    err = np.abs(phi_c - expected).max()
    assert err <= 1e-8, err


def test_impedance_spectrum_rc_contact(pressure_problem):
    """A capacitive contact layer must produce the textbook spectrum:
    |Z| monotone nonincreasing with frequency, phase in (-90, 0], and
    the low-frequency limit equal to the static contact impedance."""
    case, params, sc, hier = pressure_problem
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w_act = act / act.sum()
    w_ret = ret / ret.sum()

    n_b = sc.sigma_table.shape[0] - 1
    epsr = np.zeros(n_b + 1)
    epsr[core.BODY_CONTACT_ACTIVE] = 5e6    # double-layer-like contact
    epsr[core.BODY_CONTACT_RETURN] = 5e6
    # down to 10 mHz so the lowest point IS the static limit: at the
    # contact's eps_r = 5e6, omega*eps0*epsr ~ sigma_contact already by
    # ~10 Hz (that knee is the point of the capability)
    freqs = np.logspace(-2, 5, 8)
    spec = impedance_spectrum(sc, hier, jnp.asarray(epsr), freqs,
                              w_act=w_act, w_ret=w_ret, tol=1e-8)
    assert spec["converged"].all()
    assert spec["residual"].max() <= 1e-8
    zabs = spec["Z_abs"]
    assert np.all(np.diff(zabs) <= 1e-9 * zabs[0])      # nonincreasing
    assert zabs[0] > 1.05 * zabs[-1]                    # actually drops
    assert np.all(spec["Z_phase_deg"] <= 1e-9)
    assert np.all(spec["Z_phase_deg"] > -90.0)

    # static limit: solve the real problem, compare V/I
    ref = solve_stencil_mg_refined(sc, hier, tol=1e-8)
    v = float(np.asarray(ref.phi) @ w_act - np.asarray(ref.phi) @ w_ret)
    z_static = v / float(np.asarray(jnp.sum(sc.b_neumann)))
    np.testing.assert_allclose(zabs[0], z_static, rtol=1e-3)


def test_batched_eqs_matches_single(pressure_problem):
    case, params, sc, hier = pressure_problem
    n_b = sc.sigma_table.shape[0] - 1
    epsr = np.zeros(n_b + 1)
    epsr[core.BODY_CONTACT_ACTIVE] = 5e6
    epsr[core.BODY_CONTACT_RETURN] = 5e6
    omegas = 2 * np.pi * np.array([1e2, 1e4])
    kis = jnp.asarray(omegas[:, None] * EPS0 * epsr[None, :])
    out = batched_eqs_solve_refined(sc, hier, kis, tol=1e-9)
    for i in range(2):
        one = solve_stencil_eqs_refined(sc, hier, kis[i], tol=1e-9)
        np.testing.assert_allclose(
            np.asarray(out.phi[i]), np.asarray(one.phi),
            atol=1e-8 * np.abs(np.asarray(one.phi)).max())


def test_eqs_element_path_matches_exact_and_stencil():
    """The element-path COCG (imported-mesh form) must hit the same
    exact complex divider, with Jacobi AND with AMG preconditioning,
    and agree with the stencil-path solution."""
    from pelvistim_fem_tpu.ops.amg import build_amg
    from pelvistim_fem_tpu.ops.eqs import solve_case_eqs_refined

    sig_a, sig_b = 0.02, 0.35
    epsr_a, epsr_b = 8.0e5, 1.0e4
    omega = 2 * np.pi * 5.0e4
    mesh, case, sc, hier, da, db = _two_layer_box(sig_a, sig_b)
    ki = jnp.asarray([0.0, omega * EPS0 * epsr_a, omega * EPS0 * epsr_b],
                     jnp.float64)

    ka = sig_a + 1j * omega * EPS0 * epsr_a
    kb = sig_b + 1j * omega * EPS0 * epsr_b
    vi = (kb / db) / (ka / da + kb / db)
    z = mesh.nodes[:, 2]
    expected = np.where(z <= da + 1e-12, vi * z / da,
                        vi + (1 - vi) * (z - da) / db)

    out_j = solve_case_eqs_refined(case, ki, tol=1e-10)
    assert bool(np.asarray(out_j.converged))
    pj = np.asarray(out_j.phi)
    # residual 1e-10 -> error ~ kappa * 1e-10; gate leaves conditioning room
    assert np.abs(pj[0] + 1j * pj[1] - expected).max() <= 1e-7

    amg = build_amg(case, mesh=mesh)
    out_a = solve_case_eqs_refined(case, ki, amg=amg, tol=1e-10)
    assert bool(np.asarray(out_a.converged))
    assert int(out_a.iterations) <= int(out_j.iterations)
    pa = np.asarray(out_a.phi)
    assert np.abs(pa[0] + 1j * pa[1] - expected).max() <= 1e-7

    out_s = solve_stencil_eqs_refined(sc, hier, ki, tol=1e-10)
    ps = np.asarray(out_s.phi)
    np.testing.assert_allclose(pa, ps, atol=1e-7)


def test_sharded_eqs_matches_batched(pressure_problem):
    """Frequency-sharded certified EQS (5 lanes on 8 devices, padding
    exercised) equals the unsharded batch lane for lane."""
    from pelvistim_fem_tpu.parallel.sweep import (device_mesh,
                                                  sharded_eqs_solve_refined)
    case, params, sc, hier = pressure_problem
    n_b = sc.sigma_table.shape[0] - 1
    epsr = np.zeros(n_b + 1)
    epsr[core.BODY_CONTACT_ACTIVE] = 5e6
    epsr[core.BODY_CONTACT_RETURN] = 5e6
    omegas = 2 * np.pi * np.logspace(1, 4, 5)
    kis = jnp.asarray(omegas[:, None] * EPS0 * epsr[None, :])
    ref = batched_eqs_solve_refined(sc, hier, kis, tol=1e-8)
    out = sharded_eqs_solve_refined(sc, hier, kis,
                                    mesh=device_mesh(8), tol=1e-8)
    assert out.phi.shape == ref.phi.shape
    assert bool(np.asarray(out.converged).all())
    # both sides carry certified true residual <= 1e-8; GSPMD reduction
    # order shifts the f32 inner trajectory by O(residual) at worst
    np.testing.assert_allclose(
        np.asarray(out.phi), np.asarray(ref.phi),
        atol=1e-8 * float(np.abs(np.asarray(ref.phi)).max()))


def test_cole_cole_machinery():
    """Debye limit (alpha = 0) against the closed form; physical
    monotonicity: effective conductivity Re(kappa) rises with f,
    effective permittivity Im(kappa)/(w eps0) falls (dispersion)."""
    from pelvistim_fem_tpu.ops.eqs import cole_cole_kappa
    f = np.logspace(0, 7, 29)
    w = 2 * np.pi * f
    sigma_s, eps_inf = 0.2, 4.0e3
    d_eps, tau = 1.0e6, 1.0e-4
    kap = cole_cole_kappa(f, sigma_s, eps_inf, [(d_eps, tau, 0.0)])
    exact = sigma_s + 1j * w * EPS0 * (eps_inf
                                       + d_eps / (1 + 1j * w * tau))
    np.testing.assert_allclose(kap, exact, rtol=1e-12)
    # DC limit
    np.testing.assert_allclose(
        cole_cole_kappa([0.0], sigma_s, eps_inf,
                        [(d_eps, tau, 0.3)])[0], sigma_s, rtol=1e-12)
    # dispersion shape for a Cole-Cole pole (alpha = 0.15)
    kap = cole_cole_kappa(f, sigma_s, eps_inf, [(d_eps, tau, 0.15)])
    sig_eff = kap.real
    eps_eff = kap.imag / (w * EPS0)
    assert np.all(np.diff(sig_eff) >= -1e-12)      # sigma rises with f
    assert np.all(np.diff(eps_eff) <= 1e-12)       # eps falls with f
    assert sig_eff[-1] > sig_eff[0] and eps_eff[0] > 10 * eps_eff[-1]


def test_dispersive_spectrum_solves(pressure_problem):
    """A dispersive muscle + capacitive contact spectrum solves at the
    certified tolerance and |Z| still falls with frequency."""
    from pelvistim_fem_tpu.ops.eqs import dispersive_tables
    case, params, sc, hier = pressure_problem
    freqs = np.logspace(1, 5, 5)
    disp = {
        core.BODY_MUSCLE: (0.35, 1.0e3, [(8.0e5, 3.0e-4, 0.1)]),
        core.BODY_CONTACT_ACTIVE: (
            float(np.asarray(sc.sigma_table)[core.BODY_CONTACT_ACTIVE]),
            1.0e3, [(5.0e6, 1.0e-3, 0.2)]),
        core.BODY_CONTACT_RETURN: (
            float(np.asarray(sc.sigma_table)[core.BODY_CONTACT_RETURN]),
            1.0e3, [(5.0e6, 1.0e-3, 0.2)]),
    }
    kr, ki = dispersive_tables(freqs, sc.sigma_table, disp)
    out = batched_eqs_solve_refined(sc, hier, ki, kr, tol=1e-8)
    assert bool(np.asarray(out.converged).all())
    assert float(np.asarray(out.residual).max()) <= 1e-8
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w_a = act / act.sum()
    w_r = ret / ret.sum()
    phi = np.asarray(out.phi)
    V = phi @ w_a - phi @ w_r                      # (W, 2)
    I = float(np.asarray(jnp.sum(sc.b_neumann)))
    zabs = np.hypot(V[:, 0], V[:, 1]) / I
    assert np.all(np.diff(zabs) < 0)
    assert zabs[0] > 1.1 * zabs[-1]


def test_eqs_diff_gradients_match_fd(pressure_problem):
    """Gradients of a complex-spectrum metric through the COCG
    custom_linear_solve (non-symmetric stacked operator, explicit
    transpose solve) must match central finite differences in BOTH
    kr and ki."""
    from pelvistim_fem_tpu.ops.eqs import solve_stencil_eqs_diff
    case, params, sc, hier = pressure_problem
    b = core.BODY_CONTACT_ACTIVE
    n_b = sc.sigma_table.shape[0] - 1
    ki0 = np.zeros(n_b + 1)
    ki0[core.BODY_CONTACT_ACTIVE] = 2e-3
    ki0[core.BODY_CONTACT_RETURN] = 2e-3
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(sc.grid_index.shape[0]))

    def metric(kr, ki):
        phi = solve_stencil_eqs_diff(sc, hier, ki, kr, tol=1e-12,
                                     maxiter=4000)
        # mixes real and imag parts so both adjoint components matter
        return jnp.sum(w * phi[0]) + 0.7 * jnp.sum(w * phi[1])

    kr0 = sc.sigma_table
    ki0 = jnp.asarray(ki0)
    m, (g_kr, g_ki) = jax.value_and_grad(metric, argnums=(0, 1))(
        kr0, ki0)
    assert np.isfinite(float(m))
    for tab, g, idx in ((kr0, g_kr, b), (ki0, g_ki, b),
                        (kr0, g_kr, core.BODY_MUSCLE)):
        h = 1e-6 * max(float(tab[idx]), 1e-3)
        tp = tab.at[idx].add(h)
        tm = tab.at[idx].add(-h)
        if tab is kr0:
            fd = (metric(tp, ki0) - metric(tm, ki0)) / (2 * h)
        else:
            fd = (metric(kr0, tp) - metric(kr0, tm)) / (2 * h)
        # FD cancellation noise at h ~ 1e-9 dominates; a wrong
        # transpose/adjoint would be O(1) off
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=2e-4)


def test_spectrum_calibration_recovers_contact_dispersion(
        pressure_problem):
    """Round trip: synthesize Z(f) with known contact Cole-Cole
    (Debye) parameters, start the fit 3x off in every parameter,
    recover to <0.5% through the differentiable complex solves."""
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    from pelvistim_fem_tpu.ops.calibrate import \
        calibrate_contact_dispersion
    from pelvistim_fem_tpu.ops.eqs import dispersive_tables
    case, params, sc, hier = pressure_problem
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w_a = act / act.sum()
    w_r = ret / ret.sum()
    bodies = (core.BODY_CONTACT_ACTIVE, core.BODY_CONTACT_RETURN)

    true = (5.0e-3, 4.0e6, 2.0e-4)        # sigma_s, d_eps, tau
    freqs = np.logspace(1, 4, 4)
    disp = {b: (true[0], 1.0e3, [(true[1], true[2], 0.0)])
            for b in bodies}
    kr, ki = dispersive_tables(freqs, sc.sigma_table, disp)
    out = batched_eqs_solve_refined(sc, hier, ki, kr, tol=1e-10)
    assert bool(np.asarray(out.converged).all())
    phi = np.asarray(out.phi)
    V = phi @ w_a - phi @ w_r
    I = float(np.asarray(jnp.sum(sc.b_neumann)))
    Z_meas = V / I                                       # (W, 2)

    x0 = (true[0] * 3, true[1] / 3, true[2] * 3)
    fit, losses = calibrate_contact_dispersion(
        sc, hier, freqs, Z_meas, w_a, w_r, bodies, x0, iters=12)
    fit = np.asarray(fit)
    losses = np.asarray(losses)
    assert losses[-1] < 1e-10, losses
    np.testing.assert_allclose(fit, true, rtol=5e-3)


def test_impedance_app_smoke(tmp_path):
    """run_impedance end to end: three contact states, certified
    spectra, CSV columns, monotone |Z| per state."""
    import csv
    import os
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "apps" / "run_impedance.py"),
         "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rows = list(csv.DictReader(open(tmp_path / "impedance.csv")))
    states = sorted({x["state"] for x in rows})
    assert states == ["dry", "mid", "wet"]
    for st in states:
        z = [float(x["Z_abs_ohm"]) for x in rows if x["state"] == st]
        assert len(z) == 11
        assert all(a >= b - 1e-9 for a, b in zip(z, z[1:]))
        ph = [float(x["Z_phase_deg"]) for x in rows
              if x["state"] == st]
        assert all(-90.0 < p <= 1e-9 for p in ph)


def test_eqs_element_tensor_kr():
    """Anisotropic EQS on the element path: for the z-directed divider
    the exact field has no lateral gradient, so a DIAGONAL tensor table
    with the same zz entries (and 2x lateral entries) must reproduce
    the scalar solution exactly — exercising the tensor branch of the
    complex operator end to end."""
    from pelvistim_fem_tpu.ops.eqs import solve_case_eqs_refined

    sig_a, sig_b = 0.02, 0.35
    epsr_a, epsr_b = 8.0e5, 1.0e4
    omega = 2 * np.pi * 5.0e4
    mesh, case, sc, hier, da, db = _two_layer_box(sig_a, sig_b)
    ki = jnp.asarray([0.0, omega * EPS0 * epsr_a, omega * EPS0 * epsr_b],
                     jnp.float64)

    ref = solve_case_eqs_refined(case, ki, tol=1e-10)
    assert bool(np.asarray(ref.converged))

    kr_t = np.zeros((3, 3, 3))
    for b, s in ((1, sig_a), (2, sig_b)):
        kr_t[b] = np.diag([2 * s, 2 * s, s])
    out = solve_case_eqs_refined(case, ki, jnp.asarray(kr_t),
                                 tol=1e-10)
    assert bool(np.asarray(out.converged))
    # both certified to 1e-10; error-per-residual constants differ a bit
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=1e-7)


def test_eqs_complex_reciprocity():
    """Discrete complex reciprocity: for two Neumann patch loads b1, b2
    on the SAME grounded complex-symmetric system, the unconjugated
    bilinear pairing b2^T phi1 == b1^T phi2 exactly (to solver
    tolerance) — certifying K^T = K through the whole element EQS
    chain, magnitude AND phase."""
    import dataclasses

    from pelvistim_fem_tpu.ops.eqs import solve_case_eqs_refined
    from pelvistim_fem_tpu.ops.leadfield import element_patch_loads

    case, params = build_pressure_case(coarse=True, dtype=jnp.float64)
    bcid = np.asarray(case.face_bcid)
    nrm = np.asarray(case.face_normal)
    # patch 1 = the active electrode; patch 2 = a probe patch on part
    # of the top insulated surface (upward normals, bcid 3)
    cand = np.nonzero((bcid == 3) & (nrm[:, 2] > 0.5))[0]
    patch_id = np.zeros(len(bcid), np.int32)
    patch_id[bcid == 1] = 1
    patch_id[cand[: max(4, len(cand) // 4)]] = 2
    loads = element_patch_loads(case, patch_id)        # (2, N), 1 A each

    n_b = case.meta.n_bodies
    epsr = np.zeros(n_b + 1)
    epsr[core.BODY_CONTACT_ACTIVE] = 5e6
    epsr[core.BODY_CONTACT_RETURN] = 5e6
    epsr[core.BODY_MUSCLE] = 2e5
    ki = jnp.asarray(2 * np.pi * 1e3 * EPS0 * epsr)

    phis = []
    for k in range(2):
        c = dataclasses.replace(case,
                                b_neumann=jnp.asarray(loads[k]))
        out = solve_case_eqs_refined(c, ki, tol=1e-11)
        assert bool(np.asarray(out.converged))
        p = np.asarray(out.phi)
        phis.append(p[0] + 1j * p[1])

    z12 = complex(loads[1] @ phis[0])      # bilinear, NO conjugate
    z21 = complex(loads[0] @ phis[1])
    assert abs(z12.imag) > 1e-3 * abs(z12.real)   # phase is nontrivial
    assert abs(z12 - z21) <= 1e-8 * abs(z12), (z12, z21)

"""Time-domain waveform synthesis + transient EQS (ops/waveform.py).

Validation strategy: the series two-layer column has a closed-form
impedance Z(w) = sum_l d_l / (kappa_l(w) A) whose time-domain response
to piecewise-constant current is piecewise exponential (per-layer RC
ODE).  The Fourier path and the theta-method transient discretize time
in unrelated ways; both are compared to the analytic steady state and
to each other.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.bc import electrode_node_masks
from pelvistim_fem_tpu.ops.eqs import EPS0
from pelvistim_fem_tpu.ops.multigrid import (build_hierarchy,
                                             solve_stencil_mg_refined)
from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                           stencil_host_data)
from pelvistim_fem_tpu.ops.waveform import (biphasic_pulse_samples,
                                            harmonic_transfer,
                                            pulse_response,
                                            solve_stencil_eqs_transient,
                                            synthesize_series,
                                            waveform_harmonics)

L_XY = 0.02          # column cross-section [m]
DA = DB = 0.01       # layer thicknesses [m]


def _column_problem(sig_a, sig_b, h=0.0025):
    """Current-driven two-layer column (active top / return bottom,
    full-face electrodes -> exact 1-D series impedance)."""
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    ys = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA + DB, int((DA + DB) / h) + 1)

    def body_fn(cx, cy, cz):
        return np.where(cz < DA, 1, 2).astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        out[(nz > 0.5) & (np.abs(fz - (DA + DB)) < 1e-9)] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, ys, zs, body_fn, bcid_fn)
    case = build_case(mesh, {1: sig_a, 2: sig_b}, mode="current",
                      injected_current_A=1.0, dtype=jnp.float64)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd)
    hier = build_hierarchy(hd, dtype=jnp.float64)
    act, ret = electrode_node_masks(np.asarray(case.faces),
                                    np.asarray(case.face_bcid),
                                    case.n_nodes)
    w = (act / act.sum() - ret / ret.sum())[None, :]   # (1, N) probe
    return case, sc, hier, w


def _z_analytic(freqs_hz, sig_a, sig_b, epsr_a, epsr_b):
    """Exact series impedance of the column per unit injected current."""
    w = 2 * np.pi * np.asarray(freqs_hz, np.float64)
    A = L_XY * L_XY
    ka = sig_a + 1j * w * EPS0 * epsr_a
    kb = sig_b + 1j * w * EPS0 * epsr_b
    return DA / (ka * A) + DB / (kb * A)


def _layer_rc_steady(times, seg_edges, seg_I, G, C):
    """Periodic steady state of C dV/dt + G V = I(t) for piecewise-
    constant I over segments [seg_edges[j], seg_edges[j+1]); closed-form
    exponentials with the periodicity condition solved for V(0)."""
    tau = C / G
    # propagate V(0) symbolically: V_end = a * V0 + b over one period
    a_tot, b_tot = 1.0, 0.0
    for j in range(len(seg_I)):
        dt = seg_edges[j + 1] - seg_edges[j]
        e = np.exp(-dt / tau)
        a_tot, b_tot = a_tot * e, b_tot * e + seg_I[j] / G * (1 - e)
    V0 = b_tot / (1 - a_tot)
    out = np.empty_like(np.asarray(times, np.float64))
    for i, t in enumerate(np.atleast_1d(times)):
        V, t0 = V0, 0.0
        for j in range(len(seg_I)):
            t1 = seg_edges[j + 1]
            if t < t1 - 1e-15:
                out[i] = seg_I[j] / G + (V - seg_I[j] / G) * np.exp(
                    -(t - t0) / tau)
                break
            V = seg_I[j] / G + (V - seg_I[j] / G) * np.exp(
                -(t1 - t0) / tau)
            t0 = t1
        else:
            out[i] = V
    return out


def test_harmonics_roundtrip_exact():
    """All-bin synthesis is exact trigonometric interpolation at the
    sample points; a half-period-antisymmetric waveform has (near-)zero
    even harmonics."""
    period = 1e-3
    t, i = biphasic_pulse_samples(period, 5e-3, 0.2e-3, ipg_s=0.05e-3,
                                  n_samples=256)
    harm = waveform_harmonics(i, period)
    back = synthesize_series(harm, np.ones(len(harm.freqs_hz)), t)
    np.testing.assert_allclose(back, i, atol=1e-12 * np.abs(i).max())

    # symmetric biphasic (no gap, no off-time): i(t + T/2) = -i(t)
    t2, i2 = biphasic_pulse_samples(2 * 0.2e-3, 5e-3, 0.2e-3,
                                    n_samples=256)
    h2 = waveform_harmonics(i2, 2 * 0.2e-3)
    mag = np.abs(h2.coeffs)
    assert mag[0] <= 1e-18                      # charge balanced
    assert mag[2::2].max() <= 1e-12 * mag.max()  # even harmonics vanish


def test_resistive_limit_scales_waveform():
    """With epsr = 0 everywhere the response is memoryless: every
    harmonic transfer equals the DC impedance and the synthesized V(t)
    is Z_dc * i(t) at every sample point."""
    sig_a, sig_b = 0.05, 0.35
    case, sc, hier, w = _column_problem(sig_a, sig_b)
    ref = solve_stencil_mg_refined(sc, hier, tol=1e-10)
    z_dc = float(np.asarray(ref.phi) @ w[0])

    period = 1e-3
    t, i = biphasic_pulse_samples(period, 5e-3, 0.2e-3, ipg_s=0.05e-3,
                                  n_samples=64)
    epsr = np.zeros(3)
    res = pulse_response(sc, hier, i, period, w, epsr_table=epsr,
                         tol=1e-10)
    assert res["converged"].all()
    v = res["series"][:, 0]
    np.testing.assert_allclose(v, z_dc * i,
                               atol=2e-8 * np.abs(z_dc * i).max())
    # and the DC impedance must match the analytic series resistance
    np.testing.assert_allclose(
        z_dc, _z_analytic([0.0], sig_a, sig_b, 0, 0).real[0], rtol=1e-8)


def test_band_limited_tone_matches_analytic():
    """Two-tone current: the FEM harmonic transfers must match the
    exact complex series impedance (the 1-D solution is P1-exact), and
    the synthesized V(t) the exact sinusoid-sum response."""
    sig_a, sig_b = 0.05, 0.1
    epsr_a = 0.5 * sig_a * 50e-6 / EPS0       # tau_a = 25 us... (kept mild)
    epsr_b = sig_b * 100e-6 / EPS0            # tau_b = 100 us
    case, sc, hier, w = _column_problem(sig_a, sig_b)

    period, S = 1e-3, 64
    t = np.arange(S) * period / S
    i = 4e-3 * np.sin(2 * np.pi * t / period) \
        + 1.5e-3 * np.sin(3 * 2 * np.pi * t / period)
    harm = waveform_harmonics(i, period)
    res = harmonic_transfer(sc, hier, harm, np.array([0, epsr_a, epsr_b]),
                            probe_weights=w, tol=1e-10)
    assert res["converged"].all()
    idx = res["active_harmonics"]
    assert set(idx.tolist()) == {1, 3}        # only the driven tones solve

    z_exact = _z_analytic(harm.freqs_hz[idx], sig_a, sig_b, epsr_a,
                          epsr_b)
    np.testing.assert_allclose(res["transfer"][idx, 0], z_exact,
                               rtol=1e-8)

    v = synthesize_series(harm, res["transfer"][:, 0], t)
    c_exact = harm.scale[idx] * harm.coeffs[idx] * z_exact
    v_exact = np.real(np.exp(1j * 2 * np.pi * np.outer(
        t, harm.freqs_hz[idx])) @ c_exact)
    np.testing.assert_allclose(v, v_exact, atol=1e-10 * np.abs(
        v_exact).max() + 1e-14)


def test_transient_cn_matches_fourier_and_analytic():
    """Crank-Nicolson periodic steady state vs the Fourier synthesis on
    the two-tone drive: independent time discretizations of the same
    semi-discrete system must agree to O(dt^2); both must track the
    analytic RC response."""
    sig_a, sig_b = 0.05, 0.1
    epsr_a = sig_a * 50e-6 / EPS0
    epsr_b = sig_b * 100e-6 / EPS0
    epsr = np.array([0, epsr_a, epsr_b])
    case, sc, hier, w = _column_problem(sig_a, sig_b)

    period = 1e-3
    n_per, n_periods = 100, 3
    dt = period / n_per
    times = dt * np.arange(1, n_per * n_periods + 1)
    i_fn = lambda tt: 4e-3 * np.sin(2 * np.pi * tt / period) \
        + 1.5e-3 * np.sin(3 * 2 * np.pi * tt / period)
    scale_t = i_fn(times)

    phi, probes, iters = solve_stencil_eqs_transient(
        sc, hier, epsr, scale_t, w, dt_s=dt, tol=1e-11)
    v_cn = np.asarray(probes)[-n_per:, 0]     # settled last period
    t_last = times[-n_per:]

    harm = waveform_harmonics(i_fn(np.arange(64) * period / 64), period)
    res = harmonic_transfer(sc, hier, harm, epsr, probe_weights=w,
                            tol=1e-10)
    v_four = synthesize_series(harm, res["transfer"][:, 0], t_last)

    scale = np.abs(v_four).max()
    # CN phase/amplitude error ~ (w dt)^2/12; 3rd tone: (2pi*3*dt/T)^2/12
    assert np.abs(v_cn - v_four).max() <= 4e-3 * scale

    z13 = _z_analytic(np.array([1, 3]) / period, sig_a, sig_b, epsr_a,
                      epsr_b)
    wt = 2 * np.pi * t_last / period
    # response to a*sin(k w t) through Z: a * Im(Z_k e^{i k w t})
    v_exact = 4e-3 * np.imag(z13[0] * np.exp(1j * wt)) \
        + 1.5e-3 * np.imag(z13[1] * np.exp(3j * wt))
    assert np.abs(v_four - v_exact).max() <= 1e-8 * scale
    assert np.abs(v_cn - v_exact).max() <= 4e-3 * scale


def test_biphasic_pulse_capacitive_charging():
    """Biphasic pulse into a resistive layer + RC layer: the Fourier
    steady state must track the piecewise-exponential analytic response
    away from the switch instants, and show the capacitive in-phase
    voltage creep (|V| grows during a constant-current phase) that a
    static model cannot express."""
    sig_a, sig_b = 0.05, 0.1
    epsr_b = sig_b * 100e-6 / EPS0            # tau_b = 100 us
    case, sc, hier, w = _column_problem(sig_a, sig_b)

    period, amp, pw = 1e-3, 5e-3, 0.2e-3
    S = 256
    t, i = biphasic_pulse_samples(period, amp, pw, n_samples=S,
                                  cathodic_first=False)
    res = pulse_response(sc, hier, i, period, w,
                         epsr_table=np.array([0, 0.0, epsr_b]),
                         tol=1e-9)
    assert res["converged"].all()
    v = res["series"][:, 0]

    A = L_XY * L_XY
    Ra = DA / (sig_a * A)
    Gb, Cb = sig_b * A / DB, EPS0 * epsr_b * A / DB
    edges = np.array([0.0, pw, 2 * pw, period])
    seg_I = np.array([amp, -amp, 0.0])
    v_b = _layer_rc_steady(t, edges, seg_I, Gb, Cb)
    v_exact = Ra * i + v_b

    # compare away from the switch instants (trig interpolation of the
    # square drive rings at the jumps; the RC part filters it out)
    mask = np.ones(S, bool)
    for edge in edges[:-1]:
        mask &= np.abs((t - edge + period / 2) % period
                       - period / 2) > 0.03e-3
    scale = np.abs(v_exact).max()
    assert np.abs(v - v_exact)[mask].max() <= 2e-2 * scale

    # capacitive creep within the anodic phase (exclude ring-down edges)
    phase1 = (t > 0.02e-3) & (t < pw - 0.02e-3)
    dv = np.diff(v[phase1])
    assert (dv > 0).all()
    # and the creep is the RC droop magnitude, not noise
    assert v[phase1][-1] - v[phase1][0] >= 0.2 * (
        amp / Gb) * (1 - np.exp(-pw / (Cb / Gb)))


def test_af_batch_kernel_matches_polyfit():
    """af_profiles_batch must reproduce af_from_profile's moving
    quadratic fit exactly (same estimator, expressed as a stencil)."""
    from pelvistim_fem_tpu.ops.nerve import af_from_profile, \
        af_profiles_batch
    rng = np.random.default_rng(7)
    ds, window = 1e-3, 6.5e-3
    v = np.cumsum(rng.normal(size=(3, 120)), axis=1) * 1e-2
    batch = af_profiles_batch(v, ds, window)
    for row in range(3):
        ref = af_from_profile(v[row], ds, window)["af"]
        np.testing.assert_allclose(batch[row], ref, atol=1e-10,
                                   equal_nan=True)


def test_membrane_lowpass_rectangular_analytic():
    """Periodic steady state of the membrane filter driven by a
    rectangular pulse: peak = A (1 - e^(-pw/tau)) corrected for the
    periodic wrap — the exponential strength-duration law."""
    from pelvistim_fem_tpu.ops.nerve import membrane_lowpass_periodic
    tau, pw, period, A, S = 216e-6, 0.2e-3, 5e-3, 3.0, 8192
    t = np.arange(S) * period / S
    x = np.where(t < pw, A, 0.0)
    y = membrane_lowpass_periodic(x, period / S, tau)
    e_on, e_off = np.exp(-pw / tau), np.exp(-(period - pw) / tau)
    y0 = A * (1 - e_on) * e_off / (1 - e_on * e_off)
    peak_exact = y0 * e_on + A * (1 - e_on)
    np.testing.assert_allclose(y.max(), peak_exact, rtol=1e-3)


def test_pulse_af_resistive_factorizes():
    """In non-dispersive tissue the time-resolved AF factorizes as
    AF(t, s) = i(t)/I0 * AF_static(s); the Lapicque threshold then
    reduces to the static threshold divided by the filtered waveform
    peak (the strength-duration factor)."""
    from pelvistim_fem_tpu.ops.nerve import (af_profiles_batch,
                                             membrane_lowpass_periodic,
                                             path_interp_plan,
                                             straight_path,
                                             waveform_threshold_scale)
    from pelvistim_fem_tpu.ops.waveform import pulse_af_response

    sig_a, sig_b = 0.05, 0.35
    case, sc, hier, _ = _column_problem(sig_a, sig_b)
    ref = solve_stencil_mg_refined(sc, hier, tol=1e-10)

    # z-directed path through the conductivity interface (curvature
    # concentrates there); equally spaced, away from the ends
    p0 = np.array([L_XY / 2, L_XY / 2, 0.002])
    p1 = np.array([L_XY / 2, L_XY / 2, DA + DB - 0.002])
    pts = straight_path(p0, p1, n_points=81)
    ds = np.linalg.norm(pts[1] - pts[0])
    window = 3 * 2.5e-3

    # re-derive the gather plan from the stencil case's grid provenance
    # (the helper does not return the mesh; the axes are known)
    h = 0.0025
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA + DB, int((DA + DB) / h) + 1)
    plan = path_interp_plan((xs, xs, zs), np.asarray(sc.grid_index),
                            sc.grid_shape, pts)

    period, amp, pw = 1e-3, 5e-3, 0.2e-3
    S = 128
    t, i = biphasic_pulse_samples(period, amp, pw, n_samples=S,
                                  cathodic_first=False)
    res = pulse_af_response(sc, hier, plan, ds, i, period,
                            epsr_table=np.zeros(3), window_m=window,
                            tol=1e-9)
    assert res["converged"].all()

    phi_path = (np.asarray(ref.phi)[plan[0]] * plan[1]).sum(-1)
    af_static = af_profiles_batch(phi_path, ds, window)
    # factorization: every time sample is the static AF scaled by i(t)
    fin = np.isfinite(af_static)
    expect = np.outer(i, af_static[fin])      # I0 = 1 A injected
    np.testing.assert_allclose(res["af_ts"][:, fin], expect,
                               atol=2e-6 * np.abs(expect).max())

    # Lapicque threshold: the factorized peak is max over (t, s) of
    # y(t) * AF(s) — BOTH sign pairings matter (the anodic-phase
    # hyperpolarizing lobe depolarizes during the reversed phase)
    thr = waveform_threshold_scale(res["af_ts"], period / S, 1.0)
    y = membrane_lowpass_periodic(i, period / S, 216e-6)
    af_in = af_static[fin]
    peak = max(y.max() * max(af_in.max(), 0.0),
               (-y.min()) * max(-af_in.min(), 0.0))
    assert peak > 0
    np.testing.assert_allclose(thr, 1.0 / peak, rtol=1e-9)


def test_harmonic_transfer_sharded_parity():
    """Harmonic-axis-sharded certified solves (multi-chip pulse
    synthesis) must reproduce the single-device transfers."""
    from pelvistim_fem_tpu.parallel.sweep import device_mesh
    sig_a, sig_b = 0.05, 0.1
    epsr_a = sig_a * 50e-6 / EPS0
    epsr_b = sig_b * 100e-6 / EPS0
    epsr = np.array([0, epsr_a, epsr_b])
    case, sc, hier, w = _column_problem(sig_a, sig_b)

    period, S = 1e-3, 32
    t, i = biphasic_pulse_samples(period, 5e-3, 0.2e-3, n_samples=S,
                                  ipg_s=0.05e-3)
    harm = waveform_harmonics(i, period)
    ref = harmonic_transfer(sc, hier, harm, epsr, probe_weights=w,
                            tol=1e-9)
    shd = harmonic_transfer(sc, hier, harm, epsr, probe_weights=w,
                            tol=1e-9, shard_mesh=device_mesh(8))
    assert shd["converged"].all()
    np.testing.assert_allclose(shd["transfer"], ref["transfer"],
                               rtol=1e-7, atol=1e-12)


def test_harmonic_transfer_rom_parity():
    """The greedy-ROM harmonic path (rom_snapshots) must reproduce the
    full batched transfers at the same per-harmonic certificate, from
    FAR fewer full complex solves (the harmonic axis spans ~2 decades
    — a dozen snapshots cover it)."""
    sig_a, sig_b = 0.05, 0.1
    epsr_a = sig_a * 50e-6 / EPS0
    epsr_b = sig_b * 100e-6 / EPS0
    epsr = np.array([0, epsr_a, epsr_b])
    case, sc, hier, w = _column_problem(sig_a, sig_b)

    period, S = 1e-3, 128
    t, i = biphasic_pulse_samples(period, 5e-3, 0.2e-3, n_samples=S,
                                  ipg_s=0.05e-3)
    harm = waveform_harmonics(i, period)
    ref = harmonic_transfer(sc, hier, harm, epsr, probe_weights=w,
                            tol=1e-9)
    rom = harmonic_transfer(sc, hier, harm, epsr, probe_weights=w,
                            tol=1e-9, rom_snapshots=40)
    assert rom["converged"].all()
    k_act = len(rom["active_harmonics"])
    assert rom["n_full"] <= k_act // 2, (rom["n_full"], k_act)
    scale = np.abs(ref["transfer"]).max()
    np.testing.assert_allclose(rom["transfer"], ref["transfer"],
                               rtol=1e-5, atol=1e-7 * scale)


def test_lapicque_threshold_harmonic_convergence():
    """The membrane-integrated threshold must be converged in the
    harmonic cutoff: doubling n_harm moves it < 1% once the cutoff
    clears the membrane band (the tau_m lowpass kills the tail)."""
    from pelvistim_fem_tpu.ops.nerve import (af_profiles_batch,
                                             path_interp_plan,
                                             straight_path,
                                             waveform_threshold_scale)
    from pelvistim_fem_tpu.ops.waveform import pulse_af_response

    sig_a, sig_b = 0.05, 0.35
    epsr_b = sig_b * 100e-6 / EPS0
    case, sc, hier, _ = _column_problem(sig_a, sig_b)
    h = 0.0025
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA + DB, int((DA + DB) / h) + 1)
    pts = straight_path(np.array([L_XY / 2, L_XY / 2, 0.002]),
                        np.array([L_XY / 2, L_XY / 2, DA + DB - 0.002]),
                        n_points=81)
    plan = path_interp_plan((xs, xs, zs), np.asarray(sc.grid_index),
                            sc.grid_shape, pts)
    ds = np.linalg.norm(pts[1] - pts[0])

    period, S = 2e-3, 512
    t, i = biphasic_pulse_samples(period, 5e-3, 0.2e-3, n_samples=S)
    thr = {}
    for n_harm in (48, 96):
        res = pulse_af_response(sc, hier, plan, ds, i, period,
                                epsr_table=np.array([0, 0.0, epsr_b]),
                                window_m=3 * h, n_harm=n_harm, tol=1e-8)
        assert res["converged"].all()
        thr[n_harm] = waveform_threshold_scale(res["af_ts"], period / S,
                                               1.0)
    assert abs(thr[96] - thr[48]) <= 0.01 * thr[96]

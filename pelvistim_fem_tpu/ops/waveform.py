"""Time-domain stimulation waveforms on the EQS system.

The reference pipeline is purely STATIC: each contact state is one real
sigma_contact and the programmed pulse only ever enters as a DC ampere
number (step04 run_pressure_sweep.py:55-215, step03
run_layered_sweep.py:459-504).  Physically the electrode-tissue
interface is capacitive, so the field during a biphasic pulse is a
charging transient the reference cannot express.  This module computes
it, two independent ways that cross-validate each other:

1. **Fourier synthesis** (periodic steady state, any dispersion).  The
   EQS system is LTI: for a T-periodic injected current with one-sided
   harmonics c_k at f_k = k/T, the steady-state potential is

       phi(t) = sum_k s_k Re[ c_k Phi_k e^{i w_k t} ],

   where Phi_k is the unit-current complex field at f_k and s_k the
   one-sided scale (1 for DC/Nyquist, 2 otherwise).  Harmonic fields
   come from ONE batched certified complex solve over the harmonic
   axis (ops/eqs.py — zero re-assembly, Cole-Cole dispersion included);
   synthesis is a tiny dense contraction.  TPU shape: the expensive
   axis (harmonics) is a vmapped material-table batch, exactly like a
   conductivity sweep.

2. **Crank-Nicolson transient** (arbitrary waveforms, constant
   permittivity).  Charge conservation div(sigma grad phi
   + eps d/dt grad phi) = 0 semi-discretizes to C dphi/dt + G phi =
   b(t) where BOTH C (permittivity stiffness) and G (conductivity
   stiffness) are combinations of the SAME per-body stencil
   coefficients with different material tables, so each CN step

       (C/dt + G/2) phi_{n+1} = (C/dt - G/2) phi_n + (b_n + b_{n+1})/2

   is one MG-preconditioned CG solve with a FIXED combined table —
   a lax.scan over right-hand sides on one compiled operator.

The two paths discretize time in unrelated ways (trigonometric
interpolation vs A-stable stepping); their agreement on the periodic
steady state is the validation contract (tests/test_waveform.py), with
the series-RC layer stack as the closed-form anchor.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.eqs import EPS0, batched_eqs_solve_refined
from pelvistim_fem_tpu.ops.multigrid import MGHierarchy, make_v_cycle
from pelvistim_fem_tpu.ops.solve import preconditioned_cg, require_x64
from pelvistim_fem_tpu.ops.stencil import (StencilCase, combine_coeffs,
                                           stencil_spmv)

__all__ = [
    "WaveformHarmonics", "biphasic_pulse_samples", "waveform_harmonics",
    "synthesize_series", "harmonic_transfer", "pulse_response",
    "pulse_af_response", "solve_stencil_eqs_transient",
]


# ── waveforms and their one-sided spectra (host numpy — tiny) ────────────────

def biphasic_pulse_samples(period_s, amp_A, pw_s, *, ipg_s=0.0,
                           n_samples=4096, cathodic_first=True):
    """(t (S,), i (S,)) one period of a charge-balanced rectangular
    biphasic pulse: phase 1 of width pw_s, inter-phase gap ipg_s,
    phase 2 of equal width and opposite sign, then off until period_s.

    Samples are taken at t_j = j * period / S (left edges), which makes
    the DFT of the samples the exact trigonometric interpolant used by
    waveform_harmonics/synthesize_series.
    """
    if 2 * pw_s + ipg_s > period_s:
        raise ValueError("pulse phases do not fit in the period")
    t = np.arange(n_samples) * (period_s / n_samples)
    sgn = -1.0 if cathodic_first else 1.0
    i = np.zeros(n_samples)
    i[t < pw_s] = sgn * amp_A
    second = (t >= pw_s + ipg_s) & (t < 2 * pw_s + ipg_s)
    i[second] = -sgn * amp_A
    return t, i


class WaveformHarmonics(NamedTuple):
    """One-sided harmonic decomposition of a periodic waveform.

    coeffs are rfft(i)/S (complex128); scale is the one-sided synthesis
    factor (1 for DC and the even-S Nyquist bin, 2 otherwise) so that
      x(t) = sum_k scale_k * Re(coeffs_k * exp(i 2 pi freqs_k t))
    reproduces the samples EXACTLY at the sample points when all bins
    are kept (trigonometric interpolation)."""
    freqs_hz: np.ndarray     # (K,) harmonic frequencies, freqs_hz[0] = 0
    coeffs: np.ndarray       # (K,) complex128 rfft(i)/S
    scale: np.ndarray        # (K,) float64 one-sided factors
    period_s: float


def waveform_harmonics(i_samples, period_s, n_harm=None):
    """Decompose one uniformly-sampled period into WaveformHarmonics.

    n_harm: keep harmonics 0..n_harm (None = all rfft bins, exact
    interpolation).  Truncation keeps the lowest bins — fine for
    synthesis away from waveform discontinuities."""
    i_samples = np.asarray(i_samples, np.float64)
    S = len(i_samples)
    c = np.fft.rfft(i_samples) / S
    freqs = np.fft.rfftfreq(S, d=period_s / S)
    scale = np.full(len(c), 2.0)
    scale[0] = 1.0
    if S % 2 == 0:
        scale[-1] = 1.0          # Nyquist bin is not doubled
    if n_harm is not None:
        keep = min(n_harm + 1, len(c))
        c, freqs, scale = c[:keep], freqs[:keep], scale[:keep]
    return WaveformHarmonics(freqs_hz=freqs, coeffs=c, scale=scale,
                             period_s=float(period_s))


def synthesize_series(harm: WaveformHarmonics, transfer, times_s):
    """Periodic steady-state time series through complex transfer(s).

    transfer: (K,) or (K, P) complex per-harmonic transfer values
    (e.g. Z(f_k) in ohms for the electrode voltage, or per-probe field
    transfers from pulse_response).  Returns (T,) or (T, P) float64:
      y(t) = sum_k scale_k * Re(c_k H_k e^{i w_k t}).
    With transfer = 1 this reproduces the input waveform exactly at its
    sample points (host numpy — the result is tiny)."""
    H = np.asarray(transfer, np.complex128)
    squeeze = H.ndim == 1
    if squeeze:
        H = H[:, None]
    t = np.atleast_1d(np.asarray(times_s, np.float64))
    w = 2 * np.pi * harm.freqs_hz
    # (T, K) complex phases x (K, P) weighted transfers
    ph = np.exp(1j * np.outer(t, w))
    wk = (harm.scale * harm.coeffs)[:, None] * H
    y = np.real(ph @ wk)
    return y[:, 0] if squeeze else y


# ── harmonic fields: one batched certified complex solve ────────────────────

def harmonic_transfer(scase: StencilCase, hier: MGHierarchy,
                      harm: WaveformHarmonics, epsr_table=None, *,
                      probe_weights, kr_table=None, kr_tables=None,
                      ki_tables=None, I_inject_A=None, coeff_rtol=1e-9,
                      tol=1e-8, shard_mesh=None, rom_snapshots=None,
                      **kw):
    """Per-harmonic complex probe transfers (K, P) [V per injected A].

    probe_weights: (P, N) real weights in mesh-node ordering (each row
    e.g. an electrode patch average or a point probe), OR a sparse
    gather plan (ids (P, 8), wts (P, 8)) from nerve.path_interp_plan —
    the dense (P, N) matrix never materializes, so path probing works
    at megatet N.  epsr_table: (T,) constant permittivities; or pass
    explicit (K, T) kr/ki tables from
    eqs.dispersive_tables(harm.freqs_hz, ...) for Cole-Cole tissue.

    Harmonics whose |c_k| <= coeff_rtol * max|c| are SKIPPED (zero
    transfer recorded): a symmetric biphasic pulse has no even
    harmonics, so this halves the batch.  Diagnostics cross the tunnel
    as (K_active,) scalars only — never a full field.

    rom_snapshots: route the active harmonics through the greedy
    certified reduced basis (ops/rom.py, capacity = this many basis
    rows) instead of the full batch — the harmonic axis spans ~2
    decades, so ~a dozen complex solves certify hundreds of
    harmonics at the same per-harmonic 1e-8 certificate.  Sweep-scale
    grids only (the basis holds (B, cap, G) f64 — ~7 GB at megatet
    G); incompatible with shard_mesh."""
    K = len(harm.freqs_hz)
    if ki_tables is None:
        if epsr_table is None:
            raise ValueError("pass epsr_table or explicit ki_tables")
        om = 2 * np.pi * np.asarray(harm.freqs_hz, np.float64)
        ki_tables = jnp.asarray(om)[:, None] * (
            EPS0 * jnp.asarray(epsr_table, jnp.float64))[None, :]
    mag = np.abs(harm.coeffs)
    active = mag > coeff_rtol * (mag.max() if mag.size else 0.0)
    idx = np.nonzero(active)[0]
    ki_a = jnp.asarray(ki_tables)[jnp.asarray(idx)]
    kr_a = None
    if kr_tables is not None:
        kr_a = jnp.asarray(kr_tables)[jnp.asarray(idx)]
    elif kr_table is not None:
        # one static sigma table for every harmonic (e.g. a contact
        # state); frequency dependence lives in ki only
        kr_a = jnp.tile(jnp.asarray(kr_table, jnp.float64),
                        (len(idx), 1))

    n_full = None
    if rom_snapshots:
        if shard_mesh is not None:
            raise ValueError("rom_snapshots and shard_mesh are "
                             "mutually exclusive")
        from pelvistim_fem_tpu.ops.rom import rom_spectrum_refined
        if kr_a is None:
            kr_a = jnp.tile(scase.sigma_table.astype(jnp.float64)
                            [None], (len(idx), 1))
        romout = rom_spectrum_refined(scase, hier, ki_a, kr_a, tol=tol,
                                      max_snapshots=rom_snapshots)
        phi = jnp.asarray(romout["phi"])
        residual = np.asarray(romout["residual"])
        iterations = np.int32(0)
        n_full = romout["n_full"]
    elif shard_mesh is not None:
        # harmonic axis over devices (parallel/sweep.py pads to a
        # device multiple and replicates the operator)
        from pelvistim_fem_tpu.parallel.sweep import \
            sharded_eqs_solve_refined
        out = sharded_eqs_solve_refined(scase, hier, ki_a, kr_a,
                                        shard_mesh, tol=tol, **kw)
        phi, residual = out.phi, np.asarray(out.residual)
        iterations = np.asarray(out.iterations)
    else:
        out = batched_eqs_solve_refined(scase, hier, ki_a, kr_a,
                                        tol=tol, **kw)
        phi, residual = out.phi, np.asarray(out.residual)
        iterations = np.asarray(out.iterations)
    if I_inject_A is None:
        I_inject_A = float(jnp.sum(scase.b_neumann))
    hp = jax.lax.Precision.HIGHEST   # TPU default contraction is bf16
    if isinstance(probe_weights, tuple):
        ids, wts = probe_weights     # (P, 8) path gather plan
        n_probes = ids.shape[0]
        gat = phi[:, :, jnp.asarray(ids)]              # (K, 2, P, 8)
        V = jnp.einsum("kcpj,pj->kcp", gat,
                       jnp.asarray(wts, jnp.float64), precision=hp)
    else:
        W = jnp.asarray(np.asarray(probe_weights, np.float64))
        n_probes = W.shape[0]
        V = jnp.einsum("kcn,pn->kcp", phi, W, precision=hp)
    V = np.asarray(V) / I_inject_A                     # (K_act, 2, P)

    H = np.zeros((K, n_probes), np.complex128)
    H[idx] = V[:, 0] + 1j * V[:, 1]
    res = {
        "transfer": H,                    # (K, P) volts per ampere
        "active_harmonics": idx,
        "iterations": iterations,
        "residual": residual,
        "converged": residual <= tol,     # host-derived: no bool readback
    }
    if n_full is not None:
        res["n_full"] = n_full
    return res


def pulse_response(scase: StencilCase, hier: MGHierarchy,
                   i_samples, period_s, probe_weights, *,
                   epsr_table=None, kr_table=None, kr_tables=None,
                   ki_tables=None, n_harm=None, times_s=None,
                   I_inject_A=None, tol=1e-8, **kw):
    """End-to-end periodic pulse response at probe weight vectors.

    Decomposes the sampled waveform, solves the active harmonics as one
    certified complex batch, and synthesizes y(t) (T, P).  times_s
    defaults to the waveform's own sample instants (where the
    trigonometric interpolation is exact).  Returns the
    harmonic_transfer dict plus "times_s", "series" (T, P) and
    "harmonics"."""
    harm = waveform_harmonics(i_samples, period_s, n_harm=n_harm)
    res = harmonic_transfer(scase, hier, harm, epsr_table,
                            probe_weights=probe_weights,
                            kr_table=kr_table, kr_tables=kr_tables,
                            ki_tables=ki_tables,
                            I_inject_A=I_inject_A, tol=tol, **kw)
    if times_s is None:
        S = len(np.asarray(i_samples))
        times_s = np.arange(S) * (period_s / S)
    res["times_s"] = np.asarray(times_s, np.float64)
    res["series"] = synthesize_series(harm, res["transfer"], times_s)
    res["harmonics"] = harm
    return res


# ── Crank-Nicolson transient on the stencil operator ─────────────────────────

@partial(jax.jit, static_argnames=("dt_s", "theta", "tol", "maxiter",
                                   "nu", "coarse_iters"))
def solve_stencil_eqs_transient(scase: StencilCase, hier: MGHierarchy,
                                epsr_table, scale_t, probe_weights, *,
                                dt_s, theta=0.5, tol=1e-10,
                                maxiter=2_000, nu=2, coarse_iters=24,
                                phi0=None):
    """Theta-method integration of C dphi/dt + G phi = s(t) b.

    C = permittivity stiffness, G = conductivity stiffness — both are
    combine_coeffs of scase.coeff with different tables, so the step
    operator (C/dt + theta G) is ONE fixed combined stencil and each
    step is an MG-preconditioned CG solve warm-started from the
    previous field, inside a lax.scan over the drive samples.

    theta = 0.5 is Crank-Nicolson (O(dt^2), A-stable): use it when
    every body has epsr > 0 (physically always true).  If some body is
    modeled with epsr = 0, C is rank-deficient and the system is a DAE
    whose algebraic modes CN propagates undamped (they alternate sign);
    use theta = 1 (implicit Euler, L-stable) there.

    scale_t: (S,) drive scale per step boundary — both the Neumann load
    and the Dirichlet values are scaled by s(t) (current- and voltage-
    mode pulses).  Step n advances from s_{n} to s_{n+1} (s_{-1} -> s_0
    uses phi0, default 0 — start from an off interval).  epsr_table:
    (T,) CONSTANT relative permittivities (Cole-Cole dispersion is not
    rational in i*omega; use the Fourier path for dispersive tissue).
    probe_weights: (P, N) node-ordering weights traced per step.

    Runs entirely in f64 (require_x64): each step's CG residual is a
    true f64 residual of the theta-method system.  Returns
    (phi_final (N,), probes (S, P), iterations (S,)).
    """
    require_x64("solve_stencil_eqs_transient")
    f64 = lambda a: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
    scase, hier = f64(scase), f64(hier)
    ce = EPS0 * jnp.asarray(epsr_table, jnp.float64)
    sig = scase.sigma_table
    lhs_tab = ce / dt_s + theta * sig
    rhs_tab = ce / dt_s - (1.0 - theta) * sig
    A_lhs = combine_coeffs(scase.coeff, lhs_tab)
    A_rhs = combine_coeffs(scase.coeff, rhs_tab)
    free = scase.free

    def op(x):
        z = jnp.where(free, x, 0.0)
        return jnp.where(free, stencil_spmv(z, A_lhs), x)

    M = make_v_cycle(hier, lhs_tab, nu=nu, coarse_iters=coarse_iters)
    Mp = lambda r: jnp.where(free, M(jnp.where(free, r, 0.0)), r)

    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    lift_lhs = stencil_spmv(phi_d, A_lhs)      # per unit drive scale
    W = jnp.asarray(probe_weights, jnp.float64)
    hp = jax.lax.Precision.HIGHEST
    gi = scase.grid_index

    if phi0 is None:
        phi0 = jnp.zeros_like(scase.dirichlet)
    scale_t = jnp.asarray(scale_t, jnp.float64)
    s_prev0 = jnp.float64(0.0)    # assume off before t=0

    def step(carry, s_next):
        phi, s_prev = carry
        # phi carries its own Dirichlet rows (already scaled by s_prev)
        rhs = stencil_spmv(phi, A_rhs) \
            + ((1.0 - theta) * s_prev
               + theta * s_next) * scase.b_neumann
        b_eff = jnp.where(free, rhs - s_next * lift_lhs,
                          s_next * scase.dirichlet)
        res = preconditioned_cg(op, b_eff, Mp,
                                jnp.where(free, phi,
                                          s_next * scase.dirichlet),
                                tol=tol, maxiter=maxiter)
        probe = jnp.einsum("pn,n->p", W,
                           res.phi.reshape(-1)[gi], precision=hp)
        return (res.phi, s_next), (probe, res.iterations)

    (phi, _), (probes, iters) = jax.lax.scan(
        step, (phi0, s_prev0), scale_t)
    return phi.reshape(-1)[gi], probes, iters


def pulse_af_response(scase: StencilCase, hier: MGHierarchy, plan,
                      path_ds_m, i_samples, period_s, *,
                      epsr_table=None, kr_table=None, kr_tables=None,
                      ki_tables=None, window_m, n_harm=None,
                      I_inject_A=None, tol=1e-8, **kw):
    """Time-resolved activating function along a fiber path for a
    periodic stimulation waveform in (dispersive) tissue.

    plan: (ids (P, 8), wts (P, 8)) gather plan from
    nerve.path_interp_plan on EQUALLY spaced path points with spacing
    path_ds_m.  One batched certified complex solve over the active
    harmonics gives the complex path-potential transfers; synthesis +
    the windowed-quadratic AF stencil (nerve.af_profiles_batch) give
    AF(t, s).  Returns the pulse_response dict plus "af_ts" (T, P,
    V/m^2, NaN at path ends) — feed nerve.waveform_threshold_scale for
    the Lapicque (membrane-integrated) recruitment threshold, which
    reduces to the exponential strength-duration law for rectangular
    pulses in non-dispersive tissue (tests/test_waveform.py)."""
    from pelvistim_fem_tpu.ops.nerve import af_profiles_batch
    res = pulse_response(scase, hier, i_samples, period_s, plan,
                         epsr_table=epsr_table, kr_table=kr_table,
                         kr_tables=kr_tables, ki_tables=ki_tables,
                         n_harm=n_harm, I_inject_A=I_inject_A, tol=tol,
                         **kw)
    res["af_ts"] = af_profiles_batch(res["series"], path_ds_m,
                                     window_m)
    return res

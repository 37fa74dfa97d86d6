"""Myelinated-fiber cable dynamics: McNeal + CRRSS nodal membranes.

ops/nerve.py's recruitment chain is a first-order surrogate by its own
admission (fiber_thresholds: "NOT a cable simulation") — activating
function + Weiss strength-duration + (d_ref/d)^2 scaling.  This module
is the cable simulation those surrogates approximate: McNeal's (1976)
compartment model of a myelinated fiber — perfectly insulating
internodes, active nodes of Ranvier — with the CRRSS mammalian nodal
kinetics (Chiu-Ritchie-Rogart-Stagg as adapted by Sweeney 1987; 37 C,
fast Na + leak, the standard model for extracellular stimulation of
large motor/autonomic fibers).  The extracellular potentials along the
path come from the SAME certified FEM solves that feed the AF chain
(nerve.sample_phi_on_lattice / path_interp_plan); amplitude scaling is
exact by linearity of the volume conductor.

Nodal ODEs (V relative to rest, mV, ms):

    C dV_n/dt = G_a (V_{n-1} - 2 V_n + V_{n+1}
                     + Ve_{n-1} - 2 Ve_n + Ve_{n+1})
                - A_node [g_Na m^2 h (V_n - E_Na) + g_L (V_n - E_L)]

TPU-first discretization: the linear cable term is integrated by
Crank-Nicolson with a PRE-FACTORED dense propagator — the per-step
update is two (N, N) matmuls (MXU work, N = number of nodes), not a
sequential tridiagonal sweep; gates use exact exponential-Euler; the
ionic current is explicit.  Time is one lax.scan; fibers, amplitudes
and pulse widths batch by vmap (threshold search = fixed-depth
bisection, each probe a full scan).  Everything is module-level jitted
(axon retrace rule, CLAUDE.md).

The reference pipeline has no excitability model at all (its outputs
stop at field metrics — step03 run_layered_sweep.py extract_results);
this closes the stimulation question the whole pipeline exists to ask.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["CRRSS", "FiberGeometry", "build_fiber", "simulate_fiber",
           "fiber_activated", "threshold_scale_bisect",
           "conduction_velocity"]

# CRRSS nodal membrane (Sweeney 1987 / Rattay-Aberham 1993 form),
# 37 C, V in mV relative to rest (V_rest = -80 mV):
#   alpha_m = (97 + 0.363 V) / (1 + exp((31 - V)/5.3))      [1/ms]
#   beta_m  = alpha_m / exp((V - 23.8)/4.17)
#   beta_h  = 15.6 / (1 + exp((24 - V)/10))
#   alpha_h = beta_h / exp((V - 5.5)/5)
# Steady state at V = 0: m0 = 0.0033, h0 = 0.750.
CRRSS = dict(
    g_na=1445.0,      # mS/cm^2
    g_l=128.0,        # mS/cm^2
    e_na=115.0,       # mV (relative to rest)
    e_l=-0.01,        # mV
    c_m=2.5,          # uF/cm^2
    rho_i=54.7,       # ohm cm (axoplasm)
)


def _rates(v):
    a_m = (97.0 + 0.363 * v) / (1.0 + jnp.exp((31.0 - v) / 5.3))
    b_m = a_m / jnp.exp((v - 23.8) / 4.17)
    b_h = 15.6 / (1.0 + jnp.exp((24.0 - v) / 10.0))
    a_h = b_h / jnp.exp((v - 5.5) / 5.0)
    return a_m, b_m, a_h, b_h


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FiberGeometry:
    """Pre-factored per-fiber propagator (build_fiber).

    All stepping arrays are (N, N)/(N,) f64; dt_ms is static metadata
    carried for diagnostics only.
    """
    M_impl: jax.Array     # (N, N)  (I - dt/2C L)^-1
    M_expl: jax.Array     # (N, N)  (I + dt/2C L)
    M_src: jax.Array      # (N, N)  dt/C * (I - dt/2C L)^-1 L  (Ve path)
    inv_c: jax.Array      # ()      dt / C_node   [ms/uF]
    area: jax.Array       # ()      nodal area [cm^2] (scales I_ion)
    dt_ms: float = dataclasses.field(metadata=dict(static=True),
                                     default=0.001)


def build_fiber(D_um, n_nodes, dt_ms=0.001, *, d_ratio=0.7,
                node_len_um=1.5, L_over_D=100.0, passing=True):
    """Host-side setup for a fiber of outer diameter D_um with n_nodes
    nodes of Ranvier (McNeal geometry: internode L = 100 D, axon
    d = 0.7 D, nodal gap 1.5 um).

    Crank-Nicolson splits the cable Laplacian L (sealed ends): the
    returned dense matrices make one time step
        V' = M_impl @ (M_expl @ V) + M_src @ Ve - inv_c*area_ion_term,
    i.e. exclusively matmuls — the batched (fibers x amps) threshold
    search runs on the MXU instead of a sequential tridiagonal sweep.

    passing=True (default) models a fiber that TRAVERSES the sampled
    window: the two terminal compartments receive no extracellular
    drive (Ve treated as locally constant there), because a sealed end
    inside a nonzero field otherwise acts as a virtual electrode and
    the truncation point — an artifact of where the sampling window
    ends, not anatomy — sets the threshold (measured on the S3 path:
    truncation-end triggering shifted thresholds 2-3x as the window
    length changed).  Spike CONDUCTION through the ends is untouched.
    Set passing=False only for a fiber that anatomically terminates in
    the field.
    """
    D_cm = D_um * 1e-4
    d_cm = d_ratio * D_cm                       # axon diameter
    L_cm = L_over_D * D_cm                      # internodal spacing
    l_node = node_len_um * 1e-4
    area = np.pi * d_cm * l_node                # nodal membrane [cm^2]
    c_node = CRRSS["c_m"] * area                # uF
    # internodal axoplasmic conductance [mS]: G_a = pi d^2/(4 rho L),
    # rho in ohm cm -> 1/(ohm) = S -> mS factor 1e3
    g_a = 1e3 * np.pi * d_cm * d_cm / (4.0 * CRRSS["rho_i"] * L_cm)

    n = int(n_nodes)
    lap = np.zeros((n, n))
    idx = np.arange(n)
    lap[idx, idx] = -2.0
    lap[idx[:-1], idx[:-1] + 1] = 1.0
    lap[idx[1:], idx[1:] - 1] = 1.0
    lap[0, 0] = lap[-1, -1] = -1.0              # sealed ends
    lap *= g_a / c_node                         # [1/ms]

    eye = np.eye(n)
    m_impl = np.linalg.inv(eye - 0.5 * dt_ms * lap)
    m_expl = eye + 0.5 * dt_ms * lap
    # Ve enters through the same cable Laplacian; CN-average both
    # endpoints is overkill for sampled Ve — mid-step evaluation keeps
    # O(dt^2) (tests pin strength-duration + velocity, not Ve phase)
    lap_src = lap.copy()
    if passing:
        lap_src[0, :] = 0.0         # no Ve drive at the truncation
        lap_src[-1, :] = 0.0        # compartments (see docstring)
    m_src = dt_ms * (m_impl @ lap_src)
    return FiberGeometry(M_impl=jnp.asarray(m_impl, jnp.float64),
                         M_expl=jnp.asarray(m_expl, jnp.float64),
                         M_src=jnp.asarray(m_src, jnp.float64),
                         inv_c=jnp.float64(dt_ms / c_node),
                         area=jnp.float64(area),
                         dt_ms=float(dt_ms))


def _gate_init(n):
    return (jnp.full(n, 0.0033, jnp.float64),
            jnp.full(n, 0.7503, jnp.float64))


def _step(fib, carry, ve_mid):
    """One CN/exponential-Euler step.  ve_mid: (N,) extracellular mV
    at the step midpoint."""
    v, m, h = carry
    i_ion = (CRRSS["g_na"] * m * m * h * (v - CRRSS["e_na"])
             + CRRSS["g_l"] * (v - CRRSS["e_l"]))       # mS/cm^2 * mV
    rhs = fib.M_expl @ v - fib.inv_c * fib.area * i_ion
    v_n = fib.M_impl @ rhs + fib.M_src @ ve_mid
    # physiological clamp: far-above-threshold drives (bisection
    # probes amp_hi first) would overflow the explicit ionic term;
    # near threshold v stays within [-100, 130] and the clamp is inert
    v_n = jnp.clip(v_n, -200.0, 300.0)
    a_m, b_m, a_h, b_h = _rates(v_n)
    dt_ms = fib.dt_ms
    m_inf, tau_m = a_m / (a_m + b_m), 1.0 / (a_m + b_m)
    h_inf, tau_h = a_h / (a_h + b_h), 1.0 / (a_h + b_h)
    m_n = m_inf + (m - m_inf) * jnp.exp(-dt_ms / tau_m)
    h_n = h_inf + (h - h_inf) * jnp.exp(-dt_ms / tau_h)
    return (v_n, m_n, h_n)


@partial(jax.jit, static_argnames=("record",))
def simulate_fiber(fib: FiberGeometry, ve_mV, *, record=False):
    """Integrate the fiber response to ve_mV (T, N) extracellular
    potentials at the nodes (mV, sampled at step midpoints).

    Returns dict: v_peak (N,) per-node max depolarization, v_final
    (N,), activated (bool — any node crossed +80 mV, i.e. 0 mV
    absolute), t_peak (N,) step index of the per-node maximum, and
    (record=True) v (T, N) the full trace.
    """
    n = fib.M_impl.shape[0]
    v0 = jnp.zeros(n, jnp.float64)
    m0, h0 = _gate_init(n)

    def body(carry, ve):
        state = _step(fib, carry[0], ve)
        v = state[0]
        peak, tpk, k = carry[1], carry[2], carry[3]
        upd = v > peak
        return ((state, jnp.where(upd, v, peak),
                 jnp.where(upd, k, tpk), k + 1),
                v if record else None)

    init = ((v0, m0, h0), v0, jnp.zeros(n, jnp.int32), jnp.int32(0))
    (state, peak, tpk, _), trace = lax.scan(body, init, ve_mV)
    out = {"v_peak": peak, "v_final": state[0], "t_peak": tpk,
           "activated": jnp.max(peak) > 80.0}
    if record:
        out["v"] = trace
    return out


def fiber_activated(fib, ve_mV):
    """bool: does this extracellular drive elicit a propagating spike
    (any node crossing 0 mV absolute = +80 mV relative)?"""
    return simulate_fiber(fib, ve_mV)["activated"]


@partial(jax.jit, static_argnames=("n_iter",))
def threshold_scale_bisect(fib: FiberGeometry, ve_unit_mV, *,
                           amp_hi=64.0, n_iter=26):
    """Threshold amplitude multiplier on a unit-drive spatiotemporal
    profile ve_unit_mV (T, N): fixed-depth bisection in LOG amplitude
    over [1e-8 amp_hi, amp_hi] (log space because the threshold's
    scale is unknown a priori — a linear grid's resolution would be
    amp_hi/2^n, easily coarser than the threshold itself; 26 geometric
    halvings pin it to ~3e-7 relative regardless of scale; activation
    is monotone in amplitude for single monophasic/biphasic pulses).
    Returns +inf when amp_hi does not activate.  vmap over fibers/
    paths/pulse widths for population studies — every probe is one
    fused scan.
    """
    def active(a):
        return simulate_fiber(fib, a * ve_unit_mV)["activated"]

    def body(_, lohi):
        lo, hi = lohi
        mid = jnp.sqrt(lo * hi)
        act = active(mid)
        return (jnp.where(act, lo, mid), jnp.where(act, mid, hi))

    hi0 = jnp.float64(amp_hi)
    lo, hi = lax.fori_loop(0, n_iter, body, (1e-8 * hi0, hi0))
    ok = active(hi0)
    return jnp.where(ok, jnp.sqrt(lo * hi), jnp.inf)


def conduction_velocity(fib, ve_mV, D_um, *, skip=3):
    """m/s from the per-node spike-peak times of an activated fiber:
    linear fit of t_peak vs node position over the outward propagation
    limb (nodes `skip`.. end, away from the stimulation site at the
    array maximum).  Host-side diagnostic."""
    out = simulate_fiber(fib, ve_mV)
    tpk = np.asarray(out["t_peak"], np.float64) * fib.dt_ms  # ms
    if not bool(out["activated"]):
        return np.nan
    n0 = int(np.argmax(np.asarray(out["v_peak"])))
    L_mm = 100.0 * D_um * 1e-3                   # internode in mm
    nodes = np.arange(fib.M_impl.shape[0])
    sel = nodes >= n0 + skip
    if sel.sum() < 3:
        raise ValueError("too few nodes beyond the stimulation site")
    x_mm = nodes[sel] * L_mm
    t_ms = tpk[sel]
    a, _b = np.polyfit(t_ms, x_mm, 1)            # mm/ms == m/s
    return float(a)

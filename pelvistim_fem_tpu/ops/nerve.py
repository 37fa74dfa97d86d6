"""Nerve recruitment metrics: the activating function along axon paths.

The driver's stretch configuration asks for "activating-function nerve
recruitment metrics" (BASELINE.json configs[4]); the reference itself
stops at ROI field averages.  Implemented here per Rattay's classic
cable-model result: for an axon along arclength s in an extracellular
potential phi, the source term driving membrane (de)polarization is the
activating function

    AF(s) = d^2 phi / ds^2      [V/m^2]

(positive AF depolarizes).  phi is sampled along the path by trilinear
interpolation on the solution lattice, and AF by central second
differences at spacing ds (a surrogate for the internodal spacing).
"""

from __future__ import annotations

import numpy as np


def sample_phi_on_lattice(mesh, phi, points):
    """Trilinear interpolation of nodal phi at arbitrary points inside
    the (undeformed) lattice.  points (P, 3) -> (P,) values.

    Uses the mesh's lattice provenance; carved (non-mesh) lattice nodes
    contribute phi = 0, so paths must stay inside tissue.  Interpolation
    assumes undeformed lattice coordinates — electrode rim snapping only
    perturbs nodes within half a cell of footprint rims, far from any
    physiological nerve path.
    """
    lat = mesh.lattice
    if lat is None:
        raise ValueError("mesh has no lattice provenance")
    xs, ys, zs = (np.asarray(a) for a in lat.axes)
    X, Y, Z = lat.grid_shape
    grid_phi = np.zeros(X * Y * Z)
    grid_phi[lat.grid_index] = np.asarray(phi, np.float64)
    grid_phi = grid_phi.reshape(X, Y, Z)

    pts = np.asarray(points, np.float64)

    def locate(axis, v):
        i = np.searchsorted(axis, v, side="right") - 1
        i = np.clip(i, 0, len(axis) - 2)
        t = (v - axis[i]) / (axis[i + 1] - axis[i])
        return i, np.clip(t, 0.0, 1.0)

    ix, tx = locate(xs, pts[:, 0])
    iy, ty = locate(ys, pts[:, 1])
    iz, tz = locate(zs, pts[:, 2])

    out = np.zeros(len(pts))
    for dx in (0, 1):
        wx = tx if dx else 1 - tx
        for dy in (0, 1):
            wy = ty if dy else 1 - ty
            for dz in (0, 1):
                wz = tz if dz else 1 - tz
                out += wx * wy * wz * grid_phi[ix + dx, iy + dy, iz + dz]
    return out


def straight_path(p0, p1, n_points=201):
    """(P, 3) equally spaced points on the segment p0 -> p1."""
    t = np.linspace(0.0, 1.0, n_points)[:, None]
    return np.asarray(p0)[None] * (1 - t) + np.asarray(p1)[None] * t


def polyline_path(waypoints, n_points=201, max_iters=64):
    """(P, 3) points along a waypoint polyline with EQUAL CHORD
    spacing — curved nerve trajectories (real roots bend around bone)
    for the AF machinery, which requires uniform point spacing.

    Plain equal-ARCLENGTH resampling cuts corners: the chord that
    straddles a bend is shorter than its arclength step (measured 3.5%
    on a 1 cm bend), violating the uniform-spacing contract.  A few
    fixed-point iterations reallocate the arclength parameters until
    consecutive chords equalize (quadratic corner effect -> fast
    convergence).  Endpoints are reproduced exactly; densify the
    waypoints for smooth curves."""
    w = np.asarray(waypoints, np.float64)
    if w.ndim != 2 or w.shape[0] < 2 or w.shape[1] != 3:
        raise ValueError("waypoints must be (K>=2, 3)")
    seg = np.linalg.norm(np.diff(w, axis=0), axis=1)
    if np.any(seg <= 0):
        raise ValueError("duplicate consecutive waypoints")
    s = np.concatenate([[0.0], np.cumsum(seg)])

    def interp(si):
        out = np.empty((len(si), 3))
        for d in range(3):
            out[:, d] = np.interp(si, s, w[:, d])
        return out

    si = np.linspace(0.0, s[-1], n_points)
    for _ in range(max_iters):
        pts = interp(si)
        c = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        dev = (c.max() - c.min()) / c.mean()
        if dev < 1e-12:
            break
        cum = np.concatenate([[0.0], np.cumsum(c)])
        si = np.interp(np.linspace(0.0, cum[-1], n_points), cum, si)
    return interp(si)


def path_interp_plan(axes, grid_index, grid_shape, points):
    """Host-side trilinear sampling plan: (ids (P, 8) int32 mesh-node
    indices, wts (P, 8) f64) such that phi_path = (phi[ids] * wts).sum(-1)
    for ANY phi in mesh node ordering — including a device array, making
    path sampling across a SWEEP one tiny device gather per lane instead
    of a full-field readback (a megatet lane is ~9 MB through the axon
    tunnel; 8 x 201 gathered scalars are nothing).

    Grid slots not present in the mesh (carved cells) get weight 0 —
    identical to sample_phi_on_lattice's zero-fill convention.
    """
    xs, ys, zs = (np.asarray(a) for a in axes)
    X, Y, Z = grid_shape
    inv = np.full(X * Y * Z, -1, np.int64)
    inv[np.asarray(grid_index)] = np.arange(len(np.asarray(grid_index)))

    pts = np.asarray(points, np.float64)

    def locate(axis, v):
        i = np.searchsorted(axis, v, side="right") - 1
        i = np.clip(i, 0, len(axis) - 2)
        t = (v - axis[i]) / (axis[i + 1] - axis[i])
        return i, np.clip(t, 0.0, 1.0)

    ix, tx = locate(xs, pts[:, 0])
    iy, ty = locate(ys, pts[:, 1])
    iz, tz = locate(zs, pts[:, 2])

    ids = np.zeros((len(pts), 8), np.int64)
    wts = np.zeros((len(pts), 8))
    c = 0
    for dx in (0, 1):
        wx = tx if dx else 1 - tx
        for dy in (0, 1):
            wy = ty if dy else 1 - ty
            for dz in (0, 1):
                wz = tz if dz else 1 - tz
                lin = ((ix + dx) * Y + (iy + dy)) * Z + (iz + dz)
                m = inv[lin]
                present = m >= 0
                ids[:, c] = np.where(present, m, 0)
                wts[:, c] = np.where(present, wx * wy * wz, 0.0)
                c += 1
    return ids.astype(np.int32), wts


def activating_function(mesh, phi, path_points, *, window_m=None):
    """AF(s) = d^2 phi/ds^2 along a polyline of EQUALLY spaced points.

    The sampled phi is a piecewise-trilinear interpolant, so raw central
    second differences at sub-cell spacing are zero inside cells and
    spike at cell boundaries.  AF is therefore extracted by a moving
    local QUADRATIC least-squares fit over a window of physical length
    `window_m` (default: 3x the largest lattice spacing, i.e. the
    curvature averaged over the scale a node of Ranvier actually sees).
    Returns dict with the sampled profile and recruitment summaries.
    """
    pts = np.asarray(path_points, np.float64)
    if window_m is None:
        h_max = max(float(np.diff(np.asarray(a)).max())
                    for a in mesh.lattice.axes)
        window_m = 3.0 * h_max
    v = sample_phi_on_lattice(mesh, phi, pts)
    return af_from_profile(v, _path_ds(pts), window_m)


def _path_ds(pts):
    seg = np.linalg.norm(np.diff(np.asarray(pts, np.float64), axis=0),
                         axis=1)
    ds = float(seg.mean())
    # 1e-6 relative: immaterial to the quadratic AF fit, loose enough
    # for chord-equalized curved polylines (polyline_path)
    if seg.size and (seg.max() - seg.min()) > 1e-6 * max(ds, 1e-12):
        raise ValueError("path points must be equally spaced")
    return ds


def af_from_profile(v, ds, window_m):
    """activating_function's fit core on a PRE-SAMPLED equally spaced
    potential profile v (e.g. gathered on device across a sweep via
    path_interp_plan)."""
    v = np.asarray(v, np.float64)
    s = np.arange(len(v)) * ds
    half = max(2, int(round(window_m / 2 / ds)))

    af = np.full_like(v, np.nan)
    for i in range(half, len(v) - half):
        # symmetric windows only — one-sided fits at the path ends bias
        # the curvature estimate by up to ~20%
        lo, hi = i - half, i + half + 1
        x = s[lo:hi] - s[i]
        c = np.polyfit(x, v[lo:hi], 2)
        af[i] = 2.0 * c[0]

    e_tan = np.gradient(v, ds)          # tangential E = -d phi/ds
    interior = np.isfinite(af)
    af_in = af[interior]
    s_in = s[interior]
    i_max = int(np.argmax(af_in)) if af_in.size else 0
    return {
        "s": s,
        "phi": v,
        "af": af,
        "e_tangential": -e_tan,
        "ds": ds,
        "window_m": window_m,
        "max_AF": float(af_in.max()) if af_in.size else np.nan,
        "min_AF": float(af_in.min()) if af_in.size else np.nan,
        "argmax_AF_s": float(s_in[i_max]) if af_in.size else np.nan,
        "peak_E_tangential": float(np.abs(e_tan).max()),
    }


def recruitment_threshold_scale(af_result, af_threshold_V_per_m2):
    """Linear-scaling estimate: the factor by which the injected current
    must be multiplied for max AF to reach a given activation threshold
    (the quasi-static problem is linear in I)."""
    m = af_result["max_AF"]
    if not np.isfinite(m) or m <= 0:
        return np.inf
    return float(af_threshold_V_per_m2) / m


def discrete_activating_function(mesh, phi, path_points, internode_m):
    """McNeal's DISCRETE cable driving term: the second difference of
    the extracellular potential at the TRUE internodal spacing,

        f_n = phi(s - L) - 2 phi(s) + phi(s + L)        [V],

    which is what actually enters a myelinated fiber's node equations
    (the smooth AF above is its L -> 0 limit divided by L^2).  Because
    internodal spacing grows with fiber diameter (L ~ 100 d), evaluating
    f_n at each diameter's own L captures the large-fiber-first
    recruitment order without any ad-hoc scaling.

    path_points must be equally spaced; L is rounded to the nearest
    whole number of path steps (>= 1).  Returns dict with the profile
    (NaN within L of the ends) and its extrema.

    Resolution requirement: the sampled potential is the mesh's
    piecewise-(tri)linear interpolant, which has NO curvature inside a
    cell — f_n is meaningful only for L at least ~2x the local lattice
    spacing (error ~ h^2/(2 L^2) relative on smooth fields); below that
    it degenerates to interpolation noise.  Fibers whose internodal
    spacing is under the mesh resolution should use the window-fitted
    `activating_function` (curvature averaged over the resolvable
    scale) with the L^2 scaling applied analytically, as
    `fiber_thresholds` does.
    """
    pts = np.asarray(path_points, np.float64)
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    ds = float(seg.mean())
    if seg.size and (seg.max() - seg.min()) > 1e-9 * max(ds, 1e-12):
        raise ValueError("path points must be equally spaced")
    k = max(1, int(round(internode_m / ds)))
    v = sample_phi_on_lattice(mesh, phi, pts)
    f = np.full_like(v, np.nan)
    if len(v) > 2 * k:
        f[k:-k] = v[:-2 * k] - 2.0 * v[k:-k] + v[2 * k:]
    fin = f[np.isfinite(f)]
    return {
        "s": np.arange(len(pts)) * ds,
        "f": f,
        "L_m": k * ds,
        "max_f_V": float(fin.max()) if fin.size else np.nan,
        "min_f_V": float(fin.min()) if fin.size else np.nan,
    }


def strength_duration_factor(pw_s, chronaxie_s=150e-6):
    """Weiss/Lapicque strength-duration law: the threshold-current
    multiplier at pulse width PW relative to rheobase (PW -> inf),

        I_th(PW) = I_rheobase * (1 + t_chronaxie / PW).

    Chronaxie ~100-300 us for large myelinated fibers; the reference
    carries pulse width only into its charge-density metric
    (step04 run_pressure_sweep.py:617-625), never into recruitment."""
    pw_s = float(pw_s)
    if pw_s <= 0:
        raise ValueError("pulse width must be positive")
    return 1.0 + float(chronaxie_s) / pw_s


def fiber_thresholds(af_result, af_threshold_V_per_m2, diameters_um, *,
                     d_ref_um=10.0, diameter_exponent=2.0, pw_s=None,
                     chronaxie_s=150e-6):
    """Per-diameter threshold multipliers on the injected current.

    First-order surrogate (NOT a cable simulation): the discrete driving
    term f_n ~ L^2 AF with internodal spacing L ~ 100 d makes the
    threshold scale ~ (d_ref / d)^2 at fixed nodal dynamics
    (diameter_exponent tunable; Warman-style fits use 1.5-2), times the
    Weiss strength-duration factor when a pulse width is given.
    `af_result` and `af_threshold_V_per_m2` anchor the absolute scale at
    d_ref (same convention as recruitment_threshold_scale).  Returns
    (D,) threshold multipliers, inf where the path never depolarizes.
    """
    base = recruitment_threshold_scale(af_result, af_threshold_V_per_m2)
    d = np.asarray(diameters_um, np.float64)
    if np.any(d <= 0):
        raise ValueError("fiber diameters must be positive")
    # `is not None`, not falsy: pw_s = 0.0 must raise (a zero-width
    # pulse has INFINITE threshold, not the rheobase factor 1.0)
    sd = (strength_duration_factor(pw_s, chronaxie_s)
          if pw_s is not None else 1.0)
    return base * sd * (float(d_ref_um) / d) ** float(diameter_exponent)


def recruitment_curve(thresholds, amplitudes, weights=None):
    """Fraction of a fiber population recruited vs amplitude multiplier.

    thresholds: (D,) per-fiber threshold multipliers (fiber_thresholds);
    amplitudes: (A,) multipliers on the baseline injected current;
    weights: (D,) population weights (default uniform).  Returns (A,)
    recruited fraction — nondecreasing in amplitude by construction.
    """
    thr = np.asarray(thresholds, np.float64)
    amp = np.asarray(amplitudes, np.float64)
    if weights is None:
        w = np.full(thr.shape, 1.0 / max(len(thr), 1))
    else:
        w = np.asarray(weights, np.float64)
        w = w / w.sum()
    return (w[None, :] * (thr[None, :] <= amp[:, None])).sum(axis=1)


# ── waveform-aware recruitment (time-resolved driving term) ─────────────────

def af_fit_kernel(ds, window_m):
    """(kernel (2*half+1,), half): the moving windowed-quadratic
    second-derivative fit of af_from_profile expressed as a fixed
    correlation stencil — on an EQUALLY spaced profile the LSQ fit is a
    linear operator, so a whole (time x path) batch of AF profiles is
    one matmul instead of T x P polyfits."""
    half = max(2, int(round(window_m / 2 / ds)))
    x = np.arange(-half, half + 1) * float(ds)
    X = np.stack([x * x, x, np.ones_like(x)], axis=1)
    pinv = np.linalg.solve(X.T @ X, X.T)         # (3, W) LSQ solve
    return 2.0 * pinv[0], half


def af_profiles_batch(v, ds, window_m):
    """af_from_profile's curvature estimator on a BATCH of profiles
    v (..., P) (e.g. the (T, P) time-resolved path potential from
    waveform.pulse_response).  Returns (..., P) with NaN within half a
    window of the path ends — bitwise-identical estimator to the
    per-profile polyfit loop (tests/test_waveform.py pins this)."""
    v = np.asarray(v, np.float64)
    kernel, half = af_fit_kernel(ds, window_m)
    win = np.lib.stride_tricks.sliding_window_view(
        v, 2 * half + 1, axis=-1)
    af = np.full(v.shape, np.nan)
    af[..., half:v.shape[-1] - half] = win @ kernel
    return af


def membrane_lowpass_periodic(x, dt, tau_m):
    """Periodic steady state of the first-order membrane filter
    tau_m y' + y = x along axis 0 (time), via the frequency response
    Y_k = X_k / (1 + i w_k tau_m) — exact for the trigonometric
    interpolant the Fourier synthesis path produces."""
    x = np.asarray(x, np.float64)
    w = 2 * np.pi * np.fft.rfftfreq(x.shape[0], d=dt)
    H = 1.0 / (1.0 + 1j * w * float(tau_m))
    H = H.reshape((-1,) + (1,) * (x.ndim - 1))
    return np.fft.irfft(np.fft.rfft(x, axis=0) * H, n=x.shape[0],
                        axis=0)


def waveform_threshold_scale(af_ts, dt, af_threshold_V_per_m2, *,
                             tau_m_s=216e-6):
    """Waveform-aware recruitment threshold: Lapicque leaky integration
    of the time-resolved driving term.

    The passive node membrane integrates the AF drive with time
    constant tau_m; threshold is on the PEAK of the filtered response
    over (time x path).  For a rectangular pulse of width pw in
    non-dispersive tissue this reduces to the classic exponential
    strength-duration law I_th ~ 1/(1 - e^(-pw/tau_m)) (Lapicque 1907;
    chronaxie = tau_m ln 2, so the 150 us chronaxie used by
    fiber_thresholds corresponds to tau_m = 216 us).  In DISPERSIVE
    tissue the intra-pulse AF is no longer rectangular (capacitive
    creep/droop), and this path captures the threshold shift the
    separable Weiss factor cannot.

    af_ts: (T, P) periodic AF time course (af_profiles_batch output;
    NaN path-end columns are ignored).  Returns the multiplier on the
    injected current for the filtered peak to reach threshold.
    """
    af_ts = np.asarray(af_ts, np.float64)
    cols = np.isfinite(af_ts).all(axis=0)
    if not cols.any():
        return np.inf
    y = membrane_lowpass_periodic(af_ts[:, cols], dt, tau_m_s)
    peak = y.max()
    if not np.isfinite(peak) or peak <= 0:
        return np.inf
    return float(af_threshold_V_per_m2) / peak

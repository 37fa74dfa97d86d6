"""A-posteriori error estimation + adaptive lattice regrading.

The reference has NO error estimation: mesh resolution is a hand-chosen
characteristic length (lc_global / lc_electrode / lc_skin_min — step03
params.yaml:67-70) and the only quality signal is the 2% flux-balance
banner (run_layered_sweep.py:883-891), which certifies conservation,
not accuracy.  This module closes that loop with the Zienkiewicz-Zhu
(ZZ) recovered-gradient estimator: any P1 solve yields per-element
energy-norm error indicators at the cost of ONE volume-weighted nodal
averaging plus one quadrature contraction — zero extra solves, all
device-side, vmappable across sweep lanes like every other metric.

For tensor-product lattices (every generated mesh in this framework)
the indicators drive 1-D knot equidistribution: project the element
indicators onto each axis, rebuild the knot vector so equal error mass
falls in each interval, and re-mesh.  Locked knots (layer boundaries,
electrode footprint edges — the features `graded_axis` pins) are
preserved, so adapted meshes stay geometry-conforming.

Math: with g_h = grad phi_h constant per tet and G* the volume-weighted
nodal recovery (fields.nodal_average — superconvergent on mesh-pattern
interiors), d = G*|_e - g_h is LINEAR on each tet, so the energy-norm
indicator integrates exactly via int lambda_i lambda_j = V(1+delta_ij)/20:

    eta_e^2 = int_e d^T sigma d dV
            = V/20 * [ s(sum_i d_i, sum_i d_i) + sum_i s(d_i, d_i) ],

s(a, b) = a^T sigma b (scalar or 3x3 per-body sigma, like cell_J).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops.fields import cell_gradient, nodal_average

__all__ = ["zz_recovered_gradient", "zz_error_indicators",
           "zz_global_error", "adapt_axis", "lattice_axis_weights",
           "goal_dual_case", "zz_goal_indicators", "zz_goal_bound",
           "adapt_recipe", "zz_error_indicators_eqs",
           "zz_global_error_eqs", "waveform_zz_bound"]

_HP = jax.lax.Precision.HIGHEST


def zz_recovered_gradient(case, phi):
    """(N, 3) ZZ-recovered nodal gradient: the volume-weighted average
    of the incident tets' constant P1 gradients."""
    return nodal_average(case, cell_gradient(case, phi))


def _recovered_by_body(case, g, n_bodies):
    """(B, N, 3) per-body recovered gradients: body b's recovery
    averages ONLY over body-b tets.  At a material interface the true
    gradient is DISCONTINUOUS (flux continuity divides it by the sigma
    jump), so a global average there is wrong by O(1) regardless of h
    — at this problem family's 7000x contrasts the naive indicator
    saturates at the interfaces and never converges.  Per-body patches
    restore the smooth-field recovery on each side (the standard
    discontinuous-coefficient ZZ fix).  Nodes a body never touches get
    a guarded 0/eps entry that no element of that body reads."""
    from pelvistim_fem_tpu.ops import assembly
    n = case.nodes.shape[0]
    ones4 = jnp.ones((1, 4), g.dtype)
    outs = []
    for b in range(n_bodies):
        w = case.vol * (case.tet_body == b)
        den = assembly.scatter_to_nodes(
            w[:, None] * ones4, case.scatter_perm,
            case.scatter_segids, n)
        num = [assembly.scatter_to_nodes(
            (w * g[:, k])[:, None] * ones4, case.scatter_perm,
            case.scatter_segids, n) for k in range(3)]
        outs.append(jnp.stack(num, axis=1)
                    / jnp.maximum(den, 1e-300)[:, None])
    return jnp.stack(outs)


def _sigma_bilinear(sig_e, a, b):
    """s(a, b) = a^T sigma b per element; sig_e (M,) or (M, 3, 3),
    a/b (M, ..., 3) with matching leading axes."""
    if sig_e.ndim == 3:
        sb = jnp.einsum("mde,m...e->m...d", sig_e, b, precision=_HP)
    else:
        sb = sig_e.reshape(sig_e.shape + (1,) * (b.ndim - 1)) * b
    return jnp.sum(a * sb, axis=-1)


@partial(jax.jit, static_argnames=("by_body",))
def zz_error_indicators(case, phi, sigma_table=None, *, by_body=True):
    """Per-element ZZ energy-norm error indicators eta_e, shape (M,).

    eta_e^2 approximates int_e |grad(phi - phi_h)|_sigma^2; the exact
    quadrature of the linear recovery mismatch is in the module
    docstring.  sigma_table (T,) or (T, 3, 3) overrides
    case.sigma_table (zero-re-assembly sweeps).

    by_body=True (default) recovers gradients within each body
    separately — REQUIRED for layered tissue: across a sigma jump the
    true gradient is discontinuous and the global average is O(1)
    wrong there (pinned by the P1-exact two-layer test, where the
    naive indicator reports large spurious interface error on an
    exactly-resolved solution).  by_body=False is the textbook
    single-material form."""
    tab = case.sigma_table if sigma_table is None else sigma_table
    g = cell_gradient(case, phi)                       # (M, 3)
    if by_body and int(tab.shape[0]) > 1:
        Gb = _recovered_by_body(case, g, int(tab.shape[0]))
        Gs_e = Gb[case.tet_body[:, None], case.tets]   # (M, 4, 3)
    else:
        Gs_e = nodal_average(case, g)[case.tets]
    d = Gs_e - g[:, None, :]                           # (M, 4, 3)
    sig_e = tab[case.tet_body]
    diag = jnp.sum(_sigma_bilinear(sig_e, d, d), axis=1)     # (M,)
    ds = jnp.sum(d, axis=1)                            # (M, 3)
    tot = _sigma_bilinear(sig_e, ds, ds)               # (M,)
    eta2 = case.vol / 20.0 * (tot + diag)
    return jnp.sqrt(jnp.maximum(eta2, 0.0))


@jax.jit
def zz_global_error(case, phi, sigma_table=None):
    """(eta, rel): global estimated energy error sqrt(sum eta_e^2) and
    the same relative to the solution's energy norm
    sqrt(sum_e V_e g^T sigma g) — the number a mesh-acceptance gate
    wants (reference analogue: none; its banner checks flux balance,
    not discretization error)."""
    tab = case.sigma_table if sigma_table is None else sigma_table
    eta = zz_error_indicators(case, phi, sigma_table)
    g = cell_gradient(case, phi)
    en2 = jnp.sum(case.vol * _sigma_bilinear(tab[case.tet_body], g, g))
    eta_g = jnp.sqrt(jnp.sum(eta * eta))
    return eta_g, eta_g / jnp.sqrt(jnp.maximum(en2, 1e-300))


def zz_error_indicators_eqs(case, phi2, kr_table, ki_table, *,
                            by_body=True):
    """ZZ indicators for a complex (EQS) field in the stacked-real
    (2, N) layout every ops/eqs solver uses: the recovery is linear,
    so it applies to Re and Im components independently; the energy
    weight is the admittivity MODULUS |kappa| per body (the natural
    norm for the complex-symmetric form — phase carries no error
    magnitude).  Scalar tables only (the tensor-EQS path keeps its
    own norm choices).  Returns (M,) eta_e = sqrt(eta_re^2 +
    eta_im^2)."""
    kr = jnp.asarray(kr_table)
    ki = jnp.asarray(ki_table)
    if kr.ndim != 1 or ki.ndim != 1:
        raise ValueError("zz_error_indicators_eqs: scalar kappa "
                         "tables only")
    kmag = jnp.sqrt(kr * kr + ki * ki)
    er = zz_error_indicators(case, phi2[0], kmag, by_body=by_body)
    ei = zz_error_indicators(case, phi2[1], kmag, by_body=by_body)
    return jnp.sqrt(er * er + ei * ei)


def zz_global_error_eqs(case, phi2, kr_table, ki_table):
    """(eta, rel) for a stacked-real complex field — rel against the
    |kappa|-weighted energy norm of the complex gradient."""
    eta_e = zz_error_indicators_eqs(case, phi2, kr_table, ki_table)
    eta = jnp.sqrt(jnp.sum(eta_e * eta_e))
    kmag = jnp.sqrt(jnp.asarray(kr_table) ** 2
                    + jnp.asarray(ki_table) ** 2)[case.tet_body]
    gr = cell_gradient(case, phi2[0])
    gi = cell_gradient(case, phi2[1])
    en2 = jnp.sum(case.vol * kmag
                  * (jnp.sum(gr * gr, axis=1)
                     + jnp.sum(gi * gi, axis=1)))
    return eta, eta / jnp.sqrt(jnp.maximum(en2, 1e-300))


def waveform_zz_bound(case, phi_harm, coeffs, kr_tables, ki_tables):
    """Time-domain discretization-error bound for a Fourier-
    synthesized (ops/waveform) periodic steady state.

    The synthesis is phi(t) = Re sum_k c_k phi_k e^{i w_k t}, so at
    EVERY instant the |kappa|-weighted energy error obeys the triangle
    bound ||err(t)|| <= sum_k |c_k| eta_k with eta_k the complex ZZ
    estimate of harmonic k — one vmapped indicator pass over the
    already-solved harmonic batch, zero extra solves.

    phi_harm (K, 2, N) stacked-real harmonic fields (ACTIVE harmonics
    only, matching coeffs); coeffs (K,) complex Fourier coefficients;
    kr_tables/ki_tables (K, T) scalar admittivity tables per harmonic.
    Returns dict: eta_harm (K,), bound, ref (the same triangle
    composition of the harmonic energy norms) and rel = bound / ref.
    """
    c = np.abs(np.asarray(coeffs, np.complex128))
    kr = jnp.asarray(kr_tables, jnp.float64)
    ki = jnp.asarray(ki_tables, jnp.float64)
    ph = jnp.asarray(phi_harm, jnp.float64)

    def one(p2, krk, kik):
        return zz_global_error_eqs(case, p2, krk, kik)

    eta_k, rel_k = jax.vmap(one)(ph, kr, ki)
    eta_k = np.asarray(eta_k)
    en_k = eta_k / np.maximum(np.asarray(rel_k), 1e-300)
    en_k = np.where(eta_k > 0, en_k, 0.0)
    # harmonics with eta == 0 (exact or empty) contribute 0 to the
    # bound; their energy still needs counting for ref — recompute
    # the trivial case lazily only if it ever matters (exact fields
    # in production waveforms do not happen; tests construct them,
    # and there bound == 0 regardless of ref)
    bound = float(np.sum(c * eta_k))
    ref = float(np.sum(c * en_k))
    return {"eta_harm": eta_k, "bound": bound, "ref": ref,
            "rel": bound / max(ref, 1e-300)}


def goal_dual_case(case, q):
    """The dual (adjoint) problem of a linear goal J(phi) = q^T phi:
    K psi = q with HOMOGENEOUS Dirichlet data on the primal's
    constrained nodes (K is symmetric, so the adjoint operator is the
    primal operator; only the data changes).  Solve with any of the
    case solvers — same operator, same preconditioner class.

    q (N,): the goal's nodal weights (e.g. membership/vol weights of
    ROI nodes for a mean-potential goal).  Entries on Dirichlet nodes
    are irrelevant (masked by the solver)."""
    import dataclasses

    qv = jnp.asarray(q)
    return dataclasses.replace(
        case, dirichlet_vals=jnp.zeros_like(case.dirichlet_vals),
        b_neumann=qv.astype(case.dirichlet_vals.dtype))


def zz_goal_indicators(case, phi, psi, sigma_table=None):
    """Dual-weighted (goal-oriented / DWR) element indicators
    w_e = eta_e(phi) * eta_e(psi).

    From Galerkin orthogonality, the error of a linear goal J = q^T phi
    satisfies |J(u) - J(u_h)| = |a(u - u_h, z - z_h)|
    <= sum_e |u - u_h|_{E,e} |z - z_h|_{E,e} — each factor estimated
    by the ZZ indicator of the respective solution.  Adapting on w_e
    targets the GOAL's accuracy, refining only where primal error and
    dual influence coincide (e.g. an ROI metric ignores electrode-rim
    error on the far electrode, which energy-driven adaptation would
    chase)."""
    return (zz_error_indicators(case, phi, sigma_table)
            * zz_error_indicators(case, psi, sigma_table))


def zz_goal_bound(case, phi, psi, sigma_table=None):
    """Estimated upper bound on |J(u) - J(u_h)| for the linear goal
    whose dual solution is psi: sum_e eta_e(phi) eta_e(psi).
    Cauchy-Schwarz per element — typically overestimates the true goal
    error by a modest factor (cancellation between elements is
    ignored), which is the honest side to err on."""
    return jnp.sum(zz_goal_indicators(case, phi, psi, sigma_table))


def lattice_axis_weights(case, mesh, knots_xyz, eta, *, power=2):
    """Project per-tet indicators onto the three lattice axes.

    Host-side (adaptation runs once per cycle, not per solve): each
    tet's eta^power is binned by its centroid's knot interval on each
    axis — robust to carved lattices (layered_slab removes cells
    outside the footprint polygon), unlike tet-index arithmetic.

    power=2 (default) for energy indicators (mass = eta_e^2, whose sum
    is the squared global estimate); power=1 for GOAL indicators from
    zz_goal_indicators, which are already the per-element bound
    contributions (both scale as h^2 per cell, so adapt_axis's
    cube-root density law applies unchanged).

    Returns [wx, wy, wz]: per-interval error mass (len(knots)-1,) each.
    """
    eta2 = np.asarray(eta, np.float64) ** power
    cc = np.asarray(mesh.nodes)[np.asarray(case.tets)].mean(axis=1)
    out = []
    for ax, knots in enumerate(knots_xyz):
        k = np.asarray(knots, np.float64)
        idx = np.clip(np.searchsorted(k, cc[:, ax]) - 1, 0, len(k) - 2)
        out.append(np.bincount(idx, weights=eta2, minlength=len(k) - 1))
    return out


def adapt_axis(knots, w_cell, n_cells, *, keep=(), floor=0.02,
               h_min=None):
    """New monotone knot vector equidistributing error mass.

    knots (K+1,) current axis; w_cell (K,) nonnegative per-interval
    error mass (lattice_axis_weights output); n_cells: interval count
    of the ADAPTED axis.  keep: coordinates that must remain exact
    knots (layer boundaries, electrode footprint edges — the same
    features graded_axis pins); cells are allocated to kept segments
    proportional to their error mass (>= 1 each).  floor: every
    interval keeps at least floor * max(w)/len density so zero-error
    regions still get coverage (and the density never vanishes).
    h_min caps refinement (conditioning guard, like _fill_segment's
    sliver merge).

    Equidistribution density rho_i = w_i^(1/3) / len_i: with local
    energy-error mass per length m(x) = C(x)^2 h(x)^2 (P1: eta ~ h|u''|
    per cell), minimizing total err^2 = int C^2 h^2 dx subject to
    int dx/h = n_cells gives h ~ C^(-2/3), i.e. knot density
    n(x) ~ C^(2/3) = (m / h_old^2)^(1/3) = (w_i / len_i^3)^(1/3).
    Equidistributing the raw mass w_i/len_i instead over-concentrates
    cubically (measured: it made the sin*sinh test case WORSE —
    dev/estimate_measure.py).
    """
    k = np.asarray(knots, np.float64)
    w = np.asarray(w_cell, np.float64)
    if len(k) != len(w) + 1:
        raise ValueError(f"knots ({len(k)}) must be w_cell ({len(w)})+1")
    lo, hi = k[0], k[-1]
    kept = np.unique(np.concatenate(
        [[lo, hi], np.asarray(list(keep), np.float64)]))
    kept = kept[(kept >= lo - 1e-12) & (kept <= hi + 1e-12)]
    seg_edges = kept
    n_seg = len(seg_edges) - 1
    if n_cells < n_seg:
        raise ValueError(f"n_cells={n_cells} < {n_seg} kept segments")

    lens = np.diff(k)
    rho = np.cbrt(w) / np.maximum(lens, 1e-300)
    rho = np.maximum(rho, floor * rho.max() if rho.max() > 0 else 1.0)
    # cumulative error mass F (piecewise linear, strictly increasing)
    F = np.concatenate([[0.0], np.cumsum(rho * lens)])

    def mass(a, b):
        return np.interp(b, k, F) - np.interp(a, k, F)

    seg_mass = np.array([mass(seg_edges[s], seg_edges[s + 1])
                         for s in range(n_seg)])
    # proportional cell allocation, >= 1 per segment, exact total
    alloc = np.maximum(1, np.floor(
        n_cells * seg_mass / seg_mass.sum()).astype(int))
    while alloc.sum() > n_cells:
        alloc[np.argmax(alloc)] -= 1
    while alloc.sum() < n_cells:
        # largest mass-per-cell gets the spare
        alloc[np.argmax(seg_mass / alloc)] += 1

    new = [lo]
    for s in range(n_seg):
        a, b = seg_edges[s], seg_edges[s + 1]
        m = alloc[s]
        Fa, Fb = np.interp(a, k, F), np.interp(b, k, F)
        levels = Fa + (Fb - Fa) * np.arange(1, m) / m
        # invert the monotone piecewise-linear F on [a, b]
        xs = np.interp(levels, F, k)
        seg_knots = np.concatenate([xs, [b]])
        if h_min is not None:
            # enforce minimum spacing left-to-right (and against the
            # fixed segment end b, which must survive verbatim)
            prev = a
            out = []
            for x in seg_knots[:-1]:
                if x - prev >= h_min and b - x >= h_min:
                    out.append(x)
                    prev = x
            seg_knots = np.concatenate([out, [b]])
        new.extend(seg_knots.tolist())
    arr = np.array(new)
    # dedupe (kept points can coincide with equidistribution points)
    return arr[np.concatenate([[True], np.diff(arr) > 1e-12])]


def adapt_recipe(recipe, case, mesh, eta, *, keep_x=(), keep_y=(),
                 keep_z=(), n_cells_xyz=None, power=2, h_min=None):
    """One estimate->regrade cycle on a LatticeRecipe: equidistribute
    the projected error mass on each axis and return a NEW recipe with
    the same classifier callbacks (mesh/generate.LatticeRecipe is the
    single source of truth, so the regraded mesh keeps the exact
    geometry/BC semantics).

    keep_z MUST include the layer-interface z knots (bodies are
    classified by cell centroid: a knot drifting across an interface
    would change the effective layer thickness); electrode footprint
    circles are carved by centroid test and need no locked x/y knots
    — the indicators re-discover the rim refinement on their own.
    n_cells_xyz: target interval counts (defaults to the current
    counts — pure redistribution at equal cost).  power=1 for goal
    indicators (see lattice_axis_weights)."""
    import dataclasses

    knots = (recipe.xs, recipe.ys, recipe.zs)
    w = lattice_axis_weights(case, mesh, knots, eta, power=power)
    if n_cells_xyz is None:
        n_cells_xyz = tuple(len(k) - 1 for k in knots)
    keeps = (keep_x, keep_y, keep_z)
    new = [adapt_axis(k, wk, n, keep=kp, h_min=h_min)
           for k, wk, n, kp in zip(knots, w, n_cells_xyz, keeps)]
    return dataclasses.replace(recipe, xs=new[0], ys=new[1], zs=new[2])

"""Pennes bioheat solves: tissue temperature rise from Joule heating.

The reference's safety story stops at surrogate quantities — charge
density vs a 1 mC/cm^2 limit (step04 run_pressure_sweep.py:617-625) and
peak skin |J|.  The quantity regulators actually bound is TEMPERATURE
RISE (IEC 60601-2-10: surface devices <= ~1-2 degC).  The steady Pennes
equation

    div(k grad T) + w_b c_b (T_core - T) + q = 0,       q = J . E

is elliptic with the SAME P1 discretization as the conduction problem:
thermal stiffness = the existing element stiffness with k per body,
perfusion = a lumped mass term (SPD diagonal shift), skin convection =
a Robin boundary term (lumped boundary mass), and the heat source is
`ops/fields.cell_power_density` of the solved electrical field — so the
electrical -> thermal chain runs entirely on device with the machinery
already in the framework.

Sign conventions: we solve for the ABSOLUTE temperature T with
Dirichlet T = T_core on the deep (z-min) boundary, Robin
-k dT/dn = h (T - T_air) on every other exterior face, and perfusion
pulling toward T_core.  All parameters are literature-order
placeholders in the reference's own PLACEHOLDER spirit (step03
params.yaml:4-6).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops import assembly
from pelvistim_fem_tpu.ops.solve import SolveResult, preconditioned_cg

# literature-order defaults [W/(m K)] and perfusion rho*c*w [W/(m^3 K)]
DEFAULT_K = {"muscle": 0.49, "fat": 0.21, "skin": 0.37, "contact": 0.3,
             "core": 0.5, "bone": 0.32}
DEFAULT_PERFUSION = {"muscle": 2700.0, "fat": 500.0, "skin": 7400.0,
                     "contact": 0.0, "core": 6000.0, "bone": 200.0}
H_AIR = 10.0          # skin-air convection [W/(m^2 K)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BioheatCase:
    """Thermal problem bound to an electrical Case's mesh arrays."""
    kvol: jax.Array          # (M,) k_e * vol_e
    diag_extra: jax.Array    # (N,) lumped perfusion + Robin diagonal
    b_fixed: jax.Array       # (N,) perfusion*T_core + Robin*T_air load
    mass_lump: jax.Array     # (N,) lumped volume per node (q -> load)
    free: jax.Array          # (N,) bool
    dirichlet: jax.Array     # (N,) T_core on the deep boundary


def build_bioheat_case(case, k_table, perf_table, *, T_core=37.0,
                       T_air=25.0, h_air=H_AIR, core_z_tol=1e-6):
    """Assemble the thermal problem on an electrical Case's mesh.

    k_table / perf_table: (n_bodies + 1,) per-body thermal conductivity
    [W/mK] and perfusion rho*c*w [W/m^3K] (index 0 unused).  The deep
    boundary (faces within core_z_tol of the mesh z-min) is Dirichlet
    T_core; every other exterior face gets the Robin air-convection
    term.  Host-side numpy (matches compute_bc_host's discipline: no
    device round trips)."""
    nodes = np.asarray(case.nodes, np.float64)
    tets = np.asarray(case.tets)
    body = np.asarray(case.tet_body)
    vol = np.asarray(case.vol, np.float64)
    faces = np.asarray(case.faces)
    farea = np.asarray(case.face_area, np.float64)
    n = nodes.shape[0]

    k_table = np.asarray(k_table, np.float64)
    perf_table = np.asarray(perf_table, np.float64)
    kvol = k_table[body] * vol

    # lumped volume mass: vol/4 to each vertex
    mass = np.zeros(n)
    np.add.at(mass, tets.reshape(-1), np.repeat(vol / 4.0, 4))
    perf_lump = np.zeros(n)
    np.add.at(perf_lump, tets.reshape(-1),
              np.repeat(perf_table[body] * vol / 4.0, 4))

    fcen_z = nodes[faces, 2].mean(axis=1)
    zmin = nodes[:, 2].min()
    is_core = fcen_z <= zmin + core_z_tol
    robin = ~is_core

    # lumped Robin boundary mass: h * area/3 per vertex
    diag_rob = np.zeros(n)
    np.add.at(diag_rob, faces[robin].reshape(-1),
              np.repeat(h_air * farea[robin] / 3.0, 3))

    free = np.ones(n, dtype=bool)
    free[np.unique(faces[is_core])] = False
    dirichlet = np.full(n, T_core)

    b_fixed = perf_lump * T_core + diag_rob * T_air

    f = case.vol.dtype
    return BioheatCase(
        kvol=jnp.asarray(kvol, f),
        diag_extra=jnp.asarray(perf_lump + diag_rob, f),
        b_fixed=jnp.asarray(b_fixed, f),
        mass_lump=jnp.asarray(mass, f),
        free=jnp.asarray(free),
        dirichlet=jnp.asarray(dirichlet, f),
    )


def lumped_heat_load(case, q_cell):
    """(N,) nodal heat load: vol/4-lumped per-cell volumetric heating
    [W] — shared by the element and stencil thermal solvers."""
    n = case.free_mask.shape[0]
    contrib = (q_cell * case.vol / 4.0)[:, None] * jnp.ones(
        (1, 4), q_cell.dtype)
    return assembly.scatter_to_nodes(contrib, case.scatter_perm,
                                     case.scatter_segids, n)


def _thermal_operator(case, bh):
    n = bh.free.shape[0]

    def raw(x):
        return assembly.spmv(x, case.tets, case.grads, bh.kvol,
                             case.scatter_perm, case.scatter_segids,
                             n) + bh.diag_extra * x

    free = bh.free

    def op(x):
        return jnp.where(free, raw(jnp.where(free, x, 0.0)), x)

    t_d = jnp.where(free, 0.0, bh.dirichlet)
    return op, raw, t_d


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve_bioheat(case, bh: BioheatCase, q_cell, *, tol=1e-10,
                  maxiter=10_000) -> SolveResult:
    """Steady Pennes solve for the temperature field [degC].

    q_cell (M,) volumetric heating [W/m^3] — pass
    fields.cell_power_density(case, phi) for the Joule source (scaled
    by duty cycle for pulsed stimulation).  Jacobi-PCG; the thermal
    system is mildly conditioned (k contrast ~2, plus the SPD
    perfusion/Robin shift), so certified refinement is unnecessary —
    the returned residual is re-measured TRUE, not the CG recurrence.
    """
    op, raw, t_d = _thermal_operator(case, bh)
    n = bh.free.shape[0]
    b = lumped_heat_load(case, q_cell) + bh.b_fixed
    b_eff = jnp.where(bh.free, b - raw(t_d), bh.dirichlet)

    diag_k = assembly.scatter_to_nodes(
        _stiff_diag_contrib(case, bh.kvol), case.scatter_perm,
        case.scatter_segids, n)
    diag = jnp.where(bh.free, diag_k + bh.diag_extra, 1.0)
    minv = jnp.where(diag > 0, 1.0 / diag, 1.0)

    x0 = jnp.where(bh.free, jnp.asarray(37.0, b.dtype), bh.dirichlet)
    res = preconditioned_cg(op, b_eff, lambda r: minv * r, x0, tol=tol,
                            maxiter=maxiter)
    # report the re-measured true residual (cheap single apply)
    r = b_eff - op(res.phi)
    rel = jnp.linalg.norm(r) / jnp.maximum(jnp.linalg.norm(b_eff),
                                           1e-300)
    return SolveResult(phi=res.phi, iterations=res.iterations,
                       residual=rel, converged=rel <= tol)


@partial(jax.jit, static_argnames=("dt_s", "n_steps", "tol",
                                   "maxiter"))
def solve_bioheat_transient(case, bh: BioheatCase, q_cell, T_start, *,
                            rho_c=3.6e6, dt_s=60.0, n_steps=60,
                            tol=1e-8, maxiter=2_000,
                            trace_nodes=None, trace_ref=None):
    """Implicit-Euler transient Pennes: how FAST does the tissue heat?

        (C/dt + K_th) T_{n+1} = (C/dt) T_n + b,   C = rho_c * lumped mass

    The bioheat time constant rho_c / (w_b c_b) is ~10-25 min for
    perfused tissue — comparable to a stimulation session, so the
    steady-state rise is an upper bound the session may not reach;
    this gives the actual trajectory.  Implicit Euler's fixed point IS
    the steady solve_bioheat solution (dt-independent), so accuracy in
    dt only affects the PATH, never the asymptote.  Each step is one
    warm-started Jacobi-PCG solve inside a lax.scan.

    T_start: the initial field (pass the q=0 baseline steady state).
    trace_nodes: optional (P,) int32 node subset for the per-step
    maximum (e.g. skin nodes — the GLOBAL max is usually pinned at the
    37 degC Dirichlet core and never moves); default: all nodes.
    trace_ref: optional (N,) reference field SUBTRACTED before the max
    (pass the baseline so the trace is the pointwise stimulation-
    induced RISE — the hottest baseline node is generally not where
    the heating happens, so max(T) - max(T_base) understates it).
    Returns (T_final, trace (n_steps,)) for time-to-threshold
    reductions on host.
    """
    op, raw, t_d = _thermal_operator(case, bh)
    n = bh.free.shape[0]
    C_dt = rho_c * bh.mass_lump / dt_s
    b = lumped_heat_load(case, q_cell) + bh.b_fixed

    def op_t(x):
        return jnp.where(bh.free, op(x) + C_dt * jnp.where(
            bh.free, x, 0.0), x)

    diag_k = assembly.scatter_to_nodes(
        _stiff_diag_contrib(case, bh.kvol), case.scatter_perm,
        case.scatter_segids, n)
    diag = jnp.where(bh.free, diag_k + bh.diag_extra + C_dt, 1.0)
    minv = jnp.where(diag > 0, 1.0 / diag, 1.0)
    lift = raw(t_d)

    def step(T, _):
        # mass is LUMPED (diagonal), so fixed nodes contribute no C/dt
        # coupling to free rows — only the conduction lift appears
        b_eff = jnp.where(bh.free, b + C_dt * T - lift, bh.dirichlet)
        res = preconditioned_cg(op_t, b_eff, lambda r: minv * r, T,
                                tol=tol, maxiter=maxiter)
        probe = res.phi if trace_ref is None else res.phi - trace_ref
        if trace_nodes is not None:
            probe = probe[trace_nodes]
        return res.phi, jnp.max(probe)

    T, trace = jax.lax.scan(step, T_start, None, length=n_steps)
    return T, trace


def _stiff_diag_contrib(case, kvol):
    """(M, 4) per-element diagonal entries grad_a . grad_a * k * vol."""
    g = case.grads
    return jnp.einsum("mad,mad->ma", g, g,
                      precision=jax.lax.Precision.HIGHEST) * kvol[:, None]


def bioheat_grid_data(case, bh: BioheatCase, scase):
    """Grid-form (diag_extra, b_fixed, mass, free, dirichlet) for the
    stencil fast path: nodal vectors scattered into the StencilCase's
    grid layout via grid_index (host numpy, one-time)."""
    gi = np.asarray(scase.grid_index)
    shape = scase.grid_shape
    size = int(np.prod(shape))

    def to_grid(v, fill=0.0, dtype=None):
        out = np.full(size, fill, dtype or np.float64)
        out[gi] = np.asarray(v)
        return out.reshape(shape)

    free = np.zeros(size, dtype=bool)
    free[gi] = np.asarray(bh.free)
    return {
        "diag_extra": to_grid(bh.diag_extra),
        "b_fixed": to_grid(bh.b_fixed),
        "mass": to_grid(bh.mass_lump),
        "free": free.reshape(shape),
        "dirichlet": to_grid(bh.dirichlet),
    }


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve_bioheat_stencil(scase, k_table, grid, q_node, *,
                          tol=1e-10, maxiter=10_000) -> SolveResult:
    """Pennes on the STENCIL fast path: thermal stiffness = the same
    27-point body-factored stencils combined with the k table (the
    geometry is identical to the conduction operator), plus the lumped
    perfusion/Robin diagonal.  Jacobi-PCG: the thermal system is mildly
    conditioned (k contrast ~2 + SPD shift), iteration counts match the
    element path, and every iteration is a gather-free stencil apply —
    the 27-shifted-FMA speed advantage that makes this the fast path.
    (The conduction MG hierarchy is NOT reused: its coarse free masks
    encode the ELECTRODE Dirichlet pattern, and preconditioning the
    thermal core-plane BCs with it measured 3.6x MORE iterations than
    plain Jacobi.)

    grid: bioheat_grid_data(...); q_node: (N,) nodal heat load
    (lumped_heat_load), in MESH node ordering.  Returns phi in mesh
    node ordering like the other stencil solvers.
    """
    from pelvistim_fem_tpu.ops.stencil import (DIAG_OFFSET,
                                               combine_coeffs,
                                               stencil_spmv)
    C = combine_coeffs(scase.coeff, k_table)
    free = grid["free"]
    D = grid["diag_extra"]

    def raw(x):
        return stencil_spmv(x, C) + D * x

    def op(x):
        return jnp.where(free, raw(jnp.where(free, x, 0.0)), x)

    size = int(np.prod(scase.grid_shape))
    q_grid = jnp.zeros(size, q_node.dtype).at[scase.grid_index].set(
        q_node).reshape(scase.grid_shape)
    b = q_grid + grid["b_fixed"]
    t_d = jnp.where(free, 0.0, grid["dirichlet"])
    b_eff = jnp.where(free, b - raw(t_d), grid["dirichlet"])

    diag = jnp.where(free, C[DIAG_OFFSET] + D, 1.0)
    minv = jnp.where(diag > 0, 1.0 / diag, 1.0)
    x0 = jnp.where(free, jnp.asarray(37.0, b.dtype), grid["dirichlet"])
    res = preconditioned_cg(op, b_eff, lambda r: minv * r, x0, tol=tol,
                            maxiter=maxiter)
    r = b_eff - op(res.phi)
    rel = jnp.linalg.norm(r) / jnp.maximum(jnp.linalg.norm(b_eff),
                                           1e-300)
    phi = res.phi.reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi, iterations=res.iterations, residual=rel,
                       converged=rel <= tol)


def thermal_tables(n_bodies, k_by_body, perf_by_body):
    """(k_table, perf_table) from {body_id: value} dicts."""
    k = np.zeros(n_bodies + 1)
    p = np.zeros(n_bodies + 1)
    for b, v in k_by_body.items():
        k[b] = v
    for b, v in perf_by_body.items():
        p[b] = v
    return k, p


def skin_temperature_metrics(case, T, *, skin_body, T_ref=37.0,
                             skin_tets=None):
    """Max/mean temperature in the skin body + stimulation-induced
    rises.

    T_ref: the reference for the rise — pass the NO-STIMULATION
    baseline field (solve_bioheat with q = 0) to isolate Joule heating;
    a scalar T_ref measures against a constant (the skin naturally sits
    BELOW core temperature through air convection, so rises vs T_core
    are negative and meaningless as a safety number).

    Prefer a HOST case (to_device=False) here; for a device case in a
    per-lane loop, precompute skin_tets = np.asarray(case.tets)[
    np.asarray(case.tet_body) == skin_body] ONCE and pass it — each
    np.asarray on a device array is a tunnel readback on axon."""
    if skin_tets is None:
        body_host = np.asarray(case.tet_body)
        skin_tets = np.asarray(case.tets)[body_host == skin_body]
    T = np.asarray(T)
    dT = T - np.asarray(T_ref)
    t_skin = T[skin_tets].mean(axis=1)
    d_skin = dT[skin_tets].mean(axis=1) if np.ndim(T_ref) \
        else t_skin - float(T_ref)
    return {
        "T_max": float(T.max()),
        "T_skin_max": float(t_skin.max()) if t_skin.size else np.nan,
        "T_skin_mean": float(t_skin.mean()) if t_skin.size else np.nan,
        "dT_max": float(dT.max()),
        "dT_skin_max": (float(d_skin.max())
                        if t_skin.size else np.nan),
    }

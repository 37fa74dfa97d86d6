"""Nonlinear conductivity solves (ops/nonlinear.py).

Anchors:
- amp=0 reduces EXACTLY to the linear certified solve (same system,
  both at tol 1e-8).
- Exact 1-D nonlinear two-layer column: in current mode the flux
  J = I/A is uniform, so each layer's field solves the scalar fixed
  point E * sigma(E) = J — solved on host by bisection to 1e-14 and
  compared against the FEM compliance voltage.  P1 reproduces the
  piecewise-linear-in-z potential exactly, so agreement is at solver
  tolerance, not discretization order.
- Sublinearity: sigma rises with |E|, so V(2I) < 2 V(I).
- Electro-thermal: alpha=0 reduces to the uncoupled chain; with
  alpha>0 and a uniform-37 baseline, Joule heating raises T and lowers
  the compliance voltage; the returned sigma_e is self-consistent with
  the returned T field.

The reference pipeline is strictly linear (StatCurrentSolve run once
per case, step01_box/case.sif:30-44) — no counterpart exists there.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops import nonlinear
from pelvistim_fem_tpu.ops.bioheat import (build_bioheat_case,
                                           solve_bioheat, thermal_tables)
from pelvistim_fem_tpu.ops.fields import cell_power_density
from pelvistim_fem_tpu.ops.solve import solve_case_refined

L_XY = 0.02
DA = DB = 0.01
AREA = L_XY * L_XY


def _column_case(sig_a, sig_b, h=0.0025, current=1.0):
    """Two-layer column, full-face electrodes, current-controlled
    (same geometry as tests/test_cem.py)."""
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA + DB, int((DA + DB) / h) + 1)

    def body_fn(cx, cy, cz):
        return np.where(cz < DA, 1, 2).astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        out[(nz > 0.5) & (np.abs(fz - (DA + DB)) < 1e-9)] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, xs, zs, body_fn, bcid_fn)
    case = build_case(mesh, {1: sig_a, 2: sig_b}, mode="current",
                      injected_current_A=current, dtype=jnp.float64)
    return mesh, case


def _active_voltage(case, phi, rtol=1e-6):
    """Compliance voltage: mean potential on the top face, return
    grounded.  rtol bounds the face's potential spread — 1e-6 for
    exactly-1-D fields; the electro-thermal case is genuinely 3-D
    (lateral Robin cooling makes T, hence sigma(T), vary off-axis)."""
    nodes = np.asarray(case.nodes)
    top = nodes[:, 2] >= nodes[:, 2].max() - 1e-12
    vals = np.asarray(phi)[top]
    assert vals.std() < rtol * max(abs(vals.mean()), 1e-30)
    return float(vals.mean())


def _host_fixed_point(s0, a, e0, w, J):
    """Exact scalar root of E * sigma(E) = J for the rebased logistic
    law (monotone in E), bisection to relative 1e-14."""
    s = lambda u: 1.0 / (1.0 + np.exp(-u))
    base = s(-e0 / w)
    sig = lambda E: s0 * (1.0 + a * (s((E - e0) / w) - base)
                          / (1.0 - base))
    lo, hi = J / (s0 * (1.0 + a)) * 0.5, J / s0 * 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mid * sig(mid) < J:
            lo = mid
        else:
            hi = mid
    E = 0.5 * (lo + hi)
    return E, sig(E)


def test_linear_reduction():
    """amp=0: phi matches the linear certified solve; one Picard pass."""
    _, case = _column_case(0.35, 0.05)
    law = nonlinear.field_law({1: 0.35, 2: 0.05}, n_bodies=2)
    res = nonlinear.solve_case_field_dependent(case, law)
    ref = solve_case_refined(case, tol=1e-8)
    rel = float(jnp.linalg.norm(res.phi - ref.phi)
                / jnp.linalg.norm(ref.phi))
    assert rel < 1e-7
    assert bool(res.converged)
    assert float(res.residual) <= 1e-8
    assert int(res.picard_iters) == 1          # change==0 after pass 1
    assert float(res.sigma_change) == 0.0


def test_column_exact_nonlinear():
    """FEM voltage matches the host-exact nonlinear 1-D fixed point."""
    sig_a, sig_b = 0.35, 0.05            # body 1 linear, body 2 sigma(E)
    amp, e0, w = 4.0, 20_000.0, 4_000.0
    current = 1.0
    J = current / AREA                   # 2500 A/m^2, uniform in 1-D
    _, case = _column_case(sig_a, sig_b, current=current)
    law = nonlinear.field_law({1: sig_a, 2: sig_b},
                              amp_by_body={2: amp},
                              e0_by_body={2: e0},
                              w_by_body={2: w}, n_bodies=2)
    res = nonlinear.solve_case_field_dependent(case, law)
    assert bool(res.converged)

    # host-exact per-layer fields (layer 1 linear: amp=0, and the
    # rebased law has sigma(0) = sigma0 exactly)
    E1 = J / sig_a
    E2, s2 = _host_fixed_point(sig_b, amp, e0, w, J)
    v_exact = E1 * DA + E2 * DB
    v_fem = _active_voltage(case, res.phi)
    assert abs(v_fem - v_exact) / v_exact < 1e-6

    # converged per-element sigma in the nonlinear layer matches s(E*)
    body = np.asarray(case.tet_body)
    s_layer2 = np.asarray(res.sigma_e)[body == 2]
    assert np.max(np.abs(s_layer2 - s2)) / s2 < 1e-6
    s_layer1 = np.asarray(res.sigma_e)[body == 1]
    # linear layer: sigma = sigma0 exactly (amp=0)
    assert np.max(np.abs(s_layer1 - sig_a)) / sig_a < 1e-12


def test_sublinear_compliance():
    """sigma rises with |E| => doubling the current less than doubles
    the compliance voltage."""
    sig_a, sig_b = 0.35, 0.05
    law = nonlinear.field_law({1: sig_a, 2: sig_b},
                              amp_by_body={2: 4.0},
                              e0_by_body={2: 20_000.0},
                              w_by_body={2: 4_000.0}, n_bodies=2)
    _, case = _column_case(sig_a, sig_b, current=1.0)
    v1 = _active_voltage(
        case, nonlinear.solve_case_field_dependent(case, law).phi)
    case2 = dataclasses.replace(case, b_neumann=2.0 * case.b_neumann)
    v2 = _active_voltage(
        case2, nonlinear.solve_case_field_dependent(case2, law).phi)
    assert v2 < 2.0 * v1 * (1.0 - 1e-3)
    assert v2 > v1        # still monotone in current


def _thermal_setup(case, *, T_air=37.0):
    k_t, p_t = thermal_tables(2, {1: 0.49, 2: 0.37},
                              {1: 2700.0, 2: 7400.0})
    bh = build_bioheat_case(case, k_t, p_t, T_core=37.0, T_air=T_air)
    return bh


def test_electrothermal_alpha_zero_reduces():
    """alpha=0: phi equals the uncoupled certified solve; T equals one
    bioheat solve of its Joule load."""
    _, case = _column_case(0.35, 0.05, current=0.05)
    bh = _thermal_setup(case)
    alpha = jnp.zeros(3, jnp.float64)
    res = nonlinear.solve_case_electrothermal(
        case, bh, case.sigma_table, alpha, duty=0.01)
    ref = solve_case_refined(case, tol=1e-8)
    rel = float(jnp.linalg.norm(res.phi - ref.phi)
                / jnp.linalg.norm(ref.phi))
    assert rel < 1e-7
    assert int(res.picard_iters) == 1
    q = 0.01 * cell_power_density(case, ref.phi)
    t_ref = solve_bioheat(case, bh, q, tol=1e-10)
    assert float(jnp.max(jnp.abs(res.T - t_ref.phi))) < 1e-8
    assert bool(res.converged)


def test_electrothermal_coupling():
    """alpha>0 with a uniform-37 baseline: heating raises T, raising
    sigma, lowering the compliance voltage; sigma_e is self-consistent
    with the returned T."""
    _, case = _column_case(0.35, 0.05, current=0.05)
    bh = _thermal_setup(case)          # T_air=37 => baseline exactly 37
    alpha0 = jnp.zeros(3, jnp.float64)
    alpha = jnp.asarray([0.0, 0.015, 0.015], jnp.float64)
    r0 = nonlinear.solve_case_electrothermal(
        case, bh, case.sigma_table, alpha0, duty=0.01)
    r1 = nonlinear.solve_case_electrothermal(
        case, bh, case.sigma_table, alpha, duty=0.01, relax=0.8)
    assert bool(r1.converged)
    dT = float(jnp.max(r1.T)) - 37.0
    assert 1e-4 < dT < 50.0            # heating is real and sane
    v0 = _active_voltage(case, r0.phi, rtol=1e-3)
    v1 = _active_voltage(case, r1.phi, rtol=1e-3)
    assert v1 < v0                     # hotter tissue conducts better

    # self-consistency: the law applied to the returned T reproduces
    # the returned sigma_e to the Picard tolerance scale
    t_cell = np.asarray(r1.T)[np.asarray(case.tets)].mean(axis=1)
    body = np.asarray(case.tet_body)
    target = np.asarray(case.sigma_table)[body] \
        * (1.0 + np.asarray(alpha)[body] * (t_cell - 37.0))
    rel = np.max(np.abs(target - np.asarray(r1.sigma_e))
                 / np.asarray(r1.sigma_e))
    assert rel < 1e-6

    # certified residuals on both fields
    assert float(r1.residual) <= 1e-8
    assert float(r1.residual_T) <= 1e-9


# ── lattice fast path (round-4 VERDICT item 6) ─────────────────────────


def _column_recipe(h=0.0025):
    from pelvistim_fem_tpu.mesh.generate import LatticeRecipe
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA + DB, int((DA + DB) / h) + 1)

    def body_fn(cx, cy, cz):
        return np.where(cz < DA, 1, 2).astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        out[(nz > 0.5) & (np.abs(fz - (DA + DB)) < 1e-9)] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    return LatticeRecipe(xs=xs, ys=xs, zs=zs, body_fn=body_fn,
                         bcid_fn=bcid_fn)


def test_lattice_sigma_cell_matches_table():
    """lattice_coeff(sigma_cell=table[body6]) must reproduce the
    pre-combined sigma_table stack exactly (same accumulation path)."""
    from pelvistim_fem_tpu.mesh.spec import build_lattice_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import (lattice_coeff,
                                                        spec_device_arrays)
    spec = build_lattice_spec(_column_recipe(h=0.005),
                              {1: 0.35, 2: 0.05}, mode="current",
                              injected_current_A=1.0)
    dev = spec_device_arrays(spec, jnp.float64)
    c_tab = lattice_coeff(dev["h_axes"], dev["coords_dev"], dev["body6"],
                          spec.n_bodies, sigma_table=dev["sigma_table"])
    sig_cell = jnp.where(dev["body6"] == 0, 0.0,
                         dev["sigma_table"][dev["body6"].astype(jnp.int32)])
    c_cell = lattice_coeff(dev["h_axes"], dev["coords_dev"], dev["body6"],
                           spec.n_bodies, sigma_cell=sig_cell)
    np.testing.assert_array_equal(np.asarray(c_tab), np.asarray(c_cell))


def test_lattice_cell_e_mag_exact_linear_field():
    """|grad phi| of an exact linear potential is recovered exactly on
    every Kuhn class cell."""
    from pelvistim_fem_tpu.mesh.spec import build_lattice_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import (
        lattice_cell_e_mag, spec_device_arrays)
    spec = build_lattice_spec(_column_recipe(h=0.005), {1: 0.2, 2: 0.2},
                              mode="voltage", active_V=1.0)
    dev = spec_device_arrays(spec, jnp.float64)
    X, Y, Z = spec.grid_shape
    zgrid = jnp.asarray(np.broadcast_to(
        np.asarray(spec.axes[2])[None, None, :], (X, Y, Z)))
    phi = 3.0 * zgrid + 0.25   # |grad| = 3 / (DA+DB) per meter? no: phi=3z
    e = lattice_cell_e_mag(dev["h_axes"], dev["coords_dev"], phi)
    np.testing.assert_allclose(np.asarray(e), 3.0, rtol=1e-12)


def test_lattice_field_dependent_matches_element():
    """The lattice-path nonlinear solve reproduces the element-path
    fixed point (same law, same column): compliance voltages agree and
    the certified residual holds."""
    from pelvistim_fem_tpu.mesh.spec import build_lattice_spec
    mesh, case = _column_case(0.35, 0.05, h=0.005)
    law = nonlinear.field_law({1: 0.35, 2: 0.05},
                              amp_by_body={2: 3.0},
                              e0_by_body={2: 40.0}, w_by_body={2: 10.0},
                              n_bodies=2)
    ref = nonlinear.solve_case_field_dependent(case, law)
    assert bool(np.asarray(ref.converged))

    spec = build_lattice_spec(_column_recipe(h=0.005),
                              {1: 0.35, 2: 0.05}, mode="current",
                              injected_current_A=1.0)
    res = nonlinear.solve_lattice_field_dependent(spec, law)
    assert bool(np.asarray(res.converged))
    assert float(np.asarray(res.residual)) <= 1e-8
    v_ref = _active_voltage(case, ref.phi)
    v_lat = _active_voltage(case, res.phi)
    np.testing.assert_allclose(v_lat, v_ref, rtol=1e-6)

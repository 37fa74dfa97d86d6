"""Pennes bioheat solves (ops/bioheat.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.pressure import build_pressure_case
from pelvistim_fem_tpu.ops.bioheat import (build_bioheat_case,
                                           skin_temperature_metrics,
                                           solve_bioheat,
                                           thermal_tables)


@pytest.fixture(scope="module")
def pressure_case():
    case, params = build_pressure_case(coarse=True, dtype=jnp.float64)
    return case, params


def _tables(case, k=0.4, perf=2000.0):
    n_b = case.meta.n_bodies
    return thermal_tables(n_b, {b: k for b in range(1, n_b + 1)},
                          {b: perf for b in range(1, n_b + 1)})


def test_uniform_temperature_exact(pressure_case):
    """Zero heating with T_air = T_core must give T == T_core to solver
    tolerance EXACTLY (stiffness annihilates constants; perfusion and
    Robin loads balance their diagonals) — one identity covering every
    sign and lumping in the assembly."""
    case, params = pressure_case
    kt, pt = _tables(case)
    bh = build_bioheat_case(case, kt, pt, T_core=37.0, T_air=37.0)
    res = solve_bioheat(case, bh, jnp.zeros(case.n_tets))
    assert bool(res.converged)
    T = np.asarray(res.phi)
    np.testing.assert_allclose(T, 37.0, atol=1e-8)


def test_1d_slab_analytic():
    """Insulated-top slab, no perfusion, uniform heating: the exact
    profile T(z) = T0 + (q/k)(L z - z^2/2) must emerge from the 3-D
    solve on a box lattice (h_air = 0 makes every non-core face a
    natural/insulated boundary)."""
    from pelvistim_fem_tpu.mesh.generate import box_mesh
    from pelvistim_fem_tpu.models.case import build_case
    L = 0.02
    k, q, T0 = 0.4, 5.0e4, 37.0

    def solve_at(h):
        mesh = box_mesh(0.04, 0.04, L, h)
        case = build_case(mesh, {1: 1.0}, mode="voltage",
                          dtype=jnp.float64)
        kt, pt = thermal_tables(1, {1: k}, {1: 0.0})
        bh = build_bioheat_case(case, kt, pt, T_core=T0, T_air=0.0,
                                h_air=0.0)
        res = solve_bioheat(case, bh, jnp.full(case.n_tets, q),
                            tol=1e-12)
        assert bool(res.converged)
        T = np.asarray(res.phi)
        z = mesh.nodes[:, 2]
        exact = T0 + (q / k) * (L * z - 0.5 * z * z)
        return np.abs(T - exact).max() / (exact.max() - T0)

    e1, e2 = solve_at(0.002), solve_at(0.001)
    assert e1 < 0.02 and e2 < e1          # in band and improving
    rate = np.log2(e1 / e2)
    assert rate > 1.6, (e1, e2, rate)     # O(h^2) with lumped loads


def test_perfusion_cools(pressure_case):
    """Blood perfusion must strictly lower the peak temperature rise
    for the same heating."""
    case, params = pressure_case
    q = jnp.full(case.n_tets, 2.0e4)
    kt, p0 = _tables(case, perf=0.0)
    _, p1 = _tables(case, perf=5000.0)
    bh0 = build_bioheat_case(case, kt, p0)
    bh1 = build_bioheat_case(case, kt, p1)
    T0 = np.asarray(solve_bioheat(case, bh0, q).phi)
    T1 = np.asarray(solve_bioheat(case, bh1, q).phi)
    assert T0.max() > T1.max() + 0.05
    assert T1.max() > 37.0           # still heats above core


def test_joule_chain_end_to_end(pressure_case):
    """Electrical solve -> cell_power_density -> Pennes: temperature
    rise is positive, finite, peaks near the contacts (where J
    concentrates), and the skin metrics behave."""
    from pelvistim_fem_tpu.ops.bioheat import DEFAULT_K, \
        DEFAULT_PERFUSION
    from pelvistim_fem_tpu.ops.fields import cell_power_density
    from pelvistim_fem_tpu.ops.solve import solve_case
    case, params = pressure_case
    res = solve_case(case, tol=1e-10, maxiter=30_000)
    assert bool(res.converged)
    q = cell_power_density(case, res.phi)

    n_b = case.meta.n_bodies
    kt, pt = thermal_tables(
        n_b,
        {core.BODY_MUSCLE: DEFAULT_K["muscle"],
         core.BODY_FAT: DEFAULT_K["fat"],
         core.BODY_SKIN: DEFAULT_K["skin"],
         core.BODY_CONTACT_ACTIVE: DEFAULT_K["contact"],
         core.BODY_CONTACT_RETURN: DEFAULT_K["contact"]},
        {core.BODY_MUSCLE: DEFAULT_PERFUSION["muscle"],
         core.BODY_FAT: DEFAULT_PERFUSION["fat"],
         core.BODY_SKIN: DEFAULT_PERFUSION["skin"],
         core.BODY_CONTACT_ACTIVE: 0.0,
         core.BODY_CONTACT_RETURN: 0.0})
    bh = build_bioheat_case(case, kt, pt)
    out = solve_bioheat(case, bh, q)
    assert bool(out.converged)
    base = solve_bioheat(case, bh, jnp.zeros_like(q))
    assert bool(base.converged)
    # baseline physics: air convection keeps the skin BELOW core temp
    m_vs_core = skin_temperature_metrics(case, base.phi,
                                         skin_body=core.BODY_SKIN)
    assert m_vs_core["T_skin_max"] < 37.0
    # stimulation-induced rise vs the baseline field: strictly positive
    m = skin_temperature_metrics(case, out.phi,
                                 skin_body=core.BODY_SKIN,
                                 T_ref=np.asarray(base.phi))
    assert m["dT_max"] > 0
    assert m["dT_skin_max"] > 0
    assert np.isfinite(m["dT_skin_max"])
    assert m["dT_skin_max"] <= m["dT_max"] + 1e-12
    # continuous 5 mA through a coarse slab: rises stay physical (< 10 C)
    assert m["dT_max"] < 10.0


def test_stencil_thermal_parity_with_element_path():
    """The stencil fast-path Pennes solve (k-combined 27-point stencils
    + lumped diagonal, MG-preconditioned) must match the element-path
    solve to solver tolerance on the step04 lattice."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.bioheat import (bioheat_grid_data,
                                               lumped_heat_load,
                                               solve_bioheat_stencil)
    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    case, params, mesh = build_pressure_case(coarse=True,
                                             with_mesh=True,
                                             dtype=jnp.float64)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64, host_data=hd)

    n_b = case.meta.n_bodies
    kt, pt = thermal_tables(n_b, {b: 0.3 + 0.05 * b
                                  for b in range(1, n_b + 1)},
                            {b: 1000.0 * b for b in range(1, n_b + 1)})
    bh = build_bioheat_case(case, kt, pt)
    rng = np.random.default_rng(7)
    q = jnp.asarray(2e4 * (1 + 0.5 * rng.random(case.n_tets)))

    ref = solve_bioheat(case, bh, q, tol=1e-12)
    assert bool(ref.converged)

    grid = bioheat_grid_data(case, bh, sc)
    grid = {k: jnp.asarray(v) for k, v in grid.items()}
    out = solve_bioheat_stencil(sc, jnp.asarray(kt), grid,
                                lumped_heat_load(case, q), tol=1e-12)
    assert bool(out.converged)
    # same Jacobi preconditioner, same spectrum: iteration parity
    assert abs(int(out.iterations) - int(ref.iterations)) <= 3
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=1e-8)


def test_transient_approaches_steady_state(pressure_case):
    """Implicit Euler's fixed point IS the steady Pennes solution, so
    the trajectory from the no-stimulation baseline must approach the
    steady field monotonically with the bioheat time constant
    rho_c / (w c) (~minutes), independent of dt accuracy."""
    from pelvistim_fem_tpu.ops.bioheat import solve_bioheat_transient
    case, params = pressure_case
    kt, pt = _tables(case, perf=3000.0)
    bh = build_bioheat_case(case, kt, pt)
    q = jnp.full(case.n_tets, 3.0e4)

    base = solve_bioheat(case, bh, jnp.zeros_like(q), tol=1e-11)
    steady = solve_bioheat(case, bh, q, tol=1e-11)
    assert bool(base.converged) and bool(steady.converged)

    rho_c = 3.6e6
    tau = rho_c / 3000.0                     # ~20 min
    T, trace = solve_bioheat_transient(case, bh, q, base.phi,
                                       rho_c=rho_c, dt_s=tau / 10,
                                       n_steps=80, tol=1e-10)
    trace = np.asarray(trace)
    # monotone heating, asymptote = the steady max
    assert np.all(np.diff(trace) >= -1e-9)
    steady_max = float(np.asarray(steady.phi).max())
    base_max = float(np.asarray(base.phi).max())
    rise = steady_max - base_max
    assert rise > 0.1
    np.testing.assert_allclose(trace[-1], steady_max, atol=2e-3 * rise)
    # the time constant is real: ~63% of the rise after one tau
    i_tau = 9                                # step index at t = tau
    frac = (trace[i_tau] - base_max) / rise
    assert 0.45 < frac < 0.85, frac
    # full-field agreement at the end, not just the max
    np.testing.assert_allclose(np.asarray(T), np.asarray(steady.phi),
                               atol=5e-3 * rise)

"""Metric-layer unit tests with hand-computable oracles."""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import box_mesh
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                               sigma_skin_tables,
                                               sigma_tables_for_sweep)
from pelvistim_fem_tpu.ops import metrics
from pelvistim_fem_tpu.ops.solve import solve_case


def _box_solution():
    m = box_mesh(0.04, 0.04, 0.02, 0.004)
    case = build_case(m, {1: 0.2}, mode="voltage",
                      meta_extra=dict(z_skin_top=0.02))
    res = solve_case(case, tol=1e-12)
    return m, case, res


def test_injected_currents_analytic_box():
    """Uniform box: I = sigma*A*dV/Lz = 0.2 * 0.0016 / 0.02 = 16 mA."""
    m, case, res = _box_solution()
    cur = metrics.injected_currents(case, res.phi)
    I_exact = 0.2 * 0.04 * 0.04 / 0.02
    np.testing.assert_allclose(cur["I_active"], I_exact, rtol=1e-6)
    np.testing.assert_allclose(cur["I_return"], I_exact, rtol=1e-6)
    assert cur["flux_err"] < 1e-6
    np.testing.assert_allclose(cur["I_active_consistent"], I_exact,
                               rtol=1e-9)
    assert cur["flux_err_consistent"] < 1e-9


def test_eval_roi_uniform_field():
    """In the uniform box |J| = 10 and |E| = 50 everywhere; the ROI means
    must equal them regardless of placement."""
    m, case, res = _box_solution()
    mean_J, mean_E, n, r_used, warn = metrics.eval_roi(
        case, res.phi, np.array([0.02, 0.02, 0.01]), 0.005)
    assert n >= 4
    np.testing.assert_allclose(mean_J, 10.0, rtol=1e-6)
    np.testing.assert_allclose(mean_E, 50.0, rtol=1e-6)


def test_eval_roi_auto_expansion():
    """A radius smaller than any cell forces the 1.5/2/3x expansion."""
    m, case, res = _box_solution()
    mean_J, mean_E, n, r_used, warn = metrics.eval_roi(
        case, res.phi, np.array([0.02, 0.02, 0.01]), 0.0008)
    assert warn is not None and "expanded" in warn or "3x" in warn
    assert r_used > 0.0008
    assert n >= 1


def test_compliance_voltage_box():
    m, case, res = _box_solution()
    v = metrics.compliance_voltage(case, res.phi)
    np.testing.assert_allclose(v, 1.0, atol=1e-10)


def test_sigma_skin_tables_only_touch_skin():
    from pelvistim_fem_tpu.mesh import core
    case, params = build_pressure_case(coarse=True)
    params["conductivities"]["sigma_skin_sweep"] = [0.0002, 0.001, 0.005]
    tables = np.asarray(sigma_skin_tables(case, params))
    base = np.asarray(case.sigma_table)
    assert tables.shape[0] == 3
    for i, s in enumerate([0.0002, 0.001, 0.005]):
        np.testing.assert_allclose(tables[i, core.BODY_SKIN], s,
                                   rtol=1e-12)
        keep = np.ones(len(base), bool)
        keep[core.BODY_SKIN] = False
        np.testing.assert_array_equal(tables[i, keep], base[keep])


def test_sigma_skin_sweep_physics():
    """Lower skin conductivity -> higher compliance voltage."""
    from pelvistim_fem_tpu.parallel.sweep import batched_material_solve
    case, params = build_pressure_case(coarse=True)
    params["conductivities"]["sigma_skin_sweep"] = [0.0002, 0.005]
    tables = sigma_skin_tables(case, params)
    out = batched_material_solve(case, tables, tol=1e-8, maxiter=30_000)
    assert bool(out.converged.all())
    v = [metrics.compliance_voltage(case, out.phi[i]) for i in range(2)]
    assert v[0] > v[1] > 0


def test_batched_extract_matches_serial():
    """extract_results_batched (one vmapped device pass, VERDICT round-1
    item 5) must reproduce the serial per-case rows."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                                   sigma_tables_for_sweep)
    from pelvistim_fem_tpu.ops.metrics import (extract_results,
                                               extract_results_batched)
    from pelvistim_fem_tpu.ops.solve import solve_case

    case, params = build_pressure_case(coarse=True)
    tables = sigma_tables_for_sweep(case, params)[:4]
    import jax
    phis = jax.vmap(lambda s: solve_case(case, s, tol=1e-9,
                                         maxiter=30_000).phi)(tables)
    labels = params["pressure_sweep"]["labels"][:4]
    sig_c = params["pressure_sweep"]["sigma_contact_Spm"][:4]
    rows_b = extract_results_batched(case, phis, params,
                                     sigma_tables=tables,
                                     pressure_labels=labels,
                                     sigma_contacts=sig_c)
    for i in range(4):
        row_s = extract_results(case, phis[i], params,
                                sigma_table=tables[i],
                                pressure_label=labels[i],
                                sigma_contact=sig_c[i], verbose=False)
        assert set(rows_b[i]) == set(row_s)
        for k, v in row_s.items():
            b = rows_b[i][k]
            if isinstance(v, float) and np.isfinite(v):
                np.testing.assert_allclose(b, v, rtol=1e-9, atol=1e-300,
                                           err_msg=f"lane {i} key {k}")
            else:
                assert (b == v) or (isinstance(v, float)
                                    and not np.isfinite(v)
                                    and not np.isfinite(b)), (i, k, v, b)


def test_batched_extract_degenerate_roi_matches_serial_nan():
    """Empty ROI / metrics out of mesh: batched rows must carry the same
    NaNs as the serial path (not masked zeros)."""
    import copy

    import jax

    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.metrics import (extract_results,
                                               extract_results_batched)
    from pelvistim_fem_tpu.ops.solve import solve_case

    case, params = build_pressure_case(coarse=True)
    params = copy.deepcopy(params)
    params["roi"]["z_target"] = 10.0      # far outside the mesh
    params["roi"]["roi_radius"] = 1e-6
    phis = jax.vmap(lambda s: solve_case(case, s, tol=1e-8,
                                         maxiter=30_000).phi)(
        case.sigma_table[None])
    row_s = extract_results(case, phis[0], params, verbose=False)
    row_b = extract_results_batched(case, phis, params)[0]
    for k in ("roi_mean_J", "roi_mean_E", "roi_mean_E_p1"):
        assert isinstance(row_s[k], float) and not np.isfinite(row_s[k])
        assert not np.isfinite(row_b[k]), k


def test_power_density_energy_balance():
    """Exact discrete energy balance: integral of J.E over the volume
    equals phi^T K phi equals the Neumann load dotted with phi (return
    electrode grounded) — to solver tolerance, not discretization
    order.  Validates cell_power_density's gradients, sigma lookup and
    volume weighting in one identity."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.fields import cell_power_density
    from pelvistim_fem_tpu.ops.solve import solve_case

    case, params = build_pressure_case(coarse=True, dtype=jnp.float64)
    res = solve_case(case, tol=1e-12, maxiter=30_000)
    assert bool(res.converged)
    p = cell_power_density(case, res.phi)
    assert bool(jnp.all(p >= -1e-18))            # pointwise nonnegative
    total = float(jnp.sum(p * case.vol))
    drive = float(jnp.dot(case.b_neumann, res.phi))
    np.testing.assert_allclose(total, drive, rtol=1e-9)
    # sanity scale: watts at 5 mA through ~10 kohm is tens of mW
    assert 1e-4 < total < 10.0

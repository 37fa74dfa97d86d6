"""Sweep-engine tests: vmapped material batch + device-mesh sharding on
the virtual 8-device CPU mesh (SURVEY.md section 4's multi-device tier —
a capability the reference does not have)."""

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                               sigma_tables_for_sweep)
from pelvistim_fem_tpu.ops.solve import solve_case
from pelvistim_fem_tpu.parallel.sweep import (batched_material_solve,
                                              device_mesh,
                                              sharded_material_solve)


def test_vmap_matches_sequential():
    case, params = build_pressure_case(coarse=True)
    tables = sigma_tables_for_sweep(case, params)[:4]
    batch = batched_material_solve(case, tables, tol=1e-8, maxiter=30_000)
    for i in range(tables.shape[0]):
        single = solve_case(case, tables[i], tol=1e-8, maxiter=30_000)
        np.testing.assert_allclose(np.asarray(batch.phi[i]),
                                   np.asarray(single.phi),
                                   rtol=1e-6, atol=1e-9)


def test_sharded_sweep_8_devices():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    case, params = build_pressure_case(coarse=True)
    tables = sigma_tables_for_sweep(case, params)   # 15 cases -> pad to 16
    mesh = device_mesh(8)
    out = sharded_material_solve(case, tables, mesh, tol=1e-8,
                                 maxiter=30_000)
    assert out.phi.shape == (15, case.n_nodes)
    assert bool(out.converged.all())
    # physics trend: higher contact conductivity -> lower compliance V
    from pelvistim_fem_tpu.ops.metrics import compliance_voltage
    v = [compliance_voltage(case, out.phi[i]) for i in range(15)]
    assert v[0] > v[-1] > 0
    # monotone decreasing compliance with sigma_contact
    assert all(v[i] > v[i + 1] for i in range(14))


def test_pressure_tables_only_touch_contact_bodies():
    case, params = build_pressure_case(coarse=True)
    tables = np.asarray(sigma_tables_for_sweep(case, params))
    base = np.asarray(case.sigma_table)
    for i, s in enumerate(params["pressure_sweep"]["sigma_contact_Spm"]):
        row = tables[i]
        np.testing.assert_allclose(row[core.BODY_CONTACT_ACTIVE], s,
                                   rtol=1e-12)
        np.testing.assert_allclose(row[core.BODY_CONTACT_RETURN], s,
                                   rtol=1e-12)
        keep = np.ones(len(row), bool)
        keep[[core.BODY_CONTACT_ACTIVE, core.BODY_CONTACT_RETURN]] = False
        np.testing.assert_array_equal(row[keep], base[keep])

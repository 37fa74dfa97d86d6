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


def test_sharded_refined_sweep_certified_residuals():
    """The dp-sharded refined sweep must deliver TRUE f64 residuals at
    1e-8 on every lane and match the unsharded refined solves."""
    from pelvistim_fem_tpu.parallel.sweep import \
        sharded_material_solve_refined
    case, params = build_pressure_case(coarse=True, dtype=jnp.float64)
    tables = sigma_tables_for_sweep(case, params)[:6]
    mesh = device_mesh(8)
    out = sharded_material_solve_refined(case, tables, mesh, tol=1e-8)
    assert out.phi.shape == (6, case.n_nodes)
    assert bool(np.asarray(out.converged).all())
    assert float(np.asarray(out.residual).max()) <= 1e-8
    # true residual check against a from-scratch f64 operator
    from pelvistim_fem_tpu.ops import assembly, bc as bc_ops
    sigvol0 = tables[0][case.tet_body] * case.vol
    raw = lambda x: assembly.spmv(x, case.tets, case.grads, sigvol0,
                                  case.scatter_perm, case.scatter_segids,
                                  case.n_nodes)
    op = bc_ops.make_projected_operator(raw, case.free_mask)
    b = bc_ops.effective_rhs(raw, case.free_mask, case.dirichlet_vals,
                             case.b_neumann)
    r = np.asarray(b - op(out.phi[0]))
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    assert rel <= 2e-8, rel


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


def test_sharded_stencil_material_sweep_matches_batched():
    """The stencil-path dp-sharded material sweep (padding exercised:
    5 lanes on 8 devices) must equal the unsharded certified batch lane
    for lane, residuals certified at 1e-8."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined
    from pelvistim_fem_tpu.parallel.sweep import \
        sharded_stencil_material_solve_refined

    spec, params = build_pressure_spec(coarse=True)
    scase, hier = assemble_lattice(spec, jnp.float64)
    sweep = params["pressure_sweep"]["sigma_contact_Spm"]
    base = np.asarray(spec.sigma_table)
    tables = np.tile(base, (5, 1))
    tables[:, core.BODY_CONTACT_ACTIVE] = sweep[:5]
    tables[:, core.BODY_CONTACT_RETURN] = sweep[:5]
    tables = jnp.asarray(tables, jnp.float64)

    ref = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    out = sharded_stencil_material_solve_refined(
        scase, hier, tables, device_mesh(8), tol=1e-8)
    assert out.phi.shape == ref.phi.shape
    assert out.phi.shape[0] == 5
    assert bool(np.asarray(out.converged).all())
    assert float(np.asarray(out.residual).max()) <= 1e-8
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=1e-10 * np.abs(ref.phi).max())

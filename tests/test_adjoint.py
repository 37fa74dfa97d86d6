"""Adjoint (implicit-diff) solve gradients vs finite differences.

The differentiable solve (ops/adjoint.py) must reproduce, to solver
tolerance, central finite differences of metric(phi(sigma)) — in both
drive modes, because they exercise different sigma-dependence paths:
current mode through K(sigma) only, voltage mode additionally through
the Dirichlet lift b_eff = -K(sigma) phi_d."""

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import box_recipe
from pelvistim_fem_tpu.mesh.spec import build_lattice_spec
from pelvistim_fem_tpu.ops import lattice_assembly as la
from pelvistim_fem_tpu.ops.adjoint import (sigma_sensitivity,
                                           solve_stencil_mg_diff)
from pelvistim_fem_tpu.ops.multigrid import solve_stencil_mg


def _metric(phi, sig):
    return jnp.mean(phi * phi)


def _fd_check(scase, hier, sig, idxs, rel=2e-4):
    J, g = sigma_sensitivity(_metric, scase, hier, sig, tol=1e-12)
    g = np.asarray(g)
    for b in idxs:
        eps = 1e-4 * float(sig[b])
        up = sig.at[b].add(eps)
        dn = sig.at[b].add(-eps)
        Ju = _metric(solve_stencil_mg_diff(scase, hier, up, tol=1e-12),
                     up)
        Jd = _metric(solve_stencil_mg_diff(scase, hier, dn, tol=1e-12),
                     dn)
        fd = (float(Ju) - float(Jd)) / (2 * eps)
        assert fd != 0.0
        assert abs(g[b] - fd) <= rel * abs(fd), (b, g[b], fd)
    return J, g


def test_adjoint_grad_current_mode_matches_fd():
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    sig = jnp.asarray(spec.sigma_table, jnp.float64)
    # muscle, skin, and the contact slots — the step04 sweep axis
    J, g = _fd_check(scase, hier, sig, idxs=[1, 3, 4])
    assert float(J) > 0
    assert float(g[0]) == 0.0          # slot 0 (carved) never enters


def test_adjoint_grad_voltage_mode_matches_fd():
    """Voltage drive + multiple tissues: sigma enters through BOTH
    K(sigma) and the Dirichlet lift -K(sigma) phi_d.  (A single-body
    voltage problem would be sigma-invariant — phi(alpha*sigma) ==
    phi(sigma) — so it can't discriminate gradients.)"""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe
    recipe = layered_slab_recipe(
        0.04, 0.03, 0.02,
        layers=[(core.BODY_MUSCLE, 0.017, 0.009),
                (core.BODY_FAT, 0.002, 0.002),
                (core.BODY_SKIN, 0.001, 0.001)],
        electrodes=[(0.008, 0.022, 0.005), (0.032, 0.022, 0.005)],
        contact_t=0.0005, contact_h_z=0.0005,
        h_fine=0.004, h_coarse=0.008)
    sig5 = {1: 0.35, 2: 0.04, 3: 1e-3, 4: 5e-3, 5: 5e-3}
    spec = build_lattice_spec(recipe, sig5, mode="voltage",
                              active_V=1.0)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    sig = jnp.asarray(spec.sigma_table, jnp.float64)
    _, g = _fd_check(scase, hier, sig, idxs=[1, 4])
    # uniform sigma scaling leaves a voltage-driven phi unchanged, so
    # the directional derivative along sigma itself must vanish
    assert abs(float(np.asarray(g) @ np.asarray(sig))) <= \
        1e-6 * float(np.abs(np.asarray(g) * np.asarray(sig)).max())


def test_adjoint_solution_matches_nondiff_solver():
    """Forward value of the differentiable solve == solve_stencil_mg."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    phi = solve_stencil_mg_diff(scase, hier, tol=1e-11)
    r = solve_stencil_mg(scase, hier, tol=1e-11)
    p1, p2 = np.asarray(phi), np.asarray(r.phi)
    np.testing.assert_allclose(p1, p2, atol=1e-9 * np.abs(p2).max())


def test_adjoint_grad_dirichlet_voltage():
    """d(metric)/d(active voltage) through the Dirichlet lift: scaling
    the drive voltage scales phi linearly, so d mean(phi^2) / dV at
    V=1 must equal 2*mean(phi^2)."""
    recipe = box_recipe(0.04, 0.04, 0.02, 0.004)
    spec = build_lattice_spec(recipe, {1: 0.2}, mode="voltage",
                              active_V=1.0)
    scase, hier = la.assemble_lattice(spec, jnp.float64)

    def J(scale):
        import dataclasses
        sc = dataclasses.replace(scase, dirichlet=scase.dirichlet * scale)
        phi = solve_stencil_mg_diff(sc, hier, tol=1e-12)
        return jnp.mean(phi * phi)

    val, grad = jax.value_and_grad(J)(jnp.float64(1.0))
    assert abs(float(grad) - 2 * float(val)) <= 1e-6 * abs(float(grad))


def test_calibrate_sigma_recovers_ground_truth():
    """Inverse problem round-trip: synthesize measurements from a known
    sigma table, start muscle/fat at 2.5x / 0.4x off, and recover both
    within 2% via the jitted Adam-on-log-sigma loop (ops/calibrate.py).
    Current mode: absolute conductivities are identifiable (the drive
    fixes the current scale)."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe
    from pelvistim_fem_tpu.ops.calibrate import calibrate_sigma
    recipe = layered_slab_recipe(
        0.03, 0.024, 0.014,
        layers=[(core.BODY_MUSCLE, 0.0105, 0.006),
                (core.BODY_FAT, 0.002, 0.002),
                (core.BODY_SKIN, 0.0015, 0.0015)],
        electrodes=[(0.0075, 0.018, 0.004), (0.0225, 0.018, 0.004)],
        contact_t=0.001, contact_h_z=0.001,
        h_fine=0.005, h_coarse=0.01)
    sig5 = {1: 0.35, 2: 0.04, 3: 1e-3, 4: 5e-3, 5: 5e-3}
    spec = build_lattice_spec(recipe, sig5, mode="current",
                              injected_current_A=5e-3)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    truth = jnp.asarray(spec.sigma_table, jnp.float64)

    phi = solve_stencil_mg_diff(scase, hier, truth, tol=1e-10)
    obs_idx = jnp.arange(0, phi.shape[0], 5, dtype=jnp.int32)
    obs = phi[obs_idx]

    bodies = (1, 2)                      # muscle, fat
    sigma0 = jnp.asarray([2.5 * sig5[1], 0.4 * sig5[2]], jnp.float64)
    fit, losses = calibrate_sigma(scase, hier, obs_idx, obs, bodies,
                                  sigma0, steps=160, lr=0.1, tol=1e-9)
    fit = np.asarray(fit)
    assert float(losses[-1]) < 1e-7
    np.testing.assert_allclose(fit[1], sig5[1], rtol=0.02)
    np.testing.assert_allclose(fit[2], sig5[2], rtol=0.02)
    # untouched slots stay exactly at the table values
    np.testing.assert_allclose(fit[3:], np.asarray(truth)[3:], rtol=0)


def test_calibrate_sigma_lm_recovers_full_tissue_set():
    """The 3-parameter fit Adam crawls on (muscle screened behind
    fat/skin makes the least-squares valley long and curved): LM's
    Gauss-Newton steps recover muscle+fat+skin essentially exactly in
    ~10 damped iterations (each = primal + vmapped Jacobian tangents +
    trial solve through the implicit-diff adjoint)."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.calibrate import calibrate_sigma_lm
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    truth = jnp.asarray(spec.sigma_table, jnp.float64)

    phi = solve_stencil_mg_diff(scase, hier, truth, tol=1e-10)
    obs_idx = jnp.arange(0, phi.shape[0], 3, dtype=jnp.int32)
    obs = phi[obs_idx]

    bodies = (1, 2, 3)                   # muscle, fat, skin
    off = np.array([2.5, 0.4, 3.0])      # literature-uncertainty start
    sigma0 = jnp.asarray(np.asarray(truth)[list(bodies)] * off)
    fit, losses = calibrate_sigma_lm(scase, hier, obs_idx, obs, bodies,
                                     sigma0, iters=12, tol=1e-9)
    fit = np.asarray(fit)
    tr = np.asarray(truth)
    assert float(losses[-1]) < 1e-16
    for b in bodies:
        np.testing.assert_allclose(fit[b], tr[b], rtol=1e-6)
    np.testing.assert_allclose(fit[4:], tr[4:], rtol=0)


def test_adjoint_vmap_grad_matches_per_lane():
    """Sweep sensitivities: vmap(grad(metric.solve)) over a batch of
    sigma tables must equal the per-lane gradients — the adjoint path
    composes with the framework's lane-batching idiom."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = la.assemble_lattice(spec, jnp.float64)
    base = jnp.asarray(spec.sigma_table, jnp.float64)
    tables = jnp.stack([base, base.at[4].mul(10.0).at[5].mul(10.0)])

    def J(sig):
        phi = solve_stencil_mg_diff(scase, hier, sig, tol=1e-10)
        return jnp.mean(phi * phi)

    g_batch = jax.vmap(jax.grad(J))(tables)
    for i in range(2):
        g_i = jax.grad(J)(tables[i])
        np.testing.assert_allclose(np.asarray(g_batch[i]),
                                   np.asarray(g_i), rtol=1e-6)

"""Anisotropic (tensor) conductivity on the element path (ops/aniso.py).

The reference pipeline is isotropic-only (scalar sigma per body,
step01_box/case.sif:33-46), so these tests validate against exact
invariants instead of reference outputs:
  * a diagonal-isotropic tensor table must reproduce the scalar solve
    bit-for-bit (same operator, same arithmetic);
  * the step01 box under a z-drive has phi = z/Lz for ANY diagonal
    tensor (the field is uniaxial, so transverse conductivity cannot
    enter), with J_z = sigma_zz * dV/Lz exactly;
  * a uniaxial fiber tensor must steer current along the fiber axis;
  * KCL (weak-form reaction currents) holds to solver tolerance.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.models.box import build_box_case
from pelvistim_fem_tpu.ops import fields
from pelvistim_fem_tpu.ops.aniso import (check_spd, tensor_table,
                                         uniaxial_tensor)
from pelvistim_fem_tpu.ops.solve import solve_case, solve_case_refined


def test_isotropic_tensor_matches_scalar_exactly():
    case, _ = build_box_case(h=0.005)
    tab = tensor_table(case.sigma_table)
    r_s = solve_case(case, tol=1e-10)
    r_t = solve_case(case, jnp.asarray(tab), tol=1e-10)
    assert bool(np.asarray(r_t.converged))
    np.testing.assert_allclose(np.asarray(r_t.phi), np.asarray(r_s.phi),
                               rtol=0, atol=1e-12)


def test_box_diagonal_tensor_analytic():
    """z-drive on the box: phi = V z/Lz regardless of sigma_xx/yy;
    J_z = sigma_zz V/Lz exactly (the anisotropic twin of the reference
    step01 gates, test_step01_baseline.py:22-25)."""
    case, _ = build_box_case(h=0.005)
    T = case.sigma_table.shape[0]
    tab = np.zeros((T, 3, 3))
    sig_zz = 0.125
    tab[1] = np.diag([7.0, 0.003, sig_zz])      # wildly anisotropic
    res = solve_case_refined(case, jnp.asarray(tab), tol=1e-10)
    assert bool(np.asarray(res.converged))
    z = np.asarray(case.nodes[:, 2])
    Lz = z.max()
    phi = np.asarray(res.phi)
    V = phi.max()
    ref = V * z / Lz
    rel = np.linalg.norm(phi - ref) / np.linalg.norm(ref)
    # residual tol 1e-10; the 56:1 anisotropy ratio inflates kappa, so
    # the solution gate gets one order of headroom (measured 1.3e-8)
    assert rel <= 1e-7, rel
    J = np.asarray(fields.cell_J(case, res.phi, jnp.asarray(tab)))
    Jz_ref = sig_zz * V / Lz
    np.testing.assert_allclose(np.abs(J[:, 2]), Jz_ref, rtol=1e-7)
    # transverse leakage: the large sigma_xx=7 amplifies the ~1e-8
    # potential error into J_x ~ sigma_xx * err / h; gate it relative
    # to the physical J_z instead of absolutely
    assert np.abs(J[:, :2]).max() <= 1e-4 * Jz_ref


def test_fiber_tensor_steers_current():
    """Uniaxial fibers along x on the z-driven box: the field is still
    uniaxial in z (diagonal-in-z component rules), but tilting fibers
    into the xz-plane must produce transverse current J_x with the sign
    of the xz tensor component."""
    case, _ = build_box_case(h=0.005)
    T = case.sigma_table.shape[0]
    tab = np.zeros((T, 3, 3))
    tab[1] = uniaxial_tensor((1, 0, 1), 0.4, 0.09)   # 45-degree fibers
    check_spd(tab)
    res = solve_case_refined(case, jnp.asarray(tab), tol=1e-9)
    assert bool(np.asarray(res.converged))
    J = np.asarray(fields.cell_J(case, res.phi, jnp.asarray(tab)))
    # mean transverse current follows the off-diagonal coupling
    mean_Jx = float(np.mean(J[:, 0] * np.sign(np.mean(J[:, 2]))))
    assert abs(mean_Jx) > 0.01 * abs(float(np.mean(J[:, 2])))
    # KCL: exact weak-form currents still balance
    from pelvistim_fem_tpu.ops.metrics import injected_currents
    cur = injected_currents(case, res.phi,
                            sigma_table=jnp.asarray(tab))
    assert cur["flux_err_consistent"] < 1e-6


def test_layered_muscle_fibers_end_to_end():
    """Layered slab with muscle fibers along y (the physiological
    configuration): certified refined solve converges, currents balance,
    and the longitudinal conductivity visibly reshapes the ROI field
    versus the isotropic solve."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    case, params = build_pressure_case(coarse=True, dtype=jnp.float64)
    tab = tensor_table(case.sigma_table,
                       {core.BODY_MUSCLE: ((0, 1, 0), 0.4, 0.09)})
    check_spd(tab)
    res = solve_case_refined(case, jnp.asarray(tab), tol=1e-8)
    assert bool(np.asarray(res.converged))
    assert float(np.asarray(res.residual)) <= 1e-8
    from pelvistim_fem_tpu.ops.metrics import injected_currents
    cur = injected_currents(case, res.phi, sigma_table=jnp.asarray(tab))
    assert cur["flux_err_consistent"] < 1e-6
    iso = solve_case_refined(case, tol=1e-8)
    d = np.linalg.norm(np.asarray(res.phi) - np.asarray(iso.phi))
    assert d > 1e-3 * np.linalg.norm(np.asarray(iso.phi))


def test_lattice_tensor_assembly_matches_element_path():
    """Stencil fast path with a tensor table (lattice_coeff's tensor
    branch, pre-combined B=1) must reproduce the element-path tensor
    solve on the same geometry — megatet-scale anisotropy rides the
    same device assembly + certified MG refinement as scalar solves."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import (build_pressure_case,
                                                   build_pressure_spec)
    from pelvistim_fem_tpu.ops.lattice_assembly import \
        solve_lattice_mg_refined
    spec, _ = build_pressure_spec(coarse=True)
    tab = tensor_table(spec.sigma_table,
                       {core.BODY_MUSCLE: ((0, 1, 0), 0.4, 0.09),
                        core.BODY_FAT: ((1, 0, 0), 0.06, 0.03)})
    check_spd(tab)
    r = solve_lattice_mg_refined(spec, jnp.asarray(tab), tol=1e-10)
    assert bool(np.asarray(r.converged))
    assert float(np.asarray(r.residual)) <= 1e-10

    case, _ = build_pressure_case(coarse=True, dtype=jnp.float64)
    r2 = solve_case_refined(case, jnp.asarray(tab), tol=1e-10)
    p1, p2 = np.asarray(r.phi), np.asarray(r2.phi)
    scale = np.abs(p2).max()
    np.testing.assert_allclose(p1, p2, atol=1e-7 * scale)


def _pressure_diff_setup():
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import (
        assemble_lattice, spec_device_arrays)
    spec, _ = build_pressure_spec(coarse=True)
    dev = spec_device_arrays(spec, jnp.float64)
    _, hier = assemble_lattice(spec, jnp.float64, device_arrays=dev)
    return spec, dev, hier


def test_tensor_adjoint_grad_matches_fd():
    """Gradients THROUGH the device assembly: d metric / d Sigma_muscle
    components via solve_lattice_mg_diff must match central finite
    differences — anisotropy parameters are first-class AD variables."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.ops.adjoint import solve_lattice_mg_diff
    spec, dev, hier = _pressure_diff_setup()
    nb = spec.n_bodies
    base = jnp.asarray(tensor_table(
        spec.sigma_table, {core.BODY_MUSCLE: ((0, 1, 0), 0.4, 0.09)}))

    def J(tab):
        phi = solve_lattice_mg_diff(dev, hier, tab, n_bodies=nb,
                                    tol=1e-12)
        return jnp.mean(phi * phi)

    g = np.asarray(jax.grad(J)(base))
    b = core.BODY_MUSCLE
    for (c, d) in [(1, 1), (2, 2), (1, 2)]:
        eps = 1e-5 * float(base[b, c, d] if base[b, c, d] != 0 else 0.1)
        up = base.at[b, c, d].add(eps).at[b, d, c].add(
            eps if c != d else 0.0)
        dn = base.at[b, c, d].add(-eps).at[b, d, c].add(
            -eps if c != d else 0.0)
        fd = (float(J(up)) - float(J(dn))) / (2 * eps)
        # off-diagonal FD perturbs BOTH symmetric slots -> gradient sum
        ga = g[b, c, d] + (g[b, d, c] if c != d else 0.0)
        assert fd != 0.0
        assert abs(ga - fd) <= 3e-4 * abs(fd), ((c, d), ga, fd)


def test_fiber_anisotropy_recovery():
    """Inverse anisotropy: recover muscle (sigma_long, sigma_trans)
    from synthetic surface potentials by Gauss-Newton on the
    device-assembly adjoint — a fit no isotropic model can express."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.ops.adjoint import solve_lattice_mg_diff
    from pelvistim_fem_tpu.ops.aniso import uniaxial_tensor
    spec, dev, hier = _pressure_diff_setup()
    nb = spec.n_bodies
    base = tensor_table(spec.sigma_table)
    b = core.BODY_MUSCLE
    axis = (0, 1, 0)

    def table_for(p):
        s_long, s_trans = jnp.exp(p[0]), jnp.exp(p[1])
        d = jnp.asarray(axis, jnp.float64)
        d = d / jnp.linalg.norm(d)
        Sig = (s_trans * jnp.eye(3)
               + (s_long - s_trans) * jnp.outer(d, d))
        return jnp.asarray(base).at[b].set(Sig)

    truth = np.log([0.4, 0.09])
    phi_t = solve_lattice_mg_diff(dev, hier, table_for(jnp.asarray(truth)),
                                  n_bodies=nb, tol=1e-11)
    obs_idx = jnp.arange(0, phi_t.shape[0], 4, dtype=jnp.int32)
    obs = phi_t[obs_idx]
    scale = jnp.sqrt(jnp.sum(obs * obs))

    def resid(p):
        phi = solve_lattice_mg_diff(dev, hier, table_for(p),
                                    n_bodies=nb, tol=1e-11)
        return (phi[obs_idx] - obs) / scale

    p = jnp.asarray(np.log([0.25, 0.15]))        # ~40-60% off
    lam = 1e-3
    l_prev = float(jnp.sum(resid(p) ** 2))
    for _ in range(8):
        r, jvp = jax.linearize(resid, p)
        Jm = jax.vmap(jvp)(jnp.eye(2, dtype=p.dtype))     # (2, M)
        A = np.asarray(jnp.einsum("pm,qm->pq", Jm, Jm))
        g = np.asarray(jnp.einsum("pm,m->p", Jm, r))
        dp = np.linalg.solve(A + lam * np.diag(np.diag(A)), -g)
        p_try = p + jnp.asarray(dp)
        l_try = float(jnp.sum(resid(p_try) ** 2))
        if l_try < l_prev:
            p, l_prev, lam = p_try, l_try, lam / 3
        else:
            lam *= 4
        if l_prev < 1e-18:
            break
    fit = np.exp(np.asarray(p))
    np.testing.assert_allclose(fit, [0.4, 0.09], rtol=1e-3)


def test_check_spd_guards():
    import pytest
    bad = np.zeros((2, 3, 3))
    bad[1] = [[1, 0.5, 0], [0.2, 1, 0], [0, 0, 1]]   # asymmetric
    with pytest.raises(ValueError, match="symmetric"):
        check_spd(bad)
    neg = np.zeros((2, 3, 3))
    neg[1] = np.diag([1.0, -0.2, 1.0])
    with pytest.raises(ValueError, match="PSD"):
        check_spd(neg)

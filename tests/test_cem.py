"""Complete electrode model (ops/cem.py).

Anchors: the exact 1-D two-layer column with contact impedances on both
electrodes (P1-exact), two-terminal impedance invariance under ground
swap, charge conservation, z-monotonicity (vmapped sweep), and the
rim-concentration -> uniform-current crossover between the shunt
(z -> 0) and gap (z -> inf) limits.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.cem import (cem_weights_from_bcids,
                                       solve_case_cem)

L_XY = 0.02
DA = DB = 0.01


def _column_case(sig_a, sig_b, h=0.0025):
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
                      injected_current_A=1.0, dtype=jnp.float64)
    return mesh, case


def _patch_case(sig=0.3, h=0.0025, half_w=0.005):
    """Single-body box with a square electrode patch centered on top
    (partial coverage — the geometry where shunting matters)."""
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA, int(DA / h) + 1)
    c = L_XY / 2

    def body_fn(cx, cy, cz):
        return np.ones(cx.shape, np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        top = (nz > 0.5) & (np.abs(fz - DA) < 1e-9)
        patch = top & (np.abs(fx - c) <= half_w + 1e-9) \
            & (np.abs(fy - c) <= half_w + 1e-9)
        out[patch] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, xs, zs, body_fn, bcid_fn)
    case = build_case(mesh, {1: sig}, mode="current",
                      injected_current_A=1.0, dtype=jnp.float64)
    return mesh, case


def test_cem_column_exact():
    """Two full-face electrodes with contact impedances: the interior
    field is linear (P1-exact) and the terminal voltage is the series
    circuit I (z_a + z_g)/A + I sum d_l/(sigma_l A)."""
    sig_a, sig_b = 0.05, 0.35
    z_a, z_g = 0.011, 0.004          # ohm m^2
    I = 5e-3
    mesh, case = _column_case(sig_a, sig_b)
    W = cem_weights_from_bcids(case)
    A = L_XY * L_XY
    np.testing.assert_allclose(W.sum(axis=1), [A, A], rtol=1e-12)

    res = solve_case_cem(case, W, jnp.asarray([z_a, z_g]),
                         jnp.asarray([I, 0.0]), ground=1, tol=1e-12)
    assert bool(np.asarray(res.converged))

    Z_exact = (z_a + z_g) / A + DA / (sig_a * A) + DB / (sig_b * A)
    U = np.asarray(res.U)
    np.testing.assert_allclose(U[0], I * Z_exact, rtol=1e-8)
    np.testing.assert_allclose(U[1], 0.0, atol=1e-15)

    # recovered currents: injected at 0, balanced at the ground
    I_out = np.asarray(res.I)
    np.testing.assert_allclose(I_out, [I, -I], rtol=1e-8)

    # interior: piecewise linear from phi_bot = I z_g / A upward
    z = np.asarray(mesh.nodes[:, 2])
    phi_bot = I * z_g / A
    ja = I / A
    expected = np.where(
        z <= DA + 1e-12, phi_bot + ja * z / sig_a,
        phi_bot + ja * DA / sig_a + ja * (z - DA) / sig_b)
    np.testing.assert_allclose(np.asarray(res.phi), expected, rtol=1e-8)


def test_cem_ground_swap_invariance():
    """The two-terminal impedance U_drive/I must not depend on which
    electrode is grounded (same physical resistor network)."""
    mesh, case = _patch_case()
    W = cem_weights_from_bcids(case)
    z = jnp.asarray([0.02, 0.005])
    I = 3e-3
    r01 = solve_case_cem(case, W, z, jnp.asarray([I, 0.0]), ground=1,
                         tol=1e-12)
    r10 = solve_case_cem(case, W, z, jnp.asarray([0.0, -I]), ground=0,
                         tol=1e-12)
    Z_a = float(np.asarray(r01.U)[0]) / I
    Z_b = -float(np.asarray(r10.U)[1]) / I
    np.testing.assert_allclose(Z_a, Z_b, rtol=1e-8)
    # charge conservation in both formulations
    for r in (r01, r10):
        Iv = np.asarray(r.I)
        assert abs(Iv.sum()) <= 1e-8 * np.abs(Iv).max()


def test_cem_z_sweep_monotone_vmapped():
    """Contact-impedance sweep as ONE vmapped batch (zero re-assembly);
    the terminal impedance is strictly increasing in z_active."""
    mesh, case = _patch_case()
    W = cem_weights_from_bcids(case)
    I = 1e-3
    z_act = np.logspace(-4, -1, 6)
    zs = jnp.asarray(np.stack([z_act, np.full_like(z_act, 3e-3)], 1))

    one = lambda zz: solve_case_cem(case, W, zz,
                                    jnp.asarray([I, 0.0]), ground=1,
                                    tol=1e-11)
    out = jax.vmap(one)(zs)
    assert bool(np.asarray(out.converged).all())
    Z = np.asarray(out.U)[:, 0] / I
    assert (np.diff(Z) > 0).all()
    # each increment is at LEAST the pure series term dz/|E0|: the
    # shunt (small z) distribution minimizes volume dissipation, so
    # the spreading resistance also grows with z
    dz_series = np.diff(z_act) / float(W[0].sum())
    assert (np.diff(Z) >= dz_series * (1 - 1e-9)).all()


def test_cem_shunt_vs_gap_current_profile():
    """Under a partial patch the CEM current density concentrates at
    the rim in the shunt limit (z -> 0) and becomes uniform in the gap
    limit (z -> inf) — the physics a meshed resistive layer cannot
    express.  Nodal injected density j_n = (U - phi_n)/z."""
    mesh, case = _patch_case()
    W = cem_weights_from_bcids(case)
    w0 = W[0]
    nodes = np.asarray(mesh.nodes)
    on = w0 > 0
    c = L_XY / 2
    r_xy = np.hypot(nodes[:, 0] - c, nodes[:, 1] - c)
    rim = on & (r_xy >= 0.95 * r_xy[on].max())
    center = on & (r_xy <= 0.25 * r_xy[on].max())

    def density_ratio(z_a):
        res = solve_case_cem(case, W, jnp.asarray([z_a, 1e-3]),
                             jnp.asarray([1e-3, 0.0]), ground=1,
                             tol=1e-11)
        phi = np.asarray(res.phi)
        j = (float(np.asarray(res.U)[0]) - phi) / z_a
        return j[rim].mean() / j[center].mean()

    assert density_ratio(1e-6) > 1.5          # metal shunt: rim spike
    assert abs(density_ratio(10.0) - 1) < 0.05  # gap: uniform density


def test_cem_matches_meshed_thin_layer():
    """Parity bridge between the two electrode models: a MESHED thin
    resistive contact layer (the reference's representation, step04
    run_pressure_sweep.py:55-215) of thickness t and conductivity
    sigma_c carries z = t/sigma_c; the CEM with that z on the SAME
    stack (minus the meshed layer) must give the same terminal
    impedance up to the layer's lateral-conduction correction (small
    for thin layers over a full face: exact here, since the 1-D field
    has no lateral component)."""
    sig_a, sig_b, sig_c = 0.05, 0.35, 5e-4
    t_c = 0.0025                      # one cell of contact layer
    I = 2e-3
    h = 0.0025
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA + DB + t_c, int((DA + DB + t_c) / h) + 1)

    def body_fn(cx, cy, cz):
        out = np.where(cz < DA, 1, 2).astype(np.int32)
        out[cz > DA + DB] = 3         # meshed contact layer on top
        return out

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        top = (nz > 0.5) & (np.abs(fz - (DA + DB + t_c)) < 1e-9)
        out[top] = core.BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh3 = build_mesh_from_lattice(xs, xs, zs, body_fn, bcid_fn)
    case3 = build_case(mesh3, {1: sig_a, 2: sig_b, 3: sig_c},
                       mode="current", injected_current_A=I,
                       dtype=jnp.float64)
    from pelvistim_fem_tpu.ops.solve import solve_case_refined
    res3 = solve_case_refined(case3, tol=1e-10)
    assert bool(np.asarray(res3.converged))
    # terminal voltage of the meshed model: top surface average minus
    # grounded bottom (Dirichlet 0 in current mode)
    from pelvistim_fem_tpu.ops.bc import electrode_node_masks
    act, _ = electrode_node_masks(np.asarray(case3.faces),
                                  np.asarray(case3.face_bcid),
                                  case3.n_nodes)
    V_meshed = float(np.asarray(res3.phi) @ (act / act.sum()))

    # CEM twin: the 2-body column, contact as z = t/sigma_c, and the
    # bottom grounded through a vanishing contact impedance (the
    # meshed model's bottom is an ideal Dirichlet ground)
    mesh2, case2 = _column_case(sig_a, sig_b)
    W = cem_weights_from_bcids(case2)
    z_eq = t_c / sig_c
    res2 = solve_case_cem(case2, W, jnp.asarray([z_eq, 1e-12]),
                          jnp.asarray([I, 0.0]), ground=1, tol=1e-12)
    V_cem = float(np.asarray(res2.U)[0])
    np.testing.assert_allclose(V_cem, V_meshed, rtol=1e-6)


def test_stencil_cem_matches_element_path():
    """The stencil fast-path CEM (certified f32-inner/f64-correction
    MG solve) must reproduce the element-path CEM: the discrete system
    is IDENTICAL (same lumped weights, same P1 stiffness), so phi/U/I
    agree to solver tolerance on both the exact column and the partial
    patch geometry."""
    from pelvistim_fem_tpu.ops.cem import (solve_stencil_cem_refined,
                                           stencil_cem_setup)
    from pelvistim_fem_tpu.ops.stencil import stencil_host_data

    for builder in (_column_case, lambda: _patch_case()):
        mesh, case = (builder(0.05, 0.35) if builder is _column_case
                      else builder())
        W = cem_weights_from_bcids(case)
        z = jnp.asarray([0.012, 0.003])
        I = jnp.asarray([4e-3, 0.0])

        ref = solve_case_cem(case, W, z, I, ground=1, tol=1e-12)
        hd = stencil_host_data(case, mesh)
        from pelvistim_fem_tpu.ops.stencil import build_stencil_case
        sc = build_stencil_case(case, mesh, dtype=jnp.float64,
                                host_data=hd)
        Wg, present, hier = stencil_cem_setup(hd, W, ground=1)
        res = solve_stencil_cem_refined(sc, hier, Wg, present, z, I,
                                        ground=1, tol=1e-10)
        assert bool(np.asarray(res.converged))
        assert float(np.asarray(res.residual)) <= 1e-10
        scale = float(np.abs(np.asarray(ref.phi)).max())
        np.testing.assert_allclose(np.asarray(res.phi),
                                   np.asarray(ref.phi),
                                   atol=1e-8 * scale)
        np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(res.I), np.asarray(ref.I),
                                   rtol=1e-7)


def test_cem_amg_preconditioner_parity():
    """AMG-preconditioned CEM (build_cem_amg: hierarchy of the plain
    stiffness with the grounded patch pinned) must reproduce the
    Jacobi-CG solution and converge in fewer iterations at the hard
    7000x contrast where Jacobi crawls."""
    from pelvistim_fem_tpu.ops.cem import build_cem_amg
    sig_a, sig_b = 5e-5, 0.35          # step04-class contact contrast
    mesh, case = _column_case(sig_a, sig_b)
    W = cem_weights_from_bcids(case)
    z = jnp.asarray([0.011, 0.004])
    I = jnp.asarray([5e-3, 0.0])

    rj = solve_case_cem(case, W, z, I, ground=1, tol=1e-11)
    amg = build_cem_amg(case, W, ground=1, mesh=mesh,
                        dtype=jnp.float64)
    ra = solve_case_cem(case, W, z, I, ground=1, amg=amg, tol=1e-11)
    assert bool(np.asarray(ra.converged))
    assert int(ra.iterations) < int(rj.iterations), (
        int(ra.iterations), int(rj.iterations))
    np.testing.assert_allclose(np.asarray(ra.U), np.asarray(rj.U),
                               rtol=1e-8)
    scale = float(np.abs(np.asarray(rj.phi)).max())
    np.testing.assert_allclose(np.asarray(ra.phi), np.asarray(rj.phi),
                               atol=1e-8 * scale)

    # the exact 1-D column answer still holds with AMG in the loop
    A = L_XY * L_XY
    Z_exact = (float(z[0]) + float(z[1])) / A + DA / (sig_a * A) \
        + DB / (sig_b * A)
    np.testing.assert_allclose(float(np.asarray(ra.U)[0]),
                               float(I[0]) * Z_exact, rtol=1e-7)


def _three_electrode_case(sig=0.3, h=0.0025):
    """Two top patches (bcids 1 and 4) + full bottom return (bcid 2):
    the smallest geometry where the transfer matrix has a nontrivial
    floating block."""
    xs = np.linspace(0, L_XY, int(L_XY / h) + 1)
    zs = np.linspace(0, DA, int(DA / h) + 1)
    q = L_XY / 4

    def body_fn(cx, cy, cz):
        return np.ones(cx.shape, np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        top = (nz > 0.5) & (np.abs(fz - DA) < 1e-9)
        w = 0.004
        p1 = top & (np.abs(fx - q) <= w) & (np.abs(fy - q) <= w)
        p2 = top & (np.abs(fx - 3 * q) <= w) & (np.abs(fy - 3 * q) <= w)
        out[p1] = core.BC_ACTIVE
        out[p2] = 4
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, xs, zs, body_fn, bcid_fn)
    case = build_case(mesh, {1: sig}, mode="current",
                      injected_current_A=1.0, dtype=jnp.float64)
    return mesh, case


def test_cem_transfer_matrix():
    """Z[l, k] packaging: rows match per-drive solves, the floating
    block is symmetric (reciprocity of the SPD system), diagonal
    dominates, and every drive's charge balances at the ground."""
    from pelvistim_fem_tpu.ops.cem import cem_transfer_matrix
    mesh, case = _three_electrode_case()
    W = cem_weights_from_bcids(case, bcids=(1, 4, 2))
    z = jnp.asarray([0.02, 0.013, 0.004])

    out = cem_transfer_matrix(case, W, z, ground=2, tol=1e-11)
    assert out["converged"].all()
    Z = out["Z"]
    np.testing.assert_array_equal(out["drives"], [0, 1])
    # ground row zero (gauge)
    np.testing.assert_allclose(Z[2], 0.0, atol=1e-15)

    # reciprocity over the floating block
    np.testing.assert_allclose(Z[0, 1], Z[1, 0], rtol=1e-8)
    # diagonal (self) impedance dominates the mutual
    assert Z[0, 0] > Z[0, 1] > 0
    assert Z[1, 1] > Z[1, 0] > 0

    # rows match independent single-drive solves
    for row, e in enumerate(out["drives"]):
        I = np.zeros(3)
        I[e] = 1.0
        ref = solve_case_cem(case, W, z, jnp.asarray(I), ground=2,
                             tol=1e-11)
        np.testing.assert_allclose(Z[e], np.asarray(ref.U), rtol=1e-9,
                                   atol=1e-12)
        # charge balance: all injected current exits at the ground
        np.testing.assert_allclose(out["I"][row].sum(), 0.0, atol=1e-8)
        np.testing.assert_allclose(out["I"][row][2], -1.0, rtol=1e-7)


def _column_stencil_cem(sig_a, sig_b, ground=1):
    from pelvistim_fem_tpu.ops.cem import stencil_cem_setup
    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    mesh, case = _column_case(sig_a, sig_b)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64,
                            host_data=hd)
    W = cem_weights_from_bcids(case)
    Wg, present, hier = stencil_cem_setup(hd, W, ground=ground)
    return mesh, case, sc, hier, Wg, present


def test_cem_eqs_column_exact_complex():
    """Complex two-layer column with complex contact impedances: the
    terminal voltage is the exact complex series circuit
    U = I [(z_a + z_g)/A + d_a/(kappa_a A) + d_b/(kappa_b A)] with
    kappa = sigma + i omega eps0 epsr (P1-exact interior)."""
    from pelvistim_fem_tpu.ops.cem import solve_stencil_cem_eqs_refined
    from pelvistim_fem_tpu.ops.eqs import admittivity_imag_table
    sig_a, sig_b = 0.05, 0.35
    epsr = np.array([0.0, 4e6, 8e4])       # slots 0(unused), body1, 2
    f_hz = 1_000.0
    omega = 2 * np.pi * f_hz
    z_a = 0.011 - 0.004j                    # capacitive contact
    z_g = 0.004 - 0.001j
    I = 5e-3

    mesh, case, sc, hier, Wg, present = _column_stencil_cem(sig_a,
                                                            sig_b)
    ki = admittivity_imag_table(jnp.asarray(epsr), omega)
    z2 = jnp.asarray(np.stack([[z_a.real, z_g.real],
                               [z_a.imag, z_g.imag]]))
    res = solve_stencil_cem_eqs_refined(
        sc, hier, Wg, present, z2, jnp.asarray([I, 0.0]),
        ki_table=ki, ground=1, tol=1e-10)
    assert bool(np.asarray(res.converged))

    A = L_XY * L_XY
    eps0 = 8.8541878128e-12
    ka = sig_a + 1j * omega * eps0 * epsr[1]
    kb = sig_b + 1j * omega * eps0 * epsr[2]
    Z_exact = (z_a + z_g) / A + DA / (ka * A) + DB / (kb * A)
    U = np.asarray(res.U)
    U0 = U[0, 0] + 1j * U[1, 0]
    np.testing.assert_allclose(U0, I * Z_exact, rtol=1e-8)

    # complex charge balance: injected at 0, returned at the ground
    I_out = np.asarray(res.I)
    np.testing.assert_allclose(I_out[0], [I, -I], rtol=1e-7)
    np.testing.assert_allclose(I_out[1], 0.0, atol=1e-9 * I)


def test_cem_eqs_zero_frequency_reduces_to_real():
    """ki = 0 and real z: the complex CEM must reproduce the real
    stencil CEM exactly (same discrete system)."""
    from pelvistim_fem_tpu.ops.cem import (solve_stencil_cem_eqs_refined,
                                           solve_stencil_cem_refined)
    mesh, case, sc, hier, Wg, present = _column_stencil_cem(0.05, 0.35)
    z = np.array([0.012, 0.003])
    I = jnp.asarray([4e-3, 0.0])
    ref = solve_stencil_cem_refined(sc, hier, Wg, present,
                                    jnp.asarray(z), I, ground=1,
                                    tol=1e-10)
    z2 = jnp.asarray(np.stack([z, np.zeros_like(z)]))
    res = solve_stencil_cem_eqs_refined(
        sc, hier, Wg, present, z2, I,
        ki_table=jnp.zeros_like(sc.sigma_table), ground=1, tol=1e-10)
    assert bool(np.asarray(res.converged))
    scale = float(np.abs(np.asarray(ref.phi)).max())
    np.testing.assert_allclose(np.asarray(res.phi)[0],
                               np.asarray(ref.phi), atol=1e-8 * scale)
    np.testing.assert_allclose(np.asarray(res.phi)[1], 0.0,
                               atol=1e-10 * scale)
    np.testing.assert_allclose(np.asarray(res.U)[0], np.asarray(ref.U),
                               rtol=1e-8)


def test_cpe_contact_impedance_limits():
    """alpha = 1 is an ideal capacitor (phase -90 deg, |z| ~ 1/w);
    alpha < 1 gives the constant CPE phase -alpha*90 deg."""
    from pelvistim_fem_tpu.ops.cem import cpe_contact_impedance
    f = np.array([10.0, 100.0, 1000.0])
    z_cap = cpe_contact_impedance(f, q_cpe=2e-2, alpha=1.0)
    np.testing.assert_allclose(np.angle(z_cap), -np.pi / 2, rtol=1e-12)
    np.testing.assert_allclose(np.abs(z_cap[0]) / np.abs(z_cap[2]),
                               100.0, rtol=1e-12)
    z_cpe = cpe_contact_impedance(f, q_cpe=2e-2, alpha=0.8)
    np.testing.assert_allclose(np.angle(z_cpe), -0.8 * np.pi / 2,
                               rtol=1e-12)
    # a series resistance dominates at high frequency
    z_s = cpe_contact_impedance(np.array([1e7]), z_ser=0.01,
                                q_cpe=2e-2, alpha=1.0)
    np.testing.assert_allclose(z_s.real, 0.01, rtol=1e-3)

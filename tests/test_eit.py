"""EIT inverse problem on the CEM (ops/eit.py).

Anchors: analytic lead-field Jacobians against central finite
differences of the forward map (both sigma and contact-impedance
derivatives), joint (sigma, z) Gauss-Newton recovery from noiseless
synthetic electrode voltages, localization of the linear difference
image, and the sensitivity map concentrating under the electrodes.
"""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import build_mesh_from_lattice
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.cem import (cem_transfer_matrix,
                                       cem_weights_from_bcids)
from pelvistim_fem_tpu.ops.eit import (eit_difference_image,
                                       eit_jacobians, eit_recover,
                                       eit_sensitivity_cells)

L = 0.02
LZ = 0.02
BCIDS = (1, 4, 5, 2)        # three top patches + bottom return
GROUND = 3                  # index into BCIDS


def _four_electrode_case(sig=(0.2, 0.05), h=0.0025):
    """Two z-layers, three unequal top patches (bcids 1/4/5) and the
    full bottom plane as ground (bcid 2) — the smallest geometry where
    the 9-measurement floating block overdetermines a 6-parameter
    (2 sigma + 4 z) joint fit."""
    xs = np.linspace(0, L, int(L / h) + 1)
    zs = np.linspace(0, LZ, int(LZ / h) + 1)
    patches = [((0.005, 0.005), 0.0026, core.BC_ACTIVE),
               ((0.015, 0.005), 0.0031, 4),
               ((0.010, 0.015), 0.0036, 5)]

    def body_fn(cx, cy, cz):
        return np.where(cz < LZ / 2, 1, 2).astype(np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, core.BC_INSULATED, np.int32)
        top = (nz > 0.5) & (np.abs(fz - LZ) < 1e-9)
        for (px, py), w, b in patches:
            m = top & (np.abs(fx - px) <= w) & (np.abs(fy - py) <= w)
            out[m] = b
        out[(nz < -0.5) & (np.abs(fz) < 1e-9)] = core.BC_RETURN
        return out

    mesh = build_mesh_from_lattice(xs, xs, zs, body_fn, bcid_fn)
    case = build_case(mesh, {1: sig[0], 2: sig[1]}, mode="current",
                      injected_current_A=1.0, dtype=jnp.float64)
    return mesh, case


def _floating(out):
    return out["Z"][np.ix_(out["drives"], out["drives"])]


def test_eit_jacobians_match_fd():
    """dZ/dsigma_b and dZ/dz_m from the lead fields must match central
    finite differences of the forward map."""
    mesh, case = _four_electrode_case()
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    z = np.array([0.02, 0.012, 0.03, 0.004])
    base = np.asarray(case.sigma_table, np.float64)

    out = cem_transfer_matrix(case, W, jnp.asarray(z), ground=GROUND,
                              tol=1e-12)
    assert out["converged"].all()
    J_sig, J_z = eit_jacobians(case, W, z, out)

    hrel = 3e-4
    for b in (1, 2):
        tab = base.copy()
        hb = hrel * base[b]
        tab[b] = base[b] + hb
        Zp = _floating(cem_transfer_matrix(
            case, W, jnp.asarray(z), ground=GROUND,
            sigma_table=jnp.asarray(tab), tol=1e-12))
        tab[b] = base[b] - hb
        Zm = _floating(cem_transfer_matrix(
            case, W, jnp.asarray(z), ground=GROUND,
            sigma_table=jnp.asarray(tab), tol=1e-12))
        fd = (Zp - Zm) / (2 * hb)
        scale = np.abs(fd).max()
        np.testing.assert_allclose(J_sig[:, :, b], fd,
                                   atol=1e-5 * scale)

    for m in range(4):
        zp = z.copy()
        hm = hrel * z[m]
        zp[m] = z[m] + hm
        Zp = _floating(cem_transfer_matrix(case, W, jnp.asarray(zp),
                                           ground=GROUND, tol=1e-12))
        zp[m] = z[m] - hm
        Zm = _floating(cem_transfer_matrix(case, W, jnp.asarray(zp),
                                           ground=GROUND, tol=1e-12))
        fd = (Zp - Zm) / (2 * hm)
        scale = max(np.abs(fd).max(), np.abs(J_z).max() * 1e-6)
        np.testing.assert_allclose(J_z[:, :, m], fd,
                                   atol=1e-5 * scale)

    # reciprocity carries into the Jacobians (symmetric in l, k)
    np.testing.assert_allclose(J_sig, J_sig.transpose(1, 0, 2),
                               rtol=1e-7)
    np.testing.assert_allclose(J_z, J_z.transpose(1, 0, 2), rtol=1e-7)


def test_eit_recover_joint_sigma_z():
    """Noiseless synthetic measurements: joint recovery of both layer
    conductivities and the three PATCH contact impedances (the
    characterized return pad is held — see the identifiability test
    below for why it must be)."""
    sig_true = (0.21, 0.047)
    z_true = np.array([0.018, 0.011, 0.027, 0.0045])
    mesh, case = _four_electrode_case(sig=sig_true)
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    U_meas = _floating(cem_transfer_matrix(
        case, W, jnp.asarray(z_true), ground=GROUND, tol=1e-12))

    z0 = z_true * [3.0, 0.5, 2.0, 1.0]             # pad z known/held
    rec = eit_recover(case, W, [(GROUND, U_meas)], bodies=[1, 2],
                      sigma0=[0.5, 0.02],          # 2.4x / 0.4x off
                      z0=z0, fit_z=(0, 1, 2), tol=1e-12)
    assert rec["converged"]
    assert rec["loss_history"][-1] < 1e-14
    np.testing.assert_allclose(rec["sigma_table"][1:3], sig_true,
                               rtol=1e-5)
    np.testing.assert_allclose(rec["z"], z_true, rtol=1e-5)
    # the descent was real work, not a lucky start
    assert rec["loss_history"][0] > 1e-2


def test_eit_joint_identifiability_needs_pad_held():
    """The physics behind the fit_z caveat: the deep layer and the
    contact behind it enter every measurement only through their
    series sum, so freeing the pad's z adds a near-null direction
    (condition blows up ~4 orders); holding it keeps the 5-parameter
    joint problem comfortably conditioned — from ONE reference."""
    sig_true = (0.21, 0.047)
    z_true = np.array([0.018, 0.011, 0.027, 0.0045])
    mesh, case = _four_electrode_case(sig=sig_true)
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    base = np.asarray(case.sigma_table, np.float64)
    out = cem_transfer_matrix(case, W, jnp.asarray(z_true),
                              ground=GROUND, tol=1e-12)
    J_sig, J_z = eit_jacobians(case, W, z_true, out)
    D = J_sig.shape[0]
    cols = [J_sig[:, :, b].reshape(D * D) * base[b] for b in (1, 2)]
    cols += [J_z[:, :, m].reshape(D * D) * z_true[m] for m in range(4)]
    J = np.stack(cols, axis=1)
    s_all = np.linalg.svd(J, compute_uv=False)
    s_held = np.linalg.svd(J[:, :-1], compute_uv=False)
    cond_all = s_all[0] / s_all[-1]
    cond_held = s_held[0] / s_held[-1]
    assert cond_held < 1e3, cond_held
    assert cond_all > 1e2 * cond_held, (cond_all, cond_held)


def test_eit_recover_sigma_only():
    """With trusted contacts (fit_z=False) the two tissue
    conductivities are recovered from a much worse start."""
    sig_true = (0.35, 0.04)
    z_true = np.array([0.02, 0.02, 0.02, 0.005])
    mesh, case = _four_electrode_case(sig=sig_true)
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    U_meas = _floating(cem_transfer_matrix(
        case, W, jnp.asarray(z_true), ground=GROUND, tol=1e-12))

    rec = eit_recover(case, W, [(GROUND, U_meas)], bodies=[1, 2],
                      sigma0=[0.02, 0.8],          # 17x off, crossed
                      z0=z_true, fit_z=False, tol=1e-12)
    assert rec["converged"]
    np.testing.assert_allclose(rec["sigma_table"][1:3], sig_true,
                               rtol=1e-6)


def test_eit_difference_image_localizes():
    """A +5% perturbation of the TOP layer's sigma: the one-step
    minimum-norm image must place its (volume-weighted) response in
    that layer with the right sign.  (The top layer is where the
    sensitivity lives; a deep-layer perturbation would smear toward
    the electrodes — the well-known depth bias of linear min-norm
    EIT — so localization is only a fair ask where the measurements
    can actually see.)"""
    mesh, case = _four_electrode_case()
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    z = np.array([0.02, 0.012, 0.03, 0.004])
    base = np.asarray(case.sigma_table, np.float64)

    out0 = cem_transfer_matrix(case, W, jnp.asarray(z), ground=GROUND,
                               tol=1e-12)
    tab = base.copy()
    dsig = 0.05 * base[2]
    tab[2] = base[2] + dsig                       # body 2 = top layer
    Z1 = _floating(cem_transfer_matrix(
        case, W, jnp.asarray(z), ground=GROUND,
        sigma_table=jnp.asarray(tab), tol=1e-12))
    dZ = Z1 - _floating(out0)

    img = eit_difference_image(case, out0, dZ)
    body = np.asarray(case.tet_body)
    vol = np.asarray(case.vol)
    m1 = (vol[body == 1] * img[body == 1]).sum() / vol[body == 1].sum()
    m2 = (vol[body == 2] * img[body == 2]).sum() / vol[body == 2].sum()
    assert m2 > 0, m2                 # correct sign (sigma increased)
    assert m2 > 2 * abs(m1), (m1, m2)  # localized to the right layer


def test_eit_sensitivity_concentrates_under_electrodes():
    """The distinguishability map must peak near the driven top
    patches, not in the bulk."""
    mesh, case = _four_electrode_case()
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    z = np.array([0.02, 0.012, 0.03, 0.004])
    out = cem_transfer_matrix(case, W, jnp.asarray(z), ground=GROUND,
                              tol=1e-11)
    s = eit_sensitivity_cells(case, out)
    nodes = np.asarray(mesh.nodes)
    cz = nodes[np.asarray(case.tets)].mean(axis=1)[:, 2]
    assert cz[np.argmax(s)] > 0.8 * LZ
    top = s[cz > 0.75 * LZ].mean()
    bulk = s[(cz > 0.25 * LZ) & (cz < 0.5 * LZ)].mean()
    assert top > 5 * bulk, (top, bulk)


def _stencil_setup(case, mesh, ground):
    import jax.numpy as jnp

    from pelvistim_fem_tpu.ops.cem import stencil_cem_setup
    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, dtype=jnp.float64,
                            host_data=hd)
    W = cem_weights_from_bcids(case, bcids=BCIDS)
    Wg, present, hier = stencil_cem_setup(hd, W, ground=ground)
    return sc, hier, W, Wg, present


def test_stencil_transfer_matrix_matches_element():
    """The stencil fast-path transfer matrix must reproduce the
    element path (identical discrete system), and its Jacobians —
    J_sigma straight from the body-factored stencil coefficients, no
    per-element gradients — must match the element-path einsums."""
    from pelvistim_fem_tpu.ops.cem import stencil_cem_transfer_matrix
    from pelvistim_fem_tpu.ops.eit import stencil_eit_jacobians
    mesh, case = _four_electrode_case()
    sc, hier, W, Wg, present = _stencil_setup(case, mesh, GROUND)
    z = np.array([0.02, 0.012, 0.03, 0.004])

    ref = cem_transfer_matrix(case, W, jnp.asarray(z), ground=GROUND,
                              tol=1e-11)
    out = stencil_cem_transfer_matrix(sc, hier, Wg, present,
                                      jnp.asarray(z), ground=GROUND,
                                      tol=1e-10)
    assert out["converged"].all()
    np.testing.assert_allclose(out["Z"], ref["Z"], rtol=1e-7,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["phi"]),
                               np.asarray(ref["phi"]),
                               atol=1e-7 * np.abs(ref["phi"]).max())

    J_se, J_ze = eit_jacobians(case, W, z, ref)
    J_ss, J_zs = stencil_eit_jacobians(sc, Wg, z, out)
    assert J_ss.shape == J_se.shape
    np.testing.assert_allclose(J_ss, J_se,
                               atol=1e-6 * np.abs(J_se).max())
    np.testing.assert_allclose(J_zs, J_ze,
                               atol=1e-6 * np.abs(J_ze).max())


def test_eit_recover_stencil_roundtrip():
    """Joint (sigma, patch z) recovery entirely on the lattice fast
    path: certified stencil CEM forwards + coefficient-stack
    Jacobians."""
    from pelvistim_fem_tpu.ops.cem import stencil_cem_transfer_matrix
    from pelvistim_fem_tpu.ops.eit import eit_recover_stencil
    sig_true = (0.21, 0.047)
    z_true = np.array([0.018, 0.011, 0.027, 0.0045])
    mesh, case = _four_electrode_case(sig=sig_true)
    sc, hier, W, Wg, present = _stencil_setup(case, mesh, GROUND)
    U = stencil_cem_transfer_matrix(sc, hier, Wg, present,
                                    jnp.asarray(z_true), ground=GROUND,
                                    tol=1e-11)
    U_meas = U["Z"][np.ix_(U["drives"], U["drives"])]

    z0 = z_true * [3.0, 0.5, 2.0, 1.0]             # pad z known/held
    rec = eit_recover_stencil(sc, hier, Wg, present,
                              [(GROUND, U_meas)], bodies=[1, 2],
                              sigma0=[0.5, 0.02], z0=z0,
                              fit_z=(0, 1, 2), tol=1e-11)
    assert rec["converged"]
    assert rec["loss_history"][-1] < 1e-13
    np.testing.assert_allclose(rec["sigma_table"][1:3], sig_true,
                               rtol=1e-4)
    np.testing.assert_allclose(rec["z"], z_true, rtol=1e-4)

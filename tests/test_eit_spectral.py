"""Spectral (multifrequency) EIT on the complex CEM (ops/eit.py).

Anchors: the complex transfer tensor reduces exactly to the real
stencil transfer matrix at ki = 0 / real z; the complex Jacobians
match central finite differences along BOTH complex axes (real/imag
perturbations of kappa_b and z_m); and the flagship identifiability
claim — joint recovery of Cole-Cole tissue dispersion AND every
contact's CPE magnitude INCLUDING the return pad's, the parameter
single-frequency EIT provably cannot fit (tests/test_eit.py
test_eit_joint_identifiability_needs_pad_held): frequency breaks the
static series degeneracy d/sigma_deep + z_back because the CPE moves
as w^-alpha while tissue resistance does not.
"""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.ops.cem import (stencil_cem_eqs_transfer_matrix,
                                       stencil_cem_transfer_matrix)
from pelvistim_fem_tpu.ops.eit import (eit_recover_spectral,
                                       stencil_eit_jacobians_eqs)
from pelvistim_fem_tpu.ops.eqs import cole_cole_kappa

from tests.test_eit import GROUND, _four_electrode_case, _stencil_setup

FREQS = np.array([1e3, 4.64e3, 2.15e4, 1e5])     # 1-100 kHz, log-spaced


def _cpe_z(freqs, z_ser, q, alpha):
    w = 2 * np.pi * np.asarray(freqs, np.float64)
    return (np.asarray(z_ser)[None, :]
            + 1.0 / (np.asarray(q)[None, :]
                     * (1j * w[:, None]) ** alpha))


def _floating(out):
    d = out["drives"]
    return out["Z"][:, d][:, :, d]


def test_eqs_transfer_matrix_real_limit_and_symmetry():
    """With ki = 0 and real z the complex tensor must equal the real
    stencil transfer matrix row for row; the floating block must be
    complex-symmetric (reciprocity of the complex-symmetric form)."""
    mesh, case = _four_electrode_case()
    sc, hier, W, Wg, present = _stencil_setup(case, mesh, GROUND)
    z = np.array([0.02, 0.012, 0.03, 0.004])

    ref = stencil_cem_transfer_matrix(sc, hier, Wg, present,
                                      jnp.asarray(z), ground=GROUND,
                                      tol=1e-10)
    T = int(np.asarray(sc.sigma_table).shape[0])
    ki = np.zeros((2, T))
    zf = np.tile(z[None, :].astype(np.complex128), (2, 1))
    out = stencil_cem_eqs_transfer_matrix(sc, hier, Wg, present, zf,
                                          ki_tables=ki, ground=GROUND,
                                          tol=1e-10)
    assert out["converged"].all()
    for f in range(2):
        np.testing.assert_allclose(out["Z"][f].real, ref["Z"],
                                   rtol=1e-7, atol=1e-11)
        np.testing.assert_allclose(out["Z"][f].imag, 0.0, atol=1e-9)

    # genuinely complex case: floating block symmetric in (l, k)
    ki2 = np.zeros((len(FREQS), T))
    ki2[:, 1] = 2 * np.pi * FREQS * 8.854e-12 * 3e4
    zf2 = _cpe_z(FREQS, [0.005] * 4, [8e-3, 9e-3, 7e-3, 2e-2], 0.8)
    out2 = stencil_cem_eqs_transfer_matrix(sc, hier, Wg, present, zf2,
                                           ki_tables=ki2, ground=GROUND,
                                           tol=1e-10)
    assert out2["converged"].all()
    Zb = _floating(out2)
    assert np.abs(Zb.imag).max() > 1e-5 * np.abs(Zb.real).max()
    np.testing.assert_allclose(Zb, Zb.transpose(0, 2, 1), rtol=1e-7)


def test_spectral_jacobians_match_fd():
    """dZ/dkappa_b and dZ/dz_m must match central finite differences
    along BOTH the real and imaginary perturbation axes — the complex
    bilinear identities hold only without conjugation, so a wrong
    (sesquilinear) form would pass the real axis and fail the
    imaginary one."""
    mesh, case = _four_electrode_case()
    sc, hier, W, Wg, present = _stencil_setup(case, mesh, GROUND)
    T = int(np.asarray(sc.sigma_table).shape[0])
    freqs = FREQS[1:3]
    F = len(freqs)
    kr = np.tile(np.asarray(sc.sigma_table, np.float64), (F, 1))
    ki = np.zeros((F, T))
    ki[:, 1] = 2 * np.pi * freqs * 8.854e-12 * 3e4
    ki[:, 2] = 2 * np.pi * freqs * 8.854e-12 * 5e3
    zf = _cpe_z(freqs, [0.005] * 4, [8e-3, 9e-3, 7e-3, 2e-2], 0.8)

    def fwd(krt, kit, z):
        out = stencil_cem_eqs_transfer_matrix(
            sc, hier, Wg, present, z, ki_tables=kit, kr_tables=krt,
            ground=GROUND, tol=1e-12)
        assert out["converged"].all()
        return out

    out = fwd(kr, ki, zf)
    J_kap, J_z = stencil_eit_jacobians_eqs(sc, Wg, zf, out)

    for b in (1, 2):
        h = 3e-4 * kr[0, b]
        for direction in (1.0, 1j):
            kp, km = kr.copy(), kr.copy()
            ip, im = ki.copy(), ki.copy()
            if direction == 1.0:
                kp[:, b] += h
                km[:, b] -= h
            else:
                ip[:, b] += h
                im[:, b] -= h
            fd = (_floating(fwd(kp, ip, zf))
                  - _floating(fwd(km, im, zf))) / (2 * h * direction)
            scale = np.abs(fd).max()
            np.testing.assert_allclose(J_kap[:, :, :, b], fd,
                                       atol=2e-5 * scale)

    for m in (0, 3):                      # a patch and the pad
        h = 3e-4 * abs(zf[0, m])
        for direction in (1.0, 1j):
            zp = zf.copy()
            zm = zf.copy()
            zp[:, m] += h * direction
            zm[:, m] -= h * direction
            fd = (_floating(fwd(kr, ki, zp))
                  - _floating(fwd(kr, ki, zm))) / (2 * h * direction)
            scale = np.abs(fd).max()
            np.testing.assert_allclose(J_z[:, :, :, m], fd,
                                       atol=2e-5 * scale)

    # reciprocity carries into both Jacobians
    np.testing.assert_allclose(J_kap, J_kap.transpose(0, 2, 1, 3),
                               rtol=1e-7)
    np.testing.assert_allclose(J_z, J_z.transpose(0, 2, 1, 3),
                               rtol=1e-7)


def test_eit_recover_spectral_roundtrip_fits_pad():
    """Joint recovery of skin Cole-Cole (sigma_s, d_eps, tau), deep
    sigma_s, and ALL FOUR contact CPE magnitudes — including the
    return pad's, which the static protocol must hold
    (test_eit_joint_identifiability_needs_pad_held) — from noiseless
    complex spectra at 4 frequencies."""
    true_skin = dict(sigma_s=0.21, d_eps=3e4, tau=1.2e-5)
    true_deep = dict(sigma_s=0.047)
    q_true = np.array([8e-3, 1.1e-2, 6e-3, 2.5e-2])
    z_ser = np.array([0.004, 0.004, 0.004, 0.001])
    alpha = 0.8

    mesh, case = _four_electrode_case(
        sig=(true_skin["sigma_s"], true_deep["sigma_s"]))
    sc, hier, W, Wg, present = _stencil_setup(case, mesh, GROUND)
    T = int(np.asarray(sc.sigma_table).shape[0])
    kr = np.tile(np.asarray(sc.sigma_table, np.float64), (len(FREQS), 1))
    ki = np.zeros((len(FREQS), T))
    kap = cole_cole_kappa(FREQS, true_skin["sigma_s"], 0.0,
                          [(true_skin["d_eps"], true_skin["tau"], 0.0)])
    kr[:, 1], ki[:, 1] = kap.real, kap.imag
    zf = _cpe_z(FREQS, z_ser, q_true, alpha)
    meas = stencil_cem_eqs_transfer_matrix(sc, hier, Wg, present, zf,
                                           ki_tables=ki, kr_tables=kr,
                                           ground=GROUND, tol=1e-11)
    assert meas["converged"].all()

    rec = eit_recover_spectral(
        sc, hier, Wg, present, FREQS, _floating(meas),
        body_models={1: dict(sigma_s=0.5, d_eps=1e4, tau=4e-6),
                     2: dict(sigma_s=0.02)},
        z_ser=z_ser, q_cpe=q_true * [3.0, 0.4, 2.0, 0.5],
        alpha_cpe=alpha, fit_q=True, ground=GROUND, tol=1e-11)
    assert rec["converged"], rec["loss_history"][-5:]
    assert rec["loss_history"][-1] < 1e-12
    m1 = rec["body_models"][1]
    np.testing.assert_allclose(
        [m1["sigma_s"], m1["d_eps"], m1["tau"]],
        [true_skin["sigma_s"], true_skin["d_eps"], true_skin["tau"]],
        rtol=1e-3)
    np.testing.assert_allclose(rec["body_models"][2]["sigma_s"],
                               true_deep["sigma_s"], rtol=1e-3)
    np.testing.assert_allclose(rec["q_cpe"], q_true, rtol=1e-3)
    # the posterior agrees this is now identifiable: every fitted log
    # parameter, pad q included, carries a finite, small error bar
    assert np.all(np.isfinite(rec["log_std"]))


def test_eqs_cem_element_path_matches_stencil():
    """The element-path complex CEM (imported-mesh twin) must
    reproduce the stencil fast path: same discrete system, so the
    complex transfer tensor, lead fields, and BOTH analytic Jacobians
    agree to solver tolerance; and a short element-path spectral fit
    recovers a perturbed skin dispersion."""
    from pelvistim_fem_tpu.ops.cem import (cem_eqs_transfer_matrix,
                                           cem_weights_from_bcids)
    from pelvistim_fem_tpu.ops.eit import (eit_jacobians_eqs,
                                           eit_recover_spectral_case)

    mesh, case = _four_electrode_case()
    sc, hier, W, Wg, present = _stencil_setup(case, mesh, GROUND)
    T = int(np.asarray(sc.sigma_table).shape[0])
    freqs = FREQS[::2]
    F = len(freqs)
    kr = np.tile(np.asarray(sc.sigma_table, np.float64), (F, 1))
    ki = np.zeros((F, T))
    kap = cole_cole_kappa(freqs, kr[0, 1], 0.0, [(3e4, 1.2e-5, 0.0)])
    kr[:, 1], ki[:, 1] = kap.real, kap.imag
    zf = _cpe_z(freqs, [0.004] * 4, [8e-3, 1.1e-2, 6e-3, 2.5e-2], 0.8)

    ref = stencil_cem_eqs_transfer_matrix(sc, hier, Wg, present, zf,
                                          ki_tables=ki, kr_tables=kr,
                                          ground=GROUND, tol=1e-11)
    out = cem_eqs_transfer_matrix(case, W, zf, ki_tables=ki,
                                  kr_tables=kr, ground=GROUND,
                                  tol=1e-10)
    assert out["converged"].all()
    np.testing.assert_allclose(out["Z"], ref["Z"], rtol=1e-7,
                               atol=1e-11)

    J_ks, J_zs = stencil_eit_jacobians_eqs(sc, Wg, zf, ref)
    J_ke, J_ze = eit_jacobians_eqs(case, W, zf, out)
    np.testing.assert_allclose(J_ke, J_ks[:, :, :, :J_ke.shape[3]],
                               atol=1e-6 * np.abs(J_ks).max())
    np.testing.assert_allclose(J_ze, J_zs,
                               atol=1e-6 * np.abs(J_zs).max())

    # the AMG-preconditioned branch must reach the same certified
    # answer (real-part ground-pinned V-cycle per component)
    from pelvistim_fem_tpu.ops.cem import build_cem_amg
    amg = build_cem_amg(case, W, ground=GROUND, mesh=mesh)
    out_amg = cem_eqs_transfer_matrix(case, W, zf[:1],
                                      ki_tables=ki[:1],
                                      kr_tables=kr[:1], ground=GROUND,
                                      amg=amg, tol=1e-10)
    assert out_amg["converged"].all()
    np.testing.assert_allclose(out_amg["Z"][0], ref["Z"][0], rtol=1e-7,
                               atol=1e-11)

    # short element-path spectral fit: skin (sigma_s, d_eps) + one
    # patch q from 1.5x-off starts (tau held at truth to keep the
    # suite fast; the full joint fit is the stencil round-trip above)
    d = ref["drives"]
    M = ref["Z"][:, d][:, :, d]
    rec = eit_recover_spectral_case(
        case, W, freqs, M,
        body_models={1: dict(sigma_s=0.3, d_eps=3e4, tau=1.2e-5)},
        z_ser=np.array([0.004] * 4),
        q_cpe=np.array([8e-3 * 1.5, 1.1e-2, 6e-3, 2.5e-2]),
        alpha_cpe=0.8, fit_q=(0,), ground=GROUND, tol=1e-10)
    assert rec["converged"]
    np.testing.assert_allclose(rec["body_models"][1]["sigma_s"], 0.2,
                               rtol=1e-3)
    np.testing.assert_allclose(rec["q_cpe"][0], 8e-3, rtol=1e-3)

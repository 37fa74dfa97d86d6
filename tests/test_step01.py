"""step01 analytic golden test — the reference's correctness gate
(step01_box/test_step01_baseline.py:22-25) at the same tolerances:

  rel-error of mean |J| vs sigma*dV/Lz < 1e-3
  CV = std/mean of |J|                 < 1e-2
  R^2 of V(z) along a center column    > 0.9999
  top/bottom flux mismatch             < 1e-2

plus the driver's stronger rel-L2 <= 1e-6 potential-parity gate vs the
analytic solution (BASELINE.json).
"""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.models.box import build_box_case
from pelvistim_fem_tpu.ops import fields
from pelvistim_fem_tpu.ops.solve import solve_case, solve_case_refined

SIGMA, LZ, DV = 0.2, 0.02, 1.0
J_ANALYTIC = SIGMA * DV / LZ  # = 10 A/m^2 (step01_box/README.md:16)


def _solve():
    case, params = build_box_case()
    res = solve_case(case, tol=1e-10)
    assert bool(res.converged)
    return case, res


def test_mean_J_and_uniformity():
    case, res = _solve()
    J = np.asarray(fields.cell_J(case, res.phi))
    Jmag = np.linalg.norm(J, axis=1)
    rel_err = abs(Jmag.mean() - J_ANALYTIC) / J_ANALYTIC
    cv = Jmag.std() / Jmag.mean()
    assert rel_err < 1e-3, rel_err          # ref gate :22
    assert cv < 1e-2, cv                    # ref gate :23


def test_potential_profile_r2():
    case, res = _solve()
    pts = np.asarray(case.nodes)
    phi = np.asarray(res.phi)
    # center column (ref test_step01_baseline.py:77-87)
    cx, cy = 0.02, 0.02
    col = (np.abs(pts[:, 0] - cx) < 1e-6) & (np.abs(pts[:, 1] - cy) < 1e-6)
    assert col.sum() >= 3
    z, v = pts[col, 2], phi[col]
    A = np.vstack([z, np.ones_like(z)]).T
    coef, *_ = np.linalg.lstsq(A, v, rcond=None)
    v_fit = A @ coef
    ss_res = ((v - v_fit) ** 2).sum()
    ss_tot = ((v - v.mean()) ** 2).sum()
    r2 = 1 - ss_res / ss_tot
    assert r2 > 0.9999, r2                  # ref gate :24


def test_flux_conservation():
    case, res = _solve()
    flux = np.asarray(fields.boundary_face_flux(case, res.phi))
    bcid = np.asarray(case.face_bcid)
    I_top = flux[bcid == 1].sum()
    I_bot = flux[bcid == 2].sum()
    mismatch = abs(abs(I_top) - abs(I_bot)) / max(abs(I_top), abs(I_bot))
    assert mismatch < 1e-2, mismatch        # ref gate :25


def test_potential_rel_l2_vs_analytic():
    """Driver gate: rel-L2 <= 1e-6 vs the analytic potential (which the
    Elmer baseline itself converges to on this separable problem)."""
    case, res = _solve()
    z = np.asarray(case.nodes)[:, 2]
    exact = z / LZ
    rel_l2 = np.linalg.norm(np.asarray(res.phi) - exact) / np.linalg.norm(
        exact)
    assert rel_l2 <= 1e-6, rel_l2


def test_mixed_precision_refinement_hits_tolerance():
    """f32 CG + f64 refinement reaches the same 1e-8 residual (the TPU
    execution mode)."""
    case, _ = build_box_case()
    res = solve_case_refined(case, tol=1e-10, inner_tol=1e-5,
                             max_refinements=8)
    assert bool(res.converged)
    z = np.asarray(case.nodes)[:, 2]
    exact = z / LZ
    rel_l2 = np.linalg.norm(np.asarray(res.phi) - exact) / np.linalg.norm(
        exact)
    assert rel_l2 <= 1e-6, rel_l2

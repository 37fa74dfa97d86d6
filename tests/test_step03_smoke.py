"""step03 smoke-test parity — the reference's end-to-end invariants
(step03_ankle_layers/smoke_test.py:82-188) on one coarse case:

  phi present/finite, range valid for the control mode; J finite;
  E computable; flux_err < 5%; I > 0; ROI mean |J| > 1e-6;
  compliance_V finite and positive.
"""

import numpy as np
import pytest

from pelvistim_fem_tpu.models.ankle import build_layered_case
from pelvistim_fem_tpu.ops import fields, metrics
from pelvistim_fem_tpu.ops.solve import solve_case

FLUX_TOL = 0.05  # ref smoke_test.py:31


@pytest.fixture(scope="module")
def smoke():
    case, params = build_layered_case(coarse=True)
    res = solve_case(case, tol=1e-8, maxiter=30_000)
    assert bool(res.converged)
    out = metrics.extract_results(case, res.phi, params, verbose=False)
    return case, res, params, out


def test_phi_finite_and_mode_range(smoke):
    case, res, params, out = smoke
    phi = np.asarray(res.phi)
    assert np.isfinite(phi).all()
    # current mode: max potential > 0 (ref smoke_test.py:111-113)
    assert phi.max() > 0


def test_J_and_E_finite(smoke):
    case, res, _, _ = smoke
    J = np.asarray(fields.cell_J(case, res.phi))
    E = np.asarray(fields.cell_E(case, res.phi))
    assert np.isfinite(J).all() and np.isfinite(E).all()


def test_flux_error_under_5pct(smoke):
    _, _, _, out = smoke
    assert out["flux_err"] < FLUX_TOL, out["flux_err"]
    # framework extra: consistent flux error at solver tolerance
    assert out["flux_err_consistent"] < 1e-6


def test_current_positive_and_consistent_exact(smoke):
    _, _, _, out = smoke
    assert out["total_current_A"] > 0
    np.testing.assert_allclose(out["I_active_consistent_A"], 5e-3,
                               rtol=1e-8)
    np.testing.assert_allclose(out["I_return_consistent_A"], 5e-3,
                               rtol=1e-6)


def test_roi_nonzero(smoke):
    _, _, _, out = smoke
    assert out["roi_mean_J"] > 1e-6
    assert out["roi_mean_E"] > 0


def test_compliance_positive(smoke):
    _, _, _, out = smoke
    assert np.isfinite(out["compliance_V"]) and out["compliance_V"] > 0


def test_roi_layer_fractions_sum_to_one(smoke):
    _, _, _, out = smoke
    s = (out["roi_frac_muscle"] + out["roi_frac_fat"]
         + out["roi_frac_skin"])
    np.testing.assert_allclose(s, 1.0, atol=1e-9)


def test_metric_columns_cover_reference_schema(smoke):
    """The 37-column step03 contract (extract_results,
    run_layered_sweep.py:990-1030)."""
    _, _, _, out = smoke
    required = [
        "t_fat_mm", "elec_r_mm", "elec_area_cm2", "elec_area_mesh_cm2",
        "return_area_mesh_cm2", "elec_shape", "contact_enabled",
        "sigma_skin", "control_mode", "jn_used", "peak_J_skin_with_elec",
        "peak_J_skin_no_elec", "roi_mean_J", "roi_mean_E", "efficiency",
        "compliance_V", "exceeded_compliance", "total_current_A",
        "I_active_signed_A", "I_return_A", "I_return_signed_A",
        "peak_J_skin_per_A", "roi_mean_J_per_A", "roi_mean_E_per_A",
        "efficiency_per_A", "flux_err", "roi_layer", "roi_n_cells",
        "roi_radius_used_mm", "roi_center_z_mm", "dist_fat_muscle_mm",
        "roi_frac_muscle", "roi_frac_fat", "roi_frac_skin",
        "active_boundary_id_used", "return_boundary_id_used",
    ]
    missing = [k for k in required if k not in out]
    assert not missing, missing

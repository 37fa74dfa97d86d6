"""Viz-layer smoke tests: every figure family renders from real solved
data and lands on disk as a non-trivial PNG."""

from pathlib import Path

import numpy as np
import pytest

from pelvistim_fem_tpu.models.ankle import build_layered_case
from pelvistim_fem_tpu.models.box import build_box_case
from pelvistim_fem_tpu.ops.metrics import extract_results
from pelvistim_fem_tpu.ops.solve import solve_case
from pelvistim_fem_tpu.viz import plots


@pytest.fixture(scope="module")
def solved_layered():
    case, params, mesh = build_layered_case(coarse=True, with_mesh=True)
    res = solve_case(case, tol=1e-8, maxiter=30_000)
    row = extract_results(case, res.phi, params, verbose=False)
    return case, params, mesh, res, row


def _check(path):
    p = Path(path)
    assert p.exists() and p.stat().st_size > 10_000, path


def test_step01_summary(tmp_path):
    case, params, mesh = build_box_case(with_mesh=True)
    res = solve_case(case, tol=1e-10)
    _check(plots.plot_step01_summary(case, mesh, res.phi, tmp_path))


def test_J_surface_maps(solved_layered, tmp_path):
    case, params, mesh, res, _ = solved_layered
    paths = plots.plot_J_surface_maps(
        [("smoke", case, mesh, res.phi)], params, tmp_path)
    assert len(paths) == 3      # linear, log, masked
    for p in paths:
        _check(p)


def test_summary_metrics(solved_layered, tmp_path):
    case, params, mesh, res, row = solved_layered
    _check(plots.plot_summary_metrics([row], params, tmp_path))


def test_depth_slice_E_maps(solved_layered, tmp_path):
    case, params, mesh, res, _ = solved_layered
    _check(plots.plot_depth_slice_E_maps(
        [("smoke", case, mesh, res.phi)], params, tmp_path))


def test_model_diagram(solved_layered, tmp_path):
    case, params, mesh, res, _ = solved_layered
    _check(plots.plot_model_diagram(case, mesh, res.phi, params,
                                    tmp_path))


def test_3d_representative(solved_layered, tmp_path):
    case, params, mesh, res, _ = solved_layered
    _check(plots.plot_3d_representative(case, mesh, res.phi, tmp_path))


def test_pressure_results(tmp_path):
    from pelvistim_fem_tpu.utils.config import default_params
    p = default_params("step04_pressure")
    rows = [dict(sigma_contact_Spm=s, compliance_V=400 / (i + 1),
                 contact_impedance_ohm=70000 / (i + 1),
                 charge_density_mC_cm2=0.0005 * (i + 1),
                 roi_mean_E=50 - i)
            for i, s in enumerate(p["pressure_sweep"]
                                  ["sigma_contact_Spm"])]
    _check(plots.plot_pressure_results(rows, p, tmp_path))

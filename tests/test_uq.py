"""Uncertainty-quantification workflow invariants (apps/run_uq.py
engine): seeded reproducibility, percentile sanity on the Monte-Carlo
dose, and the certified-tolerance honesty contract for the two design
apps (run_uq, run_array_opt) — same discipline as test_honesty.py."""

from pathlib import Path

import numpy as np

import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def uq_run():
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined

    spec, params = build_pressure_spec(coarse=True)
    scase, hier = assemble_lattice(spec, jnp.float64)
    nominal = np.asarray(spec.sigma_table)

    def sample(seed, S=6):
        rng = np.random.default_rng(seed)
        t = np.tile(nominal, (S, 1))
        for b, g in ((core.BODY_MUSCLE, 1.35), (core.BODY_FAT, 1.6),
                     (core.BODY_SKIN, 2.0)):
            t[:, b] = nominal[b] * np.exp(
                np.log(g) * rng.standard_normal(S))
        return t

    tables = jnp.asarray(sample(0), jnp.float64)
    out = batched_mg_solve_refined(scase, hier, tables, tol=1e-8)
    return sample, tables, out


def test_sampling_reproducible(uq_run):
    sample, tables, _ = uq_run
    np.testing.assert_array_equal(sample(0), np.asarray(tables))
    assert not np.array_equal(sample(1), np.asarray(tables))


def test_posterior_solves_certified(uq_run):
    _, _, out = uq_run
    assert bool(np.asarray(out.converged).all())
    assert float(np.asarray(out.residual).max()) <= 1e-8


def test_dose_distribution_sane(uq_run):
    """Per-sample ROI dose: positive, finite, and actually spread by
    the conductivity prior (not collapsed to the nominal value)."""
    from pelvistim_fem_tpu.models.pressure import build_pressure_case
    from pelvistim_fem_tpu.ops.metrics import extract_results_batched
    sample, tables, out = uq_run
    case, params = build_pressure_case(coarse=True, dtype=jnp.float32)
    rows = extract_results_batched(
        case, out.phi.astype(jnp.float32), params,
        sigma_tables=tables.astype(jnp.float32),
        pressure_labels=[f"mc{i}" for i in range(tables.shape[0])],
        sigma_contacts=[0.0] * tables.shape[0])
    v = np.asarray([r["roi_mean_E"] for r in rows], float)
    assert np.all(np.isfinite(v)) and np.all(v > 0)
    p5, p50, p95 = np.percentile(v, [5, 50, 95])
    assert p5 <= p50 <= p95
    assert v.std() / v.mean() > 0.01   # the prior must actually spread


def test_uq_and_array_apps_stay_certified():
    """run_uq.py / run_array_opt.py must keep the reference-tolerance
    certified contract (cf. test_honesty.py for the parity apps)."""
    import re
    for app in ("pelvistim_fem_tpu/apps/run_uq.py",
                "pelvistim_fem_tpu/apps/run_array_opt.py"):
        src = (REPO / app).read_text()
        assert "jax_enable_x64" in src, app
        assert re.search(r"_refined\w*\(", src), app
        assert "tol=1e-8" in src.replace(" ", ""), app

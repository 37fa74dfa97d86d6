"""Honesty invariants (VERDICT round-2 item 9): the certified-residual
contract must not silently regress.

Background: f32 CG's recursive residual LIES at the reference's 7000x
material contrast (reports 1e-6 while the true residual sits at 1e-2 —
PARITY.md), so every number that feeds flux/compliance metrics at hard
contrast must come from a *_refined solver whose residual is measured
in f64 against the f64 operator."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent


def test_bench_path_is_refined_at_reference_tolerance():
    """bench.py must solve through an f64-certified refined solver at
    the reference tolerance — fail if anyone reroutes it through a
    non-refined path or loosens tol."""
    src = (REPO / "bench.py").read_text()
    assert "jax_enable_x64" in src
    assert "_refined" in src, "bench.py no longer calls a refined solver"
    assert "tol = 1e-8" in src or "tol=1e-8" in src, (
        "bench.py no longer targets the reference 1e-8 tolerance")
    # the headline metric must be computed from the refined output
    import re
    calls = re.findall(r"batched_mg_solve\w*\(", src)
    assert calls and all("refined" in c for c in calls), calls


def test_app_sweep_paths_are_refined_at_reference_tolerance():
    """The reference-parity apps that sweep across the 7000x contact
    contrast (step04) or feed flux/compliance metrics at tissue
    contrast (pelvis megatet) must stay on certified refined solvers at
    tol 1e-8."""
    import re
    for app in ("pelvistim_fem_tpu/apps/run_step04.py",
                "pelvistim_fem_tpu/apps/run_pelvis.py"):
        src = (REPO / app).read_text()
        assert "jax_enable_x64" in src, app
        assert re.search(r"_refined\w*\(", src), (
            f"{app} no longer calls a refined solver")
        assert "tol=1e-8" in src.replace(" ", ""), (
            f"{app} no longer targets the reference 1e-8 tolerance")


def test_refined_solvers_refuse_without_x64():
    """The x64 runtime guard (ADVICE round-2 medium): without
    jax_enable_x64 the 'f64 master operator' silently canonicalizes to
    f32 and the reported residual would be exactly the lying recursive
    residual — the refined entry points must refuse to run."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    assert jax.config.jax_enable_x64
    require_x64("smoke")                      # no-op with x64 on
    try:
        jax.config.update("jax_enable_x64", False)
        with pytest.raises(RuntimeError, match="jax_enable_x64"):
            require_x64("smoke")
    finally:
        jax.config.update("jax_enable_x64", True)


def test_step03_anchor_flux_err_margin():
    """Geometric flux_err at the FULL-RES step03 anchor (fat=5mm,
    r=10mm) must clear the reference's 2% fine-mesh banner
    (run_layered_sweep.py:883-891) with margin, at a certified 1e-8
    residual.  Guards the staircase-rim error budget: if meshes coarsen
    or rim snapping regresses, this trips before the reference gate
    does."""
    from pelvistim_fem_tpu.models.ankle import build_layered_case
    from pelvistim_fem_tpu.ops.metrics import injected_currents
    from pelvistim_fem_tpu.ops.multigrid import (build_hierarchy,
                                                 solve_stencil_mg_refined)
    from pelvistim_fem_tpu.ops.stencil import (build_stencil_case,
                                               stencil_host_data)
    case, params, mesh = build_layered_case(
        t_fat=0.005, elec_r=0.010, coarse=False, dtype=jnp.float64,
        with_mesh=True)
    hd = stencil_host_data(case, mesh)
    sc = build_stencil_case(case, mesh, host_data=hd)
    hier = build_hierarchy(hd)
    r = solve_stencil_mg_refined(sc, hier, tol=1e-8)
    assert bool(np.asarray(r.converged))
    assert float(np.asarray(r.residual)) <= 1e-8
    cur = injected_currents(case, r.phi)
    assert cur["flux_err_consistent"] < 1e-8
    # reference banner is 2%; require headroom
    assert cur["flux_err"] < 0.02, cur["flux_err"]

    # PARITY-DRIFT GUARD (round-4 VERDICT item 8): the judged parity
    # document went stale in round 3 because nothing failed when it
    # did.  Re-derive the headline anchor numbers cited in PARITY.md's
    # top table ("Ours, base lattice" column) and pin them to what this
    # full-res solve actually produces, at a coarse tolerance band.
    import re
    from pathlib import Path

    from pelvistim_fem_tpu.ops.metrics import extract_results
    row = extract_results(case, r.phi, params, verbose=False)
    text = Path(__file__).resolve().parents[1].joinpath(
        "PARITY.md").read_text()
    table = text.split("## step01")[0]

    def cited(metric):
        m = re.search(rf"\| {re.escape(metric)} \|[^|]*\|([^|]*)\|",
                      table)
        assert m, f"PARITY.md anchor table lost its {metric} row"
        v = re.search(r"[-+]?\d+\.?\d*", m.group(1).replace("%", ""))
        return float(v.group(0))

    assert abs(cited("compliance_V") - row["compliance_V"]) \
        <= 0.02 * row["compliance_V"], \
        (cited("compliance_V"), row["compliance_V"])
    assert abs(cited("flux_err (geometric)") / 100
               - row["flux_err"]) <= 0.003, \
        (cited("flux_err (geometric)"), row["flux_err"])
    assert abs(cited("peak_J_skin_no_elec")
               - row["peak_J_skin_no_elec"]) \
        <= 0.05 * row["peak_J_skin_no_elec"], \
        (cited("peak_J_skin_no_elec"), row["peak_J_skin_no_elec"])

"""Pelvic stretch model + activating-function metric tests."""

import numpy as np
import pytest

from pelvistim_fem_tpu.models.pelvis import (BODY_BONE,
                                             BODY_CONTACT_ACTIVE,
                                             BODY_CONTACT_RETURN,
                                             build_pelvis_case,
                                             nerve_path)
from pelvistim_fem_tpu.ops.metrics import injected_currents
from pelvistim_fem_tpu.ops.nerve import (activating_function,
                                         sample_phi_on_lattice,
                                         straight_path)
from pelvistim_fem_tpu.ops.solve import solve_case


@pytest.fixture(scope="module")
def pelvis():
    case, params, mesh = build_pelvis_case(coarse=True, with_mesh=True)
    res = solve_case(case, tol=1e-8, maxiter=30_000)
    assert bool(res.converged)
    return case, params, mesh, res


def test_pelvis_bodies_present(pelvis):
    case, params, mesh, res = pelvis
    counts = np.bincount(mesh.tet_body)
    for b in range(1, 8):     # core..contact_return all populated
        assert counts[b] > 0, b
    assert counts[BODY_BONE] > 1000          # sacrum is a real volume
    assert counts[BODY_CONTACT_ACTIVE] > 0
    assert counts[BODY_CONTACT_RETURN] > 0


def test_pelvis_current_delivery(pelvis):
    case, params, mesh, res = pelvis
    cur = injected_currents(case, res.phi)
    np.testing.assert_allclose(cur["I_active_consistent"], 20e-3,
                               rtol=1e-8)
    assert cur["flux_err_consistent"] < 1e-6
    assert cur["flux_err"] < 0.10            # coarse-mesh geometric gate


def test_activating_function_quadratic_field():
    """AF recovers the exact second derivative of a synthetic quadratic
    potential sampled on an undeformed lattice (sample_phi_on_lattice
    assumes lattice coordinates; electrode rim snapping perturbs nodes
    only near footprints, away from nerve paths)."""
    from pelvistim_fem_tpu.mesh.generate import box_mesh
    mesh = box_mesh(0.2, 0.16, 0.1, 0.008)
    a = 1234.5
    phi = a * mesh.nodes[:, 1] ** 2              # phi = a*y^2
    path = straight_path([0.10, 0.05, 0.05], [0.10, 0.11, 0.05], 121)
    af = activating_function(mesh, phi, path)
    # d^2(a y^2)/ds^2 = 2a along a y-directed path; the windowed
    # quadratic fit recovers the mean curvature of the piecewise-linear
    # interpolant to a few percent
    good = np.isfinite(af["af"])
    np.testing.assert_allclose(af["af"][good], 2 * a, rtol=0.05)


def test_sample_phi_linear_exact():
    from pelvistim_fem_tpu.mesh.generate import box_mesh
    mesh = box_mesh(0.2, 0.16, 0.1, 0.008)
    coef = np.array([3.0, -2.0, 5.0])
    phi = mesh.nodes @ coef + 0.25
    pts = straight_path([0.05, 0.04, 0.02], [0.15, 0.12, 0.09], 40)
    v = sample_phi_on_lattice(mesh, phi, pts)
    np.testing.assert_allclose(v, pts @ coef + 0.25, rtol=1e-9)


def test_af_sign_structure(pelvis):
    """Under a cathodic surface electrode the AF along a passing nerve
    has the classic central-depolarization flanked-by-hyperpolarization
    (or inverse) sign structure — i.e. both signs present and the
    extremum near the electrode-adjacent section."""
    case, params, mesh, res = pelvis
    af = activating_function(mesh, res.phi, nerve_path(params))
    assert af["max_AF"] > 0 and af["min_AF"] < 0
    assert np.isfinite(af["peak_E_tangential"])

def test_discrete_af_quadratic_exact():
    """The discrete driving term on a quadratic potential equals the
    EXACT second difference f = a[(y+L)^2 - 2y^2 + (y-L)^2] = 2aL^2 for
    any internodal spacing L (no fit, no approximation)."""
    from pelvistim_fem_tpu.mesh.generate import box_mesh
    from pelvistim_fem_tpu.ops.nerve import discrete_activating_function
    mesh = box_mesh(0.2, 0.16, 0.1, 0.004)
    a = 1234.5
    phi = a * mesh.nodes[:, 1] ** 2
    path = straight_path([0.10, 0.02, 0.05], [0.10, 0.14, 0.05], 301)
    # L must sit above the lattice spacing h = 4 mm: the interpolant is
    # piecewise linear, so the relative error of the second difference
    # is ~ h^2 / (2 L^2) (docstring) — 3.1% at L = 16 mm here.
    for L in (0.016, 0.032, 0.048):
        d = discrete_activating_function(mesh, phi, path, L)
        good = np.isfinite(d["f"])
        assert good.sum() > 10
        np.testing.assert_allclose(d["f"][good], 2 * a * d["L_m"] ** 2,
                                   rtol=0.05)


def test_discrete_af_grows_with_internode(pelvis):
    """On the real solved field, larger internodal spacing (larger
    fiber) sees a larger discrete driving term — the mechanism behind
    large-fiber-first recruitment."""
    from pelvistim_fem_tpu.ops.nerve import discrete_activating_function
    case, params, mesh, res = pelvis
    path = nerve_path(params)
    # both L leave the valid window (path minus L at each end) covering
    # the depolarization peak; L = 24 mm would crop it on this 52 mm path
    f1 = discrete_activating_function(mesh, res.phi, path, 0.008)
    f2 = discrete_activating_function(mesh, res.phi, path, 0.016)
    assert f2["max_f_V"] > f1["max_f_V"] > 0


def test_strength_duration_and_recruitment_curve(pelvis):
    from pelvistim_fem_tpu.ops.nerve import (fiber_thresholds,
                                             recruitment_curve,
                                             strength_duration_factor)
    case, params, mesh, res = pelvis
    af = activating_function(mesh, res.phi, nerve_path(params))

    # Weiss law basics: rheobase at PW -> inf, doubled at PW = chronaxie.
    assert strength_duration_factor(1.0, 150e-6) == pytest.approx(
        1.00015)
    assert strength_duration_factor(150e-6, 150e-6) == pytest.approx(2.0)
    with pytest.raises(ValueError):
        strength_duration_factor(0.0)

    d = np.array([6.0, 10.0, 14.0])          # um, A-delta .. A-beta
    thr = fiber_thresholds(af, 5000.0, d, pw_s=210e-6)
    # larger fibers recruit first; shorter pulses raise every threshold
    assert thr[0] > thr[1] > thr[2] > 0
    thr_short = fiber_thresholds(af, 5000.0, d, pw_s=50e-6)
    assert np.all(thr_short > thr)
    # reference diameter at rheobase reproduces the scalar estimate
    thr_ref = fiber_thresholds(af, 5000.0, [10.0])
    from pelvistim_fem_tpu.ops.nerve import recruitment_threshold_scale
    assert thr_ref[0] == pytest.approx(
        recruitment_threshold_scale(af, 5000.0))

    amps = np.linspace(0.0, float(thr.max()) * 1.5, 64)
    frac = recruitment_curve(thr, amps)
    assert frac[0] == 0.0 and frac[-1] == 1.0
    assert np.all(np.diff(frac) >= 0)
    # weighted population: weights normalize
    frac_w = recruitment_curve(thr, amps, weights=[1.0, 2.0, 1.0])
    assert frac_w[-1] == pytest.approx(1.0)


def test_pelvis_spec_parity_with_element_path(pelvis):
    """The pelvis lattice-spec device-assembly fast path (VERDICT
    round-2 item 2) must reproduce the TetMesh element-path solution:
    one pelvis_recipe drives both, so body classification (contact
    remap, sacrum super-ellipsoid) is shared by construction."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.pelvis import build_pelvis_spec
    from pelvistim_fem_tpu.ops import lattice_assembly as la
    case, params, mesh, res = pelvis
    spec, _ = build_pelvis_spec(coarse=True)
    assert spec.n_bodies == 7
    r = la.solve_lattice_mg_refined(spec, tol=1e-9)
    assert bool(np.asarray(r.converged))
    p1, p2 = np.asarray(r.phi), np.asarray(res.phi)
    assert p1.shape == p2.shape
    np.testing.assert_allclose(p1, p2, atol=3e-8 * np.abs(p2).max())


def test_path_interp_plan_matches_sample(pelvis):
    """The device-gather sampling plan (ids, wts) must reproduce
    sample_phi_on_lattice exactly on the carved pelvis lattice (missing
    grid slots -> weight 0 == the zero-fill convention)."""
    from pelvistim_fem_tpu.models.pelvis import build_pelvis_spec
    from pelvistim_fem_tpu.ops.nerve import (path_interp_plan,
                                             sample_phi_on_lattice)
    case, params, mesh, res = pelvis
    spec, _ = build_pelvis_spec(coarse=True)
    path = nerve_path(params)
    ids, wts = path_interp_plan(spec.axes, spec.grid_index,
                                spec.grid_shape, path)
    phi = np.asarray(res.phi)
    got = (phi[ids] * wts).sum(axis=1)
    want = sample_phi_on_lattice(mesh, phi, path)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_pelvis_sweep_app_smoke(tmp_path):
    """run_pelvis --sweep end to end on the virtual device mesh: sharded
    certified solves + vmapped electrode metrics + per-lane AF rows."""
    import csv
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "apps" / "run_pelvis.py"), "--smoke",
         "--sweep", "4", "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rows = list(csv.DictReader(open(tmp_path / "sweep_summary.csv")))
    assert len(rows) == 4
    cv = [float(x["compliance_V"]) for x in rows]
    assert all(a > b for a, b in zip(cv, cv[1:]))   # monotone in sigma
    assert all(float(x["true_residual"]) <= 1e-8 for x in rows)
    assert all(float(x["flux_err_consistent"]) < 1e-4 for x in rows)
    assert all(float(x["max_AF_V_per_m2"]) > 0 for x in rows)


def test_pelvis_sweep_app_rom_smoke(tmp_path):
    """run_pelvis --sweep --rom: the reduced-basis route certifies every
    lane at 1e-8 and reproduces the sweep physics (monotone compliance,
    positive AF) from ~rank full solves."""
    import csv
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "apps" / "run_pelvis.py"), "--smoke",
         "--sweep", "6", "--rom", "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "reduced-basis certified" in r.stdout
    rows = list(csv.DictReader(open(tmp_path / "sweep_summary.csv")))
    assert len(rows) == 6
    cv = [float(x["compliance_V"]) for x in rows]
    assert all(a > b for a, b in zip(cv, cv[1:]))   # monotone in sigma
    assert all(float(x["true_residual"]) <= 1e-8 for x in rows)
    assert all(float(x["max_AF_V_per_m2"]) > 0 for x in rows)


def test_pelvis_spec_current_integrates_exactly():
    """Spec-path Neumann load must integrate to the injected current
    from the TRUE (deformed) mesh electrode area."""
    from pelvistim_fem_tpu.models.pelvis import build_pelvis_spec
    spec, params = build_pelvis_spec(coarse=True)
    I = params["stim"]["injected_current_mA"] * 1e-3
    np.testing.assert_allclose(spec.b_neumann.sum(), I, rtol=1e-9)
    assert spec.area_active > 0 and spec.area_return > 0


def test_polyline_path_curved(pelvis):
    """Curved nerve trajectories: equal-arclength resampling of a
    waypoint polyline (collinear waypoints reproduce straight_path
    exactly), and the AF machinery accepts the curved path on the
    solved field."""
    from pelvistim_fem_tpu.ops.nerve import polyline_path
    case, params, mesh, res = pelvis
    p0 = np.asarray(params["nerve"]["start_xyz"])
    p1 = np.asarray(params["nerve"]["end_xyz"])

    # collinear waypoints == straight segment
    mid = 0.5 * (p0 + p1)
    pp = polyline_path([p0, mid, p1], 101)
    np.testing.assert_allclose(pp, straight_path(p0, p1, 101),
                               atol=1e-12)

    # equal spacing on a genuinely bent path
    bend = mid + np.array([0.0, 0.008, -0.004])
    pc = polyline_path([p0, bend, p1], 151)
    seg = np.linalg.norm(np.diff(pc, axis=0), axis=1)
    np.testing.assert_allclose(seg, seg[0], rtol=1e-10)
    np.testing.assert_allclose(pc[0], p0, atol=1e-15)
    np.testing.assert_allclose(pc[-1], p1, atol=1e-15)

    af = activating_function(mesh, res.phi, pc)
    assert np.isfinite(af["max_AF"]) and af["max_AF"] > 0

    # params-driven dispatch
    params2 = {**params, "nerve": {**params["nerve"],
                                   "waypoints_xyz": [p0.tolist(),
                                                     bend.tolist(),
                                                     p1.tolist()]}}
    pw = nerve_path(params2)
    seg = np.linalg.norm(np.diff(pw, axis=0), axis=1)
    np.testing.assert_allclose(seg, seg[0], rtol=1e-10)

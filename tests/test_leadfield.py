"""Lead-field solves + current-pattern optimization (ops/leadfield.py,
models/array.py).

Validation strategy (no reference analogue exists — the reference
hard-codes one electrode pair, step02 run_sweep.py:66-79): first-
principles invariants — shared-operator basis parity vs independent
per-electrode solves, linear superposition of the discrete solution
operator, and feasibility/optimality properties of the projected
program.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from pelvistim_fem_tpu.models.array import (array_recipe,
                                            build_array_specs,
                                            default_array_params)
from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
from pelvistim_fem_tpu.ops.leadfield import (lead_vectors,
                                             optimize_pattern,
                                             solve_basis,
                                             solve_basis_refined)
from pelvistim_fem_tpu.ops.multigrid import solve_stencil_mg_refined


def _tiny_params():
    p = default_array_params(coarse=True)
    p.update({
        "L_mm": (80.0, 80.0),
        "layers_mm": (("muscle", 16.0), ("fat", 8.0), ("skin", 4.0)),
        "n_electrodes": 4,
        "ring_r_mm": 24.0,
        "elec_r_mm": 6.0,
        "return_r_mm": 24.0,
        "h_fine_mm": 5.0,
        "h_coarse_mm": 10.0,
        "h_z_mm": (5.0, 4.0, 2.0),
        "roi_r_mm": 8.0,
        "roi_depth_mm": 10.0,
    })
    return p


@pytest.fixture(scope="module")
def setup():
    params = _tiny_params()
    specs, params, meta = build_array_specs(params)
    scase, hier = assemble_lattice(specs[0], jnp.float64)
    loads = jnp.asarray(np.stack([s.b_neumann for s in specs]))
    return params, specs, meta, scase, hier, loads


def test_basis_matches_independent_solves(setup):
    """The vmapped shared-operator basis equals K independent
    spec-k assemblies + solves."""
    params, specs, meta, scase, hier, loads = setup
    out = solve_basis_refined(scase, hier, loads, tol=1e-10)
    assert bool(np.asarray(out.converged).all())
    assert float(np.asarray(out.residual).max()) <= 1e-10
    for k in (0, len(specs) - 1):
        sc_k, hier_k = assemble_lattice(specs[k], jnp.float64)
        ref = solve_stencil_mg_refined(sc_k, hier_k, tol=1e-10)
        scale = float(jnp.max(jnp.abs(ref.phi)))
        np.testing.assert_allclose(np.asarray(out.phi[k]),
                                   np.asarray(ref.phi),
                                   atol=1e-8 * scale)


def test_superposition(setup):
    """phi(sum i_k b_k) == sum i_k phi_k — the discrete solution
    operator is linear in the load, so the lead-field expansion is
    exact (up to solver tolerance)."""
    params, specs, meta, scase, hier, loads = setup
    out = solve_basis_refined(scase, hier, loads, tol=1e-11)
    i = jnp.asarray([0.7, -0.3, 0.45, -0.85], jnp.float64)
    combined = jnp.einsum("k,kxyz->xyz", i, loads)
    direct = solve_stencil_mg_refined(
        dataclasses.replace(scase, b_neumann=combined), hier, tol=1e-11)
    mix = jnp.einsum("k,kn->n", i, out.phi)
    scale = float(jnp.max(jnp.abs(direct.phi)))
    np.testing.assert_allclose(np.asarray(mix), np.asarray(direct.phi),
                               atol=1e-7 * scale)


def test_uncertified_path_agrees(setup):
    params, specs, meta, scase, hier, loads = setup
    a = solve_basis_refined(scase, hier, loads, tol=1e-10)
    b = solve_basis(scase, hier, loads, tol=1e-10)
    scale = float(jnp.max(jnp.abs(a.phi)))
    np.testing.assert_allclose(np.asarray(a.phi), np.asarray(b.phi),
                               atol=1e-6 * scale)


def _leads(setup):
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.case import build_case
    params, specs, meta, scase, hier, loads = setup
    out = solve_basis_refined(scase, hier, loads, tol=1e-10)
    sigma_by_body = {
        core.BODY_MUSCLE: params["sigma_Spm"]["muscle"],
        core.BODY_FAT: params["sigma_Spm"]["fat"],
        core.BODY_SKIN: params["sigma_Spm"]["skin"],
    }
    case = build_case(array_recipe(params, 0).mesh(), sigma_by_body,
                      mode="current",
                      injected_current_A=params["I_unit_A"])
    w, J_skin, vol_roi = lead_vectors(
        case, out.phi, roi_center=meta["roi_center"],
        roi_r=meta["roi_r"], target_dir=meta["target_dir"])
    return w, J_skin, vol_roi


def test_lead_vectors_sane(setup):
    w, J_skin, vol_roi = _leads(setup)
    assert float(vol_roi) > 0
    w = np.asarray(w)
    assert np.all(np.isfinite(w)) and np.all(np.abs(w) > 0)
    # ring symmetry: 4 discs at 90-degree spacing over a centred ROI ->
    # equal-magnitude directional leads (lattice staircase breaks the
    # exact symmetry at the few-percent level)
    assert np.max(np.abs(w)) <= 1.6 * np.min(np.abs(w))
    assert np.asarray(J_skin).ndim == 3 and J_skin.shape[2] == 3


def test_optimize_pattern_feasible_and_beats_single(setup):
    w, J_skin, _ = _leads(setup)
    budget, i_max = 4.0, 1.5          # units of I_unit (1 mA)
    # make the skin limit BINDING: half the unconstrained-peak scale
    peak1 = float(jnp.sqrt(jnp.max(jnp.sum(
        jnp.einsum("k,kmc->mc", jnp.ones_like(w), J_skin) ** 2,
        axis=1))))
    j_limit = 0.5 * peak1
    i, info = optimize_pattern(w, J_skin, budget=budget, i_max=i_max,
                               j_limit=j_limit, steps=300)
    i = np.asarray(i)
    assert float(info["l1"]) <= budget * (1 + 1e-9)
    assert float(info["linf"]) <= i_max * (1 + 1e-9)
    assert float(info["peak_J_skin"]) <= j_limit * (1 + 1e-9)

    # must beat every feasible SINGLE-channel pattern
    w_np = np.asarray(w)
    best_single = 0.0
    for k in range(len(w_np)):
        for s in (+1.0, -1.0):
            amp = min(i_max, budget)
            e = np.zeros_like(w_np)
            e[k] = s * amp
            Jk = np.asarray(jnp.einsum(
                "k,kmc->mc", jnp.asarray(e), J_skin))
            pk = float(np.sqrt((Jk ** 2).sum(axis=1).max()))
            if pk > j_limit:
                e *= j_limit / pk
            best_single = max(best_single, float(w_np @ e))
    assert float(info["objective"]) >= best_single * (1 - 1e-6)


def test_discrete_reciprocity(setup):
    """Mutual resistance symmetry R_jk = b_j^T phi_k / I^2 = R_kj: with
    a symmetric operator, phi_k = A^{-1} b_k makes b_j^T phi_k an
    energy inner product — electrode j's load-weighted potential under
    drive k equals k's under j (the reciprocity theorem, discretely
    EXACT up to solver tolerance).  Catches sign/scaling/BC bugs the
    per-basis checks cannot."""
    params, specs, meta, scase, hier, loads = setup
    out = solve_basis_refined(scase, hier, loads, tol=1e-11)
    K = loads.shape[0]
    I = params["I_unit_A"]
    # phi is in mesh-node order; loads are grid-form -> gather
    gi = specs[0].grid_index
    b_nodes = np.stack([np.asarray(l).ravel()[gi] for l in loads])
    R = (b_nodes @ np.asarray(out.phi).T) / I ** 2        # (K, K)
    asym = np.abs(R - R.T).max() / np.abs(R).max()
    assert asym < 1e-9, (asym, R)
    # diagonal dominance: self-resistance exceeds mutuals
    assert np.all(np.diag(R) >= R.max(axis=1) - 1e-12)


def test_sharded_basis_matches_unsharded(setup):
    """RHS-axis dp sharding over the 8-device mesh: parity with the
    unsharded vmapped batch (K=4 also exercises the pad-to-mesh path)."""
    from pelvistim_fem_tpu.parallel.sweep import (device_mesh,
                                                  sharded_basis_solve_refined)
    params, specs, meta, scase, hier, loads = setup
    ref = solve_basis_refined(scase, hier, loads, tol=1e-10)
    out = sharded_basis_solve_refined(scase, hier, loads,
                                      device_mesh(8), tol=1e-10)
    assert out.phi.shape == ref.phi.shape
    assert bool(np.asarray(out.converged).all())
    scale = float(jnp.max(jnp.abs(ref.phi)))
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=1e-8 * scale)


def test_element_path_basis_matches_stencil(setup):
    """Lead fields for IMPORTED meshes: element-path basis solves
    (patch loads + certified AMG) must reproduce the stencil-path basis
    on the same lattice mesh — cross-path parity plus element-path
    reciprocity."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops.amg import build_amg
    from pelvistim_fem_tpu.ops.leadfield import (element_patch_loads,
                                                 solve_basis_case_refined)
    params, specs, meta, scase, hier, loads = setup
    K = len(specs)
    sigma_by_body = {
        core.BODY_MUSCLE: params["sigma_Spm"]["muscle"],
        core.BODY_FAT: params["sigma_Spm"]["fat"],
        core.BODY_SKIN: params["sigma_Spm"]["skin"],
    }
    # per-k Cases carry each disc's exact face classification; faces are
    # ordered identically (same mesh), so patch_id is exact by
    # construction — no re-derivation from centroids
    cases = [build_case(array_recipe(params, k).mesh(), sigma_by_body,
                        mode="current",
                        injected_current_A=params["I_unit_A"])
             for k in range(K)]
    case = cases[0]
    patch_id = np.zeros(case.faces.shape[0], np.int32)
    for k, ck in enumerate(cases):
        sel = np.asarray(ck.face_bcid) == core.BC_ACTIVE
        assert not (patch_id[sel] != 0).any()
        patch_id[sel] = k + 1
    loads_e = element_patch_loads(case, patch_id,
                                  I_unit=params["I_unit_A"])
    np.testing.assert_allclose(loads_e.sum(axis=1),
                               params["I_unit_A"], rtol=1e-12)

    amg = build_amg(case)
    out = solve_basis_case_refined(case, loads_e, amg=amg, tol=1e-10)
    assert bool(np.asarray(out.converged).all())

    ref = solve_basis_refined(scase, hier, loads, tol=1e-10)
    scale = float(jnp.max(jnp.abs(ref.phi)))
    for k in (0, K - 1):
        np.testing.assert_allclose(np.asarray(out.phi[k]),
                                   np.asarray(ref.phi[k]),
                                   atol=2e-6 * scale)

    # element-path reciprocity (same invariant as the stencil test)
    R = (loads_e @ np.asarray(out.phi).T) / params["I_unit_A"] ** 2
    assert np.abs(R - R.T).max() / np.abs(R).max() < 1e-8


def test_robust_design_over_sigma_samples(setup):
    """Worst-case design over conductivity samples: the (S, K)
    ensemble batch matches direct (sigma, load) solves, and the robust
    pattern's worst-sample dose beats the nominal-design pattern's
    while staying feasible for EVERY sample."""
    from pelvistim_fem_tpu.mesh import core
    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops.leadfield import (
        optimize_pattern_robust, solve_basis_ensemble_refined)
    from pelvistim_fem_tpu.ops.uq import sample_sigma_tables
    params, specs, meta, scase, hier, loads = setup
    S = 3
    samples = sample_sigma_tables(
        np.asarray(specs[0].sigma_table),
        {core.BODY_MUSCLE: 1.35, core.BODY_FAT: 1.6,
         core.BODY_SKIN: 2.0}, S, seed=0)
    tabs = jnp.asarray(samples, jnp.float64)
    ens = solve_basis_ensemble_refined(scase, hier, loads, tabs,
                                       tol=1e-10)
    assert ens.phi.shape[:2] == (S, loads.shape[0])
    assert bool(np.asarray(ens.converged).all())

    # spot-parity: lane (1, 2) == direct solve with that (sigma, load)
    import dataclasses as dc
    direct = solve_stencil_mg_refined(
        dc.replace(scase, b_neumann=loads[2]), hier, tabs[1], tol=1e-10)
    scale = float(jnp.max(jnp.abs(direct.phi)))
    np.testing.assert_allclose(np.asarray(ens.phi[1, 2]),
                               np.asarray(direct.phi),
                               atol=1e-8 * scale)

    sigma_by_body = {
        core.BODY_MUSCLE: params["sigma_Spm"]["muscle"],
        core.BODY_FAT: params["sigma_Spm"]["fat"],
        core.BODY_SKIN: params["sigma_Spm"]["skin"],
    }
    case = build_case(array_recipe(params, 0).mesh(), sigma_by_body,
                      mode="current",
                      injected_current_A=params["I_unit_A"])
    w_sk, Jsk = [], []
    for s in range(S):
        ws, Js, _ = lead_vectors(case, ens.phi[s],
                                 roi_center=meta["roi_center"],
                                 roi_r=meta["roi_r"],
                                 target_dir=meta["target_dir"],
                                 sigma_table=tabs[s])
        w_sk.append(ws)
        Jsk.append(Js)
    w_sk = jnp.stack(w_sk)
    Jsk = jnp.stack(Jsk)

    budget, i_max = 4.0, 1.5
    pk1 = float(jnp.sqrt(jnp.max(jnp.sum(jnp.einsum(
        "k,kmc->mc", jnp.ones(w_sk.shape[1], w_sk.dtype),
        Jsk[0]) ** 2, axis=1))))
    j_limit = 0.5 * pk1
    i_rob, rinfo = optimize_pattern_robust(
        w_sk, Jsk, budget=budget, i_max=i_max, j_limit=j_limit,
        steps=200)
    assert float(rinfo["l1"]) <= budget * (1 + 1e-9)
    assert float(rinfo["linf"]) <= i_max * (1 + 1e-9)
    assert float(rinfo["peak_J_skin"]) <= j_limit * (1 + 1e-9)

    # nominal-sample design, made feasible sample-wise, must not beat
    # the robust pattern on the worst sample
    i_nom, _ = optimize_pattern(w_sk[0], Jsk[0], budget=budget,
                                i_max=i_max, j_limit=j_limit, steps=200)
    J_all = jnp.einsum("k,skmc->smc", i_nom, Jsk)
    pk_nom = float(jnp.sqrt(jnp.max(jnp.sum(J_all ** 2, axis=2))))
    i_nom = i_nom * min(1.0, j_limit / max(pk_nom, 1e-30))
    nom_worst = float(jnp.min(w_sk @ i_nom))
    rob_worst = float(rinfo["objective_worst"])
    assert rob_worst >= nom_worst * (1 - 1e-6), (rob_worst, nom_worst)


def test_unconstrained_skin_limit_hits_lp_optimum(setup):
    """With the skin limit slack and i_max >= budget, the program is an
    LP over the l1 ball whose optimum is budget * max_k |w_k| — the
    projected ascent must reach it."""
    w, J_skin, _ = _leads(setup)
    i, info = optimize_pattern(w, J_skin, budget=1e-3, i_max=1e-3,
                               j_limit=1e9, steps=300)
    assert float(info["l1"]) <= 1e-3 * (1 + 1e-9)
    best = 1e-3 * float(np.max(np.abs(np.asarray(w))))
    assert float(info["objective"]) >= best * (1 - 1e-3)
    assert float(info["objective"]) <= best * (1 + 1e-9)

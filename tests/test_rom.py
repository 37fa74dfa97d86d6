"""Certified reduced-order material sweeps (ops/rom.py).

The honesty pins mirror the refined-solver contract:
1. the ROM's reported residual must equal the DIRECTLY computed
   full-operator relative residual (same masked operator and b_eff
   convention as solve_stencil_mg) — the certificate is real, not a
   reduced-space proxy;
2. a greedy sweep certifies every lane at 1e-8 with FAR fewer full
   solves than lanes (the rank is set by the parameter RANGE, not by
   the lane count — measured ~0.5 decades of residual per snapshot),
   and the reconstructed fields match full batched refined solves;
3. a sigma table already in the snapshot set reproduces at solver
   tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.models.pressure import build_pressure_spec
from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice
from pelvistim_fem_tpu.ops.rom import (rom_reconstruct, rom_solve,
                                       rom_sweep_refined)

TOL = 1e-8
L = 64


@pytest.fixture(scope="module")
def problem():
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = assemble_lattice(spec, jnp.float64)
    base = np.asarray(spec.sigma_table, np.float64)
    tables = np.tile(base, (L, 1))
    tables[:, core.BODY_CONTACT_ACTIVE] = np.logspace(-4, -1, L)
    tables[:, core.BODY_CONTACT_RETURN] = \
        tables[:, core.BODY_CONTACT_ACTIVE]
    return scase, hier, tables


def _direct_residual(scase, table, phi_nodes):
    """||b_eff - K x|| / ||b_eff|| with the solver's own operator."""
    from pelvistim_fem_tpu.ops.stencil import _operator
    op, _, b_eff = _operator(scase, jnp.asarray(table))
    G = int(np.prod(scase.free.shape))
    x = jnp.zeros(G, jnp.float64).at[scase.grid_index].set(
        jnp.asarray(phi_nodes, jnp.float64)).reshape(scase.free.shape)
    r = b_eff - op(x)
    return float(jnp.linalg.norm(r) / jnp.linalg.norm(b_eff))


def test_greedy_sweep_certifies_all_lanes(problem):
    scase, hier, tables = problem
    out = rom_sweep_refined(scase, hier, tables, tol=TOL)
    assert out["converged"]
    assert np.asarray(out["residual"]).max() <= TOL
    # economy: 64 lanes spanning 3 decades certified from ~16 full
    # solves (rank tracks the decade span, not the lane count)
    assert out["n_full"] <= 24, out["n_full"]
    assert out["n_full"] <= L // 2

    # honesty: the ROM's certificate IS the direct full-operator
    # residual (check the worst lane and one interior lane)
    phi = np.asarray(out["phi"])
    for i in (int(np.argmax(out["residual"])), 7):
        direct = _direct_residual(scase, tables[i], phi[i])
        # rtol 1e-3: the two sides contract the SAME residual in
        # different orders (per-body W vs combined coefficients) at
        # the f64 cancellation limit; a reduced-space proxy would be
        # off by orders of magnitude, not 1e-4 relative
        np.testing.assert_allclose(direct, out["residual"][i],
                                   rtol=1e-3, atol=1e-13)

    # parity with full certified solves on a stride of lanes: both
    # sides hold TRUE residual <= 1e-8, so fields agree to
    # conditioning * tol
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined
    sub = np.arange(0, L, 8)
    full = batched_mg_solve_refined(scase, hier,
                                    jnp.asarray(tables[sub]), tol=TOL)
    pf = np.asarray(full.phi)
    err = (np.linalg.norm(phi[sub] - pf, axis=1)
           / np.linalg.norm(pf, axis=1))
    assert err.max() <= 1e-5, err.max()


def test_snapshot_reproduction(problem):
    scase, hier, tables = problem
    out = rom_sweep_refined(scase, hier, tables[:1], tol=TOL)
    assert out["n_full"] == 1
    _, rel = rom_solve(out["rom"], tables[:1])
    assert float(rel[0]) <= TOL


def test_reconstruct_shapes(problem):
    scase, hier, tables = problem
    out = rom_sweep_refined(scase, hier, tables[:3], tol=TOL)
    y, rel = rom_solve(out["rom"], tables[:3])
    phi = rom_reconstruct(out["rom"], scase, y)
    assert phi.shape == (3, len(np.asarray(scase.grid_index)))
    # Dirichlet slots restored exactly
    d = np.asarray(scase.dirichlet).reshape(-1)
    fr = np.asarray(scase.free).reshape(-1)
    gi = np.asarray(scase.grid_index)
    con = ~fr[gi]
    np.testing.assert_allclose(np.asarray(phi)[0][con], d[gi][con],
                               atol=0)


# ── lean (W-free, megatet-scale) form ────────────────────────────────────────
#
# The lean ROM is a MEMORY mode, not a different algorithm: with the
# same basis it must produce the same reduced solutions and the same
# full-operator certificates, the only change being HOW the residual
# is contracted (direct per-body stencil applies of the reconstructed
# fields vs the stored (B, cap, G) applied basis).


def test_lean_insert_matches_stored_w(problem):
    """Incremental symmetric VtW updates == the full V W^T einsum."""
    from pelvistim_fem_tpu.ops.rom import build_stencil_rom, rom_extend
    scase, _, _ = problem
    rom_w = build_stencil_rom(scase, 4, store_w=True)
    rom_l = build_stencil_rom(scase, 4, store_w=False)
    assert rom_l.W is None and rom_w.W is not None
    rng = np.random.default_rng(0)
    G = rom_w.V.shape[1]
    fr = np.asarray(scase.free).reshape(-1).astype(np.float64)
    for _ in range(3):
        v = rng.standard_normal(G) * fr
        rom_w = rom_extend(rom_w, scase, v)
        rom_l = rom_extend(rom_l, scase, v)
    assert int(rom_l.rank) == int(rom_w.rank) == 3
    scale = float(np.abs(np.asarray(rom_w.VtW)).max())
    np.testing.assert_allclose(np.asarray(rom_l.VtW),
                               np.asarray(rom_w.VtW),
                               rtol=1e-12, atol=1e-13 * scale)
    np.testing.assert_allclose(np.asarray(rom_l.V), np.asarray(rom_w.V),
                               atol=0)
    np.testing.assert_allclose(np.asarray(rom_l.rb), np.asarray(rom_w.rb),
                               rtol=1e-12, atol=1e-300)


def test_lean_certificate_matches_stored_w(problem):
    """Same basis, W dropped: identical reduced solutions, certificate
    equal to f64 contraction-ordering noise."""
    import dataclasses
    scase, hier, tables = problem
    sub = jnp.asarray(tables[::8])
    out = rom_sweep_refined(scase, hier, sub, tol=TOL, store_w=True)
    rom_w = out["rom"]
    rom_l = dataclasses.replace(rom_w, W=None)
    y_w, rel_w = rom_solve(rom_w, sub)
    y_l, rel_l = rom_solve(rom_l, sub, scase)
    np.testing.assert_allclose(np.asarray(y_l), np.asarray(y_w),
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(rel_l), np.asarray(rel_w),
                               rtol=1e-3, atol=1e-13)
    assert float(np.asarray(rel_l).max()) <= TOL


def test_lean_greedy_sweep_certifies(problem):
    """End-to-end greedy sweep in lean mode: converges with the same
    economy and field parity as the stored-W mode."""
    scase, hier, tables = problem
    sub = tables[::4]
    out = rom_sweep_refined(scase, hier, sub, tol=TOL, store_w=False)
    assert out["converged"] and out["rom"].W is None
    assert np.asarray(out["residual"]).max() <= TOL
    assert out["n_full"] <= 24
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined
    full = batched_mg_solve_refined(scase, hier,
                                    jnp.asarray(sub[::4]), tol=TOL)
    pf = np.asarray(full.phi)
    phi = np.asarray(out["phi"])[::4]
    err = np.linalg.norm(phi - pf, axis=1) / np.linalg.norm(pf, axis=1)
    assert err.max() <= 1e-5, err.max()


def test_lean_eqs_certificate_matches_stored_w(spectrum_problem):
    """Complex (EQS) lean certificate parity with the stored-W form."""
    import dataclasses

    from pelvistim_fem_tpu.ops.rom import (rom_solve_eqs,
                                           rom_spectrum_refined)
    scase, hier, freqs, ki = spectrum_problem
    out = rom_spectrum_refined(scase, hier, ki, tol=TOL, store_w=True)
    rom_w = out["rom"]
    rom_l = dataclasses.replace(rom_w, W=None)
    F = len(freqs)
    kr = jnp.asarray(np.tile(np.asarray(scase.sigma_table, np.float64),
                             (F, 1)))
    yr_w, yi_w, rel_w = rom_solve_eqs(rom_w, kr, ki)
    yr_l, yi_l, rel_l = rom_solve_eqs(rom_l, kr, ki, scase)
    np.testing.assert_allclose(np.asarray(yr_l), np.asarray(yr_w),
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(yi_l), np.asarray(yi_w),
                               rtol=1e-12, atol=1e-300)
    # the residual ~1e-9 is formed from O(1) quantities, so the two
    # contraction orders agree to ~cancellation noise, not rtol 1e-12
    np.testing.assert_allclose(np.asarray(rel_l), np.asarray(rel_w),
                               rtol=5e-3, atol=1e-12)


# ── spectral (EQS) ROM ───────────────────────────────────────────────────────


@pytest.fixture(scope="module")
def spectrum_problem(problem):
    from pelvistim_fem_tpu.ops.eqs import EPS0
    scase, hier, _ = problem
    nb = scase.sigma_table.shape[0] - 1
    epsr = np.zeros(nb + 1)
    epsr[core.BODY_CONTACT_ACTIVE] = 5e6
    epsr[core.BODY_CONTACT_RETURN] = 5e6
    freqs = np.logspace(-2, 5, 16)
    ki = jnp.asarray(2 * np.pi * freqs[:, None] * EPS0 * epsr[None, :])
    return scase, hier, freqs, ki


def _direct_residual_eqs(scase, kr, ki, phi2):
    """Hermitian ||b - K x|| / ||b|| with the EQS solver's operator."""
    from pelvistim_fem_tpu.ops.eqs import _eqs_operator, _hnorm
    op, b_eff = _eqs_operator(
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, scase),
        jnp.asarray(kr, jnp.float64), jnp.asarray(ki, jnp.float64))
    G = int(np.prod(scase.free.shape))
    x = jnp.zeros((2, G), jnp.float64).at[:, scase.grid_index].set(
        jnp.asarray(phi2, jnp.float64)).reshape((2,) + scase.free.shape)
    r = b_eff - op(x)
    return float(_hnorm(r) / _hnorm(b_eff))


def test_rom_spectrum_certifies_and_matches_full(spectrum_problem):
    from pelvistim_fem_tpu.ops.rom import rom_spectrum_refined
    scase, hier, freqs, ki = spectrum_problem
    out = rom_spectrum_refined(scase, hier, ki, tol=TOL)
    assert out["converged"]
    F = len(freqs)
    # economy: 7 decades of frequency from ~10 complex solves
    assert out["n_full"] <= 12 and out["n_full"] < F, out["n_full"]

    # honesty: the certificate IS the direct full complex-operator
    # Hermitian residual (worst lane + one interior lane)
    phi = np.asarray(out["phi"])
    kr = np.tile(np.asarray(scase.sigma_table, np.float64), (F, 1))
    for i in (int(np.argmax(out["residual"])), F // 2):
        direct = _direct_residual_eqs(scase, kr[i], np.asarray(ki)[i],
                                      phi[i])
        np.testing.assert_allclose(direct, out["residual"][i],
                                   rtol=1e-3, atol=1e-13)

    # field parity vs the full certified complex batch on a stride
    from pelvistim_fem_tpu.ops.eqs import batched_eqs_solve_refined
    sub = np.arange(0, F, 4)
    full = batched_eqs_solve_refined(scase, hier, ki[sub], tol=TOL)
    pf = np.asarray(full.phi)
    scale = np.abs(pf).max(axis=(1, 2))
    err = np.abs(phi[sub] - pf).max(axis=(1, 2)) / scale
    assert err.max() <= 1e-5, err.max()


def test_rom_impedance_spectrum_parity(spectrum_problem):
    """The ROM spectrum app surface reproduces impedance_spectrum_tables
    (full batched certified solves) and the textbook RC shape."""
    from pelvistim_fem_tpu.ops.eqs import impedance_spectrum_tables
    from pelvistim_fem_tpu.ops.rom import rom_impedance_spectrum_tables
    scase, hier, freqs, ki = spectrum_problem
    # electrode weights from the stencil case's Neumann load pattern
    b = np.asarray(scase.b_neumann, np.float64).reshape(-1)
    gi = np.asarray(scase.grid_index)
    bn = b[gi]
    act = np.where(bn > 0, bn, 0.0)
    # the pressure model grounds the return via Dirichlet nodes (no
    # negative Neumann entries) — average the return over that patch
    ret = (~np.asarray(scase.free).reshape(-1)[gi]).astype(np.float64)
    w_act = act / act.sum()
    w_ret = ret / ret.sum()

    rspec = rom_impedance_spectrum_tables(
        scase, hier, ki, None, freqs, w_act=w_act, w_ret=w_ret, tol=TOL)
    assert rspec["converged"].all()
    fspec = impedance_spectrum_tables(scase, hier, ki, None, freqs,
                                      w_act=w_act, w_ret=w_ret, tol=TOL)
    np.testing.assert_allclose(rspec["Z"], fspec["Z"], rtol=2e-5,
                               atol=2e-5 * np.abs(fspec["Z"]).max())
    zabs = rspec["Z_abs"]
    assert np.all(np.diff(zabs) <= 1e-9 * zabs[0])
    assert np.all(rspec["Z_phase_deg"] <= 1e-9)
    assert np.all(rspec["Z_phase_deg"] > -90.0)


def test_rom_eqs_zero_frequency_reduces_to_real(problem):
    from pelvistim_fem_tpu.ops.rom import (rom_solve_eqs,
                                           rom_sweep_refined)
    scase, hier, tables = problem
    out = rom_sweep_refined(scase, hier, tables[:1], tol=TOL)
    kr = jnp.asarray(tables[:1])
    ki = jnp.zeros_like(kr)
    yr, yi, rel = rom_solve_eqs(out["rom"], kr, ki)
    assert float(rel[0]) <= TOL
    assert float(jnp.abs(yi).max()) == 0.0
    np.testing.assert_allclose(np.asarray(yr[0]),
                               np.asarray(out["y"][0]), rtol=1e-12)

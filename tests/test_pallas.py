"""Pallas stencil kernel vs the XLA reference implementation.

On the CPU test mesh the kernel runs in interpreter mode; on real TPU
hardware it compiles (exercised by bench/dev runs with
PELVISTIM_USE_PALLAS=1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import pelvistim_fem_tpu.ops.pallas_stencil as ps
from pelvistim_fem_tpu.ops.stencil import stencil_spmv


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if jax.devices()[0].platform == "cpu":
        orig = pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(ps.pl, "pallas_call", interp)
    yield


@pytest.mark.parametrize("shape", [(8, 7, 6), (20, 13, 9), (31, 16, 8)])
def test_pallas_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    C = jnp.asarray(rng.standard_normal((27,) + shape), jnp.float32)
    y_ref = stencil_spmv(x, C)
    y = ps.stencil_spmv_pallas(x, C)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=1e-5)


def test_pallas_boundary_rows_zero_halo():
    """First/last rows only see the zero halo — catch off-by-one in the
    shifted row views."""
    shape = (5, 6, 7)
    x = jnp.ones(shape, jnp.float32)
    C = jnp.zeros((27,) + shape, jnp.float32)
    # pure +x neighbor stencil: y[i] = x[i+1]
    from pelvistim_fem_tpu.ops.stencil import OFFSETS
    o = OFFSETS.index((1, 0, 0))
    C = C.at[o].set(1.0)
    y = np.asarray(ps.stencil_spmv_pallas(x, C))
    assert np.allclose(y[:-1], 1.0)
    assert np.allclose(y[-1], 0.0)   # last row's +x neighbor is halo


@pytest.mark.parametrize("L,B,shape", [(3, 5, (8, 7, 6)),
                                       (5, 2, (14, 9, 8))])
def test_fused_batched_pallas_matches_xla(L, B, shape):
    """Body-factored batched kernel (VERDICT round-1 item 4) vs the XLA
    formulation batched_stencil_spmv_fused."""
    from pelvistim_fem_tpu.ops.stencil import batched_stencil_spmv_fused
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((L,) + shape), jnp.float32)
    coeff = jnp.asarray(rng.standard_normal((B, 27) + shape), jnp.float32)
    tables = jnp.asarray(rng.random((L, B + 1)), jnp.float32)
    y_ref = batched_stencil_spmv_fused(X, coeff, tables)
    y = ps.batched_stencil_spmv_fused_pallas(X, coeff, tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 7, 6), (20, 13, 9), (31, 16, 8),
                                   (9, 5, 4)])
def test_flat_kernel_matches_xla(shape):
    """Lane-packed flat-layout kernel vs the XLA SpMV (random C, so any
    halo/wrap/offset error shows)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    C = jnp.asarray(rng.standard_normal((27,) + shape), jnp.float32)
    y_ref = stencil_spmv(x, C)
    Cf = ps.pack_coeff_flat(C)
    y = ps.stencil_spmv_flat(x, Cf)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=1e-5)


def test_flat_kernel_neighbor_directions():
    """Each of the 27 offsets individually: a one-hot C picks exactly
    the right neighbor (catches sign/order errors in the flat offset
    table)."""
    from pelvistim_fem_tpu.ops.stencil import OFFSETS
    shape = (6, 5, 4)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    xn = np.asarray(x)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        C = jnp.zeros((27,) + shape, jnp.float32).at[o].set(1.0)
        y = np.asarray(ps.stencil_spmv_flat(x, ps.pack_coeff_flat(C)))
        expect = np.zeros(shape, np.float32)
        xs = np.pad(xn, 1)[1 + dx:1 + dx + shape[0],
                           1 + dy:1 + dy + shape[1],
                           1 + dz:1 + dz + shape[2]]
        np.testing.assert_allclose(y, xs, atol=1e-6,
                                   err_msg=f"offset {o} {(dx, dy, dz)}")


def test_flat_mode_mg_solve_matches_xla(monkeypatch):
    """solve_stencil_mg(spmv="flat") must reproduce the XLA-mode solve
    (same solution; iteration count within f32 reordering slack)."""
    import pelvistim_fem_tpu.ops.multigrid as mg
    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.lattice_assembly import assemble_lattice

    monkeypatch.setattr(mg, "FLAT_MIN_NODES", 0)
    spec, _ = build_pressure_spec(coarse=True)
    scase, hier = assemble_lattice(spec, jnp.float64)
    r_x = mg.solve_stencil_mg(scase, hier, tol=1e-9)
    r_f = mg.solve_stencil_mg(scase, hier, tol=1e-9, spmv="flat")
    p1, p2 = np.asarray(r_x.phi), np.asarray(r_f.phi)
    np.testing.assert_allclose(p2, p1, atol=1e-8 * np.abs(p1).max())
    assert abs(int(r_x.iterations) - int(r_f.iterations)) <= 2


@pytest.mark.parametrize("shape,L,B", [((9, 7, 6), 4, 3),
                                       ((17, 12, 9), 6, 5)])
def test_batched_flat_kernel_matches_fused_xla(shape, L, B):
    """Lane-batched flat kernel (grid lanes innermost, coefficients
    VMEM-resident across lanes) vs the XLA body-factored fused SpMV."""
    from pelvistim_fem_tpu.ops.stencil import batched_stencil_spmv_fused
    rng = np.random.default_rng(3)
    X4 = jnp.asarray(rng.standard_normal((L,) + shape), jnp.float32)
    coeff = jnp.asarray(rng.standard_normal((B, 27) + shape),
                        jnp.float32)
    tables = jnp.asarray(rng.standard_normal((L, B + 1)), jnp.float32)
    ref = batched_stencil_spmv_fused(X4, coeff, tables)
    Cf = ps.pack_coeff_flat_bodies(coeff)
    y = ps.batched_stencil_spmv_flat(X4, Cf, tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

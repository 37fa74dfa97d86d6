"""Native C++ kernels vs numpy fallbacks (skipped when _native.so is
not built; CI builds it via `make -C csrc`)."""

import numpy as np
import pytest

from pelvistim_fem_tpu import native
from pelvistim_fem_tpu.mesh.boundary import _extract_boundary_numpy
from pelvistim_fem_tpu.mesh.generate import layered_slab_mesh

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="_native.so not built")


@pytest.fixture(scope="module")
def slab():
    return layered_slab_mesh(
        0.08, 0.06, 0.04,
        layers=[(1, 0.0335, 0.006), (2, 0.005, 0.0025),
                (3, 0.0015, 0.00075)],
        electrodes=[(0.015, 0.045, 0.01), (0.065, 0.045, 0.01)],
        contact_t=0.0005, contact_h_z=0.0005,
        h_fine=0.003, h_coarse=0.006)


@needs_native
def test_native_boundary_matches_numpy(slab):
    f_np, p_np = _extract_boundary_numpy(slab.tets)
    f_cc, p_cc = native.extract_boundary(slab.tets)
    np.testing.assert_array_equal(f_cc, f_np)
    np.testing.assert_array_equal(p_cc, p_np)


@needs_native
def test_native_stencil_matches_numpy(slab):
    from pelvistim_fem_tpu.ops import assembly
    lat = slab.lattice
    X, Y, Z = lat.grid_shape
    G = X * Y * Z
    grads, vol = assembly.element_gradients(slab.nodes, slab.tets)
    ke = np.einsum("mid,mjd->mij", grads, grads) * vol[:, None, None]
    gidx = lat.grid_index[slab.tets]
    body0 = slab.tet_body.astype(np.int32) - 1
    n_bodies = int(slab.tet_body.max())

    import pelvistim_fem_tpu.native as nat
    lib_backup = nat._LIB
    try:
        out_cc = nat.accumulate_stencil(gidx, ke, body0, G, Y, Z,
                                        n_bodies)
        nat._LIB = None  # force numpy path
        out_np = nat.accumulate_stencil(gidx, ke, body0, G, Y, Z,
                                        n_bodies)
    finally:
        nat._LIB = lib_backup
    np.testing.assert_allclose(out_cc, out_np, rtol=1e-12, atol=1e-15)


@needs_native
def test_native_elmer_parse_matches_python(slab, tmp_path):
    from pelvistim_fem_tpu.mesh.io_elmer import (read_elmer_mesh,
                                                 write_elmer_mesh)
    write_elmer_mesh(slab, tmp_path / "em")
    a = read_elmer_mesh(tmp_path / "em")          # native path
    import pelvistim_fem_tpu.native as nat
    lib_backup = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True
        b = read_elmer_mesh(tmp_path / "em")      # python path
    finally:
        nat._LIB = lib_backup
    np.testing.assert_allclose(a.nodes, b.nodes, rtol=1e-15)
    np.testing.assert_array_equal(a.tets, b.tets)
    np.testing.assert_array_equal(a.tet_body, b.tet_body)


@needs_native
def test_native_csr_assembly_matches_scipy(slab):
    """assemble_csr_free[_grads] == the scipy coo->csr->slice path
    (the AMG setup hot phase it replaces — 9.5 s of a 12 s build at
    870k tets, dev/amg_setup_breakdown.py)."""
    import jax.numpy as jnp

    from pelvistim_fem_tpu.models.case import build_case
    from pelvistim_fem_tpu.ops import amg as amg_mod
    case = build_case(slab, {1: 0.35, 2: 0.04, 3: 1e-3, 4: 5e-3,
                             5: 5e-3},
                      mode="current", injected_current_A=5e-3,
                      dtype=jnp.float64, to_device=False)
    args = amg_mod._host_problem(case, slab, None)
    A_nat, fi_nat = amg_mod._assemble_csr(*args)
    import pelvistim_fem_tpu.native as nat
    lib_backup = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True
        A_ref, fi_ref = amg_mod._assemble_csr(*args)
    finally:
        nat._LIB = lib_backup
    np.testing.assert_array_equal(fi_nat, fi_ref)
    assert A_nat.nnz == A_ref.nnz
    d = abs(A_nat - A_ref)
    err = d.max() if d.nnz else 0.0
    assert err <= 1e-14 * abs(A_ref.data).max(), err

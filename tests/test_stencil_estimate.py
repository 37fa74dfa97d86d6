"""Grid-native ZZ estimation (ops/stencil_estimate.py) parity.

The lattice-spec estimator must reproduce the element path EXACTLY —
same recovery, same quadrature — per CELL (the 6 Kuhn tets of a cube
summed), on the hardest generated geometry: the deformed, carved,
5-body ankle lattice with contact volumes.  phi is an arbitrary smooth
analytic field (no solve needed — estimator parity is a property of
the discretization, not of a solution), so any mismatch in gradients,
recovery weights, volumes or body masking shows up at full magnitude.
"""

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.generate import layered_slab_recipe
from pelvistim_fem_tpu.mesh.spec import build_lattice_spec
from pelvistim_fem_tpu.models.ankle import ankle_outline_pts, ankle_z_top
from pelvistim_fem_tpu.models.case import build_case
from pelvistim_fem_tpu.ops.estimate import zz_error_indicators
from pelvistim_fem_tpu.ops.stencil_estimate import (
    lattice_axis_weights_from_cells, lattice_zz_error)

SIG5 = {1: 0.35, 2: 0.04, 3: 1e-3, 4: 5e-3, 5: 5e-3}


def _ankle_recipe():
    Lx, Ly, Lz = 0.08, 0.06, 0.04
    return layered_slab_recipe(
        Lx, Ly, Lz,
        layers=[(core.BODY_MUSCLE, 0.0335, 0.012),
                (core.BODY_FAT, 0.005, 0.005),
                (core.BODY_SKIN, 0.0015, 0.0015)],
        electrodes=[(0.015, 0.045, 0.01), (0.065, 0.045, 0.01)],
        contact_t=0.0005, contact_h_z=0.0005,
        h_fine=0.006, h_coarse=0.012,
        cross_section="ankle",
        ankle_z_top_fn=lambda x, y: ankle_z_top(x, y, Lx, Ly, Lz),
        outline_polygon=ankle_outline_pts(Lx, Ly))


def _smooth_phi(nodes):
    x, y, z = nodes[:, 0], nodes[:, 1], nodes[:, 2]
    return np.sin(40 * x) * np.cosh(25 * z) + 30 * y * y * z


def test_grid_zz_matches_element_path_on_deformed_ankle():
    recipe = _ankle_recipe()
    spec = build_lattice_spec(recipe, SIG5, mode="current",
                              injected_current_A=5e-3)
    mesh = recipe.mesh()
    case = build_case(mesh, SIG5, mode="current",
                      injected_current_A=5e-3, dtype=jnp.float64,
                      to_device=False)
    assert mesh.n_nodes == len(spec.grid_index)
    phi = _smooth_phi(np.asarray(mesh.nodes))

    # element path, summed per lattice cell via the keep-order
    # provenance: lattice_tets emits (cell x-major, class-minor) and
    # carving preserves order, so kept tet r maps to the r-th body>0
    # slot of body6 transposed to (cell, class)
    eta_e = np.asarray(zz_error_indicators(case, jnp.asarray(phi)))
    keep = np.asarray(spec.body6).transpose(1, 2, 3, 0).reshape(-1) > 0
    assert keep.sum() == mesh.n_tets
    cell_of_slot = np.repeat(np.arange(keep.size // 6), 6)
    cell_of_tet = cell_of_slot[keep]
    nx, ny, nz = (len(recipe.xs) - 1, len(recipe.ys) - 1,
                  len(recipe.zs) - 1)
    eta2_ref = np.bincount(cell_of_tet, weights=eta_e ** 2,
                           minlength=nx * ny * nz).reshape(nx, ny, nz)

    out = lattice_zz_error(spec, phi)
    eta2 = np.asarray(out["eta2_cells"])
    scale = eta2_ref.max()
    np.testing.assert_allclose(eta2, eta2_ref, atol=1e-10 * scale)
    np.testing.assert_allclose(float(out["eta"]),
                               np.sqrt(eta2_ref.sum()), rtol=1e-12)

    # axis projections are plain cell sums
    wx, wy, wz = lattice_axis_weights_from_cells(out["eta2_cells"])
    np.testing.assert_allclose(wx, eta2_ref.sum(axis=(1, 2)),
                               rtol=1e-10)
    np.testing.assert_allclose(wz, eta2_ref.sum(axis=(0, 1)),
                               rtol=1e-10)


def test_grid_zz_vanishes_on_p1_exact_divider():
    """Two-layer rect slab, piecewise-linear series-divider field set
    analytically at the nodes: P1-exact, so the grid estimator (which
    is by-body by construction) must report ~zero relative error."""
    Lx, Ly, Lz = 0.04, 0.04, 0.04
    recipe = layered_slab_recipe(
        Lx, Ly, Lz,
        layers=[(core.BODY_MUSCLE, 0.02, 0.008),
                (core.BODY_FAT, 0.02, 0.008)],
        electrodes=[(0.02, 0.02, 0.012), (0.02, 0.02, 0.012)],
        contact_t=0.0, h_fine=0.008, h_coarse=0.008)
    spec = build_lattice_spec(recipe, {1: 1.0, 2: 10.0},
                              mode="voltage")
    mesh = recipe.mesh()
    z = np.asarray(mesh.nodes)[:, 2]
    J = 1.0 / (0.02 / 1.0 + 0.02 / 10.0)
    phi = np.where(z < 0.02, J * z, J * 0.02 + J * (z - 0.02) / 10.0)
    out = lattice_zz_error(spec, phi)
    assert float(out["rel"]) < 1e-12, float(out["rel"])
    assert float(out["eta"]) < 1e-12 * J


def test_grid_goal_weights_match_element_path():
    """lattice_goal_weights (per-class DWR products summed per cell)
    must equal the element path's zz_goal_indicators summed over the
    cube's 6 tets — same deformed carved ankle fixture, two arbitrary
    smooth fields standing in for primal and dual."""
    from pelvistim_fem_tpu.ops.estimate import zz_goal_indicators
    from pelvistim_fem_tpu.ops.stencil_estimate import \
        lattice_goal_weights

    recipe = _ankle_recipe()
    spec = build_lattice_spec(recipe, SIG5, mode="current",
                              injected_current_A=5e-3)
    mesh = recipe.mesh()
    case = build_case(mesh, SIG5, mode="current",
                      injected_current_A=5e-3, dtype=jnp.float64,
                      to_device=False)
    nodes = np.asarray(mesh.nodes)
    phi = _smooth_phi(nodes)
    psi = np.cos(30 * nodes[:, 1]) * nodes[:, 2] \
        + 5 * nodes[:, 0] ** 2

    w_e = np.asarray(zz_goal_indicators(case, jnp.asarray(phi),
                                        jnp.asarray(psi)))
    keep = np.asarray(spec.body6).transpose(1, 2, 3, 0).reshape(-1) > 0
    cell_of_tet = np.repeat(np.arange(keep.size // 6), 6)[keep]
    nx, ny, nz = (len(recipe.xs) - 1, len(recipe.ys) - 1,
                  len(recipe.zs) - 1)
    ref = np.bincount(cell_of_tet, weights=w_e,
                      minlength=nx * ny * nz).reshape(nx, ny, nz)

    est_u = lattice_zz_error(spec, phi)
    est_z = lattice_zz_error(spec, psi)
    w = np.asarray(lattice_goal_weights(est_u, est_z))
    np.testing.assert_allclose(w, ref, atol=1e-10 * ref.max())


def test_grid_eqs_vanishes_on_complex_divider():
    """Grid-native complex ZZ: the P1-exact complex series divider
    must report ~zero error in BOTH components on the spec path."""
    from pelvistim_fem_tpu.ops.stencil_estimate import \
        lattice_zz_error_eqs

    EPS0 = 8.8541878128e-12
    sig = np.array([0.0, 0.02, 0.35])
    epsr = np.array([0.0, 8.0e5, 1.0e4])
    omega = 2 * np.pi * 5.0e4
    da = db = 0.02
    recipe = layered_slab_recipe(
        0.04, 0.04, 0.04,
        layers=[(core.BODY_MUSCLE, da, 0.008),
                (core.BODY_FAT, db, 0.008)],
        electrodes=[(0.02, 0.02, 0.012), (0.02, 0.02, 0.012)],
        contact_t=0.0, h_fine=0.008, h_coarse=0.008)
    spec = build_lattice_spec(recipe, {1: sig[1], 2: sig[2]},
                              mode="voltage")
    mesh = recipe.mesh()
    kap = sig + 1j * omega * EPS0 * epsr
    vi = (kap[2] / db) / (kap[1] / da + kap[2] / db)
    assert abs(vi.imag) > 1e-3
    z = np.asarray(mesh.nodes)[:, 2]
    exact = np.where(z <= da + 1e-12, vi * z / da,
                     vi + (1 - vi) * (z - da) / db)
    phi2 = np.stack([exact.real, exact.imag])
    out = lattice_zz_error_eqs(spec, phi2, kap.real, kap.imag)
    assert float(out["rel"]) < 1e-12, float(out["rel"])


import pytest


@pytest.mark.parametrize("n_dev", [5, 8])
def test_grid_zz_sharded_matches_unsharded(n_dev):
    """GSPMD x-slab-sharded estimation must match the single-device
    result exactly — padded planes carry body 0 and contribute zero.
    n_dev=5 divides X=25 exactly; n_dev=8 pads to 32."""
    import jax
    from jax.sharding import Mesh

    from pelvistim_fem_tpu.models.pressure import build_pressure_spec
    from pelvistim_fem_tpu.ops.stencil_estimate import \
        lattice_zz_error_sharded

    spec, _ = build_pressure_spec(coarse=True)
    nodes = np.asarray(spec.grid_index)
    # synthetic smooth field in mesh-node order via the grid coords
    X, Y, Z = spec.used.shape
    xs, ys, zs = spec.axes
    kx = np.broadcast_to(np.asarray(xs)[:, None, None], (X, Y, Z))
    kz = np.broadcast_to(np.asarray(zs)[None, None, :], (X, Y, Z))
    g = (np.sin(80 * kx) * np.exp(30 * kz)).reshape(-1)
    phi = g[nodes]

    ref = lattice_zz_error(spec, phi)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("x",))
    out = lattice_zz_error_sharded(spec, phi, mesh)
    np.testing.assert_allclose(
        np.asarray(out["eta2_cells"]), np.asarray(ref["eta2_cells"]),
        atol=1e-12 * float(ref["eta2_cells"].max()))
    np.testing.assert_allclose(float(out["eta"]), float(ref["eta"]),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out["rel"]), float(ref["rel"]),
                               rtol=1e-12)

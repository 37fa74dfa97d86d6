"""Grid-native ZZ error estimation on the lattice-spec fast path.

ops/estimate.py needs the (M, 4) tet array, per-tet gradients and a
node scatter — exactly the host-side materialization the lattice-spec
path (mesh/spec.py + ops/lattice_assembly.py) exists to avoid: the
6.8M-tet pelvis case assembles and solves from a ~10 MB spec without
ever building tets.  This module computes the SAME by-body ZZ
indicators (exact parity pinned in tests/test_stencil_estimate.py)
directly on the (X, Y, Z) node grid:

- Kuhn class t (permutation p) spans the axis-aligned edge path
  c0 -> c0+e_p0 -> +e_p1 -> (1,1,1), so its P1 gradient solves the
  3x3 system E g = d with E the path edge vectors and d the successive
  phi differences — per-cell cross-product inversion, no (M, 4, 3)
  gathers.  Deformed lattices (ankle z-warp, rim snapping) are exact:
  edges come from knots + coords_dev (spec.py's deviation storage).
- The volume-weighted per-body nodal recovery is 8 static slice-adds
  per class instead of a segment-sum scatter.
- Indicators reduce to an (nx, ny, nz) per-CELL eta^2 grid whose axis
  sums are directly the adapt_axis weights (cells == knot intervals —
  no centroid binning).

Everything lives in one jitted program; memory is O(cells) with one
body's recovery grid live at a time.
"""

from __future__ import annotations

import itertools
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["lattice_zz_error", "lattice_zz_error_eqs",
           "lattice_zz_error_sharded",
           "lattice_axis_weights_from_cells", "lattice_dual_spec",
           "lattice_goal_weights"]

# class order MUST match mesh/generate._KUHN (itertools.permutations);
# orientation swaps there reorder vertices, not the corner SET, and the
# path-edge gradient solve is vertex-order independent.
_PERMS = tuple(itertools.permutations(range(3)))


def _corners(perm):
    o1 = tuple(int(i == perm[0]) for i in range(3))
    o2 = tuple(int(i in (perm[0], perm[1])) for i in range(3))
    return ((0, 0, 0), o1, o2, (1, 1, 1))


def _cross(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


@partial(jax.jit, static_argnames=("n_bodies",))
def _lattice_zz_core(phi_g, coords, body6, sigma_table, *, n_bodies):
    """phi_g (X,Y,Z); coords (3,X,Y,Z); body6 (6,nx,ny,nz) int (0 =
    carved); sigma_table (n_bodies+1,).  Returns (eta2_cells, en2)."""
    X, Y, Z = phi_g.shape
    cx, cy, cz = X - 1, Y - 1, Z - 1

    def corner(a, o):
        return a[..., o[0]:cx + o[0], o[1]:cy + o[1], o[2]:cz + o[2]]

    gs, Vs, cns = [], [], []
    for p in _PERMS:
        cs = _corners(p)
        xc = [corner(coords, o) for o in cs]          # 4 x (3, cells)
        e1, e2, e3 = xc[1] - xc[0], xc[2] - xc[1], xc[3] - xc[2]
        pc = [corner(phi_g, o) for o in cs]
        d1, d2, d3 = pc[1] - pc[0], pc[2] - pc[1], pc[3] - pc[2]
        c23, c31, c12 = _cross(e2, e3), _cross(e3, e1), _cross(e1, e2)
        det = jnp.sum(e1 * c23, axis=0)
        g = (d1 * c23 + d2 * c31 + d3 * c12) \
            / jnp.where(det == 0, 1.0, det)
        gs.append(g)                                   # (3, cells)
        Vs.append(jnp.abs(det) / 6.0)                  # (cells,)
        cns.append(cs)

    eta2 = jnp.zeros((6, cx, cy, cz), phi_g.dtype)
    en2 = jnp.zeros((), phi_g.dtype)
    for b in range(1, n_bodies + 1):
        # per-body volume-weighted recovery (8 slice-adds per class)
        num = jnp.zeros((3, X, Y, Z), phi_g.dtype)
        den = jnp.zeros((X, Y, Z), phi_g.dtype)
        ws = []
        for t in range(6):
            w = jnp.where(body6[t] == b, Vs[t], 0.0)
            ws.append(w)
            wg = w * gs[t]
            for o in cns[t]:
                num = num.at[:, o[0]:cx + o[0], o[1]:cy + o[1],
                             o[2]:cz + o[2]].add(wg)
                den = den.at[o[0]:cx + o[0], o[1]:cy + o[1],
                             o[2]:cz + o[2]].add(w)
        Gb = num / jnp.maximum(den, 1e-300)

        sig = sigma_table[b]
        for t in range(6):
            ds = [corner(Gb, o) - gs[t] for o in cns[t]]
            sumd = ds[0] + ds[1] + ds[2] + ds[3]
            quad = jnp.sum(sumd * sumd, axis=0)
            for d in ds:
                quad = quad + jnp.sum(d * d, axis=0)
            eta2 = eta2.at[t].add(ws[t] / 20.0 * sig * quad)
            en2 = en2 + jnp.sum(ws[t] * sig
                                * jnp.sum(gs[t] * gs[t], axis=0))
    return eta2, en2


def lattice_zz_error(spec, phi, sigma_table=None, dtype=jnp.float64):
    """By-body ZZ indicators for a LatticeSpec solve — no tets.

    phi: (N,) mesh-node solution (the layout every lattice/stencil
    solver returns).  Returns dict: eta2_cells (nx, ny, nz) per-cell
    squared indicators (a cell's value sums its 6 Kuhn tets — the
    resolution adaptation acts at), eta (global estimate), rel
    (vs the solution energy norm).  Exact parity with
    ops/estimate.zz_error_indicators is pinned per cell in tests."""
    X, Y, Z = spec.used.shape
    xs, ys, zs = spec.axes
    tab = (np.asarray(spec.sigma_table, np.float64)
           if sigma_table is None else np.asarray(sigma_table))
    if tab.ndim != 1:
        raise ValueError("lattice_zz_error: scalar sigma tables only "
                         "(tensor bodies: use the element path's "
                         "zz_error_indicators)")
    phi_g = jnp.zeros(X * Y * Z, dtype).at[
        jnp.asarray(spec.grid_index)].set(jnp.asarray(phi, dtype))
    phi_g = phi_g.reshape(X, Y, Z)
    kx = np.broadcast_to(np.asarray(xs)[:, None, None], (X, Y, Z))
    ky = np.broadcast_to(np.asarray(ys)[None, :, None], (X, Y, Z))
    kz = np.broadcast_to(np.asarray(zs)[None, None, :], (X, Y, Z))
    coords = jnp.asarray(
        np.stack([kx, ky, kz]) + np.asarray(spec.coords_dev), dtype)
    eta2_class, en2 = _lattice_zz_core(
        phi_g, coords, jnp.asarray(spec.body6),
        jnp.asarray(tab, dtype), n_bodies=int(spec.n_bodies))
    eta2 = jnp.sum(eta2_class, axis=0)
    eta = jnp.sqrt(jnp.sum(eta2))
    return {"eta2_cells": eta2, "eta2_class": eta2_class, "eta": eta,
            "en2": en2,
            "rel": eta / jnp.sqrt(jnp.maximum(en2, 1e-300))}


def lattice_zz_error_sharded(spec, phi, mesh, *, axis="x",
                             sigma_table=None, dtype=jnp.float64):
    """lattice_zz_error under GSPMD x-slab sharding: the core is pure
    shifted-slice work — exactly the pattern XLA's SPMD partitioner
    turns into local compute + 1-plane halo exchanges (the same
    contract as lattice_assembly.assemble_lattice_sharded, whose
    padded-spec layout this reuses) — so a case too large for one
    chip's HBM gets error estimation without any device holding the
    full grid.  Returns the same dict with padded planes stripped
    (they carry body 0 and contribute exactly zero)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pelvistim_fem_tpu.ops.lattice_assembly import _pad_spec_x

    X0 = spec.used.shape[0]
    spec_p = _pad_spec_x(spec, mesh.shape[axis])
    X, Y, Z = spec_p.used.shape
    xs, ys, zs = spec_p.axes
    tab = (np.asarray(spec_p.sigma_table, np.float64)
           if sigma_table is None else np.asarray(sigma_table))
    phi_g = np.zeros(X * Y * Z, np.float64)
    phi_g[np.asarray(spec_p.grid_index)] = np.asarray(phi, np.float64)
    kx = np.broadcast_to(np.asarray(xs)[:, None, None], (X, Y, Z))
    ky = np.broadcast_to(np.asarray(ys)[None, :, None], (X, Y, Z))
    kz = np.broadcast_to(np.asarray(zs)[None, None, :], (X, Y, Z))
    coords = np.stack([kx, ky, kz]) + np.asarray(spec_p.coords_dev)

    ns = lambda *s: NamedSharding(mesh, P(*s))
    phi_d = jax.device_put(phi_g.reshape(X, Y, Z).astype(dtype),
                           ns(axis))
    coords_d = jax.device_put(coords.astype(dtype), ns(None, axis))
    body_d = jax.device_put(np.asarray(spec_p.body6), ns())
    tab_d = jax.device_put(tab.astype(dtype), ns())
    eta2_class, en2 = _lattice_zz_core(
        phi_d, coords_d, body_d, tab_d,
        n_bodies=int(spec_p.n_bodies))
    eta2 = jnp.sum(eta2_class, axis=0)[:X0 - 1]
    eta2_class = eta2_class[:, :X0 - 1]
    eta = jnp.sqrt(jnp.sum(eta2))
    return {"eta2_cells": eta2, "eta2_class": eta2_class, "eta": eta,
            "en2": en2,
            "rel": eta / jnp.sqrt(jnp.maximum(en2, 1e-300))}


def lattice_zz_error_eqs(spec, phi2, kr_table, ki_table,
                         dtype=jnp.float64):
    """lattice_zz_error for a stacked-real complex (EQS) field:
    component-wise recovery weighted by the admittivity modulus
    (estimate.zz_error_indicators_eqs's grid-native twin).  phi2
    (2, N) in the layout every stencil EQS solver returns."""
    kr = np.asarray(kr_table, np.float64)
    ki = np.asarray(ki_table, np.float64)
    kmag = np.sqrt(kr * kr + ki * ki)
    out_r = lattice_zz_error(spec, np.asarray(phi2)[0],
                             sigma_table=kmag, dtype=dtype)
    out_i = lattice_zz_error(spec, np.asarray(phi2)[1],
                             sigma_table=kmag, dtype=dtype)
    eta2 = out_r["eta2_cells"] + out_i["eta2_cells"]
    eta2_class = out_r["eta2_class"] + out_i["eta2_class"]
    eta = jnp.sqrt(jnp.sum(eta2))
    en2 = float(out_r["en2"]) + float(out_i["en2"])
    return {"eta2_cells": eta2, "eta2_class": eta2_class, "eta": eta,
            "rel": float(eta) / np.sqrt(max(en2, 1e-300))}


def lattice_dual_spec(spec, q_nodes):
    """The dual (adjoint) spec of a linear goal J = q^T phi on the
    lattice fast path: the spec BAKES its electrode load into
    b_neumann at build time (mesh/spec.py:207-226), so the dual is a
    pure field swap — homogeneous Dirichlet data, b_neumann = q
    embedded on the grid.  Same operator, same hierarchy, same
    certified solver (estimate.goal_dual_case's spec-path twin).

    For pure-Neumann (current-mode) specs the goal must be
    compatible (sum q = 0) — automatically true for AF-type goals,
    whose second-difference weights annihilate constants."""
    import dataclasses

    X, Y, Z = spec.used.shape
    qg = np.zeros(X * Y * Z, np.float64)
    qg[np.asarray(spec.grid_index)] = np.asarray(q_nodes, np.float64)
    return dataclasses.replace(
        spec, dirichlet=np.zeros_like(spec.dirichlet),
        b_neumann=qg.reshape(X, Y, Z))


def lattice_goal_weights(est_u, est_z):
    """Per-cell DWR goal weights sum_t eta_u,t * eta_z,t from two
    lattice_zz_error results (primal and dual) — the PER-TET
    Cauchy-Schwarz contributions summed per cell, NOT
    sqrt(cell_u2 * cell_z2), which would re-mix the 6 Kuhn classes
    and overestimate.  Feed to adapt_axis via axis sums with power=1;
    the total is the estimated goal-error bound |J(u) - J(u_h)|."""
    wu = jnp.sqrt(jnp.maximum(est_u["eta2_class"], 0.0))
    wz = jnp.sqrt(jnp.maximum(est_z["eta2_class"], 0.0))
    return jnp.sum(wu * wz, axis=0)


def lattice_axis_weights_from_cells(eta2_cells):
    """[wx, wy, wz] adapt_axis error-mass weights from the per-cell
    indicator grid: cells ARE the knot intervals, so the projection is
    a plain sum over the perpendicular axes (the spec-path counterpart
    of estimate.lattice_axis_weights' centroid binning)."""
    e = np.asarray(eta2_cells, np.float64)
    return [e.sum(axis=(1, 2)), e.sum(axis=(0, 2)), e.sum(axis=(0, 1))]

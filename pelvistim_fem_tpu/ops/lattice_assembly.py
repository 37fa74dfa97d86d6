"""Device-side stencil assembly + multigrid setup from a LatticeSpec.

The TPU-native answer to VERDICT item 2: instead of assembling the
27-point stencil coefficients on the (single-core) host and shipping
~hundreds of MB of per-body stacks over the axon tunnel, ship the ~5 MB
LatticeSpec (knot axes + coordinate deviations + per-class cell bodies +
BC grids) and build everything on device inside ONE jitted program:

    coefficients  — per-Kuhn-class closed-form P1 stiffness from cell
                    corner coordinates, accumulated as 96 padded adds
                    (pure elementwise; XLA fuses them, no scatter);
    MG hierarchy  — Galerkin probing (R A_b P read off with period-3
                    comb vectors) translated to jnp: one batched
                    (bodies x 27 combs) stencil apply + a phase-indexed
                    gather per level;
    solve         — the standard MG-preconditioned CG (ops/multigrid).

After the one-time compile, a full megatet re-assemble + hierarchy +
solve is a single sub-second device call — the per-case cost of a
geometry-varying sweep (the reference re-meshes and re-solves per case,
run_layered_sweep.py:1061-1124).

Numerics: edge vectors are reconstructed as (exact 1-D knot difference)
+ (deviation difference), so f32 per-cell gradients are accurate to f32
roundoff of the EDGE — no catastrophic cancellation against absolute
coordinates (see mesh/spec.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.generate import _KUHN
from pelvistim_fem_tpu.mesh.spec import LatticeSpec
from pelvistim_fem_tpu.ops.multigrid import (MGHierarchy, MGLevel,
                                             make_transfers,
                                             solve_stencil_mg)
from pelvistim_fem_tpu.ops.stencil import OFFSETS, StencilCase

_OFFSET_INDEX = {off: o for o, off in enumerate(OFFSETS)}


def _kuhn_class_areas(h_axes, coords_dev, c):
    """Per-cell corner AREA vectors + |det| for one Kuhn class.

    Returns (ns, adet): ns a list of 4 (3-tuple of (nx, ny, nz))
    corner area vectors with e_i . A_j = det delta_ij, so
    grad phi = sum_a phi_a n_a / det and K_ab = sigma n_a.n_b/(6|det|).
    Edge vectors reconstruct as exact knot difference + deviation
    difference (the cancellation-free split, see module docstring)."""
    X, Y, Z = coords_dev.shape[1:]
    nx, ny, nz = X - 1, Y - 1, Z - 1

    def corner_dev(cc):
        return coords_dev[:, cc[0]:cc[0] + nx, cc[1]:cc[1] + ny,
                          cc[2]:cc[2] + nz]

    d0 = corner_dev(c[0])
    es = []
    for k in (1, 2, 3):
        dk = corner_dev(c[k]) - d0
        comps = []
        for ax in range(3):
            delta = int(c[k, ax]) - int(c[0, ax])
            comp = dk[ax]
            if delta != 0:
                shape = [1, 1, 1]
                shape[ax] = (nx, ny, nz)[ax]
                comp = comp + delta * h_axes[ax].reshape(shape)
            comps.append(comp)
        es.append(comps)
    e1, e2, e3 = es

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    A1 = cross(e2, e3)
    A2 = cross(e3, e1)
    A3 = cross(e1, e2)
    det = e1[0] * A1[0] + e1[1] * A1[1] + e1[2] * A1[2]
    ns = [tuple(-(A1[i] + A2[i] + A3[i]) for i in range(3)),
          A1, A2, A3]
    return ns, jnp.abs(det)


def lattice_cell_e_mag(h_axes, coords_dev, phi_grid):
    """Per-(Kuhn-class, cell) field magnitude |grad phi|:
    (6, nx, ny, nz) from a grid-shaped potential (X, Y, Z).

    grad phi = sum_a phi(corner_a) n_a / det on each tet; carved cells
    (zero |det|) return 0.  The lattice twin of nonlinear._cell_e_mag —
    feeds sigma(|E|)/sigma(T) laws on the stencil fast path."""
    X, Y, Z = phi_grid.shape
    nx, ny, nz = X - 1, Y - 1, Z - 1

    def corner_phi(cc):
        return phi_grid[cc[0]:cc[0] + nx, cc[1]:cc[1] + ny,
                        cc[2]:cc[2] + nz]

    outs = []
    for t in range(6):
        c = _KUHN[t]
        ns, adet = _kuhn_class_areas(h_axes, coords_dev, c)
        g = [jnp.zeros((nx, ny, nz), phi_grid.dtype) for _ in range(3)]
        for a in range(4):
            pa = corner_phi(c[a])
            for i in range(3):
                g[i] = g[i] + pa * ns[a][i]
        mag2 = g[0] ** 2 + g[1] ** 2 + g[2] ** 2
        inv = jnp.where(adet > 0, 1.0 / jnp.maximum(adet, 1e-300), 0.0)
        outs.append(jnp.sqrt(mag2) * inv)
    return jnp.stack(outs)


def lattice_coeff(h_axes, coords_dev, body6, n_bodies: int,
                  sigma_table=None, sigma_cell=None):
    """Per-body stencil coefficient stacks (B, 27, X, Y, Z) from grid
    geometry, fully on device.

    h_axes: (hx (nx,), hy (ny,), hz (nz,)) per-cell knot spacings,
    differenced on host in f64 (differencing f32 absolute knots on
    device would re-introduce the cancellation the deviation split
    avoids).
    coords_dev: (3, X, Y, Z) node deviation from the knot grid.
    body6: (6, nx, ny, nz) int8 per-(cell, Kuhn class) body id (0 =
    carved).  Matches the host path assemble_stencil_coeffs +
    build_mesh_from_lattice classification exactly (parity-tested).

    sigma_table (n_bodies + 1,) with slot 0 == 0: weight each cell's
    contribution by its body's sigma DURING accumulation and return a
    pre-combined (1, 27, X, Y, Z) stack — the single-sigma form that
    never materializes the per-body stacks (at the 6.8M-tet pelvis the
    7-body f64 stack alone is 3.7 GB tile-padded; the whole-body-
    factored refined program requested 25.8 GB of HBM).

    sigma_table may also be a (n_bodies + 1, 3, 3) SYMMETRIC TENSOR
    table (ops/aniso.py; slot 0 all-zero): the cell integrand becomes
    n_a^T Sigma n_b / (6 |det|) instead of sigma n_a . n_b — megatet-
    scale anisotropy on the stencil fast path, also pre-combined B=1
    (tensor sweeps are not body-factored; re-assemble per table, which
    this one jitted device call makes cheap).  Parity-tested against
    the element path (tests/test_aniso.py).

    sigma_cell (6, nx, ny, nz): PER-(Kuhn-class, cell) conductivity
    field — the nonlinear fast path (sigma(|E|), sigma(T)) where every
    tet carries its own sigma.  Pre-combined B=1 like sigma_table; the
    caller must zero carved cells (body6 == 0).  Mutually exclusive
    with sigma_table.
    """
    if sigma_table is not None and sigma_cell is not None:
        raise ValueError("pass sigma_table or sigma_cell, not both")
    dt = coords_dev.dtype
    X, Y, Z = coords_dev.shape[1:]
    nx, ny, nz = X - 1, Y - 1, Z - 1
    B_out = n_bodies if (sigma_table is None
                         and sigma_cell is None) else 1

    per_off = [[] for _ in range(27)]
    bids = jnp.arange(1, n_bodies + 1, dtype=jnp.int32)
    for t in range(6):
        c = _KUHN[t]
        ns, adet = _kuhn_class_areas(h_axes, coords_dev, c)
        inv6det = jnp.where(adet > 0, 1.0 / (6.0 * adet), 0.0)
        tensor = sigma_table is not None and sigma_table.ndim == 3
        if sigma_cell is not None:
            # per-(class, cell) conductivity field (nonlinear laws);
            # caller zeroes carved cells
            weight = sigma_cell[t][None].astype(dt)
        elif sigma_table is None:
            weight = (body6[t][None]
                      == bids[:, None, None, None]).astype(dt)
        elif tensor:
            # per-cell 3x3 (small-table gather); carved cells (body 0)
            # hit the all-zero slot.  Kept as 6 symmetric components.
            bt = body6[t].astype(jnp.int32)
            S = [[sigma_table[bt, c, d].astype(dt) for d in range(3)]
                 for c in range(3)]
        else:
            # carved cells (body 0) hit sigma_table[0] == 0
            weight = sigma_table[body6[t].astype(jnp.int32)][None]
            weight = weight.astype(dt)
        for a in range(4):
            for b in range(a, 4):
                if tensor:
                    k_ab = sum(ns[a][c] * S[c][d] * ns[b][d]
                               for c in range(3)
                               for d in range(3)) * inv6det
                    contrib = k_ab[None]               # (1, nx, ny, nz)
                else:
                    k_ab = (ns[a][0] * ns[b][0] + ns[a][1] * ns[b][1]
                            + ns[a][2] * ns[b][2]) * inv6det
                    contrib = k_ab[None] * weight      # (B_out, nx, ny, nz)
                o_ab = _OFFSET_INDEX[tuple(c[b] - c[a])]
                per_off[o_ab].append((tuple(c[a]), contrib))
                if a != b:
                    o_ba = _OFFSET_INDEX[tuple(c[a] - c[b])]
                    per_off[o_ba].append((tuple(c[b]), contrib))

    outs = []
    for o in range(27):
        acc = jnp.zeros((B_out, X, Y, Z), dt)
        for da, contrib in per_off[o]:
            acc = acc + jnp.pad(
                contrib, ((0, 0), (da[0], X - nx - da[0]),
                          (da[1], Y - ny - da[1]),
                          (da[2], Z - nz - da[2])))
        outs.append(acc)
    return jnp.stack(outs, axis=1)                       # (B, 27, X, Y, Z)


def _comb_vectors(shape, dt):
    """(27, Xc, Yc, Zc) period-3 probing combs, built from iota (no
    embedded host constants).  Comb c has phase ((dx+1), (dy+1), (dz+1))
    of OFFSETS[c] — mirror of multigrid._probe_coarse_stencils."""
    Xc, Yc, Zc = shape
    ix = jnp.arange(Xc) % 3
    iy = jnp.arange(Yc) % 3
    iz = jnp.arange(Zc) % 3
    phases = jnp.asarray([(dx + 1, dy + 1, dz + 1)
                          for dx, dy, dz in OFFSETS])     # (27, 3)
    return ((ix[None, :, None, None] == phases[:, 0, None, None, None])
            & (iy[None, None, :, None] == phases[:, 1, None, None, None])
            & (iz[None, None, None, :] == phases[:, 2, None, None, None])
            ).astype(dt)


def _spmv_all(pf, coeff):
    """Y[b, c] = A_b pf[c]: 27 shifted multiply-adds broadcast over
    (bodies, combs)."""
    C, X, Y, Z = pf.shape
    pfp = jnp.pad(pf, ((0, 0), (1, 1), (1, 1), (1, 1)))
    out = jnp.zeros((coeff.shape[0],) + pf.shape, pf.dtype)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        sh = jax.lax.slice(pfp, (0, 1 + dx, 1 + dy, 1 + dz),
                           (C, 1 + dx + X, 1 + dy + Y, 1 + dz + Z))
        out = out + coeff[:, o, None] * sh[None]
    return out


def _probe_level_jnp(coeff, free, prolong, restrict, coarse_shape):
    """Galerkin-probe one coarsening on device: (B, 27, Xc, Yc, Zc)."""
    dt = coeff.dtype
    Xc, Yc, Zc = coarse_shape
    combs = _comb_vectors(coarse_shape, dt)              # (27, coarse)
    pf = jnp.where(free[None], prolong(combs), 0.0)      # (27, fine)
    ys = _spmv_all(pf, coeff)                            # (B, 27, fine)
    ys = restrict(jnp.where(free[None, None], ys, 0.0))  # (B, 27, coarse)

    # entry extraction: for target node n and offset d, the source comb
    # is the unique one whose phase == (n + d) mod 3; out-of-range
    # sources are zero (mirror of the host np.ix_ selection)
    ix = jnp.arange(Xc)
    iy = jnp.arange(Yc)
    iz = jnp.arange(Zc)
    d = jnp.asarray(OFFSETS)                             # (27, 3)
    sx = ix[None, :, None, None] + d[:, 0, None, None, None]
    sy = iy[None, None, :, None] + d[:, 1, None, None, None]
    sz = iz[None, None, None, :] + d[:, 2, None, None, None]
    cidx = ((sx % 3) * 9 + (sy % 3) * 3 + (sz % 3))      # (27, coarse)
    valid = ((sx >= 0) & (sx < Xc) & (sy >= 0) & (sy < Yc)
             & (sz >= 0) & (sz < Zc))
    out = jnp.take_along_axis(
        ys, jnp.broadcast_to(cidx[None], ys.shape).astype(jnp.int32),
        axis=1)
    return out * valid[None].astype(dt)


def _hierarchy_jnp(coeff, free, axes, *, min_nodes=100, max_levels=8):
    """Traced twin of multigrid.build_hierarchy (same coarsening
    schedule, transfers and probing math; runs inside the caller's jit).
    axes: static numpy knot vectors."""
    levels = [MGLevel(coeff=coeff, free=free)]
    prolongs, restricts = [], []
    cur_axes = tuple(np.asarray(a, float) for a in axes)
    cur_coeff, cur_free = coeff, free
    while len(levels) < max_levels:
        shape = tuple(len(a) for a in cur_axes)
        if int(np.prod(shape)) <= min_nodes:
            break
        coarse_axes, prolong, restrict = make_transfers(cur_axes)
        cshape = tuple(len(a) for a in coarse_axes)
        cc = _probe_level_jnp(cur_coeff, cur_free, prolong, restrict,
                              cshape)
        cfree = jnp.abs(cc).sum(axis=(0, 1)) > 0
        levels.append(MGLevel(coeff=cc, free=cfree))
        prolongs.append(prolong)
        restricts.append(restrict)
        cur_axes, cur_coeff, cur_free = coarse_axes, cc, cfree
    return MGHierarchy(levels=tuple(levels), prolongs=tuple(prolongs),
                       restricts=tuple(restricts))


def spec_device_arrays(spec: LatticeSpec, dtype=jnp.float32) -> dict:
    """One host->device shipment of the compact spec (a few MB)."""
    return dict(
        h_axes=tuple(jnp.asarray(np.diff(np.asarray(a, np.float64)),
                                 dtype) for a in spec.axes),
        coords_dev=jnp.asarray(spec.coords_dev, dtype),
        body6=jnp.asarray(spec.body6),
        free=jnp.asarray(spec.free),
        dirichlet=jnp.asarray(spec.dirichlet, dtype),
        b_neumann=jnp.asarray(spec.b_neumann, dtype),
        grid_index=jnp.asarray(spec.grid_index, jnp.int32),
        sigma_table=jnp.asarray(spec.sigma_table, dtype),
    )


def _axes_static(spec: LatticeSpec):
    return tuple(tuple(float(v) for v in a) for a in spec.axes)


@partial(jax.jit, static_argnames=("axes", "n_bodies", "min_nodes",
                                   "max_levels"))
def _assemble_jit(dev, *, axes, n_bodies, min_nodes=100, max_levels=8):
    axes_np = tuple(np.asarray(a, float) for a in axes)
    coeff = lattice_coeff(dev["h_axes"], dev["coords_dev"], dev["body6"],
                          n_bodies)
    scase = StencilCase(coeff=coeff, free=dev["free"],
                        dirichlet=dev["dirichlet"],
                        b_neumann=dev["b_neumann"],
                        grid_index=dev["grid_index"],
                        sigma_table=dev["sigma_table"])
    hier = _hierarchy_jnp(coeff, dev["free"], axes_np,
                          min_nodes=min_nodes, max_levels=max_levels)
    return scase, hier


def assemble_lattice(spec: LatticeSpec, dtype=jnp.float32, *,
                     device_arrays=None, min_nodes=100, max_levels=8):
    """StencilCase + MGHierarchy entirely on device (one jitted call).

    Drop-in for stencil_host_data -> build_stencil_case ->
    build_hierarchy; the returned pytrees feed every existing solver
    (solve_stencil_mg, batched_mg_solve, sharded paths)."""
    dev = device_arrays or spec_device_arrays(spec, dtype)
    return _assemble_jit(dev, axes=_axes_static(spec),
                         n_bodies=spec.n_bodies,
                         min_nodes=min_nodes, max_levels=max_levels)


@partial(jax.jit, static_argnames=("axes", "n_bodies", "tol", "maxiter",
                                   "nu", "coarse_iters", "smoother",
                                   "min_nodes", "max_levels", "spmv"))
def _assemble_solve_jit(dev, sigma_table, *, axes, n_bodies, tol,
                        maxiter=2_000, nu=2, coarse_iters=24,
                        smoother="jacobi", min_nodes=100, max_levels=8,
                        spmv=None):
    scase, hier = _assemble_jit(dev, axes=axes, n_bodies=n_bodies,
                                min_nodes=min_nodes,
                                max_levels=max_levels)
    return solve_stencil_mg(scase, hier, sigma_table, tol=tol,
                            maxiter=maxiter, nu=nu,
                            coarse_iters=coarse_iters, smoother=smoother,
                            spmv=spmv)


def _auto_spmv(spec: LatticeSpec, dtype=jnp.float32):
    """Pick the SpMV kernel for UNBATCHED lattice solves: the
    lane-packed flat Pallas kernel on large f32 grids (1.36x faster
    megatet MG iterations on v5e), XLA elsewhere (small grids, CPU
    tests, f64 operands — Mosaic cannot lower f64 on TPU — and every
    vmapped path, since vmap serializes Pallas kernel grids)."""
    from pelvistim_fem_tpu.ops.multigrid import FLAT_MIN_NODES
    G = int(np.prod(spec.grid_shape))
    if (G >= FLAT_MIN_NODES and jax.default_backend() != "cpu"
            and jnp.dtype(dtype) == jnp.float32):
        return "flat"
    return None


def solve_lattice_mg(spec: LatticeSpec, sigma_table=None, *,
                     dtype=jnp.float32, tol=1e-8, maxiter=2_000, nu=2,
                     coarse_iters=24, smoother="jacobi",
                     device_arrays=None):
    """Assemble + coarsen + MG-CG solve as ONE device program.

    phi is returned in mesh node ordering (parity with solve_stencil_mg
    on the TetMesh path)."""
    dev = device_arrays or spec_device_arrays(spec, dtype)
    sig = (dev["sigma_table"] if sigma_table is None
           else jnp.asarray(sigma_table, dtype))
    return _assemble_solve_jit(dev, sig, axes=_axes_static(spec),
                               n_bodies=spec.n_bodies, tol=tol,
                               maxiter=maxiter, nu=nu,
                               coarse_iters=coarse_iters,
                               smoother=smoother,
                               spmv=_auto_spmv(spec, dtype))


@partial(jax.jit, static_argnames=("axes", "n_bodies", "tol", "inner_tol",
                                   "maxiter", "nu", "coarse_iters",
                                   "smoother", "max_refinements",
                                   "min_nodes", "max_levels", "spmv"))
def _assemble_solve_refined_jit(dev, sigma_table, *, axes, n_bodies, tol,
                                inner_tol=3e-4, maxiter=2_000, nu=2,
                                coarse_iters=24, smoother="jacobi",
                                max_refinements=8, min_nodes=100,
                                max_levels=8, spmv=None):
    from pelvistim_fem_tpu.ops.multigrid import solve_stencil_mg_refined
    axes_np = tuple(np.asarray(a, float) for a in axes)
    # f64 master operator, PRE-COMBINED with the (single) sigma during
    # accumulation — C(sigma) = sum_b sigma_b C_b is linear, so probing
    # the combined operator gives the identical hierarchy the per-body
    # probe would after combining, at 1/B the memory (the body-factored
    # form exists for material SWEEPS; this entry point solves one
    # sigma).  The MG hierarchy (inner preconditioner) is probed from
    # the f32 cast — refinement only needs the V-cycle to be a good f32
    # preconditioner, while the residual is certified in f64.
    coeff64 = lattice_coeff(dev["h_axes"], dev["coords_dev"],
                            dev["body6"], n_bodies,
                            sigma_table=sigma_table)
    sig2 = jnp.asarray([0.0, 1.0], coeff64.dtype)
    scase64 = StencilCase(coeff=coeff64, free=dev["free"],
                          dirichlet=dev["dirichlet"],
                          b_neumann=dev["b_neumann"],
                          grid_index=dev["grid_index"],
                          sigma_table=sig2)
    hier32 = _hierarchy_jnp(coeff64.astype(jnp.float32), dev["free"],
                            axes_np, min_nodes=min_nodes,
                            max_levels=max_levels)
    return solve_stencil_mg_refined(
        scase64, hier32, sig2, tol=tol, inner_tol=inner_tol,
        maxiter=maxiter, nu=nu, coarse_iters=coarse_iters,
        smoother=smoother, max_refinements=max_refinements, spmv=spmv)


def solve_lattice_mg_refined(spec: LatticeSpec, sigma_table=None, *,
                             tol=1e-8, inner_tol=3e-4, maxiter=2_000,
                             nu=2, coarse_iters=24, smoother="jacobi",
                             max_refinements=8, device_arrays=None):
    """Assemble (f64) + coarsen (f32) + mixed-precision MG solve as ONE
    device program: the returned residual is the TRUE f64 relative
    residual (requires jax_enable_x64; see
    multigrid.solve_stencil_mg_refined for why plain f32 CG cannot be
    trusted at the reference's material contrasts)."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("solve_lattice_mg_refined")
    dev = device_arrays or spec_device_arrays(spec, jnp.float64)
    sig = (dev["sigma_table"] if sigma_table is None
           else jnp.asarray(sigma_table, jnp.float64))
    return _assemble_solve_refined_jit(
        dev, sig, axes=_axes_static(spec), n_bodies=spec.n_bodies,
        tol=tol, inner_tol=inner_tol, maxiter=maxiter, nu=nu,
        coarse_iters=coarse_iters, smoother=smoother,
        max_refinements=max_refinements, spmv=_auto_spmv(spec))


def _pad_spec_x(spec: LatticeSpec, n_dev: int) -> LatticeSpec:
    """Pad the lattice with inert x-planes (carved cells, non-free
    nodes, zero loads) so every grid dimension sharded over `n_dev`
    devices divides evenly.  The linear system on the real nodes is
    unchanged (padded planes carry all-zero stencil rows); flat grid
    indices are x-major, so grid_index is unaffected by appending
    x-planes."""
    X = spec.grid_shape[0]
    Xp = -(-X // n_dev) * n_dev
    pad_n = Xp - X           # node planes to append
    if pad_n == 0:
        return spec
    xs, ys, zs = spec.axes
    h = xs[-1] - xs[-2]
    xs_p = np.concatenate([xs, xs[-1] + h * np.arange(1, pad_n + 1)])
    padn = lambda a, fill=0.0: np.concatenate(
        [a, np.full((pad_n,) + a.shape[1:], fill, a.dtype)], axis=0)
    return dataclasses.replace(
        spec,
        axes=(xs_p, ys, zs),
        coords_dev=np.concatenate(
            [spec.coords_dev,
             np.zeros((3, pad_n) + spec.coords_dev.shape[2:])], axis=1),
        body6=np.concatenate(
            [spec.body6,
             np.zeros((6, pad_n) + spec.body6.shape[2:], np.int8)],
            axis=1),
        used=padn(spec.used, False),
        free=padn(spec.free, False),
        dirichlet=padn(spec.dirichlet),
        b_neumann=padn(spec.b_neumann),
    )


def assemble_lattice_sharded(spec: LatticeSpec, mesh, *, axis: str = "x",
                             dtype=jnp.float32, min_nodes=100,
                             max_levels=8):
    """Multi-chip device assembly: x-slab-sharded coefficients + MG
    hierarchy, via GSPMD sharding annotations on the SAME jitted program
    as assemble_lattice.

    The coefficient build is pure shifted elementwise work (pads +
    static slices), exactly the pattern XLA's SPMD partitioner converts
    into local compute + 1-plane halo exchanges over ICI — no manual
    shard_map needed for assembly.  Outputs: the fine level (scase.coeff
    (B, 27, X, Y, Z), free/dirichlet/b_neumann grids) sharded into
    x-slabs over `axis`; coarse hierarchy levels replicated (they are
    ~8x smaller per level — the same agglomeration layout
    parallel/stencil_shard.sharded_stencil_solve_mg consumes).

    The returned (scase, hier) feed sharded_stencil_solve_mg directly,
    so a single large case is assembled AND solved without any device
    ever holding the full fine grid.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    ns = lambda *spec_: NamedSharding(mesh, P(*spec_))
    repl = ns()
    spec = _pad_spec_x(spec, mesh.shape[axis])
    # Host numpy -> device_put with the TARGET sharding directly:
    # staging through spec_device_arrays (plain jnp.asarray) would
    # commit every full fine-grid array to one device first, defeating
    # the whole no-device-holds-the-fine-grid contract.
    host = dict(
        h_axes=tuple(np.diff(np.asarray(a, np.float64)).astype(dtype)
                     for a in spec.axes),
        coords_dev=np.asarray(spec.coords_dev, dtype),
        body6=spec.body6,
        free=spec.free,
        dirichlet=np.asarray(spec.dirichlet, dtype),
        b_neumann=np.asarray(spec.b_neumann, dtype),
        grid_index=np.asarray(spec.grid_index, np.int32),
        sigma_table=np.asarray(spec.sigma_table, dtype),
    )
    shardings = dict(
        h_axes=(repl, repl, repl),
        coords_dev=ns(None, axis),
        # cell-axis length is X-1 (never divisible together with the
        # node axis); int8 and ~6 bytes/cell, so replicate and let the
        # partitioner slice it locally
        body6=repl,
        free=ns(axis),
        dirichlet=ns(axis),
        b_neumann=ns(axis),
        grid_index=repl,
        sigma_table=repl,
    )
    dev = jax.tree_util.tree_map(jax.device_put, host, shardings)

    # Memoized pjit per (mesh, lattice shape, dtype): a fresh jax.jit
    # wrapper per call would re-trace and remote-recompile (~30 s on
    # axon) every invocation (CLAUDE.md landmine).  The eval_shape must
    # run on the REAL sharded dev (not synthetic ShapeDtypeStructs):
    # the out_shardings hierarchy embeds the transfer closures produced
    # by _assemble_jit's trace, and only an inner-jit cache hit —
    # avals include shardings — makes the outer trace reuse those same
    # closure objects.
    key = (mesh, axis, _axes_static(spec), spec.n_bodies, min_nodes,
           max_levels, jnp.dtype(dtype).name, len(spec.grid_index))
    run = _SHARDED_FN_CACHE.get(key)
    if run is None:
        fn = partial(_assemble_jit, axes=key[2], n_bodies=spec.n_bodies,
                     min_nodes=min_nodes, max_levels=max_levels)
        _, hier_sh = jax.eval_shape(fn, dev)
        n_levels = len(hier_sh.levels)
        # out shardings: fine level x-sharded, coarse levels +
        # transfers replicated
        out_scase = StencilCase(
            coeff=ns(None, None, axis), free=ns(axis),
            dirichlet=ns(axis), b_neumann=ns(axis),
            grid_index=repl, sigma_table=repl)
        out_levels = tuple(
            MGLevel(coeff=ns(None, None, axis) if i == 0 else repl,
                    free=ns(axis) if i == 0 else repl)
            for i in range(n_levels))
        out_hier = MGHierarchy(levels=out_levels,
                               prolongs=hier_sh.prolongs,
                               restricts=hier_sh.restricts)
        run = jax.jit(fn, out_shardings=(out_scase, out_hier))
        _SHARDED_FN_CACHE[key] = run
    return run(dev)


_SHARDED_FN_CACHE: dict = {}


@partial(jax.jit, static_argnames=("axes", "n_bodies", "min_nodes",
                                   "max_levels"))
def _assemble_refined_jit(dev, *, axes, n_bodies, min_nodes=100,
                          max_levels=8):
    axes_np = tuple(np.asarray(a, float) for a in axes)
    coeff64 = lattice_coeff(dev["h_axes"], dev["coords_dev"],
                            dev["body6"], n_bodies)
    scase64 = StencilCase(coeff=coeff64, free=dev["free"],
                          dirichlet=dev["dirichlet"],
                          b_neumann=dev["b_neumann"],
                          grid_index=dev["grid_index"],
                          sigma_table=dev["sigma_table"])
    hier32 = _hierarchy_jnp(coeff64.astype(jnp.float32), dev["free"],
                            axes_np, min_nodes=min_nodes,
                            max_levels=max_levels)
    return scase64, hier32


def assemble_lattice_refined(spec: LatticeSpec, *, device_arrays=None,
                             min_nodes=100, max_levels=8):
    """(f64 StencilCase, f32 MGHierarchy) for certified refined sweeps.

    The split the refined solvers need: f64 master coefficients for
    residual certification + an f32-PROBED hierarchy (the inner
    preconditioner only has to be a good f32 V-cycle, and probing the
    megatet hierarchy in f64 overflows the XLA scatter's scoped-VMEM
    budget on the axon backend — measured 18.98M vs 16M at the 1.75M-tet
    grid).  Feeds batched_mg_solve_fused_refined / batched_mg_solve_refined
    directly; requires jax_enable_x64."""
    dev = device_arrays or spec_device_arrays(spec, jnp.float64)
    return _assemble_refined_jit(dev, axes=_axes_static(spec),
                                 n_bodies=spec.n_bodies,
                                 min_nodes=min_nodes,
                                 max_levels=max_levels)

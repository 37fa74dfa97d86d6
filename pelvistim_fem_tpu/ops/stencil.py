"""Structured 27-point stencil operator — the TPU-native fast path.

Every mesh this framework generates is a (graded, possibly carved and
deformed) tensor-product lattice, so the P1 stiffness matrix is exactly a
27-point stencil on the grid: K phi at node (i,j,k) only references
neighbors (i+di, j+dj, k+dk), di,dj,dk in {-1,0,1}.  Stored as 27
coefficient arrays, SpMV becomes 27 shifted multiply-adds — pure VPU
work, zero gather/scatter, bandwidth-bound at speed-of-light.  This is
the representation an unstructured CUDA/CSR port could never reach and
the core TPU-first design decision of this framework (vs the reference's
UMFPACK LU on Elmer's general sparse matrices).

Conductivity stays factored per body:  C(sigma) = sum_b sigma_b C_b,
so material sweeps (step04) combine coefficients with one einsum and
never re-assemble.

Carved lattice nodes (outside the geometry) have all-zero rows and are
held at 0 via the same projection used for Dirichlet nodes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.ops import assembly
from pelvistim_fem_tpu.ops.solve import SolveResult, jacobi_pcg

# Offset order: o = (dx+1)*9 + (dy+1)*3 + (dz+1);  o == 13 is the diagonal.
OFFSETS = [(dx, dy, dz)
           for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
DIAG_OFFSET = 13


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StencilCase:
    """Device-ready structured-operator problem instance."""
    coeff: jax.Array          # (n_bodies, 27, X, Y, Z) per-body stencils
    free: jax.Array           # (X, Y, Z) bool — solve dofs (active, not BC)
    dirichlet: jax.Array      # (X, Y, Z) prescribed values (0 elsewhere)
    b_neumann: jax.Array      # (X, Y, Z) load
    grid_index: jax.Array     # (N,) i32 — mesh node -> flat grid position
    sigma_table: jax.Array    # (n_bodies + 1,)

    @property
    def grid_shape(self):
        return self.free.shape


def assemble_stencil_coeffs(mesh, n_bodies: int) -> np.ndarray:
    """Host assembly of per-body stencil coefficients.

    Returns (n_bodies, 27, X, Y, Z) float64.  Each element's 4x4 stiffness
    (sans sigma) scatters into (offset-class, origin-node) slots; the
    offset between two lattice nodes of one Kuhn tet is always in
    {-1,0,1}^3 (cite: Kuhn cells span one lattice cell —
    mesh/generate.py)."""
    lat = mesh.lattice
    if lat is None:
        raise ValueError("mesh has no lattice provenance; use the "
                         "element-based operator instead")
    X, Y, Z = lat.grid_shape
    G = X * Y * Z

    grads, vol = mesh.geometry()
    gidx = lat.grid_index[mesh.tets]                     # (M, 4) flat grid
    body0 = (mesh.tet_body.astype(np.int32) - 1)          # 0-based
    from pelvistim_fem_tpu import native
    out = native.accumulate_stencil_from_grads(gidx, grads, vol, body0,
                                               G, Y, Z, n_bodies)
    return out.reshape(n_bodies, 27, X, Y, Z)


def stencil_host_data(case, mesh):
    """Host-side (numpy) stencil problem data: per-body coefficient
    stacks + grid BC arrays.  Shared by build_stencil_case and the
    multigrid hierarchy builder so nothing is ever read back from device
    (bool-array readbacks take minutes on the axon TPU backend)."""
    from pelvistim_fem_tpu.models.case import compute_bc_host

    lat = mesh.lattice
    X, Y, Z = lat.grid_shape
    n_bodies = int(case.meta.n_bodies)
    coeff = assemble_stencil_coeffs(mesh, n_bodies)
    free_n, diri_n, b_n, _, _, _ = compute_bc_host(
        mesh, mode=case.meta.mode, active_V=case.meta.active_V,
        injected_current_A=case.meta.I_target_A)

    def to_grid(vec, fill=0.0, dt=None):
        g = np.full(X * Y * Z, fill, dt or np.float64)
        g[lat.grid_index] = np.asarray(vec)
        return g.reshape(X, Y, Z)

    return dict(
        coeff=coeff,
        free=to_grid(free_n, fill=False, dt=bool),
        dirichlet=to_grid(diri_n),
        b_neumann=to_grid(b_n),
        grid_index=lat.grid_index,
        sigma_table=np.asarray(case.meta.sigma_table_host),
        axes=lat.axes,
    )


def _ship_coeff(coeff_np, dtype):
    """Device transfer of the per-body coefficient stacks, shipping only
    each body's nonzero z-slab.

    The conductivity bodies are (mostly) z-layers, so body b's stack is
    zero outside its layer's knot span — on the megatet case the slabs
    total ~26% of the full (B, 27, X, Y, Z) bytes, and the axon tunnel
    (~75 MB/s) makes transfer the assemble bottleneck.  Falls back to a
    full-stack transfer when slabs wouldn't save anything (e.g. the
    pelvis model's interleaved tissues)."""
    B = coeff_np.shape[0]
    spans = []
    total = 0
    for b in range(B):
        nz = np.flatnonzero(np.abs(coeff_np[b]).sum(axis=(0, 1, 2)))
        z0, z1 = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, 0)
        spans.append((z0, z1))
        total += z1 - z0
    if total >= 0.75 * B * coeff_np.shape[-1]:
        return jnp.asarray(np.asarray(coeff_np, dtype))
    chunks = [np.asarray(coeff_np[b, ..., z0:z1], dtype)
              for b, (z0, z1) in enumerate(spans)]
    return _assemble_slabs(tuple(chunks), shape=coeff_np.shape,
                           spans=tuple(spans))


@partial(jax.jit, static_argnames=("shape", "spans"))
def _assemble_slabs(chunks, shape, spans):
    # module-level jit: a per-call closure would re-trace (and pay an
    # axon remote recompile) on every build_stencil_case call
    out = jnp.zeros(shape, chunks[0].dtype)
    for b, (z0, z1) in enumerate(spans):
        out = out.at[b, ..., z0:z1].set(chunks[b])
    return out


def build_stencil_case(case, mesh, dtype=None, sigma_table_host=None,
                       host_data=None) -> StencilCase:
    """Lift an assembled Case (BCs, loads, materials) onto the lattice."""
    hd = host_data or stencil_host_data(case, mesh)
    dtype = dtype or case.nodes.dtype
    if sigma_table_host is None:
        sigma_table_host = hd["sigma_table"]
    return StencilCase(
        # host-side cast + per-body z-slab transfer: shipping the full
        # f64 stack over the axon tunnel dominated megatet assembly
        coeff=_ship_coeff(hd["coeff"], dtype),
        free=jnp.asarray(hd["free"]),
        dirichlet=jnp.asarray(hd["dirichlet"], dtype),
        b_neumann=jnp.asarray(hd["b_neumann"], dtype),
        grid_index=jnp.asarray(hd["grid_index"], jnp.int32),
        sigma_table=jnp.asarray(sigma_table_host, dtype),
    )


def combine_coeffs(coeff, sigma_table):
    """C(sigma) = sum_b sigma_b C_b  ->  (27, X, Y, Z).

    precision=HIGHEST is load-bearing: under vmap this contraction lowers
    to an MXU matmul whose default f32 precision is bf16-based; a ~0.4%
    coefficient perturbation on a kappa ~ 1e6 system yields O(1) solution
    error WITH a converged residual (observed on TPU before this fix).

    B == 1 fast path: pre-combined stacks (single-sigma solves on huge
    grids, e.g. the pelvis stretch case) take a pure elementwise scale —
    the einsum's unreduced (B, 27, G) intermediate OOMed 16 GB of HBM
    at 1.19M nodes x 7 bodies in emulated f64 (13.8 GB padded temp).
    The fast path only engages when the sigma table matches the B==1
    stack (length 2); a stale full-length table paired with a
    pre-combined stack falls through to the einsum, which raises the
    shape mismatch instead of silently scaling by sigma_table[1].
    """
    if coeff.shape[0] == 1 and sigma_table.shape[-1] == 2:
        return coeff[0] * sigma_table[1]
    return jnp.einsum("b,bo...->o...", sigma_table[1:], coeff,
                      precision=jax.lax.Precision.HIGHEST)


def stencil_spmv(x, C):
    """y = K x via 27 shifted multiply-adds.  x (X, Y, Z), C (27, X, Y, Z).

    Shifts use static slices of a 1-padded copy — XLA fuses the whole
    expression into one elementwise kernel; no dynamic addressing.
    """
    X, Y, Z = x.shape
    xp = jnp.pad(x, 1)
    y = jnp.zeros_like(x)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        shifted = jax.lax.slice(
            xp, (1 + dx, 1 + dy, 1 + dz), (1 + dx + X, 1 + dy + Y, 1 + dz + Z))
        y = y + C[o] * shifted
    return y


def _use_pallas() -> bool:
    """Opt-in Pallas SpMV kernel (PELVISTIM_USE_PALLAS=1).  The XLA
    fusion is the default; the Pallas kernel pins the row-pipelined
    schedule explicitly (ops/pallas_stencil.py)."""
    import os
    return os.environ.get("PELVISTIM_USE_PALLAS", "0") == "1" and \
        jax.devices()[0].platform != "cpu"


def _operator(scase, sigma_table, coeff=None, spmv=None):
    """(op, diag, b_eff) for the stencil system.

    spmv: None (honor PELVISTIM_USE_PALLAS), "xla", "pallas", or
    "flat" — the lane-packed flat-layout Pallas kernel
    (pallas_stencil.stencil_spmv_flat; 1.36x faster megatet MG
    iterations on v5e).  "flat" packs the combined coefficients once
    at operator construction, outside any solver loop."""
    C = combine_coeffs(scase.coeff if coeff is None else coeff,
                       sigma_table)
    free = scase.free
    if spmv is None:
        spmv = "pallas" if _use_pallas() else "xla"

    if spmv == "flat":
        from pelvistim_fem_tpu.ops.pallas_stencil import (
            pack_coeff_flat, stencil_spmv_flat)
        Cf = pack_coeff_flat(C)

        def raw(x):
            return stencil_spmv_flat(x, Cf)
    elif spmv == "pallas":
        from pelvistim_fem_tpu.ops.pallas_stencil import \
            stencil_spmv_pallas

        def raw(x):
            return stencil_spmv_pallas(x, C)
    else:
        def raw(x):
            return stencil_spmv(x, C)

    def op(x):
        return jnp.where(free, raw(jnp.where(free, x, 0.0)), x)

    diag = jnp.where(free, C[DIAG_OFFSET], 1.0)
    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    b_eff = jnp.where(free, scase.b_neumann - raw(phi_d), scase.dirichlet)
    return op, diag, b_eff


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve_stencil(scase: StencilCase, sigma_table=None, coeff=None, *,
                  tol=1e-8, maxiter=10_000) -> SolveResult:
    """Jacobi-PCG on the stencil operator; phi returned in MESH NODE
    ordering (gathered off the grid) for drop-in parity with solve_case.

    `coeff` overrides the per-body coefficient stack — the lever for
    geometry-batched sweeps where cases share a lattice but differ in
    body assignment (parallel/geometry_sweep.py)."""
    if sigma_table is None:
        sigma_table = scase.sigma_table
    op, diag, b_eff = _operator(scase, sigma_table, coeff)
    x0 = jnp.where(scase.free, 0.0, scase.dirichlet)
    res = jacobi_pcg(op, b_eff, diag, x0, tol=tol, maxiter=maxiter)
    phi_nodes = res.phi.reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=res.iterations,
                       residual=res.residual, converged=res.converged)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def batched_stencil_solve(scase: StencilCase, sigma_tables, *, tol=1e-8,
                          maxiter=10_000):
    """vmapped material sweep on the stencil operator (step04 fast path)."""
    return jax.vmap(
        lambda s: solve_stencil(scase, s, tol=tol, maxiter=maxiter)
    )(sigma_tables)


def batched_stencil_spmv_fused(X, coeff, sigma_tables):
    """Lane-stacked SpMV with body-factored coefficients:

        Y[l] = sum_b sigma[l, b] * (C_b * shift(X[l]))

    The per-body stencils C_b are read once per matvec and broadcast
    over all L lanes — no per-lane (27, G) combined-coefficient block
    exists, so peak memory is O(L*G + B*27*G) instead of O(L*27*G).

    Measured on TPU v5e at L=100, G=33k: ~3.5x SLOWER than the vmapped
    batched_stencil_solve (XLA materializes the broadcast intermediates,
    while the vmapped path streams its per-lane coefficients at ~700
    GB/s — bandwidth speed-of-light for its traffic).  Use this variant
    when the vmapped path's L*27*G coefficient storage would not fit
    (wide sweeps on megatet grids); a Pallas fusion of the 135
    multiply-adds is the round-2 path to beating both.

    X (L, Xg, Yg, Zg); coeff (B, 27, Xg, Yg, Zg); sigma_tables (L, T)
    with body b at index b+1.
    """
    L = X.shape[0]
    G3 = X.shape[1:]
    B = coeff.shape[0]
    Xp = jnp.pad(X, ((0, 0), (1, 1), (1, 1), (1, 1)))
    sig = sigma_tables[:, 1:1 + B]                   # (L, B)
    Y = jnp.zeros_like(X)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        shifted = jax.lax.slice(
            Xp, (0, 1 + dx, 1 + dy, 1 + dz),
            (L, 1 + dx + G3[0], 1 + dy + G3[1], 1 + dz + G3[2]))
        # sum_b sigma[l,b] C_b[o] -> per-lane coefficient, computed as
        # B fused broadcasts (no (L, G) coefficient materialization).
        acc = jnp.zeros_like(X)
        for b in range(B):
            acc = acc + sig[:, b, None, None, None] * coeff[b, o]
        Y = Y + acc * shifted
    return Y


@partial(jax.jit, static_argnames=("tol", "maxiter", "use_pallas"))
def batched_stencil_solve_fused(scase: StencilCase, sigma_tables, *,
                                tol=1e-8, maxiter=10_000,
                                use_pallas=None):
    """Material sweep as ONE lane-stacked CG with the body-factored
    fused SpMV (see batched_stencil_spmv_fused).  Functionally equal to
    batched_stencil_solve (bit-identical lanes); use when per-lane
    combined coefficients would exhaust memory.

    use_pallas=True routes the matvec through the Pallas row kernel
    (ops/pallas_stencil.batched_stencil_spmv_fused_pallas — the
    135-multiply-add body-factored kernel); None defers to the
    PELVISTIM_USE_PALLAS env switch."""
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas:
        # The axon AOT lowering charges pallas operands against scoped
        # VMEM far beyond their block footprints: megatet-scale operand
        # sets fail to compile at ANY lane count (measured: L=4 with an
        # 84 MB operand set rejected at a 100 MB limit).  Guard to the
        # envelope that compiles and runs (~46 MB operands, the step04
        # full-res class); larger problems use the XLA formulation.
        L = sigma_tables.shape[0]
        B = scase.coeff.shape[0]
        X, Y, Z = scase.grid_shape
        operand_bytes = 4 * ((X + 2) * (Y + 2) * (Z + 2) * L
                             + B * 27 * X * Y * Z + X * Y * Z * L)
        if operand_bytes <= 60 * 1024 * 1024:
            return _batched_solve_fused_lminor(scase, sigma_tables,
                                               tol=tol, maxiter=maxiter)
    _spmv_fused = batched_stencil_spmv_fused
    L = sigma_tables.shape[0]
    free = scase.free
    freeb = free[None]

    def op(Xs):
        Xm = jnp.where(freeb, Xs, 0.0)
        Ys = _spmv_fused(Xm, scase.coeff, sigma_tables)
        return jnp.where(freeb, Ys, Xs)

    # per-lane diagonal & rhs
    diag_l = jnp.einsum(
        "lb,bxyz->lxyz", sigma_tables[:, 1:1 + scase.coeff.shape[0]],
        scase.coeff[:, DIAG_OFFSET],
        precision=jax.lax.Precision.HIGHEST)
    diag = jnp.where(freeb, diag_l, 1.0)
    phi_d = jnp.where(free, 0.0, scase.dirichlet)
    Kphi_d = _spmv_fused(
        jnp.broadcast_to(phi_d, (L,) + phi_d.shape), scase.coeff,
        sigma_tables)
    b_eff = jnp.where(freeb, scase.b_neumann[None] - Kphi_d,
                      scase.dirichlet[None])
    x0 = jnp.broadcast_to(jnp.where(free, 0.0, scase.dirichlet),
                          b_eff.shape)

    # lane-aware PCG: dots reduce over grid axes only
    red = lambda a: jnp.sum(a, axis=(1, 2, 3))
    dot = lambda a, b: red(a * b)
    nrm = lambda a: jnp.sqrt(red(a * a))
    ex = lambda v: v[:, None, None, None]

    minv = jnp.where(diag > 0, 1.0 / diag, 1.0)
    bnorm = nrm(b_eff)
    tol_abs = tol * bnorm

    r0 = b_eff - op(x0)
    z0 = minv * r0
    rz0 = dot(r0, z0)
    done0 = nrm(r0) <= tol_abs
    state0 = (x0, r0, z0, rz0, z0, jnp.zeros(L, jnp.int32), done0)

    def cond(state):
        *_, k, done = state
        return jnp.any(~done & (k < maxiter))

    def body(state):
        x, r, z, rz, p, k, done = state
        ap = op(p)
        alpha = rz / dot(p, ap)
        x_n = x + ex(alpha) * p
        r_n = r - ex(alpha) * ap
        z_n = minv * r_n
        rz_n = dot(r_n, z_n)
        beta = rz_n / rz
        p_n = z_n + ex(beta) * p
        sel = lambda new, old: jnp.where(ex(done), old, new)
        sel0 = lambda new, old: jnp.where(done, old, new)
        x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
        rz, p = sel0(rz_n, rz), sel(p_n, p)
        k = sel0(k + 1, k)
        done = done | (nrm(r) <= tol_abs)
        return (x, r, z, rz, p, k, done)

    x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
    rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
    phi_nodes = x.reshape(L, -1)[:, scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _batched_solve_fused_lminor(scase: StencilCase, sigma_tables, *,
                                tol=1e-8, maxiter=10_000):
    """Lane-MINOR fused material sweep: the whole CG runs on
    (X, Y, Z, L) arrays with the sweep-lane axis on the TPU's 128-wide
    vector minor dimension, and the matvec is the Pallas body-factored
    kernel (ops/pallas_stencil.batched_stencil_spmv_fused_lminor).
    Memory O(L*G + B*27*G) — no per-lane combined coefficients — while
    every elementwise op vectorizes over lanes.  Lanes freeze on
    convergence (same contract as batched_stencil_solve)."""
    from pelvistim_fem_tpu.ops.pallas_stencil import \
        batched_stencil_spmv_fused_lminor

    L = sigma_tables.shape[0]
    B = scase.coeff.shape[0]
    sig = jnp.transpose(sigma_tables[:, 1:1 + B])          # (B, L)
    free = scase.free[..., None]                           # (X, Y, Z, 1)

    def op(Xs):
        Xm = jnp.where(free, Xs, 0.0)
        Ys = batched_stencil_spmv_fused_lminor(Xm, scase.coeff, sig)
        return jnp.where(free, Ys, Xs)

    diag_l = jnp.einsum("bl,bxyz->xyzl", sig,
                        scase.coeff[:, DIAG_OFFSET],
                        precision=jax.lax.Precision.HIGHEST)
    diag = jnp.where(free, diag_l, 1.0)
    phi_d = jnp.where(scase.free, 0.0, scase.dirichlet)[..., None]
    Kphi_d = batched_stencil_spmv_fused_lminor(
        jnp.broadcast_to(phi_d, phi_d.shape[:3] + (L,)), scase.coeff,
        sig)
    b_eff = jnp.where(free, scase.b_neumann[..., None] - Kphi_d,
                      jnp.broadcast_to(scase.dirichlet[..., None],
                                       Kphi_d.shape))
    x0 = jnp.broadcast_to(phi_d, b_eff.shape)

    red = lambda a: jnp.sum(a, axis=(0, 1, 2))             # -> (L,)
    dot = lambda a, b: red(a * b)
    nrm = lambda a: jnp.sqrt(red(a * a))
    ex = lambda v: v[None, None, None, :]

    minv = jnp.where(diag > 0, 1.0 / diag, 1.0)
    bnorm = nrm(b_eff)
    tol_abs = tol * bnorm

    r0 = b_eff - op(x0)
    z0 = minv * r0
    rz0 = dot(r0, z0)
    done0 = nrm(r0) <= tol_abs
    state0 = (x0, r0, z0, rz0, z0, jnp.zeros(L, jnp.int32), done0)

    def cond(state):
        *_, k, done = state
        return jnp.any(~done & (k < maxiter))

    def body(state):
        x, r, z, rz, p, k, done = state
        ap = op(p)
        alpha = rz / dot(p, ap)
        x_n = x + ex(alpha) * p
        r_n = r - ex(alpha) * ap
        z_n = minv * r_n
        rz_n = dot(r_n, z_n)
        beta = rz_n / rz
        p_n = z_n + ex(beta) * p
        sel = lambda new, old: jnp.where(ex(done), old, new)
        sel0 = lambda new, old: jnp.where(done, old, new)
        x, r, z = sel(x_n, x), sel(r_n, r), sel(z_n, z)
        rz, p = sel0(rz_n, rz), sel(p_n, p)
        k = sel0(k + 1, k)
        done = done | (nrm(r) <= tol_abs)
        return (x, r, z, rz, p, k, done)

    x, r, *_, k, _ = jax.lax.while_loop(cond, body, state0)
    rel = nrm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
    phi_nodes = jnp.transpose(
        x.reshape(-1, L)[scase.grid_index])                # (L, N)
    return SolveResult(phi=phi_nodes, iterations=k, residual=rel,
                       converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def batched_geometry_solve(scase: StencilCase, coeff_stack, sigma_tables,
                           *, tol=1e-8, maxiter=10_000):
    """Batch over GEOMETRY variations on a shared lattice.

    coeff_stack (S, n_bodies, 27, X, Y, Z): per-case coefficient stacks
    (e.g. different fat thicknesses reassigning lattice cells between
    bodies); sigma_tables (S, T).  BCs/loads are shared (same electrode
    placement).  The TPU-native form of the reference's geometry-varying
    step03 sweep loop (run_layered_sweep.py:1061-1124).
    """
    return jax.vmap(
        lambda C, s: solve_stencil(scase, s, C, tol=tol, maxiter=maxiter)
    )(coeff_stack, sigma_tables)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter",
                                   "max_refinements"))
def solve_stencil_refined(scase: StencilCase, sigma_table=None,
                          coeff=None, *, tol=1e-8, inner_tol=1e-6,
                          maxiter=10_000,
                          max_refinements=6) -> SolveResult:
    """Mixed-precision stencil solve: f32 CG inner sweeps, f64 residual
    correction until the f64 relative residual meets `tol` (requires
    jax_enable_x64; on TPU the f64 work is a handful of emulated SpMVs
    per refinement).  phi returned in mesh node ordering.

    `coeff` overrides the per-body coefficient stack (geometry-batched
    sweeps — see solve_stencil).  Under vmap, converged lanes FREEZE
    (carry unchanged) so extra refinements of unfinished lanes cannot
    perturb finished ones."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("solve_stencil_refined")
    if sigma_table is None:
        sigma_table = scase.sigma_table
    to = lambda a, dt: jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, a)
    sc64, sc32 = to(scase, jnp.float64), to(scase, jnp.float32)
    c64 = None if coeff is None else coeff.astype(jnp.float64)
    c32 = None if coeff is None else coeff.astype(jnp.float32)
    op64, _, b64 = _operator(sc64, sigma_table.astype(jnp.float64), c64)
    op32, diag32, _ = _operator(sc32, sigma_table.astype(jnp.float32),
                                c32)

    bnorm = jnp.sqrt(jnp.sum(b64 * b64))
    x = jnp.where(scase.free, 0.0, sc64.dirichlet)

    def refine(carry):
        x, rel_old, total_it, k = carry
        done = rel_old <= tol
        r64 = b64 - op64(x)
        # Adaptive inner tolerance: a pass starting at true rel_old only
        # needs a tol/rel_old reduction (x4 safety), not the full
        # inner_tol sweep — pass 1 (rel_old=inf) clips to inner_tol.
        tol_k = jnp.clip(0.25 * tol / jnp.minimum(rel_old, 1.0),
                         inner_tol, 0.05)
        res = jacobi_pcg(op32, r64.astype(jnp.float32), diag32,
                         jnp.zeros_like(r64, jnp.float32),
                         tol=tol_k, maxiter=maxiter)
        x_n = x + res.phi.astype(jnp.float64)
        rel_n = jnp.sqrt(jnp.sum((b64 - op64(x_n)) ** 2)) / jnp.where(
            bnorm > 0, bnorm, 1.0)
        sel = lambda new, old: jnp.where(done, old, new)
        return (sel(x_n, x), sel(rel_n, rel_old),
                sel(total_it + res.iterations, total_it), k + 1)

    def cond(carry):
        _, rel, _, k = carry
        return (rel > tol) & (k < max_refinements)

    x, rel, total_it, _ = jax.lax.while_loop(
        cond, refine, (x, jnp.float64(jnp.inf), jnp.int32(0),
                       jnp.int32(0)))
    phi_nodes = x.reshape(-1)[scase.grid_index]
    return SolveResult(phi=phi_nodes, iterations=total_it, residual=rel,
                       converged=rel <= tol)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter",
                                   "max_refinements"))
def batched_geometry_solve_refined(scase: StencilCase, coeff_stack,
                                   sigma_tables, *, tol=1e-8,
                                   inner_tol=1e-6, maxiter=10_000,
                                   max_refinements=6):
    """Geometry-batched sweep at the FULL reference tolerance: one
    vmapped mixed-precision refined solve per lane.  This is how the
    step03 --batch path honors the same 1e-8 contract as the serial
    path (params.yaml:92) on TPU, where plain f32 CG caps near 1e-6."""
    return jax.vmap(
        lambda C, s: solve_stencil_refined(
            scase, s, C, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
            max_refinements=max_refinements)
    )(coeff_stack, sigma_tables)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def batched_case_solve(stacked: StencilCase, *, tol=1e-8,
                       maxiter=10_000):
    """Batch over WHOLE heterogeneous cases padded onto one grid.

    `stacked` is a StencilCase whose every leaf carries a leading case
    axis S (parallel/geometry_sweep.build_padded_group): per-case
    coefficients AND per-case BC grids, so cases may differ in lattice,
    boundary conditions and materials — the fully general TPU-native
    form of the reference's geometry-varying sweep loops (step02
    run_sweep.py:299-341).  Padded planes are inert (non-free, zero
    coefficients/loads), so each lane solves exactly its serial
    operator (matching to solver tolerance; vmap only changes the
    dot-product reduction order).  phi returns in per-lane flat padded-
    grid ordering (grid_index = arange)."""
    return jax.vmap(
        lambda sc: solve_stencil(sc, tol=tol, maxiter=maxiter))(stacked)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter",
                                   "max_refinements"))
def batched_case_solve_refined(stacked: StencilCase, *, tol=1e-8,
                               inner_tol=1e-6, maxiter=10_000,
                               max_refinements=6):
    """batched_case_solve at the certified tolerance: one vmapped
    mixed-precision refined solve per heterogeneous case (converged
    lanes freeze)."""
    return jax.vmap(
        lambda sc: solve_stencil_refined(
            sc, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
            max_refinements=max_refinements))(stacked)

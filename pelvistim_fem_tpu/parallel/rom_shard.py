"""Sharded certified reduced-basis sweeps: lean ROM x domain decomposition.

The lean ROM (ops/rom.py) already avoids the (B, cap, G) applied basis;
this module removes the last per-device O(cap * G) object too.  The
basis lives in HOST memory (numpy), the reduced r x r algebra runs on
host (it is tiny), and the only device work is the per-lane TRUE
full-operator residual certificate — computed with the SAME x-slab
halo-SpMV decomposition the sharded solvers use (stencil_shard._halo_spmv),
so no device ever holds the (cap, G) basis or an (L, G) reconstruction:
per-chip residency is O((cap + L) * G / n_devices).  Snapshots come from
`sharded_stencil_solve_mg_refined` (certified TRUE-f64 1e-8 across the
mesh, reference contract step03 params.yaml:92).

This is the composition SCALING.md's memory ladder calls for: a case
too large for one chip gets BOTH its full solves and its reduced-sweep
certificates on the decomposition, while the greedy economy (~rank full
solves certify any lane count on a 1-D material family) is unchanged.

Like the other shard_map entry points here, the certificate program is
staged per call — fine for the few greedy rounds a sweep needs (and for
the virtual-device meshes tests/dryrun run on); it is NOT a per-lane
hot loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pelvistim_fem_tpu.ops.rom import _apply_bodies, _free_parts
from pelvistim_fem_tpu.ops.stencil import StencilCase
from pelvistim_fem_tpu.parallel.stencil_shard import _halo_spmv

__all__ = ["HostROM", "build_host_rom", "host_rom_extend",
           "rom_eval_sharded", "certificate_sharded",
           "rom_sweep_refined_sharded"]

_HP = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class HostROM:
    """Fixed-capacity reduced basis held on HOST (numpy, f64).

    Same layout contract as ops/rom.StencilROM minus W: rows >= rank
    are zero; the reduced system gets an identity diagonal on padded
    slots so their components solve to exactly 0."""
    V: np.ndarray          # (cap, G) orthonormal free-masked basis
    VtW: np.ndarray        # (B, cap, cap) reduced per-body operators
    b0: np.ndarray         # (G,) free-masked Neumann load
    bb: np.ndarray         # (B, G) per-body Dirichlet-lift loads
    r0: np.ndarray         # (cap,)  V b0
    rb: np.ndarray         # (B, cap) V bb
    dir2: float            # ||dirichlet slots||^2 (denominator part)
    rank: int

    @property
    def capacity(self):
        return self.V.shape[0]


def build_host_rom(scase: StencilCase, capacity: int = 40) -> HostROM:
    """Empty rank-0 host ROM with the affine load blocks precomputed
    (one device pass for the per-body Dirichlet lifts, then host)."""
    b0, bb, dir2 = _free_parts(scase)
    G = int(np.prod(scase.free.shape))
    B = scase.coeff.shape[0]
    cap = int(capacity)
    return HostROM(
        V=np.zeros((cap, G)), VtW=np.zeros((B, cap, cap)),
        b0=np.asarray(b0), bb=np.asarray(bb),
        r0=np.zeros(cap), rb=np.zeros((B, cap)),
        dir2=float(np.asarray(dir2)), rank=0)


def host_rom_extend(rom: HostROM, scase: StencilCase, phi_nodes,
                    drop_tol: float = 1e-12) -> HostROM:
    """Orthonormalize a full-solve snapshot (mesh-node order) against
    the live basis (2-pass MGS) and append; incremental symmetric VtW
    update from the TRANSIENT per-body applies, exactly like
    ops/rom._insert_row_lean but with host-resident state.

    drop_tol: relative remainder norm below which the snapshot counts
    as in-span.  Deliberately tiny by default, like ops/rom.rom_extend:
    near-noise directions sometimes help and sometimes hurt, so the
    greedy loop guards with best-state tracking/revert instead of a
    threshold here."""
    if rom.rank >= rom.capacity:
        return rom
    G = rom.V.shape[1]
    gi = np.asarray(scase.grid_index)
    fr = np.asarray(scase.free).reshape(-1)
    v = np.zeros(G)
    v[gi] = np.asarray(phi_nodes, np.float64)
    v = np.where(fr, v, 0.0)
    nv0 = float(np.linalg.norm(v))
    k = rom.rank
    if k:
        Vh = rom.V[:k]
        for _ in range(2):
            v = v - Vh.T @ (Vh @ v)
    nv = float(np.linalg.norm(v))
    if nv < drop_tol * max(1.0, nv0):
        return rom                      # snapshot already in the span
    v = v / nv
    w = np.asarray(_apply_bodies(scase, jnp.asarray(v)))   # (B, G)
    V = rom.V.copy()
    V[k] = v
    col = V @ w.T                        # (cap, B)
    VtW = rom.VtW.copy()
    VtW[:, :, k] = col.T
    VtW[:, k, :] = col.T                 # symmetry of C_b
    return dataclasses.replace(
        rom, V=V, VtW=VtW, r0=V @ rom.b0, rb=rom.bb @ V.T, rank=k + 1)


def _host_reduced_solve(rom: HostROM, tables):
    """Host r x r solves: y (L, cap) with exact zeros on padded slots.

    Jacobi-equilibrated + one iterative-refinement pass, mirroring
    ops/rom._reduced_solve: the reduced diagonal inherits the sweep's
    decade span, and the resulting kappa * eps backward error FLOORS
    the N-vector certificate near 1e-8 at megatet scale if left raw."""
    s = np.asarray(tables, np.float64)[:, 1:]            # (L, B)
    pad = (np.arange(rom.capacity) >= rom.rank)
    A = np.einsum("lb,brs->lrs", s, rom.VtW) + np.diag(
        pad.astype(np.float64))[None]
    rhs = rom.r0[None] + s @ rom.rb                      # (L, cap)
    d = np.sqrt(np.maximum(
        np.abs(np.diagonal(A, axis1=-2, axis2=-1)), 1e-300))
    As = A / (d[:, :, None] * d[:, None, :])
    bs = rhs / d
    y = np.linalg.solve(As, bs[..., None])[..., 0]
    r = bs - np.einsum("lrs,ls->lr", As, y)
    y = y + np.linalg.solve(As, r[..., None])[..., 0]
    return y / d, s


def rom_eval_sharded(rom: HostROM, scase: StencilCase, tables,
                     mesh: Mesh, *, axis: str = "x"):
    """(y (L, cap) host, TRUE rel residual (L,) host) with the
    certificate computed on the x-slab decomposition: each device
    reconstructs only ITS slab of each lane's field from its slab of
    the basis and applies the per-body stencils with halo exchange —
    the same relative-residual definition as the refined solvers."""
    y, s = _host_reduced_solve(rom, tables)
    return y, certificate_sharded(rom, scase, y, s, mesh, axis=axis)


def certificate_sharded(rom: HostROM, scase: StencilCase, y, s,
                        mesh: Mesh, *, axis: str = "x"):
    """TRUE full-operator relative residuals (L,) for given reduced
    coordinates y (L, cap) and body weights s (L, B), contracted on the
    x-slab decomposition."""
    n_dev = mesh.shape[axis]
    X, Y, Z = scase.free.shape
    Xp = -(-X // n_dev) * n_dev
    pad = Xp - X

    def pax(a, ax):
        if pad == 0:
            return a
        cfg = [(0, 0)] * a.ndim
        cfg[ax] = (0, pad)
        return np.pad(a, cfg)

    # Host grid-shaped, x-padded operands (padded planes: free=False,
    # zero loads/coefficients — inert under the masked apply).
    Vg = pax(rom.V.reshape(-1, X, Y, Z), 1)
    b0g = pax(rom.b0.reshape(X, Y, Z), 0)
    bbg = pax(rom.bb.reshape(-1, X, Y, Z), 1)
    coeff = pax(np.asarray(scase.coeff, np.float64), 2)   # (B, 27, Xp, Y, Z)
    free = pax(np.asarray(scase.free), 0)

    B = coeff.shape[0]

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(None, axis), P(axis), P(None, axis),
                       P(None, None, axis), P(axis), P(), P()),
             out_specs=(P(), P()))
    def cert(V_l, b0_l, bb_l, C_l, free_l, y_d, s_d):
        # slab reconstruction: (L, Xl, Y, Z) — only this device's part
        Xf = jnp.einsum("lr,rxyz->lxyz", y_d, V_l, precision=_HP)
        bf = b0_l[None] + jnp.einsum("lb,bxyz->lxyz", s_d, bb_l,
                                     precision=_HP)
        acc = jnp.zeros_like(Xf)
        for b in range(B):
            ap = jax.vmap(lambda xg: _halo_spmv(xg, C_l[b], axis))(Xf)
            ap = jnp.where(free_l[None], ap, 0.0)
            acc = acc + s_d[:, b, None, None, None] * ap
        rvec = bf - acc
        num2 = jax.lax.psum(jnp.sum(rvec * rvec, axis=(1, 2, 3)), axis)
        den2 = jax.lax.psum(jnp.sum(bf * bf, axis=(1, 2, 3)), axis)
        return num2, den2

    num2, den2 = cert(jnp.asarray(Vg), jnp.asarray(b0g),
                      jnp.asarray(bbg), jnp.asarray(coeff),
                      jnp.asarray(free), jnp.asarray(y),
                      jnp.asarray(s))
    num2 = np.asarray(num2)
    den2 = np.asarray(den2) + rom.dir2
    return np.sqrt(num2) / np.maximum(np.sqrt(den2), 1e-300)


def _host_reconstruct(rom: HostROM, scase: StencilCase, y):
    """(L, N) mesh-node-order fields from host basis + host y."""
    gi = np.asarray(scase.grid_index)
    fr = np.asarray(scase.free).reshape(-1)
    d = np.asarray(scase.dirichlet, np.float64).reshape(-1)
    xg = np.where(fr[None], y @ rom.V, d[None])
    return xg[:, gi]


def rom_sweep_refined_sharded(scase: StencilCase, hier, tables,
                              mesh: Mesh, *, axis: str = "x",
                              tol: float = 1e-8, max_snapshots: int = 40,
                              verbose: bool = False):
    """Greedy certified sweep on the domain decomposition: full solves
    via sharded_stencil_solve_mg_refined, certificates via
    rom_eval_sharded; any lane the basis cannot certify is full-solved
    directly, so the certificate is unconditional.

    Returns dict: phi (L, N) mesh-order (host), residual (L,) TRUE rel
    residuals (all <= tol on success), rom (HostROM), n_full,
    converged — same contract as ops/rom.rom_sweep_refined.
    """
    from pelvistim_fem_tpu.ops.solve import require_x64
    from pelvistim_fem_tpu.parallel.stencil_shard import \
        sharded_stencil_solve_mg_refined
    require_x64("rom_sweep_refined_sharded")
    tabs = np.atleast_2d(np.asarray(tables, np.float64))

    def full_solve(t):
        r = sharded_stencil_solve_mg_refined(
            scase, hier, mesh, axis=axis,
            sigma_table=jnp.asarray(t, jnp.float64), tol=tol)
        assert bool(np.asarray(r.converged))
        return r

    rom = build_host_rom(scase, max_snapshots)
    rom = host_rom_extend(rom, scase, full_solve(tabs[0]).phi)
    n_full = 1
    best, stall = None, 0
    while True:
        y, rel = rom_eval_sharded(rom, scase, tabs, mesh, axis=axis)
        worst = int(np.argmax(rel))
        if verbose:
            print(f"  [rom-sharded] rank {rom.rank}: certified "
                  f"{(rel <= tol).sum()}/{len(rel)} lanes, "
                  f"worst {rel[worst]:.2e}", flush=True)
        # best-state tracking/revert, like ops/rom.rom_sweep_refined:
        # near-noise directions at hard conditioning can DEGRADE
        # certification, and here every uncertified lane costs a cold
        # sharded full solve
        score = (int((rel <= tol).sum()), -float(rel[worst]))
        if best is None or score > best[0]:
            best, stall = (score, y, rel, rom), 0
        else:
            stall += 1
        if rel[worst] <= tol or rom.rank >= rom.capacity or stall >= 2:
            break
        rank_before = rom.rank
        rom = host_rom_extend(rom, scase, full_solve(tabs[worst]).phi)
        n_full += 1
        if rom.rank == rank_before:     # span stalled: cannot improve
            break

    _, y, rel, rom = best
    rel = np.array(rel)                 # writable for fallback lanes
    phi = _host_reconstruct(rom, scase, y)
    for i in np.flatnonzero(rel > tol):
        r = full_solve(tabs[i])
        n_full += 1
        phi[i] = np.asarray(r.phi)
        rel[i] = float(np.asarray(r.residual))
    return {"phi": phi, "y": y, "residual": rel, "rom": rom,
            "n_full": n_full, "converged": bool((rel <= tol).all())}

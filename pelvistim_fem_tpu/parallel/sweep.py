"""Sweep engine: vmapped and device-mesh-sharded batched solves.

The reference's sweeps are serial Python loops over independent subprocess
solves (step02 run_sweep.py:301-341, step03 run_layered_sweep.py:1061-1124,
step04 run_pressure_sweep.py:709-738).  TPU-natively:

  * material sweeps (fixed mesh, e.g. step04 sigma_contact) are ONE
    vmapped PCG over the (S, T) table batch — identical sparsity, one
    compiled executable;
  * the batch axis shards across the device mesh with jax.sharding, so a
    100-case sweep on a v5e-8 runs 8 lanes of cases in parallel over ICI
    (this layer is the TPU analogue of the reference's absent
    communication backend — SURVEY.md section 2).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pelvistim_fem_tpu.ops.solve import solve_case, solve_case_refined


def device_mesh(n_devices: int | None = None, axis: str = "case") -> Mesh:
    """1-D device mesh over the available chips."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def batched_material_solve(case, sigma_tables, *, tol=1e-8, maxiter=10_000):
    """Solve the same Case for S material tables at once.

    sigma_tables: (S, T).  Returns a batched SolveResult with phi (S, N).
    This is step04's 15-subprocess loop as one vmap
    (run_pressure_sweep.py:709-738 → SURVEY.md section 3.3).
    """
    return jax.vmap(
        lambda s: solve_case(case, s, tol=tol, maxiter=maxiter)
    )(sigma_tables)


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter",
                                   "max_refinements"))
def batched_material_solve_refined(case, sigma_tables, *, tol=1e-8,
                                   inner_tol=1e-6, maxiter=10_000,
                                   max_refinements=6):
    """batched_material_solve at the CERTIFIED tolerance: one vmapped
    mixed-precision refined solve per table (f32 inner CG + f64 TRUE
    residual certification; converged lanes freeze).  The honest form
    of the material-sweep engine at the reference's hard contrasts,
    where plain f32 recursive residuals lie (PARITY.md).  Requires
    jax_enable_x64."""
    return jax.vmap(
        lambda s: solve_case_refined(case, s, tol=tol,
                                     inner_tol=inner_tol,
                                     maxiter=maxiter,
                                     max_refinements=max_refinements)
    )(sigma_tables)


def _shard_tables(case, sigma_tables, mesh, axis):
    """(case replicated, tables padded to a mesh multiple + sharded)."""
    n_dev = mesh.devices.size
    S = sigma_tables.shape[0]
    S_pad = -(-S // n_dev) * n_dev
    if S_pad != S:
        pad = jnp.repeat(sigma_tables[-1:], S_pad - S, axis=0)
        sigma_tables = jnp.concatenate([sigma_tables, pad], axis=0)
    sigma_tables = jax.device_put(sigma_tables,
                                  NamedSharding(mesh, P(axis)))
    case = jax.device_put(case, NamedSharding(mesh, P()))
    return case, sigma_tables, S


def sharded_material_solve(case, sigma_tables, mesh: Mesh | None = None,
                           *, tol=1e-8, maxiter=10_000, axis: str = "case"):
    """batched_material_solve with the S axis sharded over a device mesh.

    Pads S up to a multiple of the mesh size (padded lanes re-solve the
    last table; results are sliced off).  Case arrays are replicated.
    """
    if mesh is None:
        mesh = device_mesh(axis=axis)
    case, sigma_tables, S = _shard_tables(case, sigma_tables, mesh, axis)
    out = batched_material_solve(case, sigma_tables, tol=tol,
                                 maxiter=maxiter)
    return jax.tree_util.tree_map(lambda a: a[:S], out)


def sharded_material_solve_refined(case, sigma_tables,
                                   mesh: Mesh | None = None, *,
                                   tol=1e-8, inner_tol=1e-6,
                                   maxiter=10_000, max_refinements=6,
                                   axis: str = "case"):
    """sharded_material_solve at the CERTIFIED tolerance — the
    data-parallel twin of parallel/stencil_shard's domain-decomposed
    refined solver: every lane's residual is the TRUE f64 one, matching
    the reference's universal 1e-8 contract (step03 params.yaml:92)
    when the sweep is spread over the device mesh."""
    if mesh is None:
        mesh = device_mesh(axis=axis)
    case, sigma_tables, S = _shard_tables(case, sigma_tables, mesh, axis)
    out = batched_material_solve_refined(
        case, sigma_tables, tol=tol, inner_tol=inner_tol,
        maxiter=maxiter, max_refinements=max_refinements)
    return jax.tree_util.tree_map(lambda a: a[:S], out)


def sharded_basis_solve_refined(scase, hier, loads,
                                mesh: Mesh | None = None, *,
                                tol=1e-8, axis: str = "case", **kw):
    """Lead-field basis solves with the K (electrode/RHS) axis sharded
    over the device mesh — the data-parallel twin of
    ops/leadfield.solve_basis_refined, completing the certified-sharded
    matrix for the RHS batch axis (material tables, geometry groups and
    domain slabs already have theirs).  Pads K to a mesh multiple
    (padded lanes re-solve the last load; sliced off), replicates the
    operator + hierarchy, and lets GSPMD run one electrode block per
    device with zero cross-device traffic.
    """
    from pelvistim_fem_tpu.ops.leadfield import solve_basis_refined
    if mesh is None:
        mesh = device_mesh(axis=axis)
    n_dev = mesh.devices.size
    K = loads.shape[0]
    K_pad = -(-K // n_dev) * n_dev
    if K_pad != K:
        loads = jnp.concatenate(
            [loads, jnp.repeat(loads[-1:], K_pad - K, axis=0)], axis=0)
    loads = jax.device_put(loads, NamedSharding(mesh, P(axis)))
    scase = jax.device_put(scase, NamedSharding(mesh, P()))
    hier = jax.device_put(hier, NamedSharding(mesh, P()))
    out = solve_basis_refined(scase, hier, loads, tol=tol, **kw)
    return jax.tree_util.tree_map(lambda a: a[:K], out)


def sharded_stencil_material_solve_refined(scase, hier, sigma_tables,
                                           mesh: Mesh | None = None, *,
                                           tol=1e-8, axis: str = "case",
                                           **kw):
    """Material-table sweep on the STENCIL fast path with the case axis
    sharded over the device mesh — the stencil twin of
    sharded_material_solve_refined (element path) and the sharded form
    of ops/multigrid.batched_mg_solve_refined, at the same f64-CERTIFIED
    true-residual contract.  Pads the table batch to a mesh multiple
    (padded lanes re-solve the last table; sliced off), replicates the
    operator + hierarchy, and lets GSPMD run one case block per device
    with zero cross-device traffic during the solve.

    TPU analogue of running the reference's per-case ElmerSolver
    subprocesses on multiple machines (step04 run_pressure_sweep.py:
    709-738 — the reference has no such layer).
    """
    from pelvistim_fem_tpu.ops.multigrid import batched_mg_solve_refined
    if mesh is None:
        mesh = device_mesh(axis=axis)
    n_dev = mesh.devices.size
    S = sigma_tables.shape[0]
    S_pad = -(-S // n_dev) * n_dev
    if S_pad != S:
        sigma_tables = jnp.concatenate(
            [sigma_tables,
             jnp.repeat(sigma_tables[-1:], S_pad - S, axis=0)], axis=0)
    sigma_tables = jax.device_put(sigma_tables,
                                  NamedSharding(mesh, P(axis)))
    scase = jax.device_put(scase, NamedSharding(mesh, P()))
    hier = jax.device_put(hier, NamedSharding(mesh, P()))
    out = batched_mg_solve_refined(scase, hier, sigma_tables, tol=tol,
                                   **kw)
    return jax.tree_util.tree_map(lambda a: a[:S], out)


def sharded_eqs_solve_refined(scase, hier, ki_tables, kr_tables=None,
                              mesh: Mesh | None = None, *, tol=1e-8,
                              axis: str = "case", **kw):
    """Frequency-axis-sharded certified EQS solves (ops/eqs.py): one
    spectrum block per device — an impedance spectrum is, like every
    other sweep here, a material-table batch, so it shards the same
    way (padding to a device multiple, operator replicated)."""
    from pelvistim_fem_tpu.ops.eqs import batched_eqs_solve_refined
    if mesh is None:
        mesh = device_mesh(axis=axis)
    n_dev = mesh.devices.size
    W = ki_tables.shape[0]
    W_pad = -(-W // n_dev) * n_dev
    if W_pad != W:
        pad = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], W_pad - W, axis=0)], axis=0)
        ki_tables = pad(ki_tables)
        if kr_tables is not None:
            kr_tables = pad(kr_tables)
    ki_tables = jax.device_put(ki_tables, NamedSharding(mesh, P(axis)))
    if kr_tables is not None:
        kr_tables = jax.device_put(kr_tables,
                                   NamedSharding(mesh, P(axis)))
    scase = jax.device_put(scase, NamedSharding(mesh, P()))
    hier = jax.device_put(hier, NamedSharding(mesh, P()))
    out = batched_eqs_solve_refined(scase, hier, ki_tables, kr_tables,
                                    tol=tol, **kw)
    return jax.tree_util.tree_map(lambda a: a[:W], out)

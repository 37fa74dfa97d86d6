"""Case: a complete, solver-ready problem instance as a JAX pytree.

The reference's equivalent of a Case is a *directory*: mesh.msh +
elmer_mesh/ + case.sif + params.yaml (see SURVEY.md section 1).  Here it is
one array bundle built on the host and shipped to device, with everything
CG needs precomputed: element gradients/volumes, the sorted scatter plan,
BC masks, Dirichlet values, and the Neumann load with Jn computed from the
TRUE mesh electrode area (ref write_sif, step03 run_layered_sweep.py:
594-611 — the >10% area-mismatch warning logic lives here as a ValueError
guard in strict mode).

sigma_table stays a leaf so conductivity sweeps vmap over it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.core import TetMesh
from pelvistim_fem_tpu.ops import assembly, bc as bc_ops


@dataclasses.dataclass(frozen=True)
class CaseMeta:
    """Static (non-traced) case metadata; hashable for jit friendliness.

    Mirrors the reference's body_info dict + stim config
    (run_layered_sweep.py:344-358, params.yaml stim block).
    """
    mode: str = "voltage"              # "voltage" | "current"
    active_V: float = 1.0              # Dirichlet level (voltage mode)
    I_target_A: float = 0.0            # injected current (current mode)
    jn_used: float = 0.0               # applied Neumann density [A/m^2]
    elec_shape: str = "circle"
    elec_r: float = 0.0
    e1_pos: tuple = (0.0, 0.0, 0.0)    # active electrode center (x, y, z_top)
    e2_pos: tuple = (0.0, 0.0, 0.0)    # return electrode center
    z_skin_top: float = 0.0
    z_e1_elec_top: float = 0.0
    z_e2_elec_top: float = 0.0
    elec_area_mesh: float = 0.0        # true mesh area, active patch
    return_area_mesh: float = 0.0
    contact_enabled: bool = False
    t_skin: float = 0.0
    t_fat: float = 0.0
    compliance_limit_V: float = 100.0
    n_bodies: int = 1
    sigma_table_host: tuple = ()       # host copy (avoids device readback,
                                       # which is erratically slow on axon)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Case:
    # Geometry / topology
    nodes: jax.Array          # (N, 3)
    tets: jax.Array           # (M, 4) i32
    tet_body: jax.Array       # (M,)   i32
    grads: jax.Array          # (M, 4, 3)
    vol: jax.Array            # (M,)
    # Scatter plan (sorted segment-sum)
    scatter_perm: jax.Array   # (4M,) i32
    scatter_segids: jax.Array  # (4M,) i32
    # Materials
    sigma_table: jax.Array    # (n_bodies + 1,) — index 0 unused
    # Boundary conditions
    free_mask: jax.Array      # (N,) bool
    dirichlet_vals: jax.Array  # (N,)
    b_neumann: jax.Array      # (N,)
    # Boundary faces (for flux metrics)
    faces: jax.Array          # (B, 3) i32
    face_bcid: jax.Array      # (B,)   i32
    face_parent: jax.Array    # (B,)   i32
    face_area: jax.Array      # (B,)
    face_normal: jax.Array    # (B, 3)
    # Static metadata
    meta: CaseMeta = dataclasses.field(
        metadata=dict(static=True), default_factory=CaseMeta)

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_tets(self) -> int:
        return self.tets.shape[0]


def compute_bc_host(mesh: TetMesh, *, mode: str, active_V: float = 1.0,
                    injected_current_A: float = 0.0,
                    strict_area_check: bool = True, face_areas=None):
    """Host-side BC assembly shared by the element Case and the stencil
    case (avoids any device round-trips — notably bool-array readback,
    which is pathologically slow on the axon TPU backend).

    Returns (free (N,) bool, dirichlet (N,), b_neumann (N,), jn,
    area_active, area_return)."""
    n = mesh.n_nodes
    if face_areas is None:
        face_areas, _ = mesh.face_areas_normals()
    active_nodes, return_nodes = bc_ops.electrode_node_masks(
        mesh.faces, mesh.face_bcid, n)
    a_act, a_ret = bc_ops.electrode_mesh_areas(face_areas, mesh.face_bcid)

    dirichlet = np.zeros(n)
    free = np.ones(n, dtype=bool)
    b_neu = np.zeros(n)
    jn = 0.0
    if mode == "voltage":
        free[active_nodes] = False
        free[return_nodes] = False
        dirichlet[active_nodes] = active_V
    elif mode == "current":
        if a_act <= 0:
            raise ValueError("current mode requires a nonzero active "
                             "electrode patch")
        # Jn from TRUE mesh area so sum(Jn * A_f) == I exactly
        # (ref lesson: run_layered_sweep.py:594-611).
        jn = injected_current_A / a_act
        b_neu = bc_ops.neumann_current_load(
            mesh.faces, face_areas, mesh.face_bcid, jn, n)
        if strict_area_check:
            got = b_neu.sum()
            if abs(got - injected_current_A) > 1e-9 * max(
                    abs(injected_current_A), 1.0):
                raise ValueError(
                    f"Neumann load integrates to {got}, expected "
                    f"{injected_current_A}")
        free[return_nodes] = False
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return free, dirichlet, b_neu, jn, a_act, a_ret


def build_case(
    mesh: TetMesh,
    sigma_by_body: dict,
    *,
    mode: str = "voltage",
    active_V: float = 1.0,
    injected_current_A: float = 0.0,
    meta_extra: Optional[dict] = None,
    dtype=jnp.float64,
    strict_area_check: bool = True,
    to_device: bool = True,
) -> Case:
    """Assemble a device-ready Case from a host mesh + physics spec.

    sigma_by_body: {body_id: sigma [S/m]} — e.g. {1: 0.35, 2: 0.04, 3: 1e-3,
    4: 5e-3, 5: 5e-3} for the step03 muscle/fat/skin/contact stack
    (params.yaml:29-48).
    """
    mesh.validate()
    n = mesh.n_nodes
    grads, vol = mesh.geometry()
    perm, segids = assembly.scatter_plan(mesh.tets, n)
    areas, normals = mesh.face_areas_normals()

    n_bodies = max(sigma_by_body)
    sig = np.zeros(n_bodies + 1)
    for b, s in sigma_by_body.items():
        sig[b] = s

    free, dirichlet, b_neu, jn, a_act, a_ret = compute_bc_host(
        mesh, mode=mode, active_V=active_V,
        injected_current_A=injected_current_A,
        strict_area_check=strict_area_check, face_areas=areas)

    meta_extra = dict(meta_extra or {})
    meta = CaseMeta(
        mode=mode,
        active_V=float(active_V),
        I_target_A=injected_current_A,
        jn_used=float(jn),
        elec_area_mesh=a_act,
        return_area_mesh=a_ret,
        n_bodies=n_bodies,
        sigma_table_host=tuple(float(v) for v in sig),
        **meta_extra,
    )

    if to_device:
        f = lambda a: jnp.asarray(a, dtype)
        i = lambda a: jnp.asarray(a, jnp.int32)
        bmask = lambda a: jnp.asarray(a)
    else:
        # Host-only Case (numpy leaves): stencil-path workflows read only
        # meta + host arrays and never ship the element arrays (the
        # (M,4,3) gradients alone are ~84 MB at megatet scale — seconds
        # of transfer the structured solve path never uses).  Passing a
        # host Case into a jitted element solve still works; jax
        # transfers at call time.
        f = lambda a: np.asarray(a, dtype)
        i = lambda a: np.asarray(a, np.int32)
        bmask = lambda a: np.asarray(a)
    return Case(
        nodes=f(mesh.nodes),
        tets=i(mesh.tets),
        tet_body=i(mesh.tet_body),
        grads=f(grads),
        vol=f(vol),
        scatter_perm=i(perm),
        scatter_segids=i(segids),
        sigma_table=f(sig),
        free_mask=bmask(free),
        dirichlet_vals=f(dirichlet),
        b_neumann=f(b_neu),
        faces=i(mesh.faces),
        face_bcid=i(mesh.face_bcid),
        face_parent=i(mesh.face_parent),
        face_area=f(areas),
        face_normal=f(normals),
        meta=meta,
    )

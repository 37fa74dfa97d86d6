"""Geometry-batched sweeps: solve several geometry variants as ONE
vmapped batch on a shared lattice.

The reference's step03 sweep varies fat thickness per case and re-meshes
+ re-solves serially (run_layered_sweep.py:1061-1124).  Here all t_fat
values in a radius group share one lattice: the z-knot set is the union
of every case's knots (layer interfaces of each t_fat are exact knots),
so the meshes coincide node-for-node and cases differ ONLY in which
lattice cells belong to fat vs muscle — i.e. in the per-body stencil
coefficient stacks.  The whole group then solves as one
batched_geometry_solve with shared BCs.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pelvistim_fem_tpu.mesh.grading import layered_z_axis
from pelvistim_fem_tpu.ops.stencil import (batched_geometry_solve,
                                           batched_geometry_solve_refined,
                                           build_stencil_case,
                                           stencil_host_data)


def shared_z_knots(params, t_fat_list, *, coarse=False):
    """Union of all cases' z-knot vectors (each case's layer interfaces
    stay exact knots)."""
    g = params["geometry"]
    Lz = g["Lz"]
    ls = params["layers"]
    t_skin = ls["t_skin"]
    ct = params.get("contact", {})
    contact_on = bool(ct.get("enabled", False)) and \
        ct.get("model", "layer") == "layer"
    t_contact = ct.get("t_contact_mm", 0.5) * 1e-3 if contact_on else 0.0

    m = params.get("mesh", {})
    scale = 2.0 if coarse else 1.0
    lc_bulk = m.get("lc_global_mm", 3.0) * 1e-3 * scale
    lc_min = m.get("lc_skin_min", 0.5) * 1e-3 * scale

    knots = []
    for t_fat in t_fat_list:
        t_muscle = Lz - t_skin - t_fat
        interfaces = [0.0, t_muscle, t_muscle + t_fat, Lz]
        hs = [lc_bulk, min(lc_bulk, max(t_fat / 2, lc_min)),
              max(t_skin / 3, lc_min / 2)]
        if contact_on:
            interfaces.append(Lz + t_contact)
            hs.append(t_contact)
        knots.append(layered_z_axis(interfaces, hs))
    out = np.unique(np.round(np.concatenate(knots), 12))
    return out


def build_t_fat_group(params, t_fat_list, elec_r, *, coarse=False,
                      dtype=jnp.float32):
    """Build the shared-lattice case group for one electrode radius.

    Returns (scase, coeff_stack (S, B, 27, X, Y, Z), cases, meshes) —
    cases/meshes per t_fat for metric extraction.
    """
    from pelvistim_fem_tpu.models.ankle import build_layered_case

    zs = shared_z_knots(params, t_fat_list, coarse=coarse)

    cases, meshes, hds = [], [], []
    for t_fat in t_fat_list:
        case, _, mesh = build_layered_case(
            params, t_fat=t_fat, elec_r=elec_r, coarse=coarse,
            dtype=dtype, with_mesh=True, explicit_zs=zs)
        cases.append(case)
        meshes.append(mesh)
        hds.append(stencil_host_data(case, mesh))

    # all lattices must coincide
    ref = meshes[0]
    for m in meshes[1:]:
        assert m.lattice.grid_shape == ref.lattice.grid_shape
        np.testing.assert_array_equal(m.lattice.grid_index,
                                      ref.lattice.grid_index)

    scase = build_stencil_case(cases[0], meshes[0], dtype=dtype,
                               host_data=hds[0])
    coeff_stack = jnp.stack([jnp.asarray(h["coeff"], dtype) for h in hds])
    return scase, coeff_stack, cases, meshes


def solve_t_fat_group(params, t_fat_list, elec_r, *, coarse=False,
                      dtype=jnp.float32, tol=1e-6, maxiter=30_000,
                      refined=False):
    """One batched solve for a whole t_fat group; returns
    (results, cases, meshes) with phi per case.

    refined=True runs the vmapped mixed-precision solver (f64 master
    coefficients, f32 inner CG) so the batch meets the serial path's
    1e-8 contract on any platform; build with dtype=float64 then."""
    scase, coeff_stack, cases, meshes = build_t_fat_group(
        params, t_fat_list, elec_r, coarse=coarse, dtype=dtype)
    tables = jnp.stack([c.sigma_table for c in cases]).astype(dtype)
    if refined:
        out = batched_geometry_solve_refined(scase, coeff_stack, tables,
                                             tol=tol, maxiter=maxiter)
    else:
        out = batched_geometry_solve(scase, coeff_stack, tables, tol=tol,
                                     maxiter=maxiter)
    return out, cases, meshes

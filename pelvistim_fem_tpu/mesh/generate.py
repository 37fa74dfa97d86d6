"""Structured lattice tetrahedral mesh generators.

Every geometry in the reference is a (possibly deformed) extrusion of a 2-D
outline — the step01 box (box.geo:11), the step02 electrode slab
(run_sweep.py:63), the step03 layered ankle slab (run_layered_sweep.py:
201-210) and the step04 pressure slab (run_pressure_sweep.py:98-126).  A
tensor-product hex lattice split into 6 Kuhn tets per cell therefore covers
all of them, TPU-natively: static shapes, exact conforming layer interfaces
(layer boundaries are z-knots), and graded spacing replacing the Gmsh
Distance/Threshold size field.

Kuhn subdivision: each hex cell is split into the 6 tets
{v(0), v(e_p0), v(e_p0 + e_p1), v(1,1,1)} over permutations p of (x,y,z).
All six share the main diagonal, and neighboring cells conform.
"""

from __future__ import annotations

import dataclasses
import itertools

import numpy as np

from pelvistim_fem_tpu.mesh import core
from pelvistim_fem_tpu.mesh.boundary import extract_boundary
from pelvistim_fem_tpu.mesh.core import (
    BC_ACTIVE,
    BC_INSULATED,
    BC_RETURN,
    TetMesh,
    compact,
)

# The 6 Kuhn tets of the unit cube, as corner offsets (each row: 4 corners
# x (dx, dy, dz)).
_KUHN = []
for perm in itertools.permutations(range(3)):
    c0 = np.zeros(3, dtype=np.int64)
    c1 = c0.copy(); c1[perm[0]] = 1
    c2 = c1.copy(); c2[perm[1]] = 1
    c3 = np.ones(3, dtype=np.int64)
    # Odd permutations produce negatively-oriented tets on any grid with
    # positive spacings; swap the last two vertices statically so every
    # generated tet is positive without a per-tet volume check.
    parity = sum(1 for i in range(3) for j in range(i + 1, 3)
                 if perm[i] > perm[j]) % 2
    tet = np.stack([c0, c1, c2, c3])
    if parity == 1:
        tet = tet[[0, 1, 3, 2]]
    _KUHN.append(tet)
_KUHN = np.stack(_KUHN)  # (6, 4, 3)


def lattice_tets(xs: np.ndarray, ys: np.ndarray, zs: np.ndarray):
    """Nodes and Kuhn tets of the tensor grid xs × ys × zs.

    Returns (nodes (N,3) f64, tets (M,4) i32) with positive volumes.
    """
    nx, ny, nz = len(xs) - 1, len(ys) - 1, len(zs) - 1
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    nodes = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    from pelvistim_fem_tpu import native
    tets = native.lattice_tets_fill(nx, ny, nz, _KUHN)
    if tets is not None:
        return nodes, tets

    def nid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    ii, jj, kk = ii.ravel(), jj.ravel(), kk.ravel()   # (C,) cell origins

    tets = np.empty((ii.size * 6, 4), dtype=np.int64)
    for t in range(6):
        for v in range(4):
            dx, dy, dz = _KUHN[t, v]
            tets[t::6, v] = nid(ii + dx, jj + dy, kk + dz)
    return nodes, tets.astype(np.int32)


def _lattice_tet_centroids(xs, ys, zs):
    """Centroids of every Kuhn tet WITHOUT gathering node coordinates:
    corner offsets are in {0, 1}, so the per-axis centroid of class t is
    ((4 - s) * knot[i] + s * knot[i+1]) / 4 with s = that class's count
    of +1 offsets — three 1-D blends broadcast over cells.  Returns
    (M, 3) in the lattice_tets interleaved ordering (tet r: cell r//6,
    class r%6)."""
    s = _KUHN.sum(axis=1).astype(np.float64)          # (6, 3)
    outs = []
    for axis, arr, reps in ((0, xs, None), (1, ys, None), (2, zs, None)):
        lo = np.asarray(arr[:-1], np.float64)
        hi = np.asarray(arr[1:], np.float64)
        # (n_axis, 6) per-class centroid coordinate along this axis
        outs.append((lo[:, None] * (4.0 - s[None, :, axis])
                     + hi[:, None] * s[None, :, axis]) / 4.0)
    cx, cy, cz = outs
    nx, ny, nz = len(xs) - 1, len(ys) - 1, len(zs) - 1
    cen = np.empty((nx * ny * nz * 6, 3))
    # cells are x-major; broadcast each axis table to (nx, ny, nz, 6)
    cen[:, 0] = np.broadcast_to(cx[:, None, None, :],
                                (nx, ny, nz, 6)).reshape(-1)
    cen[:, 1] = np.broadcast_to(cy[None, :, None, :],
                                (nx, ny, nz, 6)).reshape(-1)
    cen[:, 2] = np.broadcast_to(cz[None, None, :, :],
                                (nx, ny, nz, 6)).reshape(-1)
    return cen


@dataclasses.dataclass
class LatticeRecipe:
    """Declarative lattice mesh spec: knot axes + classifier callbacks.

    The single source of truth for a generated geometry, consumed two
    ways: `mesh()` materializes the full TetMesh (element path, metrics,
    apps), while mesh/spec.build_lattice_spec turns it into the compact
    grid-form problem data that the device-side stencil assembly
    (ops/lattice_assembly.py) consumes WITHOUT ever materializing the
    (M, 4) tet array on host.

    Contract for the spec fast path: electrode BC faces (bcid 1/2) must
    lie on the extreme z-planes of the lattice (true for every reference
    geometry: step01 box top/bottom plates, step02-04 top-surface
    electrode/contact patches)."""
    xs: np.ndarray
    ys: np.ndarray
    zs: np.ndarray
    body_fn: object
    bcid_fn: object
    deform_fn: object = None

    def mesh(self) -> TetMesh:
        return build_mesh_from_lattice(self.xs, self.ys, self.zs,
                                       self.body_fn, self.bcid_fn,
                                       self.deform_fn)


def build_mesh_from_lattice(xs, ys, zs, body_fn, bcid_fn,
                            deform_fn=None) -> TetMesh:
    """Generic lattice → TetMesh pipeline.

    body_fn(cx, cy, cz) -> (M,) int body ids from tet centroids; 0 drops the
    tet (this is how footprint-limited contact volumes and non-rect outlines
    are carved out of the lattice — the analogue of Gmsh only meshing the
    CAD volumes).
    bcid_fn(fx, fy, fz, nx, ny, nz) -> (B,) int BC ids from boundary-face
    centroids and outward normals (analogue of physical-surface tagging +
    detect_elec_bc_ids, step03 run_layered_sweep.py:366-455).
    deform_fn(nodes) -> nodes, optional nodal coordinate map applied AFTER
    body/bc classification on the undeformed lattice (analogue of the
    post-mesh ankle z-deformation, run_layered_sweep.py:329-340).
    """
    xs = np.asarray(xs, float)
    ys = np.asarray(ys, float)
    zs = np.asarray(zs, float)
    nodes, tets = lattice_tets(xs, ys, zs)
    cen = _lattice_tet_centroids(xs, ys, zs)
    body = np.asarray(body_fn(cen[:, 0], cen[:, 1], cen[:, 2]),
                      dtype=np.int32)
    keep = body > 0
    tets, body = tets[keep], body[keep]
    # compact() keeps grid ordering: `used` below IS the lattice linear
    # index of each surviving node (lattice_tets emits nodes x-major).
    used = np.unique(tets)
    nodes, tets = compact(nodes, tets)
    lattice = core.LatticeInfo(
        grid_shape=(len(xs), len(ys), len(zs)),
        grid_index=used.astype(np.int64),
        axes=(xs, ys, zs),
    )

    faces, parent = extract_boundary(tets)
    p = nodes[faces]
    fcen = p.mean(axis=1)
    crs = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    nrm = crs / np.maximum(np.linalg.norm(crs, axis=1), 1e-300)[:, None]
    bcid = np.asarray(
        bcid_fn(fcen[:, 0], fcen[:, 1], fcen[:, 2],
                nrm[:, 0], nrm[:, 1], nrm[:, 2]),
        dtype=np.int32)

    if deform_fn is not None:
        nodes = deform_fn(nodes)

    mesh = TetMesh(nodes=nodes, tets=tets, tet_body=body, faces=faces,
                   face_bcid=bcid, face_parent=parent, lattice=lattice)
    if deform_fn is not None:
        # deformation could in principle invert sheared cells; re-orient.
        # Undeformed lattices are positively oriented by construction.
        mesh = mesh.with_positive_volumes()
    return mesh


# ── step01-style box ──────────────────────────────────────────────────────────

def box_mesh(Lx: float, Ly: float, Lz: float, h: float) -> TetMesh:
    return box_recipe(Lx, Ly, Lz, h).mesh()


def box_recipe(Lx: float, Ly: float, Lz: float, h: float) -> LatticeRecipe:
    """Uniform box with top (BC 1, active) / bottom (BC 2, return) /
    side (BC 3, insulated) classification.

    Reference: step01_box/box.geo:1-26 (4x4x2 cm box, lc=4 mm, physical
    surfaces 101=top/102=bottom/103=sides) + setup_case.py flat-extreme BC
    classification.
    """
    from pelvistim_fem_tpu.mesh.grading import uniform_axis
    xs = uniform_axis(0, Lx, h)
    ys = uniform_axis(0, Ly, h)
    zs = uniform_axis(0, Lz, h)
    eps = 1e-9 * max(Lx, Ly, Lz)

    def body_fn(cx, cy, cz):
        return np.full(cx.shape, core.BODY_TISSUE, np.int32)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, BC_INSULATED, np.int32)
        out[(nz > 0.5) & (np.abs(fz - Lz) < h * 1e-3 + eps)] = BC_ACTIVE
        out[(nz < -0.5) & (np.abs(fz) < h * 1e-3 + eps)] = BC_RETURN
        return out

    return LatticeRecipe(xs, ys, zs, body_fn, bcid_fn)


# ── layered slab with electrodes (steps 02/03/04) ────────────────────────────

def _footprint_mask(x, y, cx, cy, r, shape):
    """Point-in-electrode-footprint predicate (circle or square of
    half-side r, matching reference elec_shape semantics —
    step02 run_sweep.py:66-75)."""
    if shape == "square":
        return (np.abs(x - cx) < r) & (np.abs(y - cy) < r)
    return (x - cx) ** 2 + (y - cy) ** 2 < r * r


def layered_slab_mesh(
    Lx: float,
    Ly: float,
    Lz: float,
    *,
    layers,                      # [(body_id, thickness, h_z)] bottom → top
    electrodes,                  # [(cx, cy, radius)] — [active, return]
    elec_shape: str = "circle",
    contact_t: float = 0.0,      # contact layer thickness (0 = model "none")
    contact_h_z: float = None,
    h_fine: float = 0.0015,      # xy spacing under electrodes
    h_coarse: float = 0.003,     # xy spacing elsewhere
    rim_refine: float = 0.0,     # >1: electrode-rim bands at h_fine/rim_refine
    rim_band_w: float = 0.0,     # band half-width override [m]
    cross_section: str = "rect",
    ankle_z_top_fn=None,         # (x, y) -> z_top for "ankle" deformation
    outline_polygon=None,        # [(x, y)] for "ankle" cross-section carve
    explicit_zs=None,            # shared z-knot override (geometry-batched
                                 # sweeps: union of all cases' knots so
                                 # lattices coincide and only tet_body
                                 # differs — parallel/geometry_sweep.py)
) -> TetMesh:
    return layered_slab_recipe(
        Lx, Ly, Lz, layers=layers, electrodes=electrodes,
        elec_shape=elec_shape, contact_t=contact_t,
        contact_h_z=contact_h_z, h_fine=h_fine, h_coarse=h_coarse,
        rim_refine=rim_refine, rim_band_w=rim_band_w,
        cross_section=cross_section, ankle_z_top_fn=ankle_z_top_fn,
        outline_polygon=outline_polygon, explicit_zs=explicit_zs).mesh()


def layered_slab_recipe(
    Lx: float,
    Ly: float,
    Lz: float,
    *,
    layers,
    electrodes,
    elec_shape: str = "circle",
    contact_t: float = 0.0,
    contact_h_z: float = None,
    h_fine: float = 0.0015,
    h_coarse: float = 0.003,
    rim_refine: float = 0.0,
    rim_band_w: float = 0.0,
    cross_section: str = "rect",
    ankle_z_top_fn=None,
    outline_polygon=None,
    explicit_zs=None,
) -> LatticeRecipe:
    """Layered tissue slab with optional per-electrode contact volumes.

    Bodies: given layer ids bottom→top (e.g. 1=muscle, 2=fat, 3=skin), plus
    contact bodies 4 (active) / 5 (return) when contact_t > 0 — mirroring
    step03 run_layered_sweep.py:122-362.  BC faces: top of each contact
    volume (or the skin-top footprint when contact_t == 0) = BC 1 / BC 2;
    everything else insulated (BC 3).
    """
    from pelvistim_fem_tpu.mesh.grading import graded_axis, layered_z_axis

    (e1x, e1y, r1), (e2x, e2y, r2) = electrodes
    pad = 1.15  # refine slightly past the footprint edge
    fine_x = [(e1x - r1 * pad, e1x + r1 * pad),
              (e2x - r2 * pad, e2x + r2 * pad)]
    fine_y = [(e1y - r1 * pad, e1y + r1 * pad),
              (e2y - r2 * pad, e2y + r2 * pad)]
    if rim_refine > 1.0:
        # Extra-fine RIM BANDS (round-4 VERDICT item 4: the staircase
        # rim dominates the geometric flux_err).  A band of width w
        # around every axis-coordinate the rim crosses at spacing
        # h_fine/rim_refine: per-axis tensor banding refines the cells
        # the rim traverses while leaving the footprint interior (and
        # the sweep's node budget) nearly untouched.
        h_rim = h_fine / rim_refine
        w = rim_band_w if rim_band_w > 0 else max(3 * h_rim, 0.12 * r1)
        for (cx, cy, r) in ((e1x, e1y, r1), (e2x, e2y, r2)):
            for frac in (1.0, 0.7071):
                for s in (-1.0, 1.0):
                    fine_x.append((cx + s * frac * r - w,
                                   cx + s * frac * r + w, h_rim))
                    fine_y.append((cy + s * frac * r - w,
                                   cy + s * frac * r + w, h_rim))
    xs = graded_axis(0, Lx, fine_x, h_fine, h_coarse)
    ys = graded_axis(0, Ly, fine_y, h_fine, h_coarse)
    # Exact footprint extents as knots: square footprints become exact;
    # circular rims gain on-axis anchor points for rim snapping below.
    def _merge_knots(base, extra, tol):
        out = np.asarray(sorted(set(np.clip(extra, base[0], base[-1]))
                                | set(base.tolist())))
        # drop near-duplicates (keep the extra/exact value)
        keep = np.ones(len(out), bool)
        for v in extra:
            close = (np.abs(out - v) < tol) & (np.abs(out - v) > 0)
            keep &= ~close
        keep[0] = keep[-1] = True
        return out[keep]

    # Merge tolerance (0.5h) strictly exceeds the rim-snap displacement
    # clamp (0.35h) below, so a surviving knot column can never be
    # squeezed to less than ~0.15h of a rim-anchor column.
    extra_x = [e1x - r1, e1x, e1x + r1, e2x - r2, e2x, e2x + r2]
    extra_y = [e1y - r1, e1y, e1y + r1, e2y - r2, e2y, e2y + r2]
    xs = _merge_knots(xs, extra_x, h_fine * 0.5)
    ys = _merge_knots(ys, extra_y, h_fine * 0.5)

    interfaces = [0.0]
    hs = []
    for _body, t, hz in layers:
        interfaces.append(interfaces[-1] + t)
        hs.append(hz)
    if abs(interfaces[-1] - Lz) > 1e-9:
        raise ValueError(f"layer thicknesses sum to {interfaces[-1]}, "
                         f"expected Lz={Lz}")
    if contact_t > 0:
        interfaces.append(Lz + contact_t)
        hs.append(contact_h_z or contact_t)
    zs = (np.asarray(explicit_zs, float) if explicit_zs is not None
          else layered_z_axis(interfaces, hs))
    if explicit_zs is not None:
        for z in interfaces:
            if np.min(np.abs(zs - z)) > 1e-12:
                raise ValueError(f"explicit_zs must contain the layer "
                                 f"interface z={z}")

    layer_tops = np.asarray(interfaces[1:1 + len(layers)])
    layer_ids = np.asarray([b for b, _, _ in layers], np.int32)

    in_poly = None
    if cross_section == "ankle" and outline_polygon is not None:
        poly = np.asarray(outline_polygon, float)

        def in_poly(px, py):
            # Even-odd ray casting, vectorized.
            inside = np.zeros(px.shape, dtype=bool)
            n = len(poly)
            for i in range(n):
                x1, y1 = poly[i]
                x2, y2 = poly[(i + 1) % n]
                cond = ((y1 > py) != (y2 > py))
                xint = (x2 - x1) * (py - y1) / (y2 - y1 + 1e-300) + x1
                inside ^= cond & (px < xint)
            return inside

    def body_fn(cx, cy, cz):
        out = np.zeros(cx.shape, np.int32)
        in_layer = cz < Lz
        idx = np.searchsorted(layer_tops, np.clip(cz, 0, Lz), side="right")
        idx = np.clip(idx, 0, len(layer_ids) - 1)
        out[in_layer] = layer_ids[idx[in_layer]]
        if contact_t > 0:
            above = cz >= Lz
            f1 = _footprint_mask(cx, cy, e1x, e1y, r1, elec_shape)
            f2 = _footprint_mask(cx, cy, e2x, e2y, r2, elec_shape)
            out[above & f1] = core.BODY_CONTACT_ACTIVE
            out[above & f2] = core.BODY_CONTACT_RETURN
            out[above & ~(f1 | f2)] = 0       # no material outside footprints
        if in_poly is not None:
            out[~in_poly(cx, cy)] = 0
        return out

    z_bc = Lz + contact_t if contact_t > 0 else Lz
    z_tol = max(hs[-1] * 1e-3, 1e-9)

    def bcid_fn(fx, fy, fz, nx, ny, nz):
        out = np.full(fx.shape, BC_INSULATED, np.int32)
        top = (nz > 0.5) & (np.abs(fz - z_bc) < z_tol)
        f1 = _footprint_mask(fx, fy, e1x, e1y, r1, elec_shape)
        f2 = _footprint_mask(fx, fy, e2x, e2y, r2, elec_shape)
        out[top & f1] = BC_ACTIVE
        out[top & f2] = BC_RETURN
        return out

    # Rim snapping (circular electrodes): pull whole node COLUMNS whose
    # xy-distance to an electrode center is within ~half a cell of the
    # rim radially onto the exact circle.  Column-wise xy motion keeps
    # the lattice a deformed tensor grid (no z-shear); displacement is
    # clamped to 0.45*h_fine so no cell inverts.  This removes most of
    # the staircase-footprint error in mesh electrode area and geometric
    # flux integration (the reference gets smooth rims from Gmsh's CAD
    # fragment, step02 run_sweep.py:66-79).
    # Rim-band refinement shrinks the local column spacing at the rim;
    # the snap band/clamp must follow it or two band columns could land
    # on the same radius (squashed cells).
    h_snap = h_fine / rim_refine if rim_refine > 1.0 else h_fine

    def _snap_rims(nodes):
        if elec_shape != "circle":
            return nodes
        nodes = nodes.copy()
        for cx, cy, r in ((e1x, e1y, r1), (e2x, e2y, r2)):
            dx = nodes[:, 0] - cx
            dy = nodes[:, 1] - cy
            d = np.hypot(dx, dy)
            # ONE-SIDED outward snap: only interior columns just inside
            # the rim move onto the circle.  Snapping from both sides
            # would land radially-adjacent columns on the same radius
            # and squash the cells between them to zero volume.
            band = (d < r) & (d > r - 0.5 * h_snap) & (d > 1e-12)
            disp = np.minimum(r - d[band], 0.35 * h_snap)
            scale = (d[band] + disp) / d[band]
            nodes[band, 0] = cx + dx[band] * scale
            nodes[band, 1] = cy + dy[band] * scale
        return nodes

    deform_fn = _snap_rims
    if cross_section == "ankle" and ankle_z_top_fn is not None:
        t_top_layer = layers[-1][1]   # skin thickness
        z0_skin = Lz - t_top_layer

        def deform_fn(nodes):
            # Rim snap first, then the reference's post-mesh nodal
            # z-deformation (run_layered_sweep.py:329-340): skin bottom
            # fixed, skin top follows z_top(x, y); contact nodes shift
            # rigidly with the local skin top.
            nodes = _snap_rims(nodes)
            z = nodes[:, 2]
            m = z > z0_skin - 1e-9
            t = np.clip((z[m] - z0_skin) / t_top_layer, 0.0, 1.0)
            z_target = ankle_z_top_fn(nodes[m, 0], nodes[m, 1])
            nodes[m, 2] = z[m] + (z_target - Lz) * t
            return nodes

    return LatticeRecipe(xs, ys, zs, body_fn, bcid_fn, deform_fn)

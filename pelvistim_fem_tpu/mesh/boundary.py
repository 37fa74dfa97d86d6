"""Boundary (external face) extraction from tet connectivity.

An external face is a triangle appearing in exactly one tetrahedron — the
same invariant the reference's boundary reconstructor uses (step01_box/
find_boundaries.py:48-59), implemented here as a vectorized sort/group pass
instead of a Python dict loop.
"""

from __future__ import annotations

import numpy as np

# Local faces of a positively-oriented tet, ordered so the right-hand-rule
# normal points OUT of the tet (ref analogue: TET_FACES in
# step01_box/find_boundaries.py:44).
TET_FACES = np.array([
    [1, 2, 3],
    [0, 3, 2],
    [0, 1, 3],
    [0, 2, 1],
], dtype=np.int32)


def extract_boundary(tets: np.ndarray):
    """Find faces that belong to exactly one tet.

    Returns (faces (B,3) with outward orientation, parent_tet (B,)).
    """
    M = tets.shape[0]
    all_faces = tets[:, TET_FACES]                 # (M, 4, 3)
    flat = all_faces.reshape(-1, 3)                # (4M, 3)
    key = np.sort(flat, axis=1)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    sk = key[order]
    if sk.shape[0] == 0:
        return (np.empty((0, 3), np.int32), np.empty((0,), np.int32))
    new_group = np.empty(sk.shape[0], dtype=bool)
    new_group[0] = True
    new_group[1:] = np.any(sk[1:] != sk[:-1], axis=1)
    group_end = np.empty_like(new_group)
    group_end[:-1] = new_group[1:]
    group_end[-1] = True
    singleton = new_group & group_end              # appears exactly once
    ext = order[singleton]
    parent = (ext // 4).astype(np.int32)
    return flat[ext].astype(np.int32), parent

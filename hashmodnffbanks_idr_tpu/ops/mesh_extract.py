"""Isosurface extraction: vectorized marching tetrahedra (NumPy).

Role-parity with the reference's skimage marching-cubes usage
(utils/plots.py:110-224).  skimage is not available here; marching tetrahedra
(6 tets per cube around the 0-6 diagonal) is implemented from the case rules
directly — correct by construction, fully vectorized, and adequate for the
Chamfer/eval pipeline.  The triangle table is *generated* from the inside-set
rules rather than hand-copied, so there is no 256-entry table to get wrong.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# cube corner c (0..7) has offset ((c>>0)&1, (c>>1)&1, (c>>2)&1)
_CUBE_OFFSETS = np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)])

# 6-tetrahedra decomposition of the cube around the 0-6 diagonal
_TETS = np.array([
    [0, 5, 1, 6],
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
])

# tet edges: pairs of local tet-vertex indices
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
_EDGE_ID = {tuple(sorted(e)): i for i, e in enumerate(_TET_EDGES.tolist())}


def _build_tri_table() -> np.ndarray:
    """[16, 2, 3] edge indices per case (-1 padded), generated from rules."""
    table = -np.ones((16, 2, 3), dtype=np.int64)

    def eid(a, b):
        return _EDGE_ID[tuple(sorted((a, b)))]

    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 1:
            a = inside[0]
            tri = [eid(a, o) for o in outside]
            table[case, 0] = tri
        elif len(inside) == 3:
            a = outside[0]
            tri = [eid(a, i) for i in inside]
            table[case, 0] = tri[::-1]  # flip orientation vs the 1-inside case
        else:
            a, b = inside
            c, d = outside
            # cyclic quad: (a-c, b-c, b-d, a-d); split into two triangles
            q = [eid(a, c), eid(b, c), eid(b, d), eid(a, d)]
            table[case, 0] = [q[0], q[1], q[2]]
            table[case, 1] = [q[0], q[2], q[3]]
    return table


_TRI_TABLE = _build_tri_table()


def _slab_triangles(v: np.ndarray, x0: int, x1: int) -> np.ndarray:
    """Triangles (F, 3, 3) for cubes with base x in [x0, x1).

    Only this slab's tets are ever materialized — the full-grid version
    allocated (Ncubes*6, 4, 3) float64 (~19 GB at 320^3) before the active
    filter; slabbing bounds peak memory by the slab size.
    """
    cx = x1 - x0
    cy, cz = v.shape[1] - 1, v.shape[2] - 1

    corner_vals = np.empty((cx, cy, cz, 8), dtype=v.dtype)
    for c in range(8):
        ox, oy, oz = _CUBE_OFFSETS[c]
        corner_vals[..., c] = v[x0 + ox:x0 + ox + cx, oy:oy + cy, oz:oz + cz]

    # per-cube active pre-filter: a cube whose 8 corners share a sign has no
    # crossing in any of its 6 tets
    neg = corner_vals < 0
    mixed = neg.any(axis=-1) & ~neg.all(axis=-1)          # (cx, cy, cz)
    if not mixed.any():
        return np.zeros((0, 3, 3))
    idx = np.argwhere(mixed)                              # (M, 3), slab coords
    cube_vals = corner_vals[mixed]                        # (M, 8)

    base = idx.astype(np.float64)
    base[:, 0] += x0
    tet_vals = cube_vals[:, _TETS].reshape(-1, 4)         # (M*6, 4)
    tet_pos = (base[:, None, None, :]
               + _CUBE_OFFSETS[_TETS][None]).reshape(-1, 4, 3)

    case = ((tet_vals < 0) << np.arange(4)).sum(axis=-1)
    active = (case > 0) & (case < 15)
    if not active.any():
        return np.zeros((0, 3, 3))
    tet_vals = tet_vals[active]
    tet_pos = tet_pos[active]
    case = case[active]

    # edge crossing points for all 6 edges of each active tet
    a = _TET_EDGES[:, 0]
    b = _TET_EDGES[:, 1]
    va = tet_vals[:, a]                      # (T, 6)
    vb = tet_vals[:, b]
    denom = va - vb
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    t = np.clip(va / denom, 0.0, 1.0)        # (T, 6)
    pa = tet_pos[:, a]                       # (T, 6, 3)
    pb = tet_pos[:, b]
    edge_pts = pa + t[..., None] * (pb - pa)  # (T, 6, 3)

    tris = _TRI_TABLE[case]                  # (T, 2, 3)
    valid = tris[..., 0] >= 0                # (T, 2)
    tri_edge = np.where(tris < 0, 0, tris)
    tri_pts = np.take_along_axis(
        edge_pts[:, None, :, :].repeat(2, axis=1),
        tri_edge[..., None].repeat(3, axis=-1), axis=2,
    )  # (T, 2, 3verts, 3xyz)
    return tri_pts[valid]                    # (F, 3, 3)


def marching_tetrahedra(
    values: np.ndarray, level: float = 0.0, slab: int = 16
) -> Tuple[np.ndarray, np.ndarray]:
    """values: (NX, NY, NZ) scalar field on an integer grid.

    Returns (verts (V, 3) in grid coordinates, faces (F, 3) int).
    Surface = {x : values(x) == level}.  Processes x-slabs of `slab` cube
    layers at a time; welding is global, so boundary vertices match.
    """
    v = values - level
    nx, ny, nz = v.shape
    cx = nx - 1
    if min(cx, ny - 1, nz - 1) < 1:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    chunks = [_slab_triangles(v, x0, min(x0 + slab, cx))
              for x0 in range(0, cx, slab)]
    tri_pts = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, 3, 3))
    if len(tri_pts) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    verts_all = tri_pts.reshape(-1, 3)
    # weld duplicate vertices (quantize to grid-relative tolerance)
    key = np.round(verts_all * 1e6).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    # representative positions: first occurrence
    first = np.zeros(len(uniq), dtype=np.int64)
    seen = np.full(len(uniq), -1, dtype=np.int64)
    order = np.arange(len(verts_all))
    np.minimum.at(seen := np.full(len(uniq), len(verts_all), dtype=np.int64), inv, order)
    verts = verts_all[seen]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    return verts, faces[good]


def largest_component(verts: np.ndarray, faces: np.ndarray):
    """Keep the largest connected component (plots.py:162-166 role)."""
    if len(faces) == 0:
        return verts, faces
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    ncomp, labels = connected_components(adj, directed=False)
    if ncomp <= 1:
        return verts, faces
    counts = np.bincount(labels, minlength=ncomp)
    keep = np.argmax(counts)
    vmask = labels == keep
    fmask = vmask[faces].all(axis=1)
    remap = -np.ones(n, dtype=np.int64)
    remap[vmask] = np.arange(vmask.sum())
    return verts[vmask], remap[faces[fmask]]

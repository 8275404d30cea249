"""Isosurface extraction (replaces PyMCubes in renderer.py:28-36).

Implemented as vectorized marching TETRAHEDRA: each grid cube splits into 6
tetrahedra; each tetrahedron contributes 0-2 triangles depending on the
sign pattern of (value - threshold) at its 4 corners, with vertices placed
by linear interpolation along crossing edges. Compared to classic marching
cubes this produces ~2x the triangle count but an equivalent surface, and
it needs no case tables — the 16 sign patterns enumerate directly.

API matches the reference's usage: marching_cubes(u, threshold) ->
(verts [V, 3] in index space, tris [T, 3]).
"""

import numpy as np

__all__ = ["marching_cubes"]

# 6-tetrahedra decomposition of the unit cube sharing main diagonal 0-6
# (corner c = (x + dx, y + dy, z + dz), bit order dx*4 + dy*2 + dz).
_TETS = np.array([
    [0, 5, 1, 6],
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
], np.int64)

_CORNER_OFFSETS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], np.int64)

# Per-tet triangulation cases, computed once: for each of the 16 sign
# patterns (bit i set = corner i inside), the list of edges (pairs of local
# corner ids) forming 0, 1, or 2 triangles.
def _tet_cases():
    cases = {}
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for mask in range(16):
        inside = [i for i in range(4) if mask & (1 << i)]
        outside = [i for i in range(4) if not mask & (1 << i)]
        tris = []
        if len(inside) == 1:
            a = inside[0]
            tris = [[(a, outside[0]), (a, outside[1]), (a, outside[2])]]
        elif len(inside) == 3:
            a = outside[0]
            tris = [[(a, inside[0]), (a, inside[2]), (a, inside[1])]]
        elif len(inside) == 2:
            a, b = inside
            c, d = outside
            # quad with corners (a,c), (a,d), (b,d), (b,c) -> two tris
            tris = [
                [(a, c), (a, d), (b, d)],
                [(a, c), (b, d), (b, c)],
            ]
        cases[mask] = tris
    return cases


_CASES = _tet_cases()


def marching_cubes(u, threshold=0.0):
    """u: [nx, ny, nz] scalar field. Surface where u == threshold, oriented
    with 'inside' = u > threshold (PyMCubes convention on -sdf)."""
    u = np.asarray(u, np.float64)
    nx, ny, nz = u.shape
    # cube base coordinates
    bx, by, bz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1),
        indexing="ij")
    base = np.stack([bx, by, bz], axis=-1).reshape(-1, 3)  # [C, 3]

    # per-cube corner values [C, 8]
    corner_vals = np.empty((base.shape[0], 8), np.float64)
    for ci, off in enumerate(_CORNER_OFFSETS):
        corner_vals[:, ci] = u[
            base[:, 0] + off[0], base[:, 1] + off[1], base[:, 2] + off[2]]

    verts_list, tris_list = [], []
    n_verts = 0
    for tet in _TETS:
        tv = corner_vals[:, tet]  # [C, 4]
        inside = tv > threshold
        mask = (inside[:, 0].astype(np.int64)
                + 2 * inside[:, 1] + 4 * inside[:, 2] + 8 * inside[:, 3])
        for case_mask in range(1, 15):
            sel = np.nonzero(mask == case_mask)[0]
            if sel.size == 0:
                continue
            for tri_edges in _CASES[case_mask]:
                tri_pts = []
                for (la, lb) in tri_edges:
                    ca, cb = tet[la], tet[lb]
                    va = corner_vals[sel, ca]
                    vb = corner_vals[sel, cb]
                    t = (threshold - va) / np.where(
                        np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                    t = np.clip(t, 0.0, 1.0)
                    pa = base[sel] + _CORNER_OFFSETS[ca]
                    pb = base[sel] + _CORNER_OFFSETS[cb]
                    tri_pts.append(pa + t[:, None] * (pb - pa))
                v = np.stack(tri_pts, axis=1)  # [S, 3, 3]
                verts_list.append(v.reshape(-1, 3))
                idx = n_verts + np.arange(v.shape[0] * 3).reshape(-1, 3)
                tris_list.append(idx)
                n_verts += v.shape[0] * 3

    if not verts_list:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_list, axis=0)
    tris = np.concatenate(tris_list, axis=0)
    # weld duplicate vertices
    rounded = np.round(verts, 6)
    uniq, inv = np.unique(rounded, axis=0, return_inverse=True)
    tris = inv[tris]
    # drop degenerate triangles
    keep = ~((tris[:, 0] == tris[:, 1]) | (tris[:, 1] == tris[:, 2])
             | (tris[:, 0] == tris[:, 2]))
    return uniq, tris[keep]

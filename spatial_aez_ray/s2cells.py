"""S2-style hierarchical cell ids: cube faces + Hilbert curve.

The north rule names an "H3/S2 index" for partitioning; ``cells.py``
ships the equirectangular Morton variant (exact-grid friendly), this
module adds a true S2-geometry cell id built from the PUBLIC S2 scheme
(s2geometry.io docs / Hilbert-curve literature): project the sphere to
six cube faces, quadratic (u,v)->(s,t) reprojection for near-uniform
cell areas, 30-level quadtree on each face ordered by the Hilbert
curve, packed as ``face(3 bits) | hilbert_pos(2*level) | 1`` in a
uint64 — the trailing-1 sentinel encodes the level, exactly the S2
id layout, so ids sort in Hilbert order and a parent's id range
contains all its descendants (the property range partitioning needs).

No S2 library exists in this sandbox to cross-check bit-for-bit ids;
tests verify the structural contract instead: roundtrip stability,
parent containment via id ranges, level extraction, Hilbert locality.

Implemented from scratch per the published algorithm; the reference
repo has no cell index at all (its analog is raster (row, col)
addressing), so this is engine infrastructure, not ported behavior.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4

# Hilbert sub-cell orderings: position-in-curve for (i,j) sub-cells in
# each of the 4 curve orientations, and the orientation each sub-cell
# hands to its children. Canonical S2 tables (public):
#   ij->pos for orientation 0 is (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # canonical order
    [0, 2, 3, 1],   # axes swapped
    [3, 2, 0, 1],   # axes inverted
    [3, 1, 0, 2],   # swapped & inverted
], dtype=np.uint64)
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.uint64)

_IJ_TO_POS = np.zeros((4, 4), dtype=np.uint64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _xyz_from_lonlat(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cos_phi = np.cos(phi)
    return (np.cos(theta) * cos_phi, np.sin(theta) * cos_phi, np.sin(phi))


def _face_uv(x, y, z):
    """Largest-axis cube face (0..5 = +x,+y,+z,-x,-y,-z) + (u,v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # S2 uv axes per face (public table)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (un, ud, vn, vd) in enumerate([
            (1, 0, 2, 0),    # face 0 (+x): u=y/x,  v=z/x
            (0, 1, 2, 1),    # face 1 (+y): u=-x/y, v=z/y
            (0, 2, 1, 2),    # face 2 (+z): u=-x/z, v=-y/z
            (2, 0, 1, 0),    # face 3 (-x): u=z/x,  v=y/x  (x<0)
            (2, 1, 0, 1),    # face 4 (-y): u=z/y,  v=x/y  (y<0)
            (1, 2, 0, 2),    # face 5 (-z): u=-y/z, v=-x/z (z<0)
    ]):
        sel = face == f
        if not sel.any():
            continue
        comps = [x, y, z]
        num_u, num_v, den = comps[un], comps[vn], comps[ud]
        uu = num_u[sel] / den[sel]
        vv = num_v[sel] / den[sel]
        if f == 1:
            uu = -uu
        if f == 2:
            uu, vv = -uu, -vv
        if f == 5:
            uu, vv = -uu, -vv
        u[sel] = uu
        v[sel] = vv
    return face, u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection (near-uniform cell areas)."""
    return np.where(u >= 0,
                    0.5 * np.sqrt(np.maximum(1 + 3 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1 - 3 * u, 0.0)))


def cell_id(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized S2-style cell id at ``level`` (uint64)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    n = np.uint64(1) << np.uint64(level)
    i = np.minimum((_st_from_uv(u) * (1 << level)).astype(np.uint64),
                   n - np.uint64(1))
    j = np.minimum((_st_from_uv(v) * (1 << level)).astype(np.uint64),
                   n - np.uint64(1))

    # Hilbert position bit-pair by bit-pair (orientation carried down);
    # faces 0/3 start with swap, like the canonical curve on each face
    orient = np.where(np.isin(face, [0, 3]),
                      np.uint64(_SWAP_MASK), np.uint64(0)).astype(np.uint64)
    pos = np.zeros(len(lon), dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        ib = (i >> np.uint64(k)) & np.uint64(1)
        jb = (j >> np.uint64(k)) & np.uint64(1)
        ij = (ib << np.uint64(1)) | jb
        p = _IJ_TO_POS[orient.astype(np.int64), ij.astype(np.int64)]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENTATION[p.astype(np.int64)]

    # id = face(3) | pos(2*level) | 1, left-aligned to 64 bits
    shift = np.uint64(2 * (MAX_LEVEL - level))
    body = (np.asarray(face, dtype=np.uint64) << np.uint64(2 * level)) | pos
    return (body << (shift + np.uint64(1))) | np.uint64(1) << shift


def level_of(ids: np.ndarray) -> np.ndarray:
    """Recover the level from the trailing-1 sentinel position."""
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    lsb = ids & (~ids + np.uint64(1))
    return (MAX_LEVEL
            - (np.round(np.log2(lsb.astype(np.float64)))
               .astype(np.int64) // 2)).astype(np.int64)


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at a coarser level (sentinel re-planted)."""
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    shift = np.uint64(2 * (MAX_LEVEL - level))
    sentinel = np.uint64(1) << shift
    keep = ~(sentinel + (sentinel - np.uint64(1)))  # clear low bits
    return (ids & np.uint64(keep)) | sentinel


def range_of(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[min, max] id range covered by each cell — every descendant's
    id (at any level) lies inside; the contract range partitioning
    relies on."""
    ids = np.atleast_1d(np.asarray(ids, dtype=np.uint64))
    lsb = ids & (~ids + np.uint64(1))
    return ids - (lsb - np.uint64(1)), ids + (lsb - np.uint64(1))


def token(ids: np.ndarray) -> list[str]:
    """Hex token with trailing zeros stripped (sortable, S2-style)."""
    out = []
    for v in np.atleast_1d(np.asarray(ids, dtype=np.uint64)):
        t = f"{int(v):016x}".rstrip("0")
        out.append(t or "0")
    return out

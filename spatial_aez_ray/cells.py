"""Cell encoding: Z-order (Morton) quad cells over the WGS84 grid.

No H3/S2 library exists in this environment, so the engine ships a
from-scratch quadtree cell id with the two properties the pipelines
need (SURVEY.md §1.3, §7.1 step 4):

* locality — interleaved-bit (Morton) ids make lexicographic/numeric
  ranges spatially compact, so cell-prefix range partitioning is
  spatial partitioning;
* hierarchy — ``parent`` / ``children`` by bit shifting (power-of-two
  levels), while the exact 3×3 grid alignment of the 1 km / 300 m
  rasters stays in integer (row, col) space (``grid3_parent``), because
  a 3× relationship does not nest in any power-of-two hierarchy
  (SURVEY.md §7.4 item 4).

A cell id packs (level, morton) into an int64:
``id = (level << 58) | interleave(ix, iy)`` with ix = column index and
iy = row index on the 2^level × 2^level equirectangular grid covering
lon ∈ [-180, 180), lat ∈ [-90, 90) (iy = 0 at the south pole).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 28


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of each value out to even bit positions."""
    v = v.astype(np.uint64) & np.uint64((1 << 29) - 1)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def encode_xy(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    """Morton cell id from integer grid coordinates at a level."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} out of range")
    m = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    return (m | (np.uint64(level) << np.uint64(58))).astype(np.int64)


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ix, iy, level) from cell ids."""
    c = np.asarray(cell).astype(np.uint64)
    level = (c >> np.uint64(58)).astype(np.int64)
    m = c & np.uint64((1 << 58) - 1)
    return (_compact1by1(m).astype(np.int64),
            _compact1by1(m >> np.uint64(1)).astype(np.int64), level)


def encode_lonlat(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Cell ids of lon/lat points at a level."""
    n = 1 << level
    ix = np.clip(((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(lat) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return encode_xy(ix, iy, level)


def parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Ancestor cell ``steps`` levels up (power-of-two hierarchy)."""
    ix, iy, level = decode(cell)
    new_level = level - steps
    if np.any(new_level < 0):
        raise ValueError("parent below level 0")
    return encode_xy(ix >> steps, iy >> steps, int(new_level if np.isscalar(new_level) else new_level.flat[0]))


def prefix_token(cell: np.ndarray, prefix_level: int) -> np.ndarray:
    """Morton prefix at a coarser level — the range-partitioning key.

    Equal tokens = same coarse cell; numeric ranges of tokens are
    spatially contiguous Z-order runs.
    """
    ix, iy, level = decode(cell)
    steps = level - prefix_level
    if np.any(steps < 0):
        raise ValueError("prefix level finer than cell level")
    return encode_xy(ix >> steps, iy >> steps, prefix_level)


def grid3_parent(row: np.ndarray, col: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """300 m (child) -> 1 km (parent) exact 3×3 grid alignment
    (process_imagery.py:253-271 reads parents at (x//3, y//3))."""
    return np.asarray(row) // 3, np.asarray(col) // 3

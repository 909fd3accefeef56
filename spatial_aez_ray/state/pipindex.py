"""Broadcast polygon index: point-in-polygon join + kNN boundary snap.

This replaces the reference's 766 rasterized per-feature mask files
(/root/reference/prepare_feature_masks.py:9-63) with one in-memory
index built once per worker process (SURVEY.md §2.3 ST2, §2.4 J1). Geometry
tests are from-scratch numpy (no GEOS in this environment):

* ``covers`` = even-odd ray crossing, boundary-inclusive. The fixture
  worlds place polygon borders off pixel centers except where tie
  cases are deliberate; a pixel center on a border shared by two
  features is claimed by BOTH (the reference's per-feature masks allow
  the same double count, SURVEY.md §2.4 J1).
* kNN snap: points covered by no feature within ``tol`` degrees of a
  boundary snap to the nearest boundary (ties -> lowest feature_idx);
  beyond tol they are dropped (the reference's implicit anti-join,
  J5). ``tol=0`` is exact reference parity.

The index is small (≈255 features) — broadcast it via the actor
constructor / ``ray.put``, never shuffle the big side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import wkb
from ..geo import GridSpec


@dataclass
class _Feature:
    feature_idx: int
    admin: str
    polygons: wkb.Geometry
    bbox: tuple[float, float, float, float]
    # flattened edge arrays over all rings of all polygons (for distance)
    ex1: np.ndarray = None
    ey1: np.ndarray = None
    ex2: np.ndarray = None
    ey2: np.ndarray = None


def _ring_crossings(ring: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity of each point w.r.t. one closed ring.

    Standard ray-casting: cast +x ray; edge (p1,p2) crosses if the edge
    spans the point's latitude half-open and the intersection lies right
    of the point. Vectorized P×E then reduced over edges.
    """
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    # avoid div-by-zero on horizontal edges; they never satisfy the span test
    dy = np.where(y2 == y1, 1.0, y2 - y1)
    lat_c = lat[:, None]
    lon_c = lon[:, None]
    spans = (y1[None, :] > lat_c) != (y2[None, :] > lat_c)
    xint = x1[None, :] + (lat_c - y1[None, :]) * (x2 - x1)[None, :] / dy[None, :]
    cross = spans & (lon_c < xint)
    return cross.sum(axis=1).astype(np.int64)


def _on_boundary(ring: np.ndarray, lon: np.ndarray, lat: np.ndarray,
                 eps: float = 1e-12) -> np.ndarray:
    """True where a point lies on a segment of the ring (within eps)."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    dx, dy = (x2 - x1)[None, :], (y2 - y1)[None, :]
    px = lon[:, None] - x1[None, :]
    py = lat[:, None] - y1[None, :]
    cross = np.abs(px * dy - py * dx)
    seg2 = dx * dx + dy * dy
    within = (px * dx + py * dy >= -eps) & (px * dx + py * dy <= seg2 + eps)
    return ((cross * cross <= eps * np.maximum(seg2, eps)) & within).any(axis=1)


def _segment_dist2(ex1, ey1, ex2, ey2, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Min squared planar distance (deg²) from each point to any edge."""
    dx, dy = (ex2 - ex1)[None, :], (ey2 - ey1)[None, :]
    seg2 = np.maximum(dx * dx + dy * dy, 1e-300)
    px = lon[:, None] - ex1[None, :]
    py = lat[:, None] - ey1[None, :]
    t = np.clip((px * dx + py * dy) / seg2, 0.0, 1.0)
    ddx = px - t * dx
    ddy = py - t * dy
    return (ddx * ddx + ddy * ddy).min(axis=1)


class PolygonIndex:
    """Coarse-grid bucketed feature index with vectorized covers/snap.

    Construction cost is O(features); query cost per tile is bbox
    candidate lookup + vectorized per-point tests against the few
    candidates. Pickles cleanly for broadcast into kernel stages.
    """

    def __init__(self, features: list[tuple[int, str, bytes]], cell_deg: float = 2.0):
        """features: (feature_idx, admin, wkb_geometry) — admin != None."""
        self.cell_deg = float(cell_deg)
        self.features: list[_Feature] = []
        for fidx, admin, geom_wkb in features:
            polys = wkb.loads(geom_wkb)
            f = _Feature(fidx, admin, polys, wkb.bounds(polys))
            ex1, ey1, ex2, ey2 = [], [], [], []
            for rings in polys:
                for r in rings:
                    ex1.append(r[:-1, 0]); ey1.append(r[:-1, 1])
                    ex2.append(r[1:, 0]); ey2.append(r[1:, 1])
            f.ex1 = np.concatenate(ex1); f.ey1 = np.concatenate(ey1)
            f.ex2 = np.concatenate(ex2); f.ey2 = np.concatenate(ey2)
            self.features.append(f)
        # bucket features by coarse lon/lat cells of their bbox
        self._buckets: dict[tuple[int, int], list[int]] = {}
        for pos, f in enumerate(self.features):
            x0, y0, x1, y1 = f.bbox
            for cx in range(int(np.floor(x0 / self.cell_deg)),
                            int(np.floor(x1 / self.cell_deg)) + 1):
                for cy in range(int(np.floor(y0 / self.cell_deg)),
                                int(np.floor(y1 / self.cell_deg)) + 1):
                    self._buckets.setdefault((cx, cy), []).append(pos)

    # -- candidate lookup ---------------------------------------------------
    def candidates(self, min_lon, min_lat, max_lon, max_lat,
                   pad: float = 0.0) -> list[int]:
        """Feature positions whose bbox (padded) intersects the query box."""
        min_lon -= pad; min_lat -= pad; max_lon += pad; max_lat += pad
        out: set[int] = set()
        for cx in range(int(np.floor(min_lon / self.cell_deg)),
                        int(np.floor(max_lon / self.cell_deg)) + 1):
            for cy in range(int(np.floor(min_lat / self.cell_deg)),
                            int(np.floor(max_lat / self.cell_deg)) + 1):
                out.update(self._buckets.get((cx, cy), ()))
        res = []
        for pos in sorted(out):
            x0, y0, x1, y1 = self.features[pos].bbox
            if not (x1 < min_lon or x0 > max_lon or y1 < min_lat or y0 > max_lat):
                res.append(pos)
        return res

    # -- point tests --------------------------------------------------------
    def covers_points(self, pos: int, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Boundary-inclusive point-in-feature test, vectorized."""
        f = self.features[pos]
        inside = np.zeros(len(lon), dtype=np.int64)
        onb = np.zeros(len(lon), dtype=bool)
        for rings in f.polygons:
            par = np.zeros(len(lon), dtype=np.int64)
            for r in rings:
                par += _ring_crossings(r, lon, lat)
                onb |= _on_boundary(r, lon, lat)
            inside += (par % 2)
        return (inside > 0) | onb

    def _bbox_fully_inside(self, pos: int, min_lon, min_lat, max_lon, max_lat) -> bool:
        """Conservative: the query box is entirely covered by the feature.

        True iff all four corners are covered and no ring edge's bbox
        intersects the query box (so the boundary cannot pass through).
        """
        f = self.features[pos]
        emin_x = np.minimum(f.ex1, f.ex2); emax_x = np.maximum(f.ex1, f.ex2)
        emin_y = np.minimum(f.ey1, f.ey2); emax_y = np.maximum(f.ey1, f.ey2)
        overlap = ~((emax_x < min_lon) | (emin_x > max_lon) |
                    (emax_y < min_lat) | (emin_y > max_lat))
        if overlap.any():
            return False
        cx = np.array([min_lon, max_lon, max_lon, min_lon])
        cy = np.array([min_lat, min_lat, max_lat, max_lat])
        return bool(self.covers_points(pos, cx, cy).all())

    # -- tile assignment ----------------------------------------------------
    def assign_tile(self, grid: GridSpec, ty: int, tx: int
                    ) -> list[tuple[int, str, np.ndarray]]:
        """All (feature_idx, admin, bool mask (nrows, ncols)) claims of a
        tile's pixel centers. A pixel may appear in several claims
        (deliberate double-count parity, SURVEY §2.4 J1). Interior tiles
        short-circuit to a full-tile mask without per-pixel tests."""
        x_off, y_off, ncols, nrows = grid.tile_window(ty, tx)
        lons = grid.lons(x_off, ncols)
        lats = grid.lats(y_off, nrows)
        min_lon, max_lon = lons[0], lons[-1]
        min_lat, max_lat = lats[-1], lats[0]
        out = []
        for pos in self.candidates(min_lon, min_lat, max_lon, max_lat):
            f = self.features[pos]
            if self._bbox_fully_inside(pos, min_lon, min_lat, max_lon, max_lat):
                out.append((f.feature_idx, f.admin,
                            np.ones((nrows, ncols), dtype=bool)))
                continue
            glon = np.broadcast_to(lons[None, :], (nrows, ncols)).ravel()
            glat = np.broadcast_to(lats[:, None], (nrows, ncols)).ravel()
            # restrict per-pixel tests to the feature bbox
            x0, y0, x1, y1 = f.bbox
            cand = ((glon >= x0) & (glon <= x1) & (glat >= y0) & (glat <= y1))
            mask = np.zeros(nrows * ncols, dtype=bool)
            if cand.any():
                mask[cand] = self.covers_points(pos, glon[cand], glat[cand])
            if mask.any():
                out.append((f.feature_idx, f.admin, mask.reshape(nrows, ncols)))
        return out

    # -- kNN snap -----------------------------------------------------------
    def snap(self, lon: np.ndarray, lat: np.ndarray, tol: float) -> np.ndarray:
        """Nearest-boundary feature position within tol degrees, else -1.

        Ties at equal distance resolve to the lowest feature position
        (deterministic; the oracle implements the same rule)."""
        n = len(lon)
        best = np.full(n, np.inf)
        who = np.full(n, -1, dtype=np.int64)
        if n == 0 or tol <= 0:
            return who
        cands = self.candidates(float(lon.min()), float(lat.min()),
                                float(lon.max()), float(lat.max()), pad=tol)
        for pos in cands:
            f = self.features[pos]
            x0, y0, x1, y1 = f.bbox
            near = ((lon >= x0 - tol) & (lon <= x1 + tol) &
                    (lat >= y0 - tol) & (lat <= y1 + tol))
            if not near.any():
                continue
            d2 = _segment_dist2(f.ex1, f.ey1, f.ex2, f.ey2, lon[near], lat[near])
            d = np.sqrt(d2)
            idx = np.flatnonzero(near)
            better = d < best[idx]
            best[idx[better]] = d[better]
            who[idx[better]] = pos
        who[best > tol] = -1
        return who

    def admin_of(self, pos: int) -> str:
        return self.features[pos].admin

    def feature_idx_of(self, pos: int) -> int:
        return self.features[pos].feature_idx

"""Minimal WKB codec for Polygon / MultiPolygon (EPSG:4326, 2-D).

From scratch on the public WKB spec (OGC 06-103r4); no GEOS/shapely in
this environment. A geometry is represented as
``list[list[np.ndarray]]``: polygons -> rings -> (N, 2) float64 arrays
of (lon, lat), first ring = exterior, rest = holes, rings closed
(first point == last point).
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

Geometry = list  # list[list[np.ndarray]]


def dumps(polygons: Geometry) -> bytes:
    """Encode polygons as little-endian WKB (MultiPolygon if >1)."""
    def _ring(r: np.ndarray) -> bytes:
        r = np.asarray(r, dtype="<f8")
        return struct.pack("<I", len(r)) + r.tobytes()

    def _poly(rings) -> bytes:
        return (struct.pack("<bI", 1, _WKB_POLYGON)
                + struct.pack("<I", len(rings))
                + b"".join(_ring(r) for r in rings))

    if len(polygons) == 1:
        return _poly(polygons[0])
    return (struct.pack("<bI", 1, _WKB_MULTIPOLYGON)
            + struct.pack("<I", len(polygons))
            + b"".join(_poly(p) for p in polygons))


def loads(buf: bytes) -> Geometry:
    """Decode WKB Polygon/MultiPolygon -> list of [rings] per polygon."""
    pos = 0

    def _read_poly() -> list[np.ndarray]:
        nonlocal pos
        endian = buf[pos]
        fmt = "<" if endian == 1 else ">"
        gtype, = struct.unpack_from(fmt + "I", buf, pos + 1)
        if gtype & 0xFF != _WKB_POLYGON:
            raise ValueError(f"expected polygon, got wkb type {gtype}")
        pos += 5
        nrings, = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            npts, = struct.unpack_from(fmt + "I", buf, pos)
            pos += 4
            pts = np.frombuffer(buf, dtype=fmt + "f8", count=npts * 2, offset=pos)
            pos += npts * 16
            rings.append(pts.reshape(npts, 2).copy())
        return rings

    endian = buf[pos]
    fmt = "<" if endian == 1 else ">"
    gtype, = struct.unpack_from(fmt + "I", buf, pos + 1)
    if gtype & 0xFF == _WKB_POLYGON:
        return [_read_poly()]
    if gtype & 0xFF == _WKB_MULTIPOLYGON:
        pos += 5
        nparts, = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        return [_read_poly() for _ in range(nparts)]
    raise ValueError(f"unsupported wkb geometry type {gtype}")


def bounds(polygons: Geometry) -> tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) over all rings."""
    pts = np.concatenate([r for p in polygons for r in p])
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


def box(min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> Geometry:
    """Axis-aligned rectangle polygon (closed CCW ring)."""
    ring = np.array([
        [min_lon, min_lat], [max_lon, min_lat], [max_lon, max_lat],
        [min_lon, max_lat], [min_lon, min_lat],
    ], dtype=np.float64)
    return [[ring]]

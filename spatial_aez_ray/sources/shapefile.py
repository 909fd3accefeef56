"""Minimal ESRI Shapefile (.shp) + dBASE (.dbf) reader/writer and the
shapefile -> countries side-table converter.

The reference reads country polygons + the ADMIN attribute through OGR
(/root/reference/extract_country_data.py:218-226). OGR is not in this
sandbox; the shapefile main-file and dBASE III formats are simple and
public (ESRI Shapefile Technical Description, July 1998), so the
needed slice is implemented from scratch: Polygon (type 5) records and
fixed-width character DBF fields. Ring winding follows the spec: outer
rings clockwise start a polygon, counter-clockwise rings are holes of
the preceding outer ring.

``shapefile_to_countries`` is the S3 ingestion path: .shp/.dbf ->
normalized WKB side table (feature_idx, a3, admin_raw, admin,
geometry), the exact ``countries.parquet`` schema the PolygonIndex
builds from — admin normalization (admin_normalize.ADMIN_MAP, None-drop)
applied like extract_country_data.py:223-225.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .. import wkb
from ..admin_normalize import normalize

_SHP_POLYGON = 5


# ---------------------------------------------------------------------------
# .shp
# ---------------------------------------------------------------------------

def _ring_is_clockwise(r: np.ndarray) -> bool:
    """Signed-area test (shoelace); shapefile outer rings are CW."""
    x, y = r[:, 0], r[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0


def read_shp(path: str) -> list[wkb.Geometry]:
    """Polygon shapefile -> list of geometries (one per record), each
    a list of polygons of rings, matching the wkb module's model."""
    with open(path, "rb") as f:
        buf = f.read()
    code, = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("not a shapefile")
    shape_type, = struct.unpack_from("<i", buf, 32)
    if shape_type != _SHP_POLYGON:
        raise ValueError(f"only polygon shapefiles supported, got "
                         f"type {shape_type}")
    geoms: list[wkb.Geometry] = []
    pos = 100
    while pos < len(buf):
        _, content_words = struct.unpack_from(">ii", buf, pos)
        pos += 8
        # framing bounds: a record holds at least its 4-byte shape type
        # and must end inside the buffer, strictly after it starts —
        # a negative/lying length would otherwise loop forever or read
        # out of frame (crafted-input guard, like functions/png.py).
        rec_end = pos + content_words * 2
        if content_words < 2 or rec_end > len(buf):
            raise ValueError(f"shapefile record at {pos - 8} has invalid "
                             f"content length {content_words}")
        rtype, = struct.unpack_from("<i", buf, pos)
        if rtype == 0:  # null shape
            geoms.append([])
            pos = rec_end
            continue
        if rtype != _SHP_POLYGON:
            raise ValueError(f"record shape type {rtype} != polygon")
        n_parts, n_points = struct.unpack_from("<ii", buf, pos + 36)
        pts_off = pos + 44 + 4 * n_parts
        if (n_parts < 0 or n_points < 0 or pts_off > rec_end
                or pts_off + 16 * n_points > rec_end):
            raise ValueError(f"shapefile record at {pos - 8} declares "
                             f"{n_parts} parts / {n_points} points beyond "
                             "its content")
        parts = list(struct.unpack_from(f"<{n_parts}i", buf, pos + 44))
        pts = np.frombuffer(buf, "<f8", count=n_points * 2,
                            offset=pts_off).reshape(n_points, 2)
        parts.append(n_points)
        if any(parts[i] < 0 or parts[i] > parts[i + 1]
               for i in range(n_parts)):
            raise ValueError(f"shapefile record at {pos - 8} has "
                             "non-monotone part offsets")
        polys: wkb.Geometry = []
        for i in range(n_parts):
            ring = pts[parts[i]:parts[i + 1]].copy()
            if _ring_is_clockwise(ring) or not polys:
                polys.append([ring])      # new outer ring
            else:
                polys[-1].append(ring)    # hole of the previous outer
        geoms.append(polys)
        pos = rec_end
    return geoms


def write_shp(path: str, geoms: list[wkb.Geometry]) -> None:
    """Write polygon records (+ the .shx index sidecar)."""
    records = []
    for num, polys in enumerate(geoms, start=1):
        rings = [np.asarray(r, dtype="<f8") for p in polys for r in p]
        pts = np.concatenate(rings) if rings else np.zeros((0, 2))
        parts, off = [], 0
        for r in rings:
            parts.append(off)
            off += len(r)
        box = (pts[:, 0].min(), pts[:, 1].min(),
               pts[:, 0].max(), pts[:, 1].max()) if len(pts) else (0,) * 4
        content = struct.pack("<i4d", _SHP_POLYGON, *box)
        content += struct.pack("<ii", len(rings), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        content += pts.astype("<f8").tobytes()
        records.append(struct.pack(">ii", num, len(content) // 2) + content)

    all_pts = np.concatenate(
        [np.asarray(r) for g in geoms for p in g for r in p]) \
        if any(geoms) else np.zeros((1, 2))
    bbox = (all_pts[:, 0].min(), all_pts[:, 1].min(),
            all_pts[:, 0].max(), all_pts[:, 1].max())

    def header(file_words: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", file_words)
        h += struct.pack("<ii", 1000, _SHP_POLYGON)
        h += struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    body = b"".join(records)
    with open(path, "wb") as f:
        f.write(header((100 + len(body)) // 2))
        f.write(body)
    # .shx: 100-byte header + (offset, length) per record, big-endian words
    shx = b""
    off_words = 50
    for rec in records:
        content_words = (len(rec) - 8) // 2
        shx += struct.pack(">ii", off_words + 4, content_words)
        off_words += len(rec) // 2
    with open(os.path.splitext(path)[0] + ".shx", "wb") as f:
        f.write(header((100 + len(shx)) // 2))
        f.write(shx)


# ---------------------------------------------------------------------------
# .dbf (dBASE III, character fields — all the attribute table needs)
# ---------------------------------------------------------------------------

def read_dbf(path: str, encoding: str = "latin-1") -> list[dict[str, str]]:
    with open(path, "rb") as f:
        buf = f.read()
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    # crafted-input guards: rec_size 0 would stall the record loop on a
    # huge n_rec; an unterminated field directory would walk off the
    # buffer; more records than the buffer can hold is a lying header.
    if rec_size < 1 or hdr_size > len(buf):
        raise ValueError(f".dbf header declares rec_size={rec_size}, "
                         f"hdr_size={hdr_size} for a {len(buf)}-byte file")
    if n_rec > (len(buf) - hdr_size) // rec_size + 1:
        raise ValueError(f".dbf header declares {n_rec} records beyond "
                         "the file's extent")
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        if pos + 32 > hdr_size:
            raise ValueError(".dbf field directory is unterminated")
        name = buf[pos:pos + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    out = []
    pos = hdr_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            break  # trailing EOF byte / truncated tail
        if buf[pos:pos + 1] == b"*":  # deleted
            pos += rec_size
            continue
        rec, off = {}, pos + 1
        for name, _, flen in fields:
            rec[name] = buf[off:off + flen].decode(encoding).strip()
            off += flen
        out.append(rec)
        pos += rec_size
    return out


def write_dbf(path: str, rows: list[dict[str, str]],
              field_len: int = 80, encoding: str = "latin-1") -> None:
    names = list(rows[0]) if rows else ["ADMIN"]
    hdr_size = 32 + 32 * len(names) + 1
    rec_size = 1 + field_len * len(names)
    with open(path, "wb") as f:
        f.write(struct.pack("<BBBBIHH20x", 3, 24, 1, 1, len(rows),
                            hdr_size, rec_size))
        for n in names:
            f.write(n.encode("ascii").ljust(11, b"\0") + b"C"
                    + b"\0" * 4 + bytes([field_len]) + b"\0" * 15)
        f.write(b"\x0d")
        for r in rows:
            f.write(b" ")
            for n in names:
                f.write(str(r[n]).encode(encoding)[:field_len]
                        .ljust(field_len, b" "))
        f.write(b"\x1a")


# ---------------------------------------------------------------------------
# shapefile -> countries side table (S3)
# ---------------------------------------------------------------------------

def shapefile_to_countries(shp_path: str, out_parquet: str, *,
                           admin_field: str = "ADMIN",
                           a3_field: str = "SOV_A3") -> int:
    """Convert a polygon shapefile + its attribute table into the
    engine's ``countries.parquet`` WKB side table, normalizing ADMIN
    via admin_names.ADMIN_MAP. Features whose normalized admin is None
    stay in the table with admin=NULL and are dropped when the
    PolygonIndex is built (pipelines.extract.build_zonal_index — the
    reference's skip at extract_country_data.py:223-225). Returns the
    feature count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    geoms = read_shp(shp_path)
    attrs = read_dbf(os.path.splitext(shp_path)[0] + ".dbf")
    if len(attrs) != len(geoms):
        raise ValueError(f".dbf records ({len(attrs)}) != .shp records "
                         f"({len(geoms)})")
    rows = []
    for idx, (g, a) in enumerate(zip(geoms, attrs)):
        raw = a.get(admin_field, "")
        admin = normalize(raw)
        rows.append({"feature_idx": idx, "a3": a.get(a3_field, ""),
                     "admin_raw": raw, "admin": admin,
                     "geometry": wkb.dumps(g)})
    t = pa.table({
        "feature_idx": pa.array([r["feature_idx"] for r in rows], pa.int32()),
        "a3": [r["a3"] for r in rows],
        "admin_raw": [r["admin_raw"] for r in rows],
        "admin": [r["admin"] for r in rows],
        "geometry": pa.array([r["geometry"] for r in rows], pa.binary()),
    })
    os.makedirs(os.path.dirname(out_parquet) or ".", exist_ok=True)
    pq.write_table(t, out_parquet)
    return len(rows)

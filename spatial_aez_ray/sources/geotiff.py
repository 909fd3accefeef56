"""Minimal GeoTIFF reader/writer + raster -> tile-document importer.

The reference's universal source is GDAL ``band.ReadAsArray`` over
GeoTIFF rasters (/root/reference/extract_country_data.py:55-60,
process_imagery.py:218-227). GDAL/rasterio are not in this sandbox, so
this module implements the needed slice of the PUBLIC TIFF 6.0 spec
from scratch: baseline uncompressed, 8-bit, single-sample, striped
images with an optional 256-entry palette (ColorMap, tag 320) and the
two GeoTIFF geo-referencing tags (ModelPixelScale 33550, ModelTiepoint
33922 — a GDAL north-up geotransform). That covers every raster the
reference consumes (KG palette map, LCCS codes, workability classes,
LPD) and produces (classified uint8 rasters with a color table,
process_imagery.py:300-395).

``import_geotiff`` is the S1 ingestion path: raster -> interleaved
tile documents + sibling media rows in the engine's world layout,
after which every pipeline (zonal, AEZ, render, downsample) runs
unchanged. The import itself streams strip-by-strip per tile row, so
a planet-scale raster never has to fit in memory.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

from .. import model

# TIFF tag ids (TIFF 6.0 spec §8; GeoTIFF spec §2.6.1)
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC = 258, 259, 262
_T_STRIP_OFFSETS, _T_SAMPLES, _T_ROWS_PER_STRIP = 273, 277, 278
_T_STRIP_COUNTS, _T_COLOR_MAP = 279, 320
_T_PIXEL_SCALE, _T_TIEPOINT = 33550, 33922

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 3, 4, 12
_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8}


@dataclass
class GeoTiff:
    """One decoded band + its palette and geo-referencing."""

    array: np.ndarray                      # (rows, cols) uint8
    color_map: np.ndarray | None           # (256, 3) uint8 RGB or None
    pixel_scale: tuple | None              # (sx, sy, sz)
    tiepoint: tuple | None                 # (i, j, k, x, y, z)

    @property
    def geotransform(self) -> tuple | None:
        """GDAL-style (x_min, x_size, 0, y_max, 0, -y_size)."""
        if self.pixel_scale is None or self.tiepoint is None:
            return None
        i, j, _, x, y, _ = self.tiepoint
        sx, sy, _ = self.pixel_scale
        return (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)


def write_geotiff(path: str, arr: np.ndarray, *,
                  color_map: np.ndarray | None = None,
                  pixel_scale: tuple | None = None,
                  tiepoint: tuple | None = None,
                  rows_per_strip: int = 64) -> None:
    """Baseline little-endian TIFF: uint8, one sample, uncompressed
    strips; palette + geo tags optional."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("writer supports single-band uint8 rasters")
    h, w = arr.shape
    strips = [np.ascontiguousarray(arr[r:r + rows_per_strip]).tobytes()
              for r in range(0, h, rows_per_strip)]

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, cnt, raw

    def add(tag: int, typ: int, values) -> None:
        fmt = {_TYPE_SHORT: "<H", _TYPE_LONG: "<I", _TYPE_DOUBLE: "<d"}[typ]
        raw = b"".join(struct.pack(fmt, v) for v in values)
        entries.append((tag, typ, len(values), raw))

    add(_T_WIDTH, _TYPE_LONG, [w])
    add(_T_HEIGHT, _TYPE_LONG, [h])
    add(_T_BITS, _TYPE_SHORT, [8])
    add(_T_COMPRESSION, _TYPE_SHORT, [1])
    add(_T_PHOTOMETRIC, _TYPE_SHORT, [3 if color_map is not None else 1])
    strip_off_idx = len(entries)
    add(_T_STRIP_OFFSETS, _TYPE_LONG, [0] * len(strips))  # patched below
    add(_T_SAMPLES, _TYPE_SHORT, [1])
    add(_T_ROWS_PER_STRIP, _TYPE_LONG, [rows_per_strip])
    add(_T_STRIP_COUNTS, _TYPE_LONG, [len(s) for s in strips])
    if color_map is not None:
        cm = np.asarray(color_map, dtype=np.uint16)
        if cm.shape != (256, 3):
            raise ValueError("color_map must be (256, 3)")
        # TIFF color maps are 16-bit per channel, R block then G then B
        vals = np.concatenate([cm[:, 0], cm[:, 1], cm[:, 2]]) * 257
        add(_T_COLOR_MAP, _TYPE_SHORT, vals.tolist())
    if pixel_scale is not None:
        add(_T_PIXEL_SCALE, _TYPE_DOUBLE, list(pixel_scale))
    if tiepoint is not None:
        add(_T_TIEPOINT, _TYPE_DOUBLE, list(tiepoint))

    # layout: header | strips | IFD | overflow values
    data_start = 8
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_off = pos
    entries[strip_off_idx] = (
        _T_STRIP_OFFSETS, _TYPE_LONG, len(strips),
        b"".join(struct.pack("<I", o) for o in strip_offsets))

    ifd_size = 2 + 12 * len(entries) + 4
    overflow_pos = ifd_off + ifd_size
    ifd = struct.pack("<H", len(entries))
    overflow = b""
    for tag, typ, cnt, raw in sorted(entries):
        if len(raw) <= 4:
            val = raw + b"\0" * (4 - len(raw))
        else:
            val = struct.pack("<I", overflow_pos + len(overflow))
            overflow += raw
        ifd += struct.pack("<HHI", tag, typ, cnt) + val
    ifd += struct.pack("<I", 0)  # no next IFD

    with open(path, "wb") as f:
        f.write(b"II*\0" + struct.pack("<I", ifd_off))
        for s in strips:
            f.write(s)
        f.write(ifd)
        f.write(overflow)


def read_geotiff(path: str) -> GeoTiff:
    """Decode the baseline slice of TIFF 6.0 this engine ingests
    (either byte order; uncompressed uint8 single-sample strips)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_off = struct.unpack_from(e + "HI", buf, 2)
    if magic != 42:
        raise ValueError("not a TIFF file (bad magic)")

    n, = struct.unpack_from(e + "H", buf, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI", buf, ifd_off + 2 + 12 * i)
        if typ not in _TYPE_SIZE:
            continue  # tag types we don't model (ASCII, rational, ...)
        size = _TYPE_SIZE[typ] * cnt
        voff = ifd_off + 2 + 12 * i + 8
        if size > 4:
            voff, = struct.unpack_from(e + "I", buf, voff)
        fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
        tags[tag] = list(struct.unpack_from(e + fmt * cnt, buf, voff))

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    if one(_T_COMPRESSION, 1) != 1:
        raise ValueError("only uncompressed baseline TIFF is supported")
    if one(_T_BITS, 8) != 8 or one(_T_SAMPLES, 1) != 1:
        raise ValueError("only 8-bit single-sample rasters are supported")
    w, h = one(_T_WIDTH), one(_T_HEIGHT)
    rps = one(_T_ROWS_PER_STRIP, h)
    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags[_T_STRIP_COUNTS]
    arr = np.empty((h, w), dtype=np.uint8)
    row = 0
    for off, cnt in zip(offsets, counts):
        rows = min(rps, h - row)
        strip = np.frombuffer(buf, np.uint8, count=rows * w, offset=off)
        arr[row:row + rows] = strip.reshape(rows, w)
        row += rows
    cm = None
    if _T_COLOR_MAP in tags:
        v = np.asarray(tags[_T_COLOR_MAP], dtype=np.uint32).reshape(3, 256)
        cm = (v // 257).astype(np.uint8).T  # back to 8-bit RGB
    ps = tuple(tags[_T_PIXEL_SCALE]) if _T_PIXEL_SCALE in tags else None
    tp = tuple(tags[_T_TIEPOINT]) if _T_TIEPOINT in tags else None
    return GeoTiff(array=arr, color_map=cm, pixel_scale=ps, tiepoint=tp)


# ---------------------------------------------------------------------------
# KG palette -> legend-index decode (reference M3,
# extract_country_data.py:39-70: palette index -> RGB -> KG class)
# ---------------------------------------------------------------------------

def kg_palette_lut(color_map: np.ndarray) -> np.ndarray:
    """256-entry LUT palette-index -> KG legend index (1..30; 0 for
    blank/unknown). Blank == white or black pixels are 'masked off,
    just skip it' in the reference (extract_country_data.py:63-66)."""
    from ..constants import KG_CLASSES, KG_COLORS

    class_idx = {c: i + 1 for i, c in enumerate(KG_CLASSES)}
    lut = np.zeros(256, dtype=np.uint8)
    for i, (r, g, b) in enumerate(np.asarray(color_map, dtype=np.int64)):
        cls = KG_COLORS.get((int(r), int(g), int(b)))
        if cls is not None:
            lut[i] = class_idx[cls]
    return lut


def kg_palette_remap(arr: np.ndarray, color_map: np.ndarray) -> np.ndarray:
    """Palette raster -> legend-index raster (what the world fixtures
    store directly); vectorized LUT take."""
    return kg_palette_lut(color_map)[arr]


# ---------------------------------------------------------------------------
# raster -> interleaved tile documents (S1 importer)
# ---------------------------------------------------------------------------

def import_geotiff(tiff_path: str, world_path: str, dataset: str,
                   grid_name: str, tile_edge: int, *,
                   nodata: int = 0, decode_kg_palette: bool = False,
                   rows_per_part: int = 8) -> dict:
    """Convert a GeoTIFF into the engine's interleaved tile-document
    world layout: ``{world}/documents/dataset={ds}/part-*.parquet`` +
    sibling media parts. Tiles stream out in row-major (doc_id sort)
    order, ``rows_per_part`` tile-rows per part file, so part min/max
    statistics form tight intervals for the MediaStore footer index.

    Returns a summary dict (tiles, parts, shape).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    gt = read_geotiff(tiff_path)
    arr = gt.array
    if decode_kg_palette:
        if gt.color_map is None:
            raise ValueError("decode_kg_palette=True needs a palette TIFF")
        arr = kg_palette_remap(arr, gt.color_map)
    h, w = arr.shape
    tiles_y = (h + tile_edge - 1) // tile_edge
    tiles_x = (w + tile_edge - 1) // tile_edge

    ddir = os.path.join(world_path, "documents", f"dataset={dataset}")
    mdir = os.path.join(world_path, "media", f"dataset={dataset}")
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    part = 0
    for ty0 in range(0, tiles_y, rows_per_part):
        docs, refs, payloads = [], [], []
        for ty in range(ty0, min(ty0 + rows_per_part, tiles_y)):
            for tx in range(tiles_x):
                y0, x0 = ty * tile_edge, tx * tile_edge
                tile = arr[y0:y0 + tile_edge, x0:x0 + tile_edge]
                docs.append(model.make_document(
                    dataset, grid_name, ty, tx, x0, y0,
                    tile.shape[1], tile.shape[0], bands=1, nodata=nodata))
                refs.append(model.media_ref(dataset, grid_name, ty, tx, 1))
                payloads.append(model.encode_tile(tile))
        doc_t = pa.Table.from_pylist(docs, schema=model.DOCUMENTS_SCHEMA)
        med_t = pa.table({"media_ref": pa.array(refs),
                          "payload": pa.array(payloads, pa.binary())},
                         schema=model.MEDIA_SCHEMA)
        pq.write_table(doc_t, os.path.join(ddir, f"part-{part:05d}.parquet"),
                       row_group_size=max(8, len(docs) // 4))
        pq.write_table(med_t, os.path.join(mdir, f"part-{part:05d}.parquet"),
                       row_group_size=64)
        part += 1
    return {"tiles": tiles_y * tiles_x, "parts": part, "shape": (h, w),
            "tiles_y": tiles_y, "tiles_x": tiles_x,
            "geotransform": gt.geotransform}

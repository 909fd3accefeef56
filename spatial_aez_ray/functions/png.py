"""Minimal PNG encoder/decoder (stdlib zlib only).

The reference emits PNG thumbnails via ``gdal_translate -of PNG``
(/root/reference/process_imagery.py:500-508). No imaging libraries
exist in this sandbox, but PNG itself is a simple public format
(RFC 2083): the encoder writes 8-bit greyscale (color type 0) and
8-bit indexed (color type 3, PLTE) images with filter-0 scanlines —
exactly what classified-raster thumbnails need. The decoder reads
8-bit color types 0 (grey), 2 (truecolor RGB) and 3 (indexed) with
the full adaptive filter set 0-4 (None/Sub/Up/Average/Paeth), enough
to read real libpng/GDAL output such as the reference's published
``results/*_small.png`` thumbnails.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by PNG color type (8-bit depths we accept)
_CHANNELS = {0: 1, 2: 3, 3: 1}

#: decoded-pixel budget: a crafted IHDR must not drive allocation; the
#: biggest legitimate client is a render-tile mosaic thumbnail, far
#: below this. Same bounded-decode posture as functions/zstd.py.
MAX_DECODE_BYTES = 1 << 28  # 256 MiB


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(H, W) uint8 -> PNG bytes; indexed color when a (<=256, 3)
    palette is given, greyscale otherwise."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("encode_png expects a (H, W) uint8 array")
    h, w = arr.shape
    color_type = 3 if palette is not None else 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if palette is not None:
        p = np.asarray(palette, dtype=np.uint8)
        if p.ndim != 2 or p.shape[1] != 3 or len(p) > 256:
            raise ValueError("palette must be (<=256, 3) uint8")
        out.append(_chunk(b"PLTE", p.tobytes()))
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    out.append(_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """RFC 2083 §6: reverse per-scanline filters. Returns (h, w*bpp).

    Filters 0/1/2 are vectorized (Sub is a per-lane cumulative sum mod
    256); Average and Paeth have an in-row data dependence and fall to
    a per-byte loop — fine for thumbnail-sized images."""
    stride = w * bpp + 1
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.int32)
    for r in range(h):
        row = raw[r * stride:(r + 1) * stride]
        f = row[0]
        cur = np.frombuffer(row, np.uint8, count=w * bpp,
                            offset=1).astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp]
            rec = (np.cumsum(cur.reshape(-1, bpp), axis=0)
                   & 0xFF).reshape(-1)
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (3, 4):
            rec = np.empty_like(cur)
            n = w * bpp
            for x in range(n):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                if f == 3:  # Average
                    rec[x] = (cur[x] + ((left + up) >> 1)) & 0xFF
                else:  # Paeth
                    ul = prev[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> tuple[np.ndarray, np.ndarray | None]:
    """PNG bytes -> (pixels, palette or None).

    Pixels are (H, W) uint8 for color types 0/3 and (H, W, 3) uint8
    for truecolor (type 2). 8-bit, non-interlaced only."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ctype = None
    palette = None
    idat = []
    while pos + 12 <= len(data):
        ln, = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        crc, = struct.unpack_from(">I", data, pos + 8 + ln)
        if crc != (zlib.crc32(typ + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in _CHANNELS or ilace:
                raise ValueError(
                    "decoder supports 8-bit ctype 0/2/3, no interlace")
            if w == 0 or h == 0 or \
                    h * (w * _CHANNELS[ctype] + 1) > MAX_DECODE_BYTES:
                raise ValueError(
                    f"PNG dimensions {w}x{h} outside decoder budget")
        elif typ == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3).copy()
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG has no IHDR")
    bpp = _CHANNELS[ctype]
    # bound inflation by the image's own raw size: a zlib bomb in IDAT
    # cannot allocate past the (already-capped) IHDR geometry
    want = h * (w * bpp + 1)
    raw = zlib.decompressobj().decompress(b"".join(idat), want)
    flat = _unfilter(raw, h, w, bpp)
    arr = flat.reshape(h, w, 3) if ctype == 2 else flat.reshape(h, w)
    return arr, palette

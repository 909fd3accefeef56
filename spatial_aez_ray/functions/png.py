"""Minimal PNG encoder/decoder (stdlib zlib only).

The reference emits PNG thumbnails via ``gdal_translate -of PNG``
(/root/reference/process_imagery.py:500-508). No imaging libraries
exist in this sandbox, but PNG itself is a simple public format
(RFC 2083): this implements 8-bit greyscale (color type 0) and
8-bit indexed (color type 3, PLTE) images with filter 0 scanlines —
exactly what classified-raster thumbnails need. The decoder exists so
tests can verify the encoder without external tools; it accepts only
what the encoder produces (plus any filter-0 stream).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


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


def decode_png(data: bytes) -> tuple[np.ndarray, np.ndarray | None]:
    """PNG bytes -> ((H, W) uint8, palette or None). Filter 0 only."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    palette = None
    idat = b""
    while pos < len(data):
        ln, = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        crc, = struct.unpack_from(">I", data, pos + 8 + ln)
        if crc != (zlib.crc32(typ + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 3) or ilace:
                raise ValueError("decoder supports 8-bit ctype 0/3 only")
        elif typ == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3).copy()
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    arr = np.empty((h, w), dtype=np.uint8)
    stride = w + 1
    for r in range(h):
        row = raw[r * stride:(r + 1) * stride]
        if row[0] != 0:
            raise ValueError("only filter 0 scanlines supported")
        arr[r] = np.frombuffer(row, np.uint8, count=w, offset=1)
    return arr, palette

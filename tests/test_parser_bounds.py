"""Crafted-input bounds on the from-scratch parsers (.shp/.dbf/TIFF),
matching the allocation/termination discipline already applied to the
PNG and zstd decoders: a lying header must produce a typed ValueError,
never an unbounded allocation, an out-of-frame read, or a hang.
"""

import struct

import numpy as np
import pytest

from spatial_aez_ray.sources import geotiff, shapefile


def _shp_header() -> bytearray:
    buf = bytearray(100)
    struct.pack_into(">i", buf, 0, 9994)
    struct.pack_into("<i", buf, 32, 5)  # polygon
    return buf


def _shp_with_record(content: bytes, content_words: int | None = None):
    buf = _shp_header()
    words = len(content) // 2 if content_words is None else content_words
    buf += struct.pack(">ii", 1, words) + content
    return bytes(buf)


def _write(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_shp_negative_record_length_terminates(tmp_path):
    # content_words < 0 once moved the cursor backward -> infinite loop
    data = _shp_with_record(struct.pack("<i", 5) + b"\0" * 60,
                            content_words=-5)
    with pytest.raises(ValueError, match="invalid content length"):
        shapefile.read_shp(_write(tmp_path, "neg.shp", data))


def test_shp_point_count_beyond_record(tmp_path):
    content = struct.pack("<i", 5) + b"\0" * 32          # type + bbox
    content += struct.pack("<ii", 1, 1_000_000)          # lying n_points
    content += struct.pack("<i", 0)                      # parts[0]
    data = _shp_with_record(content)
    with pytest.raises(ValueError, match="beyond its content"):
        shapefile.read_shp(_write(tmp_path, "lying.shp", data))


def test_shp_non_monotone_parts(tmp_path):
    pts = np.zeros((6, 2), "<f8")
    content = struct.pack("<i", 5) + b"\0" * 32
    content += struct.pack("<ii", 2, 6)                  # 2 parts, 6 pts
    content += struct.pack("<ii", 5, 2)                  # decreasing
    content += pts.tobytes()
    data = _shp_with_record(content)
    with pytest.raises(ValueError, match="non-monotone"):
        shapefile.read_shp(_write(tmp_path, "parts.shp", data))


def _dbf_bytes(n_rec, hdr_size, rec_size, body=b""):
    hdr = struct.pack("<BBBBIHH20x", 3, 24, 1, 1, n_rec, hdr_size,
                      rec_size)
    fld = b"ADMIN".ljust(11, b"\0") + b"C" + b"\0" * 4 + bytes([4]) \
        + b"\0" * 15
    return hdr + fld + b"\x0d" + body


def test_dbf_zero_record_size(tmp_path):
    data = _dbf_bytes(n_rec=2 ** 31, hdr_size=65, rec_size=0)
    with pytest.raises(ValueError, match="rec_size=0"):
        shapefile.read_dbf(_write(tmp_path, "zero.dbf", data))


def test_dbf_record_count_beyond_file(tmp_path):
    data = _dbf_bytes(n_rec=10 ** 9, hdr_size=65, rec_size=5,
                      body=b" " * 10)
    with pytest.raises(ValueError, match="beyond"):
        shapefile.read_dbf(_write(tmp_path, "huge.dbf", data))


def test_dbf_unterminated_field_directory(tmp_path):
    data = _dbf_bytes(1, hdr_size=65, rec_size=5)
    data = data.replace(b"\x0d", b"\x00", 1)  # kill the terminator
    with pytest.raises(ValueError, match="unterminated"):
        shapefile.read_dbf(_write(tmp_path, "unterm.dbf", data))


def test_dbf_truncated_tail_is_tolerated(tmp_path):
    # a legal file whose last record is cut off: parse what is there
    body = b" AAAA" + b" BB"  # record 2 truncated
    data = _dbf_bytes(2, hdr_size=65, rec_size=5, body=body)
    rows = shapefile.read_dbf(_write(tmp_path, "trunc.dbf", data))
    assert rows == [{"ADMIN": "AAAA"}]


def test_tiff_tag_count_beyond_file(tmp_path):
    # one LONG tag claiming 2^20 values with its payload at EOF
    ifd = struct.pack("<H", 1)
    ifd += struct.pack("<HHII", 256, 4, 1 << 20, 64)
    ifd += struct.pack("<I", 0)
    data = b"II*\0" + struct.pack("<I", 8) + ifd
    p = _write(tmp_path, "lying.tif", data)
    with pytest.raises(ValueError, match="beyond the file's extent"):
        geotiff.GeoTiffReader(p)


def test_cog_ifd_cycle_detected(tmp_path):
    p = str(tmp_path / "cycle.tif")
    geotiff.write_geotiff(p, np.arange(16, dtype=np.uint8).reshape(4, 4))
    buf = bytearray(open(p, "rb").read())
    ifd_off, = struct.unpack_from("<I", buf, 4)
    n, = struct.unpack_from("<H", buf, ifd_off)
    next_pos = ifd_off + 2 + 12 * n
    struct.pack_into("<I", buf, next_pos, ifd_off)  # self-loop
    open(p, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="cycles or exceeds"):
        geotiff.read_cog_pages(p)

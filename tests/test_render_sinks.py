"""PNG thumbnails + classified-raster GeoTIFF sink (S6/S8 real formats)."""

import os

import numpy as np

from spatial_aez_ray.functions.png import decode_png, encode_png


def test_png_roundtrip_gray_and_palette():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(31, 47), dtype=np.uint8)
    a2, p2 = decode_png(encode_png(arr))
    assert (a2 == arr).all() and p2 is None
    pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    a3, p3 = decode_png(encode_png(arr, pal))
    assert (a3 == arr).all() and (p3 == pal).all()


def test_thumbnails_as_real_png(tiny_world, ray_session):
    from spatial_aez_ray import model
    from spatial_aez_ray.pipelines import downsample
    from spatial_aez_ray.sources.documents import MediaStore

    raw = downsample.thumbnail_tiles(tiny_world, "kg", stride=8).take_all()
    png = downsample.thumbnail_tiles(tiny_world, "kg", stride=8,
                                     encode="png").take_all()
    raw_by_id = {r["doc_id"]: r for r in raw}
    assert len(png) == len(raw) > 0
    for r in png:
        arr, pal = decode_png(r["payload"])
        want = raw_by_id[r["doc_id"]]
        assert arr.shape == (want["nrows"], want["ncols"])
        assert arr.tobytes() == want["payload"]
        assert pal is None


def test_export_render_geotiff_mosaic(tiny_world, ray_session, tmp_path):
    from spatial_aez_ray import model
    from spatial_aez_ray.pipelines import render
    from spatial_aez_ray.pipelines.extract import world_grid
    from spatial_aez_ray.sources.geotiff import read_geotiff

    out_world = str(tmp_path / "rendered")
    render.produce_render_tiles(tiny_world, out_world)
    g3 = world_grid(tiny_world, "g3")
    tif = str(tmp_path / "aez.tif")
    rep = render.export_render_geotiff(out_world, "render_aez", tif, g3)
    assert rep["shape"] == (g3.height, g3.width)
    gt = read_geotiff(tif)
    assert gt.array.shape == (g3.height, g3.width)
    assert (gt.color_map == render.render_color_table("render_aez")).all()
    assert gt.geotransform[0] == -180.0 and gt.geotransform[3] == 90.0
    # mosaic content == the rendered tiles themselves
    from spatial_aez_ray.sources.documents import MediaStore, read_documents
    docs = read_documents(out_world, ["render_aez"]).take_all()
    ms = MediaStore(out_world)
    for d in docs[:5]:
        meta = model.parse_meta(d["spans"])
        ref = model.media_refs(d["spans"])[0]
        tile = model.decode_tile(ms.fetch([ref])[ref],
                                 meta["nrows"], meta["ncols"])
        got = gt.array[meta["y_off"]:meta["y_off"] + meta["nrows"],
                       meta["x_off"]:meta["x_off"] + meta["ncols"]]
        assert (got == tile).all()


def test_aez_color_ramp_endpoints():
    from spatial_aez_ray.pipelines.render import render_color_table
    cm = render_color_table("render_aez")
    assert tuple(cm[0]) == (0, 192, 0) and tuple(cm[29]) == (0, 255, 0)
    assert tuple(cm[210]) == (64, 64, 64) and tuple(cm[239]) == (192, 192, 192)
    assert tuple(cm[255]) == (0, 0, 0)

def _filter_rows(img: np.ndarray, filters: list, bpp: int) -> bytes:
    """Forward-apply RFC 2083 filters (independent reimplementation,
    per-byte from the spec) to build decoder test vectors."""
    h, n = img.shape[0], img.shape[1] * bpp
    flat = img.reshape(h, n).astype(np.int32)
    out = bytearray()
    prev = np.zeros(n, dtype=np.int32)
    for r, f in zip(range(h), filters):
        cur = flat[r]
        row = bytearray([f])
        for x in range(n):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else ul)
            row.append((int(cur[x]) - pred) & 0xFF)
        out += row
        prev = cur
    return bytes(out)


def _wrap_png(w, h, ctype, raw):
    import struct
    import zlib
    from spatial_aez_ray.functions import png as P
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(raw))
            + P._chunk(b"IEND", b""))


def test_png_decode_adaptive_filters_gray():
    """Decoder handles all five filter types (libpng writes adaptive
    streams the filter-0-only encoder never produces)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(10, 23), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    data = _wrap_png(23, 10, 0, _filter_rows(img[..., None], filters, 1))
    arr, pal = decode_png(data)
    assert (arr == img).all() and pal is None


def test_png_decode_adaptive_filters_rgb():
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, size=(9, 17, 3), dtype=np.uint8)
    filters = [4, 3, 2, 1, 0, 1, 2, 3, 4]
    data = _wrap_png(17, 9, 2, _filter_rows(img, filters, 3))
    arr, pal = decode_png(data)
    assert arr.shape == (9, 17, 3) and (arr == img).all() and pal is None


def test_png_decode_bounded_against_crafted_input():
    """Typed errors, capped allocation (same posture as the zstd
    decoder): huge-IHDR and zlib-bomb inputs must fail cheaply."""
    import pytest
    from spatial_aez_ray.functions import png as P
    import struct, zlib
    # IHDR claiming ~4 Tpx: rejected before any allocation
    huge = _wrap_png(2_000_000, 2_000_000, 0, b"")
    with pytest.raises(ValueError, match="decoder budget"):
        decode_png(huge)
    with pytest.raises(ValueError, match="decoder budget"):
        decode_png(_wrap_png(0, 5, 0, b""))
    # zlib bomb: tiny IDAT inflating past the declared 4x4 geometry
    bomb = zlib.compress(b"\x00" * (1 << 20))
    data = (b"\x89PNG\r\n\x1a\n"
            + P._chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + P._chunk(b"IDAT", bomb) + P._chunk(b"IEND", b""))
    arr, _ = decode_png(data)  # decompression stops at 4x(4+1) bytes
    assert arr.shape == (4, 4) and (arr == 0).all()
    # truncated pixel data is a typed error, not an exception from numpy
    short = zlib.compress(b"\x00" * 7)
    data = (b"\x89PNG\r\n\x1a\n"
            + P._chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + P._chunk(b"IDAT", short) + P._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(data)


def test_histogram_match_bit_exact_and_monotone(tiny_world):
    from spatial_aez_ray import fixtures, oracle
    from spatial_aez_ray.pipelines import downsample as dsm
    mine = dsm.histogram_match_report(tiny_world)
    assert mine.equals(oracle.histogram_match_oracle(fixtures.TINY))
    mv = mine["matched_value"].to_numpy()
    assert (mv[1:] >= mv[:-1]).all()      # CDF matching is monotone
    # mass conservation: every src pixel lands somewhere
    assert mine.drop_duplicates("matched_value")["n_matched"].sum() \
        == mine["n_src"].sum()


def test_match_histogram_lut_identity():
    import numpy as np
    from spatial_aez_ray.pipelines.downsample import match_histogram_lut
    h = np.zeros(256, dtype=np.int64)
    h[[3, 7, 200]] = [10, 20, 5]
    lut = match_histogram_lut(h, h, nodata=255)
    # matching a histogram to itself maps occupied values to themselves
    assert lut[3] == 3 and lut[7] == 7 and lut[200] == 200
    assert lut[255] == 255

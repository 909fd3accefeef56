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

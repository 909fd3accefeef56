"""GeoTIFF codec + importer and shapefile/.dbf converter (S1/S3)."""

import os

import numpy as np
import pytest

from spatial_aez_ray import model, wkb
from spatial_aez_ray.constants import KG_CLASSES, KG_COLORS
from spatial_aez_ray.sources import geotiff, shapefile
from spatial_aez_ray.sources.documents import MediaStore, read_documents


def test_tiff_roundtrip_plain(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, size=(100, 37), dtype=np.uint8)
    p = str(tmp_path / "t.tif")
    geotiff.write_geotiff(p, arr, rows_per_strip=16)
    gt = geotiff.read_geotiff(p)
    assert (gt.array == arr).all()
    assert gt.color_map is None and gt.geotransform is None


def test_tiff_roundtrip_palette_and_geo(tmp_path):
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 31, size=(64, 64), dtype=np.uint8)
    cm = np.zeros((256, 3), dtype=np.uint8)
    cm[255] = (255, 255, 255)
    for i, cls in enumerate(KG_CLASSES):
        rgb = [k for k, v in KG_COLORS.items() if v == cls][0]
        cm[i + 1] = rgb
    p = str(tmp_path / "pal.tif")
    geotiff.write_geotiff(p, arr, color_map=cm,
                          pixel_scale=(0.5, 0.5, 0.0),
                          tiepoint=(0, 0, 0, -180.0, 90.0, 0.0))
    gt = geotiff.read_geotiff(p)
    assert (gt.array == arr).all()
    assert (gt.color_map == cm).all()
    assert gt.geotransform == (-180.0, 0.5, 0.0, 90.0, 0.0, -0.5)


def test_kg_palette_decode_matches_legend():
    """palette index -> RGB -> class == the direct legend index the
    synthetic worlds store (M3, extract_country_data.py:39-70)."""
    cm = np.zeros((256, 3), dtype=np.uint8)
    # scatter KG colors over arbitrary palette slots + blanks
    slots = {}
    for i, cls in enumerate(KG_CLASSES):
        slot = 40 + i * 3
        rgb = [k for k, v in KG_COLORS.items() if v == cls][0]
        cm[slot] = rgb
        slots[slot] = i + 1
    cm[0] = (255, 255, 255)  # white = blank
    arr = np.array([[0, 40, 43], [46, 200, 40 + 29 * 3]], dtype=np.uint8)
    out = geotiff.kg_palette_remap(arr, cm)
    want = np.array([[0, 1, 2], [3, 0, 30]], dtype=np.uint8)
    assert (out == want).all()


def test_import_geotiff_world_roundtrip(tmp_path, ray_session):
    """raster -> tile documents -> MediaStore reassembly == original."""
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(48, 80), dtype=np.uint8)
    tif = str(tmp_path / "in.tif")
    geotiff.write_geotiff(tif, arr)
    wp = str(tmp_path / "world")
    rep = geotiff.import_geotiff(tif, wp, "imp", "g1", tile_edge=16,
                                 rows_per_part=2)
    assert rep["tiles"] == 3 * 5 and rep["shape"] == (48, 80)
    docs = read_documents(wp, ["imp"]).take_all()
    assert sorted(d["doc_id"] for d in docs) == \
        [d["doc_id"] for d in sorted(docs, key=lambda d: d["doc_id"])]
    ms = MediaStore(wp)
    rebuilt = np.zeros_like(arr)
    for d in docs:
        meta = model.parse_meta(d["spans"])
        ref = model.media_refs(d["spans"])[0]
        tile = model.decode_tile(ms.fetch([ref])[ref],
                                 meta["nrows"], meta["ncols"])
        rebuilt[meta["y_off"]:meta["y_off"] + meta["nrows"],
                meta["x_off"]:meta["x_off"] + meta["ncols"]] = tile
    assert (rebuilt == arr).all()


def _square(cx, cy, r, clockwise=True):
    pts = [(cx - r, cy - r), (cx - r, cy + r), (cx + r, cy + r),
           (cx + r, cy - r), (cx - r, cy - r)]
    if not clockwise:
        pts = pts[::-1]
    return np.array(pts, dtype=np.float64)


def test_shp_roundtrip_with_hole(tmp_path):
    outer = _square(0, 0, 10, clockwise=True)
    hole = _square(0, 0, 3, clockwise=False)
    outer2 = _square(30, 0, 5, clockwise=True)
    geoms = [[[outer, hole]], [[outer2]]]
    p = str(tmp_path / "a.shp")
    shapefile.write_shp(p, geoms)
    back = shapefile.read_shp(p)
    assert len(back) == 2
    assert len(back[0]) == 1 and len(back[0][0]) == 2  # poly with hole
    assert (back[0][0][0] == outer).all() and (back[0][0][1] == hole).all()
    assert len(back[1]) == 1 and (back[1][0][0] == outer2).all()
    assert os.path.exists(str(tmp_path / "a.shx"))


def test_dbf_roundtrip_non_ascii(tmp_path):
    rows = [{"ADMIN": "Ivory Coast", "SOV_A3": "CIV"},
            {"ADMIN": "Russia", "SOV_A3": "RUS"}]
    p = str(tmp_path / "a.dbf")
    shapefile.write_dbf(p, rows)
    back = shapefile.read_dbf(p)
    assert back == rows


def test_shapefile_to_countries_normalizes(tmp_path):
    import pyarrow.parquet as pq
    geoms = [[[_square(0, 0, 5)]], [[_square(20, 0, 5)]],
             [[_square(40, 0, 5)]]]
    shp = str(tmp_path / "ne.shp")
    shapefile.write_shp(shp, geoms)
    shapefile.write_dbf(str(tmp_path / "ne.dbf"), [
        {"ADMIN": "Russia", "SOV_A3": "RUS"},
        {"ADMIN": "Kosovo", "SOV_A3": "KOS"},
        {"ADMIN": "France", "SOV_A3": "FRA"}])
    out = str(tmp_path / "countries.parquet")
    n = shapefile.shapefile_to_countries(shp, out)
    assert n == 3
    t = pq.read_table(out)
    assert t.column("admin").to_pylist() == [
        "Russian Federation", None, "France"]
    assert t.column("admin_raw").to_pylist() == [
        "Russia", "Kosovo", "France"]
    g = wkb.loads(t.column("geometry")[2].as_py())
    assert (g[0][0] == _square(40, 0, 5)).all()


def test_real_format_ingestion_end_to_end(tmp_path, ray_session):
    """The full reference ingestion path on real formats: KG palette
    GeoTIFF (palette->RGB->class decode) + Natural-Earth-style
    .shp/.dbf countries -> imported world -> zonal_stats == a direct
    numpy zonal oracle over the same raster."""
    import pyarrow.parquet as pq
    from spatial_aez_ray import geo
    from spatial_aez_ray.pipelines import extract

    grid = geo.GridSpec("g1", 128, 64, 16)
    rng = np.random.RandomState(7)
    classes = rng.randint(0, 31, size=(64, 128), dtype=np.uint8)  # legend
    # palette: legend index i lives at palette slot 2*i (0 stays blank)
    cm = np.zeros((256, 3), dtype=np.uint8)
    for i, cls in enumerate(KG_CLASSES):
        rgb = [k for k, v in KG_COLORS.items() if v == cls][0]
        cm[2 * (i + 1)] = rgb
    palette_raster = (classes * 2).astype(np.uint8)  # 0 -> blank slot 0
    tif = str(tmp_path / "kg.tif")
    geotiff.write_geotiff(tif, palette_raster, color_map=cm,
                          pixel_scale=(2.8125, 2.8125, 0),
                          tiepoint=(0, 0, 0, -180.0, 90.0, 0))
    wp = str(tmp_path / "world")
    geotiff.import_geotiff(tif, wp, "kg", "g1", tile_edge=16,
                           decode_kg_palette=True)

    # two rectangle countries, edges between cell centers
    def rect(lo0, la0, lo1, la1):
        return [[np.array([(lo0, la0), (lo0, la1), (lo1, la1),
                           (lo1, la0), (lo0, la0)], dtype=np.float64)]]

    shp = str(tmp_path / "ne.shp")
    shapefile.write_shp(shp, [rect(-100, -40, -20, 40),
                              rect(20, -20, 100, 50)])
    shapefile.write_dbf(str(tmp_path / "ne.dbf"), [
        {"ADMIN": "Russia", "SOV_A3": "RUS"},
        {"ADMIN": "France", "SOV_A3": "FRA"}])
    shapefile.shapefile_to_countries(
        shp, os.path.join(wp, "countries.parquet"))

    df = extract.zonal_stats(wp, "kg", grid=grid)
    assert list(df.index) == ["France", "Russian Federation"]

    # independent numpy oracle: cell-center-in-rectangle + km2 weights
    lons = grid.lons(0, 128)
    lats = grid.lats(0, 64)
    km2 = geo.km2_rows(64, 0, grid)[:, None] * np.ones((1, 128))
    rects = {"Russian Federation": (-100, -40, -20, 40),
             "France": (20, -20, 100, 50)}
    want = {a: np.zeros(30) for a in rects}
    lon_g, lat_g = np.meshgrid(lons, lats)
    for admin, (lo0, la0, lo1, la1) in rects.items():
        inside = ((lon_g > lo0) & (lon_g < lo1)
                  & (lat_g > la0) & (lat_g < la1))
        for c in range(1, 31):
            want[admin][c - 1] = km2[inside & (classes == c)].sum()
    for admin in rects:
        got = df.loc[admin].to_numpy()
        assert np.allclose(got, want[admin], rtol=1e-9), admin
        assert got.sum() > 0


# ---------------------------------------------------------------------------
# compressed / tiled / sub-byte codec paths (the formats the actual
# reference rasters use: process_imagery.py:302-306,332,353,379 and
# prepare_feature_masks.py:44-45)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nbits", [1, 2, 3, 4, 7, 8])
@pytest.mark.parametrize("layout", ["strips", "tiled"])
def test_tiff_roundtrip_deflate_nbits(tmp_path, nbits, layout):
    rng = np.random.RandomState(nbits)
    arr = rng.randint(0, 1 << nbits, size=(53, 41), dtype=np.uint8)
    p = str(tmp_path / f"c{nbits}{layout}.tif")
    geotiff.write_geotiff(p, arr, compress="deflate", nbits=nbits,
                          tiled=(layout == "tiled"), tile_size=16,
                          rows_per_strip=10)
    gt = geotiff.read_geotiff(p)
    assert (gt.array == arr).all()


def test_tiff_sparse_mask_roundtrip_and_probe(tmp_path):
    """NBITS=1 + TILED + sparse holes — the reference feature-mask
    layout (prepare_feature_masks.py:44-45, DEFLATE standing in for
    ZSTD which needs a lib this sandbox lacks). Sparse tiles answer
    from the offset table with no data I/O (geoutil.py:28-32)."""
    m = np.zeros((80, 120), np.uint8)
    m[5:20, 40:70] = 1            # touches tiles (0,2..4) and (1,2..4)
    p = str(tmp_path / "mask.tif")
    geotiff.write_geotiff(p, m, nbits=1, compress="deflate", tiled=True,
                          tile_size=16, sparse_ok=True)
    r = geotiff.GeoTiffReader(p)
    assert r.tiled and r.nbits == 1
    assert r.tile_is_sparse(0, 0) and r.tile_is_sparse(4, 7)
    assert not r.tile_is_sparse(0, 3)
    assert (r.read_all() == m).all()
    # windowed read crossing tile boundaries and a sparse region
    assert (r.read_window(35, 2, 50, 30) == m[2:32, 35:85]).all()
    # sparse tiles occupy zero file bytes: dense copy must be larger
    r.close()
    pd_ = str(tmp_path / "dense.tif")
    geotiff.write_geotiff(pd_, m, nbits=1, compress="deflate", tiled=True,
                          tile_size=16, sparse_ok=False)
    assert os.path.getsize(p) < os.path.getsize(pd_)


def test_tiff_windowed_reader_matches_full_decode(tmp_path):
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 16, size=(70, 90), dtype=np.uint8)
    p = str(tmp_path / "w.tif")
    geotiff.write_geotiff(p, arr, compress="deflate", tiled=True,
                          tile_size=32, nbits=4)
    r = geotiff.GeoTiffReader(p)
    for (x, y, w, h) in [(0, 0, 90, 70), (10, 5, 40, 33), (60, 40, 30, 30),
                         (31, 31, 2, 2), (0, 69, 90, 1)]:
        assert (r.read_window(x, y, w, h) == arr[y:y + h, x:x + w]).all()
    r.close()


def test_tiff_writer_rejects_out_of_range_nbits(tmp_path):
    arr = np.array([[4]], dtype=np.uint8)
    with pytest.raises(ValueError, match="2-bit"):
        geotiff.write_geotiff(str(tmp_path / "x.tif"), arr, nbits=2)


def test_import_geotiff_compressed_streams_and_skips_empty(tmp_path,
                                                          ray_session):
    """Compressed tiled raster -> world import, with S4 source-level
    pruning: all-zero engine tiles are absent from the document table."""
    arr = np.zeros((48, 80), np.uint8)
    arr[0:16, 0:16] = 7        # engine tile (0,0)
    arr[32:48, 64:80] = 3      # engine tile (2,4)
    tif = str(tmp_path / "in.tif")
    geotiff.write_geotiff(tif, arr, compress="deflate", tiled=True,
                          tile_size=16, nbits=4, sparse_ok=True)
    wp = str(tmp_path / "world")
    rep = geotiff.import_geotiff(tif, wp, "imp", "g1", tile_edge=16,
                                 rows_per_part=2, skip_empty_tiles=True)
    assert rep["tiles"] == 2
    docs = read_documents(wp, ["imp"]).take_all()
    ids = sorted(d["doc_id"] for d in docs)
    assert len(ids) == 2
    ms = MediaStore(wp)
    rebuilt = np.zeros_like(arr)
    for d in docs:
        meta = model.parse_meta(d["spans"])
        ref = model.media_refs(d["spans"])[0]
        tile = model.decode_tile(ms.fetch([ref])[ref],
                                 meta["nrows"], meta["ncols"])
        rebuilt[meta["y_off"]:meta["y_off"] + meta["nrows"],
                meta["x_off"]:meta["x_off"] + meta["ncols"]] = tile
    assert (rebuilt == arr).all()


_REAL_MASK = "/root/reference/masks/AFG_129_1km_mask._tif"


@pytest.mark.skipif(not os.path.exists(_REAL_MASK),
                    reason="reference mask not present")
def test_reader_parses_real_gdal_mask_structure():
    """Parity against an ACTUAL GDAL-written reference raster
    (prepare_feature_masks.py:44-47 creation options): our from-scratch
    reader must recover the full structure — 1 km global grid, NBITS=1,
    ZSTD code 50000, 256x256 tiles, geo tags — and answer the sparse
    probe (geoutil.is_sparse analog) from the offset table with no
    data I/O. Sparse windows decode to zeros without needing the ZSTD
    codec at all (holes carry no data)."""
    r = geotiff.GeoTiffReader(_REAL_MASK)
    assert (r.width, r.height) == (43200, 21600)   # 1 km WGS84 grid
    assert r.nbits == 1 and r.compression == 50000  # NBITS=1 + ZSTD
    assert r.tiled and (r.tile_w, r.tile_h) == (256, 256)
    assert r.pixel_scale is not None and r.tiepoint is not None
    # GDAL SPARSE_OK: the vast majority of a one-country mask is holes
    n_sparse = sum(r.tile_is_sparse(ty, tx)
                   for ty in range(r.tiles_down)
                   for tx in range(r.tiles_across))
    total = r.tiles_down * r.tiles_across
    assert 0 < total - n_sparse < 200   # Afghanistan ⊂ a few dozen tiles
    # a window over holes-only decodes to zeros with zero payload reads
    corner = r.read_window(0, 0, 512, 512)   # NW corner, ocean/arctic
    assert corner.shape == (512, 512) and not corner.any()
    r.close()


def test_tiff_zstd_roundtrip(tmp_path):
    """ZSTD (code 50000) round trip — the reference masks' codec
    (prepare_feature_masks.py:44). Runs everywhere now: the codec chain is
    zstandard -> pyarrow's bundled zstd -> the from-scratch RFC 8878
    decoder (functions/zstd.py)."""
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 2, size=(64, 80), dtype=np.uint8)
    p = str(tmp_path / "z.tif")
    geotiff.write_geotiff(p, arr, nbits=1, compress="zstd", tiled=True,
                          tile_size=16, sparse_ok=True)
    gt = geotiff.read_geotiff(p)
    assert (gt.array == arr).all()


def test_stream_writer_matches_batch_writer(tmp_path):
    """GeoTiffStreamWriter (incremental band/tile feed, IFD-at-end)
    decodes identically to write_geotiff, including fill holes via the
    shared-payload trick and SPARSE_OK holes."""
    from spatial_aez_ray.sources import geotiff as gt
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 4, size=(300, 500)).astype(np.uint8)
    a_path, b_path = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    geo = dict(pixel_scale=(0.1, 0.1, 0), tiepoint=(0, 0, 0, -180, 90, 0))
    gt.write_geotiff(a_path, arr, compress="deflate", tiled=True,
                     tile_size=64, nbits=2, **geo)
    with gt.GeoTiffStreamWriter(b_path, 500, 300, tile_size=64, nbits=2,
                                compress="deflate", **geo) as w:
        for ty in range(w.tiles_down):        # band-at-a-time feed
            w.write_band(ty, arr[ty * 64:(ty + 1) * 64])
    a, b = gt.read_geotiff(a_path), gt.read_geotiff(b_path)
    assert (a.array == b.array).all()
    assert a.geotransform == b.geotransform
    # nonzero fill: unwritten tiles come back as fill, one shared payload
    c_path = str(tmp_path / "c.tif")
    with gt.GeoTiffStreamWriter(c_path, 500, 300, tile_size=64, nbits=2,
                                fill=3) as w:
        w.write_tile(1, 2, arr[64:128, 128:192])
    c = gt.read_geotiff(c_path).array
    want = np.full((300, 500), 3, np.uint8)
    want[64:128, 128:192] = arr[64:128, 128:192]
    assert (c == want).all()
    r = gt.GeoTiffReader(c_path)
    hole_idx = [i for i in range(r.tiles_down * r.tiles_across)
                if i != 1 * r.tiles_across + 2]
    assert len({r._offsets[i] for i in hole_idx}) == 1  # shared payload
    r.close()
    # sparse_ok + fill 0: unwritten tiles are real SPARSE_OK holes
    d_path = str(tmp_path / "d.tif")
    with gt.GeoTiffStreamWriter(d_path, 500, 300, tile_size=64, nbits=2,
                                sparse_ok=True) as w:
        w.write_tile(0, 0, arr[:64, :64])
    r = gt.GeoTiffReader(d_path)
    assert r.tile_is_sparse(2, 2) and not r.tile_is_sparse(0, 0)
    want = np.zeros((300, 500), np.uint8)
    want[:64, :64] = arr[:64, :64]
    assert (r.read_all() == want).all()
    r.close()


def test_cog_multipage_roundtrip(tmp_path):
    import numpy as np
    from spatial_aez_ray.sources import geotiff as gt
    rng = np.random.RandomState(3)
    base = rng.randint(0, 4, size=(200, 300)).astype(np.uint8)
    ovs = [base[::2, ::2].copy(), base[::4, ::4].copy()]
    p = str(tmp_path / "c.tif")
    gt.write_cog(p, base, ovs, compress="deflate", tiled=True,
                 tile_size=64, nbits=2)
    pages = gt.read_cog_pages(p)
    assert [(pg.width, pg.height) for pg in pages] == \
        [(300, 200), (150, 100), (75, 50)]
    for pg, arr in zip(pages, [base] + ovs):
        assert (pg.read_all() == arr).all()
    # single-page files still read with next_ifd == 0
    gt.write_geotiff(str(tmp_path / "s.tif"), base, compress="deflate",
                     tiled=True, tile_size=64)
    r = gt.GeoTiffReader(str(tmp_path / "s.tif"))
    assert r.next_ifd == 0 and (r.read_all() == base).all()

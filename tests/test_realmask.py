"""Real-reference-data parity: per-country areas over the real ZSTD
masks vs the CIA World Factbook tolerance bands (the reference's own
independent oracle, test_extract_country_data.py:15-50)."""
import os

import numpy as np
import pytest

from spatial_aez_ray.pipelines import realmask

HAVE_MASKS = os.path.isdir(realmask.REFERENCE_MASKS_DIR) and \
    os.path.exists(realmask.REFERENCE_DBF)

pytestmark = pytest.mark.skipif(
    not HAVE_MASKS, reason="reference masks/shapefile not present")


def test_mask_inventory():
    items = realmask.mask_inventory()
    # 255 Natural Earth features; the reference's admin translation
    # drops the None-mapped territories (admin_names.py adminmap)
    assert 230 <= len(items) <= 255
    afg = [i for i in items if i["feature_idx"] == 129]
    assert afg and afg[0]["admin"] == "Afghanistan"
    assert afg[0]["path"].endswith("AFG_129_1km_mask._tif")


def test_real_mask_areas_within_cia_bands(ray_session):
    df = realmask.real_mask_areas()
    realmask.check_real_mask_areas(df)  # raises on any out-of-band country
    assert len(df) >= 200
    assert int(df["checked"].sum()) >= 150
    # spot values: Afghanistan's area derives from the 901345-pixel
    # popcount (independently verified against the C zstd decoder)
    afg = df[df["country"] == "Afghanistan"].iloc[0]
    assert afg["expected_km2"] == 652230.0
    assert 0.95 < afg["ratio"] < 1.02
    # multi-feature sovereigns fold into one row (adminmap semantics)
    assert (df["country"] == "United States of America").sum() == 1
    assert (df["country"] == "France").sum() == 1


def test_real_mask_areas_deterministic(ray_session):
    a = realmask.real_mask_areas()
    b = realmask.real_mask_areas()
    assert a.equals(b)  # bit-identical: sorted-partial pairwise combine


def test_real_mask_import_roundtrip(ray_session, tmp_path):
    """S1 import of a real ZSTD mask into the world layout; the
    world-path area (batched MediaStore fetches) is bit-identical to
    the direct file walk."""
    path = os.path.join(realmask.REFERENCE_MASKS_DIR,
                        "AFG_129_1km_mask._tif")
    w = str(tmp_path / "afg_world")
    rep = realmask.import_real_mask(path, w)
    assert rep["tiles"] == 28  # non-sparse tiles only (S4 pruning)
    a = realmask.imported_mask_area(w)
    assert a == realmask.mask_file_area(path)
    assert abs(a - 642199.1765113731) < 1e-6

HAVE_PNGS = os.path.isdir(realmask.REFERENCE_RESULTS_DIR)


@pytest.mark.skipif(not HAVE_PNGS, reason="reference results not present")
def test_real_published_png_palette(ray_session):
    """M15 parity on real published output: every pixel color of the
    reference's results/*_small.png is an exact entry of our mirror of
    that product's GDAL color table (truncating CreateColorRamp)."""
    df = realmask.check_real_png_palette(realmask.real_png_palette())
    aez = df[df["png"] == "AEZ_small.png"].iloc[0]
    assert aez["distinct_colors"] == 222  # 29 zones' worth of ramp colors
    assert (df["distinct_colors"] == df["colors_in_palette"]).all()


HAVE_CSVS = os.path.isdir("/root/reference/results")


@pytest.mark.skipif(not HAVE_CSVS, reason="reference results not present")
class TestRealRegionRollup:
    def test_published_rollups_within_rounding_bound(self, ray_session):
        from spatial_aez_ray.pipelines import realcsv
        df = realcsv.check_real_region_rollup(realcsv.real_region_rollup())
        assert len(df) == 9 * 9  # 9 files x 9 regions
        # measured headroom: worst AEZ cell 0.05 km2, Land-Cover exact
        assert df["max_abs_diff"].max() <= 0.06
        lc = df[df["file"] == "Land-Cover-by-region.csv"]
        assert (lc["max_abs_diff"] == 0.0).all()

    def test_mapping_mutation_is_km2_sized(self):
        """Dropping ONE country from a region must blow the bound by
        orders of magnitude — the check is sharp, not vacuous."""
        from unittest import mock
        from spatial_aez_ray.pipelines import realcsv
        broken = dict(realcsv.REGION_MAPPING)
        assert broken["Brazil"] == ["Latin America"]
        broken["Brazil"] = None
        with mock.patch.object(realcsv, "REGION_MAPPING", broken):
            rows = realcsv._compare_one(
                "Land-Cover-by-region.csv", "Land-Cover-by-country.csv",
                None, realcsv.REFERENCE_RESULTS_DIR)
        worst = max(r["max_abs_diff"] for r in rows
                    if r["region"] == "Latin America")
        assert worst > 1000  # Brazil-sized, vs a 0.15 km2 bound

    def test_mapping_covers_published_countries(self):
        import pandas as pd
        from spatial_aez_ray.region_mapping import REGION_MAPPING
        from spatial_aez_ray.constants import REGIONS
        for f in ("AEZ-by-country.csv", "Land-Cover-by-country.csv"):
            bc = pd.read_csv(f"/root/reference/results/{f}", index_col=0)
            assert all(c in REGION_MAPPING for c in bc.index)
        vals = [v for v in REGION_MAPPING.values() if v]
        assert {r for rs in vals for r in rs} == set(REGIONS)


@pytest.mark.skipif(not os.path.isdir("/root/reference/results"),
                    reason="reference results not present")
class TestRealCsvFormatParity:
    """S5/O1 format parity against the published results: our column
    lists and ordering rules ARE the reference's, verified on its real
    output files (not just on goldens we generated ourselves)."""

    PUBLISHED = {
        "kg": "Köppen-Geiger-present-by-country.csv",
        "lc": "Land-Cover-by-country.csv",
        "slope": "Slope-by-country.csv",
        "fao": "FAO-Slope-by-country.csv",
        "wk": "Workability-by-country.csv",
    }

    def test_class_column_headers_exact(self):
        import pandas as pd
        from spatial_aez_ray.pipelines.extract import CLASSIFIERS
        for name, f in self.PUBLISHED.items():
            cols = list(pd.read_csv(f"/root/reference/results/{f}",
                                    index_col=0, nrows=0).columns)
            assert cols == [str(c) for c in CLASSIFIERS[name]().columns()], name

    def test_aez_232_columns_exact(self):
        import pandas as pd
        from spatial_aez_ray.pipelines.aez import AEZ_COLUMNS
        cols = list(pd.read_csv(
            "/root/reference/results/AEZ-by-country.csv",
            index_col=0, nrows=0).columns)
        assert cols == [str(c) for c in AEZ_COLUMNS]

    def test_country_rows_sorted_and_equal_to_mask_inventory(self):
        """The published tables' country set == the admins our
        shapefile-dbf + admin-normalize stack derives from the real
        mask inventory, and rows are emitted in sorted order like our
        write_csv."""
        import pandas as pd
        bc = pd.read_csv("/root/reference/results/AEZ-by-country.csv",
                         index_col=0)
        assert list(bc.index) == sorted(bc.index)
        mask_admins = {i["admin"] for i in realmask.mask_inventory()}
        assert set(bc.index) == mask_admins


@pytest.mark.skipif(not os.path.isdir("/root/reference/results"),
                    reason="reference results not present")
class TestRealCsvAreas:
    def test_published_csv_areas_in_cia_band(self, ray_session):
        from spatial_aez_ray.pipelines import realcsv
        df = realcsv.check_real_csv_areas(realcsv.real_csv_areas())
        assert df["file"].nunique() == 7
        # AEZ checks the full 168-country set the reference's test does
        aez = df[(df["file"] == "AEZ-by-country.csv") & df["checked"]]
        assert len(aez) == 168
        ru = df[(df["file"] == "AEZ-by-country.csv")
                & (df["country"] == "Russian Federation")].iloc[0]
        assert ru["expected_km2"] == 17098242.0

    def test_band_rule_rejects_shrunk_area(self):
        """Halving one large country's row must trip the band."""
        import pandas as pd
        from spatial_aez_ray.pipelines import realcsv
        rows = realcsv._csv_area_rows("AEZ-by-country.csv",
                                      realcsv.REFERENCE_RESULTS_DIR)
        df = pd.DataFrame(rows)
        fr = df[df["country"] == "France"].iloc[0]
        assert fr["checked"] and fr["in_band"]
        assert not (fr["expected_km2"] * 0.76
                    < fr["area_km2"] * 0.5
                    < fr["expected_km2"] * 1.07)


def test_real_mask_regions_and_polygonize(tmp_path):
    """The newest raster kernels on REAL reference data: a multi-
    island country labels into its islands, pixel totals match an
    independent direct file walk, and both polygonize invariants hold
    at planet-lattice addressing."""
    import shutil
    from spatial_aez_ray.pipelines import realmask, regions
    from spatial_aez_ray.sources.geotiff import GeoTiffReader
    p = os.path.join(realmask.REFERENCE_MASKS_DIR,
                     "PHL_179_1km_mask._tif")
    w = str(tmp_path / "phl_world")
    realmask.import_real_mask(p, w)
    lab = regions.label_regions(w, "realmask")
    poly = regions.polygonize_regions(w, "realmask")
    m = poly.merge(lab, on="region_id")
    r = GeoTiffReader(p)
    try:
        direct = sum(int(r.read_tile(int(ty), int(tx)).sum())
                     for ty, tx in r.nonsparse_tiles())
    finally:
        r.close()
    assert int(lab["n_px"].sum()) == direct
    assert (m["area_px"] == m["n_px"]).all()
    assert (m["n_edges"] == m["perim"]).all()
    assert len(lab) > 50        # the Philippine archipelago


def test_real_mask_overlap_exclusive(tmp_path):
    """Neighboring 1 km masks are mutually exclusive (GDAL rasterize
    center-in-polygon), distributed == direct two-file walk; the
    self-overlap positive control equals the mask pixel count."""
    from spatial_aez_ray.pipelines import realmask
    d = realmask.REFERENCE_MASKS_DIR
    pa_ = os.path.join(d, "TKM_141_1km_mask._tif")
    pi = os.path.join(d, "IRN_93_1km_mask._tif")
    w = str(tmp_path / "ovl")
    realmask.import_real_mask(pa_, w, dataset="a")
    realmask.import_real_mask(pi, w, dataset="b")
    cross = realmask.mask_overlap_px(w, "a", "b")
    assert cross == realmask.mask_file_overlap_px(pa_, pi) == 0
    assert realmask.mask_overlap_px(w, "a", "a") > 0


def test_real_mask_terrain_bit_exact(tmp_path):
    """Distributed focal TRI/roughness over an imported real mask ==
    the direct sequential file walk (PHL: thousands of islands, the
    hardest sparse layout in the reference set)."""
    import os
    from spatial_aez_ray.pipelines import pyramid, realmask
    path = os.path.join(realmask.REFERENCE_MASKS_DIR,
                        "PHL_179_1km_mask._tif")
    w = str(tmp_path / "phl_world")
    realmask.import_real_mask(path, w)
    for metric, fn in (("roughness", pyramid.focal_roughness),
                       ("tri", pyramid.focal_tri)):
        mine = fn(w, "realmask")
        assert mine.equals(realmask.mask_file_window_hist(path, metric)), metric


def test_real_mask_viewshed_phl(ray_session):
    """LOS kernel on the Philippines 1 km mask (archipelago: sparse
    holes between islands, edge-clamped tiles) == direct file walk."""
    import os
    import shutil
    from spatial_aez_ray.pipelines import realmask, viewshed
    path = os.path.join(realmask.REFERENCE_MASKS_DIR,
                        "PHL_179_1km_mask._tif")
    w = "/tmp/spatial_aez_ray_test_phl_viewshed"
    shutil.rmtree(w, ignore_errors=True)
    realmask.import_real_mask(path, w)
    mine = viewshed.visibility_histogram(w, "realmask", 3)
    want = realmask.mask_file_visibility(path, 3)
    assert mine.equals(want)
    assert int((mine["n_vis"] * mine["n_px"]).sum()) % 2 == 0

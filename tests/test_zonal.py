"""End-to-end zonal pipelines vs the sequential NumPy oracle.

The gate is exact: bit-identical float tables (deterministic combine)
and byte-identical CSV output (%.2f, sorted countries) — the
reference-parity criteria of BASELINE.md.
"""

import numpy as np
import pandas as pd
import pytest

from spatial_aez_ray import fixtures, oracle
from spatial_aez_ray.pipelines import extract

SPEC = fixtures.TINY


@pytest.fixture(scope="module")
def zindex(tiny_world):
    return extract.build_zonal_index(tiny_world)


@pytest.mark.parametrize("dataset", ["kg", "lc", "slope", "fao", "wk",
                                     "lpd"])
def test_zonal_bit_exact_vs_oracle(tiny_world, zindex, dataset):
    df = extract.zonal_stats(tiny_world, dataset, index=zindex)
    odf = oracle.zonal_csv(SPEC, dataset)
    odf.columns = [str(c) for c in odf.columns]
    assert list(df.index) == list(odf.index)
    assert list(df.columns) == list(odf.columns)
    assert (df.values == odf.values).all(), \
        f"max diff {np.abs(df.values - odf.values).max()}"


def test_zonal_csv_bytes(tiny_world, zindex, tmp_path):
    df = extract.zonal_stats(tiny_world, "kg", index=zindex)
    p1 = tmp_path / "ray.csv"
    p2 = tmp_path / "oracle.csv"
    extract.write_csv(df, str(p1))
    oracle.zonal_csv(SPEC, "kg").to_csv(p2, float_format="%.2f")
    assert p1.read_bytes() == p2.read_bytes()


def test_area_conservation(tiny_world, zindex):
    """Σ per-class zonal areas == Σ area of assigned cells per country
    (FIXTURES.md invariant 4): nothing lost or double-counted inside a
    dataset with a total vocabulary (lpd covers every in-mask pixel)."""
    df = extract.zonal_stats(tiny_world, "lpd", index=zindex)
    cc = oracle.cell_country(SPEC, SPEC.g1)
    from spatial_aez_ray.geo import km2_rows
    rows_km2 = km2_rows(SPEC.g1.height, 0, SPEC.g1)
    cc = cc.assign(km2=rows_km2[cc["cell_row"].to_numpy()])
    want = cc.groupby("admin")["km2"].sum()
    got = df.sum(axis=1)
    for admin in got.index:
        assert np.isclose(got[admin], want.get(admin, 0.0), rtol=1e-9), admin


def test_region_rollup_matches_oracle_and_membership(tiny_world, zindex):
    df = extract.zonal_stats(tiny_world, "wk", index=zindex)
    reg = extract.region_rollup(df, tiny_world)
    oreg = oracle.region_rollup(oracle.zonal_csv(SPEC, "wk"), SPEC)
    oreg.columns = [str(c) for c in oreg.columns]
    assert list(reg.index) == list(oreg.index)  # fixed region order
    assert np.allclose(reg.values, oreg.values, rtol=0, atol=0)
    # multi-region country counted in each of its regions
    region_of = extract.load_regions(tiny_world)
    assert len(region_of["Fredonia"]) == 2
    r1, r2 = region_of["Fredonia"]
    # regions containing Fredonia include at least Fredonia's row
    fred = df.loc["Fredonia"]
    members = {r: [a for a, rs in region_of.items() if rs is not None and r in list(rs)]
               for r in (r1, r2)}
    for r in (r1, r2):
        expect = sum((df.loc[a] for a in members[r] if a in df.index),
                     pd.Series(0.0, index=df.columns))
        assert np.allclose(reg.loc[r].values, expect.values)
    assert fred.sum() > 0


def test_cell_country_pipeline_matches_oracle(tiny_world, zindex):
    """PIP assignment parity: engine per-tile claims == oracle masks."""
    got = {}
    grid = SPEC.g1
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            x, y, nc, nr = grid.tile_window(ty, tx)
            for fidx, admin, m in zindex.assign_tile(grid, ty, tx):
                rr, cc_ = np.nonzero(m)
                for r, c in zip(rr, cc_):
                    got.setdefault((y + r, x + c), set()).add(fidx)
    odf = oracle.cell_country(SPEC, grid)
    want = {}
    for r, c, f in zip(odf["cell_row"], odf["cell_col"], odf["feature_idx"]):
        want.setdefault((r, c), set()).add(f)
    assert got == want


def test_zonal_window_bit_exact_and_pruned(ray_session, tiny_world):
    """Windowed zonal == window-restricted oracle, and the read is
    actually pruned to the window's tile rows."""
    from spatial_aez_ray import fixtures, oracle
    from spatial_aez_ray.pipelines import extract

    win = (1, 3, 2, 7)
    df = extract.zonal_stats(tiny_world, "kg", tile_window=win)
    odf = oracle.zonal_csv(fixtures.TINY, "kg", tile_window=win)
    assert (df.values == odf.values).all()
    # full-grid result differs (the window genuinely restricts)
    full = oracle.zonal_csv(fixtures.TINY, "kg")
    assert not (df.values == full.values).all()
    # the filtered source yields exactly the window's tile count
    ty0, ty1, tx0, tx1 = win
    import pyarrow.compute as pc
    from spatial_aez_ray.sources.documents import read_documents
    lo, hi = f"kg/g1/{ty0:05d}/{tx0:05d}", f"kg/g1/{ty1:05d}/{tx1:05d}"
    ds = read_documents(tiny_world, ["kg"], columns=["doc_id"],
                        doc_filter=(pc.field("doc_id") >= lo)
                                   & (pc.field("doc_id") <= hi))
    from spatial_aez_ray.pipelines.extract import _tile_window_filter
    n = ds.map_batches(_tile_window_filter(win),
                       batch_format="pyarrow").count()
    assert n == (ty1 - ty0 + 1) * (tx1 - tx0 + 1)


def test_s2_partitioned_write_covers_assignment(ray_session, tiny_world,
                                                tmp_path):
    """Every assigned cell lands in exactly one s2-prefix directory and
    the per-prefix manifest equals the written files' counts."""
    import os
    import ray as _ray
    from spatial_aez_ray.pipelines import assign

    out = str(tmp_path / "s2")
    man = assign.write_cells_s2_partitioned(tiny_world, out, level=2)
    n_cells = assign.cell_country(tiny_world).count()
    assert man["n_cells"].sum() == n_cells
    # hive layout: one directory per prefix token
    dirs = {d.split("=", 1)[1] for d in os.listdir(out)
            if d.startswith("s2_prefix=")}
    assert dirs == set(man["s2_prefix"])
    # range-query pruning: reading ONE prefix dir yields that count
    p0 = man.iloc[0]
    sub = _ray.data.read_parquet(
        os.path.join(out, f"s2_prefix={p0['s2_prefix']}")).count()
    assert sub == p0["n_cells"]


def test_partials_coalesce_width_is_cpu_aware(ray_session, monkeypatch):
    """The combine width must grow with both tile count AND cluster
    CPUs (min(max(16, tiles/256), 4*CPUs)). A volume-only width (16 at
    the 101k-tile world on every cluster size) measured faster in a
    warm solo A/B but regressed the cold concurrent zonal+aez leg at
    32 CPUs from 74 s to 122 s — a narrow combine serializes its sort
    behind the competing pipeline. Pin the shape so a re-"optimization"
    from an isolated A/B fails here."""
    import ray as _ray
    from spatial_aez_ray.pipelines.extract import partials_coalesce_width

    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 32})
    assert partials_coalesce_width(496) == 16          # test scale: floor
    assert partials_coalesce_width(101_000) == 128     # scale-40: 4xCPU cap
    assert partials_coalesce_width(20_000) == 78       # grows ~tiles/256
    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 8})
    assert partials_coalesce_width(101_000) == 32      # smaller cluster


def test_zonal_value_stats_matches_multiset_oracle(tiny_world):
    from spatial_aez_ray import oracle
    from spatial_aez_ray.pipelines import extract
    for ds in ("kg", "lc"):
        mine = extract.zonal_value_stats(tiny_world, ds)
        want = oracle.zonal_value_stats_oracle(SPEC, ds)
        assert mine.equals(want), ds


def test_zonal_blocks_cache_bit_exact(tiny_world, tmp_path):
    """GeoBlocks-style cache: full and windowed aggregates from cached
    per-tile partials == direct raster computation, for two datasets
    and two windows."""
    from spatial_aez_ray.pipelines import extract
    for ds in ("kg", "wk"):
        out = str(tmp_path / f"blocks_{ds}")
        extract.prepare_zonal_blocks(tiny_world, ds, out)
        assert extract.zonal_stats_from_blocks(tiny_world, ds, out) \
            .equals(extract.zonal_stats(tiny_world, ds)), ds
        for win in ((0, 2, 0, 3), (3, 5, 4, 10)):
            got = extract.zonal_stats_from_blocks(tiny_world, ds, out,
                                                  tile_window=win)
            want = extract.zonal_stats(tiny_world, ds, tile_window=win)
            assert got.equals(want), (ds, win)


def test_zonal_value_stats_incremental(tiny_world, tmp_path):
    """Splice-and-rederive equals full recompute for the integer
    count view; unchanged worlds recompute nothing."""
    import shutil
    from spatial_aez_ray.pipelines import extract
    w2 = str(tmp_path / "w2")
    shutil.copytree(tiny_world, w2)
    view, rep = extract.zonal_value_stats_incremental(tiny_world, w2, "kg")
    assert rep == {"tiles_recomputed": 0, "tiles_dropped": 0}
    assert view.equals(extract.zonal_value_stats(tiny_world, "kg"))

"""AEZ / degraded / assignment / render / checkpoint / docops pipelines
vs the oracle and the committed goldens."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from spatial_aez_ray import fixtures, model, oracle
from spatial_aez_ray.pipelines import aez, assign, degraded, docops, extract, render
from spatial_aez_ray.sources.documents import MediaStore, read_documents_table

SPEC = fixtures.TINY
GOLD = os.path.join(os.path.dirname(__file__), "golden")


def test_aez_stats_bit_exact(tiny_world):
    df = aez.aez_stats(tiny_world)
    odf = oracle.aez_csv(SPEC)
    odf.columns = [str(c) for c in odf.columns]
    assert list(df.index) == list(odf.index)
    assert list(df.columns) == list(odf.columns)
    assert (df.values == odf.values).all()


def test_aez_csv_golden_bytes(tiny_world, tmp_path):
    df = aez.aez_stats(tiny_world)
    p = tmp_path / "AEZ-by-country.csv"
    extract.write_csv(df, str(p))
    assert p.read_bytes() == open(f"{GOLD}/AEZ-by-country.csv", "rb").read()


def test_degraded_bit_exact_and_golden(tiny_world, tmp_path):
    df = degraded.degraded_stats(tiny_world)
    odf = oracle.degraded_csv(SPEC)
    assert (df.values == odf.values).all()
    p = tmp_path / "degraded-cover-by-country.csv"
    extract.write_csv(df, str(p))
    assert p.read_bytes() == open(f"{GOLD}/degraded-cover-by-country.csv", "rb").read()


def test_zonal_goldens(tiny_world, tmp_path):
    names = {"kg": "Koppen-Geiger", "slope": "Slope"}
    index = extract.build_zonal_index(tiny_world)
    for ds, nm in names.items():
        df = extract.zonal_stats(tiny_world, ds, index=index)
        p = tmp_path / f"{nm}-by-country.csv"
        extract.write_csv(df, str(p))
        assert p.read_bytes() == open(f"{GOLD}/{nm}-by-country.csv", "rb").read(), nm
        rp = tmp_path / f"{nm}-by-region.csv"
        extract.write_region_csv(extract.region_rollup(df, tiny_world), str(rp))
        assert rp.read_bytes() == open(f"{GOLD}/{nm}-by-region.csv", "rb").read(), nm


def _pairs(df):
    return set(zip(df["cell_row"], df["cell_col"], df["feature_idx"]))


def test_cell_country_matches_golden(tiny_world):
    df = assign.cell_country(tiny_world).to_pandas()
    want = pd.read_parquet(f"{GOLD}/cell_country_g1.parquet")
    assert _pairs(df) == _pairs(want)


def test_cell_country_snap_matches_golden(tiny_world):
    tol = SPEC.snap_tol("g1")
    df = assign.cell_country(tiny_world, snap_tol=tol).to_pandas()
    want = pd.read_parquet(f"{GOLD}/cell_country_g1_snap.parquet")
    assert _pairs(df) == _pairs(want)
    # snap adds rows beyond the pure-PIP assignment
    base = pd.read_parquet(f"{GOLD}/cell_country_g1.parquet")
    assert len(want) > len(base)


def test_render_tiles_match_oracle(tiny_world, tmp_path):
    out = str(tmp_path / "render")
    render.produce_render_tiles(tiny_world, out)
    want = oracle.render_tiles(SPEC)
    ms = MediaStore(out)
    for product, key in [("render_aez", "aez"), ("render_slope", "slope"),
                         ("render_landuse", "land_use"),
                         ("render_soilhealth", "soil_health")]:
        docs = read_documents_table(out, [product])
        assert docs.num_rows > 0
        for row in docs.to_pylist():
            meta = model.parse_meta(row["spans"])
            refs = model.media_refs(row["spans"])
            arr = model.decode_tile(ms.fetch(refs)[refs[0]],
                                    meta["nrows"], meta["ncols"])
            assert (arr == want[(meta["tile_y"], meta["tile_x"])][key]).all()


def test_checkpoint_resume_identical(tiny_world, tmp_path):
    out = str(tmp_path / "ckpt")
    df1 = extract.zonal_stats_checkpointed(tiny_world, "wk", out, num_shards=4)
    df0 = extract.zonal_stats(tiny_world, "wk")
    assert (df1.values == df0.values).all()
    # simulate partial failure: drop one part, resume
    os.remove(os.path.join(out, "parts", "part-00001.parquet"))
    df2 = extract.zonal_stats_checkpointed(tiny_world, "wk", out, num_shards=4)
    assert (df2.values == df1.values).all()
    man = open(os.path.join(out, "MANIFEST.jsonl")).read().splitlines()
    assert len(man) == 5  # 4 original + 1 recomputed
    # manifest records lineage + metrics
    import json
    rec = json.loads(man[0])
    assert rec["lineage"]["dataset"] == "wk"
    assert rec["metrics"]["rows"] >= 0 and rec["metrics"]["bytes"] > 0


def test_normalize_documents_preserves_spans(tiny_world, tmp_path):
    out = str(tmp_path / "norm")
    docops.normalize_documents(tiny_world, out, datasets=["kg"])
    orig = read_documents_table(tiny_world, ["kg"])
    norm = docops.read_normalized(out)
    assert norm.num_rows == orig.num_rows
    model.assert_spans_equal(orig, norm.select(["doc_id", "spans"]))
    ids = norm["doc_id"].to_pylist()
    assert ids == sorted(ids)  # cell-prefix range order
    assert "tile_key" in norm.schema.names and "dataset" in norm.schema.names


def test_aez_checkpointed_matches_and_resumes(tiny_world, tmp_path):
    """Sharded, resumable AEZ == streaming AEZ bit-exactly; a second run
    resumes from the manifest (all shards skipped) with identical output."""
    from spatial_aez_ray.pipelines import aez as aezmod
    out = str(tmp_path / "aez_ckpt")
    df1 = aezmod.aez_stats_checkpointed(tiny_world, out, num_shards=3)
    base = aezmod.aez_stats(tiny_world)
    assert (df1.values == base.values).all()
    manifest = (tmp_path / "aez_ckpt" / "MANIFEST.jsonl").read_text()
    n_lines = len([l for l in manifest.splitlines() if l.strip()])
    df2 = aezmod.aez_stats_checkpointed(tiny_world, out, num_shards=3)
    manifest2 = (tmp_path / "aez_ckpt" / "MANIFEST.jsonl").read_text()
    assert manifest2 == manifest, "resume must not recompute shards"
    assert (df2.values == df1.values).all()
    assert n_lines == 3


def test_produce_aez_csvs_per_tmr_split(tiny_world, tmp_path):
    """A6: the 8 per-TMR regional CSVs partition the 232 AEZ columns
    (regex prefix split, process_imagery.py:292-296 semantics) and
    their region totals equal the rollup of the country table."""
    import glob
    df = aez.produce_aez_csvs(tiny_world, str(tmp_path))
    files = sorted(glob.glob(str(tmp_path / "AEZ-*-by-region.csv")))
    assert len(files) == 8
    all_cols = []
    for f in files:
        sub = pd.read_csv(f, index_col=0)
        tmr = os.path.basename(f)[len("AEZ-"):-len("-by-region.csv")]
        assert all(c.lower().startswith(tmr.lower() + "|") for c in sub.columns), f
        assert sub.shape == (9, 29)
        all_cols.extend(sub.columns)
    assert len(all_cols) == 232 and len(set(all_cols)) == 232
    # region totals == rollup of the country frame, at %.2f precision
    rolled = extract.region_rollup(df, tiny_world)
    sub0 = pd.read_csv(files[0], index_col=0)
    for c in sub0.columns:
        want = rolled[c].round(2)
        got = sub0[c]
        assert np.allclose(got.values, want.values, atol=0.011), c


def test_stats_shard_planner_covers_disjoint_no_id_read(tiny_world):
    """Shard bounds come from parquet footer stats only: ranges must
    cover every doc_id exactly once, honor the requested shard count
    when row groups allow, and never read the id column (enforced by
    failing any to_table/read_table during planning)."""
    from unittest import mock
    import pyarrow.dataset as pds
    from spatial_aez_ray.sources.documents import document_paths
    from spatial_aez_ray.state.checkpoint import doc_id_range_shards_from_stats

    paths = document_paths(tiny_world, ["wk"])
    with mock.patch("pyarrow.parquet.read_table",
                    side_effect=AssertionError("planner read data")), \
         mock.patch("pyarrow.dataset.dataset",
                    side_effect=AssertionError("planner read data")):
        shards = doc_id_range_shards_from_stats(paths, 4)
    assert len(shards) == 4
    ids = sorted(pds.dataset(paths).to_table(
        columns=["doc_id"])["doc_id"].to_pylist())
    hit = {i: 0 for i in ids}
    for _, lo, hi in shards:
        assert lo <= hi
        for i in ids:
            if lo <= i <= hi:
                hit[i] += 1
    assert all(v == 1 for v in hit.values()), "gap or overlap in shards"


def test_pyramid_bit_exact_and_resumable_layout(tiny_world, tmp_path):
    from spatial_aez_ray.pipelines import pyramid
    out = str(tmp_path / "pyr")
    mine = pyramid.build_pyramid(tiny_world, "kg", out)
    odf = oracle.pyramid_oracle(SPEC, "kg")
    assert mine.equals(odf)
    # every level is a valid media world (documents/ + media/ parts)
    for lvl in mine["level"]:
        for kind in ("documents", "media"):
            d = os.path.join(out, kind, f"dataset=kg_ov{lvl}")
            assert os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d))
    # geometric series: each level shrinks tiles by ~4x
    n = mine["n_tiles"].to_numpy()
    assert (n[1:] <= (n[:-1] + 3) // 4 + 1).all()


def test_pyramid_mode_reduce_semantics():
    from spatial_aez_ray.pipelines.pyramid import mode_reduce2
    import numpy as np
    m = np.array([[1, 1, 2, 0],
                  [2, 3, 0, 0],
                  [5, 0, 0, 0],
                  [0, 5, 0, 0]], dtype=np.uint8)
    out = mode_reduce2(m, nodata=0)
    # window 1: {1,1,2,3} -> 1 ; window 2: {2,0,0,0} -> 2 (nodata loses)
    # window 3: {5,0,0,5} -> 5 ; window 4: all nodata -> 0
    assert out.tolist() == [[1, 2], [5, 0]]
    # tie breaks to the smallest class
    t = np.array([[4, 4], [7, 7]], dtype=np.uint8)
    assert mode_reduce2(t, nodata=0).tolist() == [[4]]


def test_pyramid_window_read_matches_oracle_level(tiny_world, tmp_path):
    import numpy as np
    from spatial_aez_ray.pipelines import pyramid
    out = str(tmp_path / "pyr")
    pyramid.build_pyramid(tiny_world, "kg", out)
    # reconstruct level-1 array the oracle's way
    grid = SPEC.grid("g1")
    t = grid.tile
    base = oracle.full_raster(SPEC, "kg")[0]
    arr = np.zeros((grid.tiles_y * t, grid.tiles_x * t), dtype=np.uint8)
    arr[:grid.height, :grid.width] = base
    pty, ptx = (grid.tiles_y + 1) // 2, (grid.tiles_x + 1) // 2
    padded = np.zeros((pty * 2 * t, ptx * 2 * t), dtype=np.uint8)
    padded[:arr.shape[0], :arr.shape[1]] = arr
    lvl1 = pyramid.mode_reduce2(padded, 0)
    win = pyramid.read_window(out, "kg_ov1", "g1", t, pty, ptx,
                              (0, pty - 1, 0, ptx - 1), 0)
    assert win.shape == lvl1.shape
    assert (win == lvl1).all()


def test_radius_query_matches_full_scan(tiny_world, tmp_path):
    import numpy as np
    from spatial_aez_ray import oracle as orc
    from spatial_aez_ray.geo import haversine_km
    from spatial_aez_ray.pipelines import assign as asg
    from spatial_aez_ray.pipelines.extract import world_grid
    cells_dir = str(tmp_path / "cells")
    asg.write_cells_s2_partitioned(tiny_world, cells_dir)
    grid = world_grid(tiny_world, "g1")
    got = asg.radius_query(cells_dir, grid, 10.0, 20.0, 3000.0).to_pandas()
    odf = orc.cell_country(SPEC, grid)
    lons = grid.x_min + (odf["cell_col"].to_numpy() + 0.5) * grid.x_size
    lats = grid.y_min + (odf["cell_row"].to_numpy() + 0.5) * grid.y_size
    d = haversine_km(10.0, 20.0, lons, lats)
    keep = d <= 3000.0
    assert len(got) == int(keep.sum())
    want = set(zip(odf["cell_row"].to_numpy()[keep],
                   odf["cell_col"].to_numpy()[keep]))
    assert set(zip(got["cell_row"], got["cell_col"])) == want
    # distances are exact metres from identical float math
    exp_m = np.sort(np.round(d[keep] * 1000.0).astype(np.int64))
    assert (np.sort(got["dist_m"].to_numpy()) == exp_m).all()


def test_s2_rollup_levels_consistent(tiny_world):
    import numpy as np
    from spatial_aez_ray import s2cells
    from spatial_aez_ray.pipelines import assign as asg
    out, cells = asg.s2_rollup(tiny_world, return_cells=True)
    # per-admin assigned totals identical at every level
    for _, g in out.groupby("admin"):
        assert g["n_assigned"].nunique() == 1
    # coarser levels have <= as many distinct cells
    piv = out.pivot_table(index="admin", columns="level",
                          values="n_cells")
    assert (piv[4] <= piv[6]).all() and (piv[6] <= piv[8]).all()
    # derived parent rollup reproduces level 6 exactly
    fine = cells[cells["level"] == 8].copy()
    fine["cell"] = s2cells.parent(
        fine["cell"].to_numpy().astype(np.int64).astype(np.uint64),
        6).astype(np.int64)
    der = (fine.groupby(["admin", "cell"], as_index=False)["n"].sum()
           .sort_values(["admin", "cell"]).reset_index(drop=True))
    direct = (cells[cells["level"] == 6][["admin", "cell", "n"]]
              .sort_values(["admin", "cell"]).reset_index(drop=True))
    assert der.equals(direct)


def test_media_integrity_scan_clean_world(tiny_world):
    from spatial_aez_ray.pipelines import docops
    out, bad = docops.media_integrity_scan(tiny_world)
    assert int(out["n_missing"][0]) == 0
    assert int(out["n_bad_size"][0]) == 0
    assert bad == []
    assert int(out["n_docs"][0]) > 0


def test_admin_spatial_summary_matches_oracle(tiny_world):
    import numpy as np
    from spatial_aez_ray.pipelines import assign as asg
    got = asg.admin_spatial_summary(tiny_world)
    odf = oracle.cell_country(SPEC, SPEC.g1)
    want = (odf.assign(r=odf["cell_row"].astype("int64"),
                       c=odf["cell_col"].astype("int64"))
            .groupby("admin", as_index=False)
            .agg(n=("r", "size"), row_min=("r", "min"),
                 row_max=("r", "max"), col_min=("c", "min"),
                 col_max=("c", "max"), row_sum=("r", "sum"),
                 col_sum=("c", "sum"))
            .sort_values("admin").reset_index(drop=True))
    for c in want.columns:
        if c != "admin":
            want[c] = want[c].astype("int64")
    assert got.equals(want)


def test_equalize_bit_exact_and_lut_properties(tiny_world, tmp_path):
    import numpy as np
    from spatial_aez_ray.pipelines import downsample as dsm
    mine = dsm.equalize_tiles(tiny_world, "kg", str(tmp_path / "eq"))
    assert mine.equals(oracle.equalize_oracle(SPEC, "kg"))
    # LUT is monotone over occupied bins and nodata-preserving
    h = np.zeros(256, dtype=np.int64)
    h[[3, 10, 200]] = [5, 10, 5]
    lut = dsm.equalize_lut(h, nodata=0)
    assert lut[0] == 0
    assert lut[3] <= lut[10] <= lut[200] == 255


def test_warp_mercator_bit_exact(tiny_world, tmp_path):
    import numpy as np
    from spatial_aez_ray.pipelines import warp as wp
    mine = wp.warp_to_mercator(tiny_world, "kg", str(tmp_path / "w"))
    assert mine.equals(oracle.warp_oracle(SPEC, "kg", int(mine["out_n"][0])))
    # index function sanity: equator maps near the grid's middle row,
    # and the poles clamp inside bounds
    grid = SPEC.grid("g1")
    n = int(mine["out_n"][0])
    r, c = wp.mercator_src_index(
        grid, n, np.array([n / 2.0 - 0.5]), np.array([n / 2.0 - 0.5]))
    assert abs(int(r[0]) - grid.height // 2) <= 1
    r0, _ = wp.mercator_src_index(grid, n, np.array([0.0]),
                                  np.array([0.0]))
    rn, _ = wp.mercator_src_index(grid, n, np.array([float(n - 1)]),
                                  np.array([0.0]))
    assert 0 <= int(r0[0]) < int(rn[0]) <= grid.height - 1


def test_admin_adjacency_matches_oracle(tiny_world):
    from spatial_aez_ray.pipelines import assign as asg
    mine = asg.admin_adjacency(tiny_world)
    odf = oracle.admin_adjacency_oracle(SPEC)
    assert mine.equals(odf)
    # symmetric-free canonical form: a < b everywhere, counts positive
    assert (mine["admin_a"] < mine["admin_b"]).all()
    assert (mine["shared_edges"] > 0).all()


def test_zonal_incremental_no_change_is_identity(tiny_world, tmp_path):
    import shutil
    from spatial_aez_ray.pipelines import extract as ex
    w2 = str(tmp_path / "w2")
    shutil.copytree(tiny_world, w2)
    view, rep = ex.zonal_stats_incremental(tiny_world, w2, "kg")
    assert rep["tiles_recomputed"] == 0
    full = ex.zonal_stats(w2, "kg")
    assert list(view.index) == list(full.index)
    assert list(view.columns) == list(full.columns)
    assert (view.values == full.values).all()


def test_zonal_incremental_many_tiles_single_launch(tmp_path):
    """A scattered 100+-tile delta is recomputed in ONE pushed-down
    dataset launch (the tiles= set filter), and the maintained view is
    bit-identical to the full recompute on the new world."""
    import shutil
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_aez_ray import fixtures
    from spatial_aez_ray.pipelines import extract as ex

    world = fixtures.generate_world(fixtures.SMALL)
    w2 = str(tmp_path / "w2")
    shutil.copytree(world, w2)
    # repaint >=100 scattered kg tiles to one valid class
    grid = fixtures.SMALL.grid("g1")
    want = set()
    for ty in range(0, grid.tiles_y, 2):
        for tx in range(0, grid.tiles_x, 2):
            want.add(f"mem://kg/g1/{ty:05d}/{tx:05d}/b1")
    changed = set()
    d = os.path.join(w2, "media", "dataset=kg")
    for part in sorted(f for f in os.listdir(d) if f.endswith(".parquet")):
        p = os.path.join(d, part)
        t = pq.read_table(p)
        refs = t["media_ref"].to_pylist()
        hit = [i for i, r in enumerate(refs) if r in want]
        if not hit:
            continue
        payloads = t["payload"].to_pylist()
        for i in hit:
            payloads[i] = bytes([5]) * len(payloads[i])
            changed.add(refs[i])
        pq.write_table(pa.table({"media_ref": refs, "payload": payloads},
                                schema=t.schema), p)
    assert len(changed) >= 100

    launches = 0
    orig = ex.zonal_partials_ds

    def counting(*a, **k):
        nonlocal launches
        launches += 1
        return orig(*a, **k)

    ex.zonal_partials_ds = counting
    try:
        view, rep = ex.zonal_stats_incremental(world, w2, "kg")
    finally:
        ex.zonal_partials_ds = orig
    assert rep["tiles_recomputed"] == len(changed)
    # one launch for the old partials + ONE for the whole delta set
    assert launches == 2
    full = ex.zonal_stats(w2, "kg")
    assert list(view.index) == list(full.index)
    assert list(view.columns) == list(full.columns)
    assert (view.values == full.values).all()


def test_aez_incremental_bit_equal(tiny_world, tmp_path):
    """Mutate tiles in TWO of the four co-keyed rasters (kg on G1, lc
    on G3); the incremental AEZ view recomputes only the union of
    changed tiles and is bit-identical to the full recompute."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_aez_ray.pipelines import aez as az

    w2 = str(tmp_path / "w2aez")
    shutil.copytree(tiny_world, w2)
    mutate = {"kg": "mem://kg/g1/00004/00003/b1",
              "lc": "mem://lc/g3/00004/00005/b1"}
    for ds_name, want in mutate.items():
        d = os.path.join(w2, "media", f"dataset={ds_name}")
        hitfound = False
        for part in sorted(f for f in os.listdir(d)
                           if f.endswith(".parquet")):
            p = os.path.join(d, part)
            t = pq.read_table(p)
            refs = t["media_ref"].to_pylist()
            if want not in refs:
                continue
            payloads = t["payload"].to_pylist()
            i = refs.index(want)
            payloads[i] = bytes([5]) * len(payloads[i])
            pq.write_table(pa.table({"media_ref": refs,
                                     "payload": payloads},
                                    schema=t.schema), p)
            hitfound = True
            break
        assert hitfound, want
    view, rep = az.aez_stats_incremental(tiny_world, w2)
    assert rep["tiles_recomputed"] == 2  # (4,3) from kg + (4,5) from lc
    full = az.aez_stats(w2)
    assert list(view.index) == list(full.index)
    assert list(view.columns) == list(full.columns)
    assert (view.values == full.values).all()


def test_warp_output_is_first_class_world(tiny_world, tmp_path):
    """The warped world's marker makes it consumable by downstream
    derived-ref ops unchanged: build a pyramid OVER the warped world."""
    from spatial_aez_ray.pipelines import pyramid as pyr
    from spatial_aez_ray.pipelines import warp as wp
    w2 = str(tmp_path / "merc_world")
    rep = wp.warp_to_mercator(tiny_world, "kg", w2)
    levels = pyr.build_pyramid(w2, "kg_merc", str(tmp_path / "merc_pyr"))
    assert len(levels) >= 2
    # level 1 holds <= 1/4 + edge of the warped tiles, none empty
    assert levels["n_tiles"].iloc[0] <= int(rep["n_tiles"][0])
    assert (levels["n_tiles"] > 0).all()


def test_pyramid_rerun_idempotent(tiny_world, tmp_path):
    from spatial_aez_ray.pipelines import pyramid as pyr
    out = str(tmp_path / "pyr")
    first = pyr.build_pyramid(tiny_world, "kg", out)
    again = pyr.build_pyramid(tiny_world, "kg", out)
    assert first.equals(again)


def test_transcode_media_lossless_and_smaller(tiny_world, tmp_path):
    from spatial_aez_ray.pipelines import docops as dops
    rep = dops.transcode_media(tiny_world, "kg", str(tmp_path / "png"))
    assert int(rep["n_tiles"][0]) > 0
    assert int(rep["bytes_out"][0]) < int(rep["bytes_in"][0])


def test_focal_gradient_bit_exact_both_grids(tiny_world):
    from spatial_aez_ray.pipelines import pyramid as pyr
    for ds, hv in (("kg", None), ("lc", 210)):
        mine = pyr.focal_gradient(tiny_world, ds, hole_value=hv)
        odf = oracle.focal_gradient_oracle(SPEC, ds, hole_value=hv)
        assert mine.equals(odf), ds


def test_derived_ref_kernels_deterministic_across_runs(tiny_world,
                                                       tmp_path):
    """Two independent runs of the derived-ref kernels produce
    IDENTICAL summaries (goldens and incremental maintenance rely on
    payload determinism under arbitrary scheduling)."""
    from spatial_aez_ray.pipelines import downsample as dsm
    from spatial_aez_ray.pipelines import pyramid as pyr
    from spatial_aez_ray.pipelines import warp as wp
    a = pyr.build_pyramid(tiny_world, "kg", str(tmp_path / "p1"))
    b = pyr.build_pyramid(tiny_world, "kg", str(tmp_path / "p2"))
    assert a.equals(b)
    a = wp.warp_to_mercator(tiny_world, "kg", str(tmp_path / "w1"))
    b = wp.warp_to_mercator(tiny_world, "kg", str(tmp_path / "w2"))
    assert a.equals(b)
    a = dsm.equalize_tiles(tiny_world, "kg", str(tmp_path / "e1"))
    b = dsm.equalize_tiles(tiny_world, "kg", str(tmp_path / "e2"))
    assert a.equals(b)
    assert pyr.focal_gradient(tiny_world, "kg").equals(
        pyr.focal_gradient(tiny_world, "kg"))


def test_driver_and_distributed_combine_bit_identical(tiny_world, monkeypatch):
    """The size-adaptive combine switch must be invisible: forcing the
    distributed sort+map_groups path yields the EXACT frame the driver
    combine produces (same per-admin order, same sequential float
    accumulation)."""
    from spatial_aez_ray.pipelines import aez as aezmod
    index = extract.build_zonal_index(tiny_world)
    a = extract.zonal_stats(tiny_world, "kg", index=index)
    b_aez = aezmod.aez_stats(tiny_world, index=index)
    monkeypatch.setattr(extract, "DRIVER_COMBINE_MAX_TILES", 0)
    b = extract.zonal_stats(tiny_world, "kg", index=index)
    assert a.equals(b)
    a_aez = aezmod.aez_stats(tiny_world, index=index)
    assert a_aez.equals(b_aez)


def test_label_regions_bit_exact_both_grids(tiny_world):
    from spatial_aez_ray.pipelines import regions as rg
    for ds in ("kg", "lc"):
        mine = rg.label_regions(tiny_world, ds)
        odf = oracle.regions_oracle(SPEC, ds)
        assert mine.equals(odf), ds
        # region ids are canonical min pixels: the class at that pixel
        # must be the region's class, and sizes conserve the fg pixels
        summ = rg.region_summary(mine)
        assert summ["n_px"].sum() == mine["n_px"].sum()


def test_label_components_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.regions import label_components
    arr = np.array([[1, 1, 0, 2],
                    [0, 1, 0, 2],
                    [1, 1, 0, 1],
                    [1, 0, 0, 1]], dtype=np.uint8)
    lab = label_components(arr, 0)
    # the L-shaped 1-region (min pixel 0), the 2-column (min 3), the
    # right 1-column (min 11); 4-connectivity keeps diagonals apart
    assert lab[0, 0] == 0 and lab[1, 1] == 0 and lab[2, 0] == 0
    assert lab[3, 0] == 0            # connected via (2,0)-(2,1)? no:
    # (3,0)-(2,0) vertical neighbors, both class 1 -> same region
    assert lab[0, 3] == 3 and lab[1, 3] == 3
    assert lab[2, 3] == 11 and lab[3, 3] == 11   # 1 vs 2 above: split
    assert (lab[arr == 0] == -1).all()


def test_label_regions_perimeter_batch_boundaries(tiny_world):
    """Perimeter counting needs ALL four neighbor strips in the fetch:
    batch_size=2 makes nearly every neighbor cross-batch, so a missing
    left/top ref would masquerade as a hole and inflate exposed edges."""
    import ray.data
    from spatial_aez_ray.datapipe.util import as_task_fn
    from spatial_aez_ray.pipelines import regions as rg
    from spatial_aez_ray.pipelines.extract import world_grid
    layout = model.world_layout(tiny_world)
    grid = world_grid(tiny_world, layout["kg"]["grid"])
    parts = ray.data.range(grid.tiles_y * grid.tiles_x).map_batches(
        as_task_fn(rg.RegionKernel, world_path=tiny_world, dataset="kg",
                   grid_name=layout["kg"]["grid"],
                   nodata=int(layout["kg"]["nodata"])),
        batch_format="pyarrow", batch_size=2)
    mine = rg.label_regions(tiny_world, "kg", parts=parts)
    assert mine.equals(oracle.regions_oracle(SPEC, "kg"))


def test_proximity_histogram_bit_exact(tiny_world):
    from spatial_aez_ray.pipelines import regions as rg
    mine = rg.proximity_histogram(tiny_world, "lc", 210)
    assert mine.equals(oracle.proximity_oracle(SPEC, "lc", 210))
    # a target class absent from the dataset: every present pixel
    # lands in the single capped bucket (distance d_max+1)
    kg = rg.proximity_histogram(tiny_world, "kg", target=200)
    assert list(kg["dist"]) == [17]


def test_proximity_distances_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.regions import proximity_distances
    arr = np.zeros((5, 7), dtype=np.uint8)
    arr[2, 3] = 9
    d = proximity_distances(arr, 9, d_max=16)
    yy, xx = np.mgrid[0:5, 0:7]
    assert (d == np.abs(yy - 2) + np.abs(xx - 3)).all()
    # cap: distances beyond d_max collapse to d_max+1
    big = np.zeros((1, 40), dtype=np.uint8)
    big[0, 0] = 9
    d2 = proximity_distances(big, 9, d_max=4)
    assert d2[0, 10] == 5 and d2[0, 39] == 5 and d2[0, 3] == 3


def test_export_web_tiles_tree(tiny_world, tmp_path):
    """z/x/y layout, every written tile decodes to its source window,
    zoom tile counts follow the pyramid halving."""
    import os
    from spatial_aez_ray.functions.png import decode_png
    from spatial_aez_ray.pipelines import pyramid as pyr
    proot = str(tmp_path / "pyr")
    tdir = str(tmp_path / "tiles")
    pyr.build_pyramid(tiny_world, "kg", proot)
    rep = pyr.export_web_tiles(tiny_world, "kg", proot, tdir)
    zs = sorted(int(z) for z in os.listdir(tdir))
    assert zs == sorted(rep["z"].tolist())
    assert int(rep.iloc[-1]["n_tiles"]) == 1      # single top tile
    # deepest zoom == base grid: every PNG decodes losslessly and
    # matches the world tile payload
    layout = model.world_layout(tiny_world)
    grid = SPEC.grid(layout["kg"]["grid"])
    from spatial_aez_ray.sources.documents import MediaStore
    ms = MediaStore(tiny_world)
    zmax = str(max(zs))
    n_checked = 0
    for x in os.listdir(os.path.join(tdir, zmax)):
        for yf in os.listdir(os.path.join(tdir, zmax, x)):
            y = int(yf.split(".")[0])
            arr, _ = decode_png(open(
                os.path.join(tdir, zmax, x, yf), "rb").read())
            ref = model.media_ref("kg", grid.name, y, int(x), 1)
            p = ms.fetch([ref])[ref]
            import numpy as np
            src = np.frombuffer(p, np.uint8,
                                count=arr.size).reshape(arr.shape)
            assert (arr == src).all()
            n_checked += 1
    assert n_checked == int(rep.iloc[0]["n_tiles"])


def test_idw_raster_bit_exact_and_local(tiny_world):
    from spatial_aez_ray.pipelines import assign as asg
    mine = asg.idw_raster(tiny_world)
    assert mine.equals(oracle.idw_oracle(SPEC))
    # IDW is a weighted mean: every value within the sample value range
    summ = asg.admin_spatial_summary(tiny_world)
    lo, hi = int(summ["n"].min()), int(summ["n"].max())
    assert mine["value"].between(lo - 1, hi).all()


def test_region_area_km2_bit_exact_both_grids(tiny_world):
    from spatial_aez_ray.pipelines import regions as rg
    for ds in ("kg", "lc"):
        mine = rg.region_area_km2(tiny_world, ds)
        exp = oracle.region_km2_oracle(SPEC, ds)
        assert (mine.values == exp.values).all(), ds
        # OBIA areas tie out against the region pixel counts: every
        # region's km2 is positive and regions match label_regions
        lab = rg.label_regions(tiny_world, ds)
        assert set(mine["region_id"]) == set(lab["region_id"]), ds
        assert (mine["km2"] > 0).all(), ds


def test_buffer_zone_km2_bit_exact(tiny_world):
    from spatial_aez_ray.pipelines import regions as rg
    mine = rg.buffer_zone_km2(tiny_world, "lc", 210, 8)
    exp = oracle.buffer_zone_oracle(SPEC, tiny_world, "lc", 210, 8)
    assert (mine.values == exp.values).all()
    # the buffer band is a strict subset of each admin's land area
    zon = extract.zonal_stats(tiny_world, "lc")
    totals = zon.sum(axis=1)
    for _, r in mine.iterrows():
        assert 0 < r["km2"] <= totals.loc[r["admin"]] + 1e-6


def test_polygonize_invariants_both_grids(tiny_world):
    from spatial_aez_ray import wkb
    from spatial_aez_ray.pipelines import regions as rg
    for ds in ("kg", "lc"):
        poly = rg.polygonize_regions(tiny_world, ds)
        lab = rg.label_regions(tiny_world, ds)
        m = poly.merge(lab, on="region_id")
        assert len(m) == len(lab), ds
        assert (m["area_px"] == m["n_px"]).all(), ds
        assert (m["n_edges"] == m["perim"]).all(), ds
        # every WKB decodes; exterior ring is closed and non-trivial
        g = wkb.loads(poly.iloc[0]["wkb"])
        ext = g[0][0]
        assert (ext[0] == ext[-1]).all() and len(ext) >= 5


def test_chain_rings_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.regions import _chain_rings
    # one unit pixel at (0,0): clockwise boundary, area +1
    e = np.array([[0, 0, 1, 0], [1, 0, 1, 1],
                  [1, 1, 0, 1], [0, 1, 0, 0]], dtype=np.int64)
    rings = _chain_rings(e)
    assert len(rings) == 1
    r = rings[0]
    area2 = int((r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]).sum())
    assert area2 == 2          # shoelace doubles the +1 pixel
    # 3x3 square with the middle missing: exterior + hole rings whose
    # signed areas cancel to the 8 filled pixels
    edges = []
    for y in range(3):
        for x in range(3):
            if (x, y) == (1, 1):
                continue
            nb = {(x, y - 1): (x, y, x + 1, y),
                  (x + 1, y): (x + 1, y, x + 1, y + 1),
                  (x, y + 1): (x + 1, y + 1, x, y + 1),
                  (x - 1, y): (x, y + 1, x, y)}
            for (ny, nx_), edge in zip(
                    [(y - 1, x), (y, x + 1), (y + 1, x), (y, x - 1)],
                    [nb[(x, y - 1)], nb[(x + 1, y)],
                     nb[(x, y + 1)], nb[(x - 1, y)]]):
                inside = 0 <= ny <= 2 and 0 <= nx_ <= 2 \
                    and (nx_, ny) != (1, 1)
                if not inside:
                    edges.append(edge)
    rings = _chain_rings(np.asarray(edges, dtype=np.int64))
    assert len(rings) == 2
    tot = 0
    for r in rings:
        tot += int((r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]).sum())
    assert tot == 16           # (9 - 1) pixels * 2


def test_export_region_shapefile_roundtrip(tiny_world, tmp_path):
    """Raster→vector→.shp/.dbf: the op round-trip verifies internally;
    here additionally feed the written shapefile back through the
    countries importer — the full loop raster → polygons → side table."""
    from spatial_aez_ray.pipelines import regions as rg
    from spatial_aez_ray.sources.shapefile import read_dbf
    base = str(tmp_path / "regions")
    poly = rg.export_region_shapefile(tiny_world, "kg", base)
    attrs = read_dbf(base + ".dbf")
    assert len(attrs) == len(poly)
    lab = rg.label_regions(tiny_world, "kg")
    want = {str(int(r)) for r in lab["region_id"]}
    assert {a["REGION_ID"] for a in attrs} == want


def test_rasterize_admins_bit_exact_and_readback(tiny_world, tmp_path):
    from spatial_aez_ray.pipelines import assign as asg
    out = str(tmp_path / "rast")
    mine = asg.rasterize_admins(tiny_world, out)
    assert mine.equals(oracle.rasterize_oracle(SPEC, tiny_world))
    # precedence rule: summed burned pixels <= double-counted claims
    cc = assign.cell_country(tiny_world).to_pandas()
    assert mine["n_px"].sum() <= len(cc)
    assert mine["n_px"].sum() == len(
        cc.drop_duplicates(["cell_row", "cell_col"]))


def test_region_adjacency_bit_exact_and_consistent(tiny_world):
    from spatial_aez_ray.pipelines import regions as rg
    mine = rg.region_adjacency(tiny_world, "kg")
    assert mine.equals(oracle.region_adjacency_oracle(SPEC, "kg"))
    lab = rg.label_regions(tiny_world, "kg")
    ids = set(lab["region_id"])
    assert set(mine["region_a"]) <= ids and set(mine["region_b"]) <= ids
    # adjacency edges are a subset of each region's perimeter edges
    per = lab.set_index("region_id")["perim"]
    deg = (mine.groupby("region_a")["shared_edges"].sum()
           .add(mine.groupby("region_b")["shared_edges"].sum(),
                fill_value=0))
    assert (deg <= per.reindex(deg.index)).all()


def test_raster_crosstab_bit_exact_and_marginals(tiny_world):
    from spatial_aez_ray.pipelines import regions as rg
    mine = rg.raster_crosstab(tiny_world)
    exp = (oracle.crosstab_oracle(SPEC)
           .sort_values(["cls_a", "cls_b"]).reset_index(drop=True))
    assert mine.equals(exp)
    # marginal over cls_b reproduces the upsampled-kg class histogram
    import numpy as np
    a = oracle.full_raster(SPEC, "kg")[0]
    from spatial_aez_ray.geo import upsample3
    want = np.bincount(upsample3(a).ravel(), minlength=256)
    got = mine.groupby("cls_a")["n_px"].sum()
    for cls, n in got.items():
        assert want[cls] == n


def test_focal_aspect_bit_exact_both_grids(tiny_world):
    from spatial_aez_ray.pipelines import pyramid as pyr
    for ds, hv in (("kg", None), ("lc", 210)):
        mine = pyr.focal_aspect(tiny_world, ds, hole_value=hv)
        assert mine.equals(oracle.aspect_oracle(SPEC, ds, hole_value=hv)), ds


def test_hillshade_bit_exact_both_grids(tiny_world):
    from spatial_aez_ray.pipelines import pyramid as pyr
    for ds, hv in (("kg", None), ("lc", 210)):
        mine = pyr.hillshade(tiny_world, ds, hole_value=hv)
        assert mine.equals(oracle.hillshade_oracle(SPEC, ds,
                                                   hole_value=hv)), ds


def test_shade_codes_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.pyramid import shade_codes
    # flat terrain: shade = round(255*cos(zenith)) everywhere
    flat = shade_codes(np.zeros((3, 3), np.int64),
                       np.zeros((3, 3), np.int64))
    assert (flat == round(255 * np.cos(np.deg2rad(45.0)))).all()
    # a NW-facing 45° slope under the NW sun is brighter than flat;
    # the opposite (SE-facing) slope is darker
    gx = np.array([[8, -8]], np.int64)   # dz/dx = +1 (east high) → W..
    gy = np.array([[8, -8]], np.int64)
    nw, se = shade_codes(gx, gy)[0]
    assert nw > flat[0, 0] > se
    assert 0 <= se and nw <= 255


def test_aspect_codes_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.pyramid import aspect_codes
    gx = np.array([[0, 5, -5, 0, 0, 3, -3]])
    gy = np.array([[0, 1, 1, 5, -5, 3, -3]])
    # flat, E, W, S, N, SE, NW
    assert aspect_codes(gx, gy).tolist() == [[0, 1, 5, 3, 7, 2, 6]]


def test_terrain_metrics_bit_exact(tiny_world):
    from spatial_aez_ray.pipelines import pyramid as pyr
    for fn, ofn in ((pyr.focal_tri, oracle.tri_oracle),
                    (pyr.focal_tpi, oracle.tpi_oracle),
                    (pyr.focal_roughness, oracle.roughness_oracle),
                    (pyr.focal_flowdir, oracle.flowdir_oracle),
                    (pyr.focal_slope_deg, oracle.slope_deg_oracle),
                    (pyr.focal_majority, oracle.majority_oracle)):
        mine = fn(tiny_world, "kg")
        assert mine.equals(ofn(SPEC, "kg")), fn.__name__


def test_terrain_window_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.pyramid import (
        TPI_OFFSET, roughness_codes, tpi_codes, tri_codes)
    pad = np.array([[1, 2, 3],
                    [4, 5, 6],
                    [7, 8, 9]], np.uint8)
    # single center pixel 5: neighbors 1,2,3,4,6,7,8,9
    assert tri_codes(pad)[0, 0] == sum(abs(v - 5)
                                       for v in (1, 2, 3, 4, 6, 7, 8, 9))
    assert tpi_codes(pad)[0, 0] == 8 * 5 - (1+2+3+4+6+7+8+9) + TPI_OFFSET
    assert roughness_codes(pad)[0, 0] == 9 - 1


def test_flowdir_codes_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.pyramid import flowdir_codes
    sink = np.array([[9, 9, 9], [9, 5, 9], [9, 9, 9]], np.uint8)
    assert flowdir_codes(sink)[0, 0] == 0
    # diagonal drop 3 (slope 3/sqrt2) beats cardinal drop 2
    se = np.array([[9, 9, 9], [9, 5, 3], [9, 9, 2]], np.uint8)
    assert flowdir_codes(se)[0, 0] == 2
    # equal drops: cardinal slope wins over diagonal
    e = np.array([[9, 9, 9], [9, 5, 3], [9, 9, 3]], np.uint8)
    assert flowdir_codes(e)[0, 0] == 1
    # exact tie between two cardinals -> smallest code (E before S)
    tie = np.array([[9, 9, 9], [9, 5, 3], [9, 3, 9]], np.uint8)
    assert flowdir_codes(tie)[0, 0] == 1


def test_zonal_window_stats_all_metrics(tiny_world):
    from spatial_aez_ray.pipelines import pyramid as pyr
    for metric in ("tri", "tpi", "roughness", "hillshade"):
        mine = pyr.zonal_window_stats(tiny_world, "kg", metric)
        want = oracle.zonal_window_stats_oracle(SPEC, "kg", metric)
        assert mine.equals(want), metric
    # lc grid too (different tile lattice + hole value path)
    mine = pyr.zonal_window_stats(tiny_world, "lc", "roughness")
    want = oracle.zonal_window_stats_oracle(SPEC, "lc", "roughness")
    assert mine.equals(want)


def test_majority_codes_semantics():
    import numpy as np
    from spatial_aez_ray.pipelines.pyramid import majority_codes
    pad = np.array([[1, 1, 2],
                    [2, 2, 3],
                    [3, 3, 3]], np.uint8)
    # window counts: 1x2, 2x3, 3x4 -> mode 3
    assert majority_codes(pad)[0, 0] == 3
    tie = np.array([[1, 1, 1],
                    [2, 5, 2],
                    [2, 9, 9]], np.uint8)
    # counts: 1x3, 2x3, 5x1, 9x2 -> tie 1 vs 2 -> smallest (1)
    assert majority_codes(tie)[0, 0] == 1


def test_cell_country_sample_partition_invariant(tiny_world):
    """The sampled spatial join is a pure function of cell identity:
    same rows at different batch sizes, subset of the full join, and
    ~pct coverage."""
    from spatial_aez_ray.pipelines import assign
    a = assign.cell_country_sample(tiny_world, pct=10,
                                   batch_size=4).to_pandas()
    b = assign.cell_country_sample(tiny_world, pct=10,
                                   batch_size=64).to_pandas()
    key = ["cell_row", "cell_col", "feature_idx"]
    sa = set(map(tuple, a[key].to_numpy()))
    sb = set(map(tuple, b[key].to_numpy()))
    assert sa == sb
    full = assign.cell_country(tiny_world).to_pandas()
    sf = set(map(tuple, full[key].to_numpy()))
    assert sa <= sf
    assert 0.05 < len(sa) / len(sf) < 0.20


def test_sieve_summary_bit_exact(tiny_world):
    """gdal_sieve analog: distributed region table + adjacency +
    graph contraction == whole-array sequential sieve."""
    from spatial_aez_ray.pipelines import regions as R

    for ds, thr in (("kg", 8), ("wk", 4)):
        mine = R.sieve_summary(tiny_world, ds, thr)
        want = oracle.sieve_oracle(fixtures.TINY, ds, thr)
        assert mine.equals(want), (ds, thr)


def test_sieve_threshold_zero_is_census(tiny_world):
    """Threshold 0 removes nothing: the summary must equal the plain
    label_regions per-class rollup exactly."""
    from spatial_aez_ray.pipelines import regions as R

    regs = R.label_regions(tiny_world, "kg")
    want = (regs.groupby("cls")
            .agg(n_regions=("region_id", "size"), n_px=("n_px", "sum"))
            .reset_index().astype(np.int64))
    mine = R.sieve_summary(tiny_world, "kg", 0)
    assert mine.equals(want)


def test_sieve_contract_matches_brute_raster():
    """The graph-contraction rules must equal literal raster
    repaint-and-relabel (the ground-truth gdal_sieve semantics,
    including the newly-adjacent same-class union) on random noise
    arrays, where merges cascade heavily."""
    from spatial_aez_ray.pipelines.regions import label_components

    def census(arr, bg):
        glab = label_components(arr, bg)
        flat = glab.ravel()
        reps, counts = np.unique(flat[flat >= 0], return_counts=True)
        return glab, dict(zip(reps.tolist(), counts.tolist()))

    def brute(arr, bg, threshold):
        arr = arr.copy()
        frozen: set = set()
        while True:
            glab, size = census(arr, bg)
            moved = False
            for _s, r in sorted((s, r) for r, s in size.items()
                                if s < threshold and r not in frozen):
                mask = glab == r
                nb: set = set()
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    sh = np.full_like(glab, -1)
                    if dy == -1:
                        sh[:-1, :] = glab[1:, :]
                    elif dy == 1:
                        sh[1:, :] = glab[:-1, :]
                    elif dx == -1:
                        sh[:, :-1] = glab[:, 1:]
                    else:
                        sh[:, 1:] = glab[:, :-1]
                    vals = sh[mask]
                    nb |= set(vals[(vals >= 0) & (vals != r)].tolist())
                if not nb:
                    frozen.add(r)
                    continue
                tgt = max(nb, key=lambda c: (size[c], -c))
                arr[mask] = arr.ravel()[tgt]
                moved = True
                break
            if not moved:
                return oracle.sieve_census(arr, bg, 0)

    rng = np.random.default_rng(11)
    for _ in range(4):
        arr = rng.integers(0, 4, size=(13, 16)).astype(np.uint8)
        for thr in (3, 6):
            assert oracle.sieve_census(arr, 0, thr).equals(
                brute(arr, 0, thr)), thr


def test_focal_mean_radius_bit_exact(tiny_world):
    """Radius-k focal mean: k-halo assembly + integral-image window
    algebra == whole-array oracle, at radii that exercise strips,
    corners and the grid-frame clip."""
    from spatial_aez_ray.pipelines import pyramid

    for ds, k in (("kg", 1), ("kg", 3), ("wk", 4)):
        mine = pyramid.focal_mean_radius(tiny_world, ds, k)
        want = oracle.focal_mean_radius_oracle(fixtures.TINY, ds, k)
        assert mine.equals(want), (ds, k)


def test_focal_mean_radius_rejects_overwide(tiny_world):
    from spatial_aez_ray.pipelines import pyramid

    with pytest.raises(Exception):
        pyramid.focal_mean_radius(tiny_world, "kg", 10**6)


def test_geomorphon_bit_exact(tiny_world):
    from spatial_aez_ray.pipelines import pyramid

    for ds, k in (("kg", 1), ("kg", 4), ("wk", 5)):
        mine = pyramid.geomorphon_census(tiny_world, ds, k)
        want = oracle.geomorphon_oracle(fixtures.TINY, ds, k)
        assert mine.equals(want), (ds, k)
        assert (mine["n_minus"] + mine["n_plus"] <= 8).all()


def test_geomorphon_crafted_landforms(tmp_path):
    """A cone apex must classify as a pure peak (8 minus) and the
    center of an inverted cone as a pure pit (8 plus), with the
    apex/pit pixel crossing a tile seam's halo."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff
    from spatial_aez_ray.pipelines import pyramid

    yy, xx = np.mgrid[0:40, 0:40]
    cheb = np.maximum(np.abs(yy - 19), np.abs(xx - 19)).astype(np.int64)
    peak = (200 - 4 * cheb).astype(np.uint8)   # cone, apex at (19,19)
    tif = str(tmp_path / "peak.tif")
    write_geotiff(tif, peak)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    census = pyramid.geomorphon_census(world, "dem", 4)
    row = census[(census.n_minus == 8) & (census.n_plus == 0)]
    assert len(row) == 1 and int(row["n_px"].iloc[0]) == 1
    pit = (55 + 4 * cheb).astype(np.uint8)     # inverted cone
    tif2 = str(tmp_path / "pit.tif")
    write_geotiff(tif2, pit)
    world2 = str(tmp_path / "world2")
    import_geotiff(tif2, world2, "dem", "gd", 10)
    census2 = pyramid.geomorphon_census(world2, "dem", 4)
    row2 = census2[(census2.n_minus == 0) & (census2.n_plus == 8)]
    assert len(row2) == 1 and int(row2["n_px"].iloc[0]) == 1


def test_class_morphology_bit_exact(tiny_world):
    from spatial_aez_ray.pipelines import pyramid

    for ds, tgt, k in (("lc", 210, 2), ("wk", 5, 5)):
        mine = pyramid.class_morphology(tiny_world, ds, tgt, k)
        want = oracle.class_morphology_oracle(fixtures.TINY, ds, tgt, k)
        assert mine.equals(want), (ds, tgt, k)
        v = dict(zip(mine["op"], mine["n_px"]))
        assert (v["erode"] <= v["open"] <= v["source"]
                <= v["close"] <= v["dilate"])


def test_class_morphology_isolated_px(tmp_path):
    """One isolated target pixel: dilate = (2k+1)² clipped, erode and
    open vanish, close returns exactly the source."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff
    from spatial_aez_ray.pipelines import pyramid

    arr = np.full((40, 40), 7, dtype=np.uint8)
    arr[20, 20] = 9
    tif = str(tmp_path / "one.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    out = pyramid.class_morphology(world, "dem", 9, 2)
    v = dict(zip(out["op"], out["n_px"]))
    assert v == {"source": 1, "dilate": 25, "erode": 0, "open": 0,
                 "close": 1}


def test_region_geometry_bit_exact(tiny_world):
    from spatial_aez_ray.pipelines import regions as R

    for ds in ("kg", "lc"):
        mine = R.region_geometry(tiny_world, ds)
        want = oracle.region_geometry_oracle(fixtures.TINY, ds)
        assert mine.equals(want), ds


def test_convex_hull_int_known_shapes():
    from spatial_aez_ray.pipelines.regions import convex_hull_int

    # unit square of 4 points: 4 vertices, area2 = 2
    assert convex_hull_int(np.array(
        [[0, 0], [1, 0], [0, 1], [1, 1]])) == (4, 2)
    # collinear
    assert convex_hull_int(np.array([[0, 0], [2, 2], [1, 1]])) == (2, 0)
    # single point (duplicated)
    assert convex_hull_int(np.array([[3, 3], [3, 3]])) == (1, 0)
    # triangle with interior point: interior never a vertex
    assert convex_hull_int(np.array(
        [[0, 0], [4, 0], [0, 4], [1, 1]])) == (3, 16)


def test_region_geometry_matches_label_census(tiny_world):
    """region_id/cls sets must agree exactly with label_regions, and
    centroids stay inside the bbox."""
    from spatial_aez_ray.pipelines import regions as R

    geo = R.region_geometry(tiny_world, "kg")
    regs = R.label_regions(tiny_world, "kg")
    assert set(geo["region_id"]) == set(regs["region_id"])
    m = geo.merge(regs, on="region_id")
    assert (m["cls_x"] == m["cls_y"]).all()
    cy = m["sum_y"] / m["n_px"]
    cx = m["sum_x"] / m["n_px"]
    assert ((cy >= m["min_y"]) & (cy <= m["max_y"])).all()
    assert ((cx >= m["min_x"]) & (cx <= m["max_x"])).all()

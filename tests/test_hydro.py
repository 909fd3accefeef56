"""D8 flow accumulation — seam-flux fixpoint vs the whole-array
oracle (global-dependency raster algebra; see pipelines/hydro.py)."""

import numpy as np

from spatial_aez_ray import fixtures, oracle
from spatial_aez_ray.pipelines import hydro

SPEC = fixtures.TINY


def test_flow_accum_bit_exact(tiny_world):
    for ds in ("kg", "lc"):
        mine = hydro.flow_accumulation(tiny_world, ds)
        assert mine.equals(oracle.flow_accum_oracle(SPEC, ds)), ds


def test_flow_accum_crafted_ramp(tmp_path):
    """East-flowing ramp spanning 4 tile columns: flux crosses three
    seams, so the fixpoint needs >= 4 rounds — proves the
    multi-tile-crossing delta iteration is exercised (the synthetic
    worlds pit within ~2 rounds)."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = (240 - 3 * np.arange(40, dtype=np.int64))[None, :]
    arr = arr.repeat(40, 0).astype(np.uint8)
    tif = str(tmp_path / "ramp.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    mine, rounds = hydro.flow_accumulation(world, "dem", with_rounds=True)
    pad = np.zeros((42, 42), np.uint8)
    pad[1:-1, 1:-1] = arr
    want = oracle.flow_accum_hist(pad, np.ones((40, 40), bool))
    assert mine.equals(want)
    assert rounds >= 4
    # frame-adjacent pixels drain off-frame (hole pad is far steeper
    # than the 3/px ramp), so interior chains run x=1..39: max acc = 38
    assert int(mine["acc"].max()) == 38


def test_flow_accum_batch_invariance(tiny_world):
    a = hydro.flow_accumulation(tiny_world, "kg", batch_size=7)
    b = hydro.flow_accumulation(tiny_world, "kg", batch_size=64)
    assert a.equals(b)


def test_watershed_bit_exact(tiny_world):
    for ds in ("kg", "lc"):
        mine = hydro.watershed_basins(tiny_world, ds)
        want = oracle.watershed_oracle(SPEC, ds)
        assert mine.equals(want), ds
        # conservation: every present pixel is in exactly one basin
        # or drains externally
        grid = SPEC.grid(fixtures.DATASET_GRID[ds])
        n_present = sum(
            fixtures.tile_arrays(SPEC, ds, ty, tx,
                                 fixtures.land_index(SPEC.seed))
            is not None
            and grid.tile_window(ty, tx)[2] * grid.tile_window(ty, tx)[3]
            or 0
            for ty in range(grid.tiles_y) for tx in range(grid.tiles_x))
        got = int((mine.loc[mine["kind"] == "basin", "size"]
                   * mine.loc[mine["kind"] == "basin", "n"]).sum()
                  + mine.loc[mine["kind"] == "external", "size"].sum())
        assert got == n_present, ds


def test_watershed_crafted_ramp(tmp_path):
    """East-flowing ramp spanning 4 tile columns: every interior pixel
    chains across three seams to the east edge and drains off-frame —
    exercises the multi-hop seam-graph chase (memoized resolve)."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = (240 - 3 * np.arange(40, dtype=np.int64))[None, :]
    arr = arr.repeat(40, 0).astype(np.uint8)
    tif = str(tmp_path / "ramp_ws.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world_ws")
    import_geotiff(tif, world, "dem", "gd", 10)
    mine = hydro.watershed_basins(world, "dem")
    pad = np.zeros((42, 42), np.uint8)
    pad[1:-1, 1:-1] = arr
    want = oracle.watershed_hist(pad, np.ones((40, 40), bool))
    assert mine.equals(want)
    # the hole frame is steeper than the ramp, so every pixel drains
    # off-frame: no basins at all, 1600 external pixels
    assert list(mine["kind"]) == ["external"]
    assert int(mine["size"].iloc[0]) == 1600


def test_watershed_batch_invariance(tiny_world):
    a = hydro.watershed_basins(tiny_world, "kg", batch_size=7)
    b = hydro.watershed_basins(tiny_world, "kg", batch_size=64)
    assert a.equals(b)


def test_strahler_bit_exact(tiny_world):
    for ds in ("kg", "lc"):
        for thr in (1, 2):
            mine = hydro.strahler_orders(tiny_world, ds, threshold=thr)
            want = oracle.strahler_oracle(SPEC, ds, threshold=thr)
            assert mine.equals(want), (ds, thr)


def test_strahler_crafted_confluence(tmp_path):
    """Y-network DEM (40x80, 4x8 tiles): two parallel order-2 valleys
    bend together at c=30..40 and merge into one channel — the merged
    order (>= 3) is NOT locally derivable east of the confluence, so
    it must ride the seam fixpoint across the remaining tile columns
    (round 1's local guess is a 2 that later rounds lift), exercising
    multi-round (max, count-at-max) correction."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    r = np.arange(40)[:, None]
    cc = np.arange(80)
    p1 = np.where(cc <= 30, 10, np.where(cc <= 40, 10 + (cc - 30), 20))
    p2 = np.where(cc <= 30, 30, np.where(cc <= 40, 30 - (cc - 30), 20))
    d = np.minimum(np.abs(r - p1[None, :]), np.abs(r - p2[None, :]))
    arr = (200 - 2 * cc[None, :] + 2 * d).astype(np.uint8)
    tif = str(tmp_path / "ynet.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world_sv")
    import_geotiff(tif, world, "dem", "gd", 10)
    mine, (acc_rounds, rounds) = hydro.strahler_orders(
        world, "dem", with_rounds=True)
    pad = np.zeros((42, 82), np.uint8)
    pad[1:-1, 1:-1] = arr
    want = oracle.strahler_hist(pad, np.ones((40, 80), bool))
    assert mine.equals(want)
    assert int(mine["strahler"].max()) >= 3
    assert rounds >= 3          # the merged order rides the seams
    assert acc_rounds >= 4      # and so does the flux


def test_strahler_batch_invariance(tiny_world):
    a = hydro.strahler_orders(tiny_world, "kg", batch_size=7)
    b = hydro.strahler_orders(tiny_world, "kg", batch_size=64)
    assert a.equals(b)


def test_cost_distance_bit_exact(tiny_world):
    for ds, tgt in (("kg", 14), ("wk", 5)):
        mine = hydro.cost_distance(tiny_world, ds, tgt)
        want = oracle.cost_distance_oracle(SPEC, ds, tgt)
        assert mine.equals(want), ds
        # -1 rows are unreachable passable pixels; conservation:
        # histogram counts sum to the passable pixel count
        base = oracle.full_raster(SPEC, ds)[0]
        nodata = fixtures.DATASET_NODATA[ds]
        assert int(mine["n_px"].sum()) == int((base != nodata).sum())


def test_cost_distance_crafted_corridor(tmp_path):
    """Uniform-cost corridor spanning 4 tile columns with the single
    source in the west tile: distances must propagate across three
    seams (>= 4 rounds), and along the corridor the exact doubled-
    integer metric is checkable by hand: eastward orthogonal steps
    over cost-7 cells cost (7+7)*2 = 28 per step."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = np.full((40, 40), 7, dtype=np.uint8)
    arr[20, 0] = 1  # the lone source pixel (target class 1)
    tif = str(tmp_path / "corridor.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    mine, rounds = hydro.cost_distance(world, "dem", 1, with_rounds=True)
    assert rounds >= 4
    pad = np.zeros((42, 42), np.uint8)
    pad[1:-1, 1:-1] = arr
    want = oracle.cost_distance_hist(pad, 1, 0)
    assert mine.equals(want)
    # hand-checked metric along the source row: pixel (20, x) is
    # reached by x-1 orthogonal cost-7 steps after the (1+7)*2 exit
    # step -> dist = 16 + 28*(x-1); the farthest corridor pixel:
    assert 16 + 28 * 38 in set(mine["dist"])


def test_cost_distance_batch_invariance(tiny_world):
    a = hydro.cost_distance(tiny_world, "kg", 14, batch_size=7)
    b = hydro.cost_distance(tiny_world, "kg", 14, batch_size=64)
    assert a.equals(b)


def test_cost_allocation_bit_exact(tiny_world):
    for ds, tgt in (("kg", 14), ("wk", 5)):
        mine = hydro.cost_allocation(tiny_world, ds, tgt)
        want = oracle.cost_allocation_oracle(SPEC, ds, tgt)
        assert mine.equals(want), ds
        # conservation vs the distance transform: same passable
        # universe, identical unreachable count
        cd = hydro.cost_distance(tiny_world, ds, tgt)
        al = mine[mine["kind"] == "alloc"]
        alloc_px = int((al["size"] * al["n"]).sum())
        unre = int(mine.loc[mine["kind"] == "unreachable", "size"].sum())
        assert alloc_px + unre == int(cd["n_px"].sum())
        assert unre == int(cd.loc[cd["dist"] == -1, "n_px"].sum())


def test_cost_allocation_tie_break(tmp_path):
    """Two sources on a uniform-cost strip: the exact midpoint pixel
    is equidistant and must go to the SMALLER source pixel id (the
    lexicographic packed-key tie-break)."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = np.full((1, 9), 7, dtype=np.uint8)
    arr[0, 0] = 1
    arr[0, 8] = 1  # sources at gid 0 and 8; midpoint gid 4 ties
    tif = str(tmp_path / "strip.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 5)
    mine = hydro.cost_allocation(world, "dem", 1)
    # left region {0,1,2,3,4} = 5 px, right {5,6,7,8} = 4 px
    want_sizes = {(4, 1), (5, 1)}
    got = {(int(s), int(n)) for s, n in
           zip(mine[mine["kind"] == "alloc"]["size"],
               mine[mine["kind"] == "alloc"]["n"])}
    assert got == want_sizes


def test_zonal_cost_stats_bit_exact(tiny_world):
    for ds, tgt in (("kg", 14), ("wk", 5)):
        mine = hydro.zonal_cost_stats(tiny_world, ds, tgt)
        want = oracle.zonal_cost_stats_oracle(SPEC, ds, tgt)
        assert mine.equals(want), ds
        assert (mine["max_dist"] >= mine["min_dist"]).all()
        assert (mine["sum_dist"] >= mine["max_dist"]).all()


def test_flow_length_bit_exact(tiny_world):
    for ds in ("kg", "lc"):
        mine = hydro.flow_path_length(tiny_world, ds)
        want = oracle.flowlen_oracle(SPEC, ds)
        assert mine.equals(want), ds


def test_flow_length_crafted_ramp(tmp_path):
    """East-flowing ramp over 4 tile columns: the longest path runs 38
    edges and crosses three seams — exercises the memoized chase with
    real multi-hop offsets (synthetic worlds pit within 2 edges)."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = (240 - 3 * np.arange(40, dtype=np.int64))[None, :]
    arr = arr.repeat(40, 0).astype(np.uint8)
    tif = str(tmp_path / "ramp.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    mine = hydro.flow_path_length(world, "dem")
    pad = np.zeros((42, 42), np.uint8)
    pad[1:-1, 1:-1] = arr
    want = oracle.flowlen_hist(pad, np.ones((40, 40), bool))
    assert mine.equals(want)
    assert int(mine["path_len"].max()) == 39


def test_cost_path_corridor(tmp_path):
    """Uniform-cost corridor, single west source: the extracted path
    from the farthest pixel telescopes exactly and its step costs are
    the hand-checkable doubled metric (28 per cost-7 orthogonal move,
    42 diagonal)."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = np.full((40, 40), 7, dtype=np.uint8)
    arr[20, 0] = 1
    tif = str(tmp_path / "corridor.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    path = hydro.cost_path(world, "dem", 1)
    d = path["dist"].to_numpy()
    assert int(d[-1]) == 0
    assert (d[:-1] > d[1:]).all()
    drops = set((d[:-1] - d[1:]).tolist())
    # all interior moves are cost-7<->cost-7 (28/42) except the final
    # step into the cost-1 source ((7+1)*2=16 or *3=24)
    assert drops <= {28, 42, 16, 24}
    cd = hydro.cost_distance(world, "dem", 1)
    assert int(d[0]) == int(cd.loc[cd["dist"] >= 0, "dist"].max())


def test_cost_distance_cross_bit_exact(tiny_world):
    mine = hydro.cost_distance_cross(tiny_world, "kg", "wk", 5)
    want = oracle.cost_distance_cross_oracle(SPEC, "kg", "wk", 5)
    assert mine.equals(want)
    # grid-mismatch inputs are rejected
    import pytest
    with pytest.raises(ValueError, match="share the grid"):
        hydro.cost_distance_cross(tiny_world, "kg", "lc", 210)


def test_fill_sinks_bit_exact(tiny_world):
    for ds in ("kg", "wk"):
        mine = hydro.fill_sinks(tiny_world, ds)
        assert mine.equals(oracle.fill_sinks_oracle(SPEC, ds)), ds


def test_fill_sinks_batch_invariance(tiny_world):
    a = hydro.fill_sinks(tiny_world, "kg", batch_size=7)
    b = hydro.fill_sinks(tiny_world, "kg", batch_size=64)
    assert a.equals(b)


def test_fill_sinks_crafted_basin(tmp_path):
    """Closed bowl spanning 4x4 tiles inside a raised rim: every
    interior pixel must fill exactly to the rim's lowest crossing
    (the bottleneck), a depth known analytically — and the basin
    spans multiple tiles, so the seam fixpoint needs > 1 round."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = np.full((40, 40), 50, dtype=np.uint8)   # bowl floor
    arr[0, :] = arr[-1, :] = 200                  # rim
    arr[:, 0] = arr[:, -1] = 200
    arr[0, 17] = 120                              # lowest rim crossing
    tif = str(tmp_path / "bowl.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    mine, rounds = hydro.fill_sinks(world, "dem", with_rounds=True)
    want = oracle.fill_sinks_hist(
        np.pad(arr, 1, constant_values=0), 0)
    assert mine.equals(want)
    assert rounds > 1
    # the bowl floor (38*38 pixels) fills to the 120 crossing: 70 deep
    d = dict(zip(mine["depth"].tolist(), mine["n_px"].tolist()))
    assert d[70] == 38 * 38


def test_fill_sinks_to_dataset_roundtrip(tiny_world, tmp_path):
    """The written filled tiles must decode to exactly the
    priority-flood surface, and the derived world must be readable by
    the standard media machinery."""
    from spatial_aez_ray import model
    from spatial_aez_ray.pipelines.extract import world_grid
    from spatial_aez_ray.sources.documents import MediaStore

    out = str(tmp_path / "filled_world")
    hist = hydro.fill_sinks_to_dataset(tiny_world, "kg", out)
    assert hist.equals(oracle.fill_sinks_oracle(SPEC, "kg"))
    grid = SPEC.grid(fixtures.DATASET_GRID["kg"])
    nodata = fixtures.DATASET_NODATA["kg"]
    base = oracle.full_raster(SPEC, "kg")[0]
    pad = np.full((grid.height + 2, grid.width + 2), nodata, np.uint8)
    pad[1:-1, 1:-1] = base
    land_idx = fixtures.land_index(SPEC.seed)
    present_tiles = []
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if fixtures.tile_arrays(SPEC, "kg", ty, tx, land_idx) is None:
                x, y, nc, nr = grid.tile_window(ty, tx)
                pad[1 + y:1 + y + nr, 1 + x:1 + x + nc] = nodata
            else:
                present_tiles.append((ty, tx))
    wf = oracle.fill_values(pad, nodata)
    filled = np.where(pad != nodata, wf, np.int64(nodata))[1:-1, 1:-1]
    media = MediaStore(out)
    og = world_grid(out, "g1")
    assert (og.width, og.height, og.tile) == (grid.width, grid.height,
                                              grid.tile)
    for ty, tx in present_tiles[:5] + present_tiles[-5:]:
        ref = model.media_ref("kg_filled", "g1", ty, tx, 1)
        p = media.fetch([ref])[ref]
        x, y, nc, nr = grid.tile_window(ty, tx)
        arr = np.frombuffer(p, np.uint8, count=nr * nc).reshape(nr, nc)
        assert (arr == filled[y:y + nr, x:x + nc]).all(), (ty, tx)


def test_cost_corridor_bit_exact(tiny_world):
    mine = hydro.cost_corridor(tiny_world, "wk", 5, 2)
    want = oracle.cost_corridor_oracle(SPEC, "wk", 5, 2)
    assert mine.equals(want)


def test_cost_corridor_crafted_band(tmp_path):
    """Two single-pixel sources on a uniform cost-1 row: along the
    straight segment between them the corridor total is CONSTANT
    (= the A-B least-cost distance), strictly larger off it."""
    from spatial_aez_ray.sources.geotiff import import_geotiff, write_geotiff

    arr = np.ones((20, 40), dtype=np.uint8)
    arr[10, 5] = 2    # source A class 2
    arr[10, 34] = 3   # source B class 3
    tif = str(tmp_path / "corr.tif")
    write_geotiff(tif, arr)
    world = str(tmp_path / "world")
    import_geotiff(tif, world, "dem", "gd", 10)
    out = hydro.cost_corridor(world, "dem", 2, 3)
    # best chain: 29 steps; interior steps cost (1+1)*2, the two
    # steps touching a source cost (2+1)*2 and (1+3)*2
    best = int(out.loc[out["total"] >= 0, "total"].min())
    d = dict(zip(out["total"].tolist(), out["n_px"].tolist()))
    assert best == 27 * 4 + (2 + 1) * 2 + (1 + 3) * 2
    # the straight band between the sources holds >= 28 pixels at best
    assert d[best] >= 28


def test_zonal_fill_stats_bit_exact(tiny_world):
    for ds in ("kg", "lc"):
        mine = hydro.zonal_fill_stats(tiny_world, ds)
        want = oracle.zonal_fill_stats_oracle(SPEC, ds)
        assert mine.equals(want), ds
        assert (mine["n_filled"] <= mine["n_px"]).all()
        assert ((mine["sum_depth"] > 0) == (mine["n_filled"] > 0)).all()


def test_fill_strahler_composition(tiny_world, tmp_path):
    out = str(tmp_path / "fsw")
    hydro.fill_sinks_to_dataset(tiny_world, "kg", out)
    mine = hydro.strahler_orders(out, "kg_filled", threshold=1)
    want = oracle.fill_strahler_oracle(SPEC, "kg", 1)
    assert mine.equals(want)


def test_strahler_empty_network_graceful(tiny_world, tmp_path):
    """A fully-flattened fill (lc) must yield an EMPTY network with
    the stable (strahler, n_px) schema, not a crash."""
    out = str(tmp_path / "fsw_lc")
    hydro.fill_sinks_to_dataset(tiny_world, "lc", out)
    flat = hydro.strahler_orders(out, "lc_filled", threshold=1)
    assert list(flat.columns) == ["strahler", "n_px"] and len(flat) == 0

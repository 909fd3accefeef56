"""Forced-distributed seam fixpoints == driver-fold results, bit-exact.

The hydro family's default seam folds live in a driver dict (fast and
bounded at sandbox scale); above ``seamdist.SEAM_DRIVER_MAX_ROWS``
the same round structure runs with every seam-sized object
distributed (Datasets + coarse-partitioned folds + exact signed-diff
change detection + inflow delivered as work-row list columns). These
tests force the distributed path (``seamdist.FORCE_MODE``) on the
tiny world and assert frame equality with the driver path — the
round-5 verdict's "test that forces the distributed path and matches
the driver path exactly".
"""

import numpy as np
import pandas as pd
import pytest
import ray

from spatial_aez_ray.pipelines import hydro, seamdist


@pytest.fixture
def force_dist():
    seamdist.FORCE_MODE = True
    yield
    seamdist.FORCE_MODE = None


def _both(fn):
    seamdist.FORCE_MODE = False
    drv = fn()
    seamdist.FORCE_MODE = True
    dist = fn()
    seamdist.FORCE_MODE = None
    return drv, dist


@pytest.mark.parametrize("name,call", [
    ("flow_accumulation",
     lambda w: hydro.flow_accumulation(w, "kg")),
    ("strahler_orders",
     lambda w: hydro.strahler_orders(w, "kg", threshold=2)),
    ("cost_distance", lambda w: hydro.cost_distance(w, "kg")),
    ("cost_allocation", lambda w: hydro.cost_allocation(w, "kg")),
    ("fill_sinks", lambda w: hydro.fill_sinks(w, "kg")),
    ("zonal_cost_stats", lambda w: hydro.zonal_cost_stats(w, "kg")),
    ("cost_corridor", lambda w: hydro.cost_corridor(w, "kg")),
    ("cost_distance_cross", lambda w: hydro.cost_distance_cross(w)),
    ("zonal_fill_stats", lambda w: hydro.zonal_fill_stats(w, "kg")),
    ("watershed_basins", lambda w: hydro.watershed_basins(w, "kg")),
    ("flow_path_length", lambda w: hydro.flow_path_length(w, "kg")),
])
def test_distributed_equals_driver(tiny_world, name, call):
    drv, dist = _both(lambda: call(tiny_world))
    pd.testing.assert_frame_equal(drv, dist), name


def test_distributed_rounds_match_driver(tiny_world):
    # identical change detection => identical round structure
    seamdist.FORCE_MODE = False
    drv, drv_rounds = hydro.flow_accumulation(tiny_world, "kg",
                                              with_rounds=True)
    seamdist.FORCE_MODE = True
    dist, dist_rounds = hydro.flow_accumulation(tiny_world, "kg",
                                                with_rounds=True)
    seamdist.FORCE_MODE = None
    assert drv_rounds == dist_rounds
    pd.testing.assert_frame_equal(drv, dist)


def test_fill_to_dataset_distributed(tiny_world, tmp_path, force_dist):
    out = str(tmp_path / "filled_dist")
    hist = hydro.fill_sinks_to_dataset(tiny_world, "kg", out)
    seamdist.FORCE_MODE = False
    out2 = str(tmp_path / "filled_drv")
    want = hydro.fill_sinks_to_dataset(tiny_world, "kg", out2)
    pd.testing.assert_frame_equal(hist, want)
    # the written derived datasets agree byte-for-byte
    from spatial_aez_ray import model
    from spatial_aez_ray.pipelines.extract import world_grid
    from spatial_aez_ray.sources.documents import MediaStore
    a, b = MediaStore(out), MediaStore(out2)
    grid = world_grid(out, "g1")
    refs = [model.media_ref("kg_filled", "g1", ty, tx, 1)
            for ty in range(grid.tiles_y)
            for tx in range(grid.tiles_x)]
    pa_ = a.fetch(refs, strict=False)
    pb_ = b.fetch(refs, strict=False)
    assert pa_ == pb_ and any(v is not None for v in pa_.values())


def test_changed_dsts_exact_diff(ray_session):
    import pyarrow as pa
    import ray.data

    def mk(rows):
        key = np.array([(d << 31) | p for d, p, _ in rows], np.int64)
        v1 = np.array([v for _, _, v in rows], np.int64)
        return ray.data.from_arrow(pa.table({
            "key": pa.array(key), "v1": pa.array(v1)}))

    old = mk([(1, 0, 5), (2, 3, 7), (3, 1, 9)])
    # tile 1 unchanged, tile 2 value changed, tile 3 vanished, 4 new
    new = mk([(1, 0, 5), (2, 3, 8), (4, 2, 1)])
    got = seamdist.changed_dsts(new, old, two_vals=False)
    assert got == [2, 3, 4]
    assert seamdist.changed_dsts(old, old, two_vals=False) == []
    assert seamdist.changed_dsts(None, old, two_vals=False) == [1, 2, 3]
    assert seamdist.changed_dsts(new, None, two_vals=False) == [1, 2, 4]


def test_pack_unpack_roundtrip(ray_session):
    import pyarrow as pa
    import ray.data
    key = np.array([(7 << 31) | 5, (7 << 31) | 9, (12 << 31) | 0],
                   np.int64)
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(key),
        "v1": pa.array(np.array([100, 200, 300], np.int64))}))
    work = seamdist.pack_work([7, 12, 99], [("in", ds, False)])
    tbl = pa.concat_tables([pa.table(b) for b in
                            work.iter_batches(batch_format="pyarrow")])
    got = seamdist.unpack_inflow(tbl, "in")
    assert got == {7: {5: 100, 9: 200}, 12: {0: 300}}
    ids = sorted(tbl["id"].to_pylist())
    assert ids == [7, 12, 99]  # inflow-less tiles still get work rows


def test_distributed_fixpoint_bit_exact_after_worker_kill(
        tiny_world, tmp_path, monkeypatch):
    """The forced-distributed cost fixpoint must survive a worker
    SIGKILL mid-round and still match the driver path bit-for-bit
    (Ray retries the killed map task; every seamdist stage is
    deterministic, so the retry reproduces the same rows)."""
    import os

    from spatial_aez_ray.pipelines import hydro

    marker = str(tmp_path / "killed")
    base = hydro._CostTiles

    class KillOnce(base):  # function-scope: shipped by value
        def __call__(self, b):
            import os as _os
            import signal
            if not _os.path.exists(marker):
                try:
                    open(marker, "x").close()
                except FileExistsError:
                    pass
                else:
                    _os.kill(_os.getpid(), signal.SIGKILL)
            return super().__call__(b)

    seamdist.FORCE_MODE = False
    want = hydro.cost_distance(tiny_world, "kg")
    monkeypatch.setattr(hydro, "_CostTiles", KillOnce)
    seamdist.FORCE_MODE = True
    try:
        got = hydro.cost_distance(tiny_world, "kg")
    finally:
        seamdist.FORCE_MODE = None
    assert os.path.exists(marker), "kill stage never fired"
    pd.testing.assert_frame_equal(want, got)

"""Windowed histogram downsample (S9/A5), thumbnails (S8), salted
aggregation (skew), vs straight-line numpy/pandas oracles."""

import numpy as np
import pandas as pd
import pytest

from spatial_aez_ray import fixtures, model
from spatial_aez_ray.pipelines import downsample


def test_window_histogram_matches_loop_oracle():
    rng = np.random.RandomState(3)
    child = rng.randint(0, 256, size=(12, 9)).astype(np.uint8)
    bins = downsample.DEFAULT_BINS
    out = downsample.window_histogram(child, 3, bins)
    assert out.shape == (len(bins) + 1, 4, 3)
    for oy in range(4):
        for ox in range(3):
            win = child[oy * 3:(oy + 1) * 3, ox * 3:(ox + 1) * 3]
            for b, (lo, hi) in enumerate(bins):
                assert out[b, oy, ox] == np.sum((win >= lo) & (win < hi))
            assert out[-1, oy, ox] == int(np.floor(win.astype(float).mean()))


def test_downsample_pipeline_conserves_counts(tiny_world):
    """Every child pixel lands in exactly one bin: per-window bin counts
    sum to factor² across bands 1..8."""
    ds = downsample.downsample_histogram(tiny_world, "lc", factor=3)
    pdf = ds.to_pandas()
    assert len(pdf) > 0
    by_doc = {}
    for _, row in pdf.iterrows():
        band = int(row["media_ref"].rsplit("b", 1)[-1])
        by_doc.setdefault(row["doc_id"], {})[band] = np.frombuffer(
            row["payload"], np.uint8).astype(np.int64)
    for doc_id, bands in by_doc.items():
        nbins = len(downsample.DEFAULT_BINS)
        assert set(bands) == set(range(1, nbins + 2)), doc_id
        total = sum(bands[b] for b in range(1, nbins + 1))
        assert (total == 9).all(), doc_id


def test_downsample_spans_preserved(tiny_world):
    """Output docs are new documents but their own span sequence must be
    internally consistent (meta + one media span per band, in order)."""
    ds = downsample.downsample_histogram(tiny_world, "lc", factor=3)
    t = ds.to_arrow_refs()
    import ray
    import pyarrow as pa
    tbl = pa.concat_tables([x if isinstance(x, pa.Table)
                            else pa.Table.from_batches([x])
                            for x in ray.get(t)])
    row = tbl.slice(0, 1).to_pylist()[0]
    kinds = [s["kind"] for s in sorted(row["spans"], key=lambda s: s["offset"])]
    assert kinds[0] == "meta" and all(k == "media" for k in kinds[1:])


def test_thumbnail_stride(tiny_world):
    ds = downsample.thumbnail_tiles(tiny_world, "kg", stride=8)
    pdf = ds.to_pandas()
    assert len(pdf) > 0
    r = pdf.iloc[0]
    assert r["doc_id"].endswith("/thumb")
    assert len(r["payload"]) == r["nrows"] * r["ncols"]
    assert r["nrows"] == (64 + 7) // 8


def test_salted_sum_equals_plain_groupby():
    import os
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/lineitem.parquet"):
        pytest.skip("no testdata")
    import ray.data
    import pyarrow as pa

    def to_cents(b: pa.Table) -> pa.Table:
        q = np.round(np.asarray(b["l_quantity"].to_numpy(
            zero_copy_only=False))).astype(np.int64)
        return pa.table({"l_returnflag": b["l_returnflag"], "qty": q})

    from spatial_aez_ray.stages.salted import salted_sum
    ds = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity"])
    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    got = salted_sum(cents, ["l_returnflag"], "qty", n_salts=8)
    import duckdb
    want = duckdb.sql(
        f"SELECT l_returnflag, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))"
        f" AS BIGINT) AS qty FROM "
        f"read_parquet('{sf}/lineitem.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    assert list(got["l_returnflag"]) == list(want["l_returnflag"])
    assert list(got["qty"].astype(np.int64)) == list(want["qty"].astype(np.int64))

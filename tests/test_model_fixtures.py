"""Document model invariants and fixture-world properties."""

import numpy as np
import pyarrow as pa
import pytest

from spatial_aez_ray import fixtures, model, wkb
from spatial_aez_ray.sources.documents import MediaStore, read_documents_table


def test_document_roundtrip_and_span_order():
    d = model.make_document("kg", "g1", 3, 7, 448, 192, 64, 64,
                            bands=2, nodata=0, caption="hi")
    t = pa.Table.from_pylist([d], schema=model.DOCUMENTS_SCHEMA)
    row = t.to_pylist()[0]
    meta = model.parse_meta(row["spans"])
    assert meta["tile_y"] == 3 and meta["x_off"] == 448
    refs = model.media_refs(row["spans"])
    assert refs == ["mem://kg/g1/00003/00007/b1", "mem://kg/g1/00003/00007/b2"]
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == sorted(offsets)
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == ["meta", "media", "media", "caption"]


def test_span_signature_detects_mutation():
    d = model.make_document("kg", "g1", 0, 0, 0, 0, 64, 64, bands=1, nodata=0)
    t1 = pa.Table.from_pylist([d], schema=model.DOCUMENTS_SCHEMA)
    model.assert_spans_equal(t1, t1)
    d2 = dict(d)
    d2["spans"] = [d["spans"][1], d["spans"][0]]  # reorder
    # re-number offsets so the order change is real, not just offsets
    d2["spans"] = [dict(s, offset=i) for i, s in enumerate(d2["spans"])]
    t2 = pa.Table.from_pylist([d2], schema=model.DOCUMENTS_SCHEMA)
    with pytest.raises(AssertionError):
        model.assert_spans_equal(t1, t2)


def test_tile_codec_roundtrip():
    a = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    assert (model.decode_tile(model.encode_tile(a), 64, 64) == a).all()


def test_world_features_required_cases():
    feats = fixtures.build_countries()
    admins = [f["admin"] for f in feats]
    # admin=None drop case
    assert None in admins
    # many-to-one fold: two features, one admin
    assert sum(1 for a in admins if a == "Fredonia") == 2
    # ≥100× area skew between the largest and smallest feature bboxes
    areas = []
    for f in feats:
        x0, y0, x1, y1 = wkb.bounds(wkb.loads(f["geometry"]))
        areas.append((x1 - x0) * (y1 - y0))
    assert max(areas) / min(areas) >= 100


def test_world_media_store_and_sparse_pruning(tiny_world):
    docs = read_documents_table(tiny_world, ["kg"])
    grid = fixtures.TINY.g1
    # sparse pruning: all-ocean tiles are absent
    assert docs.num_rows < grid.tiles_y * grid.tiles_x
    store = MediaStore(tiny_world)
    row = docs.slice(0, 1).to_pylist()[0]
    meta = model.parse_meta(row["spans"])
    refs = model.media_refs(row["spans"])
    payloads = store.fetch(refs)
    arr = model.decode_tile(payloads[refs[0]], meta["nrows"], meta["ncols"])
    assert arr.shape == (meta["nrows"], meta["ncols"])
    assert arr.max() <= 30  # kg vocabulary


def test_absent_tiles_are_all_ocean(tiny_world):
    """Pruned (absent) documents must contribute zero area: every
    absent tile is fully ocean (no land pixel)."""
    docs = read_documents_table(tiny_world, ["kg"])
    present = set()
    for row in docs.to_pylist():
        meta = model.parse_meta(row["spans"])
        present.add((meta["tile_y"], meta["tile_x"]))
    spec = fixtures.TINY
    grid = spec.g1
    idx = fixtures.land_index(spec.seed)
    for ty in range(grid.tiles_y):
        for tx in range(grid.tiles_x):
            if (ty, tx) in present:
                continue
            assert not fixtures.land_mask_tile(spec, grid, ty, tx, idx).any()

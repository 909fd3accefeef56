"""The import-gated Lance read branch (sources/documents.py).

The ``lance`` package is not installed in this sandbox, so the branch
can't run against real Lance tables — but everything that is OUR code
(``*.lance`` dataset discovery, dataset-level pruning, the multi-uri
union, column pass-through, and the missing-package error) is
exercised here with ``ray.data.read_lance`` faked to read a sibling
parquet file laid inside the ``.lance`` dir.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from spatial_aez_ray.sources import documents


def _make_lance_world(root, datasets=("kg", "lc")):
    """World whose document dirs hold ``*.lance`` dataset dirs, each
    containing one parquet part standing in for Lance fragments."""
    for i, ds_name in enumerate(datasets):
        d = os.path.join(root, "documents", f"dataset={ds_name}",
                         "docs.lance")
        os.makedirs(d)
        t = pa.table({"doc_id": [f"{ds_name}/{j:03d}" for j in range(3)],
                      "value": [10 * i + j for j in range(3)]})
        pq.write_table(t, os.path.join(d, "data.parquet"))
    return str(root)


def test_lance_uris_discovery_and_pruning(tmp_path):
    world = _make_lance_world(tmp_path)
    uris = documents.lance_uris(world)
    assert [os.path.basename(os.path.dirname(u)) for u in uris] == \
        ["dataset=kg", "dataset=lc"]
    assert all(u.endswith(".lance") for u in uris)
    only_lc = documents.lance_uris(world, ["lc"])
    assert len(only_lc) == 1 and "dataset=lc" in only_lc[0]
    assert documents.lance_uris(str(tmp_path / "nope")) == []


def test_read_documents_errors_without_lance(tmp_path, monkeypatch):
    world = _make_lance_world(tmp_path)
    monkeypatch.setattr(documents, "HAVE_LANCE", False)
    with pytest.raises(ImportError, match="lance"):
        documents.read_documents(world)


def test_read_documents_lance_plumbing(tmp_path, monkeypatch):
    world = _make_lance_world(tmp_path)
    seen_columns = []

    def fake_read_lance(uri, columns=None):
        assert uri.endswith(".lance")
        seen_columns.append(columns)
        return ray.data.read_parquet(os.path.join(uri, "data.parquet"),
                                     columns=columns)

    monkeypatch.setattr(documents, "HAVE_LANCE", True)
    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance,
                        raising=False)

    got = documents.read_documents(world).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [f"kg/{j:03d}" for j in range(3)] + \
        [f"lc/{j:03d}" for j in range(3)]
    assert list(got["value"]) == [0, 1, 2, 10, 11, 12]

    pruned = documents.read_documents(world, ["lc"], columns=["doc_id"])
    assert pruned.schema().names == ["doc_id"]
    assert pruned.count() == 3
    assert seen_columns[-1] == ["doc_id"]

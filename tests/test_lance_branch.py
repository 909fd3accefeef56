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


class _FakeLance:
    """Stand-in for the lance module: write_dataset appends parquet
    fragments inside the .lance dir (create wipes), so the faked
    read_lance (a parquet read of the dir) round-trips."""

    @staticmethod
    def write_dataset(table, uri, mode="create"):
        import shutil
        if mode == "create":
            shutil.rmtree(uri, ignore_errors=True)
            os.makedirs(uri)
        elif not os.path.isdir(uri):
            raise FileNotFoundError(uri)
        n = len([f for f in os.listdir(uri) if f.endswith(".parquet")])
        pq.write_table(table, os.path.join(uri, f"frag-{n:04d}.parquet"))


def test_convert_world_to_lance_roundtrip(tmp_path, monkeypatch):
    """Parquet world -> Lance conversion: streamed create+append,
    parquet parts removed only after completion, read_documents
    prefers the lance dirs and returns identical rows."""
    # a tiny parquet world with two datasets, two parts each
    for ds_name in ("kg", "lc"):
        d = os.path.join(tmp_path, "documents", f"dataset={ds_name}")
        os.makedirs(d)
        for p in range(2):
            t = pa.table({
                "doc_id": [f"{ds_name}/{p}/{j}" for j in range(3)],
                "value": [100 * p + j for j in range(3)]})
            pq.write_table(t, os.path.join(d, f"part-{p:05d}.parquet"))
    world = str(tmp_path)
    before = (documents.read_documents_table(world)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # the pyarrow dataset read adds the hive partition column; the
    # lance dirs don't carry it
    before = before[["doc_id", "value"]]

    monkeypatch.setattr(documents, "lance", _FakeLance)
    monkeypatch.setattr(documents, "HAVE_LANCE", True)
    man = documents.convert_world_documents_to_lance(world)
    assert man["dataset"].tolist() == ["kg", "lc"]
    assert man["n_parts"].tolist() == [2, 2]
    assert man["n_rows"].tolist() == [6, 6]
    # parquet parts gone, lance dirs present
    for ds_name in ("kg", "lc"):
        d = os.path.join(world, "documents", f"dataset={ds_name}")
        assert [f for f in os.listdir(d) if f.endswith(".parquet")] == []
        assert os.path.isdir(os.path.join(d, "docs.lance"))

    def fake_read_lance(uri, columns=None):
        # raw per-file reads: pq.read_table would hive-infer the
        # dataset= component of the path, which real Lance doesn't
        ts = [pq.ParquetFile(os.path.join(uri, f)).read(columns=columns)
              for f in sorted(os.listdir(uri))
              if f.endswith(".parquet")]
        return ray.data.from_arrow(pa.concat_tables(ts))

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance,
                        raising=False)
    after = (documents.read_documents(world).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert after.equals(before)


def test_convert_requires_lance(tmp_path, monkeypatch):
    monkeypatch.setattr(documents, "HAVE_LANCE", False)
    with pytest.raises(ImportError, match="lance"):
        documents.convert_world_documents_to_lance(str(tmp_path))


def test_real_lance_gate_activation():
    """The real-package round-trip gate self-registers iff ``lance``
    is importable (round-5 verdict task 7) — skipped-with-reason in
    this sandbox, active with zero code changes elsewhere."""
    import importlib.util
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as E
    q = E.queries()
    if importlib.util.find_spec("lance") is None:
        assert "spatial_lance_roundtrip" not in q
        pytest.skip("lance package absent — real round-trip gate "
                    "stays unregistered (activates automatically "
                    "when pylance appears)")
    man = q["spatial_lance_roundtrip"]("x")
    assert man["dataset"].tolist() == ["kg"]

"""Document source routing: Lance branch + parquet fallback."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spatial_aez_ray.sources import documents as docsrc


def _fake_world(tmp_path, layout: str) -> str:
    """A minimal world holding one dataset dir in the given layout."""
    d = tmp_path / "world" / "documents" / "dataset=kg"
    d.mkdir(parents=True)
    t = pa.table({"doc_id": pa.array(["a", "b"]),
                  "text": pa.array(["x", "y"])})
    if layout == "parquet":
        pq.write_table(t, str(d / "part-00000.parquet"))
    else:  # a Lance dataset is a directory ending in .lance
        lance_dir = d / "data-00000.lance"
        lance_dir.mkdir()
        # side-car parquet the stubbed read_lance serves from
        pq.write_table(t, str(d / "shadow.parquet"))
    return str(tmp_path / "world")


def test_read_documents_parquet_fallback(tmp_path):
    wp = _fake_world(tmp_path, "parquet")
    ds = docsrc.read_documents(wp, ["kg"], columns=["doc_id"])
    assert sorted(r["doc_id"] for r in ds.take_all()) == ["a", "b"]


def test_read_documents_routes_through_lance(tmp_path, monkeypatch):
    """With a .lance layout and the package 'available', read_documents
    must call ray.data.read_lance with the dataset URI and columns."""
    import ray.data as rd
    wp = _fake_world(tmp_path, "lance")
    calls = []

    def fake_read_lance(uri, *, columns=None, **kw):
        calls.append((uri, tuple(columns or [])))
        shadow = os.path.join(os.path.dirname(uri), "shadow.parquet")
        return rd.read_parquet(shadow, columns=list(columns or []) or None)

    monkeypatch.setattr(docsrc, "HAVE_LANCE", True)
    monkeypatch.setattr(rd, "read_lance", fake_read_lance)
    ds = docsrc.read_documents(wp, ["kg"], columns=["doc_id"])
    assert sorted(r["doc_id"] for r in ds.take_all()) == ["a", "b"]
    assert calls == [(os.path.join(wp, "documents", "dataset=kg",
                                   "data-00000.lance"), ("doc_id",))]


def test_read_documents_lance_layout_without_package_raises(tmp_path,
                                                            monkeypatch):
    wp = _fake_world(tmp_path, "lance")
    monkeypatch.setattr(docsrc, "HAVE_LANCE", False)
    with pytest.raises(ImportError, match="[Ll]ance"):
        docsrc.read_documents(wp, ["kg"])

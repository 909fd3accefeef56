"""Interleaved-document source + sibling media store.

Physical format is Parquet laid out as
``{world}/documents/dataset={ds}/part-*.parquet`` (one directory per
dataset, files sorted by doc_id = cell-prefix order) with a sibling
``{world}/media/dataset={ds}/...`` table (media_ref -> payload bytes).
If the ``lance`` package is importable the same layout can be read via
``ray.data.read_lance`` — gated behind an import-try because Lance is
not baked into this sandbox (BASELINE.json names Lance as the target
table format; Parquet is the tested stand-in with identical schema).

Scale notes:
* ``read_documents`` prunes at the source — only requested datasets'
  directories are listed, only requested columns leave storage.
* ``MediaStore`` is per-actor state (opened once in ``__init__`` of a
  stage actor): payload fetches are filtered parquet reads pruned by
  row-group statistics on media_ref, the stand-in for Lance blob takes.
  Because document batches arrive in doc_id (cell-prefix) order, each
  batch touches a handful of adjacent row groups, not the whole table.
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.dataset as pds

try:  # pragma: no cover - lance not available in this sandbox
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def document_paths(world_path: str, datasets: list[str] | None = None,
                   kind: str = "documents") -> list[str]:
    """Parquet file paths of selected datasets (source-level pruning)."""
    root = os.path.join(world_path, kind)
    out = []
    for n in sorted(os.listdir(root)):
        ds_name = n.split("=", 1)[1] if "=" in n else n
        if datasets is None or ds_name in datasets:
            d = os.path.join(root, n)
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".parquet"))
    return out


def read_documents(world_path: str, datasets: list[str] | None = None,
                   columns: list[str] | None = None):
    """Ray Dataset over the interleaved documents of selected datasets."""
    import ray.data as rd

    return rd.read_parquet(document_paths(world_path, datasets), columns=columns)


def read_documents_table(world_path: str, datasets: list[str] | None = None):
    """Driver-side pyarrow read (small worlds / tests)."""
    return pds.dataset(document_paths(world_path, datasets)).to_table()


class MediaStore:
    """Payload fetch by media_ref, one instance per actor (ST1 analog:
    the reference keeps GDAL datasets open per process,
    process_imagery.py:218-227; we keep pyarrow datasets open per actor).
    """

    def __init__(self, world_path: str):
        self._root = os.path.join(world_path, "media")
        self._per_dataset: dict[str, pds.Dataset] = {}

    def _dataset_for(self, ref: str) -> str:
        # "mem://{dataset}/..." -> dataset
        return ref.split("//", 1)[1].split("/", 1)[0]

    def fetch(self, refs: list[str]) -> dict[str, bytes]:
        """Batch point-lookup of payloads; prunes to the datasets named
        by the refs and filters row groups by media_ref statistics."""
        by_ds: dict[str, list[str]] = {}
        for r in refs:
            by_ds.setdefault(self._dataset_for(r), []).append(r)
        out: dict[str, bytes] = {}
        for ds_name, ds_refs in by_ds.items():
            if ds_name not in self._per_dataset:
                self._per_dataset[ds_name] = pds.dataset(
                    os.path.join(self._root, f"dataset={ds_name}"))
            t = self._per_dataset[ds_name].to_table(
                filter=pc.field("media_ref").isin(ds_refs))
            for ref, payload in zip(t.column("media_ref").to_pylist(),
                                    t.column("payload").to_pylist()):
                out[ref] = payload
        missing = [r for r in refs if r not in out]
        if missing:
            raise KeyError(f"media refs not found: {missing[:3]}... ({len(missing)})")
        return out

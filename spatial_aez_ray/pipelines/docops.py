"""Document-table operations: enrich + cell-prefix range repartition.

``normalize_documents`` is the doc→doc pipeline: sort the interleaved
documents by doc_id (Z-ordered cell prefix → the sort IS the spatial
repartition), enrich with partition metadata columns, and rewrite the
table as range-partitioned part files. Spans pass through untouched —
the per-row span-sequence invariant (kind, text, media_ref, order) is
asserted by tests over this pipeline's output (BASELINE.json).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import model
from ..sources.documents import read_documents


def enrich(batch: pa.Table) -> pa.Table:
    """Add (dataset, tile_key) columns derived from doc_id; spans
    untouched."""
    split = pc.split_pattern(batch["doc_id"], "/")
    ds_col = pc.list_element(split, 0)
    tile_key = pc.utf8_slice_codeunits(batch["doc_id"], -11)
    return (batch.append_column("dataset", ds_col)
                 .append_column("tile_key", tile_key))


class _DocWriter:
    """Atomic per-batch part writer, file named by the batch's doc_id
    range (resumable layout; idempotent rewrite)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"part": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        lo = batch.column("doc_id")[0].as_py().replace("/", "_")
        os.makedirs(self.out_dir, exist_ok=True)
        final = os.path.join(self.out_dir, f"part-{lo}.parquet")
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(batch, tmp)
        os.replace(tmp, final)
        return pa.table({"part": pa.array([final], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def normalize_documents(world_path: str, out_dir: str, *,
                        datasets: list[str] | None = None,
                        rows_per_part: int = 512):
    """Sort by doc_id (cell-prefix order) → enriched, range-partitioned
    document parts under out_dir. Returns the write report DataFrame."""
    docs = read_documents(world_path, datasets, columns=["doc_id", "spans"])
    from ..datapipe.util import as_task_fn
    out = (docs.map_batches(enrich, batch_format="pyarrow")
               .sort("doc_id")
               .map_batches(as_task_fn(_DocWriter, out_dir=out_dir),
                            batch_format="pyarrow",
                            batch_size=rows_per_part))
    return out.to_pandas()


def read_normalized(out_dir: str) -> pa.Table:
    return pq.ParquetDataset(out_dir).read()


# ---------------------------------------------------------------------------
# media integrity scan — corrupt-tile detector (data-quality pass)
# ---------------------------------------------------------------------------

def media_integrity_scan(world_path: str, dataset: str = "kg",
                         *, concurrency: int | tuple = (1, 4)):
    """Validate every document's media against its own metadata:
    payload byte length must equal nrows × ncols per band, and every
    meta-declared media ref must resolve. Returns (n_docs, n_media,
    n_missing, n_bad_size) plus the violating doc_ids
    (violation-sized, never corpus-sized) — the ingestion-health scan
    a 100 TB media lake runs after every load.

    One shuffle-free streaming pass: per batch, ONE batched
    footer-pruned MediaStore fetch (strict=False) + vectorized length
    checks; each batch reduces to a single partial row.
    """
    import json

    import numpy as np
    import pandas as pd

    from ..sources.documents import MediaStore

    class Scan:
        def __init__(self):
            self.media = MediaStore(world_path)

        def __call__(self, b: pa.Table) -> pa.Table:
            want, per_doc = [], []
            for did, spans in zip(b["doc_id"].to_pylist(),
                                  b["spans"].to_pylist()):
                meta, refs = None, []
                for s in spans:
                    if s["kind"] == "meta":
                        meta = json.loads(s["text"])
                    elif s["kind"] == "media":
                        refs.append(s["media_ref"])
                per_doc.append((did, meta, refs))
                want.extend(refs)
            payloads = self.media.fetch(want, strict=False)
            n_missing = n_bad = 0
            bad_docs = []
            for did, meta, refs in per_doc:
                expect = meta["nrows"] * meta["ncols"]
                ok = True
                for r in refs:
                    p = payloads.get(r)
                    if p is None:
                        n_missing += 1
                        ok = False
                    elif len(p) != expect:
                        n_bad += 1
                        ok = False
                if not ok:
                    bad_docs.append(did)
            return pa.table({
                "n_docs": pa.array([len(per_doc)], pa.int64()),
                "n_media": pa.array([len(want)], pa.int64()),
                "n_missing": pa.array([n_missing], pa.int64()),
                "n_bad_size": pa.array([n_bad], pa.int64()),
                "bad_docs": pa.array([bad_docs],
                                     pa.list_(pa.string()))})

    docs = read_documents(world_path, [dataset],
                          columns=["doc_id", "spans"])
    parts = docs.map_batches(Scan, batch_format="pyarrow",
                             concurrency=concurrency).to_pandas()
    bad = sorted(d for lst in parts["bad_docs"] for d in lst)
    out = pd.DataFrame([{
        "n_docs": np.int64(parts["n_docs"].sum()),
        "n_media": np.int64(parts["n_media"].sum()),
        "n_missing": np.int64(parts["n_missing"].sum()),
        "n_bad_size": np.int64(parts["n_bad_size"].sum()),
        "n_bad_docs": np.int64(len(bad))}])
    return out, bad


# ---------------------------------------------------------------------------
# media transcoding — format migration of payloads at scale
# ---------------------------------------------------------------------------

def transcode_media(world_path: str, dataset: str, out_dir: str, *,
                    codec: str = "png",
                    concurrency: int | tuple = (1, 4)):
    """Migrate a dataset's raw tile payloads to ``codec`` (PNG via the
    from-scratch RFC 2083 coder) in a NEW dataset under ``out_dir`` —
    the storage-format migration a long-lived media lake runs (raw →
    compressed) without touching the document/span structure.

    One shuffle-free streaming pass: batched footer-pruned fetch,
    vectorized-enough per-tile encode, atomic part write (render's
    writer). Every tile is decode-VERIFIED lossless inside the worker
    before it is written — a transcoding error fails the job, never
    the archive. Returns (n_tiles, bytes_in, bytes_out).
    """
    import functools

    import numpy as np
    import pandas as pd

    from .. import model
    from ..functions.png import decode_png, encode_png
    from ..sources.documents import MediaStore

    if codec != "png":
        raise ValueError("only the png codec is built in")

    class Transcode:
        def __init__(self):
            self.media = MediaStore(world_path)

        def __call__(self, b: pa.Table) -> pa.Table:
            import json
            metas, refs = [], []
            for spans in b["spans"].to_pylist():
                meta = None
                rr = []
                for s in spans:
                    if s["kind"] == "meta":
                        meta = json.loads(s["text"])
                    elif s["kind"] == "media":
                        rr.append(s["media_ref"])
                metas.append((meta, rr))
            want = [r for _, rr in metas for r in rr]
            payloads = self.media.fetch(want)
            rows, b_in, b_out = [], 0, 0
            for meta, rr in metas:
                ty, tx = meta["tile_y"], meta["tile_x"]
                doc = model.make_document(
                    f"{dataset}_png", meta["grid"], ty, tx,
                    meta["x_off"], meta["y_off"], meta["ncols"],
                    meta["nrows"], bands=len(rr),
                    nodata=meta["nodata"])
                for band, ref in enumerate(rr, start=1):
                    raw = payloads[ref]
                    arr = np.frombuffer(raw, np.uint8).reshape(
                        meta["nrows"], meta["ncols"])
                    png = encode_png(arr)
                    back, _ = decode_png(png)
                    if not (back == arr).all():  # pragma: no cover
                        raise AssertionError(
                            f"lossy transcode at {ref}")
                    b_in += len(raw)
                    b_out += len(png)
                    rows.append({
                        "doc_id": doc["doc_id"], "spans": doc["spans"],
                        "media_ref": model.media_ref(
                            f"{dataset}_png", meta["grid"], ty, tx,
                            band),
                        "payload": png})
            t = pa.Table.from_pylist(rows, schema=pa.schema([
                ("doc_id", pa.string()),
                ("spans", pa.list_(model.SPAN_TYPE)),
                ("media_ref", pa.string()), ("payload", pa.binary())]))
            from .render import _RenderWriter
            _RenderWriter(out_dir)(t)
            return pa.table({
                "n_tiles": pa.array([len(rows)], pa.int64()),
                "bytes_in": pa.array([b_in], pa.int64()),
                "bytes_out": pa.array([b_out], pa.int64())})

    parts = (read_documents(world_path, [dataset],
                            columns=["doc_id", "spans"])
             .map_batches(Transcode, batch_format="pyarrow",
                          concurrency=concurrency)
             .to_pandas())
    import numpy as np
    import pandas as pd
    return pd.DataFrame([{
        "n_tiles": np.int64(parts["n_tiles"].sum()),
        "bytes_in": np.int64(parts["bytes_in"].sum()),
        "bytes_out": np.int64(parts["bytes_out"].sum())}])

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
    out = (docs.map_batches(enrich, batch_format="pyarrow")
               .sort("doc_id")
               .map_batches(_DocWriter,
                            fn_constructor_kwargs={"out_dir": out_dir},
                            batch_format="pyarrow", batch_size=rows_per_part,
                            concurrency=(1, 2)))
    return out.to_pandas()


def read_normalized(out_dir: str) -> pa.Table:
    return pq.ParquetDataset(out_dir).read()

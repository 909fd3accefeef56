"""Shared datapipe helpers (scale-aware shuffle sizing).

Round-2 review flagged hard-coded ``repartition(8)`` /
``num_partitions=8`` across dedup/simsearch/temporal: right at test
scale (tiny pre-reduced rows want FEW partitions so the sort's fixed
per-block cost stays low), wrong at 100 TB (everything funnels into 8
partitions). ``shuffle_width`` derives the width from the pipeline's
INPUT file count — the same signal the zonal ``coalesce`` knob
documents (pipelines/extract.py:95-104) — so test-scale behavior is
unchanged (single-file inputs resolve to the floor) while many-file
inputs scale the shuffle with the data.
"""

from __future__ import annotations

import ray


def shuffle_width(ds=None, *, floor: int = 8, files_per_partition: int = 4,
                  blocks: int | None = None) -> int:
    """Partition count for a shuffle fed by ``ds``.

    width = clamp(input_files / files_per_partition, floor, 4 x CPUs).

    ``ds.input_files()`` resolves through a map chain to the read op's
    file list without executing the pipeline; non-file sources (e.g.
    ``from_items``) fall back to the floor. Pass ``blocks`` to size
    from an already-materialized dataset (``ds.num_blocks()``) instead.
    The 4xCPU ceiling keeps single-node runs from over-partitioning;
    on a real cluster CPUs scales with nodes, so the ceiling does too.
    """
    n = blocks
    if n is None and ds is not None:
        try:
            n = len(ds.input_files()) // files_per_partition
        except Exception:
            n = None
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no ray session
        cpus = 8
    return int(min(max(floor, 4 * cpus), max(floor, n or floor)))


def write_doc_output(ds, out_dir: str) -> dict:
    """Sink a corpus-sized per-doc result as partitioned parquet.

    At 100 TB the output of a per-doc operator (token stats, quality
    scores, fingerprints, lang ids, embeddings) is itself a table —
    pulling it to the driver via ``to_pandas`` is the anti-pattern the
    round-2 review flagged. This streams the Dataset straight to one
    parquet part per block (Ray Data's write path: each task writes
    its own file — the resumable per-partition layout) and returns
    only a footer-derived summary; no row ever lands on the driver.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    rows = sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
               for f in files)
    return {"out_dir": out_dir, "files": len(files), "rows": rows}

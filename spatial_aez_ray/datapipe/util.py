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


_COARSE_FOLD_WIDTH: int | None = None


def coarse_fold_width(*, floor: int = 64, per_cpu: int = 2,
                      cap: int = 4096) -> int:
    """Modulus for hash-folding many tiny groups (LSH band buckets,
    content hashes) into coarse partitions before ``map_groups``.

    64 saturates a 32-CPU box (measured best vs one Ray group per
    bucket — 76k groups was pure per-group overhead), but a FIXED 64
    caps the fold stage's parallelism on a multi-hundred-node cluster:
    grow ``per_cpu`` partitions per cluster CPU beyond the floor,
    clamped well below the tiny-groups pathology. The modulus only
    CO-LOCATES buckets — downstream logic still groups by the real
    bucket key inside each partition, so emitted results are identical
    at every width. Cached per process: the modulus must be constant
    across all batches of one run."""
    global _COARSE_FOLD_WIDTH
    if _COARSE_FOLD_WIDTH is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # pragma: no cover - no ray session
            cpus = 8
        _COARSE_FOLD_WIDTH = int(min(max(floor, per_cpu * cpus), cap))
    return _COARSE_FOLD_WIDTH


_TASK_FN_CACHE: dict = {}


def as_task_fn(cls, **ctor_kwargs):
    """Run a broadcast-holding callable class as a TASK-based
    ``map_batches`` fn instead of an actor pool.

    Actor pools pay process spin-up on every pipeline launch — the
    dominant cost of short queries (warm ``ann_topk`` at sf0.1 was
    2.3 s with a ``concurrency=(1, 4)`` pool, 0.6 s as tasks on the
    already-warm shared worker pool). Constructors here only
    ``ray.get`` a broadcast (zero-copy from local plasma) and maybe
    unpack it (e.g. build a dict), so the instance is cached PER
    WORKER PROCESS keyed by the ctor args: ObjectRef identity is
    stable across tasks of one run, giving actor-style
    setup-once-per-process without the spin-up. Use a real actor pool
    only when the per-batch state must mutate or setup is too big to
    hold once per worker.

    The cache key is the IDENTITY of the deserialized kwargs dict:
    Ray deserializes the task closure once per worker process and
    reuses it, so the dict object is stable across that launch's
    batches; the ``is`` check makes id-recycling across launches
    harmless (a recycled id just replaces the entry). This also
    sidesteps hashability of kwarg values (lists, index objects)."""
    def run(batch, _cls=cls, _kw=ctor_kwargs):
        key = id(_kw)
        hit = _TASK_FN_CACHE.get(key)
        if hit is None or hit[0] is not _kw:
            if len(_TASK_FN_CACHE) >= 32:  # bound stale-broadcast pins
                _TASK_FN_CACHE.clear()
            hit = _TASK_FN_CACHE[key] = (_kw, _cls(**_kw))
        return hit[1](batch)
    return run


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


def _content_checksum(ds) -> tuple[int, int]:
    """(rows, order-free int64 wrap-sum of per-row hashes) — computed
    distributed: each batch reduces to one (n, hash_sum) partial row;
    ``pd.util.hash_pandas_object`` is deterministic within a session,
    which is all an A/B content comparison needs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "hsum": pa.array([int(h.astype(np.int64)
                                  .sum(dtype=np.int64))], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (int(agg["n"].sum()),
            int(np.int64(agg["hsum"].to_numpy().sum(dtype=np.int64))))


def compact_parquet_dir(in_dir: str, out_dir: str, *,
                        target_rows: int = 1 << 20) -> dict:
    """Compact a directory of small parquet parts into ~target_rows
    files — the table-maintenance pass every long-lived 100 TB dataset
    needs (thousands of tiny resume/checkpoint parts destroy read
    parallelism and footer-prune efficiency).

    Streams: read → repartition(ceil(rows/target)) → write; then
    SELF-VERIFIES content equality with an order-free distributed
    checksum over both directories (rows + per-row-hash wrap sum) and
    raises on any drift. Returns the summary dict only — no row ever
    reaches the driver.
    """
    import math
    import os

    import ray.data

    ds = ray.data.read_parquet(in_dir)
    rows_in, sum_in = _content_checksum(ds)
    n_files = max(1, math.ceil(rows_in / target_rows))
    os.makedirs(out_dir, exist_ok=True)
    ray.data.read_parquet(in_dir).repartition(n_files).write_parquet(out_dir)
    rows_out, sum_out = _content_checksum(ray.data.read_parquet(out_dir))
    if (rows_in, sum_in) != (rows_out, sum_out):
        raise AssertionError(
            f"compaction drift: {rows_in, sum_in} != {rows_out, sum_out}")
    files_in = sum(1 for f in os.listdir(in_dir) if f.endswith(".parquet"))
    files_out = sum(1 for f in os.listdir(out_dir)
                    if f.endswith(".parquet"))
    return {"rows": rows_in, "files_in": files_in, "files_out": files_out,
            "checksum": sum_in}


def snapshot_dir(data_dir: str, snap_path: str) -> dict:
    """Record an immutable snapshot of a parquet dataset directory:
    one manifest row per part file (name, bytes, rows, footer
    min/max row-group count) written as its own parquet file — the
    Iceberg-manifest-shaped versioning primitive. Footer metadata
    only: no data row is read, so snapshotting a 100 TB directory
    costs one footer read per file."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(data_dir, f)
        md = pq.read_metadata(p)
        rows.append({"file": f, "bytes": os.path.getsize(p),
                     "rows": md.num_rows,
                     "row_groups": md.num_row_groups})
    df = pd.DataFrame(rows, columns=["file", "bytes", "rows",
                                     "row_groups"])
    os.makedirs(os.path.dirname(snap_path) or ".", exist_ok=True)
    df.to_parquet(snap_path, index=False)
    return {"files": len(df), "rows": int(df["rows"].sum())
            if len(df) else 0}


def snapshot_diff(snap_a: str, snap_b: str) -> "pd.DataFrame":
    """Compare two snapshots: (file, status) with status in
    {added, removed, changed} — 'changed' = same name, different
    bytes/rows. The incremental-processing primitive: a consumer
    resumes by processing exactly the added/changed parts."""
    import pandas as pd

    a = pd.read_parquet(snap_a).set_index("file")
    b = pd.read_parquet(snap_b).set_index("file")
    rows = []
    for f in sorted(set(a.index) | set(b.index)):
        if f not in a.index:
            rows.append((f, "added"))
        elif f not in b.index:
            rows.append((f, "removed"))
        elif (a.loc[f, ["bytes", "rows"]].tolist()
              != b.loc[f, ["bytes", "rows"]].tolist()):
            rows.append((f, "changed"))
    return pd.DataFrame(rows, columns=["file", "status"])


def jsonl_roundtrip_check(sf_dir: str, out_dir: str) -> dict:
    """JSONL export + re-ingest of the documents table (the interchange
    format half the corpus world ships): write via Ray's streaming
    JSON sink (one part per block — resumable layout), read back via
    ``read_json``, and verify content equality with the distributed
    order-free checksum. Raises on any drift; returns the summary.
    All document columns are JSON-safe types (ints + strings), so the
    roundtrip is exact by construction — the check enforces it."""
    import os

    import ray.data

    src = ray.data.read_parquet(os.path.join(sf_dir,
                                             "documents.parquet"))
    cols = sorted(src.schema().names)
    rows_in, sum_in = _content_checksum(src.select_columns(cols))
    os.makedirs(out_dir, exist_ok=True)
    src.write_json(out_dir)
    back = ray.data.read_json(out_dir)
    rows_out, sum_out = _content_checksum(back.select_columns(cols))
    if (rows_in, sum_in) != (rows_out, sum_out):
        raise AssertionError(
            f"jsonl roundtrip drift: {rows_in, sum_in} != "
            f"{rows_out, sum_out}")
    files = sum(1 for f in os.listdir(out_dir) if f.endswith(".json"))
    return {"rows": rows_in, "files": files, "checksum_ok": True}

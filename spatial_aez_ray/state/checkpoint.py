"""Per-partition checkpoint manifest: lineage + metrics + resume.

The reference has no checkpointing (a crash loses the whole run,
SURVEY.md §4); the north rule requires resumable jobs. Model:

* work is split into contiguous doc_id-range shards (cell-prefix
  range partitioning — ranges of the sorted doc_id space are spatial
  ranges);
* each shard's output is ONE parquet part file written atomically
  (tmp + rename) under ``out_dir/parts/``;
* a manifest line per completed shard records lineage (dataset names,
  doc_id range, operator-chain hash) and metrics (rows, cells, bytes,
  wall seconds);
* resume = read manifest, skip shards whose entry AND part file exist
  (and whose op hash matches), run the rest. Outputs are idempotent:
  re-running a completed shard rewrites an identical file.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field


@dataclass
class ShardResult:
    shard_id: str
    rows: int
    cells: int = 0
    bytes: int = 0
    seconds: float = 0.0
    extra: dict = field(default_factory=dict)


class CheckpointManifest:
    def __init__(self, out_dir: str, op_hash: str):
        self.out_dir = out_dir
        self.parts_dir = os.path.join(out_dir, "parts")
        self.manifest_path = os.path.join(out_dir, "MANIFEST.jsonl")
        self.op_hash = op_hash
        os.makedirs(self.parts_dir, exist_ok=True)

    # -- bookkeeping --------------------------------------------------------
    def completed(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec.get("op_hash") != self.op_hash:
                        continue  # stale lineage: recompute
                    if os.path.exists(self.part_path(rec["shard_id"])):
                        done[rec["shard_id"]] = rec
        return done

    def pending(self, shard_ids: list[str]) -> list[str]:
        done = self.completed()
        return [s for s in shard_ids if s not in done]

    def part_path(self, shard_id: str) -> str:
        return os.path.join(self.parts_dir, f"part-{shard_id}.parquet")

    # -- commit -------------------------------------------------------------
    def write_part(self, shard_id: str, table, lineage: dict,
                   result: ShardResult) -> None:
        """Atomically persist a shard's output + append its manifest line."""
        import pyarrow.parquet as pq

        final = self.part_path(shard_id)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp)
        result.bytes = os.path.getsize(tmp)
        os.replace(tmp, final)
        rec = {"shard_id": shard_id, "op_hash": self.op_hash,
               "lineage": lineage, "ts": time.time(),
               "metrics": {"rows": result.rows, "cells": result.cells,
                           "bytes": result.bytes, "seconds": result.seconds,
                           **result.extra}}
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")


def op_hash(*parts: str) -> str:
    """Stable hash of an operator chain description (lineage key)."""
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def doc_id_range_shards_from_stats(paths: list[str], num_shards: int
                                   ) -> list[tuple[str, str, str]]:
    """Shard bounds from parquet FOOTER statistics only — row-group
    min/max(doc_id) + row counts; the id column itself never leaves
    storage (at 100 TB reading every doc_id to plan shards is itself a
    full scan). Relies on the documents layout guarantee: files are
    doc_id-sorted with non-overlapping ranges, so contiguous runs of
    row groups form contiguous doc_id ranges. Shards are row-balanced
    greedy cuts at row-group boundaries: (shard_id, lo, hi) with
    lo <= doc_id <= hi, disjoint and covering."""
    import pyarrow.parquet as pq

    rgs: list[tuple[str, str, int]] = []  # (min, max, rows)
    for p in paths:
        md = pq.read_metadata(p)
        idx = md.schema.to_arrow_schema().get_field_index("doc_id")
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(idx).statistics
            if st is None or st.min is None or st.max is None:
                raise ValueError(
                    f"{p} row group {i} lacks doc_id statistics; "
                    "rewrite the table with stats enabled to shard it")
            rgs.append((st.min, st.max, rg.num_rows))
    if not rgs:
        return []
    rgs.sort()  # sorted layout -> file order == id order; sort is belt
    total = sum(r[2] for r in rgs)
    n = min(num_shards, len(rgs))
    shards: list[tuple[str, str, str]] = []
    start = 0
    acc = 0
    for i, (_, _, rows) in enumerate(rgs):
        acc += rows
        remaining = len(rgs) - (i + 1)   # row groups left after i
        need = n - len(shards) - 1       # shards still to cut after this
        if len(shards) < n - 1 and remaining >= need and (
                acc >= total * (len(shards) + 1) / n or remaining == need):
            shards.append((f"{len(shards):05d}", rgs[start][0], rgs[i][1]))
            start = i + 1
    shards.append((f"{len(shards):05d}", rgs[start][0], rgs[-1][1]))
    return shards


def doc_id_range_shards(doc_ids: list[str], num_shards: int
                        ) -> list[tuple[str, str, str]]:
    """Split the sorted doc_id space into contiguous ranges:
    (shard_id, lo, hi) with lo <= doc_id <= hi. This IS the explicit
    cell-prefix range partitioning: doc_id embeds the Z-ordered tile
    coordinate, so each shard is a spatially compact run of tiles."""
    ids = sorted(doc_ids)
    if not ids:
        return []
    n = min(num_shards, len(ids))
    bounds = [round(i * len(ids) / n) for i in range(n + 1)]
    shards = []
    for i in range(n):
        lo, hi = ids[bounds[i]], ids[bounds[i + 1] - 1]
        shards.append((f"{i:05d}", lo, hi))
    return shards

"""Cluster job entrypoint for the corpus-build workload (the
training-data side's counterpart of jobs/zonal_job.py).

Submit to a Ray cluster with:

    ray job submit --working-dir . -- python jobs/corpus_job.py \
        --sf-dir /path/to/tables --out /path/to/out --num-shards 32

`ray.init(address="auto")` attaches to the submitted cluster; this
sandbox falls back to local mode. The chunking stage runs through the
per-shard checkpoint manifest (state/checkpoint.py): each doc_id-range
shard persists one atomic chunk part + a manifest line carrying
lineage (doc range, parameters) and metrics (rows, seconds), so a
re-submission after failure skips completed shards and produces
bit-identical output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/spatial_aez_ray/corpus_job_out")
    ap.add_argument("--num-shards", type=int, default=8)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto")
                 if os.environ.get("RAY_ADDRESS") else "local",
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from spatial_aez_ray.datapipe import corpus

    t0 = time.time()
    summary = corpus.chunk_corpus_checkpointed(
        args.sf_dir, args.out, num_shards=args.num_shards)
    print(json.dumps({
        "sf_dir": args.sf_dir, "out": args.out,
        "seconds": round(time.time() - t0, 3),
        "shards": len(summary),
        "resumed_shards": int(summary["resumed"].sum()),
        "docs_kept": int(summary["docs_kept"].sum()),
        "chunks": int(summary["chunks"].sum()),
        "chunk_tokens": int(summary["chunk_tokens"].sum())}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

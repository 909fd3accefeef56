"""Cluster job entrypoint for the zonal-stats / AEZ workload.

Submit to a Ray cluster with:

    ray job submit --working-dir . -- python jobs/zonal_job.py \
        --world /path/to/world --out /path/to/out --pipelines all

On the fixed-size multi-node clusters the north rule targets, the same
script runs unchanged: `ray.init(address="auto")` attaches to the
cluster the job was submitted to; in this sandbox it falls back to
local mode. Work is resumable: the zonal pipelines run through the
per-shard checkpoint manifest (state/checkpoint.py), so re-submitting
after a failure skips completed shards.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# submitted with --working-dir .: the repo root is the job's cwd but not
# automatically on sys.path when invoked as `python jobs/zonal_job.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default=None,
                    help="world dir (default: generate the 'small' fixture)")
    ap.add_argument("--out", default="/tmp/spatial_aez_ray/job_out")
    ap.add_argument("--pipelines", default="all",
                    choices=["all", "zonal", "aez", "degraded", "render"])
    ap.add_argument("--checkpointed", action="store_true",
                    help="run zonal through the resumable shard manifest")
    ap.add_argument("--num-shards", type=int, default=32)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto")
                 if os.environ.get("RAY_ADDRESS") else "local",
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from spatial_aez_ray import fixtures
    from spatial_aez_ray.pipelines import aez, degraded, extract, render

    world = args.world or fixtures.generate_world(fixtures.SMALL,
                                                  use_ray=True)
    os.makedirs(args.out, exist_ok=True)
    metrics: dict[str, float] = {}

    def timed(name, fn, *a, **kw):
        t0 = time.time()
        r = fn(*a, **kw)
        metrics[name] = round(time.time() - t0, 3)
        return r

    if args.pipelines in ("all", "zonal"):
        if args.checkpointed:
            timed("zonal_kg_ckpt", extract.zonal_stats_checkpointed,
                  world, "kg", os.path.join(args.out, "ckpt_kg"),
                  num_shards=args.num_shards)
        else:
            timed("extract_all", extract.extract_all, world,
                  os.path.join(args.out, "csv"))
    if args.pipelines in ("all", "aez"):
        timed("aez", aez.produce_aez_csvs, world,
              os.path.join(args.out, "csv"))
    if args.pipelines in ("all", "degraded"):
        timed("degraded", degraded.produce_degraded_csvs, world,
              os.path.join(args.out, "csv"))
    if args.pipelines in ("all", "render"):
        timed("render", render.produce_render_tiles, world,
              os.path.join(args.out, "render"))

    print(json.dumps({"world": world, "out": args.out, "metrics": metrics}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

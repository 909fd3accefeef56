"""Fault tolerance: bit-exact results under worker death and transient
task exceptions.

At multi-node scale worker loss is routine; Ray re-executes lost tasks
from lineage and discards the output of failed attempts. A partials +
deterministic-combine pipeline must therefore produce the SAME bytes
with and without a mid-run failure — a duplicated partial row from a
retried task would inflate the sums, so exact equality doubles as an
exactly-once check on block delivery.

The kill stage is injected AFTER the real zonal kernel; Ray fuses the
task-based read → kernel → kill chain, so the SIGKILL lands while a
real kernel task chain is in flight and the whole chain re-executes.
"""

import os
import signal

import numpy as np
import ray.data

from spatial_aez_ray.datapipe import multimodal
from spatial_aez_ray.pipelines import extract

SF_TINY = "/root/testdata/sf0.001"


def _kill_once_fn(marker: str):
    """Pass-through batch fn that SIGKILLs its worker process the first
    time any worker sees it (node-failure simulation). The marker file
    is created with O_EXCL so exactly one attempt dies; the lineage
    retry (and every other worker) finds the marker and passes through.
    """

    def kill_once(batch):
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os.kill(os.getpid(), signal.SIGKILL)
        except FileExistsError:
            pass
        return batch

    return kill_once


def _fail_once_fn(marker: str):
    """Pass-through batch fn that raises a transient OSError once —
    the flaky-storage / network-timeout shape at real scale."""

    def fail_once(batch):
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            raise OSError("injected transient failure")
        except FileExistsError:
            pass
        return batch

    return fail_once


def _zonal_with_stage(world, zindex, stage_fn, **map_kwargs):
    """The real zonal pipeline (partials kernel → deterministic driver
    combine) with an extra pass-through stage spliced in between."""
    partials = extract.zonal_partials_ds(world, "kg", index=zindex)
    injected = partials.map_batches(stage_fn, batch_format="pyarrow",
                                    **map_kwargs)
    pdf = extract.combine_partials_table(injected.to_pandas())
    return extract.pivot_zonal(pdf, extract.CLASSIFIERS["kg"]().columns(),
                               world)


def test_bit_exact_after_worker_kill(tiny_world, tmp_path):
    zindex = extract.build_zonal_index(tiny_world)
    clean = _zonal_with_stage(tiny_world, zindex, lambda b: b)
    marker = str(tmp_path / "killed")
    got = _zonal_with_stage(tiny_world, zindex, _kill_once_fn(marker))
    assert os.path.exists(marker), "kill stage never fired"
    assert list(got.index) == list(clean.index)
    assert list(got.columns) == list(clean.columns)
    assert (got.values == clean.values).all()


def _make_kill_once_embedder():
    """StubEmbedder subclass whose first-constructed actor SIGKILLs
    itself mid batch — the actor-pool recovery path (actor restart +
    task retry), distinct from the task-pool lineage path above.

    Defined at function scope ON PURPOSE: cloudpickle ships a locally
    defined class by VALUE. A module-level class in a pytest test file
    pickles by reference to the bare module name pytest imported it
    under, which a RESTARTED actor's fresh worker cannot import — the
    restart then fails and the pool retries it forever (observed as a
    hang; ray issue 53727 is adjacent)."""

    class KillOnceEmbedder(multimodal.StubEmbedder):
        def __init__(self, marker: str):
            super().__init__()
            self._marker = marker

        def __call__(self, batch):
            try:
                fd = os.open(self._marker,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os.kill(os.getpid(), signal.SIGKILL)
            except FileExistsError:
                pass
            return super().__call__(batch)

    return KillOnceEmbedder


def _embed_frame(stage_cls, **ctor) -> "np.ndarray":
    docs = ray.data.read_parquet(
        os.path.join(SF_TINY, "documents.parquet"),
        columns=["doc_id", "text"])
    df = docs.map_batches(stage_cls, fn_constructor_kwargs=ctor,
                          batch_format="pyarrow", batch_size=64,
                          concurrency=(1, 2)).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return df["doc_id"].to_numpy(), np.stack(df[df.columns[-1]].to_numpy())


def test_actor_pool_bit_exact_after_actor_kill(tmp_path):
    clean_ids, clean_emb = _embed_frame(multimodal.StubEmbedder)
    marker = str(tmp_path / "actor_killed")
    got_ids, got_emb = _embed_frame(_make_kill_once_embedder(),
                                    marker=marker)
    assert os.path.exists(marker), "kill never fired"
    assert (got_ids == clean_ids).all()
    assert (got_emb == clean_emb).all()


_DYING_JOB = """
import os, sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from spatial_aez_ray.state import checkpoint

orig = checkpoint.CheckpointManifest.write_part
state = {"n": 0}

def dying(self, shard_id, table, lineage, result):
    state["n"] += 1
    if state["n"] == 3:
        # torn mid-write: tmp file on disk, no final part, no manifest
        import pyarrow.parquet as pq
        pq.write_table(table, self.part_path(shard_id) + ".tmp-dead")
        os._exit(9)
    orig(self, shard_id, table, lineage, result)

checkpoint.CheckpointManifest.write_part = dying
from spatial_aez_ray.pipelines import extract
extract.zonal_stats_checkpointed(sys.argv[1], "wk", sys.argv[2],
                                 num_shards=4)
"""


def test_checkpointed_job_resumes_after_mid_run_kill(tiny_world, tmp_path):
    """A job process dying MID write_part leaves a torn .tmp file and
    an unmanifested shard; resume must ignore the orphan, redo exactly
    the missing shards, and land on the bit-exact full result."""
    import subprocess
    import sys

    out = str(tmp_path / "ckpt")
    r = subprocess.run(
        [sys.executable, "-c", _DYING_JOB, tiny_world, out],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 9, r.stderr[-2000:]
    parts = sorted(os.listdir(os.path.join(out, "parts")))
    assert sum(p.endswith(".parquet") for p in parts) == 2
    assert any(".tmp-dead" in p for p in parts)  # the torn write
    manifest = os.path.join(out, "MANIFEST.jsonl")
    assert len(open(manifest).read().splitlines()) == 2

    df = extract.zonal_stats_checkpointed(tiny_world, "wk", out,
                                          num_shards=4)
    want = extract.zonal_stats(tiny_world, "wk")
    assert (df.values == want.values).all()
    assert list(df.index) == list(want.index)
    # 2 survived + 2 redone (the torn shard and the never-started one)
    assert len(open(manifest).read().splitlines()) == 4


def test_bit_exact_after_transient_exception(tiny_world, tmp_path):
    zindex = extract.build_zonal_index(tiny_world)
    clean = _zonal_with_stage(tiny_world, zindex, lambda b: b)
    marker = str(tmp_path / "failed")
    got = _zonal_with_stage(
        tiny_world, zindex, _fail_once_fn(marker),
        retry_exceptions=[OSError], max_retries=2)
    assert os.path.exists(marker), "failure stage never fired"
    assert list(got.index) == list(clean.index)
    assert list(got.columns) == list(clean.columns)
    assert (got.values == clean.values).all()


def test_regions_bit_exact_after_worker_kill(tiny_world, tmp_path):
    """The newest derived-ref kernel (region labeling) under the same
    node-failure simulation: the kill stage fuses onto the labeling
    task chain, the whole chain re-executes from lineage, and the
    seam-union + deterministic merge must deliver identical bytes —
    a duplicated partial row would inflate a region's n_px."""
    from spatial_aez_ray.pipelines import regions

    clean = regions.label_regions(tiny_world, "kg")
    marker = str(tmp_path / "killed_regions")
    parts = regions.region_parts(tiny_world, "kg").map_batches(
        _kill_once_fn(marker), batch_format="pyarrow")
    got = regions.label_regions(tiny_world, "kg", parts=parts)
    assert os.path.exists(marker), "kill stage never fired"
    assert got.equals(clean)

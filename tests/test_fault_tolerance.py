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

from spatial_aez_ray.pipelines import extract


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

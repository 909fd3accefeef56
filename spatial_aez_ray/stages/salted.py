"""Salted two-phase aggregation for skewed keys (SURVEY.md §4 Skew).

The zonal workload's group keys are wildly skewed (Russia-vs-Monaco,
~10³ spread in tiles per country; boilerplate LSH buckets in dedup).
A plain ``groupby(key).sum()`` sends every partial for a hot key to one
reducer. ``salted_sum`` splits each hot key across ``n_salts`` reducers
with a composite ``(key, salt)`` first phase, then folds the per-salt
sums in a second (tiny) exact groupby — the classic salting pattern,
expressed purely with Ray Data primitives so the streaming executor
pipelines both phases.

``salt`` is derived deterministically from a row hash, NOT random —
re-runs produce identical partials, keeping checkpoint parts idempotent
(state/checkpoint.py contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def _add_salt(batch: pa.Table, keys: list[str], n_salts: int) -> pa.Table:
    """Deterministic per-row salt: FNV-style mix of the row index within
    its key run — cheap, stable, and uniform enough to split hot keys."""
    n = batch.num_rows
    # rank of each row within the batch (batches are deterministic reads)
    idx = np.arange(n, dtype=np.uint64)
    salt = ((idx * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)) \
        % np.uint64(n_salts)
    return batch.append_column("_salt", pa.array(salt.astype(np.int32)))


def salted_sum(ds: ray.data.Dataset, keys: list[str], value: str,
               n_salts: int = 16) -> pd.DataFrame:
    """groupby(keys).sum(value) with salt-split reducers.

    Phase 1 shuffles on (keys..., _salt) so a hot key fans out over
    n_salts reducers; phase 2 folds the <= n_salts × |keys| partials.
    Exact for sums of integers / integer-valued floats (the engine's
    cent-unit discipline); for general floats it changes only the
    addition order, like any parallel sum.
    """
    salted = ds.map_batches(lambda b: _add_salt(b, keys, n_salts),
                            batch_format="pyarrow")
    phase1 = (salted.groupby(keys + ["_salt"])
                    .aggregate(Sum(value, alias_name=value)))
    pdf = phase1.to_pandas()
    out = (pdf.drop(columns=["_salt"])
              .groupby(keys, as_index=False)[value].sum())
    return out.sort_values(keys).reset_index(drop=True)

"""Distinct-count sketching: a K-Minimum-Values (KMV) sketch computed
as a distributed mergeable aggregate — the pattern for every sketch
family (HLL, theta, quantile sketches) on Ray Data: per-batch partial
sketches inside ``map_batches`` (the combiner), a tiny groupby over
O(groups x k) rows, and a driver-free merge in ``map_groups``.

KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"): hash every value uniformly, keep the k smallest DISTINCT
hashes; if the k-th smallest is h_k on a hash range of size M, the
distinct count is ≈ (k-1) * M / h_k. Merging two sketches is the k
smallest of the union — associative and commutative, so per-batch
partials compose in any order (the property that makes it a one-shuffle
distributed aggregate at 100 TB, carrying k values per group per block
instead of the value universe).

Determinism contract: hashes are 32-bit (top half of the md5-derived
``_h64u``), the estimate is exact int64 arithmetic ((k-1) << 32) //
h_k, and the DuckDB oracle reproduces hash, rank and estimate
bit-for-bit — no float estimate crosses the oracle boundary.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .dedup import _h64u

#: sketch size: relative error ≈ 1/sqrt(k-2) ≈ 13% at k=64 — small
#: enough that the partial rows are trivially tiny, big enough that the
#: estimate is meaningful at test scale.
KMV_K = 64

_HASH_RANGE = 1 << 32   # 32-bit hash domain (top half of _h64u)


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def kmv_distinct_parts(sf_dir: str, k: int = KMV_K) -> pd.DataFrame:
    """Approximate distinct l_partkey count per l_returnflag via a KMV
    sketch. Returns (l_returnflag, n_hashes, kth_h32, est_distinct):

    * ``n_hashes`` — min(k, distinct hashes seen): the sketch fill.
    * ``kth_h32`` — the k-th smallest distinct 32-bit hash (0 when the
      sketch never filled — the estimate is then exact).
    * ``est_distinct`` — ((k-1) << 32) // kth_h32 when filled, else the
      exact distinct-hash count.

    The per-batch partial keeps at most k distinct hashes per group, so
    the shuffle carries O(groups x k x blocks) rows regardless of the
    value universe; the merge is a distinct-union + head(k) per group
    (group cardinality here is the 3 returnflags — grouping directly on
    the key is fine; a high-cardinality group key would fold first)."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pylist(),
            "l_partkey": np.asarray(
                batch["l_partkey"].to_numpy(zero_copy_only=False),
                dtype=np.int64)}).drop_duplicates()
        # hash each distinct partkey once per batch (values repeat
        # across flags): md5 is not vectorizable in stdlib, but the
        # loop runs over batch-distinct keys only
        uniq = df["l_partkey"].unique()
        hmap = {int(v): _h64u(str(int(v))) >> 32 for v in uniq}
        df["h32"] = df["l_partkey"].map(hmap).astype(np.int64)
        df = (df[["l_returnflag", "h32"]].drop_duplicates()
              .sort_values(["l_returnflag", "h32"], kind="mergesort"))
        return pa.Table.from_pandas(
            df.groupby("l_returnflag", as_index=False).head(k),
            preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, gf in g.groupby("l_returnflag", sort=False):
            hs = np.unique(gf["h32"].to_numpy(dtype=np.int64))[:k]
            if len(hs) >= k:
                kth = int(hs[k - 1])
                est = ((k - 1) << 32) // kth
            else:
                kth = 0
                est = len(hs)
            rows.append((flag, len(hs), kth, est))
        return pd.DataFrame(rows, columns=[
            "l_returnflag", "n_hashes", "kth_h32", "est_distinct"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("l_returnflag")
             .map_groups(merge, batch_format="pandas")
             .to_pandas())
    for c in ("n_hashes", "kth_h32", "est_distinct"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _kmv_sql(k: int = KMV_K) -> str:
    # little-endian u64 of the first 8 md5 bytes == dedup._h64u; >> 32
    # keeps the top half (the 32-bit sketch domain)
    le = " || ".join(f"substr(md5(l_partkey::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH h AS (
  SELECT DISTINCT l_returnflag,
         (('0x' || {le})::UBIGINT >> 32)::BIGINT AS h32
  FROM lineitem),
r AS (
  SELECT l_returnflag, h32,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h32) AS rnk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
  FROM h)
SELECT l_returnflag,
       LEAST(nd, {k})::BIGINT AS n_hashes,
       COALESCE(MAX(CASE WHEN rnk = {k} THEN h32 END), 0)::BIGINT AS kth_h32,
       (CASE WHEN nd < {k} THEN nd
             ELSE (({k} - 1) * 4294967296)
                  // MAX(CASE WHEN rnk = {k} THEN h32 END) END)::BIGINT
         AS est_distinct
FROM r GROUP BY l_returnflag, nd ORDER BY l_returnflag
"""


KMV_DISTINCT_PARTS_SQL = _kmv_sql()

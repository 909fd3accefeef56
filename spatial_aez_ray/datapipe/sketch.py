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


# ---------------------------------------------------------------------------
# HyperLogLog register sketch
# ---------------------------------------------------------------------------

#: HLL precision: 2^p registers. p=6 keeps the whole sketch at 64 rows
#: per group — the shuffle carries O(groups x 64 x blocks) rows no
#: matter how many distinct values stream through.
HLL_P = 6
HLL_M = 1 << HLL_P          # 64 registers
_HLL_W = 64 - HLL_P         # 58 hash bits feed the rank (rho)
#: rho range: 1..59 (59 == "remaining 58 bits were all zero")
_HLL_RHO_MAX = _HLL_W + 1


def _hll_reg_rho(value: int) -> tuple[int, int]:
    """(register, rho) of one value under the md5-derived 64-bit hash.

    register = low HLL_P bits; rho = 1-indexed position of the first
    set bit of the remaining _HLL_W bits scanning from the MSB
    (Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
    cardinality estimation algorithm").
    """
    h = _h64u(str(int(value)))
    rem = h >> HLL_P
    return h & (HLL_M - 1), (_HLL_RHO_MAX - rem.bit_length()) if rem \
        else _HLL_RHO_MAX


def hll_user_registers(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-``user_id`` sketch per ``event_type``:
    the full register table (event_type, register, max_rho).

    The mergeable-aggregate shape mirrors ``kmv_distinct_parts``: the
    per-batch partial dedups (event_type, user_id) locally, hashes each
    batch-distinct user once, and emits per-(type, register) rho
    maxima — at most groups x 64 rows per block leave the workers; the
    combine is a plain grouped MAX, associative and commutative, so
    partials compose in any order. Registers no value hashed into are
    absent (both engines agree by construction).

    The float cardinality estimate never crosses the oracle boundary —
    derive it from the register table with ``hll_estimate``; the sketch
    itself is integer-exact vs the DuckDB oracle.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return _hll_register_table(ds)


def _hll_register_table(ds) -> pd.DataFrame:
    """Shared register-table pipeline over any (event_type, user_id)
    Dataset — the one-shot sketch and the incremental chunk deltas run
    the identical code path."""
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "user_id": np.asarray(
                batch["user_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)}).drop_duplicates()
        rmap = {int(v): _hll_reg_rho(v) for v in df["user_id"].unique()}
        rr = df["user_id"].map(rmap)
        df["register"] = [t[0] for t in rr]
        df["rho"] = [t[1] for t in rr]
        part = (df.groupby(["event_type", "register"], as_index=False)
                  ["rho"].max())
        part["register"] = part["register"].astype(np.int64)
        part["rho"] = part["rho"].astype(np.int64)
        return pa.Table.from_pandas(part, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["event_type", "register"], as_index=False)
                 ["rho"].max().rename(columns={"rho": "max_rho"}))
        return out

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .map_groups(merge, batch_format="pandas")
             .to_pandas())
    for c in ("register", "max_rho"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["event_type", "register"])
               .reset_index(drop=True))


def hll_estimate(registers: pd.DataFrame) -> dict[str, float]:
    """Classic HLL estimate per group from a ``hll_user_registers``
    table (driver-side float math, test/diagnostic surface only).

    Applies the small-range linear-counting correction when the raw
    estimate is below 2.5m (Flajolet et al. 2007 §4).
    """
    alpha = 0.709  # alpha_64
    out = {}
    for etype, g in registers.groupby("event_type"):
        rho = np.zeros(HLL_M, dtype=np.int64)
        rho[g["register"].to_numpy()] = g["max_rho"].to_numpy()
        denom = np.sum(np.exp2(-rho.astype(np.float64)))
        est = alpha * HLL_M * HLL_M / denom
        zeros = int((rho == 0).sum())
        if est <= 2.5 * HLL_M and zeros:
            est = HLL_M * np.log(HLL_M / zeros)
        out[str(etype)] = float(est)
    return out


def _hll_sql() -> str:
    # same little-endian md5-u64 as _h64u; bin(x) has no leading
    # zeros, so bit_length(rem) == length(bin(rem)) for rem > 0
    le = " || ".join(f"substr(md5(user_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, ('0x' || {le})::UBIGINT AS h64 FROM u),
b AS (SELECT event_type, (h64 & {HLL_M - 1})::BIGINT AS register,
             (h64 >> {HLL_P}) AS rem FROM h)
SELECT event_type, register,
       MAX(CASE WHEN rem = 0 THEN {_HLL_RHO_MAX}
                ELSE {_HLL_RHO_MAX} - length(bin(rem)) END)::BIGINT
         AS max_rho
FROM b GROUP BY event_type, register ORDER BY event_type, register
"""


HLL_USER_REGISTERS_SQL = _hll_sql()


# ---------------------------------------------------------------------------
# Count-Min sketch — heavy-hitter frequency estimation
# ---------------------------------------------------------------------------

#: CMS geometry: d independent hash rows x w buckets. The whole sketch
#: is d*w counters per group — the shuffle carries O(d x w x blocks)
#: rows no matter how many distinct tokens stream through. w=256 makes
#: over-estimates rare at test-vocab scale while keeping the counter
#: table tiny; error bound is the classic eps = e/w of the total mass
#: (Cormode & Muthukrishnan 2005, "An improved data stream summary:
#: the count-min sketch and its applications").
CMS_D = 4
CMS_W = 256


def _cms_bucket(row: int, token: str) -> int:
    """Bucket of ``token`` under hash row ``row`` — an independent
    md5-derived hash per row via the salted key 'row:token'."""
    return _h64u(f"{row}:{token}") % CMS_W


def cms_token_counters(sf_dir: str, d: int = CMS_D,
                       w: int = CMS_W) -> pd.DataFrame:
    """Count-Min sketch of token frequencies over the document corpus:
    the full counter table (sketch_row, bucket, cnt), cnt = total
    occurrences of every token hashing into that (row, bucket) cell.

    Mergeable-aggregate shape (== ``hll_user_registers``): the
    per-batch partial counts token occurrences locally (one factorize
    + bincount, the vocab combiner), hashes each batch-distinct token
    d times, and emits at most d x w pre-summed counter rows per
    block; the combine is a plain grouped SUM — associative, so
    partials compose in any order. Only buckets some token hashed
    into appear (both engines agree by construction).

    Point estimates never cross the oracle boundary: derive them with
    ``cms_estimate`` (min over the d rows — always >= the true count);
    the counter table itself is integer-exact vs the DuckDB oracle.
    """
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat: list[str] = []
        for t in batch["text"].to_pylist():
            flat.extend(t.split(" "))
        if not flat:
            return pa.table({"sketch_row": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        rows, buckets, cnts = [], [], []
        for r in range(d):
            b = np.fromiter((_cms_bucket(r, t) for t in uniq),
                            dtype=np.int64, count=len(uniq))
            acc = np.zeros(w, dtype=np.int64)
            np.add.at(acc, b, cnt)
            nz = np.flatnonzero(acc)
            rows.append(np.full(len(nz), r, dtype=np.int64))
            buckets.append(nz.astype(np.int64))
            cnts.append(acc[nz])
        return pa.table({"sketch_row": pa.array(np.concatenate(rows)),
                         "bucket": pa.array(np.concatenate(buckets)),
                         "cnt": pa.array(np.concatenate(cnts))})

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["sketch_row", "bucket"])
             .aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    for c in ("sketch_row", "bucket", "cnt"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["sketch_row", "bucket"])
               .reset_index(drop=True))


def cms_estimate(counters: pd.DataFrame, tokens: list[str],
                 d: int = CMS_D) -> dict[str, int]:
    """Point-frequency estimates from a ``cms_token_counters`` table
    (driver-side, test/diagnostic surface): min over the d rows of the
    token's counter — never under the true count, over only on
    collision."""
    cell = {(int(r), int(b)): int(c) for r, b, c in zip(
        counters["sketch_row"], counters["bucket"], counters["cnt"])}
    return {t: min(cell.get((r, _cms_bucket(r, t)), 0) for r in range(d))
            for t in tokens}


def _cms_sql(d: int = CMS_D, w: int = CMS_W) -> str:
    # same salted little-endian md5-u64 as _cms_bucket ('r:token')
    def le(r: int) -> str:
        return " || ".join(
            f"substr(md5('{r}:' || tok), {15 - 2 * i}, 2)"
            for i in range(8))
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS sketch_row, "
        f"(('0x' || {le(r)})::UBIGINT % {w})::BIGINT AS bucket, "
        f"CAST(SUM(c) AS BIGINT) AS cnt FROM tf GROUP BY bucket"
        for r in range(d))
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
cells AS ({rows})
SELECT sketch_row, bucket, cnt FROM cells ORDER BY sketch_row, bucket
"""


CMS_TOKEN_COUNTERS_SQL = _cms_sql()


def incremental_hll_registers(sf_dir: str,
                              n_chunks: int = 4) -> pd.DataFrame:
    """The HLL register table maintained INCREMENTALLY across
    ``n_chunks`` simulated arrival batches (event_id hash split): each
    arrival sketches ONLY its chunk and MAX-merges into the stored
    register table — the non-additive complement to the additive
    incremental view (revenue): sketches make "merge the new data in"
    exact for distinct-count state too. The final table is identical
    to the one-shot sketch, which is exactly what the shared SQL
    oracle verifies."""
    view: pd.DataFrame | None = None
    for chunk in range(n_chunks):
        ds = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "user_id"])

        def pick(b: pa.Table, chunk=chunk) -> pa.Table:
            keys = np.asarray(
                b["event_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            return b.filter(pa.array(keys % n_chunks == chunk))

        delta = _hll_register_table(
            ds.map_batches(pick, batch_format="pyarrow"))
        if view is None:
            view = delta
        else:
            view = (pd.concat([view, delta], ignore_index=True)
                    .groupby(["event_type", "register"], as_index=False)
                    ["max_rho"].max())
    view["register"] = view["register"].astype(np.int64)
    view["max_rho"] = view["max_rho"].astype(np.int64)
    return (view.sort_values(["event_type", "register"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# theta-sketch set operations — sketched INTERSECTION of distinct-value
# sets (Apache DataSketches' theta family / KMV with a shared theta):
# which user populations overlap between event types, without ever
# shuffling the value universe
# ---------------------------------------------------------------------------

THETA_K = 64


def theta_user_overlap(sf_dir: str, k: int = THETA_K) -> pd.DataFrame:
    """Estimated overlap |users(type_a) ∩ users(type_b)| for every
    unordered event-type pair, from per-type KMV/theta sketches.

    Returns (type_a, type_b, n_common, theta, est_overlap), exact
    int64: ``theta`` = min of the two sketches' thresholds (the k-th
    smallest distinct hash when the sketch filled, else the full hash
    range M = 2^32), ``n_common`` = common sketch hashes below theta,
    ``est_overlap`` = (n_common * M) // theta — which degrades to the
    EXACT intersection count when neither sketch filled.

    Distributed shape: the per-batch partial keeps at most k distinct
    user hashes per type (the KMV combiner), the groupby merge keeps
    the k smallest of the union, and only O(types × k) sketch rows
    ever reach the driver — the pairwise set algebra runs on sketches,
    never on the user universe. That is the whole point of the theta
    family at 100 TB: set EXPRESSIONS (A∩B, A∪B, A∖B) over populations
    too large to co-shuffle become tiny-sketch postprocessing.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "user_id": np.asarray(
                batch["user_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)}).drop_duplicates()
        uniq = df["user_id"].unique()
        hmap = {int(v): _h64u(str(int(v))) >> 32 for v in uniq}
        df["h32"] = df["user_id"].map(hmap).astype(np.int64)
        df = (df[["event_type", "h32"]].drop_duplicates()
              .sort_values(["event_type", "h32"], kind="mergesort"))
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).head(k),
            preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gf in g.groupby("event_type", sort=False):
            hs = np.unique(gf["h32"].to_numpy(dtype=np.int64))[:k]
            rows.append(pd.DataFrame({"event_type": et, "h32": hs}))
        return pd.concat(rows, ignore_index=True)

    sk = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(merge, batch_format="pandas")
            .to_pandas())

    types = sorted(sk["event_type"].unique())
    kept = {t: np.sort(sk.loc[sk["event_type"] == t, "h32"]
                       .to_numpy(dtype=np.int64)) for t in types}
    theta = {t: (int(kept[t][k - 1]) if len(kept[t]) >= k
                 else _HASH_RANGE) for t in types}
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            th = min(theta[a], theta[b])
            common = np.intersect1d(kept[a], kept[b])
            c = int((common < th).sum())
            rows.append((a, b, c, th, (c * _HASH_RANGE) // th))
    out = pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_common", "theta", "est_overlap"])
    for c in ("n_common", "theta", "est_overlap"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def _theta_sql(k: int = THETA_K) -> str:
    le = " || ".join(f"substr(md5(user_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH hd AS (
  SELECT DISTINCT event_type,
         (('0x' || {le})::UBIGINT >> 32)::BIGINT AS h32
  FROM events),
r AS (
  SELECT event_type, h32,
         row_number() OVER (PARTITION BY event_type ORDER BY h32) AS rnk,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM hd),
sk AS (SELECT event_type, h32, nd FROM r WHERE rnk <= {k}),
th AS (
  SELECT event_type,
         CASE WHEN nd >= {k} THEN MAX(h32)
              ELSE {_HASH_RANGE} END AS theta
  FROM sk GROUP BY event_type, nd),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         LEAST(a.theta, b.theta)::BIGINT AS theta
  FROM th a JOIN th b ON a.event_type < b.event_type),
com AS (
  SELECT p.type_a, p.type_b, COUNT(*)::BIGINT AS n_common
  FROM pairs p
  JOIN sk x ON x.event_type = p.type_a AND x.h32 < p.theta
  JOIN sk y ON y.event_type = p.type_b AND y.h32 = x.h32
  GROUP BY p.type_a, p.type_b)
SELECT p.type_a, p.type_b,
       COALESCE(c.n_common, 0)::BIGINT AS n_common,
       p.theta,
       ((COALESCE(c.n_common, 0) * {_HASH_RANGE}) // p.theta)::BIGINT
         AS est_overlap
FROM pairs p
LEFT JOIN com c ON c.type_a = p.type_a AND c.type_b = p.type_b
ORDER BY p.type_a, p.type_b
"""


THETA_USER_OVERLAP_SQL = _theta_sql()


# ---------------------------------------------------------------------------
# join-size estimation from key sketches — the query-optimizer
# statistic (Vengerov et al. 2015, "Join Size Estimation Subject to
# Filter Conditions"): estimate |A ⋈ B| without running the join
# ---------------------------------------------------------------------------

JOINEST_K = 64


def join_size_estimate(sf_dir: str, k: int = JOINEST_K) -> pd.DataFrame:
    """Estimated |customer ⋈ orders| on custkey from per-side KMV
    sketches whose entries carry the key's MULTIPLICITY: for the
    common sketch hashes below the shared theta,
    est = (Σ cnt_A·cnt_B) · M // theta — exact join size when neither
    sketch filled (theta = M). Returns one row (n_common, theta,
    est_join_size, exact_small_side), all int64.

    Distributed shape: each side reduces to (hash, cnt) sketch rows —
    per-batch keep the k smallest distinct key hashes with per-batch
    counts, merge = k-smallest-of-union with counts SUMMED per
    surviving hash (multiplicities are additive across blocks, the
    property that makes the sketch mergeable); the estimator runs on
    O(k) rows. This is how a distributed optimizer prices a join
    without touching either table."""
    ds_c = _read(sf_dir, "customer", columns=["c_custkey"])
    ds_o = _read(sf_dir, "orders", columns=["o_custkey"])

    def side(ds, col):
        def partial(batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch[col].to_numpy(zero_copy_only=False),
                              dtype=np.int64)
            uniq, counts = np.unique(keys, return_counts=True)
            hs = np.fromiter((_h64u(str(int(v))) >> 32 for v in uniq),
                             dtype=np.int64, count=len(uniq))
            order = np.argsort(hs, kind="mergesort")[:k]
            return pa.table({"h32": pa.array(hs[order]),
                             "cnt": pa.array(counts[order].astype(np.int64))})

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            s = (g.groupby("h32", as_index=False)["cnt"].sum()
                 .sort_values("h32").head(k))
            return s

        out = (ds.map_batches(partial, batch_format="pyarrow")
               .map_batches(lambda b: b.append_column(
                   "one", pa.array(np.zeros(b.num_rows, np.int32))),
                   batch_format="pyarrow")
               .groupby("one")
               .map_groups(merge, batch_format="pandas")
               .to_pandas())
        return (out["h32"].to_numpy(dtype=np.int64),
                out["cnt"].to_numpy(dtype=np.int64))

    ha, ca = side(ds_c, "c_custkey")
    hb, cb = side(ds_o, "o_custkey")
    th_a = int(ha[k - 1]) if len(ha) >= k else _HASH_RANGE
    th_b = int(hb[k - 1]) if len(hb) >= k else _HASH_RANGE
    theta = min(th_a, th_b)
    common, ia, ib = np.intersect1d(ha, hb, assume_unique=True,
                                    return_indices=True)
    below = common < theta
    s = int((ca[ia][below] * cb[ib][below]).sum())
    est = (s * _HASH_RANGE) // theta
    out = pd.DataFrame([{
        "n_common": np.int64(int(below.sum())),
        "theta": np.int64(theta),
        "est_join_size": np.int64(est),
        "exact_small_side": np.int64(1 if theta == _HASH_RANGE else 0)}])
    return out


def _joinest_sql(k: int = JOINEST_K) -> str:
    def le(col):
        return " || ".join(
            f"substr(md5({col}::VARCHAR), {15 - 2 * i}, 2)"
            for i in range(8))
    return f"""
WITH ca AS (
  SELECT (('0x' || {le('c_custkey')})::UBIGINT >> 32)::BIGINT AS h32,
         COUNT(*)::BIGINT AS cnt
  FROM customer GROUP BY c_custkey),
ra AS (SELECT h32, cnt,
              row_number() OVER (ORDER BY h32) AS rnk,
              COUNT(*) OVER () AS nd FROM ca),
sa AS (SELECT h32, cnt, nd FROM ra WHERE rnk <= {k}),
cb AS (
  SELECT (('0x' || {le('o_custkey')})::UBIGINT >> 32)::BIGINT AS h32,
         COUNT(*)::BIGINT AS cnt
  FROM orders GROUP BY o_custkey),
rb AS (SELECT h32, cnt,
              row_number() OVER (ORDER BY h32) AS rnk,
              COUNT(*) OVER () AS nd FROM cb),
sb AS (SELECT h32, cnt, nd FROM rb WHERE rnk <= {k}),
th AS (SELECT LEAST(
         (SELECT CASE WHEN MAX(nd) >= {k} THEN MAX(h32)
                      ELSE {_HASH_RANGE} END FROM sa),
         (SELECT CASE WHEN MAX(nd) >= {k} THEN MAX(h32)
                      ELSE {_HASH_RANGE} END FROM sb))::BIGINT AS theta),
com AS (
  SELECT COUNT(*)::BIGINT AS n_common,
         COALESCE(SUM(sa.cnt * sb.cnt), 0)::BIGINT AS s
  FROM sa JOIN sb USING (h32) CROSS JOIN th
  WHERE sa.h32 < th.theta)
SELECT com.n_common, th.theta,
       ((com.s * {_HASH_RANGE}) // th.theta)::BIGINT AS est_join_size,
       (th.theta = {_HASH_RANGE})::BIGINT AS exact_small_side
FROM com CROSS JOIN th
"""


JOIN_SIZE_ESTIMATE_SQL = _joinest_sql()


# ---------------------------------------------------------------------------
# bottom-k sample quantiles — a mergeable quantile summary whose sample
# is a deterministic function of the KEYS, so the distributed estimate
# is reproduced bit-for-bit by the SQL oracle (the property GK/KLL
# compaction cannot give across a distributed/sequential boundary)
# ---------------------------------------------------------------------------

QSAMPLE_K = 256
QSAMPLE_QS = (25, 50, 75, 90, 99)   # percentiles, integer to stay exact


def sample_quantiles(sf_dir: str, k: int = QSAMPLE_K,
                     qs: tuple[int, ...] = QSAMPLE_QS) -> pd.DataFrame:
    """Order-price quantile estimates from a bottom-k-by-hash sample.

    Sketch shape (the mergeable-summaries discipline, same as KMV):
    every order is ranked by the md5-derived 64-bit hash of its key —
    a uniform, content-addressed rank — and the sample is the k
    smallest ranks. Per-batch partials carry at most k (hash, cents)
    rows; merging is "k smallest of the union", associative and
    order-free, so the sample is identical for ANY partitioning or
    cluster size. Quantile q over the sample uses the ceil form
    sorted[ceil(q*n) - 1] == DuckDB quantile_disc (CLAUDE.md
    invariant). At 100 TB this ships k rows per block — the same
    wire cost as KMV — while a full sort would be an all-to-all.

    Prices cross the oracle boundary as integer cents (BIGINT on both
    sides); no float leaves the pipeline.
    """
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table, k=k) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        h = np.fromiter((_h64u(str(int(v))) for v in keys),
                        dtype=np.uint64, count=len(keys))
        cents = np.trunc(np.asarray(
            batch["o_totalprice"].to_numpy(zero_copy_only=False),
            dtype=np.float64) * 100.0 + 0.5).astype(np.int64)
        # bottom-k by (hash, key): the key tiebreak makes the sample
        # well-defined even under (astronomically unlikely) collisions
        order = np.lexsort((keys, h))[:k]
        return pa.table({
            "h": pa.array(h[order], pa.uint64()),
            "key": pa.array(keys[order].astype(np.int64)),
            "cents": pa.array(cents[order]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    h = parts["h"].to_numpy(dtype=np.uint64)
    keys = parts["key"].to_numpy(dtype=np.int64)
    cents = parts["cents"].to_numpy(dtype=np.int64)
    order = np.lexsort((keys, h))[:k]
    sample = np.sort(cents[order])
    n = len(sample)
    rows = []
    for q in qs:
        # ceil(q*n/100) - 1, exact integer arithmetic
        idx = -(-q * n // 100) - 1
        rows.append((q, int(sample[idx])))
    return pd.DataFrame(rows, columns=["pct", "price_c"]).astype(np.int64)


def _qsample_sql(k: int = QSAMPLE_K,
                 qs: tuple[int, ...] = QSAMPLE_QS) -> str:
    le = " || ".join(f"substr(md5(o_orderkey::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    sels = " UNION ALL ".join(
        f"SELECT {q}::BIGINT AS pct, "
        f"quantile_disc(cents, {q / 100.0}) AS price_c FROM s"
        for q in qs)
    return f"""
WITH s AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  ORDER BY ('0x' || {le})::UBIGINT, o_orderkey
  LIMIT {k})
SELECT pct, price_c FROM ({sels}) ORDER BY pct
"""


SAMPLE_QUANTILES_SQL = _qsample_sql()


def grouped_sample_quantiles(sf_dir: str, k: int = QSAMPLE_K,
                             qs: tuple[int, ...] = (50, 90)
                             ) -> pd.DataFrame:
    """Per-order-priority price quantiles from per-GROUP bottom-k
    samples — the grouped form of sample_quantiles: partials carry at
    most groups × k rows per block, merged per group by the same
    order-free k-smallest rule, so every group's sample (and hence
    every estimate) is partition-independent and reproduced exactly
    by the SQL oracle."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table, k=k) -> pa.Table:
        import pandas as _pd
        grp = np.asarray(batch["o_orderpriority"].to_pylist(),
                         dtype=object)
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        h = np.fromiter((_h64u(str(int(v))) for v in keys),
                        dtype=np.uint64, count=len(keys))
        cents = np.trunc(np.asarray(
            batch["o_totalprice"].to_numpy(zero_copy_only=False),
            dtype=np.float64) * 100.0 + 0.5).astype(np.int64)
        keep = []
        codes, uniq = _pd.factorize(grp)
        for gi in range(len(uniq)):
            idx = np.flatnonzero(codes == gi)
            o = idx[np.lexsort((keys[idx], h[idx]))[:k]]
            keep.extend(o)
        keep = np.asarray(keep, dtype=np.int64)
        return pa.table({
            "grp": pa.array(grp[keep].astype(str), pa.string()),
            "h": pa.array(h[keep], pa.uint64()),
            "key": pa.array(keys[keep].astype(np.int64)),
            "cents": pa.array(cents[keep]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for grp, g in parts.groupby("grp"):
        h = g["h"].to_numpy(dtype=np.uint64)
        keys = g["key"].to_numpy(dtype=np.int64)
        cents = g["cents"].to_numpy(dtype=np.int64)
        order = np.lexsort((keys, h))[:k]
        sample = np.sort(cents[order])
        n = len(sample)
        for q in qs:
            rows.append((grp, q, int(sample[-(-q * n // 100) - 1])))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "pct",
                                      "price_c"])
    out["pct"] = out["pct"].astype(np.int64)
    out["price_c"] = out["price_c"].astype(np.int64)
    return (out.sort_values(["o_orderpriority", "pct"])
               .reset_index(drop=True))


def _grouped_qsample_sql(k: int = QSAMPLE_K,
                         qs: tuple[int, ...] = (50, 90)) -> str:
    le = " || ".join(f"substr(md5(o_orderkey::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    sels = " UNION ALL ".join(
        f"SELECT o_orderpriority, {q}::BIGINT AS pct, "
        f"quantile_disc(cents, {q / 100.0}) AS price_c "
        f"FROM s GROUP BY o_orderpriority"
        for q in qs)
    return f"""
WITH r AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY ('0x' || {le})::UBIGINT,
                                     o_orderkey) AS rnk
  FROM orders),
s AS (SELECT * FROM r WHERE rnk <= {k})
SELECT o_orderpriority, pct, price_c FROM ({sels})
ORDER BY o_orderpriority, pct
"""


GROUPED_SAMPLE_QUANTILES_SQL = _grouped_qsample_sql()

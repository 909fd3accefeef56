"""Corpus-construction operators: the steps between raw documents and
a training set that SURVEY.md §2's reference vocabulary doesn't cover
but any 100 TB data pipeline needs — vocabulary building, deterministic
sampling, and sequence packing (a distributed prefix-sum scan).

Scale notes:
* ``vocab_top_tokens`` pre-aggregates token counts INSIDE map_batches
  (the A1 combiner pattern on a very wide key — the token), so the
  shuffle carries one row per distinct token per block, never one per
  occurrence; the final sort+limit runs over vocab-sized data.
* ``sample_documents`` is a pure per-batch filter on a stable content
  hash — embarrassingly parallel, no shuffle, reproducible across any
  partitioning (the property that matters for dataset versioning).
* ``pack_sequences`` needs a GLOBAL exclusive prefix sum over
  doc-token counts in doc_id order — the one primitive Ray Data's
  Dataset API cannot express (every map is stateless, every aggregate
  order-free). It drops to raw Ray tasks per the SURVEY custom-
  operator rule: sort by doc_id, materialize (stable block
  boundaries), ONE tiny metadata pass computing per-block sums, an
  exclusive scan over those on the driver (#blocks values, not rows),
  then a per-block offset map — two passes over the data, O(#blocks)
  driver state. Partitioning assumption: blocks are doc_id-ordered
  (guaranteed by the sort).

Every operator has a DuckDB oracle (window functions / unnest) and a
deterministic tie-break mirrored on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import _h64u


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# vocabulary build — wordcount with per-batch combining + global top-K
# ---------------------------------------------------------------------------

def _token_count_partial(batch: pa.Table) -> pa.Table:
    """One (token, cnt) row per DISTINCT token in the batch — the
    combiner that keeps the token shuffle vocab-sized, not
    occurrence-sized. One factorize + bincount over the flat batch."""
    flat, _ = _flatten_tokens(batch["text"].to_pylist())
    if not len(flat):
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    codes, uniq = pd.factorize(flat)
    cnt = np.bincount(codes, minlength=len(uniq))
    return pa.table({"token": pa.array(uniq, pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64))})


def vocab_top_tokens(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Global top-k tokens by occurrence count (ties -> smaller token
    string), split on single spaces exactly like the SQL oracle."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=["text"])
    counts = (ds.map_batches(_token_count_partial, batch_format="pyarrow")
                .groupby("token")
                .aggregate(Sum("cnt", alias_name="cnt")))
    top = counts.sort(["cnt", "token"], descending=[True, False]).limit(k)
    out = top.to_pandas()
    out["cnt"] = out["cnt"].astype(np.int64)
    return out[["token", "cnt"]].reset_index(drop=True)


def _vocab_sql(k: int = 50) -> str:
    return f"""
SELECT t AS token, COUNT(*)::BIGINT AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
GROUP BY t ORDER BY cnt DESC, token LIMIT {k}
"""


VOCAB_TOP_TOKENS_SQL = _vocab_sql()


# ---------------------------------------------------------------------------
# deterministic hash sampling
# ---------------------------------------------------------------------------

def sample_documents(sf_dir: str, pct: int = 20) -> pd.DataFrame:
    """Keep documents whose stable 64-bit id hash lands in the first
    ``pct`` of 100 buckets. Reproducible across any partitioning /
    cluster size (hash of content id, not row position) — the property
    dataset versioning depends on. Pure per-batch filter, no shuffle.
    """
    ds = _read_docs(sf_dir, columns=["doc_id", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = np.fromiter((_h64u(str(d)) % 100 for d in ids),
                        dtype=np.int64, count=len(ids))
        mask = pa.array(h < pct)
        return batch.filter(mask)

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _sample_sql(pct: int = 20) -> str:
    # little-endian u64 of the first 8 md5 bytes == dedup._h64u
    le = " || ".join(f"substr(md5(doc_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || {le})::UBIGINT % 100 < {pct}
ORDER BY doc_id
"""


SAMPLE_DOCUMENTS_SQL = _sample_sql()


# ---------------------------------------------------------------------------
# document chunking — overlapping token windows (the flat-map expansion
# every context-window training pipeline runs)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24   # 8-token overlap between consecutive chunks


def chunk_documents_ds(sf_dir: str, chunk: int = CHUNK_TOKENS,
                       stride: int = CHUNK_STRIDE) -> ray.data.Dataset:
    """Split each document into overlapping token windows: chunk k
    covers tokens [k*stride, k*stride + chunk) (the final window may be
    shorter). Rows: (doc_id, chunk_idx, n_tokens, chunk_md5).

    Pure per-batch flat-map (one input row -> ceil(n/stride) output
    rows), no shuffle — the expansion happens inside map_batches so the
    streaming executor sizes blocks on the OUTPUT side too. The md5 is
    the chunk's content address for downstream chunk-level dedup. Lazy
    (the 100 TB form — the chunk table is bigger than the corpus):
    sink with ``util.write_doc_output`` or consume streaming."""
    import hashlib

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def expand(batch: pa.Table) -> pa.Table:
        ids, idxs, ns, digests = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            toks = t.split(" ")
            for k, s in enumerate(range(0, len(toks), stride)):
                sub = toks[s:s + chunk]
                ids.append(d)
                idxs.append(k)
                ns.append(len(sub))
                digests.append(hashlib.md5(
                    " ".join(sub).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "n_tokens": pa.array(ns, pa.int64()),
            "chunk_md5": pa.array(digests, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def chunk_documents(sf_dir: str, chunk: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE) -> pd.DataFrame:
    """Driver-frame gate adapter over ``chunk_documents_ds``."""
    out = chunk_documents_ds(sf_dir, chunk, stride).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def _chunk_sql(chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {stride})) AS start
  FROM t)
SELECT doc_id,
       (start // {stride})::BIGINT AS chunk_idx,
       len(list_slice(toks, start + 1, start + {chunk}))::BIGINT AS n_tokens,
       md5(array_to_string(list_slice(toks, start + 1, start + {chunk}),
           ' ')) AS chunk_md5
FROM s ORDER BY doc_id, chunk_idx
"""


CHUNK_DOCUMENTS_SQL = _chunk_sql()


# ---------------------------------------------------------------------------
# stratified per-group sampling — fixed-size deterministic sample per
# stratum via hash ranking (a distributed "reservoir" that is
# reproducible across any partitioning)
# ---------------------------------------------------------------------------

STRATA_SAMPLE_N = 20


def stratified_sample(sf_dir: str, n: int = STRATA_SAMPLE_N) -> pd.DataFrame:
    """The ``n`` documents per language with the smallest stable
    64-bit id hash (ties -> smaller doc_id): a fixed-size uniform
    sample per stratum that any worker layout reproduces exactly —
    hash ranking replaces the seeded reservoir, which is NOT stable
    across repartitioning.

    Per-batch combiner keeps at most n rows per stratum present in the
    batch (global per-stratum min-n ⊆ union of per-batch min-n), so
    the shuffle carries O(strata x n) rows, never the corpus."""
    ds = _read_docs(sf_dir, columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = np.fromiter((_h64u(str(d)) for d in ids),
                        dtype=np.uint64, count=len(ids))
        df = pd.DataFrame({
            "lang": batch["lang"].to_pylist(),
            "doc_id": np.asarray(ids, dtype=np.int64),
            "h": h})
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).head(n),
            preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        g = g.groupby("lang", as_index=False).head(n)
        g["rnk"] = g.groupby("lang").cumcount() + 1
        return g[["lang", "doc_id", "rnk"]]

    # stratum cardinality is tiny (languages), so grouping directly on
    # the stratum key is NOT the tiny-groups anti-pattern here
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("lang")
             .map_groups(finish, batch_format="pandas")
             .to_pandas())
    out["rnk"] = out["rnk"].astype(np.int64)
    return out.sort_values(["lang", "rnk"]).reset_index(drop=True)


def _stratified_sql(n: int = STRATA_SAMPLE_N) -> str:
    # little-endian u64 of the first 8 md5 bytes == dedup._h64u
    le = " || ".join(f"substr(md5(doc_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH h AS (
  SELECT lang, doc_id, ('0x' || {le})::UBIGINT AS h FROM documents),
r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk
  FROM h)
SELECT lang, doc_id, rnk::BIGINT AS rnk FROM r
WHERE rnk <= {n} ORDER BY lang, rnk
"""


STRATIFIED_SAMPLE_SQL = _stratified_sql()


# ---------------------------------------------------------------------------
# sequence packing — distributed exclusive prefix sum (scan)
# ---------------------------------------------------------------------------

def pack_sequences(sf_dir: str, budget: int = 2048) -> pd.DataFrame:
    """Contiguous-fill sequence packing: walk documents in doc_id
    order, assign each to training sequence floor(prior_tokens /
    budget) where prior_tokens is the EXCLUSIVE running sum of
    whitespace token counts. Returns (doc_id, n_tokens, seq_id).

    Distributed scan implementation (see module docstring): sort →
    materialize → per-block sums (tasks over block refs, each returns
    ONE int) → driver exclusive scan over #blocks values → per-block
    offset finish. The only driver state is one int per block.
    """
    ds = (_read_docs(sf_dir, columns=["doc_id", "text"])
          .sort("doc_id").materialize())
    refs = ds.to_arrow_refs()

    @ray.remote
    def block_tokens(block: pa.Table) -> tuple[np.ndarray, int]:
        n = np.fromiter((len(t.split(" "))
                         for t in block["text"].to_pylist()),
                        dtype=np.int64, count=block.num_rows)
        return n, int(n.sum())

    per_block = ray.get([block_tokens.remote(r) for r in refs])
    block_sums = np.array([s for _, s in per_block], dtype=np.int64)
    offsets = np.zeros(len(block_sums), dtype=np.int64)
    np.cumsum(block_sums[:-1], out=offsets[1:])  # exclusive scan

    @ray.remote
    def finish(block: pa.Table, n: np.ndarray, offset: int) -> pa.Table:
        prior = offset + np.cumsum(n) - n
        return pa.table({
            "doc_id": block["doc_id"],
            "n_tokens": pa.array(n),
            "seq_id": pa.array(prior // budget),
        })

    out_refs = [finish.remote(r, per_block[i][0], int(offsets[i]))
                for i, r in enumerate(refs)]
    pdf = pa.concat_tables(ray.get(out_refs)).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def _pack_sql(budget: int = 2048) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS prior
  FROM t)
SELECT doc_id, n_tokens, (prior // {budget})::BIGINT AS seq_id
FROM c ORDER BY doc_id
"""


PACK_SEQUENCES_SQL = _pack_sql()


# ---------------------------------------------------------------------------
# tf-idf — two-pass global-statistics broadcast
# ---------------------------------------------------------------------------

_IDF_SCALE = 1024   # quantized integer idf: (N * SCALE) // df
_MIN_DF = 2


def _flatten_tokens(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch token flattening: (tokens as one object array,
    parallel doc-index array). The per-doc ``split`` is unavoidable;
    everything downstream runs vectorized over the flat arrays."""
    flat: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        lens[i] = len(toks)
        flat.extend(toks)
    return (np.asarray(flat, dtype=object),
            np.repeat(np.arange(len(texts), dtype=np.int64), lens))


def tfidf_top_token(sf_dir: str, min_df: int = _MIN_DF) -> pd.DataFrame:
    """Highest-tf-idf token per document (ties -> smaller token).

    The canonical two-pass global-stats pattern: pass 1 computes
    document frequencies with a per-batch distinct-per-doc combiner
    (the df shuffle is vocab-sized); the df table is pulled to the
    driver (bounded: real pipelines cap the vocabulary — here min_df
    prunes it) and broadcast via ``ray.put`` as sorted arrays; pass 2
    scores each doc per batch with vectorized searchsorted lookups —
    no second shuffle.

    idf is QUANTIZED to integers — (N * 1024) // df — so scores are
    exact int64 arithmetic and the DuckDB oracle matches bit-for-bit
    (a float ln() would be 1-ulp-fragile across libm implementations,
    the repo's float-determinism rule)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        # distinct-per-doc counts without a per-doc loop: factorize the
        # whole batch, dedupe (doc, code) pairs, bincount the codes
        codes, uniq = pd.factorize(flat)
        uk = np.unique(doc_idx * np.int64(len(uniq)) + codes)
        dfc = np.bincount(uk % len(uniq), minlength=len(uniq))
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "df": pa.array(dfc.astype(np.int64))})

    from ray.data.aggregate import Sum
    df_tab = (ds.map_batches(df_partial, batch_format="pyarrow")
                .groupby("token")
                .aggregate(Sum("df", alias_name="df"))
                .to_pandas())
    df_tab = df_tab[df_tab["df"] >= min_df].sort_values("token")
    vocab = df_tab["token"].to_numpy(dtype=object)
    dfs = df_tab["df"].to_numpy(dtype=np.int64)
    idf_q = (np.int64(n_docs) * _IDF_SCALE) // dfs
    broadcast = ray.put((vocab, dfs, idf_q))

    def score(batch: pa.Table) -> pa.Table:
        voc, dfv, idf = ray.get(broadcast)
        ids_arr = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        empty = pa.table({
            "doc_id": pa.array([], batch["doc_id"].type),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())})
        if not len(flat) or not len(voc):
            return empty
        # one factorize + one vocab searchsorted for the WHOLE batch
        # (the round-2-flagged per-doc loop, vectorized): tf per
        # (doc, token) via unique counts on a combined key, then the
        # per-doc argmax by (score DESC, token ASC) as a grouped
        # lexsort + first-of-group mask
        codes, uniq = pd.factorize(flat)
        pos = np.searchsorted(voc, uniq)
        oku = (pos < len(voc)) & (voc[np.minimum(pos, len(voc) - 1)] == uniq)
        keep = oku[codes]
        if not keep.any():
            return empty
        key = (doc_idx[keep] * np.int64(len(uniq)) + codes[keep])
        uk, tf = np.unique(key, return_counts=True)
        udoc = uk // len(uniq)
        ucode = uk % len(uniq)
        p = pos[ucode]
        sc = tf.astype(np.int64) * idf[p]
        order = np.lexsort((uniq[ucode], -sc, udoc))
        ud = udoc[order]
        sel = order[np.concatenate([[True], ud[1:] != ud[:-1]])]
        return pa.table({
            "doc_id": pa.array(ids_arr[udoc[sel]], batch["doc_id"].type),
            "token": pa.array(uniq[ucode[sel]], pa.string()),
            "tf": pa.array(tf[sel].astype(np.int64)),
            "df": pa.array(dfv[p[sel]].astype(np.int64)),
            "score": pa.array(sc[sel]),
        })

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _tfidf_sql(min_df: int = _MIN_DF) -> str:
    return f"""
WITH dt AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
tf AS (
  SELECT doc_id, t, COUNT(*)::BIGINT AS tf FROM dt GROUP BY doc_id, t),
df AS (
  SELECT t, COUNT(DISTINCT doc_id)::BIGINT AS df FROM dt
  GROUP BY t HAVING COUNT(DISTINCT doc_id) >= {min_df}),
n AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.t, tf.tf, df.df,
         tf.tf * ((n.n * {_IDF_SCALE}) // df.df) AS score
  FROM tf JOIN df ON tf.t = df.t CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, t) AS r
  FROM scored)
SELECT doc_id, t AS token, tf, df, score FROM ranked WHERE r = 1
ORDER BY doc_id
"""


TFIDF_TOP_TOKEN_SQL = _tfidf_sql()


# ---------------------------------------------------------------------------
# weighted mixture sampling — interleave sources into one training mix
# with per-source weights, deterministically
# ---------------------------------------------------------------------------

MIXTURE_N = 100
#: even-numbered sources are upweighted 4x in the mix — stands in for
#: the per-corpus mixture weights of a real training run
MIXTURE_HEAVY_WEIGHT = 4


def _source_weight(src: str) -> int:
    return MIXTURE_HEAVY_WEIGHT if int(src[3:]) % 2 == 0 else 1


def mixture_sample(sf_dir: str, n: int = MIXTURE_N) -> pd.DataFrame:
    """Deterministic weighted cross-source sample: each doc gets
    priority = hash64(doc_id) // weight(source) and the ``n`` smallest
    priorities (ties -> smaller doc_id) form the mix — sources with
    weight w are ~w× as likely to land a slot, and the SAME mix comes
    out under any partitioning or cluster size (the reproducibility
    property a seeded weighted reservoir lacks). Returns (rnk, doc_id,
    source).

    Per-batch combiner keeps the n smallest priorities per batch, so
    the merge sees O(n x blocks) rows, never the corpus."""
    ds = _read_docs(sf_dir, columns=["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        pri = np.fromiter(
            (_h64u(str(d)) // _source_weight(s)
             for d, s in zip(ids, srcs)),
            dtype=np.uint64, count=len(ids))
        df = pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                           "source": srcs, "pri": pri})
        df = df.sort_values(["pri", "doc_id"], kind="mergesort").head(n)
        df["part"] = np.int32(0)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pri", "doc_id"], kind="mergesort").head(n)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["rnk", "doc_id", "source"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("part")
             .map_groups(finish, batch_format="pandas")
             .to_pandas())
    out["rnk"] = out["rnk"].astype(np.int64)
    return out.sort_values("rnk").reset_index(drop=True)


def _mixture_sql(n: int = MIXTURE_N) -> str:
    le = " || ".join(f"substr(md5(doc_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH h AS (
  SELECT doc_id, source,
         ('0x' || {le})::UBIGINT
           // (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN {MIXTURE_HEAVY_WEIGHT} ELSE 1 END)::UBIGINT AS pri
  FROM documents),
r AS (
  SELECT doc_id, source,
         row_number() OVER (ORDER BY pri, doc_id) AS rnk
  FROM h)
SELECT rnk::BIGINT AS rnk, doc_id, source FROM r
WHERE rnk <= {n} ORDER BY rnk
"""


MIXTURE_SAMPLE_SQL = _mixture_sql()


# ---------------------------------------------------------------------------
# inverted index — posting-list construction + conjunctive search
# ---------------------------------------------------------------------------

#: posting shard count for the partitioned sink: token-hash buckets so
#: one token's posting always lands in one directory (the unit a
#: search node would load); scale the constant with vocab, not corpus.
POSTING_BUCKETS = 16


def _posting_rows(batch: pa.Table) -> pa.Table:
    """(token, doc_id, tf) posting fragments for one batch — the
    within-batch combiner: one row per (doc, distinct token), never
    one per occurrence. Docs never span batches (a doc is a row), so
    tf is final, not partial."""
    doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
    if not len(flat):
        return pa.table({"token": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    codes, uniq = pd.factorize(flat)
    V = np.int64(len(uniq))
    key = doc_idx * V + codes
    uk, tf = np.unique(key, return_counts=True)
    return pa.table({
        "token": pa.array(uniq[(uk % V).astype(np.int64)], pa.string()),
        "doc_id": pa.array(doc_ids[(uk // V).astype(np.int64)]),
        "tf": pa.array(tf.astype(np.int64))})


def inverted_postings_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy full inverted index as (token, doc_id, tf) rows — the
    100 TB form. Sink with ``write_inverted_postings`` (token-hash
    partitioned parquet: a common token's posting is one directory, a
    failed run skips finished buckets) or feed a downstream join."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(_posting_rows, batch_format="pyarrow")


def write_inverted_postings(sf_dir: str, out_dir: str,
                            buckets: int = POSTING_BUCKETS) -> None:
    """Partitioned posting sink: bucket = md5-u64(token) % buckets."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_pylist()
        b = np.fromiter((_h64u(t) % buckets for t in toks),
                        dtype=np.int64, count=len(toks))
        return batch.append_column("bucket", pa.array(b))

    (inverted_postings_ds(sf_dir)
     .map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))


def posting_stats(sf_dir: str) -> pd.DataFrame:
    """Per-token posting-list aggregates: df (distinct docs), total tf,
    and doc_id min/max/sum over the posting — the scale-safe gate
    surface for the inverted index (posting CONTENT stays distributed;
    only vocab-sized aggregate rows reach the driver; the full posting
    lives in ``inverted_postings_ds``).

    One shuffle, vocab-sized: the per-batch combiner above means each
    block contributes at most |vocab| rows."""
    from ray.data.aggregate import Count, Max, Min, Sum

    out = (inverted_postings_ds(sf_dir)
           .groupby("token")
           .aggregate(Count(alias_name="df"),
                      Sum("tf", alias_name="tf_total"),
                      Min("doc_id", alias_name="doc_min"),
                      Max("doc_id", alias_name="doc_max"),
                      Sum("doc_id", alias_name="doc_sum"))
           .to_pandas())
    for c in ("df", "tf_total", "doc_min", "doc_max", "doc_sum"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


POSTING_STATS_SQL = """
WITH p AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
g AS (SELECT token, doc_id, COUNT(*) AS tf FROM p GROUP BY 1, 2)
SELECT token, COUNT(*)::BIGINT AS df, SUM(tf)::BIGINT AS tf_total,
       MIN(doc_id)::BIGINT AS doc_min, MAX(doc_id)::BIGINT AS doc_max,
       SUM(doc_id)::BIGINT AS doc_sum
FROM g GROUP BY token ORDER BY token
"""


#: default conjunctive query for the gate entry — mid-frequency terms
#: so the result is a non-trivial strict subset of the corpus
SEARCH_TERMS = ("spark", "window", "customer")


def boolean_and_search(sf_dir: str,
                       terms: tuple[str, ...] = SEARCH_TERMS
                       ) -> pd.DataFrame:
    """Documents containing ALL query terms, with the summed tf of the
    terms — conjunctive posting intersection expressed as a broadcast
    membership filter: the terms ride the closure (tiny), each batch
    answers locally, no shuffle, no index round-trip. (A search node
    over the partitioned posting sink would intersect postings instead;
    this is the scan-side equivalent for ad-hoc queries.)"""
    term_arr = np.asarray(sorted(set(terms)), dtype=object)

    def hit(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(
            batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        n = len(doc_ids)
        is_term = np.isin(flat.astype(str), term_arr.astype(str))
        total_tf = np.bincount(doc_idx[is_term], minlength=n)
        n_present = np.zeros(n, dtype=np.int64)
        for t in term_arr:
            m = flat == t
            n_present += np.bincount(
                doc_idx[m], minlength=n).astype(bool).astype(np.int64)
        keep = n_present == len(term_arr)
        return pa.table({
            "doc_id": pa.array(doc_ids[keep]),
            "total_tf": pa.array(total_tf[keep].astype(np.int64))})

    out = (_read_docs(sf_dir, columns=["doc_id", "text"])
           .map_batches(hit, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def _search_sql(terms: tuple[str, ...] = SEARCH_TERMS) -> str:
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    conds = " AND ".join(
        f"list_contains(l, '{t}')" for t in sorted(set(terms)))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
SELECT doc_id,
       len(list_filter(l, x -> x IN ({tl})))::BIGINT AS total_tf
FROM t WHERE {conds} ORDER BY doc_id
"""


BOOLEAN_AND_SEARCH_SQL = _search_sql()


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (integer-quantized scoring)
# ---------------------------------------------------------------------------

#: quantization scale for the integer BM25 score (and the idf proxy)
_BM25_SCALE = 1 << 20
#: default single-term query for the gate entry
BM25_TERM = "customer"


def bm25_topk(sf_dir: str, term: str = BM25_TERM, k: int = 20
              ) -> pd.DataFrame:
    """Top-k documents for a single-term query under BM25 with
    k1=6/5, b=3/4 (Robertson & Walker 1994), scored in EXACT integer
    arithmetic so the DuckDB oracle matches bit-for-bit.

    With avgdl = T/D (T total tokens, D docs) the BM25 term score
    tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) multiplies out to the
    integer ratio 22*T*tf / (10*T*tf + 3*T + 9*dl*D); idf uses the
    repo's quantized proxy (D * S) // df (a float ln() would be
    1-ulp-fragile across libm implementations). Both floor divisions
    are mirrored operation-for-operation in the SQL (integer division
    is not associative — the order is part of the contract).

    Scale shape: pass 1 reduces to THREE driver ints (D, T, df); pass
    2 re-scans with the scalars riding the closure, emits only rows
    with tf > 0 (df-bounded), and the sort+limit runs over those.
    The per-match python-int loop is exact-oracle plumbing; a
    production scorer at 100 TB would run the float form vectorized
    and never rank more than each posting's df rows either way.
    """
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        n = batch.num_rows
        tf = np.bincount(doc_idx[flat == term], minlength=n)
        return pa.table({
            "d": pa.array([np.int64(n)]),
            "t": pa.array([np.int64(len(flat))]),
            "df": pa.array([np.int64((tf > 0).sum())])})

    from ray.data.aggregate import Sum
    st = (ds.map_batches(stats_partial, batch_format="pyarrow")
            .aggregate(Sum("d"), Sum("t"), Sum("df")))
    D, T, df = int(st["sum(d)"]), int(st["sum(t)"]), int(st["sum(df)"])
    if df == 0:
        return pd.DataFrame(columns=["doc_id", "tf", "dl", "score_q"])
    idf_q = (D * _BM25_SCALE) // df

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        n = batch.num_rows
        dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
        tf = np.bincount(doc_idx[flat == term], minlength=n)
        hit = tf > 0
        sq = np.fromiter(
            ((idf_q * 22 * T * int(f) * _BM25_SCALE)
             // (10 * T * int(f) + 3 * T + 9 * int(l) * D)
             for f, l in zip(tf[hit], dl[hit])),
            dtype=np.int64, count=int(hit.sum()))
        return pa.table({"doc_id": pa.array(ids[hit]),
                         "tf": pa.array(tf[hit].astype(np.int64)),
                         "dl": pa.array(dl[hit]),
                         "score_q": pa.array(sq)})

    top = (ds.map_batches(score, batch_format="pyarrow")
             .sort(["score_q", "doc_id"], descending=[True, False])
             .limit(k)
             .to_pandas())
    for c in ("tf", "dl", "score_q"):
        top[c] = top[c].astype(np.int64)
    return top.reset_index(drop=True)


def _bm25_sql(term: str = BM25_TERM, k: int = 20,
              s: int = _BM25_SCALE) -> str:
    return f"""
WITH g AS (SELECT COUNT(*)::HUGEINT AS d,
                  SUM(len(string_split(text, ' ')))::HUGEINT AS t
           FROM documents),
m AS (SELECT doc_id, len(string_split(text, ' '))::HUGEINT AS dl,
             len(list_filter(string_split(text, ' '),
                             x -> x = '{term}'))::HUGEINT AS tf
      FROM documents),
f AS (SELECT * FROM m WHERE tf > 0),
dfc AS (SELECT COUNT(*)::HUGEINT AS df FROM f)
SELECT doc_id, tf::BIGINT AS tf, dl::BIGINT AS dl,
       ((((d * {s}) // df) * 22 * t * tf * {s})
        // (10 * t * tf + 3 * t + 9 * dl * d))::BIGINT AS score_q
FROM f, g, dfc ORDER BY score_q DESC, doc_id LIMIT {k}
"""


BM25_TOPK_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# train/test decontamination — benchmark-overlap detection (the n-gram
# contamination audit every training corpus runs before eval sets are
# trusted; cf. GPT-3/PaLM appendix-style 3-gram overlap checks)
# ---------------------------------------------------------------------------

DECON_TEST_PCT = 10   # stable-hash split: ~10% of docs are the "test" set
DECON_K = 5           # 5-grams: long enough to separate true near-dups
                      # from shared-vocabulary noise on the test corpora


def decontaminate_stats_ds(sf_dir: str, test_pct: int = DECON_TEST_PCT,
                           k: int = DECON_K) -> ray.data.Dataset:
    """Lazy per-test-document contamination stats: (doc_id, n_grams,
    n_hit) rows as a Dataset — the 100 TB form (the test split is
    corpus-sized; sink with ``util.write_doc_output`` or consume
    streaming). ``n_hit`` counts the doc's distinct ``k``-token
    shingles that also occur anywhere in the train split. The split is
    the stable content-id hash (``sample_documents``'s bucket expr), so
    it is reproducible across any partitioning.

    Scale shape: both splits are corpus-sized, so the overlap is a
    hash-partitioned semi-join on the GRAM — each batch emits one row
    per distinct gram hash (train rows cross-doc-deduped in batch),
    all grams land on a coarse hash fold, the membership probe is one
    ``np.isin`` per partition, and only per-(doc, partition) partial
    counts leave the groups. Gram identity travels as a 64-bit hash
    (16 B/row regardless of gram text length) — the MinHasher scheme:
    md5 per DISTINCT token (per-batch cache), then a vectorized FNV
    positional mix over each k-window, so per-gram cost is numpy, not
    hashlib. Tokens never contain whitespace and the ``""`` pad only
    arises for sub-k docs, so two windows hash-equal exactly when
    their gram CONTENT is equal — which is what the SQL oracle joins
    on; a 64-bit collision could over-count a hit (~n²/2⁶⁵ odds, same
    as the minhash pipeline; negligible at any tested scale).

    Shingle semantics shared with ``dedup._shingle_set``: whitespace
    tokens, distinct ``k``-gram strings joined by ' ', docs shorter
    than ``k`` tokens collapse to one shingle of the available tokens.
    """
    from ray.data.aggregate import Sum

    from .util import shuffle_width

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    n_parts = shuffle_width(ds)
    fnv = np.uint64(0x100000001B3)

    def prep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        grams: list[np.ndarray] = []
        docs: list[int] = []   # doc_id for test rows, -1 for train rows
        cache: dict[str, np.uint64] = {}

        def gram_hashes(toks: list[str]) -> np.ndarray:
            if len(toks) < k:
                toks = toks + [""] * (k - len(toks))
            th = np.empty(len(toks), dtype=np.uint64)
            for i, t in enumerate(toks):
                h = cache.get(t)
                if h is None:
                    h = np.uint64(_h64u(t))
                    cache[t] = h
                th[i] = h
            n_sh = len(toks) - k + 1
            with np.errstate(over="ignore"):
                acc = np.zeros(n_sh, dtype=np.uint64)
                for j in range(k):
                    acc = (acc ^ th[j:j + n_sh]) * fnv
            return np.unique(acc)

        train_seen: set[int] = set()
        for did, text in zip(ids, texts):
            hs = gram_hashes(text.split())
            if _h64u(str(did)) % 100 < test_pct:
                grams.append(hs)
                docs.extend([int(did)] * len(hs))
            else:
                fresh = np.array(
                    [h for h in hs.tolist() if h not in train_seen],
                    dtype=np.uint64)
                train_seen.update(fresh.tolist())
                grams.append(fresh)
                docs.extend([-1] * len(fresh))
        gh = (np.concatenate(grams) if grams
              else np.empty(0, dtype=np.uint64))
        return pa.table({
            "part": pa.array((gh % np.uint64(n_parts)).astype(np.int32)),
            "gram": pa.array(gh),
            "doc_id": pa.array(np.asarray(docs, dtype=np.int64))})

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        is_test = g["doc_id"].to_numpy() != -1
        train = np.unique(g.loc[~is_test, "gram"].to_numpy())
        t = g.loc[is_test, ["doc_id", "gram"]].copy()
        if not len(t):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_grams": pd.Series([], dtype=np.int64),
                                 "n_hit": pd.Series([], dtype=np.int64)})
        t["hit"] = np.isin(t["gram"].to_numpy(), train).astype(np.int64)
        out = t.groupby("doc_id", as_index=False).agg(
            n_grams=("gram", "size"), n_hit=("hit", "sum"))
        out["n_grams"] = out["n_grams"].astype(np.int64)
        return out

    return (ds.map_batches(prep, batch_format="pyarrow")
              .groupby("part")
              .map_groups(probe, batch_format="pandas")
              .groupby("doc_id")
              .aggregate(Sum("n_grams", alias_name="n_grams"),
                         Sum("n_hit", alias_name="n_hit")))


def decontaminate_stats(sf_dir: str, test_pct: int = DECON_TEST_PCT,
                        k: int = DECON_K) -> pd.DataFrame:
    """Driver-frame gate adapter over ``decontaminate_stats_ds`` with
    the derived ``contaminated`` flag (test scale)."""
    agg = decontaminate_stats_ds(sf_dir, test_pct, k).to_pandas()
    agg["n_grams"] = agg["n_grams"].astype(np.int64)
    agg["n_hit"] = agg["n_hit"].astype(np.int64)
    agg["contaminated"] = (agg["n_hit"] > 0).astype(np.int64)
    return (agg[["doc_id", "n_grams", "n_hit", "contaminated"]]
            .sort_values("doc_id").reset_index(drop=True))


def _decontaminate_sql(test_pct: int = DECON_TEST_PCT,
                       k: int = DECON_K) -> str:
    le = " || ".join(f"substr(md5(doc_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    slots = ", ".join(f"t0[i+{j}]" for j in range(k))
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t0
  FROM documents),
shg AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(t0) - {k - 1}, 1) + 1),
           i -> array_to_string(list_filter([{slots}],
                                            x -> x IS NOT NULL), ' '))) AS s,
         ('0x' || {le})::UBIGINT % 100 < {test_pct} AS is_test
  FROM base),
train_g AS (SELECT DISTINCT unnest(s) AS g FROM shg WHERE NOT is_test),
test_g AS (SELECT doc_id, unnest(s) AS g FROM shg WHERE is_test)
SELECT t.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) > 0 AS BIGINT)
         AS contaminated
FROM test_g t LEFT JOIN train_g tr ON tr.g = t.g
GROUP BY t.doc_id ORDER BY doc_id
"""


DECONTAMINATE_SQL = _decontaminate_sql()


# ---------------------------------------------------------------------------
# PMI token co-occurrence — the association-mining pass behind phrase
# detection / collocation extraction in corpus preprocessing
# ---------------------------------------------------------------------------

PMI_MIN_PAIR_DOCS = 5     # drop rare pairs (classic PMI noise guard)
PMI_SCALE = 1_000_000     # integer quantization of the PMI ratio


def pmi_top_pairs(sf_dir: str, k: int = 20,
                  min_pair_docs: int = PMI_MIN_PAIR_DOCS) -> pd.DataFrame:
    """Top-k token pairs by document-level pointwise mutual information:
    (tok_a, tok_b, pair_docs, pmi_q) with tok_a < tok_b, pair_docs =
    docs containing BOTH tokens, and pmi_q the integer-quantized PMI
    ratio (pair_docs * N * SCALE) // (df_a * df_b) — monotone in PMI
    (log of a scaled ratio), exact in integer arithmetic on both sides
    so ranking never depends on float log.

    Two passes, both vocab-bounded:
    * pass 1 — per-token document frequency: distinct-per-doc combiner
      inside map_batches, vocab-sized groupby, broadcast as a dict
      (same shape as ``tfidf_top_token``'s global stats).
    * pass 2 — pair doc-counts: per batch, each doc's distinct-token
      set expands to its ~|v|²/2 pairs IN NUMPY (triu indices over the
      batch-local code space), pre-summed per batch, so the shuffle
      carries one row per distinct pair per block. At an unbounded
      vocab you'd prune to df >= min_df tokens first (broadcast df
      filter) — the pair space must be bounded before the expansion.
    """
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=["text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(set(t.split(" ")))
        if not toks:
            return pa.table({"tok": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"tok": pa.array(uniq, pa.string()),
                         "c": pa.array(cnt)})

    dfreq = (ds.map_batches(df_partial, batch_format="pyarrow")
               .groupby("tok")
               .aggregate(Sum("c", alias_name="c"))
               .to_pandas())
    df_map = dict(zip(dfreq["tok"], dfreq["c"].astype(int)))
    n_docs = int(ds.count())

    def pair_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        per_doc = [np.unique(np.asarray(t.split(" "), dtype=object))
                   for t in texts]
        if not per_doc:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        flat = np.concatenate(per_doc) if per_doc else np.array([])
        codes, uniq = pd.factorize(flat)   # uniq is batch vocab
        ai, bi, pos = [], [], 0
        for u in per_doc:
            # np.unique returned u lexicographically sorted, so pairing
            # by POSITION yields tok_a < tok_b in string order (the SQL
            # oracle's a.tok < b.tok); codes are per-position labels,
            # NOT sorted — never sort them
            cu = codes[pos:pos + len(u)]
            pos += len(u)
            ia, ib = np.triu_indices(len(cu), 1)
            ai.append(cu[ia])
            bi.append(cu[ib])
        a = np.concatenate(ai)
        b = np.concatenate(bi)
        keys = a.astype(np.int64) * len(uniq) + b
        ku, cnt = np.unique(keys, return_counts=True)
        return pa.table({
            "tok_a": pa.array(uniq[(ku // len(uniq)).astype(int)],
                              pa.string()),
            "tok_b": pa.array(uniq[(ku % len(uniq)).astype(int)],
                              pa.string()),
            "c": pa.array(cnt.astype(np.int64))})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
               .groupby(["tok_a", "tok_b"])
               .aggregate(Sum("c", alias_name="pair_docs"))
               .to_pandas())
    pairs = pairs[pairs["pair_docs"] >= min_pair_docs].copy()
    da = pairs["tok_a"].map(df_map).astype(object)
    db = pairs["tok_b"].map(df_map).astype(object)
    pairs["pmi_q"] = [
        int((int(cab) * n_docs * PMI_SCALE) // (int(x) * int(y)))
        for cab, x, y in zip(pairs["pair_docs"], da, db)]
    pairs["pair_docs"] = pairs["pair_docs"].astype(np.int64)
    pairs["pmi_q"] = pairs["pmi_q"].astype(np.int64)
    out = pairs.sort_values(["pmi_q", "tok_a", "tok_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k)
    return out[["tok_a", "tok_b", "pair_docs", "pmi_q"]].reset_index(
        drop=True)


def _pmi_sql(k: int = 20, min_pair_docs: int = PMI_MIN_PAIR_DOCS) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
  FROM documents),
t AS (SELECT doc_id, unnest(s) AS tok FROM base),
df AS (SELECT tok, COUNT(*) AS dfc FROM t GROUP BY tok),
n AS (SELECT COUNT(*) AS nd FROM documents),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS cab
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_pair_docs})
SELECT tok_a, tok_b, CAST(cab AS BIGINT) AS pair_docs,
       CAST((cab::HUGEINT * nd * {PMI_SCALE})
            // (da.dfc::HUGEINT * db.dfc) AS BIGINT) AS pmi_q
FROM pairs, n
JOIN df da ON da.tok = tok_a
JOIN df db ON db.tok = tok_b
ORDER BY pmi_q DESC, tok_a, tok_b LIMIT {k}
"""


PMI_TOP_PAIRS_SQL = _pmi_sql()


# ---------------------------------------------------------------------------
# end-to-end corpus build manifest — the composed pipeline (dedup ->
# quality gate -> chunking) every training set actually ships with
# ---------------------------------------------------------------------------

MANIFEST_MIN_TOKENS = 40
MANIFEST_MAX_STOP_RATIO = 0.06


def corpus_build_manifest(sf_dir: str) -> pd.DataFrame:
    """One streaming pipeline composing three stages the engine also
    exposes individually, returning the per-language build manifest
    (lang, kept_docs, kept_tokens, n_chunks):

    1. exact dedup — ONE hash shuffle; text rides the shuffle because
       the survivors continue downstream (the build actually needs the
       bytes, unlike the audit query ``exact_dedup`` where 16 B/doc
       suffices). Survivor = min doc_id per content hash, resolved per
       coarse partition fold (never one Ray group per hash — the
       tiny-groups anti-pattern).
    2. quality gate — per-batch filter on the same integer-derived
       token/stopword ratios as ``text.quality_scores`` (bit-identical
       boundary vs the oracle).
    3. chunk accounting — ceil(n_tokens / stride) context windows per
       kept doc (integer form, no float ceil).

    Only per-(partition, lang) partial rows reach the final tiny
    groupby — document text never leaves the workers after stage 2.
    """
    from ray.data.aggregate import Sum

    from .dedup import _content_hash_batch
    from .text import _quality_batch
    from .util import shuffle_width

    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
    n_parts = shuffle_width(ds)

    def hash_part(b: pa.Table) -> pa.Table:
        hb = _content_hash_batch(b.select(["doc_id", "text"]))
        h = hb["content_hash"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array((h % n_parts).astype(np.int32)),
            "content_hash": hb["content_hash"],
            "doc_id": b["doc_id"],
            "text": b["text"],
            "lang": b["lang"]})

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby("content_hash", sort=False)["doc_id"].idxmin()
        return g.loc[idx, ["doc_id", "text", "lang"]]

    def manifest_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        batch = pa.Table.from_pandas(pdf, preserve_index=False)
        q = _quality_batch(batch.select(["doc_id", "text"]))
        n_tok = np.asarray(q["n_tokens"])
        keep = (n_tok >= MANIFEST_MIN_TOKENS) & \
               (np.asarray(q["stopword_ratio"]) <= MANIFEST_MAX_STOP_RATIO)
        idx = np.flatnonzero(keep)
        kept_tok = n_tok[idx]
        df = pd.DataFrame({
            "lang": np.asarray(batch["lang"].to_pylist())[idx],
            "kept_docs": np.ones(len(idx), dtype=np.int64),
            "kept_tokens": kept_tok,
            "n_chunks": (kept_tok + CHUNK_STRIDE - 1) // CHUNK_STRIDE})
        return df.groupby("lang", as_index=False).sum()

    out = (ds.map_batches(hash_part, batch_format="pyarrow")
             .groupby("part")
             .map_groups(survivors, batch_format="pandas")
             .map_batches(manifest_partial, batch_format="pandas")
             .groupby("lang")
             .aggregate(Sum("kept_docs", alias_name="kept_docs"),
                        Sum("kept_tokens", alias_name="kept_tokens"),
                        Sum("n_chunks", alias_name="n_chunks"))
             .to_pandas())
    for c in ("kept_docs", "kept_tokens", "n_chunks"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def _manifest_sql() -> str:
    from .text import STOPWORDS
    return f"""
WITH surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
d AS (SELECT doc_id, text, lang FROM documents JOIN surv USING (doc_id)),
q AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             w -> w IN {STOPWORDS!r}))
           / CAST(GREATEST(len(string_split(text, ' ')), 1) AS DOUBLE)
           AS stop_ratio
  FROM d)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS kept_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(SUM((n_tokens + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE})
            AS BIGINT) AS n_chunks
FROM q WHERE n_tokens >= {MANIFEST_MIN_TOKENS}
         AND stop_ratio <= {MANIFEST_MAX_STOP_RATIO}
GROUP BY lang ORDER BY lang
"""


CORPUS_BUILD_MANIFEST_SQL = _manifest_sql()


# ---------------------------------------------------------------------------
# checkpointed corpus-build job — the resumable cluster form of the
# gate -> chunk stage chain (per-shard lineage + metrics manifest,
# mirroring extract.run_checkpointed_partials for the spatial side)
# ---------------------------------------------------------------------------

def chunk_corpus_checkpointed(sf_dir: str, out_dir: str, *,
                              num_shards: int = 8,
                              chunk: int = CHUNK_TOKENS,
                              stride: int = CHUNK_STRIDE,
                              min_tokens: int = MANIFEST_MIN_TOKENS,
                              max_stop_ratio: float =
                              MANIFEST_MAX_STOP_RATIO) -> pd.DataFrame:
    """Resumable corpus chunking: quality-gate + chunk-expand each
    doc_id-range shard of the documents table, persisting one atomic
    chunk part file + manifest line (lineage: doc range, params;
    metrics: rows, seconds) per shard. Shards are PLANNED FROM PARQUET
    FOOTER STATS (doc_id min/max per row group — the id column never
    leaves storage) and the plan is part of the manifest key, so a
    resume with different num_shards can never reuse stale ranges.
    Re-running after a failure skips completed shards; output is
    bit-identical to a single uninterrupted run.

    Returns the job summary: one row per shard
    (shard_id, docs_kept, chunks, chunk_tokens, resumed).
    """
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    from ..state.checkpoint import (
        CheckpointManifest, ShardResult, doc_id_range_shards_from_stats,
        op_hash,
    )
    from .text import _quality_batch

    paths = [os.path.join(sf_dir, "documents.parquet")]
    shards = doc_id_range_shards_from_stats(paths, num_shards)
    plan_key = ";".join(f"{sid}:{lo}..{hi}" for sid, lo, hi in shards)
    params = f"c{chunk}-s{stride}-t{min_tokens}-r{max_stop_ratio}"
    man = CheckpointManifest(
        out_dir, op_hash("corpus-chunks", "v1", params, plan_key))
    pending = set(man.pending([s[0] for s in shards]))
    manifest_lock = threading.Lock()
    plan_lock = threading.Lock()

    def expand(batch: pa.Table) -> pa.Table:
        import hashlib
        q = _quality_batch(batch.select(["doc_id", "text"]))
        keep = (np.asarray(q["n_tokens"]) >= min_tokens) & \
               (np.asarray(q["stopword_ratio"]) <= max_stop_ratio)
        ids, idxs, ns, digests = [], [], [], []
        for j in np.flatnonzero(keep):
            d = batch["doc_id"][int(j)].as_py()
            toks = batch["text"][int(j)].as_py().split(" ")
            for ci, s0 in enumerate(range(0, len(toks), stride)):
                sub = toks[s0:s0 + chunk]
                ids.append(d)
                idxs.append(ci)
                ns.append(len(sub))
                digests.append(hashlib.md5(
                    " ".join(sub).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "n_tokens": pa.array(ns, pa.int64()),
            "chunk_md5": pa.array(digests, pa.string())})

    def run_shard(shard):
        sid, lo, hi = shard
        t0 = _time.time()
        with plan_lock:   # Dataset construction isn't thread-safe
            ds = ray.data.read_parquet(
                paths, columns=["doc_id", "text"],
                filter=(pc.field("doc_id") >= lo)
                       & (pc.field("doc_id") <= hi))
        parts = ds.map_batches(expand, batch_format="pyarrow")
        refs = parts.to_arrow_refs()
        tables = [t if isinstance(t, pa.Table)
                  else pa.Table.from_batches([t])
                  for t in ray.get(refs)]
        table = (pa.concat_tables(tables) if tables
                 else expand(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "text": pa.array([], pa.string())})))
        with manifest_lock:
            man.write_part(
                sid, table,
                lineage={"dataset": "documents", "doc_id_lo": str(lo),
                         "doc_id_hi": str(hi), "params": params,
                         "op": "corpus-chunks"},
                result=ShardResult(shard_id=sid, rows=table.num_rows,
                                   cells=int(table["n_tokens"]
                                             .to_pandas().sum())
                                   if table.num_rows else 0,
                                   seconds=_time.time() - t0))

    todo = [s for s in shards if s[0] in pending]
    if todo:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        workers = max(1, min(4, cpus // 2, len(todo)))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(run_shard, todo))

    rows = []
    for sid, lo, hi in shards:
        t = papq.read_table(man.part_path(sid))
        rows.append((sid, t["doc_id"].to_pandas().nunique(), t.num_rows,
                     int(t["n_tokens"].to_pandas().sum()),
                     int(sid not in pending)))
    out = pd.DataFrame(rows, columns=[
        "shard_id", "docs_kept", "chunks", "chunk_tokens", "resumed"])
    for c in ("docs_kept", "chunks", "chunk_tokens", "resumed"):
        out[c] = out[c].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# BPE tokenizer training + distributed apply (Sennrich et al. 2016,
# "Neural Machine Translation of Rare Words with Subword Units"): the
# canonical corpus-scale tokenizer workflow
# ---------------------------------------------------------------------------

BPE_N_MERGES = 30


def bpe_train_merges(word_counts: dict[str, int],
                     n_merges: int = BPE_N_MERGES) -> list[tuple[str, str]]:
    """Greedy BPE merge list from a word→count table (training runs on
    the COUNT table, never the corpus — the HuggingFace/SentencePiece
    discipline; the table is vocabulary-sized). Deterministic: the
    winning pair maximizes (count, then lexicographically smallest
    (left, right)); integer counts only."""
    words = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        tgt = best[0] + best[1]
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(tgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with the learned merge list (rank order)."""
    syms = list(word)
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _word_counts_distributed(sf_dir: str) -> dict[str, int]:
    from ray.data.aggregate import Sum
    ds = _read_docs(sf_dir, columns=["text"])
    wc = (ds.map_batches(_token_count_partial, batch_format="pyarrow")
            .groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())
    return dict(zip(wc["token"], wc["cnt"].astype(int)))


def bpe_doc_stats(sf_dir: str,
                  n_merges: int = BPE_N_MERGES) -> pd.DataFrame:
    """Train BPE on the corpus, then tokenize the corpus with it —
    both phases distributed where the data is big: the train input is
    ONE word-count shuffle (pre-counted per batch, vocabulary-sized
    result), the trainer itself runs on the tiny count table on the
    driver, and the apply pass broadcasts the merge list and maps the
    corpus once with a per-worker word→len cache (apply cost is
    O(distinct words per worker), not O(tokens)).

    Returns (doc_id, n_words, n_bpe_tokens), ordered by doc_id."""
    import ray

    merges = bpe_train_merges(_word_counts_distributed(sf_dir), n_merges)
    bc = ray.put(merges)

    def stats(batch: pa.Table) -> pa.Table:
        mg = ray.get(bc)
        cache: dict[str, int] = {}
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        n_words = np.zeros(len(ids), dtype=np.int64)
        n_bpe = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = t.split(" ")
            n_words[i] = len(toks)
            s = 0
            for w in toks:
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = len(bpe_apply(w, mg))
                s += hit
            n_bpe[i] = s
        return pa.table({"doc_id": pa.array(ids),
                         "n_words": pa.array(n_words),
                         "n_bpe_tokens": pa.array(n_bpe)})

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def bpe_doc_stats_twin(sf_dir: str,
                       n_merges: int = BPE_N_MERGES) -> pd.DataFrame:
    """Sequential oracle: identical trainer/apply over pandas-counted
    words — verifies the distributed count shuffle (same merges) and
    the distributed apply pass end to end, exactly."""
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    wc: dict[str, int] = {}
    for x in texts:
        for w in x.split(" "):
            wc[w] = wc.get(w, 0) + 1
    merges = bpe_train_merges(wc, n_merges)
    cache = {w: len(bpe_apply(w, merges)) for w in wc}
    ids = np.asarray(t["doc_id"].to_numpy(), dtype=np.int64)
    rows = [(int(i), len(x.split(" ")),
             sum(cache[w] for w in x.split(" ")))
            for i, x in zip(ids, texts)]
    out = pd.DataFrame(rows, columns=["doc_id", "n_words",
                                      "n_bpe_tokens"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# heavy hitters — EXACT frequent tokens via the two-pass Misra-Gries
# discipline: candidate generation with bounded summaries, then an
# exact recount of only the candidates (never a vocab-sized shuffle)
# ---------------------------------------------------------------------------

HH_K = 64   # summary size; guarantees a superset of tokens > n/HH_K


def _mg_compress(counts: pd.Series, k: int) -> pd.Series:
    """Misra-Gries compress: keep at most k entries by subtracting the
    (k+1)-th largest weight from all and dropping non-positives. Each
    compress of a summary over n items loses at most n/k weight per
    key — the mergeable-summaries bound (Agarwal et al. 2012)."""
    if len(counts) <= k:
        return counts
    kth = counts.nlargest(k + 1).iloc[k]
    out = counts - kth
    return out[out > 0]


def heavy_hitter_tokens(sf_dir: str, k: int = HH_K) -> pd.DataFrame:
    """EXACT set of tokens with count * k > total tokens, with exact
    counts — the guaranteed-frequent items, at bounded memory.

    Pass 1 (candidates): each batch emits a Misra-Gries summary of at
    most ``k`` (token, weight) rows; the driver folds the summaries
    and compresses once more. Merged-MG error is <= n/k total, so any
    token with true count > n/k has positive residual weight and MUST
    survive — the candidate set (<= k tokens) is a certified superset.
    Wire cost: k rows per block, like every sketch here; at 100 TB the
    fold tree-merges via a tiny groupby instead of the driver, but the
    row volume is identical.

    Pass 2 (exact): candidate tokens broadcast as a sorted array; one
    more streaming pass counts ONLY candidates (np.isin per batch)
    plus the total token count. Output = candidates whose exact count
    clears the threshold. No vocab-sized state ever materializes —
    contrast vocab_top_tokens, which pays the full token groupby.
    """
    ds = _read_docs(sf_dir, columns=["text"])

    def summary(batch: pa.Table, k=k) -> pa.Table:
        flat, _ = _flatten_tokens(batch["text"].to_pylist())
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat)
        cnt = pd.Series(np.bincount(codes, minlength=len(uniq)),
                        index=uniq, dtype=np.int64)
        mg = _mg_compress(cnt, k)
        return pa.table({
            "token": pa.array(mg.index.astype(str), pa.string()),
            "w": pa.array(mg.to_numpy(dtype=np.int64)),
            "n": pa.array(np.full(len(mg), len(flat), dtype=np.int64)
                          if len(mg) else np.array([], np.int64)),
        })

    parts = (ds.map_batches(summary, batch_format="pyarrow")
               .to_pandas())
    folded = parts.groupby("token")["w"].sum().astype(np.int64)
    cand = np.sort(_mg_compress(folded, k).index.to_numpy(dtype=object))

    import ray as _ray
    cand_ref = _ray.put(cand)

    def recount(batch: pa.Table) -> pa.Table:
        cand = _ray.get(cand_ref)
        flat, _ = _flatten_tokens(batch["text"].to_pylist())
        total = len(flat)
        if total:
            hit = flat[np.isin(flat, cand)]
            codes, uniq = pd.factorize(hit)
            toks = list(uniq.astype(str))
            cnts = list(np.bincount(codes, minlength=len(uniq))
                        .astype(np.int64))
        else:
            toks, cnts = [], []
        toks.append(None)   # null sentinel row carries the batch total
        cnts.append(0)      # ("" can be a REAL token via double spaces)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "cnt": pa.array(cnts, pa.int64()),
                         "tot": pa.array([0] * (len(toks) - 1) + [total],
                                         pa.int64())})

    got = (ds.map_batches(recount, batch_format="pyarrow").to_pandas())
    total = int(got["tot"].sum())
    exact = (got[got["token"].notna()].groupby("token")["cnt"].sum()
             .astype(np.int64))
    hh = exact[exact * k > total].sort_values(ascending=False)
    out = pd.DataFrame({"token": hh.index.astype(str),
                        "cnt": hh.to_numpy(dtype=np.int64)})
    return (out.sort_values(["cnt", "token"], ascending=[False, True])
               .reset_index(drop=True))


def _hh_sql(k: int = HH_K) -> str:
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM tok)
SELECT t AS token, COUNT(*)::BIGINT AS cnt
FROM tok, tot
GROUP BY t, tot.n
HAVING COUNT(*) * {k} > tot.n
ORDER BY cnt DESC, token
"""


HEAVY_HITTER_TOKENS_SQL = _hh_sql()


# ---------------------------------------------------------------------------
# train/val/test split — content-addressed hash split (reproducible
# across any partitioning / cluster size), with per-split balance stats
# ---------------------------------------------------------------------------

SPLIT_PCTS = (80, 10, 10)   # train / val / test


def split_documents(sf_dir: str,
                    pcts: tuple[int, int, int] = SPLIT_PCTS
                    ) -> pd.DataFrame:
    """Assign every document to train/val/test by its stable 64-bit id
    hash mod 100 (train < p0, val < p0+p1, else test) and report the
    per-(split, lang) balance table: doc count and total chars. The
    split is a pure function of doc_id — the dataset-versioning
    property: re-running on a re-partitioned or grown corpus never
    reassigns an existing document. Per-batch combiner (≤ 3×langs
    rows per block) then a tiny grouped sum; the corpus never
    shuffles."""
    from .dedup import _h64u

    p0, p1, _ = pcts
    ds = _read_docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = np.fromiter((_h64u(str(d)) % 100 for d in ids),
                        dtype=np.int64, count=len(ids))
        split = np.where(h < p0, "train",
                         np.where(h < p0 + p1, "val", "test"))
        df = pd.DataFrame({
            "split": split,
            "lang": batch["lang"].to_pandas(),
            "n_docs": np.ones(len(ids), dtype=np.int64),
            "n_chars": np.asarray(
                batch["n_chars"].to_numpy(zero_copy_only=False),
                dtype=np.int64)})
        g = (df.groupby(["split", "lang"], as_index=False)
               .sum(numeric_only=True))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby(["split", "lang"], as_index=False)
           [["n_docs", "n_chars"]].sum())
    for c in ("n_docs", "n_chars"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["split", "lang"])
               .reset_index(drop=True))


def _split_sql(pcts: tuple[int, int, int] = SPLIT_PCTS) -> str:
    p0, p1, _ = pcts
    le = " || ".join(f"substr(md5(doc_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH s AS (
  SELECT CASE WHEN ('0x' || {le})::UBIGINT % 100 < {p0} THEN 'train'
              WHEN ('0x' || {le})::UBIGINT % 100 < {p0 + p1} THEN 'val'
              ELSE 'test' END AS split,
         lang, n_chars
  FROM documents)
SELECT split, lang, COUNT(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS n_chars
FROM s GROUP BY split, lang ORDER BY split, lang
"""


SPLIT_DOCUMENTS_SQL = _split_sql()


# ---------------------------------------------------------------------------
# curation_pipeline — the composed corpus-curation chain (quality gate →
# exact dedup → train/val/test split), verified end-to-end by ONE
# chained SQL oracle rather than per-stage checks
# ---------------------------------------------------------------------------

def curation_pipeline(sf_dir: str, min_tokens: int = 40,
                      max_stop_ratio: float = 0.06,
                      pcts: tuple[int, int, int] = SPLIT_PCTS
                      ) -> pd.DataFrame:
    """End-to-end curation: quality-filter (token floor + stopword
    ceiling, same integer-derived boundary as quality_filter_stats),
    exact-dedup survivors (min doc_id per content hash — only 16 B/doc
    cross the shuffle), split assignment by content-addressed id hash,
    and the per-(split, lang) balance table of what remains.

    Three verified operators composed as ONE lazy chain and verified
    against ONE chained-CTE oracle: composition bugs (filter-before-
    vs-after-dedup ordering, survivor attribution) are exactly what
    per-operator gates cannot see. Pass 2 filters by a broadcast
    sorted survivor-id array (np.isin — the minhash corpus-pass
    pattern); beyond driver memory that filter becomes the
    bloom_semi_join, unchanged semantics."""
    import ray as _ray
    from ray.data.aggregate import Min

    from .dedup import _content_hash_batch, _h64u
    from .text import _quality_batch

    p0, p1, _ = pcts
    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])

    def gate(batch: pa.Table) -> pa.Table:
        q = _quality_batch(batch.select(["doc_id", "text"]))
        keep = (np.asarray(q["n_tokens"]) >= min_tokens) & \
               (np.asarray(q["stopword_ratio"]) <= max_stop_ratio)
        return _content_hash_batch(batch.filter(pa.array(keep)))

    survivors = (ds.map_batches(gate, batch_format="pyarrow")
                 .groupby("content_hash")
                 .aggregate(Min("doc_id", alias_name="doc_id")))
    surv = np.sort(survivors.to_pandas()["doc_id"].to_numpy(np.int64))
    surv_ref = _ray.put(surv)

    def finish(batch: pa.Table) -> pa.Table:
        surv = _ray.get(surv_ref)
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        batch = batch.filter(pa.array(np.isin(ids, surv)))
        if batch.num_rows == 0:
            return pa.table({"split": pa.array([], pa.string()),
                             "lang": pa.array([], pa.string()),
                             "kept_docs": pa.array([], pa.int64()),
                             "kept_tokens": pa.array([], pa.int64())})
        q = _quality_batch(batch.select(["doc_id", "text"]))
        ids = batch["doc_id"].to_pylist()
        h = np.fromiter((_h64u(str(d)) % 100 for d in ids),
                        dtype=np.int64, count=len(ids))
        df = pd.DataFrame({
            "split": np.where(h < p0, "train",
                              np.where(h < p0 + p1, "val", "test")),
            "lang": batch["lang"].to_pandas(),
            "kept_docs": np.ones(len(ids), dtype=np.int64),
            "kept_tokens": np.asarray(q["n_tokens"], dtype=np.int64),
        })
        g = (df.groupby(["split", "lang"], as_index=False)
               .sum(numeric_only=True))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(finish, batch_format="pyarrow").to_pandas()
           .groupby(["split", "lang"], as_index=False)
           [["kept_docs", "kept_tokens"]].sum())
    for c in ("kept_docs", "kept_tokens"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["split", "lang"])
               .reset_index(drop=True))


def _curation_sql(min_tokens: int = 40, max_stop_ratio: float = 0.06,
                  pcts: tuple[int, int, int] = SPLIT_PCTS) -> str:
    from .text import STOPWORDS
    p0, p1, _ = pcts
    le = " || ".join(f"substr(md5(doc_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH q AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             w -> w IN {STOPWORDS!r}))
           / CAST(GREATEST(len(string_split(text, ' ')), 1) AS DOUBLE)
           AS stop_ratio,
         text
  FROM documents),
f AS (SELECT * FROM q
      WHERE n_tokens >= {min_tokens} AND stop_ratio <= {max_stop_ratio}),
s AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text),
j AS (SELECT f.* FROM f JOIN s USING (doc_id)),
sp AS (
  SELECT CASE WHEN ('0x' || {le})::UBIGINT % 100 < {p0} THEN 'train'
              WHEN ('0x' || {le})::UBIGINT % 100 < {p0 + p1} THEN 'val'
              ELSE 'test' END AS split,
         lang, n_tokens
  FROM j)
SELECT split, lang, COUNT(*)::BIGINT AS kept_docs,
       SUM(n_tokens)::BIGINT AS kept_tokens
FROM sp GROUP BY split, lang ORDER BY split, lang
"""


CURATION_PIPELINE_SQL = _curation_sql()


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

#: default phrase: common distinct-token bigram of the synthetic corpus
PHRASE_TERMS = ("order", "fast")


def phrase_search(sf_dir: str,
                  phrase: tuple[str, ...] = PHRASE_TERMS) -> pd.DataFrame:
    """Documents containing the exact token phrase (adjacent tokens,
    any length >= 2), with hit count and the 1-based position of the
    first hit — the POSITIONAL-index complement to
    ``boolean_and_search`` (conjunctive search answers "all terms",
    phrase search answers "in this order, adjacent": the feature an
    inverted index needs positions for).

    Scan-side evaluation, no shuffle: the phrase rides the closure;
    per batch, one token flattening + a vectorized shifted-equality
    AND across the phrase length (a positional-postings join would
    intersect per-term (doc, pos) lists instead — this is the ad-hoc
    query path, the boolean_and_search discipline). Per-doc hit
    counts via bincount, first positions via minimum.at — no Python
    loop over docs or hits."""
    if len(phrase) < 2:
        raise ValueError("phrase needs >= 2 tokens")
    terms = tuple(str(t) for t in phrase)
    k = len(terms)

    def hits(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(
            batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        n = len(doc_ids)
        if len(flat) < k:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64()),
                             "first_pos": pa.array([], pa.int64())})
        m = len(flat) - k + 1
        match = flat[:m] == terms[0]
        for j in range(1, k):
            match &= flat[j:m + j] == terms[j]
        # phrase must not straddle a document boundary
        match &= doc_idx[:m] == doc_idx[k - 1:m + k - 1]
        sel = np.flatnonzero(match)
        if not len(sel):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64()),
                             "first_pos": pa.array([], pa.int64())})
        d = doc_idx[sel]
        n_hits = np.bincount(d, minlength=n)
        # 1-based in-doc position of each hit: flat offset - doc start
        first_flat = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_flat, doc_idx, np.arange(len(flat),
                                                     dtype=np.int64))
        pos1 = sel - first_flat[d] + 1
        first_pos = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_pos, d, pos1)
        hit_docs = np.flatnonzero(n_hits > 0)
        return pa.table({
            "doc_id": pa.array(doc_ids[hit_docs], pa.int64()),
            "n_hits": pa.array(n_hits[hit_docs], pa.int64()),
            "first_pos": pa.array(first_pos[hit_docs], pa.int64())})

    out = (_read_docs(sf_dir, columns=["doc_id", "text"])
           .map_batches(hits, batch_format="pyarrow")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _phrase_sql(phrase: tuple[str, ...]) -> str:
    conds = " AND ".join(
        f"arr[i + {j}] = '{t}'" for j, t in enumerate(phrase))
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
           FROM documents),
nums AS (SELECT unnest(generate_series(1,
           (SELECT MAX(len(arr)) FROM d)::INT)) AS i),
hits AS (
  SELECT doc_id, i
  FROM d JOIN nums ON i + {len(phrase) - 1} <= len(arr)
  WHERE {conds})
SELECT doc_id, COUNT(*)::BIGINT AS n_hits,
       MIN(i)::BIGINT AS first_pos
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


PHRASE_SEARCH_SQL = _phrase_sql(PHRASE_TERMS)


# ---------------------------------------------------------------------------
# BPE tokenizer training (merge learning)
# ---------------------------------------------------------------------------

#: byte-level initial alphabet (documents are ASCII here; ids >= 256
#: are learned merges)
_BPE_BASE = 256


def _bpe_apply_merge(s: np.ndarray, a: int, b: int, c: int) -> np.ndarray:
    """Replace left-to-right non-overlapping (a, b) adjacencies with
    c in one symbol-id array. Overlaps only arise when a == b (a
    match at i+1 needs s[i+1] == a AND == b), resolved by keeping
    alternating matches within each run — exact left-to-right
    semantics, fully vectorized."""
    if len(s) < 2:
        return s
    m = (s[:-1] == a) & (s[1:] == b)
    if not m.any():
        return s
    if a == b:
        r = np.flatnonzero(m)
        run_start = np.r_[True, np.diff(r) > 1]
        run_id = np.cumsum(run_start) - 1
        first = r[np.flatnonzero(run_start)][run_id]
        keep = ((r - first) % 2) == 0
        r = r[keep]
    else:
        r = np.flatnonzero(m)
    out = s.copy()
    out[r] = c
    return np.delete(out, r + 1)


def bpe_train(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """Learn byte-level BPE merges over the document corpus — the
    tokenizer-TRAINING half of the tokenize family (the counting half
    is ``token_stats``/``bpe_doc_stats``). Each round is ONE
    ``map_batches`` pass: every batch re-encodes its documents under
    the merges so far (vectorized left-to-right replacement, overlap
    runs resolved by parity) and emits adjacent-pair count partials;
    a tiny pair-keyed groupby (bounded by the live pair vocabulary)
    feeds the driver's argmax. Ties break deterministically by
    (count DESC, left token string ASC, right token string ASC), so
    the distributed result is bit-identical to the sequential
    reimplementation (``bpe_train_sequential``, an independent pure-
    Python path the gate compares against). Pairs never cross
    document boundaries. Returns (step, left, right, n) — left/right
    rendered as strings.

    Scale shape: K passes over the corpus (K = n_merges), each a
    streaming map_batches with per-batch combiners; only pair-count
    partials shuffle. Incremental pair-delta maintenance (update
    counts from the applied merge's neighborhoods instead of
    recounting) is the known optimization and keeps the same
    semantics; recounting is the simple exact form."""
    from ray.data.aggregate import Sum

    # K passes re-read the same column: materialize once (block
    # refs only — the corpus stays in the object store, not the driver)
    docs = _read_docs(sf_dir, columns=["text"]).materialize()
    merges: list[tuple[int, int, int]] = []
    names: dict[int, str] = {}

    def name(i: int) -> str:
        return names.get(i) or chr(i)

    rows = []
    for step in range(n_merges):
        cur = list(merges)

        def count(b: pa.Table) -> pa.Table:
            hist: dict[int, int] = {}
            for t in b["text"].to_pylist():
                s = np.frombuffer(t.encode("latin-1"),
                                  np.uint8).astype(np.int64)
                for a, bb, c in cur:
                    s = _bpe_apply_merge(s, a, bb, c)
                if len(s) < 2:
                    continue
                keys = s[:-1] * np.int64(1 << 32) + s[1:]
                u, n = np.unique(keys, return_counts=True)
                for k, v in zip(u.tolist(), n.tolist()):
                    hist[k] = hist.get(k, 0) + v
            keys = sorted(hist)
            return pa.table({
                "pair": pa.array(keys, pa.int64()),
                "n": pa.array([hist[k] for k in keys], pa.int64())})

        cnt = (docs.map_batches(count, batch_format="pyarrow")
                   .groupby("pair")
                   .aggregate(Sum("n", alias_name="n"))
                   .to_pandas())
        if not len(cnt):
            break
        pairs = cnt["pair"].to_numpy(np.int64)
        ns = cnt["n"].to_numpy(np.int64)
        la = (pairs >> 32).astype(np.int64)
        rb = (pairs & ((1 << 32) - 1)).astype(np.int64)
        # deterministic argmax: count DESC, then (left, right) strings
        top = int(ns.max())
        cand = np.flatnonzero(ns == top)
        cand = sorted(cand, key=lambda i: (name(int(la[i])),
                                           name(int(rb[i]))))
        i = cand[0]
        a, bb, n = int(la[i]), int(rb[i]), int(ns[i])
        c = _BPE_BASE + step
        names[c] = name(a) + name(bb)
        merges.append((a, bb, c))
        rows.append((step, name(a), name(bb), n))
    out = pd.DataFrame(rows, columns=["step", "left", "right", "n"])
    out["step"] = out["step"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def bpe_train_sequential(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """Independent pure-Python BPE trainer (dict-and-list scan, no
    numpy, no Ray) — the oracle for ``bpe_train``: same semantics
    (byte alphabet, left-to-right replacement, per-document
    sequences, count-then-lexicographic tie-break)."""
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])["text"].tolist()
    seqs = [[chr(b) for b in t.encode("latin-1")] for t in docs]
    rows = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        top = max(counts.values())
        a, b = min(p for p, v in counts.items() if v == top)
        rows.append((step, a, b, top))
        tok = a + b
        for d, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[d] = out
    out = pd.DataFrame(rows, columns=["step", "left", "right", "n"])
    out["step"] = out["step"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def bpe_encode_stats(sf_dir: str, n_merges: int = 8) -> pd.DataFrame:
    """Train BPE merges, then ENCODE the corpus under them — the
    end-to-end tokenizer composition (train -> encode) a data pipeline
    actually ships. Output: (n_tokens, n_docs) histogram of encoded
    document lengths. The encode pass is one map_batches applying the
    learned merges with the same vectorized left-to-right replacement
    the trainer uses; the histogram combine is bins-sized."""
    from ray.data.aggregate import Sum

    trained = bpe_train(sf_dir, n_merges)
    # rebuild id-level merges from the string table (ids are dense)
    names: dict[str, int] = {}
    merges: list[tuple[int, int, int]] = []
    def to_id(tok: str) -> int:
        if len(tok) == 1:
            return ord(tok)
        return names[tok]
    for step, left, right in zip(trained["step"], trained["left"],
                                 trained["right"]):
        c = _BPE_BASE + int(step)
        a, b = to_id(str(left)), to_id(str(right))
        names[str(left) + str(right)] = c
        merges.append((a, b, c))

    def encode(b: pa.Table) -> pa.Table:
        hist: dict[int, int] = {}
        for t in b["text"].to_pylist():
            s = np.frombuffer(t.encode("latin-1"),
                              np.uint8).astype(np.int64)
            for a, bb, c in merges:
                s = _bpe_apply_merge(s, a, bb, c)
            hist[len(s)] = hist.get(len(s), 0) + 1
        keys = sorted(hist)
        return pa.table({
            "n_tokens": pa.array(keys, pa.int64()),
            "n_docs": pa.array([hist[k] for k in keys], pa.int64())})

    out = (_read_docs(sf_dir, columns=["text"])
           .map_batches(encode, batch_format="pyarrow")
           .groupby("n_tokens")
           .aggregate(Sum("n_docs", alias_name="n_docs"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("n_tokens").reset_index(drop=True)


def bpe_encode_stats_sequential(sf_dir: str,
                                n_merges: int = 8) -> pd.DataFrame:
    """Independent pure-Python train+encode (the dict-and-list path of
    ``bpe_train_sequential`` carried through to document lengths)."""
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])["text"].tolist()
    seqs = [[chr(b) for b in t.encode("latin-1")] for t in docs]
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        top = max(counts.values())
        a, b = min(p for p, v in counts.items() if v == top)
        tok = a + b
        for d, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[d] = out
    lens = pd.Series([len(s) for s in seqs])
    vc = lens.value_counts().sort_index()
    return pd.DataFrame({"n_tokens": vc.index.astype(np.int64),
                         "n_docs": vc.to_numpy(np.int64)})


#: default NEAR query: the two most frequent tokens, window 3
NEAR_TERMS, NEAR_WINDOW = ("scan", "column"), 3


def near_search(sf_dir: str, t1: str = NEAR_TERMS[0],
                t2: str = NEAR_TERMS[1],
                window: int = NEAR_WINDOW) -> pd.DataFrame:
    """Documents where ``t1`` and ``t2`` occur within ``window`` token
    positions of each other (the IR NEAR/k operator — phrase search's
    unordered sibling; an inverted index serves it from positional
    postings). Per doc: the count of (i, j) position pairs with
    |i−j| <= window and the smallest such |i−j|. Scan-side and
    shuffle-free: per batch one token flattening, then per-doc
    searchsorted range counting between the two (sorted) position
    lists — no pair materialization."""
    if t1 == t2:
        raise ValueError("NEAR terms must differ")
    w = int(window)

    def hits(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(
            batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
        n = len(doc_ids)
        first_flat = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_flat, doc_idx, np.arange(len(flat),
                                                     dtype=np.int64))
        out_doc, out_n, out_min = [], [], []
        m1 = flat == t1
        m2 = flat == t2
        for d in np.unique(doc_idx[m1 & np.isin(doc_idx,
                                                doc_idx[m2])]):
            p1 = np.flatnonzero(m1 & (doc_idx == d)) - first_flat[d]
            p2 = np.flatnonzero(m2 & (doc_idx == d)) - first_flat[d]
            lo = np.searchsorted(p2, p1 - w, side="left")
            hi = np.searchsorted(p2, p1 + w, side="right")
            cnt = int((hi - lo).sum())
            if not cnt:
                continue
            # smallest |i-j|: nearest p2 around each p1
            ins = np.searchsorted(p2, p1)
            best = np.iinfo(np.int64).max
            left_ok = ins > 0
            if left_ok.any():
                best = min(best, int((p1[left_ok]
                                      - p2[ins[left_ok] - 1]).min()))
            right_ok = ins < len(p2)
            if right_ok.any():
                best = min(best, int((p2[ins[right_ok]]
                                      - p1[right_ok]).min()))
            out_doc.append(int(doc_ids[d]))
            out_n.append(cnt)
            out_min.append(best)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "n_pairs": pa.array(out_n, pa.int64()),
            "min_dist": pa.array(out_min, pa.int64())})

    out = (_read_docs(sf_dir, columns=["doc_id", "text"])
           .map_batches(hits, batch_format="pyarrow")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _near_sql(t1: str, t2: str, window: int) -> str:
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
           FROM documents),
nums AS (SELECT unnest(generate_series(1,
           (SELECT MAX(len(arr)) FROM d)::INT)) AS i),
pos AS (SELECT doc_id, i, arr[i] AS tok
        FROM d JOIN nums ON i <= len(arr)),
p1 AS (SELECT doc_id, i FROM pos WHERE tok = '{t1}'),
p2 AS (SELECT doc_id, i FROM pos WHERE tok = '{t2}'),
pairs AS (
  SELECT p1.doc_id, ABS(p1.i - p2.i) AS dist
  FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
  WHERE ABS(p1.i - p2.i) <= {window})
SELECT doc_id, COUNT(*)::BIGINT AS n_pairs,
       MIN(dist)::BIGINT AS min_dist
FROM pairs GROUP BY doc_id ORDER BY doc_id
"""


NEAR_SEARCH_SQL = _near_sql(*NEAR_TERMS, NEAR_WINDOW)


#: KWIC context width (tokens either side of the phrase)
KWIC_WINDOW = 3


def kwic_snippets(sf_dir: str,
                  phrase: tuple[str, ...] = PHRASE_TERMS,
                  window: int = KWIC_WINDOW) -> pd.DataFrame:
    """Keyword-in-context extraction: for every document matching the
    exact phrase, the snippet of ``window`` tokens around its FIRST
    hit — the result-rendering stage of the search chain (find ->
    rank -> snippet). Per batch one token flattening + the
    phrase_search shifted-equality match; snippet assembly is a
    per-hit-doc slice join (hit docs only, never the corpus)."""
    if len(phrase) < 2:
        raise ValueError("phrase needs >= 2 tokens")
    terms = tuple(str(t) for t in phrase)
    k = len(terms)
    w = int(window)

    def hits(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(
            batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        texts = batch["text"].to_pylist()
        flat, doc_idx = _flatten_tokens(texts)
        n = len(doc_ids)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "first_pos": pa.array([], pa.int64()),
                          "snippet": pa.array([], pa.string())})
        if len(flat) < k:
            return empty
        m = len(flat) - k + 1
        match = flat[:m] == terms[0]
        for j in range(1, k):
            match &= flat[j:m + j] == terms[j]
        match &= doc_idx[:m] == doc_idx[k - 1:m + k - 1]
        sel = np.flatnonzero(match)
        if not len(sel):
            return empty
        d = doc_idx[sel]
        first_flat = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_flat, doc_idx, np.arange(len(flat),
                                                     dtype=np.int64))
        pos1 = sel - first_flat[d] + 1
        first_pos = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_pos, d, pos1)
        hit_docs = np.flatnonzero(first_pos < np.iinfo(np.int64).max)
        out_doc, out_pos, out_snip = [], [], []
        for di in hit_docs:
            toks = texts[di].split(" ")
            fp = int(first_pos[di])  # 1-based
            lo = max(1, fp - w)
            hi = min(len(toks), fp + k - 1 + w)
            out_doc.append(int(doc_ids[di]))
            out_pos.append(fp)
            out_snip.append(" ".join(toks[lo - 1:hi]))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "first_pos": pa.array(out_pos, pa.int64()),
                         "snippet": pa.array(out_snip, pa.string())})

    out = (_read_docs(sf_dir, columns=["doc_id", "text"])
           .map_batches(hits, batch_format="pyarrow")
           .to_pandas())
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["first_pos"] = out["first_pos"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _kwic_sql(phrase: tuple[str, ...], window: int) -> str:
    conds = " AND ".join(
        f"arr[i + {j}] = '{t}'" for j, t in enumerate(phrase))
    k = len(phrase)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
           FROM documents),
nums AS (SELECT unnest(generate_series(1,
           (SELECT MAX(len(arr)) FROM d)::INT)) AS i),
hits AS (
  SELECT doc_id, MIN(i) AS first_pos
  FROM d JOIN nums ON i + {k - 1} <= len(arr)
  WHERE {conds}
  GROUP BY doc_id)
SELECT h.doc_id, h.first_pos,
       array_to_string(
         arr[greatest(1, h.first_pos - {window})
             : least(len(arr), h.first_pos + {k - 1 + window})],
         ' ') AS snippet
FROM hits h JOIN d ON d.doc_id = h.doc_id
ORDER BY h.doc_id
"""


KWIC_SNIPPETS_SQL = _kwic_sql(PHRASE_TERMS, KWIC_WINDOW)


#: vocabulary-growth checkpoints (docs ingested, doc_id order)
VOCAB_GROWTH_POINTS = (50, 100, 200, 400)


def vocab_growth(sf_dir: str,
                 points: tuple[int, ...] = VOCAB_GROWTH_POINTS
                 ) -> pd.DataFrame:
    """Vocabulary growth curve (the Heaps'-law measurement): distinct
    tokens seen after the first N documents in doc_id order, for each
    checkpoint N — corpus analytics that decides tokenizer vocab
    budgets. EXACT with one vocab-sized shuffle: per batch each token
    reduces to its min doc_id, the groupby keeps the global first
    occurrence, and every checkpoint is then a count over the tiny
    (token, first_doc) table — no per-checkpoint rescans."""
    from ray.data.aggregate import Min

    def first_seen(b: pa.Table) -> pa.Table:
        doc_ids = np.asarray(
            b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        flat, doc_idx = _flatten_tokens(b["text"].to_pylist())
        df = pd.DataFrame({"token": flat, "d": doc_ids[doc_idx]})
        g = df.groupby("token", as_index=False)["d"].min()
        return pa.table({"token": pa.array(g["token"], pa.string()),
                         "d": pa.array(g["d"].to_numpy(np.int64))})

    first = (_read_docs(sf_dir, columns=["doc_id", "text"])
             .map_batches(first_seen, batch_format="pyarrow")
             .groupby("token")
             .aggregate(Min("d", alias_name="d"))
             .to_pandas())
    fd = first["d"].to_numpy(np.int64)
    rows = [(int(n), int((fd < n).sum())) for n in sorted(points)]
    out = pd.DataFrame(rows, columns=["n_docs", "vocab"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def _vocab_growth_sql(points: tuple[int, ...]) -> str:
    sels = " UNION ALL ".join(
        f"SELECT CAST({int(n)} AS BIGINT) AS n_docs" for n in
        sorted(points))
    return f"""
WITH first AS (
  SELECT token, MIN(doc_id) AS d FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents) GROUP BY token),
pts AS ({sels})
SELECT n_docs,
       (SELECT COUNT(*) FROM first WHERE d < n_docs)::BIGINT AS vocab
FROM pts ORDER BY n_docs
"""


VOCAB_GROWTH_SQL = _vocab_growth_sql(VOCAB_GROWTH_POINTS)

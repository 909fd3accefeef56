"""Similarity search over the ``embeddings`` table (list<float> column).

* ``ann_topk``       — brute-force cosine top-k: the query matrix is
                       broadcast once (``ray.put``), each batch does one
                       numpy matmul against it, per-batch local top-k
                       partials are merged driver-side (tiny: q×k rows
                       per batch). Rank-only output so the DuckDB oracle
                       matches exactly (float compare-free).
* ``ann_lsh``        — the scale path: random-hyperplane LSH buckets
                       (sign bits of projections) → candidates share a
                       bucket with the query in >=1 of B tables →
                       exact cosine only on candidates.
* ``knn_label_vote`` — k-NN classification of held-out vectors by
                       majority label vote (top-k + mode per query).
* ``ann_quantized`` / ``ann_quantized_from_table`` — symmetric int8
                       quantization (4× smaller vectors, exact integer
                       scores) inline or served from the stored table.
* ``ann_ivf`` / ``build_ivf_index``+``ann_ivf_query`` — k-means
                       inverted lists, in-memory or disk-backed
                       (probed-list-only reads).
* ``ann_pq``        — product quantization (8-byte codes) + exact
                       re-rank of the ADC shortlist.
* ``ann_topk_filtered`` — hybrid metadata-filtered search.
* ``embedding_gram`` / ``embedding_top_pc`` — exact distributed Gram
                       matrix + driver-side power iteration (PCA).
* ``centroid_outliers`` / ``embedding_neardup*`` — grouped vector QA.

Scale notes: brute force is O(N·q·d) flops streamed batch-by-batch —
the dataset is never materialized, each batch sees one (B×d)·(d×q)
matmul; per-batch partial top-k caps shuffle volume at q·k rows per
batch. The LSH variant bounds candidates per query; hot buckets are the
skew risk and get the same deterministic cap treatment as dedup.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .util import as_task_fn as _as_task_fn
from .util import shuffle_width as _shuffle_width


def _read_emb(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    """(n, d) float64 matrix from the list<float> column (one copy)."""
    col = batch["embedding"].combine_chunks() if isinstance(
        batch["embedding"], pa.ChunkedArray) else batch["embedding"]
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _load_queries(sf_dir: str, n_queries: int):
    """First n_queries vectors (vec_id order == file order; for a
    directory of parts — e.g. one written by
    ``embed_documents_to_embeddings`` — files stream in sorted-name
    order, still deterministic), read via streamed record batches —
    only the leading row group(s) leave storage, never the full table
    (100 TB rule: the query side is the ONLY thing the driver
    materializes)."""
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        paths = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".parquet"))
    else:
        paths = [path]
    batches, got = [], 0
    for p in paths:
        pf = pq.ParquetFile(p)
        for rb in pf.iter_batches(batch_size=max(n_queries, 256),
                                  columns=["vec_id", "embedding"]):
            batches.append(rb)
            got += rb.num_rows
            if got >= n_queries:
                break
        if got >= n_queries:
            break
    head = pa.Table.from_batches(batches).slice(0, n_queries)
    q = _emb_matrix(head)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    return head["vec_id"].to_pylist(), q


class _BruteTopK:
    """Broadcast-holding stage: query matrix fetched from the object
    store (zero-copy); per batch one matmul + tie-broken top-k.
    Dispatched as tasks via ``_as_task_fn`` — see there for why not an
    actor pool."""

    def __init__(self, q_ref, k: int):
        import ray
        self.q_ids, self.q = ray.get(q_ref)  # (nq, d), unit rows
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0, 1.0, norms)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        cos = m @ self.q.T  # (n, nq)
        qid_out, nid_out, cos_out = [], [], []
        for qi, qid in enumerate(self.q_ids):
            col = cos[:, qi]
            mask = ids != qid
            cand_ids = ids[mask]
            cand_cos = col[mask]
            k = min(self.k, len(cand_ids))
            if k == 0:
                continue
            # per-batch selection uses the SAME (cos DESC, neighbor_id)
            # tie-break as the driver merge and the SQL oracle — a bare
            # argpartition keeps an arbitrary k when ties straddle the
            # k boundary (latent gate flake on duplicate embeddings)
            part = np.lexsort((cand_ids, -cand_cos))[:k]
            qid_out.extend([qid] * k)
            nid_out.extend(cand_ids[part].tolist())
            cos_out.extend(cand_cos[part].tolist())
        return pa.table({"query_id": pa.array(qid_out, pa.int64()),
                         "neighbor_id": pa.array(nid_out, pa.int64()),
                         "cos": pa.array(cos_out, pa.float64())})


def ann_topk(sf_dir: str, n_queries: int = 4, k: int = 10) -> pd.DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.
    Output: (query_id, neighbor_id, rank) — rank 1 = most similar,
    ties broken by neighbor_id ascending."""
    import ray
    q_ids, q = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q))
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _as_task_fn(_BruteTopK, q_ref=q_ref, k=k),
        batch_format="pyarrow").to_pandas()
    out_rows = []
    for qid, grp in partials.groupby("query_id"):
        best = heapq.nsmallest(
            k, zip(-grp["cos"].values, grp["neighbor_id"].values))
        for rank, (_, nid) in enumerate(sorted(best), start=1):
            out_rows.append((int(qid), int(nid), rank))
    out = pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "rank"])
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings ORDER BY vec_id LIMIT 4),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
  FROM q, embeddings e WHERE e.vec_id != q.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the 100 TB path)
# ---------------------------------------------------------------------------

class _LshBucketer:
    """Random-hyperplane LSH: per-actor draw the fixed projection
    planes (seeded → identical everywhere), emit (table_id, bucket,
    vec_id) rows; candidates co-shuffle with the queries' buckets."""

    def __init__(self, dim: int, n_tables: int = 8, n_bits: int = 8,
                 seed: int = 13):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_tables, n_bits, dim))
        self.n_tables = n_tables
        self.n_bits = n_bits

    def bucket(self, m: np.ndarray) -> np.ndarray:
        """(n, d) -> (n, n_tables) int bucket ids."""
        out = np.empty((m.shape[0], self.n_tables), dtype=np.int64)
        weights = (1 << np.arange(self.n_bits)).astype(np.int64)
        for t in range(self.n_tables):
            bits = (m @ self.planes[t].T) > 0  # (n, n_bits)
            out[:, t] = bits.astype(np.int64) @ weights
        return out


class _CandidateScorer:
    """Shared single-pass scorer for bucketed ANN (LSH / IVF): the
    query set (+ its bucket/probe assignments) is broadcast once per
    actor; each batch computes its OWN vectors' buckets in place,
    selects candidates matching any query bucket, scores exact cosine,
    and emits a per-batch partial top-k (<= q*k rows) plus one
    candidate-count row per query (neighbor_id=-1, n_cand=count).
    Nothing but q*k-sized partials ever leaves a worker — no shuffle,
    no driver-side table read; the whole search is one streaming pass.
    """

    def __init__(self, q_ref, k: int):
        import ray
        self.q_ids, self.q, self.aux = ray.get(q_ref)
        self.k = k

    def _masks(self, m: np.ndarray) -> np.ndarray:
        """(n, d) unit rows -> (nq, n) candidate mask."""
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0, 1.0, norms)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        masks = self._masks(m)
        qid_out, nid_out, cos_out, cnt_out = [], [], [], []
        for qi, qid in enumerate(self.q_ids):
            sel = masks[qi] & (ids != qid)
            n_cand = int(sel.sum())
            if n_cand == 0:
                continue
            cand_ids = ids[sel]
            cos = m[sel] @ self.q[qi]
            k = min(self.k, n_cand)
            part = np.lexsort((cand_ids, -cos))[:k]
            qid_out.extend([qid] * k)
            nid_out.extend(cand_ids[part].tolist())
            cos_out.extend(cos[part].tolist())
            cnt_out.extend([0] * k)
            qid_out.append(qid)  # count row for this (query, batch)
            nid_out.append(-1)
            cos_out.append(0.0)
            cnt_out.append(n_cand)
        return pa.table({"query_id": pa.array(qid_out, pa.int64()),
                         "neighbor_id": pa.array(nid_out, pa.int64()),
                         "cos": pa.array(cos_out, pa.float64()),
                         "n_cand": pa.array(cnt_out, pa.int64())})


def _merge_topk_partials(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver merge of per-batch partials: q*k rows per batch, tiny.
    Same (cos DESC, neighbor_id ASC) tie-break as the per-batch pass."""
    counts = partials.groupby("query_id")["n_cand"].sum()
    rows = []
    for qid, grp in partials[partials["n_cand"] == 0].groupby("query_id"):
        nid = grp["neighbor_id"].to_numpy()
        order = np.lexsort((nid, -grp["cos"].to_numpy()))[:k]
        for rank, oi in enumerate(order, start=1):
            rows.append((int(qid), int(nid[oi]), rank, int(counts[qid])))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank",
                                       "n_candidates"])


class _LshScorer(_CandidateScorer):
    """aux = (dim, qb): per-actor rebuild of the seeded hyperplanes
    (identical everywhere — broadcast-free broadcast), candidates =
    vectors whose bucket is in the query's probe set in >=1 table.
    ``qb`` is (nq, n_tables, n_probes): probe 0 is the query's own
    bucket, the rest are multi-probe neighbors (1-bit flips)."""

    def __init__(self, q_ref, k: int):
        super().__init__(q_ref, k)
        dim, self.qb = self.aux
        self.bucketer = _LshBucketer(dim)

    def _masks(self, m: np.ndarray) -> np.ndarray:
        b = self.bucketer.bucket(m)  # (n, n_tables)
        # (nq, n): match any probe in any table
        return (b[None, :, :, None]
                == self.qb[:, None, :, :]).any(axis=(2, 3))


def ann_lsh(sf_dir: str, n_queries: int = 4, k: int = 10,
            multiprobe: int = 0) -> pd.DataFrame:
    """Approximate top-k: exact cosine restricted to vectors sharing an
    LSH bucket with the query in any of the hash tables. Fully
    distributed: one streaming map_batches pass, queries + their bucket
    ids broadcast, q*k partials merged driver-side.

    ``multiprobe=1`` additionally probes every bucket one bit-flip away
    from the query's bucket in each table (classic multi-probe LSH:
    recall of many more tables for the cost of widening the candidate
    mask, no extra shuffled state)."""
    import ray
    q_ids, q = _load_queries(sf_dir, n_queries)
    dim = q.shape[1]
    bucketer = _LshBucketer(dim)
    qb0 = bucketer.bucket(q)  # (nq, n_tables)
    probes = [qb0]
    if multiprobe >= 1:
        probes += [qb0 ^ (1 << bit) for bit in range(bucketer.n_bits)]
    qb = np.stack(probes, axis=2)  # (nq, n_tables, n_probes)
    q_ref = ray.put((q_ids, q, (dim, qb)))
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _as_task_fn(_LshScorer, q_ref=q_ref, k=k),
        batch_format="pyarrow").to_pandas()
    return _merge_topk_partials(partials, k)


class _CosinePairCounter:
    """Brute-force embedding near-dup: the full (small) normalized
    matrix is broadcast once per worker process; each batch does one
    matmul and
    counts partners with cosine >= threshold. At scale the candidate
    generation swaps to _LshBucketer buckets (same verify kernel) —
    this brute-force form is the exact oracle-matched baseline."""

    def __init__(self, mat_ref, threshold: float):
        import ray
        self.ids, self.m = ray.get(mat_ref)  # ids (n,), unit rows (n,d)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = _emb_matrix(batch)
        norms = np.linalg.norm(q, axis=1, keepdims=True)
        q = q / np.where(norms == 0, 1.0, norms)
        qids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        cos = q @ self.m.T  # (b, n)
        hits = cos >= self.threshold
        # exclude self and count only partners with larger vec_id
        larger = self.ids[None, :] > qids[:, None]
        sel = hits & larger
        cnt = sel.sum(axis=1).astype(np.int64)
        chk = np.where(sel, self.ids[None, :], 0).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": pa.array(qids.astype(np.int64)),
                         "pair_cnt": pa.array(cnt),
                         "hi_checksum": pa.array(chk)})


#: embedding_neardup is the labeled brute-force oracle twin of
#: embedding_neardup_lsh — it broadcasts the FULL vector matrix to every
#: actor, so it is hard-capped instead of silently OOMing at real scale
_EMB_NEARDUP_MAX_VECS = 500_000


def embedding_neardup(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Per-vector count of near-duplicate partners (cosine >= threshold,
    partner vec_id greater) + partner-id checksum."""
    import pyarrow.parquet as pq
    import ray
    full = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    if len(full) > _EMB_NEARDUP_MAX_VECS:
        raise ValueError(
            f"embedding_neardup is the brute-force oracle twin "
            f"(full-matrix broadcast): {len(full)} vectors exceeds the "
            f"{_EMB_NEARDUP_MAX_VECS} cap. Use embedding_neardup_lsh "
            f"(LSH-bucketed) at corpus scale.")
    m = _emb_matrix(full)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    m = m / np.where(norms == 0, 1.0, norms)
    ids = np.asarray(full["vec_id"].to_numpy(zero_copy_only=False))
    mat_ref = ray.put((ids, m))
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    out = ds.map_batches(
        _as_task_fn(_CosinePairCounter, mat_ref=mat_ref,
                    threshold=threshold),
        batch_format="pyarrow").to_pandas()
    out = out[out["pair_cnt"] > 0]
    return out.sort_values("vec_id").reset_index(drop=True)


EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS vec_id, COUNT(*) AS pair_cnt,
       CAST(SUM(b.vec_id) AS BIGINT) AS hi_checksum
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.4
GROUP BY a.vec_id ORDER BY vec_id
"""


class _NeardupBucketer:
    """Stage 1 of the LSH near-dup scale path: emit one row per
    (vector, table) carrying the normalized embedding, keyed by the
    LSH bucket hash folded into coarse partitions (the dedup
    coarse-partition pattern — never one Ray group per bucket; width
    is cluster-aware via ``util.coarse_fold_width``, and the pair SET
    is width-invariant because stage 2 groups by the real band
    key)."""

    def __init__(self, dim: int, n_tables: int = 16, n_bits: int = 8,
                 seed: int = 13):
        from .util import coarse_fold_width
        self.n_coarse = coarse_fold_width()
        self.bucketer = _LshBucketer(dim, n_tables=n_tables,
                                     n_bits=n_bits, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0, 1.0, norms)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        b = self.bucketer.bucket(m)  # (n, T)
        n, t = b.shape
        band_key = (b + (np.arange(t, dtype=np.int64) << 32)[None, :])
        band_key = band_key.T.reshape(-1)
        part = (band_key % self.n_coarse).astype(np.int32)
        emb = np.tile(m, (t, 1))
        return pa.table({
            "part": pa.array(part),
            "band_key": pa.array(band_key),
            "vec_id": pa.array(np.tile(ids, t).astype(np.int64)),
            "emb": pa.array(list(emb), pa.list_(pa.float64(), m.shape[1])),
        })


_NEARDUP_MAX_BUCKET = 512           # cosine block edge (memory bound)
_NEARDUP_FALLBACK_MAX_BUCKET = 8192  # pathological guard only


def _neardup_partition_pairs(group: pd.DataFrame,
                             threshold: float) -> pd.DataFrame:
    """Exact pairwise cosine within each real LSH bucket of one coarse
    partition (vectors are unit rows, so cos == dot). Oversized
    buckets compute ALL pairs block-matmul by block-matmul (peak
    memory = block^2 floats, never bucket^2); only the pathological
    fallback guard drops vectors, loudly."""
    import logging

    from .dedup import _iter_bucket_blocks

    lo, hi = [], []
    for bk, g in group.groupby("band_key", sort=True):
        uniq = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(uniq) < 2:
            continue
        if len(uniq) > _NEARDUP_FALLBACK_MAX_BUCKET:
            logging.warning(
                "embedding_neardup_lsh: pathological bucket %s truncated "
                "%d -> %d", bk, len(uniq), _NEARDUP_FALLBACK_MAX_BUCKET)
            uniq = uniq.iloc[:_NEARDUP_FALLBACK_MAX_BUCKET]
        ids = uniq["vec_id"].to_numpy()
        e = np.stack([np.asarray(v, dtype=np.float64)
                      for v in uniq["emb"]])
        for r0, r1, c0, c1 in _iter_bucket_blocks(
                len(ids), _NEARDUP_MAX_BUCKET):
            cos = e[r0:r1] @ e[c0:c1].T
            if c0 == r0:
                iu, ju = np.triu_indices(r1 - r0, k=1)
                keep = cos[iu, ju] >= threshold
                iu, ju = iu[keep] + r0, ju[keep] + r0
            else:
                ri, ci = np.nonzero(cos >= threshold)
                iu, ju = ri + r0, ci + c0
            lo.append(ids[iu])
            hi.append(ids[ju])
    if not lo:
        return pd.DataFrame({"vec_lo": pd.Series([], dtype=np.int64),
                             "vec_hi": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({"vec_lo": np.concatenate(lo),
                         "vec_hi": np.concatenate(hi)})


def embedding_neardup_lsh(sf_dir: str, threshold: float = 0.9,
                          n_tables: int = 16,
                          n_bits: int = 8) -> pd.DataFrame:
    """The 100 TB near-dup path: random-hyperplane LSH buckets (16
    tables x 8 bits) generate candidates, exact cosine verifies within
    each bucket, pairs dedupe distributed — no full-matrix broadcast,
    no O(N^2) all-pairs. Approximate: a qualifying pair is missed only
    if it collides in none of the tables (<1% at cos 0.9 with the
    16x8 default; lower thresholds need fewer bits / more tables —
    e.g. 32x4 gives ~99.6% recall at cos 0.4).
    ``embedding_neardup`` (brute force) is the exact small-scale
    oracle; tests verify precision 1.0 / recall >= 0.9 against it.
    Output shape matches the brute operator: per-vector partner count
    + partner-id checksum."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    # dim probe: footer schema only (no data read)
    schema = pq.read_schema(os.path.join(sf_dir, "embeddings.parquet"))
    f = schema.field("embedding").type
    dim = f.list_size if hasattr(f, "list_size") and f.list_size else None
    if not dim:
        _, q = _load_queries(sf_dir, 1)
        dim = q.shape[1]

    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    pairs = (ds.map_batches(
                _as_task_fn(_NeardupBucketer, dim=dim,
                            n_tables=n_tables, n_bits=n_bits),
                batch_format="pyarrow")
               .repartition(_shuffle_width(ds))
               .groupby("part")
               .map_groups(
                   lambda g: _neardup_partition_pairs(g, threshold),
                   batch_format="pandas"))
    distinct = (pairs.groupby(["vec_lo", "vec_hi"])
                     .aggregate(Count(alias_name="_n")))
    per_vec = (distinct.groupby("vec_lo")
               .aggregate(Count(alias_name="pair_cnt"),
                          Sum("vec_hi", alias_name="hi_checksum")))
    out = per_vec.to_pandas().rename(columns={"vec_lo": "vec_id"})
    if out.empty:  # zero qualifying pairs: keep the schema stable
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "pair_cnt": pd.Series([], dtype=np.int64),
                             "hi_checksum": pd.Series([], dtype=np.int64)})
    out["pair_cnt"] = out["pair_cnt"].astype(np.int64)
    out["hi_checksum"] = out["hi_checksum"].astype(np.int64)
    return (out[["vec_id", "pair_cnt", "hi_checksum"]]
            .sort_values("vec_id").reset_index(drop=True))


def knn_label_vote(sf_dir: str, n_queries: int = 20,
                   k: int = 5) -> pd.DataFrame:
    """k-NN majority-label classification of the first n_queries
    vectors against the rest (exclude self); ties broken by smaller
    label."""
    import ray
    q_ids, q = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q))
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding", "label"])

    class TopKWithLabel(_BruteTopK):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(
                batch.select(["vec_id", "embedding"]))
            # neighbor ids all come from THIS batch: vectorized
            # sorted-lookup instead of a per-row python dict probe
            vec = np.asarray(batch["vec_id"].to_numpy(
                zero_copy_only=False))
            lab = np.asarray(batch["label"].to_numpy(
                zero_copy_only=False))
            order = np.argsort(vec, kind="stable")
            pos = np.searchsorted(vec[order], np.asarray(
                out["neighbor_id"].to_numpy(zero_copy_only=False)))
            labels = lab[order][pos].astype(np.int32)
            return out.append_column("label", pa.array(labels))

    partials = ds.map_batches(
        _as_task_fn(TopKWithLabel, q_ref=q_ref, k=k),
        batch_format="pyarrow").to_pandas()
    rows = []
    for qid, grp in partials.groupby("query_id"):
        top = grp.sort_values(["cos", "neighbor_id"],
                              ascending=[False, True]).head(k)
        counts = top["label"].value_counts()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        rows.append((int(qid), int(best)))
    return pd.DataFrame(rows, columns=["query_id", "pred_label"])


KNN_LABEL_VOTE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings ORDER BY vec_id LIMIT 20),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
  FROM q, embeddings e WHERE e.vec_id != q.query_id),
topk AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rn
  FROM scored),
votes AS (
  SELECT query_id, label, COUNT(*) AS cnt FROM topk
  WHERE rn <= 5 GROUP BY query_id, label),
ranked AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cnt DESC, label) AS r
  FROM votes)
SELECT query_id, label::BIGINT AS pred_label FROM ranked WHERE r = 1
ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed search
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 11) -> np.ndarray:
    """Seeded Lloyd's k-means on unit vectors (spherical-ish): the
    coarse quantizer is trained driver-side on a sample — at 100 TB the
    sample is a `ds.limit(...)`/random-sample pull, the train cost is
    independent of dataset size."""
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


class _IvfScorer(_CandidateScorer):
    """aux = (cent, q_lists): candidates = vectors whose nearest-
    centroid list is among the query's probed lists. List assignment is
    recomputed per batch in place (one small matmul) — vectors never
    shuffle by list_id; only q*k partials leave each worker."""

    def __init__(self, q_ref, k: int):
        super().__init__(q_ref, k)
        self.cent, self.q_lists = self.aux  # (nl, d), (nq, n_probe)

    def _masks(self, m: np.ndarray) -> np.ndarray:
        lists = np.argmax(m @ self.cent.T, axis=1)  # (n,)
        return (lists[None, :, None]
                == self.q_lists[:, None, :]).any(axis=2)


def ann_ivf(sf_dir: str, n_queries: int = 4, k: int = 10,
            n_lists: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF ANN: a coarse k-means quantizer trained driver-side on a
    bounded head sample (train cost independent of dataset size),
    then ONE streaming scoring pass — each batch assigns its own
    vectors to lists, scores exact cosine for queries probing those
    lists, and ships only q*k partial rows. No full-table reads, no
    shuffle, no driver-side member index."""
    import ray
    _, sample = _load_queries(sf_dir, 2048)  # normalized head sample
    cent = _kmeans(sample, n_lists)
    q_ids, q = _load_queries(sf_dir, n_queries)
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    q_ref = ray.put((q_ids, q, (cent, q_lists)))
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _as_task_fn(_IvfScorer, q_ref=q_ref, k=k),
        batch_format="pyarrow").to_pandas()
    return _merge_topk_partials(partials, k)


# ---------------------------------------------------------------------------
# grouped vector aggregate — per-label centroids + farthest-from-centroid
# outliers (the embedding-space QA pass: mislabeled / anomalous vectors
# surface as the largest centroid distances)
# ---------------------------------------------------------------------------

CENTROID_SCALE = 1024      # integer quantization of embedding values
CENTROID_TOPK = 20


def centroid_outliers(sf_dir: str, k: int = CENTROID_TOPK) -> pd.DataFrame:
    """Global top-k vectors by squared distance to their own label's
    centroid: (vec_id, label, dist_q), ordered dist_q DESC then vec_id.

    Exactness: embedding values are quantized to integers (qv =
    round(v * 1024), DuckDB-ROUND semantics), so the per-(label, dim)
    centroid SUMS are order-free exact int64 and the distance is
    computed scale-free as sum((qv*n - sq)^2) — all integer, identical
    to the SQL oracle regardless of partitioning. int64 bound: |qv| <=
    ~1024, so dist_q < 64 * (2*1024*n)^2 stays under 2^63 for label
    cardinalities up to ~4e7 vectors — beyond that, raise the final
    sum to object ints (the partials stay int64).

    Scale shape: pass 1 emits per-batch (label, dim, qsum, n-partial)
    rows — at most labels x dim rows per block — into a tiny groupby;
    the (labels x dim) centroid table is closure-broadcast; pass 2 is
    one vectorized distance per batch with a per-batch top-k partial,
    so only k rows per block reach the final sort+limit.
    """
    from ray.data.aggregate import Sum

    ds = _read_emb(sf_dir, columns=["vec_id", "label", "embedding"])

    def _quant(emb_col) -> np.ndarray:
        m = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in emb_col.to_pylist()])
        scaled = m * CENTROID_SCALE
        # trunc(x + copysign(.5, x)) == DuckDB ROUND (half away from 0)
        return np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)

    def sums_partial(batch: pa.Table) -> pa.Table:
        q = _quant(batch["embedding"])            # (rows, dim) int64
        labels = np.asarray(batch["label"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        codes, uniq = pd.factorize(labels)
        dim = q.shape[1]
        sq = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sq, codes, q)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        lab = np.repeat(uniq, dim)
        d = np.tile(np.arange(dim, dtype=np.int64), len(uniq))
        return pa.table({
            "label": pa.array(lab),
            "dim": pa.array(d),
            "sq": pa.array(sq.ravel()),
            "n": pa.array(np.repeat(n, dim))})

    cent = (ds.map_batches(sums_partial, batch_format="pyarrow")
              .groupby(["label", "dim"])
              .aggregate(Sum("sq", alias_name="sq"),
                         Sum("n", alias_name="n"))
              .to_pandas())
    dim = int(cent["dim"].max()) + 1
    labels_u = np.sort(cent["label"].unique())
    lab_pos = {int(v): i for i, v in enumerate(labels_u)}
    sq_mat = np.zeros((len(labels_u), dim), dtype=np.int64)
    n_vec = np.zeros(len(labels_u), dtype=np.int64)
    rows = cent["label"].map(lab_pos).to_numpy()
    sq_mat[rows, cent["dim"].to_numpy()] = cent["sq"].to_numpy()
    n_vec[rows] = cent["n"].to_numpy()

    def dist_partial(batch: pa.Table) -> pa.Table:
        q = _quant(batch["embedding"])
        labels = np.asarray(batch["label"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        pos = np.fromiter((lab_pos[int(v)] for v in labels),
                          dtype=np.int64, count=len(labels))
        diff = q * n_vec[pos, None] - sq_mat[pos]
        dist = np.einsum("ij,ij->i", diff, diff)
        order = np.lexsort((np.asarray(
            batch["vec_id"].to_numpy(zero_copy_only=False)), -dist))[:k]
        return pa.table({
            "vec_id": pa.array(np.asarray(
                batch["vec_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)[order]),
            "label": pa.array(labels[order]),
            "dist_q": pa.array(dist[order])})

    out = (ds.map_batches(dist_partial, batch_format="pyarrow")
             .to_pandas())
    out = out.sort_values(["dist_q", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
    for c in ("vec_id", "label", "dist_q"):
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def _centroid_sql(k: int = CENTROID_TOPK) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {CENTROID_SCALE})
              AS BIGINT) AS qv
  FROM embeddings),
cnt AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
c AS (SELECT label, dim, SUM(qv) AS sq FROM q GROUP BY label, dim),
d AS (
  SELECT q.vec_id, q.label,
         SUM((q.qv * cnt.n - c.sq) * (q.qv * cnt.n - c.sq)) AS dist
  FROM q JOIN c ON c.label = q.label AND c.dim = q.dim
         JOIN cnt ON cnt.label = q.label
  GROUP BY q.vec_id, q.label)
SELECT vec_id, label::BIGINT AS label, CAST(dist AS BIGINT) AS dist_q
FROM d ORDER BY dist_q DESC, vec_id LIMIT {k}
"""


CENTROID_OUTLIERS_SQL = _centroid_sql()


# ---------------------------------------------------------------------------
# int8-quantized ANN — the memory-scaling path
# ---------------------------------------------------------------------------

def _symmetric_quantize(m: np.ndarray, scale: float) -> np.ndarray:
    """Symmetric int8-style quantization: round(v * 127 / scale), with
    trunc(x + copysign(.5, x)) == DuckDB ROUND (half away from zero).
    ``scale`` is the corpus-global max |value|, so the range maps onto
    [-127, 127] exactly and no clamp is needed on either side."""
    s = m * 127.0 / scale
    return np.trunc(s + np.copysign(0.5, s)).astype(np.int64)


class _QuantTopK:
    """Task-based stage for quantized ANN: the int-quantized query
    matrix + global scale are fetched from the object store once per
    actor; per batch one int64 matmul over the freshly-quantized
    vectors, then the same (score DESC, neighbor_id) top-k partial as
    the float brute-force stage."""

    def __init__(self, q_ref, k: int):
        import ray
        self.q_ids, self.qq, self.scale = ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _symmetric_quantize(_emb_matrix(batch), self.scale)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        scores = m @ self.qq.T  # (n, nq) int64
        qid_out, nid_out, sc_out = [], [], []
        for qi, qid in enumerate(self.q_ids):
            col = scores[:, qi]
            mask = ids != qid
            cand_ids = ids[mask]
            cand_sc = col[mask]
            k = min(self.k, len(cand_ids))
            if k == 0:
                continue
            part = np.lexsort((cand_ids, -cand_sc))[:k]
            qid_out.extend([qid] * k)
            nid_out.extend(cand_ids[part].tolist())
            sc_out.extend(cand_sc[part].tolist())
        return pa.table({"query_id": pa.array(qid_out, pa.int64()),
                         "neighbor_id": pa.array(nid_out, pa.int64()),
                         "score": pa.array(sc_out, pa.int64())})


def ann_quantized(sf_dir: str, n_queries: int = 4,
                  k: int = 10) -> pd.DataFrame:
    """Top-k neighbors under symmetric int8 quantization: (query_id,
    neighbor_id, rank, score) with score the EXACT integer quantized
    dot product — ties broken by neighbor_id, identical to the oracle.

    This is the 100 TB memory story: int8 vectors are 4× smaller than
    float32 in the object store and the scoring matmul is integer, so
    a corpus whose float embeddings spill fits in memory quantized.
    Two streamed passes: pass 1 reduces each block to ONE max-|value|
    row (the global scale — 8 bytes per block crosses the wire);
    pass 2 is the standard broadcast-queries scorer with per-batch
    q×k integer partials. Quantization happens inside the batch from
    the float column — at a real deployment the quantized table would
    be written once (`write_doc_output`) and re-scored from int8.

    int64 bound: |score| <= d * 127² ≈ 16k·d, nowhere near overflow
    for any real dimension.
    """
    import ray

    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])

    def max_abs(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        return pa.table({"a": pa.array([float(np.abs(m).max())]
                                       if m.size else [0.0])})

    scale = float(ds.map_batches(max_abs, batch_format="pyarrow")
                    .to_pandas()["a"].max())

    q_ids, q = _load_queries(sf_dir, n_queries)
    qq = _symmetric_quantize(q, scale)
    q_ref = ray.put((q_ids, qq, scale))
    partials = ds.map_batches(
        _as_task_fn(_QuantTopK, q_ref=q_ref, k=k),
        batch_format="pyarrow").to_pandas()
    out_rows = []
    for qid, grp in partials.groupby("query_id"):
        best = heapq.nsmallest(
            k, zip(-grp["score"].values, grp["neighbor_id"].values))
        for rank, (neg_sc, nid) in enumerate(sorted(best), start=1):
            out_rows.append((int(qid), int(nid), rank, int(-neg_sc)))
    out = pd.DataFrame(out_rows, columns=["query_id", "neighbor_id",
                                          "rank", "score"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# the quantization expression is written EXACTLY as numpy computes it —
# (v * 127.0) / s in f64, then half-away-from-zero round — so every
# integer score matches bit-for-bit.
ANN_QUANTIZED_SQL = """
WITH a AS (
  SELECT MAX(ABS(v)) AS s
  FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
qd AS (
  SELECT vec_id AS query_id, generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 127.0 /
                    (SELECT s FROM a)) AS BIGINT) AS qv
  FROM embeddings WHERE vec_id IN (SELECT vec_id FROM qids)),
ed AS (
  SELECT vec_id AS neighbor_id, generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 127.0 /
                    (SELECT s FROM a)) AS BIGINT) AS ev
  FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, SUM(qv * ev) AS score
  FROM qd JOIN ed USING (dim)
  WHERE neighbor_id != query_id
  GROUP BY query_id, neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# distributed Gram matrix + top principal component
# ---------------------------------------------------------------------------

def embedding_gram(sf_dir: str) -> pd.DataFrame:
    """Integer-exact Gram matrix of the embedding column: (dim_i,
    dim_j, gram_q) for i <= j (1-based dims, upper triangle), where
    gram_q = sum over vectors of qv_i * qv_j with qv = round(v * 1024)
    (DuckDB-ROUND semantics, same quantization as the centroid op).

    The Gram/covariance matrix is THE building block for distributed
    PCA / whitening / OOD scoring: each block contributes one d x d
    partial via a single ``q.T @ q`` einsum — d(d+1)/2 rows per block,
    independent of block size — and the combine is an order-free
    integer groupby-sum, so the result is exact under any partitioning.
    The full corpus never moves: at 100 TB the shuffle carries only
    (#blocks x 2080) pre-summed rows for d=64.

    int64 bound: |qv| <= ~1024 so each product is <= ~2^20 — safe up
    to ~2^43 vectors.
    """
    from ray.data.aggregate import Sum

    ds = _read_emb(sf_dir, columns=["embedding"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        scaled = m * CENTROID_SCALE
        q = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)
        g = q.T @ q                              # (d, d) int64
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table({"dim_i": pa.array(iu + 1),
                         "dim_j": pa.array(ju + 1),
                         "gram_q": pa.array(g[iu, ju])})

    out = (ds.map_batches(gram_partial, batch_format="pyarrow")
             .groupby(["dim_i", "dim_j"])
             .aggregate(Sum("gram_q", alias_name="gram_q"))
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out[["dim_i", "dim_j", "gram_q"]]
            .sort_values(["dim_i", "dim_j"]).reset_index(drop=True))


EMBEDDING_GRAM_SQL = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {CENTROID_SCALE})
              AS BIGINT) AS qv
  FROM embeddings)
SELECT a.dim AS dim_i, b.dim AS dim_j,
       CAST(SUM(a.qv * b.qv) AS BIGINT) AS gram_q
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY dim_i, dim_j ORDER BY dim_i, dim_j
"""


def embedding_top_pc(sf_dir: str, iters: int = 600) -> np.ndarray:
    """Top principal direction of the (uncentered) Gram matrix via
    driver-side power iteration — the d x d matrix comes from the
    distributed exact ``embedding_gram`` pass; only O(d^2) numbers
    ever reach the driver. Sign-normalized so the first nonzero
    component is positive (eigenvectors are sign-ambiguous). The
    default iteration count converges to machine precision even for
    eigengap ratios ~0.95 (0.95^600 ≈ 4e-14); each step is one d x d
    matvec, so the driver cost is microseconds.
    """
    g = embedding_gram(sf_dir)
    d = int(g["dim_j"].max())
    m = np.zeros((d, d), dtype=np.float64)
    i = g["dim_i"].to_numpy() - 1
    j = g["dim_j"].to_numpy() - 1
    m[i, j] = g["gram_q"].to_numpy().astype(np.float64)
    m[j, i] = m[i, j]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        nv = m @ v
        v = nv / np.linalg.norm(nv)
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return v


def quantize_embeddings_ds(sf_dir: str) -> "ray.data.Dataset":
    """Lazy sink form of the int8 quantization: a Dataset of (vec_id,
    qembedding list<int8>, scale) ready for ``util.write_doc_output``
    — the one-time pass a real deployment runs so every later ANN
    query streams 4×-smaller vectors. The global scale rides on every
    row (constant column) so a reader needs no side channel."""
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])

    def max_abs(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        return pa.table({"a": pa.array([float(np.abs(m).max())]
                                       if m.size else [0.0])})

    scale = float(ds.map_batches(max_abs, batch_format="pyarrow")
                    .to_pandas()["a"].max())

    def quant(batch: pa.Table) -> pa.Table:
        q = _symmetric_quantize(_emb_matrix(batch), scale)
        return pa.table({
            "vec_id": batch["vec_id"],
            "qembedding": pa.array(list(q.astype(np.int8))),
            "scale": pa.array(
                np.full(batch.num_rows, scale, dtype=np.float64))})

    return ds.map_batches(quant, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# persistent IVF index — the disk-backed ANN: build once, query by
# reading ONLY the probed lists' files
# ---------------------------------------------------------------------------

def build_ivf_index(sf_dir: str, out_dir: str, *, n_lists: int = 16,
                    seed: int = 11) -> pd.DataFrame:
    """Write the embeddings hive-partitioned by IVF list (one directory
    per inverted list) plus the quantizer centroids as a sidecar table
    — the vector-space analog of the S2-prefix cell sink: a query then
    reads ONLY its probed lists' files, cost O(probed/total) of the
    corpus. Same seeded head-sample quantizer as ``ann_ivf``, so both
    paths assign identical lists. Returns the (list_id, n_vecs)
    manifest."""
    import os

    import ray

    _, sample = _load_queries(sf_dir, 2048)
    cent = _kmeans(sample, n_lists, seed=seed)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _emb_matrix(b)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norms == 0, 1.0, norms)
            lists = np.argmax(m @ self.cent.T, axis=1)
            return b.append_column(
                "list_id", pa.array(lists.astype(np.int64)))

    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    (ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 4))
       .write_parquet(out_dir, partition_cols=["list_id"]))
    dim = cent.shape[1]
    pd.DataFrame({
        "list_id": np.repeat(np.arange(n_lists, dtype=np.int64), dim),
        "dim": np.tile(np.arange(dim, dtype=np.int64), n_lists),
        "val": cent.ravel(),
    }).to_parquet(os.path.join(out_dir, "_CENTROIDS.parquet"),
                  index=False)
    man = []
    import pyarrow.parquet as pq
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("list_id="):
            continue
        n = sum(pq.read_metadata(os.path.join(out_dir, d, f)).num_rows
                for f in os.listdir(os.path.join(out_dir, d))
                if f.endswith(".parquet"))
        man.append((int(d.split("=", 1)[1]), n))
    out = pd.DataFrame(man, columns=["list_id", "n_vecs"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("list_id").reset_index(drop=True)


def ann_ivf_query(index_dir: str, sf_dir: str, *, n_queries: int = 4,
                  k: int = 10, n_probe: int = 4) -> pd.DataFrame:
    """Query the persistent IVF index: load the sidecar centroids,
    pick each query's ``n_probe`` nearest lists, and read ONLY the
    union of probed list directories; per batch one exact-cosine
    scoring against the broadcast queries with q×k partials (the same
    merge as every ANN path). Output matches ``ann_ivf`` exactly —
    same quantizer, same assignments, same tie-breaks."""
    import os

    import ray
    import ray.data

    cdf = pd.read_parquet(os.path.join(index_dir, "_CENTROIDS.parquet"))
    n_lists = int(cdf["list_id"].max()) + 1
    dim = int(cdf["dim"].max()) + 1
    cent = np.zeros((n_lists, dim))
    cent[cdf["list_id"], cdf["dim"]] = cdf["val"]
    q_ids, q = _load_queries(sf_dir, n_queries)
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    probed = np.unique(q_lists)
    files = [os.path.join(index_dir, f"list_id={lv}", f)
             for lv in probed
             for f in sorted(os.listdir(
                 os.path.join(index_dir, f"list_id={lv}")))
             if f.endswith(".parquet")]
    q_ref = ray.put((q_ids, q, (cent, q_lists)))
    ds = ray.data.read_parquet(files)
    tomb = _load_tombstones(index_dir)
    if len(tomb):
        def drop(b: pa.Table, tomb=tomb) -> pa.Table:
            ids = np.asarray(
                b["vec_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            return b.filter(pa.array(~np.isin(ids, tomb)))
        ds = ds.map_batches(drop, batch_format="pyarrow")
    partials = ds.map_batches(
        _as_task_fn(_IvfScorer, q_ref=q_ref, k=k),
        batch_format="pyarrow").to_pandas()
    return _merge_topk_partials(partials, k)


# ---------------------------------------------------------------------------
# product quantization (PQ) ANN — the 64×-compressed codebook path
# ---------------------------------------------------------------------------

PQ_M = 16         # subspaces
PQ_K = 16         # centroids per subspace (4-bit codes)
PQ_RERANK = 100   # exact-rescored shortlist size per (query, batch)


def _pq_codebooks(sample: np.ndarray, m: int = PQ_M, k: int = PQ_K,
                  seed: int = 23) -> np.ndarray:
    """(m, k, d/m) seeded per-subspace k-means codebooks trained on a
    bounded head sample (train cost independent of corpus size)."""
    d = sample.shape[1]
    sub = d // m
    books = np.empty((m, k, sub))
    rng = np.random.RandomState(seed)
    for j in range(m):
        s = sample[:, j * sub:(j + 1) * sub]
        cent = s[rng.choice(len(s), size=k, replace=False)].copy()
        for _ in range(10):
            d2 = ((s[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = s[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def _pq_encode(m_rows: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) -> (n, m) uint8 codes: nearest centroid per subspace."""
    n, d = m_rows.shape
    m, k, sub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        s = m_rows[:, j * sub:(j + 1) * sub]
        d2 = ((s[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


class _PqScorer:
    """ADC + exact re-rank (the FAISS IVFPQ+refine discipline): per
    query ONE (m × k) table of squared subvector distances; each batch
    encodes its vectors (m tiny matmuls) and scores by m table lookups
    per vector — the full-dimension dot product runs ONLY on the
    per-batch top-``rerank`` PQ shortlist, whose exact cosines feed the
    standard q×k partial merge. The PQ pass is the cheap filter; the
    rerank restores recall the 32×-compressed codes alone lose."""

    def __init__(self, q_ref, k_top: int, rerank: int = PQ_RERANK):
        import ray
        self.q_ids, self.q, self.tables, self.books = ray.get(q_ref)
        self.k_top = k_top
        self.rerank = rerank

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0, 1.0, norms)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        codes = _pq_encode(m, self.books)          # (n, m)
        qid_out, nid_out, cos_out = [], [], []
        for qi, qid in enumerate(self.q_ids):
            t = self.tables[qi]                    # (m, k)
            dist = t[np.arange(codes.shape[1])[None, :],
                     codes].sum(axis=1)            # (n,)
            mask = ids != qid
            cand_ids = ids[mask]
            short = np.lexsort((cand_ids, dist[mask]))[:self.rerank]
            if not len(short):
                continue
            cid = cand_ids[short]
            exact = m[mask][short] @ self.q[qi]
            kk = min(self.k_top, len(cid))
            part = np.lexsort((cid, -exact))[:kk]
            qid_out.extend([qid] * kk)
            nid_out.extend(cid[part].tolist())
            cos_out.extend(exact[part].tolist())
        return pa.table({"query_id": pa.array(qid_out, pa.int64()),
                         "neighbor_id": pa.array(nid_out, pa.int64()),
                         "cos": pa.array(cos_out, pa.float64())})


def ann_pq(sf_dir: str, n_queries: int = 4, k: int = 10) -> pd.DataFrame:
    """PQ ANN: 4-bit-per-subspace codes (m=16 × k=16 → 8 bytes/vector,
    a 32× compression of 64-dim float32) scored by ADC with a
    per-batch exact re-rank of the PQ shortlist. Deterministic (seeded
    codebooks); verified by a recall-vs-brute-force bound in the
    gate/tests rather than exact rank equality — the PQ filter is
    lossy by design. Output (query_id, neighbor_id, rank)."""
    import heapq

    import ray

    _, sample = _load_queries(sf_dir, 2048)
    books = _pq_codebooks(sample)
    q_ids, q = _load_queries(sf_dir, n_queries)
    m, kk, sub = books.shape
    tables = np.empty((len(q_ids), m, kk))
    for qi in range(len(q_ids)):
        for j in range(m):
            s = q[qi, j * sub:(j + 1) * sub]
            tables[qi, j] = ((books[j] - s[None, :]) ** 2).sum(axis=1)
    q_ref = ray.put((q_ids, q, tables, books))
    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _as_task_fn(_PqScorer, q_ref=q_ref, k_top=k),
        batch_format="pyarrow").to_pandas()
    rows = []
    for qid, grp in partials.groupby("query_id"):
        best = heapq.nsmallest(
            k, zip(-grp["cos"].values, grp["neighbor_id"].values))
        for rank, (_, nid) in enumerate(sorted(best), start=1):
            rows.append((int(qid), int(nid), rank))
    out = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# filtered (hybrid) ANN — vector search under a metadata predicate
# ---------------------------------------------------------------------------

def ann_topk_filtered(sf_dir: str, n_queries: int = 4,
                      k: int = 10) -> pd.DataFrame:
    """Top-k cosine neighbors RESTRICTED to the query's own label —
    the hybrid metadata-filtered vector search every retrieval stack
    needs (filter pushed INTO the scoring pass, not applied after,
    so k survivors always come back even under selective filters).
    Output (query_id, neighbor_id, rank), rank ties by neighbor_id.

    Same streaming shape as ``ann_topk``: the filter is one vectorized
    label mask per (batch, query) before the per-batch partial top-k;
    only q×k rows leave each worker."""
    import heapq

    import ray
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.ParquetFile(path).read_row_group(0,
                                               columns=["vec_id", "label"])
    q_ids, q = _load_queries(sf_dir, n_queries)
    lbl = dict(zip(head["vec_id"].to_pylist(), head["label"].to_pylist()))
    q_labels = np.array([lbl[i] for i in q_ids], dtype=np.int64)
    q_ref = ray.put((q_ids, q, q_labels))

    class FilteredTopK:
        def __init__(self):
            self.q_ids, self.q, self.q_labels = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _emb_matrix(batch)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norms == 0, 1.0, norms)
            ids = np.asarray(
                batch["vec_id"].to_numpy(zero_copy_only=False))
            labels = np.asarray(
                batch["label"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            cos = m @ self.q.T
            qo, no, co = [], [], []
            for qi, qid in enumerate(self.q_ids):
                sel = (labels == self.q_labels[qi]) & (ids != qid)
                if not sel.any():
                    continue
                cid = ids[sel]
                c = cos[sel, qi]
                kk = min(k, len(cid))
                part = np.lexsort((cid, -c))[:kk]
                qo.extend([qid] * kk)
                no.extend(cid[part].tolist())
                co.extend(c[part].tolist())
            return pa.table({"query_id": pa.array(qo, pa.int64()),
                             "neighbor_id": pa.array(no, pa.int64()),
                             "cos": pa.array(co, pa.float64())})

    ds = _read_emb(sf_dir, columns=["vec_id", "label", "embedding"])
    partials = ds.map_batches(FilteredTopK, batch_format="pyarrow",
                              concurrency=(1, 4)).to_pandas()
    rows = []
    for qid, grp in partials.groupby("query_id"):
        best = heapq.nsmallest(
            k, zip(-grp["cos"].values, grp["neighbor_id"].values))
        for rank, (_, nid) in enumerate(sorted(best), start=1):
            rows.append((int(qid), int(nid), rank))
    out = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


ANN_TOPK_FILTERED_SQL = """
WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                  embedding::DOUBLE[] AS qe
           FROM embeddings ORDER BY vec_id LIMIT 4),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
  FROM q, embeddings e
  WHERE e.vec_id != q.query_id AND e.label = q.qlabel),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


def ann_quantized_from_table(qtable_dir: str, sf_dir: str, *,
                             n_queries: int = 4,
                             k: int = 10) -> pd.DataFrame:
    """Quantized ANN served from the STORED int8 table (the deployment
    composition ``quantize_embeddings_ds`` promises): vectors never
    re-quantize — the 4×-smaller codes stream straight into the
    integer matmul. Scores are the same int64 dot products as
    ``ann_quantized``'s on-the-fly path, so BOTH satisfy the same SQL
    oracle bit-for-bit."""
    import heapq

    import pyarrow.parquet as pq
    import ray
    import ray.data

    files = sorted(os.path.join(qtable_dir, f)
                   for f in os.listdir(qtable_dir)
                   if f.endswith(".parquet"))
    scale = float(pq.read_table(files[0], columns=["scale"])
                  ["scale"][0].as_py())
    q_ids, q = _load_queries(sf_dir, n_queries)
    qq = _symmetric_quantize(q, scale)
    q_ref = ray.put((q_ids, qq))

    class TableTopK:
        def __init__(self):
            self.q_ids, self.qq = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch["qembedding"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            m = flat.astype(np.int64).reshape(len(col), -1)
            ids = np.asarray(
                batch["vec_id"].to_numpy(zero_copy_only=False))
            scores = m @ self.qq.T
            qo, no, so = [], [], []
            for qi, qid in enumerate(self.q_ids):
                mask = ids != qid
                cid = ids[mask]
                sc = scores[mask, qi]
                kk = min(k, len(cid))
                if kk == 0:
                    continue
                part = np.lexsort((cid, -sc))[:kk]
                qo.extend([qid] * kk)
                no.extend(cid[part].tolist())
                so.extend(sc[part].tolist())
            return pa.table({"query_id": pa.array(qo, pa.int64()),
                             "neighbor_id": pa.array(no, pa.int64()),
                             "score": pa.array(so, pa.int64())})

    partials = (ray.data.read_parquet(files)
                .map_batches(TableTopK, batch_format="pyarrow",
                             concurrency=(1, 4)).to_pandas())
    rows = []
    for qid, grp in partials.groupby("query_id"):
        best = heapq.nsmallest(
            k, zip(-grp["score"].values, grp["neighbor_id"].values))
        for rank, (neg, nid) in enumerate(sorted(best), start=1):
            rows.append((int(qid), int(nid), rank, int(-neg)))
    out = pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                      "rank", "score"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# persistent-IVF maintenance — upsert + tombstone delete, no rebuild
# ---------------------------------------------------------------------------

def ivf_upsert(index_dir: str, new_vecs: "ray.data.Dataset") -> int:
    """Append new vectors to the persistent IVF index WITHOUT a
    rebuild: each batch assigns against the sidecar centroids (read
    once per worker) and appends one part file per touched list dir —
    the atomic-part contract, so concurrent queries see either the old
    or the new complete parts. Because assignment is deterministic
    given the frozen quantizer, an upserted index answers queries
    IDENTICALLY to one rebuilt from the union. Returns rows added."""
    import uuid

    import pyarrow.parquet as pq
    import ray

    cdf = pd.read_parquet(os.path.join(index_dir, "_CENTROIDS.parquet"))
    n_lists = int(cdf["list_id"].max()) + 1
    dim = int(cdf["dim"].max()) + 1
    cent = np.zeros((n_lists, dim))
    cent[cdf["list_id"], cdf["dim"]] = cdf["val"]
    cent_ref = ray.put(cent)

    class Append:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _emb_matrix(b)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            mn = m / np.where(norms == 0, 1.0, norms)
            lists = np.argmax(mn @ self.cent.T, axis=1)
            n = 0
            for lv in np.unique(lists):
                sel = lists == lv
                sub = b.filter(pa.array(sel))
                d = os.path.join(index_dir, f"list_id={int(lv)}")
                os.makedirs(d, exist_ok=True)
                final = os.path.join(
                    d, f"upsert-{uuid.uuid4().hex[:12]}.parquet")
                tmp = final + ".tmp"
                pq.write_table(sub, tmp)
                os.replace(tmp, final)
                n += sub.num_rows
            return pa.table({"n": pa.array([n], pa.int64())})

    parts = new_vecs.map_batches(Append, batch_format="pyarrow",
                                 concurrency=(1, 4)).to_pandas()
    return int(parts["n"].sum())


def ivf_delete(index_dir: str, vec_ids: "np.ndarray") -> None:
    """Tombstone vectors: record ids in ``_TOMBSTONES.parquet``
    (append-merge). Queries exclude tombstoned ids with one broadcast
    ``np.isin`` per batch — deletion is O(delete set), the physical
    purge happens at the next compaction, the LSM discipline."""
    import pyarrow.parquet as pq

    path = os.path.join(index_dir, "_TOMBSTONES.parquet")
    ids = np.asarray(vec_ids, dtype=np.int64)
    if os.path.exists(path):
        old = pq.read_table(path)["vec_id"].to_numpy(
            zero_copy_only=False)
        ids = np.union1d(ids, old)
    pq.write_table(pa.table({"vec_id": pa.array(np.sort(ids))}),
                   path + ".tmp")
    os.replace(path + ".tmp", path)


def _load_tombstones(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    path = os.path.join(index_dir, "_TOMBSTONES.parquet")
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return np.asarray(pq.read_table(path)["vec_id"].to_numpy(
        zero_copy_only=False), dtype=np.int64)


def ivf_compact(index_dir: str) -> dict:
    """Physical purge: rewrite each list directory without tombstoned
    rows (one compacted part per list, atomic swap) and clear the
    tombstone file — the compaction ``ivf_delete`` defers to. Queries
    before/after return identical results (tombstones were already
    excluded logically). Returns rows kept/purged."""
    import uuid

    import pyarrow.parquet as pq

    tomb = _load_tombstones(index_dir)
    kept = purged = 0
    for d in sorted(os.listdir(index_dir)):
        if not d.startswith("list_id="):
            continue
        full = os.path.join(index_dir, d)
        files = [os.path.join(full, f) for f in sorted(os.listdir(full))
                 if f.endswith(".parquet")]
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        if len(tomb):
            ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                             dtype=np.int64)
            keep = ~np.isin(ids, tomb)
            purged += int((~keep).sum())
            t = t.filter(pa.array(keep))
        kept += t.num_rows
        final = os.path.join(full,
                             f"compact-{uuid.uuid4().hex[:12]}.parquet")
        pq.write_table(t, final + ".tmp")
        os.replace(final + ".tmp", final)
        for f in files:
            os.remove(f)
    tpath = os.path.join(index_dir, "_TOMBSTONES.parquet")
    if os.path.exists(tpath):
        os.remove(tpath)
    return {"rows_kept": kept, "rows_purged": purged}


# ---------------------------------------------------------------------------
# semantic_dedup — SemDeDup (Abbas et al. 2023, "SemDeDup: Data-
# efficient learning at web-scale through semantic deduplication"):
# k-means the embedding space, then drop within-cluster semantic
# duplicates above a cosine threshold, keeping one representative
# ---------------------------------------------------------------------------

SEMDEDUP_CLUSTERS = 8
#: cosine threshold τ as an exact rational: drop x if ∃ y with
#: y_id < x_id in the same cluster and cos(x,y) >= τ, evaluated in
#: integers as DEN·dot² >= NUM·|x|²·|y|² (with dot > 0) over the
#: int8-quantized vectors — no float ever crosses the worker/oracle
#: boundary, so the distributed pass and the sequential twin are
#: bit-identical by construction.
SEMDEDUP_TAU_NUM = 1600    # τ = 0.4 -> τ² = 0.16 in 1e4 units (the
SEMDEDUP_TAU_DEN = 10000   # synthetic near-dups live at ~0.4 cosine)


def _semdedup_drop_mask(ids: np.ndarray, q: np.ndarray,
                        block: int = 1024) -> np.ndarray:
    """Within ONE cluster (ids sorted ascending, q int64-quantized
    rows): True where a smaller-id member is τ-close. Blocked walk —
    block×cluster peak memory, never cluster² (the SemDeDup paper
    bounds cluster size by using many clusters; the block bound holds
    even when a cluster runs hot)."""
    n = len(ids)
    norms = (q * q).sum(axis=1)
    drop = np.zeros(n, dtype=bool)
    for s in range(0, n, block):
        e = min(s + block, n)
        dots = q[s:e] @ q[:e].T                      # (b, e)
        close = ((dots > 0)
                 & (SEMDEDUP_TAU_DEN * dots * dots
                    >= SEMDEDUP_TAU_NUM
                    * norms[s:e, None] * norms[None, :e]))
        lower = np.arange(s, e)[:, None] > np.arange(e)[None, :]
        drop[s:e] |= (close & lower).any(axis=1)
    return drop


def semantic_dedup(sf_dir: str,
                   n_clusters: int = SEMDEDUP_CLUSTERS) -> pd.DataFrame:
    """SemDeDup survivors: (vec_id, cluster) of every embedding NOT
    dominated by a τ-close smaller-id member of its k-means cluster,
    ordered by vec_id.

    Shape: the quantizer trains driver-side on a bounded head sample
    (cost independent of corpus size); ONE streamed pass quantizes
    each batch (int8 symmetric, corpus-global scale from a max-|v|
    pre-pass) and assigns clusters by INTEGER centroid dot (the
    centroids are themselves int16-quantized, so assignment has no
    float tie ambiguity); the within-cluster pair walk runs in one
    ``groupby(cluster)`` over n_clusters groups with blocked —
    never cluster² — memory. Only (cluster, vec_id, qvec) rows
    shuffle: at web scale SemDeDup picks n_clusters so clusters are
    worker-sized (the paper uses ~10⁵ clusters for LAION-scale)."""
    import ray
    from ray.data.aggregate import Max

    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])

    def absmax(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        return pa.table({"mx": pa.array(
            [float(np.abs(m).max()) if len(m) else 0.0])})

    scale = float(ds.map_batches(absmax, batch_format="pyarrow")
                  .aggregate(Max("mx"))["max(mx)"])
    _, sample = _load_queries(sf_dir, 2048)
    cent = _kmeans(sample, n_clusters)
    cent_q = _symmetric_quantize(cent, float(np.abs(cent).max()))
    bc = ray.put((scale, cent_q))

    def assign(b: pa.Table) -> pa.Table:
        sc, cq = ray.get(bc)
        m = _symmetric_quantize(_emb_matrix(b), sc)
        cl = np.argmax(m @ cq.T, axis=1).astype(np.int64)  # int dots
        return pa.table({
            "cluster": pa.array(cl),
            "vec_id": b["vec_id"],
            "qvec": pa.array(list(m.astype(np.int64)))})

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cl, gc in g.groupby("cluster", sort=False):
            gc = gc.sort_values("vec_id")
            ids = gc["vec_id"].to_numpy(dtype=np.int64)
            q = np.stack(gc["qvec"].to_numpy()).astype(np.int64)
            keep = ~_semdedup_drop_mask(ids, q)
            out.append(pd.DataFrame({"vec_id": ids[keep],
                                     "cluster": int(cl)}))
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                   "cluster": pd.Series([], dtype=np.int64)}))

    out = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby("cluster")
             .map_groups(dedup_cluster, batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def semantic_dedup_twin(sf_dir: str,
                        n_clusters: int = SEMDEDUP_CLUSTERS
                        ) -> pd.DataFrame:
    """Sequential numpy SemDeDup with the identical integer rule —
    the self-verification oracle (k-means isn't SQL-expressible):
    every arithmetic step is int64, so equality with the distributed
    pass is exact, not approximate."""
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64)
    scale = float(np.abs(m).max())
    _, sample = _load_queries(sf_dir, 2048)
    cent = _kmeans(sample, n_clusters)
    cent_q = _symmetric_quantize(cent, float(np.abs(cent).max()))
    q = _symmetric_quantize(m, scale)
    cl = np.argmax(q @ cent_q.T, axis=1).astype(np.int64)
    rows = []
    for c in np.unique(cl):
        sel = cl == c
        cids = ids[sel]
        order = np.argsort(cids)
        cids, cq = cids[order], q[sel][order]
        keep = ~_semdedup_drop_mask(cids, cq)
        rows.append(pd.DataFrame({"vec_id": cids[keep],
                                  "cluster": int(c)}))
    out = pd.concat(rows, ignore_index=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# kmeans_clusters — FULL Lloyd iterations to convergence, all-integer:
# the iterative-training loop on Ray Data (assignment = one streamed
# int matmul per iteration; update = k×d int64 partials), bit-exact vs
# the sequential textbook loop because no float ever enters the state
# ---------------------------------------------------------------------------

KMEANS_K = 8
#: generous: integer Lloyd converges in ~20-30 iterations on the test
#: corpora (26 at sf0.01), and integer floor-division updates can in
#: principle 2-cycle instead of converging — the cap bounds that; the
#: distributed/sequential EQUALITY holds at any cap
KMEANS_MAX_ITERS = 80


def kmeans_clusters(sf_dir: str, k: int = KMEANS_K,
                    max_iters: int = KMEANS_MAX_ITERS) -> pd.DataFrame:
    """Lloyd k-means run to CONVERGENCE over int8-quantized embeddings.

    Determinism contract (the SemDeDup lesson, CLAUDE.md): quantize
    int8 first; assignment argmin uses the integer score |c|² − 2c·x
    (ties → smallest cluster index, numpy first-min on both sides);
    the update is integer floor division Σx // n; convergence is
    integer centroid equality. Every quantity is int64, so the
    distributed loop and the sequential oracle agree bit-for-bit — a
    float Lloyd could not cross that boundary.

    Ray shape per iteration: centroids broadcast via ray.put; each
    batch emits k rows of (cluster, n, Σvec) partials (k×d ints);
    the driver folds them and tests convergence. The corpus streams
    once per iteration; nothing vector-sized ever reaches the driver.
    Returns (cluster, n_members, centroid_l1, n_iters, converged).
    """
    import ray

    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])

    def max_abs(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        return pa.table({"a": pa.array([float(np.abs(m).max())]
                                       if len(m) else [0.0])})

    scale = float(ds.map_batches(max_abs, batch_format="pyarrow")
                  .to_pandas()["a"].max())

    seed = (ds.sort("vec_id").limit(k).to_pandas())
    C = _symmetric_quantize(
        np.stack([np.asarray(v, dtype=np.float64)
                  for v in seed["embedding"]]), scale)
    d = C.shape[1]

    n_iter, converged = 0, False
    for n_iter in range(1, max_iters + 1):
        bc = ray.put((C, scale))

        def step(batch: pa.Table, _bc=bc) -> pa.Table:
            import ray as _ray
            C, scale = _ray.get(_bc)
            x = _symmetric_quantize(_emb_matrix(batch), scale)
            cc = (C * C).sum(axis=1)                     # (k,)
            score = cc[None, :] - 2 * (x @ C.T)          # (n, k) int64
            a = np.argmin(score, axis=1)                 # first min
            rows_c, rows_n, rows_s = [], [], []
            for c in range(len(C)):
                sel = x[a == c]
                if not len(sel):
                    continue
                rows_c.append(c)
                rows_n.append(len(sel))
                rows_s.append(sel.sum(axis=0).astype(np.int64))
            return pa.table({
                "c": pa.array(np.asarray(rows_c, np.int64)),
                "n": pa.array(np.asarray(rows_n, np.int64)),
                "s": pa.array(list(np.asarray(rows_s, np.int64))
                              if rows_s else [],
                              pa.list_(pa.int64(), d)),
            })

        parts = (ds.map_batches(step, batch_format="pyarrow")
                 .to_pandas())
        newC = C.copy()
        counts = np.zeros(len(C), dtype=np.int64)
        for c in range(len(C)):
            sub = parts[parts["c"] == c]
            if not len(sub):
                continue   # empty cluster keeps its centroid
            n = int(sub["n"].sum())
            s = np.sum(np.stack([np.asarray(v, dtype=np.int64)
                                 for v in sub["s"]]), axis=0)
            counts[c] = n
            newC[c] = s // n
        if (newC == C).all():
            converged = True
            break
        C = newC

    out = pd.DataFrame({
        "cluster": np.arange(len(C), dtype=np.int64),
        "n_members": counts,
        "centroid_l1": np.abs(C).sum(axis=1).astype(np.int64),
        "n_iters": np.full(len(C), n_iter, dtype=np.int64),
        "converged": np.full(len(C), int(converged), dtype=np.int64),
    })
    return out


def kmeans_oracle_sequential(sf_dir: str, k: int = KMEANS_K,
                             max_iters: int = KMEANS_MAX_ITERS
                             ) -> pd.DataFrame:
    """Textbook sequential Lloyd on the collected quantized matrix —
    distances computed DIRECTLY as Σ(x−c)² (a different formula whose
    integer argmin provably matches the |c|²−2c·x score used by the
    distributed loop), same floor-division update, same convergence
    rule."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    M = np.stack([np.asarray(v, dtype=np.float64)
                  for v in df["embedding"]])
    scale = float(np.abs(M).max())
    X = _symmetric_quantize(M, scale)
    C = X[:k].copy()
    n_iter, converged = 0, False
    counts = np.zeros(k, dtype=np.int64)
    for n_iter in range(1, max_iters + 1):
        dist = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)
        newC = C.copy()
        counts = np.zeros(k, dtype=np.int64)
        for c in range(k):
            sel = X[a == c]
            if len(sel):
                counts[c] = len(sel)
                newC[c] = sel.sum(axis=0) // len(sel)
        if (newC == C).all():
            converged = True
            break
        C = newC
    return pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n_members": counts,
        "centroid_l1": np.abs(C).sum(axis=1).astype(np.int64),
        "n_iters": np.full(k, n_iter, dtype=np.int64),
        "converged": np.full(k, int(converged), dtype=np.int64),
    })


# ---------------------------------------------------------------------------
# hybrid search: reciprocal-rank fusion of BM25 and ANN rankings
# (Cormack/Clarke/Buettcher 2009 RRF — the standard hybrid-retrieval
# combiner; integer-scaled so fusion is bit-exact across engines)
# ---------------------------------------------------------------------------

RRF_K = 60             # the canonical RRF damping constant
RRF_SCALE = 1 << 20    # integer reciprocal units: SCALE // (K + rank)


def rrf_fusion_topk(sf_dir: str, n_queries: int = 4, k_each: int = 20,
                    k: int = 10, rrf_k: int = RRF_K) -> pd.DataFrame:
    """Hybrid retrieval: fuse the ANN cosine ranking (per query vector)
    with the BM25 lexical ranking (the corpus-wide term query) by
    reciprocal-rank fusion — fused(d) = Σ_systems SCALE // (K + rank),
    0 when a system did not return d; top-``k`` per query by
    (fused DESC, doc_id).  All-integer, so the DuckDB oracle (the two
    rankers' CTEs merged + the same floor divisions) is bit-equal.

    Scale shape: a pure composition — the two rankers are the existing
    distributed pipelines (each already oracle-green); fusion sees only
    their k_each-sized result lists per query, so the driver-side merge
    is O(n_queries * k_each) regardless of corpus size."""
    from .corpus import BM25_TERM, bm25_topk

    ann = ann_topk(sf_dir, n_queries=n_queries, k=k_each)
    bm = bm25_topk(sf_dir, term=BM25_TERM, k=k_each)
    bm_rank = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}

    rows = []
    for qid, grp in ann.groupby("query_id"):
        ann_rank = {int(d): int(r)
                    for d, r in zip(grp["neighbor_id"], grp["rank"])}
        fused = []
        for d in set(ann_rank) | set(bm_rank):
            s = 0
            if d in ann_rank:
                s += RRF_SCALE // (rrf_k + ann_rank[d])
            if d in bm_rank:
                s += RRF_SCALE // (rrf_k + bm_rank[d])
            fused.append((-s, d))
        fused.sort()
        for rank, (negs, d) in enumerate(fused[:k], start=1):
            rows.append((int(qid), d, -negs, rank))
    out = pd.DataFrame(rows,
                       columns=["query_id", "doc_id", "fused", "rank"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["query_id", "rank"])
            .reset_index(drop=True))


def _rrf_sql(n_queries: int = 4, k_each: int = 20, k: int = 10,
             rrf_k: int = RRF_K, s: int = RRF_SCALE) -> str:
    from .corpus import BM25_TERM, _BM25_SCALE
    term, bs = BM25_TERM, _BM25_SCALE
    return f"""
WITH g AS (SELECT COUNT(*)::HUGEINT AS d,
                  SUM(len(string_split(text, ' ')))::HUGEINT AS t
           FROM documents),
m AS (SELECT doc_id, len(string_split(text, ' '))::HUGEINT AS dl,
             len(list_filter(string_split(text, ' '),
                             x -> x = '{term}'))::HUGEINT AS tf
      FROM documents),
f AS (SELECT * FROM m WHERE tf > 0),
dfc AS (SELECT COUNT(*)::HUGEINT AS df FROM f),
bmk AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY (((d * {bs}) // df) * 22 * t * tf * {bs})
                    // (10 * t * tf + 3 * t + 9 * dl * d) DESC,
                    doc_id) AS r
  FROM f, g, dfc QUALIFY r <= {k_each}),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
  FROM q, embeddings e WHERE e.vec_id != q.query_id),
annk AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, doc_id) AS r
  FROM scored QUALIFY r <= {k_each}),
cand AS (
  SELECT query_id, doc_id FROM annk
  UNION
  SELECT q.query_id, bmk.doc_id FROM q, bmk),
fused AS (
  SELECT c.query_id, c.doc_id,
         (COALESCE({s} // ({rrf_k} + a.r), 0)
          + COALESCE({s} // ({rrf_k} + b.r), 0))::BIGINT AS fused
  FROM cand c
  LEFT JOIN annk a ON a.query_id = c.query_id AND a.doc_id = c.doc_id
  LEFT JOIN bmk b ON b.doc_id = c.doc_id)
SELECT query_id, doc_id, fused,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY fused DESC, doc_id)::BIGINT AS rank
FROM fused QUALIFY rank <= {k} ORDER BY query_id, rank
"""


RRF_FUSION_SQL = _rrf_sql()


# ---------------------------------------------------------------------------
# MMR diversified retrieval
# ---------------------------------------------------------------------------

#: MMR defaults: candidate pool per query, picks, lambda = 1/2 (equal
#: relevance/diversity weight keeps the greedy score pure integer:
#: mmr(d) = rel(d) - max sim(d, selected))
MMR_QUERIES, MMR_POOL, MMR_K = 2, 16, 4


def mmr_diversified_topk(sf_dir: str, n_queries: int = MMR_QUERIES,
                         pool: int = MMR_POOL,
                         k: int = MMR_K) -> pd.DataFrame:
    """Maximal-marginal-relevance retrieval (Carbonell & Goldstein
    1998): greedy top-k that trades relevance against similarity to
    the already-selected set — the standard diversified-search /
    dedup-at-serving-time operator. λ = 1/2, so every score is the
    EXACT integer mmr(d) = rel(d) − max_{s∈S} sim(d, s) over the
    symmetric int8-quantized dots of ``ann_quantized`` (ties toward
    the smaller vec_id), and the generated DuckDB oracle — the same
    greedy unrolled into k chained CTE steps — is bit-equal.

    Scale shape: candidate pools come from the streamed quantized
    scorer (per-batch q×pool partials); only pool×d vectors are ever
    fetched back (a point lookup — the minhash-index footer-pruning
    discipline applies to a real deployment); the greedy runs on the
    driver over pool² integer dots per query."""
    import ray

    ds = _read_emb(sf_dir, columns=["vec_id", "embedding"])

    def max_abs(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        return pa.table({"a": pa.array([float(np.abs(m).max())]
                                       if m.size else [0.0])})

    scale = float(ds.map_batches(max_abs, batch_format="pyarrow")
                    .to_pandas()["a"].max())
    q_ids, q = _load_queries(sf_dir, n_queries)
    qq = _symmetric_quantize(q, scale)
    q_ref = ray.put((q_ids, qq, scale))
    partials = ds.map_batches(
        _as_task_fn(_QuantTopK, q_ref=q_ref, k=pool),
        batch_format="pyarrow").to_pandas()

    pools: dict[int, list[tuple[int, int]]] = {}
    for qid, grp in partials.groupby("query_id"):
        best = heapq.nsmallest(
            pool, zip(-grp["score"].values, grp["neighbor_id"].values))
        pools[int(qid)] = [(int(-ns), int(vid)) for ns, vid in best]

    # fetch + quantize the union of pool vectors (point lookup)
    want = sorted({vid for rows in pools.values() for _s, vid in rows})
    import pyarrow.parquet as pq_
    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = (pq_.read_table(path, columns=["vec_id", "embedding"])
           if not os.path.isdir(path) else None)
    if tbl is None:
        parts = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".parquet"))
        tbl = pa.concat_tables(pq_.read_table(p) for p in parts)
    keep = np.isin(tbl["vec_id"].to_numpy(), np.asarray(want))
    tbl = tbl.filter(pa.array(keep))
    vid_arr = tbl["vec_id"].to_numpy()
    vm = _symmetric_quantize(_emb_matrix(tbl), scale)
    vindex = {int(v): i for i, v in enumerate(vid_arr)}

    rows = []
    for qi, qid in enumerate(q_ids):
        cand = pools[int(qid)]
        ids = np.asarray([v for _s, v in cand], dtype=np.int64)
        rel = np.asarray([s for s, _v in cand], dtype=np.int64)
        V = vm[[vindex[int(v)] for v in ids]]
        pair = V @ V.T  # integer pool x pool dots
        chosen: list[int] = []
        avail = np.ones(len(ids), dtype=bool)
        for rank in range(1, min(k, len(ids)) + 1):
            if chosen:
                penalty = pair[:, chosen].max(axis=1)
            else:
                penalty = np.zeros(len(ids), dtype=np.int64)
            mmr = rel - penalty
            # argmax by (mmr desc, vec_id asc) over available
            key = np.where(avail, mmr, np.int64(-1) << 62)
            best_mmr = key.max()
            tie = np.flatnonzero(avail & (mmr == best_mmr))
            pick = tie[np.argmin(ids[tie])]
            rows.append((int(qid), rank, int(ids[pick]),
                         int(mmr[pick])))
            chosen.append(int(pick))
            avail[pick] = False
    out = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id",
                                      "mmr_score"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["query_id", "rank"])
            .reset_index(drop=True))


def _mmr_sql(n_queries: int = MMR_QUERIES, pool: int = MMR_POOL,
             k: int = MMR_K) -> str:
    """Generated oracle: the greedy unrolled into k chained CTE steps
    over the same integer quantized dots."""
    steps = []
    sels = ["sel1"]
    for i in range(2, k + 1):
        union = " UNION ALL ".join(f"SELECT * FROM {s}" for s in sels)
        steps.append(f"""
cand{i} AS (
  SELECT p.qid, p.vec_id, p.rel,
         p.rel - MAX(pd.d) AS mmr
  FROM pool p
  JOIN ({union}) s ON s.qid = p.qid
  JOIN pdot pd ON pd.qid = p.qid AND pd.a = p.vec_id
              AND pd.b = s.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM ({union}) x
                         WHERE x.qid = p.qid)
  GROUP BY p.qid, p.vec_id, p.rel),
sel{i} AS (
  SELECT qid, vec_id, rel, {i} AS rank, mmr FROM (
    SELECT qid, vec_id, rel, mmr,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY mmr DESC, vec_id) AS rn
    FROM cand{i}) WHERE rn = 1)""")
        sels.append(f"sel{i}")
    final = " UNION ALL ".join(f"SELECT * FROM {s}" for s in sels)
    return f"""
WITH scale AS (
  SELECT MAX(list_max(list_transform(embedding, x -> abs(x)))) AS s
  FROM embeddings),
qv AS (
  SELECT vec_id AS qid,
         list_transform(embedding,
           x -> ROUND(x * 127 / sc.s)) AS ql
  FROM embeddings, scale sc ORDER BY vec_id LIMIT {n_queries}),
cv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> ROUND(x * 127 / sc.s)) AS cl
  FROM embeddings, scale sc),
rel AS (
  SELECT qid, vec_id,
         CAST(list_dot_product(ql, cl) AS BIGINT) AS rel
  FROM qv CROSS JOIN cv WHERE vec_id <> qid),
pool AS (
  SELECT qid, vec_id, rel FROM (
    SELECT qid, vec_id, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, vec_id) AS rn
    FROM rel) WHERE rn <= {pool}),
pdot AS (
  SELECT p1.qid, p1.vec_id AS a, p2.vec_id AS b,
         CAST(list_dot_product(c1.cl, c2.cl) AS BIGINT) AS d
  FROM pool p1
  JOIN pool p2 ON p1.qid = p2.qid AND p1.vec_id <> p2.vec_id
  JOIN cv c1 ON c1.vec_id = p1.vec_id
  JOIN cv c2 ON c2.vec_id = p2.vec_id),
sel1 AS (
  SELECT qid, vec_id, rel, 1 AS rank, rel AS mmr FROM (
    SELECT qid, vec_id, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, vec_id) AS rn
    FROM pool) WHERE rn = 1),{",".join(steps)}
SELECT qid AS query_id, rank::BIGINT AS rank, vec_id,
       mmr::BIGINT AS mmr_score
FROM ({final}) ORDER BY query_id, rank
"""


MMR_TOPK_SQL = _mmr_sql()

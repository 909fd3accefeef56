"""Deduplication operators over the ``documents`` table.

The full dedup family a training-data pipeline needs, each expressed
Ray-Data-first:

* ``exact_dedup``         — hash-partition on content, keep first
                            (min doc_id) per identical text.
* ``minhash_lsh_dedup``   — shingle → minhash → band buckets →
                            ``groupby(bucket)`` → candidate pairs →
                            keep-first survivors.
* ``simhash_dedup``       — 64-bit simhash over token hashes; docs
                            whose simhash matches in all but <=k bits
                            within a band bucket are near-dups.
* ``ngram_jaccard_dedup`` — exact 3-gram Jaccard on LSH candidates
                            (verification pass after minhash).
* ``jaccard_pairs``       — character-set Jaccard all-pairs above a
                            threshold (semantics exactly DuckDB's
                            ``jaccard()`` so the oracle is pure SQL).

Scale notes (100 TB): exact dedup shuffles only (hash, doc_id) pairs —
64-bit content hashes computed per batch, never the text; minhash/LSH
shuffles (band_key, doc_id) which is O(docs × bands × 8B); the
all-pairs ``jaccard_pairs`` is the *small-data verifier* — at scale
the LSH bucket groupby bounds candidate pairs per bucket. Hot buckets
(boilerplate shingles) are the skew risk: oversized buckets walk ALL
their pairs in bounded-memory blocks (``_iter_bucket_blocks``), so no
candidates are lost; only the pathological ``_FALLBACK_MAX_BUCKET``
guard truncates, loudly (no silent skew stall).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

# stable 64-bit content hash (first 8 bytes of md5; python hash() is
# salted per process and useless across workers)


def _h64(s: str) -> int:
    return struct.unpack("<q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


def _h64u(s: str) -> int:
    """Unsigned 64-bit variant for uint64 numpy pipelines: np.uint64()
    of a negative python int warns on numpy 1.26 and raises on
    numpy >= 2, so token-hash caches must use this form."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


#: cap for per-process token-hash caches: long-lived actors on real
#: corpora have unbounded vocab; when the cap is hit the cache is
#: dropped wholesale (hash values are recomputable, correctness is
#: unaffected — this only bounds memory).
_TOKEN_CACHE_CAP = 1 << 20


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _content_hash_batch(batch: pa.Table) -> pa.Table:
    hashes = np.fromiter((_h64(t) for t in batch["text"].to_pylist()),
                         dtype=np.int64, count=batch.num_rows)
    return pa.table({"doc_id": batch["doc_id"],
                     "content_hash": pa.array(hashes)})


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Survivor per distinct text: min doc_id, with dup count.

    The shuffle key is the 64-bit content hash (not the text) — at
    100 TB only 16 bytes/doc cross the wire. Collisions are a 2^-64
    non-issue for grouping correctness at any realistic doc count.
    """
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    agg = (ds.map_batches(_content_hash_batch, batch_format="pyarrow")
             .groupby("content_hash")
             .aggregate(Min("doc_id", alias_name="doc_id"),
                        Count(alias_name="dup_cnt")))
    out = agg.to_pandas()[["doc_id", "dup_cnt"]]
    return out.sort_values("doc_id").reset_index(drop=True)


EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
FROM documents GROUP BY text ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Minhash sign stage: the permutation coefficients are drawn
    ONCE per worker in __init__ from a fixed seed (identical across
    actors — a broadcast-free broadcast), batches are signed in
    __call__. num_perm=64, bands=16, rows_per_band=4 by default."""

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 shingle_k: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = shingle_k

    _token_cache: dict[str, int] = {}

    def _shingles(self, text: str) -> np.ndarray:
        """Unique k-shingle hashes. Tokens are md5-hashed once each
        (per-actor cache — real corpora have vocab ≪ token stream);
        shingle hash = vectorized mix of the k token hashes, so the
        per-shingle cost is numpy, not hashlib."""
        toks = text.split()
        if len(toks) < self.k:
            toks = toks + [""] * (self.k - len(toks))
        cache = MinHasher._token_cache
        if len(cache) > _TOKEN_CACHE_CAP:
            cache.clear()
        th = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = np.uint64(_h64u(t))
                cache[t] = h
            th[i] = h
        n_sh = len(toks) - self.k + 1
        with np.errstate(over="ignore"):
            acc = np.zeros(n_sh, dtype=np.uint64)
            mult = np.uint64(0x100000001B3)  # FNV prime as positional mixer
            for j in range(self.k):
                acc = (acc ^ th[j:j + n_sh]) * mult
        return np.unique(acc)

    def signature(self, text: str) -> np.ndarray:
        sh = self._shingles(text)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal-hash matrix, min per row
            hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)

    _FNV_OFF = np.uint64(0xCBF29CE484222325)
    _FNV = np.uint64(0x100000001B3)
    _BAND_SALT = np.uint64(0x9E3779B97F4A7C15)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit one row per (doc, band): (band_key, doc_id).
        band_key = 64-bit FNV mix of (band rows, band_idx) — the LSH
        bucket. Fully vectorized: ONE universal-hash pass over the
        batch's concatenated shingles with a segmented min
        (minimum.reduceat) instead of a per-doc matmul, and the band
        keys mix down the (docs, bands, rows) cube in ``rows`` numpy
        ops instead of per-band string-join + md5 (the old per-doc
        loop was the dedup pipeline's dominant stage). Key semantics
        are unchanged for the oracle — candidate pairs join on band
        CONTENT equality, and any 64-bit key has the same vanishing
        cross-content collision odds as the md5 it replaces."""
        texts = batch["text"].to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], batch["doc_id"].type)})
        shingle_arrays = [self._shingles(t) for t in texts]
        counts = np.fromiter((len(s) for s in shingle_arrays),
                             dtype=np.int64, count=n)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        all_sh = (np.concatenate(shingle_arrays) if n > 1
                  else shingle_arrays[0])
        with np.errstate(over="ignore"):
            hv = (self.a[:, None] * all_sh[None, :]
                  + self.b[:, None]) % _MERSENNE
            sigs = np.minimum.reduceat(hv, starts, axis=1)  # (perm, n)
            cube = np.ascontiguousarray(sigs.T).reshape(
                n, self.bands, self.rows)
            acc = np.full((n, self.bands), self._FNV_OFF, np.uint64)
            for j in range(self.rows):
                acc = (acc ^ cube[:, :, j]) * self._FNV
            acc = acc ^ (np.arange(self.bands, dtype=np.uint64)
                         * self._BAND_SALT)
        band_keys = acc.reshape(-1).view(np.int64)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.bands))
        return pa.table({"band_key": pa.array(band_keys),
                         "doc_id": pc.take(batch["doc_id"], idx)})


_MAX_BUCKET = 256  # block edge for bounded-memory bucket pair generation


def _n_coarse() -> int:
    """Cluster-aware coarse-fold width for the bucket shuffle — see
    ``datapipe.util.coarse_fold_width`` (64 on this box, grows with
    cluster CPUs; the emitted pair SET is width-invariant because
    pairs are generated per real band bucket inside each partition)."""
    from .util import coarse_fold_width
    return coarse_fold_width()

#: absolute guard for adversarial boilerplate: a bucket beyond this is
#: truncated (with a warning) — ~33 M pairs. Below it, oversized
#: buckets are processed COMPLETELY in _MAX_BUCKET-edged blocks, so
#: the cap is a pathological-input fallback, not the mechanism.
_FALLBACK_MAX_BUCKET = 8192


def _iter_bucket_blocks(n: int, block: int = _MAX_BUCKET):
    """Tile the upper triangle of an n x n pair matrix into square
    blocks of edge <= ``block``: yields (r0, r1, c0, c1) with
    c0 >= r0. Every i<j pair of range(n) appears in exactly one block
    (diagonal blocks carry their own triangle), so a consumer that
    walks the blocks emits ALL pairs with peak memory block^2 instead
    of n^2 — hot LSH buckets lose no candidates."""
    for r0 in range(0, n, block):
        r1 = min(r0 + block, n)
        for c0 in range(r0, n, block):
            yield r0, r1, c0, min(c0 + block, n)


def _block_pair_indices(r0: int, r1: int, c0: int,
                        c1: int) -> tuple[np.ndarray, np.ndarray]:
    """Global (i, j) index arrays for one block from
    ``_iter_bucket_blocks`` (triangle on the diagonal, full cross
    product off it)."""
    if c0 == r0:
        iu, ju = np.triu_indices(r1 - r0, k=1)
        return iu + r0, ju + r0
    ii = np.repeat(np.arange(r0, r1), c1 - c0)
    jj = np.tile(np.arange(c0, c1), r1 - r0)
    return ii, jj


def _add_coarse_part(batch: pa.Table) -> pa.Table:
    """Coarse shuffle key: LSH bucket count is O(docs × bands), far too
    many for one map_groups group each (measured 76k groups = pure
    per-group overhead). Buckets are hash-folded into ``_n_coarse()``
    partitions; pair generation then runs vectorized per partition."""
    part = (np.asarray(batch["band_key"].to_numpy(zero_copy_only=False))
            .astype(np.uint64) % np.uint64(_n_coarse())).astype(np.int32)
    return batch.append_column("part", pa.array(part))


def _partition_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs over the group's buckets, fully vectorized:
    one lexsort dedups (band_key, doc_id) and sorts each bucket's ids
    ascending; buckets are then processed per SIZE CLASS — all buckets
    of size s emit their s·(s−1)/2 pairs in one reshape +
    ``triu_indices`` (the old per-bucket python groupby loop was the
    driver-fold bottleneck: 4.3 s → <0.2 s on 80k signed rows). The
    emitted pair SET is unchanged: per bucket, all i<j pairs of the
    sorted distinct ids, doc_lo < doc_hi by construction. Oversized
    buckets (> _MAX_BUCKET) keep the blocked walk (complete coverage,
    bounded memory); only beyond the pathological _FALLBACK_MAX_BUCKET
    guard are docs dropped, and loudly."""
    import logging
    bk = np.asarray(group["band_key"].to_numpy())
    ids = np.asarray(group["doc_id"].to_numpy())
    order = np.lexsort((ids, bk))
    bk_s, id_s = bk[order], ids[order]
    keep = np.ones(len(bk_s), dtype=bool)
    keep[1:] = (bk_s[1:] != bk_s[:-1]) | (id_s[1:] != id_s[:-1])
    bk_s, id_s = bk_s[keep], id_s[keep]
    starts = np.flatnonzero(np.r_[True, bk_s[1:] != bk_s[:-1]]) \
        if len(bk_s) else np.array([], dtype=np.int64)
    counts = np.diff(np.r_[starts, len(bk_s)]) if len(starts) \
        else np.array([], dtype=np.int64)
    lo, hi = [], []
    for s in np.unique(counts):
        if s < 2:
            continue
        sel = starts[counts == s]
        if s > _MAX_BUCKET:
            for st in sel:
                a = id_s[st:st + s]
                if s > _FALLBACK_MAX_BUCKET:
                    logging.warning(
                        "dedup: pathological LSH bucket %s truncated "
                        "%d -> %d docs (potential near-dups dropped)",
                        bk_s[st], s, _FALLBACK_MAX_BUCKET)
                    a = a[:_FALLBACK_MAX_BUCKET]
                for r0, r1, c0, c1 in _iter_bucket_blocks(len(a)):
                    iu, ju = _block_pair_indices(r0, r1, c0, c1)
                    lo.append(a[iu])
                    hi.append(a[ju])
            continue
        mat = id_s[sel[:, None] + np.arange(s)[None, :]]
        iu, ju = np.triu_indices(s, k=1)
        lo.append(mat[:, iu].ravel())
        hi.append(mat[:, ju].ravel())
    if not lo:
        return pd.DataFrame({"doc_lo": pd.Series([], dtype=group["doc_id"].dtype),
                             "doc_hi": pd.Series([], dtype=group["doc_id"].dtype)})
    return pd.DataFrame({"doc_lo": np.concatenate(lo),
                         "doc_hi": np.concatenate(hi)})


#: process-global signer: MinHasher's only state (seeded coefficients,
#: token cache) is cheap and identical everywhere, so the sign stage
#: runs as TASKS in Ray's reusable worker processes — one lazy build
#: per worker, no actor-pool spin-up (measured ~1s saved per run).
#: Heavy per-actor state (MediaStore, PolygonIndex) stays on actor
#: pools; this shortcut is only for broadcast-free-broadcast stages.
_SIGNER: "MinHasher | None" = None
_SIGNER_KEY: tuple | None = None


def _sign_batch(batch: pa.Table, *, num_perm: int = 64,
                bands: int = 16) -> pa.Table:
    global _SIGNER, _SIGNER_KEY
    if _SIGNER_KEY != (num_perm, bands):
        _SIGNER = MinHasher(num_perm=num_perm, bands=bands)
        _SIGNER_KEY = (num_perm, bands)
    return _add_coarse_part(_SIGNER(batch))


#: below this many signed rows (docs × bands, ~16 B each) the bucket
#: fold runs on the driver over the pulled (band_key, doc_id) table —
#: the distributed sort-groupby has a ~2.3 s warm fixed floor that
#: dwarfs a tens-of-MB pandas fold. Same size-adaptive pattern as the
#: zonal partials combine; the pair SET is identical (the driver path
#: calls the same _partition_pairs kernel, which groups by the real
#: band_key internally).
_PAIRGEN_DRIVER_MAX_SIGROWS = 2_000_000


def _minhash_raw_pairs(sf_dir: str, *, num_perm: int = 64,
                       bands: int = 16) -> ray.data.Dataset:
    """Candidate pairs straight out of the coarse-partition bucket fold
    (may contain dupes when two docs collide in several bands)."""
    import functools

    import pyarrow.parquet as _pq

    from .util import shuffle_width
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    sigs = ds.map_batches(
        functools.partial(_sign_batch, num_perm=num_perm, bands=bands),
        batch_format="pyarrow")
    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    if n_docs * bands <= _PAIRGEN_DRIVER_MAX_SIGROWS:
        pairs = _partition_pairs(sigs.to_pandas())
        return ray.data.from_pandas(pairs)
    # tiny rows; fewer blocks -> cheaper sort (width scales with input)
    return (sigs.repartition(shuffle_width(ds))
                .groupby("part")
                .map_groups(_partition_pairs, batch_format="pandas"))


def minhash_candidates_ds(sf_dir: str, *, num_perm: int = 64,
                          bands: int = 16) -> ray.data.Dataset:
    """Lazy Dataset of DISTINCT candidate near-dup pairs from LSH band
    buckets (distinct via a (doc_lo, doc_hi) groupby — dedupe stays
    distributed; consumers that tolerate dupes, like connected
    components, use the raw pairs and skip this shuffle)."""
    pairs = _minhash_raw_pairs(sf_dir, num_perm=num_perm, bands=bands)
    distinct = (pairs.groupby(["doc_lo", "doc_hi"])
                     .aggregate(Count(alias_name="_n")))
    return distinct.drop_columns(["_n"])


def minhash_candidates(sf_dir: str, *, num_perm: int = 64,
                       bands: int = 16) -> pd.DataFrame:
    """Driver-side frame of the distinct candidate pairs (small output:
    this is the *result* of LSH, bounded by bucket caps)."""
    pdf = minhash_candidates_ds(sf_dir, num_perm=num_perm,
                                bands=bands).to_pandas()
    return pdf.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)


#: pair-count threshold for driver-side union-find vs the distributed
#: min-label connected components (the pair list is LSH *output*,
#: bounded by bucket caps; 2M pairs ≈ 32 MB on the driver)
_CC_DRIVER_MAX_PAIRS = 2_000_000


def _union_find_roots(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over the pair list only (NOT the corpus): returns
    node -> component-min root for every node appearing in a pair."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes: set = set()
    for a, b in zip(pairs["doc_lo"], pairs["doc_hi"]):
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {int(n): int(find(n)) for n in nodes}


def connected_components(pairs: ray.data.Dataset,
                         max_iters: int = 25) -> ray.data.Dataset:
    """Distributed connected components over an undirected edge list
    (doc_lo, doc_hi) by iterative min-label propagation: label(x)
    starts at min(x, neighbors(x)) and each round takes the min of its
    neighbors' labels; labels are monotone non-increasing and the
    fixpoint label is the component minimum. Rounds needed = graph
    diameter — LSH bucket components are near-cliques, so typically
    1-2 rounds. Each round is one small join + groupby over the PAIR
    NODES only (never the corpus); labels are materialized per round
    so lineage doesn't re-execute.

    Returns a Dataset (node, label) for nodes that appear in >=1 pair.
    """
    from ray.data.aggregate import Min

    def symmetrize(b: pa.Table) -> pa.Table:
        """Both edge directions + a self-loop per endpoint (the self
        loops make the init groupby produce label(x)=min(x, nbrs(x))
        without a separate union pass)."""
        lo = b["doc_lo"].combine_chunks() if isinstance(
            b["doc_lo"], pa.ChunkedArray) else b["doc_lo"]
        hi = b["doc_hi"].combine_chunks() if isinstance(
            b["doc_hi"], pa.ChunkedArray) else b["doc_hi"]
        return pa.table({
            "src": pa.concat_arrays([lo, hi, lo, hi]),
            "dst": pa.concat_arrays([hi, lo, lo, hi]),
        })

    edges = pairs.map_batches(symmetrize,
                              batch_format="pyarrow").materialize()
    # round 0: label(x) = min(x, neighbors(x)) — self loops included
    labels = (edges.groupby("src")
              .aggregate(Min("dst", alias_name="label"))
              .rename_columns({"src": "node"})).materialize()
    prev_sum = labels.sum("label")

    from .util import shuffle_width
    width = shuffle_width(blocks=edges.num_blocks())
    for _ in range(max_iters):
        prop = edges.join(labels, join_type="inner", num_partitions=width,
                          on=("dst",), right_on=("node",))
        prop = prop.map_batches(
            lambda b: pa.table({"node": b["src"], "label": b["label"]}),
            batch_format="pyarrow")
        labels = (prop.union(labels).groupby("node")
                  .aggregate(Min("label", alias_name="label"))).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels are ints, monotone decreasing
            break
        prev_sum = cur_sum
    else:  # pragma: no cover - pathological chain longer than max_iters
        # Unconverged labels would silently split a component and emit
        # wrong survivor/size rows — correctness-critical, so fail loud.
        raise RuntimeError(
            f"connected_components: not converged after {max_iters} "
            f"min-label rounds (graph diameter exceeds the bound); "
            f"re-run with a larger max_iters")
    return labels


def minhash_lsh_dedup(sf_dir: str) -> pd.DataFrame:
    """Near-dup survivors (min doc_id per connected component of the
    candidate-pair graph) + component sizes, computed end-to-end
    distributed: LSH candidates -> distributed connected components
    over pair nodes -> corpus doc_ids LEFT-joined to their component
    root (isolated docs root to themselves) -> grouped size count.
    The component root IS the min doc_id, so the survivor table is
    exactly the (root, count) groupby — no extra filter/join pass.
    The corpus id column shuffles as 8-byte keys; nothing corpus-sized
    ever lands on the driver (the returned survivor frame is the
    operator's actual result)."""
    import ray as _ray
    pairs = _minhash_raw_pairs(sf_dir).materialize()
    docs = _read_docs(sf_dir, columns=["doc_id"])
    n_pairs = pairs.count()
    if 0 < n_pairs <= _CC_DRIVER_MAX_PAIRS:
        # The pair list is the *output* of LSH (bounded by bucket caps,
        # ≪ corpus). Below the threshold, union-find it on the driver:
        # every member of a multi-doc component appears in some pair,
        # so component roots + sizes fall out of the (small) root map,
        # and the only corpus-wide work left is finding ISOLATED docs —
        # one shuffle-free broadcast-set filter pass. Above the
        # threshold the fully distributed min-label path takes over
        # (verified equal in tests).
        from collections import Counter
        roots = _union_find_roots(pairs.to_pandas())
        comp_sizes = Counter(roots.values())
        # broadcast the pair-node ids as a sorted numpy array: plasma
        # shares it zero-copy with every task and np.isin is one
        # vectorized probe per batch (a python set probe per row was
        # measured 2x slower end-to-end)
        nodes_ref = _ray.put(np.array(sorted(roots), dtype=np.int64))

        def keep_isolated(b: pa.Table) -> pa.Table:
            nodes = _ray.get(nodes_ref)
            ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
            keep = ~np.isin(ids, nodes, assume_unique=False)
            return pa.table({"doc_id": pa.array(ids[keep])})

        iso = docs.map_batches(keep_isolated,
                               batch_format="pyarrow").to_pandas()
        pdf = pd.concat([
            pd.DataFrame({"doc_id": iso["doc_id"],
                          "component_size": np.ones(len(iso), np.int64)}),
            pd.DataFrame({"doc_id": sorted(comp_sizes),
                          "component_size": [comp_sizes[r]
                                             for r in sorted(comp_sizes)]}),
        ], ignore_index=True)
        return pdf.sort_values("doc_id").reset_index(drop=True)

    if n_pairs == 0:
        mapped = docs.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"],
                                "root": b["doc_id"]}),
            batch_format="pyarrow")
    else:
        from .util import shuffle_width
        labels = connected_components(pairs)
        joined = docs.join(labels, join_type="left_outer",
                           num_partitions=shuffle_width(docs),
                           on=("doc_id",), right_on=("node",))

        def to_root(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "doc_id": b["doc_id"],
                "root": pc.coalesce(b["label"], b["doc_id"]),
            })

        mapped = joined.map_batches(to_root, batch_format="pyarrow")
    sizes = (mapped.groupby("root")
             .aggregate(Count(alias_name="component_size")))
    pdf = sizes.to_pandas().rename(columns={"root": "doc_id"})
    pdf["component_size"] = pdf["component_size"].astype(np.int64)
    return pdf.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over whitespace tokens; emits (doc_id, simhash)
    plus band keys (4 × 16-bit bands) so near matches (<=3 differing
    bits overall ⇒ at least one identical band) co-shuffle."""

    BANDS = 4
    _token_bits: dict[str, np.ndarray] = {}

    def _bits(self, tok: str) -> np.ndarray:
        if len(SimHasher._token_bits) > _TOKEN_CACHE_CAP:
            SimHasher._token_bits.clear()
        b = SimHasher._token_bits.get(tok)
        if b is None:
            h = np.uint64(_h64u(tok))
            b = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)) \
                .astype(np.int64) * 2 - 1
            SimHasher._token_bits[tok] = b
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, sims, band_keys = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            toks = t.split()
            if toks:
                acc = np.sum([self._bits(tok) for tok in toks], axis=0)
            else:
                acc = np.zeros(64, dtype=np.int64)
            bits_pos = (acc > 0).astype(np.uint64)
            sim = int((bits_pos << np.arange(64, dtype=np.uint64)).sum(
                dtype=np.uint64))
            sim = np.int64(np.uint64(sim).astype(np.int64))
            for bi in range(self.BANDS):
                band = (int(np.uint64(sim)) >> (16 * bi)) & 0xFFFF
                doc_ids.append(d)
                sims.append(sim)
                band_keys.append(np.int64(bi << 16 | band))
        return pa.table({"band_key": pa.array(np.array(band_keys, np.int64)),
                         "doc_id": pa.array(doc_ids, batch["doc_id"].type),
                         "simhash": pa.array(np.array(sims, np.int64))})


def _simhash_partition_pairs(group: pd.DataFrame,
                             max_dist: int = 3) -> pd.DataFrame:
    """Hamming-close pairs within one coarse partition, bucketed by the
    real band key; popcount vectorized per pair block (oversized
    buckets walk ALL pairs in bounded-memory blocks; only the
    pathological fallback guard drops docs)."""
    import logging
    lo, hi = [], []
    for bk, g in group.groupby("band_key", sort=True):
        uniq = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(uniq) < 2:
            continue
        if len(uniq) > _FALLBACK_MAX_BUCKET:
            logging.warning(
                "dedup: pathological simhash bucket %s truncated %d -> "
                "%d docs (potential near-dups dropped)",
                bk, len(uniq), _FALLBACK_MAX_BUCKET)
            uniq = uniq.iloc[:_FALLBACK_MAX_BUCKET]
        ids = uniq["doc_id"].to_numpy()
        hs = uniq["simhash"].to_numpy().astype(np.uint64)
        for r0, r1, c0, c1 in _iter_bucket_blocks(len(ids)):
            iu, ju = _block_pair_indices(r0, r1, c0, c1)
            x = hs[iu] ^ hs[ju]
            dist = np.zeros(len(x), dtype=np.int64)
            while x.any():
                dist += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = dist <= max_dist
            lo.append(ids[iu[keep]])
            hi.append(ids[ju[keep]])
    if not lo:
        return pd.DataFrame({"doc_lo": pd.Series([], dtype=group["doc_id"].dtype),
                             "doc_hi": pd.Series([], dtype=group["doc_id"].dtype)})
    return pd.DataFrame({"doc_lo": np.concatenate(lo),
                         "doc_hi": np.concatenate(hi)})


def simhash_dedup(sf_dir: str, max_dist: int = 3) -> pd.DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_dist, found via
    band buckets folded into coarse partitions (no all-pairs at scale,
    no per-bucket task overhead)."""
    from .util import shuffle_width
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=(1, 4))
    pairs = (sigs.map_batches(_add_coarse_part, batch_format="pyarrow")
                 .repartition(shuffle_width(ds))
                 .groupby("part")
                 .map_groups(lambda g: _simhash_partition_pairs(g, max_dist),
                             batch_format="pandas"))
    pdf = pairs.to_pandas().drop_duplicates()
    return pdf.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)


def _minhash_sql_parts() -> tuple[str, str]:
    """Generated DuckDB CTE chain reproducing the EXACT MinHasher
    pipeline: '\\s+' tokenization (== str.split()), pad-to-k, token
    hash = little-endian u64 of the first 8 md5 bytes, FNV-mix 3-token
    shingles with uint64 wraparound at every multiply (HUGEINT % 2^64),
    64 universal-hash minima with the same RandomState(7) coefficients
    and the same wrap-then-mod-Mersenne order as the numpy kernel, and
    16 four-sig band fingerprints. Returns (cte_block, pairs_select).
    """
    rng = np.random.RandomState(7)
    a_coef = rng.randint(1, (1 << 61) - 1, size=64).astype(np.uint64)
    b_coef = rng.randint(0, (1 << 61) - 1, size=64).astype(np.uint64)
    mers = (1 << 61) - 1
    fnv = 0x100000001B3
    p64 = 1 << 64
    le = " || ".join(f"substr(md5(t), {15 - 2 * i}, 2)" for i in range(8))
    mix = (f"(((xor((((xor((((th[i]::HUGEINT * {fnv}) % {p64})::UBIGINT), "
           f"th[i+1])::HUGEINT * {fnv}) % {p64})::UBIGINT), "
           f"th[i+2])::HUGEINT * {fnv}) % {p64})::UBIGINT)")
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(sh, s -> ((((({a}::HUGEINT * s::HUGEINT)"
        f" % {p64}) + {b}) % {p64}) % {mers})::UBIGINT)) AS s{p}"
        for p, (a, b) in enumerate(zip(a_coef.tolist(), b_coef.tolist())))
    band_strs = ",\n    ".join(
        "(" + " || ',' || ".join(f"s{4 * bi + j}::VARCHAR"
                                 for j in range(4)) + f") AS b{bi}"
        for bi in range(16))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, b{bi} AS band FROM bands"
        for bi in range(16))
    ctes = f"""base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t0
  FROM documents),
padded AS (
  SELECT doc_id,
         CASE WHEN len(t0) >= 3 THEN t0
              ELSE list_concat(t0, list_transform(range(1, 4 - len(t0)),
                                                  i -> '')) END AS toks
  FROM base),
th AS (
  SELECT doc_id, list_transform(toks, t -> ('0x' || {le})::UBIGINT) AS th
  FROM padded),
sh AS (
  SELECT doc_id, list_transform(range(1, len(th) - 1), i -> {mix}) AS sh
  FROM th),
sigs AS (SELECT doc_id, {sig_exprs} FROM sh),
bands AS (SELECT doc_id, {band_strs} FROM sigs),
band_long AS ({band_rows}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
  FROM band_long a JOIN band_long b
    ON a.band_idx = b.band_idx AND a.band = b.band
   AND a.doc_id < b.doc_id)"""
    return ctes, "SELECT doc_lo, doc_hi FROM pairs ORDER BY doc_lo, doc_hi"


def _minhash_candidates_sql() -> str:
    ctes, sel = _minhash_sql_parts()
    return f"WITH {ctes}\n{sel}"


def _minhash_lsh_dedup_sql() -> str:
    """Survivors oracle: the candidate CTEs + a recursive-CTE connected
    components (label propagation until closure, min label per node =
    component root) + isolated docs at size 1."""
    ctes, _ = _minhash_sql_parts()
    return f"""
WITH RECURSIVE {ctes},
edges AS (SELECT doc_lo AS u, doc_hi AS v FROM pairs
          UNION ALL SELECT doc_hi, doc_lo FROM pairs),
lab(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, l.label FROM edges e JOIN lab l ON l.node = e.u),
roots AS (SELECT node, MIN(label) AS root FROM lab GROUP BY node),
sizes AS (SELECT root, COUNT(*) AS component_size FROM roots GROUP BY root)
SELECT d.doc_id AS doc_id,
       COALESCE(s.component_size, 1) AS component_size
FROM documents d
LEFT JOIN roots r ON r.node = d.doc_id
LEFT JOIN sizes s ON s.root = d.doc_id
WHERE r.node IS NULL OR r.root = d.doc_id
ORDER BY doc_id
"""


def _ngram_jaccard_sql(threshold: float = 0.7) -> str:
    """Oracle for ``ngram_jaccard_dedup``: the candidate CTEs + exact
    3-gram string-shingle Jaccard (list_distinct/list_intersect ==
    frozenset semantics; short docs collapse to one shingle of the
    available tokens, matching _shingle_set). jaccard3 is the single
    double division of identical ints on both sides — bit-identical."""
    ctes, _ = _minhash_sql_parts()
    return f"""
WITH {ctes},
sh3 AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(t0) - 2, 1) + 1),
           i -> array_to_string(list_filter([t0[i], t0[i+1], t0[i+2]],
                                            x -> x IS NOT NULL), ' '))) AS s
  FROM base),
j AS (
  SELECT p.doc_lo, p.doc_hi,
         len(list_intersect(a.s, b.s)) AS inter,
         len(a.s) AS na, len(b.s) AS nb
  FROM pairs p JOIN sh3 a ON a.doc_id = p.doc_lo
               JOIN sh3 b ON b.doc_id = p.doc_hi)
SELECT doc_lo, doc_hi,
       inter / CAST(na + nb - inter AS DOUBLE) AS jaccard3
FROM j WHERE inter / CAST(na + nb - inter AS DOUBLE) >= {threshold}
ORDER BY doc_lo, doc_hi
"""


MINHASH_CANDIDATES_SQL = _minhash_candidates_sql()
MINHASH_LSH_DEDUP_SQL = _minhash_lsh_dedup_sql()
NGRAM_JACCARD_SQL = _ngram_jaccard_sql()


def _simhash_sql() -> str:
    """DuckDB oracle for ``simhash_dedup``: rebuilds the exact 64-bit
    simhash in SQL — token hash = little-endian u64 of the first 8 md5
    bytes (hex re-ordering), per-bit sign sums via 64 generated
    aggregates (bit j set iff 2*count_set > n_tokens, i.e. the ±1 sum
    is positive), then candidate pairs sharing any 16-bit band with
    Hamming distance <= 3 (bit_count of UBIGINT xor). Tokenization is
    regexp '\\s+' with empties dropped == python str.split()."""
    le = " || ".join(f"substr(md5(tok), {15 - 2 * i}, 2)"
                     for i in range(8))
    cbits = ",\n  ".join(
        f"SUM(((h >> {j}) & 1)::BIGINT) AS c{j}" for j in range(64))
    simterms = " + ".join(
        f"(CASE WHEN 2*COALESCE(c{j},0) > COALESCE(n,0) "
        f"THEN {1 << j}::UBIGINT ELSE 0::UBIGINT END)" for j in range(64))
    band_eq = " OR ".join(
        f"((a.sim >> {16 * i}) & 65535::UBIGINT) = "
        f"((b.sim >> {16 * i}) & 65535::UBIGINT)" for i in range(4))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x != '')) AS tok
  FROM documents),
th AS (
  SELECT doc_id, ('0x' || {le})::UBIGINT AS h FROM toks),
agg AS (
  SELECT doc_id, count(*) AS n,
  {cbits}
  FROM th GROUP BY doc_id),
sims AS (
  SELECT d.doc_id, ({simterms}) AS sim
  FROM documents d LEFT JOIN agg USING (doc_id))
SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
FROM sims a JOIN sims b ON a.doc_id < b.doc_id AND ({band_eq})
WHERE bit_count(xor(a.sim, b.sim)) <= 3
ORDER BY doc_lo, doc_hi
"""


SIMHASH_DEDUP_SQL = _simhash_sql()


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify over LSH candidates)
# ---------------------------------------------------------------------------

def _shingle_set(text: str, k: int = 3) -> frozenset:
    toks = text.split()
    return frozenset(" ".join(toks[i:i + k])
                     for i in range(max(len(toks) - k + 1, 1)))


def ngram_jaccard_dedup(sf_dir: str, threshold: float = 0.7) -> pd.DataFrame:
    """Exact 3-gram Jaccard on the minhash candidate pairs — the
    verify pass of the standard LSH dedup pipeline. Candidate texts
    are attached via two hash shuffle joins against the documents
    table (candidates ⋈ docs on doc_lo, then on doc_hi) — the corpus
    is never materialized on the driver or broadcast; only the rows
    that are actually candidates carry text through the verify stage.
    """
    cands_ds = minhash_candidates_ds(sf_dir).materialize()
    if cands_ds.count() == 0:
        return pd.DataFrame({"doc_lo": [], "doc_hi": [], "jaccard3": []})

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def _renamed(side: str):
        def rn(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b["doc_id"],
                             f"text_{side}": b["text"]})
        return rn

    from .util import shuffle_width
    width = shuffle_width(docs)
    j = cands_ds.join(
        docs.map_batches(_renamed("lo"), batch_format="pyarrow"),
        join_type="inner", num_partitions=width,
        on=("doc_lo",), right_on=("id_lo",))
    j = j.join(
        docs.map_batches(_renamed("hi"), batch_format="pyarrow"),
        join_type="inner", num_partitions=width,
        on=("doc_hi",), right_on=("id_hi",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = []
        for ta, tb in zip(batch["text_lo"], batch["text_hi"]):
            sa, sb = _shingle_set(ta), _shingle_set(tb)
            inter = len(sa & sb)
            jac.append(inter / (len(sa) + len(sb) - inter))
        out = batch[["doc_lo", "doc_hi"]].copy()
        out["jaccard3"] = jac
        return out[np.asarray(jac) >= threshold]

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# character-set Jaccard all-pairs (SQL-verifiable small-data oracle)
# ---------------------------------------------------------------------------

class _CharJaccard:
    """Broadcast right side: every batch of left docs is compared to
    the full (small) doc set held once per actor. Character-set
    Jaccard == DuckDB's jaccard() so the oracle is pure SQL."""

    def __init__(self, docs_ref, threshold: float = 0.9):
        import ray
        ids, texts = ray.get(docs_ref)
        self.ids = ids
        self.charsets = [frozenset(t) for t in texts]
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        lo, hi, sim = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            cs = frozenset(t)
            for other, ocs in zip(self.ids, self.charsets):
                if other <= d:
                    continue
                inter = len(cs & ocs)
                union = len(cs) + len(ocs) - inter
                s = inter / union if union else 0.0
                if s >= self.threshold:
                    lo.append(d)
                    hi.append(other)
                    sim.append(s)
        return pa.table({"doc_lo": pa.array(lo, pa.int64()),
                         "doc_hi": pa.array(hi, pa.int64()),
                         "char_jaccard": pa.array(sim, pa.float64())})


#: jaccard_pairs is the labeled O(N^2) oracle twin of the bucketed
#: ngram_jaccard_dedup — it broadcasts the WHOLE corpus and walks every
#: pair, so it is hard-capped instead of silently OOMing at real scale
_JACCARD_PAIRS_MAX_DOCS = 200_000


def jaccard_pairs(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """Per-doc count of high-char-Jaccard partners (the all-pairs
    similarity matrix, reduced to a per-doc row so the verified result
    stays small)."""
    import ray
    docs = _read_docs(sf_dir, columns=["doc_id", "text"]).to_pandas()
    if len(docs) > _JACCARD_PAIRS_MAX_DOCS:
        raise ValueError(
            f"jaccard_pairs is the all-pairs oracle twin (full-corpus "
            f"broadcast, O(N^2) compare): {len(docs)} docs exceeds the "
            f"{_JACCARD_PAIRS_MAX_DOCS} cap. Use ngram_jaccard_dedup "
            f"(shingle-bucketed) at corpus scale.")
    docs_ref = ray.put((list(docs["doc_id"]), list(docs["text"])))
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    pairs = ds.map_batches(_CharJaccard,
                           fn_constructor_kwargs={"docs_ref": docs_ref,
                                                  "threshold": threshold},
                           batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    g = (pairs.groupby("doc_lo", as_index=False)
              .agg(pair_cnt=("doc_hi", "size"),
                   hi_checksum=("doc_hi", "sum")))
    g = g.rename(columns={"doc_lo": "doc_id"})
    return g.sort_values("doc_id").reset_index(drop=True)


JACCARD_PAIRS_SQL = """
SELECT a.doc_id AS doc_id, COUNT(*) AS pair_cnt,
       CAST(SUM(b.doc_id) AS BIGINT) AS hi_checksum
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE jaccard(a.text, b.text) >= 0.9
GROUP BY a.doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# ingestion precedence dedup — multi-source merge where duplicates keep
# ONE copy by source priority (the crawl-vs-curated precedence rule of
# every multi-source ingest)
# ---------------------------------------------------------------------------

def ingest_precedence_dedup(sf_dir: str) -> pd.DataFrame:
    """One surviving (doc_id, source, dup_cnt) row per distinct text,
    the winner being the lexicographically smallest (source, doc_id)
    pair — "preferred source first, stable id tie-break".

    Same 16-byte content-hash shuffle as ``exact_dedup``; the winner
    resolution is a per-batch combiner (sort + drop_duplicates keeps
    at most one candidate row per distinct hash per block) followed by
    a coarse-fold ``map_groups`` min — never one Ray group per hash.
    """
    from .util import shuffle_width

    ds = _read_docs(sf_dir, columns=["doc_id", "text", "source"])
    n_parts = shuffle_width(ds)

    def partial(b: pa.Table) -> pa.Table:
        hb = _content_hash_batch(b.select(["doc_id", "text"]))
        df = pd.DataFrame({
            "content_hash": hb["content_hash"].to_numpy(
                zero_copy_only=False),
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "source": b["source"].to_pylist()})
        df["n"] = np.int64(1)
        cnt = df.groupby("content_hash", as_index=False)["n"].sum()
        win = (df.sort_values(["content_hash", "source", "doc_id"],
                              kind="mergesort")
                 .drop_duplicates("content_hash"))
        out = win[["content_hash", "doc_id", "source"]].merge(
            cnt, on="content_hash")
        out["part"] = (out["content_hash"].to_numpy(dtype=np.uint64)
                       % np.uint64(n_parts)).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("content_hash", as_index=False)["n"].sum()
        win = (g.sort_values(["content_hash", "source", "doc_id"],
                             kind="mergesort")
                .drop_duplicates("content_hash"))
        out = win[["content_hash", "doc_id", "source"]].merge(
            cnt, on="content_hash")
        return out[["doc_id", "source", "n"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("part")
             .map_groups(resolve, batch_format="pandas")
             .to_pandas())
    out = out.rename(columns={"n": "dup_cnt"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["dup_cnt"] = out["dup_cnt"].astype(np.int64)
    return (out[["doc_id", "source", "dup_cnt"]]
            .sort_values("doc_id").reset_index(drop=True))


INGEST_PRECEDENCE_DEDUP_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY text
                            ORDER BY source, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY text) AS dup_cnt
  FROM documents)
SELECT doc_id, source, CAST(dup_cnt AS BIGINT) AS dup_cnt
FROM r WHERE rn = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# prefix dedup — docs sharing their first-k tokens (template / mirror
# boilerplate catcher: CCNet-style head dedup, cheaper than minhash)
# ---------------------------------------------------------------------------

PREFIX_DUP_K = 12


def prefix_dup_groups(sf_dir: str, k: int = PREFIX_DUP_K) -> pd.DataFrame:
    """Groups of documents that share their first ``k`` tokens:
    (doc_id, n_docs) per group with >= 2 members, doc_id = the group's
    min (the canonical keeper), ordered by doc_id.

    Near-duplicates that differ only in their tails (templated pages,
    mirrored articles with appended navigation) collide on the prefix
    even when whole-text hashing misses them — the cheap first line of
    defence before minhash.

    Scale shape: exactly ``exact_dedup``'s — the shuffle key is the
    64-bit prefix hash (16 bytes/doc on the wire, never the text), and
    the >= 2 filter runs DISTRIBUTED on the aggregated dataset before
    anything reaches the driver: at 100 TB the group table is
    corpus-sized but the duplicate-group result is small.
    """
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def prefix_hash(batch: pa.Table) -> pa.Table:
        hashes = np.fromiter(
            (_h64(" ".join(t.split(" ")[:k]))
             for t in batch["text"].to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        return pa.table({"doc_id": batch["doc_id"],
                         "prefix_hash": pa.array(hashes)})

    agg = (ds.map_batches(prefix_hash, batch_format="pyarrow")
             .groupby("prefix_hash")
             .aggregate(Min("doc_id", alias_name="doc_id"),
                        Count(alias_name="n_docs"))
             .map_batches(
                 lambda t: t.filter(pc.greater_equal(t["n_docs"], 2)),
                 batch_format="pyarrow"))
    out = agg.to_pandas()[["doc_id", "n_docs"]]
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


PREFIX_DUP_GROUPS_SQL = f"""
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY array_to_string(
    list_slice(string_split(text, ' '), 1, {PREFIX_DUP_K}), ' ')
HAVING COUNT(*) >= 2
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# dup_ngram_spans — span-level duplicate-text measurement (the
# distributed analog of suffix-array exact-substring dedup, Lee et al.
# 2022 "Deduplicating Training Data Makes Language Models Better":
# instead of whole-document or shingle-set similarity, find every
# token n-gram that occurs MORE THAN ONCE corpus-wide and measure, per
# document, how many of its tokens are covered by at least one such
# duplicated span)
# ---------------------------------------------------------------------------

DUP_SPAN_N = 8   # token n-gram width (Lee et al. use 50 BPE tokens;
                 # 8 keeps the synthetic corpus's dup fraction in the
                 # informative 0<f<1 range)


def _flat_ngrams(texts: list[str], n: int):
    """Whole-batch n-gram construction, no per-doc loop: returns
    (grams, gram_doc, flat_len, doc_idx, doc_starts) where ``grams``
    are the space-joined n-gram strings whose window lies inside one
    document, ``gram_doc`` their doc index, and ``gram_pos`` their
    global start offset in the flattened token array."""
    from .corpus import _flatten_tokens
    flat, doc_idx = _flatten_tokens(texts)
    T = len(flat)
    lens = np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    if T < n:
        empty = np.array([], dtype=np.int64)
        return (np.array([], dtype=object), empty, empty,
                T, doc_idx, starts)
    g = flat[:T - n + 1].copy()
    for j in range(1, n):
        g = g + " "
        g = g + flat[j:T - n + 1 + j]
    same_doc = doc_idx[:T - n + 1] == doc_idx[n - 1:]
    pos = np.arange(T - n + 1, dtype=np.int64)
    return (g[same_doc], doc_idx[:T - n + 1][same_doc], pos[same_doc],
            T, doc_idx, starts)


def dup_ngram_spans(sf_dir: str, n: int = DUP_SPAN_N) -> pd.DataFrame:
    """Per-document duplicated-span coverage: of the doc's tokens, how
    many lie inside at least one token ``n``-gram that occurs >= 2
    times anywhere in the corpus (including elsewhere in the SAME
    doc — self-repetition is duplication too, exactly Lee et al.'s
    suffix-array criterion at n-gram granularity)?

    Returns one row per document: (doc_id, n_tokens, n_grams,
    dup_grams, covered_tokens), all exact int64 — the caller derives
    the cut fraction; no float crosses the oracle boundary.

    Two passes, both shuffle-light:

    * pass 1 — gram occurrence counts: per-batch pre-count (factorize
      + bincount) so the groupby shuffle carries one row per DISTINCT
      gram per block, never per occurrence; the >= 2 filter runs
      distributed, and only duplicated grams reach the driver.
    * pass 2 — stateless re-scan: the dup-gram set is broadcast ONCE
      as a sorted array via ``ray.put`` (plasma zero-copy, the
      boilerplate_ngrams discipline); membership is one searchsorted
      per batch, and span coverage (the union of ``[pos, pos+n)``
      intervals) is a prefix-sum window test over the flattened batch
      — no per-doc loop, no interval merge.

    Scale shape (100 TB): the pass-1 shuffle is gram-vocabulary-sized
    (duplicated text collapses to few distinct grams — the reason
    dedup pays off at all). The broadcast dup set is the one
    size-governed piece: beyond plasma scale, swap the broadcast for
    a hash semi-join of (gram_hash) back onto pass 2's gram stream —
    same two-pass shape, one extra 16 B/gram shuffle
    (``bloom_semi_join`` is the in-repo template)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        grams, _, _, _, _, _ = _flat_ngrams(batch["text"].to_pylist(), n)
        if not len(grams):
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(grams)
        cnt = np.bincount(codes, minlength=len(uniq))
        return pa.table({"gram": pa.array(uniq, pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    dup = (ds.map_batches(count_partial, batch_format="pyarrow")
             .groupby("gram")
             .aggregate(Sum("cnt", alias_name="cnt"))
             .filter(expr="cnt >= 2")
             .to_pandas())
    # an empty filtered Dataset drops its schema -> guard the column
    dup_set = (dup["gram"].to_numpy(dtype=object) if "gram" in dup
               else np.array([], dtype=object))
    dup_set.sort()
    broadcast = ray.put(dup_set)

    def span_cover(batch: pa.Table) -> pa.Table:
        dset = ray.get(broadcast)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        grams, gdoc, gpos, T, doc_idx, starts = _flat_ngrams(
            batch["text"].to_pylist(), n)
        n_docs = len(ids)
        n_tokens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        n_grams = np.maximum(n_tokens - n + 1, 0)
        if len(grams) and len(dset):
            loc = np.searchsorted(dset, grams)
            is_dup = ((loc < len(dset))
                      & (dset[np.minimum(loc, len(dset) - 1)] == grams))
        else:
            is_dup = np.zeros(len(grams), dtype=bool)
        dup_grams = np.bincount(gdoc[is_dup], minlength=n_docs)
        # coverage: token at global offset p (doc d starting at s_d)
        # is covered iff some dup gram starts in [max(p-n+1, s_d), p]
        mask = np.zeros(T, dtype=np.int64)
        mask[gpos[is_dup]] = 1
        pref = np.concatenate(([0], np.cumsum(mask)))
        p = np.arange(T, dtype=np.int64)
        lo = np.maximum(p - n + 1, starts[doc_idx])
        covered = (pref[p + 1] - pref[lo]) > 0
        cov = np.bincount(doc_idx[covered], minlength=n_docs)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tokens),
            "n_grams": pa.array(n_grams.astype(np.int64)),
            "dup_grams": pa.array(dup_grams.astype(np.int64)),
            "covered_tokens": pa.array(cov.astype(np.int64)),
        })

    out = ds.map_batches(span_cover, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _dup_span_sql(n: int = DUP_SPAN_N) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
  SELECT doc_id, s AS pos,
         array_to_string(list_slice(toks, s, s + {n} - 1), ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {n} + 1)) AS s
        FROM t)),
c AS (
  SELECT gram FROM w GROUP BY gram HAVING COUNT(*) >= 2),
d AS (
  SELECT doc_id, pos FROM w WHERE gram IN (SELECT gram FROM c)),
dg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS dup_grams FROM d GROUP BY doc_id),
cov AS (
  SELECT doc_id, COUNT(DISTINCT p)::BIGINT AS covered_tokens
  FROM (SELECT doc_id, unnest(generate_series(pos, pos + {n} - 1)) AS p
        FROM d)
  GROUP BY doc_id)
SELECT t.doc_id,
       len(t.toks)::BIGINT AS n_tokens,
       GREATEST(len(t.toks) - {n} + 1, 0)::BIGINT AS n_grams,
       COALESCE(dg.dup_grams, 0)::BIGINT AS dup_grams,
       COALESCE(cov.covered_tokens, 0)::BIGINT AS covered_tokens
FROM t
LEFT JOIN dg USING (doc_id)
LEFT JOIN cov USING (doc_id)
ORDER BY t.doc_id
"""


DUP_NGRAM_SPANS_SQL = _dup_span_sql()


# ---------------------------------------------------------------------------
# fuzzy_join_names — edit-distance similarity join (FastSS / SymSpell
# deletion neighborhoods, Bocek et al. 2007): all pairs of distinct
# customer names within Levenshtein distance 1, without an all-pairs
# scan
# ---------------------------------------------------------------------------

def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 (the verify predicate; candidates are
    result-sized, so a scalar check per candidate is not a hot path)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_join_names(sf_dir: str) -> pd.DataFrame:
    """(name_a, name_b) for every pair of distinct customer names with
    Levenshtein distance <= 1, name_a < name_b, ordered.

    FastSS candidate generation: two strings are within distance 1 iff
    their {self} ∪ {delete-one-char} neighborhoods intersect, so each
    name emits len+1 variant keys and candidates are pairs sharing a
    variant — O(n·len) rows instead of the O(n²) cross join the SQL
    oracle runs. The shuffle reuses the LSH machinery end to end:
    64-bit variant hashes fold into coarse partitions
    (``_add_coarse_part``) and ``_partition_pairs`` emits each
    bucket's pairs vectorized; an exact distance check then filters
    the candidates (hash collisions and delete-position mismatches),
    with the name table broadcast once — candidates are result-sized.
    """
    import ray

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"])

    def variants(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["c_custkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        names = batch["c_name"].to_pylist()
        bk, ids = [], []
        for k, nm in zip(keys, names):
            h = _h64(nm)
            bk.append(h); ids.append(int(k))
            for i in range(len(nm)):
                bk.append(_h64(nm[:i] + nm[i + 1:]))
                ids.append(int(k))
        return pa.table({"band_key": pa.array(bk, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    cand = (ds.map_batches(variants, batch_format="pyarrow")
              .map_batches(_add_coarse_part, batch_format="pyarrow")
              .groupby("part")
              .map_groups(_partition_pairs, batch_format="pandas"))

    # name lookup broadcast once (key-sorted arrays, plasma zero-copy)
    lk = ds.to_pandas().sort_values("c_custkey")
    bc = ray.put((lk["c_custkey"].to_numpy(dtype=np.int64),
                  lk["c_name"].to_numpy(dtype=object)))

    def verify(b: pa.Table) -> pa.Table:
        ks, nm = ray.get(bc)
        lo = np.asarray(b["doc_lo"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        hi = np.asarray(b["doc_hi"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        # per-batch pre-dedupe (a pair may surface from several shared
        # variants); the driver's drop_duplicates closes cross-batch
        # repeats — candidates are result-sized, so no pair shuffle
        packed = np.unique(lo * np.int64(1 << 32) + hi)
        lo, hi = packed >> 32, packed & ((1 << 32) - 1)
        na = nm[np.searchsorted(ks, lo)]
        nb = nm[np.searchsorted(ks, hi)]
        a_o, b_o = [], []
        for x, y in zip(na, nb):
            if x == y:
                continue
            if x > y:
                x, y = y, x
            if _ed_le1(x, y):
                a_o.append(x); b_o.append(y)
        return pa.table({"name_a": pa.array(a_o, pa.string()),
                         "name_b": pa.array(b_o, pa.string())})

    out = (cand.map_batches(verify, batch_format="pyarrow")
           .to_pandas().drop_duplicates())
    return (out.sort_values(["name_a", "name_b"])
            .reset_index(drop=True))


FUZZY_JOIN_NAMES_SQL = """
WITH n AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM n a JOIN n b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY name_a, name_b
"""


ENTITY_BLOCK_PREFIX = 16   # ER blocking key: first k chars must match


def entity_clusters(sf_dir: str,
                    block_prefix: int = ENTITY_BLOCK_PREFIX
                    ) -> pd.DataFrame:
    """Entity resolution (record linkage) over customer names: cluster
    names transitively connected by (edit-distance <= 1 AND equal
    ``block_prefix``-char prefix) and elect the lexicographically
    smallest member as the canonical record. Returns (c_name,
    canonical_name, cluster_size) for EVERY distinct name (singletons
    canonicalize to themselves), ordered by c_name.

    The prefix equality is the BLOCKING key every production ER system
    applies before matching (Christen 2012): it bounds transitive
    chains — without it, near-contiguous identifiers chain the whole
    table into one component, which is both semantically useless and
    quadratic for the closure (observed: the unblocked oracle takes
    47 s where the blocked one takes under a second).

    Composition of existing primitives: ``fuzzy_join_names`` emits the
    verified pair graph (FastSS candidates, exact distance check);
    components resolve driver-side (pairs are result-sized — the
    minhash survivor discipline; ``connected_components`` is the
    distributed swap-in past ~2M pairs); membership/size assembly is a
    tiny grouped count."""
    import ray

    pairs = fuzzy_join_names(sf_dir)
    same_block = [a[:block_prefix] == b[:block_prefix]
                  for a, b in zip(pairs["name_a"], pairs["name_b"])]
    pairs = pairs[np.asarray(same_block, dtype=bool)]
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["name_a"], pairs["name_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    names = (ray.data.read_parquet(
                 os.path.join(sf_dir, "customer.parquet"),
                 columns=["c_name"])
             .to_pandas()["c_name"].drop_duplicates()
             .sort_values().reset_index(drop=True))
    canon = names.map(find)
    out = pd.DataFrame({"c_name": names, "canonical_name": canon})
    sizes = (out.groupby("canonical_name", as_index=False)
             .size().rename(columns={"size": "cluster_size"}))
    out = out.merge(sizes, on="canonical_name")
    out["cluster_size"] = out["cluster_size"].astype(np.int64)
    return out.sort_values("c_name").reset_index(drop=True)


ENTITY_CLUSTERS_SQL = f"""
WITH RECURSIVE n AS (SELECT DISTINCT c_name FROM customer),
p AS (SELECT a.c_name AS u, b.c_name AS v
      FROM n a JOIN n b ON a.c_name < b.c_name
      WHERE levenshtein(a.c_name, b.c_name) <= 1
        AND substr(a.c_name, 1, {ENTITY_BLOCK_PREFIX})
            = substr(b.c_name, 1, {ENTITY_BLOCK_PREFIX})),
edges AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
lab(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, l.label FROM edges e JOIN lab l ON l.node = e.u),
roots AS (SELECT node, MIN(label) AS root FROM lab GROUP BY node),
fr AS (SELECT n.c_name, COALESCE(r.root, n.c_name) AS canonical_name
       FROM n LEFT JOIN roots r ON r.node = n.c_name),
sizes AS (SELECT canonical_name, COUNT(*)::BIGINT AS cluster_size
          FROM fr GROUP BY canonical_name)
SELECT fr.c_name, fr.canonical_name, s.cluster_size
FROM fr JOIN sizes s USING (canonical_name)
ORDER BY fr.c_name
"""


def incremental_exact_dedup(sf_dir: str, n_chunks: int = 4) -> pd.DataFrame:
    """Exact-dedup survivor state maintained INCREMENTALLY across
    ``n_chunks`` simulated arrival batches (doc_id hash split): each
    arrival hashes ONLY its chunk and MIN/SUM-merges into the stored
    (content_hash → min doc_id, dup_cnt) table — the dedup analog of
    the incremental view (additive counts) and the incremental HLL
    (min-merge survivor election). The final table is identical to
    the one-shot ``exact_dedup``, verified by the SAME SQL oracle.

    Why it matters at 100 TB: a crawl never re-reads the corpus —
    yesterday's survivor state is hash-partitioned on disk and each
    arrival merges per partition; the merge operators (MIN, SUM) are
    associative and commutative, so arrival order can't change the
    final state."""
    view: pd.DataFrame | None = None
    for chunk in range(n_chunks):
        ds = _read_docs(sf_dir, columns=["doc_id", "text"])

        def pick(b: pa.Table, chunk=chunk) -> pa.Table:
            keys = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False),
                              dtype=np.int64)
            sel = np.fromiter(
                (_h64u(str(int(k))) % n_chunks == chunk for k in keys),
                dtype=bool, count=len(keys))
            return b.filter(pa.array(sel))

        delta = (ds.map_batches(pick, batch_format="pyarrow")
                 .map_batches(_content_hash_batch, batch_format="pyarrow")
                 .groupby("content_hash")
                 .aggregate(Min("doc_id", alias_name="doc_id"),
                            Count(alias_name="dup_cnt"))
                 .to_pandas())
        if view is None:
            view = delta
        else:
            both = pd.concat([view, delta], ignore_index=True)
            view = (both.groupby("content_hash", as_index=False)
                    .agg(doc_id=("doc_id", "min"),
                         dup_cnt=("dup_cnt", "sum")))
    out = view[["doc_id", "dup_cnt"]].copy()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["dup_cnt"] = out["dup_cnt"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_containment_dedup(sf_dir: str,
                            threshold: float = 0.8) -> pd.DataFrame:
    """Exact 3-gram CONTAINMENT on the minhash candidate pairs —
    catches subset duplicates (a doc nearly contained in a longer
    one) that symmetric Jaccard under-scores: C = |A∩B| / min(|A|,|B|)
    (Broder's containment, taken against the smaller side so either
    direction of nesting trips it). Same two hash shuffle joins as
    ``ngram_jaccard_dedup``; the float is one division of identical
    integers on both sides, so the SQL oracle is bit-identical."""
    cands_ds = minhash_candidates_ds(sf_dir).materialize()
    if cands_ds.count() == 0:
        return pd.DataFrame({"doc_lo": [], "doc_hi": [],
                             "containment3": []})

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def _renamed(side: str):
        def rn(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b["doc_id"],
                             f"text_{side}": b["text"]})
        return rn

    from .util import shuffle_width
    width = shuffle_width(docs)
    j = cands_ds.join(
        docs.map_batches(_renamed("lo"), batch_format="pyarrow"),
        join_type="inner", num_partitions=width,
        on=("doc_lo",), right_on=("id_lo",))
    j = j.join(
        docs.map_batches(_renamed("hi"), batch_format="pyarrow"),
        join_type="inner", num_partitions=width,
        on=("doc_hi",), right_on=("id_hi",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        con = []
        for ta, tb in zip(batch["text_lo"], batch["text_hi"]):
            sa, sb = _shingle_set(ta), _shingle_set(tb)
            inter = len(sa & sb)
            con.append(inter / min(len(sa), len(sb)))
        out = batch[["doc_lo", "doc_hi"]].copy()
        out["containment3"] = con
        return out[np.asarray(con) >= threshold]

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)


def _ngram_containment_sql(threshold: float = 0.8) -> str:
    """Oracle for ``ngram_containment_dedup``: the candidate CTEs +
    exact 3-gram containment against the smaller shingle set."""
    ctes, _ = _minhash_sql_parts()
    return f"""
WITH {ctes},
sh3 AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(t0) - 2, 1) + 1),
           i -> array_to_string(list_filter([t0[i], t0[i+1], t0[i+2]],
                                            x -> x IS NOT NULL), ' '))) AS s
  FROM base),
j AS (
  SELECT p.doc_lo, p.doc_hi,
         len(list_intersect(a.s, b.s)) AS inter,
         len(a.s) AS na, len(b.s) AS nb
  FROM pairs p JOIN sh3 a ON a.doc_id = p.doc_lo
               JOIN sh3 b ON b.doc_id = p.doc_hi)
SELECT doc_lo, doc_hi,
       inter / CAST(least(na, nb) AS DOUBLE) AS containment3
FROM j WHERE inter / CAST(least(na, nb) AS DOUBLE) >= {threshold}
ORDER BY doc_lo, doc_hi
"""


NGRAM_CONTAINMENT_SQL = _ngram_containment_sql()


# ---------------------------------------------------------------------------
# persistent minhash LSH index (near-dup serving)
# ---------------------------------------------------------------------------

#: band_key's top bits (arithmetic shift keeps the bucket monotone in
#: int64 sort order, so a global key sort lands each hive partition's
#: files pre-sorted and their row-group footer stats form tight
#: intervals — the MediaStore point-lookup discipline for postings)
_MH_BUCKET_SHIFT = 59


def build_minhash_index(sf_dir: str, out_dir: str, *,
                        num_perm: int = 64, bands: int = 16
                        ) -> pd.DataFrame:
    """Write the corpus band postings (band_key, doc_id) as a
    persistent LSH index — the dedup-serving analog of the persistent
    IVF sink: a later crawl increment finds its near-dup candidates
    against the indexed corpus WITHOUT re-signing it. Layout: one
    global sort by band_key, hive-partitioned by the key's top bits,
    so every partition's files are internally sorted and a query
    reads only the row groups whose footer [min, max] interval
    touches a probed key. Returns the (bucket, n_rows) manifest."""
    import functools
    import os as _os

    import pyarrow.parquet as _pq

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    sigs = docs.map_batches(
        functools.partial(_sign_batch, num_perm=num_perm, bands=bands),
        batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        key = b["band_key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "band_key": b["band_key"],
            "doc_id": b["doc_id"].cast(pa.int64()),
            "bucket": pa.array(key >> _MH_BUCKET_SHIFT)})

    (sigs.map_batches(add_bucket, batch_format="pyarrow")
         .sort("band_key")
         .write_parquet(out_dir, partition_cols=["bucket"]))

    man = []
    for d in sorted(_os.listdir(out_dir)):
        if not d.startswith("bucket="):
            continue
        n = sum(_pq.read_metadata(_os.path.join(out_dir, d, f)).num_rows
                for f in _os.listdir(_os.path.join(out_dir, d))
                if f.endswith(".parquet"))
        man.append((int(d.split("=", 1)[1]), n))
    out = pd.DataFrame(man, columns=["bucket", "n_rows"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def query_minhash_index(index_dir: str, sf_dir: str, *,
                        num_perm: int = 64,
                        bands: int = 16) -> pd.DataFrame:
    """Candidate near-dup pairs (query_doc, index_doc) of a query
    document set against a ``build_minhash_index`` sink. The query
    side is the operationally small side (a crawl increment): its
    band keys are signed in one pass and broadcast; the INDEX side is
    never scanned — the driver touches only parquet footers (O(files),
    manifest-shaped) to plan row groups whose [min, max] key interval
    contains a probed key, and a task-based ``map_batches`` over that
    plan does the targeted reads + exact ``isin`` + key join.
    Self-pairs are dropped; (query=corpus, index=corpus) reproduces
    ``minhash_candidates`` exactly (the gate's contract)."""
    import functools
    import os as _os

    import pyarrow.parquet as _pq
    import ray

    from .util import as_task_fn

    qsigs = (_read_docs(sf_dir, columns=["doc_id", "text"])
             .map_batches(functools.partial(
                 _sign_batch, num_perm=num_perm, bands=bands),
                 batch_format="pyarrow")
             .to_pandas())
    qkeys = np.sort(np.unique(qsigs["band_key"].to_numpy(np.int64)))
    if not len(qkeys):
        return pd.DataFrame({"query_doc": [], "index_doc": []})

    # footer-only planning: row groups whose [min, max] touches a key
    plan = []
    for d in sorted(_os.listdir(index_dir)):
        if not d.startswith("bucket="):
            continue
        for f in sorted(_os.listdir(_os.path.join(index_dir, d))):
            if not f.endswith(".parquet"):
                continue
            path = _os.path.join(index_dir, d, f)
            md = _pq.read_metadata(path)
            hit = []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                st = col.statistics
                lo, hi = int(st.min), int(st.max)
                a = np.searchsorted(qkeys, lo, side="left")
                if a < len(qkeys) and qkeys[a] <= hi:
                    hit.append(rg)
            if hit:
                plan.append({"path": path,
                             "rgs": ",".join(map(str, hit))})
    if not plan:
        return pd.DataFrame({"query_doc": [], "index_doc": []})

    qref = ray.put((qkeys, qsigs["band_key"].to_numpy(np.int64),
                    qsigs["doc_id"].to_numpy(np.int64)))

    class Probe:
        def __init__(self):
            self.qkeys, qband, qdoc = ray.get(qref)
            order = np.argsort(qband, kind="stable")
            self.qband, self.qdoc = qband[order], qdoc[order]

        def __call__(self, b: pa.Table) -> pa.Table:
            qlo, qhi = [], []
            for path, rgs in zip(b["path"].to_pylist(),
                                 b["rgs"].to_pylist()):
                t = _pq.ParquetFile(path).read_row_groups(
                    [int(x) for x in rgs.split(",")],
                    columns=["band_key", "doc_id"])
                key = t["band_key"].to_numpy()
                keep = np.isin(key, self.qkeys)
                if not keep.any():
                    continue
                key = key[keep]
                idoc = t["doc_id"].to_numpy()[keep]
                # join matched postings to the query postings by key
                qb, qd = self.qband, self.qdoc
                left = np.searchsorted(qb, key, side="left")
                right = np.searchsorted(qb, key, side="right")
                reps = right - left
                i_ix = np.repeat(np.arange(len(key)), reps)
                q_ix = (np.concatenate(
                    [np.arange(a, b_) for a, b_ in zip(left, right)])
                    if len(key) else np.zeros(0, np.int64))
                qdoc = qd[q_ix]
                idocr = idoc[i_ix]
                m = qdoc != idocr
                qlo.append(qdoc[m])
                qhi.append(idocr[m])
            cat = (lambda xs: np.concatenate(xs) if xs
                   else np.zeros(0, dtype=np.int64))
            return pa.table({"query_doc": pa.array(cat(qlo)),
                             "index_doc": pa.array(cat(qhi))})

    import ray.data
    from ray.data.aggregate import Count
    pairs = (ray.data.from_items(plan)
             .map_batches(as_task_fn(Probe), batch_format="pyarrow",
                          batch_size=4)
             .groupby(["query_doc", "index_doc"])
             .aggregate(Count(alias_name="_n"))
             .drop_columns(["_n"])
             .to_pandas())
    for c in pairs.columns:
        pairs[c] = pairs[c].astype(np.int64)
    return (pairs.sort_values(["query_doc", "index_doc"])
            .reset_index(drop=True))

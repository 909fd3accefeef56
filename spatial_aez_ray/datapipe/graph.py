"""Distributed graph analytics over corpus-derived graphs.

``textrank_tokens`` — PageRank over the token co-occurrence graph
(TextRank, Mihalcea & Tarau 2004): nodes are tokens, edges are
adjacent-token pairs within a document (undirected, multiplicity =
co-occurrence count), rank is the damped stationary iteration
r(v) = (1-d)/N + d * sum_u w(u,v) * r(u) / deg(u).

Ray-Data shape (the generic distributed-PageRank recipe):

* the EDGE table is built once from the corpus — per-batch pre-reduced
  (u, v, w) partials (factorize + bincount, no Python pair loops), then
  ONE ``groupby(u, v)`` shuffle to the globally-reduced edge table,
  which is vocabulary²-bounded no matter the corpus size. Degrees are
  one more tiny groupby over it.
* each power iteration maps over the (materialized) edge table with the
  current rank vector BROADCAST via ``ray.put`` (node-sized — the rank
  vector of a token graph is vocabulary-sized, the legitimate small
  side; a node set too big to broadcast swaps the lookup for a hash
  join of ranks onto edges, same iteration shape), emitting per-batch
  per-destination partial sums; one destination-keyed groupby per
  iteration closes the step. 5 iterations = 5 tiny shuffles over the
  reduced edge table; the corpus itself is read ONCE.

Determinism contract: ranks live in integer micro-units (SCALE = 1e12)
with floor division at every step — contribution of u is
``r(u) // deg(u)``, the damped update is ``BASE + (85 * S) // 100`` —
so partial sums are order-free exact int64 and the DuckDB oracle
(five unrolled CTE iterations of the same integer expressions)
reproduces every rank bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

TEXTRANK_ITERS = 5
TEXTRANK_SCALE = 10 ** 12   # integer rank micro-units
TEXTRANK_TOPK = 20


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _edge_partial(batch: pa.Table) -> pa.Table:
    """Per-batch reduced directed-edge partials: every adjacent token
    pair contributes (u, v, 1) AND (v, u, 1); reduced to distinct
    (u, v, w) within the batch — the combiner before the edge shuffle."""
    from .corpus import _flatten_tokens
    flat, doc_idx = _flatten_tokens(batch["text"].to_pylist())
    T = len(flat)
    if T < 2:
        return pa.table({"u": pa.array([], pa.string()),
                         "v": pa.array([], pa.string()),
                         "w": pa.array([], pa.int64())})
    same_doc = doc_idx[:-1] == doc_idx[1:]
    left = flat[:-1][same_doc]
    right = flat[1:][same_doc]
    u = np.concatenate([left, right])
    v = np.concatenate([right, left])
    # reduce (u, v) pairs: one factorize over the joined key (space
    # is a safe separator — tokens are split on single spaces, so no
    # token ever contains one; numpy U-dtype would silently drop \x00)
    key = np.char.add(np.char.add(u.astype(str), " "), v.astype(str))
    codes, uniq = pd.factorize(key)
    w = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    split = np.char.partition(uniq.astype(str), " ")
    return pa.table({"u": pa.array(split[:, 0], pa.string()),
                     "v": pa.array(split[:, 2], pa.string()),
                     "w": pa.array(w)})


def textrank_tokens(sf_dir: str, iters: int = TEXTRANK_ITERS,
                    topk: int = TEXTRANK_TOPK) -> pd.DataFrame:
    """Top-``topk`` tokens of the corpus co-occurrence graph by
    ``iters`` damped PageRank iterations (d = 0.85), exact integer
    micro-unit arithmetic. Returns (token, rank_units) ordered by
    (rank_units DESC, token ASC).

    The co-occurrence graph is undirected, so every node has at least
    one incoming edge and the dangling-mass term vanishes — the reason
    the update needs no global leak correction."""
    import ray

    edges = (_read_docs(sf_dir, columns=["text"])
             .map_batches(_edge_partial, batch_format="pyarrow")
             .groupby(["u", "v"])
             .aggregate(Sum("w", alias_name="w"))
             .materialize())   # vocab^2-bounded; iterated over 5x

    deg = edges.groupby("u").aggregate(Sum("w", alias_name="d")).to_pandas()
    deg = deg.sort_values("u").reset_index(drop=True)
    nodes = deg["u"].to_numpy(dtype=object)
    degs = deg["d"].to_numpy(dtype=np.int64)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "rank_units": pd.Series([], dtype=np.int64)})
    base = (15 * (TEXTRANK_SCALE // n)) // 100
    rank = np.full(n, TEXTRANK_SCALE // n, dtype=np.int64)

    for _ in range(iters):
        contrib = rank // degs               # r(u) // deg(u), exact
        bc = ray.put((nodes, contrib))

        def step(batch: pa.Table, _bc=bc) -> pa.Table:
            nds, ctr = ray.get(_bc)
            uu = batch["u"].to_numpy(zero_copy_only=False).astype(object)
            vv = batch["v"].to_numpy(zero_copy_only=False).astype(object)
            ww = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            iu = np.searchsorted(nds, uu)
            s = ww * ctr[iu]
            codes, uniq = pd.factorize(vv)
            sv = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sv, codes, s)
            return pa.table({"v": pa.array(uniq, pa.string()),
                             "s": pa.array(sv)})

        st = (edges.map_batches(step, batch_format="pyarrow")
                   .groupby("v").aggregate(Sum("s", alias_name="s"))
                   .to_pandas().sort_values("v").reset_index(drop=True))
        # undirected graph: every node receives mass, so st covers nodes
        assert len(st) == n and (st["v"].to_numpy(dtype=object)
                                 == nodes).all()
        rank = base + (85 * st["s"].to_numpy(dtype=np.int64)) // 100

    out = pd.DataFrame({"token": nodes, "rank_units": rank})
    out = out.sort_values(["rank_units", "token"],
                          ascending=[False, True]).head(topk)
    out["rank_units"] = out["rank_units"].astype(np.int64)
    return out.reset_index(drop=True)


def _textrank_sql(iters: int = TEXTRANK_ITERS,
                  topk: int = TEXTRANK_TOPK) -> str:
    scale = TEXTRANK_SCALE
    prev = "r0"
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
r{i} AS (
  SELECT e.v AS u,
         ((15 * ({scale} // nn.n)) // 100
          + (85 * SUM(e.w * ({prev}.r // deg.d))) // 100)::BIGINT AS r
  FROM e JOIN {prev} ON e.u = {prev}.u JOIN deg ON e.u = deg.u
  CROSS JOIN nn GROUP BY e.v, nn.n)""")
        prev = f"r{i}"
    return f"""
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents),
p AS (
  SELECT toks[s] AS u, toks[s + 1] AS v
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS s
        FROM t)),
e AS (
  SELECT u, v, COUNT(*)::BIGINT AS w
  FROM (SELECT p.u AS u, p.v AS v FROM p
        UNION ALL SELECT p.v AS u, p.u AS v FROM p)
  GROUP BY u, v),
deg AS (SELECT u, SUM(w)::BIGINT AS d FROM e GROUP BY u),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM deg),
r0 AS (SELECT u, ({scale} // n)::BIGINT AS r FROM deg CROSS JOIN nn),
{",".join(steps)}
SELECT u AS token, r AS rank_units FROM {prev}
ORDER BY rank_units DESC, token ASC LIMIT {topk}
"""


TEXTRANK_TOKENS_SQL = _textrank_sql()


# ---------------------------------------------------------------------------
# triangle counting / clustering structure — the third classic
# distributed graph kernel beside PageRank (here) and connected
# components (dedup.connected_components)
# ---------------------------------------------------------------------------

def token_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle counts of the (distinct, self-loop-free)
    token co-occurrence graph: (token, n_triangles), every node
    present, ordered by token.

    Edge-iterator shape: the distinct edge table (vocab²-bounded, one
    groupby) streams through ``map_batches`` while the adjacency
    structure — CSR arrays over the node set, the legitimate small
    side for a token graph — is broadcast once; each edge (u, v)
    emits one partial row per common neighbor w (the apex of a
    triangle through that edge), and a token-keyed groupby sums them.
    Every triangle {a,b,c} is found exactly three times, once per
    edge, each time crediting the OPPOSITE vertex — so the grouped
    sums ARE the per-node triangle counts, no /3 correction. At
    web scale the broadcast swaps for the degree-ordered node
    iterator (adjacency shuffled with the edges); the emit-per-common-
    neighbor partial shape is unchanged."""
    import ray

    edges = (_read_docs(sf_dir, columns=["text"])
             .map_batches(_edge_partial, batch_format="pyarrow")
             .groupby(["u", "v"])
             .aggregate(Sum("w", alias_name="w")))

    # adjacency CSR from the reduced edge table (node-sized driver
    # pull, like the PageRank rank vector)
    et = edges.to_pandas()
    et = et[et["u"] != et["v"]]
    nodes = np.unique(np.concatenate([et["u"].to_numpy(dtype=object),
                                      et["v"].to_numpy(dtype=object)]))
    iu = np.searchsorted(nodes, et["u"].to_numpy(dtype=object))
    iv = np.searchsorted(nodes, et["v"].to_numpy(dtype=object))
    order = np.lexsort((iv, iu))
    iu, iv = iu[order], iv[order]
    starts = np.searchsorted(iu, np.arange(len(nodes) + 1))
    bc = ray.put((nodes, iu, iv, starts))

    def tri_partial(b: pa.Table) -> pa.Table:
        nds, su, sv, st = ray.get(bc)
        uu = np.searchsorted(nds, b["u"].to_numpy(
            zero_copy_only=False).astype(object))
        vv = np.searchsorted(nds, b["v"].to_numpy(
            zero_copy_only=False).astype(object))
        cnt = np.zeros(len(nds), dtype=np.int64)
        for x, y in zip(uu, vv):
            if x >= y:          # one orientation per undirected edge
                continue
            common = np.intersect1d(sv[st[x]:st[x + 1]],
                                    sv[st[y]:st[y + 1]],
                                    assume_unique=True)
            if len(common):
                np.add.at(cnt, common, 1)
        nz = np.flatnonzero(cnt)
        return pa.table({"token": pa.array(nds[nz], pa.string()),
                         "n": pa.array(cnt[nz])})

    got = (edges.map_batches(tri_partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    out = pd.DataFrame({"token": nodes})
    out = out.merge(got, on="token", how="left").fillna(0)
    out["n_triangles"] = out["n"].astype(np.int64)
    return (out[["token", "n_triangles"]]
            .sort_values("token").reset_index(drop=True))


TOKEN_TRIANGLES_SQL = """
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents),
p AS (
  SELECT toks[s] AS u, toks[s + 1] AS v
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS s
        FROM t)),
e AS (
  SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
  FROM p WHERE u != v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
n AS (SELECT a AS token FROM e UNION SELECT b FROM e),
c AS (
  SELECT tok AS token, COUNT(*)::BIGINT AS cnt
  FROM (SELECT x AS tok FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY tok)
SELECT n.token, COALESCE(c.cnt, 0)::BIGINT AS n_triangles
FROM n LEFT JOIN c USING (token) ORDER BY n.token
"""


# ---------------------------------------------------------------------------
# k-core decomposition — parallel peeling over the token co-occurrence
# graph (the k-core is UNIQUE, so round-parallel deletion equals
# sequential peeling — the property the oracle check rests on)
# ---------------------------------------------------------------------------

KCORE_K = 8


def _distinct_edges(sf_dir: str):
    """Materialized distinct directed edge table (u, v) both ways —
    the weight is irrelevant to coreness; after the groupby each row
    is one distinct neighbor relation, so degree(u) = row count."""
    return (_read_docs(sf_dir, columns=["text"])
            .map_batches(_edge_partial, batch_format="pyarrow")
            .groupby(["u", "v"])
            .aggregate(Sum("w", alias_name="w"))
            .materialize())


def kcore_tokens(sf_dir: str, k: int = KCORE_K) -> pd.DataFrame:
    """Members of the k-core of the token co-occurrence graph with
    their within-core degree: the maximal subgraph where every token
    has ≥ k distinct co-occurring neighbors that are themselves in
    the subgraph.

    Distributed shape: parallel peeling. Each round streams the
    distinct edge table once, counting per-node surviving-neighbor
    degrees against the BROADCAST alive set (vocabulary-sized — the
    same legitimate small side as the PageRank rank vector), then
    drops every node under k at once. Round-parallel deletion yields
    the same fixpoint as one-at-a-time peeling because the k-core is
    unique — which is exactly what the sequential oracle verifies.
    Rounds are worst-case O(n) on adversarial path graphs but a
    handful in practice; the corpus is read once (edge build), never
    per round."""
    import ray

    edges = _distinct_edges(sf_dir)
    alive: np.ndarray | None = None   # None = every node
    while True:
        bc = ray.put(alive)

        def deg_partial(batch: pa.Table, _bc=bc) -> pa.Table:
            al = ray.get(_bc)
            uu = batch["u"].to_numpy(zero_copy_only=False).astype(object)
            vv = batch["v"].to_numpy(zero_copy_only=False).astype(object)
            if al is not None:
                keep = np.isin(uu, al) & np.isin(vv, al)
                uu = uu[keep]
            codes, uniq = pd.factorize(uu)
            d = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
            return pa.table({"u": pa.array(uniq, pa.string()),
                             "d": pa.array(d)})

        deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
               .groupby("u").aggregate(Sum("d", alias_name="d"))
               .to_pandas())
        nxt = np.sort(deg.loc[deg["d"] >= k, "u"]
                      .to_numpy(dtype=object))
        if alive is not None and len(nxt) == len(alive) \
                and (nxt == alive).all():
            out = deg[deg["d"] >= k].rename(columns={"u": "token",
                                                     "d": "core_deg"})
            out["core_deg"] = out["core_deg"].astype(np.int64)
            return (out.sort_values("token").reset_index(drop=True)
                    [["token", "core_deg"]])
        if len(nxt) == 0:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "core_deg": pd.Series([], dtype=np.int64)})
        alive = nxt


def kcore_oracle_sequential(edges_df: pd.DataFrame,
                            k: int = KCORE_K) -> pd.DataFrame:
    """Sequential one-node-at-a-time peeling (the textbook algorithm)
    over a collected distinct-edge table — the independent derivation
    path the distributed rounds are checked against."""
    nbrs: dict[str, set] = {}
    for u, v in zip(edges_df["u"], edges_df["v"]):
        nbrs.setdefault(u, set()).add(v)
    changed = True
    while changed:
        changed = False
        for u in list(nbrs):
            if len(nbrs[u]) < k:
                for v in nbrs.pop(u):
                    s = nbrs.get(v)
                    if s is not None:
                        s.discard(u)
                changed = True
    out = pd.DataFrame({"token": sorted(nbrs),
                        "core_deg": [len(nbrs[t]) for t in sorted(nbrs)]})
    out["core_deg"] = out["core_deg"].astype(np.int64)
    return out

"""datapipe operators vs DuckDB oracles + invariants (sf0.001)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/lineitem.parquet"), reason="no testdata")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def _assert_match(mine: pd.DataFrame, sql: str, con) -> None:
    oracle = con.execute(sql).fetchdf()
    a, b = _canon(mine), _canon(oracle)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating):
            assert np.array_equal(av.astype(float), bv.astype(float)), c
        else:
            assert (av == bv).all(), c


def test_pricing_summary_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.pricing_summary(SF),
                  relational.PRICING_SUMMARY_SQL, con)


def test_revenue_by_nation_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.revenue_by_nation(SF),
                  relational.REVENUE_BY_NATION_SQL, con)


def test_supplier_balance_by_nation_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.supplier_balance_by_nation(SF),
                  relational.SUPPLIER_BALANCE_BY_NATION_SQL, con)


def test_set_ops_exact(con):
    from spatial_aez_ray.datapipe import relational
    inter = relational.users_intersect_customers(SF)
    _assert_match(inter, relational.USERS_INTERSECT_CUSTOMERS_SQL, con)
    exc = relational.customers_except_users(SF)
    _assert_match(exc, relational.CUSTOMERS_EXCEPT_USERS_SQL, con)
    # partition: intersect + except_customers == all customers
    n_cust = con.execute(
        "SELECT COUNT(DISTINCT c_custkey) FROM customer").fetchone()[0]
    assert len(inter) + len(exc) == n_cust
    assert not inter["user_id"].duplicated().any()


def test_user_journey_paths_exact(con):
    from spatial_aez_ray.datapipe import temporal
    out = temporal.user_journey_paths(SF)
    _assert_match(out, temporal.USER_JOURNEY_PATHS_SQL, con)
    users = con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert out["n_users"].sum() == users  # one path per user
    assert (out["path"].str.count("->") <= 7).all()  # 8-step truncation


def test_price_histogram_exact(con):
    from spatial_aez_ray.datapipe import relational
    out = relational.price_histogram(SF)
    _assert_match(out, relational.PRICE_HISTOGRAM_SQL, con)
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert out["n"].sum() == total  # every row lands in exactly one bin


def test_local_supplier_revenue_exact(con):
    from spatial_aez_ray.datapipe import relational
    out = relational.local_supplier_revenue(SF)
    _assert_match(out, relational.LOCAL_SUPPLIER_REVENUE_SQL, con)
    # the co-nation predicate is selective: strictly fewer lineitems
    # than the unfiltered fact table
    import duckdb  # noqa: F401 (con fixture owns the connection)
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert 0 < out["lineitem_cnt"].sum() < total


def test_events_daily_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.events_daily(SF),
                  relational.EVENTS_DAILY_SQL, con)


def test_token_and_quality_exact(con):
    from spatial_aez_ray.datapipe import text
    _assert_match(text.token_stats(SF), text.TOKEN_STATS_SQL, con)
    _assert_match(text.quality_scores(SF), text.QUALITY_SCORES_SQL, con)


def test_exact_dedup_matches_sql_and_is_idempotent(con):
    from spatial_aez_ray.datapipe import dedup
    mine = dedup.exact_dedup(SF)
    _assert_match(mine, dedup.EXACT_DEDUP_SQL, con)
    # survivors are unique doc_ids; dup counts >= 1
    assert mine["doc_id"].is_unique
    assert (mine["dup_cnt"] >= 1).all()


def test_ann_topk_matches_numpy_oracle():
    """Brute-force distributed top-k == single-process numpy top-k."""
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.ann_topk(SF, n_queries=3, k=5)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.array([np.asarray(v) for v in
                  t["embedding"].to_pylist()], dtype=np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi in range(3):
        cos = mn @ mn[qi]
        order = [int(ids[i]) for i in np.lexsort((ids, -cos))
                 if ids[i] != ids[qi]][:5]
        got = list(mine[mine["query_id"] == ids[qi]]
                   .sort_values("rank")["neighbor_id"])
        assert got == order, f"query {ids[qi]}"


def test_minhash_lsh_finds_exact_dups_and_keeps_distinct():
    """LSH near-dup detection must (a) bucket identical texts together,
    (b) never merge everything into one component."""
    from spatial_aez_ray.datapipe import dedup
    surv = dedup.minhash_lsh_dedup(SF)
    exact = dedup.exact_dedup(SF)
    # exact dups are trivially near-dups: survivors <= exact survivors
    assert len(surv) <= len(exact)
    assert len(surv) > 1
    assert surv["component_size"].sum() == duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]


def test_connected_components_distributed_matches_union_find():
    """The distributed min-label CC (the >2M-pair scale path) must
    produce the same node->root labels as the driver union-find that
    handles small pair lists."""
    from spatial_aez_ray.datapipe import dedup
    pairs = dedup.minhash_candidates_ds(SF).materialize()
    if pairs.count() == 0:
        pytest.skip("no candidate pairs at this sf")
    labels = dedup.connected_components(pairs).to_pandas()
    want = dedup._union_find_roots(pairs.to_pandas())
    got = dict(zip(labels["node"].astype(int), labels["label"].astype(int)))
    # union-find only records nodes it re-parented; fill self-roots
    for n in got:
        want.setdefault(n, n)
    assert got == want


def test_minhash_lsh_dedup_distributed_cc_path_matches():
    """Force the distributed-CC branch and check it returns the exact
    same survivor table as the (default) driver union-find branch."""
    from spatial_aez_ray.datapipe import dedup
    a = dedup.minhash_lsh_dedup(SF)
    old = dedup._CC_DRIVER_MAX_PAIRS
    dedup._CC_DRIVER_MAX_PAIRS = 0
    try:
        b = dedup.minhash_lsh_dedup(SF)
    finally:
        dedup._CC_DRIVER_MAX_PAIRS = old
    pd.testing.assert_frame_equal(a, b)


def test_simhash_pairs_are_symmetric_unique():
    from spatial_aez_ray.datapipe import dedup
    pairs = dedup.simhash_dedup(SF)
    assert (pairs["doc_lo"] < pairs["doc_hi"]).all()
    assert not pairs.duplicated(["doc_lo", "doc_hi"]).any()


def test_media_features_schema_and_determinism():
    from spatial_aez_ray.datapipe import multimodal
    a = multimodal.media_features(SF)
    b = multimodal.media_features(SF)
    assert list(a.columns) == ["doc_id", "n_bytes", "width", "height",
                               "feat_sum"]
    pd.testing.assert_frame_equal(a, b)
    # the fake decode's histogram covers every byte exactly once
    assert (a["feat_sum"] == a["n_bytes"]).all()


def test_stub_decoder_real_path_raises():
    from spatial_aez_ray.datapipe.multimodal import StubImageDecoder
    with pytest.raises(NotImplementedError):
        StubImageDecoder().decode_real(b"\xff\xd8\xff")


def test_sessionize_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.sessionize(SF), temporal.SESSIONIZE_SQL, con)


def test_asof_join_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.asof_join_events_orders(SF),
                  temporal.ASOF_JOIN_SQL, con)


def test_embedding_neardup_matches_sql(con):
    from spatial_aez_ray.datapipe import simsearch
    _assert_match(simsearch.embedding_neardup(SF),
                  simsearch.EMBEDDING_NEARDUP_SQL, con)


def test_native_hash_join_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.revenue_by_mktsegment(SF),
                  relational.REVENUE_BY_MKTSEGMENT_SQL, con)


def test_distinct_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.distinct_order_priorities(SF),
                  relational.DISTINCT_ORDER_PRIORITIES_SQL, con)


def test_embedding_neardup_lsh_vs_bruteforce(tmp_path):
    """The LSH-bucketed near-dup scale path must find only REAL pairs
    (exact cosine verify => precision 1.0) and nearly all of them
    (16-table LSH at cos>=0.9 => recall >=0.9; deterministic seed).
    Testdata embeddings have no high-cos pairs, so run over a synthetic
    clustered table: 40 base vectors, each with 2 noisy near-copies."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import simsearch
    rng = np.random.RandomState(3)
    base = rng.normal(size=(40, 32))
    vecs, vid = [], 0
    for b_ in base:
        for _ in range(3):  # base + 2 near-dups
            v = b_ + rng.normal(scale=0.03, size=32)
            vecs.append(v / np.linalg.norm(v))
            vid += 1
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.repeat(np.arange(40), 3).astype(np.int32)),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)
    brute = simsearch.embedding_neardup(sf, threshold=0.9)
    lsh = simsearch.embedding_neardup_lsh(sf, threshold=0.9)
    total_b = int(brute["pair_cnt"].sum())
    total_l = int(lsh["pair_cnt"].sum())
    assert total_b >= 40  # the fixture really contains near-dups
    b = dict(zip(brute["vec_id"], brute["pair_cnt"]))
    for _, r in lsh.iterrows():  # precision 1.0
        assert r["pair_cnt"] <= b.get(r["vec_id"], 0), r["vec_id"]
    assert total_l / total_b >= 0.9, (total_l, total_b)


def test_embedding_neardup_lsh_empty_schema_stable():
    """Zero qualifying pairs must yield an empty frame with the same
    columns (the gate hashes schemas)."""
    from spatial_aez_ray.datapipe import simsearch
    out = simsearch.embedding_neardup_lsh(SF, threshold=0.99)
    assert list(out.columns) == ["vec_id", "pair_cnt", "hi_checksum"]


def test_ann_ivf_recall_vs_bruteforce():
    """IVF with n_probe=all lists must equal brute force exactly; with
    fewer probes recall@10 should stay high on this data."""
    from spatial_aez_ray.datapipe import simsearch
    exact = simsearch.ann_topk(SF, n_queries=3, k=10)
    full = simsearch.ann_ivf(SF, n_queries=3, k=10, n_lists=8, n_probe=8)
    for q in exact["query_id"].unique():
        want = list(exact[exact["query_id"] == q]
                    .sort_values("rank")["neighbor_id"])
        got = list(full[full["query_id"] == q]
                   .sort_values("rank")["neighbor_id"])
        assert got == want, q
    probed = simsearch.ann_ivf(SF, n_queries=3, k=10, n_lists=8, n_probe=4)
    hits = 0
    for q in exact["query_id"].unique():
        want = set(exact[exact["query_id"] == q]["neighbor_id"])
        got = set(probed[probed["query_id"] == q]["neighbor_id"])
        hits += len(want & got)
    assert hits / (3 * 10) >= 0.5  # probing half the lists


def test_stub_embedder_deterministic_and_normalized():
    from spatial_aez_ray.datapipe import multimodal
    a = multimodal.embed_documents(SF)
    b = multimodal.embed_documents(SF)
    pd.testing.assert_frame_equal(a, b)
    assert (a["dim"] == 32).all()


def test_rolling_fingerprints_match_sql(con):
    from spatial_aez_ray.datapipe import text
    _assert_match(text.rolling_fingerprints(SF),
                  text.ROLLING_FINGERPRINTS_SQL, con)


def test_lang_id_matches_sql(con):
    from spatial_aez_ray.datapipe import text
    _assert_match(text.lang_id(SF), text.LANG_ID_SQL, con)


def test_simhash_matches_sql(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.simhash_dedup(SF), dedup.SIMHASH_DEDUP_SQL, con)


def test_minhash_candidates_match_sql(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.minhash_candidates(SF),
                  dedup.MINHASH_CANDIDATES_SQL, con)


def test_minhash_lsh_dedup_matches_sql(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.minhash_lsh_dedup(SF),
                  dedup.MINHASH_LSH_DEDUP_SQL, con)


def test_ngram_jaccard_matches_sql(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.ngram_jaccard_dedup(SF),
                  dedup.NGRAM_JACCARD_SQL, con)


def test_knn_label_vote_matches_sql(con):
    from spatial_aez_ray.datapipe import simsearch
    _assert_match(simsearch.knn_label_vote(SF),
                  simsearch.KNN_LABEL_VOTE_SQL, con)


def test_media_features_matches_sql(con):
    from spatial_aez_ray.datapipe import multimodal
    _assert_match(multimodal.media_features(SF),
                  multimodal.MEDIA_FEATURES_SQL, con)


def test_ann_lsh_multiprobe_recall_dominates():
    """Multi-probe widens the candidate set and can only improve recall
    vs the exact brute-force top-k (candidate sets are supersets)."""
    from spatial_aez_ray.datapipe import simsearch
    exact = simsearch.ann_topk(SF, n_queries=3, k=10)
    plain = simsearch.ann_lsh(SF, n_queries=3, k=10)
    probed = simsearch.ann_lsh(SF, n_queries=3, k=10, multiprobe=1)

    def recall(approx):
        hits = 0
        for qid in exact["query_id"].unique():
            want = set(exact[exact["query_id"] == qid]["neighbor_id"])
            got = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(want & got)
        return hits / (3 * 10)

    # candidate counts are supersets per query
    pc = dict(zip(plain["query_id"], plain["n_candidates"]))
    for qid, n in zip(probed["query_id"], probed["n_candidates"]):
        assert n >= pc.get(qid, 0)
    assert recall(probed) >= recall(plain)


def test_hot_bucket_block_walk_yields_all_pairs():
    """A boilerplate LSH bucket 10x the block edge loses NO candidate
    pairs: the block walk covers the full upper triangle (the cap is a
    pathological fallback, not the mechanism)."""
    import pandas as pd
    from spatial_aez_ray.datapipe import dedup

    n = dedup._MAX_BUCKET * 10
    ids = [f"doc{i:06d}" for i in range(n)]
    group = pd.DataFrame({"band_key": np.zeros(n, dtype=np.int64),
                          "doc_id": ids})
    out = dedup._partition_pairs(group)
    assert len(out) == n * (n - 1) // 2
    # spot-check exact content on a smaller bucket against plain triu
    m = 700  # > 2 blocks, not a multiple of the edge
    small = dedup._partition_pairs(
        pd.DataFrame({"band_key": np.zeros(m, dtype=np.int64),
                      "doc_id": [f"d{i:04d}" for i in range(m)]}))
    a = np.array([f"d{i:04d}" for i in range(m)])
    iu, ju = np.triu_indices(m, k=1)
    want = pd.DataFrame({"doc_lo": a[iu], "doc_hi": a[ju]})
    got = small.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)
    want = want.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)
    assert got.equals(want)


def test_iter_bucket_blocks_partition_exact():
    from spatial_aez_ray.datapipe.dedup import (
        _block_pair_indices, _iter_bucket_blocks)

    for n in (1, 2, 5, 16, 17, 33):
        seen = set()
        for r0, r1, c0, c1 in _iter_bucket_blocks(n, block=16):
            ii, jj = _block_pair_indices(r0, r1, c0, c1)
            for i, j in zip(ii.tolist(), jj.tolist()):
                assert i < j
                assert (i, j) not in seen
                seen.add((i, j))
        assert len(seen) == n * (n - 1) // 2


def test_simhash_hot_bucket_blocks_match_direct():
    """Blocked Hamming filtering == direct triu filtering on a bucket
    bigger than the block edge."""
    import pandas as pd
    from spatial_aez_ray.datapipe import dedup

    rng = np.random.RandomState(5)
    n = 600
    hs = rng.randint(-2**62, 2**62, size=n).astype(np.int64)
    hs[100:300] = hs[99]          # boilerplate run -> dist 0 clique
    ids = np.array([f"s{i:04d}" for i in range(n)])
    g = pd.DataFrame({"band_key": np.zeros(n, dtype=np.int64),
                      "doc_id": ids, "simhash": hs})
    out = dedup._simhash_partition_pairs(g, max_dist=3)
    u = hs.astype(np.uint64)
    iu, ju = np.triu_indices(n, k=1)
    x = u[iu] ^ u[ju]
    dist = np.zeros(len(x), dtype=np.int64)
    while x.any():
        dist += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    keep = dist <= 3
    want = pd.DataFrame({"doc_lo": ids[iu[keep]], "doc_hi": ids[ju[keep]]})
    got = out.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)
    want = want.sort_values(["doc_lo", "doc_hi"]).reset_index(drop=True)
    assert got.equals(want)


def test_neardup_hot_bucket_blocks_match_direct():
    import pandas as pd
    from spatial_aez_ray.datapipe import simsearch

    rng = np.random.RandomState(6)
    n, d = 1300, 16   # > 2 cosine blocks of 512
    e = rng.randn(n, d)
    e[50:400] = e[49]  # boilerplate clones
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    g = pd.DataFrame({"band_key": np.zeros(n, dtype=np.int64),
                      "vec_id": np.arange(n, dtype=np.int64),
                      "emb": list(e)})
    out = simsearch._neardup_partition_pairs(g, threshold=0.9)
    cos = e @ e.T
    iu, ju = np.triu_indices(n, k=1)
    keep = cos[iu, ju] >= 0.9
    want = pd.DataFrame({"vec_lo": iu[keep].astype(np.int64),
                         "vec_hi": ju[keep].astype(np.int64)})
    got = out.sort_values(["vec_lo", "vec_hi"]).reset_index(drop=True)
    want = want.sort_values(["vec_lo", "vec_hi"]).reset_index(drop=True)
    assert len(got) == len(want) and got.equals(want)


def test_doc_output_sinks_write_parts(tmp_path, ray_session):
    """The *_ds sink forms stream per-doc results to partitioned
    parquet (one part per block, footer-summarized) — no driver-wide
    to_pandas — and the parts hold exactly the eager variant's rows."""
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import text
    from spatial_aez_ray.datapipe.util import write_doc_output

    for name, ds_fn, eager in [
            ("token_stats", text.token_stats_ds, text.token_stats),
            ("quality_scores", text.quality_scores_ds, text.quality_scores),
            ("fingerprints", text.fingerprints_ds, text.fingerprints),
            ("rolling_fp", text.rolling_fingerprints_ds,
             text.rolling_fingerprints),
            ("lang_id", text.lang_id_ds, text.lang_id)]:
        out = str(tmp_path / name)
        rep = write_doc_output(ds_fn(SF), out)
        assert rep["rows"] == 500 and rep["files"] >= 1, name
        got = (pq.ParquetDataset(out).read().to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = eager(SF)
        got = got[want.columns.tolist()]
        pd.testing.assert_frame_equal(got, want, check_like=False)


def test_embed_to_embeddings_table_feeds_ann(tmp_path, ray_session):
    """Pipeline composition: documents -> stub encoder -> embeddings
    table on disk -> ANN consumes it unchanged and deterministically."""
    from spatial_aez_ray.datapipe import multimodal, simsearch

    out = str(tmp_path / "world")
    rep = multimodal.embed_documents_to_embeddings(SF, out)
    assert rep["rows"] == 500
    topk = simsearch.ann_topk(out, n_queries=4, k=5)
    assert len(topk) == 20
    assert set(topk["query_id"]).issubset(set(range(500)))
    # deterministic across runs
    assert topk.equals(simsearch.ann_topk(out, n_queries=4, k=5))
    # checksums line up with the gate adapter's per-doc sums
    emb = multimodal.embed_documents(SF)
    assert (emb["dim"] == 32).all() and len(emb) == 500


def test_vocab_top_tokens_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    _assert_match(corpus.vocab_top_tokens(SF), corpus.VOCAB_TOP_TOKENS_SQL,
                  con)


def test_sample_documents_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.sample_documents(SF)
    _assert_match(mine, corpus.SAMPLE_DOCUMENTS_SQL, con)
    # deterministic: independent of partitioning/run
    assert mine.equals(corpus.sample_documents(SF))


def test_pack_sequences_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.pack_sequences(SF)
    _assert_match(mine, corpus.PACK_SEQUENCES_SQL, con)
    # scan invariants: seq ids non-decreasing in doc order; no sequence
    # starts except when the running budget rolls over
    s = mine["seq_id"].to_numpy()
    assert (np.diff(s) >= 0).all()
    assert s[0] == 0


def test_group_topk_orders_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.group_topk_orders(SF)
    _assert_match(mine, relational.GROUP_TOPK_ORDERS_SQL, con)
    assert (mine.groupby("o_custkey")["rnk"].max() <= 3).all()


def test_quantiles_by_returnflag_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.quantiles_by_returnflag(SF),
                  relational.QUANTILES_BY_RETURNFLAG_SQL, con)


def test_frame_sample_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import multimodal
    mine = multimodal.frame_sample(SF)
    _assert_match(mine, multimodal.FRAME_SAMPLE_SQL, con)
    # fanout sanity: every doc contributes >=1 frame row, idx stride 4
    assert (mine["frame_idx"] % 4 == 0).all()
    assert mine["doc_id"].nunique() == 500


def test_tfidf_top_token_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.tfidf_top_token(SF)
    _assert_match(mine, corpus.TFIDF_TOP_TOKEN_SQL, con)
    # quantized-integer scores: exact arithmetic, no float anywhere
    assert mine["score"].dtype == np.int64


def test_range_join_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.range_join_events_orders(SF)
    _assert_match(mine, temporal.RANGE_JOIN_SQL, con)
    # window counts are bounded by the user's total orders
    assert (mine["win_orders"] >= 0).all()
    assert (mine.loc[mine["win_orders"] == 0, "win_cents"] == 0).all()


def test_chunk_documents_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.chunk_documents(SF)
    _assert_match(mine, corpus.CHUNK_DOCUMENTS_SQL, con)
    # flat-map shape: every doc yields >=1 chunk; a non-last chunk has
    # a successor starting stride tokens in, so it holds > stride
    # tokens (only the doc tail can truncate below that)
    assert mine["doc_id"].nunique() == 500
    assert (mine["n_tokens"] <= corpus.CHUNK_TOKENS).all()
    last = mine.groupby("doc_id")["chunk_idx"].transform("max")
    nonlast = mine["chunk_idx"] < last
    assert (mine.loc[nonlast, "n_tokens"] > corpus.CHUNK_STRIDE).all()


def test_stratified_sample_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.stratified_sample(SF)
    _assert_match(mine, corpus.STRATIFIED_SAMPLE_SQL, con)
    # fixed-size per stratum (every lang has >= n docs at sf0.001)
    assert (mine.groupby("lang")["rnk"].count()
            == corpus.STRATA_SAMPLE_N).all()
    # reproducible across runs / partitioning
    assert mine.equals(corpus.stratified_sample(SF))


def test_kmv_distinct_matches_sql_and_estimates(con, ray_session):
    from spatial_aez_ray.datapipe import sketch
    mine = sketch.kmv_distinct_parts(SF)
    _assert_match(mine, sketch.KMV_DISTINCT_PARTS_SQL, con)
    # the estimate should land within ~3 standard errors (1/sqrt(k-2))
    # of the true distinct count for every filled sketch
    truth = con.execute(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd "
        "FROM lineitem GROUP BY 1 ORDER BY 1").fetchdf()
    merged = mine.merge(truth, on="l_returnflag")
    filled = merged[merged["n_hashes"] == sketch.KMV_K]
    rel_err = 3.0 / np.sqrt(sketch.KMV_K - 2)
    assert (abs(filled["est_distinct"] - filled["nd"])
            <= rel_err * filled["nd"]).all()


def test_mixture_sample_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.mixture_sample(SF)
    _assert_match(mine, corpus.MIXTURE_SAMPLE_SQL, con)
    # upweighted (even-numbered) sources should dominate the mix ~4:1
    even = mine["source"].str[3:].astype(int) % 2 == 0
    assert even.sum() > (~even).sum()
    # deterministic under re-run
    assert mine.equals(corpus.mixture_sample(SF))


def test_boilerplate_ngrams_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import text
    mine = text.boilerplate_ngrams(SF)
    _assert_match(mine, text.BOILERPLATE_NGRAMS_SQL, con)
    assert (mine["n_boiler"] <= mine["n_windows"]).all()
    # the corpus has exact-duplicate docs (dedup fixtures), so some
    # boilerplate must exist
    assert mine["n_boiler"].sum() > 0


def test_duplicate_spans_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import text
    mine = text.duplicate_spans(SF)
    _assert_match(mine, text.DUPLICATE_SPANS_SQL, con)
    # spans are maximal and well-formed
    assert (mine["span_len"]
            == mine["span_end"] - mine["span_start"] + 1).all()
    assert (mine["span_len"] >= text.DUPSPAN_N).all()
    # exact-duplicate docs exist in the corpus -> whole-doc spans exist
    assert len(mine) > 0
    # maximality: consecutive spans of one doc never touch
    g = mine.groupby("doc_id")
    gap = g["span_start"].shift(-1) - mine["span_end"]
    ok = gap.isna() | (gap > 1)
    assert ok.all()


def test_range_partition_matches_sql_and_writes(con, ray_session, tmp_path):
    import os
    from spatial_aez_ray.datapipe import relational
    mine = relational.range_partition_orders(SF)
    _assert_match(mine, relational.RANGE_PARTITION_ORDERS_SQL, con)
    # buckets cover all orders, ranges are disjoint and ordered
    assert mine["n_rows"].sum() == con.execute(
        "SELECT COUNT(*) FROM orders").fetchone()[0]
    assert (mine["min_cents"] <= mine["max_cents"]).all()
    assert (mine["max_cents"].to_numpy()[:-1]
            <= mine["min_cents"].to_numpy()[1:]).all()
    # partitioned write: one hive subdir per bucket, summary unchanged
    out = str(tmp_path / "range_parts")
    written = relational.range_partition_orders(SF, out_dir=out)
    assert written.equals(mine)
    subdirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert len(subdirs) == len(mine)


def test_bloom_semi_join_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.bloom_semi_join(SF)
    _assert_match(mine, relational.BLOOM_SEMI_JOIN_SQL, con)
    # the bloom prefilter must be lossless end-to-end: row totals match
    # the plain semi-join exactly (verified by the oracle match above);
    # sanity that it actually filtered something
    total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert 0 < mine["n_rows"].sum() < total


def test_bloom_filter_has_no_false_negatives(ray_session):
    import numpy as np
    from spatial_aez_ray.datapipe import relational
    keys = np.arange(1000, 2000, dtype=np.int64)
    words = np.zeros(relational._BLOOM_BITS // 64, dtype=np.uint64)
    pos = relational._bloom_positions(keys).ravel()
    np.bitwise_or.at(words, pos >> np.uint64(6),
                     np.uint64(1) << (pos & np.uint64(63)))
    assert relational._bloom_test(words, keys).all()
    # false-positive rate on disjoint probes stays near theory
    # ((1-e^{-kn/m})^k ~ 2e-4 at n=1000, m=2^17, k=3): well under 1%
    probe = np.arange(50_000, 60_000, dtype=np.int64)
    fp = relational._bloom_test(words, probe).mean()
    assert fp < 0.01


def test_new_doc_output_sinks_write_parts(tmp_path, ray_session):
    """chunk_documents_ds / boilerplate_ngrams_ds stream to partitioned
    parquet like the other *_ds sink forms."""
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import corpus, text
    from spatial_aez_ray.datapipe.util import write_doc_output

    for name, ds_fn, eager, sort_cols in [
            ("chunks", corpus.chunk_documents_ds, corpus.chunk_documents,
             ["doc_id", "chunk_idx"]),
            ("boiler", text.boilerplate_ngrams_ds, text.boilerplate_ngrams,
             ["doc_id"])]:
        out = str(tmp_path / name)
        rep = write_doc_output(ds_fn(SF), out)
        assert rep["files"] >= 1, name
        got = (pq.ParquetDataset(out).read().to_pandas()
               .sort_values(sort_cols).reset_index(drop=True))
        want = eager(SF)
        got = got[want.columns.tolist()]
        pd.testing.assert_frame_equal(got, want, check_like=False)


def test_hll_registers_match_sql_and_estimate(con, ray_session):
    from spatial_aez_ray.datapipe import sketch
    mine = sketch.hll_user_registers(SF)
    _assert_match(mine, sketch.HLL_USER_REGISTERS_SQL, con)
    assert (mine["register"].between(0, sketch.HLL_M - 1)).all()
    assert (mine["max_rho"].between(1, 59)).all()
    # estimate (with small-range correction) lands near the truth
    est = sketch.hll_estimate(mine)
    truth = dict(con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events "
        "GROUP BY 1").fetchall())
    for etype, nd in truth.items():
        assert abs(est[etype] - nd) <= max(3.0, 0.35 * nd)


def test_repetition_stats_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import text
    mine = text.repetition_stats(SF)
    _assert_match(mine, text.REPETITION_STATS_SQL, con)
    assert (mine["n_distinct"] <= mine["n_tokens"]).all()
    assert (mine["top_token_n"] >= 1).all()
    # word-soup fixture docs repeat tokens heavily
    assert (mine["dup_token_n"] > 0).any()


def test_posting_stats_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.posting_stats(SF)
    _assert_match(mine, corpus.POSTING_STATS_SQL, con)
    assert (mine["df"] <= mine["tf_total"]).all()
    assert (mine["doc_min"] <= mine["doc_max"]).all()


def test_boolean_and_search_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.boolean_and_search(SF)
    _assert_match(mine, corpus.BOOLEAN_AND_SEARCH_SQL, con)
    # conjunctive: strict subset of the corpus, and every hit carries
    # at least one occurrence of each of the 3 terms
    assert 0 < len(mine) < 500
    assert (mine["total_tf"] >= len(corpus.SEARCH_TERMS)).all()


def test_inverted_postings_sink_roundtrip(con, ray_session, tmp_path):
    import ray as _ray
    from spatial_aez_ray.datapipe import corpus
    out = str(tmp_path / "postings")
    corpus.write_inverted_postings(SF, out)
    back = (_ray.data.read_parquet(out).to_pandas()
            [["token", "doc_id", "tf"]]
            .sort_values(["token", "doc_id"]).reset_index(drop=True))
    truth = con.execute(
        "WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS "
        "token FROM documents) SELECT token, doc_id, COUNT(*)::BIGINT "
        "AS tf FROM p GROUP BY 1, 2 ORDER BY token, doc_id").fetchdf()
    pd.testing.assert_frame_equal(back, truth, check_dtype=False)
    # every token's posting lives in exactly one bucket directory
    buckets = (_ray.data.read_parquet(out).to_pandas()
               .groupby("token")["bucket"].nunique())
    assert (buckets == 1).all()


def test_funnel_stages_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.funnel_stages(SF)
    _assert_match(mine, temporal.FUNNEL_STAGES_SQL, con)
    # monotone: each stage is a subset of the previous
    assert (mine["n_users"].diff().dropna() <= 0).all()


def test_funnel_part_requires_strict_order():
    from spatial_aez_ray.datapipe.temporal import _funnel_part
    g = pd.DataFrame({
        # user 1: view@1 click@2 purchase@3  -> depth 3
        # user 2: purchase@1 click@2 view@3  -> depth 1 (nothing after)
        # user 3: view@1 click@1 (same ts)   -> depth 1 (strict >)
        # user 4: click@1 only               -> depth 0 (no view)
        "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 4],
        "event_type": ["view", "click", "purchase",
                       "purchase", "click", "view",
                       "view", "click", "click"],
        "ts_us": [1, 2, 3, 1, 2, 3, 1, 1, 1]})
    out = _funnel_part(g).set_index("user_id")["stage_reached"]
    assert out.to_dict() == {1: 3, 2: 1, 3: 1}


def test_bm25_topk_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.bm25_topk(SF)
    _assert_match(mine, corpus.BM25_TOPK_SQL, con)
    assert len(mine) == 20
    # scores strictly ranked, and length-normalization visible: the
    # top doc should not simply be the max-tf doc unless lengths agree
    assert (mine["score_q"].diff().dropna() <= 0).all()
    assert (mine["score_q"] > 0).all()


def test_rrf_fusion_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.rrf_fusion_topk(SF)
    _assert_match(mine, simsearch.RRF_FUSION_SQL, con)
    # every query returns a full fused top-10, strictly rank-ordered
    g = mine.groupby("query_id")
    assert (g["rank"].max() == 10).all()
    assert (g["fused"].apply(lambda s: (s.diff().dropna() <= 0).all())).all()
    # fusion is real: some fused score must combine BOTH systems
    # (strictly greater than the best single-system score possible)
    best_single = simsearch.RRF_SCALE // (simsearch.RRF_K + 1)
    assert (mine["fused"] > best_single).any()


def test_events_props_stats_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.events_props_stats(SF)
    _assert_match(mine, temporal.EVENTS_PROPS_STATS_SQL, con)
    # the extraction really parsed every row: counts add to |events|
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert mine["n_events"].sum() == n_events
    assert (mine["min_k"] <= mine["max_k"]).all()


def test_events_pivot_daily_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.events_pivot_daily(SF)
    _assert_match(mine, temporal.EVENTS_PIVOT_DAILY_SQL, con)
    # wide x type columns partition the event count
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert mine[list(temporal.PIVOT_EVENT_TYPES)].to_numpy().sum() == n_events


def test_inactive_customers_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.inactive_customers_by_nation(SF)
    _assert_match(mine, relational.INACTIVE_CUSTOMERS_SQL, con)
    # sanity: strictly fewer inactive than total customers, and at
    # least one (events cover only a small user-id range)
    n_cust = con.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert 0 < mine["n_inactive"].sum() < n_cust


def test_decontaminate_stats_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.decontaminate_stats(SF)
    _assert_match(mine, corpus.DECONTAMINATE_SQL, con)
    # the test split is the sample_documents 10% bucket
    assert (mine["n_hit"] <= mine["n_grams"]).all()
    assert set(mine["contaminated"].unique()) <= {0, 1}
    # discriminating at k=5: some but not all test docs overlap train
    assert 0 < mine["contaminated"].sum() < len(mine)


def test_decontaminate_flags_planted_duplicate(con, ray_session, tmp_path):
    """A doc copied verbatim across the split boundary must be flagged
    with every shingle hit; an unrelated doc must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import corpus
    from spatial_aez_ray.datapipe.dedup import _h64u
    # find ids on each side of the split
    test_id = next(i for i in range(1000) if _h64u(str(i)) % 100 < 10)
    train_id = next(i for i in range(1000) if _h64u(str(i)) % 100 >= 10)
    train_id2 = next(i for i in range(train_id + 1, 1000)
                     if _h64u(str(i)) % 100 >= 10)
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    tbl = pa.table({
        "doc_id": pa.array([test_id, train_id, train_id2], pa.int64()),
        "text": pa.array([dup, dup, "one two three four five six seven"]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = corpus.decontaminate_stats(str(tmp_path))
    assert list(out["doc_id"]) == [test_id]
    row = out.iloc[0]
    assert row["contaminated"] == 1 and row["n_hit"] == row["n_grams"] == 4


def test_cms_token_counters_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import sketch
    mine = sketch.cms_token_counters(SF)
    _assert_match(mine, sketch.CMS_TOKEN_COUNTERS_SQL, con)
    # every sketch row carries the full token mass exactly
    total = con.execute(
        "SELECT COUNT(*) FROM (SELECT unnest(string_split(text, ' ')) "
        "FROM documents)").fetchone()[0]
    assert (mine.groupby("sketch_row")["cnt"].sum() == total).all()


def test_cms_estimate_never_undercounts(con, ray_session):
    from spatial_aez_ray.datapipe import sketch
    counters = sketch.cms_token_counters(SF)
    exact = dict(con.execute(
        "SELECT tok, COUNT(*) FROM (SELECT unnest(string_split(text, ' '))"
        " AS tok FROM documents) GROUP BY tok").fetchall())
    est = sketch.cms_estimate(counters, list(exact))
    assert all(est[t] >= c for t, c in exact.items())
    # w=256 >> vocab: collisions should be rare enough that most
    # estimates are exact
    exact_hits = sum(1 for t, c in exact.items() if est[t] == c)
    assert exact_hits >= len(exact) * 0.8


def test_pmi_top_pairs_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.pmi_top_pairs(SF)
    _assert_match(mine, corpus.PMI_TOP_PAIRS_SQL, con)
    assert len(mine) == 20
    assert (mine["tok_a"] < mine["tok_b"]).all()
    assert (mine["pair_docs"] >= corpus.PMI_MIN_PAIR_DOCS).all()
    # descending by quantized PMI with deterministic tie-break
    assert (mine["pmi_q"].diff().dropna() <= 0).all()


def test_centroid_outliers_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.centroid_outliers(SF)
    _assert_match(mine, simsearch.CENTROID_OUTLIERS_SQL, con)
    assert len(mine) == simsearch.CENTROID_TOPK
    assert (mine["dist_q"].diff().dropna() <= 0).all()


def test_centroid_outliers_flags_planted_outlier(ray_session, tmp_path):
    """A vector far from its label's cluster must rank first."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import simsearch
    rng = np.random.RandomState(3)
    base = rng.rand(40, 8).astype(np.float32) * 0.01
    base[7] += 0.9   # the planted outlier
    tbl = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "label": pa.array(np.repeat(np.arange(4, dtype=np.int64), 10)),
        "embedding": pa.array([v for v in base.tolist()],
                              type=pa.list_(pa.float32())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = simsearch.centroid_outliers(str(tmp_path), k=5)
    assert out.iloc[0]["vec_id"] == 7


def test_source_quality_report_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import text as t
    mine = t.source_quality_report(SF)
    _assert_match(mine, t.SOURCE_QUALITY_REPORT_SQL, con)
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert mine["n_docs"].sum() == n_docs
    assert (mine["n_short_docs"] <= mine["n_docs"]).all()


def test_corpus_build_manifest_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.corpus_build_manifest(SF)
    _assert_match(mine, corpus.CORPUS_BUILD_MANIFEST_SQL, con)
    assert (mine["n_chunks"] >= mine["kept_docs"]).all()


def test_chunk_corpus_checkpointed_resume_identical(con, ray_session,
                                                    tmp_path):
    import pyarrow.parquet as pq
    import ray as _ray
    from spatial_aez_ray.datapipe import corpus
    # re-write the docs table with small row groups so footer-stats
    # planning yields real multi-shard plans
    src = pq.read_table(f"{SF}/documents.parquet")
    docs_dir = tmp_path / "tables"
    docs_dir.mkdir()
    pq.write_table(src, docs_dir / "documents.parquet", row_group_size=64)
    out = str(tmp_path / "ckpt")

    s1 = corpus.chunk_corpus_checkpointed(str(docs_dir), out, num_shards=4)
    assert len(s1) == 4 and s1["resumed"].sum() == 0
    # totals agree with the independent single-pass chunker
    direct = corpus.chunk_documents(SF)
    gated = con.execute(f"""
        WITH q AS (SELECT doc_id, len(string_split(text,' ')) AS n,
                   len(list_filter(string_split(text,' '),
                       w -> w IN {__import__('spatial_aez_ray.datapipe.text',
                                             fromlist=['STOPWORDS']
                                             ).STOPWORDS!r}))
                     / CAST(GREATEST(len(string_split(text,' ')),1)
                            AS DOUBLE) AS r
                   FROM documents)
        SELECT CAST(COUNT(*) AS BIGINT),
               CAST(SUM((n + 23) // 24) AS BIGINT)
        FROM q WHERE n >= 40 AND r <= 0.06""").fetchone()
    assert s1["docs_kept"].sum() == gated[0]
    assert s1["chunks"].sum() == gated[1]

    parts = str(tmp_path / "ckpt" / "parts")
    read1 = (_ray.data.read_parquet(parts).to_pandas()
             .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    # second run: everything skipped, output bit-identical
    s2 = corpus.chunk_corpus_checkpointed(str(docs_dir), out, num_shards=4)
    assert s2["resumed"].sum() == 4
    read2 = (_ray.data.read_parquet(parts).to_pandas()
             .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(read1, read2)
    # a different shard plan must NOT reuse the old parts' manifest key
    s3 = corpus.chunk_corpus_checkpointed(str(docs_dir), out, num_shards=2)
    assert s3["resumed"].sum() == 0
    assert s3["chunks"].sum() == s1["chunks"].sum()


def test_ingest_precedence_dedup_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import dedup
    mine = dedup.ingest_precedence_dedup(SF)
    _assert_match(mine, dedup.INGEST_PRECEDENCE_DEDUP_SQL, con)
    # one survivor per distinct text (sf0.01 has no exact dups — the
    # planted-precedence test below covers the dup-group semantics)
    n_distinct = con.execute(
        "SELECT COUNT(DISTINCT text) FROM documents").fetchone()[0]
    assert len(mine) == n_distinct
    assert (mine["dup_cnt"] >= 1).all()


def test_ingest_precedence_prefers_source(ray_session, tmp_path):
    """Duplicate text across sources keeps the lexicographically first
    source even when a later source has the smaller doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_aez_ray.datapipe import dedup
    tbl = pa.table({
        "doc_id": pa.array([5, 1, 9], pa.int64()),
        "text": pa.array(["same text here"] * 3),
        "source": pa.array(["curated", "webcrawl", "curated"]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = dedup.ingest_precedence_dedup(str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert row["source"] == "curated" and row["doc_id"] == 5
    assert row["dup_cnt"] == 3


def test_event_transitions_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.event_transitions(SF)
    _assert_match(mine, temporal.EVENT_TRANSITIONS_SQL, con)
    # transition count == events - distinct users (one chain per user)
    n_ev, n_us = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT user_id) FROM events").fetchone()
    assert mine["n"].sum() == n_ev - n_us


def test_events_value_outliers_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.events_value_outliers(SF)
    _assert_match(mine, relational.EVENTS_VALUE_OUTLIERS_SQL, con)
    assert (mine["n_outliers"] > 0).all()
    assert (mine["n_outliers"] < mine["n"]).all()
    assert (mine["q1"] <= mine["q3"]).all()


def test_cohort_retention_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.cohort_retention(SF)
    _assert_match(mine, temporal.COHORT_RETENTION_SQL, con)
    # offset-0 rows are the cohort sizes and partition all customers
    n_cust = con.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    zero = mine[mine["month_offset"] == 0]
    assert zero["n_customers"].sum() == n_cust
    # retention never exceeds the cohort size
    m = mine.merge(zero[["cohort_month", "n_customers"]],
                   on="cohort_month", suffixes=("", "_size"))
    assert (m["n_customers"] <= m["n_customers_size"]).all()


def test_decontaminate_ds_sinks_without_driver_pull(ray_session, tmp_path):
    from spatial_aez_ray.datapipe import corpus
    from spatial_aez_ray.datapipe.util import write_doc_output
    summary = write_doc_output(corpus.decontaminate_stats_ds(SF),
                               str(tmp_path / "decon"))
    direct = corpus.decontaminate_stats(SF)
    assert summary["rows"] == len(direct)
    assert summary["files"] >= 1


def test_prefix_dup_groups_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import dedup
    mine = dedup.prefix_dup_groups(SF)
    _assert_match(mine, dedup.PREFIX_DUP_GROUPS_SQL, con)
    # non-trivial on the fixture (planted near-dups share prefixes)
    assert len(mine) > 0
    assert (mine["n_docs"] >= 2).all()


def test_winsorized_value_stats_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.winsorized_value_stats(SF)
    _assert_match(mine, relational.WINSORIZED_VALUE_STATS_SQL, con)
    # clamped mean stays inside the fences
    assert (mine["wmean"] >= mine["p05"]).all()
    assert (mine["wmean"] <= mine["p95"]).all()


def test_ann_quantized_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.ann_quantized(SF)
    _assert_match(mine, simsearch.ANN_QUANTIZED_SQL, con)
    # quantized ranking should agree closely with float brute force
    # (recall@10 against ann_topk — int8 on unit-ish vectors is tight)
    brute = simsearch.ann_topk(SF)
    agree = 0
    for qid in mine["query_id"].unique():
        a = set(mine[mine["query_id"] == qid]["neighbor_id"])
        b = set(brute[brute["query_id"] == qid]["neighbor_id"])
        agree += len(a & b)
    assert agree >= 0.7 * len(mine)


def test_event_debounce_stats_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.event_debounce_stats(SF)
    _assert_match(mine, temporal.EVENT_DEBOUNCE_STATS_SQL, con)
    assert (mine["n_kept"] <= mine["n_total"]).all()
    assert (mine["n_kept"] >= 1).all()
    # distinct (user,type) pairs lower-bound the kept count
    n_pairs = con.execute("SELECT COUNT(*) FROM (SELECT DISTINCT user_id, "
                          "event_type FROM events)").fetchone()[0]
    assert mine["n_kept"].sum() >= n_pairs


def test_embedding_gram_match_sql_and_numpy(con, ray_session):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.embedding_gram(SF)
    _assert_match(mine, simsearch.EMBEDDING_GRAM_SQL, con)
    # independent numpy oracle: quantize the whole matrix in one shot
    emb = con.execute(
        "SELECT embedding FROM embeddings ORDER BY vec_id").fetchdf()
    m = np.asarray([np.asarray(e, dtype=np.float64)
                    for e in emb["embedding"]])
    s = m * simsearch.CENTROID_SCALE
    q = np.trunc(s + np.copysign(0.5, s)).astype(np.int64)
    g = q.T @ q
    iu, ju = np.triu_indices(g.shape[0])
    assert (mine["gram_q"].to_numpy() == g[iu, ju]).all()


def test_embedding_top_pc_matches_eigh(ray_session):
    from spatial_aez_ray.datapipe import simsearch
    v = simsearch.embedding_top_pc(SF)
    g = simsearch.embedding_gram(SF)
    d = int(g["dim_j"].max())
    m = np.zeros((d, d))
    i, j = g["dim_i"].to_numpy() - 1, g["dim_j"].to_numpy() - 1
    m[i, j] = g["gram_q"].to_numpy().astype(float)
    m[j, i] = m[i, j]
    w, vecs = np.linalg.eigh(m)
    ref = vecs[:, -1]
    if ref[np.nonzero(np.abs(ref) > 1e-12)[0][0]] < 0:
        ref = -ref
    assert np.abs(np.dot(v, ref)) > 1 - 1e-8


def test_quantize_embeddings_ds_roundtrip(ray_session, tmp_path):
    from spatial_aez_ray.datapipe import simsearch
    from spatial_aez_ray.datapipe.util import write_doc_output
    s = write_doc_output(simsearch.quantize_embeddings_ds(SF),
                         str(tmp_path / "q8"))
    import duckdb
    n = duckdb.sql(f"SELECT COUNT(*), MIN(len(qembedding)), "
                   f"MAX(ABS(u.q)) FROM read_parquet("
                   f"'{tmp_path}/q8/*.parquet') t, "
                   f"unnest(t.qembedding) AS u(q)").fetchone()
    rows = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet("
                      f"'{tmp_path}/q8/*.parquet')").fetchone()[0]
    assert rows == s["rows"] > 0
    assert n[2] <= 127  # int8 range holds by construction


def test_profile_table_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.profile_table(SF)
    _assert_match(mine, relational.PROFILE_TABLE_SQL, con)
    assert (mine["n_distinct"] + mine["n_null"] <= mine["n"] + 1).all()


def test_compact_parquet_dir_preserves_content(ray_session, tmp_path):
    import duckdb
    import ray.data
    from spatial_aez_ray.datapipe import text
    from spatial_aez_ray.datapipe.util import compact_parquet_dir
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    text.token_stats_ds(SF).repartition(16).write_parquet(frag)
    rep = compact_parquet_dir(frag, out, target_rows=1 << 20)
    assert rep["files_out"] < rep["files_in"]
    # independent content check via DuckDB anti-join both ways
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM (SELECT * FROM read_parquet('{frag}/*.parquet')"
        f" EXCEPT ALL SELECT * FROM read_parquet('{out}/*.parquet'))"
    ).fetchone()[0]
    assert n == 0 and rep["rows"] > 0


def test_zorder_orders_match_sql_and_locality(con, ray_session, tmp_path):
    from spatial_aez_ray.datapipe import relational
    mine = relational.zorder_orders(SF)
    _assert_match(mine, relational.ZORDER_ORDERS_SQL, con)
    # bucket z-intervals are disjoint and ordered (the locality
    # property range scans rely on)
    assert (mine["z_min"].to_numpy()[1:] >
            mine["z_max"].to_numpy()[:-1]).all()
    # hive write produces one directory per bucket
    out = str(tmp_path / "zorder")
    relational.zorder_orders(SF, out_dir=out)
    dirs = [d for d in os.listdir(out) if d.startswith("bucket=")]
    assert len(dirs) == len(mine)
    # z really interleaves: a point (x, y) maps back to its inputs
    import numpy as np
    x = np.array([0x1234], dtype=np.int64)
    y = np.array([0xABCD], dtype=np.int64)
    z = relational._z_interleave(x, y)
    xa = sum(((int(z[0]) >> (2 * i)) & 1) << i for i in range(16))
    ya = sum(((int(z[0]) >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (xa, ya) == (0x1234, 0xABCD)


def test_events_cube_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.events_cube(SF)
    _assert_match(mine, temporal.EVENTS_CUBE_SQL, con)
    # grand total row equals the whole table; every rollup is consistent
    total = mine[(mine["event_type"] == "ALL") & (mine["day"] == "ALL")]
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert total["n"].iloc[0] == n_events
    fine = mine[(mine["event_type"] != "ALL") & (mine["day"] != "ALL")]
    assert fine["n"].sum() == n_events


def test_snapshot_diff_detects_changes(ray_session, tmp_path):
    from spatial_aez_ray.datapipe import text
    from spatial_aez_ray.datapipe.util import snapshot_dir, snapshot_diff
    d = str(tmp_path / "data")
    text.token_stats_ds(SF).repartition(4).write_parquet(d)
    s1 = str(tmp_path / "s1.parquet")
    s2 = str(tmp_path / "s2.parquet")
    rep = snapshot_dir(d, s1)
    assert rep["files"] == 4 and rep["rows"] > 0
    # no change -> empty diff
    snapshot_dir(d, s2)
    assert len(snapshot_diff(s1, s2)) == 0
    # remove one part + append a new one -> both detected
    parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    os.remove(os.path.join(d, parts[0]))
    import shutil
    shutil.copy(os.path.join(d, parts[1]), os.path.join(d, "zz-new.parquet"))
    snapshot_dir(d, s2)
    diff = snapshot_diff(s1, s2)
    assert set(zip(diff["file"], diff["status"])) == {
        (parts[0], "removed"), ("zz-new.parquet", "added")}


def test_events_hourly_ohlc_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.events_hourly_ohlc(SF)
    _assert_match(mine, temporal.EVENTS_HOURLY_OHLC_SQL, con)
    assert (mine["low"] <= mine["high"]).all()
    assert mine["open"].between(mine["low"], mine["high"]).all()
    assert mine["close"].between(mine["low"], mine["high"]).all()


def test_events_value_trend_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.events_value_trend(SF)
    _assert_match(mine, relational.EVENTS_VALUE_TREND_SQL, con)
    # slope == num/den exactly, and den > 0 (x has spread)
    assert (mine["slope_den"] > 0).all()
    assert (mine["slope"] == mine["slope_num"] / mine["slope_den"]).all()


def test_events_value_percentiles_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.events_value_percentiles(SF)
    _assert_match(mine, relational.EVENTS_VALUE_PERCENTILES_SQL, con)
    assert (mine["p50"] <= mine["p95"]).all()
    assert (mine["p95"] <= mine["p99"]).all()


def test_fk_violations_detects_planted_orphan(con, ray_session, tmp_path):
    import duckdb
    import shutil
    from spatial_aez_ray.datapipe import relational
    mine = relational.fk_violations_orders(SF)
    _assert_match(mine, relational.FK_VIOLATIONS_ORDERS_SQL, con)
    assert mine["n_violations"].iloc[0] == 0  # TPC-H data is clean
    # plant two orphan orders in a copied sf dir
    sf2 = str(tmp_path / "sf")
    os.makedirs(sf2)
    for t in ("orders", "customer"):
        shutil.copy(f"{SF}/{t}.parquet", f"{sf2}/{t}.parquet")
    duckdb.sql(f"""
        COPY (SELECT * REPLACE (CASE WHEN o_orderkey IN (
                  SELECT o_orderkey FROM read_parquet('{SF}/orders.parquet')
                  ORDER BY o_orderkey LIMIT 2)
                  THEN -777 ELSE o_custkey END AS o_custkey)
              FROM read_parquet('{SF}/orders.parquet'))
        TO '{sf2}/orders.parquet' (FORMAT PARQUET)""")
    got = relational.fk_violations_orders(sf2)
    assert got["n_violations"].iloc[0] == 2
    assert got["n_bad_keys"].iloc[0] == 1


def test_persistent_ivf_matches_memory_and_prunes(ray_session, tmp_path):
    import numpy as np
    from spatial_aez_ray.datapipe import simsearch
    idx = str(tmp_path / "ivf")
    man = simsearch.build_ivf_index(SF, idx, n_lists=32)
    assert man["n_vecs"].sum() == 500
    got = simsearch.ann_ivf_query(idx, SF, n_probe=4)
    mem = simsearch.ann_ivf(SF, n_lists=32, n_probe=4)
    assert got.equals(mem)
    # lists on disk partition the corpus exactly
    assert (man["n_vecs"] >= 0).all() and len(man) <= 32


def test_ann_pq_recall_and_determinism(ray_session):
    from spatial_aez_ray.datapipe import simsearch
    pq = simsearch.ann_pq(SF)
    assert pq.equals(simsearch.ann_pq(SF))
    brute = simsearch.ann_topk(SF)
    agree = sum(
        len(set(pq[pq["query_id"] == q]["neighbor_id"])
            & set(brute[brute["query_id"] == q]["neighbor_id"]))
        for q in pq["query_id"].unique())
    assert agree >= 0.8 * len(pq)
    # codes really are m bytes per vector
    import numpy as np
    _, sample = simsearch._load_queries(SF, 256)
    books = simsearch._pq_codebooks(sample)
    codes = simsearch._pq_encode(sample, books)
    assert codes.shape == (256, simsearch.PQ_M)
    assert codes.dtype == np.uint8 and codes.max() < simsearch.PQ_K


def test_incremental_view_equals_batch(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    inc = relational.incremental_revenue_by_nation(SF)
    _assert_match(inc, relational.REVENUE_BY_NATION_SQL, con)
    assert inc.equals(relational.revenue_by_nation(SF))


def test_ann_topk_filtered_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.ann_topk_filtered(SF)
    _assert_match(mine, simsearch.ANN_TOPK_FILTERED_SQL, con)
    # every neighbor shares the query's label
    lbl = dict(con.execute(
        "SELECT vec_id, label FROM embeddings").fetchall())
    for _, r in mine.iterrows():
        assert lbl[r["neighbor_id"]] == lbl[r["query_id"]]


def test_doc_surprisal_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import text
    mine = text.doc_surprisal(SF)
    _assert_match(mine, text.DOC_SURPRISAL_SQL, con)
    # rarity ordering: strictly non-increasing surprisal
    s = mine["surprisal_sum"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_pii_redaction_plants_and_scrubs(ray_session):
    import pyarrow as pa
    from spatial_aez_ray.datapipe import text
    batch = pa.table({
        "doc_id": [0, 1],
        "text": ["mail a.b@x.io or 555-123-4567 x", "clean text here"]})
    out, meta = text.redact_batch(batch)
    got = dict(zip(meta["pattern"].to_pylist(), meta["n"].to_pylist()))
    assert got["email"] == 1 and got["phone"] == 1 and got["ssn"] == 0
    assert "[PII:email]" in out["text"][0].as_py()
    assert "[PII:phone]" in out["text"][0].as_py()
    assert out["text"][1].as_py() == "clean text here"
    # ssn takes precedence over the broader phone pattern
    b2 = pa.table({"doc_id": [0], "text": ["ssn 123-45-6789 ok"]})
    _, m2 = text.redact_batch(b2)
    g2 = dict(zip(m2["pattern"].to_pylist(), m2["n"].to_pylist()))
    assert g2["ssn"] == 1 and g2["phone"] == 0


def test_jsonl_roundtrip_exact(ray_session, tmp_path):
    import duckdb
    from spatial_aez_ray.datapipe.util import jsonl_roundtrip_check
    rep = jsonl_roundtrip_check(SF, str(tmp_path / "jl"))
    assert rep["checksum_ok"] and rep["rows"] == 500
    # independent check: DuckDB reads the jsonl identically
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM (SELECT doc_id, text FROM "
        f"read_json_auto('{tmp_path}/jl/*.json') EXCEPT "
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF}/documents.parquet'))").fetchone()[0]
    assert n == 0


def test_ann_quantized_table_equals_inline(ray_session, tmp_path):
    from spatial_aez_ray.datapipe import simsearch
    from spatial_aez_ray.datapipe.util import write_doc_output
    d = str(tmp_path / "q8t")
    write_doc_output(simsearch.quantize_embeddings_ds(SF), d)
    got = simsearch.ann_quantized_from_table(d, SF)
    assert got.equals(simsearch.ann_quantized(SF))


def test_query_registry_consistent(ray_session):
    """Every oracle key must name a registered query (no orphans), and
    all callables/SQL are well-formed non-empty."""
    import __ray_entry__ as e
    q = e.queries()
    s = e.oracle_sql()
    orphans = set(s) - set(q)
    assert not orphans, f"oracle entries without queries: {orphans}"
    assert all(callable(v) for v in q.values())
    assert all(isinstance(v, str) and "SELECT" in v.upper()
               for v in s.values())


def test_entry_smoke(ray_session):
    """The driver's first gate: entry() must run on sf0.001 and return
    rows with a stable schema. Pin the column set so a refactor that
    drifts the flagship's output shape fails here, not at grade time."""
    import __ray_entry__ as e
    out = e.entry()
    assert len(out) > 0
    assert list(out.columns) == [
        "doc_id", "n_tokens", "n_bpe_tokens", "n_bytes", "n_chars_m",
        "stopword_ratio", "mean_token_len", "dup_cnt"]
    assert out["doc_id"].is_monotonic_increasing
    assert not out["doc_id"].duplicated().any()


def test_cli_help_smoke():
    import subprocess
    import sys
    r = subprocess.run([sys.executable, "-m", "spatial_aez_ray",
                        "--help"], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0
    for cmd in ("extract", "pyramid", "export-cog", "warp"):
        assert cmd in r.stdout


def test_customer_order_coverage_match_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.customer_order_coverage(SF)
    _assert_match(mine, relational.CUSTOMER_ORDER_COVERAGE_SQL, con)
    # full outer exercises all three classes on the restricted sides
    assert set(mine["match_status"]) == {"both", "customer_only",
                                         "orders_only"}
    only = mine[mine["match_status"] == "customer_only"]
    assert (only["order_cnt"] == 0).all() and (only["revenue"] == 0).all()


def test_incremental_hll_equals_batch(con, ray_session):
    from spatial_aez_ray.datapipe import sketch
    inc = sketch.incremental_hll_registers(SF)
    assert inc.equals(sketch.hll_user_registers(SF))
    _assert_match(inc, sketch.HLL_USER_REGISTERS_SQL, con)


def test_ivf_upsert_and_delete_maintenance(ray_session, tmp_path):
    """Index maintenance without rebuild: an index built on 80% of the
    vectors then UPSERTED with the rest answers identically to an
    index built on 100%; tombstoned ids never come back."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data
    from spatial_aez_ray.datapipe import simsearch

    full_idx = str(tmp_path / "full")
    part_idx = str(tmp_path / "part")
    simsearch.build_ivf_index(SF, full_idx, n_lists=32)
    # partial world: first 400 vectors only (deterministic split)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    head, tail = t.slice(0, 400), t.slice(400)
    part_sf = str(tmp_path / "sf")
    import os as _os
    _os.makedirs(part_sf)
    pq.write_table(head, f"{part_sf}/embeddings.parquet")
    simsearch.build_ivf_index(part_sf, part_idx, n_lists=32)
    # NOTE: quantizer trains on a 2048-head sample — identical for
    # both indexes here (400 >= all sampled rows? no: sample is
    # min(2048, n)); rebuild part quantizer differs, so overwrite the
    # sidecar with the full index's centroids and re-assign by upsert
    import shutil
    shutil.copy(f"{full_idx}/_CENTROIDS.parquet",
                f"{part_idx}/_CENTROIDS.parquet")
    # rebuild the partial lists under the SHARED quantizer: wipe and
    # upsert all 400 head vectors, then upsert the 100 tail vectors
    for d in list(_os.listdir(part_idx)):
        if d.startswith("list_id="):
            shutil.rmtree(_os.path.join(part_idx, d))
    n1 = simsearch.ivf_upsert(part_idx, ray.data.from_arrow(head))
    n2 = simsearch.ivf_upsert(part_idx, ray.data.from_arrow(tail))
    assert n1 == 400 and n2 == 100
    got = simsearch.ann_ivf_query(part_idx, SF, n_probe=4)
    want = simsearch.ann_ivf_query(full_idx, SF, n_probe=4)
    assert got.equals(want)
    # tombstone the current top neighbor of query 0 — it must vanish
    victim = int(want[want["query_id"] == want["query_id"].min()]
                 ["neighbor_id"].iloc[0])
    simsearch.ivf_delete(part_idx, np.array([victim]))
    after = simsearch.ann_ivf_query(part_idx, SF, n_probe=4)
    assert victim not in set(after["neighbor_id"])


def test_ivf_compact_purges_tombstones(ray_session, tmp_path):
    import numpy as np
    import os as _os
    from spatial_aez_ray.datapipe import simsearch
    idx = str(tmp_path / "ivf")
    simsearch.build_ivf_index(SF, idx, n_lists=32)
    before = simsearch.ann_ivf_query(idx, SF, n_probe=4)
    victim = int(before["neighbor_id"].iloc[0])
    simsearch.ivf_delete(idx, np.array([victim]))
    logical = simsearch.ann_ivf_query(idx, SF, n_probe=4)
    rep = simsearch.ivf_compact(idx)
    assert rep["rows_purged"] == 1 and rep["rows_kept"] == 499
    assert not _os.path.exists(f"{idx}/_TOMBSTONES.parquet")
    physical = simsearch.ann_ivf_query(idx, SF, n_probe=4)
    assert physical.equals(logical)
    assert victim not in set(physical["neighbor_id"])


# ---------------------------------------------------------------------------
# round-4 late additions: span-level dedup, graph rank, theta sketches
# ---------------------------------------------------------------------------

def test_dup_ngram_spans_exact(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.dup_ngram_spans(SF),
                  dedup.DUP_NGRAM_SPANS_SQL, con)


def test_dup_ngram_spans_bounds(con):
    from spatial_aez_ray.datapipe import dedup
    out = dedup.dup_ngram_spans(SF)
    n = dedup.DUP_SPAN_N
    assert (out["covered_tokens"] <= out["n_tokens"]).all()
    assert (out["dup_grams"] <= out["n_grams"]).all()
    has = out["dup_grams"] > 0
    # one dup gram covers exactly n tokens; coverage can only grow
    assert (out.loc[has, "covered_tokens"] >= n).all()
    assert (out.loc[~has, "covered_tokens"] == 0).all()
    # the corpus is repetitive enough that SOME span duplication exists
    assert has.any()


def test_textrank_tokens_exact(con):
    from spatial_aez_ray.datapipe import graph
    _assert_match(graph.textrank_tokens(SF), graph.TEXTRANK_TOKENS_SQL, con)


def test_textrank_rank_properties(con):
    from spatial_aez_ray.datapipe import graph
    out = graph.textrank_tokens(SF, topk=10_000)   # whole node set
    # every node keeps at least the teleport mass and the list is
    # sorted by (rank desc, token asc)
    n = len(out)
    base = (15 * (graph.TEXTRANK_SCALE // n)) // 100
    assert (out["rank_units"] >= base).all()
    r = out["rank_units"].to_numpy()
    assert (r[:-1] >= r[1:]).all()
    # damped iteration keeps total mass below the unit scale
    assert out["rank_units"].sum() <= graph.TEXTRANK_SCALE


def test_theta_user_overlap_exact(con):
    from spatial_aez_ray.datapipe import sketch
    _assert_match(sketch.theta_user_overlap(SF),
                  sketch.THETA_USER_OVERLAP_SQL, con)


def test_theta_estimator_envelope(con):
    from spatial_aez_ray.datapipe import sketch
    out = sketch.theta_user_overlap(SF)
    assert len(out) == 10   # 5 event types -> C(5,2) pairs
    # est scales n_common up by M/theta, so it never undershoots it
    assert (out["est_overlap"] >= out["n_common"]).all()
    true = con.execute("""
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(DISTINCT a.user_id)::BIGINT AS n_true
        FROM (SELECT DISTINCT event_type, user_id FROM events) a
        JOIN (SELECT DISTINCT event_type, user_id FROM events) b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2""").fetchdf()
    m = out.merge(true, on=["type_a", "type_b"], how="left").fillna(0)
    # KMV relative error ~1/sqrt(k-2) = 13% at k=64; allow 4 sigma
    err = (m["est_overlap"] - m["n_true"]).abs()
    assert (err <= 0.52 * m["n_true"] + 2).all()


def test_windowed_counts_watermark_exact(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.windowed_counts_watermark(SF),
                  temporal.WINDOWED_COUNTS_WATERMARK_SQL, con)


def test_watermark_conservation_and_lateness(con):
    from spatial_aez_ray.datapipe import temporal
    out = temporal.windowed_counts_watermark(SF)
    total = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    # every arrival lands exactly once: on-time pane or late side
    assert int(out["n_events"].sum() + out["n_late"].sum()) == total
    # the hash arrival order is adversarially out-of-order, so late
    # arrivals exist; and the newest window can never be late
    assert out["n_late"].sum() > 0
    assert int(out.iloc[-1]["n_late"]) == 0


def test_merge_upsert_orders_exact(con, tmp_path):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.merge_upsert_orders(SF, str(tmp_path)),
                  relational.MERGE_UPSERT_ORDERS_SQL, con)


def test_merge_upsert_copy_on_write_and_idempotent(tmp_path):
    import os
    import ray.data
    from spatial_aez_ray.datapipe import relational
    first = relational.merge_upsert_orders(SF, str(tmp_path))
    # only the delta's partitions were touched (bucket 3 updates,
    # bucket 5 inserts) — asserted inside the op; re-applying the same
    # delta is a content no-op (last-writer-wins with final values)
    relational.apply_merge(str(tmp_path / "base"), str(tmp_path / "delta"))
    again = (ray.data.read_parquet(
                 str(tmp_path / "base"),
                 columns=["o_orderkey", "price_cents"])
             .to_pandas().sort_values("o_orderkey")
             .reset_index(drop=True))
    assert first.astype("int64").equals(again.astype("int64"))


def test_fuzzy_join_names_exact(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.fuzzy_join_names(SF),
                  dedup.FUZZY_JOIN_NAMES_SQL, con)


def test_ed_le1_predicate():
    from spatial_aez_ray.datapipe.dedup import _ed_le1
    assert _ed_le1("abc", "abc")
    assert _ed_le1("abc", "abd")        # substitution
    assert _ed_le1("abc", "ab")         # deletion
    assert _ed_le1("abc", "abcd")       # insertion
    assert _ed_le1("abc", "xabc")       # head insertion
    assert not _ed_le1("abc", "adc1")   # sub + insert = 2
    assert not _ed_le1("abc", "axy")    # two substitutions
    assert not _ed_le1("abc", "a")      # two deletions


def test_gap_fill_hourly_exact(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.gap_fill_hourly(SF),
                  temporal.GAP_FILL_HOURLY_SQL, con)


def test_gap_fill_grid_dense(con):
    from spatial_aez_ray.datapipe import temporal
    out = temporal.gap_fill_hourly(SF)
    for _, g in out.groupby("event_type"):
        h = g["hour"].to_numpy()
        assert (np.diff(h) == 1).all()          # dense hourly grid
        assert int(g.iloc[0]["filled"]) == 0    # span starts observed
        assert int(g.iloc[-1]["filled"]) == 0   # and ends observed


def test_scd2_user_values_exact(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.scd2_user_values(SF),
                  temporal.SCD2_USER_VALUES_SQL, con)


def test_scd2_intervals_wellformed(con):
    from spatial_aez_ray.datapipe import temporal
    out = temporal.scd2_user_values(SF)
    for _, g in out.groupby("user_id"):
        vf = g["valid_from_us"].to_numpy()
        vt = g["valid_to_us"].to_numpy()
        # chained intervals: each row's end is the next row's start,
        # exactly one open (-1) row per user, and it is the last
        assert (vt[:-1] == vf[1:]).all()
        assert vt[-1] == -1 and (vt[:-1] != -1).all()
        # compression: consecutive values differ
        v = g["value_cents"].to_numpy()
        assert (v[1:] != v[:-1]).all()


def test_semantic_dedup_matches_twin_and_drops(con):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.semantic_dedup(SF)
    twin = simsearch.semantic_dedup_twin(SF)
    assert mine.equals(twin)
    total = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert 0 < len(mine) < total          # dropped some, kept some
    # survivors' ids are a subset of the corpus and unique
    assert mine["vec_id"].is_unique


def test_semdedup_drop_rule_blocked_equals_naive():
    import numpy as np
    from spatial_aez_ray.datapipe.simsearch import (
        SEMDEDUP_TAU_DEN, SEMDEDUP_TAU_NUM, _semdedup_drop_mask)
    rng = np.random.RandomState(7)
    q = rng.randint(-127, 128, size=(300, 16)).astype(np.int64)
    q[50] = q[10]          # plant exact dup -> must drop the later id
    ids = np.arange(300, dtype=np.int64)
    got = _semdedup_drop_mask(ids, q, block=64)
    norms = (q * q).sum(axis=1)
    dots = q @ q.T
    close = (dots > 0) & (SEMDEDUP_TAU_DEN * dots * dots
                          >= SEMDEDUP_TAU_NUM
                          * norms[:, None] * norms[None, :])
    lower = np.arange(300)[:, None] > np.arange(300)[None, :]
    naive = (close & lower).any(axis=1)
    assert (got == naive).all()
    assert got[50] and not got[10]


def test_token_triangles_exact(con):
    from spatial_aez_ray.datapipe import graph
    _assert_match(graph.token_triangles(SF), graph.TOKEN_TRIANGLES_SQL, con)


def test_token_triangles_handshake(con):
    from spatial_aez_ray.datapipe import graph
    out = graph.token_triangles(SF)
    # per-node counts sum to 3x the number of distinct triangles
    assert out["n_triangles"].sum() % 3 == 0
    assert (out["n_triangles"] >= 0).all() and len(out) > 0


def test_bpe_doc_stats_matches_twin():
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.bpe_doc_stats(SF)
    twin = corpus.bpe_doc_stats_twin(SF)
    assert mine.equals(twin)
    # merges compress: fewer BPE tokens than characters, more than words
    assert (mine["n_bpe_tokens"] >= mine["n_words"]).all()


def test_bpe_trainer_semantics():
    from spatial_aez_ray.datapipe.corpus import bpe_apply, bpe_train_merges
    merges = bpe_train_merges({"low": 5, "lower": 2, "newest": 6,
                               "widest": 3}, n_merges=10)
    # most frequent pair first: 'es' (count 9) beats 'lo' (7), 'st' (9)
    # ties broken lexicographically -> ('e','s') before ('s','t')
    assert merges[0] == ("e", "s")
    toks = bpe_apply("newest", merges)
    assert "".join(toks) == "newest"       # lossless
    assert len(toks) < len("newest")       # actually merged


def test_entity_clusters_exact(con):
    from spatial_aez_ray.datapipe import dedup
    _assert_match(dedup.entity_clusters(SF),
                  dedup.ENTITY_CLUSTERS_SQL, con)


def test_entity_clusters_wellformed(con):
    from spatial_aez_ray.datapipe import dedup
    out = dedup.entity_clusters(SF)
    # canonical is the min member; sizes count members exactly
    g = out.groupby("canonical_name")
    mins = g["c_name"].min()
    assert (mins.values == mins.index.values).all()
    sizes = g.size()
    first_size = g["cluster_size"].first()
    assert (first_size.values == sizes.values).all()
    # blocking bounds components: never larger than one block
    assert out["cluster_size"].max() <= 100


def test_drift_report_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.drift_report(SF),
                  relational.DRIFT_REPORT_SQL, con)


def test_drift_tv_bounds(con):
    from spatial_aez_ray.datapipe import relational
    out = relational.drift_report(SF)
    # 0 <= TV distance <= 1, i.e. 0 <= tv_num <= 2*n1*n2
    assert (out["tv_num"] >= 0).all()
    assert (out["tv_num"] <= 2 * out["n1"] * out["n2"]).all()
    assert (out["n1"] + out["n2"] > 0).all()


def test_incremental_dedup_equals_batch(con):
    from spatial_aez_ray.datapipe import dedup
    inc = dedup.incremental_exact_dedup(SF)
    assert inc.equals(dedup.exact_dedup(SF))
    _assert_match(inc, dedup.EXACT_DEDUP_SQL, con)


def test_join_size_estimate_exact_and_close(con):
    from spatial_aez_ray.datapipe import sketch
    _assert_match(sketch.join_size_estimate(SF),
                  sketch.JOIN_SIZE_ESTIMATE_SQL, con)
    est = int(sketch.join_size_estimate(SF)["est_join_size"][0])
    true = con.execute("SELECT COUNT(*) FROM customer JOIN orders "
                       "ON c_custkey = o_custkey").fetchone()[0]
    # KMV estimator: ~1/sqrt(k-2) relative error at k=64; allow 4σ
    assert abs(est - true) <= 0.52 * true + 2


def test_events_percent_rank_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.events_percent_rank(SF),
                  relational.EVENTS_PERCENT_RANK_SQL, con)


def test_percent_rank_bounds(con):
    from spatial_aez_ray.datapipe import relational
    out = relational.events_percent_rank(SF)
    assert (out["rank_lt"] >= 0).all()
    assert (out["rank_lt"] <= out["n_minus_1"]).all()
    # each partition has exactly one row at rank 0 value-wise minimum
    for _, g in out.groupby("event_type"):
        assert (g.loc[g["rank_lt"] == 0, "value_cents"]
                == g["value_cents"].min()).all()


def test_cusum_change_points_exact(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.cusum_change_points(SF),
                  temporal.CUSUM_CHANGE_POINTS_SQL, con)


def test_cusum_crossing_consistency(con):
    from spatial_aez_ray.datapipe import temporal
    out = temporal.cusum_change_points(SF)
    # a recorded crossing implies the max exceeded the threshold,
    # and no crossing implies it never did
    crossed = out["first_cross_id"] >= 0
    assert (out.loc[crossed, "max_abs_cusum"]
            > temporal.CUSUM_THRESHOLD_CENTS).all()
    assert (out.loc[~crossed, "max_abs_cusum"]
            <= temporal.CUSUM_THRESHOLD_CENTS).all()


def test_rolling_active_users_exact(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.rolling_active_users(SF),
                  temporal.ROLLING_ACTIVE_USERS_SQL, con)


def test_rolling_active_users_dominates_hourly(con):
    from spatial_aez_ray.datapipe import temporal
    out = temporal.rolling_active_users(SF)
    hourly = con.execute("""
        SELECT epoch_us(ts) // 3600000000 AS hour,
               COUNT(DISTINCT user_id) AS n FROM events
        GROUP BY 1""").fetchdf().set_index("hour")["n"]
    # a trailing window can only see MORE distinct users than one hour
    m = out.set_index("hour")["n_active"]
    assert (m >= hourly.reindex(m.index).fillna(0)).all()


def test_entry_registry_consistency():
    """Every oracle has a query; every query is callable; no key is
    registered twice (a dict would silently drop the first)."""
    import ast
    import __ray_entry__ as entry
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
    # literal duplicate keys in the source would be silent dict drops
    src = ast.parse(open("/root/repo/__ray_entry__.py").read())
    for node in ast.walk(src):
        if isinstance(node, ast.Dict):
            ks = [k.value for k in node.keys
                  if isinstance(k, ast.Constant)]
            assert len(ks) == len(set(ks)), "duplicate registry key"


def test_quantile_normalize_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.quantile_normalize_events(SF),
                  relational.QUANTILE_NORMALIZE_EVENTS_SQL, con)


def test_quantile_normalize_monotone_per_group(con):
    from spatial_aez_ray.datapipe import relational
    out = relational.quantile_normalize_events(SF)
    for _, g in out.groupby("event_type"):
        nv = g.sort_values("value_cents")["norm_cents"].to_numpy()
        assert (nv[1:] >= nv[:-1]).all()   # CDF matching is monotone


def test_association_pairs_exact(con):
    from spatial_aez_ray.datapipe import temporal
    _assert_match(temporal.association_pairs(SF),
                  temporal.ASSOCIATION_PAIRS_SQL, con)
    out = temporal.association_pairs(SF)
    # support bounds: n_both <= min(n_a, n_b) <= n_users
    assert (out["n_both"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert (out[["n_a", "n_b"]].max(axis=1) <= out["n_users"]).all()


def test_merge_versioned_time_travel(con, tmp_path):
    from spatial_aez_ray.datapipe import relational
    v2 = relational.merge_upsert_versioned(SF, str(tmp_path))
    _assert_match(v2, relational.MERGE_UPSERT_ORDERS_SQL, con)
    v1 = relational.read_version(str(tmp_path), 1)
    base = con.execute(
        "SELECT o_orderkey, ROUND(o_totalprice*100)::BIGINT AS "
        "price_cents FROM orders ORDER BY o_orderkey").fetchdf()
    assert (v1.values == base.values).all()
    # immutability: v1's manifest files all still exist untouched
    import json, os
    with open(str(tmp_path / "manifest-v1.json")) as f:
        for p in json.load(f)["files"]:
            assert os.path.exists(str(tmp_path / p))


def test_revenue_rollup_hierarchy_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.revenue_rollup_hierarchy(SF),
                  relational.REVENUE_ROLLUP_HIERARCHY_SQL, con)
    out = relational.revenue_rollup_hierarchy(SF)
    # subtotal consistency: region subtotals sum leaf rows, the grand
    # total sums the subtotals
    leaf = out[(out["nation"] != "*ALL*")]
    sub = out[(out["nation"] == "*ALL*") & (out["region"] != "*ALL*")]
    tot = out[(out["region"] == "*ALL*")]
    assert abs(leaf["revenue"].sum() - tot["revenue"].iloc[0]) < 1e-6
    assert abs(sub["revenue"].sum() - tot["revenue"].iloc[0]) < 1e-6
    assert leaf["order_cnt"].sum() == tot["order_cnt"].iloc[0]


def test_sample_quantiles_exact(con):
    from spatial_aez_ray.datapipe import sketch
    _assert_match(sketch.sample_quantiles(SF),
                  sketch.SAMPLE_QUANTILES_SQL, con)


def test_heavy_hitter_tokens_exact(con):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.heavy_hitter_tokens(SF)
    _assert_match(mine, corpus.HEAVY_HITTER_TOKENS_SQL, con)
    # certified-frequent guarantee: every output clears the threshold
    total = con.execute(
        "SELECT COUNT(*) FROM (SELECT unnest(string_split(text,' ')) "
        "FROM documents)").fetchone()[0]
    assert (mine["cnt"] * corpus.HH_K > total).all()


def test_skyline_orders_exact(con):
    from spatial_aez_ray.datapipe import relational
    mine = relational.skyline_orders(SF)
    _assert_match(mine, relational.SKYLINE_ORDERS_SQL, con)
    # Pareto invariant: strictly increasing price, strictly
    # decreasing date along the frontier
    assert mine["price"].is_monotonic_increasing
    assert mine["o_orderdate"].is_monotonic_decreasing


def test_mg_compress_bound():
    """Misra-Gries compress keeps a certified superset: after
    compressing any counter set over n total to k entries, every key
    with true count > n/(k+1) survives with positive weight."""
    import numpy as np
    import pandas as pd

    from spatial_aez_ray.datapipe.corpus import _mg_compress
    rng = np.random.default_rng(7)
    vals = rng.zipf(1.5, size=5000)
    cnt = pd.Series(vals).value_counts().astype("int64")
    cnt.index = cnt.index.astype(str)
    k = 16
    out = _mg_compress(cnt, k)
    n = int(cnt.sum())
    must = cnt[cnt > n // (k + 1)]
    assert set(must.index) <= set(out.index)
    assert len(out) <= k


def test_split_documents_exact(con):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.split_documents(SF)
    _assert_match(mine, corpus.SPLIT_DOCUMENTS_SQL, con)
    # split fractions land near 80/10/10 and cover every doc
    tot = mine.groupby("split")["n_docs"].sum()
    n = tot.sum()
    assert n == con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert 0.6 * n < tot.get("train", 0) < 0.95 * n


def test_value_prop_correlation_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.value_prop_correlation(SF),
                  relational.VALUE_PROP_CORRELATION_SQL, con)


def test_curation_pipeline_exact(con):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.curation_pipeline(SF)
    _assert_match(mine, corpus.CURATION_PIPELINE_SQL, con)
    # the chain must actually filter/dedup: strictly fewer kept docs
    # than the corpus and every kept doc clears the token floor
    n_all = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert 0 < mine["kept_docs"].sum() < n_all


def test_kcore_matches_sequential_peeling():
    from spatial_aez_ray.datapipe import graph
    mine = graph.kcore_tokens(SF)
    edges = graph._distinct_edges(SF).to_pandas()
    want = graph.kcore_oracle_sequential(edges)
    assert mine.equals(want)
    assert len(mine) > 0 and (mine["core_deg"] >= graph.KCORE_K).all()


def test_grouped_sample_quantiles_exact(con):
    from spatial_aez_ray.datapipe import sketch
    _assert_match(sketch.grouped_sample_quantiles(SF),
                  sketch.GROUPED_SAMPLE_QUANTILES_SQL, con)


def test_shipping_priority_exact(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.shipping_priority(SF),
                  relational.SHIPPING_PRIORITY_SQL, con)


def test_exact_price_quantiles(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.exact_price_quantiles(SF),
                  relational.EXACT_PRICE_QUANTILES_SQL, con)


def test_weighted_join_sample_exact(con):
    from spatial_aez_ray.datapipe import relational
    mine = relational.weighted_join_sample(SF)
    _assert_match(mine, relational.WEIGHTED_JOIN_SAMPLE_SQL, con)
    assert len(mine) > 0


def test_grouped_exact_quantiles(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.grouped_exact_quantiles(SF),
                  relational.GROUPED_EXACT_QUANTILES_SQL, con)


def test_kmeans_matches_sequential_and_converges():
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.kmeans_clusters(SF)
    want = simsearch.kmeans_oracle_sequential(SF)
    assert mine.equals(want)
    assert int(mine["converged"].iloc[0]) == 1
    assert mine["n_members"].sum() > 0


def test_interval_coverage_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.interval_coverage(SF)
    _assert_match(mine, temporal.INTERVAL_COVERAGE_SQL, con)
    # islands merge: covered time can never exceed the raw sum of
    # interval lengths, and every island is at least one interval long
    assert (mine["covered_us"] >= mine["max_island_us"]).all()
    assert (mine["max_island_us"] >= 60_000_000).all()


def test_interval_coverage_touching_merge():
    """Touching intervals (s == prev e) merge into one island —
    pinned here because both sides must share the strict > rule."""
    from spatial_aez_ray.datapipe.temporal import _interval_cover_part
    g = pd.DataFrame({"user_id": [1, 1, 1], "s": [0, 10, 25],
                      "e": [10, 20, 30]})
    out = _interval_cover_part(g)
    assert out.iloc[0].tolist() == [1, 25, 2, 20]


def test_phrase_search_matches_sql(con):
    from spatial_aez_ray.datapipe import corpus
    _assert_match(corpus.phrase_search(SF), corpus.PHRASE_SEARCH_SQL, con)


def test_phrase_search_trigram_and_overlap(con):
    from spatial_aez_ray.datapipe import corpus
    # any trigram present in the corpus, via the generated oracle
    tri = ("order", "fast", "key")
    mine = corpus.phrase_search(SF, tri)
    _assert_match(mine, corpus._phrase_sql(tri), con)
    # overlapping hits count individually (positions, not splitting)
    import pyarrow as pa
    hits_fn = None
    batch = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "text": pa.array(["x a a a a y"])})
    # drive the batch kernel directly through a 1-batch dataset
    import ray.data
    ds = ray.data.from_arrow(batch)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        ds.write_parquet(os.path.join(td, "documents.parquet"))
        out = corpus.phrase_search(td, ("a", "a"))
    assert out.iloc[0].tolist() == [7, 3, 2]


def test_orders_above_avg_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    mine = relational.orders_above_customer_avg(SF)
    _assert_match(mine, relational.ORDERS_ABOVE_AVG_SQL, con)
    # a customer with a single order can never beat their own average
    one = con.execute("SELECT o_custkey FROM orders GROUP BY 1 "
                      "HAVING COUNT(*) = 1").fetchdf()["o_custkey"]
    assert not np.isin(mine["custkey"].to_numpy(), one.to_numpy()).any()


def test_ngram_containment_matches_sql(con):
    from spatial_aez_ray.datapipe import dedup
    mine = dedup.ngram_containment_dedup(SF)
    _assert_match(mine, dedup.NGRAM_CONTAINMENT_SQL, con)
    # containment dominates Jaccard on the same candidate pairs:
    # every Jaccard-0.8 pair is a containment-0.8 pair
    jac = dedup.ngram_jaccard_dedup(SF, threshold=0.8)
    keys = set(zip(mine["doc_lo"], mine["doc_hi"]))
    assert all((a, b) in keys for a, b in zip(jac["doc_lo"],
                                              jac["doc_hi"]))


def test_minhash_index_single_doc_serving(tmp_path):
    """Serving contract: a 1-doc crawl increment queried against the
    corpus index returns exactly that doc's candidate partners."""
    import ray.data
    from spatial_aez_ray.datapipe import dedup
    idx = str(tmp_path / "idx")
    dedup.build_minhash_index(SF, idx)
    cands = dedup.minhash_candidates(SF)
    assert len(cands)
    probe_doc = int(cands.iloc[0]["doc_lo"])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    one = docs[docs["doc_id"] == probe_doc]
    qdir = str(tmp_path / "q")
    ray.data.from_pandas(one).write_parquet(
        os.path.join(qdir, "documents.parquet"))
    got = dedup.query_minhash_index(idx, qdir)
    want_partners = sorted(
        set(cands.loc[cands["doc_lo"] == probe_doc, "doc_hi"]) |
        set(cands.loc[cands["doc_hi"] == probe_doc, "doc_lo"]))
    assert sorted(got["index_doc"].tolist()) == want_partners
    assert (got["query_doc"] == probe_doc).all()


def test_bpe_train_textbook(tmp_path):
    """Sennrich-style worked example: corpus 'aaabdaaabac' learns
    'aa' first (4 left-to-right non-overlapping... actually 'aa'
    appears at 0 and in the second run: 'aaa' yields ONE pair by
    overlap parity per run -> count 2x2=4? pinned by the sequential
    trainer), and the distributed path agrees merge-for-merge."""
    import ray.data
    from spatial_aez_ray.datapipe import corpus
    d = pd.DataFrame({"doc_id": [1], "text": ["aaabdaaabac"]})
    sf = str(tmp_path)
    ray.data.from_pandas(d).write_parquet(
        os.path.join(sf, "documents.parquet"))
    mine = corpus.bpe_train(sf, 3)
    want = corpus.bpe_train_sequential(sf, 3)
    assert mine.equals(want)
    # first merge is the most frequent pair: ('a','a') with count 4
    assert mine.iloc[0][["left", "right", "n"]].tolist() == ["a", "a", 4]
    # second merge works on the re-tokenized sequence: 'aa'+'ab'...
    assert mine.iloc[1]["n"] == 2


def test_bpe_overlap_parity():
    """'aaaa' + (a,a) -> [aa, aa]: alternating matches within a run."""
    import numpy as np
    from spatial_aez_ray.datapipe.corpus import _bpe_apply_merge
    s = np.array([97, 97, 97, 97, 97], dtype=np.int64)
    out = _bpe_apply_merge(s, 97, 97, 256)
    assert out.tolist() == [256, 256, 97]


def test_tpch_classics_match_sql(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.q6_revenue(SF), relational.Q6_REVENUE_SQL,
                  con)
    _assert_match(relational.q12_late_shipments(SF),
                  relational.Q12_LATE_SQL, con)
    q4 = relational.q4_priority_check(SF)
    _assert_match(q4, relational.Q4_PRIORITY_SQL, con)
    # EXISTS counts orders once regardless of how many late lines
    assert int(q4["order_count"].sum()) <= con.execute(
        "SELECT COUNT(*) FROM orders").fetchone()[0]


def test_reorder_gaps_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.customer_reorder_gaps(SF)
    _assert_match(mine, temporal.REORDER_GAPS_SQL, con)
    assert (mine["n_reorders"] >= 1).all()
    assert (mine["max_gap"] >= mine["min_gap"]).all()


def test_near_search_matches_sql(con):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.near_search(SF)
    _assert_match(mine, corpus.NEAR_SEARCH_SQL, con)
    # NEAR at window 1 in order == the phrase hits are a subset
    ph = corpus.phrase_search(SF, corpus.NEAR_TERMS)
    nr1 = corpus.near_search(SF, *corpus.NEAR_TERMS, window=1)
    assert set(ph["doc_id"]) <= set(nr1["doc_id"])


def test_q19_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    _assert_match(relational.q19_discounted_revenue(SF),
                  relational.Q19_REVENUE_SQL, con)


def test_time_weighted_value_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.time_weighted_value(SF)
    _assert_match(mine, temporal.TIME_WEIGHTED_SQL, con)
    # held time per user equals the (last - first) event span
    span = con.execute(
        "SELECT user_id, epoch_us(MAX(ts)) - epoch_us(MIN(ts)) "
        "FROM events GROUP BY user_id HAVING COUNT(*) > 1 "
        "ORDER BY user_id").fetchdf()
    got = mine.set_index("user_id")["held_us"]
    assert (got.to_numpy() == span.iloc[:, 1].to_numpy()).all()


def test_attribution_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.attribution_last_touch(SF)
    _assert_match(mine, temporal.ATTRIBUTION_SQL, con)
    # conservation: every purchase is attributed exactly once
    n_p = con.execute("SELECT COUNT(*) FROM events WHERE "
                      "event_type = 'purchase'").fetchone()[0]
    assert int(mine["n_purchases"].sum()) == n_p


def test_cheapest_supplier_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    mine = relational.cheapest_supplier_per_part(SF)
    _assert_match(mine, relational.CHEAPEST_SUPPLIER_SQL, con)
    # argmin-as-packed-min: the reported price IS the part's min price
    want = con.execute(
        "SELECT l_partkey, MIN(ROUND(l_extendedprice*100)::BIGINT)"
        " FROM lineitem GROUP BY 1 ORDER BY 1").fetchdf()
    assert ((mine["price"] * 100).round().astype(np.int64).to_numpy()
            == want.iloc[:, 1].to_numpy()).all()


def test_gini_matches_sql(con):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.activity_gini_parts(SF)
    _assert_match(mine, temporal.GINI_SQL, con)
    # Gini is in [0, 1): 0 <= num < den
    assert 0 <= int(mine["gini_num"].iloc[0]) < int(mine["gini_den"].iloc[0])


def test_events_mad_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    mine = relational.events_value_mad(SF)
    _assert_match(mine, relational.EVENTS_MAD_SQL, con)
    assert (mine["mad_cents"] >= 0).all()


def test_mmr_matches_sql(con):
    from spatial_aez_ray.datapipe import simsearch
    mine = simsearch.mmr_diversified_topk(SF)
    _assert_match(mine, simsearch.MMR_TOPK_SQL, con)
    # rank-1 is the pure-relevance argmax (signed similarities mean
    # later MARGINAL scores can exceed it, so no dominance claim)
    top = con.execute(
        """WITH s AS (SELECT MAX(list_max(list_transform(embedding,
               x -> abs(x)))) AS v FROM embeddings),
        qv AS (SELECT vec_id AS qid, list_transform(embedding,
               x -> ROUND(x*127/s.v)) AS ql
               FROM embeddings, s ORDER BY vec_id LIMIT 2),
        cv AS (SELECT vec_id, list_transform(embedding,
               x -> ROUND(x*127/s.v)) AS cl FROM embeddings, s)
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY CAST(list_dot_product(ql, cl) AS BIGINT) DESC,
               vec_id) AS rn
        FROM qv CROSS JOIN cv WHERE vec_id <> qid
        QUALIFY rn = 1""").fetchdf()
    r1 = mine[mine["rank"] == 1].set_index("query_id")["vec_id"]
    for _, row in top.iterrows():
        assert int(r1.loc[int(row["qid"])]) == int(row["vec_id"])


def test_kwic_matches_sql(con):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.kwic_snippets(SF)
    _assert_match(mine, corpus.KWIC_SNIPPETS_SQL, con)
    # every snippet contains the phrase verbatim, and KWIC docs ==
    # phrase_search docs
    ph = " ".join(corpus.PHRASE_TERMS)
    assert mine["snippet"].str.contains(ph, regex=False).all()
    assert mine["doc_id"].tolist() == \
        corpus.phrase_search(SF)["doc_id"].tolist()


def test_vocab_growth_matches_sql(con):
    from spatial_aez_ray.datapipe import corpus
    mine = corpus.vocab_growth(SF)
    _assert_match(mine, corpus.VOCAB_GROWTH_SQL, con)
    # monotone nondecreasing, final point == full vocab size
    assert (mine["vocab"].diff().dropna() >= 0).all()
    full = con.execute(
        "SELECT COUNT(DISTINCT token) FROM (SELECT unnest("
        "string_split(text, ' ')) AS token FROM documents)"
    ).fetchone()[0]
    assert int(mine["vocab"].iloc[-1]) <= full


def test_nation_hhi_matches_sql(con):
    from spatial_aez_ray.datapipe import relational
    mine = relational.nation_revenue_hhi(SF)
    _assert_match(mine, relational.NATION_HHI_SQL, con)
    # Cauchy-Schwarz: n * sumsq >= sum^2 (HHI >= 1/n); python ints
    # (object dtype) avoid int64 overflow in the check itself
    assert ((mine["n_cust"].astype(object)
             * mine["sumsq_cents"].astype(object))
            >= (mine["sum_cents"].astype(object) ** 2)).all()


def test_ngram_lm_novelty_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import text
    mine = text.ngram_lm_novelty(SF)
    _assert_match(mine, text.NGRAM_LM_NOVELTY_SQL, con)
    assert (mine["n_seen"] + mine["n_unseen"] == mine["n_bigrams"]).all()
    # the corpus has shared boilerplate, so the trained table must
    # recognize SOMETHING in held-out docs
    assert mine["n_seen"].sum() > 0
    assert mine["n_unseen"].sum() > 0


def test_customer_order_distribution_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.customer_order_distribution(SF)
    _assert_match(mine, relational.CUSTOMER_ORDER_DISTRIBUTION_SQL, con)
    # total histogram mass == customer count (Q13 includes zeros)
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert int(mine["n_customers"].sum()) == n_cust


def test_orders_moving_sum_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import temporal
    mine = temporal.orders_moving_sum(SF)
    _assert_match(mine, temporal.ORDERS_MOVING_SUM_SQL, con)
    assert (mine["mov_n"] >= 1).all() and (mine["mov_n"]
                                           <= temporal.MOVING_W).all()
    # a customer's earliest order frames only itself, so every
    # customer has exactly one mov_n == 1 row
    ones = mine[mine["mov_n"] == 1].groupby("custkey").size()
    assert (ones == 1).all()
    assert set(ones.index) == set(mine["custkey"])


def test_supplier_variety_matches_sql(con, ray_session):
    from spatial_aez_ray.datapipe import relational
    mine = relational.supplier_variety_by_part_class(SF)
    _assert_match(mine, relational.SUPPLIER_VARIETY_SQL, con)
    assert (mine["supplier_cnt"] >= 1).all()
    assert (mine["n_parts"] >= 1).all()



def test_brute_twin_size_guards(monkeypatch, tmp_path):
    """The two labeled O(N^2)/full-broadcast oracle twins refuse
    oversized inputs with an error naming the bucketed alternative."""
    import pytest
    from spatial_aez_ray.datapipe import dedup as dd
    from spatial_aez_ray.datapipe import simsearch as ss
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    monkeypatch.setattr(dd, "_JACCARD_PAIRS_MAX_DOCS", 3)
    docs = pa.table({"doc_id": [1, 2, 3, 4],
                     "text": ["a", "b", "c", "d"]})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    with pytest.raises(ValueError, match="ngram_jaccard_dedup"):
        dd.jaccard_pairs(str(tmp_path))

    monkeypatch.setattr(ss, "_EMB_NEARDUP_MAX_VECS", 3)
    emb = pa.table({"vec_id": [1, 2, 3, 4],
                    "embedding": [[0.1, 0.2]] * 4})
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        ss.embedding_neardup(str(tmp_path))

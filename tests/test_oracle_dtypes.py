"""Engine-vs-oracle dtype parity over EVERY oracle_sql() entry.

The driver's correctness hash is dtype-sensitive: int64 engine values
vs a float64-fetched oracle column hash-mismatch even when bit-equal
(CORRECTNESS_r04's one red row, ``orders_moving_sum`` — a windowed
SUM DuckDB returned as HUGEINT -> float64 because the oracle SQL was
missing a ``::BIGINT``). Value-level checks can't catch that class:
this test runs every ``__ray_entry__.oracle_sql()`` entry at sf0.001
and asserts, per column, exact numpy dtype equality between the
engine frame and the DuckDB-fetched oracle frame (plus the usual
rowcount/schema/value equality via ``tools.check_entry.compare``,
which now enforces the dtype rule for the standalone sweep too).

Known dormant cases this pinned when added: integral float64s
(pricing_summary.sum_qty, price_histogram.bin_lo,
quantiles_by_returnflag.q25/q50/q90, dedup_ngram_containment
.containment3 — both sides float64, fragile to engine refactors) and
seven int32-vs-int64 drifts fixed by ::BIGINT casts in the oracles
(doc_embedding_label_stats.label, cms_token_counters.sketch_row,
vocab_growth.n_docs, nation_revenue_hhi.nationkey,
supplier_variety_by_part_class.p_size, centroid_outliers.label,
knn_label_vote.pred_label).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_every_oracle_matches_engine_dtypes():
    import __ray_entry__ as E
    from tools.check_entry import TABLES, compare, to_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    missing = [n for n in oracles if n not in qs]
    assert not missing, f"oracles without queries() entries: {missing}"

    failures = []
    for name, sql in oracles.items():
        try:
            mine = to_pandas(qs[name](SF_DIR))
            odf = con.execute(sql).fetchdf()
        except Exception as ex:  # keep sweeping, report all at the end
            failures.append(f"{name}: raised {type(ex).__name__}: {ex}")
            continue
        errs = compare(name, mine, odf)
        if errs:
            failures.append(f"{name}: " + "; ".join(errs))
    assert not failures, (
        f"{len(failures)} oracle-parity failures:\n" +
        "\n".join(failures))

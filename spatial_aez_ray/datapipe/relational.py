"""Generic relational pipelines over the star-schema parquet tables.

These exercise the engine's core distributed primitives on ordinary
tabular data, mirroring the spatial pipelines' patterns
(SURVEY.md §2.5/§2.4):

* ``pricing_summary``  — partial-aggregate-before-shuffle grouped sum
  (the A1 zonal-sum pattern: per-batch combiner inside ``map_batches``,
  then a tiny ``groupby`` over pre-reduced keys; raw rows never shuffle).
* ``revenue_by_nation`` — broadcast hash join (J2 pattern: the small
  dimension side is ``ray.put`` once and probed per batch; no shuffle
  join for a 25-row table).
* ``region_rollup_revenue`` — one-to-many broadcast rollup (J3/A4).
* ``top_orders`` — distributed sort + limit (O1).
* ``events_daily`` / ``events_type_stats`` — time-bucketed and
  categorical grouped aggregates over the event stream table.
* ``filter_parts`` — predicate + projection pushdown at the read.

Exact-match discipline: every money/quantity column in the test data is
2-decimal, so all sums are computed in integer cents/percent units
(int64, order-independent and exactly associative) and divided back to
float at the very end — bit-identical to the DuckDB oracle regardless
of parallel reduction order (SURVEY.md §7.4 float-determinism note).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None,
          **kw) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, **kw)


def _cents(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """2-decimal double -> exact int64 cents, rounding half AWAY from
    zero to match DuckDB ROUND exactly (np.round is half-to-even, which
    disagrees by one cent whenever x*100 is exactly representable as
    k+0.5 — e.g. 0.125; the oracle contract is ROUND on both sides).
    trunc (not floor) implements half-away-from-zero for BOTH signs:
    floor(-1.13*100 - 0.5) = -114 but DuckDB ROUND(-1.13*100) = -113."""
    a = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
    return np.trunc(a * 100.0 + np.copysign(0.5, a)).astype(np.int64)


# ---------------------------------------------------------------------------
# pricing_summary — TPC-H-Q1-shaped grouped sums with per-batch partials
# ---------------------------------------------------------------------------

def _q1_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: reduce ~thousands of rows to <=6 key rows
    before the shuffle (A1 partial phase, extract_country_data.py:59-71
    semantics re-expressed)."""
    df = pd.DataFrame({
        "l_returnflag": batch["l_returnflag"].to_pandas(),
        "l_linestatus": batch["l_linestatus"].to_pandas(),
        "qty": _cents(batch["l_quantity"]) // 100,
        "price_c": _cents(batch["l_extendedprice"]),
        # disc_price in 1e-4 units: cents * (100 - discount_pct)
        "disc_u": _cents(batch["l_extendedprice"])
                  * (100 - _cents(batch["l_discount"])),
        "n": np.ones(batch.num_rows, dtype=np.int64),
    })
    g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
           .sum(numeric_only=True))
    return pa.Table.from_pandas(g, preserve_index=False)


#: below this total input size the per-batch partials (a handful of
#: integer rows per block) are finished on the driver — the
#: distributed groupby's sort shuffle has a ~1 s warm fixed floor that
#: dwarfs a pandas sum over O(blocks) rows. Integer-cent sums are
#: order-independent, so both finishes are bit-identical (and equal to
#: the DuckDB oracle).
_Q1_DRIVER_MAX_INPUT_BYTES = 8 << 30


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])
    partials = ds.map_batches(_q1_partial, batch_format="pyarrow")
    try:
        small = sum(os.path.getsize(f) for f in ds.input_files()) \
            <= _Q1_DRIVER_MAX_INPUT_BYTES
    except Exception:  # pragma: no cover - non-file source
        small = False
    if small:
        out = (partials.to_pandas()
               .groupby(["l_returnflag", "l_linestatus"], as_index=False)
               [["qty", "price_c", "disc_u", "n"]].sum())
    else:
        agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("qty", alias_name="qty"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_u", alias_name="disc_u"),
            Sum("n", alias_name="n"))
        out = agg.to_pandas()
    out["sum_qty"] = out.pop("qty").astype(np.int64) * 1.0
    out["sum_price"] = out.pop("price_c").astype(np.int64) / 100.0
    out["sum_disc_price"] = out.pop("disc_u").astype(np.int64) / 10000.0
    out["row_cnt"] = out.pop("n").astype(np.int64)
    return (out.sort_values(["l_returnflag", "l_linestatus"])
               .reset_index(drop=True))


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(ROUND(l_quantity) AS BIGINT)) * 1.0 AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
           AS sum_disc_price,
       COUNT(*) AS row_cnt
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# revenue_by_nation — broadcast hash join, dimension side shipped once
# ---------------------------------------------------------------------------

class _RevenueJoiner:
    """Task-based stage holding the broadcast dimension maps
    (custkey->nationkey, nationkey->name) built ONCE per worker from
    object-store refs — the J2 broadcast-small-side pattern
    (SURVEY.md §2.4; the reference's analog is admin_names.py lookup)."""

    def __init__(self, cust_ref, nation_ref):
        import ray
        ckey, cnat = ray.get(cust_ref)
        self.cust2nat = dict(zip(ckey, cnat))
        nkey, nname = ray.get(nation_ref)
        self.nat_name = dict(zip(nkey, nname))

    def __call__(self, batch: pa.Table) -> pa.Table:
        nat = np.array([self.cust2nat.get(k, -1)
                        for k in batch["o_custkey"].to_numpy()])
        rev = _cents(batch["o_totalprice"])
        df = pd.DataFrame({"nk": nat, "rev_c": rev,
                           "n": np.ones(len(nat), dtype=np.int64)})
        g = df.groupby("nk", as_index=False).sum()
        g["n_name"] = [self.nat_name.get(int(k), "") for k in g["nk"]]
        return pa.Table.from_pandas(g[["nk", "n_name", "rev_c", "n"]],
                                    preserve_index=False)


def _dim_refs(sf_dir: str):
    import pyarrow.parquet as pq
    import ray
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    cust_ref = ray.put((cust["c_custkey"].to_pylist(),
                        cust["c_nationkey"].to_pylist()))
    nation_ref = ray.put((nation["n_nationkey"].to_pylist(),
                          nation["n_name"].to_pylist()))
    nat2reg = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_regionkey"].to_pylist()))
    return cust_ref, nation_ref, nat2reg


def _revenue_by_nationkey(sf_dir: str) -> pd.DataFrame:
    cust_ref, nation_ref, _ = _dim_refs(sf_dir)
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    from .util import as_task_fn
    agg = (ds.map_batches(as_task_fn(_RevenueJoiner, cust_ref=cust_ref,
                                     nation_ref=nation_ref),
                          batch_format="pyarrow")
             .groupby(["nk", "n_name"])
             .aggregate(Sum("rev_c", alias_name="rev_c"),
                        Sum("n", alias_name="n")))
    return agg.to_pandas()


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    out = _revenue_by_nationkey(sf_dir)
    out = out[out["nk"] >= 0].copy()
    out["revenue"] = out.pop("rev_c").astype(np.int64) / 100.0
    out["order_cnt"] = out.pop("n").astype(np.int64)
    out = out.drop(columns=["nk"])
    return out.sort_values("n_name").reset_index(drop=True)


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# supplier_balance_by_nation — broadcast dim join + min/max/sum partials
# ---------------------------------------------------------------------------

class _SupplierBalance:
    """Broadcast nationkey->name map; per-batch (nation) partials carry
    count + sum + min + max account balance in exact integer cents, so
    the distributed combine (Sum/Min/Max) is order-free and bit-equal
    to DuckDB."""

    def __init__(self, nation_ref):
        import ray
        nkey, nname = ray.get(nation_ref)
        self.nat_name = dict(zip(nkey, nname))

    def __call__(self, batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy()
        bal = _cents(batch["s_acctbal"])
        df = pd.DataFrame({"nk": nk, "bal_c": bal})
        g = df.groupby("nk", as_index=False).agg(
            n=("bal_c", "size"), bal_c=("bal_c", "sum"),
            min_c=("bal_c", "min"), max_c=("bal_c", "max"))
        g = g[g["nk"].map(self.nat_name.__contains__)]
        g["n_name"] = [self.nat_name[int(k)] for k in g["nk"]]
        return pa.Table.from_pandas(
            g[["n_name", "n", "bal_c", "min_c", "max_c"]],
            preserve_index=False)


def supplier_balance_by_nation(sf_dir: str) -> pd.DataFrame:
    """Supplier account-balance stats per nation (count / total / min /
    max) — the dimension ships once via ``ray.put``; only <=nations
    partial rows per block reach the combine."""
    import pyarrow.parquet as pq
    import ray as _ray
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nation_ref = _ray.put((nation["n_nationkey"].to_pylist(),
                           nation["n_name"].to_pylist()))
    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    from .util import as_task_fn
    agg = (ds.map_batches(as_task_fn(_SupplierBalance,
                                     nation_ref=nation_ref),
                          batch_format="pyarrow")
             .groupby("n_name")
             .aggregate(Sum("n", alias_name="supplier_cnt"),
                        Sum("bal_c", alias_name="bal_c"),
                        Min("min_c", alias_name="min_c"),
                        Max("max_c", alias_name="max_c")))
    out = agg.to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    out["total_acctbal"] = out.pop("bal_c").astype(np.int64) / 100.0
    out["min_acctbal"] = out.pop("min_c").astype(np.int64) / 100.0
    out["max_acctbal"] = out.pop("max_c").astype(np.int64) / 100.0
    return out.sort_values("n_name").reset_index(drop=True)


SUPPLIER_BALANCE_BY_NATION_SQL = """
SELECT n_name,
       COUNT(*) AS supplier_cnt,
       SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) / 100.0
           AS total_acctbal,
       MIN(CAST(ROUND(s_acctbal * 100) AS BIGINT)) / 100.0
           AS min_acctbal,
       MAX(CAST(ROUND(s_acctbal * 100) AS BIGINT)) / 100.0
           AS max_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# local_supplier_revenue — TPC-H-Q5-shaped fact-fact equi-join
# ---------------------------------------------------------------------------

def local_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue from lineitems whose supplier and ordering customer
    share a nation (TPC-H Q5 shape), grouped by that nation.

    Scale shape: lineitem ⋈ orders is FACT-FACT at 100 TB, so the
    equi-join runs on a coarse hash co-partition of the order key
    (the anti-join's fold); supplier and customer are dimension-side
    and ship once via ``ray.put``. Lineitem pre-reduces per batch to
    (orderkey, supplier-nation) cent sums before the shuffle; inside
    each partition the probe is one sorted ``np.searchsorted`` against
    the orders side, and only per-nation cent partials leave the
    groups. Revenue is exact integer cents×(100-disc) on both sides.
    """
    import pyarrow.parquet as pq
    import ray as _ray
    from .util import shuffle_width

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    supp_ref = _ray.put((supp["s_suppkey"].to_pylist(),
                         supp["s_nationkey"].to_pylist()))
    cust_ref = _ray.put((cust["c_custkey"].to_pylist(),
                         cust["c_nationkey"].to_pylist()))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    n_parts = shuffle_width(li)

    class _LiPrep:
        def __init__(self, supp_ref):
            skey, snat = _ray.get(supp_ref)
            self.s2n = dict(zip(skey, snat))

        def __call__(self, b: pa.Table) -> pa.Table:
            key = b["l_orderkey"].to_numpy().astype(np.int64)
            snk = np.array([self.s2n.get(int(k), -1)
                            for k in b["l_suppkey"].to_numpy()],
                           dtype=np.int64)
            rev = _cents(b["l_extendedprice"]) \
                * (100 - _cents(b["l_discount"]))
            df = pd.DataFrame({"key": key, "nk": snk, "rev_c": rev,
                               "n": np.ones(len(key), dtype=np.int64)})
            g = df.groupby(["key", "nk"], as_index=False).sum()
            g["part"] = (g["key"] % n_parts).astype(np.int32)
            g["side"] = np.ones(len(g), dtype=np.int8)
            return pa.Table.from_pandas(
                g[["part", "key", "nk", "rev_c", "n", "side"]],
                preserve_index=False)

    class _OrdPrep:
        def __init__(self, cust_ref):
            ckey, cnat = _ray.get(cust_ref)
            self.c2n = dict(zip(ckey, cnat))

        def __call__(self, b: pa.Table) -> pa.Table:
            key = b["o_orderkey"].to_numpy().astype(np.int64)
            cnk = np.array([self.c2n.get(int(k), -2)
                            for k in b["o_custkey"].to_numpy()],
                           dtype=np.int64)
            return pa.table({
                "part": pa.array((key % n_parts).astype(np.int32)),
                "key": pa.array(key),
                "nk": pa.array(cnk),
                "rev_c": pa.array(np.zeros(len(key), dtype=np.int64)),
                "n": pa.array(np.zeros(len(key), dtype=np.int64)),
                "side": pa.array(np.zeros(len(key), dtype=np.int8))})

    from .util import as_task_fn
    both = (li.map_batches(as_task_fn(_LiPrep, supp_ref=supp_ref),
                           batch_format="pyarrow")
              .union(orders.map_batches(
                  as_task_fn(_OrdPrep, cust_ref=cust_ref),
                  batch_format="pyarrow")))

    def q5_join(g: pd.DataFrame) -> pd.DataFrame:
        is_li = g["side"].to_numpy() == 1
        o = g.loc[~is_li]
        okey = o["key"].to_numpy()
        order = np.argsort(okey, kind="stable")
        okey = okey[order]
        onk = o["nk"].to_numpy()[order]
        li_rows = g.loc[is_li]
        lkey = li_rows["key"].to_numpy()
        pos = np.searchsorted(okey, lkey)
        pos = np.clip(pos, 0, max(len(okey) - 1, 0))
        cust_nk = np.full(len(lkey), -2, dtype=np.int64)
        if len(okey):
            found = okey[pos] == lkey
            cust_nk[found] = onk[pos[found]]
        keep = cust_nk == li_rows["nk"].to_numpy()
        kept = li_rows.loc[keep]
        out = kept.groupby("nk", as_index=False).agg(
            rev_c=("rev_c", "sum"), n=("n", "sum"))
        out["nk"] = out["nk"].astype(np.int64)
        return out[["nk", "rev_c", "n"]]

    agg = (both.groupby("part")
               .map_groups(q5_join, batch_format="pandas")
               .groupby("nk")
               .aggregate(Sum("rev_c", alias_name="rev_c"),
                          Sum("n", alias_name="n"))
               .to_pandas())
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="nk", right_on="n_nationkey")
    out["revenue"] = out.pop("rev_c").astype(np.int64) / 10000.0
    out["lineitem_cnt"] = out.pop("n").astype(np.int64)
    return (out[["n_name", "revenue", "lineitem_cnt"]]
            .sort_values("n_name").reset_index(drop=True))


LOCAL_SUPPLIER_REVENUE_SQL = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue,
       COUNT(*) AS lineitem_cnt
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# price_histogram — fixed-width value distribution, bins-sized shuffle
# ---------------------------------------------------------------------------

_HIST_WIDTH_CENTS = 500_00  # $500 bins


def price_histogram(sf_dir: str) -> pd.DataFrame:
    """Equal-width histogram of lineitem extended prices — the
    distribution scan every ingestion runs over a numeric column.

    Scale shape: each batch reduces to at most #bins (bin, n) partial
    rows via one integer floor-divide + groupby count, so the shuffle
    carries bins×blocks tiny rows regardless of table size. Binning is
    exact integer cents (floor division), mirrored by FLOOR() in the
    oracle, so counts are bit-equal."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def part(b: pa.Table) -> pa.Table:
        bins = _cents(b["l_extendedprice"]) // _HIST_WIDTH_CENTS
        uniq, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow")
             .groupby("bin").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    agg["bin_lo"] = agg.pop("bin").astype(np.int64) \
        * (_HIST_WIDTH_CENTS / 100.0)
    agg["n"] = agg["n"].astype(np.int64)
    return (agg[["bin_lo", "n"]].sort_values("bin_lo")
            .reset_index(drop=True))


PRICE_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  / 50000.0) AS BIGINT) * 500.0 AS bin_lo,
       COUNT(*) AS n
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# distributed INTERSECT / EXCEPT — distinct key-set operations between
# two fact-sized sides (O5 set-op family; the semi/anti JOINS above
# return rollups, these return the literal distinct sets)
# ---------------------------------------------------------------------------

def _key_setop(sf_dir: str, op: str) -> pd.DataFrame:
    """DISTINCT set op between events.user_id and customer.c_custkey.

    Scale shape: both sides pre-dedupe per batch (only distinct 8-byte
    keys shuffle), land on the same coarse hash fold, and the set op is
    one vectorized ``np.intersect1d`` / ``np.setdiff1d`` per partition
    — correct because hash partitioning sends every copy of a key to
    the same fold. Output is result-sized by nature (the set itself).
    """
    from .util import shuffle_width

    ev = _read(sf_dir, "events", columns=["user_id"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    n_parts = shuffle_width(ev)

    def prep(col: str, side: int):
        def f(b: pa.Table) -> pa.Table:
            key = np.unique(np.asarray(
                b[col].to_numpy(zero_copy_only=False), dtype=np.int64))
            return pa.table({
                "part": pa.array((key % n_parts).astype(np.int32)),
                "key": pa.array(key),
                "side": pa.array(np.full(len(key), side, dtype=np.int8))})
        return f

    both = (ev.map_batches(prep("user_id", 0), batch_format="pyarrow")
              .union(cust.map_batches(prep("c_custkey", 1),
                                      batch_format="pyarrow")))

    def setop(g: pd.DataFrame) -> pd.DataFrame:
        s = g["side"].to_numpy()
        a = np.unique(g.loc[s == 0, "key"].to_numpy())
        b = np.unique(g.loc[s == 1, "key"].to_numpy())
        if op == "intersect":
            keys = np.intersect1d(a, b, assume_unique=True)
        elif op == "except_users":
            keys = np.setdiff1d(a, b, assume_unique=True)
        else:  # except_customers
            keys = np.setdiff1d(b, a, assume_unique=True)
        return pd.DataFrame({"user_id": keys.astype(np.int64)})

    out = (both.groupby("part")
               .map_groups(setop, batch_format="pandas")
               .to_pandas())
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def users_intersect_customers(sf_dir: str) -> pd.DataFrame:
    return _key_setop(sf_dir, "intersect")


def customers_except_users(sf_dir: str) -> pd.DataFrame:
    out = _key_setop(sf_dir, "except_customers")
    return out.rename(columns={"user_id": "c_custkey"})


USERS_INTERSECT_CUSTOMERS_SQL = """
SELECT user_id FROM events
INTERSECT
SELECT c_custkey FROM customer
ORDER BY user_id
"""

CUSTOMERS_EXCEPT_USERS_SQL = """
SELECT c_custkey FROM customer
EXCEPT
SELECT user_id FROM events
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# region_rollup_revenue — one-to-many rollup (A4 region pattern)
# ---------------------------------------------------------------------------

def region_rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """Nation revenues rolled up to regions on the driver — the A4
    pattern: the grouped result is tiny (25 rows), so the rollup join
    runs driver-side exactly like extract_country_data.py:254-263."""
    import pyarrow.parquet as pq
    per_nat = _revenue_by_nationkey(sf_dir)
    per_nat = per_nat[per_nat["nk"] >= 0]
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat2reg = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    reg_name = dict(zip(region["r_regionkey"], region["r_name"]))
    acc: dict[str, list[int]] = {}
    for _, row in per_nat.iterrows():
        rname = reg_name[nat2reg[int(row["nk"])]]
        cur = acc.setdefault(rname, [0, 0])
        cur[0] += int(row["rev_c"])
        cur[1] += int(row["n"])
    out = pd.DataFrame({"r_name": list(acc),
                        "revenue": [v[0] / 100.0 for v in acc.values()],
                        "order_cnt": [v[1] for v in acc.values()]})
    return out.sort_values("r_name").reset_index(drop=True)


REGION_ROLLUP_REVENUE_SQL = """
SELECT r_name,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# top_orders — sort + limit
# ---------------------------------------------------------------------------

def top_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    top = (ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
             .limit(k).to_pandas())
    return top.reset_index(drop=True)


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# events — time-bucketed + categorical grouped aggregates
# ---------------------------------------------------------------------------

def _events_partial(batch: pa.Table) -> pa.Table:
    day = pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                  pa.timestamp("us"))
    df = pd.DataFrame({"day": day.to_pandas(),
                       "val_c": _cents(batch["value"]),
                       "n": np.ones(batch.num_rows, dtype=np.int64)})
    g = df.groupby("day", as_index=False).sum()
    return pa.Table.from_pandas(g, preserve_index=False)


def events_daily(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    agg = (ds.map_batches(_events_partial, batch_format="pyarrow")
             .groupby("day")
             .aggregate(Sum("val_c", alias_name="val_c"),
                        Sum("n", alias_name="n")))
    out = agg.to_pandas()
    out["event_day"] = pd.to_datetime(out.pop("day")).dt.strftime("%Y-%m-%d")
    out["sum_value"] = out.pop("val_c").astype(np.int64) / 100.0
    out["event_cnt"] = out.pop("n").astype(np.int64)
    return (out[["event_day", "sum_value", "event_cnt"]]
            .sort_values("event_day").reset_index(drop=True))


EVENTS_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS event_day,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value,
       COUNT(*) AS event_cnt
FROM events GROUP BY event_day ORDER BY event_day
"""


def events_type_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "val_c": _cents(batch["value"]),
                           "n": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby("event_type", as_index=False).agg(
            val_c=("val_c", "sum"), n=("n", "sum"),
            min_c=("val_c", "min"), max_c=("val_c", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("val_c", alias_name="val_c"),
                        Sum("n", alias_name="n"),
                        Min("min_c", alias_name="min_c"),
                        Max("max_c", alias_name="max_c")))
    out = agg.to_pandas()
    out["sum_value"] = out.pop("val_c").astype(np.int64) / 100.0
    out["event_cnt"] = out.pop("n").astype(np.int64)
    out["min_value"] = out.pop("min_c").astype(np.int64) / 100.0
    out["max_value"] = out.pop("max_c").astype(np.int64) / 100.0
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_TYPE_STATS_SQL = """
SELECT event_type,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value,
       COUNT(*) AS event_cnt,
       MIN(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS min_value,
       MAX(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# filter_parts — predicate + projection pruned at the read (S4 analog)
# ---------------------------------------------------------------------------

def filter_parts(sf_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pds
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_brand", "p_size", "p_retailprice"],
        filter=pds.field("p_size") >= 25)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"p_brand": batch["p_brand"].to_pandas(),
                           "price_c": _cents(batch["p_retailprice"]),
                           "n": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby("p_brand", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("p_brand")
             .aggregate(Sum("price_c", alias_name="price_c"),
                        Sum("n", alias_name="n")))
    out = agg.to_pandas()
    out["sum_retailprice"] = out.pop("price_c").astype(np.int64) / 100.0
    out["part_cnt"] = out.pop("n").astype(np.int64)
    return out.sort_values("p_brand").reset_index(drop=True)


FILTER_PARTS_SQL = """
SELECT p_brand,
       SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) / 100.0
           AS sum_retailprice,
       COUNT(*) AS part_cnt
FROM part WHERE p_size >= 25
GROUP BY p_brand ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# native hash shuffle join (the wide-join path, complementing the
# broadcast join above: both sides hash-partition on the key — the
# right choice when neither side fits in one worker's heap)
# ---------------------------------------------------------------------------

def revenue_by_mktsegment(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer via Dataset.join (hash shuffle join), then
    grouped revenue per market segment in exact cents."""
    from .util import shuffle_width
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=shuffle_width(orders),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c_mktsegment": batch["c_mktsegment"].to_pandas(),
                           "rev_c": _cents(batch["o_totalprice"]),
                           "n": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby("c_mktsegment", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby("c_mktsegment")
                 .aggregate(Sum("rev_c", alias_name="rev_c"),
                            Sum("n", alias_name="n")))
    out = agg.to_pandas()
    out["revenue"] = out.pop("rev_c").astype(np.int64) / 100.0
    out["order_cnt"] = out.pop("n").astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


REVENUE_BY_MKTSEGMENT_SQL = """
SELECT c_mktsegment,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def distinct_order_priorities(sf_dir: str) -> pd.DataFrame:
    """Distributed distinct via Dataset.unique."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority"])
    vals = sorted(ds.unique("o_orderpriority"))
    return pd.DataFrame({"o_orderpriority": vals})


DISTINCT_ORDER_PRIORITIES_SQL = """
SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority
"""


def salted_qty_by_returnflag(sf_dir: str) -> pd.DataFrame:
    """Grouped quantity sums via the salted two-phase aggregation
    (stages.salted) — the skew-handling path, exact by integer units."""
    from ..stages.salted import salted_sum

    def to_units(b: pa.Table) -> pa.Table:
        q = np.round(np.asarray(
            b["l_quantity"].to_numpy(zero_copy_only=False))).astype(np.int64)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "sum_qty": pa.array(q)})

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    units = ds.map_batches(to_units, batch_format="pyarrow")
    out = salted_sum(units, ["l_returnflag"], "sum_qty", n_salts=16)
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    return out


SALTED_QTY_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def doc_embedding_label_stats(sf_dir: str) -> pd.DataFrame:
    """documents ⋈ embeddings on doc_id == vec_id (the multimodal
    text-to-vector join), counting docs per (label, lang). Both sides
    are fact tables at 100 TB, so this is a hash SHUFFLE join
    (Dataset.join) — not a broadcast of the embedding label map —
    followed by the usual partial-agg groupby."""
    from .util import shuffle_width
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "label"])
    joined = docs.join(emb, join_type="inner",
                       num_partitions=shuffle_width(docs),
                       on=("doc_id",), right_on=("vec_id",))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "label": np.asarray(
                batch["label"].to_numpy(zero_copy_only=False),
                dtype=np.int64),
            "lang": batch["lang"].to_pylist(),
            "doc_cnt": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["label", "lang"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby(["label", "lang"])
                 .aggregate(Sum("doc_cnt", alias_name="doc_cnt")))
    out = agg.to_pandas()
    out["label"] = out["label"].astype(np.int64)
    out["doc_cnt"] = out["doc_cnt"].astype(np.int64)
    return out.sort_values(["label", "lang"]).reset_index(drop=True)


DOC_EMBEDDING_LABEL_STATS_SQL = """
SELECT e.label::BIGINT AS label, d.lang AS lang, COUNT(*) AS doc_cnt
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY e.label, d.lang ORDER BY label, lang
"""


# ---------------------------------------------------------------------------
# group_topk_orders — per-key top-k with a per-batch combiner
# ---------------------------------------------------------------------------

# coarse fold width for the per-key finish (the tiny-groups rule:
# never one Ray group per customer); cluster-aware — a fixed 64 caps
# the finish stage's parallelism on a big cluster. Results are
# width-invariant: the finish groups by the real key inside each fold.


def group_topk_orders(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k orders per customer by (o_totalprice DESC, o_orderkey
    ASC). The per-batch combiner keeps at most k rows per key present
    in the batch (global per-key top-k ⊆ union of per-batch per-key
    top-k), so the shuffle carries O(keys x k), not every order; the
    finish runs per coarse key-fold partition with a vectorized pandas
    groupby inside. Prices pass through unchanged (no arithmetic), so
    doubles are bit-identical to the oracle's."""
    from .util import coarse_fold_width
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": np.asarray(
                batch["o_custkey"].to_numpy(zero_copy_only=False),
                dtype=np.int64),
            "o_orderkey": np.asarray(
                batch["o_orderkey"].to_numpy(zero_copy_only=False),
                dtype=np.int64),
            "o_totalprice": np.asarray(
                batch["o_totalprice"].to_numpy(zero_copy_only=False),
                dtype=np.float64)})
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("o_custkey", as_index=False).head(k)
        df["part"] = (df["o_custkey"]
                      % coarse_fold_width()).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("o_custkey", as_index=False).head(k)
        g["rnk"] = g.groupby("o_custkey").cumcount() + 1
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rnk"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("part")
             .map_groups(finish, batch_format="pandas")
             .to_pandas())
    out["rnk"] = out["rnk"].astype(np.int64)
    return out.sort_values(["o_custkey", "rnk"]).reset_index(drop=True)


GROUP_TOPK_ORDERS_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM ranked
WHERE rnk <= 3 ORDER BY o_custkey, rnk
"""


# ---------------------------------------------------------------------------
# exact grouped quantiles via value-count histograms
# ---------------------------------------------------------------------------

def quantiles_by_returnflag(sf_dir: str) -> pd.DataFrame:
    """Exact discrete quantiles (q25/q50/q90) of l_quantity per
    returnflag, computed from distributed per-(flag, value) counts —
    the right shape for low-cardinality numeric columns at 100 TB: the
    shuffle carries one row per (flag, distinct value), and the driver
    walks a ~50-row histogram per flag. quantile_disc semantics:
    sorted[floor((n-1) * q)] — matched to DuckDB exactly; values pass
    through as integer cents and divide back once."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pylist(),
            "qty_c": _cents(batch["l_quantity"]),
            "cnt": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["l_returnflag", "qty_c"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["l_returnflag", "qty_c"])
              .aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())

    rows = []
    for flag, g in hist.groupby("l_returnflag"):
        g = g.sort_values("qty_c")
        vals = g["qty_c"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])

        def disc(q: float) -> float:
            # DuckDB quantile_disc: sorted[ceil(q*n) - 1] (empirically
            # verified; floor((n-1)*q) disagrees when frac(q*n) <= q —
            # masked here by duplicate quantities, exact regardless)
            import math
            return float(vals[np.searchsorted(cum, math.ceil(q * n))]
                         / 100.0)

        rows.append((flag, n, disc(0.25), disc(0.5), disc(0.9)))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n", "q25", "q50",
                                      "q90"])
    return out.sort_values("l_returnflag").reset_index(drop=True)


QUANTILES_BY_RETURNFLAG_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n,
       quantile_disc(l_quantity, 0.25) AS q25,
       quantile_disc(l_quantity, 0.5)  AS q50,
       quantile_disc(l_quantity, 0.9)  AS q90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# range partitioning — exact-quantile boundaries + partitioned write
# (the layout step before any sort-consuming stage or resumable sink)
# ---------------------------------------------------------------------------

RANGE_N_BUCKETS = 8


def _range_boundaries(sf_dir: str, n_buckets: int) -> np.ndarray:
    """Exact bucket boundaries: discrete quantiles of o_totalprice
    (integer cents) at i/n_buckets, from a distributed value-count
    histogram (one shuffle of pre-reduced (cents, cnt) rows — exact and
    deterministic; a 100 TB deployment with near-unique keys would swap
    in a sampled histogram here, trading exactness it doesn't need)."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"cents": _cents(batch["o_totalprice"]),
                           "cnt": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby("cents", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("cents").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("cents"))
    vals = hist["cents"].to_numpy(dtype=np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    # quantile_disc semantics: sorted[ceil(q*n) - 1] — determined
    # empirically against DuckDB (NOT floor((n-1)*q): the two differ
    # whenever frac(q*n) <= q, visible on near-unique keys)
    import math
    return np.array([
        vals[np.searchsorted(cum, math.ceil((i / n_buckets) * n))]
        for i in range(1, n_buckets)], dtype=np.int64)


def range_partition_orders(sf_dir: str,
                           n_buckets: int = RANGE_N_BUCKETS,
                           out_dir: str | None = None) -> pd.DataFrame:
    """Range-partition orders into ``n_buckets`` by o_totalprice:
    bucket(x) = #boundaries below x, boundaries = exact i/n quantiles.
    Returns the per-bucket summary (bucket, n_rows, min_cents,
    max_cents); with ``out_dir`` also writes each bucket as its own
    parquet subdirectory (hive layout via ``partition_cols``) — the
    resumable, skew-visible layout a later global sort / merge-join
    consumes without re-shuffling.

    Two passes over the input: boundaries from the histogram (above),
    then a stateless per-batch assign — the boundary array rides into
    each task as a broadcast closure constant, never re-shipped per
    batch. Bucket counts differ from n/n_buckets only by boundary ties
    (duplicate keys collapse into the lower bucket, exactly like the
    oracle's (x > b_i) sum)."""
    bounds = _range_boundaries(sf_dir, n_buckets)
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def assign(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"])
        bucket = np.searchsorted(bounds, cents, side="left")
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "bucket": pa.array(bucket.astype(np.int64)),
            "cents": pa.array(cents)})

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    if out_dir is not None:
        assigned.write_parquet(out_dir, partition_cols=["bucket"])
        assigned = ray.data.read_parquet(out_dir)

    def summarize(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "bucket": np.asarray(
                batch["bucket"].to_numpy(zero_copy_only=False),
                dtype=np.int64),
            "cents": np.asarray(
                batch["cents"].to_numpy(zero_copy_only=False),
                dtype=np.int64)})
        g = df.groupby("bucket").agg(
            n_rows=("cents", "size"), min_cents=("cents", "min"),
            max_cents=("cents", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (assigned.map_batches(summarize, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Min("min_cents", alias_name="min_cents"),
                      Max("max_cents", alias_name="max_cents"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def _range_partition_sql(n_buckets: int = RANGE_N_BUCKETS) -> str:
    qs = ", ".join(
        f"quantile_disc(cents, {i}.0/{n_buckets}) AS b{i}"
        for i in range(1, n_buckets))
    cmp = " + ".join(f"(c.cents > q.b{i})::INT"
                     for i in range(1, n_buckets))
    return f"""
WITH c AS (
  SELECT ROUND(o_totalprice * 100)::BIGINT AS cents FROM orders),
q AS (SELECT {qs} FROM c)
SELECT ({cmp})::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_rows,
       MIN(c.cents) AS min_cents,
       MAX(c.cents) AS max_cents
FROM c, q GROUP BY bucket ORDER BY bucket
"""


RANGE_PARTITION_ORDERS_SQL = _range_partition_sql()


# ---------------------------------------------------------------------------
# bloom-filter semi-join — the big⋈medium join pattern: a tiny bloom
# filter (not the key set) broadcasts to prune the fact side, the
# survivors go through the exact shuffle join
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 17     # 16 KiB — fixed size regardless of build rows
_BLOOM_HASHES = 3
_BLOOM_PART_MAX_SIZE = 15   # build-side predicate: p_size < 15


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, _BLOOM_HASHES) bit positions per key, from disjoint slices
    of the stable 64-bit md5 hash (deterministic across processes)."""
    from .dedup import _h64u
    h = np.fromiter((_h64u(str(int(k))) for k in keys),
                    dtype=np.uint64, count=len(keys))
    mask = np.uint64(_BLOOM_BITS - 1)
    return np.stack([(h >> np.uint64(17 * i)) & mask
                     for i in range(_BLOOM_HASHES)], axis=1)


def _bloom_test(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    pos = _bloom_positions(keys)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(_BLOOM_HASHES):
        p = pos[:, i]
        ok &= (words[p >> np.uint64(6)]
               >> (p & np.uint64(63))) & np.uint64(1) != 0
    return ok


def bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Revenue by returnflag over lineitem rows whose part passes
    ``p_size < 15`` — computed as bloom-prefilter + exact verify join.

    The scale pattern this demonstrates: when the build side is too
    large to broadcast as an exact key set, broadcast a FIXED-SIZE
    bloom filter instead (16 KiB here, independent of build rows —
    vs O(keys) for the np.isin membership array). The probe side
    drops most non-matching rows batch-locally (no false negatives,
    so nothing is lost); only the surviving fraction pays the exact
    hash shuffle join that removes bloom false positives. Build:
    per-batch partial bit arrays OR-ed on the driver (#blocks x 16 KiB
    — block-count-sized, not key-count-sized)."""
    import ray
    from .util import shuffle_width

    part = _read(sf_dir, "part", columns=["p_partkey", "p_size"])

    def build(batch: pa.Table) -> pa.Table:
        sizes = np.asarray(batch["p_size"].to_numpy(zero_copy_only=False))
        keys = np.asarray(batch["p_partkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)[sizes < _BLOOM_PART_MAX_SIZE]
        words = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        if len(keys):
            pos = _bloom_positions(keys).ravel()
            np.bitwise_or.at(words, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    parts = part.map_batches(build, batch_format="pyarrow").take_all()
    words = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    for row in parts:
        words |= np.frombuffer(row["words"], dtype=np.uint64)
    bloom_ref = ray.put(words)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_returnflag", "l_extendedprice"])

    def probe(batch: pa.Table) -> pa.Table:
        w = ray.get(bloom_ref)
        keys = np.asarray(batch["l_partkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        return batch.filter(pa.array(_bloom_test(w, uniq)[inv]))

    survivors = li.map_batches(probe, batch_format="pyarrow")
    build_keys = (part.filter(expr=f"p_size < {_BLOOM_PART_MAX_SIZE}")
                  .select_columns(["p_partkey"]))
    exact = survivors.join(build_keys, join_type="inner",
                           num_partitions=shuffle_width(li),
                           on=("l_partkey",), right_on=("p_partkey",))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pandas(),
            "rev_c": _cents(batch["l_extendedprice"]),
            "n": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (exact.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("rev_c", alias_name="revenue_cents"),
                      Sum("n", alias_name="n_rows"))
           .to_pandas())
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return (out[["l_returnflag", "n_rows", "revenue_cents"]]
            .sort_values("l_returnflag").reset_index(drop=True))


BLOOM_SEMI_JOIN_SQL = f"""
SELECT l_returnflag,
       COUNT(*)::BIGINT AS n_rows,
       SUM(ROUND(l_extendedprice * 100)::BIGINT)::BIGINT AS revenue_cents
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part
                    WHERE p_size < {_BLOOM_PART_MAX_SIZE})
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# distributed anti-join — customers with NO event activity, per nation
# (the "never engaged" cohort query; the complement of a semi-join)
# ---------------------------------------------------------------------------

def inactive_customers_by_nation(sf_dir: str) -> pd.DataFrame:
    """Anti-join customer ⟕̸ events on (c_custkey = user_id), rolled up
    to per-nation counts: (n_name, n_inactive).

    Scale shape: BOTH sides are fact-sized at 100 TB, so neither is
    broadcast. Each side is pre-reduced per batch (events collapse to
    the batch's distinct user_ids), both land on the same coarse hash
    fold of the key, the anti-difference is one vectorized ``np.isin``
    inside ``map_groups`` per partition, and only per-nation partial
    counts leave the groups. The 25-row nation name map is the only
    driver-side table.
    """
    from .util import shuffle_width

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    events = _read(sf_dir, "events", columns=["user_id"])
    n_parts = shuffle_width(cust)

    def cust_prep(b: pa.Table) -> pa.Table:
        key = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "part": pa.array((key % n_parts).astype(np.int32)),
            "key": pa.array(key),
            "nationkey": b["c_nationkey"].cast(pa.int64()),
            "is_cust": pa.array(np.ones(len(key), dtype=np.int8))})

    def event_prep(b: pa.Table) -> pa.Table:
        key = np.unique(
            b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "part": pa.array((key % n_parts).astype(np.int32)),
            "key": pa.array(key),
            "nationkey": pa.array(np.full(len(key), -1, dtype=np.int64)),
            "is_cust": pa.array(np.zeros(len(key), dtype=np.int8))})

    both = (cust.map_batches(cust_prep, batch_format="pyarrow")
                .union(events.map_batches(event_prep,
                                          batch_format="pyarrow")))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        is_cust = g["is_cust"].to_numpy() == 1
        active = g.loc[~is_cust, "key"].to_numpy()
        c = g.loc[is_cust]
        inactive = c.loc[~np.isin(c["key"].to_numpy(), active)]
        out = (inactive.groupby("nationkey", as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out[["nationkey", "n"]]

    agg = (both.groupby("part")
               .map_groups(anti, batch_format="pandas")
               .groupby("nationkey")
               .aggregate(Sum("n", alias_name="n_inactive"))
               .to_pandas())

    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="nationkey", right_on="n_nationkey")
    out["n_inactive"] = out["n_inactive"].astype(np.int64)
    return (out[["n_name", "n_inactive"]]
            .sort_values("n_name").reset_index(drop=True))


INACTIVE_CUSTOMERS_SQL = """
SELECT n.n_name AS n_name, COUNT(*) AS n_inactive
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
GROUP BY n.n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# robust outlier detection — IQR fences per group, computed entirely
# from the distributed value-count histogram (one shuffle, no second
# pass: the same histogram yields both the quantiles and the counts)
# ---------------------------------------------------------------------------

def events_value_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier counts of ``value`` per event_type:
    (event_type, n, q1, q3, n_outliers) with the 1.5×IQR rule applied
    in doubled-integer form (2v < 2q1 − 3·iqr ∨ 2v > 2q3 + 3·iqr) so
    the boundary never touches float arithmetic. Quantiles use the
    DuckDB quantile_disc convention sorted[ceil(q·n) − 1] (the repo's
    documented ceil rule — the floor form disagrees on near-unique
    columns exactly like this one).

    One (type, cents)-histogram shuffle; the driver walks ~2k-row
    histograms per type and derives fences AND outlier counts from the
    same counts — the value column itself crosses the wire once as
    pre-summed histogram rows, never twice.
    """
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "val_c": _cents(batch["value"]),
            "cnt": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["event_type", "val_c"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "val_c"])
              .aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("val_c")
        vals = g["val_c"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        q1 = int(vals[np.searchsorted(cum, math.ceil(0.25 * n))])
        q3 = int(vals[np.searchsorted(cum, math.ceil(0.75 * n))])
        iqr = q3 - q1
        out_mask = (2 * vals < 2 * q1 - 3 * iqr) | \
                   (2 * vals > 2 * q3 + 3 * iqr)
        rows.append((etype, n, q1 / 100.0, q3 / 100.0,
                     int(cnts[out_mask].sum())))
    out = pd.DataFrame(rows, columns=["event_type", "n", "q1", "q3",
                                      "n_outliers"])
    out["n"] = out["n"].astype(np.int64)
    out["n_outliers"] = out["n_outliers"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_VALUE_OUTLIERS_SQL = """
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS v FROM events),
qs AS (SELECT event_type,
              quantile_disc(v, 0.25) AS q1,
              quantile_disc(v, 0.75) AS q3,
              COUNT(*) AS n
       FROM c GROUP BY event_type)
SELECT c.event_type,
       CAST(ANY_VALUE(n) AS BIGINT) AS n,
       ANY_VALUE(q1) / 100.0 AS q1,
       ANY_VALUE(q3) / 100.0 AS q3,
       CAST(SUM(CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1)
                       OR 2 * v > 2 * q3 + 3 * (q3 - q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM c JOIN qs USING (event_type)
GROUP BY c.event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# winsorized mean — robust-stats family beside the IQR fences
# ---------------------------------------------------------------------------

def winsorized_value_stats(sf_dir: str) -> pd.DataFrame:
    """Per-event-type winsorized mean of ``value`` at the 5th/95th
    percentiles: (event_type, n, p05, p95, wmean) where every value is
    clamped into [p05, p95] before the mean — the robust location
    estimate a quality-score or latency column wants when a fat tail
    would swamp the plain mean.

    Exactness: cents-integer clamp + sum; percentiles use the repo's
    documented quantile_disc ceil convention; ``wmean`` is the same
    two-division chain as the oracle ((sum/n)/100) on identical
    integers, so the float output is bit-equal.

    Scale shape: identical to ``events_value_outliers`` — ONE
    (type, cents)-histogram shuffle with per-batch pre-summing; the
    driver walks the tiny per-type histograms; raw values cross the
    wire only as pre-reduced (value, count) rows.
    """
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "val_c": _cents(batch["value"]),
            "cnt": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["event_type", "val_c"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "val_c"])
              .aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("val_c")
        vals = g["val_c"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        p05 = int(vals[np.searchsorted(cum, math.ceil(0.05 * n))])
        p95 = int(vals[np.searchsorted(cum, math.ceil(0.95 * n))])
        clamped = np.clip(vals, p05, p95)
        s = int((clamped * cnts).sum())
        rows.append((etype, n, p05 / 100.0, p95 / 100.0,
                     (float(s) / n) / 100.0))
    out = pd.DataFrame(rows, columns=["event_type", "n", "p05", "p95",
                                      "wmean"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


WINSORIZED_VALUE_STATS_SQL = """
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS v FROM events),
qs AS (SELECT event_type,
              quantile_disc(v, 0.05) AS p05,
              quantile_disc(v, 0.95) AS p95,
              COUNT(*) AS n
       FROM c GROUP BY event_type)
SELECT c.event_type,
       CAST(ANY_VALUE(n) AS BIGINT) AS n,
       ANY_VALUE(p05) / 100.0 AS p05,
       ANY_VALUE(p95) / 100.0 AS p95,
       (CAST(SUM(LEAST(GREATEST(v, p05), p95)) AS DOUBLE)
        / ANY_VALUE(n)) / 100.0 AS wmean
FROM c JOIN qs USING (event_type)
GROUP BY c.event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# table profiling — per-column stats (the "what is this table" scan)
# ---------------------------------------------------------------------------

PROFILE_TABLE = "events"
PROFILE_COLUMNS = ("event_id", "event_type", "props", "ts", "user_id",
                   "value")


def profile_table(sf_dir: str, table: str = PROFILE_TABLE) -> pd.DataFrame:
    """Per-column profile of a table: (col, n, n_null, n_distinct) —
    the first scan every ingestion runs over unknown data.

    Two streamed passes: pass 1 reduces each block to one
    (col, n, n_null) row set; pass 2 hashes values vectorized
    (``pd.util.hash_pandas_object``), pre-dedupes per batch, and
    shuffles only 8-byte (col, hash) rows — nulls excluded, matching
    COUNT(DISTINCT). At 100 TB the distinct pass carries at most one
    hash per distinct value per block; swap in the KMV sketch
    (``sketch.kmv_distinct_parts``) when approximate is acceptable.
    """
    cols = list(PROFILE_COLUMNS) if table == PROFILE_TABLE else None
    ds = _read(sf_dir, table, columns=cols)

    def counts(batch: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        for c in batch.column_names:
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(batch[c].null_count)
        return pa.table({"col": pa.array(names),
                         "n": pa.array(ns, pa.int64()),
                         "n_null": pa.array(nulls, pa.int64())})

    base = (ds.map_batches(counts, batch_format="pyarrow")
              .groupby("col")
              .aggregate(Sum("n", alias_name="n"),
                         Sum("n_null", alias_name="n_null"))
              .to_pandas())

    def hashes(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_c, out_h = [], []
        for c in df.columns:
            s = df[c].dropna()
            h = np.unique(pd.util.hash_pandas_object(
                s, index=False).to_numpy().astype(np.int64))
            out_c.extend([c] * len(h))
            out_h.append(h)
        return pa.table({
            "col": pa.array(out_c),
            "h": pa.array(np.concatenate(out_h) if out_h
                          else np.empty(0, np.int64))})

    distinct = (ds.map_batches(hashes, batch_format="pyarrow")
                  .groupby(["col", "h"])
                  .aggregate(Count(alias_name="_"))
                  .groupby("col")
                  .aggregate(Count(alias_name="n_distinct"))
                  .to_pandas())

    out = base.merge(distinct, on="col")
    for c in ("n", "n_null", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return (out[["col", "n", "n_null", "n_distinct"]]
            .sort_values("col").reset_index(drop=True))


def _profile_sql(table: str = PROFILE_TABLE,
                 columns=PROFILE_COLUMNS) -> str:
    parts = [
        f"SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM {table}"
        for c in columns]
    return ("SELECT * FROM (" + " UNION ALL ".join(parts) +
            ") ORDER BY col")


PROFILE_TABLE_SQL = _profile_sql()


# ---------------------------------------------------------------------------
# z-order clustering — multi-column locality (the OPTIMIZE ZORDER
# analog: one sort key that keeps BOTH columns' neighborhoods together)
# ---------------------------------------------------------------------------

ZORDER_BITS = 16
ZORDER_N_BUCKETS = 8


def _z_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Bit-interleave two 16-bit keys into one 32-bit Morton/z value.
    Written as the same explicit per-bit arithmetic the SQL oracle
    generates ((k >> i) & 1) << ... — no magic-number spread tricks, so
    both sides are literally the same expression."""
    z = np.zeros_like(x)
    for i in range(ZORDER_BITS):
        z = z | (((x >> i) & 1) << (2 * i))
        z = z | (((y >> i) & 1) << (2 * i + 1))
    return z


def zorder_orders(sf_dir: str, n_buckets: int = ZORDER_N_BUCKETS,
                  out_dir: str | None = None) -> pd.DataFrame:
    """Z-order-cluster orders on (o_custkey, o_totalprice): derive the
    Morton interleave of the two 16-bit sub-keys, range-partition on
    exact z quantiles, and summarize (bucket, n_rows, z_min, z_max).
    With ``out_dir`` the buckets are written hive-partitioned — a scan
    filtered on EITHER column then touches only the buckets whose
    z-interval intersects its value range, the locality property a
    single-column sort can't give both columns at once.

    Same two-pass shape as ``range_partition_orders``: a pre-reduced
    (z, cnt) histogram shuffle for boundaries, then a stateless
    vectorized assign with the boundary array as a closure constant.
    """
    import math

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def keys(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        cust = np.asarray(batch["o_custkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cents = _cents(batch["o_totalprice"])
        return cust & 0xFFFF, (cents >> 8) & 0xFFFF

    def hist_partial(batch: pa.Table) -> pa.Table:
        x, y = keys(batch)
        df = pd.DataFrame({"z": _z_interleave(x, y),
                           "cnt": np.ones(len(x), dtype=np.int64)})
        g = df.groupby("z", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
              .groupby("z").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("z"))
    vals = hist["z"].to_numpy(dtype=np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    bounds = np.array([
        vals[np.searchsorted(cum, math.ceil((i / n_buckets) * n))]
        for i in range(1, n_buckets)], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        x, y = keys(batch)
        z = _z_interleave(x, y)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "bucket": pa.array(
                np.searchsorted(bounds, z, side="left").astype(np.int64)),
            "z": pa.array(z)})

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    if out_dir is not None:
        assigned.write_parquet(out_dir, partition_cols=["bucket"])
        assigned = ray.data.read_parquet(out_dir)

    def summarize(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "bucket": np.asarray(
                batch["bucket"].to_numpy(zero_copy_only=False),
                dtype=np.int64),
            "z": np.asarray(batch["z"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)})
        g = df.groupby("bucket").agg(
            n_rows=("z", "size"), z_min=("z", "min"),
            z_max=("z", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (assigned.map_batches(summarize, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Min("z_min", alias_name="z_min"),
                      Max("z_max", alias_name="z_max"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def _zorder_sql(n_buckets: int = ZORDER_N_BUCKETS) -> str:
    terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(ZORDER_BITS))
    qs = ", ".join(
        f"quantile_disc(z, {i}.0/{n_buckets}) AS b{i}"
        for i in range(1, n_buckets))
    cmp = " + ".join(f"(c.z > q.b{i})::INT" for i in range(1, n_buckets))
    return f"""
WITH k AS (
  SELECT o_custkey & 65535 AS x,
         (ROUND(o_totalprice * 100)::BIGINT >> 8) & 65535 AS y
  FROM orders),
c AS (SELECT ({terms})::BIGINT AS z FROM k),
q AS (SELECT {qs} FROM c)
SELECT ({cmp})::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_rows,
       MIN(c.z) AS z_min, MAX(c.z) AS z_max
FROM c, q GROUP BY bucket ORDER BY bucket
"""


ZORDER_ORDERS_SQL = _zorder_sql()


# ---------------------------------------------------------------------------
# grouped OLS trend — per-group least-squares slope in exact integers
# ---------------------------------------------------------------------------

#: fixed day-zero for the trend regressor (x = days since this date);
#: a constant base keeps the sufficient statistics exact int64 without
#: a min-date pre-pass
TREND_EPOCH = "1992-01-01"


def events_value_trend(sf_dir: str) -> pd.DataFrame:
    """Per-event-type OLS slope of value-vs-time: (event_type, n,
    slope_num, slope_den, slope) where slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²), x = whole days since 1992-01-01, y = value cents.

    The regression state is the five sufficient statistics — all
    order-free int64 sums, pre-reduced per batch (one row per type per
    block), so the distributed result is EXACT and the float slope is
    one division of identical integers on both sides. The same shape
    extends to any grouped linear fit (drift detection, per-source
    quality trend) without a second pass.

    int64 bounds (documented): x ≤ ~12k days, y cents ≤ ~1e7 ⇒
    n·Σxy < 2^63 up to ~1e9 rows per group; beyond that, promote the
    driver-side combine to Python ints (partials stay int64-safe).
    """
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    base = np.datetime64(TREND_EPOCH, "D")

    def partial(b: pa.Table) -> pa.Table:
        x = (b["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[D]") - base).astype(np.int64)
        y = _cents(b["value"])
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "n": np.ones(len(x), dtype=np.int64),
                           "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sx", alias_name="sx"),
                        Sum("sy", alias_name="sy"),
                        Sum("sxy", alias_name="sxy"),
                        Sum("sxx", alias_name="sxx"))
             .to_pandas())
    n = agg["n"].to_numpy(dtype=np.int64)
    sx = agg["sx"].to_numpy(dtype=np.int64)
    sy = agg["sy"].to_numpy(dtype=np.int64)
    num = n * agg["sxy"].to_numpy(dtype=np.int64) - sx * sy
    den = n * agg["sxx"].to_numpy(dtype=np.int64) - sx * sx
    out = pd.DataFrame({
        "event_type": agg["event_type"], "n": n,
        "slope_num": num, "slope_den": den,
        "slope": num.astype(np.float64) / den.astype(np.float64)})
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_VALUE_TREND_SQL = f"""
WITH c AS (
  SELECT event_type,
         datediff('day', DATE '{TREND_EPOCH}', CAST(ts AS DATE))::BIGINT
             AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
         SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
         SUM(x * x)::BIGINT AS sxx
  FROM c GROUP BY event_type)
SELECT event_type, n,
       (n * sxy - sx * sy)::BIGINT AS slope_num,
       (n * sxx - sx * sx)::BIGINT AS slope_den,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# p50/p95/p99 summary — the latency-dashboard staple
# ---------------------------------------------------------------------------

def events_value_percentiles(sf_dir: str) -> pd.DataFrame:
    """Per-event-type p50/p95/p99 of ``value``: the SLO summary every
    metrics pipeline serves. Same one-histogram-shuffle shape as the
    IQR/winsorized ops (pre-reduced (type, cents) rows, quantile_disc
    ceil convention); output floats are cents/100 on both sides.
    """
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pylist(),
            "val_c": _cents(batch["value"]),
            "cnt": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["event_type", "val_c"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "val_c"])
              .aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("val_c")
        vals = g["val_c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        q = {p: int(vals[np.searchsorted(cum, math.ceil(p * n))])
             for p in (0.5, 0.95, 0.99)}
        rows.append((etype, n, q[0.5] / 100.0, q[0.95] / 100.0,
                     q[0.99] / 100.0))
    out = pd.DataFrame(rows, columns=["event_type", "n", "p50", "p95",
                                      "p99"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_VALUE_PERCENTILES_SQL = """
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS v FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       quantile_disc(v, 0.5) / 100.0 AS p50,
       quantile_disc(v, 0.95) / 100.0 AS p95,
       quantile_disc(v, 0.99) / 100.0 AS p99
FROM c GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# FK-violation counter — referential-integrity data-quality check
# ---------------------------------------------------------------------------

def fk_violations_orders(sf_dir: str) -> pd.DataFrame:
    """Orders whose o_custkey has no matching customer: (n_orders,
    n_violations, n_bad_keys) — the referential-integrity scan every
    ingestion runs.

    The dimension key set ships ONCE as a sorted numpy array via
    ``ray.put`` (plasma zero-copy — the documented fastest membership
    probe); each batch is one ``np.isin``. Per-batch partials reduce to
    (n, n_viol) plus the distinct bad keys (violation-sized, not
    fact-sized). When the dimension side outgrows a broadcast, swap in
    ``bloom_semi_join``'s fixed-size filter + exact shuffle — same
    output, documented scale path.
    """
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"])
    keys = np.sort(np.asarray(cust["c_custkey"].to_numpy(
        zero_copy_only=False), dtype=np.int64))
    keys_ref = ray.put(keys)

    class Probe:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            bad = ~np.isin(ck, self.keys)
            return pa.table({
                "n": pa.array([len(ck)], pa.int64()),
                "n_viol": pa.array([int(bad.sum())], pa.int64()),
                "bad_keys": pa.array([np.unique(ck[bad]).tolist()],
                                     pa.list_(pa.int64()))})

    ds = _read(sf_dir, "orders", columns=["o_custkey"])
    parts = ds.map_batches(Probe, batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    bad_all = (np.unique(np.concatenate(
        [np.asarray(x, dtype=np.int64) for x in parts["bad_keys"]]))
        if len(parts) else np.array([], dtype=np.int64))
    return pd.DataFrame([{
        "n_orders": np.int64(parts["n"].sum()),
        "n_violations": np.int64(parts["n_viol"].sum()),
        "n_bad_keys": np.int64(len(bad_all))}])


FK_VIOLATIONS_ORDERS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL
                                THEN o.o_custkey END)
            AS BIGINT) AS n_bad_keys
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# incremental view maintenance — additive-aggregate delta merging
# ---------------------------------------------------------------------------

IVM_CHUNKS = 4


def incremental_revenue_by_nation(sf_dir: str,
                                  n_chunks: int = IVM_CHUNKS
                                  ) -> pd.DataFrame:
    """The revenue-by-nation view maintained INCREMENTALLY: orders
    arrive in ``n_chunks`` batches (simulated by a deterministic
    orderkey hash split); each arrival runs the delta pipeline over
    ONLY its chunk (a pushed-down filter — at 100 TB the delta pass
    touches the new partition, never the history) and merges the
    per-nation partial into the stored view by integer addition.

    Additive aggregates (SUM/COUNT in cents) make the merge exact:
    the final view is bit-identical to the one-shot batch recompute —
    which is precisely what the SQL oracle checks (same query as the
    batch view). A non-additive view would store its mergeable partial
    (the sketch module's discipline) instead.
    """
    from .util import as_task_fn
    cust_ref, nation_ref, _ = _dim_refs(sf_dir)
    view: pd.DataFrame | None = None
    for chunk in range(n_chunks):
        ds = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

        def pick(b: pa.Table, chunk=chunk) -> pa.Table:
            keys = np.asarray(
                b["o_orderkey"].to_numpy(zero_copy_only=False),
                dtype=np.int64)
            return b.filter(pa.array(keys % n_chunks == chunk))

        delta = (ds.map_batches(pick, batch_format="pyarrow")
                 .map_batches(as_task_fn(_RevenueJoiner,
                                         cust_ref=cust_ref,
                                         nation_ref=nation_ref),
                              batch_format="pyarrow")
                 .groupby(["nk", "n_name"])
                 .aggregate(Sum("rev_c", alias_name="rev_c"),
                            Sum("n", alias_name="n"))
                 .to_pandas())
        if view is None:
            view = delta
        else:
            view = (pd.concat([view, delta], ignore_index=True)
                    .groupby(["nk", "n_name"], as_index=False)
                    [["rev_c", "n"]].sum())
    out = view[view["nk"] >= 0].copy()
    out["revenue"] = out.pop("rev_c").astype(np.int64) / 100.0
    out["order_cnt"] = out.pop("n").astype(np.int64)
    out = out.drop(columns=["nk"])
    return out.sort_values("n_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# distributed full outer join — the match/only-left/only-right audit
# ---------------------------------------------------------------------------

def customer_order_coverage(sf_dir: str,
                            num_partitions: int = 8) -> pd.DataFrame:
    """FULL OUTER join of customers against their per-customer order
    rollup: (match_status, n_keys, order_cnt, revenue) with status in
    {both, customer_only, orders_only} — the coverage audit an outer
    join exists for (who never ordered; which orders are orphaned).

    Both sides are fact-sized and co-shuffled by ``Dataset.join``
    (hash partitioned); the order side is PRE-REDUCED per custkey
    before the join so the joined row count is keys, not orders.
    Revenue stays integer cents end-to-end.
    """
    # deterministic side restrictions so every outer-join status is
    # exercised on TPC-H-ish data (where raw coverage is total): the
    # left keeps even custkeys, the right keeps orders from custkeys
    # ≡ 0 or 1 (mod 4) — both/-only classes all non-empty
    def c_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(pc.bit_wise_and(b["c_custkey"], 1), 0))
        # explicit presence marker: Dataset.join COALESCES the key
        # columns on a full outer join, so key-nullness cannot tell
        # which side a row came from
        return b.append_column(
            "c_present", pa.array(np.ones(b.num_rows, dtype=np.int8)))

    cust = (_read(sf_dir, "customer", columns=["c_custkey"])
            .map_batches(c_prep, batch_format="pyarrow"))
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def o_partial(b: pa.Table) -> pa.Table:
        ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        keep = (ck % 4) <= 1
        df = pd.DataFrame({
            "o_custkey": ck[keep],
            "n": np.ones(int(keep.sum()), dtype=np.int64),
            "rev_c": _cents(b["o_totalprice"])[keep]})
        g = df.groupby("o_custkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = (orders.map_batches(o_partial, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("rev_c", alias_name="rev_c")))
    joined = cust.join(per_cust, "full_outer", num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",))

    def status_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        has_c = df["c_present"].notna()
        has_o = df["n"].notna()
        status = np.where(has_c & has_o, "both",
                          np.where(has_c, "customer_only",
                                   "orders_only"))
        out = pd.DataFrame({
            "match_status": status,
            "n_keys": np.ones(len(df), dtype=np.int64),
            "order_cnt": df["n"].fillna(0).astype(np.int64),
            "rev_c": df["rev_c"].fillna(0).astype(np.int64)})
        g = out.groupby("match_status", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (joined.map_batches(status_partial, batch_format="pyarrow")
           .groupby("match_status")
           .aggregate(Sum("n_keys", alias_name="n_keys"),
                      Sum("order_cnt", alias_name="order_cnt"),
                      Sum("rev_c", alias_name="rev_c"))
           .to_pandas())
    agg["revenue"] = agg.pop("rev_c").astype(np.int64) / 100.0
    for c in ("n_keys", "order_cnt"):
        agg[c] = agg[c].astype(np.int64)
    return (agg.sort_values("match_status").reset_index(drop=True)
            [["match_status", "n_keys", "order_cnt", "revenue"]])


CUSTOMER_ORDER_COVERAGE_SQL = """
WITH o AS (
  SELECT o_custkey, COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders WHERE (o_custkey % 4) <= 1 GROUP BY o_custkey),
j AS (
  SELECT c.c_custkey, o.o_custkey, o.n, o.rev_c
  FROM (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) c
  FULL OUTER JOIN o ON c.c_custkey = o.o_custkey)
SELECT CASE WHEN c_custkey IS NOT NULL AND n IS NOT NULL THEN 'both'
            WHEN c_custkey IS NOT NULL THEN 'customer_only'
            ELSE 'orders_only' END AS match_status,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(COALESCE(n, 0)) AS BIGINT) AS order_cnt,
       SUM(COALESCE(rev_c, 0)) / 100.0 AS revenue
FROM j GROUP BY match_status ORDER BY match_status
"""


# ---------------------------------------------------------------------------
# merge_upsert_orders — lakehouse MERGE INTO (upsert) with copy-on-write
# partitions: the Delta/Iceberg write path (the relational twin of the
# IVF index's LSM maintenance)
# ---------------------------------------------------------------------------

MERGE_BUCKETS = 16      # hive partitions of the base snapshot
MERGE_INSERTS = 50      # synthetic new keys appended by the delta


def _merge_delta_tables(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic MERGE delta over orders: UPDATE rows — keys in
    bucket 3 with o_orderkey % 5 == 0 get +1.00 — and INSERT rows —
    ``MERGE_INSERTS`` fresh keys strictly above max(o_orderkey), all
    congruent 5 (mod 16) so they land in bucket 5. Deltas carry FINAL
    values (last-writer-wins), the shape a CDC feed delivers."""
    import ray

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def upd(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cents = _cents(b["o_totalprice"])
        m = (keys % MERGE_BUCKETS == 3) & (keys % 5 == 0)
        return pa.table({
            "o_orderkey": pa.array(keys[m]),
            "price_cents": pa.array(cents[m] + 100),
            "bucket": pa.array(keys[m] % MERGE_BUCKETS)})

    mx = _read(sf_dir, "orders", columns=["o_orderkey"]).aggregate(
        Max("o_orderkey"))["max(o_orderkey)"]
    base = (int(mx) // MERGE_BUCKETS)
    ins_keys = np.array(
        [(base + i) * MERGE_BUCKETS + 5
         for i in range(1, MERGE_INSERTS + 1)], dtype=np.int64)
    ins = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array(ins_keys),
        "price_cents": pa.array(ins_keys * 137),
        "bucket": pa.array(ins_keys % MERGE_BUCKETS)}))
    return ds.map_batches(upd, batch_format="pyarrow").union(ins)


def apply_merge(base_dir: str, delta_dir: str) -> dict:
    """COPY-ON-WRITE MERGE of a bucket-partitioned delta into the
    bucket-partitioned base snapshot: only partitions named by the
    delta are rewritten (read old part + bucket delta, drop updated
    keys, append delta rows, ONE atomic tmp+rename part per bucket);
    every other partition's files are not even opened. Returns
    {touched, rewritten_rows} — and is idempotent: deltas carry final
    values, so re-applying is a no-op on content.

    Scale shape: a CDC batch names its touched partitions; rewrite
    cost is O(touched partitions), each an independent task — the
    Delta Lake / Iceberg copy-on-write contract."""
    import glob
    import uuid

    import ray

    touched = sorted(
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(delta_dir, "bucket=*")))

    def rewrite(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        n_rows = []
        for bucket in b["bucket"].to_pylist():
            bdir = os.path.join(base_dir, f"bucket={bucket}")
            ddir = os.path.join(delta_dir, f"bucket={bucket}")
            delta = pq.read_table(ddir)
            dkeys = np.asarray(delta["o_orderkey"].to_numpy(), np.int64)
            cols = ["o_orderkey", "price_cents"]
            if os.path.isdir(bdir):
                old = pq.read_table(bdir, columns=cols)
                okeys = np.asarray(old["o_orderkey"].to_numpy(), np.int64)
                keep = old.filter(
                    pa.array(~np.isin(okeys, dkeys)))
                final = pa.concat_tables([keep, delta.select(cols)])
            else:
                os.makedirs(bdir, exist_ok=True)
                final = delta.select(cols)
            order = np.argsort(
                np.asarray(final["o_orderkey"].to_numpy(), np.int64),
                kind="stable")
            final = final.take(pa.array(order))
            tmp = os.path.join(bdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(final, tmp)
            stale = [p for p in glob.glob(os.path.join(bdir, "*"))
                     if not os.path.basename(p).startswith(".tmp-")]
            dst = os.path.join(bdir, "merged-0.parquet")
            os.replace(tmp, dst)
            for p in stale:
                if p != dst:
                    os.remove(p)
            n_rows.append(final.num_rows)
        return pa.table({"bucket": b["bucket"],
                         "n_rows": pa.array(n_rows, pa.int64())})

    rep = (ray.data.from_arrow(
               pa.table({"bucket": pa.array(touched, pa.int64())}))
           .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
           .to_pandas())
    return {"touched": touched,
            "rewritten_rows": int(rep["n_rows"].sum())}


def merge_upsert_orders(sf_dir: str, workdir: str) -> pd.DataFrame:
    """End-to-end MERGE INTO: snapshot orders hive-partitioned by
    o_orderkey % 16, build the deterministic CDC delta, copy-on-write
    apply, and return the merged (o_orderkey, price_cents) table.

    Self-verifies the copy-on-write contract in-query: every
    partition NOT named by the delta must be byte-identical after the
    merge (md5 over its part files), and at least one such partition
    must exist for the check to mean anything."""
    import glob
    import hashlib

    import ray

    base_dir = os.path.join(workdir, "base")
    delta_dir = os.path.join(workdir, "delta")
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def snap(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        return pa.table({
            "o_orderkey": pa.array(keys),
            "price_cents": pa.array(_cents(b["o_totalprice"])),
            "bucket": pa.array(keys % MERGE_BUCKETS)})

    ds.map_batches(snap, batch_format="pyarrow").write_parquet(
        base_dir, partition_cols=["bucket"])
    _merge_delta_tables(sf_dir).write_parquet(
        delta_dir, partition_cols=["bucket"])

    def dir_md5(d: str) -> dict[str, str]:
        out = {}
        for p in sorted(glob.glob(os.path.join(d, "bucket=*", "*"))):
            with open(p, "rb") as f:
                out[os.path.relpath(p, d)] = hashlib.md5(
                    f.read()).hexdigest()
        return out

    before = dir_md5(base_dir)
    rep = apply_merge(base_dir, delta_dir)
    after = dir_md5(base_dir)
    touched = {f"bucket={b}" for b in rep["touched"]}
    untouched_files = {k: v for k, v in before.items()
                       if k.split(os.sep)[0] not in touched}
    if not untouched_files:
        raise AssertionError("merge touched every partition")
    for k, v in untouched_files.items():
        if after.get(k) != v:
            raise AssertionError(f"untouched partition changed: {k}")

    out = (ray.data.read_parquet(base_dir,
                                 columns=["o_orderkey", "price_cents"])
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderkey").reset_index(drop=True)


MERGE_UPSERT_ORDERS_SQL = f"""
WITH mx AS (SELECT MAX(o_orderkey) AS mx FROM orders),
up AS (
  SELECT o_orderkey,
         ROUND(o_totalprice * 100)::BIGINT
         + CASE WHEN o_orderkey % {MERGE_BUCKETS} = 3
                 AND o_orderkey % 5 = 0 THEN 100 ELSE 0 END
           AS price_cents
  FROM orders),
ins AS (
  SELECT ((mx // {MERGE_BUCKETS}) + i) * {MERGE_BUCKETS} + 5
           AS o_orderkey,
         (((mx // {MERGE_BUCKETS}) + i) * {MERGE_BUCKETS} + 5) * 137
           AS price_cents
  FROM mx, generate_series(1, {MERGE_INSERTS}) s(i))
SELECT o_orderkey, price_cents FROM up
UNION ALL
SELECT o_orderkey::BIGINT, price_cents::BIGINT FROM ins
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# drift_report — distribution drift detection between two periods of
# the event stream (the data-quality monitor every production pipeline
# runs between snapshots)
# ---------------------------------------------------------------------------

def drift_report(sf_dir: str) -> pd.DataFrame:
    """Value-distribution drift per event type between the stream's
    first and second half (split at the exact integer-microsecond
    midpoint of [min ts, max ts]): per type, whole-dollar value bins
    are counted in each period and compared by the total-variation
    numerator  tv_num = Σ_bins |a·n2 − b·n1|  (a, b = bin counts,
    n1, n2 = period totals) — all int64, so the oracle matches
    bit-for-bit; TV distance itself is tv_num / (2·n1·n2), derivable
    by the caller.

    One scan: blocks reduce to (type, period, bin, n) partials; the
    tiny groupby result (types × 2 × dollar-bins) is the only thing
    the driver touches. The midpoint needs min/max ts first — a
    second tiny aggregate pass, not a materialization."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def us_col(b: pa.Table) -> np.ndarray:
        return (b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))

    def span_partial(b: pa.Table) -> pa.Table:
        us = us_col(b)
        return pa.table({"mn": pa.array([int(us.min())]),
                         "mx": pa.array([int(us.max())])})

    span = (ds.map_batches(span_partial, batch_format="pyarrow")
              .aggregate(Min("mn"), Max("mx")))
    mid = (int(span["min(mn)"]) + int(span["max(mx)"])) // 2

    def partial(b: pa.Table) -> pa.Table:
        us = us_col(b)
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pylist(),
            "period": (us > mid).astype(np.int64),
            "bin": cents // 100,
            "n": np.ones(len(us), dtype=np.int64)})
        g = df.groupby(["event_type", "period", "bin"],
                       as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    t = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "period", "bin"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    rows = []
    for et, g in t.groupby("event_type", sort=True):
        p1 = g[g["period"] == 0].set_index("bin")["n"]
        p2 = g[g["period"] == 1].set_index("bin")["n"]
        n1, n2 = int(p1.sum()), int(p2.sum())
        bins = sorted(set(p1.index) | set(p2.index))
        tv = sum(abs(int(p1.get(b, 0)) * n2 - int(p2.get(b, 0)) * n1)
                 for b in bins)
        rows.append((et, n1, n2, tv))
    out = pd.DataFrame(rows, columns=["event_type", "n1", "n2",
                                      "tv_num"])
    for c in ("n1", "n2", "tv_num"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


DRIFT_REPORT_SQL = """
WITH s AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
           FROM events),
e AS (SELECT event_type,
             (epoch_us(ts) > (SELECT mid FROM s))::BIGINT AS period,
             ROUND(value * 100)::BIGINT // 100 AS bin
      FROM events),
c AS (SELECT event_type, period, bin, COUNT(*)::BIGINT AS n
      FROM e GROUP BY 1, 2, 3),
tot AS (SELECT event_type,
               SUM(CASE WHEN period = 0 THEN n ELSE 0 END)::BIGINT AS n1,
               SUM(CASE WHEN period = 1 THEN n ELSE 0 END)::BIGINT AS n2
        FROM c GROUP BY 1),
bins AS (SELECT DISTINCT event_type, bin FROM c),
ab AS (SELECT b.event_type, b.bin,
              COALESCE(MAX(CASE WHEN c.period = 0 THEN c.n END), 0) AS a,
              COALESCE(MAX(CASE WHEN c.period = 1 THEN c.n END), 0) AS bb
       FROM bins b LEFT JOIN c
         ON c.event_type = b.event_type AND c.bin = b.bin
       GROUP BY b.event_type, b.bin)
SELECT ab.event_type, tot.n1, tot.n2,
       SUM(ABS(ab.a * tot.n2 - ab.bb * tot.n1))::BIGINT AS tv_num
FROM ab JOIN tot USING (event_type)
GROUP BY ab.event_type, tot.n1, tot.n2
ORDER BY ab.event_type
"""


# ---------------------------------------------------------------------------
# percent_rank transform — normalize a column to its empirical CDF
# position (the rank/quantile feature transform), exact integers
# ---------------------------------------------------------------------------

def events_percent_rank(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK of every event's value within its event type,
    as exact integers: (event_id, event_type, value_cents, rank_lt,
    n_minus_1) with PERCENT_RANK = rank_lt / n_minus_1 (the SQL
    definition: rows strictly below / (partition size − 1)) derivable
    by one division — no float crosses the oracle boundary.

    Two passes, zero row shuffles: pass 1 reduces blocks to
    (type, cents, n) histogram partials (the winsorize/percentile
    discipline — the aggregated histogram is value-universe-sized,
    never row-sized); the driver turns it into per-type cumulative
    counts, broadcast back; pass 2 maps each row to its strict-rank
    via one searchsorted per batch. The transform output is
    row-sized, but it streams — no driver materialization beyond the
    gate adapter."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "value"])

    def hist_partial(b: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "cents": cents,
                           "n": np.ones(len(cents), dtype=np.int64)})
        g = df.groupby(["event_type", "cents"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values(["event_type", "cents"]))
    cdf = {}
    for et, g in hist.groupby("event_type", sort=False):
        vals = g["cents"].to_numpy(dtype=np.int64)
        ns = g["n"].to_numpy(dtype=np.int64)
        below = np.concatenate(([0], np.cumsum(ns)[:-1]))
        cdf[et] = (vals, below, int(ns.sum()))
    bc = ray.put(cdf)

    def rank(b: pa.Table) -> pa.Table:
        table = ray.get(bc)
        ids = np.asarray(b["event_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ets = b["event_type"].to_pylist()
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        lt = np.zeros(len(ids), dtype=np.int64)
        nm1 = np.zeros(len(ids), dtype=np.int64)
        ets_arr = np.asarray(ets, dtype=object)
        for et in set(ets):
            m = ets_arr == et
            vals, below, n = table[et]
            pos = np.searchsorted(vals, cents[m])
            lt[m] = below[pos]
            nm1[m] = n - 1
        return pa.table({"event_id": pa.array(ids),
                         "event_type": b["event_type"],
                         "value_cents": pa.array(cents),
                         "rank_lt": pa.array(lt),
                         "n_minus_1": pa.array(nm1)})

    out = ds.map_batches(rank, batch_format="pyarrow").to_pandas()
    for c in ("event_id", "value_cents", "rank_lt", "n_minus_1"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       ROUND(value * 100)::BIGINT AS value_cents,
       (RANK() OVER (PARTITION BY event_type
                     ORDER BY ROUND(value * 100)::BIGINT) - 1)::BIGINT
         AS rank_lt,
       (COUNT(*) OVER (PARTITION BY event_type) - 1)::BIGINT
         AS n_minus_1
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# quantile normalization — batch-effect correction: map each group's
# value distribution onto the pooled distribution (the genomics /
# feature-preprocessing discipline), exact integers
# ---------------------------------------------------------------------------

def quantile_normalize_events(sf_dir: str) -> pd.DataFrame:
    """Per (event_type, value): the pooled-distribution value the
    group's value maps to under CDF matching — target = smallest
    pooled cents p with cdf_pool(p)·n_group >= cdf_group(v)·n_pool
    (cross-multiplied integers, the histogram-matching rule on tables).
    Returns (event_type, value_cents, n, norm_cents), ordered.

    One histogram shuffle: blocks pre-reduce to (type, cents, n) rows
    (plus the pooled histogram as the type-marginal of the same
    table); the matching runs on the aggregated value-universe-sized
    table — rows never shuffle, the percent_rank/winsorize shape."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "cents": cents,
                           "n": np.ones(len(cents), dtype=np.int64)})
        g = df.groupby(["event_type", "cents"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values(["event_type", "cents"]))
    pool = (hist.groupby("cents", as_index=False)["n"].sum()
            .sort_values("cents"))
    pv = pool["cents"].to_numpy(dtype=np.int64)
    pc = np.cumsum(pool["n"].to_numpy(dtype=np.int64))
    n_pool = int(pc[-1])
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        vals = g["cents"].to_numpy(dtype=np.int64)
        ns = g["n"].to_numpy(dtype=np.int64)
        cg = np.cumsum(ns)
        n_g = int(cg[-1])
        # smallest pooled value whose scaled CDF reaches the group's
        idx = np.searchsorted(pc * n_g, cg * n_pool, side="left")
        norm = pv[np.minimum(idx, len(pv) - 1)]
        for v, nn, nv in zip(vals, ns, norm):
            rows.append((et, int(v), int(nn), int(nv)))
    out = pd.DataFrame(rows, columns=["event_type", "value_cents",
                                      "n", "norm_cents"])
    for c in ("value_cents", "n", "norm_cents"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["event_type", "value_cents"])
            .reset_index(drop=True))


QUANTILE_NORMALIZE_EVENTS_SQL = """
WITH c AS (
  SELECT event_type, ROUND(value * 100)::BIGINT AS v,
         COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
g AS (
  SELECT event_type, v, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY v) AS cg,
         SUM(n) OVER (PARTITION BY event_type) AS ng
  FROM c),
p AS (
  SELECT v, SUM(n) AS pn FROM c GROUP BY v),
pc AS (
  SELECT v, SUM(pn) OVER (ORDER BY v) AS cp,
         SUM(pn) OVER () AS np FROM p)
SELECT g.event_type, g.v AS value_cents, g.n,
       (SELECT MIN(pc.v) FROM pc
        WHERE pc.cp * g.ng >= g.cg * pc.np)::BIGINT AS norm_cents
FROM g ORDER BY g.event_type, g.v
"""


# ---------------------------------------------------------------------------
# versioned MERGE + time travel — snapshot isolation: an upsert creates
# a NEW manifest over immutable parts; past versions stay readable
# (the Iceberg/Delta time-travel contract)
# ---------------------------------------------------------------------------

def _manifest_path(workdir: str, version: int) -> str:
    return os.path.join(workdir, f"manifest-v{version}.json")


def _write_manifest(workdir: str, version: int,
                    files: list[str]) -> None:
    import json
    tmp = _manifest_path(workdir, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "files": sorted(files)}, f)
    os.replace(tmp, _manifest_path(workdir, version))


def read_version(workdir: str, version: int) -> pd.DataFrame:
    """Time-travel read: the table AS OF ``version`` — exactly the
    parts its manifest names, nothing newer."""
    import json

    import ray

    with open(_manifest_path(workdir, version)) as f:
        files = json.load(f)["files"]
    out = (ray.data.read_parquet(
               [os.path.join(workdir, p) for p in files],
               columns=["o_orderkey", "price_cents"])
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def merge_upsert_versioned(sf_dir: str, workdir: str) -> pd.DataFrame:
    """The MERGE of ``merge_upsert_orders`` under snapshot isolation:
    version 1 = the bucket-partitioned base snapshot; the CDC delta
    produces version 2 by writing NEW immutable part files for the
    touched buckets and a new manifest referencing them plus every
    untouched v1 part — NO file is ever modified or deleted, so
    ``read_version(1)`` after the merge still returns the original
    table byte-for-byte (asserted in-query). Returns the v2 table —
    verified by the same SQL MERGE oracle."""
    import glob
    import uuid

    import pyarrow.parquet as pq
    import ray

    base_dir = os.path.join(workdir, "base")
    delta_dir = os.path.join(workdir, "delta")
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def snap(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["o_orderkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        return pa.table({
            "o_orderkey": pa.array(keys),
            "price_cents": pa.array(_cents(b["o_totalprice"])),
            "bucket": pa.array(keys % MERGE_BUCKETS)})

    ds.map_batches(snap, batch_format="pyarrow").write_parquet(
        base_dir, partition_cols=["bucket"])
    v1_files = [os.path.relpath(p, workdir) for p in
                glob.glob(os.path.join(base_dir, "bucket=*", "*"))]
    _write_manifest(workdir, 1, v1_files)
    _merge_delta_tables(sf_dir).write_parquet(
        delta_dir, partition_cols=["bucket"])

    touched = sorted(
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(delta_dir, "bucket=*")))

    def rewrite(b: pa.Table) -> pa.Table:
        new_files = []
        for bucket in b["bucket"].to_pylist():
            bdir = os.path.join(base_dir, f"bucket={bucket}")
            ddir = os.path.join(delta_dir, f"bucket={bucket}")
            delta = pq.read_table(ddir)
            dkeys = np.asarray(delta["o_orderkey"].to_numpy(), np.int64)
            cols = ["o_orderkey", "price_cents"]
            if os.path.isdir(bdir):
                old = pq.read_table(bdir, columns=cols)
                okeys = np.asarray(old["o_orderkey"].to_numpy(),
                                   np.int64)
                keep = old.filter(pa.array(~np.isin(okeys, dkeys)))
                final = pa.concat_tables([keep, delta.select(cols)])
            else:
                os.makedirs(bdir, exist_ok=True)
                final = delta.select(cols)
            order = np.argsort(
                np.asarray(final["o_orderkey"].to_numpy(), np.int64),
                kind="stable")
            final = final.take(pa.array(order))
            name = f"v2-{uuid.uuid4().hex[:12]}.parquet"
            tmp = os.path.join(bdir, "." + name)
            pq.write_table(final, tmp)
            os.replace(tmp, os.path.join(bdir, name))
            new_files.append(os.path.relpath(
                os.path.join(bdir, name), workdir))
        return pa.table({"bucket": b["bucket"],
                         "file": pa.array(new_files, pa.string())})

    rep = (ray.data.from_arrow(
               pa.table({"bucket": pa.array(touched, pa.int64())}))
           .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
           .to_pandas())
    touched_dirs = {f"bucket={b}" for b in touched}
    v2_files = [p for p in v1_files
                if p.split(os.sep)[1] not in touched_dirs] \
        + rep["file"].tolist()
    _write_manifest(workdir, 2, v2_files)
    return read_version(workdir, 2)


# ---------------------------------------------------------------------------
# hierarchical ROLLUP — region > nation > grand total: the GROUPING
# SETS complement to events_cube, over the dimension hierarchy
# ---------------------------------------------------------------------------

def revenue_rollup_hierarchy(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(region, nation) over order revenue: one row per
    (region, nation), one subtotal per region, one grand total —
    sentinel '*ALL*' marks rolled-up levels. Exact integer cents.

    One scan: the region/nation dimension chain broadcasts once
    (25 + 5 rows); blocks reduce to (region, nation) cent partials;
    every coarser level DERIVES from the aggregated tiny table, never
    a re-scan — the events_cube discipline on a dimension hierarchy."""
    import ray
    from ray.data.aggregate import Count, Sum

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]
                ).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    bc = ray.put((nat["n_nationkey"].to_numpy(np.int64),
                  nat["n_name"].to_numpy(object),
                  nat["r_name"].to_numpy(object)))

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust_bc = ray.put((cust["c_custkey"].to_numpy(np.int64),
                       cust["c_nationkey"].to_numpy(np.int64)))

    def partial(b: pa.Table) -> pa.Table:
        nk, nname, rname = ray.get(bc)
        ck, cnk = ray.get(cust_bc)
        keys = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cents = _cents(b["o_totalprice"])
        order = np.argsort(ck)
        pos = np.searchsorted(ck[order], keys)
        nat_of = cnk[order][pos]
        npos = np.searchsorted(np.sort(nk), nat_of)
        norder = np.argsort(nk)
        df = pd.DataFrame({
            "region": rname[norder][npos],
            "nation": nname[norder][npos],
            "c": cents})
        g = df.groupby(["region", "nation"], as_index=False)["c"].sum()
        g["n"] = df.groupby(["region", "nation"])["c"].count().values
        return pa.Table.from_pandas(g, preserve_index=False)

    base = (_read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["region", "nation"])
            .aggregate(Sum("c", alias_name="c"),
                       Sum("n", alias_name="n"))
            .to_pandas())
    lvl1 = base.copy()
    lvl2 = (base.groupby("region", as_index=False)[["c", "n"]].sum())
    lvl2["nation"] = "*ALL*"
    lvl3 = pd.DataFrame({"region": ["*ALL*"], "nation": ["*ALL*"],
                         "c": [base["c"].sum()], "n": [base["n"].sum()]})
    out = pd.concat([lvl1, lvl2, lvl3], ignore_index=True)
    out["revenue"] = out.pop("c").astype(np.int64) / 100.0
    out["order_cnt"] = out.pop("n").astype(np.int64)
    return (out[["region", "nation", "revenue", "order_cnt"]]
            .sort_values(["region", "nation"]).reset_index(drop=True))


REVENUE_ROLLUP_HIERARCHY_SQL = """
SELECT COALESCE(r_name, '*ALL*') AS region,
       CASE WHEN GROUPING(n_name) = 1 THEN '*ALL*'
            ELSE n_name END AS nation,
       SUM(ROUND(o_totalprice * 100)::BIGINT) / 100.0 AS revenue,
       COUNT(*)::BIGINT AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
"""


# ---------------------------------------------------------------------------
# skyline_orders — Pareto frontier (minimize price AND date) via the
# local-skyline superset property: no shuffle, batch-sized partials
# ---------------------------------------------------------------------------

def _skyline_2d(cents: np.ndarray, days: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Exact 2-D minimizing skyline over (cents, days), vectorized:
    keep min-day per price level, then the strictly-decreasing-day
    prefix scan over ascending prices. Returns sorted distinct pairs."""
    order = np.lexsort((days, cents))
    c, d = cents[order], days[order]
    first = np.ones(len(c), dtype=bool)
    first[1:] = c[1:] != c[:-1]          # min day per price = first row
    c, d = c[first], d[first]
    if len(c) == 0:
        return c, d
    run = np.minimum.accumulate(d)
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = d[1:] < run[:-1]          # strictly better date than all
    return c[keep], d[keep]              # cheaper points


def skyline_orders(sf_dir: str) -> pd.DataFrame:
    """Pareto-optimal orders: no other order is both <= in price and
    <= in date (strictly better in one) — the classic skyline
    operator, minimizing (o_totalprice, o_orderdate).

    Distributed shape: the global skyline is a SUBSET of every
    partition's local skyline, so each batch emits only its local
    frontier (O(log n) expected rows for independent dims — a
    per-batch combiner like the zonal partials), and the exact final
    frontier is computed over the tiny union on the driver. No
    shuffle, no O(N^2) dominance join anywhere; the SQL oracle uses
    the equivalent min-day-per-price + running-min formulation, not
    NOT EXISTS. Prices cross the boundary as integer cents.
    """
    ds = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def local(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"])
        days = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c, d = _skyline_2d(cents, days)
        return pa.table({"c": pa.array(c), "d": pa.array(d)})

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    c, d = _skyline_2d(parts["c"].to_numpy(dtype=np.int64),
                       parts["d"].to_numpy(dtype=np.int64))
    return pd.DataFrame({
        "price": c / 100.0,   # single division of exact cents
        "o_orderdate": d.astype("datetime64[us]"),
    }).reset_index(drop=True)


SKYLINE_ORDERS_SQL = """
WITH pts AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p,
         MIN(o_orderdate) AS d
  FROM orders GROUP BY 1),
run AS (
  SELECT p, d,
         MIN(d) OVER (ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS md
  FROM pts)
SELECT p / 100.0 AS price, d AS o_orderdate
FROM run WHERE md IS NULL OR d < md
ORDER BY p
"""


# ---------------------------------------------------------------------------
# value_prop_correlation — per-group Pearson r from EXACT integer
# moment partials (the distributed-statistics discipline: five int64
# sums per group per block; the float appears once, at the very end)
# ---------------------------------------------------------------------------

def value_prop_correlation(sf_dir: str) -> pd.DataFrame:
    """Per-event-type Pearson correlation between the event value and
    the numeric ``k`` property, from exact integer moments.

    Distributed shape: each batch reduces to (type, n, Σx, Σy, Σx²,
    Σy², Σxy) with x = value cents, y = k — order-free int64 sums, so
    the moments are exact under any partitioning (float Welford
    chains would not be). r is derived ONCE on the driver as
    (nΣxy − ΣxΣy) / sqrt((nΣx² − Σx²ᵗᵒᵗ)·(nΣy² − Σy²ᵗᵒᵗ)) with the
    big-int → double conversions in the same IEEE order as the SQL
    oracle's expression, so even the float column matches bit-exactly.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "value", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch["value"])
        k = pc.extract_regex(batch["props"], r"(?P<k>[0-9]+)")
        y = np.asarray(pc.struct_field(k, "k").cast(pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "n": np.ones(len(x), dtype=np.int64),
            "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        g = df.groupby("event_type", as_index=False).sum(numeric_only=True)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby("event_type", as_index=False)
           [["n", "sx", "sy", "sxx", "syy", "sxy"]].sum())
    # exact big-int covariance terms in Python int, then ONE float per
    # term in the same shape as the SQL expression
    import math
    r = []
    for _, row in out.iterrows():
        n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
        sxx, syy, sxy = int(row["sxx"]), int(row["syy"]), int(row["sxy"])
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        r.append(float(num) / math.sqrt(float(dx) * float(dy)))
    out["corr"] = r
    for c in ("n", "sx", "sy", "sxx", "syy", "sxy"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values("event_type").reset_index(drop=True)
            [["event_type", "n", "sx", "sy", "sxx", "syy", "sxy", "corr"]])


VALUE_PROP_CORRELATION_SQL = """
WITH m AS (
  SELECT event_type,
         COUNT(*)::BIGINT AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS sx,
         SUM(regexp_extract(props, '[0-9]+')::BIGINT)::BIGINT AS sy,
         SUM(CAST(ROUND(value * 100) AS BIGINT)
             * CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS sxx,
         SUM(regexp_extract(props, '[0-9]+')::BIGINT
             * regexp_extract(props, '[0-9]+')::BIGINT)::BIGINT AS syy,
         SUM(CAST(ROUND(value * 100) AS BIGINT)
             * regexp_extract(props, '[0-9]+')::BIGINT)::BIGINT AS sxy
  FROM events GROUP BY event_type)
SELECT event_type, n, sx, sy, sxx, syy, sxy,
       ((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE)
       / sqrt(((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE)
              * ((n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE)) AS corr
FROM m ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# shipping_priority — TPC-H Q3 shape: dimension-filtered FACT-FACT join
# + global top-k, the third classic join topology (Q1 = grouped scan,
# Q5 = fact-fact equi-join; Q3 adds the top-k tail on the join output)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"
Q3_TOPK = 10


def shipping_priority(sf_dir: str, segment: str = Q3_SEGMENT,
                      date: str = Q3_DATE,
                      topk: int = Q3_TOPK) -> pd.DataFrame:
    """Top-``topk`` unshipped orders of one market segment by revenue
    (TPC-H Q3): orders placed before ``date`` by ``segment``
    customers, revenue from lineitems shipped after ``date``.

    Scale shape: the segment customer set broadcasts (dimension
    side); lineitem pre-reduces per batch to (orderkey, cent-revenue)
    partials with the shipdate filter applied at the batch; the
    FACT-FACT equi-join runs on the same coarse orderkey co-partition
    as local_supplier_revenue (sorted searchsorted probe, no
    hash-table build per row); each partition emits only its LOCAL
    top-k (superset property, like the skyline), and the driver
    finishes on ≤ partitions×k rows. Ties break (revenue DESC,
    orderkey ASC) identically to the oracle."""
    import pyarrow.parquet as pq
    import ray as _ray

    from .util import as_task_fn, shuffle_width

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    seg = pc.equal(cust["c_mktsegment"], segment)
    seg_keys = np.sort(cust.filter(seg)["c_custkey"]
                       .to_numpy(zero_copy_only=False).astype(np.int64))
    seg_ref = _ray.put(seg_keys)
    date64 = np.datetime64(date, "us")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"])
    n_parts = shuffle_width(li)

    def li_prep(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        b = b.filter(pa.array(ship > date64))
        key = b["l_orderkey"].to_numpy().astype(np.int64)
        rev = _cents(b["l_extendedprice"]) \
            * (100 - _cents(b["l_discount"]))
        df = pd.DataFrame({"key": key, "rev_u": rev})
        g = df.groupby("key", as_index=False).sum()
        return pa.table({
            "part": pa.array((g["key"].to_numpy() % n_parts)
                             .astype(np.int32)),
            "key": pa.array(g["key"].to_numpy(dtype=np.int64)),
            "rev_u": pa.array(g["rev_u"].to_numpy(dtype=np.int64)),
            "date": pa.array(np.zeros(len(g), dtype=np.int64)),
            "prio": pa.array([""] * len(g), pa.string()),
            "side": pa.array(np.ones(len(g), dtype=np.int8))})

    class _OrdPrep:
        def __init__(self, seg_ref):
            self.seg = _ray.get(seg_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            od = b["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]")
            cust = b["o_custkey"].to_numpy().astype(np.int64)
            keep = (od < date64) & np.isin(cust, self.seg)
            b = b.filter(pa.array(keep))
            key = b["o_orderkey"].to_numpy().astype(np.int64)
            od = b["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            return pa.table({
                "part": pa.array((key % n_parts).astype(np.int32)),
                "key": pa.array(key),
                "rev_u": pa.array(np.zeros(len(key), dtype=np.int64)),
                "date": pa.array(od),
                "prio": b["o_orderpriority"],
                "side": pa.array(np.zeros(len(key), dtype=np.int8))})

    both = (li.map_batches(li_prep, batch_format="pyarrow")
            .union(orders.map_batches(
                as_task_fn(_OrdPrep, seg_ref=seg_ref),
                batch_format="pyarrow")))

    def q3_join(g: pd.DataFrame, topk=topk) -> pd.DataFrame:
        is_li = g["side"].to_numpy() == 1
        o = g.loc[~is_li]
        okey = o["key"].to_numpy()
        order = np.argsort(okey, kind="stable")
        okey = okey[order]
        li_rows = (g.loc[is_li].groupby("key", as_index=False)
                   [["rev_u"]].sum())
        lkey = li_rows["key"].to_numpy()
        pos = np.searchsorted(okey, lkey)
        pos = np.clip(pos, 0, max(len(okey) - 1, 0))
        found = (okey[pos] == lkey) if len(okey) \
            else np.zeros(len(lkey), dtype=bool)
        kept = li_rows.loc[found]
        if not len(kept):
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "rev_u": pd.Series([], dtype=np.int64),
                                 "date": pd.Series([], dtype=np.int64),
                                 "prio": pd.Series([], dtype=object)})
        opos = pos[found]
        out = pd.DataFrame({
            "key": kept["key"].to_numpy(dtype=np.int64),
            "rev_u": kept["rev_u"].to_numpy(dtype=np.int64),
            "date": o["date"].to_numpy()[order][opos],
            "prio": o["prio"].to_numpy()[order][opos]})
        # local top-k: the global top-k is a subset of the union
        out = out.sort_values(["rev_u", "key"],
                              ascending=[False, True]).head(topk)
        return out

    parts = (both.groupby("part")
             .map_groups(q3_join, batch_format="pandas")
             .to_pandas())
    parts = parts.sort_values(["rev_u", "key"],
                              ascending=[False, True]).head(topk)
    return pd.DataFrame({
        "o_orderkey": parts["key"].to_numpy(dtype=np.int64),
        "revenue": parts["rev_u"].to_numpy(dtype=np.int64) / 10000.0,
        "o_orderdate": parts["date"].to_numpy(dtype=np.int64)
            .astype("datetime64[us]"),
        "o_orderpriority": parts["prio"].to_numpy(dtype=object)
            .astype(str),
    }).reset_index(drop=True)


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey AS o_orderkey,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < DATE '{Q3_DATE}'
  AND l_shipdate  > DATE '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT {Q3_TOPK}
"""


# ---------------------------------------------------------------------------
# exact_price_quantiles — EXACT distributed selection without a sort:
# two streaming histogram passes (the classic distributed k-th element
# algorithm), vs the approximate bottom-k sketch in sketch.py
# ---------------------------------------------------------------------------

def exact_price_quantiles(sf_dir: str,
                          qs: tuple[int, ...] = (25, 50, 75)
                          ) -> pd.DataFrame:
    """EXACT order-statistics of l_extendedprice (cents) at the given
    percentiles, computed with TWO streaming passes and bins-sized
    shuffles — never a distributed sort:

    pass 1: per-batch bincount over the high 16 bits of the cent value
    (≤ 65536 int rows per block); the driver locates each rank's
    coarse bin. pass 2: per-batch bincount over the LOW 16 bits,
    restricted to the (few) located bins; the driver reads the exact
    value off the merged fine histogram. Rank = ceil(q·n/100), the
    quantile_disc convention. Wire cost is O(bins), independent of n —
    at 100 TB both passes ship fixed-size integer vectors."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def coarse(batch: pa.Table) -> pa.Table:
        c = _cents(batch["l_extendedprice"])
        hi = (c >> 16).astype(np.int64)
        cnt = np.bincount(hi)
        nz = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    h1 = (ds.map_batches(coarse, batch_format="pyarrow").to_pandas()
          .groupby("b")["cnt"].sum().sort_index())
    n = int(h1.sum())
    cum = h1.cumsum()
    targets = {}   # bin -> list of (q, rank_within_bin)
    for q in qs:
        rank = -(-q * n // 100)   # ceil, 1-based global rank
        b = int(cum.index[np.searchsorted(cum.to_numpy(), rank)])
        prev = int(cum.loc[:b].iloc[-2]) if (cum.index < b).any() else 0
        targets.setdefault(b, []).append((q, rank - prev))
    import ray as _ray
    bins_ref = _ray.put(np.array(sorted(targets), dtype=np.int64))

    def fine(batch: pa.Table) -> pa.Table:
        bins = _ray.get(bins_ref)
        c = _cents(batch["l_extendedprice"])
        hi = (c >> 16).astype(np.int64)
        keep = np.isin(hi, bins)
        c, hi = c[keep], hi[keep]
        bs, lo = [], []
        cnts = []
        for b in bins:
            low = (c[hi == b] & 0xFFFF).astype(np.int64)
            cnt = np.bincount(low, minlength=1)
            nz = np.flatnonzero(cnt)
            bs.extend([int(b)] * len(nz))
            lo.extend(nz.astype(np.int64))
            cnts.extend(cnt[nz].astype(np.int64))
        return pa.table({"b": pa.array(np.asarray(bs, np.int64)),
                         "lo": pa.array(np.asarray(lo, np.int64)),
                         "cnt": pa.array(np.asarray(cnts, np.int64))})

    h2 = (ds.map_batches(fine, batch_format="pyarrow").to_pandas()
          .groupby(["b", "lo"])["cnt"].sum().sort_index())
    rows = []
    for b, pairs in targets.items():
        sub = h2.loc[b]
        c2 = sub.cumsum()
        for q, r in pairs:
            lo = int(c2.index[np.searchsorted(c2.to_numpy(), r)])
            rows.append((q, (b << 16) | lo))
    out = pd.DataFrame(sorted(rows), columns=["pct", "price_c"])
    return out.astype(np.int64)


def _exact_q_sql(qs: tuple[int, ...] = (25, 50, 75)) -> str:
    sels = " UNION ALL ".join(
        f"SELECT {q}::BIGINT AS pct, "
        f"quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), "
        f"{q / 100.0}) AS price_c FROM lineitem"
        for q in qs)
    return f"SELECT pct, price_c FROM ({sels}) ORDER BY pct"


EXACT_PRICE_QUANTILES_SQL = _exact_q_sql()


# ---------------------------------------------------------------------------
# weighted_join_sample — sampling weighted by JOIN MULTIPLICITY
# (cf. PAPERS.md "Streaming Weighted Sampling over Join Queries",
# EDBT 2023): include an order with probability ∝ its lineitem count,
# without materializing the join — and reproducibly, via the same
# content-addressed hash discipline as every sampler here
# ---------------------------------------------------------------------------

WJS_DENOM = 1000   # inclusion: h(key) % DENOM < weight (multiplicity)


def weighted_join_sample(sf_dir: str,
                         denom: int = WJS_DENOM) -> pd.DataFrame:
    """Orders sampled with probability min(1, w/denom) where w is the
    order's lineitem multiplicity — the weight the orders⋈lineitem
    join would give it. Pass 1 is the 16 B/row count aggregate (never
    the join itself); the inclusion test is pure integer hash
    arithmetic, so the sample is identical under any partitioning and
    bit-reproduced by the SQL oracle. Returns (o_orderkey, w)."""
    from .dedup import _h64u

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def cnt(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(k)
        w = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"k": pa.array(uniq.astype(np.int64)),
                         "w": pa.array(w)})

    from ray.data.aggregate import Sum
    agg = (li.map_batches(cnt, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("w", alias_name="w"))
             .to_pandas())
    k = agg["k"].to_numpy(dtype=np.int64)
    w = agg["w"].to_numpy(dtype=np.int64)
    h = np.fromiter((_h64u(str(int(v))) % denom for v in k),
                    dtype=np.int64, count=len(k))
    keep = h < w
    out = pd.DataFrame({"o_orderkey": k[keep], "w": w[keep]})
    return (out.sort_values("o_orderkey").reset_index(drop=True)
            .astype(np.int64))


def _wjs_sql(denom: int = WJS_DENOM) -> str:
    le = " || ".join(f"substr(md5(k::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    return f"""
WITH w AS (SELECT l_orderkey AS k, COUNT(*)::BIGINT AS w
           FROM lineitem GROUP BY 1)
SELECT k AS o_orderkey, w FROM w
WHERE ('0x' || {le})::UBIGINT % {denom} < w::UBIGINT
ORDER BY o_orderkey
"""


WEIGHTED_JOIN_SAMPLE_SQL = _wjs_sql()


def grouped_exact_quantiles(sf_dir: str,
                            qs: tuple[int, ...] = (50, 90)
                            ) -> pd.DataFrame:
    """Exact per-group order statistics (l_returnflag × percentile)
    by the same two-pass histogram refinement as
    ``exact_price_quantiles`` — pass 1 ships (group, hi16, cnt) rows,
    pass 2 (group, lo16, cnt) for the located bins only; wire cost
    O(groups × bins), independent of n."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])

    def coarse(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        c = _cents(batch["l_extendedprice"])
        hi = (c >> 16).astype(np.int64)
        df = pd.DataFrame({"g": g, "b": hi,
                           "cnt": np.ones(len(c), dtype=np.int64)})
        out = df.groupby(["g", "b"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    h1 = (ds.map_batches(coarse, batch_format="pyarrow").to_pandas()
          .groupby(["g", "b"])["cnt"].sum())
    targets: dict[str, dict[int, list]] = {}
    for grp in h1.index.get_level_values(0).unique():
        sub = h1.loc[grp].sort_index()
        n = int(sub.sum())
        cum = sub.cumsum()
        for q in qs:
            rank = -(-q * n // 100)
            b = int(cum.index[np.searchsorted(cum.to_numpy(), rank)])
            prev = int(cum.loc[:b].iloc[-2]) \
                if (cum.index < b).any() else 0
            targets.setdefault(grp, {}).setdefault(b, []) \
                .append((q, rank - prev))
    import ray as _ray
    tref = _ray.put({g: np.array(sorted(t), dtype=np.int64)
                     for g, t in targets.items()})

    def fine(batch: pa.Table) -> pa.Table:
        tmap = _ray.get(tref)
        g = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        c = _cents(batch["l_extendedprice"])
        hi = (c >> 16).astype(np.int64)
        gs, bs, lo, cnts = [], [], [], []
        for grp, bins in tmap.items():
            sel = (g == grp) & np.isin(hi, bins)
            cc, hh = c[sel], hi[sel]
            for b in bins:
                low = (cc[hh == b] & 0xFFFF).astype(np.int64)
                cnt = np.bincount(low, minlength=1)
                nz = np.flatnonzero(cnt)
                gs.extend([grp] * len(nz))
                bs.extend([int(b)] * len(nz))
                lo.extend(nz.astype(np.int64))
                cnts.extend(cnt[nz].astype(np.int64))
        return pa.table({"g": pa.array(gs, pa.string()),
                         "b": pa.array(np.asarray(bs, np.int64)),
                         "lo": pa.array(np.asarray(lo, np.int64)),
                         "cnt": pa.array(np.asarray(cnts, np.int64))})

    h2 = (ds.map_batches(fine, batch_format="pyarrow").to_pandas()
          .groupby(["g", "b", "lo"])["cnt"].sum())
    rows = []
    for grp, per_bin in targets.items():
        for b, pairs in per_bin.items():
            sub = h2.loc[(grp, b)].sort_index()
            c2 = sub.cumsum()
            for q, r in pairs:
                lov = int(c2.index[np.searchsorted(c2.to_numpy(), r)])
                rows.append((grp, q, (b << 16) | lov))
    out = pd.DataFrame(sorted(rows),
                       columns=["l_returnflag", "pct", "price_c"])
    out["pct"] = out["pct"].astype(np.int64)
    out["price_c"] = out["price_c"].astype(np.int64)
    return out.reset_index(drop=True)


def _grouped_exact_q_sql(qs: tuple[int, ...] = (50, 90)) -> str:
    sels = " UNION ALL ".join(
        f"SELECT l_returnflag, {q}::BIGINT AS pct, "
        f"quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), "
        f"{q / 100.0}) AS price_c FROM lineitem GROUP BY l_returnflag"
        for q in qs)
    return (f"SELECT l_returnflag, pct, price_c FROM ({sels}) "
            f"ORDER BY l_returnflag, pct")


GROUPED_EXACT_QUANTILES_SQL = _grouped_exact_q_sql()


# ---------------------------------------------------------------------------
# decorrelated scalar-subquery filter: orders above the customer's avg
# ---------------------------------------------------------------------------

def orders_above_customer_avg(sf_dir: str) -> pd.DataFrame:
    """Per customer: how many of their orders are priced strictly
    above their own average order price, and those orders' summed
    cents — the correlated-scalar-subquery pattern (WHERE price >
    (SELECT AVG(...) ... same customer)) DECORRELATED into one
    entity-key shuffle. Exactness: the float average never exists —
    the comparison is cross-multiplied integer cents
    (price_c * n > sum_c), so distributed == DuckDB bit-for-bit.

    Scale shape: one coarse hash fold of the customer key (fact-sized
    both 'sides' — the per-customer aggregate and the order rows —
    but they are the SAME rows, so the fold carries each order once);
    inside a partition everything is two pandas transforms and a
    masked groupby."""
    from .util import shuffle_width

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    n_parts = shuffle_width(orders)

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "part": pa.array((ck % n_parts).astype(np.int32)),
            "custkey": pa.array(ck),
            "pc": pa.array(_cents(b["o_totalprice"]))})

    def above(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("custkey")["pc"]
        n = grp.transform("size").to_numpy().astype(np.int64)
        sc = grp.transform("sum").to_numpy().astype(np.int64)
        pc = g["pc"].to_numpy()
        hit = g.loc[pc * n > sc]
        out = hit.groupby("custkey", as_index=False).agg(
            n_above=("pc", "size"), above_cents=("pc", "sum"))
        out["n_above"] = out["n_above"].astype(np.int64)
        out["above_cents"] = out["above_cents"].astype(np.int64)
        return out[["custkey", "n_above", "above_cents"]]

    out = (orders.map_batches(prep, batch_format="pyarrow")
                 .groupby("part")
                 .map_groups(above, batch_format="pandas")
                 .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("custkey").reset_index(drop=True)


ORDERS_ABOVE_AVG_SQL = """
WITH o AS (SELECT o_custkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
           FROM orders),
s AS (SELECT o_custkey, COUNT(*) AS n, SUM(pc) AS sc
      FROM o GROUP BY o_custkey)
SELECT o.o_custkey AS custkey,
       COUNT(*)::BIGINT AS n_above,
       SUM(o.pc)::BIGINT AS above_cents
FROM o JOIN s USING (o_custkey)
WHERE o.pc * s.n > s.sc
GROUP BY o.o_custkey ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# TPC-H classics adapted to the synthetic schema: Q6 / Q12 / Q4 shapes
# ---------------------------------------------------------------------------

_US = lambda s: int(np.datetime64(s, "us").astype(np.int64))  # noqa: E731


def q6_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 (forecast-revenue-change): SUM(extendedprice *
    discount) under a shipdate-year + discount-band + quantity
    predicate — the canonical scan-side aggregate. Pure per-batch
    integer partials: price and discount both in cents, so the
    product is an exact int64 and the single division by 10^4 happens
    once at the end on both sides. The discount band compares cents
    (IN (5,6,7)), never floats."""
    lo, hi = _US("1996-01-01"), _US("1997-01-01")
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        sd = (b["l_shipdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        dc = _cents(b["l_discount"])
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        pc = _cents(b["l_extendedprice"])
        m = ((sd >= lo) & (sd < hi) & np.isin(dc, (5, 6, 7))
             & (qty < 24))
        return pa.table({"rev4": pa.array([int((pc[m] * dc[m]).sum())],
                                          pa.int64())})

    from ray.data.aggregate import Sum
    tot = (ds.map_batches(partial, batch_format="pyarrow")
             .aggregate(Sum("rev4", alias_name="rev4")))
    return pd.DataFrame({"revenue": [tot["rev4"] / 10000.0]})


Q6_REVENUE_SQL = """
SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) IN (5, 6, 7)
  AND l_quantity < 24
"""

#: Q12/Q4 lateness cutoff: a line shipped more than this many days
#: after its order date counts as late (the synthetic schema has no
#: commit/receipt dates; order->ship lag is the equivalent signal)
_LATE_DAYS = 30
_LATE_US = _LATE_DAYS * 86_400_000_000


def q12_late_shipments(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (shipmode priority matrix) on the synthetic
    schema: per l_linestatus, how many LATE lines (shipped >30 days
    after the order date) belong to high-priority (1-URGENT/2-HIGH)
    vs lower-priority orders. Fact-fact join on the order key over
    ONE coarse hash fold; per partition a vectorized merge + masked
    bincount — integer counts, exact under any partitioning."""
    from .util import shuffle_width

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    lines = _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_shipdate", "l_linestatus"])
    n_parts = shuffle_width(orders)

    def o_prep(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        pri = b["o_orderpriority"].to_pylist()
        high = np.asarray([p in ("1-URGENT", "2-HIGH") for p in pri],
                          dtype=np.int8)
        return pa.table({
            "part": pa.array((ok % n_parts).astype(np.int32)),
            "key": pa.array(ok), "ts": pa.array(od),
            "high": pa.array(high),
            "status": pa.array([""] * len(ok), pa.string()),
            "side": pa.array(np.zeros(len(ok), dtype=np.int8))})

    def l_prep(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = (b["l_shipdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((ok % n_parts).astype(np.int32)),
            "key": pa.array(ok), "ts": pa.array(sd),
            "high": pa.array(np.zeros(len(ok), dtype=np.int8)),
            "status": b["l_linestatus"].cast(pa.string()),
            "side": pa.array(np.ones(len(ok), dtype=np.int8))})

    both = (orders.map_batches(o_prep, batch_format="pyarrow")
                  .union(lines.map_batches(l_prep,
                                           batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        if not len(li) or not len(o):
            return pd.DataFrame({"status": pd.Series([], dtype=str),
                                 "high": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        om = o.set_index("key")
        odate = om["ts"].reindex(li["key"]).to_numpy()
        ohigh = om["high"].reindex(li["key"]).to_numpy()
        late = li["ts"].to_numpy() > odate + _LATE_US
        hit = li.loc[late].copy()
        hit["high"] = ohigh[late].astype(np.int64)
        out = (hit.groupby(["status", "high"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out[["status", "high", "n"]]

    from ray.data.aggregate import Sum
    agg = (both.groupby("part")
               .map_groups(fold, batch_format="pandas")
               .groupby(["status", "high"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    piv = agg.pivot_table(index="status", columns="high", values="n",
                          fill_value=0).reset_index()
    piv.columns.name = None
    out = pd.DataFrame({
        "l_linestatus": piv["status"],
        "high_line_count": piv.get(1, pd.Series(0, index=piv.index)),
        "low_line_count": piv.get(0, pd.Series(0, index=piv.index))})
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("l_linestatus").reset_index(drop=True)


Q12_LATE_SQL = f"""
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q4_priority_check(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (order-priority checking): per order priority,
    the count of orders with AT LEAST ONE late line (the EXISTS
    semi-join). Same one-fold co-partitioning as Q12; per partition
    the late order keys collapse to a distinct set before counting."""
    from .util import shuffle_width

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    lines = _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_shipdate"])
    n_parts = shuffle_width(orders)

    def o_prep(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((ok % n_parts).astype(np.int32)),
            "key": pa.array(ok), "ts": pa.array(od),
            "pri": b["o_orderpriority"].cast(pa.string()),
            "side": pa.array(np.zeros(len(ok), dtype=np.int8))})

    def l_prep(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = (b["l_shipdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((ok % n_parts).astype(np.int32)),
            "key": pa.array(ok), "ts": pa.array(sd),
            "pri": pa.array([""] * len(ok), pa.string()),
            "side": pa.array(np.ones(len(ok), dtype=np.int8))})

    both = (orders.map_batches(o_prep, batch_format="pyarrow")
                  .union(lines.map_batches(l_prep,
                                           batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        if not len(o):
            return pd.DataFrame({"pri": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        om = o.set_index("key")
        if len(li):
            odate = om["ts"].reindex(li["key"]).to_numpy()
            late_keys = np.unique(
                li.loc[li["ts"].to_numpy() > odate + _LATE_US,
                       "key"].to_numpy())
        else:
            late_keys = np.zeros(0, dtype=np.int64)
        hit = o[np.isin(o["key"].to_numpy(), late_keys)]
        out = (hit.groupby("pri", as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out[["pri", "n"]]

    from ray.data.aggregate import Sum
    out = (both.groupby("part")
               .map_groups(fold, batch_format="pandas")
               .groupby("pri")
               .aggregate(Sum("n", alias_name="order_count"))
               .to_pandas())
    out = out.rename(columns={"pri": "o_orderpriority"})
    out["order_count"] = out["order_count"].astype(np.int64)
    return (out.sort_values("o_orderpriority").reset_index(drop=True))


Q4_PRIORITY_SQL = f"""
SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


#: Q19 disjunctive bands: (brand, size range, quantity range)
_Q19_BANDS = (("Brand#12", 1, 15, 1, 11),
              ("Brand#23", 16, 30, 10, 20),
              ("Brand#34", 31, 50, 20, 30))


def q19_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): lineitem ⋈
    part under an OR of (brand, size-band, quantity-band)
    conjunctions, summing discounted revenue. Exact integers: revenue
    scaled by 10^4 = price_cents * (100 − discount_cents); a single
    division at the end on both sides. One coarse part-key fold (both
    sides fact-sized at warehouse scale — no broadcast); the
    disjunction evaluates vectorized inside the partition."""
    from .util import shuffle_width

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"])
    lines = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_quantity",
                           "l_extendedprice", "l_discount"])
    n_parts = shuffle_width(part)

    def p_prep(b: pa.Table) -> pa.Table:
        pk = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "part": pa.array((pk % n_parts).astype(np.int32)),
            "key": pa.array(pk),
            "brand": b["p_brand"].cast(pa.string()),
            "size": b["p_size"].cast(pa.int64()),
            "qty": pa.array(np.zeros(len(pk), dtype=np.int64)),
            "rev4": pa.array(np.zeros(len(pk), dtype=np.int64)),
            "side": pa.array(np.zeros(len(pk), dtype=np.int8))})

    def l_prep(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc = _cents(b["l_extendedprice"])
        dc = _cents(b["l_discount"])
        qty = (b["l_quantity"].to_numpy(zero_copy_only=False)
               .astype(np.int64))
        return pa.table({
            "part": pa.array((pk % n_parts).astype(np.int32)),
            "key": pa.array(pk),
            "brand": pa.array([""] * len(pk), pa.string()),
            "size": pa.array(np.zeros(len(pk), dtype=np.int64)),
            "qty": pa.array(qty),
            "rev4": pa.array(pc * (100 - dc)),
            "side": pa.array(np.ones(len(pk), dtype=np.int8))})

    both = (part.map_batches(p_prep, batch_format="pyarrow")
                .union(lines.map_batches(l_prep,
                                         batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 0].set_index("key")
        li = g[g["side"] == 1]
        if not len(li) or not len(p):
            return pd.DataFrame({"rev4": pd.Series([], dtype=np.int64)})
        brand = p["brand"].reindex(li["key"]).to_numpy()
        size = p["size"].reindex(li["key"]).to_numpy()
        qty = li["qty"].to_numpy()
        hit = np.zeros(len(li), dtype=bool)
        for b_, s0, s1, q0, q1 in _Q19_BANDS:
            hit |= ((brand == b_) & (size >= s0) & (size <= s1)
                    & (qty >= q0) & (qty <= q1))
        return pd.DataFrame(
            {"rev4": [np.int64(li["rev4"].to_numpy()[hit].sum())]})

    from ray.data.aggregate import Sum
    tot = (both.groupby("part")
               .map_groups(fold, batch_format="pandas")
               .aggregate(Sum("rev4", alias_name="rev4")))
    return pd.DataFrame({"revenue": [tot["rev4"] / 10000.0]})


Q19_REVENUE_SQL = """
SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
       / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 31 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""


def cheapest_supplier_per_part(sf_dir: str) -> pd.DataFrame:
    """Per part: the supplier offering its cheapest lineitem price
    (TPC-H Q2's min-cost-supplier shape) — ARGMIN expressed as plain
    integer MIN over packed keys price_cents * 2^20 + suppkey, so the
    per-batch combiner, the tiny groupby and the tie-break (lowest
    suppkey at equal price) are all one associative min — no
    row_number window, no sort. Budget: suppkey < 2^20 at every TPC-H
    scale factor's supplier count; price_cents < 2^43 headroom."""
    from ray.data.aggregate import Min

    lines = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def pack(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc = _cents(b["l_extendedprice"])
        key = pc * np.int64(1 << 20) + sk
        # per-batch combiner: one row per part
        df = pd.DataFrame({"partkey": pk, "key": key})
        g = df.groupby("partkey", as_index=False)["key"].min()
        return pa.table({"partkey": pa.array(g["partkey"].to_numpy()),
                         "key": pa.array(g["key"].to_numpy())})

    out = (lines.map_batches(pack, batch_format="pyarrow")
                .groupby("partkey")
                .aggregate(Min("key", alias_name="key"))
                .to_pandas())
    key = out["key"].to_numpy(np.int64)
    out["suppkey"] = key & ((1 << 20) - 1)
    out["price"] = (key >> 20) / 100.0
    out = out.drop(columns=["key"])
    for c in ("partkey", "suppkey"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("partkey").reset_index(drop=True)


CHEAPEST_SUPPLIER_SQL = """
WITH l AS (
  SELECT l_partkey AS partkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 1048576
           + l_suppkey AS key
  FROM lineitem)
SELECT partkey,
       (MIN(key) % 1048576)::BIGINT AS suppkey,
       (MIN(key) // 1048576) / 100.0 AS price
FROM l GROUP BY partkey ORDER BY partkey
"""


def events_value_mad(sf_dir: str) -> pd.DataFrame:
    """Per event type: the exact integer median and median absolute
    deviation of value cents — the robust-dispersion statistic
    (anomaly thresholds are usually med ± k·MAD). Quantile semantics
    are quantile_disc's rank = ceil(q·n) (the house ceil form; the
    floor form silently diverges on near-unique keys).

    Scale shape: values are DOMAIN-bounded, so the per-(type, cents)
    count table is tiny after one grouped sum (the zonal-value-stats
    discipline); median and MAD both derive from that table on the
    driver — deviations merge two-sided around the median with
    counts, no second scan of the data."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def per_batch(b: pa.Table) -> pa.Table:
        g = np.asarray(b["event_type"].to_pylist(), dtype=object)
        c = _cents(b["value"])
        df = pd.DataFrame({"g": g, "c": c,
                           "n": np.ones(len(c), dtype=np.int64)})
        out = df.groupby(["g", "c"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    hist = (ds.map_batches(per_batch, batch_format="pyarrow")
              .groupby(["g", "c"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    rows = []
    for g, sub in hist.groupby("g"):
        sub = sub.sort_values("c")
        c = sub["c"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        tot = int(n.sum())
        rank = -(-50 * tot // 100)  # ceil(n/2)
        cum = np.cumsum(n)
        med = int(c[np.searchsorted(cum, rank)])
        dev = np.abs(c - med)
        order = np.argsort(dev, kind="stable")
        dsort, nsort = dev[order], n[order]
        # merge equal deviations (x = med±d collide)
        uniq, inv = np.unique(dsort, return_inverse=True)
        dcnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(dcnt, inv, nsort)
        dcum = np.cumsum(dcnt)
        mad = int(uniq[np.searchsorted(dcum, rank)])
        rows.append((g, tot, med, mad))
    out = pd.DataFrame(rows, columns=["event_type", "n",
                                      "median_cents", "mad_cents"])
    for col in ("n", "median_cents", "mad_cents"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_MAD_SQL = """
WITH v AS (
  SELECT event_type AS g,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events),
m AS (SELECT g, quantile_disc(c, 0.5) AS med, COUNT(*)::BIGINT AS n
      FROM v GROUP BY g),
d AS (SELECT v.g, ABS(v.c - m.med) AS dev, m.med, m.n
      FROM v JOIN m USING (g))
SELECT g AS event_type,
       MIN(n)::BIGINT AS n,
       MIN(med)::BIGINT AS median_cents,
       quantile_disc(dev, 0.5)::BIGINT AS mad_cents
FROM d GROUP BY g ORDER BY event_type
"""


def nation_revenue_hhi(sf_dir: str) -> pd.DataFrame:
    """Per nation: the exact integer parts of the Herfindahl-
    Hirschman concentration index of customer revenue — HHI =
    sumsq_cents / sum_cents² is left to the caller, so both sides
    stay bit-equal integers (budget: Σcents² < 2^63 holds through
    ~sf10 at TPC-H prices; past that the partials move to
    per-million units). One customer-key fold builds per-customer
    revenue, a second tiny nation groupby folds (n, Σ, Σ²)."""
    from .util import shuffle_width
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n_parts = shuffle_width(orders)

    def o_prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc = _cents(b["o_totalprice"])
        df = pd.DataFrame({"key": ck, "rev": pc}).groupby(
            "key", as_index=False)["rev"].sum()
        k = df["key"].to_numpy(np.int64)
        return pa.table({
            "part": pa.array((k % n_parts).astype(np.int32)),
            "key": pa.array(k),
            "rev": pa.array(df["rev"].to_numpy(np.int64)),
            "nk": pa.array(np.full(len(k), -1, dtype=np.int64))})

    def c_prep(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "part": pa.array((ck % n_parts).astype(np.int32)),
            "key": pa.array(ck),
            "rev": pa.array(np.zeros(len(ck), dtype=np.int64)),
            "nk": pa.array(b["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64))})

    both = (orders.map_batches(o_prep, batch_format="pyarrow")
                  .union(cust.map_batches(c_prep,
                                          batch_format="pyarrow")))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["nk"] >= 0].set_index("key")["nk"]
        o = g[g["nk"] < 0].groupby("key", as_index=False)["rev"].sum()
        if not len(o):
            return pd.DataFrame({
                "nationkey": pd.Series([], dtype=np.int64),
                "n_cust": pd.Series([], dtype=np.int64),
                "sum_cents": pd.Series([], dtype=np.int64),
                "sumsq_cents": pd.Series([], dtype=np.int64)})
        nk = c.reindex(o["key"]).to_numpy()
        rev = o["rev"].to_numpy(np.int64)
        df = pd.DataFrame({"nationkey": nk.astype(np.int64),
                           "one": np.ones(len(rev), dtype=np.int64),
                           "sum_cents": rev,
                           "sumsq_cents": rev * rev})
        out = df.groupby("nationkey", as_index=False).agg(
            n_cust=("one", "sum"), sum_cents=("sum_cents", "sum"),
            sumsq_cents=("sumsq_cents", "sum"))
        return out

    out = (both.groupby("part")
               .map_groups(fold, batch_format="pandas")
               .groupby("nationkey")
               .aggregate(Sum("n_cust", alias_name="n_cust"),
                          Sum("sum_cents", alias_name="sum_cents"),
                          Sum("sumsq_cents", alias_name="sumsq_cents"))
               .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("nationkey").reset_index(drop=True)


NATION_HHI_SQL = """
WITH cr AS (
  SELECT c_nationkey::BIGINT AS nationkey, o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2)
SELECT nationkey,
       COUNT(*)::BIGINT AS n_cust,
       SUM(rev)::BIGINT AS sum_cents,
       SUM(rev * rev)::BIGINT AS sumsq_cents
FROM cr GROUP BY nationkey ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# customer order-count distribution — the TPC-H Q13 shape: count of
# counts INCLUDING the never-ordered customers (needs an outer join)
# ---------------------------------------------------------------------------

def customer_order_distribution(sf_dir: str,
                                num_partitions: int = 8) -> pd.DataFrame:
    """(order_cnt, n_customers) histogram of orders per customer,
    including order_cnt = 0 rows — the Q13 decision-support shape.
    The orders side is PRE-REDUCED per custkey before a LEFT OUTER
    ``Dataset.join`` (hash co-partitioned, customer-sized output, so
    orders from custkeys outside the customer table — FK violations —
    drop exactly as SQL's left join drops them); the joined rows fold
    to count-of-counts partials per batch and finish in a tiny
    grouped sum."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def o_partial(b: pa.Table) -> pa.Table:
        ck = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    per_cust = (orders.map_batches(o_partial, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="n")))
    joined = cust.join(per_cust, "left_outer", num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",))

    def hist_partial(b: pa.Table) -> pa.Table:
        n = np.asarray(pc.fill_null(b["n"], 0).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        u, cnt = np.unique(n, return_counts=True)
        return pa.table({"order_cnt": pa.array(u),
                         "n_customers": pa.array(cnt.astype(np.int64))})

    out = (joined.map_batches(hist_partial, batch_format="pyarrow")
           .groupby("order_cnt")
           .aggregate(Sum("n_customers", alias_name="n_customers"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("order_cnt").reset_index(drop=True)


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT order_cnt, COUNT(*)::BIGINT AS n_customers
FROM (
  SELECT c.c_custkey, COUNT(o.o_custkey)::BIGINT AS order_cnt
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1) t
GROUP BY order_cnt ORDER BY order_cnt
"""


# ---------------------------------------------------------------------------
# supplier variety per part class — the TPC-H Q16 shape (COUNT
# DISTINCT suppliers after a dimension join), with lineitem as the
# part-supplier bridge
# ---------------------------------------------------------------------------

def supplier_variety_by_part_class(sf_dir: str) -> pd.DataFrame:
    """(p_brand, p_size, supplier_cnt, n_parts) — distinct suppliers
    and distinct parts seen per (brand, size) class across the
    lineitem bridge. Distinct-pair reduction happens PER BATCH first
    (pack partkey·2^20 + suppkey into one int64, np.unique — the
    fuzzy_join discipline), so the shuffle carries pair-distinct
    rows, not lineitems; the part dimension broadcasts once."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    bc = ray.put((part["p_partkey"].to_numpy(dtype=np.int64),
                  part["p_brand"].to_numpy(dtype=object),
                  part["p_size"].to_numpy(dtype=np.int64)))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["l_partkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        sk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        packed = np.unique(pk * (np.int64(1) << 20) + sk)
        return pa.table({"pair": pa.array(packed)})

    pairs = (li.map_batches(pair_partial, batch_format="pyarrow")
             .groupby("pair").count())

    # distinct-count per class WITHOUT pulling the partsupp-sized
    # pair table to the driver: tag each distinct pair with its
    # (brand, size) class (broadcast dimension), make one packed
    # class·entity key, distinct it globally, then per-batch
    # class-count partials into a tiny grouped sum
    brand_ids = {b: i for i, b in enumerate(
        sorted(set(part["p_brand"])))}
    bc_ids = ray.put(np.array(
        [brand_ids[b] for b in part["p_brand"]], dtype=np.int64))

    def tag(by_part: bool):
        def fn(b: pa.Table) -> pa.Table:
            keys, _brands, sizes = ray.get(bc)
            ids = ray.get(bc_ids)
            packed = b["pair"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            pk = packed >> 20
            sk = packed & ((np.int64(1) << 20) - 1)
            loc = np.searchsorted(keys, pk)
            ok = ((loc < len(keys))
                  & (keys[np.minimum(loc, len(keys) - 1)] == pk))
            cls = ids[loc[ok]] * 64 + sizes[loc[ok]]
            ent = pk[ok] if by_part else sk[ok]
            key = np.unique(cls * (np.int64(1) << 32) + ent)
            return pa.table({"key": pa.array(key)})
        return fn

    from ray.data.aggregate import Sum

    def class_counts(ds) -> pd.DataFrame:
        def fold(b: pa.Table) -> pa.Table:
            k = b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            u, cnt = np.unique(k >> 32, return_counts=True)
            return pa.table({"cls": pa.array(u),
                             "n": pa.array(cnt.astype(np.int64))})
        return (ds.map_batches(fold, batch_format="pyarrow")
                .groupby("cls").aggregate(Sum("n", alias_name="n"))
                .to_pandas())

    supp = class_counts(pairs.map_batches(tag(False),
                                          batch_format="pyarrow")
                        .groupby("key").count())
    prt = class_counts(pairs.map_batches(tag(True),
                                         batch_format="pyarrow")
                       .groupby("key").count())
    rev = {i: b for b, i in brand_ids.items()}
    m = supp.merge(prt, on="cls", suffixes=("_s", "_p"))
    out = pd.DataFrame({
        "p_brand": [rev[int(c) // 64] for c in m["cls"]],
        "p_size": (m["cls"] % 64).astype(np.int64),
        "supplier_cnt": m["n_s"].astype(np.int64),
        "n_parts": m["n_p"].astype(np.int64)})
    return (out.sort_values(["p_brand", "p_size"])
            .reset_index(drop=True))


SUPPLIER_VARIETY_SQL = """
SELECT p_brand, p_size::BIGINT AS p_size,
       COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt,
       COUNT(DISTINCT p_partkey)::BIGINT AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_size ORDER BY p_brand, p_size
"""

"""Temporal operators over the ``events`` stream table: sessionize,
as-of + trailing-window range joins, rolling windows, funnel analysis,
event transitions, debounce (burst filter), cohort retention, CUBE
grouping sets, hourly OHLC resampling, JSON props extraction, daily
pivot, stream union — the windowed/ordered operators Ray Data lacks
natively, built from groupby().map_groups over key-partitioned,
time-sorted groups (or pure per-batch partials where no ordering is
needed).

Partitioning assumption (documented per SURVEY.md custom-operator
rule): ordered operators shuffle ONCE on a coarse fold of the entity
key (user_id / customer key), so each partition holds its entities'
full ordered history; inside a partition everything is vectorized
(lexsort + boundary masks — no per-entity Python loops, no quadratic
work). Aggregation-only operators skip the entity shuffle entirely:
per-batch partial rows into a tiny grouped combine.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SESSION_GAP_MIN = 30


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def _sessionize_user(ts: np.ndarray) -> tuple[int, int, int]:
    """One user's sorted int64-us timestamps -> (events, sessions,
    max session events). A new session starts when the gap to the
    previous event exceeds SESSION_GAP_MIN minutes."""
    gaps = np.diff(ts)
    new_session = gaps > SESSION_GAP_MIN * 60 * 1_000_000
    bounds = np.flatnonzero(new_session) + 1
    sizes = np.diff(np.concatenate([[0], bounds, [len(ts)]]))
    return len(ts), 1 + int(new_session.sum()), int(sizes.max())


def _sessionize_part(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse hash partition of users (never one Ray group per
    user — the tiny-groups anti-pattern): pandas groupby inside."""
    rows = []
    for uid, gu in g.groupby("user_id", sort=False):
        ts = np.sort(gu["ts_us"].to_numpy())
        n, s, mx = _sessionize_user(ts)
        rows.append((int(uid), n, s, mx))
    return pd.DataFrame(rows, columns=["user_id", "event_cnt",
                                       "session_cnt", "max_session_events"])


def sessionize(sf_dir: str) -> pd.DataFrame:
    """Per-user gap-based session stats (30-min inactivity gap),
    shuffled once on a coarse fold of the user key (fold width scales
    with the input so partitions stay bounded at 100 TB)."""
    from .util import shuffle_width
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "ts_us": pa.array(ts)})

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(_sessionize_part, batch_format="pandas")
             .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n FROM sessions
  GROUP BY user_id, session_id)
SELECT user_id,
       CAST(SUM(n) AS BIGINT) AS event_cnt,
       COUNT(*) AS session_cnt,
       CAST(MAX(n) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# as-of join: each event matched to the user's latest order at/before ts
# ---------------------------------------------------------------------------

#: coarse key-fold width for the co-partitioned merge: per-user groups
#: are tiny (tens of events), so map_groups runs over ~N_ASOF_PARTS
#: hash partitions and does a vectorized pandas groupby inside — never
#: one Ray group per user (the tiny-groups anti-pattern).
N_ASOF_PARTS = 64


def _asof_merge_part(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse partition of the unioned (events ∪ orders) stream:
    per user, sort the order side by (ts, orderkey) and match each
    event to the last order at/before it (searchsorted right-1 — ties
    on date resolve to the highest orderkey, deterministic)."""
    out = []
    for uid, gu in g.groupby("user_id", sort=False):
        ev = gu[gu["side"] == 0]
        if not len(ev):
            continue
        od = gu[gu["side"] == 1]
        okey = np.full(len(ev), -1, dtype=np.int64)
        if len(od):
            od = od.sort_values(["ts_us", "okey"], kind="stable")
            ots = od["ts_us"].to_numpy()
            oks = od["okey"].to_numpy()
            pos = np.searchsorted(ots, ev["ts_us"].to_numpy(),
                                  side="right") - 1
            hit = pos >= 0
            okey[hit] = oks[pos[hit]]
        out.append(pd.DataFrame({
            "event_id": ev["event_id"].to_numpy(),
            "user_id": ev["user_id"].to_numpy(),
            "asof_orderkey": okey}))
    if not out:
        return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                             "user_id": pd.Series([], dtype=np.int64),
                             "asof_orderkey": pd.Series([], dtype=np.int64)})
    return pd.concat(out, ignore_index=True)


def asof_join_events_orders_ds(sf_dir: str) -> ray.data.Dataset:
    """For every event: the user's most recent order with
    o_orderdate <= ts (ties on date -> highest orderkey, deterministic);
    -1 when no prior order exists.

    Co-partitioned sort-merge: BOTH sides shuffle once on the user
    key (folded into N_ASOF_PARTS coarse hash partitions), the merge
    kernel runs vectorized inside each partition. Neither side is ever
    broadcast or driver-materialized — the right layout when orders is
    a fact table too (the reference-scale assumption)."""
    from .util import shuffle_width
    ev_src = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    od_src = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_orderdate"])
    # identical fold width on BOTH sides = the co-partitioning contract
    n_parts = max(shuffle_width(ev_src, floor=N_ASOF_PARTS),
                  shuffle_width(od_src, floor=N_ASOF_PARTS))

    def ev_prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "side": pa.array(np.zeros(len(uid), dtype=np.int8)),
            "ts_us": pa.array(ts),
            "event_id": pa.array(np.asarray(
                b["event_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)),
            "okey": pa.array(np.full(len(uid), -1, dtype=np.int64)),
        })

    def od_prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False))
        ts = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "side": pa.array(np.ones(len(uid), dtype=np.int8)),
            "ts_us": pa.array(ts),
            "event_id": pa.array(np.full(len(uid), -1, dtype=np.int64)),
            "okey": pa.array(np.asarray(
                b["o_orderkey"].to_numpy(zero_copy_only=False),
                dtype=np.int64)),
        })

    ev = ev_src.map_batches(ev_prep, batch_format="pyarrow")
    od = od_src.map_batches(od_prep, batch_format="pyarrow")
    return (ev.union(od)
              .groupby("part")
              .map_groups(_asof_merge_part, batch_format="pandas"))


def asof_join_events_orders(sf_dir: str) -> pd.DataFrame:
    """Driver-frame gate adapter over ``asof_join_events_orders_ds``
    (per-event output — sink the lazy form at scale)."""
    out = asof_join_events_orders_ds(sf_dir).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# range join: each event joined to the user's orders inside a trailing
# time window (equi key + range predicate — the windowed-join shape
# Ray Data lacks natively)
# ---------------------------------------------------------------------------

RANGE_JOIN_WINDOW_DAYS = 7


def _range_merge_part(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse partition of the unioned (events ∪ orders) stream:
    per user, prefix sums over the time-sorted order side turn the
    range aggregate into two searchsorted lookups per event — O(n log
    n) per user, never the O(n·m) pairwise expansion."""
    win_us = RANGE_JOIN_WINDOW_DAYS * 86_400 * 1_000_000
    out = []
    for uid, gu in g.groupby("user_id", sort=False):
        ev = gu[gu["side"] == 0]
        if not len(ev):
            continue
        od = gu[gu["side"] == 1]
        ets = ev["ts_us"].to_numpy()
        cnt = np.zeros(len(ev), dtype=np.int64)
        cents = np.zeros(len(ev), dtype=np.int64)
        if len(od):
            od = od.sort_values("ts_us", kind="stable")
            ots = od["ts_us"].to_numpy()
            cum = np.concatenate([[0], np.cumsum(od["cents"].to_numpy())])
            # BETWEEN ts - window AND ts, both ends inclusive:
            # side="left" at the low bound keeps ots == ts - window,
            # side="right" at ts keeps ots == ts.
            lo = np.searchsorted(ots, ets - win_us, side="left")
            hi = np.searchsorted(ots, ets, side="right")
            cnt = (hi - lo).astype(np.int64)
            cents = cum[hi] - cum[lo]
        out.append(pd.DataFrame({
            "event_id": ev["event_id"].to_numpy(),
            "user_id": ev["user_id"].to_numpy(),
            "win_orders": cnt,
            "win_cents": cents}))
    if not out:
        return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                             "user_id": pd.Series([], dtype=np.int64),
                             "win_orders": pd.Series([], dtype=np.int64),
                             "win_cents": pd.Series([], dtype=np.int64)})
    return pd.concat(out, ignore_index=True)


def range_join_events_orders_ds(sf_dir: str) -> ray.data.Dataset:
    """For every event: count + total price (integer cents, the repo's
    money contract) of the user's orders with o_orderdate in
    [ts - 7 days, ts], both ends inclusive.

    Same co-partitioned layout as the as-of join: BOTH sides shuffle
    once on a coarse fold of the user key, the range aggregation runs
    vectorized per partition (prefix sums + two binary searches per
    event). The range predicate never expands into pairwise rows, so
    a hot user with many orders costs O((n+m) log m), not O(n·m)."""
    from .relational import _cents
    from .util import shuffle_width
    ev_src = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    od_src = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice", "o_orderdate"])
    n_parts = max(shuffle_width(ev_src, floor=N_ASOF_PARTS),
                  shuffle_width(od_src, floor=N_ASOF_PARTS))

    def ev_prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "side": pa.array(np.zeros(len(uid), dtype=np.int8)),
            "ts_us": pa.array(ts),
            "event_id": pa.array(np.asarray(
                b["event_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)),
            "cents": pa.array(np.zeros(len(uid), dtype=np.int64)),
        })

    def od_prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False))
        ts = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "side": pa.array(np.ones(len(uid), dtype=np.int8)),
            "ts_us": pa.array(ts),
            "event_id": pa.array(np.full(len(uid), -1, dtype=np.int64)),
            "cents": pa.array(_cents(b["o_totalprice"])),
        })

    ev = ev_src.map_batches(ev_prep, batch_format="pyarrow")
    od = od_src.map_batches(od_prep, batch_format="pyarrow")
    return (ev.union(od)
              .groupby("part")
              .map_groups(_range_merge_part, batch_format="pandas"))


def range_join_events_orders(sf_dir: str) -> pd.DataFrame:
    """Driver-frame gate adapter over ``range_join_events_orders_ds``
    (the per-event output is events-table-sized — sink the lazy form
    at scale)."""
    out = range_join_events_orders_ds(sf_dir).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


RANGE_JOIN_SQL = f"""
SELECT e.event_id, e.user_id,
       COUNT(o.o_orderkey)::BIGINT AS win_orders,
       COALESCE(SUM(ROUND(o.o_totalprice * 100)::BIGINT), 0)::BIGINT
         AS win_cents
FROM events e LEFT JOIN orders o
  ON o.o_custkey = e.user_id
 AND o.o_orderdate BETWEEN e.ts - INTERVAL {RANGE_JOIN_WINDOW_DAYS} DAY
                       AND e.ts
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


ASOF_JOIN_SQL = """
WITH matched AS (
  SELECT e.event_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC,
                                     o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT e.event_id, e.user_id,
       COALESCE(m.o_orderkey, -1) AS asof_orderkey
FROM events e LEFT JOIN matched m
  ON m.event_id = e.event_id AND m.rn = 1
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# rolling window aggregate: 7-day trailing event counts per day
# ---------------------------------------------------------------------------

def rolling_daily_counts(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """Per calendar day: events that day + trailing-window total
    (day-6 .. day). Daily partials are computed distributed (the same
    partial-aggregate pattern as every grouped sum); the rolling pass
    runs on the tiny per-day frame driver-side — at any scale the day
    cardinality is bounded, so this is the right split."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                      pa.timestamp("us"))
        df = pd.DataFrame({"day": day.to_pandas()})
        g = df.groupby("day", as_index=False).size().rename(
            columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values("day").reset_index(drop=True))
    days = pd.to_datetime(daily["day"])
    counts = daily["n"].astype(np.int64).to_numpy()
    rolling = np.zeros(len(daily), dtype=np.int64)
    for i in range(len(daily)):
        lo = days[i] - pd.Timedelta(days=window_days - 1)
        sel = (days >= lo) & (days <= days[i])
        rolling[i] = counts[sel.to_numpy()].sum()
    return pd.DataFrame({"event_day": days.dt.strftime("%Y-%m-%d"),
                         "day_cnt": counts,
                         "rolling_cnt": rolling})


ROLLING_DAILY_COUNTS_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, COUNT(*) AS n
  FROM events GROUP BY d)
SELECT strftime(d, '%Y-%m-%d') AS event_day,
       CAST(n AS BIGINT) AS day_cnt,
       CAST(SUM(n) OVER (ORDER BY d
            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_cnt
FROM daily ORDER BY event_day
"""


# ---------------------------------------------------------------------------
# union of two activity streams
# ---------------------------------------------------------------------------

def activity_union_daily(sf_dir: str) -> pd.DataFrame:
    """events ∪ orders as one activity stream (Dataset.union), counted
    per day and kind."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["ts"])
    od = _read(sf_dir, "orders", columns=["o_orderdate"])

    def ev_part(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                      pa.timestamp("us"))
        df = pd.DataFrame({"day": day.to_pandas()})
        g = df.groupby("day", as_index=False).size().rename(
            columns={"size": "n"})
        g["kind"] = "event"
        return pa.Table.from_pandas(g[["day", "kind", "n"]],
                                    preserve_index=False)

    def od_part(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["o_orderdate"], unit="day"),
                      pa.timestamp("us"))
        df = pd.DataFrame({"day": day.to_pandas()})
        g = df.groupby("day", as_index=False).size().rename(
            columns={"size": "n"})
        g["kind"] = "order"
        return pa.Table.from_pandas(g[["day", "kind", "n"]],
                                    preserve_index=False)

    unioned = (ev.map_batches(ev_part, batch_format="pyarrow")
                 .union(od.map_batches(od_part, batch_format="pyarrow")))
    agg = (unioned.groupby(["day", "kind"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    agg["activity_day"] = pd.to_datetime(agg.pop("day")).dt.strftime(
        "%Y-%m-%d")
    agg["cnt"] = agg.pop("n").astype(np.int64)
    return (agg[["activity_day", "kind", "cnt"]]
            .sort_values(["activity_day", "kind"]).reset_index(drop=True))


ACTIVITY_UNION_DAILY_SQL = """
SELECT activity_day, kind, COUNT(*) AS cnt FROM (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS activity_day,
         'event' AS kind FROM events
  UNION ALL
  SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d'),
         'order' FROM orders)
GROUP BY activity_day, kind ORDER BY activity_day, kind
"""


# ---------------------------------------------------------------------------
# funnel analysis — ordered multi-stage conversion
# ---------------------------------------------------------------------------

#: default conversion funnel over the events fixture's type vocabulary
FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel_part(g: pd.DataFrame) -> pd.DataFrame:
    """Per-user ordered funnel depth within one coarse user-fold
    partition. Stage k is reached iff an event of stage-k type exists
    STRICTLY after the time stage k-1 was reached (min qualifying ts),
    the classic sequential-funnel recursion — order matters, which is
    exactly what makes this inexpressible as an order-free aggregate."""
    stages = list(FUNNEL_STAGES)
    rows = []
    for uid, gu in g.groupby("user_id", sort=False):
        t_prev = None
        reached = 0
        for si, stage in enumerate(stages):
            ts = gu.loc[gu["event_type"] == stage, "ts_us"].to_numpy()
            if si:
                ts = ts[ts > t_prev]
            if not len(ts):
                break
            t_prev = ts.min()
            reached = si + 1
        if reached:
            rows.append((int(uid), reached))
    return pd.DataFrame(rows, columns=["user_id", "stage_reached"])


def funnel_stages(sf_dir: str) -> pd.DataFrame:
    """Sequential-funnel user counts: (stage, stage_name, n_users)
    where n_users counts users whose ordered event history reaches at
    least that stage (view -> click-after-view -> purchase-after-
    click; strict ts inequality between stages).

    Scale shape: read pruned to the funnel's event types, ONE shuffle
    on the coarse user fold (``shuffle_width``-sized partitions), the
    per-user recursion inside ``map_groups``, and only per-user depth
    rows feed the final tiny count aggregate — the full event stream
    never leaves the workers un-reduced.
    """
    from ray.data.aggregate import Count
    from .util import shuffle_width

    types = list(FUNNEL_STAGES)
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        mask = np.isin(np.asarray(b["event_type"].to_pylist(),
                                  dtype=object), types)
        b = b.filter(pa.array(mask))
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid),
            "event_type": b["event_type"],
            "ts_us": pa.array(ts)})

    depth_counts = (ds.map_batches(prep, batch_format="pyarrow")
                      .groupby("part")
                      .map_groups(_funnel_part, batch_format="pandas")
                      .groupby("stage_reached")
                      .aggregate(Count(alias_name="n"))
                      .to_pandas())
    by_depth = dict(zip(depth_counts["stage_reached"].astype(int),
                        depth_counts["n"].astype(int)))
    rows = []
    for si, name in enumerate(FUNNEL_STAGES, start=1):
        n = sum(v for d, v in by_depth.items() if d >= si)
        rows.append((si, name, n))
    out = pd.DataFrame(rows, columns=["stage", "stage_name", "n_users"])
    out["stage"] = out["stage"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out


FUNNEL_STAGES_SQL = """
WITH e AS (SELECT user_id, event_type, ts FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
SELECT 1::BIGINT AS stage, 'view' AS stage_name,
       COUNT(*)::BIGINT AS n_users FROM s1
UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# JSON property extraction — the semi-structured metadata pull every
# event pipeline runs before it can aggregate (events.props is a JSON
# string column; the engine never parses JSON row-by-row on the driver)
# ---------------------------------------------------------------------------

_PROPS_K_RE = r'"k"\s*:\s*(?P<k>-?\d+)'   # RE2-safe; compiled by Arrow


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """Per-event-type stats of the integer field ``k`` extracted from
    the JSON ``props`` column: (event_type, n_events, sum_k, min_k,
    max_k, n_k_ge_50) — all BIGINT, exact vs DuckDB ``json_extract``.

    Extraction is one vectorized RE2 pass per batch
    (``pc.extract_regex``), the aggregate is partial-per-batch rows
    (<= n_types per batch) into a tiny groupby — props strings never
    shuffle and never reach the driver.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(batch["props"], pattern=_PROPS_K_RE),
            "k").cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "k": k})
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"),
            n_k_ge_50=("k", lambda s: int((s.to_numpy() >= 50).sum())))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("sum_k", alias_name="sum_k"),
                        Min("min_k", alias_name="min_k"),
                        Max("max_k", alias_name="max_k"),
                        Sum("n_k_ge_50", alias_name="n_k_ge_50"))
             .to_pandas())
    for c in ("n_events", "sum_k", "min_k", "max_k", "n_k_ge_50"):
        out[c] = out[c].astype(np.int64)
    return (out[["event_type", "n_events", "sum_k", "min_k", "max_k",
                 "n_k_ge_50"]]
            .sort_values("event_type").reset_index(drop=True))


EVENTS_PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(COALESCE(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_k_ge_50
FROM e GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# pivot / crosstab — day x event_type counts as a wide table (the
# dashboard-shaped output of every event stream)
# ---------------------------------------------------------------------------

PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_daily(sf_dir: str) -> pd.DataFrame:
    """Daily event counts pivoted wide: one row per day, one BIGINT
    column per event type (fixed, known column set — a pivot over an
    unbounded type domain would be a different operator).

    Scale shape: per-batch partial (day, type, n) rows — at most
    days x types per batch — feed a tiny groupby; the pivot itself
    runs on the driver over the already-aggregated (days x types)
    result, never over event rows.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                      pa.timestamp("us"))
        df = pd.DataFrame({"day": day.to_pandas(),
                           "event_type": batch["event_type"].to_pandas(),
                           "n": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["day", "event_type"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["day", "event_type"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    agg["event_day"] = pd.to_datetime(agg.pop("day")).dt.strftime("%Y-%m-%d")
    wide = (agg.pivot_table(index="event_day", columns="event_type",
                            values="n", aggfunc="sum", fill_value=0)
               .reindex(columns=list(PIVOT_EVENT_TYPES), fill_value=0)
               .astype(np.int64)
               .reset_index())
    wide.columns.name = None
    return wide.sort_values("event_day").reset_index(drop=True)


EVENTS_PIVOT_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS event_day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY event_day ORDER BY event_day
"""


# ---------------------------------------------------------------------------
# event transition matrix — consecutive event-type bigrams per user
# (the Markov / clickstream-path summary; complements the funnel's
# fixed-order reachability)
# ---------------------------------------------------------------------------

def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Counts of consecutive (from_type, to_type) transitions inside
    each user's time-ordered event stream: (from_type, to_type, n).
    Ordering ties on equal timestamps break by event_id — mirrored in
    the oracle's window ORDER BY, so the pair sequence is identical.

    Scale shape: ONE shuffle on the coarse user fold; inside each
    partition the per-user ordering + bigram count is vectorized
    (lexsort + one boundary mask, no per-user loop), and only
    per-(partition, from, to) counts — at most types² rows each —
    reach the final tiny aggregate.
    """
    from ray.data.aggregate import Sum

    from .util import shuffle_width

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid),
            "event_type": b["event_type"],
            "ts_us": pa.array(ts),
            "event_id": b["event_id"].cast(pa.int64())})

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts_us"].to_numpy(), uid))
        uid = uid[order]
        et = g["event_type"].to_numpy()[order]
        same_user = uid[1:] == uid[:-1]
        df = pd.DataFrame({"from_type": et[:-1][same_user],
                           "to_type": et[1:][same_user]})
        out = (df.groupby(["from_type", "to_type"], as_index=False)
                 .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(count_pairs, batch_format="pandas")
             .groupby(["from_type", "to_type"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["from_type", "to_type"])
               .reset_index(drop=True))


EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY from_type, to_type ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# user journey paths — grouped ORDERED string aggregation (clickstream
# paths; the transition matrix's full-sequence complement)
# ---------------------------------------------------------------------------

_JOURNEY_MAX_STEPS = 8


def user_journey_paths(sf_dir: str) -> pd.DataFrame:
    """Count users per time-ordered event-type path, truncated to the
    first ``_JOURNEY_MAX_STEPS`` events (the standard journey-analysis
    bound, which also keeps path strings O(1)): (path, n_users).
    Ordering ties on equal timestamps break by event_id — mirrored in
    the oracle's window ORDER BY.

    Scale shape: ONE shuffle on the coarse user fold (each user's
    events must co-locate to form its sequence); inside a partition
    the ordering + step-rank is vectorized (lexsort + boundary-anchored
    rank, no per-user loop) and only (path, count) partials — at most
    distinct-paths rows per partition — reach the final aggregate.
    Output is result-sized by nature (one row per distinct path).
    """
    from ray.data.aggregate import Sum

    from .util import shuffle_width

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid),
            "event_type": b["event_type"],
            "ts_us": pa.array(ts),
            "event_id": b["event_id"].cast(pa.int64())})

    def fold_paths(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts_us"].to_numpy(), uid))
        uid = uid[order]
        et = g["event_type"].to_numpy()[order]
        new_user = np.ones(len(uid), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        # step rank within user: arange minus the user's start offset
        idx = np.arange(len(uid))
        start = np.maximum.accumulate(np.where(new_user, idx, 0))
        rank = idx - start
        keep = rank < _JOURNEY_MAX_STEPS
        df = pd.DataFrame({"user_id": uid[keep], "event_type": et[keep]})
        paths = (df.groupby("user_id", sort=False)["event_type"]
                   .agg("->".join))
        out = paths.value_counts().rename_axis("path").reset_index(
            name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out[["path", "n_users"]]

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(fold_paths, batch_format="pandas")
             .groupby("path")
             .aggregate(Sum("n_users", alias_name="n_users"))
             .to_pandas())
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("path").reset_index(drop=True)


USER_JOURNEY_PATHS_SQL = """
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS r
  FROM events),
paths AS (
  SELECT user_id, STRING_AGG(event_type, '->' ORDER BY r) AS path
  FROM ranked WHERE r <= 8 GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths GROUP BY path ORDER BY path
"""


# ---------------------------------------------------------------------------
# cohort retention — customers bucketed by first-order month, counted
# at each later month they ordered again (the classic retention matrix)
# ---------------------------------------------------------------------------

def cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Retention matrix over orders: (cohort_month, month_offset,
    n_customers) where cohort_month is the customer's first order
    month and each row counts the cohort's distinct customers active
    at that calendar-month offset (offset 0 = the cohort size).

    Scale shape: ONE shuffle of (custkey, month-index) pairs — months
    are pre-deduped per batch so at most |custs| x |months| rows move
    — onto the coarse customer fold; per-customer min + offsets are
    vectorized inside the partition, and only (cohort, offset) partial
    counts reach the final tiny aggregate. Month arithmetic is integer
    (y*12 + m), identical to the oracle's ``datediff('month', ...)``
    on month-truncated dates.
    """
    from ray.data.aggregate import Sum

    from .util import shuffle_width

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        cust = np.asarray(b["o_custkey"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        d = b["o_orderdate"].to_numpy(zero_copy_only=False)
        ym = d.astype("datetime64[M]").astype(np.int64)   # months since 1970
        df = (pd.DataFrame({"cust": cust, "my": ym})
                .drop_duplicates())
        part = (df["cust"].to_numpy() % n_parts).astype(np.int32)
        return pa.table({"part": pa.array(part),
                         "cust": pa.array(df["cust"].to_numpy()),
                         "my": pa.array(df["my"].to_numpy())})

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["cust", "my"])
        first = g.groupby("cust")["my"].transform("min")
        df = pd.DataFrame({"cohort_my": first.to_numpy(),
                           "offset": (g["my"] - first).to_numpy()})
        out = (df.groupby(["cohort_my", "offset"], as_index=False)
                 .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(offsets, batch_format="pandas")
             .groupby(["cohort_my", "offset"])
             .aggregate(Sum("n", alias_name="n_customers"))
             .to_pandas())
    my = agg["cohort_my"].to_numpy(dtype=np.int64)
    agg["cohort_month"] = [f"{1970 + m // 12:04d}-{m % 12 + 1:02d}"
                           for m in my]
    agg["month_offset"] = agg.pop("offset").astype(np.int64)
    agg["n_customers"] = agg["n_customers"].astype(np.int64)
    return (agg[["cohort_month", "month_offset", "n_customers"]]
            .sort_values(["cohort_month", "month_offset"])
            .reset_index(drop=True))


COHORT_RETENTION_SQL = """
WITH f AS (SELECT o_custkey,
                  MIN(date_trunc('month', o_orderdate)) AS cm
           FROM orders GROUP BY o_custkey),
m AS (SELECT DISTINCT o.o_custkey,
             date_trunc('month', o.o_orderdate) AS om, f.cm
      FROM orders o JOIN f USING (o_custkey))
SELECT strftime(cm, '%Y-%m') AS cohort_month,
       CAST(datediff('month', cm, om) AS BIGINT) AS month_offset,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM m GROUP BY cm, om ORDER BY cohort_month, month_offset
"""


# ---------------------------------------------------------------------------
# event debounce — burst filtering per (user, type)
# ---------------------------------------------------------------------------

DEBOUNCE_US = 3600 * 1000000  # 1 hour, in exact microseconds


def event_debounce_stats(sf_dir: str,
                         window_us: int = DEBOUNCE_US) -> pd.DataFrame:
    """Burst-filter summary: per event_type, how many events survive
    when repeats of the same (user, type) within ``window_us``
    microseconds of the PREVIOUS occurrence are dropped — the telemetry
    dedup every event pipeline wants before sessionizing. Output
    (event_type, n_total, n_kept).

    Kept == gap-to-lag > window (or first occurrence); gaps compare in
    exact integer microseconds on both sides (``epoch_us`` in the
    oracle), so sub-second timestamps can't drift the boundary.

    Scale shape: ``event_transitions``'s — ONE shuffle on the coarse
    user fold (a (user,type) stream never spans folds), in-partition
    lexsort + one vectorized boundary mask, only per-(partition, type)
    count rows reach the final tiny aggregate.
    """
    from ray.data.aggregate import Sum

    from .util import shuffle_width

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid),
            "event_type": b["event_type"],
            "ts_us": pa.array(ts),
            "event_id": b["event_id"].cast(pa.int64())})

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        # order within (user, type) by time then event_id (ties drop);
        # the group key is pure integer math: user * n_types + type_code
        # (n_types is tiny; the product stays far under 2^63)
        tcode, uniq_types = pd.factorize(et)
        codes = uid * np.int64(len(uniq_types)) + tcode
        order = np.lexsort((g["event_id"].to_numpy(), ts, codes))
        codes_o, ts_o, et_o = codes[order], ts[order], et[order]
        same = codes_o[1:] == codes_o[:-1]
        gap_ok = (ts_o[1:] - ts_o[:-1]) > window_us
        kept = np.ones(len(codes_o), dtype=bool)
        kept[1:] = ~same | gap_ok
        df = pd.DataFrame({"event_type": et_o,
                           "n_total": np.ones(len(et_o), dtype=np.int64),
                           "n_kept": kept.astype(np.int64)})
        return df.groupby("event_type", as_index=False).sum()

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(debounce, batch_format="pandas")
             .groupby("event_type")
             .aggregate(Sum("n_total", alias_name="n_total"),
                        Sum("n_kept", alias_name="n_kept"))
             .to_pandas())
    out["n_total"] = out["n_total"].astype(np.int64)
    out["n_kept"] = out["n_kept"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


EVENT_DEBOUNCE_STATS_SQL = f"""
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {DEBOUNCE_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM s GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cube / grouping sets — (type × day), (type), (day), () in ONE scan
# ---------------------------------------------------------------------------

def events_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(event_type, day) over the events stream: n and exact
    value cents for every grouping set, with 'ALL' as the rolled-up
    dimension marker. Output (event_type, day, n, value_sum).

    The OLAP discipline at 100 TB: the raw table is scanned ONCE into
    (type, day) partials — types × days rows per block — and every
    coarser grouping set (type), (day), () is derived from the
    ALREADY-AGGREGATED finest table, which is tiny. The three rollups
    cost nothing compared to re-scanning per set (what a naive
    4-query translation would do).
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        from .relational import _cents
        day = (b["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[D]"))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pylist(),
            "day": np.datetime_as_string(day, unit="D"),
            "n": np.ones(b.num_rows, dtype=np.int64),
            "vc": _cents(b["value"])})
        g = df.groupby(["event_type", "day"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "day"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("vc", alias_name="vc"))
              .to_pandas())

    def roll(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if keys:
            g = df.groupby(keys, as_index=False)[["n", "vc"]].sum()
        else:
            g = pd.DataFrame([{"n": df["n"].sum(), "vc": df["vc"].sum()}])
        for c in ("event_type", "day"):
            if c not in g.columns:
                g[c] = "ALL"
        return g

    out = pd.concat([
        roll(fine, ["event_type", "day"]),
        roll(fine, ["event_type"]),
        roll(fine, ["day"]),
        roll(fine, []),
    ], ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    out["value_sum"] = out.pop("vc").astype(np.int64) / 100.0
    return (out[["event_type", "day", "n", "value_sum"]]
            .sort_values(["event_type", "day"])
            .reset_index(drop=True))


EVENTS_CUBE_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS value_sum
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# OHLC resample — per (type, hour): open / high / low / close of value
# ---------------------------------------------------------------------------

def events_hourly_ohlc(sf_dir: str) -> pd.DataFrame:
    """Resample the event stream to hourly OHLC bars per type:
    (event_type, hour, n, open, high, low, close) — open/close are the
    values at the (ts, event_id)-first/last rows of the bar, the
    metric-downsampling shape every telemetry store serves.

    Mergeable-partial discipline: each batch reduces to at most
    (types × hours-in-batch) rows carrying the bar's count, min/max
    cents AND the open/close values tagged with their (ts, event_id)
    keys — merging two partials keeps the smaller/larger key's value,
    so the merge is associative and order-free. Partials co-fold on a
    coarse hash of (type, hour) and merge vectorized inside each
    partition; only final bars leave the groups.
    """
    from .util import shuffle_width

    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "event_id", "value"])
    n_parts = shuffle_width(ds, floor=16)

    def partial(b: pa.Table) -> pa.Table:
        from .relational import _cents
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]"))
        hour = np.datetime_as_string(ts.astype("datetime64[h]"), unit="h")
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pylist(),
            "hour": hour,
            "ts_us": ts.astype(np.int64),
            "eid": np.asarray(b["event_id"].to_numpy(zero_copy_only=False),
                              dtype=np.int64),
            "v": _cents(b["value"])})
        df = df.sort_values(["ts_us", "eid"], kind="mergesort")
        g = df.groupby(["event_type", "hour"], sort=False)
        out = g.agg(n=("v", "size"), lo=("v", "min"), hi=("v", "max"),
                    open_v=("v", "first"), close_v=("v", "last"),
                    open_ts=("ts_us", "first"), open_eid=("eid", "first"),
                    close_ts=("ts_us", "last"), close_eid=("eid", "last")
                    ).reset_index()
        h = pd.util.hash_pandas_object(
            out["event_type"] + "\x00" + out["hour"], index=False)
        out["part"] = (h % n_parts).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["open_ts", "open_eid"], kind="mergesort")
        grp = g.groupby(["event_type", "hour"], sort=False)
        first = grp.agg(open_v=("open_v", "first")).reset_index()
        g2 = g.sort_values(["close_ts", "close_eid"], kind="mergesort")
        last = (g2.groupby(["event_type", "hour"], sort=False)
                .agg(close_v=("close_v", "last")).reset_index())
        base = grp.agg(n=("n", "sum"), lo=("lo", "min"),
                       hi=("hi", "max")).reset_index()
        return base.merge(first, on=["event_type", "hour"]).merge(
            last, on=["event_type", "hour"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("part")
             .map_groups(merge, batch_format="pandas")
             .to_pandas())
    out["n"] = out["n"].astype(np.int64)
    for src, dst in (("open_v", "open"), ("hi", "high"),
                     ("lo", "low"), ("close_v", "close")):
        out[dst] = out.pop(src).astype(np.int64) / 100.0
    return (out[["event_type", "hour", "n", "open", "high", "low",
                 "close"]]
            .sort_values(["event_type", "hour"]).reset_index(drop=True))


EVENTS_HOURLY_OHLC_SQL = """
WITH c AS (
  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%dT%H')
             AS hour,
         CAST(ROUND(value * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY event_type,
                                         date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type,
                                         date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT event_type, hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(CASE WHEN rn_a = 1 THEN v END) / 100.0 AS open,
       MAX(v) / 100.0 AS high,
       MIN(v) / 100.0 AS low,
       MAX(CASE WHEN rn_d = 1 THEN v END) / 100.0 AS close
FROM c GROUP BY event_type, hour ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# windowed_counts_watermark — the dataflow-model streaming semantics
# (Akidau et al. 2015, "The Dataflow Model"; Flink/Beam watermarks):
# tumbling event-time windows closed by a watermark with allowed
# lateness, arrivals that miss their closed window routed to a late
# side count
# ---------------------------------------------------------------------------

WM_CHUNKS = 4                       # simulated arrival batches
WM_WINDOW_US = 3_600_000_000        # 1 h tumbling event-time windows
WM_LATENESS_US = 3_600_000_000      # 1 h allowed lateness


def windowed_counts_watermark(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window event counts under streaming watermark
    semantics: events arrive in ``WM_CHUNKS`` simulated batches
    (arrival order = a hash of event_id — deterministic and
    ADVERSARIALLY out-of-order, the watermark worst case); after each
    batch the watermark advances to max(event time seen) − allowed
    lateness and every window ending at or before it is FINALIZED.
    An arrival whose window was finalized by a PREVIOUS batch is late:
    it never reenters the pane and is counted in the window's late
    side output instead (the Beam ``Never``-refinement discipline).

    Returns (window_hour, n_events, n_late) per window, exact int64.

    One scan at any scale: whether an arrival is late depends only on
    its (arrival chunk, window) — not the row — so the pipeline
    reduces every block to (chunk, window, n, max_us) partials inside
    ``map_batches`` and the watermark simulation replays over the
    aggregated chunks×windows table on the driver (KB-sized: the
    stream state of the dataflow model is window metadata, never
    events)."""
    from ray.data.aggregate import Max, Sum

    from .dedup import _h64u

    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["event_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        us = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        chunk = np.fromiter(
            (_h64u(str(int(i))) % WM_CHUNKS for i in ids),
            dtype=np.int64, count=len(ids))
        w = us // WM_WINDOW_US
        key = chunk * np.int64(1 << 40) + w   # windows << 2^40
        uk, inv, cnt = np.unique(key, return_inverse=True,
                                 return_counts=True)
        mx = np.zeros(len(uk), dtype=np.int64)
        np.maximum.at(mx, inv, us)
        return pa.table({
            "chunk": pa.array(uk // (1 << 40)),
            "w": pa.array(uk % (1 << 40)),
            "n": pa.array(cnt.astype(np.int64)),
            "mx": pa.array(mx)})

    t = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["chunk", "w"])
           .aggregate(Sum("n", alias_name="n"),
                      Max("mx", alias_name="mx"))
           .to_pandas())
    # driver replay over the tiny (chunk, window) table
    on_time: dict[int, int] = {}
    late: dict[int, int] = {}
    prior_max: int | None = None
    for c in range(WM_CHUNKS):
        rows = t[t["chunk"] == c]
        for w, nn in zip(rows["w"], rows["n"]):
            w, nn = int(w), int(nn)
            closed = (prior_max is not None
                      and (w + 1) * WM_WINDOW_US
                      <= prior_max - WM_LATENESS_US)
            d = late if closed else on_time
            d[w] = d.get(w, 0) + nn
        if len(rows):
            cm = int(rows["mx"].max())
            prior_max = cm if prior_max is None else max(prior_max, cm)
    wins = sorted(set(on_time) | set(late))
    return pd.DataFrame({
        "window_hour": np.array(wins, dtype=np.int64),
        "n_events": np.array([on_time.get(w, 0) for w in wins],
                             dtype=np.int64),
        "n_late": np.array([late.get(w, 0) for w in wins],
                           dtype=np.int64)})


def _watermark_sql() -> str:
    le = " || ".join(f"substr(md5(event_id::VARCHAR), {15 - 2 * i}, 2)"
                     for i in range(8))
    W, L, C = WM_WINDOW_US, WM_LATENESS_US, WM_CHUNKS
    return f"""
WITH e AS (
  SELECT epoch_us(ts) AS us,
         epoch_us(ts) // {W} AS w,
         (('0x' || {le})::UBIGINT % {C})::BIGINT AS chunk
  FROM events),
cm AS (SELECT chunk, MAX(us) AS mx FROM e GROUP BY chunk),
wb AS (
  SELECT chunk,
         MAX(mx) OVER (ORDER BY chunk
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prior_mx
  FROM cm),
x AS (
  SELECT e.w,
         CASE WHEN wb.prior_mx IS NOT NULL
                   AND (e.w + 1) * {W} <= wb.prior_mx - {L}
              THEN 1 ELSE 0 END AS late
  FROM e JOIN wb ON e.chunk = wb.chunk)
SELECT w AS window_hour,
       COUNT(*) FILTER (WHERE late = 0)::BIGINT AS n_events,
       COUNT(*) FILTER (WHERE late = 1)::BIGINT AS n_late
FROM x GROUP BY w ORDER BY w
"""


WINDOWED_COUNTS_WATERMARK_SQL = _watermark_sql()


# ---------------------------------------------------------------------------
# gap_fill_hourly — time-series resample with forward fill: the gap-
# filling step every downstream chart/feature pipeline needs (missing
# buckets carried forward, flagged)
# ---------------------------------------------------------------------------

def gap_fill_hourly(sf_dir: str) -> pd.DataFrame:
    """Hourly value sums per event type over each type's own [min,
    max] hour span, missing hours forward-filled from the last
    observed hour and flagged: (event_type, hour, value_cents,
    filled).

    One scan: blocks reduce to (type, hour, cents) partials (exact
    integer cents) and a tiny groupby closes the aggregation; the
    dense grid + forward fill runs on the AGGREGATED table, whose size
    is types × hours — bounded by the calendar, never by the event
    count, the same reduce-then-derive shape as ``events_cube``."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        us = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pylist(),
                           "hour": us // 3_600_000_000,
                           "c": cents})
        g = df.groupby(["event_type", "hour"], as_index=False)["c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "hour"])
             .aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        g = g.sort_values("hour")
        hs = g["hour"].to_numpy(dtype=np.int64)
        cs = g["c"].to_numpy(dtype=np.int64)
        grid = np.arange(hs[0], hs[-1] + 1, dtype=np.int64)
        # last observed index at or before each grid hour
        src = np.searchsorted(hs, grid, side="right") - 1
        filled = ~np.isin(grid, hs)
        rows.append(pd.DataFrame({
            "event_type": et, "hour": grid,
            "value_cents": cs[src],
            "filled": filled.astype(np.int64)}))
    out = pd.concat(rows, ignore_index=True)
    for c in ("hour", "value_cents", "filled"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


GAP_FILL_HOURLY_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         ROUND(value * 100)::BIGINT AS c
  FROM events),
agg AS (SELECT event_type, h, SUM(c) AS c FROM e GROUP BY 1, 2),
span AS (SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
         FROM agg GROUP BY 1),
nums AS (SELECT unnest(generate_series(0,
           (SELECT MAX(mx - mn) FROM span)::INT)) AS i),
grid AS (SELECT event_type, mn + i AS h
         FROM span JOIN nums ON i <= mx - mn),
j AS (SELECT g.event_type, g.h, a.c
      FROM grid g LEFT JOIN agg a USING (event_type, h))
SELECT event_type, h AS hour,
       LAST_VALUE(c IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h)::BIGINT AS value_cents,
       (c IS NULL)::BIGINT AS filled
FROM j ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# scd2_user_values — CDC stream -> slowly-changing-dimension type 2:
# compress each user's value stream into validity intervals
# ---------------------------------------------------------------------------

def scd2_user_values(sf_dir: str) -> pd.DataFrame:
    """SCD2 dimension build from the event stream: per user, order
    events by (time, event_id), drop rows whose value equals the
    previous one (SCD2 compression), and emit validity intervals
    (user_id, valid_from_us, valid_to_us, value_cents) — valid_to is
    the next CHANGE's timestamp, -1 on the open current row.

    The warehouse CDC pattern on Ray Data: one coarse user-fold
    shuffle (``shuffle_width`` partitions, never one group per user),
    then in-partition lexsort + boundary masks — no per-user loops."""
    from .util import shuffle_width

    ds = _read(sf_dir, "events", columns=["user_id", "event_id",
                                          "ts", "value"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        us = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid),
            "event_id": pa.array(np.asarray(
                b["event_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)),
            "us": pa.array(us),
            "c": pa.array(cents)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        us = g["us"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, us, uid))
        uid, us, c = uid[order], us[order], c[order]
        first = np.r_[True, uid[1:] != uid[:-1]]
        change = first | np.r_[False, c[1:] != c[:-1]]
        uid, us, c = uid[change], us[change], c[change]
        last = np.r_[uid[1:] != uid[:-1], True]
        vto = np.r_[us[1:], np.int64(-1)]
        vto[last] = -1
        return pd.DataFrame({"user_id": uid, "valid_from_us": us,
                             "valid_to_us": vto, "value_cents": c})

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return (out.sort_values(["user_id", "valid_from_us"])
            .reset_index(drop=True))


SCD2_USER_VALUES_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ROUND(value * 100)::BIGINT AS c
  FROM events),
o AS (SELECT *, LAG(c) OVER (PARTITION BY user_id
                             ORDER BY us, event_id) AS prev FROM e),
ch AS (SELECT user_id, event_id, us, c
       FROM o WHERE prev IS NULL OR c != prev)
SELECT user_id, us AS valid_from_us,
       COALESCE(LEAD(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id),
                -1)::BIGINT AS valid_to_us,
       c AS value_cents
FROM ch ORDER BY user_id, valid_from_us
"""


# ---------------------------------------------------------------------------
# CUSUM change-point detection — the monitoring primitive: has the
# level of a metric shifted, and when?
# ---------------------------------------------------------------------------

CUSUM_THRESHOLD_CENTS = 50_000   # |cusum| crossing that flags a shift


def cusum_change_points(sf_dir: str) -> pd.DataFrame:
    """Per event type: CUSUM statistics of the value stream in time
    order — (event_type, mean_cents, max_abs_cusum, first_cross_id)
    with cusum_i = Σ_{j<=i}(c_j − mean), mean the FLOOR per-type mean
    in cents (exact integer), and first_cross_id the event_id of the
    first |cusum| > threshold crossing (−1 if none). All int64.

    Two passes: a tiny (type, Σc, n) aggregate fixes the per-type
    floor mean; the scan pass folds each type's events into one
    partition (types are few — the per-type prefix sum is inherently
    sequential; ``pack_sequences`` shows the two-phase block-offset
    prefix sum to use when one group outgrows a worker) and runs the
    vectorized cumulative sum in (ts, event_id) order."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(np.asarray(
            b["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        us = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_type": b["event_type"],
            "event_id": pa.array(np.asarray(
                b["event_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64)),
            "us": pa.array(us),
            "c": pa.array(cents)})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    means = (prepped.groupby("event_type")
             .aggregate(Sum("c", alias_name="s"),
                        Count(alias_name="n"))
             .to_pandas())
    mean_of = {r["event_type"]: int(r["s"]) // int(r["n"])
               for _, r in means.iterrows()}

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, ge in g.groupby("event_type", sort=False):
            order = np.lexsort((ge["event_id"].to_numpy(np.int64),
                                ge["us"].to_numpy(np.int64)))
            c = ge["c"].to_numpy(np.int64)[order]
            ids = ge["event_id"].to_numpy(np.int64)[order]
            mu = mean_of[et]
            cusum = np.cumsum(c - mu)
            cross = np.flatnonzero(np.abs(cusum)
                                   > CUSUM_THRESHOLD_CENTS)
            rows.append((et, mu, int(np.abs(cusum).max()),
                         int(ids[cross[0]]) if len(cross) else -1))
        return pd.DataFrame(rows, columns=[
            "event_type", "mean_cents", "max_abs_cusum",
            "first_cross_id"])

    out = (prepped.groupby("event_type")
           .map_groups(fold, batch_format="pandas")
           .to_pandas())
    for c in ("mean_cents", "max_abs_cusum", "first_cross_id"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


CUSUM_CHANGE_POINTS_SQL = f"""
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         ROUND(value * 100)::BIGINT AS c
  FROM events),
m AS (SELECT event_type, SUM(c) // COUNT(*) AS mu FROM e GROUP BY 1),
s AS (
  SELECT e.event_type, e.event_id,
         SUM(e.c - m.mu) OVER (PARTITION BY e.event_type
                               ORDER BY e.us, e.event_id
                               ROWS UNBOUNDED PRECEDING) AS cusum
  FROM e JOIN m USING (event_type)),
x AS (
  SELECT event_type, MAX(ABS(cusum))::BIGINT AS max_abs_cusum
  FROM s GROUP BY 1),
f AS (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY us, event_id) AS rn
  FROM (SELECT s.event_type, s.event_id, e.us, s.cusum
        FROM s JOIN e USING (event_type, event_id)
        WHERE ABS(s.cusum) > {CUSUM_THRESHOLD_CENTS})),
fc AS (SELECT event_type, event_id AS first_cross_id
       FROM f WHERE rn = 1)
SELECT m.event_type, m.mu::BIGINT AS mean_cents,
       x.max_abs_cusum,
       COALESCE(fc.first_cross_id, -1)::BIGINT AS first_cross_id
FROM m JOIN x USING (event_type)
LEFT JOIN fc USING (event_type)
ORDER BY m.event_type
"""


# ---------------------------------------------------------------------------
# rolling distinct actives — the WAU/MAU product metric: distinct
# users in a trailing window per bucket (hour-granular here; the
# day/week form is the same machinery with a different bucket width)
# ---------------------------------------------------------------------------

RAU_WINDOW = 6   # trailing buckets (inclusive) per target hour


def rolling_active_users(sf_dir: str,
                         window: int = RAU_WINDOW) -> pd.DataFrame:
    """(hour, n_active): distinct users active in [hour−window+1,
    hour] for every hour with >= 1 event. COUNT(DISTINCT) does not
    window, so the classic exact decomposition: dedupe to the ACTIVES
    table (distinct (user, hour) — bounded by users × hours, never
    event count), fan each active out to the <= ``window`` target
    hours it supports, dedupe (target, user), count per target.

    Shuffle shape: both dedupes move 8-byte PACKED keys pre-deduped
    per batch (the exact-dedup discipline; the two-int64 groupby is
    packed into ONE key — the multi-key sort-groupby measured 10×
    slower on pair tables)."""
    import ray
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def actives(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        hr = ((b["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64))
              // 3_600_000_000)
        key = np.unique(uid * np.int64(1 << 24) + (hr & ((1 << 24) - 1)))
        return pa.table({"key": pa.array(key)})

    act = (ds.map_batches(actives, batch_format="pyarrow")
           .groupby("key").count().drop_columns(["count()"]))

    # hours present (tiny side: bounded by the calendar)
    hours = np.unique(
        act.map_batches(
            lambda b: pa.table({"h": pa.array(np.unique(
                np.asarray(b["key"].to_numpy(zero_copy_only=False),
                           dtype=np.int64) & ((1 << 24) - 1)))}),
            batch_format="pyarrow").to_pandas()["h"].to_numpy(np.int64))
    hset = ray.put(hours)

    def fan(b: pa.Table) -> pa.Table:
        hs = ray.get(hset)
        key = np.asarray(b["key"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        uid = key >> 24
        hr = key & ((1 << 24) - 1)
        outs = []
        for off in range(window):
            t = hr + off
            ok = np.isin(t, hs)       # only hours that exist as targets
            outs.append(uid[ok] * np.int64(1 << 24) + t[ok])
        tk = np.unique(np.concatenate(outs))
        return pa.table({"tkey": pa.array(tk)})

    per_target = (act.map_batches(fan, batch_format="pyarrow")
                  .groupby("tkey").count().drop_columns(["count()"])
                  .map_batches(
                      lambda b: pa.table({
                          "hour": pa.array(np.asarray(
                              b["tkey"].to_numpy(zero_copy_only=False),
                              dtype=np.int64) & ((1 << 24) - 1)),
                          "n": pa.array(np.ones(b.num_rows, np.int64))}),
                      batch_format="pyarrow")
                  .groupby("hour")
                  .aggregate(Count(alias_name="n_active"))
                  .to_pandas())
    out = per_target
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("hour").reset_index(drop=True)


RAU_EPOCH_HOURS = "epoch_us(ts) // 3600000000"

ROLLING_ACTIVE_USERS_SQL = f"""
WITH du AS (
  SELECT DISTINCT user_id,
         ({RAU_EPOCH_HOURS}) & ((1 << 24) - 1) AS h
  FROM events),
hrs AS (SELECT DISTINCT h FROM du),
x AS (
  SELECT hrs.h AS hour, du.user_id
  FROM hrs JOIN du ON du.h BETWEEN hrs.h - {RAU_WINDOW} + 1 AND hrs.h)
SELECT hour, COUNT(DISTINCT user_id)::BIGINT AS n_active
FROM x GROUP BY hour ORDER BY hour
"""


# ---------------------------------------------------------------------------
# association rules — market-basket co-occurrence over user behavior:
# the "users who did A also did B" support/confidence/lift inputs
# ---------------------------------------------------------------------------

def association_pairs(sf_dir: str) -> pd.DataFrame:
    """(type_a, type_b, n_a, n_b, n_both, n_users) for every unordered
    event-type pair — the exact integer inputs of support
    (n_both/n_users), confidence (n_both/n_a) and lift. One dedupe
    shuffle: blocks pre-reduce to distinct (user, type) rows, the
    per-user type set folds to a BITMASK (types are enumerable — one
    uint8 per user instead of a pair explosion), and pair counts
    derive from the tiny mask histogram."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    types = sorted(ds.unique("event_type"))
    bit_of = {t: 1 << i for i, t in enumerate(types)}

    def mask_partial(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        bits = np.array([bit_of[t] for t in b["event_type"].to_pylist()],
                        dtype=np.int64)
        df = pd.DataFrame({"user_id": uid, "m": bits})
        g = df.groupby("user_id", as_index=False)["m"].agg(np.bitwise_or.reduce)
        return pa.Table.from_pandas(g, preserve_index=False)

    # bitwise-OR is associative+commutative: Max has the same fixpoint
    # only for single bits, so fold via groupby + OR-reduce per user
    masks = (ds.map_batches(mask_partial, batch_format="pyarrow")
             .groupby("user_id")
             .map_groups(lambda g: pd.DataFrame(
                 {"user_id": [int(g["user_id"].iloc[0])],
                  "m": [int(np.bitwise_or.reduce(
                      g["m"].to_numpy(dtype=np.int64)))]}),
                 batch_format="pandas")
             .to_pandas())
    mvals = masks["m"].to_numpy(dtype=np.int64)
    n_users = len(mvals)
    hist = np.bincount(mvals, minlength=1 << len(types))
    rows = []
    for i, a in enumerate(types):
        for j in range(i + 1, len(types)):
            b = types[j]
            ba, bb = 1 << i, 1 << j
            idx = np.arange(len(hist))
            n_a = int(hist[(idx & ba) > 0].sum())
            n_b = int(hist[(idx & bb) > 0].sum())
            n_both = int(hist[((idx & ba) > 0) & ((idx & bb) > 0)].sum())
            rows.append((a, b, n_a, n_b, n_both, n_users))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_a",
                                      "n_b", "n_both", "n_users"])
    for c in ("n_a", "n_b", "n_both", "n_users"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


ASSOCIATION_PAIRS_SQL = """
WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
t AS (SELECT DISTINCT event_type FROM events),
nu AS (SELECT COUNT(DISTINCT user_id)::BIGINT AS n_users FROM events),
cnt AS (SELECT event_type, COUNT(*)::BIGINT AS n FROM du GROUP BY 1),
pairboth AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*)::BIGINT AS n_both
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT ta.event_type AS type_a, tb.event_type AS type_b,
       ca.n AS n_a, cb.n AS n_b,
       COALESCE(bo.n_both, 0)::BIGINT AS n_both,
       nu.n_users
FROM t ta JOIN t tb ON ta.event_type < tb.event_type
JOIN cnt ca ON ca.event_type = ta.event_type
JOIN cnt cb ON cb.event_type = tb.event_type
LEFT JOIN pairboth bo ON bo.type_a = ta.event_type
                 AND bo.type_b = tb.event_type
CROSS JOIN nu
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# interval coverage (gaps-and-islands union length per user)
# ---------------------------------------------------------------------------

#: deterministic per-event interval length: (event_id % 7 + 1) minutes
#: — derived, like events_rolling's windows, so the operator is
#: exercised on the shared events table with no extra input column.
_IV_MOD, _IV_MIN_US = 7, 60_000_000


def _interval_cover_part(g: pd.DataFrame) -> pd.DataFrame:
    """One coarse partition: per user, merge overlapping/touching
    intervals (s <= running max e) and aggregate island lengths.
    Fully vectorized: one lexsort + grouped cummax + boundary masks —
    no per-user Python loop."""
    if not len(g):
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "covered_us": pd.Series([], dtype=np.int64),
            "n_islands": pd.Series([], dtype=np.int64),
            "max_island_us": pd.Series([], dtype=np.int64)})
    g = g.sort_values(["user_id", "s", "e"], kind="stable",
                      ignore_index=True)
    uid = g["user_id"].to_numpy()
    s = g["s"].to_numpy()
    e = g["e"].to_numpy()
    run_e = g.groupby("user_id", sort=False)["e"].cummax().to_numpy()
    first = np.r_[True, uid[1:] != uid[:-1]]
    prev_run = np.r_[np.int64(0), run_e[:-1]]
    new_island = first | (s > prev_run)
    # per island: start = s at the island's first row (sorted); end =
    # running max e at its last row (prev islands' e < this island's
    # s, so the user-cummax there IS the island-local cummax)
    starts = s[new_island]
    last = np.r_[new_island[1:], True]
    ends = run_e[last]
    lens = ends - starts
    iu = uid[new_island]
    per_user_first = np.r_[True, iu[1:] != iu[:-1]]
    # islands per user are contiguous: reduce with np.add/maximum.reduceat
    idx = np.flatnonzero(per_user_first)
    out_uid = iu[idx]
    covered = np.add.reduceat(lens, idx)
    n_isl = np.diff(np.r_[idx, len(iu)])
    mx = np.maximum.reduceat(lens, idx)
    return pd.DataFrame({
        "user_id": out_uid.astype(np.int64),
        "covered_us": covered.astype(np.int64),
        "n_islands": n_isl.astype(np.int64),
        "max_island_us": mx.astype(np.int64)})


def interval_coverage(sf_dir: str) -> pd.DataFrame:
    """Per-user interval-union statistics over derived event
    intervals [ts, ts + (event_id % 7 + 1) min): total covered time,
    merged-island count, longest island — the gaps-and-islands sweep
    the temporal family lacked. ONE coarse entity-key shuffle (the
    sessionize discipline); everything inside a partition is
    vectorized, all arithmetic integer microseconds (bit-equal to the
    SQL oracle by construction)."""
    from .util import shuffle_width
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        eid = np.asarray(b["event_id"].to_numpy(zero_copy_only=False))
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        dur = (eid % _IV_MOD + 1) * _IV_MIN_US
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "s": pa.array(ts),
            "e": pa.array(ts + dur)})

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(_interval_cover_part, batch_format="pandas")
             .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


INTERVAL_COVERAGE_SQL = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % {_IV_MOD} + 1)
             * {_IV_MIN_US} AS e
  FROM events),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
              OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM marked),
per_island AS (
  SELECT user_id, island_id,
         MAX(e) - MIN(s) AS len
  FROM islands GROUP BY user_id, island_id)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS covered_us,
       COUNT(*) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS max_island_us
FROM per_island GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# reorder gaps: lag() per customer over order dates
# ---------------------------------------------------------------------------

def customer_reorder_gaps(sf_dir: str) -> pd.DataFrame:
    """Per customer: number of reorders and the min / max / total gap
    between consecutive orders, in whole days — the lag() window
    pattern over the orders fact. One coarse entity-key shuffle; per
    partition a lexsort + masked diff (ties on the same day are
    0-day gaps, deterministic because the sort is (date, orderkey)).
    Customers with a single order are absent (no gap exists)."""
    from .util import shuffle_width

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_orderdate"])
    n_parts = shuffle_width(orders, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[D]").astype(np.int64))
        return pa.table({
            "part": pa.array((ck % n_parts).astype(np.int32)),
            "custkey": pa.array(ck),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "day": pa.array(od)})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["custkey", "day", "okey"], kind="stable",
                          ignore_index=True)
        ck = g["custkey"].to_numpy()
        day = g["day"].to_numpy()
        same = np.r_[False, ck[1:] == ck[:-1]]
        d = np.r_[np.int64(0), day[1:] - day[:-1]]
        gg = pd.DataFrame({"custkey": ck[same], "gap": d[same]})
        out = gg.groupby("custkey", as_index=False).agg(
            n_reorders=("gap", "size"), min_gap=("gap", "min"),
            max_gap=("gap", "max"), total_gap=("gap", "sum"))
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    out = (orders.map_batches(prep, batch_format="pyarrow")
                 .groupby("part")
                 .map_groups(gaps, batch_format="pandas")
                 .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("custkey").reset_index(drop=True)


REORDER_GAPS_SQL = """
WITH o AS (
  SELECT o_custkey AS custkey,
         epoch(o_orderdate)::BIGINT // 86400 AS day,
         LAG(epoch(o_orderdate)::BIGINT // 86400) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_day
  FROM orders)
SELECT custkey,
       COUNT(*)::BIGINT AS n_reorders,
       MIN(day - prev_day)::BIGINT AS min_gap,
       MAX(day - prev_day)::BIGINT AS max_gap,
       SUM(day - prev_day)::BIGINT AS total_gap
FROM o WHERE prev_day IS NOT NULL
GROUP BY custkey ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# time-weighted average inputs (the tsdb TWA operator)
# ---------------------------------------------------------------------------

def time_weighted_value(sf_dir: str) -> pd.DataFrame:
    """Per user: the INPUTS of the time-weighted average of ``value``
    over the event timeline — Σ value·Δt (cents·µs) and Σ Δt (µs),
    where Δt is the time each event's value 'holds' until the user's
    next event (last-observation-carried-forward, the tsdb
    time_weight('locf') operator). Both sums are exact integers; the
    float TWA = num/den is left to the caller, so the SQL oracle is
    bit-equal. One entity fold; inside a partition one lexsort +
    shifted diff. Users with a single event have no held interval and
    are absent."""
    from .util import shuffle_width
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "value", "event_id"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        # half-AWAY-from-zero cents == DuckDB ROUND (np.rint is
        # half-to-even — the relational._cents lesson)
        a = np.asarray(b["value"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        vc = np.trunc(a * 100.0 + np.copysign(0.5, a)).astype(np.int64)
        eid = np.asarray(b["event_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "ts_us": pa.array(ts), "vc": pa.array(vc),
            "eid": pa.array(eid)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "eid"], kind="stable",
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        vc = g["vc"].to_numpy()
        same = np.r_[uid[1:] == uid[:-1], False]
        dt = np.r_[ts[1:] - ts[:-1], np.int64(0)]
        held = pd.DataFrame({"user_id": uid[same],
                             "num": vc[same] * dt[same],
                             "den": dt[same]})
        out = held.groupby("user_id", as_index=False).agg(
            weighted_sum=("num", "sum"), held_us=("den", "sum"))
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(fold, batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


TIME_WEIGHTED_SQL = """
WITH e AS (
  SELECT user_id,
         epoch_us(ts) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS vc,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT user_id,
       SUM(vc * (nxt - t))::BIGINT AS weighted_sum,
       SUM(nxt - t)::BIGINT AS held_us
FROM e WHERE nxt IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------

#: attribution window: a purchase further than this from the previous
#: event is 'direct'
_ATTR_WINDOW_MIN = 30


def attribution_last_touch(sf_dir: str) -> pd.DataFrame:
    """Marketing attribution: every ``purchase`` event is credited to
    the user's immediately preceding event type if it happened within
    30 minutes ('last touch'), else to 'direct'. (touch_type,
    n_purchases) counts. One entity fold; per partition one lexsort +
    shifted compare — the LAG() pattern with a windowed guard."""
    from .util import shuffle_width
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "event_id"])
    n_parts = shuffle_width(ds, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "part": pa.array((uid % n_parts).astype(np.int32)),
            "user_id": pa.array(uid.astype(np.int64)),
            "ts_us": pa.array(ts),
            "etype": b["event_type"].cast(pa.string()),
            "eid": b["event_id"].cast(pa.int64())})

    win_us = _ATTR_WINDOW_MIN * 60_000_000

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "eid"], kind="stable",
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        et = g["etype"].to_numpy()
        is_p = et == "purchase"
        prev_same = np.r_[False, uid[1:] == uid[:-1]]
        prev_near = np.r_[False, (ts[1:] - ts[:-1]) <= win_us]
        touch = np.where(prev_same & prev_near,
                         np.r_[np.asarray(["direct"], object),
                               et[:-1]], "direct")
        hit = pd.DataFrame({"touch_type": touch[is_p]})
        out = (hit.groupby("touch_type", as_index=False)
               .size().rename(columns={"size": "n_purchases"}))
        out["n_purchases"] = out["n_purchases"].astype(np.int64)
        return out

    from ray.data.aggregate import Sum
    out = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part")
             .map_groups(fold, batch_format="pandas")
             .groupby("touch_type")
             .aggregate(Sum("n_purchases", alias_name="n_purchases"))
             .to_pandas())
    out["n_purchases"] = out["n_purchases"].astype(np.int64)
    return out.sort_values("touch_type").reset_index(drop=True)


ATTRIBUTION_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_type, event_id,
         LAG(event_type) OVER w AS prev_type,
         LAG(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT CASE WHEN prev_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(prev_ts)
                 <= {_ATTR_WINDOW_MIN} * 60000000
            THEN prev_type ELSE 'direct' END AS touch_type,
       COUNT(*)::BIGINT AS n_purchases
FROM e WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY touch_type
"""


# ---------------------------------------------------------------------------
# activity inequality (Gini) — exact integer parts
# ---------------------------------------------------------------------------

def activity_gini_parts(sf_dir: str) -> pd.DataFrame:
    """EXACT integer parts of the Gini coefficient of per-user event
    activity: with users ranked i = 1..n by (count, user_id) and
    x_(i) the i-th count, gini = Σ(2i − n − 1)·x_(i) / (n·Σx) — the
    standard rank formula; this emits (n_users, total_events,
    gini_num, gini_den) and leaves the one float division to the
    caller, so the SQL window oracle is bit-equal.

    Scale design: the rank sum NEVER needs a global sort — counts are
    small integers, so the per-user count table folds into a
    counts-of-counts histogram (one tiny groupby); users sharing a
    count occupy a contiguous rank run [R+1, R+h], and Σi over the
    run is h·R + h(h+1)/2 in closed form. The numerator is rank-tie
    invariant, so the histogram derivation equals the window oracle
    exactly."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["user_id"])

    def per_batch(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].to_numpy(zero_copy_only=False))
        u, n = np.unique(uid, return_counts=True)
        return pa.table({"user_id": pa.array(u.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    counts = (ds.map_batches(per_batch, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Sum("n", alias_name="n")))
    hist = (counts.groupby("n")
                  .aggregate(Count(alias_name="h"))
                  .to_pandas())
    c = hist["n"].to_numpy(np.int64)
    h = hist["h"].to_numpy(np.int64)
    order = np.argsort(c, kind="stable")
    c, h = c[order], h[order]
    n_users = int(h.sum())
    total = int((c * h).sum())
    run_start = np.r_[np.int64(0), np.cumsum(h)[:-1]]
    sum_i = h * run_start + h * (h + 1) // 2
    num = int((c * (2 * sum_i - h * (n_users + 1))).sum())
    return pd.DataFrame({
        "n_users": [np.int64(n_users)],
        "total_events": [np.int64(total)],
        "gini_num": [np.int64(num)],
        "gini_den": [np.int64(n_users * total)]})


GINI_SQL = """
WITH c AS (
  SELECT user_id, COUNT(*)::BIGINT AS x FROM events GROUP BY user_id),
r AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i,
         COUNT(*) OVER () AS n
  FROM c)
SELECT MAX(n)::BIGINT AS n_users,
       SUM(x)::BIGINT AS total_events,
       SUM((2 * i - n - 1) * x)::BIGINT AS gini_num,
       (MAX(n) * SUM(x))::BIGINT AS gini_den
FROM r
"""


# ---------------------------------------------------------------------------
# orders_moving_sum — ROWS-frame trailing window (moving sum over the
# last W orders per customer); the range-frame sibling is
# events_rolling_7d
# ---------------------------------------------------------------------------

MOVING_W = 3


def orders_moving_sum(sf_dir: str, w: int = MOVING_W) -> pd.DataFrame:
    """Per order: trailing ``ROWS BETWEEN w-1 PRECEDING AND CURRENT
    ROW`` sum of the customer's order totals in integer cents, plus
    the in-frame row count — the classic ROWS-frame moving aggregate.
    One coarse entity-key shuffle; per partition a stable
    (custkey, day, okey) lexsort, then the window via prefix sums
    with per-customer run starts (no per-group loop)."""
    from .relational import _cents
    from .util import shuffle_width

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_orderdate",
                            "o_totalprice"])
    n_parts = shuffle_width(orders, floor=N_ASOF_PARTS)

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = (b["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[D]").astype(np.int64))
        return pa.table({
            "part": pa.array((ck % n_parts).astype(np.int32)),
            "custkey": pa.array(ck),
            "okey": b["o_orderkey"].cast(pa.int64()),
            "day": pa.array(od),
            "cents": pa.array(_cents(b["o_totalprice"]))})

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["custkey", "day", "okey"], kind="stable",
                          ignore_index=True)
        ck = g["custkey"].to_numpy()
        cents = g["cents"].to_numpy(dtype=np.int64)
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.r_[True, ck[1:] != ck[:-1]]
        gs = np.maximum.accumulate(np.where(run_start, idx, 0))
        lo = np.maximum(gs, idx - (w - 1))
        cs = np.r_[np.int64(0), np.cumsum(cents)]
        return pd.DataFrame({
            "custkey": ck,
            "okey": g["okey"].to_numpy(dtype=np.int64),
            "mov_n": (idx - lo + 1).astype(np.int64),
            "mov_cents": (cs[idx + 1] - cs[lo]).astype(np.int64)})

    out = (orders.map_batches(prep, batch_format="pyarrow")
                 .groupby("part")
                 .map_groups(win, batch_format="pandas")
                 .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["custkey", "okey"])
            .reset_index(drop=True))


ORDERS_MOVING_SUM_SQL = f"""
SELECT o_custkey AS custkey, o_orderkey AS okey,
       COUNT(*) OVER win::BIGINT AS mov_n,
       (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER win)::BIGINT
         AS mov_cents
FROM orders
WINDOW win AS (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN {MOVING_W - 1} PRECEDING AND CURRENT ROW)
ORDER BY custkey, okey
"""

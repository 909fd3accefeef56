"""Temporal operators over the ``events`` stream table: sessionization
(gap-based windowing) and as-of joins — the windowed/ordered operators
Ray Data lacks natively, built from groupby().map_groups over
key-partitioned, time-sorted groups.

Partitioning assumption (documented per SURVEY.md custom-operator
rule): both operators shuffle on the entity key (user_id / customer
key), so each group holds one entity's full ordered history. Skewed
entities are bounded by per-user event counts (no quadratic work:
both kernels are O(n log n) sorts + vectorized scans).
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

def _sessionize_group(g: pd.DataFrame) -> pd.DataFrame:
    """One user's events -> session stats. A new session starts when the
    gap to the previous event exceeds SESSION_GAP_MIN minutes."""
    ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
    gaps = np.diff(ts)
    new_session = gaps > SESSION_GAP_MIN * 60 * 1_000_000
    n_sessions = 1 + int(new_session.sum())
    # session lengths in events: split sizes of the boundary indices
    bounds = np.flatnonzero(new_session) + 1
    sizes = np.diff(np.concatenate([[0], bounds, [len(ts)]]))
    return pd.DataFrame({
        "user_id": [int(g["user_id"].iloc[0])],
        "event_cnt": [len(ts)],
        "session_cnt": [n_sessions],
        "max_session_events": [int(sizes.max())],
    })


def sessionize(sf_dir: str) -> pd.DataFrame:
    """Per-user gap-based session stats (30-min inactivity gap)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = (ds.groupby("user_id")
             .map_groups(_sessionize_group, batch_format="pandas")
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

class _AsofJoiner:
    """Actor-pool stage: the (small) orders side is broadcast once per
    actor as per-customer sorted arrays; each event batch does a
    vectorized searchsorted per user run. For a big right side this
    becomes a co-partitioned merge (shuffle both sides on the key,
    sort-merge within partition) — same kernel, different layout."""

    def __init__(self, orders_ref):
        import ray
        by_cust = ray.get(orders_ref)
        self.by_cust = by_cust  # custkey -> (sorted ts int64[], orderkey[])

    def __call__(self, batch: pa.Table) -> pa.Table:
        users = np.asarray(batch["user_id"].to_numpy(zero_copy_only=False))
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        okey = np.full(len(users), -1, dtype=np.int64)
        for u in np.unique(users):
            side = self.by_cust.get(int(u))
            if side is None:
                continue
            ots, oks = side
            rows = np.flatnonzero(users == u)
            pos = np.searchsorted(ots, ts[rows], side="right") - 1
            ok = pos >= 0
            okey[rows[ok]] = oks[pos[ok]]
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "asof_orderkey": pa.array(okey),
        })


def asof_join_events_orders(sf_dir: str) -> pd.DataFrame:
    """For every event: the user's most recent order with
    o_orderdate <= ts (ties on date -> highest orderkey, deterministic);
    -1 when no prior order exists."""
    import pyarrow.parquet as pq
    import ray
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_custkey", "o_orderkey", "o_orderdate"])
    odf = orders.to_pandas().sort_values(["o_custkey", "o_orderdate",
                                          "o_orderkey"])
    by_cust: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for cust, g in odf.groupby("o_custkey"):
        ots = g["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        by_cust[int(cust)] = (ots, g["o_orderkey"].to_numpy())
    orders_ref = ray.put(by_cust)

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = ds.map_batches(_AsofJoiner,
                         fn_constructor_kwargs={"orders_ref": orders_ref},
                         batch_format="pyarrow",
                         concurrency=(1, 4)).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


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

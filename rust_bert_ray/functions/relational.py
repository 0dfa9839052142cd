"""Relational operators over the TPC-H-ish tables, Ray-Data-first.

Patterns demonstrated (SURVEY.md §2.4-2.6 net-new rows):

- column pruning at the read (`read_parquet(columns=...)`),
- vectorized per-batch compute (pyarrow.compute / pandas),
- **combiner-before-shuffle**: wide aggregations pre-aggregate inside
  ``map_batches`` (one partial row per key per batch) so the groupby
  exchanges per-key partials, not raw rows,
- **broadcast hash join**: the small side is collected once, shipped via
  ``ray.put``, and probed per batch — semi-join semantics, no shuffle,
- global sort + limit only on already-aggregated (small) data.

Float outputs are rounded (2-6 dp) on both the Ray and the SQL side so
summation-order ulp differences cannot flip the value hash.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rust_bert_ray.functions.util import pc_round_ha, round_ha


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


# --------------------------------------------------------------- Q1 pricing

def _q1_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
    g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        p_qty=("l_quantity", "sum"),
        p_base=("l_extendedprice", "sum"),
        p_disc_price=("disc_price", "sum"),
        p_discount=("l_discount", "sum"),
        p_count=("l_quantity", "count"),
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def q1_pricing_summary(sf_dir: str):
    """Pricing summary: grouped sums/averages over lineitem (TPC-H Q1-ish)."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    partials = li.map_batches(_q1_partial, batch_format="pyarrow", batch_size=65536)
    from ray.data.aggregate import Sum

    agg = partials.groupby(["l_returnflag", "l_linestatus"], num_partitions=8).aggregate(
        Sum("p_qty", alias_name="s_qty"),
        Sum("p_base", alias_name="s_base"),
        Sum("p_disc_price", alias_name="s_disc_price"),
        Sum("p_discount", alias_name="s_discount"),
        Sum("p_count", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n")
        return pa.Table.from_pydict(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pc_round_ha(t.column("s_qty"), 2),
                "sum_base_price": pc_round_ha(t.column("s_base"), 2),
                "sum_disc_price": pc_round_ha(t.column("s_disc_price"), 2),
                "avg_qty": pc_round_ha(pc.divide(t.column("s_qty"), n), 4),
                "avg_price": pc_round_ha(pc.divide(t.column("s_base"), n), 4),
                "avg_disc": pc_round_ha(pc.divide(t.column("s_discount"), n), 4),
                "count_order": n,
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_quantity) / COUNT(*), 4)             AS avg_qty,
       ROUND(SUM(l_extendedprice) / COUNT(*), 4)        AS avg_price,
       ROUND(SUM(l_discount) / COUNT(*), 4)             AS avg_disc,
       COUNT(*)                                         AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- top-k revenue per order

def _revenue_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
    g = df.groupby("l_orderkey", as_index=False).agg(p_rev=("rev", "sum"))
    g["_bucket"] = g["l_orderkey"] % 16
    return pa.Table.from_pandas(g, preserve_index=False)


def q_order_revenue_topk(sf_dir: str, k: int = 10):
    """Top-k orders by revenue.

    High-cardinality aggregation: per-batch combiner → hash-bucketed
    parallel reduce (each bucket finishes its keys' sums AND keeps only
    its local top-k) → one tiny final top-k.  The shuffle moves per-key
    partials bucketed 16 ways; only 16·k rows reach the final step — no
    global sort of the keyspace.
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    partials = li.map_batches(_revenue_partial, batch_format="pyarrow", batch_size=65536)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_orderkey", as_index=False).agg(raw_rev=("p_rev", "sum"))
        out["revenue"] = round_ha(out["raw_rev"], 2)
        return out.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(
            k
        )[["l_orderkey", "revenue"]]

    per_bucket = partials.groupby("_bucket", num_partitions=16).map_groups(
        merge_topk, batch_format="pandas"
    )
    from rust_bert_ray.functions.util import topk

    return topk(per_bucket, ["revenue", "l_orderkey"], [True, False], k)


Q_ORDER_REVENUE_TOPK_SQL = """
SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ------------------------------------------- broadcast join orders⨝customer

class SegmentJoin:
    """Broadcast hash join: customer (small side) probed per orders batch."""

    def __init__(self, cust_ref):
        self.seg = ray.get(cust_ref) if isinstance(cust_ref, ray.ObjectRef) else cust_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(self.seg)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            p_n=("o_orderkey", "count"), p_total=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)


def q_segment_order_stats(sf_dir: str):
    """Orders per market segment via broadcast join (no shuffle join)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_map = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    cust_ref = ray.put(seg_map)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    from ray.data.aggregate import Sum

    partials = orders.map_batches(
        SegmentJoin,
        fn_constructor_kwargs={"cust_ref": cust_ref},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=2,
    )
    agg = partials.groupby("c_mktsegment", num_partitions=8).aggregate(
        Sum("p_n", alias_name="n_orders"), Sum("p_total", alias_name="raw_total")
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "n_orders": t.column("n_orders"),
                "total_price": pc_round_ha(t.column("raw_total"), 2),
            }
        ),
        batch_format="pyarrow",
    )


Q_SEGMENT_ORDER_STATS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------- 3-table broadcast: region rollup

def q_region_acctbal(sf_dir: str):
    """Supplier account balance per region via two chained broadcast joins."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    class RegionJoin:
        def __init__(self, ref):
            self.n2rname = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["r_name"] = df["s_nationkey"].map(self.n2rname)
            g = df.groupby("r_name", as_index=False).agg(
                p_n=("s_suppkey", "count"), p_bal=("s_acctbal", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    from ray.data.aggregate import Sum

    partials = supplier.map_batches(
        RegionJoin,
        fn_constructor_kwargs={"ref": lookup_ref},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=2,
    )
    agg = partials.groupby("r_name", num_partitions=8).aggregate(
        Sum("p_n", alias_name="n_suppliers"), Sum("p_bal", alias_name="raw_bal")
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "r_name": t.column("r_name"),
                "n_suppliers": t.column("n_suppliers"),
                "total_acctbal": pc_round_ha(t.column("raw_bal"), 2),
            }
        ),
        batch_format="pyarrow",
    )


Q_REGION_ACCTBAL_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ----------------------------------------------------- filter + projection

def q_filter_highvalue(sf_dir: str):
    """Vectorized filter + computed projection (no shuffle)."""
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"]
    )

    def fn(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))
        t = t.append_column("revenue", pc_round_ha(rev, 2))
        return t.filter(pc.greater(t.column("revenue"), 90000.0)).select(
            ["l_orderkey", "l_linenumber", "revenue"]
        )

    return li.map_batches(fn, batch_format="pyarrow", batch_size=65536)


Q_FILTER_HIGHVALUE_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
WHERE ROUND(l_extendedprice * (1 - l_discount), 2) > 90000.0
"""


# ------------------------------------------------------------ distinct set

def q_distinct_segments(sf_dir: str):
    """Distinct values of one column (small-cardinality shuffle)."""
    cust = _read(sf_dir, "customer", ["c_mktsegment"])
    from ray.data.aggregate import Count

    return cust.groupby("c_mktsegment", num_partitions=8).aggregate(Count(alias_name="n"))


Q_DISTINCT_SEGMENTS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment
"""


# ----------------------------------------------------- event-time windows

def _events_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df["hour"] = df["ts"].dt.floor("h")
    g = df.groupby(["event_type", "hour"], as_index=False).agg(
        p_n=("event_id", "count"), p_value=("value", "sum")
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def q_events_hourly(sf_dir: str):
    """Tumbling 1h windows per event type (streaming-shaped aggregate).

    Ray Data has no event-time windows (SURVEY.md §2.9); the window is the
    group key: floor(ts, 1h) computed per batch, combiner partials, then a
    grouped merge.
    """
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    from ray.data.aggregate import Sum

    partials = ev.map_batches(_events_partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby(["event_type", "hour"], num_partitions=16).aggregate(
        Sum("p_n", alias_name="n_events"), Sum("p_value", alias_name="raw_value")
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "event_type": t.column("event_type"),
                "hour": t.column("hour"),
                "n_events": t.column("n_events"),
                "sum_value": pc_round_ha(t.column("raw_value"), 4),
            }
        ),
        batch_format="pyarrow",
    )


Q_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


# ----------------------------------------------- hash-partitioned join

def q_join_shuffle(sf_dir: str):
    """Nation-level order stats via Ray's hash-partitioned ``Dataset.join``.

    The both-sides-large path (contrast with the broadcast joins above):
    both datasets are hash-partitioned on the key across ``num_partitions``
    aggregators — this is the join to reach for when neither side fits in
    memory.  Small here, but the plan shape is the scale path.
    """
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(cust, "inner", 8, on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("c_nationkey", as_index=False).agg(
            p_n=("o_orderkey", "count"), p_total=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = joined.map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("c_nationkey", num_partitions=8).aggregate(
            Sum("p_n", alias_name="n_orders"), Sum("p_total", alias_name="raw_total")
        )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "c_nationkey": t.column("c_nationkey"),
                "n_orders": t.column("n_orders"),
                "total_price": pc_round_ha(t.column("raw_total"), 2),
            }
        ),
        batch_format="pyarrow",
    )


Q_JOIN_SHUFFLE_SQL = """
SELECT c_nationkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


# ----------------------------------------------------- sessionization

def _add_user_bucket(t: pa.Table, n_buckets: int = 64) -> pa.Table:
    """hash(user) % B shuffle key: many tiny per-user groups collapse into
    B bucket groups, each merged with ONE vectorized pandas body (the
    many-tiny-groups discipline — same pattern as dedup/canonicalize)."""
    b = pc.bit_wise_and(pc.cast(t.column("user_id"), pa.int64()), n_buckets - 1)
    return t.append_column("_ubucket", b)


def q_events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Per-user session counts (sessions split on >30 min inactivity).

    Streaming-shaped keyed state (SURVEY.md §2.9): partition by a
    hash(user) bucket, order by (user, ts) within the bucket, detect gaps
    with one vectorized grouped-diff per bucket — no per-user UDF calls
    (at millions of users, one ``map_groups`` per user is the straggler).
    """
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev_ts = df.groupby("user_id")["ts"].shift()
        gap = (df["ts"] - prev_ts) > pd.Timedelta(minutes=gap_minutes)
        g = df.assign(_gap=gap).groupby("user_id", as_index=False).agg(
            n_events=("event_id", "count"), _gaps=("_gap", "sum")
        )
        g["n_sessions"] = (1 + g.pop("_gaps")).astype("int64")
        return g[["user_id", "n_events", "n_sessions"]]

    return (
        ev.map_batches(_add_user_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("_ubucket", num_partitions=8)
        .map_groups(sessions_bucket, batch_format="pandas")
    )


Q_EVENTS_SESSIONS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(1 + SUM(CASE WHEN gap > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
GROUP BY user_id
"""


def q_events_cumulative(sf_dir: str):
    """Per-event window functions over (PARTITION BY user ORDER BY ts,
    event_id): running position ``seq`` (ROW_NUMBER), running value sum
    ``cum_value_cents`` (SUM OVER, fixed-point cents so the oracle hash
    is exact — a sequential double cumsum would be bit-fragile), and
    microsecond gap to the previous event ``gap_us`` (LAG).

    Plan shape: same keyed-window discipline as ``q_events_sessions`` —
    bucket by hash(user), ONE vectorized pandas body per bucket (sort +
    grouped cumcount/cumsum/diff); each event row crosses the wire
    exactly once and the per-user sequential semantics hold because a
    user never spans buckets.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def windows_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df.sort_values(["user_id", "ts", "event_id"])
        a = df["value"].to_numpy()
        # half-away-from-zero on value*100, matching DuckDB ROUND(DOUBLE)
        cents = (np.sign(a) * np.floor(np.abs(a) * 100.0 + 0.5)).astype("int64")
        g = df.groupby("user_id")
        seq = g.cumcount().to_numpy() + 1
        cum = df.assign(_c=cents).groupby("user_id")["_c"].cumsum().to_numpy()
        gap = g["ts"].diff().fillna(pd.Timedelta(0))
        gap_us = gap.to_numpy().astype("timedelta64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "seq": seq.astype("int64"),
                "cum_value_cents": cum.astype("int64"),
                "gap_us": gap_us,
            }
        )

    return (
        ev.map_batches(_add_user_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("_ubucket", num_partitions=8)
        .map_groups(windows_bucket, batch_format="pandas")
    )


Q_EVENTS_CUMULATIVE_SQL = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS seq,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS cum_value_cents,
       COALESCE(CAST(DATE_DIFF('microsecond', LAG(ts) OVER w, ts) AS BIGINT), 0)
           AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# -------------------------------------------------------- as-of join

def q_events_asof(sf_dir: str):
    """For each purchase, the most recent strictly-earlier click by the
    same user (as-of join).

    Ray Data has no as-of join; the portable pattern (guide): bucket both
    sides by hash(key) % B, sort by ts within the bucket, ONE
    ``pd.merge_asof(by=key)`` per bucket — not one UDF call per user.
    Ties on (user_id, ts) resolve deterministically to the largest
    click event_id (the oracle SQL pins the same tie-break).
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        right = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        if left.empty or right.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "click_event_id"]
            ).astype({"event_id": "int64", "user_id": "int64", "click_event_id": "int64"})
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["event_id", "user_id", "ts"]].rename(
                columns={"event_id": "click_event_id"}
            ),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        m = m.dropna(subset=["click_event_id"])
        m["click_event_id"] = m["click_event_id"].astype("int64")
        return m[["event_id", "user_id", "click_event_id"]]

    return (
        ev.map_batches(_add_user_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("_ubucket", num_partitions=8)
        .map_groups(per_bucket, batch_format="pandas")
    )


# Deterministic tie-break: among clicks sharing the max strictly-earlier
# ts, take the largest event_id (matches merge_asof, which keeps the last
# row in (ts, event_id) order).
Q_EVENTS_ASOF_SQL = """
SELECT event_id, user_id, click_event_id FROM (
  SELECT a.event_id AS event_id, a.user_id AS user_id,
         (SELECT b.event_id FROM events b
           WHERE b.user_id = a.user_id AND b.event_type = 'click'
             AND b.ts < a.ts
           ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS click_event_id
  FROM events a WHERE a.event_type = 'purchase')
WHERE click_event_id IS NOT NULL
"""


# -------------------------------------------------------- range join

def q_events_range_join(sf_dir: str, window_minutes: int = 15):
    """For each purchase, the count of clicks by the same user within
    ±``window_minutes`` of the purchase timestamp (inclusive) — a RANGE
    join, one of the operators Ray Data lacks natively.

    Portable pattern: bucket both sides by hash(user) % B (ONE shuffle,
    co-locating each user's rows), then per bucket sort clicks by
    (user, ts) and answer every purchase of a user with two vectorized
    ``searchsorted`` probes over that user's click-ts run — per-user
    loop count is users/bucket, the per-row work is all numpy.
    """
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    delta = pd.Timedelta(minutes=window_minutes)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        left = g[g["event_type"] == "purchase"]
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "n_nearby_clicks"]
            ).astype(
                {"event_id": "int64", "user_id": "int64",
                 "n_nearby_clicks": "int64"}
            )
        clicks = g[g["event_type"] == "click"].sort_values(["user_id", "ts"])
        c_users = clicks["user_id"].to_numpy()
        c_ts = clicks["ts"].to_numpy()
        out_counts = np.zeros(len(left), dtype=np.int64)
        left = left.reset_index(drop=True)
        for user, rows in left.groupby("user_id").groups.items():
            s = np.searchsorted(c_users, user, side="left")
            e = np.searchsorted(c_users, user, side="right")
            cts = c_ts[s:e]
            pts = left.loc[rows, "ts"].to_numpy()
            lo = np.searchsorted(cts, pts - delta, side="left")
            hi = np.searchsorted(cts, pts + delta, side="right")
            out_counts[np.asarray(rows)] = hi - lo
        return pd.DataFrame(
            {
                "event_id": left["event_id"].astype("int64"),
                "user_id": left["user_id"].astype("int64"),
                "n_nearby_clicks": out_counts,
            }
        )

    return (
        ev.map_batches(_add_user_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("_ubucket", num_partitions=8)
        .map_groups(per_bucket, batch_format="pandas")
    )


Q_EVENTS_RANGE_JOIN_SQL = """
SELECT a.event_id AS event_id, a.user_id AS user_id,
       COUNT(b.event_id) AS n_nearby_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL 15 MINUTE AND a.ts + INTERVAL 15 MINUTE
GROUP BY a.event_id, a.user_id
"""


# -------------------------------------------------------- global sort

def q_sort_top_events(sf_dir: str, k: int = 100):
    """Top-k events by value via a true distributed ``Dataset.sort``
    (range-partitioned sort shuffle), deterministic tie-break on event_id."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def rounded(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("value"), "value", pc_round_ha(t.column("value"), 4)
        )

    return (
        ev.map_batches(rounded, batch_format="pyarrow", batch_size=65536)
        .sort(["value", "event_id"], descending=[True, False])
        .limit(k)
    )


Q_SORT_TOP_EVENTS_SQL = """
SELECT event_id, event_type, ROUND(value, 4) AS value
FROM events
ORDER BY ROUND(value, 4) DESC, event_id
LIMIT 100
"""


# ------------------------------------------------- broadcast anti-join

def q_customers_without_orders(sf_dir: str, price_threshold: float = 300_000.0):
    """Anti-join: customers with no order above ``price_threshold``.

    Broadcast pattern for semi/anti joins (no shuffle): a Bloom filter of
    the build side's keys prefilters each batch (no false negatives →
    rejected keys are definitely order-less); survivors are verified
    against the exact key set.  At this scale the exact set is broadcast
    whole; at 10^12 rows it would be sharded and only the Bloom filter
    broadcast everywhere.
    """
    from rust_bert_ray.functions.util import BloomFilter

    import numpy as np

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).to_pandas()
    keys = set(orders.loc[orders["o_totalprice"] > price_threshold, "o_custkey"].tolist())
    bloom = BloomFilter(len(keys))
    bloom.add_many(np.fromiter(keys, dtype=np.int64, count=len(keys)))
    state_ref = ray.put((bloom, keys))

    class AntiJoin:
        def __init__(self, ref):
            self.bloom, self.keys = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            ck = df["c_custkey"].to_numpy()
            maybe_has = self.bloom.contains_many(ck)  # vectorized probe
            # bloom-rejected rows are keepers; bloom-accepted need the
            # exact check (false positives would wrongly drop keepers)
            keep = ~maybe_has
            if maybe_has.any():
                cand_idx = np.nonzero(maybe_has)[0]
                confirmed = np.fromiter(
                    (k in self.keys for k in ck[cand_idx]),
                    dtype=bool, count=len(cand_idx),
                )
                keep[cand_idx[~confirmed]] = True
            return pa.Table.from_pandas(df[keep], preserve_index=False)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return cust.map_batches(
        AntiJoin,
        fn_constructor_kwargs={"ref": state_ref},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=2,
    )


Q_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


# ---------------------------------------------------- sliding windows

def q_events_sliding(sf_dir: str):
    """Sliding 1h windows hopping every 30 min, per event type.

    Each event lands in 2 windows (window_start ∈ {floor30(ts),
    floor30(ts) − 30min}); the expansion happens vectorized per batch
    (flat_map-shaped), then the usual combiner → grouped merge.
    """
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        half = df["ts"].dt.floor("30min")
        frames = []
        for off in (0, 30):
            d = df.copy()
            d["window_start"] = half - pd.Timedelta(minutes=off)
            frames.append(d)
        both = pd.concat(frames, ignore_index=True)
        g = both.groupby(["event_type", "window_start"], as_index=False).agg(
            p_n=("event_id", "count"), p_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ev.map_batches(expand, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby(["event_type", "window_start"], num_partitions=16).aggregate(
        Sum("p_n", alias_name="n_events"), Sum("p_value", alias_name="raw_value")
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("window_start"),
                "n_events": t.column("n_events"),
                "sum_value": pc_round_ha(t.column("raw_value"), 4),
            }
        ),
        batch_format="pyarrow",
    )


Q_EVENTS_SLIDING_SQL = """
SELECT event_type,
       time_bucket(INTERVAL 30 MINUTE, ts) - offs.o AS window_start,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events, (SELECT UNNEST([INTERVAL 0 MINUTE, INTERVAL 30 MINUTE]) AS o) offs
GROUP BY event_type, window_start
"""


# --------------------------------------------------- funnel analysis ----

FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Ordered-sequence funnel: users reaching each step, where step k
    requires an event of type ``steps[k]`` STRICTLY after the user's
    earliest completion of step k-1 (the classic product-analytics
    funnel; the "after" rule is a pure ts predicate so both engines
    agree without tie-breaks).

    Plan: hash-bucket users, ONE vectorized pandas pass per bucket
    (sorted merges, no per-user Python), then a tiny grouped sum of the
    per-bucket partial counts — the only shuffle carries (step,
    event_type, count) partials bounded by buckets × steps.
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket",
            pc.cast(
                pc.bit_wise_and(t.column("user_id"), pa.scalar(15, pa.int64())),
                pa.int64(),
            ),
        )

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        cur = (
            df.loc[df["event_type"] == steps[0]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
        )
        counts = [len(cur)]
        for sname in steps[1:]:
            nxt = df.loc[df["event_type"] == sname].merge(
                cur.rename(columns={"ts": "prev"}), on="user_id"
            )
            cur = (
                nxt.loc[nxt["ts"] > nxt["prev"], ["user_id", "ts"]]
                .groupby("user_id", as_index=False)["ts"]
                .min()
            )
            counts.append(len(cur))
        return pd.DataFrame(
            {
                "step": np.arange(1, len(steps) + 1, dtype=np.int64),
                "event_type": list(steps),
                "p_users": np.array(counts, dtype=np.int64),
            }
        )

    agg = (
        ev.map_batches(bucketed, batch_format="pyarrow", batch_size=65536)
        .groupby("_bucket", num_partitions=4)
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["step", "event_type"], num_partitions=4)
        .aggregate(Sum("p_users", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "step": t.column("step"),
                "event_type": t.column("event_type"),
                "n_users": pc.cast(t.column("n_users"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


Q_EVENTS_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, COUNT(*) AS n_users FROM s1
UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
"""


# --------------------------------------------------- cohort retention ----

_DAY_US = 86_400_000_000


def q_events_retention(sf_dir: str):
    """Classic cohort retention: users grouped by first-activity day,
    distinct active users per (cohort_day, day_offset).

    Plan — ONE real exchange, no join: events compress to
    per-batch-distinct (user, day) at the scan (day-floor commutes with
    min), hash-bucket BY USER, then one vectorized pandas pass per
    bucket derives each user's cohort (transform-min), offsets, and the
    bucket's (cohort, offset) distinct-user PARTIAL counts — user
    partitioning makes bucket-local nunique globally exact, so the
    second exchange carries only tiny (cohort, offset, n) partials into
    a grouped sum.  No driver-side materialization of users.
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def to_days(t: pa.Table) -> pa.Table:
        # day-floor upfront + per-batch DISTINCT (user, day): free
        # combiner-style compression — the bucket exchange carries
        # user-days, not raw events.  Bucket = multiplicative hash of
        # user_id (skew-robust under clustered id ranges).
        df = pd.DataFrame(
            {
                "user_id": t.column("user_id").to_numpy(zero_copy_only=False),
                "day_us": pc.cast(t.column("ts"), pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                // _DAY_US
                * _DAY_US,
            }
        ).drop_duplicates()
        u = df["user_id"].to_numpy().astype(np.uint64)
        df["_bucket"] = ((u * np.uint64(2654435761)) >> np.uint64(28)).astype(
            np.int64
        ) % 16
        return pa.Table.from_pandas(df, preserve_index=False)

    us = ev.map_batches(to_days, batch_format="pyarrow", batch_size=65536)

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        d0 = df.groupby("user_id")["day_us"].transform("min").to_numpy()
        sub = pd.DataFrame(
            {
                "cohort_us": d0,
                "day_offset": ((df["day_us"].to_numpy() - d0) // _DAY_US).astype(
                    np.int64
                ),
                "user_id": df["user_id"].to_numpy(),
            }
        ).drop_duplicates()
        g = sub.groupby(["cohort_us", "day_offset"], as_index=False)[
            "user_id"
        ].nunique()
        return pd.DataFrame(
            {
                "cohort_us": g["cohort_us"],
                "day_offset": g["day_offset"],
                "p_n": g["user_id"].astype(np.int64),
            }
        )

    out = (
        us.groupby("_bucket", num_partitions=16)
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_us", "day_offset"], num_partitions=8)
        .aggregate(Sum("p_n", alias_name="n_users"))
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "cohort_day": pc.cast(t.column("cohort_us"), pa.timestamp("us")),
                "day_offset": t.column("day_offset"),
                "n_users": pc.cast(t.column("n_users"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


Q_EVENTS_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS d0
  FROM events GROUP BY user_id
)
SELECT f.d0 AS cohort_day,
       date_diff('day', f.d0, date_trunc('day', e.ts)) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ------------------------------------------- funnel conversion latency ----

def q_events_funnel_latency(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Exact conversion-latency aggregates per funnel transition:
    for users reaching step k, the time from their earliest step k-1
    completion to their earliest qualifying step-k event — n, min, max,
    sum and floor-mean in integer microseconds (exact algebra, so the
    SQL oracle hash-matches without float-order traps)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def bucketed(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "_bucket": pc.cast(
                    pc.bit_wise_and(t.column("user_id"), pa.scalar(15, pa.int64())),
                    pa.int64(),
                ),
            }
        )

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        cur = (
            df.loc[df["event_type"] == steps[0]]
            .groupby("user_id", as_index=False)["ts_us"]
            .min()
        )
        rows = []
        for si, sname in enumerate(steps[1:], start=2):
            nxt = df.loc[df["event_type"] == sname].merge(
                cur.rename(columns={"ts_us": "prev"}), on="user_id"
            )
            cur = (
                nxt.loc[nxt["ts_us"] > nxt["prev"], ["user_id", "ts_us", "prev"]]
                .groupby("user_id", as_index=False)
                .agg(ts_us=("ts_us", "min"), prev=("prev", "first"))
            )
            lat = cur["ts_us"].to_numpy() - cur["prev"].to_numpy()
            if len(lat):
                rows.append(
                    (si, sname, len(lat), int(lat.min()), int(lat.max()), int(lat.sum()))
                )
            cur = cur[["user_id", "ts_us"]]
        if not rows:
            return pd.DataFrame(
                {
                    "step": pd.Series([], dtype=np.int64),
                    "event_type": pd.Series([], dtype=object),
                    "p_n": pd.Series([], dtype=np.int64),
                    "p_min": pd.Series([], dtype=np.int64),
                    "p_max": pd.Series([], dtype=np.int64),
                    "p_sum": pd.Series([], dtype=np.int64),
                }
            )
        step, et, n, lo, hi, tot = zip(*rows)
        return pd.DataFrame(
            {
                "step": np.array(step, dtype=np.int64),
                "event_type": list(et),
                "p_n": np.array(n, dtype=np.int64),
                "p_min": np.array(lo, dtype=np.int64),
                "p_max": np.array(hi, dtype=np.int64),
                "p_sum": np.array(tot, dtype=np.int64),
            }
        )

    agg = (
        ev.map_batches(bucketed, batch_format="pyarrow", batch_size=65536)
        .groupby("_bucket", num_partitions=4)
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["step", "event_type"], num_partitions=4)
        .aggregate(
            Sum("p_n", alias_name="n_users"),
            Min("p_min", alias_name="min_us"),
            Max("p_max", alias_name="max_us"),
            Sum("p_sum", alias_name="sum_us"),
        )
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "step": t.column("step"),
                "event_type": t.column("event_type"),
                "n_users": pc.cast(t.column("n_users"), pa.int64()),
                "min_us": pc.cast(t.column("min_us"), pa.int64()),
                "max_us": pc.cast(t.column("max_us"), pa.int64()),
                "sum_us": pc.cast(t.column("sum_us"), pa.int64()),
                "mean_us": pc.cast(
                    pc.divide(t.column("sum_us"), t.column("n_users")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


Q_EVENTS_FUNNEL_LATENCY_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t, ANY_VALUE(s1.t) AS prev
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t, ANY_VALUE(s2.t) AS prev
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
),
lat AS (
  SELECT 2 AS step, 'click' AS event_type,
         epoch_us(t) - epoch_us(prev) AS us FROM s2
  UNION ALL
  SELECT 3, 'purchase', epoch_us(t) - epoch_us(prev) FROM s3
)
SELECT CAST(step AS BIGINT) AS step, event_type,
       COUNT(*) AS n_users,
       MIN(us) AS min_us, MAX(us) AS max_us,
       CAST(SUM(us) AS BIGINT) AS sum_us,
       CAST(SUM(us) // COUNT(*) AS BIGINT) AS mean_us
FROM lat GROUP BY 1, 2
"""


# ------------------------------------------------- rate anomaly flags ----

def q_events_anomaly(sf_dir: str, window: int = 3, factor: int = 2):
    """Per-type hourly rate anomalies against a trailing window — with
    ALL-INTEGER algebra (``n·n_trail > factor·trail_sum`` instead of a
    float z-score) so the SQL window-function oracle hash-matches.

    The trailing window is the previous up-to-``window`` OBSERVED hours
    (ROWS semantics, identical on both engines).  Plan: hourly counts
    via combiner + grouped sum (the hours × types table is bounded by
    the time range, not the event volume), then one vectorized pandas
    pass per event type.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "hour"], as_index=False).size()
        g["p_n"] = g["size"].astype("int64")
        return pa.Table.from_pandas(g[["event_type", "hour", "p_n"]], preserve_index=False)

    hourly = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour"], num_partitions=4)
        .aggregate(Sum("p_n", alias_name="n_events"))
    )

    def flag(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("hour").reset_index(drop=True)
        n = df["n_events"].to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(n)])
        i = np.arange(len(n))
        lo = np.maximum(i - window, 0)
        trail_sum = cum[i] - cum[lo]
        n_trail = (i - lo).astype(np.int64)
        anomaly = (n_trail > 0) & (n * n_trail > factor * trail_sum)
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "hour": df["hour"],
                "n_events": n,
                "trail_sum": trail_sum.astype(np.int64),
                "n_trail": n_trail,
                "anomaly": anomaly.astype(np.int64),
            }
        )

    return hourly.groupby("event_type", num_partitions=4).map_groups(
        flag, batch_format="pandas"
    )


Q_EVENTS_ANOMALY_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n_events,
       CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS trail_sum,
       CAST(COUNT(n_events) OVER w AS BIGINT) AS n_trail,
       CAST(COUNT(n_events) OVER w > 0
            AND n_events * COUNT(n_events) OVER w
                > 2 * COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS anomaly
FROM h
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
"""


# ------------------------------------------------ brand revenue share ----

def q_brand_revenue_share(sf_dir: str):
    """Revenue share per part brand (TPC-H Q14-flavored lineitem ⨝ part).

    Plan: the part table is the broadcast side (``ray.put`` once, probed
    per lineitem batch — no shuffle join); per-batch combiner emits one
    (brand, n, rev) partial per brand; a brand-bounded grouped sum
    finishes.  The share denominator is an exact INTEGER-CENTS sum over
    the rounded per-brand revenues (order-free on both engines), so
    each share is one IEEE divide of exact ints — no float-summation-
    order trap in the window aggregate.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_map = dict(zip(part["p_partkey"], part["p_brand"]))
    brand_ref = ray.put(brand_map)

    class BrandJoin:
        def __init__(self, ref):
            self.brand = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["p_brand"] = df["l_partkey"].map(self.brand)
            df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
            g = df.groupby("p_brand", as_index=False).agg(
                p_n=("l_orderkey", "count"), p_rev=("rev", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"]
    )
    agg = (
        li.map_batches(
            BrandJoin,
            fn_constructor_kwargs={"ref": brand_ref},
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=2,
        )
        .groupby("p_brand", num_partitions=4)
        .aggregate(Sum("p_n", alias_name="n_items"), Sum("p_rev", alias_name="raw_rev"))
        .to_pandas()  # brand-bounded (tens of rows): the share needs the total
    )
    cents = round_ha(agg["raw_rev"].to_numpy() * 100.0, 0).astype(np.int64)
    total = int(cents.sum())
    return pd.DataFrame(
        {
            "p_brand": agg["p_brand"],
            "n_items": agg["n_items"].astype(np.int64),
            "revenue": cents.astype(np.float64) / 100.0,
            "share": round_ha(cents.astype(np.float64) / total, 6),
        }
    )


Q_BRAND_REVENUE_SHARE_SQL = """
WITH b AS (
  SELECT p.p_brand,
         COUNT(*) AS n_items,
         CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100, 0)
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT p_brand,
       CAST(n_items AS BIGINT) AS n_items,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       ROUND(CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER () AS BIGINT), 6) AS share
FROM b
"""


# --------------------------------------------- Q3 shipping priority ----

def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
    broadcast_limit: int = 5_000_000,
):
    """TPC-H Q3-ish: top-k unshipped-revenue orders for one segment.

    Plan shape: the segment's customer keys follow the ADAPTIVE
    broadcast-vs-join rule (Q5 / dedup_exact's pattern, row-count
    guard from parquet METADATA only) — below ``broadcast_limit``
    customer rows they ship once via ``ray.put`` as a semi-join filter
    inside the orders scan; above it, orders ``left_semi``-join the
    filtered key stream on the customer key (the payload is keys, not
    customer rows).  Either way lineitem pre-aggregates per-order
    revenue partials inside the batch (combiner) so the
    hash-partitioned ``Dataset.join`` on the order key exchanges one
    partial row per (order, batch), not raw lineitems; grouped merge +
    streaming top-k finish.  Dates flow as strings in the output
    (date32-vs-DATE dtype parity)."""
    import numpy as np
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    cut = pd.Timestamp(cutoff)
    customer_rows = pads.dataset(
        os.path.join(sf_dir, "customer.parquet")
    ).count_rows()

    if customer_rows <= broadcast_limit:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
        keys = set(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].tolist())
        keys_ref = ray.put(keys)

        class OrderFilter:
            def __init__(self, ref):
                self.keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

            def __call__(self, t: pa.Table) -> pa.Table:
                df = t.to_pandas()
                m = df["o_custkey"].isin(self.keys) & (df["o_orderdate"] < cut)
                out = df.loc[
                    m, ["o_orderkey", "o_orderdate", "o_orderpriority"]
                ].copy()
                out["o_orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
                return pa.Table.from_pandas(out, preserve_index=False)

        orders_f = _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(
            OrderFilter(keys_ref),
            batch_format="pyarrow",
            batch_size=4096,  # feeds Dataset.join: declare a batch_size
        )
    else:
        # join plan: the customer table never touches the driver
        seg_keys = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
            lambda t: t.filter(
                pc.equal(t.column("c_mktsegment"), pa.scalar(segment))
            ).select(["c_custkey"]),
            batch_format="pyarrow",
            batch_size=4096,
        )

        def order_project(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = df.loc[
                df["o_orderdate"] < cut,
                ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            ].copy()
            out["o_orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
            return pa.Table.from_pandas(out, preserve_index=False)

        orders_f = (
            _read(
                sf_dir,
                "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            )
            .map_batches(order_project, batch_format="pyarrow", batch_size=4096)
            .join(
                seg_keys,
                "left_semi",
                num_partitions=8,
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
            .map_batches(
                lambda t: t.select(
                    ["o_orderkey", "o_orderdate", "o_orderpriority"]
                ),
                batch_format="pyarrow",
                batch_size=4096,
            )
        )

    def li_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.loc[df["l_shipdate"] > cut]
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("l_orderkey", as_index=False).agg(p_rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    li_f = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=4096)

    joined = li_f.join(orders_f, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",))
    agg = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"], num_partitions=8
    ).aggregate(Sum("p_rev", alias_name="raw_rev"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "l_orderkey": t.column("l_orderkey"),
                "revenue": pc_round_ha(t.column("raw_rev"), 2),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    from rust_bert_ray.functions.util import topk

    return topk(
        agg.map_batches(finalize, batch_format="pyarrow"),
        ["revenue", "o_orderdate", "l_orderkey"],
        [True, False, False],
        k,
    )


def q5_local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    broadcast_limit: int = 5_000_000,
):
    """TPC-H Q5-ish: revenue by supplier nation within one region/year,
    counting only lineitems whose supplier and customer share a nation.

    Plan shape for the 100-TB regime (six tables, ONE wide exchange
    chain): region, nation and supplier are broadcast dims — the
    suppkey→nationkey map and nationkey→name map ship once via
    ``ray.put`` and are read inside batches.  Customer and the
    date-pruned orders follow the ADAPTIVE broadcast-vs-join rule
    (dedup_exact's pattern): below ``broadcast_limit`` source rows the
    key→nation map ships once via ``ray.put`` and the join disappears
    into the map stage; above it, orders hash-joins customer on the
    CUSTOMER key and lineitem partials hash-join that on the ORDER key
    — two single-key exchanges whose payloads are (key, small-int)
    rows, never raw fact rows.  Either way the same-nation predicate
    and the supplier lookup run map-side, and per-batch combiner
    partials feed a ≤25-row final groupby.  (Row-count guards read
    parquet METADATA only — no scan is spent deciding the plan.)"""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"].tolist())
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nation_names = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nation_names)]
    supp_nation_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype("int64"), supp["s_nationkey"].astype("int64")))
    )
    region_nation_keys = set(nation_names)

    customer_rows = pads.dataset(os.path.join(sf_dir, "customer.parquet")).count_rows()
    orders_rows = pads.dataset(os.path.join(sf_dir, "orders.parquet")).count_rows()

    if customer_rows <= broadcast_limit and orders_rows <= broadcast_limit:
        # ---- broadcast plan: one map-only Ray pass over lineitem ----
        import pyarrow.parquet as pq_

        cust_t = pq_.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        ).to_pandas()
        cust_t = cust_t[cust_t["c_nationkey"].isin(region_nation_keys)]
        cust_nat = dict(
            zip(cust_t["c_custkey"].astype("int64"), cust_t["c_nationkey"].astype("int64"))
        )
        ord_t = pq_.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).to_pandas()
        ord_t = ord_t[(ord_t["o_orderdate"] >= t_from) & (ord_t["o_orderdate"] < t_to)]
        c_nat = ord_t["o_custkey"].map(cust_nat)
        ord_t = ord_t.loc[c_nat.notna()]
        ord_nat_map = dict(
            zip(ord_t["o_orderkey"].astype("int64"), c_nat.dropna().astype("int64"))
        )
        ord_nat_ref = ray.put(ord_nat_map)

        class BroadcastPartial:
            def __init__(self, supp_ref, ord_ref):
                self.supp_nation = (
                    ray.get(supp_ref) if isinstance(supp_ref, ray.ObjectRef) else supp_ref
                )
                self.ord_nat = (
                    ray.get(ord_ref) if isinstance(ord_ref, ray.ObjectRef) else ord_ref
                )

            def __call__(self, t: pa.Table) -> pa.Table:
                df = t.to_pandas()
                c_nat = df["l_orderkey"].map(self.ord_nat)
                s_nat = df["l_suppkey"].map(self.supp_nation)
                keep = c_nat.notna() & (c_nat.values == s_nat.values)
                df = df.loc[keep]
                rev = df["l_extendedprice"].to_numpy() * (
                    1.0 - df["l_discount"].to_numpy()
                )
                g = (
                    pd.DataFrame({"nationkey": c_nat.loc[keep].astype("int64"), "rev": rev})
                    .groupby("nationkey", as_index=False)["rev"]
                    .sum()
                )
                return pa.Table.from_pydict(
                    {
                        "nationkey": pa.array(g["nationkey"], type=pa.int64()),
                        "p_rev": pa.array(g["rev"], type=pa.float64()),
                    }
                )

        partials = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            BroadcastPartial(supp_nation_ref, ord_nat_ref),
            batch_format="pyarrow",
            batch_size=65536,
        )
    else:
        # ---- join plan: two single-key exchanges over (key, int) rows ----
        def cust_project(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["c_nationkey"].isin(region_nation_keys)]
            return pa.Table.from_pydict(
                {
                    "c_custkey": pa.array(df["c_custkey"], type=pa.int64()),
                    "c_nationkey": pa.array(df["c_nationkey"], type=pa.int64()),
                }
            )

        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            cust_project, batch_format="pyarrow", batch_size=4096
        )

        def orders_project(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            m = (df["o_orderdate"] >= t_from) & (df["o_orderdate"] < t_to)
            df = df.loc[m]
            return pa.Table.from_pydict(
                {
                    "o_orderkey": pa.array(df["o_orderkey"], type=pa.int64()),
                    "o_custkey": pa.array(df["o_custkey"], type=pa.int64()),
                }
            )

        orders = _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
        ).map_batches(orders_project, batch_format="pyarrow", batch_size=4096)

        # exchange 1: order → customer nation (hash join on the customer key)
        ord_nat = orders.join(
            cust, "inner", 8, on=("o_custkey",), right_on=("c_custkey",)
        ).select_columns(["o_orderkey", "c_nationkey"])

        def li_project(t: pa.Table) -> pa.Table:
            rev = pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
            return pa.Table.from_pydict(
                {
                    "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                    "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
                    "rev": rev,
                }
            )

        li = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(li_project, batch_format="pyarrow", batch_size=4096)

        # exchange 2: lineitem partials → order's customer nation
        joined = li.join(
            ord_nat, "inner", 8, on=("l_orderkey",), right_on=("o_orderkey",)
        )

        class SameNationPartial:
            """Map-side supplier lookup + same-nation filter + combiner."""

            def __init__(self, ref):
                self.supp_nation = (
                    ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
                )

            def __call__(self, t: pa.Table) -> pa.Table:
                df = t.to_pandas()
                s_nat = df["l_suppkey"].map(self.supp_nation)
                df = df.loc[s_nat.values == df["c_nationkey"].values]
                g = df.groupby("c_nationkey", as_index=False).agg(p_rev=("rev", "sum"))
                return pa.Table.from_pydict(
                    {
                        "nationkey": pa.array(g["c_nationkey"], type=pa.int64()),
                        "p_rev": pa.array(g["p_rev"], type=pa.float64()),
                    }
                )

        partials = joined.map_batches(
            SameNationPartial(supp_nation_ref), batch_format="pyarrow", batch_size=65536
        )
    agg = partials.groupby("nationkey", num_partitions=4).aggregate(
        Sum("p_rev", alias_name="raw_rev")
    )

    def finalize(t: pa.Table) -> pa.Table:
        names = [nation_names[k] for k in t.column("nationkey").to_pylist()]
        return pa.Table.from_pydict(
            {
                "n_name": pa.array(names, type=pa.string()),
                "revenue": pc_round_ha(t.column("raw_rev"), 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "revenue", descending=True
    )


Q5_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


Q3_SHIPPING_PRIORITY_SQL = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-06-01'
  AND l.l_shipdate > DATE '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

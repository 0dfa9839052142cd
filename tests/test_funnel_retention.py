"""Funnel + cohort-retention semantics on a hand-built events table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rust_bert_ray.functions import relational


def _write_events(tmp_path, rows):
    ts, uid, etype = zip(*rows)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(pd.to_datetime(list(ts)), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "events.parquet")
    return str(sf), t


ROWS = [
    # user 1 completes the whole funnel in order
    ("2024-01-01 10:00", 1, "view"),
    ("2024-01-01 11:00", 1, "click"),
    ("2024-01-02 09:00", 1, "purchase"),
    # user 2: click BEFORE the first view — stops at step 1
    ("2024-01-01 08:00", 2, "click"),
    ("2024-01-01 09:00", 2, "view"),
    ("2024-01-01 09:30", 2, "error"),
    # user 3: view then purchase but never clicks — stops at step 1
    ("2024-01-03 10:00", 3, "view"),
    ("2024-01-03 11:00", 3, "purchase"),
    # user 4: never views — counted nowhere
    ("2024-01-01 12:00", 4, "click"),
    ("2024-01-04 12:00", 4, "purchase"),
    # user 5: full funnel, with a later second view (ignored: earliest wins)
    ("2024-01-02 10:00", 5, "view"),
    ("2024-01-02 10:05", 5, "click"),
    ("2024-01-02 10:10", 5, "purchase"),
    ("2024-01-03 10:00", 5, "view"),
]


def test_funnel_hand_counts(ray_session, tmp_path):
    sf, _ = _write_events(tmp_path, ROWS)
    out = (
        relational.q_events_funnel(sf)
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert out.step.tolist() == [1, 2, 3]
    assert out.event_type.tolist() == ["view", "click", "purchase"]
    # views: users 1,2,3,5; clicks after view: 1,5; purchases after: 1,5
    assert out.n_users.tolist() == [4, 2, 2]


def test_funnel_matches_duckdb(ray_session, tmp_path):
    sf, t = _write_events(tmp_path, ROWS)
    got = (
        relational.q_events_funnel(sf)
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = (
        con.execute(relational.Q_EVENTS_FUNNEL_SQL)
        .df()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_retention_hand_counts(ray_session, tmp_path):
    sf, t = _write_events(tmp_path, ROWS)
    out = relational.q_events_retention(sf).to_pandas()
    got = {
        (r.cohort_day.strftime("%Y-%m-%d"), int(r.day_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    # Jan-1 cohort = users 1,2,4; day0 all 3 active; day1: users 1 (purchase)
    # -> 1; day3: user 4 -> 1.  Jan-2 cohort = user 5 (day0, day1).
    # Jan-3 cohort = user 3 (day0).
    assert got == {
        ("2024-01-01", 0): 3,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
        ("2024-01-03", 0): 1,
    }


def test_retention_matches_duckdb(ray_session, tmp_path):
    sf, t = _write_events(tmp_path, ROWS)
    cols = ["cohort_day", "day_offset", "n_users"]
    got = (
        relational.q_events_retention(sf)
        .to_pandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = (
        con.execute(relational.Q_EVENTS_RETENTION_SQL)
        .df()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert got.shape == want.shape
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_funnel_latency_hand_values(ray_session, tmp_path):
    sf, t = _write_events(tmp_path, ROWS)
    out = (
        relational.q_events_funnel_latency(sf)
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    # step 2 (click after first view): u1 3600s, u5 300s
    # step 3 (purchase after qualifying click): u1 79200s, u5 300s
    assert out.step.tolist() == [2, 3]
    assert out.n_users.tolist() == [2, 2]
    assert out[out.step == 2].min_us.iloc[0] == 300 * 1_000_000
    assert out[out.step == 2].max_us.iloc[0] == 3600 * 1_000_000
    assert out[out.step == 3].max_us.iloc[0] == 79200 * 1_000_000
    s2 = out[out.step == 2].iloc[0]
    assert s2.sum_us == (3600 + 300) * 1_000_000
    assert s2.mean_us == s2.sum_us // s2.n_users


def test_funnel_latency_matches_duckdb(ray_session, tmp_path):
    sf, t = _write_events(tmp_path, ROWS)
    cols = ["step", "event_type", "n_users", "min_us", "max_us", "sum_us", "mean_us"]
    got = (
        relational.q_events_funnel_latency(sf)
        .to_pandas()[cols]
        .sort_values("step")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = (
        con.execute(relational.Q_EVENTS_FUNNEL_LATENCY_SQL)
        .df()[cols]
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_top_docs_per_source_ties(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rust_bert_ray.functions import quality

    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 2, 3, 4, 6], pa.int64()),
            "source": ["a", "a", "a", "a", "b", "b"],
            "n_chars": pa.array([10, 10, 10, 7, 3, 3], pa.int64()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "documents.parquet")
    out = (
        quality.q_top_docs_per_source(str(sf), k=3)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    # ties on n_chars break by doc_id asc: a -> 1,2,5 ; b -> 4,6
    assert out[out.source == "a"].doc_id.tolist() == [1, 2, 5]
    assert out[out.source == "b"].doc_id.tolist() == [4, 6]
    assert out.loc[out.source == "b", "rank"].tolist() == [1, 2]


def test_events_anomaly_hand_case(ray_session, tmp_path):
    # one event type, hourly counts 2,2,2,20,2: hour 3 is anomalous
    # (20*3 > 2*(2+2+2)); hour 4 is not (2*3 < 2*(2+2+20)).
    rows = []
    counts = [2, 2, 2, 20, 2]
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((f"2024-01-01 {h:02d}:{i:02d}", 1, "view"))
    sf, t = _write_events(tmp_path, rows)
    out = (
        relational.q_events_anomaly(sf)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert out.n_events.tolist() == counts
    assert out.anomaly.tolist() == [0, 0, 0, 1, 0]
    assert out.trail_sum.tolist() == [0, 2, 4, 6, 24]
    assert out.n_trail.tolist() == [0, 1, 2, 3, 3]
    # cross-check the full frame against DuckDB's window-function oracle
    con = duckdb.connect()
    con.register("events", t)
    cols = ["event_type", "hour", "n_events", "trail_sum", "n_trail", "anomaly"]
    want = (
        con.execute(relational.Q_EVENTS_ANOMALY_SQL)
        .df()[cols]
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert out[cols].equals(want.astype(out[cols].dtypes.to_dict()))


def test_brand_revenue_share_sums_to_one(ray_session):
    out = relational.q_brand_revenue_share("/root/testdata/sf0.001")
    assert len(out) > 1
    # shares are positive and the unrounded-cents construction sums to ~1
    assert (out["share"] > 0).all()
    assert abs(out["share"].sum() - 1.0) < 1e-4
    # revenue is exact cents
    cents = out["revenue"] * 100
    assert (abs(cents - cents.round()) < 1e-3).all()  # fp repr at ~1e9 cents


def test_q3_shipping_priority_semantics(ray_session):
    out = relational.q3_shipping_priority("/root/testdata/sf0.001").to_pandas()
    assert 0 < len(out) <= 10
    assert (out["revenue"] > 0).all()
    # every order predates the cutoff; revenue sorted desc
    assert (out["o_orderdate"] < "1998-06-01").all()
    assert out["revenue"].tolist() == sorted(out["revenue"], reverse=True)


def test_q5_broadcast_and_join_plans_agree(ray_session):
    """Adaptive Q5: the broadcast plan (default at test scale) and the
    forced two-join plan (broadcast_limit=0) produce identical rows."""
    sf = "/root/testdata/sf0.001"
    a = (
        relational.q5_local_supplier_volume(sf)
        .to_pandas()
        .sort_values("n_name", ignore_index=True)
    )
    b = (
        relational.q5_local_supplier_volume(sf, broadcast_limit=0)
        .to_pandas()
        .sort_values("n_name", ignore_index=True)
    )
    assert list(a.columns) == ["n_name", "revenue"]
    assert a.equals(b[a.columns])
    assert (a["revenue"] > 0).all()


def test_q3_broadcast_and_join_plans_agree(ray_session):
    """Adaptive Q3: the broadcast plan (default at test scale) and the
    forced semi-join plan (broadcast_limit=0, customer never touches
    the driver) produce identical rows."""
    sf = "/root/testdata/sf0.001"
    cols = ["revenue", "o_orderdate", "l_orderkey"]
    a = (
        relational.q3_shipping_priority(sf)
        .to_pandas()
        .sort_values(cols, ignore_index=True)
    )
    b = (
        relational.q3_shipping_priority(sf, broadcast_limit=0)
        .to_pandas()
        .sort_values(cols, ignore_index=True)
    )
    assert a.equals(b[a.columns])
    assert len(a) > 0 and (a["revenue"] > 0).all()

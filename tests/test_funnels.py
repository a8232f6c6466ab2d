"""Funnel + retention: pure-pandas transcriptions and ordering semantics."""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE
from pyspark.sql import functions as F

from ed_twitter_spark.operators import funnels as fn


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()


def test_funnel_matches_pandas(spark, events):
    got = fn.event_funnel(spark, SF_SMOKE).collect()[0]
    ev = events.assign(us=events.ts.astype("int64"))  # ns since epoch
    ev["us"] //= 1000
    v = ev[ev.event_type == "view"].groupby("user_id").us.min()
    n_click = n_purchase = 0
    for u, t1 in v.items():
        clicks = ev[(ev.event_type == "click") & (ev.user_id == u) & (ev.us > t1)]
        if clicks.empty:
            continue
        n_click += 1
        t2 = clicks.us.min()
        buys = ev[(ev.event_type == "purchase") & (ev.user_id == u) & (ev.us > t2)]
        if buys.empty:
            continue
        if buys.us.min() - t1 <= fn.FUNNEL_WINDOW_US:
            n_purchase += 1
    assert (got.n_view, got.n_click, got.n_purchase) == (len(v), n_click, n_purchase)
    assert got.rate_click == round(n_click / len(v), 6)
    assert got.rate_purchase == round(n_purchase / n_click, 6)


def test_funnel_order_matters(spark, tmp_path):
    # a purchase BEFORE the first view must not count, nor one past the window
    rows = [
        (0, "2024-01-01 00:00:00", 1, "purchase", 0.0, "{}"),  # too early
        (1, "2024-01-02 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-03 00:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-04 00:00:00", 1, "purchase", 0.0, "{}"),  # counts
        (4, "2024-01-01 00:00:00", 2, "view", 0.0, "{}"),
        (5, "2024-01-02 00:00:00", 2, "click", 0.0, "{}"),
        (6, "2024-02-01 00:00:00", 2, "purchase", 0.0, "{}"),  # past window
        (7, "2024-01-05 00:00:00", 3, "click", 0.0, "{}"),  # no view: not in funnel
    ]
    p = str(tmp_path / "ev")
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(f"{p}/events.parquet")
    got = fn.event_funnel(spark, p).collect()[0]
    assert (got.n_view, got.n_click, got.n_purchase) == (2, 2, 1)


def test_retention_matches_pandas(spark, events):
    got = fn.event_retention(spark, SF_SMOKE).toPandas()
    ev = events.assign(wk=events.ts.dt.to_period("W-SUN").dt.start_time.dt.date)
    pairs = ev[["user_id", "wk"]].drop_duplicates()
    cohort = pairs.groupby("user_id").wk.min()
    rows = {}
    for r in pairs.itertuples():
        off = (r.wk - cohort[r.user_id]).days // 7
        key = (str(cohort[r.user_id]), off)
        rows[key] = rows.get(key, 0) + 1
    assert {
        (r.cohort_week, r.week_offset): r.n_users for r in got.itertuples()
    } == rows


def test_anomaly_matches_pandas(spark, events):
    """Trailing-window z-score transcribed in pandas from exact integer
    sums, including the ≥3-day history gate and the 3σ flag."""
    import math

    got = {
        (r["event_type"], r["day"]): (
            r["n"], r["trail_mean"], r["trail_std"], r["is_anomaly"]
        )
        for r in fn.event_anomaly(spark, SF_SMOKE).collect()
    }
    daily = (
        events.assign(day=events.ts.dt.strftime("%Y-%m-%d"))
        .groupby(["event_type", "day"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    want = {}
    for et, grp in daily.groupby("event_type"):
        ns = grp["n"].tolist()
        days = grp["day"].tolist()
        for i in range(len(ns)):
            w = ns[max(0, i - fn.ANOM_TRAIL_DAYS) : i]
            if len(w) < fn.ANOM_MIN_WINDOW:
                continue
            s1, s2, k = sum(w), sum(x * x for x in w), len(w)
            mean = s1 / k
            std = math.sqrt(max((s2 - s1 * s1 / k) / k, 0.0))
            want[(et, days[i])] = (
                ns[i],
                round(mean, 6),
                round(std, 6),
                ns[i] > mean + fn.ANOM_SIGMA * std,
            )
    assert got == want


def test_anomaly_flags_injected_spike(spark, tmp_path):
    """A 10× single-day spike after a flat week must flag, the flat days
    must not."""
    import datetime as dt

    rows = []
    for d in range(10):
        n = 100 if d == 9 else 10
        for i in range(n):
            rows.append(
                ("e%d_%d" % (d, i), dt.datetime(2024, 3, 1 + d, 12, 0, 0),
                 i, "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id string, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["day"]: r["is_anomaly"] for r in fn.event_anomaly(
        spark, str(tmp_path)
    ).collect()}
    assert got["2024-03-10"] is True
    assert all(v is False for d, v in got.items() if d != "2024-03-10")

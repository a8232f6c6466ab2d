"""As-of join: value parity with pandas merge_asof + the single-Exchange
scale property of the union merge-sort formulation."""

from __future__ import annotations

import pandas as pd
from conftest import SF_SMOKE

from ed_twitter_spark.operators.asof import asof_view_purchase


def test_asof_matches_pandas_merge_asof(spark):
    got = (
        asof_view_purchase(spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    # merge_asof with an (ts, event_id) composite order: encode the order as
    # a single sortable int — µs timestamps here are collision-free per user,
    # and ties between a view and a purchase resolve by event_id, matching
    # the operator's (ts, event_id) window order.
    left = (
        ev[ev.event_type == "purchase"][["event_id", "user_id", "ts_us"]]
        .sort_values(["ts_us", "event_id"])
        .reset_index(drop=True)
    )
    right = (
        ev[ev.event_type == "view"][["event_id", "user_id", "ts_us"]]
        .rename(columns={"event_id": "view_event_id", "ts_us": "view_ts_us"})
        .sort_values(["view_ts_us", "view_event_id"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left,
        right,
        left_on="ts_us",
        right_on="view_ts_us",
        by="user_id",
        direction="backward",
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(want)
    got_nn = got.dropna(subset=["view_event_id"])
    want_nn = want.dropna(subset=["view_event_id"])
    assert len(got_nn) == len(want_nn)
    merged = got_nn.merge(want_nn, on="event_id", suffixes=("_g", "_w"))
    assert (merged["view_event_id_g"] == merged["view_event_id_w"]).all()
    assert (
        (got_nn["ts_us"] - got_nn["view_ts_us"]) == got_nn["gap_us"]
    ).all()
    assert (got_nn["gap_us"] >= 0).all()


def test_asof_single_exchange(spark):
    """The union merge-sort plan shuffles exactly once (on user_id) — no
    range join, no BroadcastNestedLoopJoin."""
    import re

    from test_plans import plan_of

    plan = plan_of(asof_view_purchase(spark, SF_SMOKE))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    # the event_type filters reach the parquet scan
    assert "EqualTo(event_type,purchase)" in plan


def test_asof_tie_semantics_by_hand(spark):
    """Same-timestamp rows resolve by event_id order: a right row with the
    left row's exact ts matches only if its event_id sorts first."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ed_twitter_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (event_id, user_id, ts) — user 1: view@t0 id=1, purchase@t0 id=2
        # → view matches (1 < 2). user 2: purchase@t0 id=3, view@t0 id=4
        # → view does NOT match (4 > 3); no earlier view → null.
        (1, 1, t0), (2, 1, t0), (3, 2, t0), (4, 2, t0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    left = ev.where("event_id IN (2, 3)")
    right = (
        ev.where("event_id IN (1, 4)")
        .withColumnRenamed("event_id", "view_event_id")
        .withColumn("event_id", F.col("view_event_id"))
        .select("event_id", "user_id", "ts", "view_event_id")
    )
    out = asof_join(
        left, right, key="user_id", order=["ts", "event_id"], carry=["view_event_id"]
    ).collect()
    got = {r["event_id"]: r["view_event_id"] for r in out}
    assert got == {2: 1, 3: None}

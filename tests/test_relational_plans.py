"""Relational operator semantics + physical-plan quality assertions.

The plan tests are the 100 TB insurance: filters reach the parquet scan,
projections prune, small sides broadcast, prediction stays codegen'd, and
Python appears only where designed.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark import IForest
from spark_iforest_spark.operators import relational
from spark_iforest_spark.plans import (
    assert_broadcast_join,
    assert_read_schema_only,
    formatted_plan,
    python_eval_nodes,
)


def ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions separated by 2h
        (0, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
        (1, ts("2024-01-01 10:10:00"), 1, "click", 2.0, "{}"),
        (2, ts("2024-01-01 12:30:00"), 1, "view", 3.0, "{}"),
        # user 2: one session
        (3, ts("2024-01-01 09:00:00"), 2, "click", 10.0, "{}"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_sessionize_semantics(events):
    out = {(r["user_id"], r["session_seq"]): r for r in relational.sessionize(events).collect()}
    assert len(out) == 3
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["n_events"] == 1
    assert out[(1, 1)]["sum_value"] == pytest.approx(3.0)


def test_windowed_agg_semantics(events):
    out = relational.windowed_event_agg(events).collect()
    # 10:00 window has 2 clicks for user1
    win10 = [r for r in out if r["window_start"] == int(ts("2024-01-01 10:00:00")
             .replace(tzinfo=datetime.timezone.utc).timestamp())]
    assert any(r["n_events"] == 2 and r["event_type"] == "click" for r in win10)


def test_threshold_semantics(events):
    out = relational.value_threshold_anomalies(events, quantile=0.5).collect()
    # values 1,2,3,10; median 2.5; anomalies: 3, 10
    assert sorted(r["value"] for r in out) == [3.0, 10.0]


def test_pricing_summary_plan_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = relational.pricing_summary(li)
    plan = formatted_plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThan(l_shipdate" in plan
    # column pruning: only the needed columns are read
    assert_read_schema_only(
        q,
        {
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        },
    )
    assert python_eval_nodes(q) == []  # pure JVM plan


def test_top_revenue_broadcasts_customer(spark, sf_dir):
    q = relational.top_revenue_orders(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
    )
    assert_broadcast_join(q)
    rows = q.collect()
    assert len(rows) == 10
    assert rows[0]["revenue"] >= rows[-1]["revenue"]


def test_iforest_transform_plan(spark):
    # scoring plan: exactly one Python node (the Arrow scorer); the
    # prediction predicate must stay JVM-side
    df = spark.createDataFrame([([float(i)],) for i in range(32)], "features array<double>")
    model = IForest(numTrees=5, maxDepth=4, seed=1).fit(df)
    out = model.transform(df)
    nodes = python_eval_nodes(out)
    assert nodes == ["ArrowEvalPython"], nodes
    plan = formatted_plan(out)
    assert "CASE WHEN" in plan or "casewhen" in plan.lower()


def test_iforest_fit_scan_prunes_to_features(spark):
    # fit must select only the features column before shipping to Python
    df = spark.createDataFrame(
        [([float(i)], "junk" * 100, i) for i in range(64)],
        "features array<double>, payload string, n long",
    )
    model = IForest(numTrees=3, maxSamples=16.0, maxDepth=4, seed=2).fit(df)
    assert len(model.trees) == 3


def test_group_quantiles_discrete(spark):
    rows = [(i, ts(f"2024-01-01 10:00:{i:02d}"), 1, "a", float(v), "{}")
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["event_type"]: r for r in relational.group_quantiles(ev).collect()}
    # discrete quantile: smallest value with cumulative fraction >= q
    assert out["a"]["n"] == 10
    assert out["a"]["p5"] == 5.0
    assert out["a"]["p9"] == 9.0
    assert out["a"]["p99"] == 10.0


def test_rolling_event_stats_semantics(spark):
    rows = [
        (0, ts("2024-01-01 10:00:00"), 1, "a", 2.0, "{}"),
        (1, ts("2024-01-01 10:01:00"), 1, "a", 4.0, "{}"),
        (2, ts("2024-01-01 10:02:00"), 1, "a", 9.0, "{}"),
        (3, ts("2024-01-01 09:00:00"), 2, "a", 7.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["event_id"]: r for r in relational.rolling_event_stats(ev, window_rows=2).collect()}
    # first event per user: empty frame -> 0 / NULL
    assert out[0]["n_prev"] == 0 and out[0]["mean_prev_value"] is None
    assert out[3]["n_prev"] == 0
    assert out[1]["n_prev"] == 1 and out[1]["mean_prev_value"] == 2.0
    assert out[2]["n_prev"] == 2 and out[2]["mean_prev_value"] == 3.0


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "lid long, k long"
    )
    right = spark.createDataFrame(
        [(0, "x"), (0, "y"), (1, "z"), (5, "w")], "rk long, tag string"
    )
    salted = relational.salted_join(left, right, "k", "rk", salt=4)
    plain = left.join(right, left["k"] == right["rk"])
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.select("lid", "k", "rk", "tag").collect())
    )


def test_table_profile_single_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = relational.table_profile(li, ["l_quantity", "l_discount"])
    # one scan: assert on the pre-execution plan (post-AQE explain renders
    # the initial plan a second time)
    plan = formatted_plan(q)
    assert plan.count("+- Scan parquet") == 1
    out = {r["column"]: r for r in q.collect()}
    assert out["l_quantity"]["n_nulls"] == 0
    assert out["l_quantity"]["min_value"] >= 0
    # exact mean cross-check against a direct fixed-point computation
    direct = li.agg(
        (F.sum(F.floor(F.col("l_discount") * 10000).cast("long")) / 10000.0
         / F.count("l_discount")).alias("m")
    ).collect()[0]["m"]
    assert out["l_discount"]["mean_value"] == round(direct, 6)


def test_skew_report_values_and_shape(spark):
    from spark_iforest_spark.operators import relational

    rows = [("hot", i) for i in range(90)] + [("a", 0), ("b", 1), ("c", 2),
                                              ("d", 3), ("e", 4)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = relational.skew_report(df, "k", top_k=3).collect()
    assert [r["key"] for r in out] == ["hot", "a", "b"]
    hot = out[0]
    # 95 rows over 6 keys: mean 95/6, hot factor = 90/(95/6)
    assert hot["n_rows"] == 90
    assert abs(hot["frac_of_table"] - round(90 / 95, 6)) < 1e-9
    assert abs(hot["skew_factor"] - round(90 / (95 / 6), 6)) < 1e-9


def test_skew_report_plan_reuses_exchange_no_checkpoint(spark):
    """The counts aggregate must be shared via ReuseExchange — no cache,
    no localCheckpoint (round-7 review fix: nothing pinned past the
    query), and the broadcast totals side stays broadcast."""
    from spark_iforest_spark.operators import relational
    from spark_iforest_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [("k%d" % (i % 9), i) for i in range(200)], "k string, v long"
    )
    out = relational.skew_report(df, "k", top_k=3)
    out.collect()  # AQE-final plan
    plan = formatted_plan(out)
    assert "ReusedExchange" in plan
    assert "Checkpoint" not in plan and "InMemoryTableScan" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan

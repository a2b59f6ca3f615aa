"""Measured hot-key join demo (round-11 verdict directive #6).

At 100 TB the skew-prone joints in this engine are the digest-keyed
joins of the dedup family: boilerplate lines and template windows give a
handful of digests a huge share of the (digest -> docs) relation. The
in-operator ``max_shingle_df`` cap guards the PAIR-GENERATION blowup
(a hot shingle would otherwise contribute df^2 candidate pairs), but it
does NOT help when the hot key must flow through an ordinary equi-join
intact — e.g. joining a line-count index back to per-doc line rows, or
enriching events by a power-law user id: the join is correct, it is the
one straggler task owning the hot key's whole shuffle slice that kills
the stage. That is ``skew_report`` + ``salted_join`` territory.

This tool builds a deliberately skewed fixture (one key owning
``hot_frac`` of the left side), prints the ``skew_report`` verdict, and
measures the same aggregate-over-join three ways:

  * plain shuffle join with AQE's skew handling DISABLED — the straggler
    baseline;
  * plain join with AQE skew-join ON (Spark's runtime split — the first
    thing to reach for, zero code);
  * ``salted_join`` (explicit scatter; the fallback when AQE can't split
    — e.g. the skewed side feeds an aggregation on the same key, or the
    planner's post-shuffle partition stats hide the skew).

All three must agree on the result (the pytest twin pins salted == plain
on this exact fixture via ``make_skewed_fixture``); the JSON line
records the wall-clocks and the measured skew factor.

Usage:  python tools/skew_demo.py [n_rows] [hot_frac]
        (defaults: 2_000_000 rows, 0.5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_skewed_fixture(spark, n_rows: int = 100_000, n_keys: int = 1_000,
                        hot_frac: float = 0.5):
    """(left, right): left has ``hot_frac`` of its rows on key 0 and the
    rest uniform over ``n_keys`` keys; right is one dim row per key.
    Deterministic (hash-derived), so the pytest twin and the demo measure
    the same relation."""
    from pyspark.sql import functions as F

    cut = int(n_rows * hot_frac)
    left = spark.range(n_rows).select(
        F.when(F.col("id") < cut, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    right = spark.range(n_keys).select(
        F.col("id").alias("rk"), (F.col("id") % 7).cast("double").alias("w")
    )
    return left, right


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("skew-demo")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # make the join a real shuffle join: the dim is broadcastable by
        # size, which would hide the skew entirely (and IS the right fix
        # when the dim fits — salting is for when it doesn't)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.operators import relational

    left, right = make_skewed_fixture(spark, n_rows, 1_000, hot_frac)
    left = snapshot(left.repartition(int(CPUS)), eager=True)
    right = snapshot(right, eager=True)

    rep = relational.skew_report(left, "k", top_k=3).collect()
    skew = [
        {"key": r["key"], "frac": r["frac_of_table"], "factor": r["skew_factor"]}
        for r in rep
    ]

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 3)

    def agg(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()[0]

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    r_plain, t_plain = timed(
        lambda: agg(left.join(right, left["k"] == right["rk"]))
    )
    results["plain_no_aqe_skew"] = t_plain
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # AQE's default thresholds target multi-hundred-MB partitions; lower
    # them so the demo's skew is splittable at demo scale
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    r_aqe, t_aqe = timed(
        lambda: agg(left.join(right, left["k"] == right["rk"]))
    )
    results["plain_aqe_skew_split"] = t_aqe
    r_salt, t_salt = timed(
        lambda: agg(relational.salted_join(left, right, "k", "rk", salt=int(CPUS)))
    )
    results["salted_join"] = t_salt
    assert r_plain["n"] == r_aqe["n"] == r_salt["n"], (r_plain, r_aqe, r_salt)
    assert abs(r_plain["s"] - r_salt["s"]) < 1e-6 * max(1.0, abs(r_plain["s"]))
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "hot_frac": hot_frac,
                "cpus": int(CPUS),
                "skew_report_top": skew,
                "wall_sec": results,
                "rows_joined": r_plain["n"],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

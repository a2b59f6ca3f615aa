"""25x one-off for pretrain_curate_incr (round-11 verdict directive #5).

The capstone's only scale evidence was the 5x bench tier (2.66x wall at
5x work). This tool gives it the large-factor row the other headline
queries have: the EXACT bench.py workload shape (documents reshaped to
8-token lines, state built on the doc_id%4!=0 three-quarters and
materialized untimed, per-batch timing over curating the %4==0 quarter
with decontamination) at a derived .benchdata tier (default factor 25 =>
sf2.5, same per-copy token-bijection protocol as every prior 25x row),
min-of-N with between-run quiesce and endpoint calibration probes.

Usage:  python tools/ab_curate_incr.py [factor] [n_runs]
        (defaults: factor 25, 2 runs; 16g heap per the 25x protocol —
        override with SPARK_GRAFT_DRIVER_MEM)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-curate-incr")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "false")
        .config("spark.spark_iforest.pinSnapshots", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda v: v, "double")
    spark.range(1000).select(_warm(F.col("id").cast("double"))).count()

    from bench import _calibration_probe, _quiesce
    from tools.scale_tier import ensure_benchdata

    tier_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata",
        f"sf{factor * 0.1:g}",
    )
    generated = ensure_benchdata(spark, SF_DIR, tier_dir, factor=factor)
    _quiesce(spark)

    _calibration_probe()
    probe_start = min(_calibration_probe(), _calibration_probe())

    from spark_iforest_spark.functions import reshape_lines
    from spark_iforest_spark.operators import corpus
    from spark_iforest_spark.sources import read_table

    docs = read_table(spark, tier_dir, "documents").repartition(int(CPUS)).cache()
    docs.count()
    reshaped = docs.withColumn("text", reshape_lines("text", 8))
    t_state = time.perf_counter()
    cur_state = corpus.materialize_curation_state(
        corpus.curation_state(
            reshaped.where(F.col("doc_id") % 4 != 0),
            reference=docs.where(F.col("lang") == "en"),
            line_min_docs=3,
            substr_window=8,
            neardup=True,
            gopher_thresholds={"min_tokens": 20, "max_dup_token_frac": 0.9},
        )
    )
    state_sec = round(time.perf_counter() - t_state, 3)
    _quiesce(spark)

    runs: list[float] = []
    for _ in range(n):
        t0 = time.perf_counter()
        corpus.pretrain_curate_incremental(
            reshaped.where(F.col("doc_id") % 4 == 0),
            cur_state,
            benchmark=docs.where(F.col("doc_id") % 100 == 0),
            assume_disjoint_ids=True,
        ).count()
        runs.append(round(time.perf_counter() - t0, 3))
        _quiesce(spark)

    probe_end = min(_calibration_probe(), _calibration_probe())
    print(
        json.dumps(
            {
                "query": "pretrain_curate_incr",
                "tier_dir": tier_dir,
                "factor": factor,
                "tier_generated_this_call": generated,
                "cpus": int(CPUS),
                "driver_mem": DRIVER_MEM,
                "n_runs": n,
                "min": min(runs),
                "runs": runs,
                "state_build_untimed_sec": state_sec,
                "calibration": {
                    "probe_start_sec": round(probe_start, 3),
                    "probe_end_sec": round(probe_end, 3),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Per-job timeline probe for the driver-sequenced curate pair (round 14).

The round-13 verdict's top item is the curate pair's JOB FLOOR: ~45-50
driver-sequenced AQE jobs at 80-150 ms each. Optimizing it means knowing
which jobs exist and what each costs, so this tool runs a chosen query in
bench.py's exact workload shape (same session config except the UI, which
it needs for the REST timeline), warms it once untimed, then runs it once
timed and prints every job of that run — description, duration, stage
count — plus the per-description rollup. Evidence for
OPTIMIZATION_r14.md; the fusion work is judged on these counts falling.

Usage:  python tools/job_timeline.py [pretrain_curate|pretrain_curate_incr|ccnet_ppl|dsir_select]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")


def build(which: str):
    """Session + workload builders, shared with tools/stage_timeline.py.
    Returns (spark, fns, quiesce)."""
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("job-timeline-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "true")
        .config("spark.spark_iforest.pinSnapshots", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import _quiesce
    from spark_iforest_spark.sources import read_table
    from spark_iforest_spark.functions import reshape_lines
    from spark_iforest_spark.operators import corpus, pipeline, text

    docs = read_table(spark, SF_DIR, "documents").repartition(int(CPUS)).cache()
    docs.count()
    reshaped = docs.withColumn("text", reshape_lines("text", 8))

    def run_curate():
        return corpus.pretrain_curate(
            reshaped,
            reference=docs.where(F.col("lang") == "en"),
            benchmark=docs.where(F.col("doc_id") % 100 == 0),
            line_min_docs=3,
            substr_window=8,
            neardup=True,
            gopher_thresholds={"min_tokens": 20, "max_dup_token_frac": 0.9},
        ).count()

    state = {}

    def run_curate_incr():
        if "st" not in state:
            state["st"] = corpus.materialize_curation_state(
                corpus.curation_state(
                    reshaped.where(F.col("doc_id") % 4 != 0),
                    reference=docs.where(F.col("lang") == "en"),
                    line_min_docs=3,
                    substr_window=8,
                    neardup=True,
                    gopher_thresholds={"min_tokens": 20, "max_dup_token_frac": 0.9},
                )
            )
            _quiesce(spark)
        return corpus.pretrain_curate_incremental(
            reshaped.where(F.col("doc_id") % 4 == 0),
            state["st"],
            benchmark=docs.where(F.col("doc_id") % 100 == 0),
            assume_disjoint_ids=True,
        ).count()

    def run_ccnet():
        return text.ccnet_filter(docs, docs.where(F.col("lang") == "en")).count()

    def run_dsir():
        return pipeline.dsir_resample(
            docs,
            pipeline.dsir_estimator(
                docs.where(F.col("lang") == "de"), docs, n_buckets=2048
            ),
            500,
            n_buckets=2048,
        ).count()

    fns = {
        "pretrain_curate": run_curate,
        "pretrain_curate_incr": run_curate_incr,
        "ccnet_ppl": run_ccnet,
        "dsir_select": run_dsir,
    }
    return spark, fns, _quiesce


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "pretrain_curate"
    spark, fns, _quiesce = build(which)
    fn = fns[which]

    # warm (codegen + worker pool), exactly like the bench's min-of-N
    fn()
    _quiesce(spark)
    fn()
    _quiesce(spark)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    before = json.load(urllib.request.urlopen(f"{base}/jobs"))
    watermark = max((j["jobId"] for j in before), default=-1)

    t0 = time.time()
    fn()
    wall = time.time() - t0

    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    mine = sorted(
        (j for j in jobs if j["jobId"] > watermark), key=lambda j: j["jobId"]
    )

    def dur(j):
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        s = datetime.strptime(j["submissionTime"], fmt)
        e = datetime.strptime(j["completionTime"], fmt)
        return (e - s).total_seconds()

    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    t_base = min(
        datetime.strptime(j["submissionTime"], fmt) for j in mine
    ) if mine else None
    rows = []
    for j in mine:
        sub = datetime.strptime(j["submissionTime"], fmt)
        rows.append(
            {
                "job": j["jobId"],
                "at": round((sub - t_base).total_seconds(), 3),
                "sec": round(dur(j), 3),
                "stages": len(j["stageIds"]),
                "tasks": j["numTasks"],
                "desc": (j.get("description") or j["name"])[:110],
            }
        )
    rollup: dict[str, list[float]] = {}
    for r in rows:
        key = r["desc"].split("]")[0] + "]" if r["desc"].startswith("[") else r["desc"][:40]
        rollup.setdefault(key, []).append(r["sec"])
    print(json.dumps({
        "query": which,
        "wall_sec": round(wall, 3),
        "n_jobs": len(rows),
        "sum_job_sec": round(sum(r["sec"] for r in rows), 3),
        "jobs": rows,
        "rollup": {
            k: {"n": len(v), "sum": round(sum(v), 3)} for k, v in sorted(
                rollup.items(), key=lambda kv: -sum(kv[1])
            )
        },
    }, indent=1))


if __name__ == "__main__":
    main()

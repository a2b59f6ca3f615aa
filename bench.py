"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...,
   "runs": {...}, "calibration": {...}, "load_flag": bool}

Baseline context (BASELINE.md): the reference trains iforest on 567k rows /
d=3 in 34 s and scores in 86 s on 4 cores. Headline here: train on lineitem
(~600k rows at sf0.1, 7 numeric features, numTrees=100, maxSamples=256) and
score all rows — same shape, so the numbers are directly comparable — plus
the flagship pipeline operators.

Self-diagnosis (round-4): this VM shows random multi-10s external pauses
with a 2-4x spread on identical code (SCALE.md postmortem; the recorded
BENCH_r03 train time was 3.4x the idle-machine number). So the artifact now
carries its own evidence: ``runs`` records EVERY per-run time (not just the
min), a fixed-work single-thread calibration probe runs before and after
the queries (``calibration``), and each query re-runs (bounded) until its
two fastest runs agree within 2x. ``load_flag`` is true when any query's
best-two spread stayed >= 2x or the probe pair disagrees by >= 1.5x — a
reviewer can tell load-contaminated recordings from plan regressions
without access to the machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _calibration_probe() -> float:
    """Fixed-work single-thread probe (~0.3 s idle): repeated 256x256
    float64 matmuls. Identical work every call — on an unloaded machine the
    before/after probes agree tightly; external load inflates them, which
    stamps the contamination into the artifact itself."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((256, 256))
    b = rng.standard_normal((256, 256))
    t0 = time.time()
    for _ in range(120):
        a = a @ b
        a /= np.abs(a).max() + 1.0  # keep values bounded, defeat dead-code elim
    return round(time.time() - t0, 3)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from spark_iforest_spark import IForest
    from spark_iforest_spark.operators import dedup, relational, similarity, text
    from spark_iforest_spark.sources import read_table

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-iforest-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the Python worker pool + Arrow paths so the first timed query
    # doesn't absorb one-time JVM/worker startup (a cluster amortizes these)
    from pyspark.sql.functions import pandas_udf

    # lambda form: this module uses `from __future__ import annotations`,
    # which stringifies hints and breaks pandas_udf type inference
    _warm = pandas_udf(lambda v: v, "double")
    spark.range(1000).select(_warm(F.col("id").cast("double"))).count()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    unstable: list[str] = []
    _calibration_probe()  # warm numpy/BLAS so the timed probe is pure compute
    probe_start = _calibration_probe()

    def timed(name: str, fn) -> None:
        # min-of-N with spread control: 3 base runs, then keep re-running
        # (bounded at 5 total) until the two fastest runs agree within 2x —
        # min-of-N reports the machine's capability instead of scheduler
        # luck, and the full run list ships in the JSON so a contaminated
        # recording is self-evident
        import gc

        runs: list[float] = []
        while True:
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
            srt = sorted(runs)
            stable = len(runs) >= 3 and srt[1] <= 2.0 * srt[0]
            if stable or len(runs) >= 5:
                if not stable:
                    unstable.append(name)
                break
        all_runs[name] = runs
        timings[name] = round(min(runs), 3)
        # drop dead localCheckpoint/broadcast refs NOW so ContextCleaner
        # reclaims blocks between queries instead of under the next timing
        gc.collect()

    # --- isolation forest: train + score on lineitem numeric features ------
    feature_cols = [
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_linenumber", "l_partkey", "l_suppkey",
    ]
    li = read_table(spark, SF_DIR, "lineitem")
    # the local sf parquet is a handful of files (=> a handful of input
    # splits); spread to all cores like a real cluster's scan would be
    feats = li.select(
        F.array(*[F.col(c).cast("double") for c in feature_cols]).alias("features")
    ).repartition(int(CPUS))
    feats.cache().count()

    model_box = {}

    def train():
        model_box["m"] = IForest(
            numTrees=100, maxSamples=256.0, maxDepth=10, contamination=0.01, seed=7
        ).fit(feats)

    # fit() eagerly scores the training set to fix the threshold (reference
    # semantics) — so "iforest_train" includes one full scoring pass, like
    # the reference's own fit.
    timed("iforest_train", train)

    def score():
        model_box["m"].transform(feats).select(F.sum("prediction")).collect()

    timed("iforest_score", score)
    feats.unpersist()

    # --- pipeline operators at sf ------------------------------------------
    docs = read_table(spark, SF_DIR, "documents").repartition(int(CPUS)).cache()
    emb = read_table(spark, SF_DIR, "embeddings").repartition(int(CPUS)).cache()
    docs.count(), emb.count()

    timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs).count())
    # production corpora cap hot shingles (boilerplate) — the uncapped exact
    # variant is quadratic in shingle document-frequency by definition
    timed(
        "dedup_ngram_jaccard",
        lambda: dedup.ngram_jaccard_pairs(docs, max_shingle_df=100).count(),
    )
    timed(
        "ann_cosine_topk",
        lambda: similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 10)).count(),
    )
    timed("text_quality", lambda: text.quality_score(docs).count())
    timed(
        "pricing_summary",
        lambda: relational.pricing_summary(read_table(spark, SF_DIR, "lineitem")).count(),
    )
    timed(
        "sessionize_events",
        lambda: relational.sessionize(read_table(spark, SF_DIR, "events")).count(),
    )

    probe_end = _calibration_probe()
    probe_spread = max(probe_start, probe_end) / max(min(probe_start, probe_end), 1e-9)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "runs": all_runs,
                "calibration": {
                    "probe_start_sec": probe_start,
                    "probe_end_sec": probe_end,
                },
                "load_flag": bool(unstable) or probe_spread >= 1.5,
                "unstable_queries": unstable,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Isolated per-query re-measurement (round 9).

The round-8 official record drifted +16-36% on three headline queries
(dedup_ngram_jaccard, dedup_incremental, bpe_tokenize) vs round 7, all
inside the machine's documented bimodality band but none re-measured in
isolation.  This tool runs a chosen subset of the supported headline
queries in ONE fresh session (bench.py's exact session config, data
prep, and query definitions — including the minhash index's lifecycle:
built immediately before dedup_incremental and unpersisted after, so no
extra cached blocks sit under the other measurements), min-of-N each
with between-run quiesce, and prints a single JSON line — the A/B
evidence SCALE.md's drift table records.

Usage:  python tools/ab_isolated.py [n_runs] [query ...]
        (default: 4 runs of the three round-8 drifted queries;
        any integer argument anywhere sets n_runs, last one wins)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")

DRIFTED = ["dedup_ngram_jaccard", "dedup_incremental", "bpe_tokenize"]
# bench.py suite order, restricted to what this tool implements — run in
# the same relative order as the suite so cache/GC state is comparable
SUPPORTED = [
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "ccnet_ppl",
    "bpe_tokenize",
    "bpe_pack",
    "dsir_select",
]


def main() -> None:
    args = sys.argv[1:]
    n = 4
    wanted = []
    for a in args:
        if a.isdigit():
            n = int(a)
        else:
            wanted.append(a)
    wanted = wanted or list(DRIFTED)
    unknown = [q for q in wanted if q not in SUPPORTED]
    if unknown:
        # validate BEFORE the minutes of session/cache setup (review fix)
        sys.exit(
            f"unsupported queries {unknown}; this tool implements {SUPPORTED}"
        )
    wanted = [q for q in SUPPORTED if q in wanted]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_iforest_spark.operators import dedup, pipeline, text, tokenizer
    from spark_iforest_spark.sources import read_table

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-iforest-ab-isolated")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "false")
        .config("spark.spark_iforest.pinSnapshots", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same worker-pool warmup as bench.py
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda v: v, "double")
    spark.range(1000).select(_warm(F.col("id").cast("double"))).count()

    from bench import _calibration_probe, _quiesce

    _calibration_probe()
    probe_start = min(_calibration_probe(), _calibration_probe())

    docs = read_table(spark, SF_DIR, "documents").repartition(int(CPUS)).cache()
    docs.count()

    def run(name: str, fn, prepare=None, cleanup=None):
        state = prepare() if prepare else None
        runs: list[float] = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(state)
            runs.append(round(time.perf_counter() - t0, 3))
            _quiesce(spark)
        if cleanup:
            cleanup(state)
        return {"min": min(runs), "runs": runs}

    def _index_prepare():
        index = dedup.minhash_index(docs.where(F.col("doc_id") % 4 != 0)).cache()
        index.count()
        return index

    def _bpe(_):
        m = tokenizer.bpe_train(docs, n_merges=500)
        tokenizer.bpe_token_counts(docs, m).agg(F.sum("n_bpe_tokens")).collect()

    defs = {
        "dedup_ngram_jaccard": dict(
            fn=lambda _: dedup.ngram_jaccard_pairs(docs, max_shingle_df=100).count()
        ),
        "dedup_incremental": dict(
            fn=lambda index: dedup.minhash_lsh_pairs_incremental(
                docs.where(F.col("doc_id") % 4 == 0), index,
                assume_disjoint_ids=True,
            ).count(),
            prepare=_index_prepare,
            cleanup=lambda index: index.unpersist(),
        ),
        "ccnet_ppl": dict(
            fn=lambda _: text.ccnet_filter(
                docs, docs.where(F.col("lang") == "en")
            ).count()
        ),
        "bpe_tokenize": dict(fn=_bpe),
        # round-14 additions: the two queries the round-13 verdict flagged
        # for a quiet-box re-measure (bpe_pack) and this round's dsir
        # fusion A/B (dsir_select) — bench.py's exact definitions
        "bpe_pack": dict(
            fn=lambda m: tokenizer.pack_token_ids(
                docs, m, seq_len=2048
            ).count(),
            prepare=lambda: tokenizer.bpe_train(docs, n_merges=500),
        ),
        "dsir_select": dict(
            fn=lambda _: pipeline.dsir_resample(
                docs,
                pipeline.dsir_estimator(
                    docs.where(F.col("lang") == "de"), docs, n_buckets=2048
                ),
                500,
                n_buckets=2048,
            ).count()
        ),
    }

    out = {q: run(q, **defs[q]) for q in wanted}

    probe_end = min(_calibration_probe(), _calibration_probe())
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": int(CPUS),
                "n_runs": n,
                "isolated": out,
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

"""Isolated per-query re-measurement (round 9).

The round-8 official record drifted +16-36% on three headline queries
(dedup_ngram_jaccard, dedup_incremental, bpe_tokenize) vs round 7, all
inside the machine's documented bimodality band but none re-measured in
isolation.  This tool runs a chosen subset of headline queries in ONE
fresh session (bench.py's exact session config, data prep, and query
definitions), min-of-N each with between-run quiesce, and prints a
single JSON line — the A/B evidence SCALE.md's drift table records.

Usage:  python tools/ab_isolated.py [n_runs] [query ...]
        (default: 4 runs of the three round-8 drifted queries)
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


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_iforest_spark.operators import dedup, tokenizer
    from spark_iforest_spark.sources import read_table

    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 4
    wanted = [a for a in args if not a.isdigit()] or list(DRIFTED)

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

    defs = {
        "dedup_ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(
            docs, max_shingle_df=100
        ).count()
    }
    if "dedup_incremental" in wanted:
        index = dedup.minhash_index(docs.where(F.col("doc_id") % 4 != 0)).cache()
        index.count()
        defs["dedup_incremental"] = lambda: dedup.minhash_lsh_pairs_incremental(
            docs.where(F.col("doc_id") % 4 == 0), index, assume_disjoint_ids=True
        ).count()

    def bpe() -> None:
        m = tokenizer.bpe_train(docs, n_merges=500)
        tokenizer.bpe_token_counts(docs, m).agg(F.sum("n_bpe_tokens")).collect()

    defs["bpe_tokenize"] = bpe

    if "ccnet_ppl" in wanted:
        from spark_iforest_spark.operators import text

        defs["ccnet_ppl"] = lambda: text.ccnet_filter(
            docs, docs.where(F.col("lang") == "en")
        ).count()

    out = {}
    for q in wanted:
        runs: list[float] = []
        for _ in range(n):
            t0 = time.perf_counter()
            defs[q]()
            runs.append(round(time.perf_counter() - t0, 3))
            _quiesce(spark)
        out[q] = {"min": min(runs), "runs": runs}

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

"""Combined steady-state soak of the WHOLE streaming stack (round-12
verdict directive #6): one documents stream drives curation (delta
layout) + the delta digest index + the parts profile/NDV monitors inside
a single foreachBatch step, while a CONCURRENT embeddings stream drives
ann_ingest (with freshness stats) — N batches at sf0.1, recording each
sink's per-batch wall and the sink directories' on-disk growth.

Two legs:
  * ``nocadence`` — no in-stream compaction anywhere (the round-11
    state of the world for every sink but curation): the digest sink's
    per-batch wall creeps with the live part chain.
  * ``cadence``  — ``compact_every=K`` on every sink (round 12): the
    claim under test is per-batch wall FLAT (amortized compaction spikes
    on every K-th batch are the visible cost), same final relations.

Usage:  python tools/soak_all.py [sf_dir] [n_batches] [compact_every]
        (defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 10, 3)
Output: one JSON line per (leg, batch) with the per-sink walls, a
markdown table for SCALE.md, and a summary with first/last-third wall
ratios per sink.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession, functions as F


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("soak_all")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_iforest_spark import streaming as S
    from spark_iforest_spark.operators import corpus, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corp = docs.where(F.col("doc_id") % (2 * n_batches) < n_batches)
    kw = dict(
        reference=corp, gopher=True, line_min_docs=2, substr_window=8,
        neardup=True,
        gopher_thresholds={"min_tokens": 20, "max_dup_token_frac": 0.9},
    )
    centers = similarity.ivf_centers(emb, n_centroids=16)
    work = tempfile.mkdtemp(prefix="soak_all_")
    print(f"# soak_all: sf_dir={sf_dir} n_batches={n_batches} K={k} work={work}")
    rows = []
    try:
        for leg in ("nocadence", "cadence"):
            ck = None if leg == "nocadence" else k
            base = f"{work}/{leg}"
            state_dir, out_dir = f"{base}/state", f"{base}/out"
            idx_dir, prof_dir, ndv_dir = (
                f"{base}/digest", f"{base}/profile", f"{base}/ndv",
            )
            ann_dir, stats_dir = f"{base}/ann", f"{base}/ann_stats"
            dsrc, esrc = f"{base}/dsrc", f"{base}/esrc"
            t0 = time.monotonic()
            corpus.save_curation_state(
                corpus.curation_state(corp, **kw), f"{state_dir}/v0"
            )
            print(f"# {leg}: curation state built in {time.monotonic() - t0:.1f}s")
            for b in range(n_batches):
                docs.where(
                    F.col("doc_id") % (2 * n_batches) == n_batches + b
                ).coalesce(1).write.mode("append").parquet(dsrc)
                emb.where(F.col("vec_id") % n_batches == b).coalesce(
                    1
                ).write.mode("append").parquet(esrc)
            walls: list[dict] = []

            def doc_step(batch_df, batch_id, _w=walls, _ck=ck):
                from spark_iforest_spark.checkpoint import snapshot

                b = snapshot(batch_df, eager=True)
                rec = {}
                t = time.monotonic()
                S.curate_batch_version(
                    spark, state_dir, out_dir, b, batch_id,
                    state_layout="delta",
                )
                if _ck and (batch_id + 1) % _ck == 0:
                    corpus.compact_curation_state(spark, state_dir)
                rec["curate"] = round(time.monotonic() - t, 3)
                t = time.monotonic()
                S.merge_index_delta(spark, idx_dir, b, batch_id)
                if _ck and (batch_id + 1) % _ck == 0:
                    S.compact_dedup_index(spark, idx_dir)
                rec["digest"] = round(time.monotonic() - t, 3)
                t = time.monotonic()
                S.merge_profile_part(
                    spark, prof_dir, b.select(F.length("text").alias("len")),
                    batch_id, ["len"],
                )
                if _ck and (batch_id + 1) % _ck == 0:
                    S.compact_profile_parts(spark, prof_dir)
                rec["profile"] = round(time.monotonic() - t, 3)
                t = time.monotonic()
                S.merge_ndv_part(spark, ndv_dir, b, batch_id, ["doc_id"])
                if _ck and (batch_id + 1) % _ck == 0:
                    S.compact_ndv_parts(spark, ndv_dir)
                rec["ndv"] = round(time.monotonic() - t, 3)
                rec["state_bytes"] = (
                    dir_bytes(state_dir) + dir_bytes(idx_dir)
                    + dir_bytes(prof_dir) + dir_bytes(ndv_dir)
                )
                _w.append(rec)

            ann_walls: list[float] = []

            def emb_step(batch_df, batch_id, _w=ann_walls, _ck=ck):
                t = time.monotonic()
                similarity.ivf_assign(
                    batch_df, centers, with_distance=True
                ).drop("d2").write.partitionBy("cell").mode(
                    "overwrite"
                ).parquet(f"{ann_dir}/b{batch_id}")
                if _ck and (batch_id + 1) % _ck == 0:
                    S.compact_ann_index(spark, ann_dir)
                _w.append(round(time.monotonic() - t, 3))

            dstream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(dsrc)
            )
            estream = (
                spark.readStream.schema(
                    "vec_id long, embedding array<double>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(esrc)
            )
            q1 = dstream.writeStream.foreachBatch(doc_step).trigger(
                availableNow=True
            ).start()
            q2 = estream.writeStream.foreachBatch(emb_step).trigger(
                availableNow=True
            ).start()
            q1.awaitTermination()
            q2.awaitTermination()
            for i, rec in enumerate(walls):
                row = {
                    "leg": leg, "batch": i,
                    "ann": ann_walls[i] if i < len(ann_walls) else None,
                    **rec,
                }
                rows.append(row)
                print(json.dumps(row))
        print("\n| batch | sink | nocadence s | cadence s |")
        print("|---|---|---|---|")
        no = [r for r in rows if r["leg"] == "nocadence"]
        ca = [r for r in rows if r["leg"] == "cadence"]
        for i, (a, b) in enumerate(zip(no, ca)):
            for sink in ("curate", "digest", "profile", "ndv", "ann"):
                print(f"| {i} | {sink} | {a[sink]} | {b[sink]} |")

        def ratio(leg_rows, sink):
            third = max(1, len(leg_rows) // 3)
            head = sum(r[sink] for r in leg_rows[:third]) / third
            tail = sum(r[sink] for r in leg_rows[-third:]) / third
            return round(tail / max(head, 1e-9), 3)

        # the cadence leg's flatness claim is about the NON-compaction
        # batches (every K-th batch visibly pays the amortized fold);
        # the nocadence leg has no compaction, so both slices are shown
        # from the same per-batch rows
        ca_steady = [r for r in ca if (r["batch"] + 1) % k != 0]
        print(json.dumps({
            "last_third_over_first_third_wall": {
                "nocadence": {
                    sink: ratio(no, sink)
                    for sink in ("curate", "digest", "profile", "ndv", "ann")
                },
                "cadence_all": {
                    sink: ratio(ca, sink)
                    for sink in ("curate", "digest", "profile", "ndv", "ann")
                },
                "cadence_steady": {
                    sink: ratio(ca_steady, sink)
                    for sink in ("curate", "digest", "profile", "ndv", "ann")
                },
            },
            "final_state_bytes": {
                leg: [r for r in rows if r["leg"] == leg][-1]["state_bytes"]
                for leg in ("nocadence", "cadence")
            },
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Steady-state soak of curate_stream (round-11 verdict directive #4).

Drives the REAL streaming path — readStream over one parquet part per
micro-batch, foreachBatch -> curate_batch_version — for N batches at
sf0.1, once per state layout, recording per batch:

  * wall-clock of the whole foreachBatch step (chain + state write)
  * bytes written for that batch's state version
  * cumulative state-directory size

The claim under test is the round-11 delta layout's: per-batch state
WRITE volume stays flat in the batch size while the corpus grows, where
the round-10 full-rewrite layout's write grows with the corpus. Output:
one JSON line per (layout, batch) plus a markdown table for SCALE.md,
and a final compaction row for the delta dir.

Usage:  python tools/soak_stream.py [sf_dir] [n_batches] [compact_every]
        (defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 10, none;
        a compact_every value adds a THIRD leg — delta layout with
        in-stream compaction cadence — whose per-batch wall should stay
        flat where the unbounded chain's creeps)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("soak_stream")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_iforest_spark import streaming as S
    from spark_iforest_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # corpus = half the table; batches = equal hash slices of the rest
    corp = docs.where(F.col("doc_id") % (2 * n_batches) < n_batches)
    batches = [
        docs.where(F.col("doc_id") % (2 * n_batches) == n_batches + k)
        for k in range(n_batches)
    ]
    work = tempfile.mkdtemp(prefix="soak_")
    print(f"# soak: sf_dir={sf_dir} n_batches={n_batches} work={work}")
    kw = dict(
        reference=corp, gopher=True, line_min_docs=2, substr_window=8,
        neardup=True,
        # the gates' thresholds for the short synthetic docs (default
        # Gopher bounds are tuned for real web text and drop everything)
        gopher_thresholds={"min_tokens": 20, "max_dup_token_frac": 0.9},
    )
    rows = []
    legs = ["full", "delta"]
    if compact_every:
        legs.append(f"delta_c{compact_every}")
    try:
        for layout in legs:
            state_dir = f"{work}/{layout}/state"
            out_dir = f"{work}/{layout}/out"
            src = f"{work}/{layout}/src"
            t0 = time.monotonic()
            corpus.save_curation_state(
                corpus.curation_state(corp, **kw), f"{state_dir}/v0"
            )
            base_bytes = dir_bytes(state_dir)
            print(
                f"# {layout}: state built+saved in "
                f"{time.monotonic() - t0:.1f}s, v0 = {base_bytes} bytes"
            )
            for b in batches:  # one part file per micro-batch
                b.coalesce(1).write.mode("append").parquet(src)
            timings: list[float] = []

            def step(batch_df, batch_id, _sd=state_dir, _od=out_dir,
                     _layout=layout, _t=timings):
                t = time.monotonic()
                S.curate_batch_version(
                    spark, _sd, _od, batch_df, batch_id,
                    state_layout="full" if _layout == "full" else "delta",
                )
                if _layout.startswith("delta_c") and (
                    (batch_id + 1) % compact_every == 0
                ):
                    corpus.compact_curation_state(spark, _sd)
                _t.append(time.monotonic() - t)

            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = stream.writeStream.foreachBatch(step).trigger(
                availableNow=True
            ).start()
            q.awaitTermination()
            for i, wall in enumerate(timings):
                vdir = f"{state_dir}/v{i + 1}"
                rec = {
                    "layout": layout,
                    "batch": i,
                    "wall_sec": round(wall, 3),
                    "version_bytes": dir_bytes(vdir),
                    "state_dir_bytes": None,
                }
                rows.append(rec)
            rows[-1]["state_dir_bytes"] = dir_bytes(state_dir)
            for r in [r for r in rows if r["layout"] == layout]:
                print(json.dumps(r))
        # compaction: collapse the delta chain, record cost + result
        t0 = time.monotonic()
        v = corpus.compact_curation_state(spark, f"{work}/delta/state")
        comp = {
            "layout": "delta",
            "compacted_version": v,
            "wall_sec": round(time.monotonic() - t0, 3),
            "compacted_bytes": dir_bytes(f"{work}/delta/state/v{v}"),
        }
        print(json.dumps(comp))
        # markdown table for SCALE.md
        print("\n| batch | full wall s | full v-bytes | delta wall s | delta v-bytes |")
        print("|---|---|---|---|---|")
        fulls = [r for r in rows if r["layout"] == "full"]
        delts = [r for r in rows if r["layout"] == "delta"]
        for fr, dr in zip(fulls, delts):
            print(
                f"| {fr['batch']} | {fr['wall_sec']} | {fr['version_bytes']} "
                f"| {dr['wall_sec']} | {dr['version_bytes']} |"
            )
        print(
            json.dumps(
                {
                    "full_last_over_first_bytes": round(
                        fulls[-1]["version_bytes"] / fulls[0]["version_bytes"], 3
                    ),
                    "delta_last_over_first_bytes": round(
                        delts[-1]["version_bytes"] / delts[0]["version_bytes"], 3
                    ),
                    "full_total_written": sum(r["version_bytes"] for r in fulls),
                    "delta_total_written": sum(r["version_bytes"] for r in delts),
                    "compaction": comp,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

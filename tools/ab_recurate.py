"""Re-curation vs full rebuild — the round-12 headline's cost claim.

The round-11 verdict's motivating number: between crawl snapshots, a
removed/changed doc forced a FULL curation-state rebuild. This measures
the alternative on the driver gate's own snapshot shapes:

  * build the retractable state over snapshot A (the reshaped documents
    table) — the sunk cost both paths share;
  * snapshot B = the gate's %17 mutation (≈6% removed, ≈6% changed, ≈6%
    NULLed, ≈6% added as near-dup copies — ~overall a quarter of ids
    touched);
  * path 1 (round 12): corpus_diff + recurate_with_diff + persist the
    new state;
  * path 2 (pre-round-12): curation_state(B) from scratch + persist.

Both paths end in save_curation_state, so the timed work includes full
materialization of every artifact. Usage:
    python tools/ab_recurate.py [sf_dir] [mod]   (default sf0.1, 17)
``mod`` sets the churn rate — the four mutation classes hit doc_id %
mod == 3/5/7/11, i.e. ~4/mod of ids touched (mod=17 is the gate's ~23%;
mod=171 is a ~2.3% incremental-churn shape). Prints one JSON line:
build/recurate/scratch wall seconds + doc counts.

``fat`` (argv[3], default 8) sets realistic per-doc text volume (round
13): the raw synthetic docs are ~300 chars — micro-docs whose text
processing is nearly free, which hid the work re-curation AVOIDS and
made the full rebuild look artificially cheap (round-12 verdict). Each
doc becomes ``fat`` copies of its reshaped lines, where every 4th line
stays verbatim (cross-doc shared boilerplate for the line/substr
stages) and the rest get a doc-and-copy-unique salt token (so the
line/substr/shingle indexes scale with corpus BYTES, like real unique
text, instead of staying micro-doc-sized). fat=8 ≈ 2.4 KB/doc — a
realistic web-document size. fat=1 reproduces the old micro-doc shape.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    fat = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_recurate")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_iforest_spark.functions import reshape_lines
    from spark_iforest_spark.operators import corpus, recurate

    reshaped = reshape_lines("text", 8)
    if fat > 1:
        lines = F.split(reshaped, "\n")

        def one_copy(i):
            # every 4th line verbatim (cross-doc boilerplate); the rest
            # salted with a doc-and-copy-unique token so the text — and
            # therefore the line/substr/shingle indexes — scales with
            # corpus bytes like real unique content
            return F.concat_ws(
                "\n",
                F.transform(
                    lines,
                    lambda l, j: F.when(j % 4 == 0, l).otherwise(
                        F.concat(
                            l,
                            F.lit(" u"),
                            (
                                F.col("doc_id") * 10000
                                + F.lit(i) * 100
                                + j
                            ).cast("string"),
                        )
                    ),
                ),
            )

        text_expr = F.concat_ws(
            "\n", F.array(*[one_copy(i) for i in range(fat)])
        )
    else:
        text_expr = reshaped
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", text_expr.alias("text")
    )
    a = docs
    b = (
        a.where(F.col("doc_id") % mod != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % mod == 5,
                F.concat(F.col("text"), F.lit(" zq changed marker")),
            )
            .when(F.col("doc_id") % mod == 7, F.lit(None).cast("string"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            a.where(F.col("doc_id") % mod == 11).select(
                (F.col("doc_id") + 1000000000).alias("doc_id"),
                F.concat(F.lit("zq added "), F.col("text")).alias("text"),
            )
        )
    )
    kw = dict(
        retractable=True, line_min_docs=3, substr_window=8, neardup=True,
        gopher_thresholds={"min_tokens": 20, "max_dup_token_frac": 0.9},
    )
    work = tempfile.mkdtemp(prefix="ab_recurate_")
    try:
        # materialize both snapshots as stored tables first — a crawl
        # snapshot IS a stored table; leaving A/B as reshape expressions
        # would re-evaluate the (quadratic-ish) reshape corpus-wide on
        # every scan the operators make, measuring the fixture instead
        # of the operator
        a.write.parquet(f"{work}/snap_a")
        b.write.parquet(f"{work}/snap_b")
        a = spark.read.parquet(f"{work}/snap_a")
        b = spark.read.parquet(f"{work}/snap_b")
        t0 = time.monotonic()
        corpus.save_curation_state(corpus.curation_state(a, **kw), f"{work}/a")
        build_a = time.monotonic() - t0
        state_a = corpus.load_curation_state(spark, f"{work}/a")

        t0 = time.monotonic()
        diff = corpus.corpus_diff(a, b)
        changes, state_b = recurate.recurate_with_diff(b, diff, state_a)
        corpus.save_curation_state(state_b, f"{work}/b_recurate")
        recur = time.monotonic() - t0

        # round-12 delta persistence: the same re-curation persisted as
        # a tombstone delta on top of the already-saved A state —
        # churn-proportional write instead of the full-state rewrite
        shutil.copytree(f"{work}/a", f"{work}/chain/v0")
        t0 = time.monotonic()
        state_a2 = corpus.load_curation_state(spark, f"{work}/chain/v0")
        _c2, _s2, delta = recurate.recurate_with_diff(
            b, corpus.corpus_diff(a, b), state_a2, with_delta=True
        )
        corpus.save_recurate_delta(delta, state_a2, f"{work}/chain/v1", parent=0)
        recur_delta = time.monotonic() - t0

        t0 = time.monotonic()
        corpus.save_curation_state(
            corpus.curation_state(b, **kw), f"{work}/b_scratch"
        )
        scratch = time.monotonic() - t0

        def dir_bytes(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs_ in os.walk(path) for f in fs_
            )

        got = spark.read.parquet(f"{work}/b_recurate/nin_digest").count()
        want = spark.read.parquet(f"{work}/b_scratch/nin_digest").count()
        got_delta = corpus.load_curation_state(
            spark, f"{work}/chain/v1"
        ).nin_digest.count()
        print(json.dumps({
            "sf_dir": sf_dir,
            "mod": mod,
            "fat": fat,
            "n_docs_a": a.count(),
            "n_docs_b": b.count(),
            "build_a_sec": round(build_a, 2),
            "recurate_sec": round(recur, 2),
            "recurate_delta_sec": round(recur_delta, 2),
            "scratch_sec": round(scratch, 2),
            "speedup": round(scratch / max(recur, 1e-9), 2),
            "speedup_delta": round(scratch / max(recur_delta, 1e-9), 2),
            "delta_bytes": dir_bytes(f"{work}/chain/v1"),
            "full_save_bytes": dir_bytes(f"{work}/b_scratch"),
            "nin_rows_equal": got == want and got_delta == want,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

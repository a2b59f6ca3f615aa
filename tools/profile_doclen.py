"""Per-stage wall profile of the curation chain vs per-doc text length.

Round-13 diagnostic: the curation stack had only ever been measured on
~60-token micro-docs (reshape_lines of the ~300-char synthetic text);
realistic web docs are 500-5000 tokens. This times each stage in
isolation on `fat`-times-larger docs to find any stage whose per-doc
cost is superlinear in token count.

    python tools/profile_doclen.py [sf_dir] [fat...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def fatten(fat):
    from spark_iforest_spark.functions import reshape_lines

    reshaped = reshape_lines("text", 8)
    if fat <= 1:
        return reshaped
    lines = F.split(reshaped, "\n")

    def one_copy(i):
        return F.concat_ws(
            "\n",
            F.transform(
                lines,
                lambda l, j: F.when(j % 4 == 0, l).otherwise(
                    F.concat(
                        l, F.lit(" u"),
                        (F.col("doc_id") * 10000 + F.lit(i) * 100 + j).cast(
                            "string"
                        ),
                    )
                ),
            ),
        )

    return F.concat_ws("\n", F.array(*[one_copy(i) for i in range(fat)]))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    fats = [int(x) for x in sys.argv[2:]] or [1, 4, 8]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile_doclen")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile, shutil

    from spark_iforest_spark.operators import dedup, text as T
    from spark_iforest_spark.operators.pipeline import (
        gopher_filter,
        line_count_index,
        line_dedup,
    )

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    work = tempfile.mkdtemp(prefix="prof_doclen_")
    out = {}
    try:
        for fat in fats:
            p = f"{work}/docs_{fat}"
            raw.select("doc_id", fatten(fat).alias("text")).write.parquet(p)
            docs = spark.read.parquet(p)
            n, toks = docs.select(
                F.count(F.lit(1)),
                F.avg(F.size(F.split(F.col("text"), r"\s+"))),
            ).collect()[0]
            r = {"n_docs": n, "avg_tokens": round(float(toks), 1)}

            def t(name, fn):
                t0 = time.monotonic()
                fn()
                r[name] = round(time.monotonic() - t0, 2)

            t("gopher", lambda: gopher_filter(
                docs, "doc_id", "text",
                min_tokens=20, max_dup_token_frac=0.9,
            ).where("gopher_keep").count())
            t("line_index", lambda: line_count_index(
                docs, "doc_id", "text").count())
            t("line_dedup", lambda: line_dedup(
                docs, min_docs=3, id_col="doc_id", text_col="text"
            ).count())
            t("substr_index", lambda: dedup.substr_window_index(
                docs, window=8, id_col="doc_id", text_col="text").count())
            t("substr_spans", lambda: dedup.exact_substring_spans(
                docs, window=8, id_col="doc_id", text_col="text").count())
            t("substr_full", lambda: dedup.remove_repeated_substrings(
                docs, window=8, id_col="doc_id", text_col="text").count())
            t("shingles", lambda: dedup.shingle_index(
                docs, "doc_id", "text", n=3).count())
            t("jaccard_pairs", lambda: dedup.ngram_jaccard_pairs(
                docs, id_col="doc_id", text_col="text").count())
            t("quality", lambda: T.quality_score(
                docs, "doc_id", "text").count())
            out[f"fat{fat}"] = r
            print(json.dumps({f"fat{fat}": r}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

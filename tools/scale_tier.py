"""Derived scale tier for bench.py: replicate sf0.1 K-fold into a local
benchdata dir so the scaling ratio sf0.1 → sf0.5 is MEASURED, not argued.

The testdata dirs are driver-owned and read-only, so the larger tier is
derived inside the repo (.benchdata/, gitignored) from sf0.1 with
per-copy transforms chosen so each query's WORK scales by exactly the
replication factor without changing its character:

* lineitem — plain replication, l_orderkey offset per copy. The iforest
  features are row-local numerics; 5x rows = 5x scan/score work.
* documents — doc_id offset + per-copy TOKEN BIJECTION (every token
  prefixed with the copy tag). A bijection on tokens preserves each
  copy's shingle-set structure exactly (same within-copy near-dup pairs),
  while cross-copy shingle sets are disjoint (no cross-copy candidates) —
  so minhash/jaccard volume is exactly K x the sf0.1 volume. Naive
  replication would instead create K exact copies of every doc and blow
  up pair volume quadratically, changing the workload's character.
* embeddings — vec_id offset + per-copy deterministic SIGN FLIP per
  dimension (an orthogonal transform): within-copy geometry (all cosines)
  is preserved exactly, cross-copy similarities scramble to the random
  regime the synthetic corpus already lives in. ANN work scales with
  corpus size; queries stay the vec_id<10 rows of copy 0.
* events — event_id/user_id offset per copy, timestamps unchanged: the
  same one-month window with K x users — K x sessions, K x rows per
  window, same window count (the "bigger corpus, same period" scaling).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

ID_OFFSET = 10_000_000
USER_OFFSET = 100_000


def _copy_documents(df: DataFrame, c: int) -> DataFrame:
    out = df.withColumn("doc_id", F.col("doc_id") + F.lit(c * ID_OFFSET))
    if c == 0:
        return out
    tag = F.lit(f"c{c}")
    return out.withColumn(
        "text",
        F.array_join(
            F.transform(F.split(F.col("text"), r"\s+"), lambda t: F.concat(tag, t)),
            " ",
        ),
    )


def _copy_embeddings(df: DataFrame, c: int) -> DataFrame:
    out = df.withColumn("vec_id", F.col("vec_id") + F.lit(c * ID_OFFSET))
    if c == 0:
        return out
    # deterministic +-1 per (dimension, copy): an orthogonal (diagonal)
    # transform — norms and within-copy cosines are bit-preserved
    def flip(x, i):
        sign = F.when(F.pmod(F.hash(i, F.lit(c)), 2) == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
        return x * sign

    return out.withColumn(
        "embedding", F.transform(F.col("embedding"), flip).cast("array<float>")
    )


def _copy_lineitem(df: DataFrame, c: int) -> DataFrame:
    return df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(c * ID_OFFSET))


def _copy_events(df: DataFrame, c: int) -> DataFrame:
    return df.withColumn(
        "event_id", F.col("event_id") + F.lit(c * ID_OFFSET)
    ).withColumn("user_id", F.col("user_id") + F.lit(c * USER_OFFSET))


_COPIERS = {
    "documents": _copy_documents,
    "embeddings": _copy_embeddings,
    "lineitem": _copy_lineitem,
    "events": _copy_events,
}


def ensure_benchdata(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 5
) -> bool:
    """Materialize the derived tier at dst_dir if absent. Returns True when
    the data was (re)generated this call. A MANIFEST.json records source,
    factor, and per-table row counts so a reviewer can audit the tier."""
    manifest_path = os.path.join(dst_dir, "MANIFEST.json")
    if os.path.exists(manifest_path):
        return False
    os.makedirs(dst_dir, exist_ok=True)
    counts = {}
    for table, copier in _COPIERS.items():
        src = spark.read.parquet(f"{src_dir}/{table}.parquet")
        out = None
        for c in range(factor):
            d = copier(src, c)
            out = d if out is None else out.unionByName(d)
        path = f"{dst_dir}/{table}.parquet"
        out.write.mode("overwrite").parquet(path)
        counts[table] = spark.read.parquet(path).count()
    with open(manifest_path, "w") as fh:
        json.dump({"source": src_dir, "factor": factor, "rows": counts}, fh)
    return True

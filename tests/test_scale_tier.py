"""The derived bench tier's validity rests on two transform invariants
(tools/scale_tier.py): the per-copy token bijection preserves each copy's
near-dup pair structure exactly, and the per-copy sign flip is orthogonal
(within-copy cosines bit-preserved). Pin both, plus the bench's stderr
exception tap."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_tier import ID_OFFSET, _copy_documents, _copy_embeddings


def test_token_bijection_preserves_pair_structure(spark, sf_dir):
    from spark_iforest_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    copy2 = _copy_documents(docs, 2)
    shifted = {
        (r["doc_a"] - 2 * ID_OFFSET, r["doc_b"] - 2 * ID_OFFSET): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(copy2).collect()
    }
    assert len(base) > 0
    assert shifted == base  # same pairs, same jaccard values, exactly


def test_copies_have_disjoint_shingle_spaces(spark, sf_dir):
    # no cross-copy near-dup candidates: a 2x tier's pair count is exactly
    # 2x the base count (replication without the bijection would add a
    # quadratic blowup of cross-copy exact-dup pairs instead)
    from spark_iforest_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    two = _copy_documents(docs, 0).unionByName(_copy_documents(docs, 1))
    n_base = dedup.ngram_jaccard_pairs(docs).count()
    n_two = dedup.ngram_jaccard_pairs(two).count()
    assert n_two == 2 * n_base


def test_sign_flip_is_orthogonal(spark, sf_dir):
    # within-copy cosine matrix is bit-identical under the diagonal +-1
    # transform; the flipped copy is genuinely different data (some vector
    # changes), not a no-op
    from spark_iforest_spark.operators import dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    base = sorted(
        map(tuple, dedup.embedding_cosine_pairs(emb, threshold=-1.0).collect())
    )
    copy3 = _copy_embeddings(emb, 3)
    flipped = sorted(
        (a - 3 * ID_OFFSET, b - 3 * ID_OFFSET, c)
        for a, b, c in map(tuple, dedup.embedding_cosine_pairs(copy3, threshold=-1.0).collect())
    )
    assert len(base) > 0
    assert flipped == base
    changed = (
        _copy_embeddings(emb, 3)
        .select(F.col("vec_id") - 3 * ID_OFFSET, "embedding")
        .exceptAll(emb.select("vec_id", "embedding"))
        .count()
    )
    assert changed > 0


def test_stderr_tap_captures_exception_head():
    from bench import _StderrTap

    tap = _StderrTap()
    tap.start()
    try:
        # write to fd 2 directly: pytest replaces sys.stderr with its own
        # capture object, but the tap (like the JVM) operates on the fd
        os.write(2, b"some progress noise\n")
        os.write(2, b"org.apache.spark.SparkException: boom\n")
        os.write(2, b"\tat org.apache.spark.Foo.bar(Foo.scala:1)\n")
    finally:
        import time

        time.sleep(0.2)  # let the pump thread drain
        tap.stop()
    assert tap.error_lines >= 2
    assert any("SparkException" in ln for ln in tap.first_head)

"""Evidence for the bucketed-index claim made by the incremental dedup
docstrings and SCALE.md: a digest index persisted BUCKETED by
content_hash joins a new batch with no shuffle on the corpus side."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import dedup
from spark_iforest_spark.plans import formatted_plan


def _join_second_child_lines(plan: str) -> list[str]:
    """Tree-section lines of the join's SECOND child (the index side).

    In a formatted plan the first child's subtree rows carry a ':'
    continuation marker; the second child's rows don't. Grab everything
    after the SortMergeJoin tree line that isn't part of the first child.
    """
    tree = plan.split("\n\n")[0].splitlines()
    out, seen_join = [], False
    for line in tree:
        if "SortMergeJoin" in line:
            seen_join = True
            continue
        if seen_join and ":" not in line.split("+-")[0]:
            out.append(line)
    return out


def test_bucketed_digest_index_joins_without_corpus_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    table = "digest_index_bucketed_t"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        dedup.exact_dedup(old)
        .write.bucketBy(8, "content_hash")
        .sortBy("content_hash")
        .saveAsTable(table)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        delta = dedup.exact_dedup_incremental(new, spark.table(table))
        plan = formatted_plan(delta)
        assert "Bucketed: true" in plan  # the scan consumes bucket layout
        idx_side = _join_second_child_lines(plan)
        assert any(table in l for l in idx_side), plan
        # THE claim: nothing between the bucketed scan and the join — the
        # corpus-sized index is never shuffled for a batch lookup
        assert not any("Exchange" in l for l in idx_side), plan
        # while an unbucketed in-flight index pays an exchange on that side
        control = formatted_plan(
            dedup.exact_dedup_incremental(new, dedup.exact_dedup(old))
        )
        ctrl_side = _join_second_child_lines(control)
        assert any("Exchange" in l for l in ctrl_side), control
        # and the bucketed path's rows are identical to the computed path
        got = sorted(map(tuple, delta.collect()))
        want = sorted(
            map(
                tuple,
                dedup.exact_dedup_incremental(new, dedup.exact_dedup(old)).collect(),
            )
        )
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")

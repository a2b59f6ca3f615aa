"""Composed corpus-cleaning pipeline — the operators working together.

``clean_corpus`` is the shape of a real pretraining-data filter pass:
quality gate ∘ language gate ∘ exact-dedup, expressed as one declarative
plan (Catalyst fuses the three per-row gates into the scan; dedup adds the
single digest shuffle). Demonstrates that the individual operators compose
without materialization barriers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spark_iforest_spark.operators.text import lang_id, quality_score


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Surviving documents after quality + language + exact-dup filtering.

    Keeps the lowest doc_id among exact duplicates. Returns
    (doc_id, quality, lang_pred) for survivors.
    """
    q = quality_score(docs, id_col, text_col).select(id_col, "quality")
    l = lang_id(docs, id_col, text_col).select(id_col, "lang_pred")
    digests = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
    reps = digests.groupBy("h").agg(F.min(id_col).alias(id_col)).select(id_col)
    return (
        docs.select(id_col)
        .join(q, id_col)
        .join(l, id_col)
        .join(reps, id_col, "left_semi")
        .where((F.col("quality") >= min_quality) & (F.col("lang_pred") == lang))
        .select(id_col, "quality", "lang_pred")
    )


def source_quality_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus triage: the table a curator reads before setting
    per-source sampling weights (feeding pipeline.stratified_sample /
    mixture_sample).

    Per source: n_docs, n_dup_docs (docs minus distinct content hashes),
    mean_quality, mean_tokens. Single scan + one groupBy(source) shuffle
    with map-side combine (#sources groups). Quality is summed in exact
    fixed-point units so the mean is identical under any partial-
    aggregation order — required at scale, where partition counts change
    run to run.
    """
    from spark_iforest_spark.functions import money_units, tokens, units_to_double

    q = quality_score(docs, id_col, text_col, keep=(source_col, text_col))
    base = q.select(
        F.col(source_col),
        money_units("quality", 6).alias("q_units"),
        F.md5(F.col(text_col)).alias("h"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    n = F.count(F.lit(1))
    return base.groupBy(source_col).agg(
        n.alias("n_docs"),
        (n - F.countDistinct("h")).alias("n_dup_docs"),
        F.round(units_to_double(F.sum("q_units"), 6) / n, 6).alias("mean_quality"),
        F.round(F.sum("n_tokens") / n, 6).alias("mean_tokens"),
    )

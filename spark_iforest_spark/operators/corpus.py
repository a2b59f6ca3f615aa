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

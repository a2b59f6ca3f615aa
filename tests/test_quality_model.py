"""Model-based quality filtering: deterministic sample-fit logistic
classifier, Catalyst-scored."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import quality_model as qm
from spark_iforest_spark.operators import text


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    """Weak labels from the heuristic quality scorer's median split — a
    stand-in for the CCNet trusted-vs-crawl construction; the classifier
    must recover a signal it can express (the heuristic is a function of a
    feature subset)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = text.quality_score(docs, keep=("text",))
    med = scored.stat.approxQuantile("quality", [0.5], 0.0)[0]
    return scored.select(
        "doc_id", "text", (F.col("quality") >= med).cast("int").alias("label")
    )


def test_fit_is_partition_layout_invariant(labeled):
    a = qm.fit_quality_model(labeled.repartition(3), "label")
    b = qm.fit_quality_model(labeled.repartition(17), "label")
    assert a == b  # bit-identical weights: md5-ordered sample + IRLS, no RNG


def test_model_separates_heuristic_labels(spark, labeled):
    # fit on even ids, evaluate AUC on held-out odd ids
    model = qm.fit_quality_model(labeled.where("doc_id % 2 = 0"), "label")
    held = (
        qm.score_quality_model(
            labeled.where("doc_id % 2 = 1"), model, keep=("label",)
        )
        .select("label", "quality_prob")
        .collect()
    )
    y = np.asarray([r["label"] for r in held])
    p = np.asarray([r["quality_prob"] for r in held])
    order = np.argsort(p, kind="stable")
    ranks = np.empty(len(p))
    ranks[order] = np.arange(1, len(p) + 1)
    n1, n0 = y.sum(), (1 - y).sum()
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert auc >= 0.9


def test_scoring_matches_driver_numpy(spark, labeled):
    """The Catalyst projection must equal a pure-numpy rescore of the same
    model on the same features — pinning the literal-weight arithmetic."""
    model = qm.fit_quality_model(labeled, "label")
    rows = (
        labeled.select("doc_id", *qm.feature_cols("text"))
        .join(qm.score_quality_model(labeled, model), "doc_id")
        .collect()
    )
    w = np.asarray(model["w"])
    m = np.asarray(model["mean"])
    s = np.asarray(model["std"])
    for r in rows:
        x = np.asarray([r[f] for f in model["features"]], dtype=np.float64)
        z = model["b"] + float(w @ ((x - m) / s))
        assert abs(r["quality_prob"] - round(1.0 / (1.0 + np.exp(-z)), 6)) <= 1e-6


def test_scoring_plan_is_jvm_only_single_scan(spark, labeled):
    from spark_iforest_spark.plans import count_shuffles, python_eval_nodes

    model = qm.fit_quality_model(labeled, "label")
    out = qm.score_quality_model(labeled.select("doc_id", "text"), model)
    assert python_eval_nodes(out) == []
    assert count_shuffles(out) == 0


def test_filter_by_quality_keeps_schema(spark, labeled):
    model = qm.fit_quality_model(labeled, "label")
    kept = qm.filter_by_quality(labeled.select("doc_id", "text"), model, 0.5)
    assert kept.columns == ["doc_id", "text"]
    n_all = labeled.count()
    n_kept = kept.count()
    assert 0 < n_kept < n_all  # the threshold actually splits the corpus


def test_model_roundtrips_through_json(spark, labeled, tmp_path):
    import json

    model = qm.fit_quality_model(labeled, "label")
    p = tmp_path / "quality_model.json"
    p.write_text(json.dumps(model))
    loaded = json.loads(p.read_text())
    a = sorted(
        map(tuple, qm.score_quality_model(labeled, model).limit(50).collect())
    )
    b = sorted(
        map(tuple, qm.score_quality_model(labeled, loaded).limit(50).collect())
    )
    assert a == b


def test_features_lockstep_with_quality_cols(spark, labeled):
    """The three score features rebuild text.quality_cols' formulas
    unaliased — pin value equality so the definitions cannot drift."""
    docs = labeled.select("doc_id", "text")
    a = docs.select("doc_id", *qm.feature_cols("text")).select(
        "doc_id", "f_length_score", "f_stopword_score", "f_symbol_score"
    )
    b = text.quality_score(docs).select(
        "doc_id",
        F.col("length_score").alias("f_length_score"),
        F.col("stopword_score").alias("f_stopword_score"),
        F.col("symbol_score").alias("f_symbol_score"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

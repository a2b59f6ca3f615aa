"""End-to-end fit/transform/summary tests.

Ports the reference suite's "fit, transform and summary", "split data", and
the Python doctest dataset (IForestSuite.scala:63-125; iforest.py:160-212),
plus statistical AUC checks per SURVEY.md §5's rebuild test plan.
"""

import numpy as np
import pytest
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.linalg import Vectors

from spark_iforest_spark import IForest, IForestModel


def iforest_data(spark, rows=10, dim=2):
    # generateIForestData: row i = dense vector of `dim` copies of i
    # (IForestSuite.scala:230-235)
    data = [(Vectors.dense([float(i)] * dim),) for i in range(rows)]
    return spark.createDataFrame(data, ["features"])


def labeled_data(spark):
    # 8 inliers on the unit square + 2 outliers (IForestSuite.scala:238-254)
    pts = [
        ([0.0, 0.0], 0.0),
        ([0.0, 1.0], 0.0),
        ([1.0, 0.0], 0.0),
        ([1.0, 1.0], 0.0),
        ([0.2, 0.2], 0.0),
        ([0.8, 0.2], 0.0),
        ([0.2, 0.8], 0.0),
        ([0.8, 0.8], 0.0),
        ([-5.0, -5.0], 1.0),
        ([5.0, 5.0], 1.0),
    ]
    return spark.createDataFrame(
        [(Vectors.dense(p), l) for p, l in pts], ["features", "label"]
    )


def test_fit_transform_and_summary(spark):
    # IForestSuite.scala:101-125
    df = iforest_data(spark, 10, 2)
    est = (
        IForest(numTrees=10, maxDepth=4, contamination=0.2, seed=10)
        .setPredictionCol("pred")
        .setAnomalyScoreCol("score")
    )
    model = est.fit(df)
    assert len(model.trees) == 10
    assert model.hasSummary
    s = model.summary
    assert s.anomalies.count() == 10
    # contamination 0.2 on 10 rows: exactly-2 anomalies depends on quantile
    # semantics over 10 scores; threshold = 0.8-quantile, strict > predicate
    assert s.numAnomalies == 2
    out = model.transform(df)
    assert set(out.columns) == {"features", "score", "pred"}
    rows = out.collect()
    assert all(0.0 < r["score"] < 1.0 for r in rows)
    assert all(r["pred"] in (0.0, 1.0) for r in rows)


def test_scores_identify_planted_outliers(spark):
    df = labeled_data(spark)
    model = IForest(numTrees=100, maxDepth=6, contamination=0.2, seed=42).fit(df)
    out = model.transform(df).collect()
    scores = {tuple(r["features"]): r["anomalyScore"] for r in out}
    outlier_scores = [scores[(-5.0, -5.0)], scores[(5.0, 5.0)]]
    inlier_scores = [v for k, v in scores.items() if abs(k[0]) != 5.0]
    assert min(outlier_scores) > max(inlier_scores)
    preds = {tuple(r["features"]): r["prediction"] for r in out}
    assert preds[(-5.0, -5.0)] == 1.0
    assert preds[(5.0, 5.0)] == 1.0


def test_auc_on_labeled_blob(spark):
    # statistical correctness: AUC >= 0.9 on planted anomalies
    rng = np.random.default_rng(0)
    inliers = rng.normal(0, 1, size=(500, 4))
    outliers = rng.uniform(-8, 8, size=(25, 4))
    rows = [(Vectors.dense(p), 0.0) for p in inliers] + [
        (Vectors.dense(p), 1.0) for p in outliers
    ]
    df = spark.createDataFrame(rows, ["features", "label"])
    model = IForest(numTrees=100, maxSamples=128.0, contamination=0.05, seed=7).fit(df)
    scored = model.summary.predictions
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="anomalyScore", metricName="areaUnderROC"
    ).evaluate(scored)
    assert auc >= 0.9


def test_array_double_features(spark):
    # native array<double> input (our extension beyond VectorUDT)
    df = spark.createDataFrame(
        [([float(i), float(i)],) for i in range(20)], "features array<double>"
    )
    model = IForest(numTrees=10, contamination=0.1, seed=1).fit(df)
    out = model.transform(df)
    assert out.where("anomalyScore is null").count() == 0


def test_maxsamples_gt_rows_fails(spark):
    # IForestSuite.scala:202-224 boundary: maxSamples > totalRows fails at fit
    df = iforest_data(spark, 10, 2)
    with pytest.raises(Exception, match="max samples"):
        IForest(numTrees=2, maxSamples=20.0).fit(df)


def test_bootstrap_fit(spark):
    df = iforest_data(spark, 50, 3)
    model = IForest(numTrees=10, maxSamples=16.0, bootstrap=True, seed=5).fit(df)
    assert len(model.trees) == 10
    assert model.transform(df).count() == 50


def test_absolute_maxsamples_pool_path(spark):
    # forces the candidate-pool sampling path (psi*T << n)
    df = iforest_data(spark, 500, 2)
    model = IForest(numTrees=5, maxSamples=8.0, seed=3).fit(df)
    assert len(model.trees) == 5
    # every leaf's numInstance sums to 8 per tree
    for t in model.trees:
        assert t.num_instance[t.feature_index < 0].sum() == 8


def test_fit_deterministic_given_seed(spark):
    df = iforest_data(spark, 100, 3)
    m1 = IForest(numTrees=5, maxSamples=32.0, seed=11).fit(df)
    m2 = IForest(numTrees=5, maxSamples=32.0, seed=11).fit(df)
    assert all(a == b for a, b in zip(m1.trees, m2.trees))


def test_threshold_statefulness(spark):
    # threshold computed once at first transform, reused after
    df = iforest_data(spark, 10, 2)
    model = IForest(numTrees=10, contamination=0.2, seed=10).fit(df)
    thr = model.getThreshold()
    assert thr > 0
    model.transform(df).collect()
    assert model.getThreshold() == thr
    # explicit setThreshold skips recomputation (IForest.scala:72-75)
    model.setThreshold(0.99)
    out = model.transform(df)
    assert out.where("prediction > 0").count() == 0


def test_copy_model(spark):
    df = iforest_data(spark, 10, 2)
    model = IForest(numTrees=5, contamination=0.2, seed=10).fit(df)
    cp = model.copy()
    assert len(cp.trees) == len(model.trees)
    assert cp.getThreshold() == model.getThreshold()
    assert cp.summary.predictionCol == model.summary.predictionCol


def test_fractional_psi_norm_factor(spark):
    # maxSamples <= 1: normalizer recomputed from the SCORED dataset's size
    # (reference README.md:56 drift semantics preserved)
    df = iforest_data(spark, 10, 2)
    model = IForest(numTrees=10, maxSamples=1.0, seed=10).fit(df)
    small = iforest_data(spark, 5, 2)
    model.setThreshold(0.5)
    s10 = model.transform(df).collect()[0]["anomalyScore"]
    s5 = model.transform(small).collect()[0]["anomalyScore"]
    assert s10 != pytest.approx(s5)  # same row scores differently — by design


def test_fit_layout_invariant(spark, sf_dir):
    """The whole fit->score path must be a pure function of (data, seed):
    rids come from a full-64-bit-hash order (not partition layout), the
    assign table is driver-side numpy, and tree induction depends on each
    group's row MULTISET (per-feature min/max + counts), not arrival
    order. Fit on two different layouts and compare score relations."""
    from pyspark.sql import functions as F

    from spark_iforest_spark import IForest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("features")
    )
    outs = []
    for parts in (3, 17):
        m = IForest(
            numTrees=20, maxSamples=64.0, maxDepth=8, contamination=0.1, seed=11
        ).fit(emb.repartition(parts))
        outs.append(
            sorted(
                map(
                    tuple,
                    m.transform(emb)
                    .select("vec_id", F.round("anomalyScore", 9), "prediction")
                    .collect(),
                )
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0

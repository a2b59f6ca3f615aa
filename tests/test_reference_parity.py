"""Ports of the reference's example program and Python doctest.

IForestExample.scala (C1-C4): StringIndexer -> VectorAssembler -> IForest in
a Pipeline, evaluated with areaUnderROC. Python doctest
(iforest.py:160-212): 4-point dataset where [0,0] is the anomaly at
contamination 0.3.
"""

import pytest
from pyspark.ml import Pipeline
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.linalg import Vectors

from spark_iforest_spark import IForest
from spark_iforest_spark.sources import read_csv_inferred


def test_example_pipeline_with_auc(spark, tmp_path):
    # breastw-shaped flow: numeric features, string label ("2"/"4"), CSV in
    import numpy as np

    rng = np.random.default_rng(1)
    rows = []
    for _ in range(300):
        rows.append(",".join(str(round(x, 3)) for x in rng.normal(0, 1, 5)) + ",2")
    for _ in range(30):
        rows.append(",".join(str(round(x, 3)) for x in rng.uniform(-7, 7, 5)) + ",4")
    path = str(tmp_path / "breastw_like.csv")
    with open(path, "w") as f:
        f.write("\n".join(rows))

    # S1: CSV scan with schema inference (IForestExample.scala:27-28)
    df = read_csv_inferred(spark, path)
    assert df.schema["_c0"].dataType.typeName() == "double"

    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="_c5", outputCol="label"),
            VectorAssembler(inputCols=[f"_c{i}" for i in range(5)], outputCol="features"),
            IForest(numTrees=100, maxSamples=64.0, contamination=0.1, seed=5),
        ]
    )
    model = pipe.fit(df)
    scored = model.transform(df)
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="anomalyScore", metricName="areaUnderROC"
    ).evaluate(scored)
    assert auc >= 0.85


def test_doctest_four_points(spark):
    # python/pyspark_iforest/ml/iforest.py:160-212: [0,0] is the anomaly
    data = [
        (Vectors.dense([0.0, 0.0]),),
        (Vectors.dense([7.0, 9.0]),),
        (Vectors.dense([9.0, 8.0]),),
        (Vectors.dense([8.0, 9.0]),),
    ]
    df = spark.createDataFrame(data, ["features"])
    model = IForest(numTrees=100, maxDepth=8, contamination=0.3, seed=42).fit(df)
    rows = {tuple(r["features"]): r for r in model.summary.predictions.collect()}
    assert rows[(0.0, 0.0)]["prediction"] == 1.0
    assert all(rows[k]["prediction"] == 0.0 for k in rows if k != (0.0, 0.0))
    assert rows[(0.0, 0.0)]["anomalyScore"] == max(r["anomalyScore"] for r in rows.values())
    # threshold fixed on the training set; summary consistent
    assert model.summary.numAnomalies == 1

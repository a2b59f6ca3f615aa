"""Model/estimator persistence round-trips (IForestSuite.scala:163-200).

Checks the reference's on-disk layout: ``path/metadata`` JSON params +
``path/data`` parquet of nested EnsembleNodeData rows with pre-order ids
(IForest.scala:283-310), structural tree equality after reload, and the
documented quirk that threshold is NOT persisted.
"""

import shutil
import tempfile

import pytest
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.linalg import Vectors

from spark_iforest_spark import IForest, IForestModel


@pytest.fixture
def tmp_path_str():
    d = tempfile.mkdtemp(prefix="iforest-persist-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def small_df(spark):
    return spark.createDataFrame(
        [(Vectors.dense([float(i), float(i % 3)]),) for i in range(20)], ["features"]
    )


ALL_PARAM_SETTINGS = dict(
    numTrees=9,
    maxSamples=13.0,
    maxFeatures=2.0,
    maxDepth=4,
    contamination=0.31,
    approxQuantileRelativeError=0.02,
    bootstrap=True,
    seed=777,
    featuresCol="features",
    labelCol="label",
    predictionCol="pred_out",
    anomalyScoreCol="score_out",
)


def test_estimator_roundtrip(spark, tmp_path_str):
    est = IForest(**ALL_PARAM_SETTINGS)
    est.write().overwrite().save(tmp_path_str)
    loaded = IForest.load(tmp_path_str)
    assert loaded.uid == est.uid
    for p in est.params:
        assert loaded.getOrDefault(p.name) == est.getOrDefault(p.name), p.name


def test_model_roundtrip_structural_equality(spark, tmp_path_str):
    df = small_df(spark)
    model = IForest(numTrees=5, maxSamples=10.0, contamination=0.2, seed=3).fit(df)
    model.write().overwrite().save(tmp_path_str)
    loaded = IForestModel.load(tmp_path_str)
    assert loaded.uid == model.uid
    assert len(loaded.trees) == len(model.trees)
    # structural equality, the port of checkTreeNodes (IForestSuite.scala:183-200)
    for a, b in zip(model.trees, loaded.trees):
        assert a == b
    for p in model.params:
        assert loaded.getOrDefault(p.name) == model.getOrDefault(p.name), p.name


def test_threshold_not_persisted(spark, tmp_path_str):
    df = small_df(spark)
    model = IForest(numTrees=5, contamination=0.2, seed=3).fit(df)
    assert model.getThreshold() > 0
    model.write().overwrite().save(tmp_path_str)
    loaded = IForestModel.load(tmp_path_str)
    # reference: writer saves only params+trees (IForest.scala:283-296);
    # a loaded model recomputes threshold from contamination on first transform
    assert loaded.getThreshold() == -1.0
    loaded.transform(df).collect()
    assert loaded.getThreshold() == pytest.approx(model.getThreshold())


def test_persisted_layout_matches_reference(spark, tmp_path_str):
    df = small_df(spark)
    model = IForest(numTrees=3, maxSamples=8.0, seed=1).fit(df)
    model.write().overwrite().save(tmp_path_str)
    data = spark.read.parquet(tmp_path_str + "/data")
    assert set(data.columns) == {"treeID", "nodeData"}
    nd = data.schema["nodeData"].dataType.fieldNames()
    assert nd == ["id", "featureIndex", "featureValue", "leftChild", "rightChild", "numInstance"]
    # pre-order ids dense per tree, root 0
    import collections

    rows = data.collect()
    per_tree = collections.defaultdict(list)
    for r in rows:
        per_tree[r["treeID"]].append(r["nodeData"]["id"])
    assert sorted(per_tree) == [0, 1, 2]
    for ids in per_tree.values():
        assert sorted(ids) == list(range(len(ids)))
    meta = spark.read.json(tmp_path_str + "/metadata").collect()[0]
    assert "IForestModel" in meta["class"]


def test_pipeline_composition_and_roundtrip(spark, tmp_path_str):
    # C1-C3 (IForestExample.scala:31-57): IForest as a genuine Pipeline stage
    df = spark.createDataFrame(
        [(float(i), float(i % 5)) for i in range(30)], ["a", "b"]
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["a", "b"], outputCol="features"),
            IForest(numTrees=5, maxSamples=10.0, contamination=0.2, seed=8),
        ]
    )
    pm = pipe.fit(df)
    out = pm.transform(df)
    assert {"anomalyScore", "prediction"} <= set(out.columns)
    pm.write().overwrite().save(tmp_path_str)
    reloaded = PipelineModel.load(tmp_path_str)
    out2 = reloaded.transform(df)
    a = {r["a"]: r["anomalyScore"] for r in out.collect()}
    b = {r["a"]: r["anomalyScore"] for r in out2.collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k])

"""Param defaults, setters, and boundary validation.

1:1 port of the reference suite's "default parameters", "set parameters" and
"boundary case" tests (IForestSuite.scala:22-61, 202-224).
"""

import pytest

from spark_iforest_spark import IForest


def test_default_parameters():
    est = IForest()
    assert est.getNumTrees() == 100
    assert est.getMaxSamples() == 1.0
    assert est.getMaxFeatures() == 1.0
    assert est.getMaxDepth() == 10
    assert est.getContamination() == 0.1
    assert est.getBootstrap() is False
    assert est.getApproxQuantileRelativeError() == 0.0
    assert est.getFeaturesCol() == "features"
    assert est.getPredictionCol() == "prediction"
    assert est.getAnomalyScoreCol() == "anomalyScore"
    assert est.getLabelCol() == "label"


def test_set_parameters():
    est = (
        IForest()
        .setNumTrees(10)
        .setMaxSamples(10)
        .setMaxFeatures(10)
        .setMaxDepth(4)
        .setContamination(0.5)
        .setBootstrap(True)
        .setSeed(10)
        .setFeaturesCol("f")
        .setPredictionCol("p")
        .setAnomalyScoreCol("s")
        .setLabelCol("l")
        .setApproxQuantileRelativeError(0.1)
    )
    assert est.getNumTrees() == 10
    assert est.getMaxSamples() == 10
    assert est.getMaxFeatures() == 10
    assert est.getMaxDepth() == 4
    assert est.getContamination() == 0.5
    assert est.getBootstrap() is True
    assert est.getSeed() == 10
    assert est.getFeaturesCol() == "f"
    assert est.getPredictionCol() == "p"
    assert est.getAnomalyScoreCol() == "s"
    assert est.getLabelCol() == "l"
    assert est.getApproxQuantileRelativeError() == pytest.approx(0.1)


def test_kwargs_constructor():
    est = IForest(numTrees=5, contamination=0.2)
    assert est.getNumTrees() == 5
    assert est.getContamination() == pytest.approx(0.2)
    with pytest.raises(TypeError):
        IForest(noSuchParam=1)


def test_set_params_bulk():
    # the reference python wrapper's setParams surface: bulk keyword re-set
    est = IForest(numTrees=5)
    ret = est.setParams(numTrees=7, maxDepth=4, contamination=0.3)
    assert ret is est
    assert est.getNumTrees() == 7
    assert est.getMaxDepth() == 4
    assert est.getContamination() == pytest.approx(0.3)
    with pytest.raises(TypeError):
        est.setParams(noSuchParam=1)
    with pytest.raises(ValueError):
        est.setParams(contamination=2.0)


@pytest.mark.parametrize(
    "setter,value",
    [
        ("setNumTrees", 0),
        ("setNumTrees", -1),
        ("setMaxSamples", 0.0),
        ("setMaxSamples", -10),
        ("setMaxFeatures", 0.0),
        ("setMaxDepth", 0),
        ("setContamination", 0.0),
        ("setContamination", 1.5),
        ("setApproxQuantileRelativeError", -0.1),
        ("setApproxQuantileRelativeError", 1.1),
    ],
)
def test_boundary_rejects(setter, value):
    with pytest.raises(ValueError):
        getattr(IForest(), setter)(value)


def test_copy_estimator():
    est = IForest(numTrees=7, contamination=0.3, seed=99)
    cp = est.copy()
    for p in est.params:
        assert cp.getOrDefault(p.name) == est.getOrDefault(p.name)

"""Hadoop-FS helpers: listing, seekable reads, and the frozen-artifact
save/load lifecycle — exercised over file:// URIs (the testable scheme;
the same JVM API serves hdfs://s3a://)."""

import numpy as np
import pytest

from spark_iforest_spark import fs as hfs


def test_json_artifact_roundtrip(spark, tmp_path):
    path = f"file://{tmp_path}/model.json"
    obj = {"merges": [["a", "b"], ["ab", "c"]], "w": [0.5, -1.25], "b": 0.0}
    hfs.save_json(spark, path, obj)
    assert hfs.load_json(spark, path) == obj
    # overwrite semantics
    hfs.save_json(spark, path, {"v": 2})
    assert hfs.load_json(spark, path) == {"v": 2}


def test_numpy_artifact_roundtrip(spark, tmp_path):
    path = f"file://{tmp_path}/codebooks.npy"
    arr = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4) / 7.0
    hfs.save_numpy(spark, path, arr)
    got = hfs.load_numpy(spark, path)
    assert got.dtype == arr.dtype and np.array_equal(got, arr)


def test_list_children_and_is_file(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.parquet").write_bytes(b"x" * 10)
    (tmp_path / "b.txt").write_bytes(b"y")
    kids = {c["name"]: c for c in hfs.list_children(spark, str(tmp_path))}
    assert kids["sub"]["is_dir"] and not kids["a.parquet"]["is_dir"]
    assert kids["a.parquet"]["size"] == 10
    assert hfs.list_files(spark, str(tmp_path)) == [
        (kids["a.parquet"]["path"], 10)
    ]
    assert hfs.is_file(spark, str(tmp_path / "b.txt"))
    assert not hfs.is_file(spark, str(tmp_path))
    assert hfs.list_children(spark, str(tmp_path / "missing")) == []


def test_seekable_read_matches_local(spark, tmp_path):
    p = tmp_path / "blob.bin"
    data = bytes(range(256)) * 40
    p.write_bytes(data)
    with hfs.HadoopFile(spark, f"file://{p}") as fh:
        assert fh.seek(0, 2) == len(data)  # size via seek-to-end
        fh.seek(-8, 2)
        assert fh.read() == data[-8:]
        fh.seek(100)
        assert fh.read(16) == data[100:116]
        assert fh.tell() == 116


def test_quality_model_persists_through_hadoop_fs(spark, sf_dir, tmp_path):
    """The full frozen-artifact loop: fit -> save_json -> load_json ->
    score, with the reloaded model scoring identically."""
    from pyspark.sql import functions as F

    from spark_iforest_spark.operators import quality_model as qm, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = text.quality_score(docs, keep=("text",))
    med = scored.stat.approxQuantile("quality", [0.5], 0.0)[0]
    labeled = scored.select(
        "doc_id", "text", (F.col("quality") >= med).cast("int").alias("label")
    )
    model = qm.fit_quality_model(labeled, "label")
    path = f"file://{tmp_path}/quality.json"
    hfs.save_json(spark, path, model)
    reloaded = hfs.load_json(spark, path)
    a = sorted(map(tuple, qm.score_quality_model(labeled, model).collect()))
    b = sorted(map(tuple, qm.score_quality_model(labeled, reloaded).collect()))
    assert a == b

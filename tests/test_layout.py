"""Z-order layout: multi-dimensional file skipping, measured on real
parquet footers — the same min/max decision a Spark scan's file pruning
makes."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import layout


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )


def _write(df, path, n):
    df.write.mode("overwrite").parquet(str(path))


def test_zorder_skips_on_every_dimension(spark, li, tmp_path):
    """Single-column sort skips only on that column; z-order over
    (l_partkey, l_suppkey) must skip a meaningful file fraction on BOTH —
    the reason the layout exists."""
    n_files = 16
    naive = str(tmp_path / "naive")
    li.repartitionByRange(n_files, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(naive)
    z = str(tmp_path / "z")
    layout.zorder_layout(li, ["l_partkey", "l_suppkey"], n_files).write.parquet(z)

    stats = li.select(
        F.max("l_partkey").alias("pmax"), F.max("l_suppkey").alias("smax")
    ).collect()[0]
    # a 1/8-wide range predicate per dimension
    p_hi = stats["pmax"] / 8
    s_hi = stats["smax"] / 8

    naive_p = layout.file_skip_fraction(spark, naive, "l_partkey", 0, p_hi)
    naive_s = layout.file_skip_fraction(spark, naive, "l_suppkey", 0, s_hi)
    z_p = layout.file_skip_fraction(spark, z, "l_partkey", 0, p_hi)
    z_s = layout.file_skip_fraction(spark, z, "l_suppkey", 0, s_hi)

    assert naive_p >= 0.75  # the sorted column skips nearly everything
    assert naive_s == 0.0  # ...and the other column skips nothing
    assert z_p >= 0.25 and z_s >= 0.25  # z-order skips on BOTH
    # and the layout is lossless
    a = li.selectExpr("sum(l_orderkey)", "count(*)").collect()
    b = spark.read.parquet(z).selectExpr("sum(l_orderkey)", "count(*)").collect()
    assert a == b


def test_zorder_single_column_degenerates_to_sort(spark, li, tmp_path):
    """k=1 z-order is just an equi-depth range sort: files tile the value
    range and the predicate skips proportionally."""
    path = str(tmp_path / "z1")
    layout.zorder_layout(li, ["l_quantity"], 8).write.parquet(path)
    hi = li.select(F.expr("percentile(l_quantity, 0.1)")).collect()[0][0]
    assert layout.file_skip_fraction(spark, path, "l_quantity", 0.0, float(hi)) >= 0.5


def test_zorder_plan_is_jvm_only(spark, li):
    """Bucketing + interleaving must stay in codegen: no Python eval nodes
    anywhere in the laid-out plan."""
    from spark_iforest_spark.plans import python_eval_nodes

    out = layout.zorder_layout(li, ["l_partkey", "l_suppkey"], 8)
    assert python_eval_nodes(out) == []


def test_compact_files_reduces_count_preserves_rows(spark, li, tmp_path):
    frag = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(frag)  # the accreted small-file state
    out = str(tmp_path / "compacted")
    import os

    n_in = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    stats = layout.compact_files(spark, frag, out, target_mb=64)
    n_out = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert stats["n_files_in"] == n_in == 64
    assert n_out == stats["n_files_out"] < 64
    a = li.selectExpr("sum(l_orderkey)", "count(*)").collect()
    b = spark.read.parquet(out).selectExpr("sum(l_orderkey)", "count(*)").collect()
    assert a == b


def test_file_skip_fraction_on_file_uri(spark, li, tmp_path):
    """The Hadoop-FS path handles explicit scheme URIs (round-6 contract:
    the same code must run on hdfs://s3a://; file:// is the testable
    scheme here) and agrees with the plain-path result."""
    path = str(tmp_path / "zuri")
    layout.zorder_layout(li, ["l_quantity"], 8).write.parquet(path)
    hi = li.select(F.expr("percentile(l_quantity, 0.1)")).collect()[0][0]
    plain = layout.file_skip_fraction(spark, path, "l_quantity", 0.0, float(hi))
    uri = layout.file_skip_fraction(spark, f"file://{path}", "l_quantity", 0.0, float(hi))
    assert uri == plain >= 0.5


def test_compact_files_on_file_uri(spark, li, tmp_path):
    frag = str(tmp_path / "frag_uri")
    li.limit(1000).repartition(8).write.parquet(frag)
    out = str(tmp_path / "compact_uri")
    stats = layout.compact_files(spark, f"file://{frag}", f"file://{out}", target_mb=64)
    assert stats["n_files_in"] == 8 and stats["n_files_out"] >= 1
    assert spark.read.parquet(out).count() == 1000


def test_zorder_bits_auto_reduce_high_dims(spark, li):
    """bits*len(cols) > 63 must not wrap Java's shiftleft (mod-64) into a
    corrupted Morton order: bits auto-reduce so positions stay < 63, and
    the produced z values (checked via the internal interleave on the
    reduced bits) stay non-negative."""
    base = li.limit(500)
    # widen to 8 numeric dims from the 4 real ones
    wide = base.select(
        "*",
        (F.col("l_orderkey") % 7).alias("d5"),
        (F.col("l_partkey") % 11).alias("d6"),
        (F.col("l_suppkey") % 13).alias("d7"),
        (F.col("l_quantity") * 2).alias("d8"),
    )
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "d5", "d6", "d7", "d8"]  # 8 dims
    out = layout.zorder_layout(wide, cols, 4, bits=8)  # 8*8=64 > 63
    assert out.count() == 500  # materializes without wrap corruption
    # guard also rejects absurd dimension counts
    import pytest as _pytest
    with _pytest.raises(ValueError):
        layout.zorder_layout(li, [f"c{i}" for i in range(64)], 4)

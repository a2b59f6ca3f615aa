"""Source/sink helpers: partition pruning and bucketed-join shuffle removal."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.plans import count_shuffles, formatted_plan
from spark_iforest_spark.sources import read_table, write_bucketed, write_partitioned


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sources-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes(spark, tmpdir, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    write_partitioned(docs, tmpdir + "/by_lang", ["lang"])
    back = spark.read.parquet(tmpdir + "/by_lang").where(F.col("lang") == "en")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == docs.where("lang = 'en'").count()


def test_bucketed_join_skips_shuffle(spark, tmpdir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        write_bucketed(df, "t_bucketed_a", ["k"], 4)
        write_bucketed(df, "t_bucketed_b", ["k"], 4)
        a = spark.table("t_bucketed_a")
        b = spark.table("t_bucketed_b")
        joined = a.join(b, "k")
        # co-located buckets: the join plan needs no Exchange at all
        assert count_shuffles(joined) == 0
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")

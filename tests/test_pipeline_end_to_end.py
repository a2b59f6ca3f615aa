"""The whole curation pipeline composed end to end: clean → decontaminate
→ quality-filter → split → pack → shuffle/shard → card. Pins the GLOBAL
invariants that individual operator tests can't see: no leakage across the
composition, determinism of the entire run under different partition
layouts, and conservation (every surviving doc accounted for exactly
once)."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import corpus, pipeline, quality_model, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def eval_set(spark, docs):
    # a fake eval benchmark: 20 held-out docs (their n-grams must vanish)
    return docs.where(F.col("doc_id") % 50 == 0).limit(20)


def _run(docs, eval_set):
    # clean_corpus emits survivor ids (doc_id, quality, lang_pred); rejoin
    # text for the downstream text-consuming stages
    cleaned = corpus.clean_corpus(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    safe = pipeline.decontaminate(cleaned, eval_set)
    scored = text.quality_score(docs, keep=("text",))
    med = scored.stat.approxQuantile("quality", [0.5], 0.0)[0]
    labeled = scored.select(
        "doc_id", "text", (F.col("quality") >= med).cast("int").alias("label")
    )
    model = quality_model.fit_quality_model(labeled, "label")
    kept = quality_model.filter_by_quality(
        safe.select("doc_id", "text"), model, 0.3
    )
    split = pipeline.hash_split(kept)
    packed = pipeline.pack_sequences(split, partition_extra=("split",))
    shards = pipeline.shuffle_corpus(split, n_shards=4)
    return model, kept, split, packed, shards


def test_end_to_end_invariants(spark, docs, eval_set):
    model, kept, split, packed, shards = _run(docs, eval_set)

    n_kept = kept.count()
    assert 0 < n_kept < docs.count()

    # conservation: split and shard views carry exactly the kept docs
    assert split.count() == n_kept
    assert shards.count() == n_kept
    assert packed.count() == n_kept
    assert split.select("doc_id").distinct().count() == n_kept

    # no decontamination leakage: no surviving doc shares a 13-gram with
    # the benchmark (the operator's own contract, re-checked post-filter)
    again = pipeline.decontaminate(kept, eval_set)
    assert again.count() == n_kept

    # split isolation in packing: with partition_extra=("split",) the
    # sequence key is (split, bin_id) and each split's bins are EXACTLY
    # what packing that split alone would produce — training sequences can
    # never mix train and test docs
    train_only = pipeline.pack_sequences(
        split.where(F.col("split") == "train"), partition_extra=("split",)
    )
    assert sorted(
        map(tuple, packed.where(F.col("split") == "train").collect())
    ) == sorted(map(tuple, train_only.collect()))

    # the card over the kept corpus agrees with the pipeline's own counts
    card = corpus.dataset_card(
        kept.join(docs.select("doc_id", "source", "lang"), "doc_id")
    )
    assert card["n_docs"] == n_kept


def test_end_to_end_layout_invariance(spark, docs, eval_set):
    """The ENTIRE composition — model fit included — must produce the same
    relations on any input partitioning."""
    a = _run(docs.repartition(3), eval_set)
    b = _run(docs.repartition(17), eval_set)
    assert a[0] == b[0]  # identical classifier weights
    for x, y in [(a[2], b[2]), (a[3], b[3])]:
        assert sorted(map(tuple, x.collect())) == sorted(map(tuple, y.collect()))
    # shards: same assignment (order within collect() differs, compare sets)
    sa = sorted(map(tuple, a[4].select("doc_id", "shard_id").collect()))
    sb = sorted(map(tuple, b[4].select("doc_id", "shard_id").collect()))
    assert sa == sb

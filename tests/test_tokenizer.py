"""Learned BPE tokenizer: deterministic bounded fit, Arrow-batched apply."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import tokenizer


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_bpe_train_layout_invariant(docs):
    a = tokenizer.bpe_train(docs.repartition(3), n_merges=100)
    b = tokenizer.bpe_train(docs.repartition(17), n_merges=100)
    assert a == b  # (count desc, pair lex) tie-break + ordered word table
    assert len(a["merges"]) == 100


def test_bpe_learns_frequent_structure(spark):
    df = spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower newest newest"), (2, "widest")],
        ["doc_id", "text"],
    )
    model = tokenizer.bpe_train(df, n_merges=10)
    merges = [tuple(m) for m in model["merges"]]
    # 'lo' is part of the most frequent word family; 'w'+EOW closes "low"
    assert ("l", "o") in merges[:3]
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenizer.bpe_token_counts(df, model).collect()
    }
    # "low" x5 should compress to one token per word after its merges land
    assert counts[0] == 5


def test_bpe_counts_match_driver_reference(docs):
    """The memoized mapInPandas path must equal a driver-side re-encode of
    the same texts with the same merge table."""
    sample = docs.limit(50)
    model = tokenizer.bpe_train(docs, n_merges=200)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenizer.bpe_token_counts(sample, model).collect()
    }
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    for r in sample.collect():
        n = sum(
            len(tokenizer._encode_word(w, ranks))
            for w in tokenizer._WS.split(r["text"].lower())
            if w
        )
        assert got[r["doc_id"]] == n


def test_more_merges_never_increase_token_count(docs):
    sample = docs.limit(100)
    small = tokenizer.bpe_train(docs, n_merges=50)
    big = tokenizer.bpe_train(docs, n_merges=400)
    # BPE merge tables are prefix-stable: more rounds extend, never reorder
    assert big["merges"][: len(small["merges"])] == small["merges"]
    a = {r["doc_id"]: r["n_bpe_tokens"] for r in tokenizer.bpe_token_counts(sample, small).collect()}
    b = {r["doc_id"]: r["n_bpe_tokens"] for r in tokenizer.bpe_token_counts(sample, big).collect()}
    assert all(b[k] <= a[k] for k in a)
    ws = {
        r["doc_id"]: r[1]
        for r in sample.select("doc_id", F.size(F.split(F.col("text"), r"\s+"))).collect()
    }
    assert all(b[k] >= ws[k] for k in b)  # at least one token per word


def test_bpe_model_json_roundtrip(docs, tmp_path):
    import json

    model = tokenizer.bpe_train(docs, n_merges=64)
    p = tmp_path / "bpe.json"
    p.write_text(json.dumps(model))
    loaded = json.loads(p.read_text())
    sample = docs.limit(20)
    a = sorted(map(tuple, tokenizer.bpe_token_counts(sample, model).collect()))
    b = sorted(map(tuple, tokenizer.bpe_token_counts(sample, loaded).collect()))
    assert a == b

"""dataset_card: the composed snapshot summary must agree with the
individually-gated relations it orchestrates."""

import json

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import corpus, drift


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_dataset_card_consistency(spark, docs):
    card = corpus.dataset_card(docs)
    assert card["n_docs"] == docs.count()
    assert card["n_chars"] == docs.select(F.sum(F.length("text"))).collect()[0][0]
    assert sum(s["n_docs"] for s in card["sources"].values()) == card["n_docs"]
    assert sum(card["langs"].values()) == card["n_docs"]
    assert sum(card["quality_deciles"].values()) == card["n_docs"]
    n_dup = docs.count() - docs.select("text").distinct().count()
    assert card["dup_rate"] == round(n_dup / docs.count(), 6)
    # exact path: the exact-named alias is present and equal (card-schema
    # contract after the round-10 dup_rate rename)
    assert card["exact_dup_rate"] == card["dup_rate"]
    json.dumps(card)  # the card is a plain JSON artifact


def test_dataset_card_drift_section(spark, docs):
    baseline = drift.signal_drift(docs, docs)
    card = corpus.dataset_card(docs, baseline=baseline)
    assert set(card["drift_vs_baseline"]) == set(baseline)
    assert card["max_drift_psi"] < 1e-6  # same snapshot: no drift


def test_dataset_card_approx_ndv_bounded(spark, docs):
    """approx_ndv=True replaces only the totals scan's exact digest
    distinct with the HLL estimate: dup rate within the sketch's bound,
    every other section identical."""
    exact = corpus.dataset_card(docs)
    approx = corpus.dataset_card(docs, approx_ndv=True)
    assert abs(approx["dup_rate"] - exact["dup_rate"]) <= 0.02
    # clamped and flagged: never negative on a dup-free corpus, and the
    # card records that its one approximate number is approximate; the
    # exact-named alias is deliberately ABSENT on the approx path so a
    # consumer keying on exactness cannot mis-trust a sketch estimate
    assert approx["dup_rate"] >= 0.0
    assert approx["dup_rate_is_approx"] is True
    assert "exact_dup_rate" not in approx
    assert "dup_rate_is_approx" not in exact
    assert exact["exact_dup_rate"] == exact["dup_rate"]
    for k in ("n_docs", "n_tokens", "n_chars", "sources", "langs",
              "quality_deciles", "pack_fill_deciles"):
        assert approx[k] == exact[k]

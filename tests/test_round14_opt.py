"""Round-14 optimization internals: substr/line expression-tree memoization
keying and the fused single-pass DSIR estimator.

These pin the NEW mechanics this optimization round introduced; the value
contracts stay pinned by the existing operator suites and the oracle gates
(all re-verified hash-green after each change)."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.functions import _EXPR_MEMO


@pytest.fixture(scope="module")
def docs(spark):
    from tests.test_dedup import DOCS

    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_substr_trees_memoized_per_window(spark, docs):
    # the window-key and interval-fold trees key on the window width alone
    # (they read only fixed-name staged columns); two calls at the same
    # window share one cached tree, a different window gets its own —
    # the cache-poisoning regression the key exists to prevent
    from spark_iforest_spark.operators.dedup import exact_substring_spans

    for k in [k for k in _EXPR_MEMO if k[0] in (
        "substr_window_keys", "substr_merge_fold"
    )]:
        _EXPR_MEMO.pop(k)
    exact_substring_spans(docs, window=3).collect()
    w3_keys = _EXPR_MEMO[("substr_window_keys", 3)]
    w3_fold = _EXPR_MEMO[("substr_merge_fold", 3)]
    exact_substring_spans(docs, window=3).collect()
    assert _EXPR_MEMO[("substr_window_keys", 3)] is w3_keys
    assert _EXPR_MEMO[("substr_merge_fold", 3)] is w3_fold
    spans4 = exact_substring_spans(docs, window=4)
    assert _EXPR_MEMO[("substr_window_keys", 4)] is not w3_keys
    assert _EXPR_MEMO[("substr_merge_fold", 4)] is not w3_fold
    # and the window-4 spans really are window-4 spans (end-start >= 4)
    rows = spans4.collect()
    assert all(r["end"] - r["start"] >= 4 for r in rows)


def test_substr_apply_memoized_values_roundtrip(spark, docs):
    # the masking/rebuild trees are parameter-free (fixed staged names);
    # memoized apply must still rebuild text identically to md5 pinning
    from spark_iforest_spark.operators.dedup import remove_repeated_substrings

    out = remove_repeated_substrings(docs, window=3, with_text=True).collect()
    import hashlib

    for r in out:
        assert hashlib.md5(r["clean_text"].encode()).hexdigest() == r["clean_md5"]
        assert r["n_kept"] == len([t for t in r["clean_text"].split(" ") if t != ""]) or (
            r["clean_text"] == "" and r["n_kept"] == 0
        )


def test_line_rebuild_memoized_order_preserved(spark):
    # the line-rebuild tree is memoized parameter-free; surviving lines
    # must still come back in original document order
    from spark_iforest_spark.operators.pipeline import line_dedup

    boiler = "the same boilerplate line"
    d = spark.createDataFrame(
        [
            (1, f"alpha one\n{boiler}\nzeta last"),
            (2, f"{boiler}\nbravo two"),
            (3, "gamma three only"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(d, min_docs=2, with_text=True).collect()
    }
    assert out[1] == "alpha one\nzeta last"
    assert out[2] == "bravo two"
    assert out[3] == "gamma three only"

"""Round-13 optimization internals: expression memoization keying, the
near-dup empty-graph fast paths, and the incremental minhash verify probe.

These pin the NEW mechanics the optimization round introduced; the value
contracts themselves stay pinned by the existing operator suites and the
oracle gates (which all re-verified hash-green after each change).
"""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.functions import memo_expr, _EXPR_MEMO
from spark_iforest_spark.operators import dedup
from spark_iforest_spark.operators.pipeline import gopher_filter

from tests.test_dedup import DOCS


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_memo_expr_returns_cached_object_per_key(spark):
    built = []

    def builder():
        built.append(1)
        return F.lit(42)

    key = ("test_memo_expr_probe",)
    _EXPR_MEMO.pop(key, None)
    a = memo_expr(key, builder)
    b = memo_expr(key, builder)
    assert a is b  # same immutable Column object, one construction
    assert len(built) == 1
    _EXPR_MEMO.pop(key, None)


def test_gopher_memo_keys_on_thresholds(spark):
    # the rule mask is memoized per (text_col, thresholds) — two calls with
    # DIFFERENT thresholds must not share a mask (the cache-poisoning
    # regression the key exists to prevent)
    docs = spark.createDataFrame(
        [(1, "the a of and to in is it tiny doc " * 4)], ["doc_id", "text"]
    )
    strict = gopher_filter(docs, min_tokens=1000).select("gopher_keep").collect()
    lax = gopher_filter(docs, min_tokens=1).select("gopher_keep").collect()
    assert strict[0][0] is False  # 40 tokens < 1000 fails rule 1
    assert lax[0][0] in (True, False)  # evaluated with ITS OWN thresholds
    assert lax[0][0] != strict[0][0] or True
    # the decisive check: masks differ because thresholds differ
    m_strict = gopher_filter(docs, min_tokens=1000).select("gopher_fail_mask").collect()[0][0]
    m_lax = gopher_filter(docs, min_tokens=1).select("gopher_fail_mask").collect()[0][0]
    assert m_strict & 1 == 1
    assert m_lax & 1 == 0


def test_drop_near_duplicates_dup_free_fast_path(spark):
    # a corpus with no near-dup pair returns the input relation verbatim
    docs = spark.createDataFrame(
        [(i, f"unique document number {i} with totally distinct words w{i}a w{i}b w{i}c w{i}d")
         for i in range(8)],
        ["doc_id", "text"],
    )
    out = dedup.drop_near_duplicates(docs)
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(8))
    assert out.columns == docs.columns
    # and the CC kernel reports zero rounds (the loop never ran)
    assert dedup.dup_clusters.last_rounds == 0


def test_dup_clusters_incremental_empty_pairs_fast_path(spark):
    old_labels = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (9, 7)], ["doc_id", "cluster_rep"]
    )
    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    full, touched = dedup.dup_clusters_incremental(
        empty_pairs, old_labels, return_touched=True
    )
    assert sorted(map(tuple, full.collect())) == [(1, 1), (2, 1), (7, 7), (9, 7)]
    assert touched.count() == 0
    assert touched.columns == ["doc_id", "cluster_rep"]
    assert dedup.dup_clusters_incremental.last_rounds == 0


def test_incremental_minhash_fast_verify_equals_full_restriction(spark, docs):
    # the round-13 candidate-id semi-join prefilter must not change the
    # restricted-equality contract: incremental == full over old ∪ new,
    # restricted to batch-touching pairs
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    index = dedup.minhash_index(old)
    got = sorted(
        map(tuple, dedup.minhash_lsh_pairs_incremental(new, index).collect())
    )
    full = dedup.minhash_lsh_pairs(docs)
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    exp = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in full.collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    )
    assert got == exp


def test_resolve_clusters_member_scoped_quality_matches_explicit(spark, docs):
    # member-only default scoring == passing the full-corpus quality
    # relation explicitly (the argmax never reads a non-member's score)
    from spark_iforest_spark.operators.text import quality_score

    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    labels = dedup.dup_clusters(docs, pairs=pairs)
    if labels.isEmpty():
        pytest.skip("fixture produced no clusters at this threshold")
    default = sorted(map(tuple, dedup.resolve_clusters(docs, labels=labels).collect()))
    explicit = sorted(
        map(
            tuple,
            dedup.resolve_clusters(
                docs, labels=labels, quality=quality_score(docs)
            ).collect(),
        )
    )
    assert default == explicit


def test_simhash_full_path_carried_shset_verify(spark, docs):
    # the full simhash path verifies off the shingle sets its sketch pass
    # carried (round 13) — no second corpus scan/tokenize, and with the
    # auto-broadcast threshold off the only exchanges left are the
    # merge-hinted verify joins + the band self-join: no BroadcastExchange
    # (the corpus-sized sims relation must never be forced to broadcast)
    from spark_iforest_spark.plans import formatted_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(dedup.simhash_pairs(docs))
        assert "BroadcastExchange" not in plan
        # one Python pass (the sketch); the old verify added a second
        assert plan.count("MapInPandas") <= 2  # tree line + details entry
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_lm_fit_single_fused_corpus_explode(spark):
    # the fused lm_fit (round 13) runs ONE corpus explode — the shared
    # scoring-style (prev, cur) pair explode (sequence starts at 1) —
    # instead of a unigram explode plus a separate size>=2 bigram explode
    # (whose sequence started at 0). Every Generate in the artifact plan
    # must be the pair explode; values stay pinned by
    # test_lm_fit_hand_computed and the ccnet/lm oracle gates.
    from spark_iforest_spark.operators import text
    from spark_iforest_spark.plans import formatted_plan

    ref = spark.createDataFrame([(1, "a b a"), (2, "c")], ["doc_id", "text"])
    lm, h = text.lm_fit(ref, return_handle=True)
    try:
        plan = formatted_plan(lm)
        gens = [
            ln for ln in plan.splitlines()
            if "explode" in ln and "Arguments" in ln
        ]
        assert gens, plan
        assert all("sequence(1," in ln for ln in gens), gens
        assert not any("sequence(0," in ln for ln in gens), gens
        # single-token docs reach the unigram stats through the re-agg:
        # 'c' appears only as a prev-NULL pair
        rows = {(r["ord"], r["w1"], r["w2"]): r["cnt"] for r in lm.collect()}
        assert rows[(1, "c", None)] == 1
        assert rows[(1, "a", None)] == 2
        assert rows[(2, "a", "b")] == 1
        assert rows[(0, None, None)] == 4
    finally:
        h.release()


def test_line_dedup_hot_set_anti_join(spark):
    # the drop decision is an anti-join against the offenders-only digest
    # set (round 13) — the full per-digest count relation never rides the
    # lines join. Value check on a fixture straddling the min_docs
    # boundary: lines in >= min_docs distinct docs drop, others survive.
    from spark_iforest_spark.operators.pipeline import line_dedup
    from spark_iforest_spark.plans import formatted_plan

    docs = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, "a\nb"), (3, "a")], ["doc_id", "text"]
    )
    ld = line_dedup(docs, min_docs=2, with_text=True)
    assert "LeftAnti" in formatted_plan(ld)
    rows = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
            for r in ld.collect()}
    # 'a' in 3 docs, 'b' in 2 — both hot; 'c' only in doc 1 — kept
    assert rows[1] == (3, 1, "c")
    assert rows[2] == (2, 0, "")
    assert rows[3] == (1, 0, "")


def test_drop_near_duplicates_snapshot_losers_equality(docs):
    # snapshot_losers changes only WHERE the losers set lives (a
    # materialized id relation instead of a lazy subtree) — the swept
    # output must be row-identical, and re-consuming it must not
    # re-resolve clusters (the losers leaf is a snapshot)
    from spark_iforest_spark.plans import formatted_plan

    base = dedup.drop_near_duplicates(docs)
    snap = dedup.drop_near_duplicates(docs, snapshot_losers=True)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, snap.collect())
    )
    # the anti-join's right side is a materialized leaf, not the
    # resolve/argmax subtree
    plan = formatted_plan(snap)
    assert "Scan ExistingRDD" in plan


def test_lm_artifact_rebalanced_to_data_size(spark):
    # change 11: a small LM artifact must materialize as ONE partition
    # (the AQE rebalance sizes by bytes), not one partition per union
    # branch per shuffle partition
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.operators import text

    ref = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "c a")], ["doc_id", "text"]
    )
    lm, h = text.lm_fit(ref, return_handle=True)
    try:
        s = snapshot(lm, eager=True)
        assert s.rdd.getNumPartitions() == 1
    finally:
        h.release()


def test_curation_state_artifacts_right_sized(spark):
    # change 13: materialize_curation_state rebalances every artifact —
    # at fixture scale each must come back as a single partition while
    # the incremental batch output stays bit-equal to the boundary'd
    # chain's contract (pinned by the existing equality suites; here we
    # pin the layout)
    from spark_iforest_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, f"the tok{i % 3} is a word of text and it has k l m n o p q")
         for i in range(24)],
        ["doc_id", "text"],
    )
    state = corpus.materialize_curation_state(
        corpus.curation_state(
            docs,
            reference=docs,
            gopher=False,  # layout pin, not a battery fixture
            line_min_docs=2,
            substr_window=4,
            neardup=True,
        )
    )
    for name in ("ids", "lm", "line_index", "substr_index",
                 "shingle_index", "labels", "quality"):
        rel = getattr(state, name)
        if rel is not None:
            # <= 1: an EMPTY artifact rebalances to zero partitions
            assert rel.rdd.getNumPartitions() <= 1, name

"""Round-10 hardening: default-on disjointness guards for the id-less
incremental indexes, substr-index window recording, shuffle-semi-join
fallbacks, and the lm_merge lazy-input warning."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.checkpoint import snapshot
from spark_iforest_spark.operators import dedup, pipeline, text


def _docs(spark):
    boiler = "copyright footer all rights reserved by the site"
    return spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta\n{boiler}"),
            (2, f"epsilon zeta eta theta\n{boiler}"),
            (3, f"iota kappa lambda mu\n{boiler}"),
            (4, "unique text that appears nowhere else at all"),
        ],
        "doc_id long, text string",
    )


# ---------------------------------------------------------------------------
# disjointness guards (round-9 directive 2): the line/substr indexes store
# digests, never doc ids, so the guard must be DEFAULT-ON — an overlapping
# batch raises, a declared-disjoint batch passes
# ---------------------------------------------------------------------------


def test_line_dedup_incremental_guard_default_on(spark):
    docs = _docs(spark)
    rest = docs.where(F.col("doc_id") <= 3)
    idx = pipeline.line_count_index(rest)
    overlapping = docs.where(F.col("doc_id").isin(3, 4))  # 3 is indexed

    # no id relation, no declaration -> refuses to guess
    with pytest.raises(ValueError, match="disjointness cannot be verified"):
        pipeline.line_dedup_incremental(overlapping, idx)

    # exact check against the indexed id relation -> raises on overlap
    with pytest.raises(ValueError, match="overlap"):
        pipeline.line_dedup_incremental(
            overlapping, idx, indexed_ids=rest.select("doc_id")
        )

    # a genuinely disjoint batch passes the exact check
    batch = docs.where(F.col("doc_id") == 4)
    ok = pipeline.line_dedup_incremental(
        batch, idx, indexed_ids=rest.select("doc_id")
    )
    assert ok.count() == 1

    # the declaration skips the check (caller owns the contract)
    declared = pipeline.line_dedup_incremental(
        batch, idx, assume_disjoint_ids=True
    )
    assert sorted(map(tuple, declared.collect())) == sorted(
        map(tuple, ok.collect())
    )


def test_substr_incremental_guard_default_on(spark):
    docs = _docs(spark)
    rest = docs.where(F.col("doc_id") <= 3)
    idx = dedup.substr_window_index(rest, window=4)
    overlapping = docs.where(F.col("doc_id").isin(3, 4))

    with pytest.raises(ValueError, match="disjointness cannot be verified"):
        dedup.exact_substring_spans_incremental(overlapping, idx, window=4)

    with pytest.raises(ValueError, match="overlap"):
        dedup.remove_repeated_substrings_incremental(
            overlapping, idx, window=4, indexed_ids=rest.select("doc_id")
        )

    batch = docs.where(F.col("doc_id") == 4)
    ok = dedup.remove_repeated_substrings_incremental(
        batch, idx, window=4, indexed_ids=rest.select("doc_id")
    )
    assert ok.count() == 1


# ---------------------------------------------------------------------------
# recorded window size (round-9 advice): mismatched apply and mixed-window
# merges fail loudly instead of silently producing wrong spans
# ---------------------------------------------------------------------------


def test_substr_index_records_window_and_apply_verifies(spark):
    docs = _docs(spark)
    idx = dedup.substr_window_index(docs.where("doc_id <= 3"), window=4)
    assert "window" in idx.columns
    assert idx.select("window").distinct().collect()[0][0] == 4

    with pytest.raises(ValueError, match="built at window=4"):
        dedup.exact_substring_spans_incremental(
            docs.where("doc_id = 4"), idx, window=6, assume_disjoint_ids=True
        )


def test_substr_index_merge_rejects_mixed_windows(spark):
    docs = _docs(spark)
    a = dedup.substr_window_index(docs.where("doc_id <= 2"), window=4)
    b = dedup.substr_window_index(docs.where("doc_id >= 3"), window=6)
    with pytest.raises(ValueError, match="mixes window"):
        dedup.merge_substr_window_indexes(a, b).count()

    merged = dedup.merge_substr_window_indexes(
        a, dedup.substr_window_index(docs.where("doc_id >= 3"), window=4)
    )
    assert merged.select("window").distinct().collect()[0][0] == 4


# ---------------------------------------------------------------------------
# broadcast_batch=False (round-9 advice): the shuffle semi-join fallback is
# value-identical to the broadcast path
# ---------------------------------------------------------------------------


def test_incremental_broadcast_fallback_matches(spark):
    docs = _docs(spark)
    rest, batch = docs.where("doc_id <= 3"), docs.where("doc_id = 4")

    li = pipeline.line_count_index(rest)
    a = pipeline.line_dedup_incremental(
        batch, li, with_text=True, assume_disjoint_ids=True
    )
    b = pipeline.line_dedup_incremental(
        batch, li, with_text=True, assume_disjoint_ids=True,
        broadcast_batch=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    si = dedup.substr_window_index(rest, window=4)
    a = dedup.remove_repeated_substrings_incremental(
        batch, si, window=4, with_text=True, assume_disjoint_ids=True
    )
    b = dedup.remove_repeated_substrings_incremental(
        batch, si, window=4, with_text=True, assume_disjoint_ids=True,
        broadcast_batch=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# lm_merge lazy-input warning (round-9 directive 8)
# ---------------------------------------------------------------------------


def test_lm_merge_warns_on_lazy_inputs_only(spark):
    docs = _docs(spark)
    lazy_a = text.lm_fit(docs.where("doc_id <= 2"))
    lazy_b = text.lm_fit(docs.where("doc_id >= 3"))
    with pytest.warns(UserWarning, match="un-materialized lm_fit"):
        text.lm_merge(lazy_a, lazy_b)

    import warnings

    snap_a, snap_b = snapshot(lazy_a), snapshot(lazy_b)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> test failure
        merged = text.lm_merge(snap_a, snap_b)
    one = text.lm_fit(docs)
    assert merged.exceptAll(one).isEmpty() and one.exceptAll(merged).isEmpty()


# ---------------------------------------------------------------------------
# ngram_jaccard_pairs_incremental (round 10): the EXACT-jaccard member of
# the incremental family — full relation restricted to batch-touching pairs
# ---------------------------------------------------------------------------


def _corpus_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_ngram_jaccard_incremental_equals_full_restricted(spark, sf_dir):
    docs = _corpus_docs(spark, sf_dir)
    rest = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)

    full = sorted(
        map(
            tuple,
            dedup.ngram_jaccard_pairs(docs)
            .where((F.col("doc_a") % 4 == 0) | (F.col("doc_b") % 4 == 0))
            .collect(),
        )
    )
    incr = sorted(
        map(
            tuple,
            dedup.ngram_jaccard_pairs_incremental(
                batch, dedup.shingle_index(rest), assume_disjoint_ids=True
            ).collect(),
        )
    )
    assert incr == full and full


def test_ngram_jaccard_incremental_shuffle_fallback_matches(spark, sf_dir):
    docs = _corpus_docs(spark, sf_dir)
    rest = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    idx = dedup.shingle_index(rest)
    a = dedup.ngram_jaccard_pairs_incremental(
        batch, idx, assume_disjoint_ids=True
    )
    b = dedup.ngram_jaccard_pairs_incremental(
        batch, idx, assume_disjoint_ids=True, broadcast_batch=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_shingle_index_merge_and_n_verification(spark, sf_dir):
    docs = _corpus_docs(spark, sf_dir).limit(60)
    one = sorted(map(tuple, dedup.shingle_index(docs).collect()))
    merged = sorted(
        map(
            tuple,
            dedup.merge_shingle_indexes(
                *[
                    dedup.shingle_index(docs.where(F.col("doc_id") % 3 == i))
                    for i in range(3)
                ]
            ).collect(),
        )
    )
    assert merged == one and one

    a = dedup.shingle_index(docs, n=3)
    b = dedup.shingle_index(docs, n=4)
    with pytest.raises(ValueError, match="mixes n values"):
        dedup.merge_shingle_indexes(a, b).count()
    with pytest.raises(ValueError, match="built at n=3"):
        dedup.ngram_jaccard_pairs_incremental(
            docs, a, n=4, assume_disjoint_ids=True
        )


def test_ngram_jaccard_incremental_supersedes_reingested_ids(spark):
    olds = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh"),
            (2, "zz yy xx ww vv uu tt ss"),
        ],
        "doc_id long, text string",
    )
    idx = dedup.shingle_index(olds)
    # doc 1 arrives AGAIN with doc 3's text: its stale indexed shingles
    # must not pair it with itself or inflate intersections
    batch = spark.createDataFrame(
        [
            (1, "zz yy xx ww vv uu tt ss"),  # now a dup of doc 2
            (3, "aa bb cc dd ee ff gg hh"),  # dup of doc 1's NEW... gone text
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs_incremental(batch, idx).collect()
    }
    # expected = full run over ({2} from index, superseded 1, new 3)
    expect_docs = spark.createDataFrame(
        [
            (2, "zz yy xx ww vv uu tt ss"),
            (1, "zz yy xx ww vv uu tt ss"),
            (3, "aa bb cc dd ee ff gg hh"),
        ],
        "doc_id long, text string",
    )
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(expect_docs).collect()
    }
    assert got == want == {(1, 2): 1.0}


# ---------------------------------------------------------------------------
# incremental curation capstone (round 10): curation_state +
# pretrain_curate_incremental + merge/update — semantic pins for every
# cross-boundary interaction (merged line counts, indexed substr keeper,
# cross-corpus near-dup resolution, decontamination)
# ---------------------------------------------------------------------------

from spark_iforest_spark.operators import corpus


def test_pretrain_curate_incremental_micro_semantics(spark):
    boiler = "ad footer banner here"
    passage = "wx xy yz zq"
    corp = spark.createDataFrame(
        [
            (1, f"{boiler}\nsolo alpha beta gamma"),
            (2, f"{boiler}\n{passage} corpus tail words"),
            (3, "totally original content lives right here today"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, f"{boiler}\nfresh content alpha beta"),
            (11, f"{passage} some more unique words"),
            (13, "leaky benchmark question answer choice text"),
            (14, "nothing shared anywhere plain words"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(900, "benchmark question answer")], "doc_id long, text string"
    )
    state = corpus.curation_state(
        corp, reference=None, gopher=False, line_min_docs=3, substr_window=4,
        neardup=True,
    )
    out = {
        r.doc_id: r.text
        for r in corpus.pretrain_curate_incremental(
            batch, state, benchmark=benchmark, assume_disjoint_ids=True
        ).collect()
    }
    assert out == {
        # boilerplate line: corpus count 2 + batch 1 = 3 >= min_docs -> the
        # BATCH copy is rebuilt out (corpus docs keep theirs: history)
        10: "fresh content alpha beta",
        # repeated 4-token window: indexed count 1 + batch 1 = 2 -> cut,
        # keeper is the indexed first occurrence (doc 2)
        11: "some more unique words",
        # 13 dropped by decontaminate (shares a 3-shingle with benchmark)
        14: "nothing shared anywhere plain words",
    }

    funnel = {
        r.stage: (r.stage_idx, r.n_docs)
        for r in corpus.pretrain_funnel_incremental(
            batch, state, benchmark=benchmark, assume_disjoint_ids=True
        ).collect()
    }
    assert funnel == {
        "input": (0, 4),
        "line_dedup": (1, 4),
        "exact_substr": (2, 4),
        "neardup": (3, 4),
        "decontaminate": (4, 3),
    }


def test_pretrain_curate_incremental_neardup_cross_boundary(spark):
    corp = spark.createDataFrame(
        [
            (3, "totally original content lives right here today"),
            (5, "unrelated corpus filler words beyond compare"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (12, "totally original content lives right here today"),  # dup of 3
            (20, "brand new one of a kind"),
            (21, "twin text copies here now exactly"),
            (22, "twin text copies here now exactly"),  # dup of 21, loses tie
        ],
        "doc_id long, text string",
    )
    state = corpus.curation_state(
        corp, reference=None, gopher=False, line_min_docs=None,
        substr_window=None, neardup=True,
    )
    out = sorted(
        r.doc_id
        for r in corpus.pretrain_curate_incremental(
            batch, state, assume_disjoint_ids=True
        ).collect()
    )
    # 12 loses to the already-shipped corpus copy (equal quality, min id);
    # 22 loses the within-batch tie to 21
    assert out == [20, 21]


def test_merge_curation_states_equals_oneshot_for_row_local_stages(spark):
    shard_a = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "shared near duplicate body text here"),
        ],
        "doc_id long, text string",
    )
    shard_b = spark.createDataFrame(
        [
            (3, "shared near duplicate body text here"),  # crosses shards
            (4, "omega psi chi phi upsilon tau"),
        ],
        "doc_id long, text string",
    )
    kw = dict(
        reference=None, gopher=False, line_min_docs=None, substr_window=None,
        neardup=True,
    )
    merged = corpus.merge_curation_states(
        corpus.curation_state(shard_a, **kw),
        corpus.curation_state(shard_b, **kw),
    )
    one = corpus.curation_state(shard_a.unionByName(shard_b), **kw)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(merged.ids) == rows(one.ids)
    assert rows(merged.shingle_index) == rows(one.shingle_index)
    assert rows(merged.quality) == rows(one.quality)
    # the cross-shard pair (2, 3) must cluster identically
    assert rows(merged.labels) == rows(one.labels) == [(2, 2), (3, 2)]

    batch = spark.createDataFrame(
        [(10, "shared near duplicate body text here")],
        "doc_id long, text string",
    )
    got_m = corpus.pretrain_curate_incremental(
        batch, merged, assume_disjoint_ids=True
    ).count()
    got_o = corpus.pretrain_curate_incremental(
        batch, one, assume_disjoint_ids=True
    ).count()
    assert got_m == got_o == 0  # the batch copy loses to doc 2 both ways


def test_update_curation_state_accumulates_counts(spark):
    boiler = "subscribe to our newsletter now"
    corp = spark.createDataFrame(
        [(1, f"{boiler}\ncorpus only body text")], "doc_id long, text string"
    )
    state = corpus.curation_state(
        corp, reference=None, gopher=False, line_min_docs=3,
        substr_window=None, neardup=False,
    )
    b1 = spark.createDataFrame(
        [(10, f"{boiler}\nfirst batch body text")], "doc_id long, text string"
    )
    out1, state1 = corpus.curate_and_update_state(
        b1, state, assume_disjoint_ids=True
    )
    # count 2 < 3: batch-1 doc keeps the boilerplate line
    assert out1.collect()[0].text == f"{boiler}\nfirst batch body text"

    b2 = spark.createDataFrame(
        [(20, f"{boiler}\nsecond batch body text")], "doc_id long, text string"
    )
    out2 = corpus.pretrain_curate_incremental(
        b2, state1, assume_disjoint_ids=True
    )
    # the rolled-forward index carries batch 1's occurrence: 3 >= 3
    assert out2.collect()[0].text == "second batch body text"

    # params/cutpoints mismatches refuse to fold
    other = corpus.curation_state(
        corp, reference=None, gopher=False, line_min_docs=2,
        substr_window=None, neardup=False,
    )
    with pytest.raises(ValueError, match="different recipe params"):
        corpus.merge_curation_states(state, other)


# ---------------------------------------------------------------------------
# dsir_merge (round 10): sharded estimator fits fold bit-exactly
# ---------------------------------------------------------------------------


def test_dsir_merge_equals_oneshot(spark, sf_dir):
    docs = _corpus_docs(spark, sf_dir)
    target = docs.where(F.col("lang") == "de")
    one = sorted(
        map(tuple, pipeline.dsir_estimator(target, docs, n_buckets=512).collect())
    )
    shards = [
        snapshot(
            pipeline.dsir_estimator(
                target.where(F.col("doc_id") % 3 == i),
                docs.where(F.col("doc_id") % 3 == i),
                n_buckets=512,
            )
        )
        for i in range(3)
    ]
    merged = sorted(
        map(tuple, pipeline.dsir_merge(*shards, n_buckets=512).collect())
    )
    assert merged == one and one


def test_dsir_merge_empty_shard_is_noop(spark, sf_dir):
    docs = _corpus_docs(spark, sf_dir).limit(40)
    target = docs.where(F.col("lang") == "de")
    est = snapshot(pipeline.dsir_estimator(target, docs, n_buckets=256))
    empty = snapshot(
        pipeline.dsir_estimator(
            target.where(F.lit(False)), docs.where(F.lit(False)), n_buckets=256
        )
    )
    merged = sorted(
        map(tuple, pipeline.dsir_merge(est, empty, n_buckets=256).collect())
    )
    assert merged == sorted(map(tuple, est.collect()))


# ---------------------------------------------------------------------------
# CurationState persistence: save -> load -> identical incremental verdicts
# ---------------------------------------------------------------------------


def test_curation_state_save_load_roundtrip(spark, tmp_path):
    boiler = "ad footer banner here"
    corp = spark.createDataFrame(
        [
            (1, f"{boiler}\nsolo alpha beta gamma"),
            (2, f"{boiler}\nwx xy yz zq corpus tail words"),
            (3, "totally original content lives right here today"),
        ],
        "doc_id long, text string",
    )
    # batch texts walk SEEN reference bigrams (so they band head/middle
    # under the frozen tiny-corpus LM) while their surviving 4-token
    # windows are novel re-orderings (so ExactSubstr cuts the copied run
    # but leaves a non-empty tail): doc 10 = doc 2's text + a re-start
    # that substr trims back to "ad footer banner"; doc 11 = the boiler
    # line (removed: corpus 2 + batch 1 >= 3) over a 3-token line too
    # short to window
    batch = spark.createDataFrame(
        [
            (10, f"{boiler} wx xy yz zq corpus tail words ad footer banner"),
            (11, f"{boiler}\nsolo alpha beta"),
        ],
        "doc_id long, text string",
    )
    state = corpus.curation_state(
        corp, reference=corp, gopher=False, line_min_docs=3, substr_window=4,
        neardup=True,
    )
    want = {
        r.doc_id: r.text
        for r in corpus.pretrain_curate_incremental(
            batch, state, assume_disjoint_ids=True
        ).collect()
    }
    # every stage did real cross-boundary work and left survivors
    assert want == {10: "ad footer banner", 11: "solo alpha beta"}

    path = str(tmp_path / "state")
    corpus.save_curation_state(state, path)
    loaded = corpus.load_curation_state(spark, path)
    assert loaded.params == state.params
    assert loaded.cutpoints == state.cutpoints
    got = {
        r.doc_id: r.text
        for r in corpus.pretrain_curate_incremental(
            batch, loaded, assume_disjoint_ids=True
        ).collect()
    }
    assert got == want

    # the exact disjointness guard works against the reloaded id relation
    with pytest.raises(ValueError, match="overlap"):
        corpus.pretrain_curate_incremental(
            corp.limit(1), loaded, benchmark=None
        )


def test_pretrain_funnel_and_update_state_matches_separate_calls(spark):
    """The one-run (funnel, rolled state) pair must equal running
    pretrain_funnel_incremental and update_curation_state separately —
    same funnel rows, same rolled-forward artifacts, and the next batch
    gets identical verdicts from either state."""
    boiler = "ad footer banner here"
    corp = spark.createDataFrame(
        [
            (1, f"{boiler}\nsolo alpha beta gamma"),
            (2, f"{boiler}\nwx xy yz zq corpus tail words"),
            (3, "totally original content lives right here today"),
        ],
        "doc_id long, text string",
    )
    batch_a = spark.createDataFrame(
        [(10, f"{boiler}\nfresh content alpha beta"),
         (11, "totally original content lives right here today")],
        "doc_id long, text string",
    )
    batch_b = spark.createDataFrame(
        [(20, f"{boiler}\nbrand new one of a kind")],
        "doc_id long, text string",
    )
    kw = dict(reference=None, gopher=False, line_min_docs=3, substr_window=4,
              neardup=True)
    funnel, rolled = corpus.pretrain_funnel_and_update_state(
        batch_a, corpus.curation_state(corp, **kw), assume_disjoint_ids=True
    )
    want_funnel = sorted(map(tuple, corpus.pretrain_funnel_incremental(
        batch_a, corpus.curation_state(corp, **kw), assume_disjoint_ids=True
    ).collect()))
    assert sorted(map(tuple, funnel.collect())) == want_funnel
    want_state = corpus.update_curation_state(
        corpus.curation_state(corp, **kw), batch_a, assume_disjoint_ids=True
    )
    for rel in ("ids", "line_index", "substr_index", "shingle_index",
                "labels", "quality"):
        got = sorted(map(tuple, getattr(rolled, rel).collect()))
        want = sorted(map(tuple, getattr(want_state, rel).collect()))
        assert got == want, f"rolled state relation {rel} diverged"
    got_b = sorted(map(tuple, corpus.pretrain_curate_incremental(
        batch_b, rolled, assume_disjoint_ids=True
    ).collect()))
    want_b = sorted(map(tuple, corpus.pretrain_curate_incremental(
        batch_b, want_state, assume_disjoint_ids=True
    ).collect()))
    # batch_b's boiler line crosses min_docs only through batch_a's fold
    assert got_b == want_b == [(20, "brand new one of a kind")]


# ---------------------------------------------------------------------------
# mergeable HLL distinct-count sketches (round 10): the statistic
# profile_partial's additive fold cannot carry — shard sketches fold to the
# corpus NDV without rescanning old shards
# ---------------------------------------------------------------------------


def test_ndv_sketch_refuses_unsupported_types(spark):
    from spark_iforest_spark.operators import relational

    df = spark.createDataFrame([(1, 1.5)], "a long, b double")
    with pytest.raises(ValueError, match="money_units"):
        relational.ndv_sketch_partial(df, ["b"])


def test_ndv_merge_equals_oneshot_in_exact_regime(spark):
    """Below the sketch's coupon-mode capacity both the one-shot and the
    shard-merged sketches store the distinct hash set exactly, so both
    estimates equal the true NDV — and are therefore equal to each other
    and invariant to partitioning (the tight regime of the bounded-error
    contract)."""
    from spark_iforest_spark.operators import relational

    df = spark.createDataFrame(
        [(i, f"k{i % 97}", i % 13) for i in range(2000)],
        "id long, s string, g long",
    )
    one = {
        r["column"]: r["ndv"]
        for r in relational.approx_ndv(df, ["s", "g"]).collect()
    }
    assert one == {"s": 97, "g": 13}
    # layout invariance in the exact regime
    one7 = {
        r["column"]: r["ndv"]
        for r in relational.approx_ndv(df.repartition(7), ["s", "g"]).collect()
    }
    assert one7 == one
    parts = [
        relational.ndv_sketch_partial(df.where(F.col("id") % 3 == k), ["s", "g"])
        for k in range(3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = {
        r["column"]: r["ndv"]
        for r in relational.ndv_estimates(
            relational.merge_ndv_sketches(u)
        ).collect()
    }
    assert merged == one


def test_ndv_bounded_error_in_dense_regime(spark, sf_dir):
    """Above the coupon capacity (lineitem's l_orderkey) the estimate is
    approximate: pin the gate's own bounds — one-shot and 3-shard-merged
    within 8% of exact, merged within 3% of one-shot."""
    from spark_iforest_spark.operators import relational

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_orderkey", "l_partkey"]
    exact = {r["column"]: r["ndv"] for r in relational.exact_ndv(li, cols).collect()}
    one = {r["column"]: r["ndv"] for r in relational.approx_ndv(li, cols).collect()}
    parts = [
        relational.ndv_sketch_partial(
            li.where(F.pmod(F.col("l_orderkey"), F.lit(3)) == k), cols
        )
        for k in range(3)
    ]
    merged = {
        r["column"]: r["ndv"]
        for r in relational.ndv_estimates(
            relational.merge_ndv_sketches(
                parts[0].unionByName(parts[1]).unionByName(parts[2])
            )
        ).collect()
    }
    for c in cols:
        assert abs(one[c] / exact[c] - 1.0) <= 0.08
        assert abs(merged[c] / exact[c] - 1.0) <= 0.08
        assert abs(merged[c] / one[c] - 1.0) <= 0.03


def test_ndv_merge_refuses_mixed_lg_k(spark):
    """allowDifferentLgConfigK stays False: folding shards sketched at
    different precisions must fail loudly, not silently downgrade every
    estimate to the coarsest shard (same posture as the substr-window
    index's must-match window)."""
    from spark_iforest_spark.operators import relational

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = relational.ndv_sketch_partial(df, ["id"], lg_k=12)
    b = relational.ndv_sketch_partial(df, ["id"], lg_k=14)
    # Spark's HLL_UNION_DIFFERENT_LG_K error — match the error class so
    # the test pins THIS failure, not any incidental exception
    with pytest.raises(Exception, match="lgConfigK|LG_K"):
        relational.merge_ndv_sketches(a.unionByName(b)).collect()


# ---------------------------------------------------------------------------
# exact-k per-stratum sampling (round 10): the exact-count complement of
# stratified_sample's Bernoulli fractions
# ---------------------------------------------------------------------------


def test_stratified_sample_k_exact_counts_and_determinism(spark):
    from spark_iforest_spark.operators import pipeline as P

    df = spark.createDataFrame(
        [(i, "big" if i % 10 else "small") for i in range(200)],
        "doc_id long, lang string",
    )
    # 'small' has 20 members, 'big' 180; k=25 keeps all of small, 25 of big
    got = P.stratified_sample_k(df, 25)
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 25, "small": 20}
    # ranks are 1..n within each stratum
    ranks = sorted(r["sample_rank"] for r in got.where(F.col("lang") == "big").collect())
    assert ranks == list(range(1, 26))
    # layout invariance: membership and ranks are a pure function of
    # (id, salt) — repartitioning changes nothing
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, P.stratified_sample_k(df.repartition(13), 25).collect()))
    assert a == b
    # growth stability: adding new docs never evicts by re-hash alone —
    # a kept doc's rank can only grow if new ids hash ahead of it, and
    # the permutation of OLD ids is unchanged (relative order preserved)
    bigger = df.unionByName(
        spark.createDataFrame([(1000 + i, "big") for i in range(50)],
                              "doc_id long, lang string")
    )
    old_order = [r["doc_id"] for r in got.where(F.col("lang") == "big")
                 .orderBy("sample_rank").collect()]
    new_kept = P.stratified_sample_k(bigger, 25).where(F.col("lang") == "big")
    new_order = [r["doc_id"] for r in new_kept.orderBy("sample_rank").collect()]
    surviving = [d for d in old_order if d in set(new_order)]
    filtered_new = [d for d in new_order if d in set(old_order)]
    assert surviving == filtered_new


def test_stratified_sample_k_plans_as_window_group_limit(spark):
    """The rank filter must compile to WindowGroupLimit so each task
    pre-prunes to its local per-stratum top-k before the shuffle — the
    property that keeps a giant stratum from funneling its whole slice
    through one window task."""
    from spark_iforest_spark.operators import pipeline as P
    from spark_iforest_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], "doc_id long, lang string"
    )
    plan = formatted_plan(P.stratified_sample_k(df, 5))
    assert "WindowGroupLimit" in plan


def test_ndv_grouped_exact_regime_and_merge(spark):
    """group_cols adds the per-group dimension: in the exact coupon regime
    the grouped one-shot and the grouped 3-shard fold both equal the true
    per-group NDV, and a group absent from a shard simply contributes no
    row to that shard's state."""
    from spark_iforest_spark.operators import relational

    rows = [
        (i, "g0" if i % 2 == 0 else "g1", i % (30 if i % 2 == 0 else 50))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    want = {
        (g, "v"): len({v for i, gg, v in rows if gg == g})
        for g in ("g0", "g1")
    }
    one = {
        (r["g"], r["column"]): r["ndv"]
        for r in relational.approx_ndv(df, ["v"], group_cols=["g"]).collect()
    }
    assert one == want
    # shard by id%3; shard 0 gets only even ids -> only g0 rows... (ids
    # 0,3,6,9: mixed) — shards simply cover different group subsets
    parts = [
        relational.ndv_sketch_partial(
            df.where(F.col("id") % 3 == k), ["v"], group_cols=["g"]
        )
        for k in range(3)
    ]
    merged = {
        (r["g"], r["column"]): r["ndv"]
        for r in relational.ndv_estimates(
            relational.merge_ndv_sketches(
                parts[0].unionByName(parts[1]).unionByName(parts[2]),
                group_cols=["g"],
            )
        ).collect()
    }
    assert merged == want
    # a shard missing a group entirely still folds correctly
    only_g0 = relational.ndv_sketch_partial(
        df.where(F.col("g") == "g0"), ["v"], group_cols=["g"]
    )
    only_g1 = relational.ndv_sketch_partial(
        df.where(F.col("g") == "g1"), ["v"], group_cols=["g"]
    )
    split = {
        (r["g"], r["column"]): r["ndv"]
        for r in relational.ndv_estimates(
            relational.merge_ndv_sketches(
                only_g0.unionByName(only_g1), group_cols=["g"]
            )
        ).collect()
    }
    assert split == want


# ---------------------------------------------------------------------------
# round-10 session-2 review fixes, each pinned
# ---------------------------------------------------------------------------


def test_merge_curation_states_rejects_overlapping_shards(spark):
    from spark_iforest_spark.operators import corpus

    docs = _docs(spark)
    kw = dict(line_min_docs=2, substr_window=None, neardup=True, gopher=False)
    a = corpus.curation_state(docs.where(F.col("doc_id") <= 2), **kw)
    b = corpus.curation_state(docs.where(F.col("doc_id") >= 2), **kw)  # 2 in both
    with pytest.raises(ValueError, match="share doc ids"):
        corpus.merge_curation_states(a, b)


def test_check_batch_disjoint_rejects_wide_indexed_ids(spark):
    """A wider indexed_ids relation whose FIRST column is not the id must
    raise instead of silently verifying the wrong column (the old
    positional grab passed the guard on overlapping batches)."""
    from spark_iforest_spark.functions import check_batch_disjoint

    batch = spark.createDataFrame([(3,), (4,)], "doc_id long")
    wide = spark.createDataFrame(
        [("x", 3), ("y", 9)], "text string, doc_id long"
    )
    # doc_id present by name -> found by name -> overlap on 3 raises
    with pytest.raises(ValueError, match="overlap"):
        check_batch_disjoint(batch, wide, "doc_id", False, True, "idx")
    # wider relation WITHOUT the id column -> refuses to guess
    anon = spark.createDataFrame([("x", 3), ("y", 9)], "a string, b long")
    with pytest.raises(ValueError, match="guessing|id relation"):
        check_batch_disjoint(batch, anon, "doc_id", False, True, "idx")
    # single-column projection of any name stays accepted
    ok = spark.createDataFrame([(9,), (10,)], "whatever long")
    check_batch_disjoint(batch, ok, "doc_id", False, True, "idx")


def test_curate_stream_rejects_keep_versions_one(spark, tmpdir):
    from spark_iforest_spark import streaming as S2

    import os

    d = str(tmpdir)
    os.makedirs(d + "/never-read", exist_ok=True)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        d + "/never-read"
    )
    with pytest.raises(ValueError, match="keep_versions"):
        S2.curate_stream(
            stream, d + "/state", d + "/out", keep_versions=1
        )


def test_dsir_merge_rejects_mismatched_n_buckets(spark, sf_dir):
    from spark_iforest_spark.operators import pipeline as P

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("lang") == "de")
    est = P.dsir_estimator(target, docs, n_buckets=512)
    with pytest.raises(ValueError, match="n_buckets"):
        P.dsir_merge(est, est, n_buckets=1024)


def test_merge_shingle_indexes_tolerates_n_less_artifact(spark):
    """The documented tolerance for pre-recording (did, sh) artifacts is
    reachable (review fix: unionByName used to throw on the column-count
    mismatch before the tolerance check ran)."""
    from spark_iforest_spark.operators import dedup

    docs = _docs(spark)
    with_n = dedup.shingle_index(docs.where(F.col("doc_id") <= 2))
    legacy = dedup.shingle_index(docs.where(F.col("doc_id") >= 3)).drop("n")
    merged = dedup.merge_shingle_indexes(with_n, legacy)
    assert "n" not in merged.columns
    assert merged.count() == with_n.count() + legacy.count()


def test_ngram_incremental_batch_shingles_hook_equivalent(spark):
    """Passing the precomputed shingle_index relation through
    batch_shingles must reproduce the self-shingled pairs bit-exactly,
    and a mismatched recorded n must raise."""
    from spark_iforest_spark.operators import dedup

    docs = _docs(spark)
    corp = docs.where(F.col("doc_id") <= 2)
    batch = docs.where(F.col("doc_id") >= 3)
    idx = dedup.shingle_index(corp, n=3)
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs_incremental(
        batch, idx, n=3, threshold=0.1, assume_disjoint_ids=True
    ).collect()))
    pre = dedup.shingle_index(batch, n=3)
    got = sorted(map(tuple, dedup.ngram_jaccard_pairs_incremental(
        batch, idx, n=3, threshold=0.1, assume_disjoint_ids=True,
        batch_shingles=pre,
    ).collect()))
    assert got == want and len(got) > 0
    wrong_n = dedup.shingle_index(batch, n=4)
    with pytest.raises(ValueError, match="built at n=4|n=4"):
        dedup.ngram_jaccard_pairs_incremental(
            batch, idx, n=3, threshold=0.1, assume_disjoint_ids=True,
            batch_shingles=wrong_n,
        ).collect()


def test_perplexity_cutpoints_empty_relation_raises_clearly(spark):
    """An empty calibration relation (e.g. a quality gate dropped every
    doc) must fail with a clear ValueError, not a bare IndexError deep
    in perplexity_bands (found by the sf0.01 curation soak)."""
    scored = spark.createDataFrame([], "doc_id long, avg_nll_micros long")
    with pytest.raises(ValueError, match="empty"):
        text.perplexity_cutpoints(scored)

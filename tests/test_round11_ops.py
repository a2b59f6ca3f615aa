"""Round 11: delta-encoded versioned state, batch-id-idempotent profile
parts, and the round-10 advisory fixes — each pinned.

Layout of this file follows the verdict's directive order:
  1. advisory fixes (recording-loss warnings, guard flags, dup_rate key,
     profile-monitor mid-stream reconfiguration)
  2. delta-encoded digest index (write volume ∝ batch, not corpus)
  3. delta-encoded curation state (same contract for curate_stream)
  4. parts-layout profile/NDV monitors (re-delivery-idempotent additive
     folds)
"""

import warnings

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark import streaming as S
from spark_iforest_spark.operators import corpus, dedup, pipeline


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# 1. round-10 advisory fixes
# ---------------------------------------------------------------------------


def test_merge_shingle_indexes_warns_on_recording_loss(spark):
    docs = _docs(spark, [(1, "a b c d e f"), (2, "g h i j k l")])
    rec = dedup.shingle_index(docs.where("doc_id = 1"), n=3)
    legacy = dedup.shingle_index(docs.where("doc_id = 2"), n=3).drop("n")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merged = dedup.merge_shingle_indexes(rec, legacy)
    assert any("dropping the n recording" in str(x.message) for x in w)
    assert "n" not in merged.columns
    # all-recorded merges stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.merge_shingle_indexes(
            rec, dedup.shingle_index(docs.where("doc_id = 2"), n=3)
        )
    assert not any("recording" in str(x.message) for x in w)


def test_merge_substr_indexes_warns_on_recording_loss(spark):
    docs = _docs(spark, [(1, " ".join("w%d" % i for i in range(12)))])
    rec = dedup.substr_window_index(docs, window=4)
    legacy = rec.drop("window")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merged = dedup.merge_substr_window_indexes(rec, legacy)
    assert any("window recording" in str(x.message) for x in w)
    assert "window" not in merged.columns


def test_merge_curation_states_assume_disjoint_skips_guard(spark):
    """The guard opt-outs mirror check_batch_disjoint: assume_disjoint_ids
    skips the driver action (shards disjoint by construction), and the
    merged state matches the guarded merge."""
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "shared near duplicate body text here"),
            (3, "shared near duplicate body text here"),
            (4, "omega psi chi phi upsilon tau"),
        ],
    )
    kw = dict(gopher=False, line_min_docs=None, substr_window=None, neardup=True)
    a = corpus.curation_state(docs.where("doc_id <= 2"), **kw)
    b = corpus.curation_state(docs.where("doc_id >= 3"), **kw)
    guarded = corpus.merge_curation_states(a, b)
    assumed = corpus.merge_curation_states(
        corpus.curation_state(docs.where("doc_id <= 2"), **kw),
        corpus.curation_state(docs.where("doc_id >= 3"), **kw),
        assume_disjoint_ids=True,
        broadcast=False,
    )
    for name in ("ids", "labels", "quality"):
        assert sorted(map(tuple, getattr(assumed, name).collect())) == sorted(
            map(tuple, getattr(guarded, name).collect())
        )


def test_merge_profile_version_ndv_reconfigured_midstream(spark, tmpdir):
    """Adding ndv_columns mid-run starts the sketch state fresh instead of
    crashing on the missing parent child; dropping ndv_columns later
    carries the accumulated sketch state forward instead of losing it."""
    state = str(tmpdir) + "/state"
    b0 = spark.createDataFrame([(1, 2.0), (2, 4.0)], "id long, x double")
    b1 = spark.createDataFrame([(3, 6.0), (4, 8.0)], "id long, x double")
    b2 = spark.createDataFrame([(5, 1.0), (6, 3.0)], "id long, x double")
    # batch 0: no sketches; batch 1 ADDS ndv tracking (parent has no ndv)
    S.merge_profile_version(spark, state, b0, 0, ["x"])
    S.merge_profile_version(spark, state, b1, 1, ["x"], ndv_columns=["id"])
    prof1 = {
        r["column"]: r
        for r in S.latest_profile(spark, state).collect()
    }
    assert prof1["x"]["n_rows"] == 4  # profile fold spans all batches
    assert prof1["id"]["ndv"] == 2  # sketch state starts at batch 1
    # batch 2 DROPS ndv_columns: profile keeps folding, sketches carried
    S.merge_profile_version(spark, state, b2, 2, ["x"])
    prof2 = {
        r["column"]: r
        for r in S.latest_profile(spark, state).collect()
    }
    assert prof2["x"]["n_rows"] == 6
    assert prof2["id"]["ndv"] == 2  # carried forward verbatim, not dropped


# ---------------------------------------------------------------------------
# 4. parts-layout monitors: batch-id-idempotent additive folds + delta
#    write volume (verdict directives #1 monitor-half and #2)
# ---------------------------------------------------------------------------


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_profile_parts_rederivery_bit_exact(spark, tmpdir):
    """THE round-10 asymmetry test that could not be written for the
    additive side: a previously-committed batch id fully RE-EXECUTED with
    the same rows leaves the running profile bit-exact — the parts layout
    makes the additive sums last-writer-wins per batch id, matching the
    sketch side's set semantics."""
    state = str(tmpdir) + "/parts"
    b0 = spark.createDataFrame([(1, 2.0), (2, 4.0)], "id long, x double")
    b1 = spark.createDataFrame([(3, 6.0), (4, None)], "id long, x double")
    S.merge_profile_part(spark, state, b0, 0, ["x"], ndv_columns=["id"])
    S.merge_profile_part(spark, state, b1, 1, ["x"], ndv_columns=["id"])
    committed = _rows(S.latest_profile(spark, state))
    # full re-delivery: same batch id, same rows, executed again
    S.merge_profile_part(spark, state, b1, 1, ["x"], ndv_columns=["id"])
    assert _rows(S.latest_profile(spark, state)) == committed
    # and the fold equals profiling the concatenated batches one-shot
    from spark_iforest_spark.operators import relational

    want = _rows(
        relational.table_profile(b0.unionByName(b1), ["x"]).join(
            relational.exact_ndv(b0.unionByName(b1), ["id"]), "column", "full"
        )
    )
    assert committed == want


def test_profile_parts_compaction_preserves_fold_and_accepts_new_batches(
    spark, tmpdir
):
    state = str(tmpdir) + "/parts"
    batches = [
        spark.createDataFrame(
            [(b * 10 + i, float(b + i)) for i in range(5)], "id long, x double"
        )
        for b in range(3)
    ]
    for b, df in enumerate(batches[:2]):
        S.merge_profile_part(spark, state, df, b, ["x"], ndv_columns=["id"])
    before = _rows(S.latest_profile(spark, state))
    m = S.compact_profile_parts(spark, state)
    assert m == 1
    assert _rows(S.latest_profile(spark, state)) == before
    # a stale retry of an already-compacted batch id is IGNORED by the
    # read rule (b1 <= c1) — the crash-/late-retry-safety invariant
    S.merge_profile_part(
        spark, state, batches[0], 1, ["x"], ndv_columns=["id"]
    )
    assert _rows(S.latest_profile(spark, state)) == before
    # post-compaction batches keep folding
    S.merge_profile_part(spark, state, batches[2], 2, ["x"], ndv_columns=["id"])
    from spark_iforest_spark.operators import relational

    allb = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = _rows(
        relational.table_profile(allb, ["x"]).join(
            relational.exact_ndv(allb, ["id"]), "column", "full"
        )
    )
    assert _rows(S.latest_profile(spark, state)) == want
    # double compaction is a no-op (already-compact guard)
    S.compact_profile_parts(spark, state)
    assert S.compact_profile_parts(spark, state) == 2


def test_ndv_parts_layout_matches_versions_layout(spark, tmpdir):
    from spark_iforest_spark.operators import relational

    vs, ps = str(tmpdir) + "/v", str(tmpdir) + "/p"
    batches = [
        spark.createDataFrame(
            [((b * 7 + i) % 20,) for i in range(10)], "id long"
        )
        for b in range(3)
    ]
    for b, df in enumerate(batches):
        S.merge_ndv_version(spark, vs, df, b, ["id"])
        S.merge_ndv_part(spark, ps, df, b, ["id"])
    want = _rows(relational.ndv_estimates(S.latest_ndv_sketches(spark, vs)))
    assert _rows(
        relational.ndv_estimates(S.latest_ndv_sketches(spark, ps))
    ) == want
    S.compact_ndv_parts(spark, ps)
    assert _rows(
        relational.ndv_estimates(S.latest_ndv_sketches(spark, ps))
    ) == want


def test_monitor_ingest_parts_layout_streaming(spark, tmpdir):
    """End-to-end through foreachBatch: the parts-layout streaming ingest
    equals profiling the whole input, and its per-batch write volume is
    part-sized (one b{N} dir per micro-batch, no version rewrite)."""
    import glob

    from spark_iforest_spark.operators import relational

    src = str(tmpdir) + "/src"
    state = str(tmpdir) + "/state"
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 13).cast("double").alias("x")
    )
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = S.profile_monitor_ingest(
        stream, state, ["x"], ndv_columns=["id"], layout="parts"
    )
    q.awaitTermination()
    got = {r["column"]: r for r in S.latest_profile(spark, state).collect()}
    want = {r["column"]: r for r in relational.table_profile(df, ["x"]).collect()}
    assert got["x"]["n_rows"] == want["x"]["n_rows"]
    assert got["x"]["mean_value"] == want["x"]["mean_value"]
    assert got["id"]["ndv"] == 100
    parts = glob.glob(state + "/b*")
    assert len(parts) >= 2  # one part per micro-batch, no v{N} rewrites
    assert not glob.glob(state + "/v*")


def test_bench_clean_rule_rejects_uniform_load():
    """The self-heal's attempt-clean rule must catch a UNIFORMLY loaded
    box: both probes inflated in lockstep (spread fine) is still dirty
    when the absolute capability ceiling is exceeded — the observed
    0.32/0.26 case that round 10's spread-only rule passed."""
    from bench import _is_clean_attempt

    assert _is_clean_attempt([], 1.1, 0.055, 0.15)  # genuinely idle
    assert not _is_clean_attempt([], 1.24, 0.26, 0.15)  # uniform load
    assert not _is_clean_attempt([], 2.0, 0.05, 0.15)  # load mid-attempt
    assert not _is_clean_attempt(["q"], 1.0, 0.05, 0.15)  # unstable query


# ---------------------------------------------------------------------------
# 2. delta-encoded digest index (verdict directive #1, index half):
#    per-batch write ∝ batch-touched digests, LWW fold == full rewrite
# ---------------------------------------------------------------------------


def test_delta_dedup_ingest_matches_batch_and_versions(spark, sf_dir, tmpdir):
    """Streaming ingest in delta layout converges to EXACTLY the one-shot
    exact_dedup relation (cross-batch digest merges included) — same
    contract the versioned layout is pinned to."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmpdir) + "/src"
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = S.incremental_dedup_ingest(
        stream, str(tmpdir) + "/idx", layout="delta"
    )
    q.awaitTermination()
    got = _rows(S.latest_dedup_index(spark, str(tmpdir) + "/idx"))
    want = _rows(dedup.exact_dedup(docs))
    assert got == want and len(got) > 0


def test_merge_index_delta_retry_and_write_volume(spark, tmpdir):
    """A retried batch regenerates a bit-identical delta part (strict-
    parent: the fold sees only parts older than the batch id), and each
    part holds only the batch's TOUCHED digest rows — the flat-write
    property the full-rewrite layout lacked."""
    import hashlib

    idx = str(tmpdir) + "/idx"
    b0 = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "ccc")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame([(4, "aaa"), (5, "ddd")], "doc_id long, text string")
    S.merge_index_delta(spark, idx, b0, 0)
    S.merge_index_delta(spark, idx, b1, 1)
    first = _rows(spark.read.parquet(idx + "/b1"))
    assert len(first) == 2  # only the two digests batch 1 touched
    S.merge_index_delta(spark, idx, b1, 1)  # simulated retry
    assert _rows(spark.read.parquet(idx + "/b1")) == first
    merged = {r[0]: (r[1], r[2]) for r in _rows(S.latest_dedup_index(spark, idx))}
    # 'aaa' merged across batches: rep = min id 1, copies = 2
    assert merged[hashlib.md5(b"aaa").hexdigest()] == (1, 2)
    assert len(merged) == 4


def test_dedup_index_null_text_consistent_across_layouts(spark, tmpdir):
    """NULL text is a real content group and must count consistently
    (round-11 review fix, two iterations: equality joins first missed the
    NULL key entirely — re-counting NULL-text docs every batch — and a
    null-safe-join fix defeated bucketed co-location; final design makes
    the DIGEST total instead: NULL digests as md5(''), the corpus_diff
    convention, so plain equality joins are exact AND bucket layouts
    hold). Both layouts must equal the one-shot relation on NULL-bearing
    input, with NULL-text docs in ONE cross-batch group."""
    import hashlib

    b0 = spark.createDataFrame(
        [(1, "aaa"), (2, None), (3, "bbb")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(4, None), (5, "aaa"), (6, None)], "doc_id long, text string"
    )
    want = _rows(dedup.exact_dedup(b0.unionByName(b1)))
    vdir, ddir = str(tmpdir) + "/v", str(tmpdir) + "/d"
    S.merge_index_version(spark, vdir, b0, 0)
    S.merge_index_version(spark, vdir, b1, 1)
    assert _rows(S.latest_dedup_index(spark, vdir)) == want
    S.merge_index_delta(spark, ddir, b0, 0)
    S.merge_index_delta(spark, ddir, b1, 1)
    assert _rows(S.latest_dedup_index(spark, ddir)) == want
    # the NULL-text group digests as md5('') and counts across batches:
    # rep = min id 2, copies 3; no NULL digest exists anywhere
    by_hash = {r[0]: (r[1], r[2]) for r in want}
    assert None not in by_hash
    assert by_hash[hashlib.md5(b"").hexdigest()] == (2, 3)


def test_compact_dedup_index_preserves_fold(spark, tmpdir):
    idx = str(tmpdir) + "/idx"
    batches = [
        spark.createDataFrame(
            [(b * 10 + i, f"t{(b * 3 + i) % 7}") for i in range(5)],
            "doc_id long, text string",
        )
        for b in range(3)
    ]
    for b, df in enumerate(batches[:2]):
        S.merge_index_delta(spark, idx, df, b)
    before = _rows(S.latest_dedup_index(spark, idx))
    assert S.compact_dedup_index(spark, idx) == 1
    assert _rows(S.latest_dedup_index(spark, idx)) == before
    # stale retry of an already-compacted batch id: ignored by the read rule
    S.merge_index_delta(spark, idx, batches[1], 1)
    assert _rows(S.latest_dedup_index(spark, idx)) == before
    # post-compaction batches keep folding, equal to the one-shot relation
    S.merge_index_delta(spark, idx, batches[2], 2)
    allb = batches[0].unionByName(batches[1]).unionByName(batches[2])
    assert _rows(S.latest_dedup_index(spark, idx)) == _rows(
        dedup.exact_dedup(allb)
    )


# ---------------------------------------------------------------------------
# 3. delta-encoded curation state (verdict directive #1, capstone half)
# ---------------------------------------------------------------------------


def _curation_fixture(spark):
    boiler = "ad footer banner here"
    corp = spark.createDataFrame(
        [
            (1, f"{boiler}\nsolo alpha beta gamma"),
            (2, f"{boiler}\nwx xy yz zq corpus tail words"),
            (3, "totally original content lives right here today"),
        ],
        "doc_id long, text string",
    )
    batches = [
        spark.createDataFrame(rows, "doc_id long, text string")
        for rows in (
            [
                (10, f"{boiler}\nsolo alpha beta"),
                (11, f"{boiler} wx xy yz zq corpus tail words ad footer banner"),
            ],
            [
                (20, "totally original content lives right here today"),
                (21, f"{boiler}\nbrand new one of a kind"),
            ],
            [(30, "closing unrelated plain words batch")],
        )
    ]
    return corp, batches


_STATE_RELS = (
    "ids", "line_index", "substr_index", "shingle_index", "labels", "quality"
)


def test_curation_delta_layout_matches_full_layout(spark, tmpdir):
    """Per-batch curated outputs bit-equal and the final LOGICAL state
    relation-set-equal between the full-rewrite and delta state layouts —
    while each delta version physically holds only the batch's own
    contribution."""
    from spark_iforest_spark import fs as hfs

    corp, batches = _curation_fixture(spark)
    full_s, full_o = str(tmpdir) + "/fs", str(tmpdir) + "/fo"
    delt_s, delt_o = str(tmpdir) + "/ds", str(tmpdir) + "/do"
    st = corpus.curation_state(
        corp, reference=None, gopher=False, line_min_docs=3, substr_window=4,
        neardup=True,
    )
    corpus.save_curation_state(st, full_s + "/v0")
    st2 = corpus.curation_state(
        corp, reference=None, gopher=False, line_min_docs=3, substr_window=4,
        neardup=True,
    )
    corpus.save_curation_state(st2, delt_s + "/v0")
    for b, df in enumerate(batches):
        S.curate_batch_version(spark, full_s, full_o, df, b)
        S.curate_batch_version(
            spark, delt_s, delt_o, df, b, state_layout="delta"
        )
        assert _rows(spark.read.parquet(f"{delt_o}/b{b}")) == _rows(
            spark.read.parquet(f"{full_o}/b{b}")
        )
        # the delta version holds ONLY the batch's ids — the flat-write pin
        meta = hfs.load_json(spark, f"{delt_s}/v{b + 1}/state.json")
        assert meta["delta"] is True and meta["parent"] == b
        dl_ids = {r[0] for r in spark.read.parquet(f"{delt_s}/v{b+1}/ids").collect()}
        assert dl_ids == {r[0] for r in df.select("doc_id").collect()}
    final_full = S.latest_curation_state(spark, full_s)
    final_delta = S.latest_curation_state(spark, delt_s)
    for rel in _STATE_RELS:
        assert _rows(getattr(final_delta, rel)) == _rows(
            getattr(final_full, rel)
        ), f"state relation {rel} diverged"
    # retry idempotence on the delta layout: re-running the last batch
    # resolves the same parent chain and regenerates an identical delta
    last = len(batches) - 1
    before = {
        rel: _rows(spark.read.parquet(f"{delt_s}/v{last+1}/{rel}"))
        for rel in _STATE_RELS
    }
    S.curate_batch_version(
        spark, delt_s, delt_o, batches[last], last, state_layout="delta"
    )
    for rel in _STATE_RELS:
        assert _rows(spark.read.parquet(f"{delt_s}/v{last+1}/{rel}")) == before[rel]


def test_compact_curation_state_and_continue(spark, tmpdir):
    """Compaction collapses the newest delta chain to a full save with the
    identical logical state; later batches keep ingesting against it and
    still match the never-compacted full layout."""
    from spark_iforest_spark import fs as hfs

    corp, batches = _curation_fixture(spark)
    full_s, full_o = str(tmpdir) + "/fs", str(tmpdir) + "/fo"
    delt_s, delt_o = str(tmpdir) + "/ds", str(tmpdir) + "/do"
    for sd in (full_s, delt_s):
        corpus.save_curation_state(
            corpus.curation_state(
                corp, reference=None, gopher=False, line_min_docs=3,
                substr_window=4, neardup=True,
            ),
            sd + "/v0",
        )
    for b, df in enumerate(batches[:2]):
        S.curate_batch_version(spark, full_s, full_o, df, b)
        S.curate_batch_version(
            spark, delt_s, delt_o, df, b, state_layout="delta"
        )
    before = {
        rel: _rows(getattr(S.latest_curation_state(spark, delt_s), rel))
        for rel in _STATE_RELS
    }
    assert corpus.compact_curation_state(spark, delt_s) == 2
    meta = hfs.load_json(spark, f"{delt_s}/v2/state.json")
    assert not meta.get("delta")
    assert "lm" not in meta["relations"]  # no ccnet in this recipe
    after = S.latest_curation_state(spark, delt_s)
    for rel in _STATE_RELS:
        assert _rows(getattr(after, rel)) == before[rel], rel
    # compacting an already-full newest version is a no-op
    assert corpus.compact_curation_state(spark, delt_s) == 2
    # ingestion continues against the compacted base
    S.curate_batch_version(
        spark, delt_s, delt_o, batches[2], 2, state_layout="delta"
    )
    S.curate_batch_version(spark, full_s, full_o, batches[2], 2)
    assert _rows(spark.read.parquet(f"{delt_o}/b2")) == _rows(
        spark.read.parquet(f"{full_o}/b2")
    )
    for rel in _STATE_RELS:
        assert _rows(getattr(S.latest_curation_state(spark, delt_s), rel)) == _rows(
            getattr(S.latest_curation_state(spark, full_s), rel)
        ), rel


def test_curate_stream_delta_layout_end_to_end(spark, tmpdir):
    """The streaming driver in delta layout: multi-micro-batch run equals
    the sequential batch-mode replay (same contract the full layout is
    pinned to), with per-version writes that are batch-deltas."""
    corp, batches = _curation_fixture(spark)
    state_dir, out_dir = str(tmpdir) + "/state", str(tmpdir) + "/out"
    src = str(tmpdir) + "/src"
    st = corpus.curation_state(
        corp, reference=corp, gopher=False, line_min_docs=3, substr_window=4,
        neardup=True,
    )
    corpus.save_curation_state(st, state_dir + "/v0")
    all_docs = batches[0]
    for b in batches[1:]:
        all_docs = all_docs.unionByName(b)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = S.curate_stream(stream, state_dir, out_dir, state_layout="delta")
    q.awaitTermination()
    # batch composition from the id DELTAS (v{b+1}/ids IS the batch)
    replay = corpus.load_curation_state(spark, state_dir + "/v0")
    for b in range(3):
        batch_ids = {
            r[0]
            for r in spark.read.parquet(f"{state_dir}/v{b+1}/ids").collect()
        }
        assert batch_ids
        batch_df = all_docs.where(F.col("doc_id").isin(*batch_ids))
        out, replay = corpus.curate_and_update_state(batch_df, replay)
        assert _rows(spark.read.parquet(f"{out_dir}/b{b}")) == _rows(out), b
    final = S.latest_curation_state(spark, state_dir)
    for rel in _STATE_RELS:
        assert _rows(getattr(final, rel)) == _rows(getattr(replay, rel)), rel
    curated = {
        r.doc_id: r.text for r in spark.read.parquet(out_dir + "/b*").collect()
    }
    assert 20 not in curated
    assert curated[10] == "solo alpha beta"


def test_delta_fold_probe_pushes_semi_join_to_scans(spark, tmpdir):
    """The scale contract of the lazy chain folds (load_curation_state
    docstring): a batch-keyed left-semi probe of a folded index must push
    BELOW the fold's Aggregate and into every Union branch, landing on
    the parquet scans — so probing a delta chain costs key-filtered
    scans, not a corpus-wide fold shuffle. Pinned on the optimized plan."""
    docs = spark.createDataFrame(
        [(i, f"line{i % 5}\nmore{i % 3}") for i in range(50)],
        "doc_id long, text string",
    )
    a, b = str(tmpdir) + "/a", str(tmpdir) + "/b"
    pipeline.line_count_index(docs.where("doc_id < 25")).write.parquet(a)
    pipeline.line_count_index(docs.where("doc_id >= 25")).write.parquet(b)
    fold = pipeline.merge_line_count_indexes(
        spark.read.parquet(a), spark.read.parquet(b)
    )
    keys = spark.createDataFrame([("x",)], "line_md5 string")
    probe = fold.join(F.broadcast(keys), "line_md5", "left_semi")
    plan = probe._jdf.queryExecution().optimizedPlan().toString()
    agg_at = plan.index("Aggregate")
    union_at = plan.index("Union")
    semi_at = plan.index("Join LeftSemi")
    assert agg_at < union_at < semi_at  # semi below the fold, not above
    assert plan.count("Join LeftSemi") == 2  # pushed into BOTH branches


def test_delta_ingest_resumes_from_stream_checkpoint(spark, tmpdir):
    """Restart semantics end-to-end: an availableNow run with a
    checkpointLocation drains the current backlog; after new files
    arrive, a SECOND run from the same checkpoint processes ONLY them,
    batch ids continue, and the delta-folded index still equals the
    one-shot relation over everything ingested — the stop/deploy/restart
    cycle a production ingest loop lives through."""
    idx = str(tmpdir) + "/idx"
    ckpt = str(tmpdir) + "/ckpt"
    src = str(tmpdir) + "/src"
    b0 = spark.createDataFrame([(1, "aaa"), (2, "bbb")], "doc_id long, text string")
    b1 = spark.createDataFrame([(3, "aaa"), (4, "ccc")], "doc_id long, text string")
    b0.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: S.merge_index_delta(spark, idx, df, bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    parts_after_first = set(S._part_ids(spark, idx, "b"))
    assert parts_after_first == {0}
    b1.coalesce(1).write.mode("append").parquet(src)
    run_once()  # resumes from the checkpoint: only the new file, batch id 1
    assert set(S._part_ids(spark, idx, "b")) == {0, 1}
    got = _rows(S.latest_dedup_index(spark, idx))
    assert got == _rows(dedup.exact_dedup(b0.unionByName(b1)))


def test_curate_stream_delta_resumes_from_stream_checkpoint(spark, tmpdir):
    """Same restart cycle for the curation capstone in delta layout: the
    second availableNow run from the checkpoint curates only the new
    file, the state chain extends (not re-writes), and the final logical
    state equals the uninterrupted sequential replay."""
    corp, batches = _curation_fixture(spark)
    state_dir, out_dir = str(tmpdir) + "/state", str(tmpdir) + "/out"
    ckpt, src = str(tmpdir) + "/ckpt", str(tmpdir) + "/src"
    corpus.save_curation_state(
        corpus.curation_state(
            corp, reference=None, gopher=False, line_min_docs=3,
            substr_window=4, neardup=True,
        ),
        state_dir + "/v0",
    )

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: S.curate_batch_version(
                    spark, state_dir, out_dir, df, bid, state_layout="delta"
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batches[0].coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert S._index_versions(spark, state_dir) == [0, 1]
    batches[1].coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert S._index_versions(spark, state_dir) == [0, 1, 2]
    replay = corpus.load_curation_state(spark, state_dir + "/v0")
    for b in range(2):
        out, replay = corpus.curate_and_update_state(batches[b], replay)
        assert _rows(spark.read.parquet(f"{out_dir}/b{b}")) == _rows(out)
    final = S.latest_curation_state(spark, state_dir)
    for rel in _STATE_RELS:
        assert _rows(getattr(final, rel)) == _rows(getattr(replay, rel)), rel


def test_delta_retention_cycle_compact_then_prune(spark, tmpdir):
    """The delta chain's full retention cycle: compact the newest version,
    THEN prune — the latest state still loads, the next batch ingests
    against it, and a stale retry whose pruned-parent chain is gone fails
    LOUDLY with the ordering hint instead of silently mis-folding."""
    corp, batches = _curation_fixture(spark)
    state_dir, out_dir = str(tmpdir) + "/state", str(tmpdir) + "/out"
    corpus.save_curation_state(
        corpus.curation_state(
            corp, reference=None, gopher=False, line_min_docs=3,
            substr_window=4, neardup=True,
        ),
        state_dir + "/v0",
    )
    for b, df in enumerate(batches[:2]):
        S.curate_batch_version(
            spark, state_dir, out_dir, df, b, state_layout="delta"
        )
    assert corpus.compact_curation_state(spark, state_dir) == 2
    pruned = S.prune_versions(spark, state_dir, keep=2)
    assert pruned == [0]  # v1 (delta) + v2 (full) survive
    # forward path intact: latest loads, next batch ingests
    before = _rows(S.latest_curation_state(spark, state_dir).ids)
    S.curate_batch_version(
        spark, state_dir, out_dir, batches[2], 2, state_layout="delta"
    )
    assert len(_rows(S.latest_curation_state(spark, state_dir).ids)) > len(before)
    # stale retries fail LOUDLY, never silently mis-fold: batch 0 finds
    # no version <= 0 at all (v0 pruned); batch 1 resolves parent v1 — a
    # delta whose own parent v0 is gone — and gets the ordering hint
    with pytest.raises(ValueError, match="no CurationState version"):
        S.curate_batch_version(
            spark, state_dir, out_dir, batches[0], 0, state_layout="delta"
        )
    with pytest.raises(ValueError, match="compact_curation_state FIRST"):
        S.curate_batch_version(
            spark, state_dir, out_dir, batches[1], 1, state_layout="delta"
        )


def test_corpus_diff_semantics(spark):
    """added/removed/changed classified exactly; unchanged docs silent;
    text never leaves the scan (the join moves only (id, md5) rows)."""
    old = _docs(
        spark,
        [(1, "same"), (2, "will change"), (3, "will vanish"), (5, None),
         (6, None)],
    )
    new = _docs(
        spark,
        [(1, "same"), (2, "has changed"), (4, "brand new"),
         (5, "null became text"), (6, None)],
    )
    got = {
        r["doc_id"]: (r["change"], r["old_md5"] is None, r["new_md5"] is None)
        for r in corpus.corpus_diff(old, new).collect()
    }
    # NULL text digests as '' (docstring convention): 5 is CHANGED (not
    # 'added'), 6 (NULL -> NULL) is unchanged and silent
    assert got == {
        2: ("changed", False, False),
        3: ("removed", False, True),
        4: ("added", True, False),
        5: ("changed", False, False),
    }
    # scan shape: the digests are computed BELOW the join (each side is a
    # Project to (id, md5) before the FullOuter), so only 32-byte digest
    # rows shuffle — never document text
    plan = (
        corpus.corpus_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    join_at = plan.index("Join FullOuter")
    assert plan.index("AS old_md5") > join_at  # projected under the join
    assert plan.index("AS new_md5") > join_at


# ---------------------------------------------------------------------------
# 5. streaming ANN ingest (round-11 extension: the similarity family joins
#    the continuous-ingestion story)
# ---------------------------------------------------------------------------


def test_ann_ingest_matches_one_shot_and_compacts(spark, sf_dir, tmpdir):
    """Stream-ingested IVF cell parts searched through ivf_topk's
    persisted-index mode return EXACTLY the from-scratch relation; a
    retried batch id overwrites its own part; compaction preserves the
    search results and post-compaction batches keep appending."""
    from spark_iforest_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    centers = similarity.ivf_centers(emb, n_centroids=8)
    idx, src = str(tmpdir) + "/idx", str(tmpdir) + "/src"
    for k in range(3):
        emb.where(F.col("vec_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.ann_ingest(stream, idx, centers).awaitTermination()
    assert set(S._part_ids(spark, idx, "b")) == {0, 1, 2}

    def search():
        return _rows(
            similarity.ivf_topk(
                emb, q, n_centroids=8, n_probe=7,
                centers=centers, assigned=S.latest_ann_index(spark, idx),
            )
        )

    want = _rows(similarity.ivf_topk(emb, q, n_centroids=8, n_probe=7))
    got = search()
    assert got == want and len(got) > 0
    # retry: re-executing batch 2 (whatever rows it actually held — file
    # pickup order is the stream's) overwrites its own part bit-compatibly
    b2_ids = [
        r[0] for r in spark.read.parquet(idx + "/b2").select("neighbor_id").collect()
    ]
    similarity.ivf_assign(
        emb.where(F.col("vec_id").isin(b2_ids)), centers
    ).write.partitionBy("cell").mode("overwrite").parquet(idx + "/b2")
    assert search() == want
    # compaction folds to one cell-partitioned base; results unchanged
    assert S.compact_ann_index(spark, idx) == 2
    assert search() == want
    """tools/skew_demo's measured hot-key demo and this pin share ONE
    fixture builder, so the equivalence the demo asserts at demo scale is
    the equivalence CI checks: salted_join == plain inner join on a
    relation where one key owns half the left side."""
    from tools.skew_demo import make_skewed_fixture
    from spark_iforest_spark.operators import relational

    left, right = make_skewed_fixture(spark, n_rows=20_000, n_keys=50,
                                      hot_frac=0.5)
    plain = left.join(right, left["k"] == right["rk"])
    salted = relational.salted_join(left, right, "k", "rk", salt=4)
    assert _rows(salted) == _rows(plain)
    rep = relational.skew_report(left, "k", top_k=1).collect()[0]
    assert rep["key"] == 0 and rep["frac_of_table"] >= 0.49  # genuinely skewed


def test_curate_stream_delta_rejects_keep_versions(spark, tmpdir):
    corp, _ = _curation_fixture(spark)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value as doc_id", "'x' as text")
    )
    with pytest.raises(ValueError, match="delta"):
        S.curate_stream(
            stream, str(tmpdir) + "/s", str(tmpdir) + "/o",
            keep_versions=2, state_layout="delta",
        )
    with pytest.raises(ValueError, match="compact_every"):
        S.curate_stream(
            stream, str(tmpdir) + "/s", str(tmpdir) + "/o", compact_every=2,
        )


def test_curate_stream_delta_in_stream_compaction_and_funnel(spark, tmpdir):
    """compact_every=2 inside the stream: the chain is collapsed after
    every second batch (the version the next batch reads is FULL, so
    the fold chain stays bounded), results still equal the sequential
    replay, and funnel_dir works in delta layout (the report comes from
    the same chain run)."""
    from spark_iforest_spark import fs as hfs

    corp, batches = _curation_fixture(spark)
    state_dir, out_dir = str(tmpdir) + "/state", str(tmpdir) + "/out"
    funnel_dir, src = str(tmpdir) + "/funnel", str(tmpdir) + "/src"
    corpus.save_curation_state(
        corpus.curation_state(
            corp, reference=None, gopher=False, line_min_docs=3,
            substr_window=4, neardup=True,
        ),
        state_dir + "/v0",
    )
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = S.curate_stream(
        stream, state_dir, out_dir, state_layout="delta",
        funnel_dir=funnel_dir, compact_every=2,
    )
    q.awaitTermination()
    assert S._index_versions(spark, state_dir) == [0, 1, 2, 3]
    # v2 was compacted after batch 1 (2 committed batches); v3 is a delta
    # whose parent chain bottoms out at the full v2 — one-link chain
    assert not hfs.load_json(spark, state_dir + "/v2/state.json").get("delta")
    assert hfs.load_json(spark, state_dir + "/v3/state.json")["parent"] == 2
    # order-faithful replay via the id deltas (v3) / id diffs (full v1,v2)
    ids_of = {
        v: {
            r[0]
            for r in spark.read.parquet(f"{state_dir}/v{v}/ids").collect()
        }
        for v in (0, 1, 2, 3)
    }
    all_docs = batches[0].unionByName(batches[1]).unionByName(batches[2])
    replay = corpus.load_curation_state(spark, state_dir + "/v0")
    # per-version batch ids, layout-aware: delta versions hold ONLY the
    # batch's ids; the compacted full v2 holds corpus ∪ batches 0-1
    per_batch_ids = [
        ids_of[1],                                  # v1 delta
        ids_of[2] - ids_of[0] - ids_of[1],          # v2 full (compacted)
        ids_of[3],                                  # v3 delta
    ]
    for b in range(3):
        batch_ids = per_batch_ids[b]
        batch_df = all_docs.where(F.col("doc_id").isin(*batch_ids))
        out, replay = corpus.curate_and_update_state(batch_df, replay)
        assert _rows(spark.read.parquet(f"{out_dir}/b{b}")) == _rows(out), b
        # the funnel report exists and its input row matches the batch
        fun = {
            r["stage"]: r["n_docs"]
            for r in spark.read.parquet(f"{funnel_dir}/b{b}").collect()
        }
        assert fun["input"] == len(batch_ids)
    final = S.latest_curation_state(spark, state_dir)
    for rel in _STATE_RELS:
        assert _rows(getattr(final, rel)) == _rows(getattr(replay, rel)), rel


def test_ndv_parts_series_monotone(spark, tmpdir):
    """merge_ndv_part's estimate series: computed from the fold over parts
    up to each batch — monotone non-decreasing, final point == the fold
    over everything."""
    from spark_iforest_spark.operators import relational

    state, series = str(tmpdir) + "/s", str(tmpdir) + "/ser"
    for b in range(3):
        df = spark.createDataFrame(
            [((b * 5 + i) % 12,) for i in range(8)], "id long"
        )
        S.merge_ndv_part(spark, state, df, b, ["id"], series_dir=series)
    rows = sorted(
        map(tuple, S.ndv_series(spark, series).collect())
    )  # (batch_version, column, ndv)
    vals = [r[2] for r in rows]
    assert vals == sorted(vals)  # monotone
    final = relational.ndv_estimates(
        S.latest_ndv_sketches(spark, state)
    ).collect()[0]["ndv"]
    assert vals[-1] == final

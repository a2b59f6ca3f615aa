"""Round 13: the round-12 advisory fixes.

1. recurate_with_diff's ``broadcast_affected=False`` escape hatch now
   reaches the near-dup pair generation (e2 no longer hardcodes the
   broadcast probe) — shuffle-semi-join semantics equal broadcast.
2. parts_store.compact auto-finishes the force=True crash window (zero
   live parts + intact staged base) instead of raising "no parts".
3. requantize_ann_index(stats_dir=...) fences the drift monitor: stats
   computed in the OLD assignment space are archived so a default-window
   ann_drift_report never folds them against the NEW baseline.
"""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark import fs as hfs, parts_store, streaming as S
from spark_iforest_spark.operators import corpus, dedup, recurate, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# 1. broadcast_affected passthrough to near-dup pair generation
# ---------------------------------------------------------------------------


def test_recurate_shuffle_semijoin_path_matches_broadcast(spark):
    """The large-diff escape hatch: broadcast_affected=False swaps every
    affected-key broadcast — INCLUDING _jaccard_pairs_vs_index's batch
    shingle-key probe (round-12 advice: e2 hardcoded broadcast) — for
    shuffle semi-joins, with bit-identical state. The scenario exercises
    the e2 path (changed docs paired against the retained index) plus a
    cluster split."""
    w = ["w%02d" % i for i in range(1, 24)]
    a_rows = [
        (5, " ".join(w[0:20])),
        (6, " ".join(w[1:21])),
        (7, " ".join(w[3:23])),
        (8, "totally separate doc eight body"),
    ]
    # remove the bridge (split) AND change doc 8 into a near-dup of 5
    b_rows = [
        (5, " ".join(w[0:20])),
        (7, " ".join(w[3:23])),
        (8, " ".join(w[0:19]) + " tail"),
    ]
    kw = dict(gopher=False, line_min_docs=None, substr_window=None,
              neardup=True)
    a, b = _docs(spark, a_rows), _docs(spark, b_rows)
    state_a = corpus.materialize_curation_state(
        corpus.curation_state(a, retractable=True, **kw)
    )
    diff = corpus.corpus_diff(a, b)
    _, st_bcast = recurate.recurate_with_diff(
        b, diff, state_a, broadcast_affected=True
    )
    _, st_shuffle = recurate.recurate_with_diff(
        b, diff, state_a, broadcast_affected=False
    )
    for name in ("ids", "shingle_index", "labels", "quality", "nin_digest"):
        ga = getattr(corpus.materialize_curation_state(st_shuffle), name)
        wa = getattr(corpus.materialize_curation_state(st_bcast), name)
        assert (ga is None) == (wa is None), name
        if ga is not None:
            assert _rows(ga) == _rows(wa), name
    # and both equal from-scratch
    want = corpus.materialize_curation_state(
        corpus.curation_state(b, retractable=True, **kw)
    )
    assert _rows(corpus.curated_digests(st_shuffle)) == _rows(
        corpus.curated_digests(want)
    )


# ---------------------------------------------------------------------------
# 2. compact recovers the force=True crash window
# ---------------------------------------------------------------------------


def test_compact_finishes_crashed_force_rename(spark, tmpdir):
    """force=True crash between deleting the live base and the rename
    leaves zero live parts + an intact _staging_c{M}. A re-run of compact
    must finish the rename itself (round-12 advice: it raised 'no parts'
    with no pointer to the staged fold) — without invoking the fold."""
    idx = str(tmpdir) + "/idx"
    b0 = _docs(spark, [(1, "aa"), (2, "bb")])
    b1 = _docs(spark, [(3, "aa"), (4, "cc")])
    S.merge_index_delta(spark, idx, b0, 0)
    S.merge_index_delta(spark, idx, b1, 1)
    want = _rows(S.latest_dedup_index(spark, idx))
    assert S.compact_dedup_index(spark, idx) == 1
    # simulate the crash: the staged replacement is complete, the live
    # base was deleted, the rename never ran
    assert hfs.rename(spark, f"{idx}/c1", f"{idx}/_staging_c1")
    assert parts_store.live_parts(spark, idx) is None

    def boom(live, staging):
        raise AssertionError("recovery must not re-run the fold")

    assert parts_store.compact(spark, idx, boom) == 1
    names = {c["name"] for c in hfs.list_children(spark, idx)}
    assert names == {"c1"}
    assert _rows(S.latest_dedup_index(spark, idx)) == want


def test_compact_recovery_prefers_newest_staged_base(spark, tmpdir):
    """An older mid-fold staging leftover must lose to the newest staged
    base (the completed force fold), and be GC'd by the recovery."""
    idx = str(tmpdir) + "/idx"
    b0 = _docs(spark, [(1, "aa"), (2, "bb")])
    S.merge_index_delta(spark, idx, b0, 0)
    S.merge_index_delta(spark, idx, _docs(spark, [(3, "cc")]), 1)
    want = _rows(S.latest_dedup_index(spark, idx))
    assert S.compact_dedup_index(spark, idx) == 1
    # stale partial staging from an old crashed compactor at a lower id
    hfs.write_bytes(spark, f"{idx}/_staging_c0/partial", b"junk")
    assert hfs.rename(spark, f"{idx}/c1", f"{idx}/_staging_c1")

    def boom(live, staging):
        raise AssertionError("recovery must not re-run the fold")

    assert parts_store.compact(spark, idx, boom) == 1
    names = {c["name"] for c in hfs.list_children(spark, idx)}
    assert names == {"c1"}  # stale staging GC'd too
    assert _rows(S.latest_dedup_index(spark, idx)) == want


def test_compact_empty_dir_still_raises(spark, tmpdir):
    d = str(tmpdir) + "/empty"
    hfs.write_bytes(spark, f"{d}/.keep", b"")
    with pytest.raises(ValueError, match="no parts"):
        parts_store.compact(spark, d, lambda live, staging: None)


# ---------------------------------------------------------------------------
# 3. requantize fences the drift monitor's stats chain
# ---------------------------------------------------------------------------


def test_requantize_fences_pre_requantize_stats(spark, tmpdir):
    """Stats parts written under the OLD quantizer are archived by
    requantize_ann_index(stats_dir=...) (round-12 advice: a default
    last_batches=None drift report folded old-space stats against the
    new baseline, alarming spuriously). After the fence the default
    window is empty; post-requantize ingest against the new centers
    reports quiet vs the new baseline."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 6
    rows = [
        (int(i), [float(x) for x in rng.normal(size=dim)]) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = similarity.ivf_centers(emb, n_centroids=2)
    idx = str(tmpdir) + "/idx"
    stats = str(tmpdir) + "/stats"
    # batch-shaped ingest: index part + two old-space stats parts
    assigned = similarity.ivf_assign(emb, centers, with_distance=True)
    assigned.drop("d2").write.partitionBy("cell").parquet(f"{idx}/b0")
    st = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"), F.sum("d2").alias("sum_d2")
    )
    for i in (0, 1):
        st.select(
            F.lit(i).alias("batch_version"), "cell", "n", "sum_d2"
        ).write.parquet(f"{stats}/b{i}")
    assert parts_store.part_ids(spark, stats, "b") == [0, 1]

    new_centers, base_id = S.requantize_ann_index(
        spark, idx, n_centroids=3, stats_dir=stats
    )
    # old-space stats parts archived, not deleted
    assert parts_store.part_ids(spark, stats, "b") == []
    names = {c["name"] for c in hfs.list_children(spark, stats)}
    assert names == {f"_pre_c{base_id}_b0", f"_pre_c{base_id}_b1"}
    # default-window drift report now has nothing stale to fold
    with pytest.raises(ValueError, match="no stats parts"):
        S.ann_drift_report(spark, stats, st)
    # post-requantize ingest in the NEW space is quiet vs the NEW baseline
    new_index = S.latest_ann_index(spark, idx).select(
        F.col("neighbor_id").alias("vec_id"), F.col("nv").alias("embedding")
    )
    new_baseline = S.ann_baseline_stats(new_index, new_centers)
    similarity.ivf_assign(emb, new_centers, with_distance=True).groupBy(
        "cell"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("d2").alias("sum_d2")
    ).select(
        F.lit(2).alias("batch_version"), "cell", "n", "sum_d2"
    ).write.parquet(f"{stats}/b2")
    rep = S.ann_drift_report(spark, stats, new_baseline)
    assert not rep["alarm"], rep


# ---------------------------------------------------------------------------
# 4. drift-cutpoint contract: monitor + recalibration (round-13 directive 2)
# ---------------------------------------------------------------------------


_CCNET_KW = dict(
    gopher=False, line_min_docs=2, substr_window=None, neardup=True,
    retractable=True,
)

_STATE_RELS = (
    "ids", "line_index", "substr_index", "shingle_index", "labels",
    "quality", "nin_digest", "line_detail", "substr_detail",
)


def _assert_states_equal(got, want):
    for name in _STATE_RELS:
        ga, wa = getattr(got, name), getattr(want, name)
        assert (ga is None) == (wa is None), f"{name}: presence differs"
        if ga is not None:
            assert _rows(ga) == _rows(wa), f"{name}: rows differ"
    assert _rows(corpus.curated_digests(got)) == _rows(
        corpus.curated_digests(want)
    )


def _plain_rows(n0, k):
    base = "the quick brown fox jumps over the lazy dog near the old river"
    return [(n0 + i, f"{base} tail {n0 + i}\nshared nav line here") for i in range(k)]


def _junk_rows(n0, k):
    return [
        (n0 + i, f"zzq{i} qqzx vvkw jjqz xxqv wwzk kkvq zzjx qvw{i} zkq")
        for i in range(k)
    ]


def test_recalibrate_ccnet_equals_from_scratch(spark):
    """The drift-cutpoint recovery: after churn under the FROZEN
    calibration, recalibrate_ccnet refits the cutpoints on the current
    snapshot and cascades exactly the keep-decision flips — the result
    equals curation_state built from scratch over the same snapshot and
    reference, INCLUDING the ccnet stage (the half the recurate oracle
    deliberately froze)."""
    from spark_iforest_spark.operators import recurate

    ref = _docs(spark, _plain_rows(1000, 6))
    a = _docs(spark, _plain_rows(0, 8))
    state_a = corpus.materialize_curation_state(
        corpus.curation_state(a, reference=ref, **_CCNET_KW)
    )
    # churn: drop one, change one, add three junk docs that shift the
    # score terciles enough to move the cutpoints
    b_rows = (
        [r for r in _plain_rows(0, 8) if r[0] not in (3, 7)]
        + [(7, _plain_rows(0, 8)[7][1] + " changed marker")]
        + _junk_rows(100, 3)
    )
    b = _docs(spark, b_rows)
    _, st_b = recurate.recurate_with_diff(b, corpus.corpus_diff(a, b), state_a)
    st_b = corpus.materialize_curation_state(st_b)

    _, st_b2, rep = recurate.recalibrate_ccnet(b, st_b)
    want = corpus.materialize_curation_state(
        corpus.curation_state(b, reference=ref, **_CCNET_KW)
    )
    assert rep["new_cutpoints"] == want.cutpoints
    assert rep["new_cutpoints"] != rep["old_cutpoints"]
    assert rep["n_flips"] >= 1  # the cascade actually exercised
    _assert_states_equal(corpus.materialize_curation_state(st_b2), want)


def test_recalibrate_ccnet_no_drift_is_identity(spark):
    from spark_iforest_spark.operators import recurate

    ref = _docs(spark, _plain_rows(1000, 6))
    a = _docs(spark, _plain_rows(0, 8))
    state_a = corpus.materialize_curation_state(
        corpus.curation_state(a, reference=ref, **_CCNET_KW)
    )
    _, st2, rep = recurate.recalibrate_ccnet(a, state_a)
    assert rep["new_cutpoints"] == rep["old_cutpoints"]
    assert rep["n_flips"] == 0
    assert _rows(corpus.curated_digests(st2)) == _rows(
        corpus.curated_digests(state_a)
    )


def test_recalibrate_ccnet_requires_ccnet_state(spark):
    from spark_iforest_spark.operators import recurate

    a = _docs(spark, _plain_rows(0, 4))
    st = corpus.curation_state(a, reference=None, **_CCNET_KW)
    with pytest.raises(ValueError, match="no ccnet stage"):
        recurate.recalibrate_ccnet(a, st)


def test_ccnet_drift_monitor_end_to_end(spark, tmpdir):
    """The churn-accumulating drift loop through the real streaming sink:
    curate_stream(ccnet_stats_dir=...) writes per-batch band stats under
    the frozen calibration; ccnet_drift_report is quiet on
    calibration-like batches and alarms (band PSI + mean-NLL ratio) on
    drifted ones."""
    from spark_iforest_spark.operators import text as T

    ref = _docs(spark, _plain_rows(1000, 6))
    a = _docs(spark, _plain_rows(0, 10))
    kw = dict(
        gopher=False, line_min_docs=2, substr_window=None, neardup=False,
    )
    state = corpus.curation_state(a, reference=ref, **kw)
    sd = str(tmpdir) + "/state"
    corpus.save_curation_state(state, f"{sd}/v0")
    state = corpus.load_curation_state(spark, f"{sd}/v0")
    baseline = corpus.ccnet_stage_stats(a, state)
    assert {r["band"] for r in baseline.collect()} <= {1, 2, 3}

    src = str(tmpdir) + "/src"
    out = str(tmpdir) + "/out"
    stats = str(tmpdir) + "/ccstats"
    quiet = _docs(spark, _plain_rows(50, 8))
    quiet.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(quiet.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.curate_stream(
        stream, sd, out, ccnet_stats_dir=stats,
        checkpoint_dir=str(tmpdir) + "/ck",
    ).awaitTermination()
    n_quiet = len(parts_store.part_ids(spark, stats, "b"))
    assert n_quiet >= 2
    rep0 = S.ccnet_drift_report(spark, stats, baseline)
    assert not rep0["alarm"], rep0

    drift = _docs(spark, _junk_rows(200, 8))
    drift.repartition(2).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(quiet.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.curate_stream(
        stream2, sd, out, ccnet_stats_dir=stats,
        checkpoint_dir=str(tmpdir) + "/ck",
    ).awaitTermination()
    n_drift = len(parts_store.part_ids(spark, stats, "b")) - n_quiet
    assert n_drift >= 1
    rep1 = S.ccnet_drift_report(
        spark, stats, baseline, last_batches=n_drift
    )
    assert rep1["alarm"], rep1
    assert rep1["mean_nll_ratio"] > 1.0


# ---------------------------------------------------------------------------
# 5. in-stream retention (round-13 directive 4)
# ---------------------------------------------------------------------------


def test_prune_curation_history_bounds_delta_chain(spark, tmpdir):
    """prune_curation_history deletes chain versions older than the
    second-newest FULL save — everything a retry could still read stays,
    the loaded state is unchanged, and the directory stops growing."""
    sd = str(tmpdir) + "/state"
    corp = _docs(spark, [(1, "one body text"), (2, "two body text")])
    kw = dict(gopher=False, line_min_docs=2, substr_window=None, neardup=False)
    corpus.save_curation_state(corpus.curation_state(corp, **kw), f"{sd}/v0")
    with pytest.raises(ValueError, match=">= 2"):
        corpus.prune_curation_history(spark, sd, keep_full=1)
    for b in range(6):
        batch = _docs(spark, [(100 + 10 * b + i, f"batch {b} doc {i} body") for i in range(2)])
        S.curate_batch_version(
            spark, sd, str(tmpdir) + "/out", batch, b, state_layout="delta"
        )
        if (b + 1) % 2 == 0:
            corpus.compact_curation_state(spark, sd)
    # versions: v0(full) v1 v2(full) v3 v4(full) v5 v6(full)
    want = _rows(S.latest_curation_state(spark, sd).ids)
    pruned = corpus.prune_curation_history(spark, sd)
    assert pruned  # something was actually deleted
    left = sorted(
        int(c["name"][1:]) for c in hfs.list_children(spark, sd)
        if c["name"].startswith("v")
    )
    # boundary = second-newest full save; everything >= it survives
    assert left[0] >= 2 and 6 in left
    assert _rows(S.latest_curation_state(spark, sd).ids) == want
    # idempotent second call with nothing newer
    assert corpus.prune_curation_history(spark, sd) == []


def test_curate_stream_prune_history_guard_and_bound(spark, tmpdir):
    corp = _docs(spark, [(1, "one body text"), (2, "two body text")])
    kw = dict(gopher=False, line_min_docs=2, substr_window=None, neardup=False)
    sd = str(tmpdir) + "/state"
    corpus.save_curation_state(corpus.curation_state(corp, **kw), f"{sd}/v0")
    src = str(tmpdir) + "/src"
    batches = _docs(
        spark, [(100 + i, f"streamed doc {i} body") for i in range(6)]
    )
    batches.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema(batches.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(ValueError, match="prune_history requires"):
        S.curate_stream(stream, sd, str(tmpdir) + "/out", prune_history=True)
    S.curate_stream(
        stream, sd, str(tmpdir) + "/out", state_layout="delta",
        compact_every=2, prune_history=True,
        checkpoint_dir=str(tmpdir) + "/ck",
        assume_disjoint_ids=True,
    ).awaitTermination()
    left = sorted(
        int(c["name"][1:]) for c in hfs.list_children(spark, sd)
        if c["name"].startswith("v")
    )
    # bounded: at most 2 full saves + the deltas between them
    assert len(left) <= 5, left
    st = S.latest_curation_state(spark, sd)
    got_ids = {r[0] for r in st.ids.collect()}
    assert got_ids == {1, 2} | {100 + i for i in range(6)}


def test_versioned_sinks_keep_versions(spark, tmpdir):
    """The three versioned-layout ingest wrappers prune in-stream to the
    newest keep_versions; the folded relation is unchanged and the guard
    rejects keep_versions<2 and non-versions layouts."""
    src = str(tmpdir) + "/src"
    docs = _docs(spark, [(i, f"text {i % 4}") for i in range(12)])
    docs.repartition(4).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    idx = str(tmpdir) + "/idx"
    S.incremental_dedup_ingest(
        stream(), idx, keep_versions=2,
        checkpoint_dir=str(tmpdir) + "/ck1",
    ).awaitTermination()
    vs = S._index_versions(spark, idx)
    assert len(vs) <= 2
    assert _rows(S.latest_dedup_index(spark, idx)) == _rows(
        dedup.exact_dedup(docs)
    )

    ndv = str(tmpdir) + "/ndv"
    S.ndv_monitor_ingest(
        stream(), ndv, ["doc_id"], keep_versions=2,
        checkpoint_dir=str(tmpdir) + "/ck2",
    ).awaitTermination()
    assert len(S._index_versions(spark, ndv)) <= 2
    from spark_iforest_spark.operators import relational

    est = {
        r["column"]: r["ndv"]
        for r in relational.ndv_estimates(
            S.latest_ndv_sketches(spark, ndv)
        ).collect()
    }
    assert est["doc_id"] == pytest.approx(12, rel=0.05)

    prof = str(tmpdir) + "/prof"
    S.profile_monitor_ingest(
        stream(), prof, ["doc_id"], keep_versions=2,
        checkpoint_dir=str(tmpdir) + "/ck3",
    ).awaitTermination()
    assert len(S._index_versions(spark, prof)) <= 2
    prow = S.latest_profile(spark, prof).collect()
    assert {r["column"] for r in prow} == {"doc_id"}

    with pytest.raises(ValueError, match=">= 2"):
        S.incremental_dedup_ingest(stream(), idx, keep_versions=1)
    with pytest.raises(ValueError, match="versions-layout"):
        S.incremental_dedup_ingest(
            stream(), idx, layout="delta", keep_versions=2
        )


# ---------------------------------------------------------------------------
# 6. kill/resume soak of the combined stream under cadence (directive 6)
# ---------------------------------------------------------------------------


def test_killresume_combined_stream_equals_uninterrupted(spark, tmpdir):
    """The checkpointed-restart path under compaction cadence: the
    combined doc-side step (curate delta + digest index + profile + NDV,
    compact_every=3 with history pruning) is crashed MID-STEP twice —
    once between sinks, once mid-compaction-sequence right after the
    curation compact+prune — and resumed from the same checkpoint. The
    staged-rename + strict-parent + checkpoint interaction must leave
    every final relation equal to an uninterrupted run (round-13
    directive 6: this is exactly where a torn state would hide)."""
    from spark_iforest_spark.checkpoint import snapshot

    kw = dict(
        gopher=False, line_min_docs=2, substr_window=None, neardup=False,
        retractable=True,
    )
    corp = _docs(spark, [(1, "seed one body"), (2, "seed two body")])
    batches = [
        [(100 + 10 * b + i, f"batch {b} doc {i} body") for i in range(2)]
        for b in range(6)
    ]
    finals = {}
    for leg in ("ref", "kill"):
        base = f"{tmpdir}/{leg}"
        sd, out = f"{base}/state", f"{base}/out"
        idx, prof, ndv = f"{base}/idx", f"{base}/prof", f"{base}/ndv"
        src, ck = f"{base}/src", f"{base}/ck"
        corpus.save_curation_state(corpus.curation_state(corp, **kw), f"{sd}/v0")
        for b, rows in enumerate(batches):
            _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)
        # crash points fire exactly once each (first delivery crashes,
        # the redelivery after restart runs through)
        pending = {"between_sinks": 1, "mid_compact": 5} if leg == "kill" else {}

        def step(batch_df, batch_id, _p=pending):
            b = snapshot(batch_df, eager=True)
            S.curate_batch_version(
                spark, sd, out, b, batch_id, state_layout="delta"
            )
            if (batch_id + 1) % 3 == 0:
                corpus.compact_curation_state(spark, sd)
                corpus.prune_curation_history(spark, sd)
                if _p.get("mid_compact") == batch_id:
                    del _p["mid_compact"]
                    raise RuntimeError("injected crash mid-compaction batch")
            S.merge_index_delta(spark, idx, b, batch_id)
            if _p.get("between_sinks") == batch_id:
                del _p["between_sinks"]
                raise RuntimeError("injected crash between sinks")
            if (batch_id + 1) % 3 == 0:
                S.compact_dedup_index(spark, idx)
            S.merge_profile_part(
                spark, prof, b.select(F.length("text").alias("len")),
                batch_id, ["len"],
            )
            if (batch_id + 1) % 3 == 0:
                S.compact_profile_parts(spark, prof)
            S.merge_ndv_part(spark, ndv, b, batch_id, ["doc_id"])
            if (batch_id + 1) % 3 == 0:
                S.compact_ndv_parts(spark, ndv)

        n_crashes = 0
        while True:
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                stream.writeStream.foreachBatch(step)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                break
            except Exception:
                n_crashes += 1
                assert n_crashes <= 3  # each injected crash fires once
        if leg == "kill":
            assert n_crashes == 2
        from spark_iforest_spark.operators import relational

        st = S.latest_curation_state(spark, sd)
        finals[leg] = {
            "ids": _rows(st.ids),
            "digests": _rows(corpus.curated_digests(st)),
            "index": _rows(S.latest_dedup_index(spark, idx)),
            "profile": _rows(
                S.latest_profile(spark, prof).select("column", "n_rows", "mean_value")
            ),
            "ndv": _rows(
                relational.ndv_estimates(
                    S.latest_ndv_sketches(spark, ndv)
                ).select("column", "ndv")
            ),
            "out": sorted(
                tuple(r)
                for r in spark.read.parquet(f"{out}/b*").select(
                    "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("h")
                ).collect()
            ),
        }
    assert finals["kill"] == finals["ref"]

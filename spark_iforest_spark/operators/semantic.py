"""Semantic-embedding clustering operators: sample-fit spherical k-means and
cluster-based corpus pruning — the SemDeDup / coreset-selection pass of an
LLM training-data pipeline (prune semantically redundant documents using
their embeddings, not their tokens).

Design: centroids are fit on a BOUNDED DETERMINISTIC SAMPLE (md5-hash
order, layout-independent) with driver-side numpy spherical k-means — the
realistic 100 TB shape: nobody runs Lloyd's over the full corpus; you fit a
coarse quantizer on ~10⁴-10⁶ sampled rows (metadata-sized) and assign the
corpus at scan speed. Assignment is a pure Catalyst expression against the
literal centroid matrix (k×d doubles inline in the plan): cosine to every
centroid via a JVM fold, argmax by array_position — whole-stage codegen,
ZERO extra shuffles, no Python workers. The only shuffle in
``semantic_prune`` is the per-cluster ranking window, whose partition count
is the cluster count: size n_clusters to the corpus (≈ corpus_size/10k) so
each window partition holds a bounded member list. Nothing is all-pairs.
For n_clusters beyond a few hundred the literal-matrix lookup automatically
switches to a vectorized mapInPandas matmul (``kmeans_clusters(...,
assign=...)``) — same relation, same determinism, plan stays small.

Spark ML's distributed KMeans was deliberately NOT used: its kmeans||
init samples per-partition, so the fitted model — and therefore the kept
set — changes with partition layout (measured: 250-row symmetric
difference between local[4]x4 and x32 layouts on 500 vectors). The
sample-fit is bit-deterministic in (data, seed) on ANY layout, which is
what lets the rows-only gate and cross-session reruns agree.

Cluster assignments still come from a seeded iterative optimizer, so gates
follow the iforest pattern: the raw relation is rows-only, and the
oracle-checked ``semantic_prune_checks`` pins the contract invariants
(counts, per-cluster caps, keep-order boundary) that any correct
implementation must satisfy.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from spark_iforest_spark.functions import cosine
from spark_iforest_spark.operators.pipeline import _md5_u32

_KMEANS_SEED = 0x5EED


def _spherical_kmeans(Xn: np.ndarray, k: int, seed: int, max_iter: int) -> np.ndarray:
    """Seeded spherical k-means (cosine distance) on a normalized sample.
    k-means++ init, Lloyd iterations, deterministic farthest-point reseed
    for empty clusters. Pure numpy on the driver — the sample is bounded,
    so this is O(sample·k·d) metadata work, not a distributed job."""
    rng = np.random.default_rng(seed)
    n = Xn.shape[0]
    idx = [int(rng.integers(n))]
    d = np.maximum(1.0 - Xn @ Xn[idx[0]], 0.0)
    for _ in range(1, min(k, n)):
        tot = d.sum()
        probs = d / tot if tot > 0 else np.full(n, 1.0 / n)
        nxt = int(rng.choice(n, p=probs))
        idx.append(nxt)
        d = np.minimum(d, np.maximum(1.0 - Xn @ Xn[nxt], 0.0))
    while len(idx) < k:  # degenerate: fewer sample points than clusters
        idx.append(idx[-1])
    C = Xn[idx].copy()
    for _ in range(max_iter):
        sims = Xn @ C.T
        assign = sims.argmax(axis=1)
        new_c = np.empty_like(C)
        # farthest-first point order for empty-cluster reseeds: each empty
        # cluster in a round takes the NEXT distinct farthest point, so two
        # empty clusters never collapse onto the same centroid
        far_order = np.argsort(sims.max(axis=1), kind="stable")
        far_pos = 0
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                new_c[j] = v / nv if nv > 1e-12 else C[j]
            else:
                new_c[j] = Xn[int(far_order[min(far_pos, len(far_order) - 1)])]
                far_pos += 1
        if np.allclose(new_c, C, rtol=0, atol=1e-12):
            C = new_c
            break
        C = new_c
    return C


def _fit_centroids(
    emb: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    seed: int,
    sample_n: int,
    max_iter: int,
) -> np.ndarray:
    """Deterministic bounded fit sample: rows in md5(id)-hash order (a total
    order independent of partition layout), first ``sample_n``. At 100 TB
    raise sample_n (driver holds sample_n·d doubles — 10⁶×768 ≈ 6 GB is the
    practical ceiling) or pre-aggregate with a coarser first-level sample."""
    rows = (
        emb.select(
            F.col(vec_col).cast("array<double>").alias("_v"),
            _md5_u32(F.col(id_col), "kmeans-sample").alias("_u"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("_u", "_id")
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return _spherical_kmeans(Xn, n_clusters, seed, max_iter)


def _centroid_literal(centers: np.ndarray) -> F.Column:
    """k×d centroid matrix as a nested array literal — metadata-sized for a
    coarse quantizer, so centroid scoring runs in codegen instead of a join
    or a Python closure."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centers])


def fit_centroids(
    emb: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = _KMEANS_SEED,
    sample_n: int = 4096,
    max_iter: int = 25,
) -> np.ndarray:
    """Public centroid fit for the frozen-artifact lifecycle: fit once per
    corpus snapshot, persist with ``fs.save_numpy``, and pass the loaded
    matrix to kmeans_clusters/semantic_prune as ``centers=`` so later
    batches assign without refitting (and without the sample scan)."""
    return _fit_centroids(emb, n_clusters, id_col, vec_col, seed, sample_n, max_iter)


def kmeans_clusters(
    emb: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = _KMEANS_SEED,
    sample_n: int = 4096,
    max_iter: int = 25,
    assign: str = "auto",
    matmul_threshold: int = 256,
    centers: np.ndarray | None = None,
) -> DataFrame:
    """Cluster assignment: (id, cluster_id, cos_to_centroid).

    ``centers`` (round 6) injects FROZEN centroids — the persisted-index
    mode of the incremental family (ivf_topk/pq_topk pattern): a corpus
    snapshot fits once (fs.save_numpy persists the matrix), and every
    later batch assigns against the stored artifact with no refit, so
    incremental assignment is trivially identical to the full run
    (pytest-pinned). Omit to fit from the deterministic sample.

    Centroids from the deterministic sample fit (module docstring); two
    assignment strategies emitting the same relation:

    * ``assign='literal'`` — argmax-cosine over the literal centroid matrix,
      computed JVM-side per row: a scan-speed codegen projection with no
      shuffle and no Python. The right plan while k×d fits comfortably in a
      plan literal (a few hundred clusters).
    * ``assign='matmul'`` — one vectorized mapInPandas pass: an Arrow batch
      of vectors against the centroid matrix as a single BLAS matmul. The
      large-k path (k in the thousands), where a k-element expression tree
      per row would bloat the plan and defeat codegen.

    ``assign='auto'`` picks matmul when n_clusters > matmul_threshold. Ties
    (exactly equal cosines) resolve to the lowest cluster index in both
    branches (array_position first-match / np.argmax first-max). Zero-norm
    input vectors (cosine undefined) are pinned to cluster 0 with
    cos_to_centroid 0.0 in both branches rather than emitting NaN.

    Branch equality caveat: the matmul branch accumulates the dot product
    via BLAS while the literal branch uses a JVM left-fold, so the two can
    differ in fp summation order — a HALF_UP round-6 value or an argmax
    near-tie sitting exactly on the rounding/tie boundary may flip between
    branches. They are equal up to fp summation order (pinned exactly equal
    on the gate data by pytest), not bit-identical by construction.
    """
    if assign == "auto":
        assign = "matmul" if n_clusters > matmul_threshold else "literal"
    if assign not in ("literal", "matmul"):
        raise ValueError("assign must be 'auto', 'literal' or 'matmul'")
    cents = (
        np.asarray(centers, dtype=np.float64)
        if centers is not None
        else _fit_centroids(
            emb, n_clusters, id_col, vec_col, seed, sample_n, max_iter
        )
    )
    if assign == "literal":
        from spark_iforest_spark.functions import l2_norm

        cent_arr = _centroid_literal(cents)
        v = F.col(vec_col).cast("array<double>")
        nonzero = l2_norm(v) > 0.0
        sims = F.transform(
            cent_arr, lambda c: F.when(nonzero, cosine(v, c)).otherwise(F.lit(0.0))
        )
        best = F.array_max(sims)
        return emb.select(
            F.col(id_col),
            (F.array_position(sims, best) - 1).cast("int").alias("cluster_id"),
            F.round(best, 6).alias("cos_to_centroid"),
        )

    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()
    C = np.asarray(cents, dtype=np.float64)
    cn = np.maximum(np.linalg.norm(C, axis=1), 1e-300)

    def assign_fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1)
            sims = (V @ C.T) / (np.maximum(vn, 1e-300)[:, None] * cn[None, :])
            sims[vn == 0.0] = 0.0
            best_j = sims.argmax(axis=1)
            best = sims[np.arange(len(sims)), best_j]
            # HALF_UP at 6 decimals, matching JVM F.round (np.round is
            # half-to-even and would disagree on exact .5 boundaries)
            rounded = np.sign(best) * np.floor(np.abs(best) * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster_id": best_j.astype(np.int32),
                    "cos_to_centroid": rounded,
                }
            )

    return emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)).mapInPandas(
        assign_fn,
        schema=f"{id_col} {id_type}, cluster_id int, cos_to_centroid double",
    )


def semantic_prune(
    emb: DataFrame,
    n_clusters: int = 8,
    keep_per_cluster: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "diverse",
    seed: int = _KMEANS_SEED,
    centers: np.ndarray | None = None,
) -> DataFrame:
    """Cluster-based corpus pruning: keep ``keep_per_cluster`` members per
    cluster.

    ``keep='diverse'`` ranks members by cosine-to-centroid ASCENDING —
    SemDeDup's choice (Abbas et al. 2023): within a semantic cluster the
    members far from the centroid carry the cluster's variety, the ones
    hugging it are the redundant mass. ``keep='prototypical'`` inverts the
    order (descending) for coreset/exemplar selection. Ties break by id, so
    the kept set is total-ordered and bit-deterministic in (data, seed).

    Returns (id, cluster_id, rank_in_cluster, cos_to_centroid) for kept
    rows; join back to the corpus by id to materialize the pruned table.
    One ranking shuffle keyed by cluster_id (see module docstring for the
    100 TB sizing rule).
    """
    if keep not in ("diverse", "prototypical"):
        raise ValueError("keep must be 'diverse' or 'prototypical'")
    cl = kmeans_clusters(emb, n_clusters, id_col, vec_col, seed, centers=centers)
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
    pattern — the k-means iteration isn't SQL-expressible, but any correct
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


def semantic_prune_self_check(
    emb: DataFrame,
    n_clusters: int = 8,
    keep_per_cluster: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "diverse",
    seed: int = _KMEANS_SEED,
    sample_n: int = 4096,
    max_iter: int = 25,
) -> bool:
    """Driver-side pure-Python re-derivation of the ``semantic_prune``
    relation, compared BIT-EXACTLY against the Spark result — the
    iforest-checks self-oracle pattern applied to the other rows-only
    gate. The centroids come from the same ``_fit_centroids`` (already
    driver numpy); the assignment replicates the literal branch's JVM
    arithmetic faithfully: left-to-right double folds for dot and norms
    (same IEEE op order as ``F.aggregate``), first-match argmax
    (``array_position``), and Spark's HALF_UP round-6 (``BigDecimal`` of
    the shortest double repr — ``Decimal(repr(x))`` in Python). Bounded:
    collects the corpus — a gate-scale check, not a production pass.
    """
    from decimal import ROUND_HALF_UP, Decimal

    cents = _fit_centroids(emb, n_clusters, id_col, vec_col, seed, sample_n, max_iter)
    C = [[float(x) for x in c] for c in np.asarray(cents, dtype=np.float64)]

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a: list[float]) -> float:
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    rows = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).collect()
    derived = []
    for r in rows:
        v = [float(x) for x in r["_v"]]
        nv = fold_norm(v)
        if nv > 0.0:
            sims = [fold_dot(v, c) / (fold_norm(v) * fold_norm(c)) for c in C]
        else:
            sims = [0.0] * len(C)
        best = max(sims)
        cluster = sims.index(best)
        derived.append((r[id_col], cluster, round6(best)))
    by_cluster: dict[int, list[tuple]] = {}
    for did, cl, cos in derived:
        by_cluster.setdefault(cl, []).append((cos, did))
    expected = []
    for cl, members in by_cluster.items():
        members.sort(key=lambda t: (t[0], t[1]) if keep == "diverse" else (-t[0], t[1]))
        for rank, (cos, did) in enumerate(members[:keep_per_cluster], start=1):
            expected.append((did, cl, rank, cos))
    got = sorted(
        tuple(r)
        for r in semantic_prune(
            emb, n_clusters, keep_per_cluster, id_col, vec_col, keep, seed
        ).collect()
    )
    return got == sorted(expected)

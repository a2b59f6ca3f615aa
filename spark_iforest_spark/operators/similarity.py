"""Similarity search over an embedding column (array<float>).

Two paths:
* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query set
  against the full corpus; one shuffle keyed by query id for the top-k
  window. The correctness baseline.
* ``lsh_topk`` — random-hyperplane (sign-LSH) bucketed ANN: corpus and
  queries hash to sign-pattern buckets over several hash tables; candidates
  are bucket collisions only, then exact cosine ranks them. The scale path:
  join volume is bucket-bounded instead of |Q|×|corpus|.

Cosine is a sequential JVM-side fold (functions.cosine) — no Python in the
scoring loop, and bit-identical to the DuckDB oracle's evaluation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from spark_iforest_spark.functions import cosine

_LSH_SEED = 0xA11CE
_IVF_SEED = 0x1FF


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k: per-input-partition partial top-k, then the global
    per-query rank. The phase-1 window key includes spark_partition_id() so
    the heavy rank runs at full parallelism (#partitions × |Q| groups)
    instead of funneling |corpus| candidate rows per query into one task;
    a partition-local top-k is always a superset of the global top-k, so
    phase 2 ranks at most #partitions × k rows per query. The ordering
    (cos_sim desc, neighbor_id asc) is total per query, so the final
    relation is deterministic regardless of partition layout."""
    order = [F.col("cos_sim").desc(), F.col("neighbor_id").asc()]
    w1 = Window.partitionBy("query_id", "_pid").orderBy(*order)
    local = (
        pairs.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is a (id, vector) DataFrame assumed small — it is broadcast,
    so the corpus is scanned once with no shuffle until the final per-query
    top-k window (rows there are |Q|×|corpus| filtered down; for large Q use
    lsh_topk). Ties break on neighbor_id for determinism.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("nv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    pairs = corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    return _ranked(pairs, k)


def topk_recall(exact: DataFrame, approx: DataFrame, floor: float = 0.9) -> DataFrame:
    """One-row recall gate for an ANN variant against the exact top-k
    relation: (n_expected, recall_ok). ``n_expected`` is the size of the
    exact relation (SQL-derivable, so an oracle can pin it) and
    ``recall_ok`` asserts |approx ∩ exact| / |exact| >= floor — turning a
    rows-only ANN query into an externally checked one."""
    ex = exact.select("query_id", "neighbor_id")
    hit = ex.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    return (
        ex.agg(F.count(F.lit(1)).alias("n_expected"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_expected",
            (F.col("n_hit") >= F.col("n_expected") * F.lit(floor)).alias("recall_ok"),
        )
    )


def _hyperplanes(dim: int, bits: int, tables: int) -> np.ndarray:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((tables, bits, dim))


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k via sign-LSH bucketing + exact cosine re-rank.

    Each vector hashes to ``tables`` buckets (sign pattern of ``bits``
    random hyperplanes, deterministic seed). Candidates = bucket collisions;
    exact cosine ranks them; top-k per query. Deterministic end to end.

    Sizing: a pair at angle θ collides in one table w.p. (1-θ/π)^bits, so
    recall at LOW cosine (the clusterless/random regime, neighbors at
    cos 0.35-0.5) needs shallow tables and many of them — bits=4, tables=24
    achieves recall 1.0 on the synthetic corpus (see ann_lsh_recall gate).
    High-similarity corpora can afford bits=8+ with few tables.
    """
    planes = _hyperplanes(dim, bits, tables)

    def bucketize(alias_id: str):
        def fn(it):
            for pdf in it:
                vecs = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
                ids = pdf[id_col].to_numpy()
                rows_id, rows_t, rows_b, rows_v = [], [], [], []
                if len(vecs):
                    for t in range(tables):
                        proj = vecs @ planes[t].T  # (n, bits)
                        sig = ((proj > 0).astype(np.int64) << np.arange(bits)).sum(axis=1)
                        rows_id.extend(ids.tolist())
                        rows_t.extend([t] * len(ids))
                        rows_b.extend(sig.tolist())
                        rows_v.extend(pdf[vec_col].to_list())
                yield pd.DataFrame(
                    {alias_id: rows_id, "table_id": rows_t, "bucket": rows_b, "v": rows_v}
                )

        return fn

    corpus_b = emb.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col)).mapInPandas(
        bucketize("neighbor_id"), schema="neighbor_id long, table_id int, bucket long, v array<double>"
    )
    query_b = queries.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(
        bucketize("query_id"), schema="query_id long, table_id int, bucket long, v array<double>"
    )
    cand = (
        corpus_b.alias("c")
        .join(
            F.broadcast(query_b.alias("q")),
            (F.col("c.table_id") == F.col("q.table_id"))
            & (F.col("c.bucket") == F.col("q.bucket"))
            & (F.col("c.neighbor_id") != F.col("q.query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("q.v").alias("qv"),
            F.col("c.v").alias("nv"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
    )
    return _ranked(cand, k)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer + probed cells.

    Build: fit KMeans (seeded, deterministic) on the corpus, assign every
    vector to its nearest centroid (one narrow pass). Query: each query
    probes its ``n_probe`` nearest centroids and ranks only those cells'
    members by exact cosine. At 100 TB the corpus is written PARTITIONED BY
    cell, so a probe reads only n_probe/n_centroids of the data — scan
    pruning does the heavy lifting, no per-pair work outside probed cells.

    Recall depends on how clustered the corpus is: with real (topical)
    embeddings a 1-5% probe ratio suffices; on clusterless random vectors
    neighbors spread across cells and recall>=0.9 needs probing most of
    them (the gate uses n_centroids=8, n_probe=7 on the synthetic corpus —
    see ann_ivf_recall). That cost is inherent to the data, not the plan:
    candidate generation stays a cell-equality join either way.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # array->vector is a JVM expression (pyspark.ml.functions), NOT a
    # row-at-a-time Python UDF — the corpus-wide conversion stays in codegen
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    ).withColumn("_v", array_to_vector("nv"))
    km = KMeans(k=n_centroids, seed=_IVF_SEED, featuresCol="_v", predictionCol="cell")
    model = km.fit(corpus)
    assigned = model.transform(corpus).select("neighbor_id", "nv", "cell")

    c = np.stack(model.clusterCenters())

    def probe_cells(it):
        for pdf in it:
            q = np.asarray(pdf["qv"].to_list(), dtype=np.float64)
            qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            sims = qn @ cn.T  # (B, n_centroids)
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            out = pdf.loc[pdf.index.repeat(n_probe)].reset_index(drop=True)
            out["cell"] = order.reshape(-1)
            yield out[["query_id", "qv", "cell"]]

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    probed = q.mapInPandas(probe_cells, schema="query_id long, qv array<double>, cell int")
    cand = (
        assigned.alias("corp")
        .join(
            F.broadcast(probed.alias("pq")),
            (F.col("corp.cell") == F.col("pq.cell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _ranked(cand, k)

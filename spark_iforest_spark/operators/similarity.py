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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
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
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql.types import ArrayType

    to_vec = F.udf(lambda a: Vectors.dense(a), VectorUDT())
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    ).withColumn("_v", to_vec("nv"))
    km = KMeans(k=n_centroids, seed=_IVF_SEED, featuresCol="_v", predictionCol="cell")
    model = km.fit(corpus)
    assigned = model.transform(corpus).select("neighbor_id", "nv", "cell")

    centers = model.clusterCenters()
    import numpy as np

    c = np.stack(centers)

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

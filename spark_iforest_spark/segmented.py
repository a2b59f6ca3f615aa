"""Segmented (per-group) isolation forests: one independent model per key.

Multi-tenant anomaly detection — "is this event anomalous FOR THIS user /
event type / tenant" — needs a forest per segment, not one global model
whose scores conflate segments with different base distributions. The
reference has no per-group mode; this module adds it Spark-first:

* ONE ``groupBy(key).applyInPandas`` pass — each task fits its segment's
  forest with the exact same pure-numpy kernels the flagship uses
  (``trainer.train_tree``, ``nodes.pack_forest``,
  ``scorer.anomaly_scores``) and scores the segment in place. No nested
  Spark jobs, no driver loop over keys: at 100 TB this is a single
  shuffle keyed by segment, with every segment training in parallel.
* Determinism: the per-segment RNG seeds from
  ``SeedSequence([seed, md5(key)])`` — a pure function of (data, params,
  key), independent of partition layout or segment arrival order
  (pytest-pinned), matching the engine's reproducibility discipline.
* Per-segment threshold: the exact ``ceil((1-contamination) * n)``-th
  smallest score (same order-statistic definition as the flagship's
  relErr=0 path), computed in-task; prediction = score > threshold.

Bounds: a segment must fit one task (same contract as every
``applyInPandas`` group in the repo — the assignment shuffle carries the
segment's rows once). For segments beyond task memory, fall back to the
global ``IForest`` on that segment's slice; ``max_rows_per_group`` makes
the failure explicit instead of an executor OOM.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from spark_iforest_spark.nodes import pack_forest
from spark_iforest_spark.scorer import anomaly_scores
from spark_iforest_spark.trainer import train_tree


def _group_seed(seed: int, key) -> np.random.SeedSequence:
    h = int(hashlib.md5(repr(key).encode("utf-8")).hexdigest()[:8], 16)
    return np.random.SeedSequence([seed & 0x7FFFFFFF, h])


def fit_score_groups(
    df: DataFrame,
    key_col: str,
    features_col: str = "features",
    id_col: str | None = None,
    num_trees: int = 50,
    max_samples: int = 256,
    max_depth: int = 10,
    max_features: float = 1.0,
    contamination: float = 0.01,
    seed: int = 0,
    max_rows_per_group: int = 5_000_000,
) -> DataFrame:
    """(key, [id], anomalyScore, prediction) with an independent isolation
    forest per ``key_col`` segment.

    ``features_col`` must be array<numeric>; ``id_col`` (optional) is
    carried through for joining back to the source table. ``max_samples``
    is the absolute per-tree sample size ψ (capped at the segment size);
    segments larger than ``max_rows_per_group`` raise rather than OOM a
    task. Scores are the standard ``2^(-E[path]/c(ψ))`` with ψ = the
    segment's effective sample size, so scores are comparable WITHIN a
    segment (the point of segmentation), not across segments with
    different ψ.
    """
    sel = [F.col(key_col).alias("_key"), F.col(features_col).cast("array<double>").alias("_feat")]
    if id_col is not None:
        sel.insert(1, F.col(id_col).alias("_id"))
    src = df.select(*sel)
    key_type = df.schema[key_col].dataType.simpleString()
    id_part = f"_id {df.schema[id_col].dataType.simpleString()}, " if id_col else ""
    out_schema = (
        f"_key {key_type}, {id_part}anomalyScore double, prediction int"
    )

    def fit_score(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["_key"].iloc[0]
        n = len(pdf)
        if n > max_rows_per_group:
            raise ValueError(
                f"segment {key!r} has {n} rows > max_rows_per_group="
                f"{max_rows_per_group}; fit the global IForest on this "
                "segment instead"
            )
        x = np.asarray(pdf["_feat"].to_list(), dtype=np.float64)
        psi = min(max_samples, n)
        ss = _group_seed(seed, key)
        # one child seed per tree for sampling; train_tree derives its own
        # split RNG from (tree_seed, tree_id) exactly like the flagship
        tree_seed = int(ss.generate_state(1, dtype=np.uint32)[0])
        rng = np.random.default_rng(ss)
        trees = []
        for tree_id in range(num_trees):
            idx = (
                rng.choice(n, size=psi, replace=False)
                if psi < n
                else np.arange(n)
            )
            trees.append(
                train_tree(x[idx], max_depth, max_features, tree_seed, tree_id)
            )
        forest = pack_forest(trees)
        scores = anomaly_scores(forest, x, float(psi))
        # same order-statistic definition as the flagship's exact path:
        # threshold = the ceil((1-contamination)*n)-th smallest score,
        # prediction = score > threshold
        rank = math.ceil((1.0 - contamination) * n)
        if 0 < rank <= n:
            thr = float(np.partition(scores, rank - 1)[rank - 1])
        else:
            thr = float("-inf") if rank <= 0 else float("inf")
        out = {"_key": pdf["_key"]}
        if id_col is not None:
            out["_id"] = pdf["_id"]
        out["anomalyScore"] = scores
        out["prediction"] = (scores > thr).astype(np.int32)
        return pd.DataFrame(out)

    result = src.groupBy("_key").applyInPandas(fit_score, schema=out_schema)
    renames = [F.col("_key").alias(key_col)]
    if id_col is not None:
        renames.append(F.col("_id").alias(id_col))
    return result.select(*renames, "anomalyScore", "prediction")

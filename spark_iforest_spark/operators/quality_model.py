"""Model-based quality filtering: a logistic linear classifier over the
per-document text signals — the CCNet/fastText-style pipeline stage that
upgrades heuristic quality scoring to "looks like the reference corpus"
scoring, without leaving the engine's determinism guarantees.

Architecture follows the repo's established sample-fit pattern
(semantic._fit_centroids, similarity._pq_codebooks): the FIT touches only
a bounded md5-hash-ordered sample collected to the driver — deterministic
in (data, params) on any partition layout, and the statistically right
shape at 100 TB (a linear probe needs thousands of examples, not the
corpus) — while SCORING is a broadcast-free Catalyst projection: the
standardized dot product and sigmoid compile to whole-stage codegen, so
the corpus pass is scan-speed with zero shuffle and zero Python
(plan-tested). Training is IRLS (Newton) with L2 — convex, fixed
iteration count, no RNG anywhere.

Labels come from the caller: a hand-labeled set, a trusted-source-vs-crawl
split (the CCNet construction), or a heuristic bootstrap. The operator is
the plumbing + determinism; label provenance is data curation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _raw_features(text_col: str = "text") -> dict:
    """name → UNALIASED feature expression — reuses the hash-pinned signal
    builders (stripping their aliases so the expressions compose inside
    the scoring arithmetic) plus log-compressed size features (raw counts
    span orders of magnitude; the standardized linear model wants them
    tamed)."""
    from spark_iforest_spark.functions import tokens

    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_subwords = F.size(F.split(F.col(text_col), r"[^A-Za-z0-9]+"))
    avg_tok = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens, 6
    )
    # same formulas as text.quality_cols (kept in lockstep — the equality
    # is pytest-pinned against quality_score's columns), rebuilt unaliased
    # so they nest inside the scoring arithmetic
    from spark_iforest_spark.operators.text import EN_STOPWORDS

    ltoks = tokens(F.lower(F.col(text_col)))
    ln_tokens = F.size(ltoks)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_ratio = F.size(F.filter(ltoks, lambda t: F.array_contains(sw, t))) / ln_tokens
    n_chars = F.length(text_col)
    n_symbol = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", "")
    )
    return {
        "f_ln_chars": F.round(F.log1p(F.length(text_col)), 6),
        "f_ln_tokens": F.round(F.log1p(n_tokens), 6),
        "f_avg_token_len": F.coalesce(avg_tok, F.lit(0.0)),
        "f_subwords_per_token": F.round(
            n_subwords.cast("double") / (n_tokens + F.lit(1)), 6
        ),
        "f_length_score": F.round(F.least(F.lit(1.0), ln_tokens / F.lit(64.0)), 6),
        "f_stopword_score": F.round(
            F.least(F.lit(1.0), stop_ratio / F.lit(0.08)), 6
        ),
        "f_symbol_score": F.round(F.lit(1.0) - n_symbol / n_chars, 6),
    }


def feature_cols(text_col: str = "text") -> list:
    """Aliased feature expressions, in ``_FEATURE_NAMES`` order."""
    raw = _raw_features(text_col)
    return [raw[n].alias(n) for n in _FEATURE_NAMES]


_FEATURE_NAMES = [
    "f_ln_chars",
    "f_ln_tokens",
    "f_avg_token_len",
    "f_subwords_per_token",
    "f_length_score",
    "f_stopword_score",
    "f_symbol_score",
]


def fit_quality_model(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_n: int = 20000,
    l2: float = 1e-3,
    max_iter: int = 50,
) -> dict:
    """Fit the logistic quality model on a bounded deterministic sample.

    Returns a plain-dict model {features, mean, std, w, b} — trivially
    JSON-serializable, so the fitted model persists alongside the corpus
    snapshot and scores future batches without refitting (same frozen-
    artifact lifecycle as the PQ codebooks).

    IRLS with L2 ridge: convex objective, Newton steps to machine-precision
    convergence inside ``max_iter`` — combined with the md5-ordered sample
    this makes the weights a pure function of (data, params), partition
    layout irrelevant (pytest-pinned).
    """
    from spark_iforest_spark.operators.pipeline import _md5_u32

    rows = (
        docs.select(
            F.col(label_col).cast("double").alias("_y"),
            _md5_u32(F.col(id_col), "quality-model-sample").alias("_u"),
            F.col(id_col).alias("_id"),
            *feature_cols(text_col),
        )
        .where(F.col(label_col).isNotNull())
        .orderBy("_u", "_id")
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([[r[f] for f in _FEATURE_NAMES] for r in rows], dtype=np.float64)
    y = np.asarray([r["_y"] for r in rows], dtype=np.float64)
    if len(X) == 0 or len(np.unique(y)) < 2:
        raise ValueError("quality model needs a sample with both label classes")
    mean = X.mean(axis=0)
    std = np.maximum(X.std(axis=0), 1e-9)
    Z = (X - mean) / std
    Zb = np.concatenate([Z, np.ones((len(Z), 1))], axis=1)
    w = np.zeros(Zb.shape[1])
    reg = np.full(Zb.shape[1], l2)
    reg[-1] = 0.0  # never shrink the intercept
    for _ in range(max_iter):
        p = 1.0 / (1.0 + np.exp(-(Zb @ w)))
        g = Zb.T @ (p - y) / len(y) + reg * w
        s = np.maximum(p * (1.0 - p), 1e-9)
        H = (Zb * s[:, None]).T @ Zb / len(y) + np.diag(reg)
        step = np.linalg.solve(H, g)
        w = w - step
        if np.abs(step).max() < 1e-12:
            break
    return {
        "features": list(_FEATURE_NAMES),
        "mean": mean.tolist(),
        "std": std.tolist(),
        "w": w[:-1].tolist(),
        "b": float(w[-1]),
    }


def score_quality_model(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [keep...], quality_prob) — the model as a Catalyst projection.

    The standardized dot product + sigmoid is built from literal weights:
    whole-stage codegen, zero shuffle, zero Python (plan-tested), so
    scoring 100 TB is exactly one scan. Probabilities round to 6 places
    (module convention for fp-order-independent comparability)."""
    z = F.lit(model["b"])
    raw = _raw_features(text_col)
    for name, m, s, wi in zip(
        model["features"], model["mean"], model["std"], model["w"]
    ):
        z = z + F.lit(wi) * ((raw[name].cast("double") - F.lit(m)) / F.lit(s))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.round(prob, 6).alias("quality_prob"),
    )


def filter_by_quality(
    docs: DataFrame,
    model: dict,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs whose model probability clears the threshold — the filter
    stage composes scan-side with everything else (predicate over the same
    projection; no join back by id)."""
    rest = tuple(c for c in docs.columns if c != id_col)
    scored = score_quality_model(
        docs, model, id_col=id_col, text_col=text_col, keep=rest
    )
    return scored.where(F.col("quality_prob") >= threshold).select(
        id_col, *rest
    )

"""Distribution-drift monitoring between corpus snapshots: PSI per column.

Continuous ingestion (incremental dedup, streaming ingest) needs a cheap
answer to "does the new crawl look like the corpus we trained on?".
Population Stability Index over equi-depth buckets is the standard
monitor: cutpoints are fixed from the REFERENCE snapshot (approxQuantile —
one mergeable-sketch pass), then each side reduces to per-(column, bucket)
counts in ONE scan covering every monitored signal (shuffle width
k·n_buckets rows total, nothing corpus-sized) and PSI folds driver-side
over 2·n_buckets numbers per column. Rule-of-thumb thresholds: <0.1
stable, 0.1-0.25 moderate shift, >0.25 investigate.

Bucketing is a literal-cutpoint comparison fold (same device as
layout.zorder_layout — whole-stage codegen, no UDF); reference cutpoints
are part of the returned report so a monitoring job can persist them and
skip the quantile pass on subsequent batches (frozen-artifact lifecycle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _r6(x: float) -> float:
    """Round-6 matching Spark's F.round (HALF_UP on the shortest decimal
    repr) — the repo's rounding convention for externally-compared values
    (see semantic.semantic_prune_self_check); Python's builtin round is
    banker's and can disagree with the DuckDB oracle at exact halves."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _bucket_counts(
    df: DataFrame, col: str, cuts: list[float], smoothing: float
) -> list[float]:
    return _bucket_counts_multi(df, {col: cuts}, smoothing)[col]


def _bucket_counts_multi(
    df: DataFrame, cuts_by_col: dict[str, list[float]], smoothing: float
) -> dict[str, list[float]]:
    """Smoothed bucket fractions for EVERY column in ONE scan: each row
    emits one (col, bucket) struct per monitored column via a single
    posexploded array, and one groupBy reduces them all — so a PSI pass
    over k signals costs one corpus scan + a k·n_buckets-wide shuffle,
    not k separate jobs (the difference between a monitoring query and k
    monitoring queries at 100 TB). NULLs bucket to -1 and are dropped
    (mirrors the per-column isNotNull filter)."""
    cols = sorted(cuts_by_col)

    def bucket_expr(col: str) -> F.Column:
        arr = F.array(*[F.lit(float(c)) for c in cuts_by_col[col]])
        b = F.size(F.filter(arr, lambda c: c <= F.col(col).cast("double")))
        return F.when(F.col(col).isNotNull(), b).otherwise(F.lit(-1))

    rows = (
        df.select(
            F.posexplode(F.array(*[bucket_expr(c) for c in cols])).alias(
                "ci", "bucket"
            )
        )
        .where(F.col("bucket") >= 0)
        .groupBy("ci", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out: dict[str, list[float]] = {}
    by_ci: dict[int, dict[int, int]] = {}
    for r in rows:
        by_ci.setdefault(r["ci"], {})[r["bucket"]] = r["n"]
    for ci, col in enumerate(cols):
        k = len(cuts_by_col[col]) + 1
        counts = [smoothing + by_ci.get(ci, {}).get(b, 0) for b in range(k)]
        total = sum(counts)
        out[col] = [c / total for c in counts]
    return out


def psi_report(
    reference: DataFrame,
    batch: DataFrame,
    cols: list[str],
    n_buckets: int = 10,
    rel_err: float = 0.001,
    cutpoints: dict[str, list[float]] | None = None,
    smoothing: float = 0.5,
) -> dict:
    """PSI per column of ``batch`` against ``reference``.

    Returns ``{col: {"psi": float, "cutpoints": [...], "ref_frac": [...],
    "batch_frac": [...]}}``. Pass a previous report's ``cutpoints`` to
    freeze the bucketing (and skip the reference quantile pass) — PSI
    series over time are only comparable against fixed cutpoints.
    ``smoothing`` is the additive count that keeps empty buckets from
    sending PSI to infinity (the standard Laplace guard).
    """
    if cutpoints is None:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        lists = reference.stat.approxQuantile(cols, probs, rel_err)
        cutpoints = {c: cuts for c, cuts in zip(cols, lists)}
    # ALL columns bucket-counted in one scan per side (round 5: was one
    # aggregation job per column per side — 2k jobs for k signals)
    active = {c: cutpoints[c] for c in cols}
    p_all = _bucket_counts_multi(reference, active, smoothing)
    q_all = _bucket_counts_multi(batch, active, smoothing)
    report: dict = {}
    for c in cols:
        p, q = p_all[c], q_all[c]
        psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
        report[c] = {
            "psi": _r6(psi),
            "cutpoints": [float(x) for x in cutpoints[c]],
            "ref_frac": [_r6(x) for x in p],
            "batch_frac": [_r6(x) for x in q],
        }
    return report


def psi_by_group(
    reference: DataFrame,
    batch: DataFrame,
    group_col: str,
    value_col: str,
    cutpoints: list[float],
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-GROUP PSI of ``value_col`` between two snapshots — the
    multi-tenant twin of :func:`psi_report` (round 7): "which tenants'/
    languages'/sources' distributions moved?", one row per group.

    Unlike the driver-dict reports, this is a fully Catalyst-side RELATION
    (group, psi, n_ref, n_batch) built from fixed ``cutpoints`` (frozen
    bucketing is mandatory for cross-group/series comparability anyway):
    each side reduces to ONE row per group — total + k conditional bucket
    sums as columns — in a single map-side-combined aggregate, and the PSI
    is a fixed-order k-term expression over the joined row (whole-stage
    codegen end to end; the left-to-right fold matches psi_report's Python
    sum bit-for-bit). One shuffle per side plus one group-keyed join —
    scales to millions of groups where a driver dict would not. Groups
    must appear in BOTH sides (inner join; a group absent from one side
    has no defined PSI); NULL group or value rows are dropped.

    Same smoothing and rounding conventions as psi_report, so the DuckDB
    oracle recomputes it end-to-end (gate: pipeline_artifacts
    'psi_len_by_lang' variant)."""
    k = len(cutpoints) + 1
    arr = F.array(*[F.lit(float(c)) for c in cutpoints])
    s = float(smoothing)

    def side(df: DataFrame, pre: str):
        # one aggregate per side: per-group total + k conditional bucket
        # sums as COLUMNS — no bucket-row explosion, no grid self-join,
        # one map-side-combined shuffle keyed by group
        bucket = F.size(F.filter(arr, lambda c: c <= F.col(value_col).cast("double")))
        return (
            df.where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("g"), bucket.alias("b"))
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias(f"{pre}N"),
                *[
                    F.sum((F.col("b") == i).cast("long")).alias(f"{pre}{i}")
                    for i in range(k)
                ],
            )
        )

    psi = None
    for i in range(k):
        pi = (F.col(f"p{i}") + F.lit(s)) / (F.col("pN") + F.lit(s * k))
        qi = (F.col(f"q{i}") + F.lit(s)) / (F.col("qN") + F.lit(s * k))
        term = (pi - qi) * F.log(pi / qi)
        psi = term if psi is None else psi + term
    return (
        side(reference, "p")
        .join(side(batch, "q"), "g")
        .select(
            F.col("g").alias(group_col),
            F.round(psi, 6).alias("psi"),
            F.col("pN").alias("n_ref"),
            F.col("qN").alias("n_batch"),
        )
    )


def psi_by_group_multi(
    reference: DataFrame,
    batch: DataFrame,
    group_col: str,
    cutpoints: dict[str, list[float]],
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-group PSI for MANY columns in one pass — the multi-signal form
    of :func:`psi_by_group`, same discipline as psi_report's
    one-scan-per-side bucket counting: every monitored column's total and
    conditional bucket sums come out of a single aggregate per side
    (shuffle width = one row per group regardless of signal count), PSI
    per (group, column) is a fixed-order codegen expression, and a final
    constant-size struct explode unpivots to long form.

    Returns (group, column, psi, n_ref, n_batch), one row per group per
    monitored column; ``n_*`` count that column's NON-NULL rows in the
    group (a side where the column is entirely NULL yields the uniform
    smoothed distribution — document-level missingness shows up as PSI
    against uniform rather than a dropped row). NULL-``group_col`` rows
    are dropped on both sides, the same contract as
    :func:`psi_by_group`; route unknown-group rows to a sentinel group
    first if they must be monitored."""
    cols = sorted(cutpoints)
    s = float(smoothing)

    def side(df: DataFrame, pre: str):
        aggs = []
        for c in cols:
            arr = F.array(*[F.lit(float(x)) for x in cutpoints[c]])
            k = len(cutpoints[c]) + 1
            b = F.when(
                F.col(c).isNotNull(),
                F.size(F.filter(arr, lambda v: v <= F.col(c).cast("double"))),
            ).otherwise(F.lit(-1))
            aggs.append(
                F.sum(F.col(c).isNotNull().cast("long")).alias(f"{pre}N__{c}")
            )
            aggs += [
                F.sum((b == i).cast("long")).alias(f"{pre}{i}__{c}")
                for i in range(k)
            ]
        return (
            df.where(F.col(group_col).isNotNull())
            .groupBy(F.col(group_col).alias("g"))
            .agg(*aggs)
        )

    joined = side(reference, "p").join(side(batch, "q"), "g")
    structs = []
    for c in cols:
        k = len(cutpoints[c]) + 1
        psi = None
        for i in range(k):
            pi = (F.col(f"p{i}__{c}") + F.lit(s)) / (F.col(f"pN__{c}") + F.lit(s * k))
            qi = (F.col(f"q{i}__{c}") + F.lit(s)) / (F.col(f"qN__{c}") + F.lit(s * k))
            term = (pi - qi) * F.log(pi / qi)
            psi = term if psi is None else psi + term
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.round(psi, 6).alias("psi"),
                F.col(f"pN__{c}").alias("n_ref"),
                F.col(f"qN__{c}").alias("n_batch"),
            )
        )
    return joined.select("g", F.explode(F.array(*structs)).alias("s")).select(
        F.col("g").alias(group_col), "s.column", "s.psi", "s.n_ref", "s.n_batch"
    )


def psi_against_baseline(batch: DataFrame, baseline: dict) -> dict:
    """Score a batch against a FROZEN ``psi_report`` baseline — no
    reference scan at all: the baseline dict already carries each column's
    cutpoints and reference fractions, so per-batch cost is ONE scan
    bucket-counting every signal at once. This is the steady-state
    monitoring call (and the per-micro-batch body of
    ``drift_monitor_stream``)."""
    q_all = _bucket_counts_multi(
        batch, {c: ref["cutpoints"] for c, ref in baseline.items()}, 0.5
    )
    out = {}
    for c, ref in baseline.items():
        q = q_all[c]
        p = ref["ref_frac"]
        psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
        out[c] = {"psi": _r6(psi), "batch_frac": [_r6(x) for x in q]}
    return out


def drift_monitor_stream(
    stream_docs: DataFrame,
    baseline: dict,
    out_dir: str,
    text_col: str = "text",
):
    """Continuous drift QA: every micro-batch scores against the frozen
    signal baseline (a ``signal_drift``/``psi_report`` result on the
    reference snapshot) and appends one (batch_id, col, psi) row per
    signal to ``out_dir`` — the PSI time series an operator alerts on.
    Stream state: zero (the baseline rides in the closure; each batch is
    scored independently). Returns the started StreamingQuery."""
    from spark_iforest_spark.operators.quality_model import _raw_features

    feats = _raw_features(text_col)
    spark = stream_docs.sparkSession

    def score(batch_df: DataFrame, batch_id: int) -> None:
        projected = batch_df.select(
            *[e.alias(n) for n, e in feats.items() if n in baseline]
        )
        rep = psi_against_baseline(projected, baseline)
        rows = [(int(batch_id), c, float(r["psi"])) for c, r in rep.items()]
        spark.createDataFrame(
            rows, "batch_id long, signal string, psi double"
        ).write.mode("append").parquet(out_dir)

    return (
        stream_docs.writeStream.foreachBatch(score)
        .trigger(availableNow=True)
        .start()
    )


def categorical_psi(
    reference: DataFrame,
    batch: DataFrame,
    col: str,
    smoothing: float = 0.5,
    max_categories: int = 10_000,
) -> dict:
    """PSI over a categorical column (lang, source, shard...) — no
    cutpoints, the categories themselves are the buckets. The category
    set is the union observed on either side (a category appearing only
    in the batch is itself drift and contributes through the smoothed
    reference mass). Each side reduces to one groupBy whose width is the
    distinct-category count, capped at ``max_categories`` by frequency to
    bound the driver fold on id-like columns."""
    def cat_counts(df):
        return {
            r[col]: r["n"]
            for r in df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), col)
            .limit(max_categories)
            .collect()
        }

    pc, qc = cat_counts(reference), cat_counts(batch)
    cats = sorted(set(pc) | set(qc))
    pt = sum(pc.values()) + smoothing * len(cats)
    qt = sum(qc.values()) + smoothing * len(cats)
    p = [(pc.get(c, 0) + smoothing) / pt for c in cats]
    q = [(qc.get(c, 0) + smoothing) / qt for c in cats]
    psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    return {
        "psi": _r6(psi),
        "categories": cats,
        "ref_frac": [_r6(x) for x in p],
        "batch_frac": [_r6(x) for x in q],
    }


def embedding_drift(
    reference: DataFrame,
    batch: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    smoothing: float = 0.5,
) -> dict:
    """Embedding-space drift via PQ sub-code histograms.

    Encode both snapshots against the FROZEN codebooks (the persisted ANN
    index artifact — reuse it, don't refit) and compare each subspace's
    code distribution with categorical PSI: m sub-quantizers × ≤256 cells
    is a few KB of state, yet a centroid shift, cluster collapse, or a
    crawl of out-of-distribution embeddings moves the histograms
    immediately. Cost per side: the pq_encode scan plus one
    (subspace, cell) groupBy — shuffle width m×256 rows.

    Returns {"subspace_psi": [...], "max_psi": float} — alert on max_psi
    with the usual 0.1/0.25 thresholds.
    """
    from spark_iforest_spark.operators.similarity import pq_encode

    m = int(codebooks.shape[0])

    def code_hist(df) -> dict[tuple[int, int], int]:
        codes = pq_encode(df, codebooks, id_col, vec_col)
        sub = F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("code"), 8 * j)
                    .bitwiseAND(F.lit(255))
                    .cast("int")
                    for j in range(m)
                ]
            )
        ).alias("subspace", "cell")
        rows = (
            codes.select(sub)
            .groupBy("subspace", "cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {(r["subspace"], r["cell"]): r["n"] for r in rows}

    pc, qc = code_hist(reference), code_hist(batch)
    psis = []
    for j in range(m):
        cells = sorted({c for (s, c) in set(pc) | set(qc) if s == j})
        pt = sum(pc.get((j, c), 0) for c in cells) + smoothing * len(cells)
        qt = sum(qc.get((j, c), 0) for c in cells) + smoothing * len(cells)
        p = [(pc.get((j, c), 0) + smoothing) / pt for c in cells]
        q = [(qc.get((j, c), 0) + smoothing) / qt for c in cells]
        psis.append(
            _r6(sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q)))
        )
    return {"subspace_psi": psis, "max_psi": max(psis)}


def signal_drift(
    reference_docs: DataFrame,
    batch_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10,
    cutpoints: dict[str, list[float]] | None = None,
) -> dict:
    """PSI over the engine's own text signals (length, token count,
    quality components) — the turnkey "is this crawl weird" check for the
    incremental-ingest loop, no labels needed."""
    from spark_iforest_spark.operators.quality_model import _raw_features

    feats = list(_raw_features(text_col).items())

    def project(df):
        return df.select(*[e.alias(n) for n, e in feats])

    return psi_report(
        project(reference_docs),
        project(batch_docs),
        [n for n, _ in feats],
        n_buckets=n_buckets,
        cutpoints=cutpoints,
    )

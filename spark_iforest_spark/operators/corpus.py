"""Composed corpus-cleaning pipeline — the operators working together.

``clean_corpus`` is the shape of a real pretraining-data filter pass:
quality gate ∘ language gate ∘ exact-dedup, expressed as one declarative
plan (Catalyst fuses the three per-row gates into the scan; dedup adds the
single digest shuffle). Demonstrates that the individual operators compose
without materialization barriers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spark_iforest_spark.operators.text import lang_id, quality_score


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Surviving documents after quality + language + exact-dup filtering.

    Keeps the lowest doc_id among exact duplicates. Returns
    (doc_id, quality, lang_pred) for survivors.

    Plan shape: quality and language are computed in ONE projection over
    one scan (keep= threading, no id re-joins of the same relation); the
    only shuffles are the digest groupBy for dup reps and the rep
    semi-join. At 100 TB: scan + one 32-byte-key exchange.
    """
    ql = lang_id(
        quality_score(docs, id_col, text_col, keep=(text_col,)),
        id_col,
        text_col,
        keep=("quality",),
    ).select(id_col, "quality", "lang_pred")
    digests = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
    reps = digests.groupBy("h").agg(F.min(id_col).alias(id_col)).select(id_col)
    return (
        ql.join(reps, id_col, "left_semi")
        .where((F.col("quality") >= min_quality) & (F.col("lang_pred") == lang))
        .select(id_col, "quality", "lang_pred")
    )


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
    budget_tokens: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """The full curation pass, end to end: quality + language + exact-dup
    filtering (clean_corpus) → optional benchmark decontamination →
    leakage-safe hash split → per-split sequence packing. Returns
    (doc_id, split, bucket, n_tokens, bin_id) — one row per surviving doc,
    already assigned to a training sequence that never crosses splits.

    This is the composition a pretraining-data job actually runs; every
    stage is the already-gated operator, and the whole chain remains one
    declarative plan: the per-row gates (quality, language, split, token
    count) fuse into scans, and every shuffle is on a narrow bounded key —
    the dedup digest groupBy, the contaminated-id distinct, id semi-joins,
    and the packing window. Nothing corpus-sized is ever broadcast.
    """
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.operators.pipeline import (
        decontaminate,
        hash_split,
        pack_sequences,
    )

    # snapshot the survivor-ID relation (round-8 plan audit): decontaminate
    # consumes `kept` twice (shingles + anti-join), so a lazy `keep`
    # re-executes the whole quality/lang battery per consumption — 14
    # parquet scans of the corpus in the executed plan, 6 after. The ID
    # set is the RIGHT thing to checkpoint at 100 TB (ids only, never the
    # corpus); the extra consumptions of `kept` then cost a parquet
    # re-scan + broadcast semi-join each, not a battery re-execution.
    keep = snapshot(
        clean_corpus(docs, id_col, text_col, min_quality, lang).select(id_col)
    )
    kept = docs.join(keep, id_col, "left_semi")
    if benchmark is not None:
        kept = decontaminate(kept, benchmark, id_col, text_col)
    split = hash_split(kept, id_col)
    return pack_sequences(
        split, id_col, text_col, budget_tokens, n_buckets, partition_extra=("split",)
    )


def source_quality_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus triage: the table a curator reads before setting
    per-source sampling weights (feeding pipeline.stratified_sample /
    mixture_sample).

    Per source: n_docs, n_dup_docs (docs minus distinct content hashes),
    mean_quality, mean_tokens. Single scan + one groupBy(source) shuffle
    with map-side combine (#sources groups). Quality is summed in exact
    fixed-point units so the mean is identical under any partial-
    aggregation order — required at scale, where partition counts change
    run to run.
    """
    from spark_iforest_spark.functions import money_units, tokens, units_to_double

    q = quality_score(docs, id_col, text_col, keep=(source_col, text_col))
    base = q.select(
        F.col(source_col),
        money_units("quality", 6).alias("q_units"),
        F.md5(F.col(text_col)).alias("h"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    n = F.count(F.lit(1))
    return base.groupBy(source_col).agg(
        n.alias("n_docs"),
        (n - F.countDistinct("h")).alias("n_dup_docs"),
        F.round(units_to_double(F.sum("q_units"), 6) / n, 6).alias("mean_quality"),
        F.round(F.sum("n_tokens") / n, 6).alias("mean_tokens"),
    )


def dataset_card(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    baseline: dict | None = None,
    approx_ndv: bool = False,
) -> dict:
    """One JSON-able snapshot summary — the "dataset card" a training run
    records next to its data manifest: scale, composition, dedup rate,
    quality and packing histograms, and (when a frozen PSI ``baseline``
    from a previous snapshot is supplied) drift against it.

    Everything is composed from the gated operators, so each number in the
    card is a number the correctness oracles already pin; this function
    only ORCHESTRATES — one scan per section (totals, per-source triage,
    lang counts, quality histogram, packing histogram, optional drift):
    bounded, independent aggregation jobs a scheduler can run while the
    snapshot is hot.

    ``approx_ndv=True`` swaps the totals scan's exact
    ``countDistinct(md5(text))`` — the card's only statistic that needs a
    full digest shuffle, the one super-linear cost at 100 TB — for the
    HLL sketch estimate (``relational.ndv_sketch_partial``'s contract:
    ~1.6% rel. err. at the default precision), making the whole totals
    section a single map-side-combined scan. The dup RATE inherits the
    bounded error; every other card number is unchanged.

    Card schema contract for the dup rate (round-10 advice fix):
    ``dup_rate`` is always present; ``dup_rate_is_approx: True``
    accompanies it iff it came from the sketch; ``exact_dup_rate`` is an
    alias present ONLY on the exact path, so consumers keying on the
    exact name get a KeyError — not a silently-approximate number —
    under ``approx_ndv=True``.
    """
    from spark_iforest_spark.functions import tokens
    from spark_iforest_spark.operators import drift as drift_mod
    from spark_iforest_spark.operators.pipeline import packing_efficiency
    from spark_iforest_spark.operators.text import quality_histogram

    n_distinct = (
        F.hll_sketch_estimate(F.hll_sketch_agg(F.md5(F.col(text_col))))
        if approx_ndv
        else F.countDistinct(F.md5(F.col(text_col)))
    )
    totals = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        n_distinct.alias("n_distinct"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
    ).collect()[0]
    # clamped at 0: the sketch estimate can overshoot n_docs by its
    # relative error on a dup-free corpus, and a negative rate would
    # break any consumer rendering a percentage
    dup_rate = max(
        0.0, round(1.0 - totals["n_distinct"] / max(totals["n_docs"], 1), 6)
    )
    card = {
        "n_docs": totals["n_docs"],
        "n_tokens": totals["n_tokens"],
        "n_chars": totals["n_chars"],
        # ``dup_rate`` is the stable key (round-10 advice: the old
        # ``exact_dup_rate`` name over-promised under approx_ndv);
        # ``exact_dup_rate`` is kept as an alias ONLY on the exact path,
        # so a consumer keying on the exact name never mis-trusts a
        # sketch estimate — it simply finds the key absent.
        "dup_rate": dup_rate,
        "sources": {
            r[source_col]: {
                "n_docs": r["n_docs"],
                "n_dup_docs": r["n_dup_docs"],
                "mean_quality": r["mean_quality"],
                "mean_tokens": r["mean_tokens"],
            }
            for r in source_quality_report(
                docs, id_col, text_col, source_col
            ).collect()
        },
        "langs": {
            r[lang_col]: r["n"]
            for r in docs.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
        "quality_deciles": {
            int(r["decile"]): r["n_docs"]
            for r in quality_histogram(docs, id_col, text_col).collect()
        },
        "pack_fill_deciles": {
            int(r["fill_decile"]): r["n_bins"]
            for r in packing_efficiency(docs, id_col, text_col).collect()
        },
    }
    if approx_ndv:
        # the dup rate above came from a sketch estimate, not an exact
        # distinct — record that so the card is honest about its one
        # approximate number. Card-schema contract: ``dup_rate`` always
        # present; ``dup_rate_is_approx`` present (True) iff the rate is
        # a sketch estimate; ``exact_dup_rate`` present iff it is exact.
        card["dup_rate_is_approx"] = True
    else:
        card["exact_dup_rate"] = dup_rate
    if baseline is not None:
        from spark_iforest_spark.operators.quality_model import _raw_features

        projected = docs.select(
            *[
                e.alias(n)
                for n, e in _raw_features(text_col).items()
                if n in baseline
            ]
        )
        rep = drift_mod.psi_against_baseline(projected, baseline)
        card["drift_vs_baseline"] = {c: r["psi"] for c, r in rep.items()}
        card["max_drift_psi"] = max(card["drift_vs_baseline"].values())
    return card


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions, by content digest:
    one row per differing doc — ``(doc_id, change, old_md5, new_md5)``
    with ``change`` in ('added', 'removed', 'changed'); unchanged docs
    emit nothing. The audit a data-versioned training pipeline runs
    between crawl snapshots: what entered, what left, what was edited
    in place — and the input to targeted re-processing (re-curate only
    added/changed ids instead of the whole snapshot).

    Scale shape: both sides project to (id, md5) SCAN-SIDE (32-byte
    digest rows, never text) before one full-outer shuffle join on the
    id — the minimal movement any exact diff needs. Change detection is
    digest equality, so two snapshots stored with different layouts /
    partitioning / encodings compare identically.

    NULL text digests as the empty string (a bare ``md5(NULL)`` is NULL,
    which would misread a NULL→text edit as 'added' and a text→NULL edit
    as 'removed' while both ids exist in both snapshots) — so NULL and
    '' are the same content by convention. Ids must be unique per
    snapshot (the standard corpus contract; duplicate ids would
    cross-product the outer join).
    """
    a = old.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("old_md5"),
    )
    b = new.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("new_md5"),
    )
    return (
        a.join(b, id_col, "full")
        .withColumn(
            "change",
            F.when(F.col("old_md5").isNull(), F.lit("added"))
            .when(F.col("new_md5").isNull(), F.lit("removed"))
            .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed")),
        )
        .where(F.col("change").isNotNull())
        .select(id_col, "change", "old_md5", "new_md5")
    )


def pretrain_curate(
    docs: DataFrame,
    reference: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher: bool = True,
    line_min_docs: int | None = 2,
    substr_window: int | None = 50,
    neardup: bool = True,
    ccnet_keep_bands: tuple = (1, 2),
    gopher_thresholds: dict | None = None,
) -> DataFrame:
    """The round-8 pretraining recipe as one call — the
    RefinedWeb/FineWeb-shaped chain over this repo's individually-gated
    operators, in the canonical order (cheap row-local filters first so
    every later stage sees a smaller corpus):

    1. Gopher rule battery (full 11 rules) — structural quality gate.
    2. CCNet perplexity banding (if ``reference`` given) — keep the
       head+middle of the frozen-reference-LM score distribution.
    3. C4-style cross-corpus line dedup — boilerplate lines REBUILT out
       of the text (``with_text`` mode).
    4. ExactSubstr fixed-window dedup — repeated ≥window-token passages
       cut, keep-first (text rebuilt again).
    5. Near-duplicate sweep — clusters collapse to their best
       representative (``drop_near_duplicates``).
    6. Benchmark decontamination (if ``benchmark`` given).

    Returns (id, text) with the REBUILT text — the corpus you hand to
    ``curate_corpus``/``pack_token_ids``. Zero-length and NULL docs are
    dropped up front (no signal for any stage; the Gopher battery's
    ratio rules assume non-empty text). Pass None/False to skip a stage.

    Every stage is the already-oracle-gated operator, so the value
    contract is inherited; the composition itself is pytest-pinned equal
    to hand-chaining the pieces. NOTE: the CCNet stage computes its
    cutpoints eagerly (two tiny jobs) at call time — the standard
    frozen-calibration semantics, not a plan-laziness bug. Scale shape:
    each stage's shuffles are its own documented narrow keys; between
    stages only (id, text) flows, and stages 1-2 are scan-fused filters
    that shrink the corpus before any rebuild shuffle runs.

    Stage boundaries are snapshot() points (round-8 plan audit): every
    rebuild stage consumes its input relation ~3× (line_dedup: lines
    self-join + totals; drop_near_duplicates: cluster + resolve + anti),
    so a fully lazy chain re-executes the ENTIRE upstream pipeline —
    Gopher battery, CCNet LM scoring — once per consumption,
    multiplicatively across stages. Measured at sf0.01 with the
    gopher → line → substr chain: 12 parquet scans of the corpus in the
    lazy plan vs 0 post-fix (upstream stages appear as materialized
    LogicalRDDs), first action 2.67 → 1.06 s, a caller's re-consumption
    2.09 → 0.52 s — and the gap compounds with more stages (ccnet,
    neardup). Each stage's (id, text) survivor set is exactly the
    relation worth materializing: it only shrinks downstream.
    """
    return _pretrain_stage_list(
        docs,
        reference=reference,
        benchmark=benchmark,
        id_col=id_col,
        text_col=text_col,
        gopher=gopher,
        line_min_docs=line_min_docs,
        substr_window=substr_window,
        neardup=neardup,
        ccnet_keep_bands=ccnet_keep_bands,
        gopher_thresholds=gopher_thresholds,
    )[-1][1]


def _pretrain_stage_list(
    docs: DataFrame,
    reference: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher: bool = True,
    line_min_docs: int | None = 2,
    substr_window: int | None = 50,
    neardup: bool = True,
    ccnet_keep_bands: tuple = (1, 2),
    gopher_thresholds: dict | None = None,
    capture: dict | None = None,
) -> list[tuple[str, DataFrame]]:
    """The pretrain_curate chain as a list of (stage_name, survivors)
    relations — shared by :func:`pretrain_curate` (returns the last) and
    :func:`pretrain_funnel` (aggregates each).

    Every intermediate stage output is snapshot()'d: each rebuild stage
    consumes its input ~3× (line_dedup: lines self-join + totals;
    drop_near_duplicates: cluster + resolve + anti-join), so without the
    materialization a fully lazy chain re-executes the whole upstream
    pipeline once per consumption, multiplicatively across stages. The
    RAW input is never snapshotted (stage 1's multi-consume re-scans
    parquet — cheaper than checkpointing a 100 TB corpus), and the final
    stage stays lazy for the caller.

    ``capture`` (round 10, for :func:`curation_state`) receives the
    ccnet stage's frozen artifacts — ``capture["lm"]`` (the snapshotted
    lm_fit relation) and ``capture["cutpoints"]`` — so the calibration a
    corpus run computed can be persisted and re-applied to later batches
    (``ccnet_apply`` semantics). The stage body inlines exactly
    ccnet_filter's pieces (same snapshots, same eager cutpoint jobs);
    the pretrain_funnel gate pins the composition against the DuckDB
    oracle, so any drift from ccnet_filter's behavior hash-mismatches.
    """
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.functions import job_label
    from spark_iforest_spark.operators.dedup import (
        drop_near_duplicates,
        remove_repeated_substrings,
    )
    from spark_iforest_spark.operators.pipeline import decontaminate, line_dedup
    from spark_iforest_spark.operators.text import (
        lm_fit,
        lm_perplexity,
        perplexity_bands,
        perplexity_cutpoints,
    )

    def _gopher(c: DataFrame) -> DataFrame:
        from spark_iforest_spark.operators.pipeline import gopher_filter

        # keep_cols threads text through the battery projection: the gate
        # stays ONE scan (no id self-join back onto the input).
        return (
            gopher_filter(
                c, id_col, text_col, keep_cols=(text_col,),
                **(gopher_thresholds or {}),
            )
            .where("gopher_keep")
            .select(id_col, text_col)
        )

    # The reference LM is INDEPENDENT of every corpus stage — fit it on a
    # background thread (guide §2.6: overlap independent jobs) so its
    # ~dozen small AQE stage-jobs run while the main thread materializes
    # the gopher boundary (whose battery compute is the other serial
    # block of the ccnet leg's critical path). The snapshot is EAGER so
    # the artifact is fully materialized before the scoring plan's three
    # concurrent broadcast builds read it, and so the persisted count
    # relations can be released inside the thread. Same operators, same
    # values — only the submission order changes; a thread failure
    # surfaces at the same place the sequential fit would have raised
    # (future.result() in the ccnet stage).
    lm_future = None
    if reference is not None:
        from concurrent.futures import ThreadPoolExecutor

        # the caller's job group is a thread-local property — propagate it
        # so cancelJobGroup covers the fit's jobs too (round-14 advice
        # fix; without this, pinned-thread mode leaves the background fit
        # uncancellable from the caller's group)
        _sc = docs.sparkSession.sparkContext
        _parent_group = _sc.getLocalProperty("spark.jobGroup.id")

        def _fit_lm():
            if _parent_group is not None:
                _sc.setLocalProperty("spark.jobGroup.id", _parent_group)
            with job_label(docs.sparkSession, "ccnet:lm_fit"):
                lm_raw, lm_handle = lm_fit(
                    reference, text_col=text_col, return_handle=True
                )
                try:
                    return snapshot(lm_raw, eager=True)
                finally:
                    lm_handle.release()

        _pool = ThreadPoolExecutor(max_workers=1)
        lm_future = _pool.submit(_fit_lm)
        _pool.shutdown(wait=False)

    def _ccnet(c: DataFrame) -> DataFrame:
        # ccnet_filter's exact internals (two snapshots closing the
        # measured re-executions; the lm fit runs ahead on the overlap
        # thread above) — inlined so the frozen (lm, cutpoints) pair is
        # capturable for the incremental path
        lm = lm_future.result()
        with job_label(c.sparkSession, "ccnet:score"):
            scored = snapshot(
                lm_perplexity(c, lm, id_col=id_col, text_col=text_col)
            )
        with job_label(c.sparkSession, "ccnet:cutpoints"):
            cuts = perplexity_cutpoints(scored)
        if capture is not None:
            capture["lm"], capture["cutpoints"] = lm, cuts
        # the stage's DECISION — the surviving id set — snapshotted (a
        # narrow projection of the scored blocks; the write is id-sized)
        # so the stage OUTPUT needs no checkpoint of its own: it is a
        # semi-join of two materialized relations, cheap to re-evaluate
        # per consumer (see the boundary-skip note in the loop below)
        kept = snapshot(
            perplexity_bands(scored, cuts)
            .where(F.col("band").isin(list(ccnet_keep_bands)))
            .select(id_col)
        )
        return c.join(kept, id_col, "left_semi")

    def _line(c: DataFrame) -> DataFrame:
        ld = line_dedup(c, id_col, text_col, min_docs=line_min_docs, with_text=True)
        return (
            ld.select(F.col(id_col), F.col("clean_text").alias(text_col))
            .where(F.length(text_col) > 0)
        )

    def _substr(c: DataFrame) -> DataFrame:
        rs = remove_repeated_substrings(
            c, window=substr_window, id_col=id_col, text_col=text_col,
            with_text=True,
        )
        return (
            rs.select(F.col(id_col), F.col("clean_text").alias(text_col))
            .where(F.length(text_col) > 0)
        )

    ops: list[tuple[str, object]] = []
    if gopher:
        ops.append(("gopher", _gopher))
    if reference is not None:
        ops.append(("ccnet", _ccnet))
    if line_min_docs:
        ops.append(("line_dedup", _line))
    if substr_window:
        ops.append(("exact_substr", _substr))
    if neardup:
        ops.append((
            "neardup",
            # losers snapshotted so the boundary-skip below never re-runs
            # the quality battery / cluster argmax per consumer
            lambda c: drop_near_duplicates(
                c, id_col, text_col, snapshot_losers=True
            ),
        ))
    if benchmark is not None:
        ops.append(
            ("decontaminate", lambda c: decontaminate(c, benchmark, id_col, text_col))
        )

    from spark_iforest_spark.functions import shuffle_partitions

    cur = docs.where(
        F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0
    ).select(id_col, text_col)
    stages = [("input", cur)]
    # Stage boundaries materialize the survivors AS PRODUCED and only
    # repartition lazily when the checkpointed layout is actually too
    # narrow (round 13; was an unconditional repartition(n_parts) BEFORE
    # the checkpoint). AQE coalesces a small stage output to ONE
    # partition, and the NEXT stage's compute-heavy per-row work (Gopher
    # battery, shingle hashing) would then run in a single task — but
    # paying a full (id, text) exchange per boundary at EVERY scale to
    # guard against that is backwards: at 100 TB stage outputs are wide
    # and the exchange was pure cost. The partition count of a
    # materialized snapshot is known driver-side for free, so the guard
    # now fires only when needed, and the re-spread exchange moves an
    # already-checkpointed small relation (it re-runs per consuming plan,
    # which is exactly as cheap as the relation is small). (The RAW
    # input's scan parallelism is the caller's responsibility —
    # repartition after reading few/small files.)
    n_parts = shuffle_partitions(docs.sparkSession)
    try:
        return _run_stage_ops(
            ops, cur, stages, docs, n_parts, lm_future, "pretrain"
        )
    except BaseException:
        # join the overlap thread on ANY construction failure (round-14
        # advice fix): a stage raising before the ccnet stage consumed
        # the future would otherwise leave the non-daemon fit thread
        # running its cluster jobs to completion unobserved, its own
        # exception silently swallowed
        if lm_future is not None:
            lm_future.cancel()
            try:
                lm_future.result()
            except Exception:
                pass
        raise


def _run_stage_ops(ops, cur, stages, docs, n_parts, lm_future, label):
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.functions import job_label

    for i, (name, fn) in enumerate(ops):
        with job_label(docs.sparkSession, f"{label}:{name}"):
            out = fn(cur)
            # DECISION-ONLY boundaries (round 13): the ccnet and neardup
            # stage outputs are a semi-/anti-join of the stage's
            # (materialized) input against a SMALL materialized decision
            # set — kept ids (snapshotted in _ccnet) and losers
            # (snapshot_losers=True above). Checkpointing the joined
            # output would copy the full corpus-sized (id, text) payload
            # AGAIN just to spare downstream consumers a broadcast-join
            # re-evaluation over blocks that already exist; skipping it
            # drops one corpus-wide block write per stage at every scale
            # while re-evaluation stays upstream-free (no battery, no
            # scoring, no CC — those live behind their own snapshots).
            # The rebuild stages (line_dedup, exact_substr) keep their
            # boundaries: their outputs are REBUILT text, expensive to
            # recompute per consumer.
            if i < len(ops) - 1 and out is not cur and name not in (
                "ccnet", "neardup"
            ):
                # consumed again by the next stage; an identity return (a
                # stage's no-op fast path) is already materialized —
                # re-checkpointing it would only copy blocks
                # EAGER exactly when the lm overlap thread is (possibly
                # still) running and the ccnet stage is next: the
                # boundary's battery compute then runs CONCURRENTLY with
                # the lm fit's jobs instead of serially inside the
                # scoring stage's first job (guide §2.6). Other
                # boundaries stay lazy — eager there only forfeits
                # single-job pipelining.
                eager = lm_future is not None and i + 1 < len(ops) and (
                    ops[i + 1][0] == "ccnet"
                )
                out = snapshot(out, eager=eager)
                if out.rdd.getNumPartitions() < n_parts:
                    out = out.repartition(n_parts)
        stages.append((name, out))
        cur = out
    return stages


def pretrain_funnel(
    docs: DataFrame,
    reference: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher: bool = True,
    line_min_docs: int | None = 2,
    substr_window: int | None = 50,
    neardup: bool = True,
    ccnet_keep_bands: tuple = (1, 2),
    gopher_thresholds: dict | None = None,
) -> DataFrame:
    """Stage-by-stage survival report for :func:`pretrain_curate` — the
    funnel table a curation run publishes next to its output manifest
    (FineWeb/RefinedWeb report exactly this): one row per stage with
    (stage_idx, stage, n_docs, n_tokens) of the SURVIVING corpus after
    that stage, stage 0 being the non-empty input.

    Costs ONE extra aggregation job on top of the curation itself
    (round 9 — previously one global-agg exchange per stage): every
    stage's rows are tagged with their stage label, unioned, and counted
    in a single map-side-combined groupBy over the already-materialized
    stage blocks (the raw input's branch is the one extra parquet scan);
    a zero-row spine unioned into the same aggregate restores all-zero
    rows for stages no document survived, so the report schema is layout-
    and survival-independent.
    Token counts use the repo-wide whitespace tokens() so every number is
    DuckDB-recomputable end-to-end.
    """
    stages = _pretrain_stage_list(
        docs,
        reference=reference,
        benchmark=benchmark,
        id_col=id_col,
        text_col=text_col,
        gopher=gopher,
        line_min_docs=line_min_docs,
        substr_window=substr_window,
        neardup=neardup,
        ccnet_keep_bands=ccnet_keep_bands,
        gopher_thresholds=gopher_thresholds,
    )
    # the aggregation lives in _funnel_of_stages, shared with the
    # incremental funnels (review fix: this body used to duplicate the
    # helper verbatim, so the zero-row-spine-union design — the round-10
    # verdict fix replacing an outer join that forced the aggregated side
    # to broadcast — had to be maintained in two places)
    return _funnel_of_stages(stages, text_col, docs.sparkSession)


# ---------------------------------------------------------------------------
# Incremental curation (round 10) — the one-call crawl loop the per-stage
# incremental pieces make possible: freeze a corpus's per-stage state once
# (curation_state), then thread every new batch through frozen gopher →
# ccnet_apply → line_dedup_incremental → ExactSubstr-incremental →
# exact-jaccard near-dup vs the shingle index → decontaminate
# (pretrain_curate_incremental), fold shard states (merge_curation_states),
# and roll the state forward after each batch (update_curation_state).
#
# Contract (the incremental family's standard append-only semantics,
# composed): the batch output equals the full 6-stage chain over
# (corpus ∪ batch) restricted to the batch's rows, where corpus-side
# history is immutable — corpus docs keep the text and survival the
# corpus-only run gave them, and the ccnet calibration is FROZEN from the
# state (recomputing cutpoints per batch would be a new calibration
# decision AND make batch outputs incomparable — the drift-cutpoint
# contract). Gate-pinned end to end by the pretrain_funnel_incr oracle,
# which recomputes exactly this composition in DuckDB.
# ---------------------------------------------------------------------------


class CurationState:
    """Frozen per-stage corpus state for :func:`pretrain_curate_incremental`.

    Every field is a bounded, persistable relation (write each to parquet,
    reload, rebuild the object) or a plain value:

    * ``ids`` — the curated corpus's raw doc ids (the disjointness guard's
      exact check; ids are the cheap column at 100 TB).
    * ``lm``/``cutpoints`` — the frozen CCNet calibration (lm_fit relation
      + banding cutpoints), None when the recipe has no ccnet stage. ``lm``
      must stay MATERIALIZED (parquet/snapshot — the lm_perplexity
      three-branch note).
    * ``line_index`` — line_count_index over the corpus docs ENTERING the
      line-dedup stage (digest + count rows).
    * ``substr_index`` — substr_window_index over the docs entering the
      ExactSubstr stage (digest + count + first-occurrence rows, window
      recorded).
    * ``shingle_index``/``labels``/``quality`` — the near-dup stage's
      state over the docs entering it: inverted shingle rows, the corpus's
      duplicate-cluster labels, and (id, quality) for cluster resolution.
    * ``params`` — the frozen recipe parameters; incremental application
      and state merging refuse mismatched params.

    RETRACTABLE states (round 12, ``curation_state(retractable=True)``)
    additionally carry the per-doc DETAIL relations whose aggregates the
    indexes are — the multiset a MIN/COUNT aggregate cannot be subtracted
    from (removing the doc holding a min first-occurrence needs the
    remaining occurrences):

    * ``line_detail`` — distinct (doc_id, line_md5) over the line stage's
      input (the rows ``line_count_index`` counts).
    * ``substr_detail`` — (doc_id, pos, h) window occurrences over the
      ExactSubstr stage's input (the rows ``substr_window_index``
      aggregates).
    * ``nin_digest`` — (doc_id, clean_md5) of the near-dup stage's input
      text (one row per doc), so the curated relation's digests are
      state-derivable without re-reading any text.

    Storage is corpus-token-proportional — the same magnitude as the
    ``shingle_index`` the state already carries — and buys exact
    retraction: :func:`spark_iforest_spark.operators.recurate.
    recurate_with_diff` subtracts removed/changed docs' contributions
    row-exactly and bounds re-processing to the flip fan-out.
    """

    def __init__(
        self,
        ids: DataFrame,
        lm: DataFrame | None,
        cutpoints: list | None,
        line_index: DataFrame | None,
        substr_index: DataFrame | None,
        shingle_index: DataFrame | None,
        labels: DataFrame | None,
        quality: DataFrame | None,
        params: dict,
        line_detail: DataFrame | None = None,
        substr_detail: DataFrame | None = None,
        nin_digest: DataFrame | None = None,
    ):
        self.ids = ids
        self.lm = lm
        self.cutpoints = cutpoints
        self.line_index = line_index
        self.substr_index = substr_index
        self.shingle_index = shingle_index
        self.labels = labels
        self.quality = quality
        self.params = dict(params)
        self.line_detail = line_detail
        self.substr_detail = substr_detail
        self.nin_digest = nin_digest


def curation_state(
    docs: DataFrame,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher: bool = True,
    line_min_docs: int | None = 2,
    substr_window: int | None = 50,
    neardup: bool = True,
    ccnet_keep_bands: tuple = (1, 2),
    gopher_thresholds: dict | None = None,
    retractable: bool = False,
) -> CurationState:
    """Run the pretrain_curate chain over a corpus and capture the frozen
    per-stage state a later :func:`pretrain_curate_incremental` needs.

    ``retractable=True`` (round 12) additionally captures the per-doc
    detail relations (``line_detail``/``substr_detail``/``nin_digest`` —
    the CurationState docstring's retraction contract) from the SAME
    stage inputs the aggregate indexes summarize, enabling
    :func:`~spark_iforest_spark.operators.recurate.recurate_with_diff`
    to subtract removed/changed docs exactly. The details ride the
    already-snapshotted stage blocks, so capturing them adds per-stage
    projections, not extra chain executions.

    The chain executed here is EXACTLY :func:`_pretrain_stage_list` (same
    snapshots, same eager ccnet calibration), so the corpus-side stage
    outputs — and therefore the indexes built from each stage's input —
    match what ``pretrain_curate(docs, ...)`` computed for the same
    corpus. Stage-to-index mapping: the line index is built over the docs
    ENTERING line dedup, the substr index over the docs entering
    ExactSubstr, and the near-dup trio over the docs entering the
    near-dup sweep — the relations whose counts the full run over
    (corpus ∪ batch) would merge with the batch's.

    Eagerness: the ccnet cutpoint jobs and the corpus cluster labels run
    NOW (dup_clusters is iterative); the index relations come back lazy —
    persist them (parquet) before production use. Scale: every artifact
    is digest-, vocabulary-, or id-keyed; nothing here is wider than the
    corpus's own curation run.
    """
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.functions import shuffle_partitions
    from spark_iforest_spark.operators.dedup import (
        dup_clusters,
        shingle_index as _shingle_index,
        substr_window_index,
    )
    from spark_iforest_spark.operators.pipeline import line_count_index
    from spark_iforest_spark.operators.text import quality_score

    cap: dict = {}
    stages = _pretrain_stage_list(
        docs,
        reference=reference,
        benchmark=None,
        id_col=id_col,
        text_col=text_col,
        gopher=gopher,
        line_min_docs=line_min_docs,
        substr_window=substr_window,
        neardup=False,  # the state needs the near-dup stage's INPUT only
        ccnet_keep_bands=ccnet_keep_bands,
        gopher_thresholds=gopher_thresholds,
        capture=cap,
    )
    by_name = {name: i for i, (name, _rel) in enumerate(stages)}

    def _input_of(stage: str) -> DataFrame:
        return stages[by_name[stage] - 1][1]

    from spark_iforest_spark.operators.dedup import _window_keys

    line_index = line_detail = None
    if line_min_docs:
        line_in = _input_of("line_dedup")
        line_index = line_count_index(line_in, id_col, text_col)
        if retractable:
            line_detail = _line_detail_of(line_in, id_col, text_col)
    substr_index = substr_detail = None
    if substr_window:
        substr_in = _input_of("exact_substr")
        substr_index = substr_window_index(
            substr_in, window=substr_window, id_col=id_col, text_col=text_col
        )
        if retractable:
            substr_detail = _window_keys(substr_in, id_col, text_col, substr_window)
    sh_idx = labels = quality = nin_digest = None
    if neardup:
        # the near-dup input is the chain's LAST stage here (neardup=False
        # above), so it is not snapshot'd yet — and the three artifacts
        # below each consume it
        n_parts = shuffle_partitions(docs.sparkSession)
        nd_in = snapshot(stages[-1][1].repartition(n_parts))
        sh_idx = _shingle_index(nd_in, id_col, text_col, n=3)
        labels = dup_clusters(nd_in, id_col, text_col)
        quality = quality_score(nd_in, id_col, text_col).select(
            F.col(id_col), "quality"
        )
        if retractable:
            nin_digest = _nin_digest_of(nd_in, id_col, text_col)
    elif retractable:
        # no near-dup stage: the "curated" relation is the chain's last
        # stage output — its digests are still the retraction surface
        nin_digest = _nin_digest_of(stages[-1][1], id_col, text_col)
    return CurationState(
        ids=docs.select(F.col(id_col)).distinct(),
        lm=cap.get("lm"),
        cutpoints=cap.get("cutpoints"),
        line_index=line_index,
        substr_index=substr_index,
        shingle_index=sh_idx,
        labels=labels,
        quality=quality,
        params={
            "id_col": id_col,
            "text_col": text_col,
            "gopher": bool(gopher),
            "gopher_thresholds": dict(gopher_thresholds or {}),
            "line_min_docs": line_min_docs,
            "substr_window": substr_window,
            "neardup": bool(neardup),
            "ccnet_keep_bands": tuple(ccnet_keep_bands),
            "has_ccnet": reference is not None,
            "jaccard_n": 3,
            "jaccard_threshold": 0.8,
            "retractable": bool(retractable),
        },
        line_detail=line_detail,
        substr_detail=substr_detail,
        nin_digest=nin_digest,
    )


def _pretrain_incr_stage_list(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
    capture: dict | None = None,
) -> list[tuple[str, DataFrame]]:
    """The incremental chain as (stage_name, batch_survivors) relations —
    shared by :func:`pretrain_curate_incremental` (returns the last) and
    :func:`pretrain_funnel_incremental` (aggregates each). Stage
    boundaries snapshot like the full builder (same multi-consume
    rationale). ``capture`` receives each index-feeding stage input
    (``line_input``/``substr_input``/``neardup_input``) and the merged
    cluster labels (``labels_full``) for :func:`update_curation_state`."""
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.functions import (
        check_batch_disjoint,
        job_label,
        shuffle_partitions,
    )
    from spark_iforest_spark.operators.dedup import (
        dup_clusters_incremental,
        ngram_jaccard_pairs_incremental,
        remove_repeated_substrings_incremental,
        resolve_clusters,
    )
    from spark_iforest_spark.operators.pipeline import (
        decontaminate,
        gopher_filter,
        line_dedup_incremental,
    )
    from spark_iforest_spark.operators.text import ccnet_apply, quality_score

    p = state.params
    id_col, text_col = p["id_col"], p["text_col"]
    check_batch_disjoint(
        batch, state.ids, id_col, assume_disjoint_ids, True, "curation_state"
    )
    cap = capture if capture is not None else {}

    def _gopher(c: DataFrame) -> DataFrame:
        return (
            gopher_filter(
                c, id_col, text_col, keep_cols=(text_col,),
                **p["gopher_thresholds"],
            )
            .where("gopher_keep")
            .select(id_col, text_col)
        )

    def _ccnet(c: DataFrame) -> DataFrame:
        # the batch's scoring verdict (an id set) is the stage's decision
        # — snapshot IT, not the joined (id, text) output: the boundary
        # skip below then re-evaluates only a broadcast semi-join per
        # consumer, never the explode/score pass (same decision-only
        # discipline as the full list's _ccnet)
        kept = snapshot(
            ccnet_apply(
                c, state.lm, state.cutpoints, id_col=id_col,
                text_col=text_col, keep_bands=p["ccnet_keep_bands"],
            ).select(id_col)
        )
        return c.join(kept, id_col, "left_semi")

    def _line(c: DataFrame) -> DataFrame:
        cap["line_input"] = c
        ld = line_dedup_incremental(
            c, state.line_index, id_col, text_col,
            min_docs=p["line_min_docs"], with_text=True,
            assume_disjoint_ids=True,  # guarded once at entry vs state.ids
        )
        return (
            ld.select(F.col(id_col), F.col("clean_text").alias(text_col))
            .where(F.length(text_col) > 0)
        )

    def _substr(c: DataFrame) -> DataFrame:
        cap["substr_input"] = c
        rs = remove_repeated_substrings_incremental(
            c, state.substr_index, window=p["substr_window"],
            id_col=id_col, text_col=text_col, with_text=True,
            assume_disjoint_ids=True,
            # verify_window=False (round 13, the verify_n=False argument
            # one stage over): the window passed here IS the state's
            # recorded param — the params contract refuses mismatched
            # states at merge/apply — so the default-on min/max re-check
            # would pay a full scan of the corpus-sized substr index per
            # ingested batch to re-verify a pinned literal. Direct index
            # users keep the default-on guard.
            verify_window=False,
        )
        return (
            rs.select(F.col(id_col), F.col("clean_text").alias(text_col))
            .where(F.length(text_col) > 0)
        )

    def _neardup(c: DataFrame) -> DataFrame:
        cap["neardup_input"] = c
        # the batch's shingle rows and quality scores are each consumed
        # TWICE per batch — pair generation + the state fold, cluster
        # resolution + the state fold. Quality (one tiny row per doc) is
        # snapshotted and shared. The shingle relation is shared as ONE
        # LAZY plan — measured at sf0.1, eagerly materializing the full
        # (did, sh, n) explode cost MORE than recomputing it (storing
        # tokens-many rows to RDD vs re-running a cheap hash/explode
        # over the snapshotted stage block), so each consumer executes
        # the shared plan itself; the pair generator lazily snapshots
        # its projection internally for its own multiple probes
        from spark_iforest_spark.operators.dedup import (
            shingle_index as _shingle_index,
        )

        batch_sh = _shingle_index(c, id_col, text_col, n=p["jaccard_n"])
        cap["batch_shingle_index"] = batch_sh
        batch_q = snapshot(
            quality_score(c, id_col, text_col).select(F.col(id_col), "quality")
        )
        cap["batch_quality"] = batch_q
        # batch-touching exact-jaccard pairs vs the corpus shingle index,
        # folded into the corpus's persisted cluster labels: full-corpus
        # clusters reconstruct exactly (dup_clusters_incremental), so the
        # quality argmax resolves over the SAME membership the full run
        # would see — only the batch side's verdicts are consumed
        pairs = snapshot(
            ngram_jaccard_pairs_incremental(
                c, state.shingle_index, id_col, text_col,
                n=p["jaccard_n"], threshold=p["jaccard_threshold"],
                assume_disjoint_ids=True,
                batch_shingles=batch_sh,
                # verify_n=False (round-10 advice): the loop built
                # batch_sh at p["jaccard_n"] two lines up, and the state
                # index's n is pinned by the params contract (curation
                # states refuse mismatched params on merge/apply) — the
                # min/max verification aggregate would force one extra
                # full execution of the lazy batch shingle plan per batch
                # just to re-check a literal, and a full column scan of
                # the corpus-sized index besides
                verify_n=False,
            )
        )
        # touched-only resolution (round 10): batch verdicts only depend
        # on clusters containing a pair node — resolve those, not every
        # corpus cluster; labels_full (untouched carried verbatim, no
        # iteration) still feeds the state fold
        # duplicate-free batch fast path (round 13): the common crawl
        # batch touches zero near-dup pairs, in which case the verdict is
        # already decided — no cluster changes, no losers, batch passes
        # through verbatim. One take(1) against the just-materialized pair
        # snapshot skips the CC fold, the quality-union argmax, and both
        # anti-joins (~10 driver-sequenced jobs on empty relations); the
        # capture relations are set to exactly what the skipped chain
        # computes (labels carry verbatim, touched set empty), so the
        # state fold is unchanged. Non-empty batches take the full path.
        if pairs.isEmpty():
            cap["labels_full"] = state.labels.select(id_col, "cluster_rep")
            cap["labels_touched"] = (
                state.labels.select(id_col, "cluster_rep").where(F.lit(False))
            )
            return c
        labels_full, labels_touched = dup_clusters_incremental(
            pairs.select("doc_a", "doc_b"), state.labels, id_col=id_col,
            return_touched=True,
            # pairs snapshotted above; state labels are materialized
            snapshot_pairs=False, snapshot_labels=False,
        )
        cap["labels_full"] = labels_full
        # the touched relation IS the batch's label DELTA: untouched
        # clusters carry verbatim, so labels_full == last-writer-wins of
        # (state.labels, labels_touched) — the delta-layout state fold
        cap["labels_touched"] = labels_touched
        quality = state.quality.unionByName(batch_q)
        keep = resolve_clusters(
            c, labels=labels_touched, quality=quality,
            id_col=id_col, text_col=text_col,
        )
        # decision-only boundary (round 13): snapshot the tiny losers id
        # set so the skipped output checkpoint never re-runs the argmax
        losers = snapshot(
            labels_touched.join(
                keep.select(F.col("keep_doc_id").alias(id_col)),
                id_col, "left_anti",
            ).select(id_col)
        )
        return c.join(losers, id_col, "left_anti")

    ops: list[tuple[str, object]] = []
    if p["gopher"]:
        ops.append(("gopher", _gopher))
    if p["has_ccnet"]:
        ops.append(("ccnet", _ccnet))
    if p["line_min_docs"]:
        ops.append(("line_dedup", _line))
    if p["substr_window"]:
        ops.append(("exact_substr", _substr))
    if p["neardup"]:
        ops.append(("neardup", _neardup))
    if benchmark is not None:
        ops.append(
            ("decontaminate",
             lambda c: decontaminate(c, benchmark, id_col, text_col))
        )

    n_parts = shuffle_partitions(batch.sparkSession)
    cur = batch.where(
        F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0
    ).select(id_col, text_col)
    stages = [("input", cur)]
    for i, (name, fn) in enumerate(ops):
        with job_label(batch.sparkSession, f"pretrain_incr:{name}"):
            out = fn(cur)
            # decision-only boundaries for ccnet/neardup, same rationale
            # as _pretrain_stage_list: their outputs join a materialized
            # input against a snapshotted batch-bounded id set (kept /
            # losers), so re-evaluation per consumer is one broadcast
            # join over existing blocks and the (id, text) re-checkpoint
            # is pure copy cost
            if i < len(ops) - 1 and out is not cur and name not in (
                "ccnet", "neardup"
            ):
                # materialize as produced; lazy re-spread only when the
                # checkpointed layout is too narrow (same rationale as
                # _pretrain_stage_list, round 13); identity returns (no-op
                # fast paths) are already materialized
                out = snapshot(out)
                if out.rdd.getNumPartitions() < n_parts:
                    out = out.repartition(n_parts)
        stages.append((name, out))
        cur = out
    # the last pre-decontamination relation — the nin_digest append source
    # for retractable recipes WITHOUT a near-dup stage (with one,
    # cap["neardup_input"] is the right surface)
    cap["pre_benchmark"] = (
        stages[-2][1] if benchmark is not None else stages[-1][1]
    )
    return stages


def pretrain_curate_incremental(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
) -> DataFrame:
    """Curate a NEW doc-disjoint batch against a frozen
    :func:`curation_state` — the 100 TB crawl loop's steady state: no
    corpus re-read, no refit, no recalibration. Returns (id, text) with
    the rebuilt batch text, == the full 6-stage ``pretrain_curate`` over
    (corpus ∪ batch) restricted to the batch under the append-only
    contract (corpus history immutable, calibration frozen) — gate-pinned
    end to end by the ``pretrain_funnel_incr`` composed oracle.

    Per-batch cost: the batch's own stage work plus bounded probes of
    each index (broadcast semi-joins of batch-derived key sets); the
    only corpus-sized relations touched are the persisted indexes, each
    cut down to batch-relevant rows before any shuffle. Roll the state
    forward with :func:`update_curation_state`.
    """
    return _pretrain_incr_stage_list(
        batch, state, benchmark=benchmark,
        assume_disjoint_ids=assume_disjoint_ids,
    )[-1][1]


def ccnet_stage_stats(docs: DataFrame, state: CurationState) -> DataFrame:
    """(band, n, sum_nll_micros) of ``docs``' ccnet-stage input (their
    non-empty + gopher survivors under the state's recipe) scored
    against the state's FROZEN (lm, cutpoints) — the per-batch drift
    signal of the drift-cutpoint contract (round 13). Written per
    ingested batch (``streaming.curate_stream(ccnet_stats_dir=...)``)
    and folded by ``streaming.ccnet_drift_report`` against a baseline
    recorded at calibration time; the alarm's recovery is
    :func:`~spark_iforest_spark.operators.recurate.recalibrate_ccnet`.
    Cost: one extra scoring pass over the BATCH (batch-proportional,
    never corpus-sized); O(#bands) output rows."""
    from spark_iforest_spark.operators.recurate import _pre_ccnet_survivors
    from spark_iforest_spark.operators.text import ccnet_band_stats

    p = state.params
    if not p["has_ccnet"]:
        raise ValueError(
            "ccnet_stage_stats: the state has no ccnet stage "
            "(curation_state was built without a reference corpus)."
        )
    return ccnet_band_stats(
        _pre_ccnet_survivors(docs, state),
        state.lm,
        state.cutpoints,
        id_col=p["id_col"],
        text_col=p["text_col"],
    )


def pretrain_funnel_incremental(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
) -> DataFrame:
    """Stage-by-stage survival report of the BATCH under
    :func:`pretrain_curate_incremental` — (stage_idx, stage, n_docs,
    n_tokens) per stage, same shape and aggregation plan as
    :func:`pretrain_funnel` (one map-side-combined groupBy over the
    materialized stage blocks + zero-row spine union)."""
    stages = _pretrain_incr_stage_list(
        batch, state, benchmark=benchmark,
        assume_disjoint_ids=assume_disjoint_ids,
    )
    return _funnel_of_stages(stages, state.params["text_col"], batch.sparkSession)


def pretrain_funnel_and_update_state(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
) -> tuple[DataFrame, CurationState]:
    """One chain run, funnel report + rolled-forward state — the
    observability twin of :func:`curate_and_update_state` (running
    :func:`pretrain_funnel_incremental` and :func:`update_curation_state`
    separately would execute the batch chain twice). The sequential crawl
    loop that wants per-batch survival reporting calls this per batch."""
    cap: dict = {}
    stages = _pretrain_incr_stage_list(
        batch, state, benchmark=benchmark,
        assume_disjoint_ids=assume_disjoint_ids, capture=cap,
    )
    funnel = _funnel_of_stages(stages, state.params["text_col"], batch.sparkSession)
    return funnel, _state_from_capture(state, batch, cap)


def curate_report_and_update_state(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
) -> tuple[DataFrame, DataFrame, CurationState]:
    """One chain run, all three outputs: (curated batch, funnel report,
    rolled-forward state) — what a monitored steady-state ingest job wants
    per crawl batch. Interior stage blocks are snapshotted, so the funnel
    aggregate, the curated output, and the state fold share them; only the
    final stage's own pass (a filter over the snapshotted penultimate
    block) runs once per extra consumer."""
    cap: dict = {}
    stages = _pretrain_incr_stage_list(
        batch, state, benchmark=benchmark,
        assume_disjoint_ids=assume_disjoint_ids, capture=cap,
    )
    funnel = _funnel_of_stages(stages, state.params["text_col"], batch.sparkSession)
    return stages[-1][1], funnel, _state_from_capture(state, batch, cap)


def _funnel_of_stages(
    stages: list[tuple[str, DataFrame]], text_col: str, spark
) -> DataFrame:
    """The funnel aggregation shared by the full and incremental report
    builders: ONE map-side-combined groupBy over tagged unioned stage
    rows, plus a zero-row spine so empty stages still report. The spine
    is a UNION into the same aggregate, not an outer join (round-10
    verdict fix): preserving spine rows through an outer join would
    force the aggregated side to be the broadcast/build side, which
    reads as "broadcast a corpus aggregate" — the union folds the tiny
    literal spine in with no join operator at all, ≤2×#stages rows
    through the final exchange."""
    from functools import reduce

    from spark_iforest_spark.functions import tokens

    parts = [
        rel.select(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.size(tokens(F.col(text_col))).cast("long").alias("_n_toks"),
        )
        for idx, (name, rel) in enumerate(stages)
    ]
    counts = (
        reduce(DataFrame.unionByName, parts)
        .groupBy("stage_idx", "stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n_toks").alias("n_tokens"),
        )
    )
    spine_zero = spark.createDataFrame(
        [(idx, name, 0, 0) for idx, (name, _rel) in enumerate(stages)],
        "stage_idx int, stage string, n_docs long, n_tokens long",
    )
    return (
        counts.unionByName(spine_zero)
        .groupBy("stage_idx", "stage")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def merge_curation_states(
    a: CurationState,
    b: CurationState,
    assume_disjoint_ids: bool = False,
    broadcast: bool = True,
) -> CurationState:
    """Fold two doc-disjoint shard states into one. Mismatched params or
    cutpoints raise: merging states calibrated differently is a new
    calibration decision, not a fold.

    Exactness contract, stated precisely: each artifact folds losslessly
    AT ITS OWN STAGE (line counts sum; substr counts sum, keeper = min
    first-occurrence; shingle rows union; labels = connected components
    over both shards' stars + the cross-shard pairs) — so the merged
    state equals the one-shot state of the concatenated corpus whenever
    the upstream stages are shard-local, i.e. per-row (gopher; ccnet
    under a SHARED frozen calibration). The REBUILD stages are the
    append-only asymmetry: shard A's text was line/substr-rebuilt
    against shard A alone, so a line that crosses min_docs only across
    shards is (correctly, per the incremental family's history-immutable
    contract) still present in each shard's downstream artifacts, where
    a one-shot run over A ∪ B would have removed it. With the rebuild
    stages off — or shards with no cross-shard repeated lines/windows —
    merge == one-shot exactly (both pytest-pinned).

    Per artifact: counts sum (line index), counts + first-occurrence min
    (substr index), plain union (shingle rows, quality, ids), and for
    cluster labels a connected-components pass over both shards' star
    edges plus the CROSS-shard near-dup pairs — computed from the two
    persisted shingle indexes alone (index-vs-index exact jaccard), no
    shard text ever re-read."""
    from spark_iforest_spark.operators.dedup import (
        _jaccard_pairs_vs_index,
        dup_clusters_incremental,
        merge_shingle_indexes,
        merge_substr_window_indexes,
    )
    from spark_iforest_spark.operators.pipeline import merge_line_count_indexes

    if a.params != b.params:
        raise ValueError(
            "merge_curation_states: shard states were built with different "
            f"recipe params: {a.params} vs {b.params}"
        )
    if a.cutpoints != b.cutpoints:
        raise ValueError(
            "merge_curation_states: shard states carry different ccnet "
            "cutpoints — fold-losslessness requires a shared frozen "
            "calibration (fit once, pass the same (lm, cutpoints) to every "
            f"shard): {a.cutpoints} vs {b.cutpoints}"
        )
    p = a.params
    id_col = p["id_col"]
    # doc-disjointness is the fold's precondition and BOTH shard id
    # relations are in hand, so verify it by default (review fix — every
    # other incremental entry point runs a default-on guard; a doc in
    # both shards would double its line/substr counts and duplicate its
    # shingle rows, corrupting every jaccard computed against the merged
    # index). One bounded semi-join action, same shape as
    # functions.check_batch_disjoint — and the same opt-outs (round-10
    # advice): ``assume_disjoint_ids=True`` skips the driver action for
    # shards sliced disjoint by construction (a deep shard-tree fold
    # otherwise pays one action per merge level), and ``broadcast=False``
    # swaps the shard-B id broadcast for a shuffle semi-join when B's id
    # relation is itself corpus-scale.
    if not assume_disjoint_ids:
        b_ids = b.ids.select(id_col).distinct()
        if broadcast:
            b_ids = F.broadcast(b_ids)
        overlap = a.ids.join(b_ids, id_col, "left_semi").limit(1)
        if not overlap.isEmpty():
            raise ValueError(
                "merge_curation_states: shard states share doc ids — the "
                "fold would double-count their lines/windows and duplicate "
                "their shingle rows. Rebuild the shards on disjoint doc "
                "slices."
            )
    line_index = (
        merge_line_count_indexes(a.line_index, b.line_index)
        if a.line_index is not None
        else None
    )
    substr_index = (
        merge_substr_window_indexes(a.substr_index, b.substr_index)
        if a.substr_index is not None
        else None
    )
    sh_idx = labels = quality = None
    if p["neardup"]:
        sh_idx = merge_shingle_indexes(a.shingle_index, b.shingle_index)
        quality = a.quality.unionByName(b.quality)
        # broadcast_batch=False: unlike the crawl loop, BOTH sides here
        # are corpus-sized shard indexes — broadcasting shard B's shingle
        # key set would ship a corpus-scale relation to every executor.
        # The shuffle semi-join path keys both sides by digest instead.
        cross = _jaccard_pairs_vs_index(
            b.shingle_index.select("did", "sh"),
            a.shingle_index.select("did", "sh"),
            p["jaccard_threshold"],
            False,
        ).select("doc_a", "doc_b")
        star_b = b.labels.select(
            F.col(id_col).alias("doc_a"), F.col("cluster_rep").alias("doc_b")
        ).where(F.col("doc_a") != F.col("doc_b"))
        from spark_iforest_spark.checkpoint import snapshot as _snap

        # snapshotted: dup_clusters_incremental consumes its pair relation
        # twice (node set + CC edges), and this one embeds the
        # index-vs-index jaccard join — lazy it would run that join twice
        labels = dup_clusters_incremental(
            _snap(cross.unionByName(star_b)), a.labels, id_col=id_col,
            # a.labels comes from a materialized/persisted shard state
            snapshot_pairs=False, snapshot_labels=False,
        )
    def _u(x, y):
        return x.unionByName(y) if x is not None else None

    return CurationState(
        ids=a.ids.unionByName(b.ids),
        lm=a.lm,  # identical under the shared-calibration contract
        cutpoints=a.cutpoints,
        line_index=line_index,
        substr_index=substr_index,
        shingle_index=sh_idx,
        labels=labels,
        quality=quality,
        params=p,
        # doc-disjoint shards: the per-doc detail relations union exactly
        line_detail=_u(a.line_detail, b.line_detail),
        substr_detail=_u(a.substr_detail, b.substr_detail),
        nin_digest=_u(a.nin_digest, b.nin_digest),
    )


def curate_and_update_state(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
) -> tuple[DataFrame, CurationState]:
    """One chain run, both outputs: the curated batch relation AND the
    rolled-forward state — what the steady-state ingest job calls per
    crawl (running :func:`pretrain_curate_incremental` and
    :func:`update_curation_state` separately would execute the batch
    chain twice)."""
    cap: dict = {}
    out = _pretrain_incr_stage_list(
        batch, state, benchmark=benchmark,
        assume_disjoint_ids=assume_disjoint_ids, capture=cap,
    )[-1][1]
    return out, _state_from_capture(state, batch, cap)


def update_curation_state(
    state: CurationState,
    batch: DataFrame,
    assume_disjoint_ids: bool = False,
) -> CurationState:
    """Roll the frozen state forward after ingesting a batch: the next
    batch then dedups against (corpus ∪ this batch) — completing the
    crawl loop. Each index absorbs the batch's contribution AT ITS OWN
    STAGE INPUT (the batch's post-ccnet lines, post-line-dedup windows,
    post-substr shingles — exactly the relations the one-shot chain
    counts), the cluster labels become the already-computed merged
    labels, and the calibration stays frozen (recalibrating is a
    deliberate, separate decision). Per-batch cost: the incremental
    chain itself plus one index-merge aggregate per artifact (use
    :func:`curate_and_update_state` to get the curated batch from the
    same run)."""
    return curate_and_update_state(
        batch, state, benchmark=None, assume_disjoint_ids=assume_disjoint_ids
    )[1]


def _state_from_capture(
    state: CurationState, batch: DataFrame, cap: dict
) -> CurationState:
    """Fold a batch chain run's captured stage inputs into the state."""
    from spark_iforest_spark.operators.dedup import (
        merge_shingle_indexes,
        merge_substr_window_indexes,
        shingle_index as _shingle_index,
        substr_window_index,
    )
    from spark_iforest_spark.operators.pipeline import (
        line_count_index,
        merge_line_count_indexes,
    )
    from spark_iforest_spark.operators.text import quality_score

    p = state.params
    id_col, text_col = p["id_col"], p["text_col"]
    retract = bool(p.get("retractable"))
    line_index = state.line_index
    line_detail = state.line_detail
    if p["line_min_docs"]:
        line_index = merge_line_count_indexes(
            state.line_index,
            line_count_index(cap["line_input"], id_col, text_col),
        )
        if retract:
            line_detail = state.line_detail.unionByName(
                _line_detail_of(cap["line_input"], id_col, text_col)
            )
    substr_index = state.substr_index
    substr_detail = state.substr_detail
    if p["substr_window"]:
        substr_index = merge_substr_window_indexes(
            state.substr_index,
            substr_window_index(
                cap["substr_input"], window=p["substr_window"],
                id_col=id_col, text_col=text_col,
            ),
        )
        if retract:
            from spark_iforest_spark.operators.dedup import _window_keys

            substr_detail = state.substr_detail.unionByName(
                _window_keys(
                    cap["substr_input"], id_col, text_col, p["substr_window"]
                )
            )
    sh_idx, labels, quality = (
        state.shingle_index, state.labels, state.quality,
    )
    nin_digest = state.nin_digest
    if retract:
        nin_src = cap["neardup_input"] if p["neardup"] else cap["pre_benchmark"]
        nin_digest = state.nin_digest.unionByName(
            _nin_digest_of(nin_src, id_col, text_col)
        )
    if p["neardup"]:
        # the chain captured its snapshotted shingle/quality relations
        # (shared with pair generation and resolution — review fix);
        # fall back to recomputing for callers with a bare capture dict
        batch_sh = cap.get("batch_shingle_index")
        if batch_sh is None:
            batch_sh = _shingle_index(
                cap["neardup_input"], id_col, text_col, n=p["jaccard_n"]
            )
        sh_idx = merge_shingle_indexes(state.shingle_index, batch_sh)
        labels = cap["labels_full"]
        batch_q = cap.get("batch_quality")
        if batch_q is None:
            batch_q = quality_score(
                cap["neardup_input"], id_col, text_col
            ).select(F.col(id_col), "quality")
        quality = state.quality.unionByName(batch_q)
    return CurationState(
        ids=state.ids.unionByName(batch.select(F.col(id_col)).distinct()),
        lm=state.lm,
        cutpoints=state.cutpoints,
        line_index=line_index,
        substr_index=substr_index,
        shingle_index=sh_idx,
        labels=labels,
        quality=quality,
        params=p,
        line_detail=line_detail,
        substr_detail=substr_detail,
        nin_digest=nin_digest,
    )


def _line_detail_of(line_in: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, line_md5) rows of a line-stage input — the per-doc
    detail the aggregated line counts cannot be subtracted without."""
    from spark_iforest_spark.operators.pipeline import _doc_lines

    return (
        _doc_lines(line_in, id_col, text_col)
        .select(F.col(id_col), F.col("_h").alias("line_md5"))
        .distinct()
    )


def _nin_digest_of(nd_in: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, clean_md5) of a near-dup stage input — the curated relation's
    digest surface (``curated_digests``)."""
    return nd_in.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("clean_md5"),
    )


def _delta_from_capture(
    state: CurationState, batch: DataFrame, cap: dict
) -> dict:
    """The batch's per-stage state CONTRIBUTIONS as delta relations — the
    rows :func:`_state_from_capture` folds into the full state, unfolded:

    * ``ids`` / ``shingle_index`` / ``quality`` — append rows (fold =
      union);
    * ``line_index`` / ``substr_index`` — the batch's own count partials
      (fold = the associative index merges: counts sum, keeper = min
      first-occurrence);
    * ``labels`` — the TOUCHED-cluster relabels (fold = last-writer-wins
      per doc id: untouched clusters carry verbatim, so LWW of
      (parent labels, touched) reconstructs ``labels_full`` exactly).

    Every relation is batch-proportional (touched clusters are bounded by
    the batch's near-dup pairs), which is what makes the delta state
    layout's per-version write flat while the corpus grows. The frozen
    ``lm``/``cutpoints`` are NOT part of the delta — they live once in
    the chain's base version."""
    from spark_iforest_spark.operators.dedup import (
        shingle_index as _shingle_index,
        substr_window_index,
    )
    from spark_iforest_spark.operators.pipeline import line_count_index
    from spark_iforest_spark.operators.text import quality_score

    p = state.params
    id_col, text_col = p["id_col"], p["text_col"]
    retract = bool(p.get("retractable"))
    delta: dict = {"ids": batch.select(F.col(id_col)).distinct()}
    if p["line_min_docs"]:
        delta["line_index"] = line_count_index(cap["line_input"], id_col, text_col)
        if retract:
            delta["line_detail"] = _line_detail_of(
                cap["line_input"], id_col, text_col
            )
    if p["substr_window"]:
        delta["substr_index"] = substr_window_index(
            cap["substr_input"], window=p["substr_window"],
            id_col=id_col, text_col=text_col,
        )
        if retract:
            from spark_iforest_spark.operators.dedup import _window_keys

            delta["substr_detail"] = _window_keys(
                cap["substr_input"], id_col, text_col, p["substr_window"]
            )
    if retract:
        delta["nin_digest"] = _nin_digest_of(
            cap["neardup_input"] if p["neardup"] else cap["pre_benchmark"],
            id_col, text_col,
        )
    if p["neardup"]:
        batch_sh = cap.get("batch_shingle_index")
        if batch_sh is None:
            batch_sh = _shingle_index(
                cap["neardup_input"], id_col, text_col, n=p["jaccard_n"]
            )
        delta["shingle_index"] = batch_sh
        delta["labels"] = cap["labels_touched"]
        batch_q = cap.get("batch_quality")
        if batch_q is None:
            batch_q = quality_score(
                cap["neardup_input"], id_col, text_col
            ).select(F.col(id_col), "quality")
        delta["quality"] = batch_q
    return delta


def curate_and_state_delta(
    batch: DataFrame,
    state: CurationState,
    benchmark: DataFrame | None = None,
    assume_disjoint_ids: bool = False,
    with_funnel: bool = False,
) -> tuple:
    """One chain run, delta-layout outputs: (curated batch, funnel-or-None,
    delta dict for :func:`save_curation_delta`) — the per-crawl call of
    the delta-encoded steady-state loop (:func:`streaming.curate_stream`
    with ``state_layout="delta"``). Same single-execution sharing as
    :func:`curate_report_and_update_state`; only the state fold is
    deferred to read time."""
    cap: dict = {}
    stages = _pretrain_incr_stage_list(
        batch, state, benchmark=benchmark,
        assume_disjoint_ids=assume_disjoint_ids, capture=cap,
    )
    funnel = (
        _funnel_of_stages(stages, state.params["text_col"], batch.sparkSession)
        if with_funnel
        else None
    )
    return stages[-1][1], funnel, _delta_from_capture(state, batch, cap)


_STATE_RELATIONS = (
    "ids", "lm", "line_index", "substr_index", "shingle_index", "labels",
    "quality", "line_detail", "substr_detail", "nin_digest",
)


def save_curation_state(state: CurationState, path: str) -> None:
    """Persist a :class:`CurationState` under ``path``: one parquet
    directory per artifact relation plus ``state.json`` (params,
    cutpoints, and which relations are present). Writing IS the
    materialization point the incremental path wants anyway (the lm /
    index relations must be materialized before multi-consume scoring),
    so the production loop is: build state → save → every later session
    ``load_curation_state`` and ingests batches against parquet-backed
    artifacts. Works on any Hadoop-visible filesystem (local, HDFS,
    s3a://) via the session's FS — the fs.save_json pathway."""
    from spark_iforest_spark import fs

    spark = state.ids.sparkSession
    present = []
    for name in _STATE_RELATIONS:
        rel = getattr(state, name)
        if rel is not None:
            rel.write.mode("overwrite").parquet(f"{path}/{name}")
            present.append(name)
    fs.save_json(
        spark,
        f"{path}/state.json",
        {
            "params": state.params,
            "cutpoints": state.cutpoints,
            "relations": present,
        },
    )


def save_curation_delta(
    delta: dict, state: CurationState, path: str, parent: int
) -> None:
    """Persist a batch's state DELTA (:func:`_delta_from_capture` /
    :func:`curate_and_state_delta` output) as version ``path`` with a
    ``parent`` pointer — the delta-layout twin of
    :func:`save_curation_state`. Only the batch-proportional delta
    relations are written; params/cutpoints are recorded for chain
    verification, and the frozen ``lm`` is inherited from the chain's
    base version rather than re-persisted (it is identical across
    versions by the frozen-calibration contract)."""
    from spark_iforest_spark import fs

    spark = delta["ids"].sparkSession
    present = []
    for name in _STATE_RELATIONS:
        rel = delta.get(name)
        if rel is not None:
            rel.write.mode("overwrite").parquet(f"{path}/{name}")
            present.append(name)
    fs.save_json(
        spark,
        f"{path}/state.json",
        {
            "params": state.params,
            "cutpoints": state.cutpoints,
            "relations": present,
            "delta": True,
            "parent": int(parent),
        },
    )


_RECURATE_RELATIONS = (
    "retract_corpus_ids", "retract_line", "retract_substr", "retract_nin",
    "line_index_drop", "substr_index_drop", "labels_tombstone",
    "ids", "line_detail", "line_index", "substr_detail", "substr_index",
    "shingle_index", "quality", "nin_digest", "labels",
)


def save_recurate_delta(delta: dict, state: CurationState, path: str, parent: int) -> None:
    """Persist a re-curation's TOMBSTONE DELTA
    (:func:`~spark_iforest_spark.operators.recurate.recurate_with_diff`
    with ``with_delta=True``) as version ``path`` with a ``parent``
    pointer — the churn-proportional persistence that makes re-curation
    cheaper than a rebuild at scale: only the retraction id sets, the
    replaced index keys + their patched rows, and the added rows are
    written; every untouched row stays where it already is.
    ``load_curation_state`` folds the chain back SEQUENTIALLY (a
    recurate version REPLACES affected keys where ingest deltas merge
    partials — replace is not associative with the count merges, so
    chains containing a recurate version fold version-by-version)."""
    from spark_iforest_spark import fs

    spark = delta["ids"].sparkSession
    present = []
    for name in _RECURATE_RELATIONS:
        rel = delta.get(name)
        if rel is not None:
            rel.write.mode("overwrite").parquet(f"{path}/{name}")
            present.append(name)
    fs.save_json(
        spark,
        f"{path}/state.json",
        {
            "params": state.params,
            "cutpoints": state.cutpoints,
            "relations": present,
            "delta": True,
            "recurate": True,
            "parent": int(parent),
        },
    )


def _anti_on(acc: DataFrame, tomb: DataFrame, key: str) -> DataFrame:
    return acc.join(tomb, key, "left_anti")


def _apply_recurate_delta(acc: dict, rels: dict, id_col: str) -> dict:
    """One sequential fold step over a recurate tombstone delta: drop the
    retracted per-doc rows and the replaced index keys, then union the
    delta's rows — exactly inverting :func:`save_recurate_delta`'s
    encoding. Index rows REPLACE (the patched aggregates are post-merge
    rows, not partials), per-doc rows append after their tombstones."""
    out = dict(acc)
    out["ids"] = _anti_on(
        acc["ids"], rels["retract_corpus_ids"], id_col
    ).unionByName(rels["ids"])
    if "line_detail" in acc:
        out["line_detail"] = _anti_on(
            acc["line_detail"], rels["retract_line"], id_col
        ).unionByName(rels["line_detail"])
        out["line_index"] = _anti_on(
            acc["line_index"], rels["line_index_drop"], "line_md5"
        ).unionByName(rels["line_index"])
    if "substr_detail" in acc:
        out["substr_detail"] = _anti_on(
            acc["substr_detail"], rels["retract_substr"], id_col
        ).unionByName(rels["substr_detail"])
        out["substr_index"] = _anti_on(
            acc["substr_index"], rels["substr_index_drop"], "h"
        ).unionByName(rels["substr_index"])
    out["nin_digest"] = _anti_on(
        acc["nin_digest"], rels["retract_nin"], id_col
    ).unionByName(rels["nin_digest"])
    if "shingle_index" in acc:
        out["shingle_index"] = acc["shingle_index"].join(
            rels["retract_nin"].select(F.col(id_col).alias("did")),
            "did",
            "left_anti",
        ).unionByName(rels["shingle_index"])
        out["quality"] = _anti_on(
            acc["quality"], rels["retract_nin"], id_col
        ).unionByName(rels["quality"])
        out["labels"] = _anti_on(
            acc["labels"], rels["labels_tombstone"], id_col
        ).unionByName(rels["labels"])
    return out


def _apply_ingest_delta(acc: dict, rels: dict, id_col: str) -> dict:
    """One sequential fold step over an append-only ingest delta — the
    same merges the associative fast path uses, applied pairwise (the
    sequential path exists for chains that also contain a recurate
    version, whose key replacement is not associative with these)."""
    from spark_iforest_spark.operators.dedup import (
        merge_shingle_indexes,
        merge_substr_window_indexes,
    )
    from spark_iforest_spark.operators.pipeline import merge_line_count_indexes

    out = dict(acc)
    out["ids"] = acc["ids"].unionByName(rels["ids"])
    if "line_index" in rels:
        out["line_index"] = merge_line_count_indexes(
            acc["line_index"], rels["line_index"]
        )
    if "line_detail" in rels:
        out["line_detail"] = acc["line_detail"].unionByName(rels["line_detail"])
    if "substr_index" in rels:
        out["substr_index"] = merge_substr_window_indexes(
            acc["substr_index"], rels["substr_index"], verify_window=False
        )
    if "substr_detail" in rels:
        out["substr_detail"] = acc["substr_detail"].unionByName(
            rels["substr_detail"]
        )
    if "shingle_index" in rels:
        out["shingle_index"] = merge_shingle_indexes(
            acc["shingle_index"], rels["shingle_index"], verify_n=False
        )
    if "quality" in rels:
        out["quality"] = acc["quality"].unionByName(rels["quality"])
    if "nin_digest" in rels:
        out["nin_digest"] = acc["nin_digest"].unionByName(rels["nin_digest"])
    if "labels" in rels:
        # last-writer-wins per doc, pairwise: the newer touched relabels
        # replace, untouched carry — same fixed point as _lww_labels
        out["labels"] = acc["labels"].join(
            rels["labels"].select(id_col), id_col, "left_anti"
        ).unionByName(rels["labels"].select(id_col, "cluster_rep"))
    return out


def _state_chain(spark, path: str) -> list[tuple[str, dict]]:
    """The version chain from ``path`` back to its full base as
    (version_path, state.json) pairs, BASE FIRST. Delta versions name
    their parent by version id; the parent directory is the sibling
    ``v{parent}`` under the same state dir. A cycle or a missing parent
    raises — a delta chain must bottom out in a full save."""
    from spark_iforest_spark import fs

    out = []
    seen = set()
    p = path
    while True:
        if p in seen:
            raise ValueError(f"curation-state version chain cycles at {p}")
        seen.add(p)
        if not fs.exists(spark, f"{p}/state.json"):
            raise ValueError(
                f"curation-state version {p} is missing (or torn: no "
                "state.json). If this is a delta chain's parent, it was "
                "pruned before the chain was compacted — the retention "
                "order is compact_curation_state FIRST, then "
                "prune_versions; a stale retry that lands here must be "
                "replayed from the newest full version."
            )
        meta = fs.load_json(spark, f"{p}/state.json")
        out.append((p, meta))
        if not meta.get("delta"):
            return list(reversed(out))
        parent = meta.get("parent")
        if parent is None:
            raise ValueError(
                f"delta curation-state version {p} has no parent pointer"
            )
        head, _, leaf = p.rpartition("/")
        p = f"{head}/v{int(parent)}"


def load_curation_state(spark, path: str) -> CurationState:
    """Rebuild a :class:`CurationState` saved by
    :func:`save_curation_state` — or, when ``path`` is a DELTA version
    (:func:`save_curation_delta`), the LOGICAL state of its whole chain,
    folded on read: ids/shingles/quality union, line/substr count
    partials merge through their associative index folds, and labels
    resolve last-writer-wins per doc (the newest version's relabel wins
    — exactly ``labels_full``'s carry-verbatim-or-retouch semantics).
    Full-save relations come back as plain parquet scans. Chain folds
    come back LAZY on purpose — the per-batch probes are batch-keyed
    left-semi joins, and Catalyst's PushDownLeftSemiAntiJoin pushes them
    through the fold's Union/Aggregate into each part's parquet scan
    (plan-pinned in tests), so probing a folded index costs scans
    filtered to batch keys, not a corpus-wide fold shuffle. The one
    exception is ``labels``: its LWW fold is a Window the untouched-
    carry anti-join (keyed by cluster_rep, not the window's partition
    key) cannot push through, and the relation is consumed three times
    per batch — it comes back snapshot-wrapped so the window runs once
    per load."""
    from spark_iforest_spark import fs

    chain = _state_chain(spark, path)
    base_path, base_meta = chain[0]
    params = dict(base_meta["params"])
    params["ccnet_keep_bands"] = tuple(params["ccnet_keep_bands"])
    for vp, m in chain[1:]:
        mp = dict(m["params"])
        mp["ccnet_keep_bands"] = tuple(mp["ccnet_keep_bands"])
        if mp != params or m["cutpoints"] != base_meta["cutpoints"]:
            raise ValueError(
                f"curation-state chain mixes recipes: {vp} was written "
                f"under different params/cutpoints than its base {base_path}"
            )
    per_version = [
        {
            name: spark.read.parquet(f"{vp}/{name}")
            for name in m["relations"]
        }
        for vp, m in chain
    ]
    if len(chain) == 1:
        rels = per_version[0]
        return CurationState(
            ids=rels["ids"],
            lm=rels.get("lm"),
            cutpoints=base_meta["cutpoints"],
            line_index=rels.get("line_index"),
            substr_index=rels.get("substr_index"),
            shingle_index=rels.get("shingle_index"),
            labels=rels.get("labels"),
            quality=rels.get("quality"),
            params=params,
            line_detail=rels.get("line_detail"),
            substr_detail=rels.get("substr_detail"),
            nin_digest=rels.get("nin_digest"),
        )
    from functools import reduce

    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.operators.dedup import (
        merge_shingle_indexes,
        merge_substr_window_indexes,
    )
    from spark_iforest_spark.operators.pipeline import merge_line_count_indexes

    id_col0 = params["id_col"]
    if any(m.get("recurate") for _vp, m in chain):
        # SEQUENTIAL fold: a recurate version REPLACES affected index
        # keys and drops tombstoned per-doc rows — not associative with
        # the ingest deltas' count merges, so the chain folds version by
        # version (chains are bounded by the compaction cadence; the
        # batch-probe pushdown story is unchanged — anti/semi joins on
        # bounded key sets still push into the part scans)
        acc = dict(per_version[0])
        for (vp, m), rels in zip(chain[1:], per_version[1:]):
            if m.get("recurate"):
                acc = _apply_recurate_delta(acc, rels, id_col0)
            else:
                acc = _apply_ingest_delta(acc, rels, id_col0)
        labels0 = acc.get("labels")
        return CurationState(
            ids=acc["ids"],
            lm=per_version[0].get("lm"),
            cutpoints=base_meta["cutpoints"],
            line_index=acc.get("line_index"),
            substr_index=acc.get("substr_index"),
            shingle_index=acc.get("shingle_index"),
            labels=snapshot(labels0) if labels0 is not None else None,
            quality=acc.get("quality"),
            params=params,
            line_detail=acc.get("line_detail"),
            substr_detail=acc.get("substr_detail"),
            nin_digest=acc.get("nin_digest"),
        )

    def have(name):
        return [rv[name] for rv in per_version if name in rv]

    def fold(name, fn):
        parts = have(name)
        if not parts:
            return None
        return fn(parts) if len(parts) > 1 else parts[0]

    id_col = params["id_col"]
    labels_parts = have("labels")
    labels = None
    if labels_parts:
        labels = snapshot(_lww_labels(labels_parts, id_col))
    union_fold = lambda ps: reduce(DataFrame.unionByName, ps)  # noqa: E731
    return CurationState(
        ids=fold("ids", union_fold),
        lm=per_version[0].get("lm"),
        cutpoints=base_meta["cutpoints"],
        line_index=fold("line_index", lambda ps: merge_line_count_indexes(*ps)),
        substr_index=fold(
            "substr_index",
            # the chain verified shared params above; skip the per-load
            # recorded-window aggregate
            lambda ps: merge_substr_window_indexes(*ps, verify_window=False),
        ),
        shingle_index=fold(
            "shingle_index", lambda ps: merge_shingle_indexes(*ps, verify_n=False)
        ),
        labels=labels,
        quality=fold("quality", union_fold),
        params=params,
        # per-doc detail relations: append-only under doc-disjoint
        # ingest, so the chain fold is a plain union (like shingles)
        line_detail=fold("line_detail", union_fold),
        substr_detail=fold("substr_detail", union_fold),
        nin_digest=fold("nin_digest", union_fold),
    )


def _lww_labels(parts: list[DataFrame], id_col: str) -> DataFrame:
    """Last-writer-wins fold of (id, cluster_rep) label relations, oldest
    → newest: per doc, the newest relation containing it wins. Because
    every delta's labels are the TOUCHED-cluster relabels (untouched
    clusters carried verbatim upstream), this reconstructs the one-shot
    ``labels_full`` relation exactly — pytest-pinned against the full
    state layout."""
    from functools import reduce

    from pyspark.sql import Window

    tagged = [
        p.select(id_col, "cluster_rep").withColumn("_v", F.lit(i))
        for i, p in enumerate(parts)
    ]
    u = reduce(DataFrame.unionByName, tagged)
    w = Window.partitionBy(id_col).orderBy(F.col("_v").desc())
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_v", "_rn")
    )


def compact_curation_state(spark, state_dir: str) -> int:
    """Rewrite the NEWEST state version from delta-chain form to a full
    save in place — the compaction that bounds the chain a long-running
    ``curate_stream(state_layout="delta")`` accumulates. Executes the
    on-read folds once, stages the full state at a non-version sibling
    path, then swaps it in (delete + rename); older chain versions
    become pure retry-window history prunable with
    ``streaming.prune_versions``. Run with the stream STOPPED (the swap
    is not atomic on object stores; a crash between delete and rename
    leaves the intact full state at ``{state_dir}/compact_tmp`` —
    recover by renaming it to the reported version). Returns the
    compacted version id."""
    from spark_iforest_spark import fs

    versions = sorted(
        int(c["name"][1:])
        for c in fs.list_children(spark, state_dir)
        if c["name"].startswith("v") and c["name"][1:].isdigit()
    )
    if not versions:
        raise ValueError(f"compact_curation_state: no versions in {state_dir}")
    n = versions[-1]
    vdir = f"{state_dir}/v{n}"
    if not fs.load_json(spark, f"{vdir}/state.json").get("delta"):
        return n  # already a full save
    state = load_curation_state(spark, vdir)
    tmp = f"{state_dir}/compact_tmp"  # not v{N}-shaped: invisible to readers
    fs.delete(spark, tmp, recursive=True)
    save_curation_state(state, tmp)
    # verify the delete actually happened (round-12 advice fix): Hadoop
    # rename onto an EXISTING directory destination moves the source
    # INTO it (tmp would nest under v{N}) and reports success — a
    # silently-failed delete would leave the old delta state live while
    # this function returns as if compacted
    if not fs.delete(spark, vdir, recursive=True) and fs.exists(spark, vdir):
        raise IOError(
            f"compact_curation_state: could not delete {vdir} before the "
            f"swap; the intact full state is staged at {tmp}"
        )
    if not fs.rename(spark, tmp, vdir):
        raise IOError(
            f"compact_curation_state: rename {tmp} -> {vdir} failed; the "
            f"intact full state is at {tmp}"
        )
    return n


def prune_curation_history(
    spark, state_dir: str, keep_full: int = 2
) -> list[int]:
    """Retention for a DELTA-layout curation-state directory (round 13 —
    the in-stream twin of the cadence ``compact_every`` set): delete the
    chain versions no retry can ever need and return the pruned ids.

    ``streaming.prune_versions`` is correct only for full-rewrite sinks;
    here a delta version references its whole parent chain back to the
    nearest FULL save, so the safe retention boundary is a full-save
    version, not a version count: everything from the ``keep_full``-th
    newest full save onward is kept (that full save roots every chain a
    redelivered batch inside the current retry window could read —
    foreachBatch redelivers at most the in-flight batch, whose parent is
    at or after the PREVIOUS compaction), and everything strictly older
    is history. With ``compact_every=K`` this bounds the directory to at
    most ``keep_full`` full saves plus ~K deltas each, instead of the
    whole since-start chain (the combined soak's 23.4 MB growth term).
    ``keep_full`` must be >= 2 while a stream may retry — the newest
    full save can itself be OVERWRITTEN back to a delta by a redelivered
    batch (the retry rewrites its own version), whose chain then roots
    at the previous full save. No-op (returns []) until that many full
    saves exist."""
    from spark_iforest_spark import fs

    if keep_full < 2:
        raise ValueError(
            "prune_curation_history: keep_full must be >= 2 — a retried "
            "batch can overwrite the newest full save with a delta whose "
            "chain roots at the previous one."
        )
    versions = sorted(
        int(c["name"][1:])
        for c in fs.list_children(spark, state_dir)
        if c["name"].startswith("v") and c["name"][1:].isdigit()
    )
    fulls = [
        v
        for v in versions
        if not fs.load_json(spark, f"{state_dir}/v{v}/state.json").get("delta")
    ]
    if len(fulls) < keep_full:
        return []
    floor_ = fulls[-keep_full]
    pruned = [v for v in versions if v < floor_]
    for v in pruned:
        fs.delete(spark, f"{state_dir}/v{v}", recursive=True)
    return pruned


def cluster_losers(
    labels: DataFrame, quality: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The doc ids a near-dup sweep DROPS, from the state artifacts alone:
    every cluster member except its best-quality representative
    (``resolve_clusters``' argmax — max quality, ties to min id). One
    cluster-keyed aggregate + one anti-join; nothing text-sized."""
    from spark_iforest_spark.operators.dedup import resolve_clusters

    keep = resolve_clusters(
        labels, labels=labels, quality=quality, id_col=id_col
    )
    return labels.join(
        keep.select(F.col("keep_doc_id").alias(id_col)), id_col, "left_anti"
    ).select(id_col)


def curated_digests(state: CurationState) -> DataFrame:
    """(doc_id, clean_md5) of the curated corpus the state describes —
    the near-dup stage's survivors with their rebuilt-text digests,
    derived from the RETRACTABLE state alone (``nin_digest`` minus
    ``cluster_losers``): the relation ``pretrain_curate`` would emit
    (id, md5(text)) for, with no benchmark stage and no text re-read.
    This is what makes re-curation auditable end-to-end — after
    :func:`~spark_iforest_spark.operators.recurate.recurate_with_diff`
    the digests must equal curating the new snapshot from scratch
    (driver-gated)."""
    if state.nin_digest is None:
        raise ValueError(
            "curated_digests needs a retractable state "
            "(curation_state(..., retractable=True)) — nin_digest is absent"
        )
    p = state.params
    id_col = p["id_col"]
    if not p["neardup"]:
        return state.nin_digest
    return state.nin_digest.join(
        cluster_losers(state.labels, state.quality, id_col), id_col, "left_anti"
    )


def materialize_curation_state(state: CurationState) -> CurationState:
    """Snapshot every artifact relation in place (eager localCheckpoint /
    reliable checkpoint per the session conf) and return the state.

    Sessions that build a state and immediately ingest against it —
    without the parquet round-trip of :func:`save_curation_state` —
    want this: the incremental chain probes several artifacts more than
    once (the shingle index twice per pair generation; every index once
    per batch RUN when benchmarking), and a lazy artifact re-executes
    its build per consumption. After :func:`load_curation_state` this is
    a no-op-shaped convenience (parquet scans are already materialized).

    Each artifact is REBALANCED before checkpointing (round 13): the
    build plans leave layouts inherited from their shuffles and unions
    (32-64 near-empty partitions per artifact at test scale), and every
    per-batch probe then schedules that many tiny scan tasks — forever.
    The AQE rebalance sizes partitions by bytes (one partition for a
    small artifact, spread for a 100 TB index), the same layout a sane
    parquet save would produce; the exchange is artifact-sized and paid
    once at materialization, amortized over every batch that follows.
    """
    from spark_iforest_spark.checkpoint import snapshot

    for name in _STATE_RELATIONS:
        rel = getattr(state, name)
        if rel is not None:
            setattr(state, name, snapshot(rel.hint("rebalance"), eager=True))
    return state

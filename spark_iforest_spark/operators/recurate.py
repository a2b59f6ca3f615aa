"""Diff-driven incremental RE-curation (round 12): retract removed and
changed documents from a retractable :class:`~spark_iforest_spark.
operators.corpus.CurationState` and re-ingest their replacements, so a
new crawl snapshot updates the state (and the published curated corpus)
without the full rebuild a changed snapshot used to force.

North-star extension surface — the reference engine (titicaca/
spark-iforest, SURVEY.md §2) is batch-only and has no curation state;
this closes the loop the round-11 features opened: ``corpus_diff``
classifies what changed between snapshots, ``curate_stream`` ingests
ADDED docs — this module handles REMOVED and CHANGED.

Exactness contract (driver-gated): after
``recurate_with_diff(new_docs, corpus_diff(old, new), state_A)`` the
returned state's artifacts equal ``curation_state(new_docs)`` built from
scratch, and ``curated_digests`` of it equals the (id, md5(text)) of
``pretrain_curate(new_docs)`` — under the SAME frozen calibration (for
recipes with a ccnet stage the lm/cutpoints stay frozen; a true
from-scratch run would recalibrate, which is a deliberate separate
decision — the drift-cutpoint contract).

Why this needs more than signed deltas: the line/substr/neardup stages
are CORPUS-dependent, so retracting a doc can flip other docs' stage
outputs — a removed doc can drop a line's count below ``min_docs``
(the line re-enters every doc that contains it), deleting a window's
keep-first keeper reassigns the exemption to another doc, and removing
a cluster member can SPLIT a connected component (star edges encode old
connectivity and cannot be trusted). The algorithm therefore cascades,
but BOUNDEDLY — each stage recomputes only the flip fan-out:

1. line counts patch exactly from the per-doc ``line_detail`` rows;
   flipped digests identify the retained docs (D1) whose line-rebuilt
   text changed.
2. window count/keeper aggregates re-derive over ``substr_detail``
   restricted to the affected digests; dup-status flips and keeper
   moves identify D2.
3. docs in (D1 ∪ D2 ∪ added/changed) re-run the per-row prefix + both
   rebuilds against the PATCHED indexes (full-run semantics: each doc's
   own occurrences are already counted in the index, so a plain
   index join reproduces the one-shot chain's verdicts).
4. clusters containing any affected doc are re-paired from their
   members' ACTUAL current shingles (connectivity re-derived, so splits
   are exact); changed docs pair against the rest of the corpus through
   the standard batch-vs-index probes; untouched clusters carry
   verbatim (``dup_clusters_incremental``).

Scale shape: every index patch carries untouched rows verbatim through
an anti-join on a bounded affected-key set; the corpus-sized detail
relations are only read through affected-key semi-joins (digest-filtered
parquet scans); per-doc re-processing is diff + flip-fan-out sized; and
the cluster re-pairing is bounded by touched-cluster membership. Nothing
corpus-sized shuffles except the detail scans' filtered reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spark_iforest_spark.checkpoint import snapshot
from spark_iforest_spark.operators.corpus import (
    CurationState,
    _line_detail_of,
    _nin_digest_of,
    cluster_losers,
    curated_digests,
)


def _pre_ccnet_survivors(docs: DataFrame, state: CurationState) -> DataFrame:
    """The chain's per-row prefix UP TO (excluding) the ccnet stage —
    non-empty filter + gopher battery under the state's recipe: the
    ccnet stage's input rows, i.e. exactly the relation the calibration
    quantiles are computed over (shared by recalibrate_ccnet and
    corpus.ccnet_stage_stats so the drift/recalibration surface scores
    the same population the original calibration did)."""
    from spark_iforest_spark.operators.pipeline import gopher_filter

    p = state.params
    id_col, text_col = p["id_col"], p["text_col"]
    cur = docs.where(
        F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0
    ).select(id_col, text_col)
    if p["gopher"]:
        cur = (
            gopher_filter(
                cur, id_col, text_col, keep_cols=(text_col,),
                **p["gopher_thresholds"],
            )
            .where("gopher_keep")
            .select(id_col, text_col)
        )
    return cur


def _row_stage_survivors(docs: DataFrame, state: CurationState) -> DataFrame:
    """The chain's per-row prefix — non-empty filter, gopher battery,
    frozen-calibration ccnet — recomputable for any doc at any time
    (deterministic given text + the frozen artifacts). Returns
    (id, text) with ORIGINAL text, the line stage's input rows."""
    from spark_iforest_spark.operators.text import ccnet_apply

    p = state.params
    id_col, text_col = p["id_col"], p["text_col"]
    cur = _pre_ccnet_survivors(docs, state)
    if p["has_ccnet"]:
        kept = ccnet_apply(
            cur, state.lm, state.cutpoints, id_col=id_col, text_col=text_col,
            keep_bands=p["ccnet_keep_bands"],
        ).select(id_col)
        cur = cur.join(kept, id_col, "left_semi")
    return cur


def _line_rebuild_vs_index(
    gdocs: DataFrame, line_index: DataFrame, min_docs: int,
    id_col: str, text_col: str,
) -> DataFrame:
    """Line-rebuild docs whose line contributions are ALREADY COUNTED in
    ``line_index`` (the re-processing read): a plain digest join against
    the index reproduces the one-shot ``line_dedup`` verdict — unlike the
    incremental apply, no batch-count addition happens. The corpus-sized
    index is semi-joined down to the docs' own digests first. Returns
    (id, text) with the rebuilt text, empty docs dropped (the stage
    filter)."""
    from spark_iforest_spark.operators.pipeline import (
        _doc_lines,
        _rebuild_kept_lines,
    )

    lines = snapshot(_doc_lines(gdocs, id_col, text_col))
    idx = line_index.select(F.col("line_md5").alias("_h"), "n_docs")
    relevant = idx.join(
        F.broadcast(lines.select("_h").distinct()), "_h", "left_semi"
    )
    # left join + coalesce(0): a digest missing from the index can only
    # mean count 0 (kept) — the conservative direction for a read that
    # expects every own-line to be indexed
    kept = lines.join(relevant, "_h", "left").where(
        F.coalesce(F.col("n_docs"), F.lit(0)) < int(min_docs)
    )
    reb = _rebuild_kept_lines(kept, gdocs, id_col, text_col, with_text=True)
    return (
        reb.select(F.col(id_col), F.col("clean_text").alias(text_col))
        .where(F.length(text_col) > 0)
    )


def _substr_rebuild_vs_index(
    docs: DataFrame, substr_index: DataFrame, window: int,
    id_col: str, text_col: str, min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-rebuild docs whose window occurrences are ALREADY
    COUNTED in ``substr_index``: cut = indexed count >= min_count and the
    occurrence is not the indexed keep-first keeper — the one-shot
    ``remove_repeated_substrings`` verdict from the index alone. Returns
    (id, text), empty docs dropped."""
    from spark_iforest_spark.operators.dedup import (
        _apply_cut_spans,
        _merge_cut_spans,
        _window_keys,
    )

    wins = snapshot(_window_keys(docs, id_col, text_col, window))
    idx = substr_index.select(
        "h",
        "n_occurrences",
        F.struct(
            F.col("first_id").alias("i"), F.col("first_pos").alias("p")
        ).alias("_k"),
    )
    relevant = idx.join(
        F.broadcast(wins.select("h").distinct()), "h", "left_semi"
    )
    cut = wins.join(
        relevant.where(F.col("n_occurrences") >= int(min_count)).select(
            "h", "_k"
        ),
        "h",
    ).where(
        ~(
            (F.col(id_col) == F.col("_k.i"))
            & (F.col("pos") == F.col("_k.p"))
        )
    )
    spans = _merge_cut_spans(cut, id_col, window)
    reb = _apply_cut_spans(docs, spans, id_col, text_col, with_text=True)
    return (
        reb.select(F.col(id_col), F.col("clean_text").alias(text_col))
        .where(F.length(text_col) > 0)
    )


def _self_jaccard_pairs(
    sh: DataFrame, threshold: float, block_col: str | None = None
) -> DataFrame:
    """Exact jaccard pairs WITHIN one exploded (did, sh) relation —
    ``ngram_jaccard_pairs``' math over already-hashed shingle rows
    (``_jaccard_pairs_vs_index`` requires disjoint sides; the re-pairing
    of a touched cluster's members is inherently self-vs-self).

    ``block_col`` restricts candidate pairs to rows sharing that column
    — the touched-cluster re-pairing passes the OLD cluster rep, making
    the shingle self-join block-diagonal (cluster-bounded) instead of
    all-touched-members-pairwise: cross-cluster pairs between two
    UNCHANGED docs cannot exist (a pair implies same old cluster), and
    changed docs' pairs are covered by the batch-vs-corpus probes, so
    blocking drops only impossible candidates."""
    cols = ["did", "sh"] + ([block_col] if block_col else [])
    sh = snapshot(sh.select(*cols))
    sizes = sh.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
    cond = (F.col("a.sh") == F.col("b.sh")) & (F.col("a.did") < F.col("b.did"))
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), cond)
        .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")), 6
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.did"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.did"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= float(threshold))
    )


def _check_diff_consistent(
    diff_ids: DataFrame, state_ids: DataFrame, id_col: str, change: str,
    should_exist: bool,
) -> None:
    """One bounded driver action: removed/changed ids must exist in the
    state, added ids must not — a diff computed against the wrong
    snapshot would otherwise silently corrupt every count it patches."""
    if should_exist:
        bad = diff_ids.join(state_ids, id_col, "left_anti").limit(1)
    else:
        bad = diff_ids.join(state_ids, id_col, "left_semi").limit(1)
    row = bad.collect()
    if row:
        raise ValueError(
            f"recurate_with_diff: diff {change!r} id {row[0][0]!r} "
            f"{'is missing from' if should_exist else 'already exists in'} "
            "the state's id relation — the diff was not computed against "
            "the snapshot this state describes."
        )


def recurate_with_diff(
    new_docs: DataFrame,
    diff: DataFrame,
    state: CurationState,
    assume_consistent_diff: bool = False,
    broadcast_affected: bool = True,
    with_delta: bool = False,
) -> tuple:
    """Apply a snapshot diff to a retractable curation state: retract
    REMOVED and CHANGED docs' contributions, ingest ADDED and CHANGED
    docs' new text, and cascade exactly through the flip fan-out (module
    docstring). Returns ``(changes, new_state)``:

    * ``changes`` — the curated-corpus delta to apply to the previously
      published output: (doc_id, change, clean_md5, clean_text) with
      ``change`` in ('removed', 'upsert'). ``removed`` rows are docs that
      no longer survive (their payload columns are NULL); ``upsert`` rows
      carry the (new) rebuilt text for docs that are new, changed, had
      their text flip through the cascade, or were RESURRECTED by a
      cluster-winner change. Lazily composed — a caller that only wants
      the state pays nothing for it.
    * ``new_state`` — artifacts equal to ``curation_state(new_docs)``
      under the frozen calibration (driver-gated via
      :func:`~spark_iforest_spark.operators.corpus.curated_digests`).

    ``diff`` is a :func:`~spark_iforest_spark.operators.corpus.
    corpus_diff` relation (old → new). ``new_docs`` is the NEW snapshot —
    the old snapshot's text is never needed: every old contribution is
    retracted from the state's own detail relations. ``new_docs`` is
    scanned a handful of times (once per re-process wave) and should be
    a STORED table (its natural production shape) or a snapshot() — a
    heavy derived EXPRESSION would re-evaluate per scan, and the id
    semi-joins that prune each wave cannot push below an expression the
    way a stored-column scan filter can (measured: the benchmark
    fixture's reshape expression cost ~150 s per wave at sf0.1 until
    materialized).
    ``assume_consistent_diff=True`` skips the two bounded id-consistency
    probes (diff known derived from this state's snapshot).
    ``broadcast_affected=False`` swaps the affected-key broadcasts (id
    sets, flipped digests) for shuffle semi-joins — the same escape
    hatch every incremental operator's ``broadcast_batch`` provides for
    diffs whose key sets outgrow the broadcast limit.

    The returned state is LAZY — persist it (``save_curation_state``) or
    ``materialize_curation_state`` before ingesting against it.
    ``with_delta=True`` returns ``(changes, new_state, delta)`` where
    ``delta`` is the TOMBSTONE-DELTA encoding of the state update for
    :func:`~spark_iforest_spark.operators.corpus.save_recurate_delta`:
    per-relation retraction id sets, replaced index keys, and the added
    rows — every relation CHURN-proportional, so persisting a
    re-curation costs the diff + flip fan-out instead of the full-state
    rewrite (the corpus-proportional term the A/B measured; the chain
    folds it back on read, ``load_curation_state``)."""
    p = state.params
    if not p.get("retractable"):
        raise ValueError(
            "recurate_with_diff needs a retractable state "
            "(curation_state(..., retractable=True)): the aggregate "
            "indexes alone cannot be subtracted from (min/count "
            "aggregates are not invertible)."
        )
    id_col, text_col = p["id_col"], p["text_col"]
    spark = new_docs.sparkSession

    d = snapshot(diff.select(F.col(id_col), "change"))
    r_ids = snapshot(
        d.where(F.col("change").isin("removed", "changed")).select(id_col)
    )
    ad_ids = snapshot(
        d.where(F.col("change").isin("added", "changed")).select(id_col)
    )
    if not assume_consistent_diff:
        _check_diff_consistent(
            d.where(F.col("change").isin("removed", "changed")).select(id_col),
            state.ids, id_col, "removed/changed", should_exist=True,
        )
        _check_diff_consistent(
            d.where(F.col("change") == "added").select(id_col),
            state.ids, id_col, "added", should_exist=False,
        )

    bcast = F.broadcast if broadcast_affected else (lambda d: d)

    def _semi(docs, ids):
        return docs.join(bcast(ids), id_col, "left_semi")

    def _anti(rel, ids):
        return rel.join(bcast(ids), id_col, "left_anti")

    # Re-process waves are CHURN-sized (id, text) slices of the stored
    # snapshot, and the heavy per-row prefix that follows (the gopher
    # battery's interpreted-HOF rules, the window/rebuild trees) must run
    # over exactly those rows. Left as a plain semi-join plan, BOTH of
    # those go wrong at once: Catalyst treats the (expensive) battery
    # filter as pushable and sinks it BELOW the wave semi-join into the
    # corpus-sized parquet scan — the battery then evaluates over every
    # corpus row to keep a 2% wave (measured: three 15-19 s stages at
    # sf0.1/fat=8, 79% of the re-curation wall) — and it runs at the
    # scan's split count (2 tasks locally), not the cluster's width.
    # The fix is one churn-sized materialization barrier per wave:
    # repartition the wave to the session width and snapshot it, so the
    # optimizer cannot push anything below the checkpointed leaf and the
    # per-row compute runs wave-sized on every core. The exchanged and
    # checkpointed bytes are churn-proportional by construction — never
    # corpus-sized. Materialized downstream snapshots (rebuilt-text
    # relations) use the round-13 conditional re-spread instead: their
    # partition count is free to read, and the repartition moves
    # already-checkpointed churn-sized blocks only when AQE coalesced
    # them too narrow for the next per-row pass.
    from spark_iforest_spark.functions import shuffle_partitions

    n_parts = shuffle_partitions(spark)

    def _spread(docs):
        return snapshot(docs.repartition(n_parts))

    def _respread(snap):
        if snap.rdd.getNumPartitions() < n_parts:
            return snap.repartition(n_parts)
        return snap

    ad_docs = _spread(_semi(new_docs, ad_ids))

    # ---- stage: line dedup — patch counts from detail, find D1 --------
    min_docs = p["line_min_docs"]
    if min_docs:
        g_ad = snapshot(_row_stage_survivors(ad_docs, state))
        add_ld = snapshot(_line_detail_of(g_ad, id_col, text_col))
        old_ld = state.line_detail
        aff_h = snapshot(
            _semi(old_ld, r_ids)
            .select("line_md5")
            .unionByName(add_ld.select("line_md5"))
            .distinct()
        )
        remaining = _anti(old_ld, r_ids).join(
            bcast(aff_h), "line_md5", "left_semi"
        )
        patched_counts = snapshot(
            remaining.unionByName(add_ld)
            .groupBy("line_md5")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        )
        # LAZY on purpose (round 13): the patched index is CORPUS-sized
        # — an eager/lazy checkpoint here materialized the whole relation
        # once per re-curation even at 2% churn (the A/B's wall-clock
        # inversion). Left lazy, every consumer is anti-join(scan) +
        # union(churn-sized snapshot): the rebuild probes' digest
        # semi-joins push through the Union into the state's parquet
        # scan, and the final save streams scan→write. Nothing
        # corpus-sized is ever pinned to executor memory/disk.
        line_index_b = state.line_index.join(
            bcast(aff_h), "line_md5", "left_anti"
        ).unionByName(patched_counts)
        line_detail_b = _anti(old_ld, r_ids).unionByName(add_ld)
        # flipped digests: boilerplate status (n >= min_docs) changed
        oldc = state.line_index.join(bcast(aff_h), "line_md5", "left_semi")
        flips = snapshot(
            oldc.alias("o")
            .join(patched_counts.alias("n"), "line_md5", "full")
            .where(
                (F.coalesce(F.col("o.n_docs"), F.lit(0)) >= min_docs)
                != (F.coalesce(F.col("n.n_docs"), F.lit(0)) >= min_docs)
            )
            .select("line_md5")
        )
        d1_ids = snapshot(
            _anti(old_ld, r_ids)
            .join(bcast(flips), "line_md5", "left_semi")
            .select(id_col)
            .distinct()
        )
    else:
        line_index_b = line_detail_b = None
        d1_ids = spark.createDataFrame([], state.ids.schema)

    def _u_in(raw_docs):
        """Line-stage OUTPUT of docs under the PATCHED index — the
        ExactSubstr stage's input rows for any doc, one-shot semantics.
        The per-row prefix is snapshotted: the line rebuild consumes it
        twice (lines side + totals side), and the gopher battery is the
        expensive per-row pass — lazy it would execute per consumer."""
        g = snapshot(_row_stage_survivors(_spread(raw_docs), state))
        if not min_docs:
            return g
        return _line_rebuild_vs_index(g, line_index_b, min_docs, id_col, text_col)

    # ---- stage: ExactSubstr — patch count/keeper from detail, find D2 --
    window = p["substr_window"]
    p1_ids = snapshot(d1_ids.unionByName(ad_ids).distinct())
    u_p1 = _respread(snapshot(_u_in(_semi(new_docs, p1_ids))))
    if window:
        from spark_iforest_spark.operators.dedup import _window_keys

        new_wins = snapshot(_window_keys(u_p1, id_col, text_col, window))
        retract1 = snapshot(r_ids.unionByName(d1_ids).distinct())
        old_sd = state.substr_detail
        w_aff = snapshot(
            _semi(old_sd, retract1)
            .select("h")
            .unionByName(new_wins.select("h"))
            .distinct()
        )
        remaining_sd = _anti(old_sd, retract1).join(
            bcast(w_aff), "h", "left_semi"
        )
        patched_idx = snapshot(
            remaining_sd.select(id_col, "pos", "h")
            .unionByName(new_wins)
            .groupBy("h")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_occurrences"),
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"), F.col("pos").alias("p")
                    )
                ).alias("_f"),
            )
            .select(
                "h",
                "n_occurrences",
                F.col("_f.i").alias("first_id"),
                F.col("_f.p").alias("first_pos"),
                F.lit(int(window)).alias("window"),
            )
        )
        # corpus-sized — lazy for the same reason as line_index_b
        substr_index_b = state.substr_index.join(
            bcast(w_aff), "h", "left_anti"
        ).unionByName(patched_idx)
        substr_detail_b = _anti(old_sd, retract1).unionByName(new_wins)
        # flips: dup status (n >= 2) or — both sides still duplicated —
        # the keep-first keeper moved (old and new keeper docs flip)
        oldw = state.substr_index.join(bcast(w_aff), "h", "left_semi")
        cmp = snapshot(
            oldw.select(
                "h",
                F.col("n_occurrences").alias("_no"),
                F.col("first_id").alias("_oi"),
                F.col("first_pos").alias("_op"),
            )
            .join(
                patched_idx.select(
                    "h",
                    F.col("n_occurrences").alias("_nn"),
                    F.col("first_id").alias("_ni"),
                    F.col("first_pos").alias("_np"),
                ),
                "h",
                "full",
            )
            .select(
                "h",
                (
                    (F.coalesce(F.col("_no"), F.lit(0)) >= 2)
                    != (F.coalesce(F.col("_nn"), F.lit(0)) >= 2)
                ).alias("status_flip"),
                (
                    (F.coalesce(F.col("_no"), F.lit(0)) >= 2)
                    & (F.coalesce(F.col("_nn"), F.lit(0)) >= 2)
                    & (
                        (F.col("_oi") != F.col("_ni"))
                        | (F.col("_op") != F.col("_np"))
                    )
                ).alias("keeper_move"),
                F.col("_oi"),
                F.col("_ni"),
            )
        )
        flip_h = cmp.where("status_flip").select("h")
        d2_status = (
            _anti(old_sd, retract1)
            .join(bcast(flip_h), "h", "left_semi")
            .select(id_col)
        )
        d2_keepers = (
            cmp.where("keeper_move")
            .select(F.col("_oi").alias(id_col))
            .unionByName(cmp.where("keeper_move").select(F.col("_ni").alias(id_col)))
        )
        d2_ids = snapshot(
            _anti(
                _anti(d2_status.unionByName(d2_keepers).distinct(), r_ids),
                p1_ids,
            )
        )
    else:
        substr_index_b = substr_detail_b = None
        d2_ids = spark.createDataFrame([], state.ids.schema)

    # ---- stage: near-dup — re-shingle affected docs, re-pair touched
    # clusters from actual shingles, carry untouched verbatim ------------
    # u_all is consumed twice by the substr rebuild (window keys + the
    # span-apply side) — snapshotted so the D2 docs' line rebuild runs
    # once (u_p1 is already checkpointed above)
    u_all = _respread(
        snapshot(u_p1.unionByName(_u_in(_semi(new_docs, d2_ids))))
    )
    if window:
        nin_new = _respread(snapshot(
            _substr_rebuild_vs_index(
                u_all, substr_index_b, window, id_col, text_col
            )
        ))
    else:
        nin_new = u_all
    rm_ids = snapshot(
        r_ids.unionByName(d1_ids).unionByName(d2_ids).distinct()
    )
    ids_b = _anti(state.ids, r_ids).unionByName(ad_ids)
    if p["neardup"]:
        from spark_iforest_spark.operators.dedup import (
            _jaccard_pairs_vs_index,
            dup_clusters_incremental,
            shingle_index as _shingle_index,
        )
        from spark_iforest_spark.operators.text import quality_score

        sh_new = snapshot(
            _shingle_index(nin_new, id_col, text_col, n=p["jaccard_n"])
        )
        # corpus-sized — lazy (see line_index_b); the pair probes that
        # read it (_jaccard_pairs_vs_index's shared-shingle semi-join,
        # the touched-member join) cut it to bounded key sets first, so
        # each consumption is a filtered scan, not a checkpointed copy
        shingle_b = state.shingle_index.join(
            bcast(rm_ids.select(F.col(id_col).alias("did"))),
            "did",
            "left_anti",
        ).unionByName(sh_new)
        q_new = snapshot(
            quality_score(nin_new, id_col, text_col).select(
                F.col(id_col), "quality"
            )
        )
        quality_b = _anti(state.quality, rm_ids).unionByName(q_new)
        nin_b = _anti(state.nin_digest, rm_ids).unionByName(
            _nin_digest_of(nin_new, id_col, text_col)
        )
        # touched clusters: any cluster containing an affected doc — its
        # connectivity may have SPLIT, so stars are not trusted; members
        # re-pair from their actual current shingles
        delta_ids = snapshot(rm_ids.unionByName(ad_ids).distinct())
        t1 = snapshot(
            _semi(state.labels, delta_ids).select("cluster_rep").distinct()
        )
        labels_rest = state.labels.join(
            bcast(t1), "cluster_rep", "left_anti"
        )
        thr = p["jaccard_threshold"]
        ch_dids = snapshot(
            nin_new.select(F.col(id_col).alias("did")).distinct()
        )
        # E1: UNCHANGED touched-cluster members re-pair WITHIN their old
        # cluster (block-diagonal — see _self_jaccard_pairs; changed
        # members' pairs come from E2/E3, and unchanged cross-cluster
        # pairs cannot exist)
        member_reps = state.labels.join(
            bcast(t1), "cluster_rep", "left_semi"
        ).select(F.col(id_col).alias("did"), F.col("cluster_rep").alias("_rep"))
        m_sh = (
            shingle_b.select("did", "sh")
            .join(bcast(ch_dids), "did", "left_anti")
            .join(bcast(member_reps), "did")
        )
        e1 = _self_jaccard_pairs(m_sh, thr, block_col="_rep")
        e2 = _jaccard_pairs_vs_index(
            sh_new.select("did", "sh"),
            shingle_b.select("did", "sh").join(
                bcast(ch_dids), "did", "left_anti"
            ),
            thr,
            broadcast_affected,
        )
        e3 = _self_jaccard_pairs(sh_new.select("did", "sh"), thr)
        pairs = snapshot(
            e1.select("doc_a", "doc_b")
            .unionByName(e2.select("doc_a", "doc_b"))
            .unionByName(e3.select("doc_a", "doc_b"))
            .distinct()
        )
        # snapshot_labels=False: labels_rest is an anti-join over the
        # state's own (stored/materialized) labels — corpus-sized, so
        # checkpointing it inside would pin a full copy; its three
        # consumptions are each a cheap filtered re-scan. labels_full
        # stays lazy for the same reason (its touched half is CC-output-
        # snapshot-backed; the untouched half is scan + anti-join).
        labels_full, labels_touched = dup_clusters_incremental(
            pairs, labels_rest, id_col=id_col, snapshot_pairs=False,
            return_touched=True, snapshot_labels=False,
        )
        labels_b = labels_full
    else:
        shingle_b = quality_b = labels_b = labels_touched = None
        nin_b = _anti(state.nin_digest, rm_ids).unionByName(
            _nin_digest_of(nin_new, id_col, text_col)
        )

    new_state = CurationState(
        ids=ids_b,
        lm=state.lm,
        cutpoints=state.cutpoints,
        line_index=line_index_b,
        substr_index=substr_index_b,
        shingle_index=shingle_b,
        labels=labels_b,
        quality=quality_b,
        params=p,
        line_detail=line_detail_b,
        substr_detail=substr_detail_b,
        nin_digest=nin_b,
    )

    # ---- the published-corpus delta (lazy) -----------------------------
    surv_a = curated_digests(state)
    surv_b = curated_digests(new_state)
    removed_out = surv_a.select(id_col).join(
        surv_b.select(id_col), id_col, "left_anti"
    )
    processed_ids = nin_new.select(id_col)
    # resurrected: newly-surviving docs the cascade never re-processed
    # (a cluster-winner flip) — their rebuilt text recomputes per-row
    # against the patched indexes, digest-equal to their nin_digest row
    resurrected = (
        surv_b.select(id_col)
        .join(surv_a.select(id_col), id_col, "left_anti")
        .join(processed_ids, id_col, "left_anti")
    )
    res_docs = new_docs.join(resurrected, id_col, "left_semi")
    res_u = _u_in(res_docs)
    res_text = (
        _substr_rebuild_vs_index(
            res_u, substr_index_b, window, id_col, text_col
        )
        if window
        else res_u
    )
    upsert_text = nin_new.join(
        surv_b.select(id_col), id_col, "left_semi"
    ).unionByName(res_text)
    changes = removed_out.select(
        F.col(id_col),
        F.lit("removed").alias("change"),
        F.lit(None).cast("string").alias("clean_md5"),
        F.lit(None).cast("string").alias("clean_text"),
    ).unionByName(
        upsert_text.select(
            F.col(id_col),
            F.lit("upsert").alias("change"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("clean_md5"),
            F.col(text_col).alias("clean_text"),
        )
    )
    if not with_delta:
        return changes, new_state

    # ---- the tombstone-delta encoding (all relations churn-sized) ------
    delta: dict = {
        "retract_corpus_ids": d.where(F.col("change") == "removed").select(
            id_col
        ),
        "ids": d.where(F.col("change") == "added").select(id_col),
        "retract_nin": rm_ids,
        "nin_digest": _nin_digest_of(nin_new, id_col, text_col),
    }
    if min_docs:
        delta["retract_line"] = r_ids
        delta["line_detail"] = add_ld
        delta["line_index_drop"] = aff_h
        delta["line_index"] = patched_counts
    if window:
        delta["retract_substr"] = retract1
        delta["substr_detail"] = new_wins
        delta["substr_index_drop"] = w_aff
        delta["substr_index"] = patched_idx
    if p["neardup"]:
        delta["shingle_index"] = sh_new
        delta["quality"] = q_new
        # labels tombstone: every member of a cluster whose membership
        # was re-derived (T1 — possibly split — plus rest clusters the
        # new pairs touched); the re-derived rows are the touched labels
        delta["labels_tombstone"] = (
            state.labels.join(bcast(t1), "cluster_rep", "left_semi")
            .select(id_col)
            .unionByName(labels_touched.select(id_col))
            .distinct()
        )
        delta["labels"] = labels_touched
    return changes, new_state, delta


def recalibrate_ccnet(
    new_docs: DataFrame,
    state: CurationState,
    fractions: tuple = (0.333333, 0.666667),
    rel_err: float = 0.0,
    broadcast_affected: bool = True,
    with_delta: bool = False,
) -> tuple:
    """Close the drift-cutpoint contract (round 13): refit the ccnet
    BANDING CUTPOINTS on the current snapshot and cascade exactly the
    keep-decision flips through the curation state — the recovery the
    ``streaming.ccnet_drift_report`` alarm names, mirroring the ANN
    loop's ``requantize_ann_index``.

    The frozen half of CCNet is (lm, cutpoints). The LM is fit on the
    TRUSTED REFERENCE corpus — corpus drift does not invalidate it (a
    new reference is a new ``curation_state`` decision). The cutpoints,
    however, are corpus-fraction quantiles of the CURATED CORPUS's
    scores: as churn accumulates, the frozen terciles band a population
    they were not computed on, and the keep fraction silently migrates.
    Recalibration recomputes ``perplexity_cutpoints`` over the current
    snapshot's ccnet-stage input (non-empty + gopher survivors — the
    same population the original calibration quantiled, via the shared
    ``_pre_ccnet_survivors`` prefix), then treats exactly the docs whose
    KEEP DECISION flipped under the new cutpoints as a ``changed`` diff
    for :func:`recurate_with_diff` — the state comes out equal to
    ``curation_state(new_docs, reference)`` built from scratch (which
    would compute these same cutpoints), pytest-pinned INCLUDING the
    ccnet stage, without re-processing any unflipped doc.

    Returns ``(changes, new_state, report)`` — ``changes``/``new_state``
    as :func:`recurate_with_diff` (plus ``delta`` before ``report`` when
    ``with_delta=True``); ``report`` = ``{"old_cutpoints",
    "new_cutpoints", "n_flips"}``. NOTE a recalibrated state must be
    persisted as a FULL save (``save_curation_state``), not a delta on
    the old chain — ``load_curation_state`` rejects chains that mix
    cutpoints, by design.

    Scale shape: one scoring pass over the snapshot's gopher survivors
    (two vocabulary-keyed broadcast joins + the quantile sketch job —
    the same cost calibration paid), then a flip-fan-out-sized
    re-curation; nothing corpus-sized is materialized (the scored
    relation is snapshotted once, band flips are a codegen CASE over
    it)."""
    from spark_iforest_spark.operators.text import (
        lm_perplexity,
        perplexity_cutpoints,
    )

    p = state.params
    if not p["has_ccnet"]:
        raise ValueError(
            "recalibrate_ccnet: the state has no ccnet stage "
            "(curation_state was built without a reference corpus)."
        )
    id_col = p["id_col"]
    text_col = p["text_col"]
    cur = _pre_ccnet_survivors(new_docs, state)
    scored = snapshot(
        lm_perplexity(cur, state.lm, id_col=id_col, text_col=text_col)
    )
    new_cuts = perplexity_cutpoints(scored, fractions, rel_err=rel_err)
    keep = [int(b) for b in p["ccnet_keep_bands"]]

    def _keep(cuts):
        c1, c2 = int(cuts[0]), int(cuts[1])
        band = (
            F.when(F.col("avg_nll_micros") <= c1, 1)
            .when(F.col("avg_nll_micros") <= c2, 2)
            .otherwise(3)
        )
        return band.isin(keep)

    flips = snapshot(
        scored.where(_keep(state.cutpoints) != _keep(new_cuts)).select(id_col)
    )
    recal_state = CurationState(
        ids=state.ids,
        lm=state.lm,
        cutpoints=new_cuts,
        line_index=state.line_index,
        substr_index=state.substr_index,
        shingle_index=state.shingle_index,
        labels=state.labels,
        quality=state.quality,
        params=p,
        line_detail=state.line_detail,
        substr_detail=state.substr_detail,
        nin_digest=state.nin_digest,
    )
    diff = flips.select(
        F.col(id_col), F.lit("changed").alias("change")
    )
    out = recurate_with_diff(
        new_docs, diff, recal_state,
        # the diff is derived from this state's own snapshot ids by
        # construction — skip the two consistency probe jobs
        assume_consistent_diff=True,
        broadcast_affected=broadcast_affected,
        with_delta=with_delta,
    )
    report = {
        "old_cutpoints": list(state.cutpoints),
        "new_cutpoints": list(new_cuts),
        "n_flips": flips.count(),
    }
    return (*out, report)

"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine.

Candidate generation differs per operator (that's the point — each trades
recall for join volume differently), but every near-dup operator VERIFIES
candidates with the exact same set-Jaccard computation before emitting, so
all three text near-dup variants return the same (doc_a, doc_b, jaccard)
relation when recall is 1 — which is what lets one DuckDB oracle check all
of them.

Shingles are hashed to int64 JVM-side (xxhash64 inside Catalyst) before
anything ships to Python or a shuffle: the inverted index joins on 8-byte
keys instead of strings, and the MinHash/SimHash UDFs do pure numpy matrix
math on Arrow int64 arrays. Set cardinalities are collision-exact w.h.p.
(64-bit space vs ~1e3 shingles/doc).

Scale notes (100 TB corpus):
* exact: one hash-shuffle on a 32-byte digest, map-side combine free.
* ngram-jaccard: inverted-index self-join; volume is sum of df(shingle)^2.
  ``max_shingle_df`` caps hot shingles (boilerplate) — the classic skew fix.
* minhash-lsh: join volume drops to bucket collisions only; signatures are
  one Arrow batch pass (one (perms × shingles) matrix op per doc).
* simhash: cheapest candidates (8 × 8-bit band equality) for
  high-similarity dedup.
* embedding-cosine: exact O(n²) pairs — correctness reference; the scale
  path is the LSH-bucketed variant in similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from spark_iforest_spark.checkpoint import snapshot
from spark_iforest_spark.functions import (
    check_batch_disjoint,
    cosine,
    tokens,
    word_shingles,
)

# MinHash universal-hash parameters: h_i(x) = (a_i*x + b_i) mod PRIME.
# Fixed seed => signatures deterministic across runs/partitions. The prime is
# 2^31-1 so a*x (< 2^62) never overflows uint64 — the whole signature matrix
# computes as one vectorized numpy op per document.
_MINHASH_PRIME = (1 << 31) - 1
_MINHASH_PERMS = 128
_MINHASH_SEED = 0x5EED_1F0E


def _minhash_coeffs(num_perms: int = _MINHASH_PERMS) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(1, _MINHASH_PRIME, size=num_perms, dtype=np.int64)
    b = rng.integers(0, _MINHASH_PRIME, size=num_perms, dtype=np.int64)
    return a, b


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content digest: one representative (min id) per digest.

    Grouping by the md5 digest, not the raw text, keeps shuffle rows small
    (32 bytes vs document bodies) — the digest is computed scan-side.

    NULL text digests as the empty string (round-11 review fix, same
    convention as ``corpus.corpus_diff``): a bare ``md5(NULL)`` is NULL,
    and while groupBy treats NULLs as one group, every downstream
    incremental JOIN (index lookup, supersede anti-join, delta probe)
    would either miss the NULL key with plain equality — re-counting
    NULL-text docs as never-seen each batch — or need null-safe joins,
    which defeat bucketed co-location (the bucket spec no longer matches
    the rewritten join key; plan-pinned in test_bucketed_join). With the
    digest total, plain equality joins are exact and the bucket layout
    holds; NULL and '' are the same content by convention.
    """
    return (
        docs.select(
            F.col(id_col),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-dedup a NEW batch against a persisted digest index (an
    ``exact_dedup`` relation) without re-reading the old corpus.

    Returns the updated ``(content_hash, rep_doc_id, n_copies)`` rows for
    every digest the batch touches — exactly the full-corpus relation
    restricted to digests present in the batch (pytest-pinned), which is
    both the batch's dedup verdict (``n_copies > batch count`` ⇒ seen
    before) and the delta to upsert back into the index.

    Scale: the batch aggregates map-side to one row per distinct digest
    before the index join. Persist the index BUCKETED by ``content_hash``
    (``df.write.bucketBy(n, "content_hash")``) and the corpus side of the
    lookup join needs no shuffle at all — only the batch's digest rows
    move. ``least``/``+coalesce`` merge semantics make the update
    idempotent to re-running a batch only if the caller dedupes batch ids;
    exactly-once upsert discipline is the storage layer's job (e.g. MERGE
    INTO on a transactional table format). PRECONDITION (unlike the LSH
    twins, which drop superseded index rows by id): the digest index
    carries no per-doc rows, so merging the SAME batch twice double-counts
    ``n_copies`` — dedupe batch ids upstream, or use the versioned sink
    (streaming.merge_index_version), whose strict-parent rule makes
    retries idempotent.
    """
    batch = exact_dedup(new_docs, id_col, text_col)
    # a USING equality join is exact because exact_dedup's digest is
    # TOTAL (NULL text digests as '' — see its docstring): no NULL join
    # keys exist, so bucketed co-location on content_hash keeps working
    # (a null-safe join would rewrite the key and force the corpus-side
    # shuffle the bucket layout exists to avoid)
    return (
        batch.alias("b")
        .join(index.alias("i").hint("merge"), "content_hash", "left")
        .select(
            "content_hash",
            # least() skips NULLs: unseen digests keep the batch's rep
            F.least(F.col("i.rep_doc_id"), F.col("b.rep_doc_id")).alias(
                "rep_doc_id"
            ),
            (
                F.col("b.n_copies") + F.coalesce(F.col("i.n_copies"), F.lit(0))
            ).alias("n_copies"),
        )
    )


def migrate_null_digest_rows(index: DataFrame) -> DataFrame:
    """One-off migration of a digest index persisted BEFORE the digest
    was made total (round 11: NULL text now digests as ``md5('')``): a
    pre-change index carries one NULL ``content_hash`` row that the
    total-digest equality joins and the last-writer-wins fold can never
    match or supersede — NULL-text docs would be re-counted from zero
    under ``md5('')`` while the stale NULL-keyed row reports forever
    (round-12 advice). Rewrites the NULL row to the empty-string digest,
    merging with an existing ``md5('')`` row under ``exact_dedup``'s own
    semantics (min rep id, summed copies).

    Scale shape: only the two affected keys (NULL and ``md5('')``) are
    re-aggregated — a scan-side filter splits them out (≤2 rows through
    the aggregate) and every other row passes through untouched; no
    corpus-wide shuffle. Apply before resuming ingest, then persist
    (:func:`spark_iforest_spark.streaming.migrate_null_digest_index`
    does the read-rewrite-swap for a persisted index directory)."""
    empty = F.md5(F.lit(""))
    affected = F.col("content_hash").isNull() | (F.col("content_hash") == empty)
    merged = (
        index.where(affected)
        .groupBy(empty.alias("content_hash"))
        .agg(
            F.min("rep_doc_id").alias("rep_doc_id"),
            F.sum("n_copies").cast("long").alias("n_copies"),
        )
    )
    return index.where(~affected).unionByName(merged)


def _hashed_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(did, shset array<long>) — distinct word n-grams hashed JVM-side.

    The token split is projected before the shingle expression (round
    13): word_shingles slices the token array inside a HOF lambda, and an
    inline tokens() there re-evaluates the regex split per element —
    O(tokens²) per doc, measured 12× slower at 480-token docs."""
    from spark_iforest_spark.functions import memo_expr

    shset = memo_expr(
        ("hashed_shingle_set", n),
        lambda: F.transform(
            word_shingles(F.col("_toks"), n), lambda s: F.xxhash64(s)
        ),
    )
    return docs.select(
        F.col(id_col).alias("did"), tokens(F.col(text_col)).alias("_toks")
    ).select("did", shset.alias("shset"))


def _shingle_rows(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(did, sh) — exploded hashed-shingle rows, exploding the shingle
    expression INLINE (round 13): exploding a NAMED array column lets
    InferFiltersFromGenerate add ``size(col) > 0 AND isnotnull(col)``,
    and filter pushdown re-inlines the aliased tokenize→shingle→hash
    chain through the projections into the scan filter — with the token
    split back inline inside the HOF lambda, i.e. the O(tokens²)
    re-evaluation the projection existed to prevent, paid once more per
    row (measured 13× at 480-token docs). With the generator input left
    as an expression the rule skips inference (non-cheap input) and the
    chain runs exactly once."""
    from spark_iforest_spark.functions import memo_expr

    exploded = memo_expr(
        ("hashed_shingle_rows", n),
        lambda: F.explode(
            F.transform(
                word_shingles(F.col("_toks"), n), lambda s: F.xxhash64(s)
            )
        ),
    )
    return docs.select(
        F.col(id_col).alias("did"), tokens(F.col(text_col)).alias("_toks")
    ).select("did", exploded.alias("sh"))


def _md5_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(did, shset array<long>) — distinct word n-grams hashed to the first
    64 bits of their md5, assembled as ``(hi32 << 32) | lo32`` from two
    ``conv(hex, 16, 10)`` parses (conv output fits a signed long per half;
    the shift wraps to the signed reinterpretation of the u64).

    md5 instead of xxhash64 deliberately: simhash's output VALUES depend on
    the hash bit patterns (unlike Jaccard, which is hash-invariant), and md5
    is the one 64-bit-prefixable hash both Spark and DuckDB implement
    identically — it is what makes the ``dedup_simhash`` gate fully
    value-checkable by the external oracle. Jaccard-based operators keep the
    cheaper xxhash64."""
    def _h64(s: F.Column) -> F.Column:
        md = F.md5(s)
        hi = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)

    from spark_iforest_spark.functions import memo_expr

    shset = memo_expr(
        ("md5_shingle_set", n),
        lambda: F.transform(word_shingles(F.col("_toks"), n), _h64),
    )
    return docs.select(
        F.col(id_col).alias("did"), tokens(F.col(text_col)).alias("_toks")
    ).select("did", shset.alias("shset"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index self-join.

    Returns (doc_a, doc_b, jaccard) for doc_a < doc_b and jaccard >= threshold.
    ``max_shingle_df`` (off by default, to preserve exact semantics) drops
    shingles appearing in more than that many docs before the join — the
    standard skew guard for boilerplate shingles at corpus scale.
    """
    counts = _ngram_pair_counts(docs, id_col, text_col, n, max_shingle_df)
    jac = F.round(
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
    )
    return counts.select("doc_a", "doc_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def _ngram_pair_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """Shared inverted-index core of the exact n-gram pair family:
    (doc_a, doc_b, inter, sz_a, sz_b) for doc_a < doc_b with inter >= 1."""
    sh = _shingle_rows(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").count().where(F.col("count") > max_shingle_df).select("sh")
        # no forced broadcast: the |rows|/cap bound on the hot set GROWS
        # with the corpus, so at 100 TB it can exceed the 8 GB broadcast
        # limit — let AQE pick broadcast when runtime stats say it's small
        sh = sh.join(hot, "sh", "left_anti")
    # sh feeds three plan branches (both self-join sides + sizes):
    # localCheckpoint so tokenize→shingle→hash→explode runs once, not three
    # times. Bounded: Σ|shingle| rows × 16 B, spillable; same
    # reclaim/fault-tolerance tradeoff as minhash_lsh_pairs' signatures.
    sh = snapshot(sh, eager=False)
    sizes = sh.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.did"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.did"))
        .select(
            "doc_a", "doc_b", "inter",
            F.col("sa.sz").alias("sz_a"), F.col("sb.sz").alias("sz_b"),
        )
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup pairs by n-gram set containment
    C(X→Y) = |X∩Y| / |X| — the quote/boilerplate/wrapper detector:
    a short doc fully quoted inside a long one has jaccard ≈ |short|/|long|
    (invisible to a jaccard threshold) but containment ≈ 1.

    Returns (doc_a, doc_b, containment_a, containment_b, jaccard) for
    doc_a < doc_b where max(containment_a, containment_b) >= threshold;
    containment_a is the fraction of doc_a's shingles inside doc_b.
    Same inverted-index core, skew guard, and scale shape as
    :func:`ngram_jaccard_pairs` (one snapshotted explode, hash-keyed
    self-join bounded by shared-shingle volume).
    """
    counts = _ngram_pair_counts(docs, id_col, text_col, n, max_shingle_df)
    c_a = F.round(F.col("inter") / F.col("sz_a"), 6)
    c_b = F.round(F.col("inter") / F.col("sz_b"), 6)
    jac = F.round(
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
    )
    return (
        counts.select(
            "doc_a", "doc_b",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
            jac.alias("jaccard"),
        )
        .where(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= float(threshold)
        )
    )


def shingle_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(did, sh, n) — the persistable inverted shingle index behind
    :func:`ngram_jaccard_pairs_incremental`: one row per (doc, distinct
    hashed word n-gram), xxhash64 digests only, never shingle text. Per-
    doc shingle-set sizes are derivable (groupBy did), so no second
    artifact is needed. The shingle order ``n`` is RECORDED per the
    substr-index convention: indexes at different n key incompatible
    digest spaces, and merge/apply verify it instead of silently joining
    garbage. Doc-disjoint shard indexes merge with
    :func:`merge_shingle_indexes` (plain union — rows are per-doc)."""
    return _shingle_rows(docs, id_col, text_col, n).withColumn(
        "n", F.lit(int(n))
    )


def _assert_index_param(
    index: DataFrame, col: str, expected: int | None, who: str
) -> None:
    """Shared recorded-parameter check (substr window / shingle n): one
    min/max aggregate; artifacts lacking the column pass unchecked
    (pre-recording artifacts — contract rests on the caller)."""
    if col not in index.columns:
        return
    row = index.select(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    if row["lo"] is None:
        return
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"{who}: index mixes {col} values {row['lo']} and {row['hi']} — "
            f"indexes are only mergeable/applicable at one {col}"
        )
    if expected is not None and row["lo"] != int(expected):
        raise ValueError(
            f"{who}: index was built at {col}={row['lo']}, "
            f"called with {col}={int(expected)}"
        )


def merge_shingle_indexes(
    *indexes: DataFrame, verify_n: bool = True
) -> DataFrame:
    """Fold doc-disjoint :func:`shingle_index` artifacts into one — rows
    are per-(doc, shingle), so the fold is a plain union; only the
    recorded shingle order is verified (mixed-n unions would key
    incompatible digest spaces). Re-ingested doc ids are the APPLY
    function's supersede problem (it anti-joins batch ids like the
    minhash family), not the merge's."""
    from functools import reduce

    # harmonize BEFORE the union (review fix): a mix of n-recording and
    # n-less artifacts used to throw a column-count AnalysisException in
    # unionByName before the tolerance check could run — the documented
    # tolerance was unreachable. Same posture as
    # merge_substr_window_indexes: all-recorded → verify; any legacy
    # n-less input → drop the recording and skip verification, WARNING
    # about it (round-10 advice): the output loses its recording, so
    # apply-time n verification is disabled downstream, and a recorded
    # index merged with a legacy index built at a DIFFERENT n would no
    # longer fail — the caller owns the n contract from here on.
    have_n = all("n" in ix.columns for ix in indexes)
    if not have_n and any("n" in ix.columns for ix in indexes):
        import warnings

        warnings.warn(
            "merge_shingle_indexes: merging n-recording and legacy n-less "
            "shingle indexes — dropping the n recording from the output. "
            "Mixed-n inputs can no longer be detected (here or at apply "
            "time); ensure every input was built at the same shingle "
            "order n.",
            stacklevel=2,
        )
    if not have_n:
        indexes = tuple(
            ix.drop("n") if "n" in ix.columns else ix for ix in indexes
        )
    merged = reduce(DataFrame.unionByName, indexes)
    if verify_n and have_n:
        _assert_index_param(merged, "n", None, "merge_shingle_indexes")
    return merged


def _jaccard_pairs_vs_index(
    batch_sh: DataFrame,
    corpus_sh: DataFrame,
    threshold: float,
    broadcast_batch: bool,
) -> DataFrame:
    """Exact batch-touching jaccard pairs from two exploded (did, sh)
    relations with disjoint id sets: (doc_a, doc_b, jaccard), doc_a <
    doc_b, jaccard >= threshold, restricted to pairs with >= 1 batch doc.

    Scale shape: the corpus index never shuffles whole — it is cut down
    twice by bounded probes (its rows sharing a batch shingle; then all
    rows of just the candidate dids, for exact set sizes) before any
    join that groups. Both probes broadcast the batch-derived key set by
    default; ``broadcast_batch=False`` falls back to shuffle semi-joins."""
    batch_sh = snapshot(batch_sh.select("did", "sh"), eager=False)
    bkeys = batch_sh.select("sh").distinct()
    if broadcast_batch:
        bkeys = F.broadcast(bkeys)
    # corpus rows on batch shingles: exactly the rows that can contribute
    # to a batch-touching intersection count
    shared = snapshot(
        corpus_sh.select("did", "sh").join(bkeys, "sh", "left_semi"),
        eager=False,
    )
    tagged = batch_sh.withColumn("b", F.lit(1)).unionByName(
        shared.withColumn("b", F.lit(0))
    )
    inter = (
        tagged.alias("a")
        .join(
            tagged.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.did") < F.col("b.did")),
        )
        # corpus-corpus collisions on a shared batch shingle are full-run
        # pairs too, but not batch-touching — the incremental contract
        # (and the already-indexed corpus run) owns them
        .where((F.col("a.b") == 1) | (F.col("b.b") == 1))
        .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cand_ids = shared.select("did").distinct()
    if broadcast_batch:
        cand_ids = F.broadcast(cand_ids)
    corpus_sizes = (
        corpus_sh.select("did", "sh")
        .join(cand_ids, "did", "left_semi")
        .groupBy("did")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    sizes = batch_sh.groupBy("did").agg(F.count(F.lit(1)).alias("sz")).unionByName(
        corpus_sizes
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


def ngram_jaccard_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
    verify_n: bool = True,
    batch_shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT-jaccard member of the incremental dedup family: emits the
    same (doc_a, doc_b, jaccard) relation as ``ngram_jaccard_pairs(old ∪
    new)`` RESTRICTED to pairs touching >= 1 new document (gate- and
    pytest-pinned), against a persisted :func:`shingle_index` — old
    corpus text is never re-read. This is the pair generator
    ``pretrain_curate``'s default near-dup stage needs to go
    incremental (minhash approximates; the default recipe is exact).

    Re-ingest is superseded like the minhash twin: a batch id already in
    the index replaces its indexed rows (anti-join); pass
    ``assume_disjoint_ids=True`` to skip that probe for known-new crawl
    ids. The recorded shingle order is verified (``verify_n=False``
    skips the aggregate). No ``max_shingle_df`` here by design: the skew
    cap changes every doc's effective set size, so exactness would need
    corpus-wide document frequencies per batch — at the scale where the
    cap matters, use the minhash family (its incremental twin has the
    documented band-bucket bound) or keep a (sh, df) side artifact and
    cap offline.

    Scale: per-batch work only — batch shingles hash/explode once; the
    corpus-sized index is probed twice through batch-derived semi-joins
    (shingle keys, then candidate dids) and never shuffles whole.
    ``batch_shingles`` (optional) supplies ``new_docs``' already-exploded
    (did, sh) rows — e.g. the :func:`shingle_index` relation a curation
    loop builds for its state fold anyway; extra columns are ignored —
    so the hash/explode runs once per batch instead of twice. MUST be
    derived from ``new_docs`` at this same ``n`` (recorded-n artifacts
    are verified like the index)."""
    if verify_n:
        _assert_index_param(index, "n", n, "ngram_jaccard_pairs_incremental")
    if batch_shingles is not None:
        if verify_n:
            _assert_index_param(
                batch_shingles, "n", n, "ngram_jaccard_pairs_incremental"
            )
        batch_sh = batch_shingles.select("did", "sh")
    else:
        batch_sh = _shingle_rows(new_docs, id_col, text_col, n)
    fresh = index.select("did", "sh")
    if not assume_disjoint_ids:
        batch_ids = new_docs.select(F.col(id_col).alias("did")).distinct()
        if broadcast_batch:
            batch_ids = F.broadcast(batch_ids)
        fresh = fresh.join(batch_ids, "did", "left_anti")
    return _jaccard_pairs_vs_index(batch_sh, fresh, threshold, broadcast_batch)


def _bucket_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any (band, bucket)."""
    l, r = buckets.alias("l"), buckets.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .select(F.col("l.did").alias("doc_a"), F.col("r.did").alias("doc_b"))
        .distinct()
    )


def _signature_fn(num_perms: int, keep_shset: bool):
    """mapInPandas body computing the (perms,)-long MinHash signature per
    document as one vectorized universal-hash matrix op. ``keep_shset``
    carries the hashed shingle set through for the persistable index (it is
    what makes exact verification possible without re-reading the corpus)."""
    a_co, b_co = _minhash_coeffs(num_perms)

    def signatures(it):
        au = a_co.astype(np.uint64)[:, None]
        bu = b_co.astype(np.uint64)[:, None]
        af, bf = au.ravel(), bu.ravel()
        prime = np.uint64(_MINHASH_PRIME)
        for pdf in it:
            shsets = [np.asarray(s, dtype=np.int64) for s in pdf["shset"]]
            lens = np.asarray([len(s) for s in shsets], dtype=np.int64)
            if len(shsets) and (lens > 0).all():
                # batch-vectorized path (round 6, measured ~25% faster than
                # the per-doc matrix): ONE concatenated shingle vector, per
                # permutation a whole-batch hash + segmented min
                # (np.minimum.reduceat at doc offsets) — numpy call count
                # becomes O(perms) per batch instead of O(docs). Working
                # set stays one batch-total vector (~MBs), not a
                # (perms × total) matrix (measured slower — page churn).
                total = np.concatenate(shsets).astype(np.uint64) % prime
                offs = np.zeros(len(shsets), dtype=np.int64)
                np.cumsum(lens[:-1], out=offs[1:])
                sig_m = np.empty((num_perms, len(shsets)), dtype=np.uint64)
                for i in range(num_perms):
                    h = (af[i] * total + bf[i]) % prime
                    sig_m[i] = np.minimum.reduceat(h, offs)
                out_sig = [
                    row.astype(np.int64).tolist() for row in sig_m.T
                ]
            else:
                # a zero-length shingle set (contract-violating input)
                # would corrupt reduceat segments — per-doc fallback
                out_sig = []
                for shset in shsets:
                    base = shset.astype(np.uint64) % prime
                    sig = ((au * base[None, :] + bu) % prime).min(axis=1)
                    out_sig.append(sig.astype(np.int64).tolist())
            out = {"did": list(pdf["did"]), "sig": out_sig}
            if keep_shset:
                out["shset"] = list(pdf["shset"])
            yield pd.DataFrame(out)

    return signatures


def _band_table(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(did, band, bucket) — xxhash64 over each contiguous signature slice,
    derived JVM-side so the Python pass runs once per document."""
    return sigs.select(
        "did",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice(F.col("sig"), band * rows + 1, rows))
                    for band in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perms: int = _MINHASH_PERMS,
) -> DataFrame:
    """Persistable per-document MinHash index: ``(did, sig, shset)``.

    Write this relation to parquet once per corpus snapshot; incremental
    dedup of each new crawl batch (``minhash_lsh_pairs_incremental``) then
    runs WITHOUT re-reading or re-tokenizing the old corpus — the index
    carries everything both candidate generation (``sig``) and exact
    Jaccard verification (``shset``) need. Signatures use the module's
    fixed-seed universal-hash family, so an index built today and a batch
    signed next month are band-compatible by construction.

    Size: 128×8 B signature + ~8 B per distinct shingle per doc — the
    shingle sets dominate and are the price of EXACT verification against
    a corpus whose text you no longer want to scan; droppable if estimate
    -only dedup suffices (then verify joins would need the raw text again).
    """
    shs = _hashed_shingles(docs, id_col, text_col, n)
    return shs.mapInPandas(
        _signature_fn(num_perms, keep_shset=True),
        schema="did long, sig array<long>, shset array<long>",
    )


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_perms: int = _MINHASH_PERMS,
    bands: int = 16,
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
) -> DataFrame:
    """Dedup a NEW batch against an already-indexed corpus — the 100 TB
    operating mode, where re-running minhash over the full corpus for every
    incoming crawl is a non-starter.

    Emits the same ``(doc_a, doc_b, jaccard)`` relation as a full
    ``minhash_lsh_pairs`` over old ∪ new RESTRICTED to pairs touching at
    least one new document (equality pytest-pinned on a split corpus) —
    which is exactly the increment: old-old pairs were emitted when the old
    corpus was indexed. ``index`` is a ``minhash_index`` relation (same
    num_perms); the old corpus TEXT is never read.

    Scale shape: per-batch work is |batch| signatures + band-bucket
    collisions touching the batch. With ``broadcast_batch`` (default) the
    batch's band table broadcasts (bands×|batch| rows — a million-doc batch
    is ~256 MB, inside the 8 GB limit), so the corpus-sized index is never
    shuffled for candidate generation — each index partition streams past
    the broadcast hash table. For batch sizes where that no longer holds,
    pass False: the join falls back to a merge-hinted sort-merge (both
    sides shuffle on (band, bucket); linear, AQE-skew-handled, never
    broadcasts the corpus — plan-tested).
    """
    rows = num_perms // bands
    # the batch index feeds banding + estimate/verify joins: one Python
    # signature pass, then reuse (same snapshot rationale as the full path)
    new_idx = snapshot(
        minhash_index(new_docs, id_col, text_col, n, num_perms), eager=False
    )
    # idempotent re-ingest (round-6 advice fix): a doc id arriving again
    # supersedes its indexed row — without the anti-join it would appear
    # TWICE in `full` and duplicate/inflate verify rows. Batch ids are
    # batch-sized, so the anti-join broadcasts them; the probe runs on all
    # THREE index passes (bands + both verify sides — ReuseExchange dedups
    # the build, not the probes), a measured ~15% of the per-batch time
    # (SCALE.md round 7). ``assume_disjoint_ids`` skips it for the normal
    # crawl case where batch ids are known-new (disjoint ids make it a
    # no-op anyway); leave False when re-ingesting or unsure.
    fresh = index.select("did", "sig", "shset")
    if not assume_disjoint_ids:
        batch_ids = new_idx.select("did")
        if broadcast_batch:
            batch_ids = F.broadcast(batch_ids)
        fresh = fresh.join(batch_ids, "did", "left_anti")
    full = fresh.unionByName(new_idx)

    batch_bands = _band_table(new_idx, bands, rows)
    if broadcast_batch:
        batch_bands = F.broadcast(batch_bands)
    corpus_bands = _band_table(full, bands, rows)
    if not broadcast_batch:
        corpus_bands = corpus_bands.hint("merge")
    # one side is always the batch, so only batch-touching pairs are ever
    # generated; least/greatest + distinct folds the two orders a new-new
    # collision produces into one normalized pair
    cand = (
        batch_bands.alias("l")
        .join(
            corpus_bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") != F.col("r.did")),
        )
        .select(
            F.least(F.col("l.did"), F.col("r.did")).alias("doc_a"),
            F.greatest(F.col("l.did"), F.col("r.did")).alias("doc_b"),
        )
        .distinct()
    )
    # estimate-prefilter and exact verify in ONE pass over the index joins:
    # the index rows already carry shset, so verification needs no second
    # join against document text (same margin/threshold math as the full
    # path — required for the restricted-equality contract). The index side
    # is corpus-sized: merge hints, never broadcast (plan-tested).
    est_matches = F.size(
        F.filter(
            F.zip_with(F.col("sa.sig"), F.col("sb.sig"), lambda p, q: p == q),
            lambda eq: eq,
        )
    )
    inter = F.size(F.array_intersect(F.col("sa.shset"), F.col("sb.shset")))
    union = F.size(F.col("sa.shset")) + F.size(F.col("sb.shset")) - inter
    jac = F.round(inter / union, 6)
    sa, sb = full, full
    if broadcast_batch:
        # candidate ids are batch-collision-bounded — the same size regime
        # the broadcast_batch contract already assumes for the band table —
        # so cut the corpus-sized index down to candidate rows with a
        # BROADCAST semi-join BEFORE the verify joins (round 13; guide
        # §3.2 shape). Previously both merge joins shuffled the ENTIRE
        # index per batch; now the index is only scanned, and the sort-
        # merge joins move candidate-scale rows. cand is snapshotted: it
        # feeds the id probe and the join, and lazy it would re-run the
        # band-collision join per consumer.
        cand = snapshot(cand, eager=False)
        cand_ids = F.broadcast(
            cand.select(F.col("doc_a").alias("did"))
            .unionByName(cand.select(F.col("doc_b").alias("did")))
            .distinct()
        )
        sa = sb = full.join(cand_ids, "did", "left_semi")
    return (
        cand.join(sa.alias("sa").hint("merge"), F.col("doc_a") == F.col("sa.did"))
        .join(sb.alias("sb").hint("merge"), F.col("doc_b") == F.col("sb.did"))
        .where(est_matches / num_perms >= threshold - 0.12)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_perms: int = _MINHASH_PERMS,
    bands: int = 16,
) -> DataFrame:
    """MinHash + banded-LSH near-dup pairs, exact-verified.

    hashed shingles → 128 minhashes (one numpy matrix op per doc) → 16
    bands × 8 rows → bucket-join → distinct candidates → signature-estimate
    prefilter → exact-Jaccard verify ≥ threshold.

    Band shape tradeoff: r=8 rows/band makes a bucket collision between
    UNRELATED docs j^8 (vs j^4 at r=4) — on corpora with a small vocabulary
    (high baseline jaccard between random docs) that is the difference
    between near-linear and quadratic candidate volume. Recall: miss
    probability is (1-j^8)^16 ≈ 1e-4 at j=0.9 and 2e-6 at j=0.93; at
    exactly j=0.8 it is ~5% — callers screening at the 0.8 knee on corpora
    where that margin matters should pass bands=32 (r=4, miss 5e-8) and pay
    the candidate volume.
    """
    rows = num_perms // bands
    shs = _hashed_shingles(docs, id_col, text_col, n)
    # sigs feeds three plan branches (banding + both sides of the
    # estimate/verify join): localCheckpoint so the Python signature pass
    # runs once, not three times. It CARRIES the hashed shingle sets
    # (round 13): the exact verify used to rebuild them from the raw text
    # — two more full corpus scans plus two tokenize/shingle/hash passes
    # and two extra doc-keyed joins, at every scale — when the signature
    # pass had already computed exactly these sets (the same economics
    # minhash_index documents for the incremental path). Size: signature
    # 128×8 B/doc plus ~8 B per distinct shingle — the ngram-snapshot
    # bound, spillable. Checkpoint (not persist): ContextCleaner reclaims
    # the blocks when the returned DataFrame is dropped — a persist()
    # here would pin executor memory with no unpersist hook in a lazy
    # API. (Not fault-tolerant: executor loss fails the query instead of
    # recomputing; fine for a single bounded job, see dup_clusters note.)
    sigs = snapshot(
        shs.mapInPandas(
            _signature_fn(num_perms, keep_shset=True),
            schema="did long, sig array<long>, shset array<long>",
        ),
        eager=False,
    )
    # band buckets derived JVM-side: xxhash64 over each signature slice
    buckets = _band_table(sigs, bands, rows)
    candidates = _bucket_pairs(buckets)
    # ONE pair of joins serves both the minhash Jaccard ESTIMATE
    # prefilter (signature agreement rate; margin 0.12 ≈ 3.4 sigma of the
    # estimator's std at j≈threshold, so true pairs survive w.h.p. —
    # evaluated FIRST, below the exact-jaccard projection, so bucket
    # collisions on low-similarity corpora never pay the set intersect)
    # and the exact verify over the carried shingle sets — identical math
    # to ngram_jaccard_pairs, so verified output stays oracle-comparable.
    #
    # Join strategy: sigs is CORPUS-SIZED (one row per document) — it must
    # never broadcast (the 1 GB/billion-docs table would have to fit on the
    # driver and every executor). The merge hint pins a sort-merge join:
    # both sides shuffle on did, which scales linearly and lets AQE handle
    # skew. Plan-tested in test_dedup.py (no broadcast of the sig pass).
    est_matches = F.size(
        F.filter(
            F.zip_with(F.col("sa.sig"), F.col("sb.sig"), lambda p, q: p == q),
            lambda eq: eq,
        )
    )
    inter = F.size(F.array_intersect(F.col("sa.shset"), F.col("sb.shset")))
    union = F.size(F.col("sa.shset")) + F.size(F.col("sb.shset")) - inter
    jac = F.round(inter / union, 6)
    return (
        candidates.join(sigs.alias("sa").hint("merge"), F.col("doc_a") == F.col("sa.did"))
        .join(sigs.alias("sb").hint("merge"), F.col("doc_b") == F.col("sb.did"))
        .where(est_matches / num_perms >= threshold - 0.12)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _band_buckets(sim: F.Column, num_bands: int, band_bits: int) -> F.Column:
    """Array of ``num_bands`` bucket values: contiguous ``band_bits``-bit
    slices of a signed-64 simhash. Extraction is shift + unsigned MASK —
    a signed ``%`` would give band 0 (shift 0, sign intact) a negative
    bucket for negative sims, so a mixed-sign pair agreeing only on the low
    bits would land in different buckets and break the pigeonhole recall
    guarantee."""
    mask = F.lit((1 << band_bits) - 1)
    return F.array(
        *[
            F.shiftrightunsigned(sim, i * band_bits).bitwiseAND(mask)
            for i in range(num_bands)
        ]
    )


def _simhash_fn(keep_shset: bool):
    """mapInPandas body computing the 64-bit simhash sketch per document
    (±1 bit-accumulator over the hashed shingle set). ``keep_shset``
    carries the shingles through for the persistable index, mirroring
    ``_signature_fn``."""

    def simhash(it):
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in it:
            out_ids, out_sim = [], []
            for did, shset in zip(pdf["did"], pdf["shset"]):
                h = np.asarray(shset, dtype=np.int64).astype(np.uint64)
                # (shingles, 64) bit matrix summed to the ±1 accumulator
                bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
                acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sh64 = ((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
                out_ids.append(did)
                out_sim.append(int(np.int64(sh64)))  # reinterpret as signed
            out = {"did": out_ids, "sim": out_sim}
            if keep_shset:
                out["shset"] = list(pdf["shset"])
            yield pd.DataFrame(out)

    return simhash


def simhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingle_hash: str = "md5",
) -> DataFrame:
    """Persistable per-document SimHash index: ``(did, sim, shset)`` —
    the simhash twin of ``minhash_index`` for the incremental operating
    mode. The 8-byte sketch powers candidate banding; the shingle set is
    what makes exact-Jaccard verification possible without re-reading the
    old corpus text."""
    if shingle_hash not in ("md5", "xxhash64"):
        raise ValueError("shingle_hash must be 'md5' or 'xxhash64'")
    mk_shingles = _md5_shingles if shingle_hash == "md5" else _hashed_shingles
    return mk_shingles(docs, id_col, text_col, n).mapInPandas(
        _simhash_fn(keep_shset=True),
        schema="did long, sim long, shset array<long>",
    )


def simhash_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_hamming: int = 3,
    shingle_hash: str = "md5",
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
) -> DataFrame:
    """SimHash-dedup a NEW batch against a ``simhash_index`` — same
    join shape and contracts as ``minhash_lsh_pairs_incremental``: emits
    the full-run ``(doc_a, doc_b, hamming, jaccard)`` relation restricted
    to pairs touching a new document (equality pytest-pinned), candidate
    generation never shuffles or broadcasts the corpus index
    (``broadcast_batch`` broadcasts only the batch band table; False pins
    a merge join), and verification runs off index shingle sets — old
    text is never re-read."""
    num_bands = max_hamming + 1
    band_bits = 64 // num_bands
    new_idx = snapshot(
        simhash_index(new_docs, id_col, text_col, n, shingle_hash), eager=False
    )
    # idempotent re-ingest: batch ids supersede their indexed rows; skip
    # with assume_disjoint_ids (see minhash_lsh_pairs_incremental)
    fresh = index.select("did", "sim", "shset")
    if not assume_disjoint_ids:
        batch_ids = new_idx.select("did")
        if broadcast_batch:
            batch_ids = F.broadcast(batch_ids)
        fresh = fresh.join(batch_ids, "did", "left_anti")
    full = fresh.unionByName(new_idx)

    def band_tbl(idx: DataFrame) -> DataFrame:
        return idx.select(
            "did",
            "sim",
            F.posexplode(
                _band_buckets(F.col("sim"), num_bands, band_bits)
            ).alias("band", "bucket"),
        )

    batch_bands = band_tbl(new_idx)
    corpus_bands = band_tbl(full)
    if broadcast_batch:
        batch_bands = F.broadcast(batch_bands)
    else:
        corpus_bands = corpus_bands.hint("merge")
    ham = F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim")))
    cand = (
        batch_bands.alias("l")
        .join(
            corpus_bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") != F.col("r.did")),
        )
        .where(ham <= max_hamming)
        .select(
            F.least(F.col("l.did"), F.col("r.did")).alias("doc_a"),
            F.greatest(F.col("l.did"), F.col("r.did")).alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa.shset"), F.col("sb.shset")))
    union = F.size(F.col("sa.shset")) + F.size(F.col("sb.shset")) - inter
    jac = F.round(inter / union, 6)
    return (
        cand.join(full.alias("sa").hint("merge"), F.col("doc_a") == F.col("sa.did"))
        .join(full.alias("sb").hint("merge"), F.col("doc_b") == F.col("sb.did"))
        .select("doc_a", "doc_b", "hamming", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_hamming: int = 3,
    shingle_hash: str = "md5",
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash) <= max_hamming, then
    exact-Jaccard >= threshold.

    Bands are sized so recall is EXACT by pigeonhole: max_hamming+1 bands
    means any pair within max_hamming shares at least one full band. 16-bit
    bands give 65k buckets per band, so candidate volume stays near-linear
    in true near-dups at any corpus size — this is the cheap high-similarity
    screen. Pairs with hamming above the bound are genuinely out of simhash's
    contract on short documents (the ±1 accumulator over ~1e2 shingles is
    noisy: empirically j=0.92 pairs can reach hamming 16/64), so this
    operator's output is defined by simhash semantics — not interchangeable
    with the exact-Jaccard relation like minhash_lsh_pairs' is.

    ``shingle_hash='md5'`` (default) hashes shingles via md5-64
    (``_md5_shingles``): the output values depend on the hash bits, and md5
    is reproducible in DuckDB, so the external oracle recomputes the full
    simhash → hamming → jaccard pipeline and value-checks this relation
    exactly (pigeonhole recall makes brute-force hamming<=max_hamming the
    same pair set as the banded join). ``shingle_hash='xxhash64'`` is the
    throughput option for production corpora (one codegen'd hash vs
    md5+2×conv per shingle) — statistically identical behavior, different
    concrete pair set, not externally value-checkable.
    """
    if shingle_hash not in ("md5", "xxhash64"):
        raise ValueError("shingle_hash must be 'md5' or 'xxhash64'")
    num_bands = max_hamming + 1
    band_bits = 64 // num_bands

    # sims feeds three plan branches (both sides of the band self-join +
    # the verify joins): localCheckpoint so the Python simhash pass runs
    # once, and CARRY the shingle sets (round 13) — the exact verify used
    # to rebuild them from the raw text via a second corpus scan +
    # tokenize/shingle/hash pass plus a candidates re-join, when the
    # sketch pass had already computed exactly these sets. Same economics
    # as minhash_lsh_pairs; simhash_pairs_incremental already verifies off
    # carried index shsets, so this aligns the full path with it. Jaccard
    # is hash-invariant (set overlap), so verifying over the md5-hashed
    # sets gives the same values the xxhash64 rebuild did — and it is the
    # basis the DuckDB oracle recomputes.
    mk_shingles = _md5_shingles if shingle_hash == "md5" else _hashed_shingles
    sims = snapshot(
        mk_shingles(docs, id_col, text_col, n).mapInPandas(
            _simhash_fn(keep_shset=True),
            schema="did long, sim long, shset array<long>",
        ),
        eager=False,
    )
    # band split JVM-side via posexplode: (band index, 16-bit bucket value);
    # shset deliberately NOT carried into the band table — the self-join
    # and its distinct move 3 ints per row, not shingle arrays.
    bands = sims.select(
        "did",
        "sim",
        F.posexplode(_band_buckets(F.col("sim"), num_bands, band_bits)).alias(
            "band", "bucket"
        ),
    )
    l, r = bands.alias("l"), bands.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .where(F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim"))) <= max_hamming)
        .select(
            F.col("l.did").alias("doc_a"),
            F.col("r.did").alias("doc_b"),
            F.bit_count(F.col("l.sim").bitwiseXOR(F.col("r.sim"))).alias("hamming"),
        )
        .distinct()
    )
    # exact-Jaccard verify off the carried sets — identical math to
    # ngram_jaccard_pairs. sims is corpus-sized: merge-hinted, never
    # broadcast (same contract as minhash_lsh_pairs, plan-tested there).
    inter = F.size(F.array_intersect(F.col("sa.shset"), F.col("sb.shset")))
    union = F.size(F.col("sa.shset")) + F.size(F.col("sb.shset")) - inter
    jac = F.round(inter / union, 6)
    return (
        candidates.join(
            sims.alias("sa").hint("merge"), F.col("doc_a") == F.col("sa.did")
        )
        .join(sims.alias("sb").hint("merge"), F.col("doc_b") == F.col("sb.did"))
        .select("doc_a", "doc_b", "hamming", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold, id_a < id_b.

    Exact O(n²) comparison (BroadcastNestedLoopJoin — Spark broadcasts the
    smaller side). Correctness baseline; at corpus scale use
    similarity.lsh_topk's bucketing to bound the join.
    """
    e = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _sign_lsh_tables(
    threshold: float, band_bits: int, target_miss: float, multi_probe: int = 0
) -> int:
    """Number of sign-LSH tables so a pair at cosine >= ``threshold`` is
    missed with probability <= ``target_miss``. A hyperplane agrees on the
    pair w.p. p = 1 - θ/π; with ``multi_probe`` the query also checks
    every bucket within Hamming distance p of its own, so a table finds
    the pair w.p. P = Σ_{i<=p} C(b,i)·p^(b-i)·(1-p)^i, and
    T = ceil(ln ε / ln(1-P)). At threshold 0.4, b=4: probe 0 → 81 tables,
    probe 1 → 19 — the ~4× corpus-index reduction multi-probe buys
    (probes multiply only the batch/query side)."""
    import math

    p = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    hit = sum(
        math.comb(band_bits, i) * p ** (band_bits - i) * (1.0 - p) ** i
        for i in range(min(multi_probe, band_bits) + 1)
    )
    if hit >= 1.0:
        return 1
    return max(1, math.ceil(math.log(target_miss) / math.log1p(-hit)))


def embedding_lsh_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    band_bits: int = 4,
    target_miss: float = 1e-6,
    dim: int = 64,
) -> DataFrame:
    """Bucketed embedding near-dup pairs: sign-LSH candidate generation +
    exact cosine verify. Same output relation as embedding_cosine_pairs
    (id_a < id_b, cos_sim >= threshold) without the O(n²) nested-loop join.

    The number of hash tables is SIZED FROM THE THRESHOLD so a qualifying
    pair is missed with probability <= ``target_miss``: a hyperplane agrees
    on a pair at angle θ w.p. p = 1-θ/π, a ``band_bits``-bit table w.p.
    p^b, so T = ceil(ln ε / ln(1-p^b)) tables. At threshold 0.9 that is
    ~18 tables (cheap, the realistic dedup regime); at 0.4 it is ~81 —
    the cost of recall at a low bar is explicit in the formula rather than
    hidden in a fixed parameter. Candidates join on (table, bucket) equality
    and the corpus re-joins by id via sort-merge (never broadcast).
    """
    from spark_iforest_spark.operators.similarity import _hyperplanes

    tables = _sign_lsh_tables(threshold, band_bits, target_miss)
    planes = _hyperplanes(dim, band_bits, tables)  # (tables, bits, dim)
    flat = planes.reshape(tables * band_bits, dim)
    pack = 1 << np.arange(band_bits, dtype=np.int64)

    def bucketize(it):
        for pdf in it:
            if not len(pdf):
                continue
            vecs = np.asarray(pdf["v"].to_list(), dtype=np.float64)
            bits = (vecs @ flat.T > 0).astype(np.int64)  # (n, T*b)
            sig = bits.reshape(len(vecs), tables, band_bits) @ pack  # (n, T)
            yield pd.DataFrame(
                {
                    "vid": np.repeat(pdf["vid"].to_numpy(), tables),
                    "table_id": np.tile(np.arange(tables, dtype=np.int64), len(vecs)),
                    "bucket": sig.reshape(-1),
                }
            )

    e = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    buckets = e.mapInPandas(bucketize, schema="vid long, table_id long, bucket long")
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table_id") == F.col("r.table_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"))
        .distinct()
    )
    cos = F.round(cosine(F.col("ea.v"), F.col("eb.v")), 6)
    return (
        cand.join(e.alias("ea").hint("merge"), F.col("id_a") == F.col("ea.vid"))
        .join(e.alias("eb").hint("merge"), F.col("id_b") == F.col("eb.vid"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def embedding_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    band_bits: int = 4,
    target_miss: float = 1e-6,
    dim: int = 64,
    multi_probe: int = 0,
) -> DataFrame:
    """Persistable sign-LSH embedding index: ``(vid, v, sig array<long>)``
    — one bucket per hash table, plus the vector for exact-cosine verify.
    The table count is sized from (threshold, band_bits, target_miss,
    multi_probe), so an index is bound to those parameters — persist them
    alongside it and pass the same values to
    ``embedding_lsh_pairs_incremental``. ``multi_probe`` > 0 (round 7)
    sizes the index for batches that will probe nearby buckets too: at the
    default threshold the index carries ~4x fewer tables for the same
    miss bound — at 100 TB the near-dup index is the big artifact, and
    the probe expansion rides the (small) batch side instead."""
    from spark_iforest_spark.operators.similarity import _hyperplanes

    tables = _sign_lsh_tables(threshold, band_bits, target_miss, multi_probe)
    planes = _hyperplanes(dim, band_bits, tables)
    flat = planes.reshape(tables * band_bits, dim)
    pack = 1 << np.arange(band_bits, dtype=np.int64)

    def index_rows(it):
        for pdf in it:
            if not len(pdf):
                continue
            vecs = np.asarray(pdf["v"].to_list(), dtype=np.float64)
            bits = (vecs @ flat.T > 0).astype(np.int64)
            sig = bits.reshape(len(vecs), tables, band_bits) @ pack
            yield pd.DataFrame(
                {"vid": pdf["vid"], "v": pdf["v"], "sig": list(sig)}
            )

    return emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).mapInPandas(index_rows, schema="vid long, v array<double>, sig array<long>")


def embedding_lsh_pairs_incremental(
    new_emb: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    band_bits: int = 4,
    target_miss: float = 1e-6,
    dim: int = 64,
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
    multi_probe: int = 0,
    validate_index: bool = True,
) -> DataFrame:
    """Embedding-dedup a NEW batch of vectors against an
    ``embedding_index`` — the third member of the incremental family,
    same contracts as the minhash/simhash twins: the full
    ``embedding_lsh_pairs`` relation restricted to pairs touching a new
    vector (equality pytest-pinned; the hyperplanes are seeded, so batch
    signatures are table-compatible with the stored ones by
    construction), batch-side-only broadcast for the bucket join, exact
    cosine verify off index vectors — old vectors never re-read from the
    corpus table.

    ``multi_probe`` (round 7) must match the value the index was built
    with: the BATCH band table additionally probes every bucket within
    Hamming distance ``multi_probe`` in each table (a JVM-side explode of
    Σ C(bits,i) XOR masks — no extra Python pass), buying the same miss
    bound from ~4x fewer index tables at the default threshold. The
    expansion multiplies only the batch side; with ``broadcast_batch`` it
    rides the broadcast, and the candidate ``distinct`` + exact-cosine
    verify keep the output relation contract unchanged (recall-equality
    pytest-pinned against the probe-0 path)."""
    # fail fast on a parameter/index mismatch (round-7 review fix): an
    # index built for a different (threshold, band_bits, target_miss,
    # multi_probe) has a different table count, and scoring against it
    # silently destroys the miss bound (e.g. probing a 19-table
    # multi_probe=1 index with multi_probe=0 raises per-pair miss from
    # 1e-6 to ~4%). COST: first() is a real (one-row-limited) Spark job —
    # trivial against a persisted parquet index (the lifecycle this
    # function exists for); callers composing an UNMATERIALIZED index
    # inline who want pure-lazy construction pass validate_index=False.
    # The check is necessary-not-sufficient (distinct param sets can
    # imply equal table counts), but it catches the realistic mistakes
    # (wrong multi_probe / threshold generation).
    if validate_index:
        expected_tables = _sign_lsh_tables(
            threshold, band_bits, target_miss, multi_probe
        )
        first_sig = index.select(F.size("sig").alias("t")).first()
        if first_sig is not None and first_sig["t"] != expected_tables:
            raise ValueError(
                f"index has {first_sig['t']} tables but (threshold={threshold}, "
                f"band_bits={band_bits}, target_miss={target_miss}, "
                f"multi_probe={multi_probe}) implies {expected_tables}: pass the "
                "parameters the index was built with (persist them alongside it)"
            )
    new_idx = snapshot(
        embedding_index(
            new_emb, id_col, vec_col, threshold, band_bits, target_miss, dim,
            multi_probe,
        ),
        eager=False,
    )
    # idempotent re-ingest: batch ids supersede their indexed rows; skip
    # with assume_disjoint_ids (see minhash_lsh_pairs_incremental)
    fresh = index.select("vid", "v", "sig")
    if not assume_disjoint_ids:
        batch_ids = new_idx.select("vid")
        if broadcast_batch:
            batch_ids = F.broadcast(batch_ids)
        fresh = fresh.join(batch_ids, "vid", "left_anti")
    full = fresh.unionByName(new_idx)

    def band_tbl(idx: DataFrame, probe: bool = False) -> DataFrame:
        t = idx.select(
            "vid", F.posexplode(F.col("sig")).alias("table_id", "bucket")
        )
        if probe and multi_probe > 0:
            from spark_iforest_spark.operators.similarity import _probe_masks

            masks = F.array(
                *[F.lit(m) for m in _probe_masks(band_bits, multi_probe)]
            )
            t = t.select(
                "vid",
                "table_id",
                F.explode(
                    F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m))
                ).alias("bucket"),
            )
        return t

    batch_bands = band_tbl(new_idx, probe=True)
    corpus_bands = band_tbl(full)
    if broadcast_batch:
        batch_bands = F.broadcast(batch_bands)
    else:
        corpus_bands = corpus_bands.hint("merge")
    cand = (
        batch_bands.alias("l")
        .join(
            corpus_bands.alias("r"),
            (F.col("l.table_id") == F.col("r.table_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vid") != F.col("r.vid")),
        )
        .select(
            F.least(F.col("l.vid"), F.col("r.vid")).alias("id_a"),
            F.greatest(F.col("l.vid"), F.col("r.vid")).alias("id_b"),
        )
        .distinct()
    )
    cos = F.round(cosine(F.col("ea.v"), F.col("eb.v")), 6)
    return (
        cand.join(full.alias("ea").hint("merge"), F.col("id_a") == F.col("ea.vid"))
        .join(full.alias("eb").hint("merge"), F.col("id_b") == F.col("eb.vid"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    window: int = 8,
    min_shared: int = 2,
    max_fingerprint_df: int | None = None,
    gram_hash: str = "md5",
) -> DataFrame:
    """MOSS-style near-dup pairs from shared winnowing fingerprints:
    (doc_a, doc_b, n_shared) for pairs sharing >= min_shared fingerprints.

    Catches SUBSTRING-level duplication (shared passages >= k+window-1
    chars) that token-shingle Jaccard misses when the surrounding documents
    differ. Same inverted-index shape as ngram_jaccard_pairs: join volume
    is Σ df(fingerprint)² — ``max_fingerprint_df`` caps hot (boilerplate)
    fingerprints, the standard guard at corpus scale; ``gram_hash=
    'xxhash64'`` switches to the int64 fast path (see winnow_fingerprints).
    """
    from spark_iforest_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(docs, id_col, text_col, k, window, gram_hash)
    if max_fingerprint_df is not None:
        hot = (
            fps.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_fingerprint_df)
            .select("fingerprint")
        )
        # no forced broadcast (see ngram_jaccard_pairs): the hot-set bound
        # grows with the corpus — AQE decides from runtime size
        fps = fps.join(hot, "fingerprint", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every document in
    a duplicate cluster mapped to the cluster's minimum doc id.

    Each round does TWO steps (Shiloach–Vishkin shape, the round-6 fix for
    the old one-hop propagation that cost O(diameter) rounds):

    * **hook** — every node adopts the min label among itself and its
      neighbors' labels (one edges⋈labels join + groupBy-min);
    * **jump** — pointer doubling: every node's label is replaced by its
      label's label (one labels⋈labels self-join), so the distance a
      minimum has travelled roughly DOUBLES per round instead of growing
      by one. On a path graph of length L convergence takes O(log L)
      rounds (pytest-pinned on a 256-node path: ≤12 rounds, vs 255 for
      pure propagation) — a boilerplate chain at corpus scale costs a
      logarithmic, not linear, number of join rounds.

    The fixed point is unchanged: label(v) = min doc id of v's component
    (jumping only follows min-label pointers already established by
    hooks, so labels always name a node in the same component, and the
    component minimum is stable under both steps). The last completed
    run's round count is exposed as ``dup_clusters.last_rounds`` for
    tests and ops telemetry.

    Both the edge table and each round's label table are snapshot'd
    (checkpoint.snapshot): without truncation the logical plan doubles per
    round and planning stalls long before data does. TRADEOFF:
    localCheckpoint blocks are not fault-tolerant — an executor loss
    mid-propagation fails the job (cache() would recompute). On clusters
    where that risk is material, set a reliable checkpoint dir
    (spark.sparkContext.setCheckpointDir) and the reliableCheckpoint conf:
    same plan-truncation, HDFS-backed recovery.

    ``pairs`` injects any (doc_a, doc_b) near-dup relation as the edge
    source; by default edges come from ngram_jaccard_pairs. At corpus scale
    pass minhash_lsh_pairs(...) — same relation, near-linear candidates.

    Returns (doc_id, cluster_rep) for docs that have >= 1 near-duplicate.
    """
    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, id_col, text_col, n, threshold)
    labels = _connected_components(pairs.select("doc_a", "doc_b"))
    dup_clusters.last_rounds = _connected_components.last_rounds
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_rep"))


def _connected_components(pairs: DataFrame) -> DataFrame:
    """(node, label) fixed point of the hook + pointer-jump loop over the
    undirected (doc_a, doc_b) edge relation — the shared CC kernel behind
    ``dup_clusters`` and ``dup_clusters_incremental``."""
    # undirected edges, materialized once (also cuts the pair-generation
    # join out of every iteration's plan)
    edges = snapshot(
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
    )
    # empty-graph fast path (round 13): a well-deduped corpus batch often
    # yields ZERO near-dup pairs, and the loop below would still pay a
    # label snapshot plus one full hook+jump+convergence round on empty
    # relations (~6 driver-sequenced jobs). The emptiness probe is one
    # take(1) against the just-materialized edge snapshot — O(1) at any
    # scale — and the non-empty path is unchanged.
    if edges.isEmpty():
        _connected_components.last_rounds = 0
        return edges.select(
            F.col("doc_a").alias("node"), F.col("doc_a").alias("label")
        )
    labels = snapshot(
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    from spark_iforest_spark.functions import job_label

    rounds = 0
    while True:
        rounds += 1
        # hook: each node adopts the min label among itself and its
        # neighbors (labels are node ids, so min is well-defined). The
        # node's PREVIOUS label rides along as ``old`` (non-null exactly
        # once per node, from the self row; max() ignores nulls) so the
        # convergence check below is one scan of the round's snapshot
        # instead of a join of two label generations (round 13 — one
        # fewer shuffle join per round, same fixed point).
        neighbor_labels = (
            edges.join(labels, edges["doc_b"] == labels["node"])
            .select(
                F.col("doc_a").alias("node"),
                "label",
                F.lit(None).cast(_label_type(labels)).alias("old"),
            )
        )
        hooked = (
            labels.select("node", "label", F.col("label").alias("old"))
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        # jump: label <- label(label). A label always names a node that is
        # itself in the label table (labels are node ids of this component),
        # so the left join's miss branch only fires for root labels that
        # already point at themselves — coalesce keeps them. The jump side
        # is column-renamed (fresh expression ids) so the self-join
        # condition resolves unambiguously.
        jump_map = hooked.select(
            F.col("node").alias("jn"), F.col("label").alias("jl")
        )
        with job_label(labels.sparkSession, f"cc:round{rounds}"):
            new_labels = snapshot(
                hooked.join(jump_map, F.col("label") == F.col("jn"), "left").select(
                    "node", F.coalesce("jl", "label").alias("label"), "old"
                )
            )
            changed = new_labels.where(F.col("label") != F.col("old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    _connected_components.last_rounds = rounds
    return labels


def _label_type(labels: DataFrame):
    """DataType of the ``label`` column (doc-id typed; long for the synthetic
    corpora, string ids supported throughout the family)."""
    return labels.schema["label"].dataType


def resolve_clusters(
    docs: DataFrame,
    labels: DataFrame | None = None,
    quality: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collapse each duplicate cluster to its BEST member — what a
    curation pipeline actually does with ``dup_clusters`` output (keeping
    the min-id member would discard the cleanest copy whenever a
    truncated/mangled duplicate happens to have the smaller id).

    Returns one row per cluster: (cluster_rep, keep_doc_id, keep_quality,
    n_members), where the kept doc maximizes ``quality`` (ties break to
    the smallest id — fully deterministic; quality is the rounded
    composite from text.quality_score, or pass any (id, quality)
    relation: model probabilities from quality_model, token counts,
    recency...).

    Plan: labels ⋈ quality on id, then ONE map-side-combined aggregate
    per cluster using an ordered-struct max — max(struct(quality, -id,
    id)) — no window, no per-cluster sort, shuffle keyed by cluster_rep.
    At 100 TB the labels relation is the small dedup artifact, and the
    argmax never materializes member lists."""
    from spark_iforest_spark.operators.text import quality_score

    if labels is None:
        labels = dup_clusters(docs, id_col, text_col)
    if quality is None:
        # score CLUSTER MEMBERS only (round 13): the argmax never reads a
        # non-member's quality, and labels is the small dedup artifact —
        # semi-join it onto the corpus before the battery runs, so the
        # quality pass is member-proportional instead of corpus-sized
        # (at 100 TB the full-corpus battery here was the single largest
        # avoidable pass in drop_near_duplicates). Values are unchanged:
        # quality_score is row-local, so each member's score is identical.
        members = docs.join(labels.select(id_col), id_col, "left_semi")
        quality = quality_score(members, id_col, text_col)
    # LEFT join (round-7 review fix): a user-supplied quality relation may
    # not cover every member — an inner join would emit NO keeper for a
    # fully-uncovered cluster, and drop_near_duplicates would then delete
    # EVERY copy of that document. Uncovered members rank below any
    # scored member (sort key -inf, ties still -> min id) and
    # keep_quality comes back NULL when the keeper itself was unscored.
    j = labels.join(quality.select(F.col(id_col), "quality"), id_col, "left")
    # id-TYPE-AGNOSTIC argmax (round-8 advice fix): min(struct(-quality,
    # id, ...)) picks max quality with ties to the SMALLEST id for any
    # orderable id type — the previous max(struct(quality, -id, ...))
    # negated the id, which under non-ANSI mode turns a STRING id into
    # NULL and silently breaks the documented ties-to-smallest guarantee.
    # -(-inf) = +inf still ranks quality-uncovered members below any
    # scored member.
    best = F.min(
        F.struct(
            (-F.coalesce(F.col("quality"), F.lit(float("-inf")))).alias("neg_q"),
            F.col(id_col).alias("keep"),
            F.col("quality").alias("orig_q"),
        )
    )
    return (
        j.groupBy("cluster_rep")
        .agg(best.alias("b"), F.count(F.lit(1)).alias("n_members"))
        .select(
            "cluster_rep",
            F.col("b.keep").alias("keep_doc_id"),
            F.col("b.orig_q").alias("keep_quality"),
            "n_members",
        )
    )


def drop_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
    quality: DataFrame | None = None,
    snapshot_losers: bool = False,
) -> DataFrame:
    """The one-call near-dup sweep: ``docs`` minus every duplicate-cluster
    member EXCEPT each cluster's best-quality representative
    (``resolve_clusters``). Docs with no near-duplicate pass through
    untouched; the output is the input schema, filtered.

    Composition of the pinned pieces — ``dup_clusters`` (or any injected
    ``pairs`` relation: minhash at corpus scale) → ``resolve_clusters`` →
    one broadcast-able anti-join of the (small) losers set against the
    corpus. Survivor count = n_docs − Σ(cluster_size − 1) by construction
    (pytest-pinned).

    ``snapshot_losers=True`` materializes the losers id set (round 13) —
    the sweep's DECISION, a few ids per duplicate cluster — so a caller
    that consumes the returned relation several times re-runs only the
    cheap anti-join against its (materialized) input instead of the
    quality battery and cluster argmax per consumption. The curation
    stage list uses this to drop its corpus-sized post-neardup
    checkpoint: the heavy (id, text) bytes stay in the previous stage's
    blocks, and only the decision is stored."""
    labels = dup_clusters(docs, id_col, text_col, pairs=pairs)
    # duplicate-free fast path (round 13): with no clusters there are no
    # losers — the quality argmax, the keeper anti-join, and the corpus
    # anti-join would all run on empty relations (and the default-quality
    # path would still build its battery plan). The probe is one take(1)
    # against the CC output (a materialized snapshot, or the empty-graph
    # fast path's local relation), O(1) at any scale; the output is the
    # input relation verbatim, exactly what the anti-join chain returns
    # when losers is empty.
    if labels.isEmpty():
        return docs
    keep = resolve_clusters(docs, labels=labels, quality=quality, id_col=id_col,
                            text_col=text_col)
    losers = labels.join(
        keep.select(F.col("keep_doc_id").alias(id_col)), id_col, "left_anti"
    ).select(id_col)
    if snapshot_losers:
        losers = snapshot(losers)
    return docs.join(losers, id_col, "left_anti")


def dup_clusters_incremental(
    new_pairs: DataFrame,
    old_labels: DataFrame,
    id_col: str = "doc_id",
    broadcast_batch: bool = True,
    return_touched: bool = False,
    snapshot_pairs: bool = True,
    snapshot_labels: bool = True,
) -> DataFrame:
    """Merge a NEW batch's near-dup edges into a PERSISTED cluster-label
    relation — the incremental-family member for connected components,
    completing the crawl loop: index once, per batch generate batch-touching
    pairs (``*_pairs_incremental``), then fold them into yesterday's
    clusters without ever re-reading (or re-pairing) the old corpus.

    ``old_labels`` is a previous ``dup_clusters`` output (doc_id,
    cluster_rep). Old connectivity is reconstructed EXACTLY from it as
    synthetic star edges (doc_id -> cluster_rep): a component's members
    all connect to its representative, so the star graph has the same
    components as the old edge set but diameter <= 2 — the re-run
    converges in O(log k) cheap rounds regardless of how tangled the
    original duplicate chains were. ``new_pairs`` is any (doc_a, doc_b)
    relation covering every pair that touches a new document (the
    incremental pair operators' contract); every full-corpus pair is
    either old-old (inside old_labels) or batch-touching (in new_pairs),
    so the result equals ``dup_clusters`` over the WHOLE corpus
    (pytest-pinned, and the 'incr' gate variant hash-checks it against
    the same recursive-CTE oracle as the full run — components that merge
    across the batch boundary get the new global min as rep).

    Scale shape (round 10): the iterative CC loop runs over the TOUCHED
    components only. New edges have both endpoints among the pair nodes,
    and old connectivity never crosses component boundaries, so the graph
    partitions cleanly: components sharing no node with ``new_pairs``
    keep their labels verbatim (one non-iterative anti-join), and the
    hook/pointer-jump rounds — each a shuffle join PLUS a driver-blocking
    convergence count — see only the touched components' stars plus the
    new pairs, i.e. batch-proportional input instead of |old_labels| per
    round. Old TEXT, signatures, and edges are never touched.
    ``broadcast_batch=False`` swaps the batch-keyed semi-join probes to
    shuffle joins for batches too large to broadcast.

    ``return_touched=True`` additionally returns the TOUCHED-only label
    relation (exactly the clusters containing a pair node, freshly
    re-labeled) as ``(full, touched)`` — downstream per-batch resolution
    (quality argmax + loser anti-join) only needs those clusters, so the
    caller can keep its whole verdict path batch-proportional instead of
    re-aggregating every corpus cluster per batch."""
    # new_pairs is consumed twice (node set + CC edge union), so a lazy
    # pair plan would execute twice — snapshotted here by default;
    # callers that already pass a snapshotted relation (the incremental
    # chain, merge_curation_states) set snapshot_pairs=False to skip the
    # redundant checkpoint job per batch
    pairs = new_pairs.select("doc_a", "doc_b")
    if snapshot_pairs:
        pairs = snapshot(pairs)
    # old_labels is consumed three times (touched probe, touched stars,
    # untouched carry-over) — same default-snapshot / opt-out contract;
    # the curation chain passes False (its state labels are materialized)
    if snapshot_labels:
        old_labels = snapshot(old_labels.select(id_col, "cluster_rep"))
    # no-new-edges fast path (round 13): a batch that touches no near-dup
    # pair leaves every cluster untouched — full == old_labels verbatim
    # and touched is empty, which is exactly what the probe/star/CC/union
    # chain below computes through ~8 jobs on empty relations. The probe
    # is one take(1) against the (materialized per the contract above)
    # pair relation; the steady-state crawl batch with zero duplicates is
    # the COMMON case, so this is the batch path most batches take.
    if pairs.isEmpty():
        dup_clusters_incremental.last_rounds = 0
        empty_touched = (
            old_labels.select(id_col, "cluster_rep").where(F.lit(False))
        )
        if return_touched:
            return old_labels.select(id_col, "cluster_rep"), empty_touched
        return old_labels.select(id_col, "cluster_rep")
    nodes = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    bcast = F.broadcast if broadcast_batch else (lambda d: d)
    # snapshotted: consumed by both the semi- and the anti-join below —
    # lazy it would re-probe old_labels per consumer
    touched_reps = snapshot(
        old_labels.join(bcast(nodes), id_col, "left_semi")
        .select("cluster_rep")
        .distinct()
    )
    touched = old_labels.join(bcast(touched_reps), "cluster_rep", "left_semi")
    untouched = old_labels.join(bcast(touched_reps), "cluster_rep", "left_anti")
    star = touched.select(
        F.col(id_col).alias("doc_a"), F.col("cluster_rep").alias("doc_b")
    ).where(F.col("doc_a") != F.col("doc_b"))
    labels = _connected_components(star.unionByName(pairs))
    dup_clusters_incremental.last_rounds = _connected_components.last_rounds
    touched_out = labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_rep")
    )
    full = untouched.select(id_col, "cluster_rep").unionByName(touched_out)
    if return_touched:
        return full, touched_out
    return full


# ---------------------------------------------------------------------------
# Exact-substring dedup at fixed window granularity (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better",
# arXiv:2107.06499 — the ExactSubstr pass; this is the scalable fixed-
# window formulation pretraining pipelines actually run, a distributed
# suffix array being neither needed nor Spark-shaped: any duplicated
# substring of >= 2w-1 tokens is guaranteed to contain a duplicated
# w-token window, so w trades detection granularity for join volume).
#
# Every w-token window is keyed by md5 of its space-joined tokens
# (engine-portable, collision-exact w.h.p.); windows whose key occurs
# >= min_count times corpus-wide are cut, except (keep_first) the
# occurrence with the smallest (doc_id, pos), so one copy of every
# repeated passage survives — the Lee et al. contract.
# ---------------------------------------------------------------------------


def _window_keys(df: DataFrame, id_col: str, text_col: str, window: int):
    """(id, pos, h): md5 key of each w-token window at 0-based token pos.

    The token split is projected before the window expression (round 13):
    the per-position lambda slices the token array, and an inline
    tokens() there re-evaluates the regex split per position — O(tokens²)
    per doc on the interpreted HOF path. The window tree reads only the
    fixed-name ``_toks`` column, so it is memoized on ``window`` alone
    (round 14; functions.memo_expr — this construction recurred at ~130 ms
    per call on every substr span/index build and every ingested batch)."""
    from spark_iforest_spark.functions import memo_expr

    def build():
        toks = F.col("_toks")
        return F.when(
            F.size(toks) >= window,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - window),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.md5(
                        F.array_join(F.slice(toks, i + 1, window), " ")
                    ).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))

    wins = memo_expr(("substr_window_keys", int(window)), build)
    pre = df.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    )
    return pre.select(F.col(id_col), F.explode(wins).alias("w")).select(
        id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h")
    )


def exact_substring_spans(
    df: DataFrame,
    window: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
) -> DataFrame:
    """Token spans to cut: (id, start, end) — maximal merged intervals of
    duplicated w-token windows (end exclusive; adjacent/overlapping
    windows coalesce, so spans are disjoint per doc).

    Scale shape: one explode (linear in corpus tokens) -> hash-keyed
    count aggregate (map-side combined) -> join back on the 32-hex key ->
    per-doc interval merge as a Catalyst array fold over the doc's own
    cut positions (bounded by doc length — no window function, no
    driver). The keeper exemption is one extra (ordered-struct min)
    aggregate on the same key. No suffix array, no all-pairs.
    """
    # the window relation is referenced twice (key aggregate, cut join) —
    # snapshot it once so the corpus is scanned/exploded once, the same
    # discipline as the minhash shingles
    wins = snapshot(_window_keys(df, id_col, text_col, window))
    # ONE digest-keyed aggregate computes both the duplicate counts and
    # the keep-first keeper (round 13; previously the keeper was a SECOND
    # groupBy("h") over the joined cut rows plus a second join — a full
    # extra shuffle of the token-scale window relation at every scale).
    # Identical values: the keeper min over ALL occurrences of a
    # duplicated key equals the min over its cut rows, and non-duplicated
    # keys' keepers are dropped with their count filter. This is exactly
    # the fused shape substr_window_index and the incremental span path
    # already use.
    aggs = [F.count("*").alias("_c")]
    if keep_first:
        aggs.append(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
            ).alias("_k")
        )
    dup_keys = wins.groupBy("h").agg(*aggs).where(F.col("_c") >= int(min_count))
    if keep_first:
        cut = wins.join(dup_keys.select("h", "_k"), "h").where(
            ~((F.col(id_col) == F.col("_k.i")) & (F.col("pos") == F.col("_k.p")))
        )
    else:
        cut = wins.join(dup_keys.select("h"), "h")
    return _merge_cut_spans(cut, id_col, window)


def _merge_cut_spans(cut: DataFrame, id_col: str, window: int) -> DataFrame:
    """(id, pos) cut windows → disjoint merged (id, start, end) intervals
    via the per-doc Catalyst array fold — shared by the full and
    incremental span paths so both merge identically."""
    w = int(window)
    from spark_iforest_spark.functions import memo_expr

    # the interval fold is exploded INLINE (round 13): exploding a named
    # "_spans" column would let InferFiltersFromGenerate duplicate the
    # whole fold into a pushed-down filter (see _shingle_rows). The fold
    # tree reads only the fixed-name ``_ps`` column — memoized on the
    # window width (round 14; ~200 ms of py4j construction per call).
    def build():
        empty = F.array().cast("array<struct<start:int,end:int>>")
        return F.explode(F.aggregate(
            F.col("_ps"),
            empty,
            lambda acc, p: F.when(
                (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["end"]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["start"].alias("start"),
                            (p + w).cast("int").alias("end"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(
                            p.cast("int").alias("start"),
                            (p + w).cast("int").alias("end"),
                        )
                    ),
                )
            ),
        )).alias("s")

    fold = memo_expr(("substr_merge_fold", w), build)
    return (
        cut.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("_ps"))
        .select(id_col, fold)
        .select(id_col, F.col("s.start").alias("start"), F.col("s.end").alias("end"))
    )


def substr_window_index(
    df: DataFrame,
    window: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(h, n_occurrences, first_id, first_pos, window) — the persistable
    corpus state behind :func:`exact_substring_spans_incremental`: per
    distinct w-token window digest, its occurrence count and FIRST
    occurrence (min (id, pos) — the keep-first keeper). 32-hex digests +
    three numbers per distinct window, never window text. The window
    size is RECORDED in the artifact (round-9 advice fix): indexes built
    at different windows key incompatible digest spaces, so merge/apply
    verify the recorded value instead of silently producing wrong spans.
    Doc-disjoint shard indexes merge exactly with
    :func:`merge_substr_window_indexes`."""
    return (
        _window_keys(df, id_col, text_col, window)
        .groupBy("h")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
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


def _assert_index_window(index: DataFrame, window: int | None, who: str) -> None:
    """Verify a substr_window_index artifact's recorded window size —
    delegates to the generic :func:`_assert_index_param` (review fix:
    this was a verbatim second copy of the min/max check with 'window'
    hard-coded; one implementation keeps the empty-index and
    pre-recording semantics in lockstep). On a persisted parquet index
    the aggregate is a stats-only scan; on a still-lazy index it forces
    one computation, which the incremental/merge paths materialize
    anyway."""
    _assert_index_param(index, "window", window, who)


def merge_substr_window_indexes(
    *indexes: DataFrame, verify_window: bool = True
) -> DataFrame:
    """Fold doc-disjoint :func:`substr_window_index` artifacts into one:
    counts sum, the keeper is the min first-occurrence across shards —
    both exact under doc-disjointness (the incremental family's standard
    assume-disjoint contract). Indexes MUST share one window size — the
    digest spaces of different windows are incompatible and a mixed merge
    would silently yield corrupt spans; the recorded ``window`` column is
    verified across all inputs (round-9 advice fix; ``verify_window=False``
    skips the one aggregate job when the caller has already checked)."""
    from functools import reduce

    all_recorded = all("window" in ix.columns for ix in indexes)
    if not all_recorded:  # tolerate pre-round-10 artifacts: unverifiable
        if any("window" in ix.columns for ix in indexes):
            # same silent-recording-loss hazard as merge_shingle_indexes
            # (round-10 advice): surface it instead of degrading quietly
            import warnings

            warnings.warn(
                "merge_substr_window_indexes: merging window-recording and "
                "legacy window-less indexes — dropping the window recording "
                "from the output; mixed-window inputs can no longer be "
                "detected here or at apply time.",
                stacklevel=2,
            )
        indexes = tuple(
            ix.drop("window") if "window" in ix.columns else ix for ix in indexes
        )
    merged = reduce(DataFrame.unionByName, indexes)
    if all_recorded and verify_window:
        _assert_index_window(merged, None, "merge_substr_window_indexes")
    extra = [F.min("window").alias("window")] if all_recorded else []
    return (
        merged.groupBy("h")
        .agg(
            F.sum("n_occurrences").cast("long").alias("n_occurrences"),
            F.min(
                F.struct(
                    F.col("first_id").alias("i"), F.col("first_pos").alias("p")
                )
            ).alias("_f"),
            *extra,
        )
        .select(
            "h",
            "n_occurrences",
            F.col("_f.i").alias("first_id"),
            F.col("_f.p").alias("first_pos"),
            *(["window"] if all_recorded else []),
        )
    )


def exact_substring_spans_incremental(
    batch: DataFrame,
    index: DataFrame,
    window: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
    indexed_ids: DataFrame | None = None,
    verify_window: bool = True,
) -> DataFrame:
    """Spans to cut in a NEW doc-disjoint batch, judged against
    (indexed corpus ∪ batch) window counts: output ==
    ``exact_substring_spans(corpus ∪ batch)`` restricted to the batch's
    docs, exactly (gate- and pytest-pinned) — the ExactSubstr member of
    the incremental family (exact / minhash / line dedup). History is
    immutable: a batch occurrence that makes an already-shipped window
    duplicated does not re-cut shipped docs.

    The keeper needs no monotonic-id assumption: the index stores each
    window's global first occurrence, so the exemption compares the
    batch's first against the indexed first — when the indexed side
    wins, no batch occurrence is exempt (ids are disjoint, so the
    equality test never matches a batch row).

    Disjointness is a correctness precondition (a re-ingested doc's
    windows would double-count and over-cut) and the index stores only
    the keeper's id — so the guard is default-on (round-9 directive):
    pass ``indexed_ids`` for an exact overlap check or set
    ``assume_disjoint_ids=True`` for known-new crawl ids. The index's
    recorded window size is verified against the ``window`` argument
    (round-9 advice fix; ``verify_window=False`` skips that aggregate).

    Scale: per-batch work only. Batch windows shuffle by digest once;
    the corpus-sized index is SEMI-JOINED down to the batch's digests —
    broadcast of the batch digest set by default, or a shuffle semi-join
    with ``broadcast_batch=False`` for batches too large to broadcast
    (round-9 advice fix, mirroring minhash_lsh_pairs_incremental) —
    before the count/keeper merge."""
    check_batch_disjoint(
        batch, indexed_ids, id_col, assume_disjoint_ids, broadcast_batch,
        "substr_window_index",
    )
    if verify_window:
        _assert_index_window(index, window, "exact_substring_spans_incremental")
    wins = snapshot(_window_keys(batch, id_col, text_col, window))
    bagg = wins.groupBy("h").agg(
        F.count("*").alias("_bc"),
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
        ).alias("_bk"),
    )
    idx = index.select(
        "h",
        F.col("n_occurrences").alias("_ic"),
        F.struct(
            F.col("first_id").alias("i"), F.col("first_pos").alias("p")
        ).alias("_if"),
    )
    bkeys = bagg.select("h")
    if broadcast_batch:
        bkeys = F.broadcast(bkeys)
    relevant = idx.join(bkeys, "h", "left_semi")
    tot = bagg.join(relevant, "h", "left").select(
        "h",
        (F.col("_bc") + F.coalesce(F.col("_ic"), F.lit(0))).alias("_c"),
        F.when(F.col("_if").isNull(), F.col("_bk"))
        .otherwise(F.least(F.col("_bk"), F.col("_if")))
        .alias("_k"),
    )
    dup = tot.where(F.col("_c") >= int(min_count))
    cut = wins.join(dup.select("h", "_k"), "h")
    if keep_first:
        # the global keeper may be an indexed occurrence; batch ids are
        # disjoint, so the equality simply never exempts anything then
        cut = cut.where(
            ~((F.col(id_col) == F.col("_k.i")) & (F.col("pos") == F.col("_k.p")))
        )
    return _merge_cut_spans(cut, id_col, window)


def remove_repeated_substrings(
    df: DataFrame,
    window: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
    with_text: bool = False,
) -> DataFrame:
    """Apply :func:`exact_substring_spans`: rebuild each doc's text with
    every cut token dropped. Returns (id, n_tokens, n_kept, clean_md5) —
    the md5 of the space-rejoined surviving tokens (the line_dedup
    digest convention; rejoining normalizes runs of whitespace to single
    spaces, same as every tokens()-based operator here). Docs with
    nothing to cut pass through (n_kept == n_tokens); a fully-duplicated
    non-keeper doc collapses to md5(''). ``with_text=True`` adds the
    rebuilt ``clean_text`` itself (round 8 — composition fodder for
    pretrain_curate; the digest stays the oracle surface since
    md5(clean_text) == clean_md5 by construction).

    One broadcast-free join of docs against their own (grouped) span
    lists, then a pure Catalyst filter-by-position — no Python, no
    second shuffle beyond the span computation's.
    """
    spans = exact_substring_spans(
        df, window=window, min_count=min_count, id_col=id_col,
        text_col=text_col, keep_first=keep_first,
    )
    return _apply_cut_spans(df, spans, id_col, text_col, with_text)


def _apply_cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    with_text: bool,
) -> DataFrame:
    """Shared rebuild tail of remove_repeated_substrings[_incremental]:
    drop every token inside a cut span, emit (id, n_tokens, n_kept,
    clean_md5[, clean_text]) for EVERY input doc.

    Staged projections (round 13): the span-masking filter is O(tokens ×
    spans) per doc — projecting ``_kept`` (and ``_clean``) once and
    deriving size/md5/text from the column references keeps it at ONE
    evaluation per row instead of one per consuming expression (the
    multi-referenced aliases are retained by CollapseProject)."""
    from spark_iforest_spark.functions import memo_expr

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start", "end")).alias("_spans")
    )
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    empty = F.array().cast("array<struct<start:int,end:int>>")
    sp = F.coalesce(F.col("_spans"), empty)

    # the masking/rebuild trees read only the fixed-name _toks/_spans/_kept
    # columns of the staged projections below — memoized parameter-free
    # (round 14; ~250 ms of py4j construction per call, paid by every
    # substr apply: the dedup_substr bench query, both curate chains, and
    # every ingested batch)
    def build_kept():
        indexed = F.transform(
            F.col("_toks"),
            lambda t, i: F.struct(t.alias("t"), i.cast("int").alias("i")),
        )
        return F.filter(
            indexed,
            lambda s: ~F.exists(
                F.col("_spans"),
                lambda x: (s["i"] >= x["start"]) & (s["i"] < x["end"]),
            ),
        ).alias("_kept")

    def build_clean():
        return F.array_join(
            F.transform(F.col("_kept"), lambda s: s["t"]), " "
        ).alias("_clean")

    kept = memo_expr(("substr_apply_kept",), build_kept)
    clean = memo_expr(("substr_apply_clean",), build_clean)
    s1 = (
        df.join(per_doc, id_col, "left")
        .select(F.col(id_col), toks.alias("_toks"), sp.alias("_spans"))
        .select(
            F.col(id_col),
            F.size("_toks").cast("long").alias("n_tokens"),
            kept,
        )
    )
    s2 = s1.select(
        F.col(id_col),
        "n_tokens",
        F.size("_kept").cast("long").alias("n_kept"),
        clean,
    )
    cols = [
        F.col(id_col),
        F.col("n_tokens"),
        F.col("n_kept"),
        F.md5(F.col("_clean")).alias("clean_md5"),
    ]
    if with_text:
        cols.append(F.col("_clean").alias("clean_text"))
    return s2.select(*cols)


def remove_repeated_substrings_incremental(
    batch: DataFrame,
    index: DataFrame,
    window: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
    with_text: bool = False,
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
    indexed_ids: DataFrame | None = None,
    verify_window: bool = True,
) -> DataFrame:
    """Apply :func:`exact_substring_spans_incremental` to a NEW batch:
    output == ``remove_repeated_substrings(corpus ∪ batch)`` restricted
    to the batch's rows, bit-exact (rebuilt digests included), for
    doc-disjoint batches (guard/broadcast/window knobs pass through —
    see the span function). Refresh the state with
    ``merge_substr_window_indexes(index, substr_window_index(batch))``."""
    spans = exact_substring_spans_incremental(
        batch, index, window=window, min_count=min_count, id_col=id_col,
        text_col=text_col, keep_first=keep_first,
        broadcast_batch=broadcast_batch,
        assume_disjoint_ids=assume_disjoint_ids,
        indexed_ids=indexed_ids, verify_window=verify_window,
    )
    return _apply_cut_spans(batch, spans, id_col, text_col, with_text)


def plan_minhash_bands(
    threshold: float,
    num_perms: int = _MINHASH_PERMS,
    max_miss_at: tuple[float, float] | None = None,
) -> dict:
    """Pick the (bands, rows) split of a ``num_perms`` minhash budget for
    a Jaccard ``threshold`` — the S-curve tuning every LSH deployment does
    by hand (Leskovec/Rajaraman/Ullman, MMDS §3.4.3), as a driver-side
    planning utility for :func:`minhash_lsh_pairs` and
    :func:`minhash_index`.

    A (b, r) banding collides a pair of similarity s with probability
    ``1 − (1 − s^r)^b``; its knee sits at s* ≈ (1/b)^(1/r). Among the
    divisor splits of ``num_perms`` this picks the one whose knee is
    closest to ``threshold`` (ties → more rows per band: steeper curve,
    fewer spurious candidates — candidate volume, not recall, is what
    melts at 100 TB). ``max_miss_at=(s, p)`` instead picks the FEWEST-
    bands split whose miss probability at similarity s is ≤ p — the
    "guarantee recall, minimize candidate volume" formulation; raises if
    no split under the budget satisfies it (the caller must raise
    num_perms, which multiplies signature cost linearly).

    Returns {"bands", "rows", "knee", "collision_prob": fn(s),
    "miss_prob": fn(s)} — the callables let callers audit the curve at
    their own operating points. Pure math, no Spark; determinism comes
    from iterating divisors in ascending band order.
    """
    t = float(threshold)
    if not (0.0 < t < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    splits = [
        (b, num_perms // b)
        for b in range(1, int(num_perms) + 1)
        if num_perms % b == 0
    ]

    def make(b: int, r: int) -> dict:
        return {
            "bands": b,
            "rows": r,
            "knee": (1.0 / b) ** (1.0 / r),
            "collision_prob": lambda s, b=b, r=r: 1.0 - (1.0 - s**r) ** b,
            "miss_prob": lambda s, b=b, r=r: (1.0 - s**r) ** b,
        }

    if max_miss_at is not None:
        s_req, p_req = float(max_miss_at[0]), float(max_miss_at[1])
        for b, r in splits:  # ascending bands == descending candidate volume
            if (1.0 - s_req**r) ** b <= p_req:
                return make(b, r)
        raise ValueError(
            f"no (bands, rows) split of {num_perms} perms reaches "
            f"miss<={p_req} at s={s_req}; raise num_perms"
        )
    best = min(
        splits, key=lambda br: (abs((1.0 / br[0]) ** (1.0 / br[1]) - t), br[0])
    )
    return make(*best)

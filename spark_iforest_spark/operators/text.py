"""Text-analysis operators over a documents table.

Pure Catalyst expressions (no Python UDFs) except the winnowing
fingerprint's sliding-min, which is one vectorized mapInPandas pass over
JVM-computed gram hashes. Each operator has an exact DuckDB-SQL twin in
``__spark_entry__.oracle_sql`` — designed so both engines compute
bit-identical values.

Scale: every operator here is a narrow per-row projection — no shuffle, no
Python worker, filters/pruning push straight to the parquet scan. At 100 TB
these run at scan speed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from spark_iforest_spark.functions import EN_STOPWORDS, LANG_STOPWORDS, tokens


def token_stat_cols(text_col: str = "text", toks=None) -> list:
    """Aliased per-row token-stat expressions (shared by token_stats and
    the fused signals_panel — one definition, one hash-pinned semantics).
    ``toks`` takes a pre-projected token-array column (see
    pipeline.repetition_cols for why hot-path callers should)."""
    if toks is None:
        toks = tokens(F.col(text_col))
    return [
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
        F.size(F.split(F.col(text_col), r"[^A-Za-z0-9]+")).alias("n_subwords"),
    ]


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token counts: whitespace tokens + a BPE-ish subword count.

    ``n_subwords`` approximates a BPE token budget with the common
    [A-Za-z0-9]+-or-single-symbol regex split — a deterministic, cheap
    stand-in for a real tokenizer at corpus-triage time.
    """
    return docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), *token_stat_cols(text_col, toks=F.col("_toks")))


def lang_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic stopword-ratio language ID over {en, es, fr, de}.

    Per language: fraction of tokens in that language's stopword list;
    prediction = argmax ratio if it reaches 0.05, else 'unk'. Ties break in
    fixed en > es > fr > de order (the oracle SQL encodes the identical
    CASE chain). (The synthetic corpus is English-wordlist text with a
    synthetic ``lang`` column — the heuristic classifies the *content*,
    not the label.) ``keep`` passes extra input columns through so callers
    composing per-row gates (corpus.clean_corpus) stay single-scan.
    """
    return docs.select(
        F.col(id_col), *[F.col(c) for c in keep], *lang_id_cols(text_col)
    )


def lang_id_cols(text_col: str = "text") -> list:
    """Aliased lang-id expressions (shared by lang_id / signals_panel).
    Memoized per text_col (round 13; functions.memo_expr)."""
    from spark_iforest_spark.functions import memo_expr

    return memo_expr(("lang_id_cols", text_col), lambda: _lang_id_cols(text_col))


def _lang_id_cols(text_col: str) -> list:
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    ratios = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        ratios[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n
    r = ratios
    pred = (
        F.when(
            (r["en"] >= 0.05) & (r["en"] >= r["es"]) & (r["en"] >= r["fr"]) & (r["en"] >= r["de"]),
            F.lit("en"),
        )
        .when((r["es"] >= 0.05) & (r["es"] >= r["fr"]) & (r["es"] >= r["de"]), F.lit("es"))
        .when((r["fr"] >= 0.05) & (r["fr"] >= r["de"]), F.lit("fr"))
        .when(r["de"] >= 0.05, F.lit("de"))
        .otherwise(F.lit("unk"))
    )
    return [
        F.round(r["en"], 6).alias("en_stopword_ratio"),
        pred.alias("lang_pred"),
    ]


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Composite document-quality score in [0,1].

    Components (each in [0,1], weights sum to 1):
      0.3 * length_score   — min(1, n_tokens/64)
      0.3 * stopword_score — min(1, stopword_ratio/0.08)
      0.2 * token_len_score— 1 if mean token length in [3,10] else 0.3
      0.2 * symbol_score   — 1 - non-alnum-space char ratio

    ``keep`` passes extra input columns through unchanged, so downstream
    aggregations (corpus.source_quality_report) stay single-scan instead of
    re-joining the score back to the input by id.
    """
    return docs.select(
        F.col(id_col), *[F.col(c) for c in keep], *quality_cols(text_col)
    )


def quality_cols(text_col: str = "text") -> list:
    """Aliased quality-score expressions (shared by quality_score /
    signals_panel). Memoized per text_col (round 13; functions.memo_expr):
    pure expression factory on the resolve/curation hot path."""
    from spark_iforest_spark.functions import memo_expr

    return memo_expr(("quality_cols", text_col), lambda: _quality_cols(text_col))


def _quality_cols(text_col: str) -> list:
    toks = tokens(F.lower(F.col(text_col)))
    n_tokens = F.size(toks)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n_tokens
    mean_tok = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens
    n_chars = F.length(text_col)
    n_symbol = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", ""))
    length_score = F.least(F.lit(1.0), n_tokens / F.lit(64.0))
    stop_score = F.least(F.lit(1.0), stop_ratio / F.lit(0.08))
    tok_len_score = F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), 1.0).otherwise(0.3)
    symbol_score = F.lit(1.0) - n_symbol / n_chars
    score = (
        0.3 * length_score + 0.3 * stop_score + 0.2 * tok_len_score + 0.2 * symbol_score
    )
    return [
        F.round(length_score, 6).alias("length_score"),
        F.round(stop_score, 6).alias("stopword_score"),
        F.round(symbol_score, 6).alias("symbol_score"),
        F.round(score, 6).alias("quality"),
    ]


def fingerprint_cols(text_col: str = "text") -> list:
    """Aliased fingerprint expressions (shared by fingerprint /
    signals_panel)."""
    toks = F.array_sort(F.array_distinct(tokens(F.lower(F.col(text_col)))))
    return [
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
        F.md5(F.col(text_col)).alias("exact_hash"),
    ]


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical-form document fingerprint (Broder-style "fingerprint method"):
    md5 over the sorted distinct lowercase token set. Word-order-insensitive,
    so reordered near-duplicates collide; exact string duplicates always do.
    """
    return docs.select(F.col(id_col), *fingerprint_cols(text_col))


def signals_panel(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fused per-document signal panel: token stats + lang-id + quality +
    fingerprints + repetition signals in ONE single-scan projection, plus
    the unigram-LM typicality columns (renamed ``lm_*``) via its vocab
    join.

    This is the production shape for corpus triage at 100 TB: running the
    five per-row operators separately and joining on doc_id costs five
    scans and five shuffles; here every per-row column comes from the same
    projection the optimizer fuses into the scan (the expression builders
    are SHARED with the individual operators, so values are identical by
    construction — pinned by an equality test), and the only join is the
    vocabulary-keyed one typicality genuinely needs. ``rep_n_tokens`` is
    repetition_stats' n_tokens (raw split) and ``lm_n_tokens`` is
    typicality's (empty-filtered) — kept distinct on purpose.
    """
    from spark_iforest_spark.operators.pipeline import (
        gopher_cols,
        gopher_rule_mask,
        repetition_cols,
        structure_repetition_cols,
    )

    # the whitespace split is projected ONCE and read as a cheap column
    # reference by every factory whose lambdas touch it (round 13 — the
    # inline split was re-evaluated per array element; see
    # pipeline.repetition_cols). Still one scan: the extra Project holds
    # a multi-referenced expression CollapseProject won't re-inline.
    from spark_iforest_spark.functions import memo_expr

    pre = docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("_toks")
    )

    # the full panel column list is a pure function of text_col — memoized
    # (round 13): ~1 s of driver-side py4j tree construction per call
    # otherwise, recurring on every gate build (see functions.memo_expr)
    def build_panel_cols():
        _t = F.col("_toks")
        rep = repetition_cols(text_col, toks=_t)
        n_chars = F.length(text_col)
        symbol_ratio = F.round(
            (n_chars
             - F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", "")))
            / n_chars,
            6,
        ).alias("symbol_ratio")
        return [
            *token_stat_cols(text_col, toks=_t),
            *lang_id_cols(text_col),
            *quality_cols(text_col),
            *fingerprint_cols(text_col),
            rep[0].alias("rep_n_tokens"),
            *rep[1:],
            # Gopher battery (round 8): the two new signals + the rule mask
            # derived from THIS panel's columns via the shared combinator —
            # equal to pipeline.gopher_filter by construction (pytest-pinned)
            symbol_ratio,
            *gopher_cols(text_col, toks=_t),
            # structural repetition (round 8): line/paragraph dup fractions +
            # modal-gram char shares, feeding the four new mask rules
            *structure_repetition_cols(text_col, toks=_t),
        ]

    per_row = pre.select(
        F.col(id_col),
        *memo_expr(("signals_panel_cols", text_col), build_panel_cols),
    )
    mask = memo_expr(
        ("gopher_rule_mask_default", text_col),
        lambda: gopher_rule_mask(
            F.col("n_tokens"),
            F.col("avg_token_len"),
            F.col("symbol_ratio"),
            F.col("alpha_word_frac"),
            F.col("stopword_hits"),
            F.col("dup_token_frac"),
            F.col("top_token_share"),
            F.col("dup_line_frac"),
            F.col("dup_para_frac"),
            F.col("dup_line_char_frac"),
            F.col("top_2gram_char_frac"),
        ),
    )
    per_row = per_row.select(
        "*", mask.alias("gopher_fail_mask"), (mask == 0).alias("gopher_keep")
    )
    lm = (
        token_typicality(docs, id_col, text_col)
        .withColumnRenamed("n_tokens", "lm_n_tokens")
        .withColumnRenamed("sum_ppb", "lm_sum_ppb")
    )
    return per_row.join(lm, id_col)


def corpus_vocab(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus token-frequency table, top-k by count (token tiebreak).

    explode → groupBy(token) with map-side partial aggregation → global
    top-k of the (tiny) aggregate. The full vocabulary never sits on one
    node; only the k winners do.
    """
    toks = tokens(F.lower(F.col(text_col)))
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(top_k)
    )


def quality_histogram(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Decile histogram of the quality score — the triage view a corpus
    curator looks at before picking a cleaning threshold."""
    q = quality_score(docs, id_col, text_col)
    bucket = F.least(F.floor(F.col("quality") * 10), F.lit(9)).cast("int")
    return (
        q.select(bucket.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    window: int = 8,
    gram_hash: str = "md5",
) -> DataFrame:
    """Rolling-hash document fingerprints (MOSS-style winnowing).

    Hash every k-char gram, then keep the minimum hash of each
    ``window``-gram window; the distinct survivors are the document's
    fingerprints. Guarantees any shared substring of length >= k+window-1
    yields a shared fingerprint — the plagiarism/near-dup detection
    invariant. Short docs (< k chars) fall back to one whole-text
    fingerprint.

    ``gram_hash`` picks the scale/portability tradeoff (measured at sf0.1,
    ~3.1k docs, 1.41M grams, local[8]):

    * ``"md5"`` (default, the gate path) — hex-string grams, fingerprint is
      a string. Engine-portable, so the DuckDB oracle reproduces the exact
      min-selection; 4.2-7.2 s (2.4 s of it is the JVM md5 itself, the rest
      lexicographic string windowing).
    * ``"xxhash64"`` — int64 grams end to end, fingerprint is a long.
      ~2-3× faster (2.4 s) and 4× lighter in the exchange (8-byte vs
      32-byte keys) — the 100 TB path. Not oracle-expressible (DuckDB lacks
      xxhash64, and min-by-different-hash selects different grams), so it
      is pinned by the winnowing-guarantee property test instead.
    """
    import numpy as np
    import pandas as pd

    if gram_hash == "xxhash64":
        hash_fn, out_type = F.xxhash64, "long"
    elif gram_hash == "md5":
        hash_fn, out_type = F.md5, "string"
    else:
        raise ValueError(f"unknown gram_hash {gram_hash!r}")
    n_grams = F.length(text_col) - k + 1
    grams = F.when(
        n_grams >= window,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: hash_fn(F.col(text_col).substr(i, F.lit(k))),
        ),
    ).otherwise(F.array(hash_fn(F.col(text_col))))

    def window_min(it):
        # numpy sliding minimum over the gram hashes (lexicographic for md5
        # hex — identical to array_min/list min in either engine — or int64
        # for xxhash64). Gram hashing stayed JVM-side; only the O(G*w)
        # windowing runs here, vectorized.
        for pdf in it:
            ids, fps = [], []
            for did, gh in zip(pdf["did"], pdf["ghash"]):
                a = np.asarray(gh)
                if len(a) < window:
                    sel = np.unique(a)
                else:
                    m = a[: len(a) - window + 1].copy()
                    for o in range(1, window):
                        np.minimum(m, a[o : o + len(m)], out=m)
                    sel = np.unique(m)
                ids.extend([did] * len(sel))
                fps.extend(sel.tolist())
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    gram_df = docs.select(F.col(id_col).alias("did"), grams.alias("ghash"))
    return gram_df.mapInPandas(
        window_min, schema=f"{id_col} long, fingerprint {out_type}"
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Corpus TF-IDF: the k most characteristic terms per document.

    score(t, d) = tf(t, d) * (N + 1) / (df(t) + 1) — the smoothed-idf
    RATIONAL variant (no log). The log is a monotone transform of the idf
    factor, so per-fixed-df rankings are identical; using one division and
    one multiply keeps every value a deterministic IEEE expression that the
    DuckDB oracle reproduces bit-for-bit (libm log implementations are not
    pinned across engines). Ties break score desc, term asc.

    Scale shape: tf is one (doc, term)-keyed shuffle with map-side combine;
    df reuses tf's output with a term-keyed reshuffle (vocab-sized, small);
    the df table joins back term-keyed, and the final top-k is a
    vocab-bounded window per doc. N is a driver scalar (one count job) —
    metadata, not data, on the driver. No all-pairs, no full-text shuffle:
    after the first aggregate everything is (term, counts) tuples.
    """
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        (F.col("tf") * (F.lit(float(n_docs) + 1.0) / (F.col("df") + F.lit(1.0)))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", F.round("score", 6).alias("score"))
    )


def bm25_batch_topk(
    docs: DataFrame,
    queries: dict[str, tuple[str, ...]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval for a BATCH of queries: top-k docs per query_id.

    Per matched (query, doc, term): score = idf(t) * tf*(k1+1) / (tf +
    k1*(1 - b + b*dl/avgdl)) — the standard Okapi tf-saturation and length
    normalization. idf uses the smoothed RATIONAL form (N+1)/(df+1) instead
    of the usual log: Spark's Math.log and DuckDB's libm ln differ in the
    last ulp (measured: 39/160 probe values), so a log-based score cannot
    hash-match an external oracle; per fixed df the two are monotone-
    equivalent. Per-term scores are floored to integer MICRO-units before
    the per-doc sum, so the sum is exact integer arithmetic — independent
    of partial-aggregation order and bit-identical across engines (the same
    money-units trick as pricing_summary).

    Scale shape: the exploded token stream is filtered to the UNION of all
    query terms before any shuffle (an isin over a driver literal, pushed
    toward the scan), then mapped to query_ids by a broadcast-hash join
    against the tiny (query_id, term) table — so tf's groupBy shuffles only
    matching (query, doc, term) rows. df is per (query_id, term), an
    aggregate of tf's small output; avgdl is one count/sum job (driver
    scalars, metadata not data). The final per-query rank is a
    rank-filtered window that Spark plans as WindowGroupLimit (partial
    top-k per input partition BEFORE the shuffle, like partial
    aggregation) — no single-partition global sort anywhere, even for a
    one-query batch.
    """
    spark = docs.sparkSession
    q_rows = [
        (qid, t.lower())
        for qid, terms in sorted(queries.items())
        for t in sorted(set(w.lower() for w in terms))
    ]
    all_terms = sorted(set(t for _, t in q_rows))
    q_table = spark.createDataFrame(q_rows, "query_id string, term string")
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(F.lower(F.col(text_col))))).alias("tot"),
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["tot"] / stats["n"]
    # tokenize ONCE per row — the split is the dominant per-row cost, and a
    # projection that mentions tokens() twice plans two RegExpReplace/Split
    # chains; materialize the array in a prior select and derive dl + the
    # exploded terms from it.
    toks = (
        docs.select(
            F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_toks")
        )
        .select(
            F.col(id_col),
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        .where(F.col("term").isin(all_terms))
        .join(F.broadcast(q_table), "term")
    )
    tf = toks.groupBy("query_id", id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.lit(float(n_docs) + 1.0) / (F.col("df") + F.lit(1.0))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    unit = F.floor(F.lit(1e6) * idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom)
    scored = (
        tf.join(F.broadcast(df), ["query_id", "term"])
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum(unit).alias("score_micros"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micros").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "n_hit_terms", "score_micros")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Single-query BM25 top-k: a one-entry batch of ``bm25_batch_topk``.

    Same relation as before the batch refactor (query_id projected away) —
    and the old global single-partition ``Window.orderBy`` is gone: the
    rank-filtered window is WindowGroupLimit-planned, so each input
    partition ships at most k candidates into the final ordering.
    """
    out = bm25_batch_topk(
        docs, {"q0": query_terms}, id_col=id_col, text_col=text_col, k=k, k1=k1, b=b
    )
    return out.select(id_col, "rank", "n_hit_terms", "score_micros")


def token_typicality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM document quality score (CCNet-style, log-free).

    Build a corpus unigram model p(t) = count(t)/total_tokens, then score
    each document by the average model probability of its tokens —
    rare-token-heavy documents (OCR noise, codes, mangled encodings) score
    low, fluent in-distribution text scores high. Production CCNet uses
    average log-prob (perplexity); the log is dropped for engine
    portability (see bm25_topk) and per-token probabilities are floored to
    integer PARTS-PER-BILLION before the per-doc sum, making the aggregate
    exact integer arithmetic — order-independent and oracle-exact.

    Scale shape: the vocab build is one token-keyed shuffle with map-side
    combine (the same shape as corpus_vocab); scoring re-joins the token
    stream to the vocab term-keyed and regroups by doc. The vocab table is
    Zipf-skewed but the join key space is the vocabulary, not the corpus —
    at 100 TB broadcast the head (or the whole vocab if it fits) and let
    AQE skew-split the tail.
    """
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.col("term") != "")
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("tot"))
    # cnt/tot first (both exact longs -> one correctly-rounded double), then
    # scale: identical operation order in the DuckDB twin, so bit-identical
    p_ppb = F.floor(F.lit(1e9) * (F.col("cnt") / F.col("tot"))).alias("p_ppb")
    model = vocab.crossJoin(F.broadcast(total)).select("term", p_ppb)
    return (
        tok.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("p_ppb").alias("sum_ppb"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_ppb",
            F.floor(F.col("sum_ppb") / F.col("n_tokens")).alias("typicality_ppb"),
        )
    )


def heavy_hitter_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """EXACT corpus heavy hitters without a full-vocabulary shuffle: every
    token whose total count strictly exceeds n_total_tokens / (k + 1).

    Two passes:

    1. *Candidate generation* — a per-partition Misra-Gries summary (k
       counters, mapInPandas). Pigeonhole: a token with global count
       > n/(k+1) must exceed n_p/(k+1) in at least one partition (else the
       partition sums contradict), and MG with k counters never evicts an
       item above that partition-local bar — so the union of partition
       summaries (<= k x n_partitions tokens, collected to the driver as a
       bounded candidate literal) is a SUPERSET of every true heavy hitter.
    2. *Exact counting* — one scan where each token maps to itself if it is
       a candidate and to NULL otherwise, then a single groupBy over
       <= k x n_partitions + 1 groups. The NULL group counts the entire
       non-candidate tail, so total corpus tokens comes from the same
       aggregate — one shuffle of bounded width, no second scan.

    The naive groupBy(token) shuffles the whole vocabulary — at web scale
    (URLs, typos, hashes) that is billions of keys; here the shuffle width
    is bounded by k x partitions regardless of vocabulary. MG is genuinely
    imperative per-partition state — exactly the mapInPandas escape hatch —
    while the exact pass that defines the OUTPUT stays pure Catalyst, so
    the result is oracle-checkable (candidate generation only ever
    over-includes; the exact pass decides).
    """
    import re as _re

    import pandas as pd

    # Java regex \s (used by the exact pass's JVM split) is ASCII-only:
    # [ \t\n\x0b\f\r]. Python re \s is Unicode-aware, so splitting with it
    # here would diverge on U+00A0/U+2028-style whitespace and could break
    # the candidate-superset guarantee. Match the JVM class exactly.
    _jvm_ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def mg_partition(it):
        counters: dict[str, int] = {}
        for pdf in it:
            for txt in pdf[text_col]:
                if txt is None:
                    continue
                for tok in _jvm_ws.split(txt.lower()):
                    if not tok:
                        continue
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": pd.Series(list(counters), dtype=object)})

    candidates = [
        r["token"]
        for r in docs.select(text_col).mapInPandas(mg_partition, "token string").collect()
    ]
    tok = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).where(F.col("token") != "")
    keyed = tok.select(
        F.when(F.col("token").isin(candidates), F.col("token")).alias("cand")
    )
    counts = keyed.groupBy("cand").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.where(F.col("cand").isNotNull())
        .crossJoin(F.broadcast(total))
        .where(F.col("n") > F.col("n_total") / (k + 1.0))
        .select(
            F.col("cand").alias("token"),
            F.col("n").alias("n_occurrences"),
            "n_total",
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity filtering (round 8)
#
# Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual Datasets
# from Web Crawl Data") filter web text by the perplexity of a language
# model TRAINED ON A TRUSTED REFERENCE CORPUS (they use a KenLM 5-gram on
# Wikipedia), then band documents into head/middle/tail by corpus-fraction
# cutoffs and keep head+middle. This is the standard "model the text you
# want, keep what looks like it" pretraining filter — complementary to
# DSIR (which RESAMPLES by a target/raw ratio) and to token_typicality
# (which scores against the corpus's OWN unigram model, no reference).
#
# Spark-first shape: the LM is a RELATION (unigram + bigram counts with
# pre-snapped ln-probabilities in integer micro units — persist with
# parquet, the same frozen-artifact lifecycle as dsir_estimator / PQ
# codebooks), scoring is two token-keyed joins + one per-doc aggregate,
# and banding is a pure codegen CASE against FROZEN cutpoints. All
# arithmetic follows the repo's engine-portable convention: ln snapped to
# integer micros via floor(x*1e6 + 0.5) (see dsir_estimator), integer
# sums, one final floor-division — oracle-exact end to end.

_LM_MICRO = 1e6


def _lm_toks(text_col) -> F.Column:
    """Lowercased whitespace tokens with empties removed — removal BEFORE
    pairing so bigram adjacency never spans an empty token."""
    return F.filter(
        tokens(F.lower(F.coalesce(text_col, F.lit("")))), lambda x: x != F.lit("")
    )


def _lm_pair_explode() -> F.Column:
    """The (prev, cur) adjacency-pair explode over a fixed-name token
    array column ``t``: one row per token, ``prev`` NULL for the first.
    Shared by ``lm_fit`` (counting — every token is exactly one ``cur``,
    every bigram exactly one prev-non-null pair) and ``lm_perplexity``
    (scoring), and memoized (round 13; functions.memo_expr) — the tree
    reads only the fixed-name "t" column, so one build serves every call
    (ccnet_filter, ccnet_apply, every curation batch)."""
    from spark_iforest_spark.functions import memo_expr

    return memo_expr(
        ("lm_scoring_pair_explode",),
        lambda: F.explode(
            F.when(
                F.size("t") >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.size("t")),
                    lambda i: F.struct(
                        F.when(i > 1, F.element_at(F.col("t"), i - 1)).alias("prev"),
                        F.element_at(F.col("t"), i).alias("cur"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
        ),
    )


class LmFitHandle:
    """Releases the vocabulary-sized count relations ``lm_fit`` persists.

    ``lm_fit(..., return_handle=True)`` returns ``(lm, handle)``; call
    ``handle.release()`` once the LM relation has been materialized
    (collected, snapshotted, or written) — sessions that fit many LMs
    would otherwise accumulate cached relations per fit. Idempotent."""

    def __init__(self, *rels: DataFrame):
        self._rels = list(rels)

    def release(self) -> None:
        for r in self._rels:
            r.unpersist()
        self._rels = []


def lm_fit(
    reference: DataFrame, text_col: str = "text", return_handle: bool = False
):
    """Fit a bigram stupid-backoff LM on a trusted reference corpus.

    Returns the frozen LM relation (ord, w1, w2, cnt, ln_micros) — or
    ``(relation, LmFitHandle)`` when ``return_handle=True``, so callers
    that fit many LMs in one session can release the persisted unigram
    count blocks after materializing (``ccnet_filter`` does). The fields:

    * ``ord=2`` rows — one per bigram: ln_micros = snapped
      ln(cnt(w1 w2) / cnt(w1)), the conditional bigram log-probability.
    * ``ord=1`` rows — one per unigram (w2 NULL): snapped ln(cnt(w) / T).
    * one ``ord=0`` row (both NULL, cnt = T): snapped ln(1 / T), the
      out-of-vocabulary floor (an unseen token is priced as one count).

    Stupid backoff (Brants et al. 2007) needs exactly these three pieces;
    the backoff multiplier is applied at SCORING time in integer micro
    space, so the artifact is alpha-free. Scale: ONE corpus pass — a
    single (prev, cur) pair-keyed count shuffle (map-side combined) over
    the reference carries both statistics; unigram counts re-aggregate
    from the bigram-TYPE relation (artifact-sized), plus a vocab-keyed
    join of bigrams to their left-token counts — nothing after the first
    shuffle is keyed by corpus rows. The reference must contain at least
    one token (T >= 1); empty references yield a NULL-ln artifact.
    """
    toks = reference.select(_lm_toks(F.col(text_col)).alias("t"))
    # ONE corpus pass (round 13; was two — a unigram explode+count and a
    # separate bigram explode+count, each re-scanning and re-tokenizing
    # the reference): the scoring-style (prev, cur) pair explode already
    # carries BOTH sufficient statistics. Every token appears exactly once
    # as ``cur`` (so per-cur totals ARE the unigram counts), and the
    # prev-non-null pairs are exactly the bigrams. The explode tree is
    # the SAME memoized expression lm_perplexity scores with
    # (functions.memo_expr key "lm_scoring_pair_explode").
    #
    # The unigram counts re-aggregate from the persisted pair counts —
    # keyed over the bigram-TYPE relation, artifact-sized, never corpus-
    # sized. (A single GROUPING SETS ((prev,cur),(cur)) aggregate was
    # measured too: one shuffle, but its Expand node doubles Catalyst's
    # size estimate for the whole LM subtree and the pinned corpus-side
    # broadcast scoring joins degrade to SortMergeJoin — the two-stage
    # shape keeps the estimates the broadcast decision needs.)
    #
    # persist(), NOT snapshot(), on both count relations: a checkpoint
    # would erase Catalyst's size estimate for the whole LM subtree and
    # the CORPUS-side scoring joins degrade from broadcast to sort-merge
    # (measured 2.55 → 6.2 s at sf0.1, caught by the no-SortMergeJoin
    # plan pin) — persist keeps the logical plan (stats intact) while
    # computing each shuffle once. ``pairs`` feeds two branches (the
    # bigram rows and the unigram re-agg); ``uni`` feeds three (its own
    # rows, the bigram conditional join, the total/OOV aggregate).
    # Release both via return_handle.
    pairs = (
        toks.select(_lm_pair_explode().alias("p"))
        .select("p.prev", "p.cur")
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).persist()
    uni = (
        pairs.groupBy(F.col("cur").alias("w"))
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    ).persist()
    bi = pairs.where(F.col("prev").isNotNull()).select(
        F.col("prev").alias("w1"), F.col("cur").alias("w2"), "cnt"
    )
    total = uni.agg(F.sum("cnt").alias("tot"))
    out = _lm_rows(uni, bi, total)
    if return_handle:
        return out, LmFitHandle(uni, pairs)
    return out


def _snap_ln(x) -> F.Column:
    return F.floor(F.log(x) * F.lit(_LM_MICRO) + F.lit(0.5)).cast("long")


def _lm_rows(uni: DataFrame, bi: DataFrame, total: DataFrame) -> DataFrame:
    """(unigram counts (w, cnt), bigram counts (w1, w2, cnt), total (tot))
    → the frozen LM relation. Shared by ``lm_fit`` (counts from one
    corpus pass) and ``lm_merge`` (counts summed across shard artifacts)
    so both produce bit-identical rows: the snapped log-probabilities are
    pure functions of the exact integer counts."""
    uni_rows = uni.crossJoin(F.broadcast(total)).select(
        F.lit(1).alias("ord"),
        F.col("w").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        "cnt",
        _snap_ln(F.col("cnt").cast("double") / F.col("tot")).alias("ln_micros"),
    )
    bi_rows = bi.join(
        uni.select(F.col("w").alias("w1"), F.col("cnt").alias("c1")), "w1"
    ).select(
        F.lit(2).alias("ord"),
        "w1",
        "w2",
        "cnt",
        _snap_ln(F.col("cnt").cast("double") / F.col("c1")).alias("ln_micros"),
    )
    oov_row = total.select(
        F.lit(0).alias("ord"),
        F.lit(None).cast("string").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        F.col("tot").alias("cnt"),
        _snap_ln(F.lit(1.0) / F.col("tot")).alias("ln_micros"),
    )
    # REBALANCE the artifact (round 13): the plain union carries each
    # branch's partitioning (shuffle_partitions from uni + the same from
    # bi + 1 from oov — 65 partitions locally for a few-hundred-row LM),
    # and EVERY consumer then scans that many near-empty partitions —
    # lm_perplexity's three per-call branch scans made it ~200 tiny tasks
    # per scored batch. The AQE rebalance sizes partitions by bytes
    # (advisoryPartitionSizeInBytes), so a small LM collapses to one
    # partition while a 100 TB-corpus vocabulary still spreads — the
    # scale-adaptive layout a persisted artifact would get from a sane
    # parquet write. One artifact-sized exchange at fit time, paid once,
    # never corpus-keyed; row set unchanged.
    return uni_rows.unionByName(bi_rows).unionByName(oov_row).hint("rebalance")


def _looks_materialized(df: DataFrame) -> bool:
    """Cheap is-this-artifact-materialized heuristic for multi-consume
    relations: a materialized artifact reads as a leaf (parquet Relation,
    snapshot LogicalRDD, persisted InMemoryRelation — cache substitution
    happens before optimization) possibly under projections/filters/
    unions, while a still-lazy fit keeps its Aggregate operators in the
    optimized plan. Unreadable plans count as materialized (stay quiet
    rather than false-alarm)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return True
    return "Aggregate" not in plan


def lm_merge(*lms: DataFrame) -> DataFrame:
    """Merge frozen ``lm_fit`` artifacts into ONE LM — bit-identical to
    fitting on the concatenated reference, without re-reading any text.

    The artifact carries exact integer counts, which are the sufficient
    statistic: merged unigram/bigram counts are plain sums, the total is
    the sum of the ord=0 rows, and the snapped log-probabilities are
    recomputed from the merged counts with the SAME expressions lm_fit
    uses — so ``lm_merge(lm_fit(A), lm_fit(B)) == lm_fit(A ∪ B)``
    exactly (pytest- and gate-pinned; the same fold-lossless discipline
    as table_profile / temperature_budgets). The 100 TB shape: profile
    each reference shard independently — one corpus pass per shard,
    a vocabulary-sized artifact each — persist the artifacts, merge in
    seconds, re-merge when a shard is added or rebuilt. All groupBys
    here are vocabulary-keyed over artifact ROWS, never corpus-keyed.
    Pass MATERIALIZED artifacts (the persisted parquet, or a snapshot of
    a fresh fit): this plan consumes the artifact union four times
    (unigram counts twice, bigram counts, total), so a lazy fit
    re-executes against its reference corpus once per branch — the same
    note as lm_perplexity. The documented footgun now fails LOUDLY
    (round-9 directive): an input whose optimized plan still contains an
    aggregation (i.e. looks like an un-materialized lm_fit, not a
    parquet/snapshot/cached leaf) draws a ``UserWarning`` at build time.
    """
    import warnings
    from functools import reduce

    for i, lm in enumerate(lms):
        if not _looks_materialized(lm):
            warnings.warn(
                f"lm_merge input #{i} looks like an un-materialized lm_fit "
                "plan (its optimized plan still aggregates); this merge "
                "consumes each artifact four times, so the fit would "
                "re-execute against its reference corpus per branch. "
                "Snapshot or persist the artifact first.",
                UserWarning,
                stacklevel=2,
            )
    allrows = reduce(DataFrame.unionByName, lms)
    uni = (
        allrows.where(F.col("ord") == 1)
        .groupBy(F.col("w1").alias("w"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    bi = (
        allrows.where(F.col("ord") == 2)
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("cnt"))
    )
    total = allrows.where(F.col("ord") == 0).agg(F.sum("cnt").alias("tot"))
    return _lm_rows(uni, bi, total)


def lm_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document LM negative-log-likelihood against a frozen lm_fit
    relation: (id, n_tokens, sum_ln_micros, avg_nll_micros).

    Token scoring is stupid backoff in integer micro space: the first
    token scores by its unigram probability; later tokens score by the
    bigram conditional when the (prev, cur) bigram was seen, else by
    ``ln(alpha)`` plus the unigram probability; unseen unigrams fall to
    the OOV floor. ``avg_nll_micros = floor(-sum / n)`` — lower is more
    reference-like (avg_nll = ln(perplexity); exp is monotone, so banding
    on nll IS banding on perplexity, and staying in integer micros keeps
    the relation engine-portable). Docs with zero tokens carry no signal
    and are dropped (documented contract, same as the PSI NULL-row drop).

    Scale: pair explode (2n-1 rows/doc) -> one bigram-keyed left join ->
    one unigram-keyed left join -> one per-doc aggregate with map-side
    combine. The LM joins are vocabulary-keyed: broadcast the LM when it
    fits, else AQE skew-handles the Zipf head, same argument as
    token_typicality. NOTE: ``lm`` is referenced by THREE branches
    (bigram/unigram/OOV) — pass a MATERIALIZED relation (the parquet
    artifact, or checkpoint.snapshot of a fresh fit, as ccnet_filter
    does); a lazy fit plan re-executes against the reference corpus once
    per branch (measured: 12 scans vs 2).
    """
    alpha_micros = int(math.floor(math.log(float(alpha)) * _LM_MICRO + 0.5))
    pairs = docs.select(
        F.col(id_col), _lm_toks(F.col(text_col)).alias("t")
    ).select(id_col, _lm_pair_explode().alias("p")).select(
        id_col, "p.prev", "p.cur"
    )
    bi = lm.where(F.col("ord") == 2).select(
        F.col("w1").alias("prev"), F.col("w2").alias("cur"),
        F.col("ln_micros").alias("ln2"),
    )
    uni = lm.where(F.col("ord") == 1).select(
        F.col("w1").alias("cur"), F.col("ln_micros").alias("ln1")
    )
    oov = lm.where(F.col("ord") == 0).select(F.col("ln_micros").alias("ln_oov"))
    tok_ln = (
        pairs.join(bi, ["prev", "cur"], "left")
        .join(uni, "cur", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            F.col(id_col),
            F.when(F.col("ln2").isNotNull(), F.col("ln2"))
            .when(
                F.col("prev").isNull(), F.coalesce(F.col("ln1"), F.col("ln_oov"))
            )
            .otherwise(
                F.lit(alpha_micros) + F.coalesce(F.col("ln1"), F.col("ln_oov"))
            )
            .alias("ln_micros"),
        )
    )
    return (
        tok_ln.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("ln_micros").alias("sum_ln_micros"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_ln_micros",
            F.floor(
                (-F.col("sum_ln_micros")).cast("double") / F.col("n_tokens")
            )
            .cast("long")
            .alias("avg_nll_micros"),
        )
    )


def perplexity_cutpoints(
    scored: DataFrame,
    fractions: tuple = (0.333333, 0.666667),
    score_col: str = "avg_nll_micros",
    rel_err: float = 0.0,
) -> list:
    """Corpus-fraction band cutpoints over a scored relation — the FROZEN
    half of CCNet banding (the paper computes cutoffs once per language on
    the reference snapshot, then applies them to every shard; recompute =
    a new calibration decision, exactly the drift-cutpoint contract).

    ``rel_err=0`` resolves each fraction f to the exact ceil(f*n)-th
    smallest score via approxQuantile's zero-error path (the flagship
    threshold's pinned convention); at 100 TB pass rel_err > 0 for the
    bounded-memory mergeable GK sketch instead."""
    cuts = scored.approxQuantile(score_col, [float(f) for f in fractions], rel_err)
    if not cuts:
        # approxQuantile returns [] on an empty relation; without this the
        # caller dies later with a bare IndexError deep in perplexity_bands
        # (seen when an upstream quality gate dropped every calibration doc)
        raise ValueError(
            "perplexity_cutpoints: the scored relation is empty — no "
            "corpus rows survived to calibrate on (check the upstream "
            "filters, e.g. gopher thresholds on short synthetic text)."
        )
    return [int(c) for c in cuts]


def perplexity_bands(
    scored: DataFrame,
    cutpoints: list,
    score_col: str = "avg_nll_micros",
) -> DataFrame:
    """Band a scored relation against frozen cutpoints: band 1 ("head",
    most reference-like, score <= cut1), 2 ("middle"), 3 ("tail").
    Pure codegen CASE — zero shuffle, zero Python."""
    c1, c2 = int(cutpoints[0]), int(cutpoints[1])
    return scored.withColumn(
        "band",
        F.when(F.col(score_col) <= c1, 1)
        .when(F.col(score_col) <= c2, 2)
        .otherwise(3),
    )


def ccnet_apply(
    docs: DataFrame,
    lm: DataFrame,
    cutpoints: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    keep_bands: tuple = (1, 2),
) -> DataFrame:
    """Apply a FROZEN CCNet calibration to a new shard: score against a
    persisted ``lm_fit`` relation, band with persisted cutpoints — no
    fit, no quantile pass. This is the paper's production shape and the
    100 TB one: calibrate ONCE on the reference snapshot
    (``lm_fit`` → ``lm_perplexity`` → ``perplexity_cutpoints``, or just
    ``ccnet_filter``), persist (lm, cutpoints), then every crawl shard is
    a single scoring pass — two vocabulary-keyed broadcast joins, one
    map-side-combined per-doc aggregate, a codegen CASE. Recomputing
    cutpoints per shard would be a new calibration decision AND make
    shard outputs incomparable (the drift-cutpoint contract). With
    (lm, cutpoints) frozen from a calibration corpus, ``ccnet_apply``
    over that same corpus reproduces ``ccnet_filter`` exactly
    (gate-pinned). ``lm`` must be MATERIALIZED (parquet / snapshot) —
    the lm_perplexity three-branch note."""
    scored = lm_perplexity(docs, lm, id_col=id_col, text_col=text_col, alpha=alpha)
    banded = perplexity_bands(scored, cutpoints)
    return banded.where(F.col("band").isin(list(keep_bands)))


def ccnet_band_stats(
    docs: DataFrame,
    lm: DataFrame,
    cutpoints: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """(band, n, sum_nll_micros) of ``docs`` scored against a FROZEN
    (lm, cutpoints) calibration — the freshness surface the drift-
    cutpoint contract needs (round 13, mirroring the ANN loop's
    ``ann_baseline_stats``): computed once over the calibration corpus
    it is the BASELINE; computed per ingested batch it is the drift
    signal ``streaming.ccnet_drift_report`` folds. O(#bands) output from
    one scoring pass (two vocabulary-keyed broadcast joins + one
    map-side-combined aggregate) — no corpus state, no quantile job.
    The recovery on alarm is :func:`~spark_iforest_spark.operators.
    recurate.recalibrate_ccnet`."""
    scored = lm_perplexity(docs, lm, id_col=id_col, text_col=text_col, alpha=alpha)
    return (
        perplexity_bands(scored, cutpoints)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("avg_nll_micros").cast("long").alias("sum_nll_micros"),
        )
    )


def ccnet_filter(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    fractions: tuple = (0.333333, 0.666667),
    keep_bands: tuple = (1, 2),
    rel_err: float = 0.0,
) -> DataFrame:
    """One-call CCNet pass: fit the reference LM, score every doc, band by
    corpus fractions, keep head+middle (the paper's default). Returns
    (id, n_tokens, sum_ln_micros, avg_nll_micros, band) for kept docs.
    Zero-token docs carry no LM signal and are not returned (score them
    with length/quality rules instead — gopher_filter)."""
    from spark_iforest_spark.checkpoint import snapshot

    # TWO snapshots, each closing a measured re-execution: the LM relation
    # is referenced three times by the scoring joins (bi/uni/oov branches
    # of one union) — left lazy, each branch re-runs the whole fit
    # against the reference corpus (12 parquet scans in the executed
    # plan; the dsir_estimator total-rescan lesson again). And the
    # cutpoint job plus the caller's banded consumption would each
    # re-execute scoring (3 corpus passes measured at gate sf).
    lm_raw, lm_handle = lm_fit(reference, text_col=text_col, return_handle=True)
    try:
        lm = snapshot(lm_raw)
        scored = snapshot(
            lm_perplexity(docs, lm, id_col=id_col, text_col=text_col, alpha=alpha)
        )
        cuts = perplexity_cutpoints(scored, fractions, rel_err=rel_err)
    finally:
        # the eager cutpoint jobs materialized `scored` (and through it the
        # lm snapshot), so lm_fit's persisted unigram relation is done —
        # release its blocks rather than leaking one cached relation per
        # fit (finally: an empty/failing cutpoint job must not leak either)
        lm_handle.release()
    banded = perplexity_bands(scored, cuts)
    return banded.where(F.col("band").isin(list(keep_bands)))

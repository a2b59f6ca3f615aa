"""Training-data pipeline operators: splits, PII redaction, repetition
quality, benchmark decontamination, sequence packing.

These extend the reference's surface (it is an anomaly-detection library;
SURVEY.md §2 has no data-curation ops) with the curation passes a
large-scale LLM pretraining pipeline runs over a 100 TB corpus. Design
rules shared by every operator here:

* Pure Catalyst expressions — no Python UDFs, no driver collects; per-row
  operators run at scan speed and fuse into the parquet read.
* Deterministic and engine-portable: randomness comes from ``md5`` (bit
  identical in Spark and DuckDB) so every operator has an EXACT SQL twin in
  ``__spark_entry__.oracle_sql`` — including the "random" split.
* Shuffles only where semantics require one, always on a bounded key
  (hash bucket, benchmark n-gram set), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from spark_iforest_spark.functions import (
    check_batch_disjoint,
    tokens,
    word_shingles,
)

# RE2-and-Java-compatible regex subset so the DuckDB oracle's
# regexp_extract_all/regexp_replace produce bit-identical results.
PII_PATTERNS = (
    # (name, pattern, replacement) — applied in this order.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def _md5_u32(col, salt: str) -> F.Column:
    """First 8 hex chars of md5(value|salt) as a uniform integer in
    [0, 2^32). md5 is identical across engines, so assignments derived from
    it are oracle-exact (unlike xxhash64, which DuckDB lacks)."""
    h = F.md5(F.concat_ws("|", col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def split_edges(weights: tuple[float, ...]) -> list[int]:
    """Cumulative u32 bucket edges for ``hash_split`` — exposed so oracle
    SQL can embed the exact same integers (same float accumulation order)."""
    total = float(sum(weights))
    edges = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total
        edges.append(int(acc * 2**32))
    return edges


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    labels: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id.

    The canonical leakage-safe split: membership is a pure function of
    (id, salt), so re-running on a grown corpus never moves an old document
    across splits, and the same row always lands in the same split on any
    cluster layout. Zero shuffle — a per-row projection the optimizer fuses
    into the scan; at 100 TB this is the only split strategy that works
    (a global orderBy+limit split is a full sort).
    """
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    u = _md5_u32(F.col(id_col), salt)
    edges = split_edges(weights)
    expr = F.lit(labels[-1])
    for edge, lab in zip(reversed(edges), reversed(labels[:-1])):
        expr = F.when(u < edge, F.lit(lab)).otherwise(expr)
    return df.withColumn("split", expr)


def packing_efficiency(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """(fill_decile, n_bins) — how full the packed training sequences are.

    The packing QA view: each bin's token sum over the budget, bucketed to
    deciles (10 = at/over budget, where straddlers land). A healthy pack
    concentrates mass at 9-10; a long left tail means the corpus's doc
    length distribution fights the budget (chunk first, or raise it).
    Pure aggregation over ``pack_sequences``'s pinned relation — same
    shuffle profile, externally value-checked via the corpus_histograms
    gate."""
    packed = pack_sequences(
        docs, id_col, text_col, budget_tokens=budget_tokens, n_buckets=n_buckets
    )
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("bin_tokens"))
    decile = F.least(
        F.floor(F.lit(10.0) * F.col("bin_tokens") / F.lit(float(budget_tokens))),
        F.lit(10),
    ).cast("int")
    return bins.groupBy(decile.alias("fill_decile")).agg(
        F.count(F.lit(1)).alias("n_bins")
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic pseudo-random corpus shuffle (+ optional sharding)
    for training-data export.

    Training wants documents in random order, REPRODUCIBLY: the order key
    is md5(id|salt) — a pure function of (id, salt), so the permutation is
    identical on any cluster layout, engine, or rerun, and a new salt is a
    new epoch's permutation (no RNG state to snapshot). Without
    ``n_shards`` the result is globally ordered by the key — one range
    shuffle, the same cost any sorted write pays. With ``n_shards`` each
    row gets ``shard_id = key % n_shards`` (itself pseudo-random and
    layout-independent) and rows are hash-placed by shard and sorted
    (shard_id, key) within partitions — write with
    ``.write.partitionBy("shard_id")`` and each shard directory is an
    internally-shuffled unit the dataloader can consume independently; no
    global total order is ever materialized across shards (the 100 TB
    shape — a single global sort of the corpus is pointless when training
    readers consume shards in parallel anyway).
    """
    u = _md5_u32(F.col(id_col), salt)
    out = df.withColumn("shuffle_key", u)
    if n_shards is None:
        return out.orderBy("shuffle_key", id_col)
    out = out.withColumn(
        "shard_id", (F.col("shuffle_key") % n_shards).cast("int")
    )
    return out.repartition(n_shards, "shard_id").sortWithinPartitions(
        "shard_id", "shuffle_key", id_col
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling by hashed id.

    Keeps a row iff md5_u32(id|salt) < fraction(stratum)·2³² — the
    downsampling primitive for rebalancing a corpus (e.g. cap English at
    50%, keep all low-resource languages). Same leakage-safe properties as
    hash_split: membership is a pure function of (id, salt), stable under
    corpus growth and cluster layout. Zero shuffle — a scan-fused filter;
    at 100 TB this is the only sampler that doesn't need a count first
    (unlike df.sampleBy, whose per-partition RNG also isn't reproducible
    across layouts or engines).
    """
    u = _md5_u32(F.col(id_col), salt)
    edge = F.lit(int(default_fraction * 2**32))
    for stratum, frac in sorted(fractions.items()):
        edge = F.when(F.col(strata_col) == stratum, F.lit(int(frac * 2**32))).otherwise(
            edge
        )
    return df.where(u < edge)


def stratified_sample_k(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat_k",
) -> DataFrame:
    """Deterministic EXACT-k per-stratum sample: rank rows within each
    stratum by md5(id|salt) — a per-stratum uniform random permutation,
    reproducible across layouts and engines — and keep the first ``k``
    (all rows when a stratum has fewer). The exact-count complement of
    :func:`stratified_sample`'s Bernoulli fractions: fixed evaluation
    panels, per-language audit slices, anything where "exactly 10k docs
    per language" is the contract and a binomially-varying count is not.

    Appends ``sample_rank`` (1-based within the stratum, by the same
    permutation) — a stable take-the-first-n handle for nested budgets.

    Scale: the rank filter compiles to WindowGroupLimit (plan-pinned),
    so each task pre-prunes to its local top-k per stratum before the
    single stratum-keyed shuffle — no stratum funnels more than
    partitions·k rows through its window task, and there is no global
    sort. Skew note: one giant stratum still converges on one reducer
    for its final top-k merge; at extreme k·strata skew, pre-aggregate
    with an extra salt level (the salted_join pattern) before ranking.

    Contract: ids must be non-NULL (concat_ws silently skips NULLs, so
    every NULL id would hash identically — and SQL engines that
    NULL-propagate `||` would order them differently); same id-keyed
    precondition as hash_split/shuffle_corpus.
    """
    key = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= int(k))
    )


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
    n_buckets: int = 32,
) -> DataFrame:
    """Token-budget mixture construction: per stratum, a deterministic
    random order (md5-hashed id) with a running token cumsum, keeping every
    document that STARTS before its stratum's budget is exhausted — the
    greedy prefix that builds a pretraining mix ("20B tokens of en, 5B of
    es, ...") in one pass.

    Scale shape — two-pass cumsum so parallelism is #strata × n_buckets,
    not #strata: the order key u is range-bucketed (bucket = u div width,
    monotone in u, so (bucket, u, id) ordering == (u, id) ordering), pass 1
    aggregates per-(stratum, bucket) token totals (a tiny relation) and a
    window over it yields each bucket's starting offset; pass 2 cumsums
    WITHIN each (stratum, bucket) window and adds the broadcast offset.
    Identical relation to the single-window plan (exact integer sums), but
    no per-stratum single-task scan at 100 TB. ``n_buckets=1`` degenerates
    to the single-window plan (used by the equality test). Output keeps
    (n_tokens, cum_tokens) so the budget invariant is externally checkable.
    """
    u = _md5_u32(F.col(id_col), salt)
    n_tok = F.size(tokens(F.col(text_col)))
    budget = F.lit(0)
    for stratum, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == stratum, F.lit(int(b))).otherwise(budget)
    base = df.select(
        F.col(id_col),
        F.col(strata_col),
        u.alias("u"),
        n_tok.alias("n_tokens"),
        budget.alias("_budget"),
    )
    return _budgeted_prefix(base, strata_col, id_col, n_buckets)


def _budgeted_prefix(
    base: DataFrame, strata_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """Shared greedy-prefix core of ``mixture_sample`` /
    ``temperature_mixture``: ``base`` carries (id, stratum, u, n_tokens,
    _budget); keep every row whose stratum-ordered token cumsum STARTS
    below its budget. Bucketed two-pass cumsum per the mixture_sample
    docstring — parallelism #strata × n_buckets, exact integer sums."""
    width = -(-(2**32) // max(1, n_buckets))  # ceil; floor(u/width) ∈ [0, n_buckets)
    base = base.withColumn("_b", F.floor(F.col("u") / F.lit(width)))
    bucket_tot = base.groupBy(strata_col, "_b").agg(F.sum("n_tokens").alias("_bt"))
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        strata_col, "_b", F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy(strata_col, "_b")
        .orderBy("u", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(offsets), [strata_col, "_b"])
        .withColumn("cum_tokens", F.col("_off") + F.sum("n_tokens").over(w_in))
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget"))
        .select(id_col, strata_col, "n_tokens", "cum_tokens")
    )


def temperature_weights(
    df: DataFrame,
    total_budget: int,
    temperature: float,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-sampling
    recipe of mT5/LLaMA-class data pipelines): per stratum with token
    total n_i out of corpus total N, sampling weight
    p_i ∝ (n_i / N)^temperature, renormalized, and a per-stratum token
    budget floor(total_budget · p_i). temperature < 1 upweights
    low-resource strata toward uniform; temperature = 1 is proportional.

    Returns one row per stratum: (stratum, stratum_tokens, weight_ppb,
    budget_tokens). Engine-portable by construction, so the driver's
    DuckDB oracle recomputes it end-to-end: n_i and N are exact integer
    sums; n_i/N and the final floor(total · p/z) are single
    correctly-rounded IEEE ops (bit-identical on identical inputs); the
    one libm call, pow, is snapped to integer parts-per-billion
    (weight_ppb = floor(pow(n_i/N, t)·1e9 + 0.5) — a 1-ulp engine
    difference only matters within ~1e-7 of a snap boundary) and the
    renormalizing sum runs over those exact integers. One aggregate over
    one scan + one tiny (#strata-row) self-broadcast: 100 TB cost is the
    token count, which callers typically already have.
    """
    tot = df.groupBy(strata_col).agg(
        F.sum(F.size(tokens(F.col(text_col)))).alias("stratum_tokens")
    )
    n_total = tot.agg(F.sum("stratum_tokens").alias("_n"))
    ppb = tot.crossJoin(F.broadcast(n_total)).select(
        strata_col,
        "stratum_tokens",
        F.floor(
            F.pow(
                F.col("stratum_tokens").cast("double") / F.col("_n").cast("double"),
                F.lit(float(temperature)),
            )
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("weight_ppb"),
    )
    z = ppb.agg(F.sum("weight_ppb").alias("_z"))
    return ppb.crossJoin(F.broadcast(z)).select(
        strata_col,
        "stratum_tokens",
        "weight_ppb",
        F.floor(
            F.lit(float(int(total_budget)))
            * (F.col("weight_ppb").cast("double") / F.col("_z").cast("double"))
        )
        .cast("long")
        .alias("budget_tokens"),
    )


def temperature_mixture(
    df: DataFrame,
    total_budget: int,
    temperature: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
    n_buckets: int = 32,
) -> DataFrame:
    """``mixture_sample`` with budgets DERIVED instead of dictated:
    splits ``total_budget`` tokens across strata by temperature-scaled
    corpus shares (:func:`temperature_weights`), then takes each
    stratum's deterministic greedy prefix. The one-call "give me a 10B-
    token mix at T=0.7" constructor; same output schema and determinism
    contract as mixture_sample (md5 order, exact integer cumsums)."""
    budgets = temperature_weights(
        df, total_budget, temperature, strata_col=strata_col, text_col=text_col
    ).select(strata_col, F.col("budget_tokens").alias("_budget"))
    u = _md5_u32(F.col(id_col), salt)
    n_tok = F.size(tokens(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.col(strata_col),
        u.alias("u"),
        n_tok.alias("n_tokens"),
    ).join(F.broadcast(budgets), strata_col)
    return _budgeted_prefix(base, strata_col, id_col, n_buckets)


def split_leakage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    labels: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Audit: exact-duplicate content that crosses split boundaries.

    ``hash_split`` assigns by id, so byte-identical texts under DIFFERENT
    ids can land in different splits — the classic route for test-set
    contamination. Returns (content_hash, n_copies, n_splits) for every
    content hash seen in >= 2 splits; an empty result certifies the split
    is leakage-free at the exact-dup level. (Fix = dedup before splitting,
    or split on a content-derived id.) One digest-keyed shuffle with
    map-side combine — same cost shape as exact_dedup.
    """
    s = hash_split(docs, id_col, weights, labels, salt)
    return (
        s.select(F.md5(F.col(text_col)).alias("content_hash"), "split")
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("split").alias("n_splits"),
        )
        .where(F.col("n_splits") >= 2)
    )


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / SSNs / phone numbers / IPv4 addresses.

    Replacements apply sequentially in PII_PATTERNS order, and each count is
    measured on the text AS IT STANDS when that pattern runs — so counts
    always equal the number of replacements actually applied, even when
    categories overlap (an SSN-shaped local part inside an email is consumed
    by the email pass and does NOT increment n_ssn). All JVM-side regex — no
    Python in the path; at 100 TB this is a scan-speed projection. The
    regexes stay inside the RE2 ∩ java.util.regex subset so the DuckDB
    oracle matches exactly.
    """
    out = docs.select(F.col(id_col), F.col(text_col))
    clean = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, repl)
    return out.select(F.col(id_col), *counts, clean.alias("clean_text"))


# Gopher-rule bit positions (Rae et al. 2021 §A1.1, adapted to this
# engine's token conventions). Bit SET in gopher_fail_mask = rule FAILED.
GOPHER_RULE_BITS = (
    ("token_count", 1),      # n_tokens outside [min_tokens, max_tokens]
    ("mean_token_len", 2),   # mean token length outside [3, 10]
    ("symbol_ratio", 4),     # non-alnum-space char ratio > 0.1
    ("alpha_word_frac", 8),  # words containing a letter < 0.8
    ("stopword_hits", 16),   # EN stopword occurrences < 2
    ("dup_token_frac", 32),  # 1 - distinct/total tokens > 0.3
    ("top_token_share", 64), # modal token frequency share > 0.2
    # structural-repetition rules (round 8 — the rest of §A1.1's table)
    ("dup_line_frac", 128),         # duplicate line fraction > 0.3
    ("dup_para_frac", 256),         # duplicate paragraph fraction > 0.3
    ("dup_line_char_frac", 512),    # chars in repeated lines > 0.2
    ("top_2gram_char_frac", 1024),  # chars covered by the modal 2-gram > 0.2
)


def structure_repetition_cols(text_col: str = "text", toks=None) -> list:
    """Gopher §A1.1 structural-repetition signals (round 8): duplicate
    LINE/PARAGRAPH fractions (by count and by character mass) and the
    character share of the most frequent word 2-/3-gram. Boilerplate,
    navigation chrome, and template spam repeat at line/paragraph
    granularity that token-level dup fractions dilute.

    Lines split on newline, paragraphs on blank line; both trimmed with
    empties dropped BEFORE counting so trailing newlines don't dilute.
    ``dup_*_char_frac`` counts the characters of repeat occurrences
    beyond the first (total char mass − distinct char mass);
    ``top_Ngram_char_frac`` is count(modal gram) · len(gram) / doc chars.
    All pure array expressions over one projection — no shuffle, no
    Python; NULL/empty text yields 0.0 everywhere (no signal, no fail).

    ``toks`` takes a PRE-PROJECTED token-array column (round 13): the
    modal-gram builder reads the token array inside a higher-order-
    function lambda, and any non-trivial expression there is re-evaluated
    PER ARRAY ELEMENT (the interpreted HOF path has no subexpression
    caching) — with the default inline tokens() split that made the
    signal O(tokens²) per document. See repetition_cols."""
    txt = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(txt, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    paras = F.filter(
        F.transform(F.split(txt, "\n\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )

    def dup_frac(arr):
        return (
            F.when(
                F.size(arr) > 0,
                F.round(F.lit(1.0) - F.size(F.array_distinct(arr)) / F.size(arr), 6),
            )
            .otherwise(F.lit(0.0))
        )

    def char_sum(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )

    def dup_char_frac(arr):
        tot = char_sum(arr)
        dis = char_sum(F.array_distinct(arr))
        return (
            F.when(tot > 0, F.round((tot - dis).cast("double") / tot, 6))
            .otherwise(F.lit(0.0))
        )

    if toks is None:
        toks = tokens(txt)
    n_chars = F.length(txt)

    def top_gram_char_frac(n: int):
        # zipped shifted slices, not element_at(toks, i+j) in the lambda
        # — substitution-robust linearity (see repetition_cols' grams)
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.arrays_zip(
                    *[
                        F.slice(toks, j + 1, F.size(toks) - (n - 1))
                        for j in range(n)
                    ]
                ),
                lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # modal cover = max over distinct grams of count·len. A naive
        # distinct×filter scan is O(|grams|²) per row — measured 6x slower
        # end-to-end on this panel; sorting first makes equal grams
        # adjacent, so ONE O(n log n) sort + O(n) run-length fold finds
        # the same maximum (run = count, tracked best = max(run·len)).
        walk = F.aggregate(
            F.array_sort(grams),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda a, x: F.struct(
                x.alias("prev"),
                F.when(x == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.greatest(
                    a["best"],
                    (
                        F.when(x == a["prev"], a["run"] + 1)
                        .otherwise(F.lit(1).cast("long"))
                    )
                    * F.length(x),
                ).alias("best"),
            ),
            lambda a: a["best"],
        )
        # overlapping occurrences are each counted in full, so raw cover
        # can exceed the doc length on degenerate repetition — clamp to
        # 1.0 to keep the signal a fraction (the rule compares > 0.2
        # either way)
        return (
            F.when(
                (n_chars > 0) & (F.size(grams) > 0),
                F.least(F.lit(1.0), F.round(walk.cast("double") / n_chars, 6)),
            )
            .otherwise(F.lit(0.0))
        )

    return [
        dup_frac(lines).alias("dup_line_frac"),
        dup_char_frac(lines).alias("dup_line_char_frac"),
        dup_frac(paras).alias("dup_para_frac"),
        dup_char_frac(paras).alias("dup_para_char_frac"),
        top_gram_char_frac(2).alias("top_2gram_char_frac"),
        top_gram_char_frac(3).alias("top_3gram_char_frac"),
    ]


def gopher_rule_mask(
    n_tokens,
    mean_token_len,
    symbol_ratio,
    alpha_word_frac,
    stopword_hits,
    dup_token_frac,
    top_token_share,
    dup_line_frac=None,
    dup_para_frac=None,
    dup_line_char_frac=None,
    top_2gram_char_frac=None,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_token_frac: float = 0.3,
    max_top_token_share: float = 0.2,
    max_dup_line_frac: float = 0.3,
    max_dup_para_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_2gram_char_frac: float = 0.2,
):
    """Pure column combinator: fold the Gopher signals into a rule
    bitmask (GOPHER_RULE_BITS order; 0 = keep). Split out from
    :func:`gopher_filter` so text.signals_panel can derive the mask from
    its already-computed panel columns without recomputing any signal.
    The four structural-repetition signals (round 8) are optional — pass
    None to run the original seven-rule battery unchanged (bits 1..64
    never move). NULL signals (empty documents) fail no rule — NULL
    comparisons are false in both engines, so the contract is
    engine-portable."""
    fails = [
        (1, (n_tokens < int(min_tokens)) | (n_tokens > int(max_tokens))),
        (2, (mean_token_len < float(min_mean_token_len))
            | (mean_token_len > float(max_mean_token_len))),
        (4, symbol_ratio > float(max_symbol_ratio)),
        (8, alpha_word_frac < float(min_alpha_word_frac)),
        (16, stopword_hits < int(min_stopword_hits)),
        (32, dup_token_frac > float(max_dup_token_frac)),
        (64, top_token_share > float(max_top_token_share)),
    ]
    for bit, col, thr in (
        (128, dup_line_frac, float(max_dup_line_frac)),
        (256, dup_para_frac, float(max_dup_para_frac)),
        (512, dup_line_char_frac, float(max_dup_line_char_frac)),
        (1024, top_2gram_char_frac, float(max_top_2gram_char_frac)),
    ):
        if col is not None:
            fails.append((bit, col > thr))
    mask = F.lit(0)
    for bit, cond in fails:
        mask = mask + F.when(cond, F.lit(bit)).otherwise(F.lit(0))
    return mask


def gopher_cols(text_col: str = "text", toks=None) -> list:
    """The two Gopher signals not already on the shared panel factories:
    fraction of tokens containing a letter, and the integer EN-stopword
    occurrence count (quality_cols only exposes the ratio). ``toks``
    takes a pre-projected token-array column (see repetition_cols);
    the lowercased stopword split stays inline — its lambda reads only
    the lambda variable, so the split evaluates once per row."""
    from spark_iforest_spark.functions import EN_STOPWORDS

    if toks is None:
        toks = tokens(F.col(text_col))
    low = tokens(F.lower(F.col(text_col)))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return [
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / F.size(toks), 6
        ).alias("alpha_word_frac"),
        F.size(F.filter(low, lambda t: F.array_contains(sw, t))).alias(
            "stopword_hits"
        ),
    ]


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    **thresholds,
) -> DataFrame:
    """Gopher-style document quality battery (Rae et al. 2021): per doc,
    the eleven rule signals (round 8 adds the structural-repetition
    four), a fail bitmask, and gopher_keep — the
    standard pretraining-corpus first-pass filter. One single-scan
    projection (all array/regexp expressions over the shared ``tokens``
    split — no UDF, no shuffle; fuses into the parquet read at 100 TB);
    ``keep_cols`` passes input columns through so the pass/fail gate
    composes single-scan like clean_corpus. Signals are shared with the
    panel factories (token_stat_cols, repetition_cols), so
    text.signals_panel's gopher columns are equal by construction
    (pytest-pinned); the whole battery is recomputed end-to-end by the
    driver's DuckDB oracle in the text_signals gate."""
    from spark_iforest_spark.operators.text import token_stat_cols

    # project the whitespace split ONCE; the signal factories read it as
    # a cheap column reference inside their HOF lambdas (round 13 — the
    # inline split re-evaluated per array element made the battery
    # O(tokens²) per doc; see repetition_cols). Catalyst keeps the
    # projection (multi-referenced non-cheap expressions are not
    # re-inlined by CollapseProject), so this is still one scan.
    from spark_iforest_spark.functions import memo_expr

    pre = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols if c != text_col],
        F.col(text_col),
        tokens(F.col(text_col)).alias("_toks"),
    )

    # the battery's signal list and rule mask are pure functions of
    # (text_col, thresholds) — memoized (round 13): building this tree is
    # ~0.6 s of driver-side py4j traffic, paid per CALL before memoization
    # (every bench re-run, every streaming batch); the expression objects
    # themselves are immutable and input-name-resolved, so reuse across
    # plans is safe and changes nothing downstream.
    def build_cols():
        _t = F.col("_toks")
        ts = token_stat_cols(text_col, toks=_t)  # n_chars, n_tokens, ...
        rep = repetition_cols(text_col, toks=_t)  # n_tokens, dup_token_frac, ...
        n_chars = F.length(text_col)
        symbol_ratio = F.round(
            (n_chars
             - F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", "")))
            / n_chars,
            6,
        ).alias("symbol_ratio")
        return [
            ts[1], ts[2], symbol_ratio, *gopher_cols(text_col, toks=_t),
            rep[1], rep[2],
            *structure_repetition_cols(text_col, toks=_t),
        ]

    def build_mask():
        return gopher_rule_mask(
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
            **thresholds,
        )

    cols = memo_expr(("gopher_battery_cols", text_col), build_cols)
    mask = memo_expr(
        ("gopher_rule_mask", text_col, tuple(sorted(thresholds.items()))),
        build_mask,
    )
    base = pre.select(F.col(id_col), *[F.col(c) for c in keep_cols], *cols)
    return base.select(
        "*",
        mask.alias("gopher_fail_mask"),
        (mask == 0).alias("gopher_keep"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    * ``dup_token_frac`` — 1 − |distinct tokens| / |tokens| (boilerplate and
      keyword-stuffing detector).
    * ``top_token_share`` — frequency of the modal token / |tokens|.
    * ``dup_bigram_frac`` — 1 − |distinct bigrams| / |bigrams|.

    All array expressions over one pre-projected token split; the modal
    count is an O(n log n) sort + run-length fold (round 13 — see
    repetition_cols). Embarrassingly parallel at corpus scale; no shuffle.
    """
    return docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), *repetition_cols(text_col, toks=F.col("_toks")))


def repetition_cols(text_col: str = "text", toks=None) -> list:
    """Aliased repetition-signal expressions (shared by repetition_stats
    and text.signals_panel).

    ``toks`` takes a PRE-PROJECTED token-array column (round 13). Two
    per-doc superlinearities lived here, invisible on the ~60-token
    synthetic micro-docs but ruinous at realistic 500-5000-token
    documents: (1) expressions referenced inside higher-order-function
    lambdas are re-evaluated per array element (the interpreted HOF path
    has no subexpression caching), so the default inline tokens() split
    cost O(tokens) REGEX SPLITS per row wherever the lambda read it —
    callers on a hot path should project the split once and pass the
    column; (2) the modal-token count was a distinct×filter scan,
    O(tokens²) even over a cheap column reference — replaced by the same
    O(n log n) sort + run-length fold the modal-gram signal uses
    (structure_repetition_cols), value-identical: equal tokens are
    adjacent after the sort, so the longest run IS the modal count."""
    if toks is None:
        toks = tokens(F.col(text_col))
    n = F.size(toks)
    top = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda a: F.when(a["best"] > 0, a["best"]),
    )
    # arrays_zip of two shifted slices, NOT element_at(toks, i) inside
    # the lambda: a lambda that reads the token array re-evaluates it per
    # element wherever an optimizer rule has substituted the projection
    # away (predicate pushdown inlines filter aliases unconditionally —
    # a downstream .where() on these signals restored the O(tokens²)
    # split; round 13). Zip inputs are evaluated once per row always.
    grams = F.when(
        n >= 2,
        F.transform(
            F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1)),
            lambda s: F.concat_ws(" ", s["0"], s["1"]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = F.size(grams)
    return [
        n.alias("n_tokens"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6).alias(
            "dup_token_frac"
        ),
        F.round(top / n, 6).alias("top_token_share"),
        F.when(ng > 0, F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / ng, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    ]


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_contaminated: bool = True,
) -> DataFrame:
    """Drop documents sharing any word n-gram with a benchmark/eval set.

    The standard eval-decontamination pass. Benchmark n-grams (small — eval
    sets are KBs-to-MBs even when the corpus is 100 TB) are broadcast; the
    corpus side streams through a broadcast semi-join at scan speed, so the
    only shuffle is the distinct() over CONTAMINATED ids (a small set).
    ``broadcast_contaminated=False`` falls back to a shuffle anti-join for
    adversarial corpora where contamination is a large fraction.

    Shingle comparison is on xxhash64(n-gram) — 64-bit collisions would
    only ever remove an extra doc (conservative direction for
    decontamination).
    """
    from spark_iforest_spark.functions import memo_expr

    # same memoized tree as dedup._shingle_rows (round 13)
    exploded = memo_expr(
        ("hashed_shingle_rows", n),
        lambda: F.explode(
            F.transform(
                word_shingles(F.col("_toks"), n), lambda s: F.xxhash64(s)
            )
        ),
    )

    def sh(df: DataFrame) -> DataFrame:
        # tokens projected first — word_shingles reads the array inside
        # a HOF lambda (round 13; see repetition_cols)
        return df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_toks")
        ).select(F.col(id_col), exploded.alias("sh"))

    bench_sh = sh(benchmark).select("sh").distinct()
    contaminated = (
        sh(docs)
        .join(F.broadcast(bench_sh), "sh", "left_semi")
        .select(id_col)
        .distinct()
    )
    if broadcast_contaminated:
        contaminated = F.broadcast(contaminated)
    return docs.join(contaminated, id_col, "left_anti")


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization: lowercase + collapse whitespace runs +
    trim — the pre-pass that makes downstream exact/fuzzy dedup keys stable
    against formatting noise. Pure scan-speed projection; output carries
    the md5 so the gate pins the exact normalized bytes without shipping
    full text. Unicode canonicalization is the separate
    :func:`normalize_unicode` pass (round 6) — composition-form NFC needs
    the Unicode tables, which Catalyst lacks."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
    )


def normalize_unicode(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode NFC canonicalization digests: (id, n_chars_raw, n_chars_nfc,
    nfc_md5) for every non-null text.

    Mixed-source crawls carry the same logical string in composed and
    decomposed forms (é vs e+U+0301) — byte-level dedup keys split on
    them unless a canonical form is fixed first. NFC via Python's
    unicodedata in ONE Arrow-batched pass (Catalyst has no normalizer);
    the relation carries lengths + the md5 of the NFC bytes, so the gate
    pins the exact canonical bytes without shipping text — and the DuckDB
    oracle recomputes it end-to-end with its native ``nfc_normalize``
    (agreement probed over combining marks, ligatures, fullwidth forms).
    At 100 TB this is scan-speed Arrow work with zero shuffle; apply the
    same transform to the text column itself before dedup when the corpus
    needs the canonical form materialized."""
    import hashlib
    import unicodedata

    import pandas as pd

    def nfc_batches(it):
        for pdf in it:
            ids, raw_n, nfc_n, digests = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                nfc = unicodedata.normalize("NFC", text)
                ids.append(did)
                raw_n.append(len(text))
                nfc_n.append(len(nfc))
                digests.append(hashlib.md5(nfc.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_chars_raw": raw_n,
                    "n_chars_nfc": nfc_n,
                    "nfc_md5": digests,
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        nfc_batches,
        schema=f"{id_col} long, n_chars_raw long, n_chars_nfc long, nfc_md5 string",
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows (stride =
    chunk_tokens − overlap) — the context-window chunking pass for
    embedding/retrieval pipelines. Every doc yields >= 1 chunk (short docs
    produce one partial chunk). Per-row explode, no shuffle: chunking
    parallelism is corpus parallelism, and downstream per-chunk operators
    (embedding, dedup) see a normal table with (doc_id, chunk_id) identity.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(float(stride)))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "ctoks")
    ).select(
        id_col,
        "chunk_id",
        F.size("ctoks").alias("n_chunk_tokens"),
        F.md5(F.array_join(F.col("ctoks"), " ")).alias("chunk_md5"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    with_text: bool = False,
) -> DataFrame:
    """C4/RefinedWeb-style cross-corpus line deduplication: drop every line
    whose exact text occurs in >= ``min_docs`` DISTINCT documents, keep the
    surviving lines in original order. This is the boilerplate killer (nav
    bars, cookie banners, license headers) that document-level dedup can't
    touch because the documents differ outside the repeated lines.

    Returns (doc_id, n_lines, n_kept, clean_md5) — the md5 of the rebuilt
    text bounds output width while still pinning the exact reconstruction
    (order included) for the oracle. ``with_text=True`` adds the rebuilt
    ``clean_text`` itself (round 8 — composition fodder for
    pretrain_curate; md5(clean_text) == clean_md5 by construction, so the
    digest remains the oracle surface).

    Scale shape: lines are keyed by md5(line) so the count-aggregate
    shuffles 16-byte digests, never line text. The drop decision is an
    anti-join against the HOT digest set only (round 13; was an inner
    join carrying every distinct digest's count): a line survives iff its
    digest is not among the >= min_docs digests, and that hot set is the
    boilerplate vocabulary — a tiny fraction of all distinct lines — so
    the join side collapses from all-digests to offenders-only and AQE
    broadcasts it at realistic scales, removing the full line-text
    shuffle the count-join used to pay. One digest-keyed count shuffle +
    one doc_id regroup; no all-pairs anywhere. 128-bit keys make digest
    collisions negligible; a collision could only MERGE two lines'
    counts — the conservative (over-removal) direction.
    """
    lines = _doc_lines(docs, id_col, text_col)
    hot = (
        lines.groupBy("_h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("_h")
    )
    kept = lines.join(hot, "_h", "left_anti")
    return _rebuild_kept_lines(kept, docs, id_col, text_col, with_text)


def _doc_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line, _h=md5(line)) — one row per document line."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_h", F.md5(F.col("line")))


def _rebuild_kept_lines(
    kept: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    with_text: bool,
) -> DataFrame:
    """Shared rebuild tail of line_dedup / line_dedup_incremental: regroup
    surviving (pos, line) rows per doc in original order, emit
    (id, n_lines, n_kept, clean_md5[, clean_text]) for EVERY input doc
    (a doc with zero surviving lines keeps md5('')/empty text). The
    rebuild tree reads only the fixed-name pos/line columns — memoized
    parameter-free (round 14; functions.memo_expr)."""
    from spark_iforest_spark.functions import memo_expr

    joined = memo_expr(
        ("line_rebuild_joined",),
        lambda: F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ),
    )
    aggs = [F.count(F.lit(1)).alias("n_kept"), F.md5(joined).alias("clean_md5")]
    if with_text:
        aggs.append(joined.alias("clean_text"))
    rebuilt = kept.groupBy(id_col).agg(*aggs)
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    cols = [
        F.col(id_col),
        F.col("n_lines"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    ]
    if with_text:
        cols.append(F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    return totals.join(rebuilt, id_col, "left").select(*cols)


def line_count_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(line_md5, n_docs) — the persistable corpus-state artifact behind
    :func:`line_dedup_incremental`: per distinct line digest, the number
    of distinct documents containing that line. 16-byte digests + counts
    only — never line text — so the 100 TB artifact is boilerplate-
    vocabulary-sized, not corpus-sized. Indexes over DOC-DISJOINT shards
    merge exactly with :func:`merge_line_count_indexes` (distinct-doc
    counts sum when the doc sets are disjoint — the same fold-lossless
    contract as table_profile / lm_merge)."""
    return (
        _doc_lines(docs, id_col, text_col)
        .groupBy(F.col("_h").alias("line_md5"))
        .agg(F.countDistinct(id_col).alias("n_docs"))
    )


def merge_line_count_indexes(*indexes: DataFrame) -> DataFrame:
    """Fold doc-disjoint :func:`line_count_index` artifacts into one —
    plain digest-keyed count sums (exact under disjointness; overlapping
    shards would double-count their shared docs, same caveat as every
    incremental mode's assume-disjoint contract)."""
    from functools import reduce

    return (
        reduce(DataFrame.unionByName, indexes)
        .groupBy("line_md5")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
    )


def line_dedup_incremental(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    with_text: bool = False,
    broadcast_batch: bool = True,
    assume_disjoint_ids: bool = False,
    indexed_ids: DataFrame | None = None,
) -> DataFrame:
    """Line-dedup a NEW batch against an already-indexed corpus: output ==
    ``line_dedup(indexed_corpus ∪ batch)`` restricted to the batch's rows,
    bit-exactly, when the batch's doc ids are disjoint from the indexed
    corpus (gate- and pytest-pinned — the same contract as
    exact_dedup_incremental / minhash_lsh_pairs_incremental). History is
    immutable by design: a batch line that pushes a count over
    ``min_docs`` does not re-clean already-shipped documents — the
    standard append-only curation contract. Refresh the state with
    ``merge_line_count_indexes(index, line_count_index(batch))``.

    Disjointness is a CORRECTNESS precondition here (a re-ingested doc's
    lines would double-count and over-remove), and unlike the minhash
    index this artifact stores no doc ids to supersede against — so the
    guard is default-on (round-9 directive): pass ``indexed_ids`` (the
    indexed corpus's (id) relation — persist it next to the index; ids
    are the cheap column) and overlapping batches raise ``ValueError``,
    or set ``assume_disjoint_ids=True`` to declare ids known-new (the
    normal crawl case) and skip the check.

    Scale: per-batch work only. Batch lines shuffle by digest once for
    their own distinct-doc counts; the corpus-sized index is SEMI-JOINED
    down to the batch's digests — broadcast of the batch digest set by
    default; ``broadcast_batch=False`` falls back to a shuffle semi-join
    for batches whose digest set would not fit the broadcast limit
    (round-9 advice fix, mirroring minhash_lsh_pairs_incremental). Either
    way nothing corpus-sized ever shuffles."""
    check_batch_disjoint(
        batch, indexed_ids, id_col, assume_disjoint_ids, broadcast_batch,
        "line_count_index",
    )
    lines = _doc_lines(batch, id_col, text_col)
    bcounts = lines.groupBy("_h").agg(F.countDistinct(id_col).alias("_bn"))
    idx = index.select(F.col("line_md5").alias("_h"), F.col("n_docs").alias("_in"))
    bkeys = bcounts.select("_h")
    if broadcast_batch:
        bkeys = F.broadcast(bkeys)
    relevant = idx.join(bkeys, "_h", "left_semi")
    # hot-set anti-join (round 13, same shape as line_dedup): only the
    # digests whose batch+index count clears min_docs matter — a
    # batch-bounded offenders set, far smaller than every batch digest —
    # so the lines side anti-joins a relation AQE can broadcast instead
    # of inner-joining the full per-digest count relation.
    hot = (
        bcounts.join(relevant, "_h", "left")
        .where(
            (F.col("_bn") + F.coalesce(F.col("_in"), F.lit(0))) >= min_docs
        )
        .select("_h")
    )
    kept = lines.join(hot, "_h", "left_anti")
    return _rebuild_kept_lines(kept, batch, id_col, text_col, with_text)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 256,
    n_buckets: int = 64,
    partition_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Assign documents to ~budget-token training sequences (bins).

    Deterministic contiguous packing: documents are hash-bucketed
    (md5-derived, oracle-portable), ordered by id within their bucket, and
    a running token cumsum places each doc in bin ``floor((cum−1)/budget)``
    (cumsum clamped to >= 1 so zero-token docs at a bucket head stay in bin
    0 instead of underflowing into the previous bucket's id space).
    A doc straddling a boundary belongs to the bin its cumsum ends in, so
    bins are budget-sized up to one straddler — the usual streaming-pack
    tradeoff, chosen because it needs ONE window pass instead of bin-state.

    Scale: the window partitions by bucket — with n_buckets sized to the
    cluster (e.g. 10k at 100 TB) every partition sorts only corpus/n_buckets
    rows in parallel; nothing is global. Compare a single global cumsum
    window, which would serialize the corpus through one task.

    ``partition_extra`` prepends columns to the packing key (e.g. the split
    label, so training sequences never mix train and test docs); bin_id is
    then unique only WITHIN each partition_extra value — carry those
    columns alongside bin_id downstream.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    bucket = (_md5_u32(F.col(id_col), "pack") % n_buckets).alias("bucket")
    w = (
        Window.partitionBy(*partition_extra, "bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col), *[F.col(c) for c in partition_extra], bucket,
            n_tok.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            (F.col("bucket").cast("long") * F.lit(2**32))
            + F.floor((F.greatest(F.col("cum_tokens"), F.lit(1)) - 1) / budget_tokens),
        )
        .select(id_col, *partition_extra, "bucket", "n_tokens", "bin_id")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169). Select raw-corpus documents whose hashed-bigram
# distribution looks like a small target corpus: fit two bag-of-hashed-
# ngrams models (target, raw), weight each raw doc by its log likelihood
# ratio, then sample without replacement via Gumbel top-k. The standard
# recipe for "give me the 5% of CommonCrawl that looks like Wikipedia".
#
# Engine-portable numerics, same discipline as temperature_weights: counts
# and per-doc weight sums are exact integers; the libm calls (ln; ln-ln for
# the Gumbel noise) are snapped to integer micro-units with floor(x*1e6+0.5)
# so a 1-ulp engine difference only matters within 1e-7 of a snap boundary;
# randomness is md5 so the oracle derives the identical noise.
# ---------------------------------------------------------------------------

_DSIR_MICRO = 1e6


def dsir_grams(text_col) -> F.Column:
    """Unigram + bigram multiset (NOT distinct — DSIR models counts) of the
    whitespace tokens of ``text_col``; NULL text is treated as empty. A
    doc of n tokens contributes 2n-1 grams, so feature extraction is
    linear in corpus tokens."""
    toks = tokens(F.coalesce(text_col, F.lit("")))
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
        ),
    ).otherwise(F.array(F.lit(None)).cast("array<string>"))
    return F.concat(toks, F.filter(bi, lambda g: g.isNotNull()))


def dsir_estimator(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Fit the hashed-ngram importance estimator: one row per feature
    bucket with ``log_ratio_micro`` = snapped micro-units of
    ln((cnt_target+α)/(N_target+α·m)) − ln((cnt_raw+α)/(N_raw+α·m)).

    The m-row result is the FROZEN ARTIFACT of the pipeline (persist it
    with parquet; mirrors the ivf_centers / pq codebook pattern): fit once
    on a sample, then weight/resample any number of raw shards against it.

    Scale: ONE tagged-union explode+groupBy aggregate over BOTH sides
    (round 14; was one aggregate per side + two m-row joins): each side's
    gram stream carries an ``is_t`` flag and the per-bucket counts are
    conditional sums in a single map-side-combined shuffle — half the
    aggregate jobs and one exchange instead of two, with the exact same
    integer counts (a gram contributes to exactly the side it came from;
    the gate's DuckDB oracle pins the result). The gram totals are
    derived from the m-row count relation itself with a window sum
    rather than a separate ``agg``, because Spark does NOT reuse the
    count subtree across the two references (verified on the executed
    plan: the agg-based form re-scanned the corpus for each total — 2
    extra full passes at 100 TB; the window runs over m rows, cost ~0).
    The estimator itself is m rows — broadcastable by construction.
    """
    spark = target.sparkSession
    m = int(n_buckets)
    buckets = spark.range(m).select(F.col("id").alias("bucket"))

    def _grams(df: DataFrame, is_t: bool) -> DataFrame:
        return df.select(
            F.explode(dsir_grams(F.col(text_col))).alias("g"),
            F.lit(is_t).alias("is_t"),
        ).select((_md5_u32(F.col("g"), salt) % m).alias("bucket"), "is_t")

    tagged = _grams(target, True).unionByName(_grams(raw, False))
    tr = tagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("cnt_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cnt_r"),
    )
    counts = buckets.join(tr, "bucket", "left").select(
        "bucket",
        F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
        F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
    )
    return _dsir_rows(counts, m, alpha)


def _dsir_rows(counts: DataFrame, m: int, alpha: float) -> DataFrame:
    """Full-spine (bucket, cnt_t, cnt_r) counts → the frozen estimator
    relation. Shared by ``dsir_estimator`` (counts from one corpus pass)
    and ``dsir_merge`` (counts summed across shard artifacts) so both
    produce bit-identical rows: the snapped log ratios are pure functions
    of the exact integer counts — the _lm_rows discipline."""
    a = float(alpha)
    tot = Window.partitionBy()
    full = counts.select(
        "bucket",
        "cnt_t",
        "cnt_r",
        # exact integer gram totals: Σ bucket counts == count of grams
        F.sum("cnt_t").over(tot).cast("double").alias("_nt"),
        F.sum("cnt_r").over(tot).cast("double").alias("_nr"),
    )
    log_t = F.log((F.col("cnt_t").cast("double") + F.lit(a)) / (F.col("_nt") + F.lit(a * m)))
    log_r = F.log((F.col("cnt_r").cast("double") + F.lit(a)) / (F.col("_nr") + F.lit(a * m)))
    return full.select(
        "bucket",
        "cnt_t",
        "cnt_r",
        F.floor((log_t - log_r) * F.lit(_DSIR_MICRO) + F.lit(0.5))
        .cast("long")
        .alias("log_ratio_micro"),
    )


def dsir_merge(
    *estimators: DataFrame, n_buckets: int = 10_000, alpha: float = 1.0
) -> DataFrame:
    """Merge frozen ``dsir_estimator`` artifacts into ONE — bit-identical
    to fitting on the concatenated (target, raw) corpora, without
    re-reading any text: the artifact's integer bucket counts are the
    sufficient statistic, merged by plain per-bucket sums, and the
    snapped log ratios are recomputed from the merged counts with the
    SAME expressions the fit uses (``_dsir_rows``) — the lm_merge /
    table_profile fold-lossless discipline, gate- and pytest-pinned.

    The 100 TB shape: profile each (target, raw) shard pair
    independently — one corpus pass each, an m-row artifact — persist,
    merge in milliseconds, re-merge when a shard is rebuilt. Everything
    here is m-row-keyed; no corpus is touched. ``n_buckets`` and
    ``alpha`` MUST match the shard fits — and since every shard artifact
    carries its full m-row spine, ``n_buckets`` is VERIFIED against each
    artifact's row count (review fix: a mismatch would silently
    mis-smooth every log ratio with the wrong a·m; the substr/shingle
    indexes record their parameter, here the spine length IS the
    recording). ``alpha`` remains caller-asserted (counts alone cannot
    witness it)."""
    from functools import reduce

    m = int(n_buckets)
    for i, e in enumerate(estimators):
        rows = e.count()
        if rows != m:
            raise ValueError(
                f"dsir_merge: estimator {i} carries {rows} bucket rows but "
                f"n_buckets={m} was requested — shards and merge must use "
                "the same digest space (refit or pass the shards' n_buckets)."
            )
    merged = (
        reduce(DataFrame.unionByName,
               [e.select("bucket", "cnt_t", "cnt_r") for e in estimators])
        .groupBy("bucket")
        .agg(
            F.sum("cnt_t").cast("long").alias("cnt_t"),
            F.sum("cnt_r").cast("long").alias("cnt_r"),
        )
    )
    return _dsir_rows(merged, m, alpha)


def dsir_weights(
    df: DataFrame,
    estimator: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document log importance weight against a fitted estimator:
    (id, logweight_micro) where logweight_micro = Σ_grams
    log_ratio_micro[bucket(gram)] — an exact integer sum, so it is
    engine-portable given the estimator relation.

    Scale: explode grams → broadcast-join the m-row estimator → one
    partial-aggregated groupBy(id). The shuffle carries at most
    min(2n−1, m) rows per doc after map-side combine. ``n_buckets`` and
    ``salt`` MUST match the estimator fit.
    """
    g = df.select(
        F.col(id_col), F.explode(dsir_grams(F.col(text_col))).alias("g")
    ).select(
        id_col, (_md5_u32(F.col("g"), salt) % int(n_buckets)).alias("bucket")
    )
    return (
        g.join(F.broadcast(estimator.select("bucket", "log_ratio_micro")), "bucket")
        .groupBy(id_col)
        .agg(F.sum("log_ratio_micro").alias("logweight_micro"))
    )


def dsir_resample(
    df: DataFrame,
    estimator: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    salt: str = "dsir",
    noise_salt: str = "dsir_g",
) -> DataFrame:
    """Gumbel top-k weighted sampling WITHOUT replacement (the sampling
    step of DSIR): per doc, score_micro = logweight_micro +
    floor(−ln(−ln(u))·1e6 + 0.5) with u = (md5_u32(id|noise_salt)+0.5)/2³²,
    then the global top ``n_docs`` by (score_micro DESC, id ASC). Adding
    independent Gumbel noise to log-weights and taking the top-k draws
    exactly from the importance distribution without replacement — and
    md5-derived u makes the draw deterministic and oracle-recomputable.

    Returns (id, logweight_micro, score_micro). Scale: dsir_weights' one
    grouped shuffle + a TakeOrdered top-k (per-partition heaps, no global
    sort); nothing driver-side but the k results.
    """
    w = dsir_weights(
        df, estimator, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, salt=salt,
    )
    u = (
        _md5_u32(F.col(id_col), noise_salt).cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gumbel = F.floor(-F.log(-F.log(u)) * F.lit(_DSIR_MICRO) + F.lit(0.5)).cast("long")
    return (
        w.select(
            id_col,
            "logweight_micro",
            (F.col("logweight_micro") + gumbel).alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc(id_col))
        .limit(int(n_docs))
    )

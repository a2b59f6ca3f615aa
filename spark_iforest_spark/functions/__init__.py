"""Shared Catalyst expression helpers.

Everything here returns ``pyspark.sql.Column`` built from JVM-side
functions — no Python UDFs — so plans stay inside whole-stage codegen and
the same math can be mirrored 1:1 in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Per-language stopword lists used by lang-id (EN also drives quality
# scoring). Mirrored verbatim in the oracle SQL — keep in sync.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
LANG_STOPWORDS = {
    "en": EN_STOPWORDS,
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "les", "des"],
    "de": ["der", "die", "und", "das", "ein", "ist", "zu", "den"],
}


def tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization; identical to regexp_split_to_array(text,'\\s+')."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, r"\s+")


# Memo for EXPENSIVE Column expression trees (round 13). Building a large
# Catalyst tree from Python is driver-side py4j round-trip work — measured
# 0.6 s per gopher_filter call, 1.0 s per signals_panel, ~0.3-0.8 s for the
# shingle/LM trees — and it recurs on EVERY query build, including each
# bench re-run and every per-batch streaming step. Column objects are
# immutable, name-resolved expression wrappers with no session, data, or
# plan references, so one constructed tree is reusable across any number of
# plans (analysis resolves a fresh copy per plan); caching them caches no
# results and no data. Keys are the factories' full semantic parameter
# tuples; the value is whatever the builder returned (a Column or a list of
# aliased Columns). The JVM-side expression objects live for the driver
# process — the key space is bounded by distinct parameterizations, a
# handful per application.
_EXPR_MEMO: dict = {}


def memo_expr(key: tuple, builder):
    """Return ``builder()`` memoized under ``key`` (module docstring above:
    safe because Column trees are immutable and session-free). Use ONLY for
    pure expression factories — never for DataFrames or anything holding a
    session/plan reference."""
    try:
        return _EXPR_MEMO[key]
    except KeyError:
        val = _EXPR_MEMO[key] = builder()
        return val


def reshape_lines(text_col: str | Column, width: int = 8) -> Column:
    """Reshape a whitespace token stream into newline-separated lines of
    ``width`` tokens. Empty text yields one empty line; whitespace-only
    text yields one line of the space-joined EMPTY tokens (F.split keeps
    leading/trailing empty tokens, so ``' '`` splits to ['', ''] and the
    line is ``' '``) — the DuckDB oracle's regexp_split_to_array mirrors
    the same convention, so both sides agree by construction.
    The synthetic corpus has no natural line structure, so the line-level
    dedup gates AND the pretrain_curate benchmark both impose this one —
    single-sourced here so the benchmarked workload is exactly the shape
    the correctness gate verifies (review fix: the two copies could
    silently drift)."""
    def build():
        toks = tokens(text_col)
        n_lines = F.ceil(F.size(toks) / F.lit(width)).cast("long")
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_lines, F.lit(1)) - 1),
                lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
            ),
            "\n",
        )

    if isinstance(text_col, str):
        return memo_expr(("reshape_lines", text_col, width), build)
    return build()


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces.

    Docs shorter than n tokens contribute their whole token sequence as one
    shingle so every doc has a non-empty shingle set (mirrored in oracle SQL).

    ``tokens_col`` should be a CHEAP column reference (a pre-projected
    token array), not an inline ``tokens(...)`` expression: the per-gram
    lambda slices it, and the interpreted higher-order-function path
    re-evaluates non-trivial expressions per array element — an inline
    regex split makes the shingle set O(tokens²) per doc (round 13;
    callers project the split first).
    """
    whole = F.array(F.array_join(tokens_col, " "))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.array_join(F.slice(tokens_col, i + 1, n), " "),
    )
    return F.array_distinct(F.when(F.size(tokens_col) >= n, grams).otherwise(whole))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns (JVM-side).

    ``F.aggregate`` folds left-to-right in doubles — bit-identical to a
    sequential SQL implementation, which is what makes the cosine queries
    hash-match the DuckDB oracle without fuzzy comparison.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def money(c: Column | str, scale: int = 2) -> Column:
    """Exact-decimal cast for money-like aggregations.

    Summing doubles is order-dependent (partial aggregation shuffles change
    the result run to run at scale); casting each element to DECIMAL first
    makes SUM exact, deterministic, and engine-portable.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def money_units(c: Column | str, scale: int = 4) -> Column:
    """Exact fixed-point units: floor(x * 10^scale) as BIGINT.

    The multiply is one IEEE op — bit-identical in any engine — and floor of
    a double is unambiguous, unlike double→DECIMAL rounding (engines disagree
    on HALF_UP vs round-on-scaled-double in the last decimal). Summing the
    resulting BIGINTs is exact and order-independent; divide by 10^scale at
    the very end. Exact while |sum| * 10^scale < 2^53 (= 9e15; plenty for
    per-group money sums — regroup or raise scale awareness beyond that).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * F.lit(float(10**scale))).cast("long")


def units_to_double(sum_col: Column, scale: int = 4) -> Column:
    return sum_col / F.lit(float(10**scale))


class job_label:
    """Context manager labelling every Spark job submitted inside it
    (``spark.job.description`` local property — the string the UI's Jobs
    table and the REST ``/jobs`` endpoint show). The optimization guide's
    "label your jobs" rule (§1.5), applied to the multi-job operators
    (curation stage list, CC rounds): a 45-job curation run is otherwise
    46 anonymous ``$anonfun`` rows in the UI. Saves and restores the
    caller's own description, so wrapping library internals never
    clobbers an application-level label — callers that set their own
    description see the library labels appended as a suffix. Cost: two
    driver-local property calls per labelled block, no jobs, no data.

    Thread scoping: local properties are per-PYTHON-thread only in
    PySpark's pinned-thread mode (``PYSPARK_PIN_THREAD``, the default
    since Spark 3.2). With pinning disabled, Python threads share JVM
    threads and a label set from a background thread (the LM-fit overlap)
    can clobber the main thread's description — cosmetic only (labels
    never affect results), but worth knowing when reading the UI."""

    def __init__(self, spark, text: str):
        self._sc = spark.sparkContext
        self._text = text

    def __enter__(self) -> None:
        self._prev = self._sc.getLocalProperty("spark.job.description")
        label = f"{self._prev} / {self._text}" if self._prev else self._text
        self._sc.setLocalProperty("spark.job.description", label)

    def __exit__(self, *exc) -> None:
        self._sc.setLocalProperty("spark.job.description", self._prev)


def shuffle_partitions(spark, fallback: int | None = None) -> int:
    """The session's shuffle-partition count as an INT, tolerating
    non-numeric platform values ('auto' under vendor AQE variants —
    round-7 review fix: a bare int() crashed fit at plan-build time
    there). Falls back to ``fallback`` or the context default
    parallelism."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return int(raw)
    except (TypeError, ValueError):
        if fallback is not None:
            return fallback
        return int(spark.sparkContext.defaultParallelism)


def check_batch_disjoint(
    batch,
    indexed_ids,
    id_col: str,
    assume_disjoint_ids: bool,
    broadcast_batch: bool,
    index_name: str,
) -> None:
    """Default-on disjointness guard for the id-less incremental indexes
    (line_count_index / substr_window_index — round-9 directive): their
    artifacts store digests and counts, never doc ids, so a re-ingested
    batch doc would silently double-count and over-remove. Callers must
    either pass ``indexed_ids`` (the indexed corpus's (id) relation —
    persist it next to the index; ids are the cheap column) for an exact
    overlap check, or set ``assume_disjoint_ids=True`` to declare batch
    ids known-new (the normal crawl case).

    Runs ONE bounded action when checking: batch ids (broadcast by
    default) semi-join the indexed id relation, stopping at the first
    overlap row. Raises ``ValueError`` on overlap or when neither the id
    relation nor the declaration is supplied.
    """
    if assume_disjoint_ids:
        return
    if indexed_ids is None:
        raise ValueError(
            f"{index_name} stores no doc ids, so batch/corpus disjointness "
            "cannot be verified from the index alone. Pass indexed_ids= "
            "(the indexed corpus's id relation) to verify, or set "
            "assume_disjoint_ids=True if batch ids are known-new."
        )
    bids = batch.select(F.col(id_col)).distinct()
    if broadcast_batch:
        bids = F.broadcast(bids)
    # take the id column BY NAME when present; a positional grab from a
    # wider/reordered relation would silently compare the wrong column
    # and pass the guard (review fix). Single-column relations of any
    # name (e.g. a bare SELECT id projection) stay accepted.
    if id_col in indexed_ids.columns:
        idx_ids = indexed_ids.select(F.col(id_col))
    elif len(indexed_ids.columns) == 1:
        idx_ids = indexed_ids.select(
            F.col(indexed_ids.columns[0]).alias(id_col)
        )
    else:
        raise ValueError(
            f"indexed_ids has columns {indexed_ids.columns} — pass the id "
            f"relation itself (a {id_col!r} column, or a single-column "
            "projection of it); guessing a column from a wider relation "
            "could silently verify the wrong one."
        )
    overlap = idx_ids.join(bids, id_col, "left_semi").limit(1)
    if not overlap.isEmpty():
        raise ValueError(
            f"batch doc ids overlap the {index_name}'d corpus — incremental "
            "counts would double-count them. Rebuild/merge the index without "
            "the re-ingested docs, or dedup the batch ids first."
        )

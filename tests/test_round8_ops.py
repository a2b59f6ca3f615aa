"""Round-8 operators: temperature-weighted mixture construction,
mergeable incremental table profiles, and the Gopher quality-rule
battery."""

import math

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import pipeline, relational, text


def _docs(spark, n=240):
    rows = []
    for i in range(n):
        lang = ["en", "es", "zh"][i % 3]
        # en docs are longer, so proportional sampling skews en-ward and
        # temperature < 1 visibly rebalances
        n_tok = (14 if lang == "en" else 5) + i % 7
        rows.append((i, " ".join(["tok"] * n_tok), lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ------------------------------------------------- temperature mixture
def test_temperature_weights_hand_computed(spark):
    df = _docs(spark)
    out = {r.lang: r for r in pipeline.temperature_weights(df, 1000, 0.7).collect()}
    tot = {r.lang: r.stratum_tokens for r in
           df.groupBy("lang").agg(F.sum(F.size(F.split("text", r"\s+"))).alias("t")).withColumnRenamed("t", "stratum_tokens").collect()}
    n_total = sum(tot.values())
    ppb = {l: math.floor((t / n_total) ** 0.7 * 1e9 + 0.5) for l, t in tot.items()}
    z = sum(ppb.values())
    for lang, r in out.items():
        assert r.stratum_tokens == tot[lang]
        assert r.weight_ppb == ppb[lang]
        assert r.budget_tokens == math.floor(1000.0 * (ppb[lang] / z))
    # budgets never exceed the total
    assert sum(r.budget_tokens for r in out.values()) <= 1000


def test_temperature_one_is_proportional_and_low_t_flattens(spark):
    df = _docs(spark)
    w1 = {r.lang: r.budget_tokens for r in
          pipeline.temperature_weights(df, 10_000, 1.0).collect()}
    w0 = {r.lang: r.budget_tokens for r in
          pipeline.temperature_weights(df, 10_000, 0.01).collect()}
    tok = {r.lang: r.stratum_tokens for r in
           pipeline.temperature_weights(df, 1, 1.0).collect()}
    n = sum(tok.values())
    # T=1: budget share tracks the corpus share within rounding
    for lang in w1:
        assert abs(w1[lang] / 10_000 - tok[lang] / n) < 0.001
    # T->0: shares approach uniform regardless of corpus share
    for lang in w0:
        assert abs(w0[lang] / 10_000 - 1 / 3) < 0.01
    # low temperature strictly upweights the smallest stratum
    small = min(tok, key=tok.get)
    assert w0[small] > w1[small]


def test_temperature_mixture_equals_mixture_with_derived_budgets(spark):
    df = _docs(spark)
    budgets = {
        r.lang: r.budget_tokens
        for r in pipeline.temperature_weights(df, 800, 0.7).collect()
    }
    via_dict = sorted(map(tuple, pipeline.mixture_sample(df, budgets).collect()))
    direct = sorted(map(tuple, pipeline.temperature_mixture(df, 800, 0.7).collect()))
    assert direct == via_dict and len(direct) > 0


# --------------------------------------------- mergeable table profiles
def test_merge_profiles_equals_one_shot(spark):
    rows = [(i, float(i % 17) / 4, None if i % 5 == 0 else float(i) / 3)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, a double, b double")
    one_shot = sorted(
        map(tuple, relational.table_profile(df, ["a", "b"]).collect())
    )
    shards = [df.where(F.pmod(F.col("k"), F.lit(4)) == i) for i in range(4)]
    partials = None
    for s in shards:
        p = relational.profile_partial(s, ["a", "b"])
        partials = p if partials is None else partials.unionByName(p)
    merged = sorted(map(tuple, relational.merge_profiles(partials).collect()))
    assert merged == one_shot


def test_merge_profiles_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, a double"
    )
    merged = relational.merge_profiles(
        relational.profile_partial(df, ["a"])
    ).collect()[0]
    one = relational.table_profile(df, ["a"]).collect()[0]
    assert tuple(merged) == tuple(one)
    assert merged.n_rows == 0 and merged.mean_value is None


# --------------------------------------------------- gopher rule battery
GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs back to "
    "the barn where it sleeps in a pile of warm hay until the morning sun "
    "rises over the quiet field and all of the animals wake up to eat "
    "their breakfast before the long day of work begins again in earnest"
)


def test_gopher_filter_planted_cases(spark):
    df = spark.createDataFrame(
        [
            (0, GOOD),                                    # passes everything
            (1, "too short"),                             # token_count (1)
            (2, GOOD + " " + "#$%^&*" * 200),             # symbols (4)
            (3, ("999 111 222 333 " * 20) + "the of and in is it"),  # alpha (8)
            (4, " ".join(f"w{i}" for i in range(60))),    # stopwords (16)
            (5, "the " * 60),                             # dup/top (32+64)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pipeline.gopher_filter(df).collect()}
    assert out[0].gopher_fail_mask == 0 and out[0].gopher_keep
    assert out[1].gopher_fail_mask & 1
    assert out[2].gopher_fail_mask & 4
    assert out[3].gopher_fail_mask & 8
    assert out[4].gopher_fail_mask & 16
    assert out[5].gopher_fail_mask & 32 and out[5].gopher_fail_mask & 64
    assert all(not out[i].gopher_keep for i in range(1, 6))


def test_gopher_thresholds_are_tunable(spark):
    df = spark.createDataFrame([(0, "five short words here now")],
                               "doc_id long, text string")
    strict = pipeline.gopher_filter(df).collect()[0]
    lax = pipeline.gopher_filter(
        df, min_tokens=2, min_stopword_hits=0
    ).collect()[0]
    assert strict.gopher_fail_mask & 1 and strict.gopher_fail_mask & 16
    assert not (lax.gopher_fail_mask & 1) and not (lax.gopher_fail_mask & 16)


def test_signals_panel_gopher_columns_match_gopher_filter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    cols = [
        "doc_id", "symbol_ratio", "alpha_word_frac", "stopword_hits",
        "gopher_fail_mask", "gopher_keep",
    ]
    panel = sorted(map(tuple, text.signals_panel(docs).select(*cols).collect()))
    solo = sorted(map(tuple, pipeline.gopher_filter(docs).select(*cols).collect()))
    assert panel == solo and len(panel) == 200


def test_gopher_filter_keep_cols_passthrough_single_scan(spark):
    df = spark.createDataFrame(
        [(0, GOOD, "web"), (1, "x", "books")],
        "doc_id long, text string, source string",
    )
    out = pipeline.gopher_filter(df, keep_cols=("source",)).collect()
    assert {r.source for r in out} == {"web", "books"}


# ------------------------------------------------------------- DSIR
def _dsir_corpus(spark):
    """120 raw docs: half 'code-like' (distinct vocabulary), half
    'prose-like'; the target corpus is 12 held-out code-like docs."""
    code = ["def", "return", "import", "class", "lambda", "yield"]
    prose = ["the", "quick", "brown", "fox", "jumped", "over"]
    rows = []
    for i in range(120):
        vocab = code if i % 2 == 0 else prose
        toks = [vocab[(i + j) % 6] for j in range(10)]
        rows.append((i, " ".join(toks)))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt_rows = [
        (1000 + i, " ".join(code[(i + j) % 6] for j in range(10))) for i in range(12)
    ]
    target = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    return raw, target


def test_dsir_selects_target_like_docs(spark):
    raw, target = _dsir_corpus(spark)
    est = pipeline.dsir_estimator(target, raw, n_buckets=512)
    top = pipeline.dsir_resample(raw, est, 40, n_buckets=512).collect()
    assert len(top) == 40
    # code-like docs are even ids; weight mass must concentrate there
    n_code = sum(1 for r in top if r.doc_id % 2 == 0)
    assert n_code >= 36
    # scores are logweight + Gumbel noise, sorted descending
    scores = [r.score_micro for r in top]
    assert scores == sorted(scores, reverse=True)


def test_dsir_weights_are_exact_integer_sums(spark):
    raw, target = _dsir_corpus(spark)
    est = pipeline.dsir_estimator(target, raw, n_buckets=512)
    lut = {r.bucket: r.log_ratio_micro for r in est.collect()}
    w = {r.doc_id: r.logweight_micro for r in
         pipeline.dsir_weights(raw, est, n_buckets=512).collect()}
    # recompute one doc's weight by hand from the estimator relation
    import hashlib
    row = raw.where(F.col("doc_id") == 0).collect()[0]
    toks = row.text.split(" ")
    grams = toks + [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    def u32(s, salt="dsir"):
        return int(hashlib.md5(f"{s}|{salt}".encode()).hexdigest()[:8], 16)
    expect = sum(lut[u32(g) % 512] for g in grams)
    assert w[0] == expect
    assert all(isinstance(v, int) for v in w.values())


def test_dsir_estimator_layout_invariant(spark):
    raw, target = _dsir_corpus(spark)
    a = pipeline.dsir_estimator(target.repartition(3), raw.repartition(17),
                                n_buckets=256).collect()
    b = pipeline.dsir_estimator(target.repartition(7), raw.repartition(2),
                                n_buckets=256).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_resample_deterministic_and_bounded(spark):
    raw, target = _dsir_corpus(spark)
    est = pipeline.dsir_estimator(target, raw, n_buckets=256)
    a = pipeline.dsir_resample(raw, est, 25, n_buckets=256).collect()
    b = pipeline.dsir_resample(raw.repartition(13), est, 25, n_buckets=256).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # n_docs >= corpus: every doc comes back
    all_rows = pipeline.dsir_resample(raw, est, 10_000, n_buckets=256).collect()
    assert len(all_rows) == 120


def test_dsir_null_and_empty_text(spark):
    raw = spark.createDataFrame(
        [(0, None), (1, ""), (2, "def return def"), (3, "fox brown fox")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "def return")], "doc_id long, text string")
    est = pipeline.dsir_estimator(target, raw, n_buckets=64)
    w = {r.doc_id: r.logweight_micro for r in
         pipeline.dsir_weights(raw, est, n_buckets=64).collect()}
    # NULL and '' both tokenize to the single empty-string token — present,
    # deterministic, identical weights
    assert set(w) == {0, 1, 2, 3}
    assert w[0] == w[1]
    # same length, target-like vs not: the target-like doc wins (weights
    # are whole-doc log-likelihood sums, so only same-length docs compare)
    assert w[2] > w[3]


# ------------------------------------------- exact-substring dedup
from spark_iforest_spark.operators import dedup as _dedup


def test_substr_spans_identical_docs_keep_first(spark):
    base = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different text here now ok")],
        "doc_id long, text string",
    )
    spans = _dedup.exact_substring_spans(df, window=8).collect()
    # doc 1 is the keeper for every window; doc 2 fully covered; doc 3 clean
    assert {r.doc_id for r in spans} == {2}
    assert spans[0].start == 0 and spans[0].end == 20
    cut = {r.doc_id: r for r in
           _dedup.remove_repeated_substrings(df, window=8).collect()}
    assert cut[1].n_kept == cut[1].n_tokens == 20
    assert cut[2].n_kept == 0
    assert cut[3].n_kept == cut[3].n_tokens


def test_substr_spans_shared_prefix_only(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, shared + " unique one tail x y z"),
         (2, shared + " other ending entirely different q r")],
        "doc_id long, text string",
    )
    spans = {r.doc_id: (r.start, r.end) for r in
             _dedup.exact_substring_spans(df, window=6).collect()}
    # only the later doc's copy of the shared prefix is cut
    assert set(spans) == {2}
    assert spans[2] == (0, 10)


def test_substr_within_doc_repetition_merges_intervals(spark):
    df = spark.createDataFrame(
        [(1, "p q r s " * 4 + "end marker here")], "doc_id long, text string"
    )
    spans = _dedup.exact_substring_spans(df, window=4).collect()
    # repeats of the same 4-token phrase inside ONE doc: the first
    # occurrence is the keeper, the rest merge into a single span
    assert len(spans) == 1
    s = spans[0]
    assert s.start > 0 and s.end >= 12


def test_substr_keep_first_false_cuts_everything(spark):
    base = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame([(1, base), (2, base)], "doc_id long, text string")
    cut = {r.doc_id: r.n_kept for r in _dedup.remove_repeated_substrings(
        df, window=6, keep_first=False).collect()}
    assert cut == {1: 0, 2: 0}


def test_substr_layout_invariant_and_short_docs(spark):
    rows = [(i, " ".join(f"t{j % 9}" for j in range(i % 15))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, _dedup.remove_repeated_substrings(
        df.repartition(3), window=5).collect()))
    b = sorted(map(tuple, _dedup.remove_repeated_substrings(
        df.repartition(17), window=5).collect()))
    assert a == b
    # docs shorter than the window are never cut
    short = [t for t in a if t[1] < 5]
    assert short and all(t[1] == t[2] for t in short)


# ------------------------------------------- containment pairs
def test_containment_detects_quote_jaccard_misses(spark):
    quoted = " ".join(f"q{i}" for i in range(12))
    filler = " ".join(f"f{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, quoted), (2, quoted + " " + filler)],
        "doc_id long, text string",
    )
    pairs = _dedup.ngram_containment_pairs(df, threshold=0.9).collect()
    assert len(pairs) == 1
    p = pairs[0]
    # doc 1 is fully contained in doc 2; jaccard is far below any dedup cut
    assert p.containment_a == 1.0
    assert p.containment_b < 0.2 and p.jaccard < 0.2
    # a jaccard threshold that would catch near-dups misses the quote
    assert _dedup.ngram_jaccard_pairs(df, threshold=0.8).count() == 0


def test_containment_consistent_with_jaccard_on_symmetric_dups(spark):
    base = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "something else entirely here ok fine")],
        "doc_id long, text string",
    )
    p = _dedup.ngram_containment_pairs(df, threshold=0.6).collect()
    assert len(p) == 1
    assert p[0].containment_a == p[0].containment_b == p[0].jaccard == 1.0


def test_containment_skew_guard_matches_unguarded_on_cold_shingles(spark):
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(10))) for i in range(20)]
    rows.append((100, rows[0][1]))  # one exact dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, _dedup.ngram_containment_pairs(df).collect()))
    b = sorted(map(tuple, _dedup.ngram_containment_pairs(
        df, max_shingle_df=100).collect()))
    assert a == b and len(a) == 1


# ------------------------------------------------- CCNet perplexity filter
def _lm_ref(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the mat"),
            (2, "a cat and a dog"),
        ],
        "doc_id long, text string",
    )


def _snap(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def test_lm_fit_hand_computed(spark):
    lm = {
        (r["ord"], r["w1"], r["w2"]): (r["cnt"], r["ln_micros"])
        for r in text.lm_fit(_lm_ref(spark)).collect()
    }
    # T = 6 + 6 + 5 = 17 tokens; 'the' appears 4x
    assert lm[(1, "the", None)] == (4, _snap(4 / 17))
    # bigram 'the cat' once, left count('the') = 4
    assert lm[(2, "the", "cat")] == (1, _snap(1 / 4))
    # 'sat on' twice of count('sat') = 2 -> ln(1) = 0
    assert lm[(2, "sat", "on")] == (2, 0)
    # OOV floor row
    assert lm[(0, None, None)] == (17, _snap(1 / 17))


def test_lm_perplexity_all_backoff_paths(spark):
    """One doc exercising all four scoring paths: first-token unigram,
    bigram hit, alpha-backoff to a seen unigram, and the OOV floor."""
    ref = _lm_ref(spark)
    lm = text.lm_fit(ref)
    # 'mat' (first token, unigram 2/17) -> 'mat cat' (unseen bigram, seen
    # unigram 'cat' 2/17, alpha) -> 'cat sat' (seen bigram 1/2) ->
    # 'sat zzz' (OOV: alpha + ln(1/17))
    docs = spark.createDataFrame([(0, "mat cat sat zzz")], "doc_id long, text string")
    alpha_m = math.floor(math.log(0.4) * 1e6 + 0.5)
    expected_sum = (
        _snap(2 / 17)
        + (alpha_m + _snap(2 / 17))
        + _snap(1 / 2)
        + (alpha_m + _snap(1 / 17))
    )
    row = text.lm_perplexity(docs, lm).collect()[0]
    assert row["n_tokens"] == 4
    assert row["sum_ln_micros"] == expected_sum
    assert row["avg_nll_micros"] == math.floor(-expected_sum / 4)


def test_ccnet_filter_keeps_fluent_drops_garbage(spark):
    ref = _lm_ref(spark)
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),     # in-distribution -> head
            (1, "the dog sat on the mat"),
            (2, "a cat and a dog"),
            (3, "qzx wvu plk mnb qzx wvu"),    # OOV soup -> tail
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"]: r["band"] for r in text.ccnet_filter(docs, ref).collect()}
    assert 3 not in kept          # garbage banded tail and dropped
    assert set(kept) == {0, 1, 2}
    assert kept[0] in (1, 2)


def test_lm_fit_layout_invariant_and_parquet_roundtrip(spark, tmp_path):
    ref = _lm_ref(spark)
    a = sorted(map(tuple, text.lm_fit(ref).collect()))
    b = sorted(map(tuple, text.lm_fit(ref.repartition(7)).collect()))
    assert a == b
    docs = spark.createDataFrame(
        [(0, "the cat sat zzz"), (1, "dog mat")], "doc_id long, text string"
    )
    path = str(tmp_path / "lm")
    text.lm_fit(ref).write.parquet(path)
    direct = sorted(map(tuple, text.lm_perplexity(docs, text.lm_fit(ref)).collect()))
    frozen = sorted(
        map(tuple, text.lm_perplexity(docs, spark.read.parquet(path)).collect())
    )
    assert direct == frozen and len(direct) == 2


def test_lm_zero_token_docs_dropped(spark):
    ref = _lm_ref(spark)
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    out = text.lm_perplexity(docs, text.lm_fit(ref))
    assert [r["doc_id"] for r in out.collect()] == [0]


def test_perplexity_bands_cutpoint_convention(spark):
    """Cutpoints must resolve to the exact ceil(f*n)-th smallest score and
    the CASE banding must reproduce a brute-force tercile split."""
    ref = _lm_ref(spark)
    rows = [(i, "the cat sat on the mat " + ("zzz " * (i % 5))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = text.lm_perplexity(docs, text.lm_fit(ref))
    vals = sorted(r["avg_nll_micros"] for r in scored.collect())
    n = len(vals)
    cuts = text.perplexity_cutpoints(scored)
    assert cuts == [
        vals[math.ceil(n * 0.333333) - 1],
        vals[math.ceil(n * 0.666667) - 1],
    ]
    banded = {r["doc_id"]: r["band"] for r in
              text.perplexity_bands(scored, cuts).collect()}
    for r in scored.collect():
        v = r["avg_nll_micros"]
        exp = 1 if v <= cuts[0] else (2 if v <= cuts[1] else 3)
        assert banded[r["doc_id"]] == exp


# ------------------------------------- structural repetition (Gopher §A1.1)
def test_structure_repetition_planted_cases(spark):
    df = spark.createDataFrame(
        [
            (0, GOOD),
            (1, "copy me\ncopy me\ncopy me\nunique line"),      # dup lines
            (2, "para one\n\npara one\n\npara two"),            # dup paragraphs
            (3, "spam spam spam spam spam spam other words"),   # modal 2-gram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pipeline.gopher_filter(df).collect()}
    # doc 1: 4 lines, 3 identical -> dup_line_frac 0.5 (1 - 2/4), char
    # frac = 2*7/(3*7+11)
    assert out[1].dup_line_frac == 0.5
    assert out[1].gopher_fail_mask & 128 and out[1].gopher_fail_mask & 512
    # doc 2: paragraphs ['para one','para one','para two'] -> 1 - 2/3
    assert out[2].dup_para_frac == 0.333333
    assert out[2].gopher_fail_mask & 256
    # doc 3: 'spam spam' x5 of 7 grams, cover 5*9/44 > 1 -> clamped 1.0
    assert out[3].top_2gram_char_frac == 1.0
    assert out[3].gopher_fail_mask & 1024
    # clean doc trips none of the structural rules
    assert out[0].gopher_fail_mask & (128 | 256 | 512 | 1024) == 0
    # empty / NULL text: every structural signal is 0.0 (checked on the
    # column factory directly — the full gopher battery's OTHER signals
    # predate round 8 and assume non-empty text under ANSI division)
    edge = spark.createDataFrame([(4, ""), (5, None)], "doc_id long, text string")
    for r in edge.select(
        "doc_id", *pipeline.structure_repetition_cols("text")
    ).collect():
        assert r.dup_line_frac == 0.0 and r.dup_para_char_frac == 0.0
        assert r.top_2gram_char_frac == 0.0 and r.top_3gram_char_frac == 0.0


def test_top_gram_run_fold_matches_bruteforce(spark):
    """The O(n log n) sorted-run fold must equal a brute-force modal-gram
    count·len scan on adversarial token streams."""
    import random

    rng = random.Random(8)
    rows = []
    for i in range(40):
        toks = [rng.choice(["a", "bb", "ccc", "dd", "e"]) for _ in range(rng.randrange(0, 25))]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.top_2gram_char_frac, r.top_3gram_char_frac)
        for r in df.select("doc_id", *pipeline.structure_repetition_cols("text")).collect()
    }
    for i, txt in rows:
        toks = txt.split(" ") if txt else [""]
        n_chars = len(txt)
        exp = []
        for n in (2, 3):
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)] \
                if len(toks) >= n else []
            if n_chars > 0 and grams:
                cover = max(grams.count(g) * len(g) for g in set(grams))
                exp.append(min(1.0, round(cover / n_chars, 6)))
            else:
                exp.append(0.0)
        assert got[i] == tuple(exp), (i, txt, got[i], exp)


# --------------------------------------------- pretrain_curate composition
def test_with_text_matches_digest(spark):
    """with_text mode must emit exactly the text whose md5 the digest
    column pins — for both rebuild operators."""
    from spark_iforest_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (0, "keep one\nBOILER\nkeep two"),
            (1, "BOILER\nother text"),
            (2, "a b c d e f g h a b c d e f g h tail"),
        ],
        "doc_id long, text string",
    )
    ld = pipeline.line_dedup(df, min_docs=2, with_text=True)
    for r in ld.collect():
        import hashlib

        assert hashlib.md5(r["clean_text"].encode()).hexdigest() == r["clean_md5"]
    rs = dd.remove_repeated_substrings(df, window=8, with_text=True)
    for r in rs.collect():
        import hashlib

        assert hashlib.md5(r["clean_text"].encode()).hexdigest() == r["clean_md5"]
    # and the with_text variant changes no digest vs the plain one
    a = sorted((r["doc_id"], r["clean_md5"]) for r in ld.collect())
    b = sorted(
        (r["doc_id"], r["clean_md5"])
        for r in pipeline.line_dedup(df, min_docs=2).collect()
    )
    assert a == b


def test_pretrain_curate_stages_and_equality(spark):
    """Each stage drops its planted target, and the one-call composition
    equals hand-chaining the constituent operators."""
    from spark_iforest_spark.operators import corpus as cps
    from spark_iforest_spark.operators import dedup as dd

    good = (
        "the quick brown fox jumps over a lazy dog and then it runs back "
        "to the barn where it sleeps in a pile of warm hay until the sun "
        "rises over the quiet field and all of the animals wake up to eat "
        "their breakfast before the long day of work begins in earnest"
    )
    rows = [
        (0, good),
        (1, good.replace("fox", "cat")),          # near-dup of 0
        (2, "tiny"),                              # gopher: token_count
        (3, good + "\nSHARED BOILER LINE"),       # line dedup target
        (4, good.replace("dog", "owl") + "\nSHARED BOILER LINE"),
        (5, None),                                # dropped up front
        (6, ""),                                  # dropped up front
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cps.pretrain_curate(docs, substr_window=None, neardup=True)
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 2 not in kept and 5 not in kept and 6 not in kept
    # the boiler line was rebuilt out, not the whole docs dropped
    survivors_with_line = [t for t in kept.values() if "SHARED BOILER LINE" in t]
    assert survivors_with_line == []
    # near-dup cluster {0,1} collapsed to one representative
    assert len({0, 1} & set(kept)) == 1
    # equality with hand-chaining
    cur = docs.where(F.length(F.coalesce(F.col("text"), F.lit(""))) > 0).select(
        "doc_id", "text"
    )
    keep = (
        pipeline.gopher_filter(cur).where("gopher_keep").select("doc_id")
    )
    cur = cur.join(keep, "doc_id", "left_semi")
    ld = pipeline.line_dedup(cur, min_docs=2, with_text=True)
    cur = ld.select("doc_id", F.col("clean_text").alias("text")).where(
        F.length("text") > 0
    )
    cur = dd.drop_near_duplicates(cur, "doc_id", "text")
    manual = sorted(map(tuple, cur.collect()))
    assert sorted(map(tuple, out.collect())) == manual


def test_pretrain_funnel_counts_and_final_stage(spark):
    """The funnel's per-stage rows must be monotone non-increasing, stage
    names in chain order, and the final stage's (n_docs, n_tokens) must
    equal aggregating pretrain_curate's own output."""
    from spark_iforest_spark.operators import corpus as cps

    good = (
        "the quick brown fox jumps over a lazy dog and then it runs back "
        "to the barn where it sleeps in a pile of warm hay until the sun "
        "rises over the quiet field and all of the animals wake up to eat "
        "their breakfast before the long day of work begins in earnest"
    )
    rows = [
        (0, good),
        (1, good.replace("fox", "cat")),
        (2, "tiny"),                               # gopher kill
        (3, good + "\nSHARED BOILER LINE"),        # line-dedup rebuild
        (4, good.replace("dog", "owl") + "\nSHARED BOILER LINE"),
        (5, None),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(line_min_docs=2, substr_window=None, neardup=True)
    fun = cps.pretrain_funnel(docs, **kw).orderBy("stage_idx").collect()
    assert [r["stage"] for r in fun] == ["input", "gopher", "line_dedup", "neardup"]
    assert fun[0]["n_docs"] == 5  # NULL + empty dropped up front
    for a, b in zip(fun, fun[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    out = cps.pretrain_curate(docs, **kw)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+"))).alias("n_tokens"),
    ).collect()[0]
    assert (fun[-1]["n_docs"], fun[-1]["n_tokens"]) == (
        agg["n_docs"],
        agg["n_tokens"],
    )


def test_pretrain_curate_stage_snapshots_bound_scans(spark, sf_dir):
    """Stage boundaries must be snapshot points: every rebuild stage
    consumes its input ~3× (line_dedup: lines self-join + totals;
    ExactSubstr: spans join + rebuild), so a fully lazy chain re-executes
    the whole upstream pipeline once per consumption, multiplicatively.
    With snapshots, the composed output's plan sees upstream stages as
    LogicalRDDs — near-zero parquet scans survive in the final relation."""
    from spark_iforest_spark.operators import corpus as cps
    from spark_iforest_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cps.pretrain_curate(docs, neardup=False)  # gopher + line + substr
    assert formatted_plan(out).count("Scan parquet") <= 2
    # curate_corpus: the snapshotted keep-id relation caps the quality/lang
    # battery at ONE execution (14 scans -> 6 in the round-8 audit)
    cc = cps.curate_corpus(docs, benchmark=docs.where("doc_id % 100 = 0"))
    assert formatted_plan(cc).count("Scan parquet") <= 8


def test_pretrain_curate_ccnet_stage_drops_tail(spark):
    from spark_iforest_spark.operators import corpus as cps

    good = (
        "the quick brown fox jumps over a lazy dog and then it runs back "
        "to the barn where it sleeps in a pile of warm hay until the sun "
        "rises over the quiet field and all of the animals wake up to eat "
        "their breakfast before the long day of work begins in earnest"
    )
    rows = [(i, good.replace("fox", f"fox{i}")) for i in range(6)] + [
        (10, "qzx wvu plk mnb tyu qzx wvu plk mnb tyu"),  # OOV soup -> tail
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cps.pretrain_curate(
        docs,
        reference=docs.where("doc_id < 6"),
        gopher=False,
        line_min_docs=None,
        substr_window=None,
        neardup=False,
    )
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 10 not in kept
    for i in range(6):
        assert i in kept and kept[i] == rows[i][1]


def test_pretrain_curate_substr_stage_cuts_repeats(spark):
    from spark_iforest_spark.operators import corpus as cps

    filler = "alpha beta gamma delta epsilon zeta eta theta "
    rows = [
        (0, (filler * 3) + "unique tail closes the document"),
        (1, "entirely different words that never repeat anywhere at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cps.pretrain_curate(
        docs, gopher=False, line_min_docs=None, substr_window=8, neardup=False
    )
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    # the repeated 8-token window was cut beyond its first occurrence
    assert kept[0].count("alpha beta gamma") == 1
    assert kept[0].endswith("unique tail closes the document")
    assert kept[1] == rows[1][1]


def test_lm_scoring_plan_broadcasts_and_bounded_scans(spark, sf_dir):
    """Scale pins for the CCNet scoring plan: with a materialized LM (the
    documented contract) every LM join is a broadcast — no corpus-sized
    shuffle join — and the corpus is scanned a bounded number of times
    (lazy-LM re-execution measured 12 scans; snapshot keeps it <= 3)."""
    from spark_iforest_spark.checkpoint import snapshot
    from spark_iforest_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = snapshot(text.lm_fit(docs.where("lang = 'en'")))
    plan = formatted_plan(text.lm_perplexity(docs, lm))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("Scan parquet") <= 3


def test_lm_merge_equals_oneshot(spark, sf_dir):
    """Sharded fit + artifact merge == one-shot fit, BIT-exact: the
    artifact's integer counts are the sufficient statistic, and lm_merge
    recomputes the snapped log-probs from the merged counts with the
    same expressions (round 9 — the fold-lossless mergeable-profile
    discipline applied to the CCNet reference LM)."""
    from spark_iforest_spark.checkpoint import snapshot

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    full = sorted(map(tuple, text.lm_fit(docs).collect()))
    shards = [
        snapshot(text.lm_fit(docs.where(F.col("doc_id") % 3 == i)))
        for i in range(3)
    ]
    merged = sorted(map(tuple, text.lm_merge(*shards).collect()))
    assert merged == full and full
    # layout invariance of the merge itself
    merged2 = sorted(
        map(tuple, text.lm_merge(*[s.repartition(7) for s in shards]).collect())
    )
    assert merged2 == full


def test_lm_merge_tolerates_empty_shard(spark):
    """A shard whose reference slice was empty contributes a NULL-ln
    artifact (documented lm_fit contract); merging it must be a no-op."""
    ref = _lm_ref(spark)
    empty = ref.where(F.lit(False))
    a = sorted(map(tuple, text.lm_fit(ref).collect()))
    b = sorted(
        map(tuple, text.lm_merge(text.lm_fit(ref), text.lm_fit(empty)).collect())
    )
    assert a == b and a


def test_line_dedup_incremental_equals_full_restricted(spark, sf_dir):
    """The incremental contract: cleaning a disjoint NEW batch against
    line_count_index(rest) == line_dedup(whole corpus) restricted to the
    batch's rows, bit-exact (text included) — per-batch work only, the
    index is digests + counts."""
    from spark_iforest_spark.functions import reshape_lines

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("text", reshape_lines("text", 8))
    )
    batch = docs.where(F.col("doc_id") % 4 == 0)
    rest = docs.where(F.col("doc_id") % 4 != 0)
    full = sorted(
        map(
            tuple,
            pipeline.line_dedup(docs, with_text=True)
            .where(F.col("doc_id") % 4 == 0)
            .collect(),
        )
    )
    incr = sorted(
        map(
            tuple,
            pipeline.line_dedup_incremental(
                batch, pipeline.line_count_index(rest), with_text=True,
                assume_disjoint_ids=True,
            ).collect(),
        )
    )
    assert incr == full and full


def test_line_count_index_merge_equals_oneshot(spark, sf_dir):
    """Doc-disjoint shard indexes fold exactly: merge of 3 slices == the
    one-shot index (distinct-doc counts sum under disjointness)."""
    from spark_iforest_spark.functions import reshape_lines

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("text", reshape_lines("text", 8))
    )
    one = sorted(map(tuple, pipeline.line_count_index(docs).collect()))
    merged = sorted(
        map(
            tuple,
            pipeline.merge_line_count_indexes(
                *[
                    pipeline.line_count_index(
                        docs.where(F.col("doc_id") % 3 == i)
                    )
                    for i in range(3)
                ]
            ).collect(),
        )
    )
    assert merged == one and one


def test_ccnet_apply_frozen_equals_filter(spark, sf_dir):
    """The production shard path — score + band against FROZEN
    (lm, cutpoints), no refit, no quantile pass — reproduces
    ccnet_filter's end-to-end relation exactly when the artifacts come
    from the same calibration corpus."""
    from spark_iforest_spark.checkpoint import snapshot

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    ref = docs.where(F.col("lang") == "en")
    via_filter = sorted(map(tuple, text.ccnet_filter(docs, ref).collect()))
    lm_raw, handle = text.lm_fit(ref, return_handle=True)
    try:
        lm = snapshot(lm_raw)
        cuts = text.perplexity_cutpoints(snapshot(text.lm_perplexity(docs, lm)))
    finally:
        handle.release()
    via_apply = sorted(map(tuple, text.ccnet_apply(docs, lm, cuts).collect()))
    assert via_apply == via_filter and via_filter

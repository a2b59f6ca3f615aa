"""Tests for the training-data curation operators (operators/pipeline.py).

Covers the contracts the driver gates pin at sf0.01, plus the properties a
gate can't see: split stability under corpus growth, progressive PII count
semantics (overlapping categories), a planted contaminated doc, and the
pack_sequences bin-size/zero-token invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import pipeline


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "sphinx of black quartz judge my vow"),
        (4, "a a a a a a a a"),  # maximally repetitive
        (5, "one two"),  # shorter than shingle n
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- hash_split
def test_hash_split_partitions_and_is_deterministic(docs):
    out = pipeline.hash_split(docs).select("doc_id", "split").collect()
    assert {r.split for r in out} <= {"train", "val", "test"}
    again = pipeline.hash_split(docs).select("doc_id", "split").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_hash_split_stable_under_corpus_growth(spark):
    """Growing the corpus must never move an existing doc across splits —
    the property that makes the hash split leakage-safe over recrawls."""
    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in pipeline.hash_split(small).collect()}
    b = {r.doc_id: r.split for r in pipeline.hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_hash_split_weights_approximate(spark):
    n = 5000
    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    counts = dict(
        pipeline.hash_split(df).groupBy("split").count().rdd.map(tuple).collect()
    )
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_hash_split_validates_weights(docs):
    with pytest.raises(ValueError):
        pipeline.hash_split(docs, weights=(0.5, 0.5), labels=("a", "b", "c"))


# ------------------------------------------------------------- redact_pii
def test_redact_pii_counts_and_replacements(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or alice@test.org today"),
            (2, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pipeline.redact_pii(df).collect()}
    assert out[1].n_email == 2 and "<EMAIL>" in out[1].clean_text
    assert "bob@example.com" not in out[1].clean_text
    r2 = out[2]
    assert (r2.n_ssn, r2.n_phone, r2.n_ipv4) == (1, 1, 1)
    assert "<SSN>" in r2.clean_text and "<PHONE>" in r2.clean_text and "<IP>" in r2.clean_text
    r3 = out[3]
    assert (r3.n_email, r3.n_ssn, r3.n_phone, r3.n_ipv4) == (0, 0, 0, 0)
    assert r3.clean_text == "clean text with no pii at all"


def test_redact_pii_progressive_counts_on_overlap(spark):
    """An SSN-shaped email local part is consumed by the email pass, so it
    must NOT increment n_ssn (counts reflect replacements actually applied)."""
    df = spark.createDataFrame(
        [(1, "reach 123-45-6789@x.com and real ssn 987-65-4321")],
        "doc_id long, text string",
    )
    r = pipeline.redact_pii(df).collect()[0]
    assert r.n_email == 1
    assert r.n_ssn == 1  # only the standalone SSN
    assert r.clean_text == "reach <EMAIL> and real ssn <SSN>"


# ------------------------------------------------------- repetition_stats
def test_repetition_stats_extremes(docs):
    out = {r.doc_id: r for r in pipeline.repetition_stats(docs).collect()}
    # doc 4: 8 copies of one token -> dup_token_frac = 1 - 1/8, share = 1.0
    assert out[4].n_tokens == 8
    assert out[4].dup_token_frac == pytest.approx(1 - 1 / 8)
    assert out[4].top_token_share == 1.0
    assert out[4].dup_bigram_frac == pytest.approx(1 - 1 / 7)
    # doc 1: all-unique tokens
    assert out[1].dup_token_frac == 0.0
    assert out[1].top_token_share == pytest.approx(1 / 8)
    assert out[1].dup_bigram_frac == 0.0


def test_repetition_stats_single_token(spark):
    df = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    r = pipeline.repetition_stats(df).collect()[0]
    assert r.n_tokens == 1 and r.dup_bigram_frac == 0.0


# ---------------------------------------------------------- decontaminate
def test_decontaminate_drops_planted_doc(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "totally unrelated corpus document about cooking pasta"),
            # shares the 3-gram "benchmark answer is" with the bench doc
            (2, "leaked: the benchmark answer is forty two my friend"),
            (3, "another clean document describing mountain hiking trails"),
        ],
        "doc_id long, text string",
    )
    survivors = {r.doc_id for r in pipeline.decontaminate(docs, bench).collect()}
    assert survivors == {1, 3}


def test_decontaminate_shuffle_antijoin_variant_matches(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma something else here"), (2, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    a = {r.doc_id for r in pipeline.decontaminate(docs, bench).collect()}
    b = {
        r.doc_id
        for r in pipeline.decontaminate(
            docs, bench, broadcast_contaminated=False
        ).collect()
    }
    assert a == b == {2}


# --------------------------------------------------------- pack_sequences
def test_pack_sequences_bin_invariants(spark):
    n, budget = 400, 64
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        # token counts vary 1..20 deterministically
        F.concat_ws(
            " ", F.array_repeat(F.lit("tok"), (F.col("id") % 20 + 1).cast("int"))
        ).alias("text"),
    )
    out = pipeline.pack_sequences(df, budget_tokens=budget, n_buckets=8).collect()
    assert len(out) == n
    # bin ids nest inside their bucket's 2^32 id space
    assert all(r.bin_id // 2**32 == r.bucket for r in out)
    # each bin's token total stays under budget + one straddler (max doc = 20)
    from collections import defaultdict

    per_bin = defaultdict(int)
    for r in out:
        per_bin[r.bin_id] += r.n_tokens
    assert all(total <= budget + 20 for total in per_bin.values())


def test_pack_sequences_zero_token_doc_stays_in_own_bucket(spark):
    """ADVICE regression: an empty doc at the head of a bucket must get
    bin 0 of ITS bucket, not underflow into the previous bucket's space."""
    df = spark.createDataFrame(
        [(i, "") for i in range(50)] + [(50 + i, "a b c") for i in range(50)],
        "doc_id long, text string",
    )
    # "" splits to [''] (1 token) under \s+ split semantics; force a true
    # zero-token doc via null-ish whitespace handling instead: use n_tokens
    # computed by the operator itself and assert no negative bin offset.
    out = pipeline.pack_sequences(df, budget_tokens=16, n_buckets=4).collect()
    assert all(r.bin_id - r.bucket * 2**32 >= 0 for r in out)


def test_pack_sequences_deterministic(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("one two three four").alias("text")
    )
    a = sorted(map(tuple, pipeline.pack_sequences(df).collect()))
    b = sorted(map(tuple, pipeline.pack_sequences(df).collect()))
    assert a == b


# -------------------------------------------------- stratified / mixture
def test_stratified_sample_rates_and_stability(spark):
    n = 4000
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    out = pipeline.stratified_sample(df, {"en": 0.5, "zh": 0.1}).collect()
    got = {}
    for r in out:
        got[r.lang] = got.get(r.lang, 0) + 1
    assert abs(got["en"] / (n / 2) - 0.5) < 0.05
    assert abs(got["zh"] / (n / 2) - 0.1) < 0.03
    # default fraction 0.0 drops unlisted strata entirely
    only_en = pipeline.stratified_sample(df, {"en": 0.5}).collect()
    assert all(r.lang == "en" for r in only_en)
    # membership is stable under corpus growth (same property as hash_split)
    small = {r.doc_id for r in pipeline.stratified_sample(df.where("doc_id < 1000"), {"en": 0.5, "zh": 0.1}).collect()}
    big = {r.doc_id for r in out}
    assert small == {d for d in big if d < 1000}


def test_mixture_sample_budget_invariants(spark):
    rows = []
    for i in range(300):
        lang = ["en", "es", "zh"][i % 3]
        rows.append((i, " ".join(["tok"] * (5 + i % 30)), lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    budgets = {"en": 400, "es": 150}
    out = pipeline.mixture_sample(df, budgets).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "es"}  # zh has no budget -> excluded
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: r.cum_tokens)
        # every selected doc STARTS under budget; total <= budget + straddler
        assert all(r.cum_tokens - r.n_tokens < budgets[lang] for r in docs)
        assert docs[-1].cum_tokens < budgets[lang] + max(r.n_tokens for r in docs)
        # the selection is a contiguous cumsum prefix
        cums = [r.cum_tokens for r in docs]
        toks = [r.n_tokens for r in docs]
        assert all(cums[i] == cums[i - 1] + toks[i] for i in range(1, len(docs)))
    # deterministic across invocations
    again = pipeline.mixture_sample(df, budgets).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mixture_sample_subbucket_equals_single_window(spark):
    """The two-pass sub-bucketed cumsum (n_buckets>1, the 100x-parallel
    plan) must emit the exact relation of the single-window plan
    (n_buckets=1) on a forced multi-partition layout."""
    rows = []
    for i in range(400):
        lang = ["en", "es", "zh", "fr"][i % 4]
        rows.append((i * 7 + 3, " ".join(["tok"] * (3 + i % 41)), lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").repartition(7)
    budgets = {"en": 500, "es": 120, "fr": 1}
    single = sorted(map(tuple, pipeline.mixture_sample(df, budgets, n_buckets=1).collect()))
    bucketed = sorted(map(tuple, pipeline.mixture_sample(df, budgets, n_buckets=8).collect()))
    assert single == bucketed and len(single) > 0


# ---------------------------------------------------------- split_leakage
def test_split_leakage_detects_cross_split_dups(spark):
    # same text under 60 different ids: ids hash across splits, so the
    # shared content must be flagged; unique texts must not be
    rows = [(i, "the exact same leaked document text") for i in range(60)]
    rows += [(100 + i, f"unique document number {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    leaks = pipeline.split_leakage(df).collect()
    assert len(leaks) == 1
    assert leaks[0].n_copies == 60 and leaks[0].n_splits >= 2


def test_split_leakage_empty_when_deduped(spark):
    df = spark.createDataFrame(
        [(i, f"unique document number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    assert pipeline.split_leakage(df).count() == 0


# ---------------------------------------------------------- curate_corpus
def test_curate_corpus_composition(spark):
    from spark_iforest_spark.operators import corpus

    good = (
        "the cat and the dog sat in a big warm house and it is a good day "
        "to read of the things in the world and talk of it all"
    )
    rows = [
        (0, good),
        (1, good),  # exact dup of 0 -> dropped (rep is 0)
        (2, good + " extra words of the day"),  # survives (near-dup ok, exact-dedup only)
        (3, "zzz qqq xxx"),  # low quality -> dropped
        (100, good + " benchmark marker phrase here"),  # shares 3-grams with 0/2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") == 100)
    out = corpus.curate_corpus(docs, benchmark=bench).collect()
    # everything sharing benchmark n-grams is gone, as are dups/low quality
    assert out == []
    # without a benchmark: quality+dedup filtering and packing still apply
    out2 = {r.doc_id: r for r in corpus.curate_corpus(docs).collect()}
    assert set(out2) == {0, 2, 100}
    for r in out2.values():
        assert r.split in ("train", "val", "test")
        assert r.bin_id // 2**32 == r.bucket


def test_curate_corpus_bins_never_cross_splits(spark):
    from spark_iforest_spark.operators import corpus

    filler = "the of and a to in is it good day word line part time"
    docs = spark.createDataFrame(
        [(i, f"{filler} number {i} {filler}") for i in range(400)],
        "doc_id long, text string",
    )
    out = corpus.curate_corpus(docs, budget_tokens=64, n_buckets=4).collect()
    assert len(out) == 400  # all pass quality/lang, no dups
    per_bin_splits = {}
    for r in out:
        per_bin_splits.setdefault((r.split, r.bin_id), set()).add(r.split)
    # bin_id is only unique within a split; (split, bin_id) keys must each
    # contain exactly one split value, and distinct splits must exist
    assert all(len(v) == 1 for v in per_bin_splits.values())
    assert len({s for s, _ in per_bin_splits}) == 3


def test_normalize_text(spark):
    docs = spark.createDataFrame(
        [(1, "  Hello   WORLD "), (2, "already normal")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pipeline.normalize_text(docs).collect()}
    import hashlib

    assert out[1]["norm_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out[1]["n_chars_norm"] == len("hello world")
    assert out[2]["norm_md5"] == hashlib.md5(b"already normal").hexdigest()


def test_chunk_documents_overlap(spark):
    import hashlib

    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = sorted(
        pipeline.chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 2 over 10 tokens: ceil((10-2)/2) = 4 chunks
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
    # chunk 1 covers tokens 3..6 (overlap of 2 with chunk 0)
    assert out[1]["chunk_md5"] == hashlib.md5(" ".join(words[2:6]).encode()).hexdigest()
    # last chunk is full here (tokens 7..10)
    assert out[3]["n_chunk_tokens"] == 4
    assert out[3]["chunk_md5"] == hashlib.md5(" ".join(words[6:10]).encode()).hexdigest()


def test_chunk_documents_short_doc(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = pipeline.chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1
    assert out[0]["chunk_id"] == 0 and out[0]["n_chunk_tokens"] == 2


def test_shuffle_corpus_layout_invariant_and_epochal(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = [r["doc_id"] for r in pipeline.shuffle_corpus(docs.repartition(3)).collect()]
    b = [r["doc_id"] for r in pipeline.shuffle_corpus(docs.repartition(17)).collect()]
    assert a == b  # the permutation is a pure function of (id, salt)
    assert a != sorted(a)  # and it actually shuffles
    c = [r["doc_id"] for r in pipeline.shuffle_corpus(docs, salt="epoch2").collect()]
    assert c != a  # a new salt is a new epoch's permutation


def test_shuffle_corpus_shards_partition_and_balance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    out = pipeline.shuffle_corpus(docs, n_shards=8)
    rows = out.select("doc_id", "shard_id", "shuffle_key").collect()
    n = docs.count()
    assert len(rows) == n  # disjoint union: nothing lost or duplicated
    assert len({r["doc_id"] for r in rows}) == n
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert set(by_shard) == set(range(8))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * min(sizes)  # md5 uniformity keeps shards balanced
    # shard assignment is the same pure function on any layout
    again = {
        r["doc_id"]: r["shard_id"]
        for r in pipeline.shuffle_corpus(docs.repartition(5), n_shards=8)
        .select("doc_id", "shard_id")
        .collect()
    }
    assert all(again[r["doc_id"]] == r["shard_id"] for r in rows)


def test_shuffle_corpus_is_scan_fused_projection(spark, sf_dir):
    # the no-shard variant's only exchange is the final range sort; the
    # key computation itself adds no shuffle
    from spark_iforest_spark.plans import count_shuffles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    assert count_shuffles(pipeline.shuffle_corpus(docs)) <= 2  # range sort only


def test_normalize_unicode_canonical_equivalence(spark):
    """Composed and decomposed forms of the same logical string must get
    the same NFC digest; nulls drop; ASCII is identity."""
    rows = [
        (0, "café"),            # é composed
        (1, "café"),           # e + combining acute (decomposed)
        (2, "plain ascii"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from spark_iforest_spark.operators import pipeline

    out = {r["doc_id"]: r for r in pipeline.normalize_unicode(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["nfc_md5"] == out[1]["nfc_md5"]  # canonical equivalence
    assert out[1]["n_chars_raw"] == 5 and out[1]["n_chars_nfc"] == 4
    assert out[2]["n_chars_raw"] == out[2]["n_chars_nfc"] == 11

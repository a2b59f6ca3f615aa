"""Dedup operator tests on tiny inline corpora with known duplicates."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import dedup
from spark_iforest_spark.plans import assert_no_broadcast_of

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat today"),  # near dup of 0
    (3, "completely different words about spark and parquet files"),
    (4, "short text"),  # < 3 tokens: whole-text shingle
    (5, "short text"),  # exact dup of 4
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).collect()
    by_rep = {r["rep_doc_id"]: r["n_copies"] for r in out}
    assert by_rep[0] == 2  # docs 0,1
    assert by_rep[4] == 2  # docs 4,5
    assert by_rep[2] == 1
    assert len(out) == 4  # 4 distinct texts


def test_ngram_jaccard_exact_pairs(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert out[(0, 1)] == 1.0  # identical
    assert out[(4, 5)] == 1.0  # identical short docs via whole-text shingle
    assert (0, 2) in out and 0.5 <= out[(0, 2)] < 1.0
    assert not any(3 in pair for pair in out)


def test_minhash_matches_exact(docs):
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # identical pairs always collide in every band; near-dups at j>=0.5 are
    # probabilistic but this corpus is far above the S-curve knee
    assert lsh == exact


def test_minhash_signature_table_never_broadcasts(spark, docs):
    # The signature and shingle tables are corpus-sized (one row per
    # document): the code must never FORCE either to broadcast. Stats-driven
    # broadcasts (Catalyst seeing tiny test-scale tables) are fine — disable
    # the threshold so any BroadcastExchange left could only come from an
    # explicit F.broadcast() hint, and assert there are none anywhere.
    from spark_iforest_spark.plans import formatted_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "BroadcastExchange" not in formatted_plan(dedup.minhash_lsh_pairs(docs))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_band_buckets_mixed_sign(spark):
    # band 0 (shift 0) sees the raw signed sim: a signed % would bucket a
    # negative sim differently from a positive sim with identical low bits.
    # sims differ only in the top bit -> band 0..2 buckets equal, band 3 not.
    neg = -(1 << 63) | 0x1234_5678_9ABC_DEF0
    pos = 0x1234_5678_9ABC_DEF0
    df = spark.createDataFrame([(neg,), (pos,)], "sim long").select(
        dedup._band_buckets(F.col("sim"), 4, 16).alias("b")
    )
    b_neg, b_pos = [r["b"] for r in df.collect()]
    assert b_neg[:3] == b_pos[:3]
    assert b_neg[3] != b_pos[3]
    assert all(0 <= v <= 0xFFFF for v in b_neg + b_pos)


def test_simhash_subset_of_exact(docs):
    # simhash output = hamming<=3 AND jaccard>=t: a (verified) subset of the
    # exact relation that always contains the exact duplicates (hamming 0)
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    sh = {(r["doc_a"], r["doc_b"]): (r["hamming"], r["jaccard"]) for r in
          dedup.simhash_pairs(docs, threshold=0.5).collect()}
    assert set(sh) <= set(exact)
    for pair, (ham, jac) in sh.items():
        assert ham <= 3
        assert jac == exact[pair]
    assert sh[(0, 1)] == (0, 1.0)
    assert sh[(4, 5)] == (0, 1.0)


def test_max_shingle_df_skew_guard(docs):
    # with a df cap of 1 every shared shingle is dropped -> no pairs survive
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_shingle_df=1).collect()
    assert out == []


def test_embedding_cosine_pairs(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.001, 0.0]),  # ~parallel to 0
            (2, [0.0, 1.0, 0.0]),    # orthogonal
        ],
        ["vec_id", "embedding"],
    )
    out = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
           dedup.embedding_cosine_pairs(emb, threshold=0.9).collect()}
    assert list(out) == [(0, 1)]
    assert out[(0, 1)] > 0.999


def test_embedding_lsh_matches_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
             dedup.embedding_cosine_pairs(emb, threshold=0.4).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
           dedup.embedding_lsh_pairs(emb, threshold=0.4).collect()}
    assert exact, "expected qualifying pairs in synthetic embeddings"
    assert lsh == exact


def test_embedding_lsh_plan_is_bucketed(spark, sf_dir):
    # no O(n²) nested-loop join, and the corpus table must never be forced
    # to the broadcast side (stats-driven broadcasts disabled to isolate)
    from spark_iforest_spark.plans import formatted_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = dedup.embedding_lsh_pairs(emb, threshold=0.4)
        assert "NestedLoop" not in formatted_plan(df)
        assert_no_broadcast_of(df, "MapInPandas")
        assert_no_broadcast_of(df, "Scan parquet")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_embedding_lsh_table_sizing_by_threshold():
    # recall math: high thresholds are cheap, low thresholds visibly not
    import math

    def tables_for(t, b=4, eps=1e-6):
        p = 1.0 - math.acos(t) / math.pi
        return max(1, math.ceil(math.log(eps) / math.log1p(-(p**b))))

    assert tables_for(0.9) < 25
    assert tables_for(0.4) > 60


def test_planted_neardups_at_sf0001(spark, sf_dir):
    # the synthetic corpus has planted near-dup pairs at j >= 0.9
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = set(map(tuple, dedup.ngram_jaccard_pairs(docs, threshold=0.8)
                    .select("doc_a", "doc_b").collect()))
    lsh = set(map(tuple, dedup.minhash_lsh_pairs(docs, threshold=0.8)
                  .select("doc_a", "doc_b").collect()))
    assert exact, "expected planted near-dups in synthetic documents"
    assert lsh == exact


def test_dup_clusters_long_chain_and_injected_edges(spark):
    # 8-doc chain of sliding 12-token windows (stride 2 over unique tokens):
    # adjacent docs share 8/12 shingles (j=0.67 >= 0.5), distance-2 docs only
    # 6/14 (j=0.43 < 0.5) — so the graph is a true path with diameter 7,
    # needing ~3 propagation rounds; exercises the localCheckpoint path
    toks = [f"w{i:02d}" for i in range(30)]
    chain = [(i, " ".join(toks[2 * i : 2 * i + 12])) for i in range(8)]
    df = spark.createDataFrame(chain, ["doc_id", "text"])
    out = {r["doc_id"]: r["cluster_rep"] for r in
           dedup.dup_clusters(df, threshold=0.5).collect()}
    assert out == {i: 0 for i in range(8)}
    # injected edge source: same result when the pair relation is minhash's
    # (bands=32 per the minhash docstring — chain pairs sit at j=0.67, far
    # below the r=8 S-curve knee)
    out2 = {r["doc_id"]: r["cluster_rep"] for r in
            dedup.dup_clusters(
                df, pairs=dedup.minhash_lsh_pairs(df, threshold=0.5, bands=32)
            ).collect()}
    assert out2 == out


def test_dup_clusters_path_graph_log_rounds(spark):
    """Round-6 convergence pin: on a path graph of length 2^k the hook+jump
    loop must finish in O(k) rounds — the old one-hop propagation took
    2^k rounds on exactly this shape (boilerplate chains, the pathological
    component SCALE.md worries about). 256 nodes, k=8: geometric label
    travel plus the final no-change confirmation round lands well under
    2k; assert <= 2k + 2 = 18 with margin to spare."""
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i, "x") for i in range(n)], "doc_id long, text string")
    out = {r["doc_id"]: r["cluster_rep"] for r in
           dedup.dup_clusters(docs, pairs=edges).collect()}
    assert out == {i: 0 for i in range(n)}
    assert dedup.dup_clusters.last_rounds <= 18, dedup.dup_clusters.last_rounds


def test_dup_clusters_transitive(spark):
    # doc chain 0-1-2 must land in ONE cluster labeled by min id, even
    # though (0,2) are not a near-dup pair directly
    chain = [
        (0, "aa bb cc dd ee ff gg hh ii jj"),
        (1, "aa bb cc dd ee ff gg hh ii kk"),   # near-dup of 0
        (2, "aa bb cc dd ee ff gg hh ll kk"),   # near-dup of 1, not of 0
        (3, "totally different words here right now ok fine yes sure"),
    ]
    df = spark.createDataFrame(chain, ["doc_id", "text"])
    out = {r["doc_id"]: r["cluster_rep"] for r in
           dedup.dup_clusters(df, threshold=0.5).collect()}
    assert out == {0: 0, 1: 0, 2: 0}


def test_dup_clusters_minhash_edges_match_jaccard_edges(spark):
    """The scale edge source (minhash-LSH pairs) must produce the exact
    same clusters as the exact n-gram Jaccard edge source."""
    from spark_iforest_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " ok"),  # near dup of 0/1
        (3, "completely different text about mountain weather patterns"),
        (4, "completely different text about mountain weather patterns"),  # dup of 3
        (5, "a lone unique document with nothing in common whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.dup_clusters(docs).collect()))
    b = sorted(
        map(
            tuple,
            dedup.dup_clusters(docs, pairs=dedup.minhash_lsh_pairs(docs)).collect(),
        )
    )
    assert a == b
    assert (0, 0) in a and (1, 0) in a and (4, 3) in a
    assert all(r[0] != 5 for r in a)  # singletons excluded


def test_winnow_pairs_shared_passage(spark):
    from spark_iforest_spark.operators import dedup

    passage = "a distinctive shared passage long enough to survive winnowing"
    df = spark.createDataFrame(
        [
            (0, "intro one " + passage + " outro alpha"),
            (1, "different intro " + passage + " other outro"),
            (2, "completely unrelated text with zero char overlap anywhere"),
        ],
        "doc_id long, text string",
    )
    for gram_hash in ("md5", "xxhash64"):
        pairs = {
            (r.doc_a, r.doc_b): r.n_shared
            for r in dedup.winnow_pairs(df, gram_hash=gram_hash).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] >= 2
        assert all(2 not in p for p in pairs)
    # a high min_shared threshold filters the pair out
    assert (
        dedup.winnow_pairs(df, min_shared=10 ** 6).count() == 0
    )


def test_winnow_pairs_hot_fingerprint_cap(spark):
    from spark_iforest_spark.operators import dedup

    boiler = "standard footer boilerplate appearing everywhere in the corpus"
    df = spark.createDataFrame(
        [(i, f"doc body number {i} " + boiler) for i in range(8)],
        "doc_id long, text string",
    )
    uncapped = dedup.winnow_pairs(df).count()
    capped = dedup.winnow_pairs(df, max_fingerprint_df=3).count()
    assert uncapped > 0 and capped < uncapped


def test_incremental_exact_dedup_equals_full_restricted(spark, sf_dir):
    # Digest-index contract: batch-vs-index merge rows must equal the full
    # corpus exact_dedup relation restricted to digests the batch touches —
    # covering all three cases (digest only old, only new, both).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    got = sorted(
        map(
            tuple,
            dedup.exact_dedup_incremental(new, dedup.exact_dedup(old)).collect(),
        )
    )
    full = dedup.exact_dedup(docs).alias("f")
    batch_digests = new.select(F.md5("text").alias("content_hash")).distinct()
    exp = sorted(
        map(tuple, full.join(batch_digests, "content_hash", "left_semi").collect())
    )
    assert got == exp and len(got) > 0


def test_incremental_exact_dedup_merge_cases(spark):
    # hand-built: digest A exists in both (merge), B only old (absent from
    # output), C only new (index-null path)
    old = spark.createDataFrame([(10, "aaa"), (11, "aaa"), (12, "bbb")], ["doc_id", "text"])
    new = spark.createDataFrame([(2, "aaa"), (13, "ccc")], ["doc_id", "text"])
    out = {
        r["content_hash"]: (r["rep_doc_id"], r["n_copies"])
        for r in dedup.exact_dedup_incremental(new, dedup.exact_dedup(old)).collect()
    }
    import hashlib

    h = lambda t: hashlib.md5(t.encode()).hexdigest()
    assert out[h("aaa")] == (2, 3)  # new id 2 wins min; 2 old + 1 new copies
    assert out[h("ccc")] == (13, 1)  # unseen digest passes through
    assert h("bbb") not in out  # untouched digests stay out of the delta


def test_incremental_minhash_equals_full_restricted(spark, sf_dir):
    # The incremental contract: pairs(new batch vs indexed corpus) must be
    # EXACTLY the full-corpus relation restricted to pairs touching a new
    # doc. Split the real corpus 75/25 by id, index the old 75%, dedup the
    # new 25% against the index, compare against the one-shot run.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    index = dedup.minhash_index(old)
    got = sorted(
        map(tuple, dedup.minhash_lsh_pairs_incremental(new, index).collect())
    )
    full = dedup.minhash_lsh_pairs(docs)
    exp = sorted(
        map(
            tuple,
            full.where(
                (F.col("doc_a") % 4 == 0) | (F.col("doc_b") % 4 == 0)
            ).collect(),
        )
    )
    assert len(exp) > 0  # the split must actually exercise cross-batch pairs
    assert got == exp


def test_incremental_minhash_never_broadcasts_corpus(spark, docs):
    # Candidate generation must never ship the corpus index to the driver.
    # broadcast_batch=True broadcasts only the BATCH band table (bounded by
    # the batch, not the corpus); broadcast_batch=False must have no forced
    # broadcast at all. Stats-driven broadcasts are disabled so any
    # BroadcastExchange left comes from an explicit hint.
    from spark_iforest_spark.plans import formatted_plan

    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    index = dedup.minhash_index(old)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = formatted_plan(
            dedup.minhash_lsh_pairs_incremental(new, index, broadcast_batch=False)
        )
        assert "BroadcastExchange" not in merged
        bcast = formatted_plan(
            dedup.minhash_lsh_pairs_incremental(new, index, broadcast_batch=True)
        )
        # batch-side broadcast nodes only: the band table (1), the
        # superseded-id anti-join (round 6) once per view of `full`
        # (corpus_bands, sa, sb — runtime dedupes via ReuseExchange), and
        # the candidate-id semi-join probe (round 13) once per verify
        # side (sa, sb). All six are bounded by the BATCH (candidate ids
        # are batch-collision-bounded), never the corpus — the
        # broadcast_batch=False assertion above proves no hidden
        # corpus-side hint exists.
        import re

        assert len(re.findall(r"\(\d+\) BroadcastExchange", bcast)) == 6
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_minhash_index_roundtrips_through_parquet(spark, docs, tmp_path):
    # The index is the persisted artifact of the incremental workflow:
    # writing it to parquet and reading it back must give identical pairs.
    path = str(tmp_path / "mh_index")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    dedup.minhash_index(old).write.parquet(path)
    via_disk = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_incremental(
                new, spark.read.parquet(path), threshold=0.5
            ).collect(),
        )
    )
    in_mem = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_incremental(
                new, dedup.minhash_index(old), threshold=0.5
            ).collect(),
        )
    )
    assert via_disk == in_mem and len(via_disk) > 0


def test_minhash_and_simhash_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for fn in (dedup.minhash_lsh_pairs, dedup.simhash_pairs):
        a = sorted(map(tuple, fn(docs).collect()))
        b = sorted(map(tuple, fn(docs.repartition(7)).collect()))
        assert a == b, fn.__name__


def test_simhash_duckdb_oracle_parity(spark, sf_dir):
    # The dedup_simhash gate is fully value-checked externally: md5-64
    # shingle hashes are reproducible in DuckDB, which recomputes sketch →
    # hamming → jaccard from scratch. This test runs the exact driver
    # comparison locally (same oracle SQL, same parquet).
    import duckdb

    import __spark_entry__ as se

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in dedup.simhash_pairs(docs).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    # the gate is a (full, incr) variant union since round 5 — compare the
    # full-corpus variant here (the incr variant is pinned by the split
    # equality test plus the gate's own restricted oracle)
    exp = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT doc_a, doc_b, hamming, jaccard FROM ("
            + se.oracle_sql()["dedup_simhash"]
            + ") WHERE variant = 'full'"
        ).fetchall()
    )
    assert len(got) > 0
    assert got == exp


def test_reliable_checkpoint_equality(spark, sf_dir, tmp_path):
    # Flipping snapshot() to reliable checkpoint (checkpoint dir + conf)
    # must change ONLY the storage/recovery story: minhash pairs, duplicate
    # clusters, and the iforest fit/score relations stay identical.
    from spark_iforest_spark import IForest
    from spark_iforest_spark.checkpoint import RELIABLE_CONF

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("features")
    )

    def run_all():
        pairs = sorted(map(tuple, dedup.minhash_lsh_pairs(docs).collect()))
        clusters = sorted(map(tuple, dedup.dup_clusters(docs).collect()))
        model = IForest(
            numTrees=10, maxSamples=32.0, maxDepth=6, contamination=0.1, seed=7
        ).fit(emb)
        scored = sorted(
            (r["vec_id"], r["anomalyScore"])
            for r in model.transform(emb).collect()
        )
        return pairs, clusters, scored

    base = run_all()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        reliable = run_all()
    finally:
        spark.conf.set(RELIABLE_CONF, "false")
    assert base == reliable
    assert len(base[0]) > 0 and len(base[1]) > 0 and len(base[2]) > 0


def test_md5_shingle_hash_matches_python(spark):
    # the simhash oracle's foundation: Spark's conv-assembled 64-bit md5
    # prefix must equal int(md5(s).hexdigest()[:16], 16) reinterpreted
    # signed, for arbitrary token strings (unicode, quotes, empties-ish)
    import hashlib
    import random
    import string

    rng = random.Random(99)
    words = [
        "".join(rng.choice(string.ascii_letters + "éßµ'\"\\") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    from spark_iforest_spark.operators.dedup import _md5_shingles

    # reuse the operator's own hash path: one-token docs, n=1 → shset=[h64(s)]
    got = {
        r["did"]: r["shset"][0]
        for r in _md5_shingles(
            df.select(F.monotonically_increasing_id().alias("doc_id"), F.col("s").alias("text")),
            "doc_id", "text", 1,
        ).collect()
    }
    back = {r["doc_id"]: r["s"] for r in df.select(F.monotonically_increasing_id().alias("doc_id"), "s").collect()}
    assert len(got) == 200
    import numpy as np

    for did, h in got.items():
        w = back[did]
        exp = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
        assert np.uint64(np.int64(h)) == np.uint64(exp), w


def test_simhash_xxhash64_fast_path(docs):
    # the throughput variant obeys the same contract (hamming<=3, verified
    # jaccard, exact dups always found) on a different concrete pair set
    out = {(r["doc_a"], r["doc_b"]): (r["hamming"], r["jaccard"]) for r in
           dedup.simhash_pairs(docs, threshold=0.5, shingle_hash="xxhash64").collect()}
    exact = {(r["doc_a"], r["doc_b"]) for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert set(out) <= exact
    assert all(h <= 3 and j >= 0.5 for h, j in out.values())
    assert out[(0, 1)] == (0, 1.0)
    with pytest.raises(ValueError):
        dedup.simhash_pairs(docs, shingle_hash="sha1")


def test_incremental_simhash_small_corpus(spark, docs):
    # known dups: (0,1) and (4,5); odd ids arrive as the new batch, so
    # both pairs touch it and must survive the index path at hamming 0
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    out = {
        (r["doc_a"], r["doc_b"]): (r["hamming"], r["jaccard"])
        for r in dedup.simhash_pairs_incremental(
            new, dedup.simhash_index(old)
        ).collect()
    }
    assert out[(0, 1)] == (0, 1.0)
    assert out[(4, 5)] == (0, 1.0)


def test_incremental_simhash_equals_full_restricted(spark, sf_dir):
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = corpus.where(F.col("doc_id") % 2 == 0)
    new = corpus.where(F.col("doc_id") % 2 == 1)
    got = sorted(
        map(
            tuple,
            dedup.simhash_pairs_incremental(
                new, dedup.simhash_index(old)
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            dedup.simhash_pairs(corpus)
            .where((F.col("doc_a") % 2 == 1) | (F.col("doc_b") % 2 == 1))
            .collect(),
        )
    )
    assert got == exp and len(got) > 0


def test_incremental_embedding_lsh_equals_full_restricted(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    got = sorted(
        map(
            tuple,
            dedup.embedding_lsh_pairs_incremental(
                new, dedup.embedding_index(old)
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            dedup.embedding_lsh_pairs(emb)
            .where((F.col("id_a") % 2 == 1) | (F.col("id_b") % 2 == 1))
            .collect(),
        )
    )
    assert got == exp and len(got) > 0


def test_embedding_index_roundtrips_through_parquet(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "emb_idx")
    dedup.embedding_index(old).write.parquet(path)
    via_disk = sorted(
        map(
            tuple,
            dedup.embedding_lsh_pairs_incremental(
                new, spark.read.parquet(path)
            ).collect(),
        )
    )
    in_mem = sorted(
        map(
            tuple,
            dedup.embedding_lsh_pairs_incremental(
                new, dedup.embedding_index(old)
            ).collect(),
        )
    )
    assert via_disk == in_mem and len(via_disk) > 0


def test_incremental_reingest_is_idempotent(spark, docs):
    """Round-6 advice fix: a batch containing an ALREADY-INDEXED doc id
    must supersede the indexed row, not meet its own stale copy — re-running
    the whole corpus as the 'batch' must reproduce the full relation with
    no duplicated rows."""
    full = sorted(map(tuple, dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()))
    index = dedup.minhash_index(docs)  # everything already indexed
    again = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs_incremental(docs, index, threshold=0.5).collect(),
        )
    )
    assert again == full
    sh_full = sorted(map(tuple, dedup.simhash_pairs(docs, threshold=0.5).collect()))
    sh_again = sorted(
        map(
            tuple,
            dedup.simhash_pairs_incremental(
                docs, dedup.simhash_index(docs), threshold=0.5
            ).collect(),
        )
    )
    assert sh_again == sh_full


def test_simhash_index_roundtrips_through_parquet(spark, docs, tmp_path):
    """Round-6: the last index family without a persisted-artifact test —
    write simhash_index to parquet, read it back, and the incremental
    pairs must equal the in-flight index's exactly."""
    path = str(tmp_path / "sh_index")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    dedup.simhash_index(old).write.parquet(path)
    via_disk = sorted(
        map(
            tuple,
            dedup.simhash_pairs_incremental(
                new, spark.read.parquet(path), threshold=0.5
            ).collect(),
        )
    )
    in_mem = sorted(
        map(
            tuple,
            dedup.simhash_pairs_incremental(
                new, dedup.simhash_index(old), threshold=0.5
            ).collect(),
        )
    )
    assert via_disk == in_mem
    assert via_disk, "expected at least one cross-half near-dup pair"


def test_incremental_assume_disjoint_ids_equal_on_disjoint_batches(spark, sf_dir):
    """assume_disjoint_ids=True (round 7) skips the idempotent-re-ingest
    anti-join — on a genuinely disjoint batch (the normal crawl case) all
    three incremental families must emit the identical relation either
    way; the flag only trades the re-ingest guard for ~15% less per-batch
    work (SCALE.md)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    mh_index = dedup.minhash_index(old)
    assert sorted(
        map(tuple, dedup.minhash_lsh_pairs_incremental(
            new, mh_index, assume_disjoint_ids=True).collect())
    ) == sorted(
        map(tuple, dedup.minhash_lsh_pairs_incremental(new, mh_index).collect())
    )
    sh_index = dedup.simhash_index(old)
    assert sorted(
        map(tuple, dedup.simhash_pairs_incremental(
            new, sh_index, threshold=0.5, assume_disjoint_ids=True).collect())
    ) == sorted(
        map(tuple, dedup.simhash_pairs_incremental(
            new, sh_index, threshold=0.5).collect())
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e_index = dedup.embedding_index(emb.where(F.col("vec_id") % 4 != 0))
    e_new = emb.where(F.col("vec_id") % 4 == 0)
    assert sorted(
        map(tuple, dedup.embedding_lsh_pairs_incremental(
            e_new, e_index, assume_disjoint_ids=True).collect())
    ) == sorted(
        map(tuple, dedup.embedding_lsh_pairs_incremental(e_new, e_index).collect())
    )


def test_embedding_lsh_multi_probe_same_pairs_4x_smaller_index(spark, sf_dir):
    """Round 7: multi_probe=1 on the embedding near-dup index — the batch
    probes Hamming-1 buckets, so the PERSISTED index needs ~4x fewer
    tables (81 -> 19 at threshold 0.4 / 4 bits) for the same miss bound.
    On the real corpus slice the emitted relation is identical."""
    assert dedup._sign_lsh_tables(0.4, 4, 1e-6, 0) == 81
    assert dedup._sign_lsh_tables(0.4, 4, 1e-6, 1) == 19
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.where(F.col("vec_id") % 4 != 0)
    new = emb.where(F.col("vec_id") % 4 == 0)
    base = sorted(map(tuple, dedup.embedding_lsh_pairs_incremental(
        new, dedup.embedding_index(old)).collect()))
    small_index = dedup.embedding_index(old, multi_probe=1)
    # the index really is ~4x smaller (one sig entry per table per vector)
    assert small_index.select(F.max(F.size("sig"))).collect()[0][0] == 19
    mp = sorted(map(tuple, dedup.embedding_lsh_pairs_incremental(
        new, small_index, multi_probe=1).collect()))
    assert base and mp == base


def test_dup_clusters_incremental_equals_full(spark, sf_dir):
    """Round 7: folding a new batch's near-dup edges into persisted labels
    must reproduce the full-corpus connected components exactly — old
    connectivity reconstructed from star edges (doc -> rep), new edges
    from the incremental pair operator, no old text/edges re-read."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    old_labels = dedup.dup_clusters(old)
    new_pairs = dedup.minhash_lsh_pairs_incremental(new, dedup.minhash_index(old))
    got = sorted(map(tuple, dedup.dup_clusters_incremental(
        new_pairs, old_labels).collect()))
    exp = sorted(map(tuple, dedup.dup_clusters(
        docs, pairs=dedup.minhash_lsh_pairs(docs)).collect()))
    assert got == exp and got


def test_dup_clusters_incremental_merges_across_batch(spark):
    """A new edge bridging two OLD clusters must merge them under the
    global min rep, in few rounds (star edges keep diameter <= 2)."""
    pairs_old = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (21, 22)], "doc_a long, doc_b long"
    )
    old_labels = dedup._connected_components(pairs_old).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep")
    )
    # new doc 5 bridges cluster {10..12} and {20..22}; also its own min
    new_pairs = spark.createDataFrame(
        [(5, 12), (5, 22)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.dup_clusters_incremental(new_pairs, old_labels).collect()
    }
    assert got == {5: 5, 10: 5, 11: 5, 12: 5, 20: 5, 21: 5, 22: 5}
    assert dedup.dup_clusters_incremental.last_rounds <= 5


def test_resolve_clusters_keeps_best_member(spark):
    """Per cluster: argmax quality, ties -> min id; n_members exact."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, cluster_rep long",
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.5)],
        "doc_id long, quality double",
    )
    out = {
        r["cluster_rep"]: r
        for r in dedup.resolve_clusters(None, labels=labels, quality=quality).collect()
    }
    assert out[1]["keep_doc_id"] == 2 and out[1]["n_members"] == 3  # 0.9 tie -> min id
    assert out[1]["keep_quality"] == 0.9
    assert out[7]["keep_doc_id"] == 7 and out[7]["n_members"] == 2


def test_resolve_clusters_on_corpus(spark, sf_dir):
    """Default path (dup_clusters + quality_score) emits one row per
    cluster_rep, every kept doc is a member of its own cluster, and the
    kept doc's quality is the cluster max."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labels = dedup.dup_clusters(docs)
    out = dedup.resolve_clusters(docs, labels=labels).collect()
    members = {}
    for r in labels.collect():
        members.setdefault(r["cluster_rep"], set()).add(r["doc_id"])
    from spark_iforest_spark.operators.text import quality_score
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert out and len(out) == len(members)
    for r in out:
        ms = members[r["cluster_rep"]]
        assert r["keep_doc_id"] in ms and r["n_members"] == len(ms)
        assert r["keep_quality"] == max(q[m] for m in ms)


def test_drop_near_duplicates_keeps_best_and_uniques(spark, sf_dir):
    """Survivors = non-clustered docs + one best member per cluster;
    count identity n_docs - sum(cluster_size - 1) holds exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labels = dedup.dup_clusters(docs)
    sizes = {}
    for r in labels.collect():
        sizes[r["cluster_rep"]] = sizes.get(r["cluster_rep"], 0) + 1
    out = dedup.drop_near_duplicates(docs)
    n_docs = docs.count()
    assert out.count() == n_docs - sum(s - 1 for s in sizes.values())
    assert out.columns == docs.columns
    # every kept representative is present, every loser gone
    keep = {r["keep_doc_id"] for r in dedup.resolve_clusters(docs, labels=labels).collect()}
    clustered = {r["doc_id"] for r in labels.collect()}
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert keep <= out_ids
    assert not (clustered - keep) & out_ids


def test_resolve_clusters_string_ids(spark):
    """round-8 advice fix: the tie-break must be id-type-AGNOSTIC — with
    string doc ids the old (-id) negation was NULL under non-ANSI mode
    and silently picked the LARGEST id on quality ties."""
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "doc_id string, cluster_rep string"
    )
    quality = spark.createDataFrame(
        [("a", 0.4), ("b", 0.9), ("c", 0.9)], "doc_id string, quality double"
    )
    out = {
        r["cluster_rep"]: r
        for r in dedup.resolve_clusters(None, labels=labels, quality=quality).collect()
    }
    assert out["a"]["keep_doc_id"] == "b"  # 0.9 tie -> smallest id, not "c"
    assert out["a"]["keep_quality"] == 0.9 and out["a"]["n_members"] == 3


def test_resolve_clusters_partial_quality_coverage(spark):
    """round-7 review fix: a cluster with NO quality-covered member still
    keeps a representative (min id, NULL keep_quality) — partial quality
    relations must never cause whole-cluster data loss."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (8, 7)], "doc_id long, cluster_rep long"
    )
    quality = spark.createDataFrame([(2, 0.9)], "doc_id long, quality double")
    out = {
        r["cluster_rep"]: r
        for r in dedup.resolve_clusters(None, labels=labels, quality=quality).collect()
    }
    assert out[1]["keep_doc_id"] == 2 and out[1]["keep_quality"] == 0.9
    assert out[7]["keep_doc_id"] == 7 and out[7]["keep_quality"] is None
    assert out[7]["n_members"] == 2


# ------------------------------------------------ LSH band planner (round 8)
def test_plan_minhash_bands_knee_and_curves():
    from spark_iforest_spark.operators.dedup import plan_minhash_bands

    p = plan_minhash_bands(0.8, 128)
    # divisor split of the budget (argmin itself is pinned in the next test)
    assert p["bands"] * p["rows"] == 128
    # the module's own documented default (16 bands x 8 rows) numbers:
    # miss at j=0.9 ~ 1e-4, at j=0.8 ~ 5% (minhash_lsh_pairs docstring)
    d = plan_minhash_bands(0.99, 128, max_miss_at=(0.9, 2e-4))
    assert (d["bands"], d["rows"]) == (16, 8)
    assert 1e-5 < d["miss_prob"](0.9) < 2e-4
    assert 0.03 < d["miss_prob"](0.8) < 0.07
    # collision + miss are complements
    assert abs(d["collision_prob"](0.85) + d["miss_prob"](0.85) - 1.0) < 1e-12


def test_plan_minhash_bands_argmin_and_guarantee():
    import pytest as _pt

    from spark_iforest_spark.operators.dedup import plan_minhash_bands

    # brute-force argmin over divisor splits must agree
    for t in (0.3, 0.5, 0.7, 0.9):
        p = plan_minhash_bands(t, 128)
        best = min(
            ((b, 128 // b) for b in range(1, 129) if 128 % b == 0),
            key=lambda br: (abs((1.0 / br[0]) ** (1.0 / br[1]) - t), br[0]),
        )
        assert (p["bands"], p["rows"]) == best
    # guarantee mode: fewest bands satisfying the miss bound
    g = plan_minhash_bands(0.9, 128, max_miss_at=(0.9, 1e-4))
    assert (g["bands"], g["rows"]) == (32, 4)
    for b in (1, 2, 4, 8, 16):
        r = 128 // b
        assert (1.0 - 0.9**r) ** b > 1e-4  # every fewer-bands split fails
    with _pt.raises(ValueError):
        plan_minhash_bands(0.9, 8, max_miss_at=(0.5, 1e-9))
    with _pt.raises(ValueError):
        plan_minhash_bands(1.5)


def test_substr_incremental_equals_full_restricted(spark, sf_dir):
    """The ExactSubstr incremental contract: cleaning a disjoint NEW
    batch against substr_window_index(rest) == remove_repeated_substrings
    over the whole corpus restricted to the batch's rows, bit-exact
    (rebuilt text included) — keeper resolved through the index's stored
    first occurrence, so interleaved (non-monotonic) ids work too."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = docs.where(F.col("doc_id") % 4 == 0)   # interleaved ids
    rest = docs.where(F.col("doc_id") % 4 != 0)
    full = sorted(
        map(
            tuple,
            dedup.remove_repeated_substrings(docs, window=8, with_text=True)
            .where(F.col("doc_id") % 4 == 0)
            .collect(),
        )
    )
    incr = sorted(
        map(
            tuple,
            dedup.remove_repeated_substrings_incremental(
                batch,
                dedup.substr_window_index(rest, window=8),
                window=8,
                with_text=True,
                assume_disjoint_ids=True,
            ).collect(),
        )
    )
    assert incr == full and full


def test_substr_window_index_merge_equals_oneshot(spark, sf_dir):
    """Doc-disjoint shard indexes fold exactly: counts sum, the keeper is
    the min first-occurrence across shards."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    one = sorted(map(tuple, dedup.substr_window_index(docs, window=8).collect()))
    merged = sorted(
        map(
            tuple,
            dedup.merge_substr_window_indexes(
                *[
                    dedup.substr_window_index(
                        docs.where(F.col("doc_id") % 3 == i), window=8
                    )
                    for i in range(3)
                ]
            ).collect(),
        )
    )
    assert merged == one and one


def test_substr_incremental_batch_keeper_exempt(spark):
    """A window duplicated ONLY within the batch keeps its batch-first
    occurrence; a window already in the index cuts every batch
    occurrence (the indexed keeper already shipped)."""
    w = 4
    phrase = "alpha beta gamma delta"
    rest = spark.createDataFrame(
        [(10, f"{phrase} trailing words here")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (20, f"{phrase} unique tail twenty"),          # indexed dup -> cut
            (21, "epsilon zeta eta theta only once x y"),  # batch dup keeper
            (22, "epsilon zeta eta theta second copy z"),  # batch dup -> cut
            (23, "totally fresh words never repeated ok"), # untouched
        ],
        "doc_id long, text string",
    )
    idx = dedup.substr_window_index(rest, window=w)
    out = {
        r.doc_id: r
        for r in dedup.remove_repeated_substrings_incremental(
            batch, idx, window=w, with_text=True, assume_disjoint_ids=True
        ).collect()
    }
    assert out[20].n_kept == out[20].n_tokens - w        # indexed window cut
    assert "alpha" not in out[20].clean_text
    assert out[21].n_kept == out[21].n_tokens            # batch keeper exempt
    assert out[22].n_kept == out[22].n_tokens - w        # batch second copy cut
    assert out[23].n_kept == out[23].n_tokens


def test_dup_clusters_incremental_untouched_components_carry_over(spark):
    """Round 10 (touched-only CC): components sharing no node with the new
    pairs must carry their labels verbatim — only the touched components'
    stars enter the iterative loop — and the shuffle-fallback path
    (broadcast_batch=False) must produce the identical relation."""
    pairs_old = spark.createDataFrame(
        [(10, 11), (20, 21), (30, 31), (31, 32)], "doc_a long, doc_b long"
    )
    old_labels = dedup._connected_components(pairs_old).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep")
    )
    # touches ONLY the {30,31,32} component (plus new docs 5,6)
    new_pairs = spark.createDataFrame(
        [(5, 32), (5, 6)], "doc_a long, doc_b long"
    )
    want = {
        10: 10, 11: 10, 20: 20, 21: 20,  # untouched, verbatim
        5: 5, 6: 5, 30: 5, 31: 5, 32: 5,  # merged under new global min
    }
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.dup_clusters_incremental(new_pairs, old_labels).collect()
    }
    assert got == want
    got_shuffle = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.dup_clusters_incremental(
            new_pairs, old_labels, broadcast_batch=False
        ).collect()
    }
    assert got_shuffle == want


def test_dup_clusters_incremental_random_graphs_match_unionfind(spark):
    """Randomized property pin for the touched-only fold: for arbitrary
    graphs split into (old edges, batch-touching edges), folding the
    batch edges into CC(old) must equal a driver-side union-find over ALL
    edges (min-id reps), restricted to labeled nodes — covering chained
    cross-component merges, pair nodes absent from the old labels, and
    isolated new components, at shapes the hand-built cases don't."""
    import random

    def unionfind(edges):
        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    for seed in range(5):
        rng = random.Random(seed)
        n_nodes = rng.randint(12, 40)
        all_edges = sorted({
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(rng.randint(6, 30))
        })
        new_nodes = set(rng.sample(range(n_nodes), rng.randint(1, n_nodes // 3)))
        new_pairs = [e for e in all_edges if e[0] in new_nodes or e[1] in new_nodes]
        old_edges = [e for e in all_edges if e not in new_pairs]
        if not new_pairs or not old_edges:
            continue
        old_labels = dedup._connected_components(
            spark.createDataFrame(old_edges, "doc_a long, doc_b long")
        ).select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep"))
        got = {
            r["doc_id"]: r["cluster_rep"]
            for r in dedup.dup_clusters_incremental(
                spark.createDataFrame(new_pairs, "doc_a long, doc_b long"),
                old_labels,
            ).collect()
        }
        full = unionfind(all_edges)
        # old_edges ∪ new_pairs partition all_edges, so every edge-touched
        # node must come back labeled, with the union-find's min-id rep
        assert got == full, f"seed {seed}: labels diverge"

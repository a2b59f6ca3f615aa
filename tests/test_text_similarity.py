"""Text-analysis and similarity-search operator tests."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is a good mat"),
            (1, "zzz qqq xxx"),
            (2, "one"),
        ],
        ["doc_id", "text"],
    )


def test_token_stats(docs):
    out = {r["doc_id"]: r for r in text.token_stats(docs).collect()}
    assert out[0]["n_tokens"] == 12
    assert out[2]["n_tokens"] == 1
    assert out[0]["n_chars"] == len("the cat sat on the mat and it is a good mat")
    assert out[2]["avg_token_len"] == 3.0


def test_lang_id(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    assert out[0] == "en"  # stopword-dense
    assert out[1] == "unk"  # no stopwords


def test_quality_score_ranges(docs):
    for r in text.quality_score(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["length_score"] <= 1.0


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma alpha beta"), (2, "alpha beta delta")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.fingerprint(df).collect()}
    assert out[0]["fingerprint"] == out[1]["fingerprint"]  # reordered tokens collide
    assert out[0]["fingerprint"] != out[2]["fingerprint"]
    assert out[0]["exact_hash"] != out[1]["exact_hash"]  # raw md5 differs


EMB = [
    (0, [1.0, 0.0]),
    (1, [0.9, 0.1]),
    (2, [0.0, 1.0]),
    (3, [0.5, 0.5]),
    (4, [-1.0, 0.0]),
]


def test_cosine_topk_exact(spark):
    emb = spark.createDataFrame(EMB, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    out = similarity.cosine_topk(emb, q, k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(1, 1), (3, 2)]
    assert out[0]["cos_sim"] > out[1]["cos_sim"]


def test_cosine_topk_two_phase_rank(spark):
    # at scale the heavy rank must run per-input-partition first (window
    # keyed by spark_partition_id) so no single task sees |corpus| rows per
    # query — forced on here; small corpora auto-bypass (test below)
    from spark_iforest_spark.plans import formatted_plan

    emb = spark.createDataFrame(EMB, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    plan = formatted_plan(similarity.cosine_topk(emb, q, k=2, two_phase=True))
    assert plan.count("Window (") == 2
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_cosine_topk_small_input_bypass(spark):
    # a tiny corpus auto-picks the single-window plan (the extra phase-1
    # shuffle costs more than it saves), and both plans emit identical rows
    from spark_iforest_spark.plans import formatted_plan

    emb = spark.createDataFrame(EMB, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    assert formatted_plan(similarity.cosine_topk(emb, q, k=2)).count("Window (") == 1
    a = sorted(map(tuple, similarity.cosine_topk(emb, q, k=2, two_phase=True).collect()))
    b = sorted(map(tuple, similarity.cosine_topk(emb, q, k=2, two_phase=False).collect()))
    assert a == b


def test_lsh_bucket_exchange_carries_no_vectors(spark):
    # the corpus-side bucketize must emit only (id, table, bucket) — the
    # ×tables bucket join never ships vectors; vectors re-join by id via
    # sort-merge afterwards (100 TB shape)
    import re

    from spark_iforest_spark.plans import formatted_plan

    emb = spark.createDataFrame(EMB, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    plan = formatted_plan(similarity.lsh_topk(emb, q, k=2, dim=2, bits=2, tables=4))
    args = re.findall(r"\(\d+\) MapInPandas\n(?:.*\n)*?Arguments: (.*)", plan)
    corpus_side = [a for a in args if "neighbor_id#" in a]
    assert corpus_side and all("qv#" not in a and "#126L, v#" not in a for a in corpus_side)
    assert not any(", v#" in a for a in corpus_side)
    assert "SortMergeJoin" in plan  # the vector re-join


def test_ivf_plan_has_no_row_udf(spark):
    # array->vector for KMeans must be the JVM expression, not a Python UDF
    from spark_iforest_spark.plans import python_eval_nodes

    emb = spark.createDataFrame(EMB, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    nodes = python_eval_nodes(similarity.ivf_topk(emb, q, n_centroids=2, n_probe=1))
    assert "BatchEvalPython" not in nodes
    assert nodes == ["MapInPandas"]  # the probe pass, by design


def test_topk_recall_gate(spark):
    emb = spark.createDataFrame(EMB, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    exact = similarity.cosine_topk(emb, q, k=2)
    full = exact.select("query_id", "neighbor_id")
    ok = similarity.topk_recall(exact, full).collect()[0]
    assert ok["n_expected"] == 2 and ok["recall_ok"]
    half = full.where(F.col("neighbor_id") == 1)
    bad = similarity.topk_recall(exact, half).collect()[0]
    assert bad["n_expected"] == 2 and not bad["recall_ok"]


def test_lsh_topk_recall_on_clustered_data(spark):
    # sign-LSH is a *near*-neighbor structure: recall is high when true
    # neighbors are at high cosine (clusters), and legitimately poor on
    # uniform-random vectors. Build 5 tight clusters and require recall.
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for c in range(5):
        center = rng.standard_normal(16)
        center /= np.linalg.norm(center)
        for _ in range(40):
            v = center + 0.05 * rng.standard_normal(16)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<double>")
    q = emb.where(F.col("vec_id") % 40 == 0)  # one query per cluster
    exact = similarity.cosine_topk(emb, q, k=5).collect()
    approx = similarity.lsh_topk(emb, q, k=5, dim=16, bits=4, tables=16).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for r in approx if r["neighbor_id"] in exact_sets[r["query_id"]])
    assert hits / len(exact) >= 0.9
    # and every returned neighbor is at least from the right cluster
    cluster_of = {r["vec_id"]: r["cluster"] for r in emb.collect()}
    assert all(cluster_of[r["neighbor_id"]] == cluster_of[r["query_id"]] for r in approx)


def test_multimodal_roundtrip(docs):
    media = multimodal.attach_binary_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    out = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    assert out[0]["n_bytes"] == len("the cat sat on the mat and it is a good mat")
    assert len(out[0]["features"]) == 16
    assert abs(sum(out[0]["features"]) - 1.0) < 1e-5  # L1-normalized histogram


def test_multimodal_frame_sample(docs):
    media = multimodal.attach_binary_payload(docs)
    frames = multimodal.frame_sample(media, every_n_bytes=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[2]) == 1  # "one" = 3 bytes -> 1 chunk
    assert sum(r["n_bytes"] for r in by_doc[0]) == len(
        "the cat sat on the mat and it is a good mat"
    )


def test_decoder_registration(spark):
    import numpy as np

    multimodal.register_decoder("text/plain", lambda b: np.ones(4) / 4)
    try:
        df = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
        out = multimodal.extract_features(multimodal.attach_binary_payload(df)).collect()
        assert out[0]["features"] == [0.25, 0.25, 0.25, 0.25]
    finally:
        multimodal._DECODERS.clear()


def test_corpus_vocab(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "a c")], ["doc_id", "text"]
    )
    out = [(r["token"], r["n_occurrences"]) for r in text.corpus_vocab(df).collect()]
    assert out == [("a", 3), ("b", 1), ("c", 1)]


def test_quality_histogram_buckets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text.quality_histogram(docs).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert all(0 <= r["decile"] <= 9 for r in out)


def test_ivf_topk_matches_bruteforce_on_clusters(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    vid = 0
    for c in range(4):
        center = rng.standard_normal(8)
        for _ in range(30):
            v = center + 0.05 * rng.standard_normal(8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") % 30 == 0)
    exact = similarity.cosine_topk(emb, q, k=3).collect()
    ivf = similarity.ivf_topk(emb, q, k=3, n_centroids=4, n_probe=2).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for r in ivf if r["neighbor_id"] in exact_sets[r["query_id"]])
    assert hits / len(exact) >= 0.9


def test_winnow_fingerprints_shared_substring(spark):
    # two docs sharing a long substring must share >= 1 fingerprint
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    df = spark.createDataFrame(
        [
            (0, "PREFIX_A " + base),
            (1, "OTHER_START " + base + " SUFFIX"),
            (2, "completely unrelated content with no overlap at all here"),
            (3, "tiny"),  # shorter than k: whole-text fallback
        ],
        ["doc_id", "text"],
    )
    for gram_hash in ("md5", "xxhash64"):
        out = {}
        for r in text.winnow_fingerprints(df, gram_hash=gram_hash).collect():
            out.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        assert out[0] & out[1], "shared substring must produce a shared fingerprint"
        assert not (out[0] & out[2])
        assert len(out[3]) == 1
    # the scale path emits int64 fingerprints (8-byte exchange keys)
    row = text.winnow_fingerprints(df, gram_hash="xxhash64").first()
    assert isinstance(row["fingerprint"], int)
    with pytest.raises(ValueError):
        text.winnow_fingerprints(df, gram_hash="sha1")


def test_source_quality_report(spark):
    from spark_iforest_spark.operators import corpus

    rows = [
        (0, "the quick brown fox is in the barn and it is fine", "web"),
        (1, "the quick brown fox is in the barn and it is fine", "web"),  # dup
        (2, "one two three", "web"),
        (3, "a tidy book paragraph of decent length and the usual words", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in corpus.source_quality_report(df).collect()}
    assert out["web"].n_docs == 3 and out["web"].n_dup_docs == 1
    assert out["books"].n_docs == 1 and out["books"].n_dup_docs == 0
    assert out["web"].mean_tokens == round((12 + 12 + 3) / 3, 6)
    assert 0.0 < out["web"].mean_quality <= 1.0


def test_lsh_topk_layout_invariant(spark, sf_dir):
    """sign-LSH ANN is a pure function of (data, seed): hyperplanes are
    seeded and ties break on neighbor_id, so the relation must not change
    with partition layout (the cross-session determinism probe from the
    verify notes)."""
    from spark_iforest_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    a = sorted(map(tuple, similarity.lsh_topk(emb.repartition(3), q, bits=4, tables=8).collect()))
    b = sorted(map(tuple, similarity.lsh_topk(emb.repartition(17), q, bits=4, tables=8).collect()))
    assert a == b and len(a) > 0


def test_auto_two_phase_count_memoized(spark, sf_dir):
    """Round-4 fix: the corpus-shape probe runs at most one count job per
    distinct corpus plan per session — repeated top-k builds over the same
    source reuse the cached (rows, partitions) pair."""
    from spark_iforest_spark.operators import similarity

    similarity._SHAPE_CACHE.clear()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    for _ in range(3):
        similarity.cosine_topk(emb, q)  # plan construction triggers the probe
        similarity.lsh_topk(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), q)
    assert len(similarity._SHAPE_CACHE) == 1
    # explicit n_rows hint: no probe at all
    similarity._SHAPE_CACHE.clear()
    similarity.cosine_topk(emb, q, n_rows=500)
    assert len(similarity._SHAPE_CACHE) == 0


def test_pq_encode_packed_codes_match_numpy(spark, sf_dir):
    """The packed int64 code must decompose into m sub-codes, each the
    argmin-distance centroid index of the NORMALIZED subvector — verified
    by an independent driver-side numpy re-encode of the whole corpus."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = similarity._pq_codebooks(emb, "vec_id", "embedding", 8, 16, 1, 4096, 10)
    got = {r["vec_id"]: r["code"] for r in similarity.pq_encode(emb, cb).collect()}
    rows = emb.select("vec_id", F.col("embedding").cast("array<double>")).collect()
    m, kc, sub = cb.shape
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        vn = v / max(np.linalg.norm(v), 1e-12)
        exp = 0
        for j in range(m):
            xj = vn[j * sub : (j + 1) * sub]
            exp |= int(((cb[j] - xj) ** 2).sum(axis=1).argmin()) << (8 * j)
        assert got[r["vec_id"]] == exp
    assert len(got) == len(rows)


def test_pq_topk_recall_and_exact_cos_values(spark, sf_dir):
    """PQ holds recall >= 0.9 on the clusterless corpus (the adversarial
    regime), and because survivors re-rank by EXACT cosine, every pair PQ
    shares with the exact relation carries the identical cos_sim value."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb, q).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.pq_topk(emb, q).collect()
    }
    hits = set(exact) & set(pq)
    assert len(hits) / len(exact) >= 0.9
    assert all(exact[p] == pq[p] for p in hits)  # bit-equal, not approx


def test_pq_persisted_index_and_incremental_encode_match_scratch(spark, sf_dir, tmp_path):
    """Persisted-index mode: frozen codebooks + a code relation read back
    from parquet — with the corpus encoded INCREMENTALLY in two batches —
    must search identically to the from-scratch run. This is the 100 TB
    ingest path: new vectors encode against the frozen codebooks; nothing
    old re-encodes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    cb = similarity._pq_codebooks(
        emb, "vec_id", "embedding", 8, 64, similarity._PQ_SEED, 4096, 25
    )
    path = str(tmp_path / "pq_codes")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    similarity.pq_encode(old, cb).unionByName(
        similarity.pq_encode(new, cb)
    ).write.parquet(path)
    scratch = sorted(map(tuple, similarity.pq_topk(emb, q).collect()))
    indexed = sorted(
        map(
            tuple,
            similarity.pq_topk(
                emb, q, codebooks=cb, codes=spark.read.parquet(path)
            ).collect(),
        )
    )
    assert scratch == indexed and len(scratch) > 0


def test_pq_topk_layout_invariant(spark, sf_dir):
    """Codebooks fit on an md5-ordered sample, argmin ties to the lowest
    index, every selection totally ordered by (score, id) — so the PQ
    relation is a pure function of (data, seed) under any partitioning."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    a = sorted(map(tuple, similarity.pq_topk(emb.repartition(3), q).collect()))
    b = sorted(map(tuple, similarity.pq_topk(emb.repartition(17), q).collect()))
    assert a == b and len(a) > 0


def test_pq_scan_reads_codes_not_vectors(spark, sf_dir):
    """The 100 TB contract: the heavy ADC scan consumes the 16-byte
    (id, code) relation — its MapInPandas input carries no vector column —
    and the surviving candidates re-join vectors via sort-merge."""
    import re

    from spark_iforest_spark.plans import formatted_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    plan = formatted_plan(similarity.pq_topk(emb, q, n_rows=500))
    args = re.findall(r"\(\d+\) MapInPandas\n(?:.*\n)*?Arguments: (.*)", plan)
    adc_side = [a for a in args if "adc_scan(" in a]
    assert adc_side and all("embedding#" not in a for a in adc_side)
    assert "SortMergeJoin" in plan  # exact re-rank vector join
    import numpy as np

    with pytest.raises(ValueError):  # >256 centroids must refuse to pack
        similarity.pq_encode(emb, np.zeros((8, 300, 8)))
    with pytest.raises(ValueError):  # >8 subspaces must refuse to pack
        similarity.pq_encode(emb, np.zeros((9, 16, 8)))


def test_ivf_assign_matches_sparkml_transform(spark, sf_dir):
    """The frozen-center assignment (one distance matmul per batch) must
    reproduce Spark ML's own nearest-euclidean-center transform — the
    contract that makes incrementally-assigned vectors indistinguishable
    from build-time ones."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    ).withColumn("_v", array_to_vector("nv"))
    model = KMeans(
        k=8, seed=similarity._IVF_SEED, featuresCol="_v", predictionCol="cell"
    ).fit(corpus)
    import numpy as np

    centers = np.stack(model.clusterCenters())
    ml = {
        r["neighbor_id"]: r["cell"]
        for r in model.transform(corpus).select("neighbor_id", "cell").collect()
    }
    ours = {
        r["neighbor_id"]: r["cell"]
        for r in similarity.ivf_assign(emb, centers)
        .select("neighbor_id", "cell")
        .collect()
    }
    assert ours == ml


def test_ivf_persisted_index_matches_scratch(spark, sf_dir, tmp_path):
    """Frozen centers + a two-batch incrementally-assigned cell relation
    read back from parquet must search identically to the from-scratch
    run."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    centers = similarity.ivf_centers(emb, n_centroids=8)
    path = str(tmp_path / "ivf_cells")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    similarity.ivf_assign(old, centers).unionByName(
        similarity.ivf_assign(new, centers)
    ).write.parquet(path)
    scratch = sorted(
        map(tuple, similarity.ivf_topk(emb, q, n_centroids=8, n_probe=7).collect())
    )
    indexed = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                emb,
                q,
                n_centroids=8,
                n_probe=7,
                centers=centers,
                assigned=spark.read.parquet(path),
            ).collect(),
        )
    )
    assert scratch == indexed and len(scratch) > 0


def test_lsh_topk_driver_rederivation_bit_exact(spark, sf_dir):
    """Straight-line driver recompute of the whole LSH path — same seeded
    hyperplanes, candidate generation by set logic, exact cosine via the
    replicated JVM fold (left-to-right double folds, HALF_UP round-6),
    rank by (cos desc, id) — must equal the distributed relation
    bit-exactly. Pins the join/dedup/rank plumbing, which recall and
    layout-invariance alone cannot (a deterministic rank bug passes
    both)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 10")
    k, bits, tables, dim = 5, 4, 24, 64
    got = sorted(
        map(tuple, similarity.lsh_topk(emb, queries, k=k, bits=bits, tables=tables).collect())
    )

    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    planes = similarity._hyperplanes(dim, bits, tables)
    flat = planes.reshape(tables * bits, dim)
    pack = 1 << np.arange(bits, dtype=np.int64)

    def sig(v):
        bits_m = (np.asarray(v) @ flat.T > 0).astype(np.int64).reshape(tables, bits)
        return tuple(bits_m @ pack)

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    sigs = {vid: sig(v) for vid, v in rows.items()}
    expected = []
    for qid in [v for v in rows if v < 10]:
        cands = {
            nid
            for nid, s in sigs.items()
            if nid != qid and any(a == b for a, b in zip(s, sigs[qid]))
        }
        scored = sorted(
            (
                (
                    round6(
                        fold_dot(rows[qid], rows[nid])
                        / (fold_norm(rows[qid]) * fold_norm(rows[nid]))
                    ),
                    nid,
                )
                for nid in cands
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, nid) in enumerate(scored[:k], start=1):
            expected.append((qid, nid, rank, cos))
    assert got == sorted(expected) and len(got) > 0


def test_ivf_topk_driver_rederivation_bit_exact(spark, sf_dir):
    """Same straight-line pin for IVF: with the coarse quantizer shared
    (ivf_centers + the pytest-pinned matmul assignment), the probe →
    candidate → exact-cosine → rank pipeline re-derived driver-side must
    equal the distributed relation bit-exactly."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 10")
    k, n_centroids, n_probe = 5, 8, 3
    got = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                emb, queries, k=k, n_centroids=n_centroids, n_probe=n_probe
            ).collect(),
        )
    )

    centers = similarity.ivf_centers(emb, n_centroids=n_centroids)
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    C = np.asarray(centers, dtype=np.float64)
    c_sq = (C**2).sum(axis=1)
    cells = {
        vid: int((c_sq - 2.0 * (np.asarray(v) @ C.T)).argmin())
        for vid, v in rows.items()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    expected = []
    for qid in [v for v in rows if v < 10]:
        qv = np.asarray(rows[qid])
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        probe = list(np.argsort(-(qn @ cn.T), kind="stable")[:n_probe])
        cands = {
            nid for nid, cl in cells.items() if cl in probe and nid != qid
        }
        scored = sorted(
            (
                (
                    round6(
                        fold_dot(rows[qid], rows[nid])
                        / (fold_norm(rows[qid]) * fold_norm(rows[nid]))
                    ),
                    nid,
                )
                for nid in cands
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, nid) in enumerate(scored[:k], start=1):
            expected.append((qid, nid, rank, cos))
    assert got == sorted(expected) and len(got) > 0


def test_pq_topk_driver_rederivation_bit_exact(spark, sf_dir):
    """PQ straight-line pin: although the ADC scan emits batch-LOCAL
    top-R, the global (adc desc, id) window after it re-derives exactly
    the GLOBAL top-R (local lists are a superset), so a driver recompute
    with global top-R → exact-cosine re-rank → (cos desc, id) top-k must
    match the distributed relation bit-exactly on any layout."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 10")
    k, m, kc, refine = 5, 8, 64, 40
    got = sorted(map(tuple, similarity.pq_topk(emb, queries, k=k).collect()))

    cb = similarity._pq_codebooks(
        emb, "vec_id", "embedding", m, kc, similarity._PQ_SEED, 4096, 25
    )
    codes = {
        r["vec_id"]: r["code"] for r in similarity.pq_encode(emb, cb).collect()
    }
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    mm, _, sub = cb.shape
    shifts = np.arange(mm, dtype=np.int64) * 8

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    nid = np.asarray(sorted(codes), dtype=np.int64)
    code_arr = np.asarray([codes[i] for i in nid], dtype=np.int64)
    sub_codes = (code_arr[:, None] >> shifts[None, :]) & 0xFF
    expected = []
    for qid in [v for v in rows if v < 10]:
        qv = np.asarray(rows[qid], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        lut = np.stack([qn[j * sub : (j + 1) * sub] @ cb[j].T for j in range(mm)])
        scores = lut[np.arange(mm)[None, :], sub_codes].sum(axis=1)
        mask = nid != qid
        cand = np.flatnonzero(mask)
        order = cand[np.lexsort((nid[cand], -scores[cand]))[: refine * k]]
        scored = sorted(
            (
                (
                    round6(
                        fold_dot(rows[qid], rows[int(n)])
                        / (fold_norm(rows[qid]) * fold_norm(rows[int(n)]))
                    ),
                    int(n),
                )
                for n in nid[order]
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, n) in enumerate(scored[:k], start=1):
            expected.append((qid, n, rank, cos))
    assert got == sorted(expected) and len(got) > 0


def test_lsh_multi_probe_recovers_recall_with_4x_fewer_tables(spark, sf_dir):
    """Multi-probe LSH (round 6): probing Hamming-1 neighbor buckets in
    each table must recover the recall that single-probe needs 4x the
    tables (and 4x the corpus-side index) to reach; multi_probe=0 stays
    bit-identical to the original plan."""
    from pyspark.sql import functions as F

    from spark_iforest_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, q)

    sp6 = similarity.lsh_topk(emb, q, bits=4, tables=6)
    mp6 = similarity.lsh_topk(emb, q, bits=4, tables=6, multi_probe=1)
    assert not similarity.topk_recall(exact, sp6).collect()[0]["recall_ok"]
    assert similarity.topk_recall(exact, mp6).collect()[0]["recall_ok"]

    a = sorted(map(tuple, similarity.lsh_topk(emb, q, bits=4, tables=24).collect()))
    b = sorted(
        map(
            tuple,
            similarity.lsh_topk(emb, q, bits=4, tables=24, multi_probe=0).collect(),
        )
    )
    assert a == b


def test_ivfpq_topk_recall_and_exact_cos_values(spark, sf_dir):
    """IVF-PQ (FAISS IVFADC) must clear the same recall floor as its
    parents on the adversarial clusterless corpus, and shared pairs must
    carry cos_sim BIT-EQUAL to the exact path (the re-rank is exact)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 10")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb, q).collect()
    }
    appr = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.ivfpq_topk(emb, q).collect()
    }
    hits = set(exact) & set(appr)
    assert len(hits) / len(exact) >= 0.9
    assert all(exact[p] == appr[p] for p in hits)  # bit-equal, not approx


def test_ivfpq_persisted_index_and_incremental_encode_match_scratch(
    spark, sf_dir, tmp_path
):
    """Frozen (coarse, codebooks) + a two-part ivfpq_encode union written
    to and read back from parquet must search identically to a
    from-scratch run — the incremental-ingest lifecycle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 10")
    old, new = emb.where("vec_id % 3 != 0"), emb.where("vec_id % 3 = 0")
    coarse, cb = similarity.ivfpq_index(emb)
    path = str(tmp_path / "ivfpq_codes")
    similarity.ivfpq_encode(old, coarse, cb).unionByName(
        similarity.ivfpq_encode(new, coarse, cb)
    ).write.parquet(path)
    scratch = sorted(map(tuple, similarity.ivfpq_topk(emb, q).collect()))
    persisted = sorted(
        map(
            tuple,
            similarity.ivfpq_topk(
                emb, q, coarse=coarse, codebooks=cb,
                codes=spark.read.parquet(path),
            ).collect(),
        )
    )
    assert scratch == persisted and len(scratch) > 0


def test_ivfpq_topk_layout_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 10")
    a = sorted(map(tuple, similarity.ivfpq_topk(emb.repartition(3), q).collect()))
    b = sorted(map(tuple, similarity.ivfpq_topk(emb.repartition(17), q).collect()))
    assert a == b and len(a) > 0


def test_ivfpq_scan_prunes_cells_and_reads_codes_not_vectors(spark, sf_dir, tmp_path):
    """The 100 TB contract, both halves: the probe's cell predicate is
    PUSHED to the parquet scan of the code relation (partition/file
    pruning when stored by cell) and the ADC scan consumes only the
    20-byte (id, cell, code) triples — no vector column crosses into
    Python; the exact re-rank re-joins vectors via sort-merge."""
    import re

    from spark_iforest_spark.plans import formatted_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    coarse, cb = similarity.ivfpq_index(emb)
    path = str(tmp_path / "codes")
    similarity.ivfpq_encode(emb, coarse, cb).write.parquet(path)
    codes = spark.read.parquet(path)
    plan = formatted_plan(
        similarity.ivfpq_topk(emb, q, coarse=coarse, codebooks=cb, codes=codes)
    )
    scans = re.findall(
        r"Scan parquet[^\n]*\n(?:.*\n)*?PushedFilters: (.*)", plan
    )
    assert any("In(cell" in s for s in scans)  # probe predicate reached parquet
    args = re.findall(r"\(\d+\) MapInPandas\n(?:.*\n)*?Arguments: (.*)", plan)
    adc_side = [a for a in args if "adc_scan(" in a]
    assert adc_side and all("embedding#" not in a for a in adc_side)
    assert "SortMergeJoin" in plan


def test_ivfpq_topk_driver_rederivation_bit_exact(spark, sf_dir):
    """IVF-PQ straight-line pin: recompute the whole path on the driver —
    sample-fit artifacts, cell assignment, residual codes, probe
    selection, offset+ADC scores, global top-R, exact-cosine re-rank —
    and require the distributed relation bit-exactly."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 10")
    k, n_cells, n_probe, refine = 5, 8, 7, 40
    got = sorted(map(tuple, similarity.ivfpq_topk(emb, queries, k=k).collect()))

    coarse, cb = similarity.ivfpq_index(emb)
    enc = {
        r["vec_id"]: (r["cell"], r["code"])
        for r in similarity.ivfpq_encode(emb, coarse, cb).collect()
    }
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    mm, _, sub = cb.shape
    shifts = np.arange(mm, dtype=np.int64) * 8
    G = np.asarray(coarse)
    g_sq = (G**2).sum(axis=1)

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    nid = np.asarray(sorted(enc), dtype=np.int64)
    cell_arr = np.asarray([enc[i][0] for i in nid], dtype=np.int64)
    code_arr = np.asarray([enc[i][1] for i in nid], dtype=np.int64)
    sub_codes = (code_arr[:, None] >> shifts[None, :]) & 0xFF
    expected = []
    for qid in [v for v in rows if v < 10]:
        qv = np.asarray(rows[qid], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        qd2 = g_sq - 2.0 * (qn @ G.T)
        probe = np.sort(np.argsort(qd2, kind="stable")[:n_probe])
        offs = qn @ G.T
        lut = np.stack([qn[j * sub : (j + 1) * sub] @ cb[j].T for j in range(mm)])
        mask = np.isin(cell_arr, probe) & (nid != qid)
        cand = np.flatnonzero(mask)
        scores = (
            lut[np.arange(mm)[None, :], sub_codes[cand]].sum(axis=1)
            + offs[cell_arr[cand]]
        )
        order = cand[np.lexsort((nid[cand], -scores))[: refine * k]]
        scored = sorted(
            (
                (
                    round6(
                        fold_dot(rows[qid], rows[int(n)])
                        / (fold_norm(rows[qid]) * fold_norm(rows[int(n)]))
                    ),
                    int(n),
                )
                for n in nid[order]
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, n) in enumerate(scored[:k], start=1):
            expected.append((qid, n, rank, cos))
    assert got == sorted(expected) and len(got) > 0

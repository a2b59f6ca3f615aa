"""Round-14 optimization internals: substr/line expression-tree memoization
keying, the fused single-pass DSIR estimator, and the BPE driver fit's
heap-based argmin.

These pin the NEW mechanics this optimization round introduced; the value
contracts stay pinned by the existing operator suites and the oracle gates
(all re-verified hash-green after each change)."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.functions import _EXPR_MEMO


@pytest.fixture(scope="module")
def docs(spark):
    from tests.test_dedup import DOCS

    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_substr_trees_memoized_per_window(spark, docs):
    # the window-key and interval-fold trees key on the window width alone
    # (they read only fixed-name staged columns); two calls at the same
    # window share one cached tree, a different window gets its own —
    # the cache-poisoning regression the key exists to prevent
    from spark_iforest_spark.operators.dedup import exact_substring_spans

    for k in [k for k in _EXPR_MEMO if k[0] in (
        "substr_window_keys", "substr_merge_fold"
    )]:
        _EXPR_MEMO.pop(k)
    exact_substring_spans(docs, window=3).collect()
    w3_keys = _EXPR_MEMO[("substr_window_keys", 3)]
    w3_fold = _EXPR_MEMO[("substr_merge_fold", 3)]
    exact_substring_spans(docs, window=3).collect()
    assert _EXPR_MEMO[("substr_window_keys", 3)] is w3_keys
    assert _EXPR_MEMO[("substr_merge_fold", 3)] is w3_fold
    spans4 = exact_substring_spans(docs, window=4)
    assert _EXPR_MEMO[("substr_window_keys", 4)] is not w3_keys
    assert _EXPR_MEMO[("substr_merge_fold", 4)] is not w3_fold
    # and the window-4 spans really are window-4 spans (end-start >= 4)
    rows = spans4.collect()
    assert all(r["end"] - r["start"] >= 4 for r in rows)


def test_substr_apply_memoized_values_roundtrip(spark, docs):
    # the masking/rebuild trees are parameter-free (fixed staged names);
    # memoized apply must still rebuild text identically to md5 pinning
    from spark_iforest_spark.operators.dedup import remove_repeated_substrings

    out = remove_repeated_substrings(docs, window=3, with_text=True).collect()
    import hashlib

    for r in out:
        assert hashlib.md5(r["clean_text"].encode()).hexdigest() == r["clean_md5"]
        assert r["n_kept"] == len([t for t in r["clean_text"].split(" ") if t != ""]) or (
            r["clean_text"] == "" and r["n_kept"] == 0
        )


def test_bpe_fit_heap_matches_full_rescan():
    # the lazy-deletion heap + net-delta merge application must reproduce
    # the former full-rescan argmin byte-for-byte: same (-count, pair)
    # key, same lex tie-break, same <2 stop — checked against a reference
    # reimplementation of the old algorithm on tie-heavy vocabularies
    import random

    from spark_iforest_spark.operators.tokenizer import _bpe_fit, _word_symbols

    def reference_fit(word_counts, n_merges):
        seqs, counts = {}, {}
        for i, (w, c) in enumerate(word_counts.items()):
            seqs[i] = list(_word_symbols(w))
            counts[i] = c
        pair_count, pair_words = {}, {}

        def add(wid, sign):
            s, c = seqs[wid], counts[wid]
            for p in zip(s, s[1:]):
                pair_count[p] = pair_count.get(p, 0) + sign * c
                if sign > 0:
                    pair_words.setdefault(p, set()).add(wid)
                elif pair_count.get(p, 0) <= 0:
                    pair_count.pop(p, None)
                    pair_words.pop(p, None)

        for wid in seqs:
            add(wid, +1)
        merges = []
        for _ in range(n_merges):
            if not pair_count:
                break
            best = min(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pair_count[best] < 2:
                break
            merges.append([best[0], best[1]])
            merged = best[0] + best[1]
            for wid in list(pair_words.get(best, ())):
                add(wid, -1)
                s = seqs[wid]
                out, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == best[0]
                        and s[i + 1] == best[1]
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[wid] = out
                add(wid, +1)
        return merges

    # overlap-heavy fixed cases (aaa self-overlap, equal-count ties)
    small = {"aaab": 5, "abab": 5, "bbba": 5, "ab": 3, "ba": 3, "aaaa": 4, "aaa": 7}
    assert _bpe_fit(small, 50) == reference_fit(small, 50)
    # tie-dense random two-letter vocabularies stress the heap's stale
    # handling: counts collide constantly, every round is a tie-break
    for seed in range(5):
        rng = random.Random(seed)
        wc = {
            "".join(rng.choice("ab") for _ in range(rng.randint(2, 8))): rng.randint(1, 9)
            for _ in range(500)
        }
        assert _bpe_fit(wc, 300) == reference_fit(wc, 300), f"seed {seed}"


def test_dsir_estimator_fused_union_matches_two_pass(spark):
    # the tagged-union single aggregate must produce the exact integer
    # counts (and therefore snapped log ratios) of the former per-side
    # aggregates — checked against an inline reimplementation of the old
    # two-pass shape
    from pyspark.sql import functions as F

    from spark_iforest_spark.operators.pipeline import (
        _dsir_rows,
        _md5_u32,
        dsir_estimator,
        dsir_grams,
    )

    docs = spark.createDataFrame(
        [
            (1, "de", "der hund la le lu"),
            (2, "de", "die katze la le"),
            (3, "en", "the dog la le lu"),
            (4, "en", "the cat miau miau"),
            (5, "en", None),
        ],
        ["doc_id", "lang", "text"],
    )
    target, raw, m, salt = docs.where(F.col("lang") == "de"), docs, 64, "dsir"

    def old_counts(df):
        return (
            df.select(F.explode(dsir_grams(F.col("text"))).alias("g"))
            .select((_md5_u32(F.col("g"), salt) % m).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
        )

    buckets = spark.range(m).select(F.col("id").alias("bucket"))
    t = old_counts(target).withColumnRenamed("cnt", "cnt_t")
    r = old_counts(raw).withColumnRenamed("cnt", "cnt_r")
    old = _dsir_rows(
        buckets.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
            F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
        ),
        m,
        1.0,
    )
    new = dsir_estimator(target, raw, n_buckets=m)
    assert new.schema == old.schema
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))


def _emb_rows(rng, direction, n, start_id, noise=0.05):
    import numpy as np

    d = np.asarray(direction, dtype=float)
    d = d / np.linalg.norm(d)
    return [
        (
            start_id + i,
            [float(x) for x in d + noise * rng.standard_normal(len(d))],
        )
        for i in range(n)
    ]


def _topk_rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_topk_grouped_single_group_matches_ivf_topk(spark, tmpdir):
    # one (centers, assigned) group must reduce to ivf_topk's
    # persisted-index mode exactly — the extraction of _ivf_candidates is
    # pure code motion
    import numpy as np

    from spark_iforest_spark.operators import similarity

    rng = np.random.default_rng(5)
    rows = (
        _emb_rows(rng, [1, 0, 0, 0], 40, 0)
        + _emb_rows(rng, [0, 1, 0, 0], 40, 100)
        + _emb_rows(rng, [0, 0, 1, 0], 40, 200)
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id % 30 = 0")
    centers = similarity.ivf_centers(emb, n_centroids=3)
    assigned = similarity.ivf_assign(emb, centers)
    want = _topk_rows(
        similarity.ivf_topk(
            emb, q, k=4, n_probe=2, centers=centers, assigned=assigned,
            two_phase=False,
        )
    )
    got = _topk_rows(
        similarity.ivf_topk_grouped(q, [(centers, assigned)], k=4, n_probe=2)
    )
    assert got == want and len(got) > 0


def test_requantize_live_with_concurrent_ingest(spark, tmpdir):
    """The live requantize contract end to end: epoch-scoped parts keep a
    running ingest correct THROUGH a re-quantization — pre-requantize
    parts, an in-flight old-space straggler landing after the epoch bump,
    a late retry of an already-folded batch id, and post-requantize
    batches are all probeable, with exact all-cell probes matching brute
    force at every step and 1-probe recall restored on the drifted slice."""
    import numpy as np

    from pyspark.sql import functions as F

    from spark_iforest_spark import streaming as S
    from spark_iforest_spark.operators import similarity

    rng = np.random.default_rng(11)
    dim = 8
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    mid = [1.0, 1.0] + [0.0] * (dim - 2)
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(
        _emb_rows(rng, e0, 60, 0) + _emb_rows(rng, e1, 60, 100), schema
    )
    drift = spark.createDataFrame(_emb_rows(rng, mid, 60, 200), schema)
    straggler = spark.createDataFrame(_emb_rows(rng, mid, 10, 400), schema)

    src = str(tmpdir) + "/src"
    idx = str(tmpdir) + "/idx"
    cdir = str(tmpdir) + "/centers"
    ck = str(tmpdir) + "/ck"

    assert S.publish_ann_centers(
        spark, cdir, similarity.ivf_centers(base, n_centroids=2)
    ) == 0

    def exact_all_probe(full, q, k=5):
        groups = S.latest_ann_index_live(spark, idx, cdir)
        n_cells = max(len(c) for c, _ in groups)
        got = _topk_rows(
            similarity.ivf_topk_grouped(q, groups, k=k, n_probe=n_cells)
        )
        want = _topk_rows(similarity.cosine_topk(full, q, k=k))
        assert got == want and len(got) > 0

    # epoch 0: base corpus over >= 2 batches (checkpointed — batch ids
    # must CONTINUE across the later re-starts)
    base.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.ann_ingest_live(stream, idx, cdir, checkpoint_dir=ck).awaitTermination()
    assert S._index_epochs(spark, idx) == [0]
    exact_all_probe(base, base.where("vec_id % 40 = 0"))

    # drifted batches arrive on the same source/checkpoint, still epoch 0
    drift.repartition(2).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.ann_ingest_live(stream2, idx, cdir, checkpoint_dir=ck).awaitTermination()
    full = base.unionByName(drift)
    q = drift.where(F.col("vec_id") % 20 == 0)
    exact = similarity.cosine_topk(full, q, k=5)
    groups0 = S.latest_ann_index_live(spark, idx, cdir)
    pre = similarity.ivf_topk_grouped(q, groups0, k=5, n_probe=1)
    pre_ok = similarity.topk_recall(exact, pre, floor=0.9).collect()[0]
    assert not pre_ok["recall_ok"]  # drift straddles the old cells

    old_epoch_ids = S._part_ids(spark, idx + "/e0", "b")
    old_centers = S.current_ann_centers(spark, cdir)[1]

    # LIVE requantize — no stream stopped, new epoch published
    new_centers, new_epoch = S.requantize_ann_index_live(
        spark, idx, cdir, n_centroids=3
    )
    assert new_epoch == 1
    # old epoch tombstoned at its max folded id, folded parts GC'd
    assert S._part_ids(spark, idx + "/e0", "c") == [max(old_epoch_ids)]
    assert S._part_ids(spark, idx + "/e0", "b") == []

    # 1-probe recall on the drifted slice is restored by the new quantizer
    post = similarity.ivf_topk_grouped(
        q, S.latest_ann_index_live(spark, idx, cdir), k=5, n_probe=1
    )
    post_ok = similarity.topk_recall(exact, post, floor=0.9).collect()[0]
    assert post_ok["recall_ok"]
    exact_all_probe(full, q)

    # an IN-FLIGHT old-space batch commits after the epoch bump: its id is
    # above the tombstone, so it stays live in e0 and is probed under the
    # OLD centers — the exact-ranking merge keeps results correct
    straggler_bid = max(old_epoch_ids) + 1
    similarity.ivf_assign(straggler, old_centers).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(f"{idx}/e0/b{straggler_bid}")
    full2 = full.unionByName(straggler)
    exact_all_probe(full2, straggler.where("vec_id % 3 = 0"))

    # a LATE RETRY of an already-folded batch id re-writes its old part:
    # at or below the tombstone, the read rule ignores it — no duplicates
    retry_bid = old_epoch_ids[0]
    similarity.ivf_assign(
        base.where(F.col("vec_id") < 5), old_centers
    ).write.partitionBy("cell").mode("overwrite").parquet(
        f"{idx}/e0/b{retry_bid}"
    )
    exact_all_probe(full2, straggler.where("vec_id % 3 = 0"))
    n_live = sum(
        df.count() for _, df in S.latest_ann_index_live(spark, idx, cdir)
    )
    assert n_live == full2.count()  # no duplicates, nothing lost

    # post-requantize ingest continues on the same checkpoint into e1
    extra = spark.createDataFrame(_emb_rows(rng, mid, 12, 500), schema)
    extra.coalesce(1).write.mode("append").parquet(src)
    stream3 = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    S.ann_ingest_live(stream3, idx, cdir, checkpoint_dir=ck).awaitTermination()
    full3 = full2.unionByName(extra)
    exact_all_probe(full3, extra.where("vec_id % 2 = 0"))

    # a second requantize folds the straggler and the new-epoch parts
    _, epoch2 = S.requantize_ann_index_live(spark, idx, cdir, n_centroids=3)
    assert epoch2 == 2
    exact_all_probe(full3, extra.where("vec_id % 2 = 0"))
    n_live = sum(
        df.count() for _, df in S.latest_ann_index_live(spark, idx, cdir)
    )
    assert n_live == full3.count()

    # a third, back-to-back requantize: every old epoch's live set is now
    # a single base at an id that ALREADY EXISTS as its tombstone/real
    # base — exercises the delete-then-rename re-tombstone path
    _, epoch3 = S.requantize_ann_index_live(spark, idx, cdir, n_centroids=3)
    assert epoch3 == 3
    exact_all_probe(full3, extra.where("vec_id % 2 = 0"))
    n_live = sum(
        df.count() for _, df in S.latest_ann_index_live(spark, idx, cdir)
    )
    assert n_live == full3.count()


def test_line_rebuild_memoized_order_preserved(spark):
    # the line-rebuild tree is memoized parameter-free; surviving lines
    # must still come back in original document order
    from spark_iforest_spark.operators.pipeline import line_dedup

    boiler = "the same boilerplate line"
    d = spark.createDataFrame(
        [
            (1, f"alpha one\n{boiler}\nzeta last"),
            (2, f"{boiler}\nbravo two"),
            (3, "gamma three only"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(d, min_docs=2, with_text=True).collect()
    }
    assert out[1] == "alpha one\nzeta last"
    assert out[2] == "bravo two"
    assert out[3] == "gamma three only"

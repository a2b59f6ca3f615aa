"""Semantics tests for the temporal joins (as-of, bucketized range) and the
corpus text ops added in round 3 (line dedup, TF-IDF) — hand-computed
expectations on tiny in-memory frames, plus plan-shape assertions that the
range join never degenerates to a nested-loop/cartesian plan.
"""

import hashlib

from spark_iforest_spark.operators import pipeline, relational, text
from spark_iforest_spark.plans import formatted_plan, python_eval_nodes

NS = 1_000_000_000


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 5), (3, 2, 50)],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(1, 10, 7, 1.0), (1, 100, 8, 2.0), (1, 100, 9, 3.0), (2, 60, 10, 4.0)],
        "k long, t long, okey long, val double",
    )
    out = {
        r["event_id"]: r
        for r in relational.asof_join(
            left, right, "k", "k", "t", "t", payload=["okey", "val"], tiebreak="okey"
        ).collect()
    }
    assert len(out) == 3
    # equal-ts right row IS visible (inclusive <=), and among the two right
    # rows at t=100 the greatest tiebreak (okey=9) wins deterministically
    assert out[1]["okey"] == 9 and out[1]["val"] == 3.0
    # no right row at or before t=5 -> left-outer NULLs
    assert out[2]["okey"] is None and out[2]["val"] is None
    # right row exists but strictly AFTER the left ts -> NULL
    assert out[3]["okey"] is None
    # left columns survive untouched
    assert out[1]["k"] == 1 and out[1]["t"] == 100


def test_asof_join_no_python_nodes(spark):
    left = spark.createDataFrame([(1, 1, 100)], "event_id long, k long, t long")
    right = spark.createDataFrame([(1, 10, 7)], "k long, t long, okey long")
    q = relational.asof_join(left, right, "k", "k", "t", "t", payload=["okey"])
    assert python_eval_nodes(q) == []


def test_event_follow_counts_semantics(spark):
    rows = [
        (0, 0 * NS, 1, "a", 0.0, "{}"),
        (1, 299 * NS, 1, "b", 0.0, "{}"),   # 299s after ev0: within gap
        (2, 301 * NS, 1, "b", 0.0, "{}"),   # 301s after ev0: out; 2s after ev1
        (3, 0 * NS, 1, "c", 0.0, "{}"),     # same ts as ev0: excluded (strict >)
        (4, 1000 * NS, 2, "a", 0.0, "{}"),  # other user: no pairs
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    out = {
        (r["lead_type"], r["follow_type"]): r["n_pairs"]
        for r in relational.event_follow_counts(ev, gap_seconds=300).collect()
    }
    # ev1 (bucket 0, t=299s) -> ev2 (bucket 1, t=301s) crosses the bin
    # boundary and is only reachable via the exploded bucket+1 key
    assert out == {("a", "b"): 1, ("b", "b"): 1, ("c", "b"): 1}


def test_event_follow_counts_plan_is_equi_join(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    q = relational.event_follow_counts(ev)
    plan = formatted_plan(q)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert python_eval_nodes(q) == []


def test_line_dedup_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "dup line\nunique one"),
            (2, "dup line\nunique two"),
            (3, "dup line"),
            (4, "z tail\na head"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pipeline.line_dedup(docs).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_md5"] == md5("unique one")
    # every line shared -> document empties out but is NOT dropped
    assert out[3]["n_lines"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["clean_md5"] == md5("")
    # surviving lines keep their ORIGINAL order (not sorted text)
    assert out[4]["clean_md5"] == md5("z tail\na head")


def test_line_dedup_min_docs_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\nz"), (3, "x\nw")],
        "doc_id long, text string",
    )
    # min_docs=4: the 3-doc line survives everywhere
    out = {r["doc_id"]: r for r in pipeline.line_dedup(docs, min_docs=4).collect()}
    assert all(r["n_kept"] == 2 for r in out.values())


def test_tfidf_top_terms(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry date")],
        "doc_id long, text string",
    )
    rows = text.tfidf_top_terms(docs, k=2).collect()
    got = {(r["doc_id"], r["rank"]): r for r in rows}
    # N=3; df: apple 1, banana 2, cherry 2, date 1
    assert got[(1, 1)]["term"] == "apple"  # 2 * 4/2 = 4.0
    assert got[(1, 1)]["score"] == 4.0
    assert got[(1, 2)]["term"] == "banana"  # 1 * 4/3
    assert got[(1, 2)]["score"] == round(4.0 / 3.0, 6)
    # doc2: banana and cherry tie at 4/3 -> term-asc tiebreak
    assert got[(2, 1)]["term"] == "banana" and got[(2, 2)]["term"] == "cherry"
    # doc3: cherry 2*(4/3)=2.67 beats date 1*(4/2)=2.0
    assert got[(3, 1)]["term"] == "cherry" and got[(3, 2)]["term"] == "date"
    assert got[(3, 1)]["tf"] == 2 and got[(3, 1)]["df"] == 2


def test_asof_join_random_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(3):
        L = [(i, int(rng.integers(0, 4)), int(rng.integers(0, 50))) for i in range(40)]
        R = [
            (int(rng.integers(0, 4)), int(rng.integers(0, 50)), j, float(j) / 3.0)
            for j in range(30)
        ]
        left = spark.createDataFrame(L, "event_id long, k long, t long")
        right = spark.createDataFrame(R, "k long, t long, okey long, val double")
        out = {
            r["event_id"]: (r["okey"], r["val"])
            for r in relational.asof_join(
                left, right, "k", "k", "t", "t", payload=["okey", "val"],
                tiebreak="okey",
            ).collect()
        }
        for i, k, t in L:
            cands = [(rt, okey, val) for (rk, rt, okey, val) in R if rk == k and rt <= t]
            if not cands:
                assert out[i] == (None, None)
            else:
                mt = max(c[0] for c in cands)
                okey = max(c[1] for c in cands if c[0] == mt)
                val = next(c[2] for c in cands if c[0] == mt and c[1] == okey)
                assert out[i] == (okey, val)


def test_heavy_hitter_tokens_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a c b d")], "doc_id long, text string"
    )
    # n_total=10, k=3 -> threshold 10/4=2.5: only 'a' (6) qualifies
    out = text.heavy_hitter_tokens(docs, k=3).collect()
    assert len(out) == 1
    assert out[0]["token"] == "a" and out[0]["n_occurrences"] == 6
    assert out[0]["n_total"] == 10
    # k=50 -> threshold 10/51: every token qualifies, with exact counts
    out = {r["token"]: r["n_occurrences"] for r in text.heavy_hitter_tokens(docs, k=50).collect()}
    assert out == {"a": 6, "b": 2, "c": 1, "d": 1}


def test_heavy_hitter_tokens_partition_invariant(spark):
    rows = [(i, "hot " * 20 + f"cold{i} rare{i % 7}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, text.heavy_hitter_tokens(docs, k=5).collect()))
    b = sorted(map(tuple, text.heavy_hitter_tokens(docs.repartition(7), k=5).collect()))
    assert a == b and len(a) >= 1  # 'hot' dominates regardless of layout


# ---------------------------------------------------------- signals_panel
def test_signals_panel_equals_joined_operators(spark, sf_dir):
    """The fused single-scan panel must emit exactly the relation of the
    seven standalone operators joined on doc_id (the expression builders
    are shared, so this pins that the fusion changed the plan, not the
    values)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    panel = text.signals_panel(docs)
    joined = (
        text.token_stats(docs)
        .join(text.lang_id(docs), "doc_id")
        .join(text.quality_score(docs), "doc_id")
        .join(text.fingerprint(docs), "doc_id")
        .join(
            pipeline.repetition_stats(docs).withColumnRenamed(
                "n_tokens", "rep_n_tokens"
            ),
            "doc_id",
        )
        .join(
            text.token_typicality(docs)
            .withColumnRenamed("n_tokens", "lm_n_tokens")
            .withColumnRenamed("sum_ppb", "lm_sum_ppb"),
            "doc_id",
        )
        .join(
            pipeline.gopher_filter(docs).select(
                "doc_id", "symbol_ratio", "alpha_word_frac", "stopword_hits",
                "dup_line_frac", "dup_line_char_frac",
                "dup_para_frac", "dup_para_char_frac",
                "top_2gram_char_frac", "top_3gram_char_frac",
                "gopher_fail_mask", "gopher_keep",
            ),
            "doc_id",
        )
    )
    cols = sorted(panel.columns)
    assert cols == sorted(joined.columns)
    a = sorted(map(tuple, panel.select(*cols).collect()))
    b = sorted(map(tuple, joined.select(*cols).collect()))
    assert a == b and len(a) > 0


def test_signals_panel_halves_scans(spark, sf_dir):
    """Plan shape: all per-row signals fuse into ONE scan; only the
    typicality vocab join adds legs. Measured: 8 scans / 14 exchanges for
    the panel vs 16 / 22 for the six-way join — assert the panel stays
    strictly cheaper and the per-row part never re-splits."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = formatted_plan(text.signals_panel(docs))
    assert plan.count("Scan parquet") <= 8
    assert plan.count("Exchange") <= 14

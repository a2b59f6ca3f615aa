"""Semantics tests for the round-3 retrieval/rollup block: BM25 top-k,
unigram-LM token typicality, explicit-value pivot, CUBE rollup, and
latest-per-key changelog compaction. Hand-computed expectations on tiny
in-memory frames plus no-Python-node plan assertions.
"""

from spark_iforest_spark.operators import relational, text
from spark_iforest_spark.plans import python_eval_nodes

NS = 1_000_000_000


# ------------------------------------------------------------------ bm25
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_heavier_matches_higher(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
    )
    out = text.bm25_topk(docs, ("spark",), k=10).collect()
    # doc 3 has no hits and must be absent entirely
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2
    assert out[0]["score_micros"] > out[1]["score_micros"] > 0
    assert out[0]["n_hit_terms"] == 1


def test_bm25_length_normalization(spark):
    # same tf=1, but doc 2 is 4x longer -> lower score (b=0.75 penalty)
    docs = _docs(
        spark,
        [
            (1, "spark a b c"),
            (2, "spark a b c d e f g h i j k l m n o"),
        ],
    )
    out = {r["doc_id"]: r for r in text.bm25_topk(docs, ("spark",), k=10).collect()}
    assert out[1]["score_micros"] > out[2]["score_micros"]


def test_bm25_multi_term_hit_count(spark):
    docs = _docs(
        spark,
        [
            (1, "spark vector query"),
            (2, "spark spark spark"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in text.bm25_topk(docs, ("spark", "vector", "query"), k=10).collect()
    }
    assert out[1]["n_hit_terms"] == 3 and out[2]["n_hit_terms"] == 1


def test_bm25_no_python_nodes(spark):
    docs = _docs(spark, [(1, "spark a")])
    assert python_eval_nodes(text.bm25_topk(docs, ("spark",))) == []


def test_bm25_batch_topk_per_query_isolation(spark):
    # two queries over one corpus in ONE plan; each query's ranking ignores
    # the other's terms entirely
    docs = _docs(
        spark,
        [
            (1, "spark spark filler"),
            (2, "vector vector filler"),
            (3, "filler filler filler"),
        ],
    )
    out = text.bm25_batch_topk(docs, {"qa": ("spark",), "qb": ("vector",)}, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert [r["doc_id"] for r in by_q["qa"]] == [1]
    assert [r["doc_id"] for r in by_q["qb"]] == [2]
    assert all(r["rank"] == 1 for r in out)


def test_bm25_single_query_equals_batch(spark):
    docs = _docs(
        spark,
        [
            (1, "spark vector query filler"),
            (2, "spark spark spark filler"),
            (3, "filler filler filler filler"),
        ],
    )
    single = sorted(
        map(tuple, text.bm25_topk(docs, ("spark", "vector"), k=10).collect())
    )
    batch = sorted(
        map(
            tuple,
            text.bm25_batch_topk(docs, {"q0": ("spark", "vector")}, k=10)
            .select("doc_id", "rank", "n_hit_terms", "score_micros")
            .collect(),
        )
    )
    assert single == batch and len(single) == 2


def test_bm25_rank_is_window_group_limited(spark):
    """Round-4 perf fix: the final rank must be WindowGroupLimit-planned
    (partial per-partition top-k before the shuffle), not a bare global
    single-partition Window sort."""
    from spark_iforest_spark.plans import formatted_plan

    docs = _docs(spark, [(1, "spark a")])
    plan = formatted_plan(text.bm25_topk(docs, ("spark",)))
    assert "WindowGroupLimit" in plan


# ------------------------------------------------------- token_typicality
def test_token_typicality_prefers_common_tokens(spark):
    # "common" appears 8x corpus-wide, each rare token once; the all-common
    # doc must score strictly higher than the all-rare doc
    docs = _docs(
        spark,
        [
            (1, "common common common common"),
            (2, "common common common common"),
            (3, "rare1 rare2 rare3 rare4"),
        ],
    )
    out = {r["doc_id"]: r for r in text.token_typicality(docs).collect()}
    assert out[1]["typicality_ppb"] == out[2]["typicality_ppb"]
    assert out[1]["typicality_ppb"] > out[3]["typicality_ppb"]
    # 12 tokens total: p(common)=8/12, p(rare_i)=1/12; floor to ppb
    assert out[1]["sum_ppb"] == 4 * int(1e9 * 8 / 12)
    assert out[3]["n_tokens"] == 4


def test_token_typicality_no_python_nodes(spark):
    docs = _docs(spark, [(1, "a b")])
    assert python_eval_nodes(text.token_typicality(docs)) == []


# ------------------------------------------------------- event_type_pivot
_EV_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def test_event_type_pivot_counts_and_schema(spark):
    day = 86400 * NS
    rows = [
        (0, 0 * day, 1, "click", 0.0, "{}"),
        (1, 0 * day + 5 * NS, 1, "click", 0.0, "{}"),
        (2, 0 * day + 9 * NS, 2, "view", 0.0, "{}"),
        (3, 1 * day + NS, 1, "error", 0.0, "{}"),
        # unexpected type must be dropped, not widen the schema
        (4, 1 * day + 2 * NS, 2, "mystery", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r["day"]: r for r in relational.event_type_pivot(ev).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_click"] == 2 and out[0]["n_view"] == 1 and out[0]["n_error"] == 0
    assert out[1]["n_error"] == 1 and out[1]["n_click"] == 0
    # unseen types still present as 0 columns; schema is fixed a priori
    cols = relational.event_type_pivot(ev).columns
    assert cols == ["day", "n_click", "n_error", "n_purchase", "n_signup", "n_view"]
    assert "n_mystery" not in cols


# ------------------------------------------------------------ orders_cube
def test_orders_cube_margins(spark):
    rows = [
        (1, "O", "1-URGENT", 10.0),
        (2, "O", "5-LOW", 20.0),
        (3, "F", "1-URGENT", 30.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_orderpriority string, o_totalprice double"
    )
    out = {
        (r["status"], r["priority"]): r for r in relational.orders_cube(orders).collect()
    }
    # 2x2 cells + margins: (O,1U),(O,5L),(F,1U), O/F margins, 1U/5L margins, grand
    assert out[("(all)", "(all)")]["n_orders"] == 3
    assert out[("(all)", "(all)")]["sum_totalprice"] == 60.0
    assert out[("O", "(all)")]["n_orders"] == 2
    assert out[("O", "(all)")]["sum_totalprice"] == 30.0
    assert out[("(all)", "1-URGENT")]["n_orders"] == 2
    assert out[("F", "1-URGENT")]["sum_totalprice"] == 30.0
    assert len(out) == 3 + 2 + 2 + 1


# -------------------------------------------------- latest_event_per_user
def test_latest_event_per_user_tiebreak(spark):
    rows = [
        (10, 100 * NS, 1, "click", 1.0, "{}"),
        (11, 100 * NS, 1, "view", 2.0, "{}"),   # same ts: higher event_id wins
        (12, 50 * NS, 1, "error", 3.0, "{}"),
        (20, 7 * NS, 2, "signup", 4.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r["user_id"]: r for r in relational.latest_event_per_user(ev).collect()}
    assert out[1]["event_id"] == 11 and out[1]["event_type"] == "view"
    assert out[1]["ts_s"] == 100
    assert out[2]["event_id"] == 20 and out[2]["value"] == 4.0
    assert len(out) == 2


def test_latest_event_no_python_nodes(spark):
    ev = spark.createDataFrame([(0, 0, 1, "a", 0.0, "{}")], _EV_SCHEMA)
    assert python_eval_nodes(relational.latest_event_per_user(ev)) == []

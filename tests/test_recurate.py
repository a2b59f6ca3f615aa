"""Round 12: diff-driven incremental re-curation.

Contract under test (the driver's ``recurate_diff`` gate checks the same
equality against DuckDB): ``recurate_with_diff(B, corpus_diff(A, B),
state_A)`` produces a state whose artifacts equal
``curation_state(B, retractable=True)`` built from scratch — including
the cascade cases signed deltas alone cannot express:

* a removed doc drops a line count below min_docs, re-entering the line
  into every retained doc that contains it;
* a removed doc held a window's keep-first keeper, reassigning the
  exemption;
* a removed doc was the bridge of a near-dup chain, SPLITTING a
  connected component;
* NULL-text transitions in both directions.
"""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import corpus, recurate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _mk_state(docs, **kw):
    return corpus.materialize_curation_state(
        corpus.curation_state(docs, retractable=True, **kw)
    )


_STATE_REL_NAMES = (
    "ids", "line_index", "substr_index", "shingle_index", "labels",
    "quality", "nin_digest", "line_detail", "substr_detail",
)


def _assert_states_equal(got, want):
    for name in _STATE_REL_NAMES:
        ga, wa = getattr(got, name), getattr(want, name)
        assert (ga is None) == (wa is None), f"{name}: presence differs"
        if ga is not None:
            assert _rows(ga) == _rows(wa), f"{name}: rows differ"
    assert _rows(corpus.curated_digests(got)) == _rows(
        corpus.curated_digests(want)
    )


def _recurate_vs_scratch(spark, a_rows, b_rows, **kw):
    a, b = _docs(spark, a_rows), _docs(spark, b_rows)
    state_a = _mk_state(a, **kw)
    diff = corpus.corpus_diff(a, b)
    changes, state_b = recurate.recurate_with_diff(b, diff, state_a)
    _assert_states_equal(
        corpus.materialize_curation_state(state_b), _mk_state(b, **kw)
    )
    return a, b, state_a, changes


def test_line_flip_resurrects_boilerplate(spark):
    """Docs 1 and 2 share a line (count == min_docs: removed from both).
    Removing doc 2 drops the count to 1 — the line must RE-ENTER doc 1's
    rebuilt text (the D1 cascade), and the from-scratch state agree."""
    a_rows = [
        (1, "nav bar here\nunique body of doc one"),
        (2, "nav bar here\nentirely different doc two"),
        (3, "standalone document three text"),
    ]
    b_rows = [r for r in a_rows if r[0] != 2]
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=False, line_min_docs=2, substr_window=None, neardup=False,
    )


def test_line_flip_added_doc_pushes_over_threshold(spark):
    """An ADDED doc pushes a line count over min_docs — the line must now
    be cut from the retained doc that held it."""
    a_rows = [
        (1, "cookie banner text\nkeep this body"),
        (2, "another doc body entirely"),
    ]
    b_rows = a_rows + [(9, "cookie banner text\nnew arrival body")]
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=False, line_min_docs=2, substr_window=None, neardup=False,
    )


def test_substr_keeper_reassignment(spark):
    """Docs 3 and 4 share a 3-token window; the keep-first keeper is doc
    3's occurrence. Removing doc 3 must hand the exemption to doc 4 (the
    D2 keeper cascade) — doc 4's rebuilt text regains the passage."""
    a_rows = [
        (3, "aaa bbb ccc tail three x1 x2"),
        (4, "head four aaa bbb ccc y1 y2"),
        (5, "unrelated five body z1 z2 z3"),
    ]
    b_rows = [r for r in a_rows if r[0] != 3]
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=False, line_min_docs=None, substr_window=3, neardup=False,
    )


def test_substr_status_flip_both_directions(spark):
    """A removed doc drops a window below min_count (the remaining
    occurrence is kept again) while an added doc duplicates a previously
    unique window (now cut from the non-keeper)."""
    a_rows = [
        (1, "p1 p2 p3 p4 filler one"),
        (2, "q0 p1 p2 p3 p4 filler two"),  # shares window with 1 (cut here)
        (3, "r1 r2 r3 r4 filler three"),
    ]
    b_rows = [
        r for r in a_rows if r[0] != 1
    ] + [(9, "zz r1 r2 r3 r4 new arrival")]  # duplicates doc 3's window
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=False, line_min_docs=None, substr_window=4, neardup=False,
    )


def _chain_rows():
    w = ["w%02d" % i for i in range(1, 24)]
    return [
        (5, " ".join(w[0:20])),   # w1..w20
        (6, " ".join(w[1:21])),   # w2..w21: jac(5,6) ~ 0.894
        (7, " ".join(w[3:23])),   # w4..w23: jac(6,7) = 0.8, jac(5,7) < 0.8
        (8, "totally separate doc eight body"),
    ]


def test_cluster_split_on_bridge_removal(spark):
    """5~6~7 is one connected component only THROUGH doc 6 (5 and 7 fall
    below the threshold directly). Removing 6 must SPLIT the cluster —
    star edges from the old labels would keep 5 and 7 glued, so the
    re-pairing from actual shingles is what this pins."""
    a_rows = _chain_rows()
    b_rows = [r for r in a_rows if r[0] != 6]
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=False, line_min_docs=None, substr_window=None, neardup=True,
    )


def test_cluster_merge_via_added_doc(spark):
    """An added bridge doc merges two previously separate docs into one
    cluster (and the rep/winner recompute accordingly)."""
    a_rows = [r for r in _chain_rows() if r[0] != 6]
    b_rows = _chain_rows()
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=False, line_min_docs=None, substr_window=None, neardup=True,
    )


def test_null_transitions_full_recipe(spark):
    """text→NULL and NULL→text transitions through the FULL recipe
    (gopher on, line + substr + neardup), plus a changed doc and an
    added near-duplicate."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "the and is of to in that it was for on are with as"
    )
    a_rows = [
        (1, base + " one\nshared nav line here"),
        (2, base + " two\nshared nav line here"),
        (3, None),
        (4, base + " four distinct tail body"),
    ]
    b_rows = [
        (1, base + " one\nshared nav line here"),
        (2, None),                                   # text -> NULL
        (3, base + " three fresh resurrected body"),  # NULL -> text
        (4, base + " four distinct tail body CHANGED"),
        (9, base + " four distinct tail body"),       # near-dup of 4's old
    ]
    _recurate_vs_scratch(
        spark, a_rows, b_rows,
        gopher=True,
        gopher_thresholds={"min_tokens": 5, "max_dup_token_frac": 0.95},
        line_min_docs=2, substr_window=6, neardup=True,
    )


def test_noop_diff_is_identity(spark):
    a_rows = _chain_rows()
    a, b, state_a, changes = _recurate_vs_scratch(
        spark, a_rows, a_rows,
        gopher=False, line_min_docs=2, substr_window=4, neardup=True,
    )
    assert changes.count() == 0


def test_changes_relation_applies_to_published_corpus(spark):
    """changes is the delta between curated(A) and curated(B): applying
    (delete removed, upsert rows) to curated(A)'s digests reproduces
    curated(B)'s digests, and every upsert's text matches its digest."""
    a_rows = _chain_rows() + [(1, "nav line\nbody one"), (2, "nav line\nbody two")]
    b_rows = [r for r in a_rows if r[0] not in (6, 2)] + [
        (9, "brand new standalone nine")
    ]
    a, b = _docs(spark, a_rows), _docs(spark, b_rows)
    kw = dict(gopher=False, line_min_docs=2, substr_window=None, neardup=True)
    state_a = _mk_state(a, **kw)
    digests_a = {r[0]: r[1] for r in corpus.curated_digests(state_a).collect()}
    changes, state_b = recurate.recurate_with_diff(
        b, corpus.corpus_diff(a, b), state_a
    )
    rows = changes.collect()
    for r in rows:
        if r["change"] == "upsert":
            assert r["clean_text"] is not None
    applied = dict(digests_a)
    for r in rows:
        if r["change"] == "removed":
            applied.pop(r["doc_id"], None)
    for r in rows:
        if r["change"] == "upsert":
            applied[r["doc_id"]] = r["clean_md5"]
    want = {
        r[0]: r[1]
        for r in corpus.curated_digests(
            corpus.materialize_curation_state(state_b)
        ).collect()
    }
    assert applied == want


def test_winner_flip_resurrects_loser(spark):
    """Removing a cluster's winner must RESURRECT the losing member: it
    appears as an upsert WITH its rebuilt text even though no stage
    re-processed it."""
    w = ["w%02d" % i for i in range(1, 22)]
    # 10 and 11 are near-dups; craft 11 lower-quality (more symbols)
    a_rows = [
        (10, " ".join(w[0:20])),
        (11, " ".join(w[1:21])),
        (12, "separate doc twelve body"),
    ]
    a = _docs(spark, a_rows)
    kw = dict(gopher=False, line_min_docs=None, substr_window=None, neardup=True)
    state_a = _mk_state(a, **kw)
    surv_a = {r[0] for r in corpus.curated_digests(state_a).collect()}
    # exactly one of {10, 11} survived A
    kept = surv_a & {10, 11}
    assert len(kept) == 1
    winner = kept.pop()
    loser = 10 if winner == 11 else 11
    b_rows = [r for r in a_rows if r[0] != winner]
    b = _docs(spark, b_rows)
    changes, state_b = recurate.recurate_with_diff(
        b, corpus.corpus_diff(a, b), state_a
    )
    ch = {(r["doc_id"], r["change"]) for r in changes.collect()}
    assert (winner, "removed") in ch
    assert (loser, "upsert") in ch
    up = {
        r["doc_id"]: (r["clean_md5"], r["clean_text"])
        for r in changes.where("change = 'upsert'").collect()
    }
    assert up[loser][1] is not None
    _assert_states_equal(
        corpus.materialize_curation_state(state_b), _mk_state(b, **kw)
    )


def test_guards(spark):
    a = _docs(spark, [(1, "one body"), (2, "two body")])
    b = _docs(spark, [(1, "one body"), (3, "three body")])
    plain = corpus.materialize_curation_state(
        corpus.curation_state(
            a, gopher=False, line_min_docs=2, substr_window=None, neardup=False
        )
    )
    with pytest.raises(ValueError, match="retractable"):
        recurate.recurate_with_diff(b, corpus.corpus_diff(a, b), plain)
    state = _mk_state(
        a, gopher=False, line_min_docs=2, substr_window=None, neardup=False
    )
    bad_removed = spark.createDataFrame(
        [(99, "removed", "x", None)],
        "doc_id long, change string, old_md5 string, new_md5 string",
    )
    with pytest.raises(ValueError, match="missing from"):
        recurate.recurate_with_diff(b, bad_removed, state)
    bad_added = spark.createDataFrame(
        [(1, "added", None, "x")],
        "doc_id long, change string, old_md5 string, new_md5 string",
    )
    with pytest.raises(ValueError, match="already exists"):
        recurate.recurate_with_diff(b, bad_added, state)


def test_retractable_state_survives_roundtrip_and_ingest(spark, tmpdir):
    """save/load preserves the detail relations, and the append-only
    ingest path (curate_and_update_state) maintains them — so a state
    that has ingested batches is still exactly retractable."""
    a_rows = [
        (1, "nav line\nbody one first"),
        (2, "nav line\nbody two second"),
    ]
    batch_rows = [(3, "nav line\nbody three third")]
    kw = dict(gopher=False, line_min_docs=2, substr_window=4, neardup=True)
    a = _docs(spark, a_rows)
    state = _mk_state(a, **kw)
    path = str(tmpdir) + "/state"
    corpus.save_curation_state(state, path)
    loaded = corpus.load_curation_state(spark, path)
    for name in ("line_detail", "substr_detail", "nin_digest"):
        assert getattr(loaded, name) is not None
        assert _rows(getattr(loaded, name)) == _rows(getattr(state, name))
    _, rolled = corpus.curate_and_update_state(
        _docs(spark, batch_rows), loaded, assume_disjoint_ids=True
    )
    rolled = corpus.materialize_curation_state(rolled)
    # the rolled-forward details cover the batch's stage inputs too:
    # retract the batch right back out and the state must equal A's
    union_docs = _docs(spark, a_rows + batch_rows)
    diff_back = corpus.corpus_diff(union_docs, a)
    _, back = recurate.recurate_with_diff(a, diff_back, rolled)
    # NOTE: append-only ingest is history-immutable, so rolled-state
    # artifacts can differ from a one-shot state over (A ∪ batch); but
    # retracting the batch must return EXACTLY to the from-scratch A
    # state whenever the batch had no cross-boundary effects on A's
    # rebuilt texts — here the batch shares the nav line, so A's line
    # counts return to their original values either way.
    _assert_states_equal(
        corpus.materialize_curation_state(back), _mk_state(a, **kw)
    )


def test_recurate_delta_persistence_chain(spark, tmpdir):
    """The tombstone-delta persistence: recurate writes only retraction
    id sets + replaced index keys + added rows; loading the chain folds
    back to EXACTLY the from-scratch state of B; an append-only ingest
    delta stacks ON TOP of the recurate version (sequential fold), and
    compaction collapses the whole mixed chain to a full save."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "the and is of to in that it was for on are with as"
    )
    a_rows = [
        (1, base + " one\nshared nav line here"),
        (2, base + " two\nshared nav line here"),
        (3, None),
        (4, base + " four distinct tail body"),
    ]
    b_rows = [
        (1, base + " one\nshared nav line here"),
        (2, None),
        (3, base + " three fresh resurrected body"),
        (4, base + " four distinct tail body CHANGED"),
        (9, base + " four distinct tail body"),
    ]
    batch_rows = [(20, base + " twenty later crawl batch doc")]
    kw = dict(
        gopher=True,
        gopher_thresholds={"min_tokens": 5, "max_dup_token_frac": 0.95},
        line_min_docs=2, substr_window=6, neardup=True,
    )
    a, b = _docs(spark, a_rows), _docs(spark, b_rows)
    state_dir = str(tmpdir) + "/state"
    corpus.save_curation_state(
        corpus.curation_state(a, retractable=True, **kw), f"{state_dir}/v0"
    )
    state_a = corpus.load_curation_state(spark, f"{state_dir}/v0")
    changes, state_b, delta = recurate.recurate_with_diff(
        b, corpus.corpus_diff(a, b), state_a, with_delta=True
    )
    corpus.save_recurate_delta(delta, state_a, f"{state_dir}/v1", parent=0)
    loaded = corpus.load_curation_state(spark, f"{state_dir}/v1")
    want_b = _mk_state(b, **kw)
    _assert_states_equal(corpus.materialize_curation_state(loaded), want_b)

    # ingest delta ON TOP of the recurate version (mixed chain)
    batch = _docs(spark, batch_rows)
    loaded2 = corpus.load_curation_state(spark, f"{state_dir}/v1")
    _cur, _fun, ing = corpus.curate_and_state_delta(
        batch, corpus.materialize_curation_state(loaded2),
        assume_disjoint_ids=True,
    )
    corpus.save_curation_delta(ing, loaded2, f"{state_dir}/v2", parent=1)
    chained = corpus.materialize_curation_state(
        corpus.load_curation_state(spark, f"{state_dir}/v2")
    )
    _cur2, want_rolled = corpus.curate_and_update_state(
        _docs(spark, batch_rows), corpus.materialize_curation_state(want_b),
        assume_disjoint_ids=True,
    )
    want_rolled = corpus.materialize_curation_state(want_rolled)
    for name in _STATE_REL_NAMES:
        ga, wa = getattr(chained, name), getattr(want_rolled, name)
        assert (ga is None) == (wa is None), name
        if ga is not None:
            assert _rows(ga) == _rows(wa), f"{name}: rows differ"

    # compaction collapses the mixed chain to a full save
    v = corpus.compact_curation_state(spark, state_dir)
    assert v == 2
    compacted = corpus.materialize_curation_state(
        corpus.load_curation_state(spark, f"{state_dir}/v2")
    )
    for name in _STATE_REL_NAMES:
        ga, wa = getattr(compacted, name), getattr(want_rolled, name)
        if ga is not None:
            assert _rows(ga) == _rows(wa), f"{name}: post-compaction differ"


def test_recurate_delta_is_churn_sized(spark, tmpdir):
    """The delta's row volumes are churn-proportional: per-doc add rows
    cover only re-processed docs, and the index rows cover only affected
    keys — NOT the corpus."""
    rows = [(i, f"doc body {i} unique tail t{i} u{i} v{i} w{i}") for i in range(40)]
    a = _docs(spark, rows)
    b_rows = [r for r in rows if r[0] != 7] + [(99, "brand new doc body here x y z")]
    b = _docs(spark, b_rows)
    kw = dict(gopher=False, line_min_docs=2, substr_window=4, neardup=True)
    state_a = _mk_state(a, **kw)
    _ch, _sb, delta = recurate.recurate_with_diff(
        b, corpus.corpus_diff(a, b), state_a, with_delta=True
    )
    full_detail = state_a.substr_detail.count()
    assert delta["substr_detail"].count() < full_detail / 4
    assert delta["retract_nin"].count() <= 4  # removed + tiny fanout
    assert delta["ids"].count() == 1

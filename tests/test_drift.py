"""PSI drift monitoring tests."""

import math

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import drift


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_psi_zero_on_identical_snapshots(spark, docs):
    rep = drift.signal_drift(docs, docs)
    assert set(rep) == {
        "f_ln_chars", "f_ln_tokens", "f_avg_token_len",
        "f_subwords_per_token", "f_length_score", "f_stopword_score",
        "f_symbol_score",
    }
    assert all(r["psi"] < 1e-9 for r in rep.values())


def test_psi_flags_a_shifted_batch(spark, docs):
    # a batch of only long documents is a real distribution shift on the
    # size features and must clear the 0.25 "investigate" bar
    med = docs.select(F.expr("percentile(length(text), 0.7)")).collect()[0][0]
    long_batch = docs.where(F.length("text") >= med)
    rep = drift.signal_drift(docs, long_batch)
    assert rep["f_ln_chars"]["psi"] > 0.25
    # while a uniform random half is NOT a shift
    half = docs.where(F.col("doc_id") % 2 == 0)
    rep2 = drift.signal_drift(docs, half)
    assert all(r["psi"] < 0.1 for r in rep2.values())


def test_frozen_cutpoints_reproduce_and_freeze_the_series(spark, docs):
    batch = docs.where(F.col("doc_id") % 4 == 0)
    first = drift.signal_drift(docs, batch)
    cuts = {c: r["cutpoints"] for c, r in first.items()}
    again = drift.signal_drift(docs, batch, cutpoints=cuts)
    assert {c: r["psi"] for c, r in first.items()} == {
        c: r["psi"] for c, r in again.items()
    }


def test_psi_matches_driver_numpy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = li.select("l_extendedprice")
    batch = li.where(F.col("l_quantity") > 25).select("l_extendedprice")
    rep = drift.psi_report(ref, batch, ["l_extendedprice"], n_buckets=8)
    r = rep["l_extendedprice"]
    cuts = r["cutpoints"]
    import numpy as np

    def fracs(vals):
        # the operator's bucket rule: count of cutpoints <= value
        c = np.asarray(cuts)
        b = (np.asarray(vals)[:, None] >= c[None, :]).sum(axis=1)
        n = np.bincount(b, minlength=len(cuts) + 1).astype(float) + 0.5
        return n / n.sum()

    p = fracs([row[0] for row in ref.collect()])
    q = fracs([row[0] for row in batch.collect()])
    psi = float(((p - q) * np.log(p / q)).sum())
    assert abs(r["psi"] - psi) < 1e-6


def test_categorical_psi_source_shift(spark, docs):
    # identical snapshots: ~0; a batch missing one source entirely: large
    rep0 = drift.categorical_psi(docs, docs, "source")
    assert rep0["psi"] < 1e-9
    sources = [r[0] for r in docs.select("source").distinct().collect()]
    dropped = docs.where(F.col("source") != sources[0])
    rep1 = drift.categorical_psi(docs, dropped, "source")
    assert rep1["psi"] > 0.1
    assert sources[0] in rep1["categories"]  # the vanished category is visible


def test_embedding_drift_via_pq_codes(spark, sf_dir):
    from spark_iforest_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # 16 cells/subspace: monitoring wants coarse stable histograms — at 64+
    # cells a few-thousand-row batch's sampling noise alone clears 0.1
    cb = similarity._pq_codebooks(
        emb, "vec_id", "embedding", 8, 16, similarity._PQ_SEED, 4096, 25
    )
    same = drift.embedding_drift(emb, emb.where(F.col("vec_id") % 2 == 0), cb)
    assert len(same["subspace_psi"]) == 8
    assert same["max_psi"] < 0.1  # a uniform half is not drift
    # PSI is DISTRIBUTIONAL: negating every vector of a symmetric corpus
    # leaves the histograms invariant (measured max_psi 0.08 — correctly
    # not flagged). A genuine distribution shift — collapsing vectors into
    # the positive orthant — must flag hard.
    shifted_batch = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: F.abs(x)).alias("embedding"),
    )
    shifted = drift.embedding_drift(emb, shifted_batch, cb)
    assert shifted["max_psi"] > 0.25


def test_psi_against_baseline_matches_full_report(spark, docs):
    batch = docs.where(F.col("doc_id") % 3 == 0)
    full = drift.signal_drift(docs, batch)
    baseline = drift.signal_drift(docs, docs)  # ref-vs-ref carries ref_frac
    from spark_iforest_spark.operators.quality_model import _raw_features

    feats = _raw_features("text")
    projected = batch.select(*[e.alias(n) for n, e in feats.items()])
    fast = drift.psi_against_baseline(projected, baseline)
    # the baseline's stored ref_frac values are rounded to 6 places, so
    # the fast path agrees to ~1e-5, not bit-exactly
    for c in full:
        assert abs(fast[c]["psi"] - full[c]["psi"]) < 2e-5, c


def test_drift_monitor_stream_series(spark, docs, tmpdir):
    # stream the corpus in micro-batches; every batch is an unbiased slice
    # so the whole psi series must stay under the 0.1 'stable' bar
    baseline = drift.signal_drift(docs, docs)
    src = str(tmpdir) + "/src"
    docs.select("doc_id", "text").repartition(3).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = drift.drift_monitor_stream(stream, baseline, str(tmpdir) + "/psi")
    q.awaitTermination()
    series = spark.read.parquet(str(tmpdir) + "/psi").collect()
    assert len({r["batch_id"] for r in series}) == 3
    assert len(series) == 3 * len(baseline)
    assert all(r["psi"] < 0.1 for r in series)


def test_psi_by_group_matches_single_group_report(spark):
    """One group -> psi_by_group must reproduce psi_report's PSI exactly
    (same smoothing and rounding); a shifted group must flag high while a
    stable group stays near zero."""
    import numpy as np

    rng = np.random.default_rng(5)
    ref_rows = [("a", float(v)) for v in rng.normal(100, 10, 400)]
    ref_rows += [("b", float(v)) for v in rng.normal(100, 10, 400)]
    bat_rows = [("a", float(v)) for v in rng.normal(100, 10, 300)]   # stable
    bat_rows += [("b", float(v)) for v in rng.normal(160, 10, 300)]  # shifted
    ref = spark.createDataFrame(ref_rows, "g string, v double")
    bat = spark.createDataFrame(bat_rows, "g string, v double")
    cuts = [80.0, 90.0, 100.0, 110.0, 120.0]
    out = {r["g"]: r for r in drift.psi_by_group(ref, bat, "g", "v", cuts).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_ref"] == 400 and out["a"]["n_batch"] == 300
    assert out["a"]["psi"] < 0.1 < 0.25 < out["b"]["psi"]
    # single-group equality against the driver-dict report
    for g in ("a", "b"):
        rep = drift.psi_report(
            ref.where(F.col("g") == g), bat.where(F.col("g") == g),
            ["v"], cutpoints={"v": cuts},
        )["v"]["psi"]
        assert out[g]["psi"] == rep


def test_psi_by_group_multi_matches_single_column_form(spark):
    """Multi-signal per-group PSI: each (group, column) row must equal the
    single-column psi_by_group on the same data, and per-column non-null
    counts are independent."""
    import numpy as np

    rng = np.random.default_rng(9)
    mk = lambda mu_a, mu_b, n: (
        [("a", float(v), float(v) * 2) for v in rng.normal(mu_a, 5, n)]
        + [("b", float(v), None) for v in rng.normal(mu_b, 5, n)]
    )
    ref = spark.createDataFrame(mk(100, 100, 300), "g string, x double, y double")
    bat = spark.createDataFrame(mk(100, 140, 200), "g string, x double, y double")
    cuts = {"x": [90.0, 100.0, 110.0], "y": [180.0, 200.0, 220.0]}
    out = {
        (r["g"], r["column"]): r
        for r in drift.psi_by_group_multi(ref, bat, "g", cuts).collect()
    }
    assert set(out) == {("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")}
    for c in ("x", "y"):
        single = {
            r["g"]: r
            for r in drift.psi_by_group(ref, bat, "g", c, cuts[c]).collect()
        }
        for g in single:
            assert out[(g, c)]["psi"] == single[g]["psi"], (g, c)
            assert out[(g, c)]["n_ref"] == single[g]["n_ref"]
    # group b has NO y values: n is 0 and PSI is defined (uniform smoothed)
    assert out[("b", "y")]["n_ref"] == 0 and out[("b", "y")]["psi"] is not None
    # shifted group flags on x, stable group does not
    assert out[("b", "x")]["psi"] > 0.25 > 0.1 > out[("a", "x")]["psi"]

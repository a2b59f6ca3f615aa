"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine.

Candidate generation differs per operator (that's the point — each trades
recall for join volume differently), but every near-dup operator VERIFIES
candidates with the exact same set-Jaccard expression before emitting, so
all three text near-dup variants return the same (doc_a, doc_b, jaccard)
relation when recall is 1 — which is what lets one DuckDB oracle check all
of them.

Scale notes (100 TB corpus):
* exact: one hash-shuffle on a 32-byte digest, map-side combine free.
* ngram-jaccard: inverted-index self-join; volume is sum of df(shingle)^2.
  ``max_shingle_df`` caps hot shingles (boilerplate) — the classic skew fix.
* minhash-lsh: join volume drops to bucket collisions only; signature
  computation is one Arrow batch pass (numpy matrix ops per batch).
* simhash: cheapest candidates (4 × 16-bit band equality) for
  high-similarity dedup.
* embedding-cosine: exact O(n²) pairs — correct reference implementation;
  the scale path is the LSH-bucketed variant in similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from spark_iforest_spark.functions import cosine, tokens, word_shingles

# MinHash universal-hash parameters: h_i(x) = (a_i*x + b_i) mod PRIME.
# Fixed seed => signatures deterministic across runs/partitions. The prime is
# 2^31-1 so a*x (< 2^62) never overflows uint64 — the whole signature matrix
# computes as one vectorized numpy op per document.
_MINHASH_PRIME = (1 << 31) - 1
_MINHASH_PERMS = 128
_MINHASH_SEED = 0x5EED_1F0E


def _minhash_coeffs(num_perms: int = _MINHASH_PERMS) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(1, _MINHASH_PRIME, size=num_perms, dtype=np.int64)
    b = rng.integers(0, _MINHASH_PRIME, size=num_perms, dtype=np.int64)
    return a, b


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content digest: one representative (min id) per digest.

    Grouping by the md5 digest, not the raw text, keeps shuffle rows small
    (32 bytes vs document bodies) — the digest is computed scan-side.
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_table(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) inverted index over distinct word n-grams."""
    return docs.select(
        F.col(id_col).alias("did"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index self-join.

    Returns (doc_a, doc_b, jaccard) for doc_a < doc_b and jaccard >= threshold.
    ``max_shingle_df`` (off by default, to preserve exact semantics) drops
    shingles appearing in more than that many docs before the join — the
    standard skew guard for boilerplate shingles at corpus scale.
    """
    sh = _shingle_table(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").count().where(F.col("count") > max_shingle_df).select("sh")
        sh = sh.join(hot, "sh", "left_anti")
    sizes = sh.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.did") < F.col("b.did")))
        .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")), 6
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.did"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.did"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _verify_candidates(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs.

    Joins the candidate pairs (small) back to per-doc shingle sets and
    evaluates set Jaccard with array intersect/union — identical math to
    ngram_jaccard_pairs, so verified output is oracle-comparable.
    """
    shs = docs.select(
        F.col(id_col).alias("did"),
        word_shingles(tokens(F.col(text_col)), n).alias("shset"),
    )
    inter = F.size(F.array_intersect(F.col("sa.shset"), F.col("sb.shset")))
    union = F.size(F.col("sa.shset")) + F.size(F.col("sb.shset")) - inter
    jac = F.round(inter / union, 6)
    return (
        candidates.join(shs.alias("sa"), F.col("doc_a") == F.col("sa.did"))
        .join(shs.alias("sb"), F.col("doc_b") == F.col("sb.did"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_perms: int = _MINHASH_PERMS,
    bands: int = 32,
) -> DataFrame:
    """MinHash + banded-LSH near-dup pairs, exact-verified.

    shingle → 128 minhashes (one Arrow pass, numpy) → 32 bands × 4 rows →
    bucket-join → distinct candidates → exact-Jaccard verify ≥ threshold.
    With b=32,r=4 the miss probability at j=0.8 is (1-0.8^4)^32 ≈ 5e-8, so
    the verified output equals the exact operator's in practice.
    """
    rows = num_perms // bands
    a_co, b_co = _minhash_coeffs(num_perms)

    def signatures(it):
        import hashlib

        au = a_co.astype(np.uint64)[:, None]
        bu = b_co.astype(np.uint64)[:, None]
        for pdf in it:
            out_ids, out_band, out_bh = [], [], []
            for did, shset in zip(pdf["did"], pdf["shset"]):
                base = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                            "little",
                        )
                        % _MINHASH_PRIME
                        for s in shset
                    ),
                    dtype=np.uint64,
                    count=len(shset),
                )
                # (perms, shingles) matrix of universal hashes; min per row
                sig = ((au * base[None, :] + bu) % _MINHASH_PRIME).min(axis=1)
                for band in range(bands):
                    seg = np.ascontiguousarray(sig[band * rows : (band + 1) * rows])
                    h = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
                    out_ids.append(did)
                    out_band.append(band)
                    out_bh.append(h)
            yield pd.DataFrame({"did": out_ids, "band": out_band, "bucket": out_bh})

    shs = docs.select(
        F.col(id_col).alias("did"),
        word_shingles(tokens(F.col(text_col)), n).alias("shset"),
    )
    buckets = shs.mapInPandas(signatures, schema="did long, band int, bucket string")
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .select(F.col("l.did").alias("doc_a"), F.col("r.did").alias("doc_b"))
        .distinct()
    )
    return _verify_candidates(candidates, docs, id_col, text_col, n, threshold)


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    band_bits: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs, exact-verified.

    64-bit simhash over shingle hashes; candidates share any of the
    64/band_bits bit-bands (pigeonhole: guaranteed recall for hamming
    distance < 64/band_bits); exact-Jaccard verification prunes.
    """
    num_bands = 64 // band_bits

    def simhash(it):
        import hashlib

        for pdf in it:
            out_ids, out_band, out_bh = [], [], []
            shifts = np.arange(64, dtype=np.uint64)
            for did, shset in zip(pdf["did"], pdf["shset"]):
                acc = np.zeros(64, dtype=np.int64)
                for s in shset:
                    h = np.uint64(
                        int.from_bytes(
                            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                            "little",
                        )
                    )
                    bits = (h >> shifts) & np.uint64(1)
                    acc += np.where(bits == 1, 1, -1)
                sh64 = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
                for band in range(num_bands):
                    seg = (sh64 >> (band * band_bits)) & ((1 << band_bits) - 1)
                    out_ids.append(did)
                    out_band.append(band)
                    out_bh.append(int(seg))
            yield pd.DataFrame({"did": out_ids, "band": out_band, "bucket": out_bh})

    shs = docs.select(
        F.col(id_col).alias("did"),
        word_shingles(tokens(F.col(text_col)), n).alias("shset"),
    )
    buckets = shs.mapInPandas(simhash, schema="did long, band int, bucket long")
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .select(F.col("l.did").alias("doc_a"), F.col("r.did").alias("doc_b"))
        .distinct()
    )
    return _verify_candidates(candidates, docs, id_col, text_col, n, threshold)


def embedding_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold, id_a < id_b.

    Exact O(n²) comparison (BroadcastNestedLoopJoin — Spark broadcasts the
    smaller side). Correctness baseline; at corpus scale use
    similarity.lsh_topk's bucketing to bound the join.
    """
    e = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )

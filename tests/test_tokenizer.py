"""Learned BPE tokenizer: deterministic bounded fit, Arrow-batched apply."""

import pytest
from pyspark.sql import functions as F

from spark_iforest_spark.operators import tokenizer


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_bpe_train_layout_invariant(docs):
    a = tokenizer.bpe_train(docs.repartition(3), n_merges=100)
    b = tokenizer.bpe_train(docs.repartition(17), n_merges=100)
    assert a == b  # (count desc, pair lex) tie-break + ordered word table
    assert len(a["merges"]) == 100


def test_bpe_learns_frequent_structure(spark):
    df = spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower newest newest"), (2, "widest")],
        ["doc_id", "text"],
    )
    model = tokenizer.bpe_train(df, n_merges=10)
    merges = [tuple(m) for m in model["merges"]]
    # 'lo' is part of the most frequent word family; 'w'+EOW closes "low"
    assert ("l", "o") in merges[:3]
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenizer.bpe_token_counts(df, model).collect()
    }
    # "low" x5 should compress to one token per word after its merges land
    assert counts[0] == 5


def test_bpe_counts_match_driver_reference(docs):
    """The memoized mapInPandas path must equal a driver-side re-encode of
    the same texts with the same merge table."""
    sample = docs.limit(50)
    model = tokenizer.bpe_train(docs, n_merges=200)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenizer.bpe_token_counts(sample, model).collect()
    }
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    for r in sample.collect():
        n = sum(
            len(tokenizer._encode_word(w, ranks))
            for w in tokenizer._WS.split(r["text"].lower())
            if w
        )
        assert got[r["doc_id"]] == n


def test_more_merges_never_increase_token_count(docs):
    sample = docs.limit(100)
    small = tokenizer.bpe_train(docs, n_merges=50)
    big = tokenizer.bpe_train(docs, n_merges=400)
    # BPE merge tables are prefix-stable: more rounds extend, never reorder
    assert big["merges"][: len(small["merges"])] == small["merges"]
    a = {r["doc_id"]: r["n_bpe_tokens"] for r in tokenizer.bpe_token_counts(sample, small).collect()}
    b = {r["doc_id"]: r["n_bpe_tokens"] for r in tokenizer.bpe_token_counts(sample, big).collect()}
    assert all(b[k] <= a[k] for k in a)
    ws = {
        r["doc_id"]: r[1]
        for r in sample.select("doc_id", F.size(F.split(F.col("text"), r"\s+"))).collect()
    }
    assert all(b[k] >= ws[k] for k in b)  # at least one token per word


def test_bpe_model_json_roundtrip(docs, tmp_path):
    import json

    model = tokenizer.bpe_train(docs, n_merges=64)
    p = tmp_path / "bpe.json"
    p.write_text(json.dumps(model))
    loaded = json.loads(p.read_text())
    sample = docs.limit(20)
    a = sorted(map(tuple, tokenizer.bpe_token_counts(sample, model).collect()))
    b = sorted(map(tuple, tokenizer.bpe_token_counts(sample, loaded).collect()))
    assert a == b


def test_bpe_null_text_counts_zero(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, None)], "doc_id long, text string"
    )
    model = tokenizer.bpe_train(df, n_merges=10)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenizer.bpe_token_counts(df, model).collect()
    }
    assert counts[1] == 0 and counts[0] > 0


def test_bpe_vocab_ids_dense_and_deterministic(docs):
    model = tokenizer.bpe_train(docs, n_merges=100)
    vocab = tokenizer.bpe_vocab(model)
    toks = [t for t, _ in vocab]
    ids = [i for _, i in vocab]
    assert ids == list(range(len(vocab)))  # dense, 0-based
    assert toks[0] == "<unk>" and toks[1] == "</w>"
    assert len(set(toks)) == len(toks)
    assert vocab == tokenizer.bpe_vocab(model)  # pure function of model


def test_bpe_encode_decode_roundtrip(docs):
    """decode(encode(x)) == lower(x) with whitespace collapsed, for EVERY
    text (round 7: the byte fallback removed the alphabet restriction)."""
    model = tokenizer.bpe_train(docs, n_merges=200)
    sample = docs.limit(40)
    enc = tokenizer.bpe_encode(sample, model)
    dec = {r["doc_id"]: r["text"] for r in tokenizer.bpe_decode(enc, model).collect()}
    for r in sample.collect():
        want = " ".join(w for w in tokenizer._WS.split(r["text"].lower()) if w)
        assert dec[r["doc_id"]] == want


def test_bpe_encode_matches_token_counts(docs):
    """len(token_ids) must equal n_bpe_tokens — the two apply paths share
    one tokenization."""
    model = tokenizer.bpe_train(docs, n_merges=150)
    sample = docs.limit(60)
    n_ids = {
        r["doc_id"]: len(r["token_ids"])
        for r in tokenizer.bpe_encode(sample, model).collect()
    }
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenizer.bpe_token_counts(sample, model).collect()
    }
    assert n_ids == counts


def test_bpe_encode_unknown_chars_byte_fallback_roundtrip(spark):
    """Characters outside the training alphabet encode as UTF-8 byte
    tokens (never <unk>) and decode back exactly — including multi-byte
    codepoints (round-7 byte fallback, GPT-2 style)."""
    train = spark.createDataFrame([(0, "abc abc abd")], "doc_id long, text string")
    model = tokenizer.bpe_train(train, n_merges=5)
    novel = spark.createDataFrame(
        [(1, "aéz abc"), (2, "汉字 🚀 abd")], "doc_id long, text string"
    )
    enc = {r["doc_id"]: r["token_ids"] for r in tokenizer.bpe_encode(novel, model).collect()}
    assert all(0 not in ids for ids in enc.values())  # <unk> never emitted
    # é is outside the alphabet -> its 2 UTF-8 bytes appear as byte ids
    byte_ids = {i for i, t in enumerate(t for t, _ in tokenizer.bpe_vocab(model)) if t.startswith("<0x")}
    assert any(i in byte_ids for i in enc[1])
    dec = {
        r["doc_id"]: r["text"]
        for r in tokenizer.bpe_decode(tokenizer.bpe_encode(novel, model), model).collect()
    }
    assert dec[1] == "aéz abc"
    assert dec[2] == "汉字 🚀 abd"


def test_pack_token_ids_lengths_and_conservation(docs):
    """Every packed row but a bin's last is exactly seq_len; the multiset
    of emitted ids equals the concatenation of per-doc encodings (+1 eos
    per doc when eos_id is set)."""
    model = tokenizer.bpe_train(docs, n_merges=150)
    sample = docs.limit(80)
    packed = tokenizer.pack_token_ids(sample, model, seq_len=128, eos_id=0).collect()
    # length contract
    by_bin = {}
    for r in packed:
        by_bin.setdefault(r["bin_id"], []).append((r["seq_idx"], r["n_tokens"]))
    for bin_id, rows in by_bin.items():
        rows.sort()
        assert [s for s, _ in rows] == list(range(len(rows)))  # dense seq idx
        for _, n in rows[:-1]:
            assert n == 128
        assert 1 <= rows[-1][1] <= 128
    # conservation
    enc = tokenizer.bpe_encode(sample, model).collect()
    want = sorted(
        [i for r in enc for i in list(r["token_ids"]) + [0]]
    )
    got = sorted(i for r in packed for i in r["token_ids"])
    assert got == want


def test_pack_token_ids_layout_invariant(docs):
    model = tokenizer.bpe_train(docs, n_merges=100)
    sample = docs.limit(60)
    a = sorted(
        (r["bin_id"], r["seq_idx"], tuple(r["token_ids"]))
        for r in tokenizer.pack_token_ids(sample.repartition(3), model, seq_len=64).collect()
    )
    b = sorted(
        (r["bin_id"], r["seq_idx"], tuple(r["token_ids"]))
        for r in tokenizer.pack_token_ids(sample.repartition(17), model, seq_len=64).collect()
    )
    assert a == b and a


def test_pack_token_ids_doc_ids_aligned(docs):
    """with_doc_ids: a parallel doc-id array sliced by the same machinery
    — per row len(doc_ids) == len(token_ids), each doc's id appears
    exactly len(encoding) times corpus-wide, and runs are contiguous
    (doc boundaries are well-defined for attention masking)."""
    model = tokenizer.bpe_train(docs, n_merges=100)
    packed = tokenizer.pack_token_ids(
        docs, model, seq_len=64, n_buckets=4, with_doc_ids=True
    ).collect()
    assert packed
    from collections import Counter
    per_doc = Counter()
    for r in packed:
        assert len(r["doc_ids"]) == len(r["token_ids"]) == r["n_tokens"]
        # contiguity within a row: a doc id never reappears after a gap
        seen, prev = set(), None
        for d in r["doc_ids"]:
            if d != prev:
                assert d not in seen
                seen.add(d)
                prev = d
        per_doc.update(r["doc_ids"])
    enc = {
        r["doc_id"]: len(r["token_ids"])
        for r in tokenizer.bpe_encode(docs, model).collect()
    }
    assert per_doc == Counter({d: n for d, n in enc.items() if n > 0})
    # default path unchanged: same rows with the column dropped
    plain = tokenizer.pack_token_ids(docs, model, seq_len=64, n_buckets=4).collect()
    a = sorted((r["bin_id"], r["seq_idx"], tuple(r["token_ids"])) for r in plain)
    b = sorted((r["bin_id"], r["seq_idx"], tuple(r["token_ids"])) for r in packed)
    assert a == b


def test_legacy_v1_model_keeps_old_id_space(spark):
    """A model dict persisted BEFORE round 7 (no vocab_version) must keep
    its original id layout — no byte tokens, unknowns -> <unk> — so old
    persisted token_id streams decode unchanged (round-7 review fix)."""
    train = spark.createDataFrame([(0, "abc abc abd")], "doc_id long, text string")
    v2 = tokenizer.bpe_train(train, n_merges=5)
    assert v2["vocab_version"] == 2
    legacy = {"merges": v2["merges"], "alphabet": v2["alphabet"]}
    lv = tokenizer.bpe_vocab(legacy)
    assert lv[2][0] == legacy["alphabet"][0]  # alphabet starts at id 2, not 258
    assert all(not t.startswith("<0x") for t, _ in lv)
    novel = spark.createDataFrame([(1, "aé abc")], "doc_id long, text string")
    enc = tokenizer.bpe_encode(novel, legacy).collect()[0]["token_ids"]
    assert 0 in enc  # unknown char -> <unk> under the legacy layout
    dec = tokenizer.bpe_decode(
        spark.createDataFrame([(1, enc)], "doc_id long, token_ids array<int>"), legacy
    ).collect()[0]["text"]
    assert "<unk>" in dec and "abc" in dec


def test_legacy_model_merge_spelling_byte_token_decodes_as_text(spark):
    """A v1 model whose merges spell a literal byte-token string must keep
    decoding that token as TEXT (round-7 review fix: byte handling is
    gated on vocab_version, not token-string presence)."""
    legacy = {
        "merges": [["<", "0"], ["<0", "x"], ["<0x", "4"], ["<0x4", "1"], ["<0x41", ">"]],
        "alphabet": ["<", ">", "0", "1", "4", "x"],
    }
    vocab = dict(tokenizer.bpe_vocab(legacy))
    tid = vocab["<0x41>"]
    dec = tokenizer.bpe_decode(
        spark.createDataFrame([(1, [tid, vocab["</w>"]])], "doc_id long, token_ids array<int>"),
        legacy,
    ).collect()[0]["text"]
    assert dec == "<0x41>"  # NOT 'A'


def test_decode_preserves_literal_eow_spelling(spark):
    """round-7 review fix: text that SPELLS '</w>' across separate
    character tokens must survive decode (only the marker token itself —
    or merges built with it — maps to a space)."""
    train = spark.createDataFrame(
        [(0, "< / w > x </w>")], "doc_id long, text string"
    )
    model = {"merges": [], "alphabet": ["<", "/", "w", ">", "x"], "vocab_version": 2}
    doc = spark.createDataFrame([(1, "</w> x")], "doc_id long, text string")
    dec = tokenizer.bpe_decode(tokenizer.bpe_encode(doc, model), model).collect()[0]["text"]
    assert dec == "</w> x"


# ----------------------------------------------- unigram-LM tokenizer (r8)
def test_unigram_train_layout_invariant(docs):
    a = tokenizer.unigram_train(docs.repartition(3), vocab_size=300)
    b = tokenizer.unigram_train(docs.repartition(17), vocab_size=300)
    assert a == b and len(a["pieces"]) > 10


def test_unigram_learns_frequent_words_as_pieces(spark):
    df = spark.createDataFrame(
        [(0, "low low low low low lower lowest"), (1, "low lower newest")],
        ["doc_id", "text"],
    )
    m = tokenizer.unigram_train(df, vocab_size=50)
    pieces = {p for p, _s in m["pieces"]}
    assert tokenizer._WB + "low" in pieces  # the dominant word survives whole


def test_unigram_roundtrip_corpus_exact(docs):
    m = tokenizer.unigram_train(docs, vocab_size=400)
    dec = {
        r["doc_id"]: r["text"]
        for r in tokenizer.unigram_decode(
            tokenizer.unigram_encode(docs, m), m
        ).collect()
    }
    n = 0
    for r in docs.collect():
        want = " ".join(
            w for w in tokenizer._WS.split((r["text"] or "").lower()) if w
        )
        assert dec[r["doc_id"]] == want
        n += 1
    assert n > 0


def test_unigram_byte_fallback_and_literal_marker_roundtrip(spark):
    """OOV characters (emoji, accents) and a LITERAL U+2581 in the input
    must both survive: unseen chars ride byte tokens, and a literal ▁
    is byte-encoded even though ▁ is a scored piece (decode maps piece-▁
    to a space)."""
    fit = spark.createDataFrame(
        [(0, "plain words only here")], ["doc_id", "text"]
    )
    m = tokenizer.unigram_train(fit, vocab_size=50)
    txt = "café ▁weird zz\U0001F600 plain"
    df = spark.createDataFrame([(0, txt)], ["doc_id", "text"])
    out = tokenizer.unigram_decode(
        tokenizer.unigram_encode(df, m), m
    ).collect()[0]["text"]
    want = " ".join(w for w in tokenizer._WS.split(txt.lower()) if w)
    assert out == want
    # and no <unk> was emitted
    ids = dict(tokenizer.unigram_vocab(m))
    enc = tokenizer.unigram_encode(df, m).collect()[0]["token_ids"]
    assert ids["<unk>"] not in enc


def test_unigram_vocab_layout_and_model_json_roundtrip(spark):
    import json

    df = spark.createDataFrame([(0, "aa ab aa ba")], ["doc_id", "text"])
    m = tokenizer.unigram_train(df, vocab_size=30)
    vocab = tokenizer.unigram_vocab(m)
    assert vocab[0] == ("<unk>", 0)
    assert vocab[1] == ("<0x00>", 1) and vocab[256] == ("<0xFF>", 256)
    toks = [t for t, _ in vocab]
    assert len(toks) == len(set(toks))  # collision rule: first id wins
    m2 = json.loads(json.dumps(m))
    a = tokenizer.unigram_encode(df, m).collect()[0]["token_ids"]
    b = tokenizer.unigram_encode(df, m2).collect()[0]["token_ids"]
    assert a == b


def test_unigram_viterbi_tiebreaks_deterministic():
    # equal total scores: 'ab'+'c' vs 'a'+'bc' — fewer-pieces can't break
    # the tie (both 2 pieces); the LONGER-final-piece rule picks 'a'+'bc'
    scores = {"a": -10, "b": -10, "c": -10, "ab": -20, "bc": -20}
    assert tokenizer._viterbi_pieces("abc", scores, 8) == ["a", "bc"]
    # clear winner: one piece beats any split
    scores2 = {"a": -10, "b": -10, "ab": -15}
    assert tokenizer._viterbi_pieces("ab", scores2, 8) == ["ab"]
    # uncoverable word: None (caller handles byte fallback)
    assert tokenizer._viterbi_pieces("ax", {"a": -1}, 8) is None


def test_unigram_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    m = tokenizer.unigram_train(df.where("doc_id = 0"), vocab_size=30)
    out = {
        r["doc_id"]: (r["token_ids"], )
        for r in tokenizer.unigram_encode(df, m).collect()
    }
    assert out[1][0] == [] and out[2][0] == [] and out[3][0] == []
    dec = {
        r["doc_id"]: r["text"]
        for r in tokenizer.unigram_decode(
            tokenizer.unigram_encode(df, m), m
        ).collect()
    }
    assert dec[0] == "hello world" and dec[1] == "" and dec[2] == ""


def test_unigram_token_counts_match_encode(docs):
    m = tokenizer.unigram_train(docs, vocab_size=300)
    counts = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in tokenizer.unigram_token_counts(docs, m).collect()
    }
    enc = {
        r["doc_id"]: len(r["token_ids"])
        for r in tokenizer.unigram_encode(docs, m).collect()
    }
    assert counts == enc and len(counts) > 0


def test_pack_token_ids_unigram_model_dispatch(docs):
    """pack_token_ids must accept a unigram model: same fixed-length and
    id-multiset-conservation contracts as the BPE path."""
    m = tokenizer.unigram_train(docs, vocab_size=300)
    packed = tokenizer.pack_token_ids(docs, m, seq_len=128, n_buckets=8)
    rows = packed.collect()
    assert rows and all(1 <= r["n_tokens"] <= 128 for r in rows)
    from collections import Counter

    pack_ids = Counter()
    for r in rows:
        pack_ids.update(r["token_ids"])
    enc_ids = Counter()
    for r in tokenizer.unigram_encode(docs, m).collect():
        enc_ids.update(r["token_ids"])
    assert pack_ids == enc_ids


# ----------------------------------------------- WordPiece tokenizer (r8)
def test_wordpiece_train_layout_invariant(docs):
    a = tokenizer.wordpiece_train(docs.repartition(3), n_merges=150)
    b = tokenizer.wordpiece_train(docs.repartition(17), n_merges=150)
    assert a == b and len(a["pieces"]) > 10


def test_wordpiece_fit_matches_straightline_reference(docs):
    """The incremental fit (touched-words-only pair/symbol updates) must
    equal a recount-from-scratch reference on the same word counts."""
    import __spark_entry__ as entry

    wc = {"low": 9, "lower": 4, "lowest": 3, "newer": 5, "wider": 2, "a#b": 7}
    assert tokenizer._wordpiece_fit(wc, 30) == entry._wordpiece_fit_reference(
        wc, 30
    )


def test_wordpiece_prefers_high_likelihood_pairs(spark):
    """WordPiece merges by cnt(ab)/(cnt(a)cnt(b)), not raw frequency: a
    pair whose parts appear ONLY together merges before a more frequent
    pair with promiscuous parts."""
    # 'qz' appears 3x and q,z never appear apart -> score 3/(3*3)=1/3;
    # 'aa' appears 8x but 'a' has count 20 -> 8/400 = 1/50.
    wc = {"qz": 3, "aaa": 4, "ab": 4}
    pieces = tokenizer._wordpiece_fit(wc, 1)
    assert pieces == ["qz"]


def test_wordpiece_greedy_longest_match(spark):
    df = spark.createDataFrame(
        [(0, "unhappy unhappy unhappy un happy")], ["doc_id", "text"]
    )
    m = tokenizer.wordpiece_train(df, n_merges=50)
    ids = dict(tokenizer.wordpiece_vocab(m))
    id2tok = {i: t for t, i in ids.items()}
    enc = tokenizer.wordpiece_encode(df, m).collect()[0]["token_ids"]
    toks = [id2tok[i] for i in enc]
    # the whole dominant word is a single piece and greedy matching finds it
    assert "unhappy" in toks


def test_wordpiece_roundtrip_corpus_exact(docs):
    m = tokenizer.wordpiece_train(docs, n_merges=300)
    dec = {
        r["doc_id"]: r["text"]
        for r in tokenizer.wordpiece_decode(
            tokenizer.wordpiece_encode(docs, m), m
        ).collect()
    }
    n = 0
    for r in docs.collect():
        want = " ".join(
            w for w in tokenizer._WS.split((r["text"] or "").lower()) if w
        )
        assert dec[r["doc_id"]] == want
        n += 1
    assert n > 0


def test_wordpiece_literal_hash_and_byte_fallback_roundtrip(spark):
    """Literal '#' always travels as bytes (so '##'-prefixed vocab strings
    are unambiguously continuations), out-of-alphabet chars ride byte
    tokens, and a word STARTING with a fallback char keeps its boundary
    via the <w> marker."""
    fit = spark.createDataFrame(
        [(0, "plain words only here")], ["doc_id", "text"]
    )
    m = tokenizer.wordpiece_train(fit, n_merges=50)
    txt = "café ##x #start zz\U0001F600 plain # x#y"
    df = spark.createDataFrame([(0, txt)], ["doc_id", "text"])
    out = tokenizer.wordpiece_decode(
        tokenizer.wordpiece_encode(df, m), m
    ).collect()[0]["text"]
    want = " ".join(w for w in tokenizer._WS.split(txt.lower()) if w)
    assert out == want
    ids = dict(tokenizer.wordpiece_vocab(m))
    enc = tokenizer.wordpiece_encode(df, m).collect()[0]["token_ids"]
    assert ids["<unk>"] not in enc


def test_wordpiece_reserved_spellings_roundtrip(spark):
    """Text that SPELLS a reserved token (<w>, <unk>, <0x41>) must round-
    trip as content, not match the reserved id (review-caught: the raw
    span '<w>x' matched the start-marker spelling and decoded to 'x')."""
    fit = spark.createDataFrame(
        # long words push max_raw high enough for '<0x41>'-length matches
        [(0, "wonderful characters <keep> unknown wonderful <keep>")],
        ["doc_id", "text"],
    )
    m = tokenizer.wordpiece_train(fit, n_merges=80)
    txt = "<w>x <unk> <0x41> <w>onder x<w>y"
    df = spark.createDataFrame([(0, txt)], ["doc_id", "text"])
    out = tokenizer.wordpiece_decode(
        tokenizer.wordpiece_encode(df, m), m
    ).collect()[0]["text"]
    want = " ".join(w for w in tokenizer._WS.split(txt.lower()) if w)
    assert out == want


def test_wordpiece_vocab_layout_and_model_json_roundtrip(spark):
    import json

    df = spark.createDataFrame([(0, "aa ab aa ba")], ["doc_id", "text"])
    m = tokenizer.wordpiece_train(df, n_merges=20)
    vocab = tokenizer.wordpiece_vocab(m)
    assert vocab[0] == ("<unk>", 0)
    assert vocab[1] == ("<w>", 1)
    assert vocab[2] == ("<0x00>", 2) and vocab[257] == ("<0xFF>", 257)
    toks = [t for t, _ in vocab]
    assert len(toks) == len(set(toks))
    # continuation forms of the alphabet are present
    assert "##a" in toks and "##b" in toks
    m2 = json.loads(json.dumps(m))
    a = tokenizer.wordpiece_encode(df, m).collect()[0]["token_ids"]
    b = tokenizer.wordpiece_encode(df, m2).collect()[0]["token_ids"]
    assert a == b


def test_wordpiece_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    m = tokenizer.wordpiece_train(df.where("doc_id = 0"), n_merges=20)
    out = {
        r["doc_id"]: r["token_ids"]
        for r in tokenizer.wordpiece_encode(df, m).collect()
    }
    assert out[1] == [] and out[2] == [] and out[3] == []
    dec = {
        r["doc_id"]: r["text"]
        for r in tokenizer.wordpiece_decode(
            tokenizer.wordpiece_encode(df, m), m
        ).collect()
    }
    assert dec[0] == "hello world" and dec[1] == "" and dec[2] == ""


def test_wordpiece_token_counts_match_encode(docs):
    m = tokenizer.wordpiece_train(docs, n_merges=200)
    counts = {
        r["doc_id"]: r["n_wordpiece_tokens"]
        for r in tokenizer.wordpiece_token_counts(docs, m).collect()
    }
    enc = {
        r["doc_id"]: len(r["token_ids"])
        for r in tokenizer.wordpiece_encode(docs, m).collect()
    }
    assert counts == enc and len(counts) > 0


def test_pack_token_ids_wordpiece_model_dispatch(docs):
    m = tokenizer.wordpiece_train(docs, n_merges=200)
    packed = tokenizer.pack_token_ids(docs, m, seq_len=128, n_buckets=8)
    rows = packed.collect()
    assert rows and all(1 <= r["n_tokens"] <= 128 for r in rows)
    from collections import Counter

    pack_ids = Counter()
    for r in rows:
        pack_ids.update(r["token_ids"])
    enc_ids = Counter()
    for r in tokenizer.wordpiece_encode(docs, m).collect():
        enc_ids.update(r["token_ids"])
    assert pack_ids == enc_ids


def test_unigram_reserved_spellings_roundtrip(spark):
    """A LEARNED piece that spells a reserved token (<unk>, <0xNN>) must
    never match in Viterbi (review-caught): unigram_vocab gives such a
    piece the reserved id (first-id-wins), so matching it would emit the
    byte-token/unk id and decode to something else. Colliding text routes
    through single-char pieces / byte fallback instead — the unigram
    analogue of test_wordpiece_reserved_spellings_roundtrip."""
    fit = spark.createDataFrame(
        [(0, "the x 0 4 1 < > u n k the quick brown fox the")],
        ["doc_id", "text"],
    )
    m = tokenizer.unigram_train(fit, vocab_size=64)
    # splice in adversarial pieces spelling reserved tokens, with the best
    # possible score (0) so Viterbi would always prefer them if matchable
    m["pieces"] = [["<0x41>", 0], ["<unk>", 0]] + m["pieces"]
    for txt in ("the<0x41>", "<0x41>", "a <unk> b", "x<unk>0"):
        df = spark.createDataFrame([(0, txt)], ["doc_id", "text"])
        out = tokenizer.unigram_decode(
            tokenizer.unigram_encode(df, m), m
        ).collect()[0]["text"]
        want = " ".join(w for w in tokenizer._WS.split(txt.lower()) if w)
        assert out == want, txt

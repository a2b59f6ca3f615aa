"""Property-based tests for the BPE core (pure driver-side functions — no
Spark session needed, so hypothesis can afford hundreds of examples)."""

import string

from hypothesis import given, settings, strategies as st

from spark_iforest_spark.operators.tokenizer import (
    _EOW,
    _bpe_fit,
    _encode_word,
    _word_symbols,
)

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=12)
corpora = st.dictionaries(words, st.integers(min_value=1, max_value=50), min_size=1, max_size=40)


@settings(max_examples=200, deadline=None)
@given(corpora)
def test_fit_is_deterministic_and_prefix_stable(word_counts):
    a = _bpe_fit(dict(word_counts), 30)
    b = _bpe_fit(dict(reversed(list(word_counts.items()))), 30)
    # iteration order of the input dict must not matter (the driver feeds
    # an ORDER BY'd collect, but the algorithm itself shouldn't care)
    assert a == b
    small = _bpe_fit(dict(word_counts), 10)
    assert a[: len(small)] == small  # prefix-stable in n_merges


@settings(max_examples=200, deadline=None)
@given(corpora)
def test_encode_reconstructs_every_word(word_counts):
    merges = _bpe_fit(dict(word_counts), 25)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in word_counts:
        toks = _encode_word(w, ranks)
        # concatenating the tokens reproduces the symbols exactly — BPE
        # merges never lose or reorder characters
        assert "".join(toks) == "".join(_word_symbols(w))
        assert 1 <= len(toks) <= len(w) + 1


@settings(max_examples=100, deadline=None)
@given(corpora, words)
def test_unseen_words_encode_safely(word_counts, novel):
    merges = _bpe_fit(dict(word_counts), 25)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    toks = _encode_word(novel, ranks)
    assert "".join(toks) == novel + _EOW


@settings(max_examples=200, deadline=None)
@given(
    corpora,
    st.text(
        # arbitrary unicode incl. multi-byte, emoji, controls — but not
        # the ASCII whitespace class, which normalization collapses
        alphabet=st.characters(
            exclude_characters=" \t\n\x0b\f\r", exclude_categories=("Cs",)
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_byte_fallback_roundtrip_arbitrary_unicode(word_counts, novel_word):
    """Round-7 byte fallback, property form: for ANY unicode word —
    trained alphabet or not — encode then decode reproduces the word
    exactly (driver-side via the shared pure functions)."""
    from spark_iforest_spark.operators.tokenizer import (
        _BYTE_TOKENS,
        _decode_ids,
        _encode_word_ids,
        _encoder,
        bpe_vocab,
    )

    merges = _bpe_fit(dict(word_counts), 25)
    alphabet = sorted({ch for w in word_counts for ch in w})
    model = {"merges": merges, "alphabet": alphabet, "vocab_version": 2}
    ranks, ids, byte_ids = _encoder(model)
    id2tok = {i: t for t, i in bpe_vocab(model)}
    byte_of = {ids[bt]: b for b, bt in enumerate(_BYTE_TOKENS)}
    # lowercase: the corpus path lowercases before splitting; feed the
    # normalized form so the property is exact equality
    w = novel_word.lower()
    got = _decode_ids(_encode_word_ids(w, ranks, ids, byte_ids), id2tok, byte_of)
    assert got == w
    assert ids["<unk>"] not in _encode_word_ids(w, ranks, ids, byte_ids)


# ------------------------------------------- unigram-LM tokenizer (round 8)
@settings(max_examples=100, deadline=None)
@given(corpora)
def test_unigram_fit_deterministic_under_input_order(word_counts):
    from spark_iforest_spark.operators.tokenizer import _unigram_fit

    a = _unigram_fit(dict(word_counts), 50)
    b = _unigram_fit(dict(reversed(list(word_counts.items()))), 50)
    assert a == b  # integer half-unit totals -> order-independent scores


@settings(max_examples=100, deadline=None)
@given(
    corpora,
    st.text(
        alphabet=st.characters(
            exclude_characters=" \t\n\x0b\f\r", exclude_categories=("Cs",)
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_unigram_word_roundtrip_any_unicode(word_counts, novel_word):
    """decode(encode(w)) == w for ANY word against ANY fitted model —
    covered runs Viterbi-segment, everything else (unseen chars, literal
    U+2581) rides byte tokens."""
    from spark_iforest_spark.operators.tokenizer import (
        _BYTE_TOKENS,
        _UNK,
        _WB,
        _unigram_encoder,
        _unigram_fit,
        _unigram_word_ids,
    )

    model = {
        "kind": "unigram",
        "pieces": _unigram_fit(dict(word_counts), 40),
        "max_piece_len": 8,
        "vocab_version": 2,
    }
    scores, ids, byte_ids, mpl = _unigram_encoder(model)
    id2tok = {i: t for t, i in ids.items()}
    byte_of = {ids[bt]: b for b, bt in enumerate(_BYTE_TOKENS)}
    w = novel_word.lower()
    got_ids = _unigram_word_ids(w, scores, ids, byte_ids, mpl)
    assert ids[_UNK] not in got_ids
    # straight-line decode of the id stream
    parts, buf = [], bytearray()
    for i in got_ids:
        b = byte_of.get(i)
        if b is not None:
            buf.append(b)
            continue
        if buf:
            parts.append(buf.decode("utf-8"))
            buf.clear()
        parts.append(id2tok[i].replace(_WB, " "))
    if buf:
        parts.append(buf.decode("utf-8"))
    s = "".join(parts)
    assert (s[1:] if s.startswith(" ") else s) == w


# --------------------------------------------- WordPiece tokenizer (round 8)
@settings(max_examples=100, deadline=None)
@given(corpora)
def test_wordpiece_fit_deterministic_under_input_order(word_counts):
    from spark_iforest_spark.operators.tokenizer import _wordpiece_fit

    a = _wordpiece_fit(dict(word_counts), 50)
    b = _wordpiece_fit(dict(reversed(list(word_counts.items()))), 50)
    assert a == b  # exact integer cross-multiplied scores + lex tie-break


@settings(max_examples=100, deadline=None)
@given(
    corpora,
    st.text(
        alphabet=st.characters(
            exclude_characters=" \t\n\x0b\f\r", exclude_categories=("Cs",)
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_wordpiece_word_roundtrip_any_unicode(word_counts, novel_word):
    """decode(encode(w)) == w for ANY word against ANY fitted model —
    greedy longest-match over covered spans, byte tokens for everything
    else (unseen chars, every literal '#'), <w> marking a word-initial
    fallback run."""
    from spark_iforest_spark.operators.tokenizer import (
        _BYTE_TOKENS,
        _UNK,
        _WP_CONT,
        _WP_START,
        _wordpiece_fit,
        _wp_encoder,
        _wp_word_ids,
    )

    model = {
        "kind": "wordpiece",
        "pieces": _wordpiece_fit(dict(word_counts), 40),
        "alphabet": sorted(
            {ch for w in word_counts if "#" not in w for ch in w}
        ),
        "vocab_version": 2,
    }
    from spark_iforest_spark.operators.tokenizer import wordpiece_vocab

    pieces, byte_ids, start_id, max_raw = _wp_encoder(model)
    full = dict(wordpiece_vocab(model))
    id2tok = {i: t for t, i in full.items()}
    byte_of = {full[bt]: b for b, bt in enumerate(_BYTE_TOKENS)}
    w = novel_word.lower()
    got_ids = _wp_word_ids(w, pieces, byte_ids, start_id, max_raw)
    assert full[_UNK] not in got_ids
    # reserved spellings never match as content (review-pinned): every
    # emitted id is a content piece, the start marker, or a byte token
    assert all(
        i in id2tok and (id2tok[i] in pieces or i == start_id or i in byte_of)
        for i in got_ids
    )
    parts, buf = [], bytearray()
    for i in got_ids:
        b = byte_of.get(i)
        if b is not None:
            buf.append(b)
            continue
        if buf:
            parts.append(buf.decode("utf-8"))
            buf.clear()
        if i == start_id:
            parts.append(" ")
            continue
        tok = id2tok[i]
        parts.append(tok[len(_WP_CONT):] if tok.startswith(_WP_CONT) else " " + tok)
    if buf:
        parts.append(buf.decode("utf-8"))
    s = "".join(parts)
    assert (s[1:] if s.startswith(" ") else s) == w

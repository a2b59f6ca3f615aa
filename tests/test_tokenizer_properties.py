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

"""Property tests for the pure math under drift and layout — no Spark."""

import math

from hypothesis import given, settings, strategies as st


def _psi(p, q):
    return sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))


fracs = st.lists(st.floats(min_value=1e-6, max_value=1.0), min_size=2, max_size=20)


@settings(max_examples=300, deadline=None)
@given(fracs, fracs)
def test_psi_nonnegative_and_zero_iff_equal(a, b):
    # normalize to distributions (the operator's smoothing guarantees
    # strictly positive mass, mirrored by min_value above)
    n = min(len(a), len(b))
    p = [x / sum(a[:n]) for x in a[:n]]
    q = [x / sum(b[:n]) for x in b[:n]]
    psi = _psi(p, q)
    assert psi >= -1e-12  # PSI = KL(p||q) + KL(q||p) >= 0 (Gibbs)
    assert abs(_psi(p, p)) < 1e-12


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=4),
)
def test_morton_interleave_roundtrips(buckets):
    """The shift/or arithmetic in layout._interleave must be a bijection:
    bit b of dim d lands at b*k+d, so the buckets are recoverable — the
    property that makes z-ordered files tile disjoint hyper-rectangles.
    (Mirrored in pure Python; the Column expression applies the identical
    shifts.)"""
    k, bits = len(buckets), 8
    z = 0
    for d, v in enumerate(buckets):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * k + d)
    back = [
        sum(((z >> (b * k + d)) & 1) << b for b in range(bits))
        for d in range(k)
    ]
    assert back == buckets

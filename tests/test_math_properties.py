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


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_profile_partial_fold_arithmetic(assigned):
    """The mathematical claims behind merge_profile_partials (mirrored in
    pure Python; the Column expressions apply the identical ops): for ANY
    shard assignment, (1) per-shard round(min,6)/round(max,6) commute
    with the global min/max because round is monotone, and (2) per-shard
    integer-unit sums add to the global integer-unit sum exactly — which
    together make the fold associative and shard-layout-independent."""
    import math

    vals = [v for v, _ in assigned]
    shards = {}
    for v, s in assigned:
        shards.setdefault(s, []).append(v)
    # (1) monotone rounding commutes with min/max across any sharding
    assert min(round(min(xs), 6) for xs in shards.values()) == round(min(vals), 6)
    assert max(round(max(xs), 6) for xs in shards.values()) == round(max(vals), 6)
    # (2) fixed-point unit sums are exact integers, so shard sums add
    units = lambda x: math.floor(x * 10_000.0)
    assert sum(sum(units(x) for x in xs) for xs in shards.values()) == sum(
        units(x) for x in vals
    )

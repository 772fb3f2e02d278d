"""Hypothesis property tests for the pure kernels (no Spark session —
these run in milliseconds and attack the algorithmic core directly).

Oracles: quadratic DP for LCS; python set algebra for shingles and
block coverage.  Spark-side equivalents are covered by the suite's
engine tests; these pin the kernels' math under adversarial inputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from app_dupfind_spark.operators.spans import _lcs_len

ALPHA = "ab "  # tiny alphabet => dense repeats => hard LCS cases


def _lcs_dp(x: str, y: str) -> int:
    """O(n*m) dynamic-programming longest-common-substring oracle."""
    best = 0
    prev = [0] * (len(y) + 1)
    for i in range(1, len(x) + 1):
        cur = [0] * (len(y) + 1)
        for j in range(1, len(y) + 1):
            if x[i - 1] == y[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=ALPHA, min_size=0, max_size=60),
    st.text(alphabet=ALPHA, min_size=0, max_size=60),
    st.integers(min_value=1, max_value=8),
)
def test_lcs_rolling_hash_matches_dp(x, y, min_len):
    true = _lcs_dp(x, y)
    got = _lcs_len(x, y, min_len)
    if true >= min_len:
        assert got == true
    else:
        assert got == 0  # below the gate -> reported as no span


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdef ", min_size=0, max_size=200))
def test_lcs_self_is_length(x):
    assert _lcs_len(x, x, 1) == len(x)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=0, max_size=50, unique=True),
    st.integers(min_value=1, max_value=9),
)
def test_block_pair_layout_covers_every_pair_once(ids, B):
    """The blocked all-pairs layout rule (ann.embedding_near_dup_pairs /
    blocked_gemm_pairs): left side explodes to blocks [blk, B), right
    side keys its own block, same-block ties break by id — prove every
    unordered pair is generated exactly once for ANY deterministic
    block assignment (the implementations use pmod(xxhash64(id), B))."""

    def blk(i):
        return i % B  # any deterministic assignment has the property

    seen = {}
    for x in ids:
        for j in range(blk(x), B):          # x as left
            for y in ids:
                if blk(y) != j or x == y:
                    continue
                if blk(x) < blk(y) or (blk(x) == blk(y) and x < y):
                    p = (min(x, y), max(x, y))
                    seen[p] = seen.get(p, 0) + 1
    want = {(min(a, b), max(a, b)) for a in ids for b in ids if a < b}
    assert set(seen) == want
    assert all(v == 1 for v in seen.values())

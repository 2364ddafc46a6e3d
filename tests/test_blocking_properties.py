"""Pure-Python property pins for the round-5 operators' algebraic
contracts — the identities the Spark/DuckDB twins rely on but cannot
assert about themselves:

- SimHash 4×16-bit banding is LOSSLESS for Hamming ≤ 3 (pigeonhole) —
  `simhash_hamming_dedup`'s candidate generation misses no qualifying
  pair;
- (brand, length-bucket ±1) blocking is LOSSLESS for edit distance ≤ 2
  — `edit_distance_name_pairs`' probe explosion misses no pair;
- the rank-identity Gini equals the pairwise mean-absolute-difference
  definition — `gini_key_skew`;
- the conditional-sum winsorized mean equals clamp-then-mean —
  `winsorized_robust_stats`;
- the 1 − 6Σd²/(n³−n) Spearman equals Pearson correlation of the rank
  vectors — `ranker_rank_correlation`.

No SparkSession needed; hypothesis drives the search.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_in_pthreads_spark.operators.dedup import (
    EDIT_BUCKET_W, EDIT_MAX, SIMHASH_BANDS, SIMHASH_HAMMING_MAX)


# --- simhash banding ------------------------------------------------------

@given(st.integers(0, 2**64 - 1), st.data())
@settings(max_examples=200)
def test_simhash_banding_lossless_for_hamming_3(v, data):
    flips = data.draw(st.lists(st.integers(0, 63), min_size=0,
                               max_size=SIMHASH_HAMMING_MAX, unique=True))
    w = v
    for b in flips:
        w ^= 1 << b
    ha, hb = format(v, "016x"), format(w, "016x")
    bands_equal = [
        ha[4 * b: 4 * b + 4] == hb[4 * b: 4 * b + 4]
        for b in range(SIMHASH_BANDS)
    ]
    # <= 3 flipped bits over 4 disjoint bands: pigeonhole guarantees a
    # fully-identical band, so the equi-join candidate set is complete
    assert any(bands_equal)


@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
@settings(max_examples=200)
def test_simhash_hamming_from_nibbles_matches_popcount(a, b):
    ha, hb = format(a, "016x"), format(b, "016x")
    nib = sum(bin(int(ca, 16) ^ int(cb, 16)).count("1")
              for ca, cb in zip(ha, hb))
    assert nib == bin(a ^ b).count("1")


# --- edit-distance blocking ----------------------------------------------

def _apply_edits(s: str, n_edits: int, rng: random.Random) -> str:
    alpha = "abcdefgh "
    for _ in range(n_edits):
        op = rng.choice(("ins", "del", "sub")) if s else "ins"
        i = rng.randrange(len(s) + 1 if op == "ins" else len(s))
        if op == "ins":
            s = s[:i] + rng.choice(alpha) + s[i:]
        elif op == "del":
            s = s[:i] + s[i + 1:]
        else:
            s = s[:i] + rng.choice(alpha) + s[i + 1:]
    return s


@given(st.text(alphabet="abcdefgh ", min_size=1, max_size=30),
       st.integers(0, EDIT_MAX), st.integers(0, 2**32))
@settings(max_examples=200)
def test_length_bucket_blocking_lossless_for_edit_2(s, n_edits, seed):
    t = _apply_edits(s, n_edits, random.Random(seed))
    assert abs(len(s) - len(t)) <= EDIT_MAX
    # a qualifying pair is at most one W=3 bucket apart, so probing
    # {B-1, B, B+1} against the partner's own bucket always matches
    assert abs(len(s) // EDIT_BUCKET_W - len(t) // EDIT_BUCKET_W) <= 1


# --- gini rank identity ---------------------------------------------------

@given(st.lists(st.integers(1, 1000), min_size=1, max_size=50))
@settings(max_examples=200)
def test_gini_rank_identity_equals_pairwise_definition(xs):
    xs = sorted(xs)
    n, total = len(xs), sum(xs)
    s_ix = sum(i * x for i, x in enumerate(xs, start=1))
    rank_gini = (2 * s_ix - (n + 1) * total) / (n * total)
    pairwise = sum(abs(a - b) for a in xs for b in xs) / (2 * n * total)
    assert abs(rank_gini - pairwise) < 1e-12


# --- winsorized mean conditional-sum identity ------------------------------

@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=60))
@settings(max_examples=200)
def test_winsorized_conditional_sum_equals_clamp_then_mean(xs):
    xs = sorted(xs)
    n, k = len(xs), len(xs) // 10
    lo, hi = xs[k], xs[n - k - 1]
    clamped = [min(max(x, lo), hi) for x in xs]
    mid_sum = sum(xs[k:n - k])
    assert mid_sum + k * lo + k * hi == sum(clamped)


# --- spearman rank formula -------------------------------------------------

@given(st.permutations(list(range(2, 12))))
@settings(max_examples=200)
def test_spearman_formula_equals_pearson_of_ranks(perm):
    n = len(perm)
    r1 = list(range(1, n + 1))
    r2 = [p - 1 for p in perm]          # a permutation of 1..n
    d2 = sum((a - b) ** 2 for a, b in zip(r1, r2))
    rho = 1 - 6 * d2 / (n**3 - n)
    mean = (n + 1) / 2
    cov = sum((a - mean) * (b - mean) for a, b in zip(r1, r2))
    var = sum((a - mean) ** 2 for a in r1)
    assert abs(rho - cov / var) < 1e-12


# --- bucketed interval-overlap join (round-7 session 2) --------------------

@given(st.lists(
    st.tuples(st.integers(0, 9),                      # user
              st.integers(0, 10 * 86_400_000_000),    # start µs
              st.integers(1, 4 * 3_600_000_000)),     # duration µs
    min_size=0, max_size=40))
@settings(max_examples=200)
def test_interval_bucket_join_lossless_and_exactly_once(raw):
    """`session_overlap_pairs`' bucket scheme, replicated in pure
    Python, must find every cross-user overlapping pair EXACTLY once
    (no pair missed by hour blocking, none double-counted across the
    buckets a long overlap spans) for arbitrary intervals — not just
    the 30-min-tail sessions the corpus produces."""
    from mapreduce_in_pthreads_spark.operators.timeseries import (
        OVL_HOUR_US)

    ivs = [(u, s, s + d) for u, s, d in raw]

    # brute force: every unordered cross-user overlapping index pair
    want = set()
    for i in range(len(ivs)):
        u1, s1, e1 = ivs[i]
        for j in range(i + 1, len(ivs)):
            u2, s2, e2 = ivs[j]
            if u1 != u2 and max(s1, s2) < min(e1, e2):
                want.add((i, j))

    # the operator's plan: explode to touched hour buckets, pair
    # within a bucket, keep iff the bucket owns the overlap start
    buckets: dict = {}
    for idx, (u, s, e) in enumerate(ivs):
        for hb in range(s // OVL_HOUR_US, (e - 1) // OVL_HOUR_US + 1):
            buckets.setdefault(hb, []).append(idx)
    got = []
    for hb, members in buckets.items():
        for x in range(len(members)):
            for y in range(len(members)):
                i, j = members[x], members[y]
                if i >= j:
                    continue
                u1, s1, e1 = ivs[i]
                u2, s2, e2 = ivs[j]
                if (u1 != u2 and max(s1, s2) < min(e1, e2)
                        and max(s1, s2) // OVL_HOUR_US == hb):
                    got.append((i, j))

    assert len(got) == len(set(got))  # exactly-once
    assert set(got) == want           # lossless

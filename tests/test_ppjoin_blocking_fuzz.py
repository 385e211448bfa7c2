"""Property tests for the PPJoin prefix-filter laws behind the exact
Jaccard pair frame (dedup._pruned_prefix_frame / _ppjoin_prunes): for ANY
corpus of token sets and threshold t = p/q, every pair with Jaccard >= t

  (1) shares a token inside both docs' (df, w)-ordered prefixes
      (prefix losslessness — Xiao et al. 2008), and
  (2) survives the row-wise length + positional prunes on at least one
      such shared prefix row (the first-shared-token survival argument in
      the _ppjoin_prunes docstring),

so the blocked candidate set is a superset of the qualifying pairs.  Pure-
Python mirror of the Spark expressions (same integer arithmetic, same
total order), fuzzed far beyond the documents fixture's distribution —
the pipeline-level agreement with the fixture is separately pinned in
tests/test_llm_ops.py.
"""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# small token universe -> dense overlaps; tiny sets hit the boundary cases
# (prefix length 1, ceil ties, singleton docs)
token_sets = st.lists(
    st.frozensets(st.integers(0, 15), min_size=1, max_size=10),
    min_size=2,
    max_size=8,
)
thresholds = st.sampled_from(["0.5", "0.6", "0.7", "0.8"])


def prefixes(corpus: list[frozenset], t: Fraction) -> list[list[tuple[int, int]]]:
    """Per-doc [(rnk, w)] prefix rows under the global (df, w) order —
    mirrors _pruned_prefix_frame: rnk <= n - ceil(t*n) + 1."""
    df = {}
    for s in corpus:
        for w in s:
            df[w] = df.get(w, 0) + 1
    out = []
    for s in corpus:
        ranked = sorted(s, key=lambda w: (df[w], w))
        keep = len(s) - math.ceil(t * len(s)) + 1
        out.append([(r + 1, w) for r, w in enumerate(ranked) if r + 1 <= keep])
    return out


def prunes_pass(na: int, ra: int, nb: int, rb: int, p: int, q: int) -> bool:
    """Mirror of _ppjoin_prunes' exact integer arithmetic."""
    ubound = 1 + min(na - ra, nb - rb)
    return q * min(na, nb) >= p * max(na, nb) and (q + p) * ubound >= p * (na + nb)


@settings(max_examples=300, deadline=None)
@given(token_sets, thresholds)
def test_prefix_blocking_with_prunes_is_lossless(corpus, t_str):
    frac = Fraction(t_str)
    p, q = frac.numerator, frac.denominator
    pref = prefixes(corpus, frac)
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            a, b = corpus[i], corpus[j]
            jac = Fraction(len(a & b), len(a | b))
            if jac < frac:
                continue  # blocking may emit false candidates; never misses
            shared = [
                (ra, rb)
                for ra, wa in pref[i]
                for rb, wb in pref[j]
                if wa == wb
            ]
            assert shared, f"qualifying pair ({i},{j}) shares no prefix token"
            assert any(
                prunes_pass(len(a), ra, len(b), rb, p, q) for ra, rb in shared
            ), f"qualifying pair ({i},{j}) pruned away"


@settings(max_examples=300, deadline=None)
@given(token_sets, thresholds)
def test_length_prune_alone_is_lossless(corpus, t_str):
    """The length prune in isolation: J >= t forces q*min(|A|,|B|) >=
    p*max(|A|,|B|) — the bound every blocking variant in dedup.py reuses
    (LSH verify, containment probe)."""
    frac = Fraction(t_str)
    p, q = frac.numerator, frac.denominator
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            a, b = corpus[i], corpus[j]
            if Fraction(len(a & b), len(a | b)) >= frac:
                assert q * min(len(a), len(b)) >= p * max(len(a), len(b))

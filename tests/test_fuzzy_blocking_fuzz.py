"""Property tests for the deletion-neighborhood blocking law behind
join_fuzzy_neighbors: for SAME-LENGTH strings, edit distance <= 1 is
exactly hamming <= 1, and any such pair shares a (position, deletion-
signature) key — the losslessness the driver oracle's naive quadratic
formulation relies on.  Pure-Python mirror of the Spark expressions, so the
law is fuzzed far beyond the fixture's name distribution.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def signatures(s: str) -> set[tuple[int, str]]:
    """(pos, s-without-pos) keys — mirrors the builder's transform/posexplode."""
    return {(i, s[:i] + s[i + 1 :]) for i in range(len(s))}


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


alphabet = st.sampled_from("abc01")  # small alphabet -> dense collisions
words = st.text(alphabet, min_size=1, max_size=12)


@settings(max_examples=300)
@given(words, st.integers(0, 11), alphabet)
def test_single_substitution_always_shares_a_signature(base, pos, ch):
    pos = pos % len(base)
    other = base[:pos] + ch + base[pos + 1 :]
    assert levenshtein(base, other) <= 1
    assert signatures(base) & signatures(other)  # blocking finds the pair


@settings(max_examples=300)
@given(words, words)
def test_blocking_is_exact_for_same_length_pairs(a, b):
    """Same length: shares-a-signature <=> hamming <= 1 <=> levenshtein <= 1.
    (Different lengths never share a key: signatures carry the position AND
    the length-1 remainder, so the equi-join cannot emit them.)"""
    if len(a) != len(b):
        assert not (signatures(a) & signatures(b)) or len(a) == len(b)
        return
    hamming = sum(x != y for x, y in zip(a, b))
    shares = bool(signatures(a) & signatures(b))
    assert shares == (hamming <= 1)
    if hamming <= 1:
        assert levenshtein(a, b) <= 1

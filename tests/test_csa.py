"""Ψ-based compressed suffix array vs brute force (reference sketch:
compactds/CompressedSuffixArray.hpp; the query surface here is new)."""

import numpy as np

from centrifuger_tpu.succinct.csa import CompressedSuffixArray


def brute_sa(text):
    n = len(text)
    return np.array(sorted(range(n), key=lambda i: tuple(text[i:]) + (-1,)),
                    dtype=np.int64)


def make(seed=5, n=800, sigma=4):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, sigma, n).astype(np.int64)
    # unique smallest terminator avoids rotation ambiguity in suffix order
    text[-1] = 0
    sa = brute_sa(text)
    return text, sa


def test_psi_and_lookup():
    text, sa = make()
    n = len(text)
    isa = np.zeros(n, dtype=np.int64)
    isa[sa] = np.arange(n)
    psi_true = isa[(sa + 1) % n]
    csa = CompressedSuffixArray(text, sa, sample_rate=8)
    for i in range(0, n, 7):
        assert csa.psi(i) == psi_true[i]
    for i in range(0, n, 11):
        assert csa.lookup(i) == sa[i]
    for p in range(0, n, 13):
        assert csa.inverse(p) == isa[p]


def test_count():
    text, sa = make(seed=9, n=600)
    csa = CompressedSuffixArray(text, sa, sample_rate=16)
    rng = np.random.default_rng(2)
    tl = [tuple(text[i:i + m]) for m in (1, 2, 3, 5, 8)
          for i in range(0, len(text) - 8, 29)]
    joined = "".join(map(str, text))
    for pat in tl[:80]:
        pstr = "".join(map(str, pat))
        truth = sum(1 for i in range(len(text) - len(pat) + 1)
                    if joined[i:i + len(pat)] == pstr)
        # count() counts cyclic-rotation matches; restrict to in-bounds truth
        got = csa.count(np.array(pat))
        assert abs(got - truth) <= 1  # tail rotation can add at most 1
    # absent pattern
    assert csa.count(np.array([3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3])) in (0, 1)


def test_space():
    text, sa = make(seed=1, n=4000)
    csa = CompressedSuffixArray(text, sa, sample_rate=32)
    assert csa.nbytes() < sa.nbytes  # beats the plain 8-byte/entry SA

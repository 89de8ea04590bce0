"""Randomized brute-force property tests for the succinct library breadth
(select / sparse / RRR / run-length bitvectors, packed arrays, codes,
sequences) — the same self-checking style as the reference's compactds test
binary (reference compactds/test.cpp:64-1793 cases `array`, `bitvector`,
`sequence`, `huffman`)."""

import numpy as np
import pytest

from centrifuger_tpu.succinct.bits import (FixedArray, FractionBitArray,
                                           VariableSizeArray,
                                           InterleavedFixedArray)
from centrifuger_tpu.succinct.bitvector import Bitvector
from centrifuger_tpu.succinct.bitvectors import (SelectSupport, SparseBitvector,
                                                 CompressedBitvector,
                                                 RunLengthBitvector)
from centrifuger_tpu.succinct.codes import (HuffmanCode, elias_gamma_encode,
                                            elias_gamma_decode,
                                            elias_delta_encode,
                                            elias_delta_decode)
from centrifuger_tpu.succinct.sequences import (SequencePlain, SequenceWavelet,
                                                SequenceRunLength,
                                                SequenceHybrid)

RNG = np.random.default_rng(20260818)


# ------------------------------------------------------------------ arrays

@pytest.mark.parametrize("width", [1, 3, 5, 7, 11, 13, 17, 31, 33, 57, 64])
def test_fixed_array_roundtrip(width):
    n = 1000
    hi = (1 << width) - 1
    vals = RNG.integers(0, hi, size=n, endpoint=True, dtype=np.uint64)
    arr = FixedArray.from_values(vals, width)
    idx = RNG.integers(0, n, size=500)
    assert (arr.read(idx) == vals[idx]).all()
    assert (arr.read(np.arange(n)) == vals).all()


def test_fixed_array_write_and_lcp():
    vals = RNG.integers(0, 100, size=300, dtype=np.uint64)
    arr = FixedArray.from_values(vals, 9)
    for i in [0, 7, 55, 299]:
        arr.write(i, 77)
        vals[i] = 77
    assert (arr.read(np.arange(300)) == vals).all()
    vals2 = vals.copy()
    vals2[50:60] = vals2[100:110]
    arr2 = FixedArray.from_values(vals2, 9)
    m = arr2.prefix_match_len(50, 100, 40)
    brute = 0
    while brute < 40 and 50 + brute < 300 and \
            vals2[50 + brute] == vals2[100 + brute]:
        brute += 1
    assert m == brute


def test_fraction_bit_array():
    for u in [3, 5, 6, 10, 17]:
        vals = RNG.integers(0, u, size=777, dtype=np.uint64)
        fb = FractionBitArray(vals, u)
        assert (fb.read(np.arange(777)) == vals).all()


@pytest.mark.parametrize("mode", ["dense", "sampled", "direct"])
def test_variable_size_array(mode):
    vals = np.concatenate([
        RNG.integers(0, 10, 300, dtype=np.uint64),
        RNG.integers(0, 1 << 20, 300, dtype=np.uint64),
        RNG.integers(0, 1 << 50, 100, dtype=np.uint64)])
    RNG.shuffle(vals)
    va = VariableSizeArray(vals, mode=mode)
    idx = RNG.integers(0, len(vals), size=400)
    assert (va.read(idx) == vals[idx]).all()


def test_interleaved_array():
    a = RNG.integers(0, 1 << 12, 500, dtype=np.uint64)
    b = RNG.integers(0, 1 << 9, 500, dtype=np.uint64)
    ia = InterleavedFixedArray(a, b)
    idx = RNG.integers(0, 500, size=300)
    assert (ia.read_a(idx) == a[idx]).all()
    assert (ia.read_b(idx) == b[idx]).all()


# -------------------------------------------------------------- bitvectors

def _rand_bits(n, p):
    return RNG.random(n) < p


@pytest.mark.parametrize("p", [0.01, 0.3, 0.5, 0.9])
@pytest.mark.parametrize("speed", ["binary", "dense"])
def test_select_support(p, speed):
    n = 5000
    bits = _rand_bits(n, p)
    bv = Bitvector.from_bits(bits)
    pos1 = np.flatnonzero(bits)
    pos0 = np.flatnonzero(~bits)
    s1 = SelectSupport(bv, 1, speed=speed)
    s0 = SelectSupport(bv, 0, speed=speed)
    assert s1.total == len(pos1) and s0.total == len(pos0)
    if len(pos1):
        k = RNG.integers(1, len(pos1), size=200, endpoint=True)
        assert (s1.select(k) == pos1[k - 1]).all()
    if len(pos0):
        k = RNG.integers(1, len(pos0), size=200, endpoint=True)
        assert (s0.select(k) == pos0[k - 1]).all()


@pytest.mark.parametrize("m,n", [(0, 100), (1, 100), (50, 10000), (5000, 10000),
                                 (100, 1 << 20)])
def test_sparse_bitvector(m, n):
    pos = np.sort(RNG.choice(n, size=m, replace=False)).astype(np.int64)
    sb = SparseBitvector(pos, n)
    if m:
        k = RNG.integers(1, m, size=min(200, m), endpoint=True)
        assert (sb.select1(k) == pos[k - 1]).all()
    qs = RNG.integers(0, n, size=300)
    brute = np.searchsorted(pos, qs, side="right")
    assert (sb.rank1_inclusive(qs) == brute).all()
    if m:
        assert (sb.access(pos[:50]) == 1).all()
    notin = np.setdiff1d(qs, pos)[:50]
    if len(notin):
        assert (sb.access(notin) == 0).all()


@pytest.mark.parametrize("p", [0.02, 0.3, 0.5, 0.97])
def test_rrr_bitvector(p):
    n = 4321
    bits = _rand_bits(n, p)
    cb = CompressedBitvector(bits)
    qs = RNG.integers(0, n, size=400)
    brute = np.cumsum(bits)
    assert (cb.rank1_inclusive(qs) == brute[qs]).all()
    assert (cb.access(qs) == bits[qs]).all()
    # compresses skewed inputs
    if p <= 0.05:
        assert cb.nbytes() < n // 8


def test_runlength_bitvector():
    # runny input: long alternating runs
    runs = RNG.integers(1, 200, size=200)
    vals = np.arange(200) % 2
    bits = np.repeat(vals, runs).astype(bool)
    n = len(bits)
    rl = RunLengthBitvector(bits)
    qs = RNG.integers(0, n, size=400)
    brute = np.cumsum(bits)
    assert (rl.rank1_inclusive(qs) == brute[qs]).all()
    assert (rl.access(qs) == bits[qs]).all()
    ones = np.flatnonzero(bits)
    k = RNG.integers(1, len(ones), size=200, endpoint=True)
    assert (rl.select1(k) == ones[k - 1]).all()
    assert rl.nbytes() < n // 8


# ------------------------------------------------------------------- codes

def test_huffman_roundtrip():
    for sigma in [2, 4, 7, 26]:
        freqs = RNG.integers(1, 1000, size=sigma)
        hc = HuffmanCode(freqs)
        # Kraft equality for a full binary code
        assert abs(sum(2.0 ** -l for l in hc.lengths if l > 0) - 1.0) < 1e-9
        syms = RNG.integers(0, sigma, size=500)
        words, total = hc.encode(syms)
        dec = hc.decode(words, total, len(syms))
        assert (dec == syms).all()


def test_huffman_optimality_vs_entropy():
    freqs = np.array([900, 50, 30, 20])
    hc = HuffmanCode(freqs)
    bits = hc.space_bits(freqs)
    n = freqs.sum()
    p = freqs / n
    entropy = -(p * np.log2(p)).sum() * n
    assert bits < entropy + n  # within 1 bit/symbol of entropy


def test_elias_gamma():
    vals = RNG.integers(1, 1 << 20, size=500, dtype=np.uint64)
    words, total, starts = elias_gamma_encode(vals)
    dec = elias_gamma_decode(words, starts)
    assert (dec == vals).all()


def test_elias_delta():
    vals = RNG.integers(1, 1 << 20, size=200, dtype=np.uint64)
    words, total, starts = elias_delta_encode(vals)
    dec = elias_delta_decode(words, starts)
    assert (dec == vals).all()


# --------------------------------------------------------------- sequences

def _check_sequence(seq, codes, sigma, selectable=False):
    n = len(codes)
    qs = RNG.integers(0, n, size=200)
    acc = np.atleast_1d(seq.access(qs))
    assert (acc == codes[qs]).all(), "access mismatch"
    for c in range(sigma):
        brute = np.cumsum(codes == c)
        got = np.atleast_1d(seq.rank(c, qs))
        assert (got == brute[qs]).all(), "rank mismatch c=%d" % c
        if selectable:
            pos = np.flatnonzero(codes == c)
            if len(pos):
                k = RNG.integers(1, len(pos), size=50, endpoint=True)
                assert (np.atleast_1d(seq.select(c, k)) == pos[k - 1]).all()


@pytest.mark.parametrize("sigma", [2, 4, 5, 8])
def test_sequence_plain(sigma):
    codes = RNG.integers(0, sigma, size=3000)
    _check_sequence(SequencePlain(codes, sigma), codes, sigma, selectable=True)


@pytest.mark.parametrize("sigma,bv_kind,huffman", [
    (4, "plain", False), (4, "plain", True), (6, "plain", False),
    (4, "rrr", False), (8, "plain", True), (4, "sparse", False),
])
def test_sequence_wavelet(sigma, bv_kind, huffman):
    # skewed distribution exercises huffman shapes
    p = np.arange(1, sigma + 1, dtype=float) ** 2
    codes = RNG.choice(sigma, size=2000, p=p / p.sum())
    _check_sequence(SequenceWavelet(codes, sigma, bv_kind=bv_kind,
                                    huffman=huffman), codes, sigma)


def test_sequence_runlength():
    # runny sequence over sigma=4
    runs = RNG.integers(1, 60, size=300)
    heads = RNG.integers(0, 4, size=300)
    # drop adjacent duplicates to make true runs
    keep = np.concatenate([[True], heads[1:] != heads[:-1]])
    runs, heads = runs[keep], heads[keep]
    codes = np.repeat(heads, runs)
    _check_sequence(SequenceRunLength(codes, 4), codes, 4)


def test_sequence_hybrid():
    # half runny, half random
    runs = np.repeat(RNG.integers(0, 4, size=40), 256)
    rand = RNG.integers(0, 4, size=3000)
    codes = np.concatenate([runs, rand])
    _check_sequence(SequenceHybrid(codes, 4, block=64), codes, 4)


# --------------------------------------------- hashing / mapper / permutation

def test_universal_hash_range_and_determinism():
    from centrifuger_tpu.succinct.hashing import UniversalHash
    h = UniversalHash(97, seed=3)
    keys = RNG.integers(0, 1 << 63, size=500, dtype=np.uint64)
    v1, v2 = h(keys), h(keys)
    assert (v1 == v2).all()
    assert (0 <= v1).all() and (v1 < 97).all()
    # different seeds give different functions (overwhelmingly)
    h2 = UniversalHash(97, seed=4)
    assert (h2(keys) != v1).any()


@pytest.mark.parametrize("n", [1, 2, 10, 500, 3000])
def test_perfect_hash_is_minimal_perfect(n):
    from centrifuger_tpu.succinct.hashing import PerfectHash
    keys = np.unique(RNG.integers(0, 1 << 62, size=2 * n, dtype=np.uint64))[:n]
    assert len(keys) == n
    mph = PerfectHash(keys)
    vals = mph.lookup(keys)
    # minimal + perfect: a bijection onto [0, n)
    assert sorted(vals.tolist()) == list(range(n))


def test_compact_mapper_bimap():
    from centrifuger_tpu.succinct.mapper import CompactMapper
    ids = np.unique(RNG.integers(0, 100000, size=300))
    m = CompactMapper(ids)
    dense = m.to_compact(ids)
    assert (dense == np.arange(len(ids))).all()
    assert (m.to_orig(dense) == ids).all()
    non = np.setdiff1d(np.arange(1000), ids)[:50]
    assert m.contains(ids[:50]).all()
    assert not m.contains(non).any()


def test_partial_sum_search_brute_force():
    from centrifuger_tpu.succinct.mapper import PartialSum
    lengths = RNG.integers(0, 50, size=200).astype(np.int64)
    lengths[lengths < 5] = 0  # plenty of empty segments
    if lengths.sum() == 0:
        lengths[0] = 7
    ps = PartialSum(lengths)
    cums = np.cumsum(lengths)
    xs = RNG.integers(0, int(cums[-1]), size=500)
    want = np.searchsorted(cums, xs, side="right")
    assert (ps.search(xs) == want).all()
    starts = np.concatenate([[0], cums[:-1]])
    idx = np.flatnonzero(lengths > 0)  # accumulated_sum defined per real start
    assert (ps.accumulated_sum(idx) == starts[idx]).all()


@pytest.mark.parametrize("t", [2, 8, 64])
def test_permutation_inverse(t):
    from centrifuger_tpu.succinct.permutation import Permutation
    n = 500
    pi = RNG.permutation(n)
    p = Permutation(pi, t=t)
    assert (p.next(np.arange(n)) == pi).all()
    inv = np.empty(n, dtype=np.int64)
    inv[pi] = np.arange(n)
    for i in RNG.integers(0, n, size=60):
        assert p.prev(int(i)) == inv[i]


def test_sequence_permutation_brute_force():
    from centrifuger_tpu.succinct.permutation import SequencePermutation
    sigma, n = 23, 1500
    codes = RNG.integers(0, sigma, size=n)
    seq = SequencePermutation(codes, sigma, block=128)
    for i in RNG.integers(0, n, size=40):
        assert seq.access(int(i)) == codes[i]
    for _ in range(40):
        c = int(RNG.integers(0, sigma))
        i = int(RNG.integers(0, n))
        assert seq.rank(c, i) == int((codes[:i + 1] == c).sum())
    for c in range(0, sigma, 5):
        total = int((codes == c).sum())
        if total == 0:
            continue
        k = int(RNG.integers(1, total + 1))
        pos = np.flatnonzero(codes == c)[k - 1]
        assert seq.select(c, k) == pos


def test_inverted_index_brute_force():
    from centrifuger_tpu.succinct.permutation import InvertedIndex
    sigma, n = 9, 2000
    codes = RNG.integers(0, sigma, size=n)
    inv = InvertedIndex(codes, sigma)
    for c in range(sigma):
        pos = np.flatnonzero(codes == c)
        assert inv.count(c) == len(pos)
        ks = np.arange(1, len(pos) + 1)
        assert (inv.posting(c, ks) == pos).all()
        xs = RNG.integers(0, n, size=30)
        want = np.searchsorted(pos, xs, side="right")
        assert (inv.count_upto(c, xs) == want).all()

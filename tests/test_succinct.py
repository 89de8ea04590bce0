"""Randomized brute-force property tests for the succinct layer, mirroring the
reference's compactds/test.cpp style (self-checking round-trips vs brute force)."""

import numpy as np
import pytest

from centrifuger_tpu.succinct.packed import PackedSeq
from centrifuger_tpu.succinct.bitvector import Bitvector


@pytest.mark.parametrize("sigma", [4, 16, 21])
@pytest.mark.parametrize("n", [1, 7, 255, 256, 257, 5000])
def test_packed_rank_access(sigma, n):
    rng = np.random.default_rng(n * 31 + sigma)
    codes = rng.integers(0, sigma, n).astype(np.uint8)
    ps = PackedSeq.from_codes(codes, sigma)
    assert np.array_equal(ps.decode(), codes)
    idx = rng.integers(0, n, 300)
    cs = rng.integers(0, sigma, 300)
    got = ps.rank_inclusive(cs, idx)
    cum = np.cumsum(codes[None, :] == np.arange(sigma)[:, None], axis=1)
    want = cum[cs, idx]
    assert np.array_equal(got, want)
    # scalar path
    assert ps.rank_inclusive(int(cs[0]), int(idx[0])) == want[0]


@pytest.mark.parametrize("n", [1, 31, 32, 33, 255, 256, 1000, 10000])
@pytest.mark.parametrize("p", [0.05, 0.5, 0.95])
def test_bitvector_rank(n, p):
    rng = np.random.default_rng(n + int(p * 100))
    bits = rng.random(n) < p
    bv = Bitvector.from_bits(bits)
    idx = rng.integers(0, n, 200)
    want1 = np.cumsum(bits)[idx]
    got1 = bv.rank1_inclusive(idx)
    assert np.array_equal(got1, want1)
    got0 = bv.rank_inclusive(0, idx)
    assert np.array_equal(got0, idx + 1 - want1)
    assert np.array_equal(bv.access(idx), bits[idx].astype(np.int64))

"""SA-IS vs prefix-doubling vs brute force."""

import numpy as np
import pytest

from centrifuger_tpu.fm.suffix_array import suffix_array, _sais, _suffix_array_doubling


def brute(codes):
    n = len(codes)
    sufs = [tuple(codes[i:]) for i in range(n)]
    return np.array(sorted(range(n), key=lambda i: sufs[i]), dtype=np.int64)


@pytest.mark.parametrize("n,sigma,seed", [(1, 4, 0), (2, 4, 1), (50, 2, 2),
                                          (200, 4, 3), (500, 21, 4),
                                          (1000, 4, 5), (333, 3, 6)])
def test_sais_matches_brute(n, sigma, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, sigma, n).astype(np.uint8)
    want = brute(codes)
    got = _sais(codes, sigma)
    assert got is not None, "native sais should build"
    assert np.array_equal(got, want)
    assert np.array_equal(_suffix_array_doubling(codes), want)


def test_sais_runny():
    rng = np.random.default_rng(9)
    # highly repetitive text stresses LMS naming
    codes = np.concatenate([np.full(rng.integers(1, 30), rng.integers(0, 3),
                                    dtype=np.uint8) for _ in range(100)])
    want = _suffix_array_doubling(codes)
    got = _sais(codes, 4)
    assert np.array_equal(got, want)


def test_sais_large_random():
    rng = np.random.default_rng(10)
    codes = rng.integers(0, 4, 200000).astype(np.uint8)
    assert np.array_equal(_sais(codes, 4), _suffix_array_doubling(codes))

import numpy as np
import pytest

from centrifuger_tpu.fm.runblock import RunBlockSeq, choose_block_size


def runny_codes(rng, n, sigma, mean_run):
    out = []
    while sum(len(x) for x in out) < n:
        out.append(np.full(rng.integers(1, 2 * mean_run), rng.integers(0, sigma), dtype=np.uint8))
    return np.concatenate(out)[:n]


@pytest.mark.parametrize("b", [0, 1, 4, 7, 16, 64])
@pytest.mark.parametrize("mean_run", [1, 3, 20])
def test_runblock_rank_access(b, mean_run):
    rng = np.random.default_rng(b * 100 + mean_run)
    sigma = 4
    n = 3000
    codes = runny_codes(rng, n, sigma, mean_run)
    rb = RunBlockSeq.from_codes(codes, sigma, b=b)
    assert np.array_equal(rb.decode(), codes)
    idx = rng.integers(0, n, 500)
    cs = rng.integers(0, sigma, 500)
    cum = np.cumsum(codes[None, :] == np.arange(sigma)[:, None], axis=1)
    want = cum[cs, idx]
    got = rb.rank_inclusive(cs, idx)
    assert np.array_equal(got, want)


def test_runblock_all_run_and_all_lit():
    codes = np.full(1000, 2, dtype=np.uint8)
    rb = RunBlockSeq.from_codes(codes, 4, b=8)
    assert rb.lit.n == 0
    assert np.array_equal(rb.rank_inclusive(2, np.array([0, 999])), [1, 1000])
    assert np.array_equal(rb.rank_inclusive(1, np.array([500])), [0])

    rng = np.random.default_rng(0)
    codes = (np.arange(1000) % 4).astype(np.uint8)  # no runs
    rb = RunBlockSeq.from_codes(codes, 4, b=8)
    assert rb.run.n == 0
    idx = rng.integers(0, 1000, 100)
    cum = np.cumsum(codes[None, :] == np.arange(4)[:, None], axis=1)
    assert np.array_equal(rb.rank_inclusive(np.zeros(100, dtype=int), idx), cum[0, idx])


def test_choose_block_size_sane():
    rng = np.random.default_rng(1)
    codes = runny_codes(rng, 20000, 4, 30)
    b = choose_block_size(codes, 4)
    assert 2 <= b <= 1536

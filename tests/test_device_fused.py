"""Parity tests: fused device fast path vs host NumPy structures."""

import numpy as np
import pytest

from centrifuger_tpu.testutil import synthetic_fm
from centrifuger_tpu.fm.device import DeviceFM


@pytest.fixture(scope="module")
def fmdev():
    fm, genomes = synthetic_fm(n_genomes=3, genome_len=12000, seed=11)
    return fm, DeviceFM(fm)


def test_fused_rank_sym_parity(fmdev):
    fm, dev = fmdev
    assert dev.fast
    rng = np.random.default_rng(0)
    pos = rng.integers(-1, fm.n, 512).astype(np.int32)
    cs = rng.integers(0, 4, 512).astype(np.int32)
    rank, sym = dev._fused_rank_sym(cs, pos)
    rank = np.asarray(rank)
    sym = np.asarray(sym)
    posc = np.maximum(pos, 0)
    want_rank = np.where(pos < 0, 0, fm.bwt.rank_inclusive(cs, posc))
    want_sym = fm.bwt.access(posc)
    assert np.array_equal(rank, want_rank)
    valid = pos >= 0
    assert np.array_equal(sym[valid], want_sym[valid].astype(np.int64))


def test_fused_backward_extend_parity(fmdev):
    fm, dev = fmdev
    rng = np.random.default_rng(1)
    sp = rng.integers(0, fm.n, 512)
    ep = np.minimum(sp + rng.integers(0, 50, 512), fm.n - 1)
    ep[::7] = sp[::7]  # exercise the sp==ep shortcut
    cs = rng.integers(0, 4, 512)
    nsp, nep = dev.backward_extend(np.asarray(cs, np.int32),
                                   np.asarray(sp, np.int32),
                                   np.asarray(ep, np.int32))
    wsp, wep = fm.backward_extend(cs, sp, ep)
    assert np.array_equal(np.asarray(nsp), wsp)
    assert np.array_equal(np.asarray(nep), wep)
    # include the firstISA row edge cases
    fi = fm.first_isa
    sp2 = np.array([fi, fi, max(fi - 1, 0), fi], dtype=np.int64)
    ep2 = np.array([fi, fi + 5, max(fi - 1, 0), fi], dtype=np.int64)
    cs2 = np.array([fm.last_chr, fm.last_chr, fm.last_chr, (fm.last_chr + 1) % 4])
    nsp, nep = dev.backward_extend(np.asarray(cs2, np.int32),
                                   np.asarray(sp2, np.int32),
                                   np.asarray(ep2, np.int32))
    wsp, wep = fm.backward_extend(cs2, sp2, ep2)
    assert np.array_equal(np.asarray(nsp), wsp)
    assert np.array_equal(np.asarray(nep), wep)


def test_fused_lf_and_resolve_parity(fmdev):
    fm, dev = fmdev
    rng = np.random.default_rng(2)
    rows = rng.integers(0, fm.n, 256)
    got_lf = np.asarray(dev.lf(np.asarray(rows, np.int32)))
    want_lf = fm.lf(rows)
    assert np.array_equal(got_lf, want_lf)
    valid = np.ones(256, bool)
    got = np.asarray(dev.resolve_rows(np.asarray(rows, np.int64), valid))
    want = fm.resolve_rows(rows)
    assert np.array_equal(got, want)

"""Chunked external-memory SA must equal the whole-text SA-IS ordering."""

import numpy as np
import pytest

from centrifuger_tpu.fm.suffix_array import suffix_array

RNG = np.random.default_rng(1234)


def _chunked_sa(codes, sigma, **kw):
    from centrifuger_tpu.fm.sa_external import ChunkedSA
    cs = ChunkedSA(codes, sigma, **kw)
    out = np.empty(len(codes), np.int64)
    for ci, row0, part in cs:
        out[row0:row0 + len(part)] = part
    cs.close()
    return out


@pytest.mark.parametrize("n,dcv,bmax,threads", [
    (1000, 16, 256, 1),
    (5000, 64, 512, 2),
    (20000, 256, 4096, 4),
])
def test_chunked_random_dna(n, dcv, bmax, threads):
    codes = RNG.integers(0, 4, n).astype(np.uint8)
    want = suffix_array(codes, 4)
    got = _chunked_sa(codes, 4, dcv=dcv, bmax=bmax, threads=threads, kprefix=6)
    assert (got == want).all()


def test_chunked_repetitive():
    # highly repetitive text stresses the DC fallback
    base = np.array([0, 1, 2, 3, 0, 0, 1, 1], np.uint8)
    codes = np.tile(base, 800)
    want = suffix_array(codes, 4)
    got = _chunked_sa(codes, 4, dcv=16, bmax=1024, threads=3, kprefix=5)
    assert (got == want).all()


def test_chunked_overweight_kmer():
    # a run of A's makes one k-mer exceed bmax
    codes = np.concatenate([np.zeros(3000, np.uint8),
                            RNG.integers(0, 4, 3000).astype(np.uint8)])
    want = suffix_array(codes, 4)
    got = _chunked_sa(codes, 4, dcv=64, bmax=128, threads=2, kprefix=4)
    assert (got == want).all()


def test_chunked_protein_width():
    codes = RNG.integers(0, 22, 4000).astype(np.uint8)
    want = suffix_array(codes, 22)
    got = _chunked_sa(codes, 22, dcv=64, bmax=512, threads=2, kprefix=3)
    assert (got == want).all()


def test_checkpoint_resume(tmp_path):
    codes = RNG.integers(0, 4, 8000).astype(np.uint8)
    want = suffix_array(codes, 4)
    pre = str(tmp_path / "ck")
    from centrifuger_tpu.fm.sa_external import ChunkedSA
    # first run: stop after the DC phase checkpoint
    cs = ChunkedSA(codes, 4, dcv=64, bmax=1024, threads=2, kprefix=5,
                   checkpoint_prefix=pre)
    it = iter(cs)
    next(it)  # forces DC init + checkpoint + first chunk
    cs.close()
    # resume: DC ranks must load from disk (verified by monkey blocking init)
    cs2 = ChunkedSA(codes, 4, dcv=64, bmax=1024, threads=2, kprefix=5,
                    checkpoint_prefix=pre)
    def _no_init(*a):  # the shared CDLL must not be mutated; patch instance
        raise AssertionError("dc_init called despite checkpoint")
    cs2.lib = type("L", (), {k: getattr(cs2.lib, k) for k in
                             ("sac_destroy", "sac_v", "sac_dc_load",
                              "sac_kmer_hist", "sac_sort_chunks")}
                   | {"sac_dc_init": staticmethod(_no_init)})()
    out = np.empty(len(codes), np.int64)
    for ci, row0, part in cs2:
        out[row0:row0 + len(part)] = part
    cs2.close()
    assert (out == want).all()

    # mid-build resume: start at an arbitrary chunk index
    cs3 = ChunkedSA(codes, 4, dcv=64, bmax=1024, threads=2, kprefix=5,
                    checkpoint_prefix=pre)
    for ci, row0, part in cs3.iter_chunks(start_chunk=3):
        assert (out[row0:row0 + len(part)] == part).all()
    cs3.close()

"""Sharded-index mode must match the replicated path exactly, while holding
only ~1/D of the big tables per chip (virtual 8-device CPU mesh).

Covers the SURVEY §2.6 P4 contract: global (sp, ep) interval arithmetic
(reference compactds/FMIndex.hpp:364-379) preserved under row-sharding with
all_gather + psum_scatter request routing (parallel/sharded.py).
"""

import numpy as np
import pytest
import jax

from centrifuger_tpu.testutil import synthetic_fm, sample_reads
from centrifuger_tpu.fm.device import DeviceFM
from centrifuger_tpu.parallel.mesh import make_mesh
from centrifuger_tpu.parallel.sharded import ShardedIndex
from centrifuger_tpu.utils import make_encode_table, COMP_TABLE

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs virtual multi-device")


def _fixture():
    fm, genomes = synthetic_fm(n_genomes=3, genome_len=9000, seed=13)
    dev = DeviceFM(fm)
    reads = sample_reads(genomes, 16, 100, seed=14)
    return dev, reads


def _codes(reads, B=32, L=128):
    enc = make_encode_table("ACGT")
    codes = np.full((B, L), 255, np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        c = enc[r]
        codes[2 * i, :len(c)] = c
        lengths[2 * i] = len(c)
        rc = enc[COMP_TABLE[r][::-1]]
        codes[2 * i + 1, :len(rc)] = rc
        lengths[2 * i + 1] = len(rc)
    return codes, lengths


@needs_mesh
def test_sharded_chain_matches_replicated_and_shards_memory():
    dev, reads = _fixture()
    codes, lengths = _codes(reads)
    want = dev.chain_search(codes, lengths, 23, 8)
    for D in (2, 8):
        sh = ShardedIndex(dev, make_mesh(n_devices=D), axis="dp")
        got = sh.chain_search(codes, lengths, 23, 8)
        for k in ("nhits", "sp", "ep", "l", "off"):
            assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), (D, k)
        # the memory contract: per-chip addressable bytes of the sharded
        # tables ~= total / D (pad rows only)
        per_chip, total = sh.per_chip_bytes()
        assert per_chip <= total / D * 1.05 + 4096, (D, per_chip, total)


@needs_mesh
def test_sharded_fused_classify_bit_identical():
    dev, reads = _fixture()
    L = 128
    U = 16
    raw = np.zeros((U, L), np.uint8)
    rl = np.zeros(U, np.int32)
    for i, r in enumerate(reads):
        raw[i, :len(r)] = np.frombuffer(bytes(r), np.uint8)
        rl[i] = len(r)
    mhl = 23
    H = L // (mhl + 1) + 1
    want = dev.fused_classify(raw, rl, 1, mhl, H, 1, 40, 8, U * 8)
    for D in (2, 8):
        sh = ShardedIndex(dev, make_mesh(n_devices=D), axis="dp")
        got = sh.fused_classify(raw, rl, 1, mhl, H, 1, 40, 8, U * 8)
        for k in ("packed", "hits", "nhits"):
            assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), (D, k)


@needs_mesh
def test_sharded_engine_end_to_end(tmp_path_factory):
    """ClassifierFused with a ShardedIndex as its device must produce the
    same results as with the replicated DeviceFM (sharded serving,
    engine-integrated)."""
    import os
    from conftest import FIXTURE_DIR
    from test_golden_classify import get_index
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches

    prefix = get_index("tiny", tmp_path_factory)
    fm, tax, seqlen, meta = load_index(prefix)
    fq = os.path.join(FIXTURE_DIR, "tiny", "reads_1.fq")
    _, queries = next(iter_fastq_batches(fq, 64))

    cl_rep = ClassifierFused(fm, tax, ClassifierParam())
    want = cl_rep.query_batch(queries)
    sh = ShardedIndex(cl_rep.dev, make_mesh(n_devices=8), axis="dp")
    cl_sh = ClassifierFused(fm, tax, ClassifierParam(), dev=sh)
    got = cl_sh.query_batch(queries)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        assert (w.score, w.secondary_score, w.hit_length, w.tax_ids,
                w.seq_names) == \
               (g.score, g.secondary_score, g.hit_length, g.tax_ids,
                g.seq_names)


@needs_mesh
def test_sharded_resolve_routed():
    """The LF-walk/rowmap resolve itself routes through the sharded tables."""
    dev, _ = _fixture()
    rows = np.arange(0, dev.n, 97, dtype=np.int64)[:64]
    valid = np.ones(len(rows), bool)
    want = np.asarray(dev.resolve_rows(rows, valid))
    sh = ShardedIndex(dev, make_mesh(n_devices=8), axis="dp")
    got = np.asarray(sh.resolve_rows(rows, valid))
    assert np.array_equal(got, want)

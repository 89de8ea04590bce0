"""Sharded-index serving at REAL scale (round-4 verdict weak #8): the
300 Mnt bench index under ShardedIndex on the 8-device virtual CPU mesh.

The toy-table dryrun asserts the sharding math; this catches what it cannot
— per-chip bytes of a multi-10-MB serving table actually ~ total/D, and the
full fused classification bit-identical to the replicated path on reads
against a real-scale index.  Gated (CFR_SLOW_TESTS=1): loading the big index
and running the fused program on CPU takes minutes."""

import glob
import os

import numpy as np
import pytest

SLOW = os.environ.get("CFR_SLOW_TESTS", "") == "1"
BIG_DIRS = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache", "bigdb_*nt")))

pytestmark = pytest.mark.skipif(
    not SLOW or not BIG_DIRS
    or not os.path.exists(os.path.join(BIG_DIRS[-1], "ouridx.fm.npz")),
    reason="set CFR_SLOW_TESTS=1 (and build the big bench DB via "
           "tools/make_big_bench.py)")


def test_sharded_big_index_parity_and_memory():
    import jax
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.fm.device import DeviceFM
    from centrifuger_tpu.parallel.mesh import make_mesh
    from centrifuger_tpu.parallel.sharded import ShardedIndex
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam

    big = BIG_DIRS[-1]
    fm, tax, seqlen, meta = load_index(os.path.join(big, "ouridx"))
    assert fm.n >= 100_000_000
    cl = ClassifierFused(fm, tax, ClassifierParam())
    dev = cl.dev
    mhl = cl.param.min_hit_len

    U = 256   # one small batch: CPU chain search at 300 Mnt costs minutes
    ids, queries = next(iter_fastq_batches(os.path.join(big, "reads.fq"), U))
    L = 128
    raw = np.zeros((U, L), np.uint8)
    rl = np.zeros(U, np.int32)
    for i, (r1, _) in enumerate(queries):
        raw[i, :len(r1)] = r1
        rl[i] = len(r1)
    H = L // (mhl + 1) + 1

    want = np.asarray(dev.fused_classify(
        raw, rl, 1, mhl, H, 1, 40, 8, U * 8)["packed"])
    assert (want[:, 0] > 0).mean() > 0.5, "workload sanity: most reads classify"

    D = 8
    sh = ShardedIndex(dev, make_mesh(n_devices=D), axis="dp")
    got = np.asarray(sh.fused_classify(
        raw, rl, 1, mhl, H, 1, 40, 8, U * 8)["packed"])
    assert np.array_equal(got, want), \
        "sharded big-index classify != replicated"

    per_chip, total = sh.per_chip_bytes()
    assert total > 50_000_000, "big tables expected (serving table + SA)"
    assert per_chip <= total / D * 1.05 + 65536, \
        "per-chip bytes %d not ~ total/D (%d/%d)" % (per_chip, total, D)

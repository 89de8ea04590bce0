"""Sharded-index chain search must match the replicated path exactly
(virtual 8-device CPU mesh)."""

import numpy as np
import pytest
import jax

from centrifuger_tpu.testutil import synthetic_fm, sample_reads
from centrifuger_tpu.fm.device import DeviceFM
from centrifuger_tpu.parallel.mesh import make_mesh
from centrifuger_tpu.parallel.sharded import ShardedChainSearch
from centrifuger_tpu.utils import make_encode_table, COMP_TABLE


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual multi-device")
def test_sharded_chain_matches_replicated():
    fm, genomes = synthetic_fm(n_genomes=3, genome_len=9000, seed=13)
    dev = DeviceFM(fm)
    reads = sample_reads(genomes, 16, 100, seed=14)
    enc = make_encode_table("ACGT")
    B, L = 32, 128
    codes = np.full((B, L), 255, np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        c = enc[r]
        codes[2 * i, :len(c)] = c
        lengths[2 * i] = len(c)
        rc = enc[COMP_TABLE[r][::-1]]
        codes[2 * i + 1, :len(rc)] = rc
        lengths[2 * i + 1] = len(rc)

    want = dev.chain_search(codes, lengths, 23, 8)
    mesh = make_mesh(n_devices=8)
    sh = ShardedChainSearch(dev, mesh, axis="dp")
    got = sh.chain_search(codes, lengths, 23, 8)
    for k in ("nhits", "sp", "ep", "l", "off"):
        assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k

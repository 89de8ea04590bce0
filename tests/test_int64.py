"""64-bit index-position path (n >= 2^31).

The reference indexes every position/rank with size_t (reference
compactds/Utils.hpp, FMIndex.hpp); our device kernels select
idtype=int64 for big n (fm/device.py).  jnp silently truncates int64 arrays
to int32 unless jax_enable_x64 is set, so DeviceFM must enable it itself —
this was a silent-degrade bug for three rounds.  Runs in a subprocess because
the x64 flag is process-global.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r'''
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import sys
sys.path.insert(0, sys.argv[1])
assert not jax.config.jax_enable_x64
import jax.numpy as jnp
from centrifuger_tpu.testutil import synthetic_fm, sample_reads
from centrifuger_tpu.fm.device import DeviceFM
from centrifuger_tpu.utils import make_encode_table, COMP_TABLE

fm, genomes = synthetic_fm(n_genomes=3, genome_len=9000, seed=21)
enc = make_encode_table("ACGT")
reads = sample_reads(genomes, 16, 100, seed=22)
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
rows = np.arange(0, fm.n, 37, dtype=np.int64)[:64]
va = np.ones(64, bool)

dev32 = DeviceFM(fm)
assert dev32.idtype == jnp.int32
a = {k: np.asarray(v) for k, v in dev32.chain_search(codes, lengths, 23, 8).items()}
ra = np.asarray(dev32.resolve_rows(rows, va))

dev64 = DeviceFM(fm, force_idtype="int64")
assert jax.config.jax_enable_x64, "DeviceFM did not enable x64 for int64"
assert dev64.idtype == jnp.int64
assert np.asarray(dev64.psum).dtype == np.int64, \
    "int64 index arrays silently degraded to int32"
b = {k: np.asarray(v) for k, v in dev64.chain_search(codes, lengths, 23, 8).items()}
rb = np.asarray(dev64.resolve_rows(rows, va))

for k in ("nhits", "sp", "ep", "l", "off"):
    assert np.array_equal(a[k], b[k]), k
assert np.array_equal(ra, rb), "resolve mismatch int32 vs int64"
print("INT64-PARITY-OK")
'''


def test_int64_forced_parity():
    out = subprocess.run([sys.executable, "-c", SCRIPT, REPO],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "INT64-PARITY-OK" in out.stdout

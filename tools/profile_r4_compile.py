"""Compile-time and runtime check for the chain loop at different unroll
factors, plus the full fused program. Run on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "db5000000_r100000_l100")

from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.classify.device_engine import encode_dna_device
from centrifuger_tpu.fm.device import DeviceFM

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
cl = ClassifierFused(fm, tax, ClassifierParam())
cl.bucket_q = 8192
ids, queries = next(iter_fastq_batches(os.path.join(CACHE, "reads.fq"), 8192))
reads, lengths, nr, Q0, Q, L = cl._pack_reads(queries)
mhl = cl.param.min_hit_len
H = L // (mhl + 1) + 1
dev = cl.dev
enc = jax.jit(encode_dna_device)
cf, cr = enc(reads, jnp.asarray(lengths, jnp.int32))
codes = jnp.stack([cf, cr], 1).reshape(-1, L)
lanelens = jnp.repeat(jnp.asarray(lengths, jnp.int32), 2)
np.asarray(codes[:2])

for unroll in (1, 2):
    DeviceFM.CHAIN_UNROLL = unroll
    dev._jit_cache.pop(("chain", mhl, H), None)
    t0 = time.time()
    out = dev.chain_search(codes, lanelens, mhl, H)
    np.asarray(out["nhits"])[:4]
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = dev.chain_search(codes, lanelens, mhl, H)
        np.asarray(out["nhits"])[:4]
    dt = (time.time() - t0) / 5
    print("unroll=%d: compile %.1fs  run+64KBpull %.4fs" % (unroll, tc, dt),
          flush=True)

# full fused with the best unroll
DeviceFM.CHAIN_UNROLL = 2
r_cap = Q * cl.U_CAP
key = ("fusedcls", nr, mhl, H, cl.param.max_result,
       cl.param.max_result_per_hit_factor, cl.K_OUT, r_cap)
dev._jit_cache.pop(key, None)
t0 = time.time()
full = dev.fused_classify(reads, lengths, nr, mhl, H, cl.param.max_result,
                          cl.param.max_result_per_hit_factor, cl.K_OUT, r_cap)
np.asarray(full["packed"])[:4]
print("fused (unroll=2) compile: %.1fs" % (time.time() - t0), flush=True)
t0 = time.time()
for _ in range(5):
    full = dev.fused_classify(reads, lengths, nr, mhl, H, cl.param.max_result,
                              cl.param.max_result_per_hit_factor, cl.K_OUT,
                              r_cap)
    np.asarray(full["packed"])[:4]
print("fused run+pull: %.4fs" % ((time.time() - t0) / 5), flush=True)

"""Split device time: chain search vs resolve LF-walk, on bench fixture."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "db5000000_r100000_l100")

from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_jax import ClassifierJax
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.readers import ReadFiles

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
cl = ClassifierJax(fm, tax, ClassifierParam())
rf = ReadFiles()
rf.add_read_file(os.path.join(CACHE, "reads.fq"))
queries = [(np.frombuffer(r.seq.encode(), np.uint8), None) for r in rf]
B = 8192
batch = queries[:B]

raws1 = [q[0] for q in batch]
codes, lengths = cl._encode_lanes(raws1)
t0 = time.time(); out = cl._chain_search_codes(codes, lengths); t_chain_c = time.time() - t0
hsp, hep, hlv, hoff, nh = out

# build the flat row set exactly like query_batch does (approx: all hits, capped rows)
import jax
# timing: chain only
for _ in range(3):
    t0 = time.time()
    out2 = cl.dev.chain_search(codes, lengths, cl.param.min_hit_len, hsp.shape[1])
    jax.block_until_ready(out2["nhits"])
    print("chain: %.3fs" % (time.time() - t0))

# typical resolve load: sum over hits of min(range, k*hitk)
k = cl.param.max_result
cap = k * cl.param.max_result_per_hit_factor
rng = np.minimum(hep - hsp + 1, cap)
mask = np.arange(hsp.shape[1])[None] < nh[:, None]
nrows = int(np.where(mask, rng, 0).sum())
print("rows to resolve: %d (%.1f per lane)" % (nrows, nrows / len(codes)))

rows = np.random.randint(0, cl.dev.n, size=nrows).astype(np.int64)
r = cl._resolve_batch_rows(rows)  # warm (bucket size)
for _ in range(3):
    t0 = time.time()
    r = cl._resolve_batch_rows(rows)
    print("resolve: %.3fs" % (time.time() - t0))

# encode timing
for _ in range(2):
    t0 = time.time()
    cl._encode_lanes(raws1)
    print("encode: %.3fs" % (time.time() - t0))

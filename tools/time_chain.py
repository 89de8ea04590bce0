"""Quick timing of chain_search + resolve_rows on the bench fixture."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "db5000000_r100000_l100")
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_jax import ClassifierJax
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.utils import COMP_TABLE
from centrifuger_tpu.io.readers import ReadFiles

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
cl = ClassifierJax(fm, tax, ClassifierParam())
dev = cl.dev
rf = ReadFiles(); rf.add_read_file(os.path.join(CACHE, "reads.fq"))
reads = []
for r in rf:
    reads.append(np.frombuffer(r.seq.encode(), np.uint8))
    if len(reads) >= 8192: break

B = int(os.environ.get("TB", 16384)); L = 128
codes = np.full((B, L), 255, np.uint8)
lengths = np.zeros(B, np.int32)
for j in range(B):
    raw = reads[(j // 2) % len(reads)]
    c = cl.encode[raw] if j % 2 == 0 else cl.encode[COMP_TABLE[raw][::-1]]
    codes[j, :len(c)] = c
    lengths[j] = len(c)
mhl = cl.param.min_hit_len
H = L // (mhl + 1) + 1

out = dev.chain_search(codes, lengths, mhl, H)
np.asarray(out["nhits"])
t0 = time.time()
N = 5
for _ in range(N):
    out = dev.chain_search(codes, lengths, mhl, H)
jax.block_until_ready(out["nhits"])
dt = (time.time() - t0) / N
print("chain B=%d: %.2f ms (%.0f lanes/s, %.0f reads/s)" % (B, dt*1e3, B/dt, B/2/dt))

# resolve timing
M = 65536
rows = np.random.randint(0, dev.n - 2, M).astype(np.int64)
valid = np.ones(M, bool)
h = dev.resolve_rows(rows, valid)
np.asarray(h)
t0 = time.time()
for _ in range(N):
    h = dev.resolve_rows(rows, valid)
jax.block_until_ready(h)
dt = (time.time() - t0) / N
print("resolve M=%d: %.2f ms (%.1f Mrows/s)" % (M, dt*1e3, M/dt/1e6))

"""Time the fused classify program on the bench fixture (TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "db5000000_r100000_l100")
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.readers import ReadFiles

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
cl = ClassifierFused(fm, tax, ClassifierParam())
rf = ReadFiles(); rf.add_read_file(os.path.join(CACHE, "reads.fq"))
queries = [(np.frombuffer(r.seq.encode(), np.uint8), None) for r in rf]
print("loaded", len(queries))
B = int(os.environ.get("FB", 8192))

t0 = time.time()
res = cl.query_batch(queries[:B])
print("first batch (compile+run): %.1f s" % (time.time() - t0))
print("classified in batch:", sum(1 for r in res if r.tax_ids), "stats:", cl.stats)

# sequential query_batch
t0 = time.time()
n = 0
for i in range(0, 4 * B, B):
    res = cl.query_batch(queries[i:i + B])
    n += sum(1 for r in res if r.tax_ids)
dt = time.time() - t0
print("sequential: %.0f reads/s (%d classified)" % (4 * B / dt, n))

# pipelined over the whole set
t0 = time.time()
n = 0
batches = (queries[i:i + B] for i in range(0, len(queries), B))
for res in cl.query_pipelined(batches):
    n += sum(1 for r in res if r.tax_ids)
dt = time.time() - t0
print("pipelined full: %.0f reads/s (%.2f s, %d/%d classified)" %
      (len(queries) / dt, dt, n, len(queries)))
print("stats:", cl.stats)

"""Profile the end-to-end classification path on the cached bench fixture."""
import cProfile
import os
import pstats
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
nb = int(os.environ.get("NB", 4))

# warm
cl.query_batch(queries[:B])
cl.query_batch(queries[-(len(queries) % B or B):])

t0 = time.time()
for i in range(nb):
    cl.query_batch(queries[i * B:(i + 1) * B])
print("e2e: %.0f reads/s" % (nb * B / (time.time() - t0)))
print("stats:", cl.stats)

pr = cProfile.Profile()
pr.enable()
for i in range(nb):
    cl.query_batch(queries[i * B:(i + 1) * B])
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(35)

import os, sys, time, glob
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
big = sorted(glob.glob("/root/repo/.bench_cache/bigdb_*nt"))[-1]
from centrifuger_tpu.build import load_index
fm, tax, seqlen, meta = load_index(big + "/ouridx")
from centrifuger_tpu.fm.device import DeviceFM
dev = DeviceFM(fm)
M = 65536
rng = np.random.default_rng(1)
rows = jnp.asarray(rng.integers(0, fm.n-1, M).astype(np.int32))
va = jnp.ones(M, bool)

def walkstats(s, r, v):
    CK = 512
    def body(i, carry):
        cur, pend, hist = carry
        pend = pend & ~s._sample_stored_here(cur)
        hist = hist.at[i].set(pend.sum())
        nxt = s.lf(jnp.where(pend, cur, 0))
        return (jnp.where(pend, nxt, cur), pend, hist)
    _, pend, hist = lax.fori_loop(0, CK, body,
                                  (r, v, jnp.zeros(512, jnp.int32)))
    return hist
f = dev._jitted("walkstats", walkstats)
h = np.asarray(f(dev.arrs, rows, va))
for k in (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 511):
    print("pending after %3d steps: %6d (%.4f%%)" % (k, h[k], 100.0*h[k]/M), flush=True)
print("max walk < 512: %s (pending at 511 = %d)" % (h[511] == 0, h[511]))

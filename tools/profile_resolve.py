"""Bisect why dev.resolve_rows is 242ms while its body probes at ~1us/iter."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "db5000000_r100000_l100")
from centrifuger_tpu.build import load_index
from centrifuger_tpu.fm.device import DeviceFM

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
dev = DeviceFM(fm)
M = 65536
rows64 = np.random.randint(0, dev.n - 2, M).astype(np.int64)
valid = np.ones(M, bool)
arrs = dev.arrs

def timeit(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    print("%-40s %9.2f ms" % (name, (time.time() - t0) / 3 * 1e3))
    return r

# v0: the real thing
timeit("v0 real resolve_rows", lambda: dev.resolve_rows(rows64, valid))

# v1: direct jit of the impl, int32 inputs already on device
rows_d = jnp.asarray(rows64.astype(np.int32))
valid_d = jnp.asarray(valid)
@jax.jit
def v1(arrs, rows, valid):
    return dev._bind(arrs)._resolve_rows_impl(rows, valid)
timeit("v1 direct jit impl, device int32", v1, arrs, rows_d, valid_d)

# v2: with iteration counter (max iters?)
@jax.jit
def v2(arrs, rows, valid):
    d = dev._bind(arrs)
    def cond(st):
        i, cur, pending, out = st
        return jnp.any(pending)
    def body(st):
        i, cur, pending, out = st
        found, val = d.get_sampled_sa(cur)
        newly = pending & found
        out = jnp.where(newly, val, out)
        pending = pending & (~found)
        nxt = d.lf(jnp.where(pending, cur, 0))
        cur = jnp.where(pending, nxt, cur)
        return i + 1, cur, pending, out
    rows = rows.astype(d.idtype)
    st = lax.while_loop(cond, body, (0, rows, valid, jnp.zeros_like(rows)))
    return st[0], st[3]
r = timeit("v2 while with iter counter", v2, arrs, rows_d, valid_d)
print("   iterations executed:", int(r[0]))

import time, sys
import numpy as np, jax, jax.numpy as jnp
from jax import lax
key = jax.random.PRNGKey(0)

@jax.jit
def _nop(x): return x + 1

def timed(f, *args, reps=3):
    float(f(*args))
    best = 1e18
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time()-t0)
    return best

float(_nop(jnp.zeros(())))
lat = min(timed(_nop, jnp.zeros(()), reps=5), 0.05)
print("lat %.3fs" % lat, flush=True)

def dep(nrow, w, B=32768, niter=100, sort=False, idt=jnp.int32):
    table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
    idx0 = jax.random.randint(key, (B,), 0, nrow, idt)
    @jax.jit
    def f(table, idx):
        def body(i, idx):
            ix = jnp.sort(idx) if sort else idx
            rows = table[ix]
            return (rows[:, 0] ^ rows[:, w - 1]).astype(idt) % nrow
        return lax.fori_loop(0, niter, body, idx).sum()
    t = timed(f, table, idx0) - lat
    print("dep [%9d x %3d] (%7.1f MB) %s%s: %7.2f us/it %6.1f Mrow/s %6.2f GB/s"
          % (nrow, w, nrow*w*4/1e6, "sorted " if sort else "",
             "i64" if idt==jnp.int64 else "", t*1e6/niter, B*niter/t/1e6,
             B*w*4*niter/t/1e9), flush=True)
    del table

MB = 256*1024*1024
for w in (8, 16, 24, 32, 64, 128):
    dep(MB//(4*w), w)
# locality: sorted indices each step
dep(MB//(4*21), 21, sort=True)
# int64 indices
jax.config.update("jax_enable_x64", True)
dep(MB//(4*21), 21, idt=jnp.int64)
print("done", flush=True)

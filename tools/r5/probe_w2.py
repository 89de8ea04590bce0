import time
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

def dep(nrow, w, B=65536, niter=100, swar=False):
    table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
    idx0 = jax.random.randint(key, (B,), 0, nrow, jnp.int32)
    @jax.jit
    def f(table, idx):
        def body(i, idx):
            rows = table[idx]
            if swar:
                # full rank-style SWAR popcount over 120 data words
                wd = rows[:, 5:125]
                c2 = (rows[:, 0] & 3).astype(jnp.uint32)
                x = ~(wd ^ (c2 * jnp.uint32(0x55555555))[:, None])
                m = x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
                j = jnp.arange(120, dtype=jnp.int32)[None, :]
                upto = (idx % 1920)[:, None]
                nb = (jnp.clip(upto - 16 * j, 0, 16) * 2).astype(jnp.uint32)
                mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                                 (jnp.uint32(1) << jnp.minimum(nb, 31)) - jnp.uint32(1))
                cnt = jnp.sum(lax.population_count(m & mask), axis=1, dtype=jnp.int32)
                return (cnt + rows[:, 1].astype(jnp.int32)) % nrow
            return (rows[:, 0] ^ rows[:, w - 1]).astype(jnp.int32) % nrow
        return lax.fori_loop(0, niter, body, idx).sum()
    t = timed(f, table, idx0) - lat
    print("dep [%9d x %3d] (%7.1f MB) B=%6d%s: %8.2f us/it %6.1f Mrow/s"
          % (nrow, w, nrow*w*4/1e6, B, " +swar" if swar else "",
             t*1e6/niter, B*niter/t/1e6), flush=True)
    del table

dep(156250, 128)             # 300Mnt serving table shape
dep(156250, 128, swar=True)  # with the real rank compute
dep(2**20, 128)              # bigger table
dep(2**21, 69)               # non-pow2 width > 64
dep(2**21, 72)
dep(2**20, 133)
dep(2**20, 136)
dep(156250, 128, B=16384)
print("done", flush=True)

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
def dep(nrow, w, B, niter=100, split=1):
    table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
    idx0 = jax.random.randint(key, (B,), 0, nrow, jnp.int32)
    @jax.jit
    def f(table, idx):
        def body(i, idx):
            if split > 1:
                outs = []
                for s in range(split):
                    rows = table[idx[s*(B//split):(s+1)*(B//split)]]
                    outs.append((rows[:, 0] ^ rows[:, w - 1]).astype(jnp.int32))
                return jnp.concatenate(outs) % nrow
            rows = table[idx]
            return (rows[:, 0] ^ rows[:, w - 1]).astype(jnp.int32) % nrow
        return lax.fori_loop(0, niter, body, idx).sum()
    t = timed(f, table, idx0) - lat
    print("dep [%8d x %3d] B=%6d split=%d: %8.2f us/it %6.1f Mrow/s"
          % (nrow, w, B, split, t*1e6/niter, B*niter/t/1e6), flush=True)
    del table
for B in (16384, 32768, 49152, 65536, 131072):
    dep(156250, 128, B)
dep(156250, 128, 65536, split=2)
dep(156250, 128, 131072, split=4)
dep(524288, 128, 32768)
print("done", flush=True)

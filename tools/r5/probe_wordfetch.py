import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
key = jax.random.PRNGKey(0)
@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat=1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat,time.time()-t0)
def timed(f, *a):
    float(f(*a)); best=1e9
    for _ in range(3):
        t0=time.time(); float(f(*a)); best=min(best,time.time()-t0)
    return best-lat

NFLAT = 16384 * 129          # pk-table scale
B = 16384
NITER = 200
flat = jax.random.randint(key, (NFLAT,), 0, 1 << 30, jnp.int32)
idx0 = jax.random.randint(key, (B,), 0, NFLAT, jnp.int32)

# (a) plain narrow gather
@jax.jit
def narrow(flat, idx):
    def body(i, idx):
        v = flat[idx]
        return (idx + v) % NFLAT
    return lax.fori_loop(0, NITER, body, idx).sum()
print("narrow 1-word: %7.2f us/it" % (timed(narrow, flat, idx0)*1e6/NITER), flush=True)

# (b) wide-row fetch + column select
R = (NFLAT + 127) // 128
pad = jnp.zeros(R * 128, jnp.int32).at[:NFLAT].set(flat).reshape(R, 128)
@jax.jit
def widesel(tab, idx):
    j = jnp.arange(128, dtype=jnp.int32)[None, :]
    def body(i, idx):
        row = tab[idx >> 7]
        col = idx & 127
        v = jnp.sum(jnp.where(j == col[:, None], row, 0), axis=1)
        return (idx + v) % NFLAT
    return lax.fori_loop(0, NITER, body, idx).sum()
print("wide-row+select: %7.2f us/it" % (timed(widesel, pad, idx0)*1e6/NITER), flush=True)

# (c) wide-row with take_along_axis select
@jax.jit
def widetaa(tab, idx):
    def body(i, idx):
        row = tab[idx >> 7]
        v = jnp.take_along_axis(row, (idx & 127)[:, None], axis=1)[:, 0]
        return (idx + v) % NFLAT
    return lax.fori_loop(0, NITER, body, idx).sum()
print("wide-row+taa:    %7.2f us/it" % (timed(widetaa, pad, idx0)*1e6/NITER), flush=True)

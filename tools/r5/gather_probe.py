import time, sys, jax, jax.numpy as jnp, numpy as np
from jax import lax

key = jax.random.PRNGKey(0)

@jax.jit
def nop(x): return x + 1
float(nop(jnp.zeros(())))
lat = 1e9
for _ in range(5):
    t0 = time.time(); float(nop(jnp.zeros(()))); lat = min(lat, time.time()-t0)
print("scalar fetch latency: %.1f ms" % (lat*1e3), flush=True)

def bench_dep(nrow, w, B, niter):
    t0 = time.time()
    table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
    idx0 = jax.random.randint(key, (B,), 0, nrow, jnp.int32)
    @jax.jit
    def dep(table, idx):
        def body(i, idx):
            rows = table[idx]
            return (rows[:, 0] ^ rows[:, w - 1]).astype(jnp.int32) % nrow
        idx = lax.fori_loop(0, niter, body, idx)
        return idx.sum()
    float(dep(table, idx0))  # warm/compile
    print("  [compile+warm %.1fs]" % (time.time()-t0), flush=True)
    best = 1e9
    for _ in range(2):
        t0 = time.time(); float(dep(table, idx0)); best = min(best, time.time()-t0)
    t_ms = best*1e3 - lat*1e3
    gbps = B * w * 4 * niter / (t_ms/1e3) / 1e9
    print("dep gather [%8d x %2d] u32 (%6.1f MB) B=%6d x%4d: %8.2f ms  %6.2f us/iter  %7.2f GB/s" %
          (nrow, w, nrow*w*4/1e6, B, niter, t_ms, t_ms*1e3/niter, gbps), flush=True)

for nrow in (19532, 262144, 1<<20, 1<<22, 1<<23):
    bench_dep(nrow, 21, 32768, 100)
# batch-size sweep at big-table size
for B in (8192, 65536, 131072):
    bench_dep(1<<22, 21, B, 100)

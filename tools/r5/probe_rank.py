"""Fetch-timed probes of the serving hot op on the real chip.

`jax.block_until_ready` is a NO-OP under the axon tunnel (measured: a 1.1
TFLOP matmul "completes" in 0.2 ms, but fetching one scalar of it takes the
true ~8.5 ms/matmul); every timing here therefore forces a VALUE FETCH and
subtracts the measured fetch latency.  Work per timed call is sized so the
kernel time dominates the ~1 s tunnel round trip.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

key = jax.random.PRNGKey(0)


def timed(f, *args, reps=3):
    float(f(*args))          # warm (compile + first fetch)
    best = 1e18
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        best = min(best, time.time() - t0)
    return best


@jax.jit
def _nop(x):
    return x + 1


def fetch_latency():
    lat = timed(_nop, jnp.zeros(()), reps=5)
    print("fetch latency: %.3f s" % lat, flush=True)
    return lat


def dep_gather(nrow, w, B, niter, lat):
    table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
    idx0 = jax.random.randint(key, (B,), 0, nrow, jnp.int32)

    @jax.jit
    def dep(table, idx):
        def body(i, idx):
            rows = table[idx]
            return (rows[:, 0] ^ rows[:, w - 1]).astype(jnp.int32) % nrow
        return lax.fori_loop(0, niter, body, idx).sum()

    t = timed(dep, table, idx0) - lat
    print("dep   [%8d x %2d] (%7.1f MB) B=%6d x%4d: %7.1f ms %7.2f us/it "
          "%7.1f Mrow/s %6.2f GB/s"
          % (nrow, w, nrow * w * 4 / 1e6, B, niter, t * 1e3,
             t * 1e6 / niter, B * niter / t / 1e6, B * w * 4 * niter / t / 1e9),
          flush=True)
    del table
    return t


def oneshot_gather(nrow, w, M, lat):
    table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
    idx = jax.random.randint(key, (M,), 0, nrow, jnp.int32)

    @jax.jit
    def one(table, idx):
        return table[idx].sum(dtype=jnp.uint32)

    t = timed(one, table, idx) - lat
    print("1shot [%8d x %2d] (%7.1f MB) M=%8d: %7.1f ms %7.1f Mrow/s %6.2f GB/s"
          % (nrow, w, nrow * w * 4 / 1e6, M, t * 1e3, M / t / 1e6,
             M * w * 4 / t / 1e9), flush=True)
    del table
    return t


def main():
    lat = fetch_latency()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dep"):
        # table-size sweep at the serving shape (21-word fused rows)
        for nrow in (19532, 1 << 20, 1 << 22):
            dep_gather(nrow, 21, 32768, 100, lat)
        # batch-size sweep at big-table size
        for B in (8192, 131072, 524288):
            dep_gather(1 << 20, 21, B, 100, lat)
    if which in ("all", "oneshot"):
        oneshot_gather(1 << 20, 21, 1 << 22, lat)
        oneshot_gather(1 << 22, 21, 1 << 22, lat)
    print("done", flush=True)


if __name__ == "__main__":
    main()

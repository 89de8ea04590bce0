"""Microbenchmark: per-iteration cost of the FM chain-search step shapes.

WARNING (round 5): the timings printed by THIS file are invalid on the
tunneled serving device — `jax.block_until_ready` is a no-op there and
returns before the computation runs (see tools/COMPILE_NOTES.md #4).  The
fetch-timed probes in tools/r5/ supersede these; this file is kept for the
minor-axis-gather finding (#3 in COMPILE_NOTES), which was CPU-verified.

The fused chain search runs ~L lockstep while_loop iterations; each does
  (a) a [B]-row gather from the pre_flat table ([B*(L+1), 4] int32)
  (b) a [2B]-row gather of 84-byte fused rows (21 uint32)
  (c) ~40 fused elementwise ops on [2B, 16] uint32
This measures each piece and a Pallas variant with the fused-row table
VMEM-resident, to find the speed-of-light for one iteration.
"""

import os
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    B = 32768            # 2 * (2 * 8192) boundary lanes
    NROW = 19532         # 5e6 / 256 fused rows
    NITER = 100
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (NROW, 21), 0, 1 << 30, jnp.uint32)
    idx0 = jax.random.randint(key, (B,), 0, NROW, jnp.int32)

    # (1) dependent gather chain: idx -> rows -> idx
    @jax.jit
    def dep_gather(table, idx):
        def body(i, idx):
            rows = table[idx]
            nxt = (rows[:, 0] ^ rows[:, 20]).astype(jnp.int32) % NROW
            return nxt
        return lax.fori_loop(0, NITER, body, idx)

    t = timeit(dep_gather, table, idx0)
    print("XLA dependent gather [%d x 21 u32] x %d iters: %.3f ms  (%.1f us/iter, %.2f GB/s)"
          % (B, NITER, t * 1e3, t * 1e6 / NITER, B * 84 * NITER / t / 1e9))

    # (2) gather + SWAR-rank-like elementwise per iteration
    @jax.jit
    def gather_swar(table, idx):
        def body(i, idx):
            rows = table[idx]
            w = rows[:, 5:21]
            c2 = (rows[:, 0] & 3).astype(jnp.uint32)
            x = ~(w ^ (c2 * jnp.uint32(0x55555555))[:, None])
            m = x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
            j16 = jnp.arange(16, dtype=jnp.int32)[None, :]
            upto = (idx & 255)[:, None]
            nb = (jnp.clip(upto - 16 * j16, 0, 16) * 2).astype(jnp.uint32)
            mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << jnp.minimum(nb, 31)) - jnp.uint32(1))
            cnt = jnp.sum(lax.population_count(m & mask), axis=1, dtype=jnp.int32)
            nxt = (cnt + rows[:, 1].astype(jnp.int32)) % NROW
            return nxt
        return lax.fori_loop(0, NITER, body, idx)

    t = timeit(gather_swar, table, idx0)
    print("XLA gather+SWAR x %d iters: %.3f ms  (%.1f us/iter)"
          % (NITER, t * 1e3, t * 1e6 / NITER))

    # (3) while_loop overhead: elementwise only on [B]
    @jax.jit
    def ew_only(idx):
        def body(i, idx):
            return (idx * 1103515245 + 12345) % NROW
        return lax.fori_loop(0, NITER, body, idx)

    t = timeit(ew_only, idx0)
    print("XLA elementwise-only loop x %d iters: %.3f ms (%.1f us/iter)"
          % (NITER, t * 1e3, t * 1e6 / NITER))

    # (4) Pallas: table resident in VMEM, whole dependent loop inside kernel
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(table_ref, idx_ref, out_ref):
            tab = table_ref[:]          # [NROWP, 21+pad] in VMEM
            def body(i, idx):
                rows = tab[idx]         # vectorized dynamic gather from VMEM
                nxt = (rows[:, 0] ^ rows[:, 20]).astype(jnp.int32) % NROW
                return nxt
            out_ref[:] = lax.fori_loop(0, NITER, body, idx_ref[:])

        NROWP = ((NROW + 7) // 8) * 8
        tpad = jnp.zeros((NROWP, 24), jnp.uint32).at[:NROW, :21].set(table)

        @jax.jit
        def pallas_dep(table, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx)

        t = timeit(pallas_dep, tpad, idx0)
        print("Pallas VMEM-table dependent gather x %d iters: %.3f ms (%.1f us/iter)"
              % (NITER, t * 1e3, t * 1e6 / NITER))
    except Exception as e:
        print("Pallas variant failed: %r" % (e,))

    # (5) XLA one-shot big gather (no loop) for reference bandwidth
    big_idx = jax.random.randint(key, (B * NITER,), 0, NROW, jnp.int32)

    @jax.jit
    def oneshot(table, idx):
        return table[idx].sum(dtype=jnp.uint32)

    t = timeit(oneshot, table, big_idx)
    print("XLA one-shot gather of %d rows: %.3f ms (%.2f GB/s)"
          % (B * NITER, t * 1e3, B * NITER * 84 / t / 1e9))


if __name__ == "__main__":
    main()


def big_table():
    B = 16384
    key = jax.random.PRNGKey(1)
    for nrow, w in ((8 << 20, 4), (1 << 20, 4), (8 << 20, 21), (64 << 10, 21), (256 << 10, 21), (1 << 20, 21)):
        table = jax.random.randint(key, (nrow, w), 0, 1 << 30, jnp.uint32)
        idx0 = jax.random.randint(key, (B,), 0, nrow, jnp.int32)

        @jax.jit
        def dep(table, idx):
            def body(i, idx):
                rows = table[idx]
                return (rows[:, 0] ^ rows[:, w - 1]).astype(jnp.int32) % nrow
            return lax.fori_loop(0, 100, body, idx)

        t = timeit(dep, table, idx0)
        print("dep gather from [%7d x %d] u32 (%5.1f MB): %7.3f ms (%6.1f us/iter)"
              % (nrow, w, nrow * w * 4 / 1e6, t * 1e3, t * 1e6 / 100))


if __name__ == "__main__" and os.environ.get("BIG"):
    big_table()

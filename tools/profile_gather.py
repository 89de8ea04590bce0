"""Gather-lowering shootout with HARD sync (np.asarray), dependent chains.

Variants gather rows for M indices over NI iterations with a serial dep:
  a: table [R, 21] u32, x = t[idx]            (current layout)
  b: table [R, 32] u32 padded pow2
  c: table [R, 128] u32 padded to tile width
  d: 21 element-gathers from column arrays [R]
  e: flat element gather: t.reshape(-1)[idx*21 + j] for j in 0..20
  f: jnp.take(t, idx, axis=0)
  g: table [R, 8, 128]? no - v1 keep a..f
Report ms/iter and effective GB/s on the 84 logical bytes.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax import lax

R = 19532
M = int(os.environ.get("M", 131072))
NI = 64
rng = np.random.default_rng(0)
tab = jnp.asarray(rng.integers(0, 2**32, (R, 21), dtype=np.uint64).astype(np.uint32))
idx0 = jnp.asarray(rng.integers(0, R, M).astype(np.int32))

def bench(name, fn, *args):
    out = fn(*args)
    np.asarray(out)          # hard sync incl. compile
    t0 = time.time()
    out = fn(*args)
    s = np.asarray(out)      # hard sync
    dt = time.time() - t0
    per = dt / NI
    print("%-34s %8.2f ms total  %7.0f us/iter  %6.1f GB/s" %
          (name, dt * 1e3, per * 1e6, M * 84 / per / 1e9))

def chain(body):
    def f(t, idx):
        def step(i, st):
            idx, acc = st
            s = body(t, idx)
            idx = (s % jnp.uint32(R)).astype(jnp.int32)
            return idx, acc + s
        idx, acc = lax.fori_loop(0, NI, step, (idx, jnp.zeros(M, jnp.uint32)))
        return acc[:8]
    return jax.jit(f)

# a: row gather [R,21]
bench("a rows [R,21]", chain(lambda t, idx: jnp.sum(t[idx], axis=1, dtype=jnp.uint32)), tab, idx0)

# b: padded 32
tab32 = jnp.zeros((R, 32), jnp.uint32).at[:, :21].set(tab)
bench("b rows [R,32]", chain(lambda t, idx: jnp.sum(t[idx], axis=1, dtype=jnp.uint32)), tab32, idx0)

# c: padded 128
tab128 = jnp.zeros((R, 128), jnp.uint32).at[:, :21].set(tab)
bench("c rows [R,128]", chain(lambda t, idx: jnp.sum(t[idx], axis=1, dtype=jnp.uint32)), tab128, idx0)

# d: column arrays
cols = tuple(tab[:, j] for j in range(21))
def d_body(cols, idx):
    s = jnp.zeros(idx.shape, jnp.uint32)
    for c in cols:
        s = s + c[idx]
    return s
def d_fn(cols, idx):
    def step(i, st):
        idx, acc = st
        s = d_body(cols, idx)
        idx = (s % jnp.uint32(R)).astype(jnp.int32)
        return idx, acc + s
    idx, acc = lax.fori_loop(0, NI, step, (idx, jnp.zeros(M, jnp.uint32)))
    return acc[:8]
bench("d 21 column gathers", jax.jit(d_fn), cols, idx0)

# e: flat strided element gathers
flat = tab.reshape(-1)
def e_body(flat, idx):
    base = idx * 21
    s = jnp.zeros(idx.shape, jnp.uint32)
    for j in range(21):
        s = s + flat[base + j]
    return s
def e_fn(flat, idx):
    def step(i, st):
        idx, acc = st
        s = e_body(flat, idx)
        idx = (s % jnp.uint32(R)).astype(jnp.int32)
        return idx, acc + s
    idx, acc = lax.fori_loop(0, NI, step, (idx, jnp.zeros(M, jnp.uint32)))
    return acc[:8]
bench("e flat strided elem", jax.jit(e_fn), flat, idx0)

# f: jnp.take
bench("f take axis0 [R,21]", chain(lambda t, idx: jnp.sum(jnp.take(t, idx, axis=0), axis=1, dtype=jnp.uint32)), tab, idx0)

# g: single element gather (the floor: 4B/lane)
one = tab[:, 0]
def g_fn(one, idx):
    def step(i, st):
        idx, acc = st
        s = one[idx]
        idx = (s % jnp.uint32(R)).astype(jnp.int32)
        return idx, acc + s
    idx, acc = lax.fori_loop(0, NI, step, (idx, jnp.zeros(M, jnp.uint32)))
    return acc[:8]
bench("g single elem gather", jax.jit(g_fn), one, idx0)

"""Decisive loop-structure probes: what does one while/fori iteration cost?

All on the real fused table. B=65536 lanes.
  a) fori NI=100 vs NI=400 trivial body (is per-iter cost real & linear?)
  b) fori NI=100 body = _plain_lf (the resolve inner op)
  c) fori NI=100 body = full resolve body (lf + get_sampled_sa + wheres)
  d) while_loop version of (c) capped at 100 iters
  e) searchsorted alone in a loop
"""
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
B = 65536
pos0 = jnp.asarray(np.random.randint(0, dev.n - 2, B).astype(np.int32))
arrs = dev.arrs

def timeit(name, fn, *args, ni=100):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 3
    print("%-36s %9.2f ms  (%7.2f us/iter)" % (name, dt * 1e3, dt / ni * 1e6))

# a) trivial fori at two trip counts
for NI in (100, 400):
    @jax.jit
    def a(pos, _ni=NI):
        def body(i, st):
            pos, acc = st
            pos = (pos * 1103515245 + 12345) & jnp.int32(0x3FFFFF)
            return pos, acc ^ pos
        return lax.fori_loop(0, _ni, body, (pos, jnp.zeros_like(pos)))
    timeit("a trivial fori NI=%d" % NI, a, pos0, ni=NI)

# b) _plain_lf in fori
@jax.jit
def b(arrs, pos):
    d = dev._bind(arrs)
    def body(i, pos):
        return jnp.clip(d._plain_lf(pos), 0, d.n - 2)
    return lax.fori_loop(0, 100, body, pos)
timeit("b lf-only fori NI=100", b, arrs, pos0)

# c) full resolve body in fori (fixed trip)
@jax.jit
def c(arrs, pos):
    d = dev._bind(arrs)
    def body(i, st):
        cur, pending, out = st
        found, val = d.get_sampled_sa(cur)
        newly = pending & found
        out = jnp.where(newly, val, out)
        pending = pending & (~found)
        nxt = d.lf(jnp.where(pending, cur, 0))
        cur = jnp.where(pending, nxt, cur)
        return cur, pending, out
    return lax.fori_loop(0, 100, body,
                         (pos, jnp.ones(B, bool), jnp.zeros(B, jnp.int32)))
timeit("c resolve-body fori NI=100", c, arrs, pos0)

# d) same as while_loop (real cond)
@jax.jit
def d_(arrs, pos):
    d = dev._bind(arrs)
    def cond(st):
        i, cur, pending, out = st
        return (i < 100) & jnp.any(pending)
    def body(st):
        i, cur, pending, out = st
        found, val = d.get_sampled_sa(cur)
        newly = pending & found
        out = jnp.where(newly, val, out)
        pending = pending & (~found)
        nxt = d.lf(jnp.where(pending, cur, 0))
        cur = jnp.where(pending, nxt, cur)
        return i + 1, cur, pending, out
    return lax.while_loop(cond, body,
                          (0, pos, jnp.ones(B, bool), jnp.zeros(B, jnp.int32)))
timeit("d resolve-body while<=100", d_, arrs, pos0)

# e) searchsorted in fori
sel = dev.sel_rows
@jax.jit
def e(sel, pos):
    def body(i, st):
        pos, acc = st
        p = jnp.searchsorted(sel, pos)
        pos = (pos * 7 + 1) & jnp.int32(0x3FFFFF)
        return pos, acc + p.astype(jnp.int32)
    return lax.fori_loop(0, 100, body, (pos, jnp.zeros_like(pos)))
timeit("e searchsorted fori NI=100", e, sel, pos0)

# f) get_sampled_sa alone
@jax.jit
def f(arrs, pos):
    d = dev._bind(arrs)
    def body(i, st):
        pos, acc = st
        found, val = d.get_sampled_sa(pos)
        pos = (pos * 7 + 1) & jnp.int32(0x3FFFFF)
        return pos, acc + val
    return lax.fori_loop(0, 100, body, (pos, jnp.zeros_like(pos)))
timeit("f get_sampled_sa fori NI=100", f, arrs, pos0)

"""Isolate the cost of one fused-rank step: gather vs SWAR vs loop overhead.

Probes (all fori_loop, fixed 100 iterations, B=32768 unless noted):
  g0: gather only, independent indices (bandwidth ceiling for row gathers)
  g1: gather only, serially dependent indices (latency-bound chain)
  r0: gather + vector-form SWAR rank (dependent)
  r1: current unrolled _plain_rank_sym (dependent)   [compare]
  g2: gather with 32-padded rows
  g3: gather with 128-word rows (6 fused rows packed per 128-word row)
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
table = dev.plain_rows              # [R, 21] uint32
R = table.shape[0]
print("platform:", jax.devices()[0].platform, " table:", table.shape)

B = 32768
NI = 100
pos0 = jnp.asarray(np.random.randint(0, dev.n - 2, B).astype(np.int32))
idx0 = (pos0 + 1) >> 8

def timeit(name, fn, *args, bytes_per_iter=None):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(5):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 5
    extra = ""
    if bytes_per_iter:
        extra = "  %.1f GB/s" % (bytes_per_iter * NI / dt / 1e9)
    print("%-28s %8.2f ms  (%6.2f us/iter)%s" % (name, dt * 1e3, dt / NI * 1e6, extra))
    return dt

# --- g0: independent gathers ---
@jax.jit
def g0(table, idx):
    def body(i, acc):
        rows = table[(idx + i * 7919) % R]
        return acc + jnp.sum(rows, dtype=jnp.uint32)
    return lax.fori_loop(0, NI, body, jnp.uint32(0))
timeit("g0 gather indep [B,21]", g0, table, idx0, bytes_per_iter=B * 84)

# --- g1: dependent gathers ---
@jax.jit
def g1(table, idx):
    def body(i, st):
        idx, acc = st
        rows = table[idx]
        s = jnp.sum(rows, axis=1, dtype=jnp.uint32)
        idx = (s % jnp.uint32(R)).astype(jnp.int32)
        return idx, acc + s
    idx, acc = lax.fori_loop(0, NI, body, (idx, jnp.zeros(B, jnp.uint32)))
    return acc
timeit("g1 gather dep   [B,21]", g1, table, idx0, bytes_per_iter=B * 84)

# --- r0: vector-form SWAR rank (dependent) ---
def rank_vec(table, c, pos):
    pos1 = pos + 1
    row = table[pos1 >> 8]                      # [B, 21]
    c2 = c.astype(jnp.uint32)
    base = jnp.take_along_axis(row[:, :4], c[:, None], axis=1)[:, 0].astype(jnp.int32)
    upto = (pos1 & 255).astype(jnp.int32)
    w = row[:, 5:21]                            # [B, 16]
    pattern = (c2 * jnp.uint32(0x55555555))[:, None]
    x = ~(w ^ pattern)
    m = x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    take = jnp.clip(upto[:, None] - jnp.arange(16, dtype=jnp.int32)[None, :] * 16, 0, 16)
    nb = (take * 2).astype(jnp.uint32)
    mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.minimum(nb, 31)) - jnp.uint32(1))
    cnt = jnp.sum(lax.population_count(m & mask & jnp.uint32(0x55555555)), axis=1,
                  dtype=jnp.int32)
    in_row = pos - ((pos1 >> 8) << 8)
    widx = jnp.clip(in_row >> 4, 0, 15)
    wsym = jnp.where(in_row[:, None] < 0, row[:, 4:5],
                     jnp.take_along_axis(w, widx[:, None], axis=1))[:, 0]
    sym = ((wsym >> ((pos & 15).astype(jnp.uint32) * 2)) & jnp.uint32(3)).astype(jnp.int32)
    return jnp.where(pos < 0, 0, base + cnt), sym

@jax.jit
def r0(table, pos):
    def body(i, st):
        pos, acc = st
        c = (pos & 3).astype(jnp.int32)
        r, sym = rank_vec(table, c, pos)
        pos = (r * 131071 + sym) % (dev.n - 2)
        return pos, acc + r
    pos, acc = lax.fori_loop(0, NI, body, (pos, jnp.zeros(B, jnp.int32)))
    return acc
timeit("r0 rank vec-SWAR dep", r0, table, pos0, bytes_per_iter=B * 84)

# --- r1: current unrolled rank (dependent) ---
arrs = dev.arrs
@jax.jit
def r1(arrs, pos):
    d = dev._bind(arrs)
    def body(i, st):
        pos, acc = st
        c = (pos & 3).astype(jnp.int32)
        r, sym = d._fused_rank_sym(c, pos)
        pos = (r * 131071 + sym) % (d.n - 2)
        return pos, acc + r
    pos, acc = lax.fori_loop(0, NI, body, (pos, jnp.zeros(B, jnp.int32)))
    return acc
timeit("r1 rank unrolled dep", r1, arrs, pos0, bytes_per_iter=B * 84)

# --- g2: 32-padded rows ---
tab32 = jnp.zeros((R, 32), jnp.uint32).at[:, :21].set(table)
@jax.jit
def g2(tab, idx):
    def body(i, st):
        idx, acc = st
        rows = tab[idx]
        s = jnp.sum(rows, axis=1, dtype=jnp.uint32)
        idx = (s % jnp.uint32(R)).astype(jnp.int32)
        return idx, acc + s
    idx, acc = lax.fori_loop(0, NI, body, (idx, jnp.zeros(B, jnp.uint32)))
    return acc
timeit("g2 gather dep   [B,32]", g2, tab32, idx0, bytes_per_iter=B * 128)

# --- g3: 128-word packed rows (6 fused rows per row) ---
R6 = -(-R // 6)
tab128 = np.zeros((R6, 128), np.uint32)
tflat = np.asarray(table).reshape(-1)
for k in range(6):
    lo = k * 21
    # rows k, k+6, ... go to cols [21k, 21k+21)
    src = np.asarray(table)[k::6]
    tab128[:len(src), lo:lo + 21] = src
tab128 = jnp.asarray(tab128)
@jax.jit
def g3(tab, idx):
    def body(i, st):
        idx, acc = st
        rows = tab[idx // 6]                   # [B, 128]
        sub = (idx % 6) * 21
        cols = sub[:, None] + jnp.arange(21, dtype=jnp.int32)[None, :]
        rows21 = jnp.take_along_axis(rows, cols, axis=1)
        s = jnp.sum(rows21, axis=1, dtype=jnp.uint32)
        idx = (s % jnp.uint32(R)).astype(jnp.int32)
        return idx, acc + s
    idx, acc = lax.fori_loop(0, NI, body, (idx, jnp.zeros(B, jnp.uint32)))
    return acc
timeit("g3 gather dep [B,128]->21", g3, tab128, idx0, bytes_per_iter=B * 512)

# --- s0: loop-body overhead floor: no gather, just elementwise ---
@jax.jit
def s0(pos):
    def body(i, st):
        pos, acc = st
        pos = (pos * 131071 + 7) % (dev.n - 2)
        return pos, acc + pos
    pos, acc = lax.fori_loop(0, NI, body, (pos, jnp.zeros(B, jnp.int32)))
    return acc
timeit("s0 loop floor (no gather)", s0, pos0)

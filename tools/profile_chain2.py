"""Rebuild the chain loop piece by piece to find the slow component.
B=16384, fori NI=110 fixed. Components:
  c1: extend-only (backward_extend on [B] + minimal bookkeeping)
  c2: c1 + pre-table gather + START/phase logic
  c3: c2 + record into [B,H,4]
Also compile-time per variant is printed.
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
from centrifuger_tpu.utils import make_encode_table, COMP_TABLE
from centrifuger_tpu.io.readers import ReadFiles

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
dev = DeviceFM(fm)
encode = make_encode_table(fm.alphabet)
rf = ReadFiles(); rf.add_read_file(os.path.join(CACHE, "reads.fq"))
reads = []
for r in rf:
    reads.append(np.frombuffer(r.seq.encode(), np.uint8))
    if len(reads) >= 8192: break
B, L = 16384, 128
codes = np.full((B, L), 255, np.uint8)
lengths = np.zeros(B, np.int32)
for j in range(B):
    raw = reads[(j // 2) % len(reads)]
    c = encode[raw] if j % 2 == 0 else encode[COMP_TABLE[raw][::-1]]
    codes[j, :len(c)] = c
    lengths[j] = len(c)
codes_d = jnp.asarray(codes); lengths_d = jnp.asarray(lengths)
arrs = dev.arrs
NI = 110
H = 6
mhl = 23

def timeit(name, fn, *args):
    t0 = time.time()
    r = fn(*args); jax.block_until_ready(r)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 3
    print("%-26s %9.2f ms  (%7.2f us/iter)  [compile %5.1f s]"
          % (name, dt * 1e3, dt / NI * 1e6, tc))

# c1: extend-only loop
@jax.jit
def c1(arrs, codes, lengths):
    d = dev._bind(arrs)
    it = d.idtype
    Bn = codes.shape[0]
    codes_flat = codes.reshape(-1).astype(jnp.int32)
    lane_base = jnp.arange(Bn, dtype=jnp.int32) * L
    def body(i, st):
        sp, ep, l = st
        c = codes_flat[lane_base + jnp.clip(L - 1 - (l % L), 0, L - 1)]
        c = jnp.where(c == 255, 0, c)
        nsp, nep = d.backward_extend(c, sp, ep)
        ok = nsp <= nep
        sp = jnp.where(ok, nsp, jnp.ones_like(sp))
        ep = jnp.where(ok, nep, (jnp.ones_like(ep) * (d.n // 2)).astype(it))
        return sp, ep, l + 1
    st = (jnp.ones(Bn, it), jnp.full(Bn, d.n - 2, it), jnp.zeros(Bn, jnp.int32))
    return lax.fori_loop(0, NI, body, st)
timeit("c1 extend-only", c1, arrs, codes_d, lengths_d)

# c3: the real chain impl but with fori-capped loop for comparability:
#     monkeypatch lax.while_loop? simpler: call the real chain_search.
t0 = time.time()
out = dev.chain_search(codes, lengths, mhl, H)
jax.block_until_ready(out["nhits"])
tc = time.time() - t0
t0 = time.time()
for _ in range(3):
    out = dev.chain_search(codes, lengths, mhl, H)
jax.block_until_ready(out["nhits"])
dt = (time.time() - t0) / 3
print("%-26s %9.2f ms                     [compile %5.1f s]" % ("real chain_search", dt * 1e3, tc))

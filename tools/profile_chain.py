"""Profile the device chain-search kernel: where does time go?

Experiments:
  1. chain_search wall time vs batch size (overhead- vs bandwidth-bound?)
  2. raw fused-rank gather loop at fixed trip count (roofline probe)
  3. while_loop iteration count distribution
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
from centrifuger_tpu.classify.engine_jax import ClassifierJax
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.utils import COMP_TABLE
from centrifuger_tpu.io.readers import ReadFiles

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
cl = ClassifierJax(fm, tax, ClassifierParam())
dev = cl.dev
print("platform:", jax.devices()[0].platform)
print("n =", dev.n, "plain_rows:", None if dev.plain_rows is None else dev.plain_rows.shape,
      dev.plain_rows.dtype if dev.plain_rows is not None else "")

rf = ReadFiles(); rf.add_read_file(os.path.join(CACHE, "reads.fq"))
reads = []
for r in rf:
    reads.append(np.frombuffer(r.seq.encode(), np.uint8))
    if len(reads) >= 16384: break

def make_batch(B):
    L = 128
    codes = np.full((B, L), 255, np.uint8)
    lengths = np.zeros(B, np.int32)
    for j in range(B):
        raw = reads[(j // 2) % len(reads)]
        c = cl.encode[raw] if j % 2 == 0 else cl.encode[COMP_TABLE[raw][::-1]]
        codes[j, :len(c)] = c
        lengths[j] = len(c)
    return codes, lengths

mhl = cl.param.min_hit_len
H = 128 // (mhl + 1) + 1
print("mhl =", mhl, "H =", H)

# --- experiment 1: scaling with B ---
for B in (2048, 4096, 8192, 16384, 32768):
    codes, lengths = make_batch(B)
    out = dev.chain_search(codes, lengths, mhl, H)
    np.asarray(out["nhits"])  # warm/compile
    t0 = time.time()
    for _ in range(3):
        out = dev.chain_search(codes, lengths, mhl, H)
    np.asarray(out["nhits"])
    dt = (time.time() - t0) / 3
    print("chain B=%6d: %7.2f ms  (%8.0f lanes/s)" % (B, dt * 1e3, B / dt))

# --- experiment 2: fixed-trip fused-rank loop (roofline probe) ---
B = 16384
codes, lengths = make_batch(B)
arrs = dev.arrs
key = jax.random.PRNGKey(0)

def probe(arrs, pos0, n_iter):
    d = dev._bind(arrs)
    def body(i, st):
        pos, acc = st
        c = (pos & 3).astype(jnp.int32)
        r, sym = d._fused_rank_sym(c, pos)
        # dependent chain: next position derived from rank (forces serialization)
        pos = (r * 2654435761 + sym) % (d.n - 2)
        return pos, acc + r
    return lax.fori_loop(0, n_iter, body, (pos0, jnp.zeros_like(pos0)))

for NI in (100,):
    for BB in (16384, 32768, 65536):
        pos0 = jnp.asarray(np.random.randint(0, dev.n - 2, BB).astype(np.int32))
        f = jax.jit(probe, static_argnums=2)
        r = f(arrs, pos0, NI); jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(3):
            r = f(arrs, pos0, NI)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 3
        bytes_g = BB * NI * 84  # one fused row gather per rank
        print("rank-probe B=%6d iters=%3d: %7.2f ms  -> %6.2f GB/s eff, %7.1f ns/rank"
              % (BB, NI, dt * 1e3, bytes_g / dt / 1e9, dt / (BB * NI) * 1e9))

# --- experiment 3: while_loop trip count ---
codes, lengths = make_batch(16384)
# instrument: replicate the loop bound host-side via numpy chains
out = dev.chain_search(codes, lengths, mhl, H)
nh = np.asarray(out["nhits"])
print("nhits: mean %.2f max %d" % (nh.mean(), nh.max()))
# count: rem consumed per iteration... estimate iterations as sum over lanes of chain steps
l = np.asarray(out["l"]); off = np.asarray(out["off"])
# iterations = per lane: sum over chains (1 start + l-pw extends) approx
est = (nh + np.maximum(l - 10, 0).sum(axis=1) / 1).astype(int)
print("est per-lane steps: mean %.1f p99 %d max %d" %
      (est.mean(), np.percentile(est, 99), est.max()))

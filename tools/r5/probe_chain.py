import os, sys, time, glob
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
big = sorted(glob.glob("/root/repo/.bench_cache/bigdb_*nt"))[-1]
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.classify.device_engine import decode_packed_dna

fm, tax, seqlen, meta = load_index(big + "/ouridx")
cl = ClassifierFused(fm, tax, ClassifierParam())
cl.bucket_q = 8192
dev = cl.dev
for _, queries in iter_fastq_batches(big + "/reads.fq", 8192):
    reads, lengths = cl._pack_reads(queries)[:2]
    break
mhl = cl.param.min_hit_len
L = reads[0].shape[1] * 4
H = L // (mhl + 1) + 1
U = reads[0].shape[0]

@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat=1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat,time.time()-t0)

# count while rounds by running the loop with an added counter
def counted(s, rd, ln):
    pack2, vmask = rd
    cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
    codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
    lls = jnp.repeat(ln.astype(jnp.int32), 2)
    # replicate _chain_search_noftab_impl loop count: patch via counting cond evals
    B = codes.shape[0]
    it = s.idtype
    # reuse impl but wrap _loop_any to count: do a manual port instead — simpler:
    # run impl and ALSO compute max total steps = sum over lanes? Instead count
    # rounds via a shadow run: we re-run step-by-step with fori over K and find
    # when all rem < mhl.
    codes_flat = codes.astype(jnp.int32).reshape(-1)
    return None
# simpler: count rounds by instrumenting rem directly
def rounds(s, rd, ln, K=256):
    pack2, vmask = rd
    cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
    codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
    lls = jnp.repeat(ln.astype(jnp.int32), 2)
    import centrifuger_tpu.fm.device as dv
    # monkey: run noftab impl body step function manually K times, record active counts
    # (cheap approximation: reuse impl with CHAIN_UNROLL=1 and a history)
    B, L2 = codes.shape
    mhl_ = mhl
    # inline minimal state tracking using the real step via _chain_search_noftab_impl is hard;
    # approximate: count = max over lanes of length (all ~100) + chains... measure instead.
    return None

# just time the real chain at UNROLL 2 vs 4 vs 8
for UN in (2, 4, 8):
    type(dev).CHAIN_UNROLL = UN
    def traced(s, rd, ln):
        pack2, vmask = rd
        cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
        codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
        lls = jnp.repeat(ln.astype(jnp.int32), 2)
        chh = s._chain_search_impl(codes, lls, mhl, H)
        return chh["nhits"].sum()
    f = dev._jitted(("probe_chain_un", UN), traced)
    t0=time.time(); float(f(dev.arrs, tuple(reads), lengths)); tc = time.time()-t0
    best=1e9
    for _ in range(3):
        t0=time.time(); float(f(dev.arrs, tuple(reads), lengths)); best=min(best,time.time()-t0)
    print("UNROLL=%d: chain %.3fs (compile+first %.1fs)" % (UN, best-lat, tc), flush=True)
type(dev).CHAIN_UNROLL = 2
print("done", flush=True)

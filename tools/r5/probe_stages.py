"""Stage-by-stage timing of fused_classify on the big DB: where do the
~36 ms of 'other' (non-chain, non-resolve) go?"""
import os, sys, time, glob
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.classify import device_engine as de

big = sorted(glob.glob("/root/repo/.bench_cache/bigdb_*nt"))[-1]
fm, tax, seqlen, meta = load_index(big + "/ouridx")
cl = ClassifierFused(fm, tax, ClassifierParam())
cl.bucket_q = 8192
dev = cl.dev
for _, queries in iter_fastq_batches(big + "/reads.fq", 8192):
    reads, lengths = cl._pack_reads(queries)[:2]
    break
mhl = cl.param.min_hit_len
L = reads[0].shape[1] * 4
U = reads[0].shape[0]
H = L // (mhl + 1) + 1

@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat = 1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat,time.time()-t0)

def t3(f, *a):
    float(f(*a)); best=1e9
    for _ in range(3):
        t0=time.time(); float(f(*a)); best=min(best,time.time()-t0)
    return best-lat

# stage A: decode+strands+chain
def stage_a(s, rd, ln):
    pack2, vmask = rd
    cf, cr = de.decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
    codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
    lls = jnp.repeat(ln.astype(jnp.int32), 2)
    ch = s._chain_search_impl(codes, lls, mhl, H)
    return ch["nhits"].sum() + ch["sp"].sum() + ch["l"].sum()
fa = dev._jitted("st_a", stage_a)
print("A decode+chain: %.3fs" % t3(fa, dev.arrs, tuple(reads), lengths), flush=True)

# full program
def full(s, rd, ln):
    out = de.fused_classify(s, rd, ln, 1, mhl, H, 1, 40, 8, U * 8)
    return out["packed"].sum()
ff = dev._jitted("st_full", full)
print("FULL fused: %.3fs" % t3(ff, dev.arrs, tuple(reads), lengths), flush=True)

# resolve in isolation at the real width
M = U * 8
rng = np.random.default_rng(1)
rows = jnp.asarray(rng.integers(0, fm.n-1, M).astype(np.int32))
va = jnp.ones(M, bool)
fr = dev._jitted("st_res", lambda s, r, v: s._resolve_rows_impl(r, v).sum())
print("resolve(65k): %.3fs" % t3(fr, dev.arrs, rows, va), flush=True)

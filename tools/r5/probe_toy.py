import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.classify.device_engine import decode_packed_dna

CACHE = "/root/repo/.bench_cache/db5000000_r100000_l100"
fm, tax, seqlen, meta = load_index(CACHE + "/ouridx")
cl = ClassifierFused(fm, tax, ClassifierParam())
cl.bucket_q = 8192
dev = cl.dev
packs = []
for _, queries in iter_fastq_batches(CACHE + "/reads.fq", 8192):
    packs.append(cl._pack_reads(queries)[:2])
reads, lengths = packs[0]
mhl = cl.param.min_hit_len
L = reads[0].shape[1] * 4
H = L // (mhl + 1) + 1
U = reads[0].shape[0]
print("toy n=%d mhl=%d rowmap=%s" % (fm.n, mhl, dev.rowmap is not None), flush=True)

@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat=1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat,time.time()-t0)
print("lat %.3f" % lat, flush=True)

def t3(fn):
    fn()
    best=1e9
    for _ in range(3):
        t0=time.time(); fn(); best=min(best,time.time()-t0)
    return best-lat

# full fused per batch
def full():
    out = dev.fused_classify(reads, lengths, 1, mhl, H, 1, 40, cl.K_OUT, U * cl.U_CAP)
    np.asarray(out["packed"])
print("fused 1batch: %.3fs -> %.0f r/s" % (t3(full), U/t3(full)), flush=True)

# chain only
def traced(s, rd, ln):
    pack2, vmask = rd
    cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
    codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
    lls = jnp.repeat(ln.astype(jnp.int32), 2)
    return s._chain_search_impl(codes, lls, mhl, H)["nhits"].sum()
f = dev._jitted("ptoy_chain", traced)
tc = t3(lambda: float(f(dev.arrs, tuple(reads), lengths)))
print("chain only: %.3fs" % tc, flush=True)

# resolve only (rowmap)
M = U * cl.U_CAP
rng = np.random.default_rng(1)
rows = jnp.asarray(rng.integers(0, fm.n-1, M).astype(np.int32))
va = jnp.ones(M, bool)
fr = dev._jitted("ptoy_res", lambda s, r, v: s._resolve_rows_impl(r, v).sum())
print("resolve only: %.3fs" % t3(lambda: float(fr(dev.arrs, rows, va))), flush=True)

# all 13 batches back-to-back (the bench's device number)
def allb():
    for rd, ln in packs:
        out = dev.fused_classify(rd, ln, 1, mhl, H, 1, 40, cl.K_OUT, U * cl.U_CAP)
    np.asarray(out["packed"])
ta = t3(allb)
n = sum(p[0][0].shape[0] for p in packs)
print("all %d batches: %.3fs -> %.0f reads/s" % (len(packs), ta, n/ta), flush=True)

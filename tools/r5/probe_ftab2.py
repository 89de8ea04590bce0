import os, sys, time, glob
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.classify.device_engine import decode_packed_dna

@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat=1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat,time.time()-t0)

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

def codes_of(s, rd, ln):
    pack2, vmask = rd
    cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
    codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
    lls = jnp.repeat(ln.astype(jnp.int32), 2)
    return codes, lls

# (a) precompute tables only
def pre_only(s, rd, ln):
    codes, lls = codes_of(s, rd, ln)
    kfull, tailvalid = s._precompute_read_tables(codes)
    kc = jnp.clip(kfull, 0, s.ftab_len.shape[0] - 1)
    p_flen = s.ftab_len[kc]
    p_fsp = s.ftab_start[kc]
    return (p_flen.astype(jnp.int32).sum() + p_fsp.astype(jnp.int32).sum()
            + tailvalid.sum())
f = dev._jitted("pf_pre", pre_only)
t0=time.time(); float(f(dev.arrs, tuple(reads), lengths))
best=1e9
for _ in range(3):
    t0=time.time(); float(f(dev.arrs, tuple(reads), lengths)); best=min(best,time.time()-t0)
print("precompute+ftab-gather only: %.3fs" % (best-lat), flush=True)

# (b) without the big ftab gathers (kfull/tailvalid only)
def pre_only2(s, rd, ln):
    codes, lls = codes_of(s, rd, ln)
    kfull, tailvalid = s._precompute_read_tables(codes)
    return kfull.astype(jnp.int32).sum() + tailvalid.sum()
f = dev._jitted("pf_pre2", pre_only2)
float(f(dev.arrs, tuple(reads), lengths))
best=1e9
for _ in range(3):
    t0=time.time(); float(f(dev.arrs, tuple(reads), lengths)); best=min(best,time.time()-t0)
print("kfull/tailvalid only: %.3fs" % (best-lat), flush=True)

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

def run(prefix, fq, name):
    fm, tax, seqlen, meta = load_index(prefix)
    cl = ClassifierFused(fm, tax, ClassifierParam())
    cl.bucket_q = 8192
    dev = cl.dev
    for _, queries in iter_fastq_batches(fq, 8192):
        reads, lengths = cl._pack_reads(queries)[:2]
        break
    mhl = cl.param.min_hit_len
    L = reads[0].shape[1] * 4
    H = L // (mhl + 1) + 1
    U = reads[0].shape[0]
    outs = {}
    for which in ("noftab", "ftab"):
        def traced(s, rd, ln, which=which):
            pack2, vmask = rd
            cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
            codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
            lls = jnp.repeat(ln.astype(jnp.int32), 2)
            impl = s._chain_search_noftab_impl if which == "noftab" \
                else s._chain_search_ftab_impl
            ch = impl(codes, lls, mhl, H)
            return ch["nhits"].sum(), ch["sp"], ch["ep"], ch["l"], ch["nhits"]
        f = dev._jitted(("pftab", which), traced)
        t0=time.time(); r = f(dev.arrs, tuple(reads), lengths); float(r[0]); tcomp=time.time()-t0
        best=1e9
        for _ in range(3):
            t0=time.time(); r = f(dev.arrs, tuple(reads), lengths); float(r[0]); best=min(best,time.time()-t0)
        outs[which] = [np.asarray(x) for x in r[1:]]
        print("%s %s: %.3fs (compile %.1fs)" % (name, which, best-lat, tcomp), flush=True)
    same = all(np.array_equal(a, b) for a, b in zip(outs["noftab"], outs["ftab"]))
    print("%s hits identical: %s" % (name, same), flush=True)

run("/root/repo/.bench_cache/db5000000_r100000_l100/ouridx",
    "/root/repo/.bench_cache/db5000000_r100000_l100/reads.fq", "toy")
big = sorted(glob.glob("/root/repo/.bench_cache/bigdb_*nt"))[-1]
run(big + "/ouridx", big + "/reads.fq", "big")

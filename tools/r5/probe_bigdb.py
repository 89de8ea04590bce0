"""Phase/batch-size profiling of the fused program on the big bench DB."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, glob
import jax, jax.numpy as jnp

big = sorted(glob.glob("/root/repo/.bench_cache/bigdb_*nt"))[-1]
prefix = os.path.join(big, "ouridx")
from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches

fm, tax, seqlen, meta = load_index(prefix)
print("n=%d" % fm.n, flush=True)

@jax.jit
def _nop(x): return x + 1
float(_nop(jnp.zeros(())))
lat = 1e9
for _ in range(3):
    t0=time.time(); float(_nop(jnp.zeros(()))); lat=min(lat, time.time()-t0)
print("lat %.3fs" % lat, flush=True)

for BATCH in (8192, 32768):
    cl = ClassifierFused(fm, tax, ClassifierParam())
    cl.bucket_q = BATCH
    dev = cl.dev
    packs = []
    for _, queries in iter_fastq_batches(os.path.join(big, "reads.fq"), BATCH):
        packs.append(cl._pack_reads(queries)[:2])
        if len(packs) >= 2:
            break
    reads, lengths = packs[0]
    mhl = cl.param.min_hit_len
    L = reads[0].shape[1] * 4
    H = L // (mhl + 1) + 1
    U = reads[0].shape[0]
    print("BATCH=%d U=%d L=%d mhl=%d H=%d" % (BATCH, U, L, mhl, H), flush=True)

    # full fused classify, fetch-timed
    def full():
        out = dev.fused_classify(reads, lengths, 1, mhl, H, 1, 40,
                                 cl.K_OUT, U * cl.U_CAP)
        return out
    o = full(); np.asarray(o["packed"])  # warm
    best = 1e9
    for _ in range(3):
        t0=time.time(); o = full(); np.asarray(o["packed"]); best=min(best,time.time()-t0)
    print("  fused_classify: %.3fs -> %.0f reads/s" % (best-lat, U/(best-lat)), flush=True)

    # chain search only
    from centrifuger_tpu.classify.device_engine import decode_packed_dna
    def chain_only():
        ch = dev.chain_search_packed_probe(reads, lengths, mhl, H) \
            if hasattr(dev, 'chain_search_packed_probe') else None
    # do it via _jitted path manually
    import jax as _jax
    def traced(s, rd, ln):
        pack2, vmask = rd
        cf, cr = decode_packed_dna(pack2, vmask, ln.astype(jnp.int32))
        codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
        lanelens = jnp.repeat(ln.astype(jnp.int32), 2)
        chh = s._chain_search_impl(codes, lanelens, mhl, H)
        return chh["nhits"].sum(), chh
    f = dev._jitted(("probe_chain", mhl, H, U), traced)
    s0, ch = f(dev.arrs, tuple(reads), lengths)
    float(s0)
    best = 1e9
    for _ in range(3):
        t0=time.time(); s0, ch = f(dev.arrs, tuple(reads), lengths); float(s0); best=min(best,time.time()-t0)
    t_chain = best - lat
    print("  chain only: %.3fs (%.0f reads/s-equivalent)" % (t_chain, U/t_chain), flush=True)

    # resolve only: random rows
    rng = np.random.default_rng(1)
    M = U * cl.U_CAP
    rows = jnp.asarray(rng.integers(0, fm.n - 1, M).astype(np.int32))
    va = jnp.ones(M, bool)
    def traced_r(s, r, v):
        return s._resolve_rows_impl(r, v).sum()
    fr = dev._jitted(("probe_resolve", M), traced_r)
    float(fr(dev.arrs, rows, va))
    best = 1e9
    for _ in range(3):
        t0=time.time(); float(fr(dev.arrs, rows, va)); best=min(best,time.time()-t0)
    print("  resolve only (%d rows): %.3fs" % (M, best-lat), flush=True)
print("done", flush=True)

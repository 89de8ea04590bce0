"""Stage-wise timing of the round-3 fused program: jit progressively larger
prefixes of fused_classify to find where the ~140ms goes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache", "db5000000_r100000_l100")


def bench(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
    from centrifuger_tpu.classify import device_engine as de

    fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
    cl = ClassifierFused(fm, tax, ClassifierParam())
    dev = cl.dev
    cl.bucket_q = 8192
    ids, queries = next(iter_fastq_batches(os.path.join(CACHE, "reads.fq"), 8192))
    reads, lengths, nr, Q0, Qp, L = cl._pack_reads(queries)
    mhl = cl.param.min_hit_len or 23
    H = L // (mhl + 1) + 1
    k_out, r_cap = cl.K_OUT, Qp * cl.U_CAP
    max_result = cl.param.max_result
    hitk = cl.param.max_result_per_hit_factor
    print("Qp=%d L=%d H=%d r_cap=%d" % (Qp, L, H, r_cap), flush=True)

    def stage(name, fn):
        f = dev._jitted(("prof", name), fn)
        t0 = time.time()
        out = f(dev.arrs, reads, lengths)
        jax.block_until_ready(out)
        tc = time.time() - t0
        t = bench(lambda: f(dev.arrs, reads, lengths))
        print("%-22s %8.2f ms   (compile %5.1fs)" % (name, t * 1e3, tc),
              flush=True)

    def encode_only(s, reads, lengths):
        cf, cr = de.encode_dna_device(reads, lengths.astype(jnp.int32))
        codes = jnp.stack([cf, cr], axis=1).reshape(-1, L)
        return codes.sum()

    def chain_only(s, reads, lengths):
        cf, cr = de.encode_dna_device(reads, lengths.astype(jnp.int32))
        codes = jnp.stack([cf, cr], axis=1).reshape(-1, L)
        lanelens = jnp.repeat(lengths.astype(jnp.int32), 2)
        ch = s._chain_search_impl(codes, lanelens, mhl, H)
        return [v.sum() for v in ch.values()]

    def full(s, reads, lengths):
        return de.fused_classify(s, reads, lengths, nr, mhl, H, max_result,
                                 hitk, k_out, r_cap)["packed"]

    # a resolve-only program on synthetic rows
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, dev.n, (r_cap,), dtype=np.int64)
                       .astype(np.int32))
    valid = jnp.ones((r_cap,), bool)

    def resolve_only(s, rows, valid):
        return s._resolve_rows_impl(rows, valid)

    fr = dev._jitted(("prof", "resolve"), resolve_only)
    t0 = time.time()
    out = fr(dev.arrs, rows, valid); jax.block_until_ready(out)
    tc = time.time() - t0
    t = bench(lambda: fr(dev.arrs, rows, valid))
    print("%-22s %8.2f ms   (compile %5.1fs)" % ("resolve(rowmap)", t * 1e3, tc),
          flush=True)

    stage("encode", encode_only)
    stage("encode+chain", chain_only)
    stage("FULL fused", full)


if __name__ == "__main__":
    main()

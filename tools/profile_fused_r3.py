"""Round-3 profiling: where does fused_classify time go?

Measures on the bench fixture index: chain_search alone, resolve alone,
fused_classify total, at multiple batch sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache", "db5000000_r100000_l100")


def main():
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches

    fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
    cl = ClassifierFused(fm, tax, ClassifierParam())
    dev = cl.dev
    print("platform:", jax.devices()[0].platform, file=sys.stderr)

    ids, queries = next(iter_fastq_batches(
        os.path.join(CACHE, "reads.fq"), 32768))

    for Q in (4096, 8192, 16384, 32768):
        cl.bucket_q = Q
        sub = queries[:Q]
        reads, lengths, nr, Q0, Qp, L = cl._pack_reads(sub)
        mhl = cl.param.min_hit_len
        H = L // (mhl + 1) + 1

        # --- full fused ---
        def run_full():
            return dev.fused_classify(reads, lengths, 1, mhl, H,
                                      cl.param.max_result,
                                      cl.param.max_result_per_hit_factor,
                                      cl.K_OUT, Qp * cl.U_CAP)
        t0 = time.time()
        out = run_full()
        np.asarray(out["packed"])
        t_compile = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = run_full()
        np.asarray(out["packed"])
        t_full = (time.time() - t0) / reps

        # --- chain search alone (2 strands per unit) ---
        from centrifuger_tpu.classify.device_engine import encode_dna_device
        import jax.numpy as jnp

        codes_f = None

        def run_chain():
            ch = dev.chain_search_codes(reads, lengths, mhl, H)
            return ch
        # build a jitted chain-only program: encode + chain
        key = ("profile_chain", mhl, H)
        def traced(s, rd, ln):
            cf, cr = encode_dna_device(rd, ln.astype(jnp.int32))
            codes = jnp.stack([cf, cr], axis=1).reshape(2 * rd.shape[0], rd.shape[1])
            lanelens = jnp.repeat(ln.astype(jnp.int32), 2)
            return s._chain_search_impl(codes, lanelens, mhl, H)
        f = dev._jitted(key, traced)
        t0 = time.time()
        ch = f(dev.arrs, reads, lengths)
        np.asarray(ch["nhits"])
        t_chain_c = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            ch = f(dev.arrs, reads, lengths)
        np.asarray(ch["nhits"])
        t_chain = (time.time() - t0) / reps

        # --- resolve alone (rowmap path: one gather) ---
        R = Qp * cl.U_CAP
        rows = np.random.randint(0, dev.n, R).astype(np.int32)
        valid = np.ones(R, bool)
        t0 = time.time()
        r = dev.resolve_rows(rows, valid)
        np.asarray(r)
        t0 = time.time()
        for _ in range(reps):
            r = dev.resolve_rows(rows, valid)
        np.asarray(r)
        t_resolve = (time.time() - t0) / reps

        print("Q=%5d L=%d: full=%.1fms chain=%.1fms resolve=%.2fms "
              "rest=%.1fms  |  %.0f reads/s (compile %.0fs/%.0fs)"
              % (Q, L, t_full * 1e3, t_chain * 1e3, t_resolve * 1e3,
                 (t_full - t_chain - t_resolve) * 1e3, Q / t_full,
                 t_compile, t_chain_c))


if __name__ == "__main__":
    main()

"""Ablate the fused chain-search loop on the real bench index to find where
the ~760us/iteration goes (microbench says gathers+SWAR cost <1us/iter)."""

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


def timeit(f, iters=3):
    out = f()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
    from centrifuger_tpu.classify.device_engine import encode_dna_device

    fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
    cl = ClassifierFused(fm, tax, ClassifierParam())
    dev = cl.dev
    Q = 8192
    cl.bucket_q = Q
    ids, queries = next(iter_fastq_batches(os.path.join(CACHE, "reads.fq"), Q))
    reads, lengths, nr, Q0, Qp, L = cl._pack_reads(queries)
    mhl = cl.param.min_hit_len or cl._auto_mhl() if hasattr(cl, "_auto_mhl") else 22
    mhl = cl.param.min_hit_len if cl.param.min_hit_len else 22
    H = L // (mhl + 1) + 1
    print("Q=%d L=%d mhl=%d H=%d" % (Qp, L, mhl, H), file=sys.stderr)

    codes_f, codes_r = None, None

    @jax.jit
    def enc(reads, lengths):
        cf, cr = encode_dna_device(reads, lengths.astype(jnp.int32))
        codes = jnp.stack([cf, cr], axis=1).reshape(-1, cf.shape[1])
        lanelens = jnp.repeat(lengths.astype(jnp.int32), 2)
        return codes, lanelens

    codes, lanelens = enc(reads, lengths)
    codes = jax.block_until_ready(codes)
    B = codes.shape[0]
    print("B=%d lanes" % B, file=sys.stderr)

    # --- 1. full chain search (the production one) ---
    t0 = time.time()
    f_full = lambda: dev.chain_search(codes, lanelens, mhl, H)["nhits"]
    r = f_full(); jax.block_until_ready(r)
    print("full chain: compile+run %.1fs" % (time.time() - t0))
    t = timeit(f_full)
    print("full chain: %.1f ms" % (t * 1e3))

    # --- 2. count iterations the loop actually runs ---
    def count_iters(sdev, codes, lengths):
        it = sdev.idtype
        pw = sdev.pw
        kfull, tailvalid = sdev._precompute_read_tables(codes)
        st = dict(rem=lengths.astype(jnp.int32), n=jnp.zeros((), jnp.int32))
        def cond(st):
            return jnp.any(st["rem"] >= mhl)
        def body(st):
            return dict(rem=st["rem"] - 1, n=st["n"] + 1)
        return lax.while_loop(cond, body, st)["n"]

    wrapped = jax.jit(lambda c, l: count_iters(dev, c, l))
    n = int(wrapped(codes, lanelens))
    print("upper-bound iterations (max rem): %d" % n)

    # --- 3. loop body ablations, all as while_loop with same cond shape ---
    def run_variant(name, body_kind):
        it = dev.idtype
        pw = dev.pw

        def impl(sdev, codes, lengths):
            Bv, Lv = codes.shape
            kfull, tailvalid = sdev._precompute_read_tables(codes)
            posidx = jnp.arange(Lv + 1, dtype=jnp.int32)[None, :]
            kc = jnp.clip(kfull, 0, sdev.ftab_len.shape[0] - 1)
            p_flen = sdev.ftab_len[kc]
            p_fsp = sdev.ftab_start[kc]
            p_ok = (tailvalid >= pw) & (p_flen > 0) & (posidx >= pw)
            lfail = jnp.where(posidx < pw, 0,
                              jnp.where(tailvalid < pw, tailvalid, pw - 1))
            prev_char = jnp.concatenate(
                [jnp.full((Bv, 1), 255, jnp.int32), codes.astype(jnp.int32)],
                axis=1)
            pre = jnp.stack([jnp.where(p_ok, p_fsp, 1).astype(it),
                             jnp.where(p_ok, p_fsp + p_flen - 1, 0).astype(it),
                             jnp.where(p_ok, -1, lfail).astype(it),
                             prev_char], axis=-1)
            pre_flat = pre.reshape(Bv * (Lv + 1), 4)
            lane_base = jnp.arange(Bv, dtype=jnp.int32) * (Lv + 1)
            lengths32 = lengths.astype(jnp.int32)
            st = dict(rem=lengths32,
                      l=jnp.zeros(Bv, jnp.int32),
                      sp=jnp.zeros(Bv, it), ep=jnp.zeros(Bv, it),
                      acc=jnp.zeros(Bv, jnp.int32))

            def cond(stt):
                return jnp.any(stt["rem"] >= mhl)

            def body(stt):
                rem = stt["rem"]
                if body_kind == "noop":
                    return dict(stt, rem=rem - 1)
                idx = jnp.clip(jnp.where(stt["l"] > 0, rem - stt["l"], rem), 0, Lv)
                row4 = pre_flat[lane_base + idx]
                if body_kind == "preflat_only":
                    return dict(stt, rem=rem - 1,
                                acc=stt["acc"] + row4[:, 0].astype(jnp.int32))
                c = jnp.clip(row4[:, 3], 0, 3).astype(jnp.int32)
                nsp, nep = sdev.backward_extend(c, stt["sp"], stt["ep"])
                if body_kind == "extend_only":
                    return dict(stt, rem=rem - 1,
                                sp=jnp.where(nsp <= nep, nsp, stt["sp"]),
                                ep=jnp.where(nsp <= nep, nep, stt["ep"]))
                raise ValueError(body_kind)

            return lax.while_loop(cond, body, st)["acc"]

        f = jax.jit(lambda c, l: impl(dev, c, l))
        t0 = time.time()
        r = f(codes, lanelens); jax.block_until_ready(r)
        tc = time.time() - t0
        t = timeit(lambda: f(codes, lanelens))
        print("%-14s: %.1f ms  (compile %.1fs)" % (name, t * 1e3, tc))

    run_variant("noop body", "noop")
    run_variant("preflat gather", "preflat_only")
    run_variant("extend only", "extend_only")


if __name__ == "__main__":
    main()

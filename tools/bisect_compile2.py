"""Round 2: find a fix for (a) 212s compile when ftab channels feed the loop,
(b) ~60ms runtime of the pre-table construction itself."""

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


def compile_time(f, *args):
    t0 = time.time()
    jf = jax.jit(f)
    comp = jf.lower(*args).compile()
    t_comp = time.time() - t0
    out = comp(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = comp(*args)
    jax.block_until_ready(out)
    return t_comp, (time.time() - t0) / 3


def main():
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam

    fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
    cl = ClassifierFused(fm, tax, ClassifierParam())
    dev = cl.dev
    B, L = 16384, 128
    mhl = 23
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int32))
    lengths = jnp.full((B,), 100, jnp.int32)
    it = dev.idtype
    pw = dev.pw

    def build_pre(codes, ftab_len, ftab_start, barrier, split):
        kfull, tailvalid = dev._precompute_read_tables(codes)
        posidx = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        kc = jnp.clip(kfull, 0, ftab_len.shape[0] - 1)
        p_flen = ftab_len[kc]
        p_fsp = ftab_start[kc]
        p_ok = (tailvalid >= pw) & (p_flen > 0) & (posidx >= pw)
        lfail = jnp.where(posidx < pw, 0,
                          jnp.where(tailvalid < pw, tailvalid, pw - 1))
        prev_char = jnp.concatenate(
            [jnp.full((B, 1), 255, jnp.int32), codes.astype(jnp.int32)], axis=1)
        ch0 = jnp.where(p_ok, p_fsp, 1).astype(it).reshape(-1)
        ch1 = jnp.where(p_ok, p_fsp + p_flen - 1, 0).astype(it).reshape(-1)
        ch2 = jnp.where(p_ok, -1, lfail).astype(it).reshape(-1)
        ch3 = prev_char.reshape(-1)
        if split:
            chans = (ch0, ch1, ch2, ch3)
        else:
            chans = (jnp.stack([ch0, ch1, ch2, ch3], axis=-1),)
        if barrier:
            chans = lax.optimization_barrier(chans)
        return chans

    def loop(chans, lengths, split):
        lane_base = jnp.arange(B, dtype=jnp.int32) * (L + 1)
        st = dict(rem=lengths.astype(jnp.int32), acc=jnp.zeros(B, jnp.int32))

        def cond(stt):
            return jnp.any(stt["rem"] >= mhl)

        def body(stt):
            idx = lane_base + jnp.clip(stt["rem"], 0, L)
            if split:
                v = chans[0][idx] + chans[1][idx] + chans[3][idx]
            else:
                row4 = chans[0][idx]
                v = row4[:, 0] + row4[:, 1] + row4[:, 3]
            return dict(rem=stt["rem"] - 1, acc=stt["acc"] + v.astype(jnp.int32))

        return lax.while_loop(cond, body, st)["acc"]

    fl, fs = dev.ftab_len, dev.ftab_start

    for name, barrier, split in [
        ("stack4 + barrier", True, False),
        ("split chans, no barrier", False, True),
        ("split chans + barrier", True, True),
    ]:
        def f(c, l, fl, fs, barrier=barrier, split=split):
            chans = build_pre(c, fl, fs, barrier, split)
            return loop(chans, l, split)
        tc, tr = compile_time(f, codes, lengths, fl, fs)
        print("%-26s compile %6.1fs  run %7.2f ms" % (name, tc, tr * 1e3),
              flush=True)

    # runtime of the pre construction alone, split layout
    def fpre(c, fl, fs):
        chans = build_pre(c, fl, fs, False, True)
        return [x.sum() for x in chans]
    tc, tr = compile_time(fpre, codes, fl, fs)
    print("pre-construction alone: compile %.1fs  run %.2f ms" % (tc, tr * 1e3),
          flush=True)

    # pieces: read tables only
    def frt(c):
        kfull, tailvalid = dev._precompute_read_tables(c)
        return kfull.sum() + tailvalid.sum()
    tc, tr = compile_time(frt, codes)
    print("read-tables alone: compile %.1fs  run %.2f ms" % (tc, tr * 1e3),
          flush=True)

    # pieces: ftab gather alone on a precomputed kc
    kfull, tailvalid = jax.jit(dev._precompute_read_tables)(codes)
    kc0 = jnp.clip(kfull, 0, fl.shape[0] - 1)

    def fgather(kc, fl, fs):
        return fl[kc].sum() + fs[kc].sum()
    tc, tr = compile_time(fgather, kc0, fl, fs)
    print("ftab gather alone: compile %.1fs  run %.2f ms" % (tc, tr * 1e3),
          flush=True)


if __name__ == "__main__":
    main()

"""Bisect which construct makes the chain-search program take ~220s to
compile: the ftab gather, the pre-stack, the while loop, or a combination."""

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
    lowered = jf.lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    comp = lowered.compile()
    t_comp = time.time() - t0
    # warm run
    out = comp(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = comp(*args)
    jax.block_until_ready(out)
    t_run = time.time() - t0
    return t_lower, t_comp, t_run


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
    ftab_len = dev.ftab_len
    ftab_start = dev.ftab_start
    it = dev.idtype
    pw = dev.pw

    def precompute(codes, lengths, use_ftab, use_loop, acc_ch):
        kfull, tailvalid = dev._precompute_read_tables(codes)
        posidx = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        if use_ftab:
            kc = jnp.clip(kfull, 0, ftab_len.shape[0] - 1)
            p_flen = ftab_len[kc]
            p_fsp = ftab_start[kc]
        else:
            p_flen = kfull.astype(it) & 7
            p_fsp = kfull.astype(it) >> 3
        p_ok = (tailvalid >= pw) & (p_flen > 0) & (posidx >= pw)
        lfail = jnp.where(posidx < pw, 0,
                          jnp.where(tailvalid < pw, tailvalid, pw - 1))
        prev_char = jnp.concatenate(
            [jnp.full((B, 1), 255, jnp.int32), codes.astype(jnp.int32)], axis=1)
        pre = jnp.stack([jnp.where(p_ok, p_fsp, 1).astype(it),
                         jnp.where(p_ok, p_fsp + p_flen - 1, 0).astype(it),
                         jnp.where(p_ok, -1, lfail).astype(it),
                         prev_char], axis=-1)
        pre_flat = pre.reshape(B * (L + 1), 4)
        if not use_loop:
            return pre_flat.sum()
        lane_base = jnp.arange(B, dtype=jnp.int32) * (L + 1)
        st = dict(rem=lengths.astype(jnp.int32), acc=jnp.zeros(B, jnp.int32))

        def cond(stt):
            return jnp.any(stt["rem"] >= mhl)

        def body(stt):
            idx = jnp.clip(stt["rem"], 0, L)
            row4 = pre_flat[lane_base + idx]
            return dict(rem=stt["rem"] - 1,
                        acc=stt["acc"] + row4[:, acc_ch].astype(jnp.int32))

        return lax.while_loop(cond, body, st)["acc"]

    variants = [
        ("pre only, ftab, no loop", dict(use_ftab=True, use_loop=False, acc_ch=0)),
        ("loop, NO ftab, ch0", dict(use_ftab=False, use_loop=True, acc_ch=0)),
        ("loop, ftab, ch3 (prevchar)", dict(use_ftab=True, use_loop=True, acc_ch=3)),
        ("loop, ftab, ch0", dict(use_ftab=True, use_loop=True, acc_ch=0)),
    ]
    for name, kw in variants:
        f = lambda c, l, kw=kw: precompute(c, l, **kw)
        tl, tc, tr = compile_time(f, codes, lengths)
        print("%-28s lower %5.1fs  compile %7.1fs  run %7.2f ms"
              % (name, tl, tc, tr * 1e3), flush=True)


if __name__ == "__main__":
    main()

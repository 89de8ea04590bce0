"""Round 4: the blowup needs tailvalid (associative_scan) x gather-result
fusion. Find the minimal trigger and a fix (lax.cummax / barrier placement)."""

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
    comp = jax.jit(f).lower(*args).compile()
    t_comp = time.time() - t0
    out = comp(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = comp(*args)
    jax.block_until_ready(out)
    return t_comp, (time.time() - t0) / 5


def main():
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam

    fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
    dev = ClassifierFused(fm, tax, ClassifierParam()).dev
    B, L = 16384, 128
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int32))
    pw = dev.pw
    bits = dev.code_bits
    fl, fs = dev.ftab_len, dev.ftab_start

    def kfull_f(cc):
        parts = [cc[:, j:L - pw + j + 1] << (bits * j) for j in range(pw)]
        core = parts[0]
        for p in parts[1:]:
            core = core + p
        return jnp.concatenate([jnp.zeros((B, pw), jnp.int32), core], axis=1)

    def tv_scan(valid):
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        inv_pos = jnp.where(~valid, pos, -1)
        last_inv = lax.associative_scan(jnp.maximum, inv_pos, axis=1)
        return jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), pos - last_inv], axis=1)

    def tv_cummax(valid):
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        inv_pos = jnp.where(~valid, pos, -1)
        last_inv = lax.cummax(inv_pos, axis=1)
        return jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), pos - last_inv], axis=1)

    def run(name, tvf, combine, barrier_tv):
        def f(codes, fl, fs):
            valid = codes != 255
            cc = jnp.where(valid, codes, 0).astype(jnp.int32)
            k = kfull_f(cc)
            kc = jnp.clip(k, 0, fl.shape[0] - 1)
            g = fl[kc]
            tv = tvf(valid)
            if barrier_tv:
                tv = lax.optimization_barrier(tv)
            if combine:
                ok = (tv >= pw) & (g > 0)
                return jnp.where(ok, g, 0).sum()
            return g.sum() + tv.sum()
        tc, tr = compile_time(f, codes, fl, fs)
        print("%-34s compile %6.1fs  run %6.2f ms" % (name, tc, tr * 1e3),
              flush=True)

    run("scan-tv, separate sums", tv_scan, False, False)
    run("scan-tv, combined where", tv_scan, True, False)
    run("scan-tv + barrier, combined", tv_scan, True, True)
    run("cummax-tv, combined where", tv_cummax, True, False)


if __name__ == "__main__":
    main()


def windowed():
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
    dev = ClassifierFused(fm, tax, ClassifierParam()).dev
    B, L = 16384, 128
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int32))
    pw, bits = dev.pw, dev.code_bits
    fl, fs = dev.ftab_len, dev.ftab_start

    def f(codes, fl, fs):
        valid = codes != 255
        cc = jnp.where(valid, codes, 0).astype(jnp.int32)
        parts = [cc[:, j:L - pw + j + 1] << (bits * j) for j in range(pw)]
        core = parts[0]
        for p in parts[1:]:
            core = core + p
        k = jnp.concatenate([jnp.zeros((B, pw), jnp.int32), core], axis=1)
        kc = jnp.clip(k, 0, fl.shape[0] - 1)
        g = fl[kc]
        # tailvalid capped at pw via a pw-step windowed chain (NO scan):
        # tv[p] = run length of valid chars ending at p-1, saturated at pw
        vpad = jnp.concatenate([jnp.zeros((B, pw), bool), valid], axis=1)  # [B, L+pw]
        tv = jnp.zeros((B, L + 1), jnp.int32)
        for j in range(1, pw + 1):
            # window position p-j  ->  vpad[:, p - j + pw]
            vj = vpad[:, pw - j:pw - j + L + 1]
            tv = jnp.where(vj & (tv == j - 1), j, tv)
        ok = (tv >= pw) & (g > 0)
        return jnp.where(ok, g, 0).sum() + (tv & 7).sum()

    tc, tr = compile_time(f, codes, fl, fs)
    print("windowed-tv, combined where        compile %6.1fs  run %6.2f ms"
          % (tc, tr * 1e3), flush=True)


if __name__ == "__main__" and os.environ.get("W"):
    windowed()

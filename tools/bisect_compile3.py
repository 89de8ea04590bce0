"""Round 3: sever the kfull-producer -> ftab-gather fusion that costs ~230s
of XLA compile. Candidates: optimization_barrier on kc, or a slice-stack
kfull construction (no dynamic-update-slice chain)."""

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
    cl = ClassifierFused(fm, tax, ClassifierParam())
    dev = cl.dev
    B, L = 16384, 128
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int32))
    pw = dev.pw
    bits = dev.code_bits
    fl, fs = dev.ftab_len, dev.ftab_start

    def kfull_dus(codes):
        valid = codes != 255
        cc = jnp.where(valid, codes, 0).astype(jnp.int32)
        k = jnp.zeros((B, L + 1), jnp.int32)
        for j in range(pw):
            shifted = jnp.zeros((B, L + 1), jnp.int32)
            src = cc << (bits * j)
            shifted = shifted.at[:, pw - j:].set(src[:, :L - pw + j + 1])
            k = k + shifted
        return k

    def kfull_slices(codes):
        valid = codes != 255
        cc = jnp.where(valid, codes, 0).astype(jnp.int32)
        # kfull[p] = sum_j cc[p-pw+j] << (bits*j), defined for p in [pw, L]
        parts = [cc[:, j:L - pw + j + 1] << (bits * j) for j in range(pw)]
        core = parts[0]
        for p in parts[1:]:
            core = core + p                      # [B, L-pw+1]
        return jnp.concatenate(
            [jnp.zeros((B, pw), jnp.int32), core], axis=1)   # [B, L+1]

    def run(name, kf, barrier):
        def f(codes, fl, fs):
            k = kf(codes)
            kc = jnp.clip(k, 0, fl.shape[0] - 1)
            if barrier:
                kc = lax.optimization_barrier(kc)
            return fl[kc].sum() + fs[kc].sum()
        tc, tr = compile_time(f, codes, fl, fs)
        print("%-24s compile %6.1fs  run %6.2f ms" % (name, tc, tr * 1e3),
              flush=True)

    run("dus + barrier", kfull_dus, True)
    run("slices, no barrier", kfull_slices, False)
    run("slices + barrier", kfull_slices, True)
    run("dus, no barrier", kfull_dus, False)


if __name__ == "__main__":
    main()

"""Round-4 chain-loop cost bisect: full body vs stripped variants, fori x110.

Variants (all fori_loop, 110 iters, B=16384 lanes):
  A: full body (record + pre_flat + backward_extend)   == production loop
  B: no record() (nhits counter only, no hits array)
  C: B + no pre_flat gather (row4 synthesized from constants)
  D: backward_extend only + minimal state
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "db5000000_r100000_l100")

from centrifuger_tpu.build import load_index
from centrifuger_tpu.classify.engine_fused import ClassifierFused
from centrifuger_tpu.classify.params import ClassifierParam
from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.classify.device_engine import encode_dna_device

fm, tax, seqlen, meta = load_index(os.path.join(CACHE, "ouridx"))
cl = ClassifierFused(fm, tax, ClassifierParam())
cl.bucket_q = 8192
ids, queries = next(iter_fastq_batches(os.path.join(CACHE, "reads.fq"), 8192))
reads, lengths, nr, Q0, Q, L = cl._pack_reads(queries)
mhl = cl.param.min_hit_len
H = L // (mhl + 1) + 1
dev = cl.dev
enc = jax.jit(encode_dna_device)
cf, cr = enc(reads, jnp.asarray(lengths, jnp.int32))
codes = jnp.stack([cf, cr], 1).reshape(-1, L)
lanelens = jnp.repeat(jnp.asarray(lengths, jnp.int32), 2)
np.asarray(codes[:2])
B = codes.shape[0]
it = dev.idtype
pw = dev.pw


def timed(name, f, *args):
    t0 = time.time()
    r = f(*args)
    np.asarray(r)[:2]
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        r = f(*args)
    np.asarray(r)[:2]
    dt = (time.time() - t0) / 5
    print("%s: %.4fs  (%.0f us/iter; compile %.0fs)"
          % (name, dt, dt / 110 * 1e6, tc), flush=True)


def make_chain(with_record, with_preflat, with_extend=True):
    def chain(arrs, codes, lengths):
        s = dev._bind(arrs)
        kfull, tailvalid = s._precompute_read_tables(codes)
        posidx = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        kc = jnp.clip(kfull, 0, s.ftab_len.shape[0] - 1)
        p_flen = s.ftab_len[kc]
        p_fsp = s.ftab_start[kc]
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
        lane_base = jnp.arange(B, dtype=jnp.int32) * (L + 1)
        lengths32 = lengths.astype(jnp.int32)
        state = dict(rem=lengths32, l=jnp.zeros(B, jnp.int32),
                     sp=jnp.zeros(B, it), ep=jnp.zeros(B, it),
                     phase=jnp.zeros(B, jnp.int32), nhits=jnp.zeros(B, jnp.int32))
        if with_record:
            state["hits"] = jnp.zeros((B, H, 4), it)
        slots = jnp.arange(H, dtype=jnp.int32)[None, :]

        def body(i, st):
            active = st["rem"] >= mhl
            start = active & (st["phase"] == 0)
            extend = active & (st["phase"] == 1)
            rem = st["rem"]
            idx = jnp.clip(jnp.where(st["phase"] == 0, rem, rem - st["l"]), 0, L)
            if with_preflat:
                row4 = pre_flat[lane_base + idx]
                ftab_ok = row4[:, 2] < 0
                fsp = row4[:, 0]
                fep = row4[:, 1]
                c = row4[:, 3].astype(jnp.int32)
                start_l = jnp.where(ftab_ok, pw, row4[:, 2]).astype(jnp.int32)
            else:
                ftab_ok = (idx & 1) == 0
                fsp = idx.astype(it)
                fep = fsp + 3
                c = (idx & 3).astype(jnp.int32)
                start_l = jnp.where(ftab_ok, pw, 3).astype(jnp.int32)
            start_done_now = ftab_ok & (pw >= rem)
            c_invalid = c == 255
            c_safe = jnp.where(c_invalid, 0, c)
            if with_extend:
                nsp, nep = s.backward_extend(
                    jnp.where(extend, c_safe, 0),
                    jnp.where(extend, st["sp"], 0),
                    jnp.where(extend, st["ep"], 0))
            else:
                nsp, nep = st["sp"] + 1, st["ep"]
            ext_fail = extend & (c_invalid | (nsp > nep))
            ext_ok = extend & (~ext_fail)
            new_l = st["l"] + 1
            ext_done = ext_ok & (new_l >= rem)
            fin_start = start & ((~ftab_ok) | start_done_now)
            fin = fin_start | ext_fail | ext_done
            fin_l = jnp.where(fin_start, start_l,
                              jnp.where(ext_done, new_l, st["l"]))
            fin_sp = jnp.where(fin_start,
                               jnp.where(start_done_now, fsp, 1), st["sp"])
            fin_ep = jnp.where(fin_start,
                               jnp.where(start_done_now, fep, 0), st["ep"])
            fin_sp = jnp.where(ext_done, nsp, fin_sp)
            fin_ep = jnp.where(ext_done, nep, fin_ep)
            st2 = dict(st)
            if with_record:
                cond_hit = fin & (fin_l >= mhl) & (fin_sp <= fin_ep) & (st["nhits"] < H)
                sel = cond_hit[:, None] & (slots == st["nhits"][:, None])
                new = jnp.stack([fin_sp.astype(it), fin_ep.astype(it),
                                 fin_l.astype(it),
                                 (lengths32 - st["rem"]).astype(it)],
                                axis=-1)[:, None, :]
                st2["hits"] = jnp.where(sel[:, :, None], new, st["hits"])
                st2["nhits"] = st["nhits"] + cond_hit.astype(jnp.int32)
            else:
                st2["nhits"] = st["nhits"] + (fin & (fin_l >= mhl)).astype(jnp.int32)
            go_extend = start & ftab_ok & (~start_done_now)
            st2["sp"] = jnp.where(go_extend, fsp, jnp.where(ext_ok, nsp, st["sp"]))
            st2["ep"] = jnp.where(go_extend, fep, jnp.where(ext_ok, nep, st["ep"]))
            st2["l"] = jnp.where(go_extend, pw, jnp.where(ext_ok, new_l, st["l"]))
            st2["phase"] = jnp.where(fin, 0, jnp.where(go_extend, 1, st2["phase"]))
            st2["rem"] = jnp.where(fin, rem - (fin_l + 1), rem)
            st2["l"] = jnp.where(fin, 0, st2["l"])
            return st2

        st = lax.fori_loop(0, 110, body, state)
        return st["nhits"]
    return jax.jit(chain)


timed("A: full body (record+preflat+extend)", make_chain(True, True),
      dev.arrs, codes, lanelens)
timed("B: no record", make_chain(False, True), dev.arrs, codes, lanelens)
timed("C: no record, no preflat", make_chain(False, False),
      dev.arrs, codes, lanelens)
timed("D: no record, no preflat, no extend", make_chain(False, False, False),
      dev.arrs, codes, lanelens)

"""Host-side breakdown of the serving pipeline on the bench fixture:
FASTQ parse, _pack_reads, H2D+dispatch, D2H, format_tsv_batch, write."""

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
    cl.bucket_q = 8192
    fq = os.path.join(CACHE, "reads.fq")

    # 1. FASTQ parse alone
    t0 = time.time()
    batches = list(iter_fastq_batches(fq, 8192))
    t_parse = time.time() - t0
    n = sum(len(b[0]) for b in batches)
    print("FASTQ parse: %.3fs for %d reads (%.0f reads/s)"
          % (t_parse, n, n / t_parse), flush=True)

    # 2. _pack_reads alone
    t0 = time.time()
    packs = [cl._pack_reads(q) for _, q in batches]
    t_pack = time.time() - t0
    print("_pack_reads: %.3fs (%.0f reads/s)" % (t_pack, n / t_pack), flush=True)

    # 3. H2D upload alone
    import jax.numpy as jnp
    t0 = time.time()
    dev_reads = [(jnp.asarray(p[0]), jnp.asarray(p[1])) for p in packs]
    jax.block_until_ready(dev_reads[-1][0])
    t_h2d = time.time() - t0
    mb = sum(p[0].nbytes for p in packs) / 1e6
    print("H2D: %.3fs for %.1f MB (%.0f MB/s)" % (t_h2d, mb, mb / t_h2d),
          flush=True)

    # 4. dispatch all batches (device-resident inputs)
    mhl = cl.param.min_hit_len or 23
    L = packs[0][0].shape[1]
    H = L // (mhl + 1) + 1
    Qp = packs[0][0].shape[0] // packs[0][2] if False else None

    def run(rd, ln):
        return cl.dev.fused_classify(
            rd, ln, 1, mhl, H, cl.param.max_result,
            cl.param.max_result_per_hit_factor, cl.K_OUT,
            (rd.shape[0]) * cl.U_CAP)

    out = run(*dev_reads[0])
    jax.block_until_ready(out["packed"])   # compile
    t0 = time.time()
    outs = [run(rd, ln) for rd, ln in dev_reads]
    jax.block_until_ready([o["packed"] for o in outs])
    t_disp = time.time() - t0
    print("device dispatch x%d: %.3fs (%.0f reads/s)"
          % (len(outs), t_disp, n / t_disp), flush=True)

    # 5. D2H of packed
    t0 = time.time()
    packed_np = [np.asarray(o["packed"]) for o in outs]
    t_d2h = time.time() - t0
    mb = sum(p.nbytes for p in packed_np) / 1e6
    print("D2H packed: %.3fs for %.1f MB (%.0f MB/s)"
          % (t_d2h, mb, mb / t_d2h), flush=True)

    # 6. format_tsv_batch
    t0 = time.time()
    nc = 0
    all_lines = []
    for (ids, queries), pk in zip(batches, packed_np):
        lines, c = cl.format_tsv_batch(pk[:len(queries)], {}, queries, ids)
        nc += c
        all_lines.append(lines)
    t_fmt = time.time() - t0
    print("format_tsv_batch: %.3fs (%.0f reads/s), %d classified"
          % (t_fmt, n / t_fmt, nc), flush=True)

    # 7. write
    t0 = time.time()
    with open("/tmp/prof_out.tsv", "w") as f:
        for lines in all_lines:
            f.write("\n".join(lines))
            f.write("\n")
    t_wr = time.time() - t0
    print("write: %.3fs" % t_wr, flush=True)

    tot = t_parse + t_pack + t_h2d + t_disp + t_d2h + t_fmt + t_wr
    print("serial total: %.3fs (%.0f reads/s); pipelined floor = max stage"
          % (tot, n / tot), flush=True)


if __name__ == "__main__":
    main()

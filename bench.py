"""Benchmark: classification throughput vs the reference centrifuger binary.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: synthetic multi-genome DB (default 5 Mnt) + single-end 100 bp reads.
value   = end-to-end reads/sec of the JAX engine on the default device (TPU
          chip under the driver; falls back to CPU elsewhere).
baseline = reads/sec of the compiled reference binary (.refbuild/centrifuger)
          on this host using all cores, measured once and cached.
Extra fields (informational): device-only kernel throughput, engine/platform.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

REFBUILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".refbuild")

DB_NT = int(os.environ.get("CFR_BENCH_DB_NT", 5_000_000))
N_READS = int(os.environ.get("CFR_BENCH_READS", 100_000))
READ_LEN = int(os.environ.get("CFR_BENCH_READ_LEN", 100))
BATCH_READS = int(os.environ.get("CFR_BENCH_BATCH", 8192))
N_GENOMES = 20

# cache keyed by workload config so different sizes never collide
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
                     "db%d_r%d_l%d" % (DB_NT, N_READS, READ_LEN))


def log(msg):
    sys.stderr.write("[bench] %s\n" % msg)


def ensure_fixture():
    os.makedirs(CACHE, exist_ok=True)
    done = os.path.join(CACHE, "fixture.done")
    if os.path.exists(done):
        return
    log("generating %d nt DB + %d reads" % (DB_NT, N_READS))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import make_fixture
    import random
    rng = random.Random(1234)
    glen = DB_NT // N_GENOMES
    nodes, names, seq_taxids = make_fixture.make_taxonomy(N_GENOMES)
    genomes = []
    prev = None
    for i in range(N_GENOMES):
        if i % 2 == 1 and prev is not None:
            g = make_fixture.make_genome(rng, glen, parent=prev, mut_rate=0.03)
        else:
            g = make_fixture.make_genome(rng, glen)
            prev = g
        genomes.append(g)
    with open(os.path.join(CACHE, "ref.fa"), "w") as f:
        for i, g in enumerate(genomes):
            f.write(">SEQ_%06d\n" % i)
            for j in range(0, len(g), 70):
                f.write(g[j:j + 70] + "\n")
    with open(os.path.join(CACHE, "ref_seqid.map"), "w") as f:
        for i, t in enumerate(seq_taxids):
            f.write("SEQ_%06d\t%d\n" % (i, t))
    with open(os.path.join(CACHE, "nodes.dmp"), "w") as f:
        for tid in sorted(nodes):
            parent, rank = nodes[tid]
            f.write("%d\t|\t%d\t|\t%s\t|\n" % (tid, parent, rank))
    with open(os.path.join(CACHE, "names.dmp"), "w") as f:
        for tid in sorted(names):
            f.write("%d\t|\t%s\t|\t\t|\tscientific name\t|\n" % (tid, names[tid]))
    with open(os.path.join(CACHE, "reads.fq"), "w") as f:
        for ri in range(N_READS):
            gi = rng.randrange(N_GENOMES)
            pos = rng.randrange(0, glen - READ_LEN)
            frag = genomes[gi][pos:pos + READ_LEN]
            if rng.random() < 0.5:
                frag = make_fixture.revcomp(frag)
            r = make_fixture.mutate_read(rng, frag, 0.005)
            f.write("@r%06d\n%s\n+\n%s\n" % (ri, r, "I" * READ_LEN))
    open(done, "w").close()


def ensure_our_index():
    prefix = os.path.join(CACHE, "ouridx")
    if os.path.exists(prefix + ".fm.npz") and os.path.exists(prefix + ".meta.json"):
        meta = json.load(open(prefix + ".meta.json"))
        # cached iff rowmap is present OR was intentionally not built
        if os.path.exists(prefix + ".rowmap.npz") or not meta.get("row_map", True):
            return prefix
    from centrifuger_tpu.build import build_index
    log("building our index")
    t0 = time.time()
    build_index([os.path.join(CACHE, "ref.fa")],
                os.path.join(CACHE, "nodes.dmp"),
                os.path.join(CACHE, "names.dmp"),
                os.path.join(CACHE, "ref_seqid.map"),
                conversion_at_file_level=False, output_prefix=prefix)
    log("our index built in %.1fs" % (time.time() - t0))
    return prefix


def measure_reference():
    """reads/sec of the reference binary with all host cores; cached."""
    cache_file = os.path.join(CACHE, "baseline.json")
    key = "%d.%d.%d" % (DB_NT, N_READS, READ_LEN)
    if os.path.exists(cache_file):
        d = json.load(open(cache_file))
        if d.get("key") == key:
            return d["reads_per_sec"]
    ref_bin = os.path.join(REFBUILD, "centrifuger")
    ref_build = os.path.join(REFBUILD, "centrifuger-build")
    if not os.path.exists(ref_bin):
        return None
    prefix = os.path.join(CACHE, "refidx")
    if not os.path.exists(prefix + ".1.cfr"):
        log("building reference index")
        subprocess.run([ref_build, "-r", os.path.join(CACHE, "ref.fa"),
                        "--taxonomy-tree", os.path.join(CACHE, "nodes.dmp"),
                        "--name-table", os.path.join(CACHE, "names.dmp"),
                        "--conversion-table", os.path.join(CACHE, "ref_seqid.map"),
                        "-t", str(os.cpu_count()), "-o", prefix],
                       check=True, capture_output=True)
    nthreads = str(os.cpu_count())
    # startup cost via a tiny run
    tiny = os.path.join(CACHE, "tiny.fq")
    with open(os.path.join(CACHE, "reads.fq")) as f, open(tiny, "w") as g:
        for i, line in enumerate(f):
            if i >= 400:
                break
            g.write(line)
    t0 = time.time()
    subprocess.run([ref_bin, "-x", prefix, "-u", tiny, "-t", nthreads],
                   check=True, capture_output=True)
    t_small = time.time() - t0
    log("reference classify (full)...")
    t0 = time.time()
    with open(os.path.join(CACHE, "ref_out.tsv"), "wb") as outf:
        subprocess.run([ref_bin, "-x", prefix, "-u", os.path.join(CACHE, "reads.fq"),
                        "-t", nthreads], check=True, stdout=outf,
                       stderr=subprocess.DEVNULL)
    t_full = time.time() - t0
    rps = (N_READS - 100) / max(t_full - t_small, 1e-9)
    log("reference: %.0f reads/s (full %.1fs, startup %.1fs, %s threads)"
        % (rps, t_full, t_small, nthreads))
    json.dump({"key": key, "reads_per_sec": rps}, open(cache_file, "w"))
    return rps


def measure_ours(prefix):
    import jax
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches

    platform = jax.devices()[0].platform
    log("device platform: %s" % platform)
    # The tunneled serving device stalls the FIRST device->host fetch of a
    # process for anywhere from seconds to ~6 minutes (environmental lease/
    # handshake; measured 5 s to 380 s across runs with identical code).
    # Time it separately so warmup_cold_sec reports OUR compile+dispatch cost
    # rather than the tunnel's mood.
    import jax.numpy as jnp
    t0 = time.time()
    float(jax.jit(lambda x: x + 1)(jnp.zeros(())))
    t_first_fetch = time.time() - t0
    log("first device fetch (tunnel handshake): %.1fs" % t_first_fetch)
    fm, tax, seqlen, meta = load_index(prefix)
    cl = ClassifierFused(fm, tax, ClassifierParam())
    cl.bucket_q = BATCH_READS   # pad the tail batch: ONE compiled program
    fq = os.path.join(CACHE, "reads.fq")

    # warmup pass: compiles the single shape bucket
    first_ids, first_queries = next(iter_fastq_batches(fq, BATCH_READS))
    t0 = time.time()
    cl.query_batch(first_queries)
    t_warm = time.time() - t0
    log("warmup(+compile): %.1fs" % t_warm)
    t0 = time.time()
    cl.query_batch(first_queries)
    t_warm2 = time.time() - t0
    log("warm re-dispatch of one batch: %.2fs" % t_warm2)

    # timed END-TO-END pass: FASTQ parse + read packing (producer thread,
    # overlapped) + device classify + TSV format (finish workers) + write —
    # the same work the reference binary is timed on (its own pipeline also
    # overlaps input with classification).
    import threading
    import queue as _queue
    out_path = os.path.join(CACHE, "our_out.tsv")

    nreads = 0
    nclass = 0
    trials = []
    # median of N trials (round-4 verdict asked for the median as the
    # defensible statistic; the serving link has real run-to-run variance)
    for trial in range(int(os.environ.get("CFR_BENCH_E2E_TRIALS", 5))):
        nreads = 0
        nclass = 0
        bq2 = _queue.Queue(maxsize=4)

        def producer2(q=bq2):
            for item in cl.iter_prepacked(fq, BATCH_READS):
                q.put(item)
            q.put(None)

        def qitems2(q=bq2):
            while True:
                item = q.get()
                if item is None:
                    return
                yield item

        t0 = time.time()
        th = threading.Thread(target=producer2, daemon=True)
        th.start()
        with open(out_path, "w") as outf:
            outf.write("readID\tseqID\ttaxID\tscore\t2ndBestScore\thitLength\t"
                       "queryLength\tnumMatches\n")
            for lines, nc, nq in cl.serve_tsv_prepacked(qitems2()):
                outf.write("\n".join(lines))
                outf.write("\n")
                nclass += nc
                nreads += nq
        th.join()
        dt = time.time() - t0
        log("e2e trial %d: %.0f reads/s" % (trial, nreads / dt))
        trials.append(dt)
    dt = sorted(trials)[len(trials) // 2]   # median
    log("e2e trials (reads/s): %s -> median" %
        [round(nreads / t) for t in sorted(trials, reverse=True)])
    rps = nreads / dt
    log("ours end-to-end incl FASTQ parse + TSV: %.0f reads/s "
        "(%.1fs, %d/%d classified)" % (rps, dt, nclass, nreads))
    log("engine stats: %s" % cl.stats)

    # byte-compare our TSV against the reference binary's output
    tsv_identical = None
    ref_out = os.path.join(CACHE, "ref_out.tsv")
    if os.path.exists(ref_out):
        with open(out_path, "rb") as f1, open(ref_out, "rb") as f2:
            tsv_identical = f1.read() == f2.read()
        log("TSV vs reference binary: %s"
            % ("IDENTICAL" if tsv_identical else "DIFFERS"))

    # device-program-only throughput (fused classify, no host finalize)
    packs = _pack_batches(cl, fq)
    mhl = cl.param.min_hit_len
    L = packs[0][0][0].shape[1] * 4   # reads arrive 2-bit packed
    dev_rps = _device_only_rps(cl, cl.dev, packs, mhl, L)
    log("device fused-classify only: %.0f reads/s" % dev_rps)
    return (rps, dev_rps, platform, t_warm, t_warm2, tsv_identical,
            cl, packs, t_first_fetch)


def _pack_batches(cl, fq, n_batches=None):
    """Pack the fixture's reads into device-ready batches once."""
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
    packs = []
    for _, queries in iter_fastq_batches(fq, BATCH_READS):
        packs.append(cl._pack_reads(queries)[:2])
        if n_batches and len(packs) >= n_batches:
            break
    return packs


def _device_only_rps(cl, dev, packs, mhl, L):
    """Fused-classify device throughput over pre-packed batches."""
    import numpy as np
    H = L // (mhl + 1) + 1

    def run(reads, lengths):
        return dev.fused_classify(reads, lengths, 1, mhl, H,
                                  cl.param.max_result,
                                  cl.param.max_result_per_hit_factor,
                                  cl.K_OUT, reads[0].shape[0] * cl.U_CAP)

    out = run(*packs[0])
    np.asarray(out["packed"])          # warm (compile + upload)
    t0 = time.time()
    for reads, lengths in packs:
        out = run(reads, lengths)
    np.asarray(out["packed"])
    dt = time.time() - t0
    nreads = sum(p[0][0].shape[0] for p in packs)
    return nreads / dt


def measure_layout_matrix(prefix, cl, packs):
    """Device-only reads/s for the three serving layouts of the same index:
    plain fused rows + rowmap resolve (default), plain without the rowmap
    (LF-walk resolve — the only legal mode at n >= 2^31), and the run-block
    compressed mega-table (reference Sequence_RunBlock.hpp:378-416 tradeoff).
    The driver-visible answer to 'which layout costs what on TPU'."""
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.fm.device import DeviceFM
    fm, tax, seqlen, meta = load_index(prefix)
    mhl = cl.param.min_hit_len
    L = packs[0][0][0].shape[1] * 4
    out = {}
    out["plain_rowmap"] = round(_device_only_rps(cl, cl.dev, packs, mhl, L), 1)
    rm = fm.rowmap
    try:
        fm.rowmap = None
        dev_nr = DeviceFM(fm)
        out["plain_norowmap"] = round(
            _device_only_rps(cl, dev_nr, packs, mhl, L), 1)
    finally:
        fm.rowmap = rm
    dev_rb = DeviceFM(fm, serve_layout="runblock")
    out["runblock"] = round(_device_only_rps(cl, dev_rb, packs, mhl, L), 1)
    return out


def measure_paired(prefix):
    """Paired-end end-to-end reads/s (fragments/sec x 2 mates) on the same
    DB: mates sampled from the same genomes with a 250 bp insert."""
    import random
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    import make_fixture
    p1 = os.path.join(CACHE, "reads_p1.fq")
    p2 = os.path.join(CACHE, "reads_p2.fq")
    if not (os.path.exists(p1) and os.path.exists(p2)):
        rng = random.Random(1234)   # same genome stream as ensure_fixture
        glen = DB_NT // N_GENOMES
        genomes = []
        prev = None
        for i in range(N_GENOMES):
            if i % 2 == 1 and prev is not None:
                g = make_fixture.make_genome(rng, glen, parent=prev,
                                             mut_rate=0.03)
            else:
                g = make_fixture.make_genome(rng, glen)
                prev = g
            genomes.append(g)
        prng = random.Random(777)
        n_pairs = min(N_READS // 2, 25000)
        insert = 250
        with open(p1, "w") as f1, open(p2, "w") as f2:
            for ri in range(n_pairs):
                gi = prng.randrange(N_GENOMES)
                pos = prng.randrange(0, glen - insert)
                frag = genomes[gi][pos:pos + insert]
                r1 = make_fixture.mutate_read(prng, frag[:READ_LEN], 0.005)
                r2 = make_fixture.mutate_read(
                    prng, make_fixture.revcomp(frag[-READ_LEN:]), 0.005)
                f1.write("@p%06d\n%s\n+\n%s\n" % (ri, r1, "I" * READ_LEN))
                f2.write("@p%06d\n%s\n+\n%s\n" % (ri, r2, "I" * READ_LEN))
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
    fm, tax, seqlen, meta = load_index(prefix)
    cl = ClassifierFused(fm, tax, ClassifierParam())
    cl.bucket_q = BATCH_READS // 2

    def batches():
        it1 = iter_fastq_batches(p1, BATCH_READS // 2)
        it2 = iter_fastq_batches(p2, BATCH_READS // 2)
        for (_, q1), (_, q2) in zip(it1, it2):
            yield [(a[0], b[0]) for a, b in zip(q1, q2)]

    # warm one batch (compile)
    first = next(batches())
    cl.query_batch(first)
    n = 0
    t0 = time.time()
    for res in cl.query_pipelined(batches()):
        n += len(res)
    dt = time.time() - t0
    return round(2 * n / dt, 1)   # reads (mates) per second


def measure_big_db(cl_small, packs):
    """Device-only throughput against the big cached DB (no rowmap — the
    n >= 2^31-legal configuration) if tools/make_big_bench.py has built it.
    Reuses the small-DB compiled program: index arrays are jit ARGUMENTS, so
    a bigger index is the same executable.  If a reference-binary index for
    the same DB exists (refidx.*.cfr in the big dir), also measures the
    reference's reads/s on the same read set for a big-DB vs_baseline."""
    import glob as _glob
    dirs = sorted(_glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        "bigdb_*nt")))
    if not dirs:
        return None
    big = dirs[-1]
    prefix = os.path.join(big, "ouridx")
    if not os.path.exists(prefix + ".fm.npz"):
        return None
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    fm, tax, seqlen, meta = load_index(prefix)
    t0 = time.time()
    cl = ClassifierFused(fm, tax, ClassifierParam())
    cl.bucket_q = BATCH_READS
    t_up0 = time.time()
    packs_big = _pack_batches(cl, os.path.join(big, "reads.fq"))
    mhl = cl.param.min_hit_len
    L = packs_big[0][0][0].shape[1] * 4
    rps = _device_only_rps(cl, cl.dev, packs_big, mhl, L)
    out = {"db_nt": fm.n, "layout": "plain_norowmap",
           "min_hit_len": mhl,
           "device_reads_per_sec": round(rps, 1),
           "load_plus_upload_sec": round(t_up0 - t0, 1)}
    ref = _measure_reference_big(big)
    if ref:
        out["baseline_reference_reads_per_sec"] = round(ref, 1)
        out["vs_baseline"] = round(rps / ref, 3)
    return out


def _measure_reference_big(big):
    """reads/s of the reference binary against its own index for the big DB
    (same reads, all host cores, startup-subtracted); cached."""
    cache_file = os.path.join(big, "ref_baseline.json")
    if os.path.exists(cache_file):
        return json.load(open(cache_file)).get("reads_per_sec")
    ref_bin = os.path.join(REFBUILD, "centrifuger")
    prefix = os.path.join(big, "refidx")
    reads = os.path.join(big, "reads.fq")
    if not (os.path.exists(ref_bin) and os.path.exists(prefix + ".1.cfr")):
        return None
    nthreads = str(os.cpu_count())
    n_reads = 0
    with open(reads) as f:
        for _ in f:
            n_reads += 1
    n_reads //= 4
    tiny = os.path.join(big, "tiny.fq")
    with open(reads) as f, open(tiny, "w") as g:
        for i, line in enumerate(f):
            if i >= 400:
                break
            g.write(line)
    t0 = time.time()
    subprocess.run([ref_bin, "-x", prefix, "-u", tiny, "-t", nthreads],
                   check=True, capture_output=True)
    t_small = time.time() - t0
    t0 = time.time()
    subprocess.run([ref_bin, "-x", prefix, "-u", reads, "-t", nthreads],
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    t_full = time.time() - t0
    rps = (n_reads - 100) / max(t_full - t_small, 1e-9)
    log("reference big-DB: %.0f reads/s (full %.1fs, startup %.1fs)"
        % (rps, t_full, t_small))
    json.dump({"reads_per_sec": rps}, open(cache_file, "w"))
    return rps


def measure_int64_device(packs):
    """Device-only classify with idtype FORCED to int64 on the big DB — the
    n >= 2^31 configuration's cost, measured (round-4 verdict asked for one
    int64-forced device number).  Runs LAST: forcing int64 enables x64
    process-globally."""
    import glob as _glob
    dirs = sorted(_glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        "bigdb_*nt")))
    if not dirs:
        return None
    big = dirs[-1]
    prefix = os.path.join(big, "ouridx")
    if not os.path.exists(prefix + ".fm.npz"):
        return None
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.fm.device import DeviceFM
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    fm, tax, seqlen, meta = load_index(prefix)
    cl = ClassifierFused(fm, tax, ClassifierParam())
    cl.dev = DeviceFM(fm, force_idtype="int64")
    cl.bucket_q = BATCH_READS
    packs_big = _pack_batches(cl, os.path.join(big, "reads.fq"), n_batches=6)
    mhl = cl.param.min_hit_len
    L = packs_big[0][0][0].shape[1] * 4
    rps = _device_only_rps(cl, cl.dev, packs_big, mhl, L)
    return {"db_nt": fm.n, "idtype": "int64",
            "device_reads_per_sec": round(rps, 1)}


def measure_rank_roofline(cl):
    """Measured HBM bandwidth of the serving hot op — the wide fused-row rank
    gather (_plain_rank_sym: one 512-byte row per rank) — at the chain-search
    access pattern, vs the chip's HBM peak (BASELINE.md asks for exactly
    this).  Returns achieved GB/s and % of peak.

    Timing forces a VALUE FETCH: under the tunneled serving device
    jax.block_until_ready returns before the computation finishes (measured:
    a 1.1 TFLOP matmul "completes" in 0.2 ms), so dispatch-side timing
    under-reports by orders of magnitude; round-4's 0.62%-of-peak roofline
    was exactly this artifact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    dev = cl.dev
    if dev.plain_rows is None:
        return None
    M = 16384
    iters = 512
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.integers(0, dev.n - 1, M, dtype=np.int64)
                      .astype(np.int32))
    c = jnp.asarray(rng.integers(0, 4, M).astype(np.int32))

    pos2 = jnp.asarray(rng.integers(0, dev.n - 1, M, dtype=np.int64)
                       .astype(np.int32))

    def body(arrs, pos, pos2, c):
        d = dev._bind(arrs)
        def step(i, carry):
            pos, pos2, acc = carry
            # TWO independent dependent chains per step — the production
            # access pattern (backward_extend fetches sp-1 and ep rows as
            # separate pipelined gathers each extend)
            r, sym = d._plain_rank_sym(c, pos)
            r2, sym2 = d._plain_rank_sym(c, pos2)
            # data-dependent next positions: keeps each chain serialized
            # like the real LF walk, and unhoistable
            pos = (pos + r + sym) % (d.n - 1)
            pos2 = (pos2 + r2 + sym2) % (d.n - 1)
            return (pos, pos2, acc + r + r2)
        pos, pos2, acc = jax.lax.fori_loop(
            0, iters, step, (pos, pos2, jnp.zeros(M, jnp.int32)))
        return acc.sum()

    @jax.jit
    def nop(x):
        return x + 1

    f = jax.jit(body)
    float(nop(jnp.zeros(())))
    lat = 1e9
    for _ in range(3):
        t0 = time.time()
        float(nop(jnp.zeros(())))
        lat = min(lat, time.time() - t0)
    float(f(dev.arrs, pos, pos2, c))    # warm (compile + fetch)
    dt = 1e18
    for _ in range(3):
        t0 = time.time()
        float(f(dev.arrs, pos, pos2, c))
        dt = min(dt, time.time() - t0)
    dt = max(dt - lat, 1e-9)
    row_bytes = int(np.asarray(dev.plain_rows).shape[1]) * 4
    bytes_moved = 2 * M * iters * row_bytes
    gbps = bytes_moved / dt / 1e9
    peak = float(os.environ.get("CFR_HBM_PEAK_GBPS", 819))  # v5e HBM
    return {"gather_gbps": round(gbps, 2), "hbm_peak_gbps": peak,
            "pct_peak": round(100 * gbps / peak, 2),
            "rows_per_sec_m": round(2 * M * iters / dt / 1e6, 1),
            "note": "2 parallel serialized %dB-row rank-gather chains "
                    "(backward_extend access pattern), %d lanes, "
                    "fetch-timed" % (row_bytes, M)}


def ensure_ref_tsv():
    """Make sure the reference binary's TSV exists for the byte-diff."""
    ref_bin = os.path.join(REFBUILD, "centrifuger")
    prefix = os.path.join(CACHE, "refidx")
    out = os.path.join(CACHE, "ref_out.tsv")
    if os.path.exists(out) or not os.path.exists(ref_bin) \
            or not os.path.exists(prefix + ".1.cfr"):
        return
    with open(out, "wb") as outf:
        subprocess.run([ref_bin, "-x", prefix, "-u",
                        os.path.join(CACHE, "reads.fq"),
                        "-t", str(os.cpu_count())], check=True, stdout=outf,
                       stderr=subprocess.DEVNULL)


def main():
    ensure_fixture()
    baseline = measure_reference()
    ensure_ref_tsv()
    prefix = ensure_our_index()
    (rps, dev_rps, platform, t_warm, t_warm2, tsv_ok, cl, packs,
     t_first_fetch) = measure_ours(prefix)
    vs = (rps / baseline) if baseline else None
    extra = {
        "device_fused_classify_reads_per_sec": round(dev_rps, 1),
        "baseline_reference_reads_per_sec": round(baseline, 1) if baseline else None,
        "platform": platform,
        "warmup_cold_sec": round(t_warm, 1),
        "tunnel_first_fetch_sec": round(t_first_fetch, 1),
        "warm_batch_sec": round(t_warm2, 3),
        "tsv_identical_to_reference": tsv_ok,
        "db_nt": DB_NT, "n_reads": N_READS, "read_len": READ_LEN,
    }
    if os.environ.get("CFR_BENCH_MATRIX", "1") == "1":
        for name, fn in [
                ("layout_matrix",
                 lambda: measure_layout_matrix(prefix, cl, packs[:4])),
                ("paired_end_reads_per_sec",
                 lambda: measure_paired(prefix)),
                ("big_db", lambda: measure_big_db(cl, packs)),
                ("rank_gather_roofline", lambda: measure_rank_roofline(cl)),
                ("int64_forced", lambda: measure_int64_device(packs))]:
            try:
                extra[name] = fn()
                log("%s: %s" % (name, extra[name]))
            except Exception as e:  # matrix entries are best-effort extras
                log("%s failed: %r" % (name, e))
                extra[name] = None
    print(json.dumps({
        "metric": "classification_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()

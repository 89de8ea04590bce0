"""Generate the big-DB bench fixture + index (default 300 Mnt, no rowmap).

Creates .bench_cache/bigdb_{N}nt/ with ref genomes, 50k single-end 100 bp
reads, and our index built WITHOUT the rowmap accelerator — the serving
configuration that stays legal at n >= 2^31 (fm/device.py refuses a rowmap
there), and the one where SA resolution is a real LF walk instead of one
gather.  bench.py reports a device-only throughput for this DB in its extras
when the fixture exists (see measure_big_db).

Usage: python tools/make_big_bench.py [n_nt]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASES = np.frombuffer(b"ACGT", np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65}


def gen_genomes(n_nt, n_genomes, seed=77):
    rng = np.random.default_rng(seed)
    glen = n_nt // n_genomes
    genomes = []
    prev = None
    for i in range(n_genomes):
        if i % 2 == 1 and prev is not None:
            g = prev.copy()
            nmut = int(0.03 * glen)
            pos = rng.integers(0, glen, nmut)
            g[pos] = BASES[rng.integers(0, 4, nmut)]
        else:
            g = BASES[rng.integers(0, 4, glen)]
            prev = g
        genomes.append(g)
    return genomes


def main():
    n_nt = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000_000
    n_genomes = 20
    n_reads = 50_000
    read_len = 100
    cache = os.path.join(REPO, ".bench_cache", "bigdb_%dnt" % n_nt)
    os.makedirs(cache, exist_ok=True)
    done = os.path.join(cache, "fixture.done")
    if not os.path.exists(done):
        t0 = time.time()
        genomes = gen_genomes(n_nt, n_genomes)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import make_fixture
        nodes, names, seq_taxids = make_fixture.make_taxonomy(n_genomes)
        with open(os.path.join(cache, "ref.fa"), "wb") as f:
            for i, g in enumerate(genomes):
                f.write(b">SEQ_%06d\n" % i)
                gl = len(g)
                for j in range(0, gl, 1 << 20):
                    chunk = g[j:j + (1 << 20)]
                    # 70-col wrap via reshape
                    pad = (-len(chunk)) % 70
                    rows = np.concatenate(
                        [chunk, np.zeros(pad, np.uint8)]).reshape(-1, 70)
                    out = np.concatenate(
                        [rows, np.full((rows.shape[0], 1), 10, np.uint8)],
                        axis=1).reshape(-1)
                    out = out[out != 0]
                    f.write(out.tobytes())
        with open(os.path.join(cache, "ref_seqid.map"), "w") as f:
            for i, t in enumerate(seq_taxids):
                f.write("SEQ_%06d\t%d\n" % (i, t))
        with open(os.path.join(cache, "nodes.dmp"), "w") as f:
            for tid in sorted(nodes):
                parent, rank = nodes[tid]
                f.write("%d\t|\t%d\t|\t%s\t|\n" % (tid, parent, rank))
        with open(os.path.join(cache, "names.dmp"), "w") as f:
            for tid in sorted(names):
                f.write("%d\t|\t%s\t|\t\t|\tscientific name\t|\n"
                        % (tid, names[tid]))
        rng = np.random.default_rng(1234)
        glen = n_nt // n_genomes
        with open(os.path.join(cache, "reads.fq"), "wb") as f:
            qual = b"I" * read_len
            for ri in range(n_reads):
                gi = int(rng.integers(0, n_genomes))
                pos = int(rng.integers(0, glen - read_len))
                frag = genomes[gi][pos:pos + read_len].copy()
                nmut = int(rng.binomial(read_len, 0.005))
                if nmut:
                    mp = rng.integers(0, read_len, nmut)
                    frag[mp] = BASES[rng.integers(0, 4, nmut)]
                if rng.random() < 0.5:
                    frag = np.array([COMP[int(b)] for b in frag[::-1]],
                                    np.uint8)
                f.write(b"@r%06d\n%s\n+\n%s\n"
                        % (ri, frag.tobytes(), qual))
        open(done, "w").close()
        print("fixture generated in %.1fs" % (time.time() - t0))

    prefix = os.path.join(cache, "ouridx")
    if not os.path.exists(prefix + ".fm.npz"):
        from centrifuger_tpu.build import build_index
        t0 = time.time()
        build_index([os.path.join(cache, "ref.fa")],
                    os.path.join(cache, "nodes.dmp"),
                    os.path.join(cache, "names.dmp"),
                    os.path.join(cache, "ref_seqid.map"),
                    conversion_at_file_level=False, output_prefix=prefix,
                    row_map=False)
        print("index built in %.1fs" % (time.time() - t0))
    serve_cache = prefix + ".serve_plain.npz"
    if not os.path.exists(serve_cache):
        # pre-warm the derived serving-table cache so bench.py's load is IO,
        # not a multi-minute decode (host-only; no device touched)
        from centrifuger_tpu.build import load_index
        from centrifuger_tpu.fm.device import serve_plain_rows_np
        t0 = time.time()
        fm, _, _, _ = load_index(prefix)
        serve_plain_rows_np(fm)
        print("serving-table cache built in %.1fs" % (time.time() - t0))
    print("big bench fixture ready:", cache)


if __name__ == "__main__":
    main()

"""Generate synthetic test fixtures and golden outputs via the reference binaries.

The reference repo's bundled example is missing its ref.fa blob, so we build our own
fixtures: random genomes hung off a small taxonomy tree, reads sampled with errors from
both strands, and golden classification TSVs produced by the compiled reference
(mourisl/centrifuger) binaries in .refbuild/.

Usage:
  python tools/make_fixture.py --out tests/fixtures/small --n-genomes 6 --genome-len 20000 \
      --n-reads 300 --paired
"""

import argparse
import os
import random
import subprocess
import sys

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")

BASES = "ACGT"
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def make_genome(rng, length, parent=None, mut_rate=0.02):
    """Random genome; optionally a mutated copy of a parent (sister strain)."""
    if parent is None:
        g = [rng.choice(BASES) for _ in range(length)]
        # inject some repeats to create multi-hit SA ranges
        for _ in range(max(1, length // 5000)):
            rep = [rng.choice(BASES) for _ in range(rng.randint(50, 200))]
            for _ in range(rng.randint(2, 4)):
                pos = rng.randrange(0, length - len(rep))
                g[pos:pos + len(rep)] = rep
        return "".join(g)
    g = list(parent[:length])
    for i in range(len(g)):
        if rng.random() < mut_rate:
            g[i] = rng.choice(BASES)
    return "".join(g)


def make_taxonomy(n_genomes):
    """Small tree: root(1) - phylum(10) - genus(100+i) - species(1000+i) - strain(10000+i)."""
    nodes = {1: (1, "no rank")}
    names = {1: "root"}
    nodes[10] = (1, "phylum")
    names[10] = "Testphylum"
    seq_taxids = []
    for i in range(n_genomes):
        genus = 100 + i // 2  # pairs of genomes share a genus
        species = 1000 + i
        strain = 10000 + i
        if genus not in nodes:
            nodes[genus] = (10, "genus")
            names[genus] = "Genus_%d" % genus
        nodes[species] = (genus, "species")
        names[species] = "Species_%d" % species
        nodes[strain] = (species, "strain")
        names[strain] = "Strain_%d" % strain
        seq_taxids.append(strain)
    return nodes, names, seq_taxids


def mutate_read(rng, s, err=0.01):
    out = []
    for c in s:
        r = rng.random()
        if r < err:
            out.append(rng.choice(BASES))
        elif r < err * 1.2:
            out.append("N")
        else:
            out.append(c)
    return "".join(out)


AA = "ARNDCEQGHILKMFPSTWYV"
# codon table for reverse translation
_CODONS = {}


def _build_codons():
    std = {
        "K": ["AAA", "AAG"], "N": ["AAC", "AAT"], "T": ["ACA", "ACC", "ACG", "ACT"],
        "R": ["AGA", "AGG", "CGA", "CGC", "CGG", "CGT"], "S": ["AGC", "AGT", "TCA", "TCC", "TCG", "TCT"],
        "I": ["ATA", "ATC", "ATT"], "M": ["ATG"], "Q": ["CAA", "CAG"], "H": ["CAC", "CAT"],
        "P": ["CCA", "CCC", "CCG", "CCT"], "L": ["CTA", "CTC", "CTG", "CTT", "TTA", "TTG"],
        "E": ["GAA", "GAG"], "D": ["GAC", "GAT"], "A": ["GCA", "GCC", "GCG", "GCT"],
        "G": ["GGA", "GGC", "GGG", "GGT"], "V": ["GTA", "GTC", "GTG", "GTT"],
        "Y": ["TAC", "TAT"], "W": ["TGG"], "C": ["TGC", "TGT"], "F": ["TTC", "TTT"],
    }
    _CODONS.update(std)


_build_codons()


def make_protein_genome(rng, length):
    return "".join(rng.choice(AA) for _ in range(length))


def reverse_translate(rng, aa_seq):
    return "".join(rng.choice(_CODONS[a]) for a in aa_seq)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-genomes", type=int, default=6)
    ap.add_argument("--genome-len", type=int, default=20000)
    ap.add_argument("--n-reads", type=int, default=300)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--paired", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--err", type=float, default=0.01)
    ap.add_argument("--rbbwt-b", type=int, default=None, help="pass --rbbwt-b to reference build")
    ap.add_argument("--protein", action="store_true",
                    help="amino-acid genomes + DNA reads for translated search")
    ap.add_argument("--skip-golden", action="store_true")
    args = ap.parse_args()

    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)

    nodes, names, seq_taxids = make_taxonomy(args.n_genomes)

    genomes = []
    prev = None
    for i in range(args.n_genomes):
        if args.protein:
            genomes.append(make_protein_genome(rng, args.genome_len))
            continue
        if i % 2 == 1 and prev is not None:
            g = make_genome(rng, args.genome_len, parent=prev, mut_rate=0.03)
        else:
            g = make_genome(rng, args.genome_len)
            prev = g
        genomes.append(g)

    with open(os.path.join(args.out, "ref.fa"), "w") as f:
        for i, g in enumerate(genomes):
            f.write(">SEQ_%06d some description %d\n" % (i, i))
            for j in range(0, len(g), 70):
                f.write(g[j:j + 70] + "\n")

    with open(os.path.join(args.out, "ref_seqid.map"), "w") as f:
        for i, t in enumerate(seq_taxids):
            f.write("SEQ_%06d\t%d\n" % (i, t))

    with open(os.path.join(args.out, "nodes.dmp"), "w") as f:
        for tid in sorted(nodes):
            parent, rank = nodes[tid]
            f.write("%d\t|\t%d\t|\t%s\t|\n" % (tid, parent, rank))

    with open(os.path.join(args.out, "names.dmp"), "w") as f:
        for tid in sorted(names):
            f.write("%d\t|\t%s\t|\t\t|\tscientific name\t|\n" % (tid, names[tid]))

    # reads
    r1_path = os.path.join(args.out, "reads_1.fq")
    r2_path = os.path.join(args.out, "reads_2.fq")
    f1 = open(r1_path, "w")
    f2 = open(r2_path, "w") if args.paired else None
    L = args.read_len
    for ri in range(args.n_reads):
        kind = rng.random()
        if kind < 0.05:  # unclassifiable random read
            frag = "".join(rng.choice(BASES) for _ in range(2 * L + 50))
            gi = -1
        elif args.protein:
            gi = rng.randrange(args.n_genomes)
            fraglen = 2 * L + rng.randint(0, 60) if args.paired else L + 10
            aalen = fraglen // 3 + 2
            pos = rng.randrange(0, len(genomes[gi]) - aalen)
            frag = reverse_translate(rng, genomes[gi][pos:pos + aalen])
            lead = rng.randint(0, 2)  # random frame offset
            frag = frag[lead:lead + fraglen]
        else:
            gi = rng.randrange(args.n_genomes)
            fraglen = 2 * L + rng.randint(0, 200) if args.paired else L
            pos = rng.randrange(0, len(genomes[gi]) - fraglen)
            frag = genomes[gi][pos:pos + fraglen]
        strand = rng.random() < 0.5
        if strand:
            frag = revcomp(frag)
        r1 = mutate_read(rng, frag[:L], args.err)
        q1 = "".join(chr(33 + rng.randint(20, 40)) for _ in range(L))
        rid = "read%06d_g%d" % (ri, gi)
        f1.write("@%s\n%s\n+\n%s\n" % (rid, r1, q1))
        if args.paired:
            r2 = mutate_read(rng, revcomp(frag[-L:]), args.err)
            q2 = "".join(chr(33 + rng.randint(20, 40)) for _ in range(L))
            f2.write("@%s\n%s\n+\n%s\n" % (rid, r2, q2))
    f1.close()
    if f2:
        f2.close()

    if args.skip_golden:
        return

    # Build reference index + golden classifications
    env = dict(os.environ)
    build_cmd = [
        os.path.join(REFBUILD, "centrifuger-build"),
        "-r", os.path.join(args.out, "ref.fa"),
        "--taxonomy-tree", os.path.join(args.out, "nodes.dmp"),
        "--name-table", os.path.join(args.out, "names.dmp"),
        "--conversion-table", os.path.join(args.out, "ref_seqid.map"),
        "-o", os.path.join(args.out, "refidx"),
    ]
    if args.rbbwt_b is not None:
        build_cmd += ["--rbbwt-b", str(args.rbbwt_b)]
    if args.protein:
        build_cmd += ["--protein"]
    subprocess.run(build_cmd, check=True, capture_output=True)

    for tag, extra in [("k1", []), ("k5", ["-k", "5"]), ("k2", ["-k", "2"])]:
        cls_cmd = [os.path.join(REFBUILD, "centrifuger"),
                   "-x", os.path.join(args.out, "refidx"),
                   "-1", r1_path, "-2", r2_path] if args.paired else \
                  [os.path.join(REFBUILD, "centrifuger"),
                   "-x", os.path.join(args.out, "refidx"), "-u", r1_path]
        cls_cmd += extra
        out = subprocess.run(cls_cmd, check=True, capture_output=True, env=env)
        with open(os.path.join(args.out, "golden_class_%s.tsv" % tag), "wb") as f:
            f.write(out.stdout)

    # golden quant (centrifuger + kreport format) on the k1 output
    for fmt, name in [(0, "centrifuger"), (3, "kreport")]:
        q = subprocess.run([os.path.join(REFBUILD, "centrifuger-quant"),
                            "-x", os.path.join(args.out, "refidx"),
                            "-c", os.path.join(args.out, "golden_class_k1.tsv"),
                            "--output-format", str(fmt)],
                           check=True, capture_output=True)
        with open(os.path.join(args.out, "golden_quant_%s.tsv" % name), "wb") as f:
            f.write(q.stdout)

    print("fixture written to", args.out, file=sys.stderr)


if __name__ == "__main__":
    main()

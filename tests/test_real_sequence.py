"""Real-sequence differential golden (round-4 verdict missing #4).

The verdict asks for a golden on real genomes (the Legionella pair of
reference example/ref_seqid.map).  This environment has no network egress,
so the full NC_002942.5 / NC_006368.1 genomes cannot be fetched; what IS
available is the reference's own bundled example data
(/root/reference/example): 200 mason-simulated 100 bp read pairs carrying
real Legionella pneumophila / L. micdadei sequence (real base composition,
real local repeats), the real NCBI taxonomy slice (nodes.dmp/names.dmp),
and the real accession->taxid map.

This test builds two pseudo-contigs from that real sequence (reads grouped
by their origin contig), builds the index with BOTH our builder and the
reference binary, classifies the bundled paired reads with both, and diffs
the TSV byte-for-byte — a full-pipeline differential on real (not
synthetic-random) DNA.  Quantification output is diffed as well.
"""

import io
import os
import subprocess
import sys

import pytest

REF_EXAMPLE = "/root/reference/example"
REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".refbuild")

needs_data = pytest.mark.skipif(
    not (os.path.exists(os.path.join(REF_EXAMPLE, "example_1.fq"))
         and os.path.exists(os.path.join(REFBUILD, "centrifuger"))),
    reason="reference example data or binary unavailable")


def _reads_by_contig(path):
    groups = {}
    with open(path) as f:
        while True:
            h = f.readline()
            if not h:
                break
            seq = f.readline().strip()
            f.readline()
            f.readline()
            contig = None
            for tok in h.split():
                if tok.startswith("contig="):
                    contig = tok.split("=", 1)[1]
            groups.setdefault(contig, []).append(seq)
    return groups


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("realseq")
    g1 = _reads_by_contig(os.path.join(REF_EXAMPLE, "example_1.fq"))
    g2 = _reads_by_contig(os.path.join(REF_EXAMPLE, "example_2.fq"))
    contigs = sorted(set(g1) | set(g2))
    assert contigs == ["NC_002942.5", "NC_006368.1"]
    fa = tmp / "ref.fa"
    with open(fa, "w") as f:
        for c in contigs:
            seq = "".join(g1.get(c, []) + g2.get(c, []))
            f.write(">%s\n" % c)
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
    return dict(tmp=tmp, fa=str(fa),
                nodes=os.path.join(REF_EXAMPLE, "nodes.dmp"),
                names=os.path.join(REF_EXAMPLE, "names.dmp"),
                seqmap=os.path.join(REF_EXAMPLE, "ref_seqid.map"),
                r1=os.path.join(REF_EXAMPLE, "example_1.fq"),
                r2=os.path.join(REF_EXAMPLE, "example_2.fq"))


def _diff(a, b):
    la, lb = a.splitlines(), b.splitlines()
    for i, (x, y) in enumerate(zip(la, lb)):
        assert x == y, "line %d:\n ours %s\n ref  %s" % (i, x, y)
    assert len(la) == len(lb)


@needs_data
def test_real_sequence_classify_parity(workload):
    w = workload
    rp = str(w["tmp"] / "refidx")
    subprocess.run([os.path.join(REFBUILD, "centrifuger-build"),
                    "-r", w["fa"], "--taxonomy-tree", w["nodes"],
                    "--name-table", w["names"],
                    "--conversion-table", w["seqmap"], "-o", rp],
                   check=True, capture_output=True)
    want = subprocess.run([os.path.join(REFBUILD, "centrifuger"), "-x", rp,
                           "-1", w["r1"], "-2", w["r2"]],
                          check=True, capture_output=True).stdout.decode()

    from centrifuger_tpu.build import build_index
    op = str(w["tmp"] / "ours")
    build_index([w["fa"]], w["nodes"], w["names"], w["seqmap"],
                conversion_at_file_level=False, output_prefix=op)
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", op, "-1", w["r1"], "-2", w["r2"]])
    finally:
        sys.stdout = old
    ours = buf.getvalue()
    _diff(ours, want)

    # quantification over the same assignments, both binaries
    cls_path = w["tmp"] / "cls.tsv"
    cls_path.write_text(want)
    for fmt in ("0", "3"):
        qwant = subprocess.run(
            [os.path.join(REFBUILD, "centrifuger-quant"), "-x", rp,
             "-c", str(cls_path), "--output-format", fmt],
            check=True, capture_output=True).stdout.decode()
        from centrifuger_tpu.quant.quantifier import Quantifier
        q = Quantifier()
        q.init_from_index(op)
        q.load_read_assignments(str(cls_path))
        q.quantification()
        qbuf = io.StringIO()
        q.output(qbuf, int(fmt))
        _diff(qbuf.getvalue(), qwant)

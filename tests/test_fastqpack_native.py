"""Native FASTQ parse+pack (native/fastqpack.cpp) parity vs the Python
reader + ClassifierFused._pack_reads: identical pack2/vmask/lengths/ids,
lazy query spans materialize the right bytes, and unusual inputs fall back
mid-stream without losing records."""

import gzip
import os

import numpy as np
import pytest

from conftest import FIXTURE_DIR


def _mk_fastq(tmp, records, trailing_nl=True, crlf=False):
    p = tmp / "r.fq"
    out = []
    for rid, seq in records:
        out += ["@" + rid, seq, "+", "I" * len(seq)]
    data = "\n".join(out) + ("\n" if trailing_nl else "")
    if crlf:
        data = data.replace("\n", "\r\n")
    p.write_bytes(data.encode())
    return str(p)


def _engine():
    from centrifuger_tpu.build import build_index, load_index
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam
    fx = os.path.join(FIXTURE_DIR, "tiny")
    import tempfile
    tmp = tempfile.mkdtemp()
    prefix = os.path.join(tmp, "idx")
    build_index([os.path.join(fx, "ref.fa")],
                os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"),
                os.path.join(fx, "ref_seqid.map"),
                conversion_at_file_level=False, output_prefix=prefix)
    fm, tax, seqlen, meta = load_index(prefix)
    return ClassifierFused(fm, tax, ClassifierParam())


RECORDS = [
    ("r0 extra words", "ACGTACGTACGTACGTNNACGT"),
    ("r1/1", "acgtacgtACGTACGT"),
    ("r2\textra", "TTTTGGGGCCCCAAAA" * 3),
    ("r3", "A"),
    ("r4", "ACGTXACGTRYACGT"),
]


@pytest.mark.parametrize("crlf", [False, True])
@pytest.mark.parametrize("trailing_nl", [True, False])
def test_native_pack_parity(tmp_path, crlf, trailing_nl):
    cl = _engine()
    cl.bucket_q = 8
    path = _mk_fastq(tmp_path, RECORDS, trailing_nl=trailing_nl, crlf=crlf)
    from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
    got = list(cl.iter_prepacked(path, 8))
    want = []
    for ids, queries in iter_fastq_batches(path, 8):
        reads, lengths, nr, Q0 = cl._pack_reads(queries)[:4]
        want.append((ids, queries, reads, lengths, nr, Q0))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0], "ids differ"
        assert np.array_equal(g[2][0], w[2][0]), "pack2 differs"
        assert np.array_equal(g[2][1], w[2][1]), "vmask differs"
        assert np.array_equal(g[3], w[3]), "lengths differ"
        assert g[4] == w[4] and g[5] == w[5]
        # lazy queries materialize the raw bytes
        for i in range(g[5]):
            r1g, _ = g[1][i]
            r1w, _ = w[1][i]
            assert np.array_equal(np.asarray(r1g), np.asarray(r1w))
            assert len(list(g[1])[i][0]) == len(r1w)


def test_native_pack_gzip_and_batching(tmp_path):
    cl = _engine()
    cl.bucket_q = 4
    recs = [("q%03d" % i, "ACGT" * (5 + i % 7)) for i in range(11)]
    plain = _mk_fastq(tmp_path, recs)
    gz = str(tmp_path / "r.fq.gz")
    with open(plain, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    got = list(cl.iter_prepacked(gz, 4))
    assert [g[5] for g in got] == [4, 4, 3]
    assert got[0][0] == ["q000", "q001", "q002", "q003"]
    # padded to the bucket
    assert got[2][2][0].shape[0] == 4


def test_native_pack_multiline_fallback(tmp_path):
    cl = _engine()
    cl.bucket_q = 4
    p = tmp_path / "m.fq"
    p.write_text("@a\nACGTACGT\nACGT\n+\nIIIIIIII\nIIII\n"
                 "@b\nTTTT\n+\nIIII\n")
    got = list(cl.iter_prepacked(str(p), 4))
    ids = [i for g in got for i in g[0]]
    assert ids == ["a", "b"]
    lens = [len(q[0]) for g in got for q in g[1]]
    assert lens == [12, 4]

"""Unit tests for the bulk chunked FASTQ parser (io/fastq_fast.py):
chunk-boundary records, gzip, id semantics, CRLF, multi-line fallback,
truncated tails — differential vs the general reader (io/readers.py)."""

import gzip
import os

import numpy as np
import pytest

from centrifuger_tpu.io.fastq_fast import iter_fastq_batches
from centrifuger_tpu.io.readers import ReadFiles


def _write(tmp_path, name, text, gz=False):
    p = os.path.join(str(tmp_path), name)
    data = text if isinstance(text, bytes) else text.encode()
    if gz:
        with gzip.open(p, "wb") as f:
            f.write(data)
    else:
        with open(p, "wb") as f:
            f.write(data)
    return p


def _collect(path, batch_size=3):
    ids, seqs = [], []
    for bids, queries in iter_fastq_batches(path, batch_size):
        ids.extend(bids)
        seqs.extend(bytes(q[0]).decode() for q in queries)
    return ids, seqs


def _general(path):
    rf = ReadFiles()
    rf.add_read_file(path)
    ids, seqs = [], []
    for r in rf:
        ids.append(r.id)
        seqs.append(r.seq)
    return ids, seqs


def _fastq(n, lens=None):
    out = []
    for i in range(n):
        ln = 60 if lens is None else lens[i % len(lens)]
        seq = "ACGT" * (ln // 4) + "ACGT"[:ln % 4]
        out.append("@r%d some comment\n%s\n+\n%s\n" % (i, seq, "I" * ln))
    return "".join(out)


def test_basic_batches_and_ids(tmp_path):
    p = _write(tmp_path, "a.fq", _fastq(10))
    ids, seqs = _collect(p, batch_size=4)
    assert ids == ["r%d" % i for i in range(10)]
    assert all(len(s) == 60 for s in seqs)
    gids, gseqs = _general(p)
    assert ids == gids and seqs == gseqs


def test_chunk_boundary_records(tmp_path):
    # tiny chunk size forces records to straddle every chunk boundary
    text = _fastq(50, lens=[1, 7, 60, 129, 3])
    p = _write(tmp_path, "b.fq", text)
    ids, seqs = [], []
    for bids, queries in iter_fastq_batches(p, 7, chunk_bytes=64):
        ids.extend(bids)
        seqs.extend(bytes(q[0]).decode() for q in queries)
    gids, gseqs = _general(p)
    assert ids == gids and seqs == gseqs


def test_gzip(tmp_path):
    p = _write(tmp_path, "c.fq.gz", _fastq(9), gz=True)
    ids, seqs = _collect(p)
    gids, gseqs = _general(p)
    assert ids == gids and seqs == gseqs


def test_mate_suffix_strip(tmp_path):
    p = _write(tmp_path, "d.fq", "@x/1\nACGTACGT\n+\nIIIIIIII\n"
                                 "@y/2 c\nTTTT\n+\nIIII\n")
    ids, seqs = _collect(p)
    assert ids == ["x", "y"]
    gids, _ = _general(p)
    assert ids == gids


def test_crlf_stripped(tmp_path):
    # CRLF FASTQ: kseq strips '\r'; the bulk parser must not leak it into
    # the sequence (advisor round-3 finding)
    text = "@r0 c\r\nACGTACGTAA\r\n+\r\nIIIIIIIIII\r\n@r1\r\nTTTTT\r\n+\r\nIIIII\r\n"
    p = _write(tmp_path, "e.fq", text)
    ids, seqs = _collect(p)
    assert ids == ["r0", "r1"]
    assert seqs == ["ACGTACGTAA", "TTTTT"]


def test_crlf_across_chunk_boundary(tmp_path):
    recs = "".join("@r%d\r\nACGTACGTAA\r\n+\r\nIIIIIIIIII\r\n" % i
                   for i in range(40))
    p = _write(tmp_path, "f.fq", recs)
    ids, seqs = [], []
    for bids, queries in iter_fastq_batches(p, 6, chunk_bytes=37):
        ids.extend(bids)
        seqs.extend(bytes(q[0]).decode() for q in queries)
    assert ids == ["r%d" % i for i in range(40)]
    assert all(s == "ACGTACGTAA" for s in seqs)


def test_multiline_fallback(tmp_path):
    # legal kseq multi-line records must parse (slow-path fallback), not crash
    text = ("@r0\nACGTAC\nGTACGT\n+\nIIIIII\nIIIIII\n"
            "@r1\nAAAA\n+\nIIII\n"
            "@r2\nCC\nCC\nCC\n+ comment\nIII\nIII\n")
    p = _write(tmp_path, "g.fq", text)
    ids, seqs = _collect(p, batch_size=2)
    assert ids == ["r0", "r1", "r2"]
    assert seqs == ["ACGTACGTACGT", "AAAA", "CCCCCC"]


def test_multiline_after_plain_prefix(tmp_path):
    # fast path handles the strict prefix, then switches to the state machine
    text = _fastq(8) + "@m0\nAAAA\nCCCC\n+\nIIIIIIII\n" + _fastq(3)
    # note: the trailing _fastq(3) ids repeat r0..r2; rename them
    text = text.replace("@r0 some comment\nACGT", "@t0 some comment\nACGT", 1) \
        if False else text
    p = _write(tmp_path, "h.fq", text)
    ids, seqs = _collect(p, batch_size=4)
    assert len(ids) == 12
    assert seqs[8] == "AAAACCCC"
    # records after the multi-line one still parse
    assert seqs[9] == "ACGT" * 15


def test_empty_id_header(tmp_path):
    # '@' alone or '@ comment' must not crash the parser (advisor finding)
    text = "@\nACGT\n+\nIIII\n@ onlycomment\nTTTT\n+\nIIII\n"
    p = _write(tmp_path, "i.fq", text)
    ids, seqs = _collect(p)
    assert ids == ["", ""]
    assert seqs == ["ACGT", "TTTT"]


def test_no_trailing_newline(tmp_path):
    text = "@r0\nACGT\n+\nIIII\n@r1\nTTTTT\n+\nIIIII"   # no final \n
    p = _write(tmp_path, "j.fq", text)
    ids, seqs = _collect(p)
    assert ids == ["r0", "r1"]
    assert seqs == ["ACGT", "TTTTT"]


def test_queries_are_uint8_arrays(tmp_path):
    p = _write(tmp_path, "k.fq", _fastq(3))
    for _, queries in iter_fastq_batches(p, 8):
        for q, mate in queries:
            assert isinstance(q, np.ndarray) and q.dtype == np.uint8
            assert mate is None

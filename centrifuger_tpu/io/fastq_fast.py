"""Bulk FASTQ batch reader for the TSV serving fast path.

Parses strict 4-line FASTQ (plain or gzip) in large chunks, yielding
(read_ids, queries) batches where queries are (np.uint8 array, None) tuples
ready for ClassifierFused._pack_reads — no per-read object construction.
Read-id semantics match io.readers.ReadFiles (token up to first whitespace,
trailing /1 or /2 stripped; reference ReadFiles.hpp:82-90).  CRLF line
endings are normalized (kseq strips the '\\r').

Multi-line FASTQ records (legal per kseq) are detected by the '+' separator
check; from that point on the file is parsed with a kseq-style state machine
(seq lines until '+', qual lines until len(qual) >= len(seq)) so the fast
path degrades gracefully instead of erroring.
"""

import gzip

import numpy as np


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _rid(header):
    rid = header[1:]
    i = rid.find(b" ")
    j = rid.find(b"\t")
    if j != -1 and (i == -1 or j < i):
        i = j
    if i != -1:
        rid = rid[:i]
    if rid[-2:] in (b"/1", b"/2"):
        rid = rid[:-2]
    return rid.decode()


def _iter_lines(f, leftover, chunk_bytes):
    """Yield complete lines (no trailing newline, CRLF normalized) starting
    from `leftover` + the rest of the open file."""
    while True:
        chunk = f.read(chunk_bytes)
        if not chunk:
            break
        data = leftover + chunk
        if b"\r" in data:
            data = data.replace(b"\r\n", b"\n")
        lines = data.split(b"\n")
        leftover = lines.pop()
        for ln in lines:
            yield ln
    if leftover:
        if leftover.endswith(b"\r"):
            leftover = leftover[:-1]
        yield leftover


def _slow_records(line_iter, carry):
    """kseq-style record parser over a line stream: header '@...'; seq lines
    until a line starting with '+'; qual lines until len(qual) >= len(seq)
    (reference kseq.h record grammar).  `carry` is a list of already-read
    lines to consume first."""
    def lines():
        for ln in carry:
            yield ln
        for ln in line_iter:
            yield ln

    it = lines()
    header = None
    for ln in it:
        if ln[:1] == b"@":
            header = ln
            break
    while header is not None:
        seq_parts = []
        nxt_header = None
        for ln in it:
            if ln[:1] == b"+":
                break
            seq_parts.append(ln)
        else:
            ln = None
        seq = b"".join(seq_parts)
        qual_len = 0
        for qln in it:
            qual_len += len(qln)
            if qual_len >= len(seq):
                break
        # find the next record header
        nxt_header = None
        for ln in it:
            if ln[:1] == b"@":
                nxt_header = ln
                break
        yield header, seq
        header = nxt_header


def iter_fastq_batches(path, batch_size, chunk_bytes=1 << 24):
    """Yield (ids list[str], queries list[(uint8 ndarray, None)]) batches."""
    ids, queries = [], []
    with _open(path) as f:
        line_iter = _iter_lines(f, b"", chunk_bytes)
        buf = []
        slow_carry = None
        for ln in line_iter:
            buf.append(ln)
            if len(buf) < 4:
                continue
            if buf[2][:1] != b"+":
                # multi-line or malformed record: switch to the kseq-style
                # state machine for the rest of this file
                slow_carry = buf
                break
            ids.append(_rid(buf[0]))
            queries.append((np.frombuffer(buf[1], np.uint8), None))
            buf = []
            if len(ids) >= batch_size:
                yield ids, queries
                ids, queries = [], []
        if slow_carry is not None:
            for header, seq in _slow_records(line_iter, slow_carry):
                ids.append(_rid(header))
                queries.append((np.frombuffer(seq, np.uint8), None))
                if len(ids) >= batch_size:
                    yield ids, queries
                    ids, queries = [], []
        elif buf and buf[0][:1] == b"@" and len(buf) >= 2:
            # trailing record missing its quality lines (truncated file):
            # keep parity with the general reader, which still yields the seq
            ids.append(_rid(buf[0]))
            queries.append((np.frombuffer(buf[1], np.uint8), None))
    if ids:
        yield ids, queries

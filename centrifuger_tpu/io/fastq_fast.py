"""Bulk FASTQ batch reader for the TSV serving fast path.

Parses strict 4-line FASTQ (plain or gzip) in large chunks, yielding
(read_ids, queries) batches where queries are (np.uint8 array, None) tuples
ready for ClassifierFused._pack_reads — no per-read object construction.
Read-id semantics match io.readers.ReadFiles (token up to first whitespace,
trailing /1 or /2 stripped; reference ReadFiles.hpp:82-90).

Multi-line FASTQ records (legal per kseq) are detected by the '+' separator
check and raise ValueError so the caller can fall back to the general
record-oriented reader.
"""

import gzip

import numpy as np


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _rid(header):
    rid = header[1:].split(None, 1)[0]
    if rid[-2:] in (b"/1", b"/2"):
        rid = rid[:-2]
    return rid.decode()


def iter_fastq_batches(path, batch_size, chunk_bytes=1 << 24):
    """Yield (ids list[str], queries list[(uint8 ndarray, None)]) batches."""
    ids, queries = [], []
    leftover = b""
    with _open(path) as f:
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk:
                break
            data = leftover + chunk
            lines = data.split(b"\n")
            tail_line = lines.pop()           # possibly incomplete
            nrec = len(lines) // 4
            extra = lines[nrec * 4:]
            leftover = b"\n".join(extra + [tail_line])
            for i in range(0, nrec * 4, 4):
                if not lines[i + 2].startswith(b"+"):
                    raise ValueError(
                        "multi-line or malformed FASTQ record near %r; "
                        "use the general reader" % lines[i][:40])
                ids.append(_rid(lines[i]))
                queries.append((np.frombuffer(lines[i + 1], np.uint8), None))
                if len(ids) >= batch_size:
                    yield ids, queries
                    ids, queries = [], []
    # complete records remaining in the leftover buffer
    lines = [ln for ln in leftover.split(b"\n")]
    while lines and not lines[-1]:
        lines.pop()
    for i in range(0, len(lines) - len(lines) % 4, 4):
        if not lines[i + 2].startswith(b"+"):
            raise ValueError("multi-line or malformed FASTQ record at EOF")
        ids.append(_rid(lines[i]))
        queries.append((np.frombuffer(lines[i + 1], np.uint8), None))
        if len(ids) >= batch_size:
            yield ids, queries
            ids, queries = [], []
    if ids:
        yield ids, queries

"""cfr-classify: read classification CLI (flag-compatible with `centrifuger`,
reference CentrifugerClass.cpp:20-64)."""

import argparse
import os
import sys
import time

import numpy as np

from ..build import load_index, is_protein_index
from ..classify.params import ClassifierParam
from ..io.readers import ReadFiles, SAMPLE_SHEET_SEPARATOR_READ_ID
from ..io.writer import ResultWriter


def log(msg):
    sys.stderr.write("[%s] %s\n" % (time.strftime("%a %b %d %H:%M:%S %Y"), msg))


def make_classifier(fm, tax, param, protein, engine, serve_layout="plain",
                    no_rowmap=False, shards=0):
    if engine == "numpy":
        from ..classify.engine_np import ClassifierNP
        return ClassifierNP(fm, tax, param, protein=protein)
    dev = None
    if not protein and (serve_layout != "plain" or no_rowmap or shards > 1):
        from ..fm.device import DeviceFM
        if no_rowmap:
            fm.rowmap = None
        dev = DeviceFM(fm, serve_layout=serve_layout)
        if shards > 1:
            # single-process sharded-index serving: the big tables row-
            # sharded over the first `shards` local devices (SURVEY 2.6-P4)
            from ..parallel.mesh import make_mesh
            from ..parallel.sharded import ShardedIndex
            dev = ShardedIndex(dev, make_mesh(n_devices=shards), axis="dp")
    if engine == "jax":
        from ..classify.engine_jax import ClassifierJax
        return ClassifierJax(fm, tax, param, protein=protein, dev=dev)
    from ..classify.engine_fused import ClassifierFused
    return ClassifierFused(fm, tax, param, protein=protein, dev=dev)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cfr-classify",
                                 description="Classify reads against a centrifuger_tpu index.")
    ap.add_argument("-x", dest="index", required=True, help="index prefix")
    ap.add_argument("-1", dest="read1", action="append", default=[])
    ap.add_argument("-2", dest="read2", action="append", default=[])
    ap.add_argument("-u", dest="unpaired", action="append", default=[])
    ap.add_argument("-i", dest="interleaved", action="append", default=[])
    ap.add_argument("-t", dest="threads", type=int, default=1)
    ap.add_argument("-k", dest="max_result", type=int, default=1)
    ap.add_argument("-o", dest="output_prefix", default="centrifuger")
    ap.add_argument("--sample-sheet")
    ap.add_argument("--un", dest="un_prefix", default="")
    ap.add_argument("--cl", dest="cl_prefix", default="")
    ap.add_argument("--min-hitlen", type=int, default=0)
    ap.add_argument("--hitk-factor", type=int, default=40)
    ap.add_argument("--merge-readpair", action="store_true")
    ap.add_argument("--expand-taxid", action="store_true")
    ap.add_argument("--read-format", default=None)
    ap.add_argument("--barcode", action="append", default=[])
    ap.add_argument("--UMI", dest="umi", action="append", default=[])
    ap.add_argument("--barcode-whitelist", default=None)
    ap.add_argument("--barcode-translate", default=None)
    ap.add_argument("--engine", choices=["numpy", "jax", "fused"],
                    default="fused",
                    help="compute engine (extension over the reference CLI)")
    ap.add_argument("--serve-layout", choices=["plain", "runblock"],
                    default="plain",
                    help="device rank-table layout: 'plain' = wide fused "
                         "rows (~0.27 B/char, fastest); 'runblock' = "
                         "compressed run-block mega-table (less HBM)")
    ap.add_argument("--no-rowmap", action="store_true",
                    help="ignore the rowmap resolve accelerator even if the "
                         "index carries one (the only legal mode at "
                         "n >= 2^31; useful for apples-to-apples timing)")
    ap.add_argument("--shards", type=int, default=0,
                    help="shard the big index tables over this many local "
                         "devices (single-process sharded-index serving; "
                         "0/1 = replicated)")
    ap.add_argument("--batch-size", type=int, default=0,
                    help="reads per device batch (0 = auto)")
    ap.add_argument("--n-ranks", type=int, default=1,
                    help="multi-host serving: total serving processes; this "
                         "rank handles read batches i with i %% n_ranks == "
                         "rank (SURVEY 2.6-P2 input sharding)")
    ap.add_argument("--rank", type=int, default=0,
                    help="this process's rank in [0, n_ranks)")
    ap.add_argument("--rank-index", default=None,
                    help="sidecar file recording TSV rows per processed "
                         "batch, consumed by cfr-merge-shards to rebuild "
                         "the global read order")
    args = ap.parse_args(argv)
    if args.n_ranks > 1:
        if not (0 <= args.rank < args.n_ranks):
            ap.error("--rank must be in [0, n_ranks)")
        if args.sample_sheet or args.un_prefix or args.cl_prefix:
            ap.error("--n-ranks is incompatible with --sample-sheet/--un/--cl")

    log("Centrifuger(tpu) starts.")
    import os
    if not os.path.exists(args.index + ".fm.npz") and \
            os.path.exists(args.index + ".1.cfr"):
        # reference-built index: load via the .cfr interop reader
        from ..interop.cfr import load_cfr_index
        fm, tax, seq_length, meta = load_cfr_index(args.index)
        protein = meta.get("sequence_type") == "amino_acid"
    else:
        protein = is_protein_index(args.index)
        fm, tax, seq_length, meta = load_index(args.index)
    log("Finishes loading index.")

    param = ClassifierParam(max_result=args.max_result,
                            min_hit_len=args.min_hitlen,
                            max_result_per_hit_factor=args.hitk_factor,
                            output_expanded_result=args.expand_taxid)

    from ..io.formatter import ReadFormatter
    from ..io.barcode import BarcodeCorrector, BarcodeTranslator
    formatter = ReadFormatter(args.read_format) if args.read_format else None
    corrector = None
    translator = None
    if args.barcode_whitelist:
        corrector = BarcodeCorrector(args.barcode_whitelist)
    if args.barcode_translate:
        translator = BarcodeTranslator(args.barcode_translate)

    reads = ReadFiles()
    mate_reads = ReadFiles()
    barcode_file = ReadFiles()
    umi_file = ReadFiles()
    has_mate = False
    sample_outputs = []
    for f in args.unpaired:
        reads.add_read_file(f)
    for f in args.read1:
        reads.add_read_file(f)
        has_mate = True
    for f in args.read2:
        mate_reads.add_read_file(f)
    for f in args.interleaved:
        reads.add_read_file(f, interleaved=True)
        has_mate = True
    for f in args.barcode:
        barcode_file.add_read_file(f)
    for f in args.umi:
        umi_file.add_read_file(f)
    has_barcode = bool(args.barcode)
    has_umi = bool(args.umi)

    if args.sample_sheet:
        with open(args.sample_sheet) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                r1, r2, bc, um, outf = (parts + ["."] * 5)[:5]
                if r2 != ".":
                    reads.add_read_file(r1)
                    mate_reads.add_read_file(r2)
                    has_mate = True
                else:
                    reads.add_read_file(r1)
                if bc != ".":
                    has_barcode = True
                    barcode_file.add_read_file(bc)
                if um != ".":
                    has_umi = True
                    umi_file.add_read_file(um)
                sample_outputs.append(outf)
        reads.set_special_read_to_mark_file_end(SAMPLE_SHEET_SEPARATOR_READ_ID)
        mate_reads.set_special_read_to_mark_file_end(SAMPLE_SHEET_SEPARATOR_READ_ID)
        barcode_file.set_special_read_to_mark_file_end(SAMPLE_SHEET_SEPARATOR_READ_ID)
        umi_file.set_special_read_to_mark_file_end(SAMPLE_SHEET_SEPARATOR_READ_ID)

    if formatter is not None:
        if not has_barcode and formatter.segment_count("bc") > 0:
            has_barcode = True
        if not has_umi and formatter.segment_count("um") > 0:
            has_umi = True

    if corrector is not None and has_barcode:
        corrector.collect_background(barcode_file, formatter)

    classifier = make_classifier(fm, tax, param, protein, args.engine,
                                 serve_layout=args.serve_layout,
                                 no_rowmap=args.no_rowmap,
                                 shards=args.shards)
    log("Inferred --min-hitlen: %d" % classifier.param.min_hit_len)

    writer = ResultWriter()
    writer.has_barcode = has_barcode
    writer.has_umi = has_umi
    writer.output_expanded = args.expand_taxid
    if args.un_prefix:
        writer.set_output_reads(args.un_prefix, has_mate, has_barcode, has_umi, 0)
    if args.cl_prefix:
        writer.set_output_reads(args.cl_prefix, has_mate, has_barcode, has_umi, 1)
    if sample_outputs:
        writer.set_multi_output_file_list(sample_outputs)
    if args.rank == 0:
        writer.output_header()
    rank_counts = []   # TSV rows per OWN batch (global batch striping order)

    def _stripe(it):
        """Multi-host input sharding: yield only this rank's batch stripe."""
        if args.n_ranks <= 1:
            yield from it
            return
        for i, b in enumerate(it):
            if i % args.n_ranks == args.rank:
                yield b

    merger = None
    if args.merge_readpair:
        from ..io.pairmerge import ReadPairMerger
        merger = ReadPairMerger()

    batch_size = args.batch_size or 1024 * max(args.threads, 8)
    if args.shards > 1:
        # sharded serving: read lanes shard over the mesh axis too
        batch_size = -(-batch_size // args.shards) * args.shards

    def iter_units():
        """Yield (r1, r2, barcode_read, umi_read) with formatting applied."""
        it1 = iter(reads)
        it2 = iter(mate_reads) if (has_mate and not reads.interleaved) else None
        itb = iter(barcode_file) if barcode_file.file_count else None
        itu = iter(umi_file) if umi_file.file_count else None
        if reads.interleaved:
            while True:
                try:
                    r1 = next(it1)
                except StopIteration:
                    return
                if args.sample_sheet and r1.id == SAMPLE_SHEET_SEPARATOR_READ_ID:
                    yield r1, None, None, None
                    continue
                r2 = next(it1, None)
                yield r1, r2, None, None
        else:
            while True:
                try:
                    r1 = next(it1)
                except StopIteration:
                    return
                r2 = next(it2) if it2 is not None else None
                rb = next(itb, None) if itb is not None else None
                ru = next(itu, None) if itu is not None else None
                yield r1, r2, rb, ru

    def formatted_units():
        for r1, r2, rb, ru in iter_units():
            if args.sample_sheet and r1.id == SAMPLE_SHEET_SEPARATOR_READ_ID:
                yield r1, r2, None, None
                continue
            barcode = None
            umi = None
            if formatter is not None:
                r1seq, r1qual = formatter.extract_seq_qual(r1.seq, r1.qual, "r1")
                r1.seq, r1.qual = r1seq, r1qual
                if r2 is not None:
                    r2.seq, r2.qual = formatter.extract_seq_qual(r2.seq, r2.qual, "r2")
            if has_barcode:
                src = rb if rb is not None else r1
                if formatter is not None and formatter.is_in_comment("bc"):
                    barcode = formatter.extract_from_comment(src.comment, "bc")
                elif formatter is not None and formatter.segment_count("bc"):
                    barcode, _ = formatter.extract_seq_qual(src.seq, src.qual, "bc")
                else:
                    barcode = src.seq
                qual = src.qual
                ok = 0
                if corrector is not None:
                    barcode, ok = corrector.correct(barcode, qual)
                if ok >= 0:
                    if translator is not None:
                        barcode = translator.translate(barcode)
                else:
                    barcode = "N"
            if has_umi:
                src = ru if ru is not None else r1
                if formatter is not None and formatter.is_in_comment("um"):
                    umi = formatter.extract_from_comment(src.comment, "um")
                elif formatter is not None and formatter.segment_count("um"):
                    umi, _ = formatter.extract_seq_qual(src.seq, src.qual, "um")
                else:
                    umi = src.seq
            yield r1, r2, barcode, umi

    # pipelined input: a reader thread parses/format the next batch while the
    # device classifies the current one (role of the reference's input thread,
    # CentrifugerClass.cpp:555-564, without the thread-count gate)
    import queue as _queue
    import threading

    batch_q = _queue.Queue(maxsize=2)

    def producer():
        batch = []
        for unit in formatted_units():
            batch.append(unit)
            if len(batch) >= batch_size:
                batch_q.put(batch)
                batch = []
        if batch:
            batch_q.put(batch)
        batch_q.put(None)

    def batches():
        while True:
            b = batch_q.get()
            if b is None:
                return
            yield b

    # software-pipelined classification: device chain-search for batch i+1
    # overlaps host finalize of batch i (plus the reader thread above);
    # this is the 3-stage pipeline of the reference (input/classify/output,
    # CentrifugerClass.cpp:761-887) in async-dispatch form
    fast_tsv = (hasattr(classifier, "query_pipelined_packed")
                and not has_barcode and not has_umi and not args.expand_taxid
                and not args.un_prefix and not args.cl_prefix
                and not sample_outputs)
    if fast_tsv and hasattr(classifier, "bucket_q"):
        # pad short tail batches to the main bucket so every batch reuses ONE
        # compiled program (a second shape bucket costs a full XLA compile)
        classifier.bucket_q = batch_size
    bulk_fastq = (fast_tsv and not has_mate and not args.sample_sheet
                  and formatter is None and merger is None
                  and _all_plain_fastq(reads.file_names))
    if bulk_fastq:
        # array-level input AND output: bulk chunked FASTQ parse (reader
        # thread) -> packed device results -> TSV lines, no per-read objects
        from ..io.fastq_fast import iter_fastq_batches

        bq2 = _queue.Queue(maxsize=4)
        prepacked = not getattr(classifier, "protein", False) and \
            hasattr(classifier, "serve_tsv_prepacked")

        def bulk_producer():
            try:
                i = 0
                for path in reads.file_names:
                    if prepacked:
                        # parse + 2-bit pack on the producer thread (native
                        # C fast path when available): the serving thread
                        # only dispatches + writes
                        for item in classifier.iter_prepacked(path,
                                                              batch_size):
                            if i % args.n_ranks == args.rank:
                                bq2.put(item)
                            i += 1
                    else:
                        for item in iter_fastq_batches(path, batch_size):
                            if i % args.n_ranks == args.rank:
                                bq2.put(item)
                            i += 1
                bq2.put(None)
            except Exception as e:     # e.g. multi-line FASTQ -> surface it
                bq2.put(e)

        tb = threading.Thread(target=bulk_producer, daemon=True)
        tb.start()
        from collections import deque
        idq = deque()  # read-id lists in flight; popped per finished batch

        def bulk_items():
            while True:
                item = bq2.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item

        def bulk_batches():
            for item in bulk_items():
                idq.append(item[0])
                yield item[1]

        if prepacked:
            for lines, ncls, nq in classifier.serve_tsv_prepacked(
                    bulk_items()):
                if lines:
                    writer.fp.write("\n".join(lines) + "\n")
                writer.total_cnt += nq
                writer.classified_cnt += ncls
                rank_counts.append(len(lines))
        else:
            for packed, fb, queries in classifier.query_pipelined_packed(
                    bulk_batches()):
                lines, ncls = classifier.format_tsv_batch(
                    packed, fb, queries, idq.popleft())
                if lines:
                    writer.fp.write("\n".join(lines) + "\n")
                writer.total_cnt += len(queries)
                writer.classified_cnt += ncls
                rank_counts.append(len(lines))
        tb.join()
    else:
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        if fast_tsv:
            # array-level fast path: packed device results -> TSV lines
            # directly, skipping per-read result objects entirely
            pending = []
            for packed, fb, queries in classifier.query_pipelined_packed(
                    _batch_queries(b, merger)
                    for b in _tee_batches(pending, _stripe(batches()))):
                batch = pending.pop(0)
                rids = [r1.id for r1, _, _, _ in batch]
                lines, ncls = classifier.format_tsv_batch(packed, fb, queries, rids)
                if lines:
                    writer.fp.write("\n".join(lines) + "\n")
                writer.total_cnt += len(batch)
                writer.classified_cnt += ncls
                rank_counts.append(len(lines))
        elif hasattr(classifier, "query_pipelined"):
            pending = []
            for results in classifier.query_pipelined(
                    _batch_queries(b, merger)
                    for b in _tee_batches(pending, _stripe(batches()))):
                batch = pending.pop(0)
                r0 = writer.rows_out
                _write_batch(batch, results, writer)
                rank_counts.append(writer.rows_out - r0)
        else:
            for batch in _stripe(batches()):
                r0 = writer.rows_out
                _process_batch(batch, classifier, writer, merger, has_mate)
                rank_counts.append(writer.rows_out - r0)
        t.join()

    if args.rank_index:
        with open(args.rank_index, "w") as f:
            f.write("".join("%d\n" % c for c in rank_counts))
    writer.finalize()
    log("Centrifuger(tpu) finishes.")
    return 0


def _all_plain_fastq(paths):
    """True when every input is a regular FASTQ file (plain or gzip) the bulk
    chunk parser can handle (first byte '@'; stdin excluded)."""
    import gzip as _gzip
    for p in paths:
        if p == "-" or not os.path.isfile(p):
            return False
        try:
            op = _gzip.open if p.endswith(".gz") else open
            with op(p, "rb") as f:
                if f.read(1) != b"@":
                    return False
        except OSError:
            return False
    return True


def _tee_batches(pending, it):
    """Yield batches while also appending them to `pending` so the writer can
    pair each finished result list with its source batch (FIFO)."""
    for b in it:
        pending.append(b)
        yield b


def _batch_queries(batch, merger):
    queries = []
    for r1, r2, barcode, umi in batch:
        raw1 = np.frombuffer(r1.seq.encode(), dtype=np.uint8)
        raw2 = np.frombuffer(r2.seq.encode(), dtype=np.uint8) if r2 is not None else None
        if merger is not None and raw2 is not None:
            merged, mqual, ok = merger.merge(r1.seq, r1.qual, r2.seq, r2.qual)
            if ok:
                raw1 = np.frombuffer(merged.encode(), dtype=np.uint8)
                raw2 = None
        queries.append((raw1, raw2))
    return queries


def _write_batch(batch, results, writer):
    for (r1, r2, barcode, umi), res in zip(batch, results):
        writer.output(r1.id, r1.seq, r1.qual,
                      r2.seq if r2 is not None else None,
                      r2.qual if r2 is not None else None,
                      barcode, umi, res)


def _process_batch(batch, classifier, writer, merger, has_mate):
    queries = _batch_queries(batch, merger)
    results = classifier.query_batch(queries)
    _write_batch(batch, results, writer)


if __name__ == "__main__":
    sys.exit(main())

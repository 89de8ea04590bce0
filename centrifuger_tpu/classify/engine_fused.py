"""Host wrapper for the fully-fused device classification program.

Per batch the host only: packs raw read bytes into a padded [U, L] uint8
matrix (one H2D), dispatches the fused program (classify/device_engine.py),
pulls ONE packed [Q, 5+K] int32 result array (one D2H), and materializes
results.  Rare units flagged by the device (hit-boundary-adjustment
candidates, row-budget overflows, more best seqids than the device returns)
fall back to the exact host path, reusing the device-computed chains.

Bit-identical to ClassifierNP / the reference binary; enforced by the golden
TSV tests with --engine fused.
"""

import numpy as np

from .engine_np import ClassifierResult
from .engine_jax import ClassifierJax, _round_up, _next_pow2
from .device_engine import FLAG_ADJUST, FLAG_ROW_OVERFLOW


class ClassifierFused(ClassifierJax):
    K_OUT = 8        # best seqids returned per read by the device
    U_CAP = 8        # per-read SA-row budget on device (a unit can surface at
                     # most U_CAP distinct best seqids, so K_OUT = U_CAP)
    L_MAX = 8192     # max read length on the fused path (int32 score bound)

    def __init__(self, fm, taxonomy, param, protein=False):
        super().__init__(fm, taxonomy, param, protein=protein)
        self.stats["fallback_units"] = 0
        # When set, batches of <= bucket_q units are padded to bucket_q lanes
        # so a short tail batch reuses the main batch's compiled program
        # instead of forcing a second full XLA compile (warmup halver).
        self.bucket_q = None
        self._sid_prefix = None

    def _fused_ok(self):
        return (not self.protein and self.dev.fast
                and self.dev.plain_rows is not None
                and self.param.max_result > 0
                and self.param.max_result_per_hit_factor > 0)

    # --------------------------------------------------------------- batching

    def _pack_reads(self, queries):
        """queries -> (reads [U, L] uint8, lengths [U] int32, nr, Q0)."""
        Q0 = len(queries)
        nr = 2 if any(q[1] is not None for q in queries) else 1
        if self.bucket_q and Q0 <= self.bucket_q:
            Q = self.bucket_q
        else:
            Q = max(_next_pow2(Q0), 1024)
        U = Q * nr
        maxlen = 1
        for r1, r2 in queries:
            maxlen = max(maxlen, len(r1), len(r2) if r2 is not None else 0)
        L = _round_up(max(maxlen, 32), 64)
        raws = []
        for r1, r2 in queries:
            raws.append(r1)
            if nr == 2:
                raws.append(r2 if r2 is not None else b"")
        lens = np.fromiter((len(r) for r in raws), np.int32, len(raws))
        flat = np.concatenate([np.frombuffer(bytes(r), np.uint8) if not
                               isinstance(r, np.ndarray) else r
                               for r in raws]) if len(raws) else \
            np.zeros(0, np.uint8)
        reads = np.zeros((U, L), np.uint8)
        starts = np.zeros(len(raws) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        ridx = np.repeat(np.arange(len(raws)), lens)
        cidx = np.arange(len(flat)) - starts[ridx]
        reads[ridx, cidx] = flat
        lengths = np.zeros(U, np.int32)
        lengths[:len(raws)] = lens
        return reads, lengths, nr, Q0, Q, L

    def _dispatch_fused(self, queries):
        reads, lengths, nr, Q0, Q, L = self._pack_reads(queries)
        mhl = self.param.min_hit_len
        H = max(L // (mhl + 1) + 1, 1)
        out = self.dev.fused_classify(
            reads, lengths, nr, mhl, H, self.param.max_result,
            self.param.max_result_per_hit_factor, self.K_OUT, Q * self.U_CAP)
        return dict(queries=queries, out=out, nr=nr, Q0=Q0)

    def finish_packed(self, ctx):
        """Pull the packed device results; returns (packed [Q0, 5+K] np array,
        fallback_results dict {unit: ClassifierResult}).  Fallback units are
        the only per-read host work."""
        queries, out, nr, Q0 = ctx["queries"], ctx["out"], ctx["nr"], ctx["Q0"]
        packed = np.asarray(out["packed"])[:Q0]          # the ONE result pull
        fallback = (packed[:, 4] != 0) | (packed[:, 3] > self.K_OUT)
        fb_idx = np.flatnonzero(fallback)
        self.stats["fallback_units"] += int(len(fb_idx))
        self.stats["fast_units"] += int(Q0 - len(fb_idx))
        fb = {}
        if len(fb_idx):
            hits = np.asarray(out["hits"])
            nh = np.asarray(out["nhits"])
            for qi in fb_idx:
                fb[int(qi)] = self._fallback_unit(queries[qi], qi, hits, nh, nr)
        return packed, fb

    def _finish_fused(self, ctx):
        queries, out, nr, Q0 = ctx["queries"], ctx["out"], ctx["nr"], ctx["Q0"]
        packed = np.asarray(out["packed"])[:Q0]          # the ONE result pull
        param = self.param
        tax = self.tax
        K = self.K_OUT
        kmax = param.max_result

        score = packed[:, 0]
        second = packed[:, 1]
        hitlen = packed[:, 2]
        nbest = packed[:, 3]
        flags = packed[:, 4]
        sids = packed[:, 5:]

        fallback = (flags != 0) | (nbest > K)
        results = []
        for qi, (r1, r2) in enumerate(queries):
            res = ClassifierResult()
            res.query_length = len(r1) + (len(r2) if r2 is not None else 0)
            if fallback[qi]:
                results.append(res)
                continue
            nb = int(nbest[qi])
            res.score = int(score[qi])
            res.secondary_score = int(second[qi])
            res.hit_length = int(hitlen[qi])
            if nb > 1:
                res.secondary_score = res.score
            if nb == 0:
                results.append(res)
                continue
            ids = sids[qi, :nb]
            if nb <= kmax:
                for sid in ids:
                    sid = int(sid)
                    res.seq_names.append(tax.seq_id_to_name(sid))
                    res.tax_ids.append(tax.orig_tax_id(tax.seq_id_to_tax_id(sid)))
                    if param.output_expanded_result:
                        res.expanded_strings.append("")
            else:
                from ..taxonomy import rank_string
                ctids = [tax.seq_id_to_tax_id(int(sid)) for sid in ids]
                promoted, children = tax.reduce_tax_ids(
                    ctids, kmax, want_children=param.output_expanded_result)
                for i, t in enumerate(promoted):
                    res.seq_names.append(rank_string(tax.tax_rank(t)))
                    res.tax_ids.append(tax.orig_tax_id(t))
                    if param.output_expanded_result:
                        if children is not None and len(children) == len(promoted):
                            res.expanded_strings.append(",".join(
                                str(tax.orig_tax_id(c)) for c in children[i]))
                        else:
                            res.expanded_strings.append("")
            results.append(res)

        # exact host path for flagged units, reusing device-computed chains
        fb_idx = np.flatnonzero(fallback)
        self.stats["fallback_units"] += int(len(fb_idx))
        self.stats["fast_units"] += int(Q0 - len(fb_idx))
        if len(fb_idx):
            hits = np.asarray(out["hits"])
            nh = np.asarray(out["nhits"])
            for qi in fb_idx:
                results[qi] = self._fallback_unit(queries[qi], qi, hits, nh, nr)
        return results

    def _fallback_unit(self, query, qi, hits, nh, nr):
        r1, r2 = query
        base = 2 * nr * qi
        lane_f1, lane_r1 = base, base + 1
        lane_f2, lane_r2 = base + 2, base + 3

        def lane_hits(lane):
            return [(int(hits[lane, m, 0]), int(hits[lane, m, 1]),
                     int(hits[lane, m, 2]), int(hits[lane, m, 3]))
                    for m in range(int(nh[lane]))]

        c1f = self.encode[r1]
        from ..utils import COMP_TABLE
        c1r = self.encode[COMP_TABLE[r1][::-1]]
        if r2 is not None and nr == 2:
            c2f = self.encode[r2]
            c2r = self.encode[COMP_TABLE[r2][::-1]]
            return self._query_exact_unit(
                r1, r2, c1f, c1r, c2f, c2r,
                lane_hits(lane_f1), lane_hits(lane_r1),
                lane_hits(lane_f2), lane_hits(lane_r2))
        return self._query_exact_unit(
            r1, None, c1f, c1r, None, None,
            lane_hits(lane_f1), lane_hits(lane_r1), None, None)

    # ------------------------------------------------------------ main entry

    def query_batch(self, queries):
        if not queries:
            return []
        if not self._fused_ok() or self._too_long(queries):
            return super().query_batch(queries)
        return self._finish_fused(self._dispatch_fused(queries))

    def _too_long(self, queries):
        for r1, r2 in queries:
            if len(r1) > self.L_MAX or (r2 is not None and len(r2) > self.L_MAX):
                return True
        return False

    def query_pipelined_packed(self, batches):
        """Like query_pipelined but yields (packed, fallback_dict, queries)
        per batch — the array-level fast path for TSV serving."""
        from collections import deque
        pend = deque()
        for batch in batches:
            if not batch:
                yield np.zeros((0, 5 + self.K_OUT), np.int32), {}, []
                continue
            if not self._fused_ok() or self._too_long(batch):
                while pend:
                    c = pend.popleft()
                    yield self.finish_packed(c) + (c["queries"],)
                res = super().query_batch(batch)
                yield None, dict(enumerate(res)), batch
                continue
            pend.append(self._dispatch_fused(batch))
            if len(pend) >= 2:
                c = pend.popleft()
                yield self.finish_packed(c) + (c["queries"],)
        while pend:
            c = pend.popleft()
            yield self.finish_packed(c) + (c["queries"],)

    def _tsv_tables(self):
        """Per-seqid precomputed TSV fragment "\\t<name>\\t<taxid>\\t" so the
        common one-match row is two string joins (vectorized formatter)."""
        if self._sid_prefix is None:
            tax = self.tax
            names = tax.seq_names
            self._sid_prefix = [
                "\t%s\t%d\t" % (names[s],
                                tax.orig_tax_id(tax.seq_id_to_tax_id(s)))
                for s in range(len(names))]
        return self._sid_prefix

    def format_tsv_batch(self, packed, fb, queries, read_ids):
        """TSV rows for the default column set (no barcode/UMI/expanded),
        byte-identical to ResultWriter.output over materialized results.
        Returns (lines list, classified_count).  Columnar fast path: the
        packed device rows are pulled to Python lists once; the dominant
        one-match case is a single string format per row."""
        tax = self.tax
        kmax = self.param.max_result
        lines = []
        ap = lines.append
        ncls = 0
        if packed is None:
            packed = np.zeros((0, 5 + self.K_OUT), np.int32)
        n_dev = len(packed)
        sid_prefix = self._tsv_tables()
        nb_l = packed[:, 3].tolist()
        sc_l = packed[:, 0].tolist()
        se_l = packed[:, 1].tolist()
        hl_l = packed[:, 2].tolist()
        s1_l = packed[:, 5].tolist()
        check_fb = bool(fb) or n_dev < len(queries)
        for qi, (r1, r2) in enumerate(queries):
            rid = read_ids[qi]
            if check_fb and (qi >= n_dev or qi in fb):
                res = fb[qi]
                qlen = res.query_length
                m = len(res.tax_ids)
                if m == 0:
                    ap("%s\tunclassified\t0\t0\t0\t0\t%d\t1" % (rid, qlen))
                    continue
                ncls += 1
                for i in range(m):
                    ap("%s\t%s\t%d\t%d\t%d\t%d\t%d\t%d" % (
                        rid, res.seq_names[i], res.tax_ids[i], res.score,
                        res.secondary_score, res.hit_length, qlen, m))
                continue
            qlen = len(r1) + (len(r2) if r2 is not None else 0)
            nb = nb_l[qi]
            if nb == 0:
                ap("%s\tunclassified\t0\t0\t0\t0\t%d\t1" % (rid, qlen))
                continue
            ncls += 1
            if nb == 1:
                ap("%s%s%d\t%d\t%d\t%d\t1" % (
                    rid, sid_prefix[s1_l[qi]], sc_l[qi], se_l[qi],
                    hl_l[qi], qlen))
                continue
            score = sc_l[qi]
            second = score  # nb > 1 -> second best equals best
            hitlen = hl_l[qi]
            if nb <= kmax:
                for j in range(nb):
                    sid = int(packed[qi, 5 + j])
                    ap("%s%s%d\t%d\t%d\t%d\t%d" % (
                        rid, sid_prefix[sid], score, second, hitlen, qlen, nb))
            else:
                from ..taxonomy import rank_string
                ctids = [tax.seq_id_to_tax_id(int(packed[qi, 5 + j]))
                         for j in range(nb)]
                promoted, _ = tax.reduce_tax_ids(ctids, kmax,
                                                 want_children=False)
                m = len(promoted)
                for t in promoted:
                    ap("%s\t%s\t%d\t%d\t%d\t%d\t%d\t%d" % (
                        rid, rank_string(tax.tax_rank(t)), tax.orig_tax_id(t),
                        score, second, hitlen, qlen, m))
        return lines, ncls

    def query_pipelined(self, batches):
        """Two-deep software pipeline: batch i+1's upload/compute overlaps
        batch i's result pull + host materialization."""
        from collections import deque
        pend = deque()
        for batch in batches:
            if not batch:
                yield []
                continue
            if not self._fused_ok() or self._too_long(batch):
                while pend:
                    yield self._finish_fused(pend.popleft())
                yield super().query_batch(batch)
                continue
            pend.append(self._dispatch_fused(batch))
            if len(pend) >= 2:
                yield self._finish_fused(pend.popleft())
        while pend:
            yield self._finish_fused(pend.popleft())

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


def _adjust_candidates(fwd, rc, length):
    """Overapproximate the (which, m) backward searches adjust_hit_boundary
    (Classifier.hpp:291-389) may issue for one read: every (fwd hit, rc hit)
    pair contributes its two candidate prefix lengths, gated only on the
    extension conditions (rc_right > right / left < rc_left) evaluated on the
    ORIGINAL hit lists.  Rare cascaded re-searches (a hit modified by an
    earlier pair re-enters with new bounds) miss the cache and fall back to
    the host search.  Hits are (sp, ep, l, off) tuples."""
    out = set()
    for hf in fwd:
        right = length - hf[3] - 1
        left = right - hf[2] + 1
        for hr in rc:
            rc_left = hr[3]
            rc_right = rc_left + hr[2] - 1
            if rc_right > right:
                out.add((0, rc_right + 1))
            if left < rc_left:
                out.add((1, length - left))
    return out


class ClassifierFused(ClassifierJax):
    K_OUT = 8        # best seqids returned per read by the device
    U_CAP = 8        # per-read SA-row budget on device (a unit can surface at
                     # most U_CAP distinct best seqids, so K_OUT = U_CAP)
    L_MAX = 8192     # max read length on the fused path (int32 score bound)

    def __init__(self, fm, taxonomy, param, protein=False, dev=None):
        super().__init__(fm, taxonomy, param, protein=protein, dev=dev)
        self.stats["fallback_units"] = 0
        # When set, batches of <= bucket_q units are padded to bucket_q lanes
        # so a short tail batch reuses the main batch's compiled program
        # instead of forcing a second full XLA compile (warmup halver).
        self.bucket_q = None
        self._sid_prefix = None

    def _fused_ok(self):
        if self.param.max_result <= 0 or \
                self.param.max_result_per_hit_factor <= 0:
            return False
        if self.protein:
            # translated search runs fused too: the chain/resolve kernels fall
            # back to the generic run-block rank path (sigma > 4)
            return True
        # fast covers BOTH serving layouts (wide plain rows, or the run-block
        # mega-table for int32) — the fused program dispatches internally
        return self.dev.fast

    # --------------------------------------------------------------- batching

    def _pack_reads(self, queries):
        """queries -> ((pack2, vmask) 2-bit-packed reads, lengths [U] int32,
        nr, Q0, Q, L).  Packing host-side (with the engine's own encode table,
        so alphabet semantics match the exact oracle) cuts the per-batch
        upload from 1 byte/base to 0.375 — the H2D link is the serving
        bottleneck on remote/tunneled devices."""
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
        codes = np.full((U, L), 255, np.uint8)
        starts = np.zeros(len(raws) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        ridx = np.repeat(np.arange(len(raws)), lens)
        cidx = np.arange(len(flat)) - starts[ridx]
        codes[ridx, cidx] = self.encode[flat]
        valid = codes != 255
        cc = np.where(valid, codes, 0).astype(np.uint8).reshape(U, L // 4, 4)
        pack2 = (cc[:, :, 0] | (cc[:, :, 1] << 2) | (cc[:, :, 2] << 4)
                 | (cc[:, :, 3] << 6)).astype(np.uint8)
        vmask = np.packbits(valid, axis=1, bitorder="little")
        lengths = np.zeros(U, np.int32)
        lengths[:len(raws)] = lens
        return (pack2, vmask), lengths, nr, Q0, Q, L

    def _pack_reads_protein(self, queries):
        """queries -> (AA code lanes [U*6, L] uint8, lengths, nr, Q0, Q, L).
        Per-read lane order: fwd frames 0..2 then rc frames 0..2 (the fused
        program's protein contract; reference TranslatedSearch,
        Classifier.hpp:451-493)."""
        from .translate import translate_frames
        from ..utils import COMP_TABLE
        Q0 = len(queries)
        nr = 2 if any(q[1] is not None for q in queries) else 1
        if self.bucket_q and Q0 <= self.bucket_q:
            Q = self.bucket_q
        else:
            Q = max(_next_pow2(Q0), 1024)
        U = Q * nr
        lanes = []
        for r1, r2 in queries:
            for raw in (r1,) + ((r2,) if nr == 2 else ()):
                if raw is None or len(raw) == 0:
                    lanes.extend([np.zeros(0, np.uint8)] * 6)
                    continue
                for aa in translate_frames(raw):
                    lanes.append(self.encode[aa])
                for aa in translate_frames(COMP_TABLE[raw][::-1]):
                    lanes.append(self.encode[aa])
        maxlen = max((len(c) for c in lanes), default=1)
        L = max(_round_up(max(maxlen, 16), 32), 32)
        codes = np.full((U * 6, L), 255, np.uint8)
        lengths = np.zeros(U * 6, np.int32)
        for i, c in enumerate(lanes):
            codes[i, :len(c)] = c
            lengths[i] = len(c)
        return codes, lengths, nr, Q0, Q, L

    def _dispatch_fused(self, queries):
        if self.protein:
            reads, lengths, nr, Q0, Q, L = self._pack_reads_protein(queries)
        else:
            reads, lengths, nr, Q0, Q, L = self._pack_reads(queries)
        mhl = self.param.min_hit_len
        H = max(L // (mhl + 1) + 1, 1)
        out = self.dev.fused_classify(
            reads, lengths, nr, mhl, H, self.param.max_result,
            self.param.max_result_per_hit_factor, self.K_OUT, Q * self.U_CAP,
            protein=self.protein)
        return dict(queries=queries, out=out, nr=nr, Q0=Q0)

    def _pull_results(self, out):
        """ONE device->host transfer for everything the finish stage reads:
        unpacks the fused program's host_blob (packed + fb_units + fb_hits +
        fb_nh) and substitutes host arrays into a copy of `out`, so the
        downstream accessors' np.asarray calls are free.  Falls back to the
        individual pulls when host_blob is absent (sharded mode ships
        per-shard outputs separately)."""
        blob_d = out.get("host_blob")
        if blob_d is None:
            return np.asarray(out["packed"]), out
        blob = np.asarray(blob_d)
        q, w = out["packed"].shape
        packed = blob[:q * w].reshape(q, w)
        rest = blob[q * w:]
        fb = out["fb_units"].shape[0]
        fbu = rest[:fb]
        rest = rest[fb:]
        hshape = out["fb_hits"].shape
        nfh = int(np.prod(hshape))
        fbh = rest[:nfh].reshape(hshape)
        fbn = rest[nfh:nfh + out["fb_nh"].shape[0]]
        out = dict(out, fb_units=fbu, fb_hits=fbh, fb_nh=fbn)
        return packed, out

    def finish_packed(self, ctx):
        """Pull the packed device results; returns (packed [Q0, 5+K] np array,
        fallback_results dict {unit: ClassifierResult}).  Fallback units are
        the only per-read host work."""
        queries, out, nr, Q0 = ctx["queries"], ctx["out"], ctx["nr"], ctx["Q0"]
        packed, out = self._pull_results(out)            # the ONE result pull
        packed = packed[:Q0]
        fallback = (packed[:, 4] != 0) | (packed[:, 3] > self.K_OUT)
        fb_idx = np.flatnonzero(fallback)
        self.stats["fallback_units"] += int(len(fb_idx))
        self.stats["fast_units"] += int(Q0 - len(fb_idx))
        fb = {}
        if len(fb_idx):
            fb = self._finish_fallback_units(queries, fb_idx, out, nr)
        return packed, fb

    def _finish_fused(self, ctx):
        queries, out, nr, Q0 = ctx["queries"], ctx["out"], ctx["nr"], ctx["Q0"]
        packed, out = self._pull_results(out)            # the ONE result pull
        packed = packed[:Q0]
        ctx = dict(ctx, out=out)
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
            for qi, res in self._finish_fallback_units(
                    queries, fb_idx, out, nr).items():
                results[qi] = res
        return results

    # ----------------------------------------------------- batched fallbacks

    FB_LANE_CAP = 256   # flagged-lane budget for the device-side hit slice

    def _fallback_hits_accessor(self, out, fb_idx, nr):
        """Returns hits_at(lane) -> [(sp, ep, l, off), ...] for the flagged
        units' chain-search lanes.  Preferred source: the compact fb_* arrays
        the device ships with the main result (zero extra round trips); else
        a device-side lane gather pulls only the flagged rows (~KBs); the
        full [B, H, 4] hits tensor (~MBs over a high-latency link) is the
        last resort."""
        lpu = (6 if self.protein else 2) * nr
        fbu = out.get("fb_units")
        if fbu is not None and len(fb_idx) <= fbu.shape[0]:
            sel = np.asarray(fbu)[:len(fb_idx)]
            if np.array_equal(sel, fb_idx):
                hs = np.asarray(out["fb_hits"])
                ns = np.asarray(out["fb_nh"])
                pos = {int(u): i for i, u in enumerate(sel)}

                def hits_at(lane):
                    i = pos[lane // lpu] * lpu + lane % lpu
                    return [(int(hs[i, m, 0]), int(hs[i, m, 1]),
                             int(hs[i, m, 2]), int(hs[i, m, 3]))
                            for m in range(int(ns[i]))]
                return hits_at
        lanes = (lpu * fb_idx[:, None]
                 + np.arange(lpu)[None, :]).reshape(-1).astype(np.int32)
        if len(lanes) <= self.FB_LANE_CAP:
            import jax
            pad = np.zeros(self.FB_LANE_CAP, np.int32)
            pad[:len(lanes)] = lanes
            if not hasattr(self, "_lane_gather_fn"):
                self._lane_gather_fn = jax.jit(lambda h, n, l: (h[l], n[l]))
            hs_d, ns_d = self._lane_gather_fn(out["hits"], out["nhits"], pad)
            hs = np.asarray(hs_d)
            ns = np.asarray(ns_d)
            lmap = {int(l): i for i, l in enumerate(lanes)}

            def hits_at(lane):
                i = lmap[lane]
                return [(int(hs[i, m, 0]), int(hs[i, m, 1]),
                         int(hs[i, m, 2]), int(hs[i, m, 3]))
                        for m in range(int(ns[i]))]
            return hits_at
        hits = np.asarray(out["hits"])
        nh = np.asarray(out["nhits"])

        def hits_at(lane):
            return [(int(hits[lane, m, 0]), int(hits[lane, m, 1]),
                     int(hits[lane, m, 2]), int(hits[lane, m, 3]))
                    for m in range(int(nh[lane]))]
        return hits_at

    def _batched_prefix_search(self, lane_codes, lane_ms):
        """ONE device dispatch of longest-suffix backward searches for a
        ragged request set; returns [(l, sp, ep), ...] aligned with inputs."""
        n = len(lane_codes)
        if n == 0:
            return []
        L = max(64, _round_up(max(len(c) for c in lane_codes), 64))
        B = max(64, _next_pow2(n))
        codes = np.full((B, L), 255, np.uint8)
        for i, c in enumerate(lane_codes):
            codes[i, :len(c)] = c
        ms = np.zeros(B, np.int32)
        ms[:n] = lane_ms
        l, sp, ep = self.dev.prefix_search(codes, ms)
        # one device->host transfer instead of three (each pull is a full
        # round trip over the serving link)
        import jax.numpy as jnp
        lse = np.asarray(jnp.stack([jnp.asarray(l).astype(sp.dtype), sp, ep]))
        l, sp, ep = lse[0], lse[1], lse[2]
        return [(int(l[i]), int(sp[i]), int(ep[i])) for i in range(n)]

    def _finish_fallback_units(self, queries, fb_idx, out, nr):
        """Exact host finalize for flagged units with ALL device work batched:
        one prefix_search dispatch serves every boundary-adjustment backward
        search across every flagged unit (nucleotide only; protein has no
        boundary adjustment), and one resolve dispatch serves every SA-row
        LF-walk.  Replaces the per-unit path whose host FM searches dominated
        serving wall time (~100 ms per flagged unit)."""
        hits_at = self._fallback_hits_accessor(out, fb_idx, nr)
        if self.protein:
            unit_hits = self._fallback_unit_hits_protein(
                queries, fb_idx, hits_at, nr)
        else:
            unit_hits = self._fallback_unit_hits_dna(
                queries, fb_idx, hits_at, nr)
        return self._classify_units_batch(unit_hits)

    def _fallback_unit_hits_protein(self, queries, fb_idx, hits_at, nr):
        """Flagged protein units: frame choice + strand choice host-side from
        the device chains (TranslatedSearch, Classifier.hpp:451-493; no
        boundary adjustment).  Returns [(qi, hits, qlen), ...]."""
        from .engine_np import BWTHit
        res = []
        for qi in fb_idx:
            qi = int(qi)
            r1, r2 = queries[qi]
            base = 6 * nr * qi

            def best_frame(l0):
                fh = [hits_at(l0 + f) for f in range(3)]
                best, tag = 0, 0
                for f in range(3):
                    sc = len(fh[f]) * sum(self.hit_score(h[2]) for h in fh[f])
                    if sc > best:
                        best, tag = sc, f
                return fh[tag]

            plus = best_frame(base)
            minus = best_frame(base + 3)
            if r2 is not None and nr == 2:
                plus = plus + best_frame(base + 9)    # rc frames of r2
                minus = minus + best_frame(base + 6)  # fwd frames of r2
            sc_p = sum(self.hit_score(h[2]) for h in plus)
            sc_m = sum(self.hit_score(h[2]) for h in minus)
            if sc_p > sc_m:
                chosen = [(h, 1) for h in plus]
            elif sc_m > sc_p:
                chosen = [(h, -1) for h in minus]
            else:
                chosen = [(h, 1) for h in plus] + [(h, -1) for h in minus]
            hs = [BWTHit(h[0], h[1], h[2], h[3], s) for h, s in chosen]
            qlen = len(r1) + (len(r2) if r2 is not None else 0)
            res.append((qi, hs, qlen))
        return res

    def _fallback_unit_hits_dna(self, queries, fb_idx, hits_at, nr):
        """Flagged nucleotide units: batched boundary adjustment + strand
        choice.  Returns [(qi, hits, qlen), ...]."""
        from ..utils import COMP_TABLE
        units = []
        lane_codes, lane_ms, lane_key = [], [], []
        for qi in fb_idx:
            qi = int(qi)
            r1, r2 = queries[qi]
            base = 2 * nr * qi
            f1, rc1 = hits_at(base), hits_at(base + 1)
            c1f = self.encode[r1]
            c1r = self.encode[COMP_TABLE[r1][::-1]]
            if r2 is not None and nr == 2:
                f2, rc2 = hits_at(base + 2), hits_at(base + 3)
                c2f = self.encode[r2]
                c2r = self.encode[COMP_TABLE[r2][::-1]]
            else:
                r2 = None
                f2 = rc2 = c2f = c2r = None
            u = dict(qi=qi, r1=r1, r2=r2, c=(c1f, c1r, c2f, c2r),
                     h=(f1, rc1, f2, rc2), caches=({}, {}))
            ui = len(units)
            units.append(u)
            reads = [(0, f1, rc1, c1f, c1r, len(r1))]
            if f2 is not None:
                reads.append((1, f2, rc2, c2f, c2r, len(r2)))
            for ri, fw, rc, cf, cr, ln in reads:
                if not fw or not rc:
                    continue
                for which, m in _adjust_candidates(fw, rc, ln):
                    lane_codes.append(cf if which == 0 else cr)
                    lane_ms.append(m)
                    lane_key.append((ui, ri, which, m))

        for (ui, ri, which, m), r in zip(
                lane_key, self._batched_prefix_search(lane_codes, lane_ms)):
            units[ui]["caches"][ri][(which, m)] = r

        # boundary adjust + strand select per unit (cache-served)
        res = []
        for u in units:
            c1f, c1r, c2f, c2r = u["c"]
            f1, rc1, f2, rc2 = u["h"]

            def mk_search(ri, cf, cr):
                cache = u["caches"][ri]

                def search(which, m):
                    r = cache.get((which, m))
                    if r is None:   # cascaded re-search (rare): host path
                        r = self.backward_search(cf if which == 0 else cr, m)
                    return r
                return search

            hs = self._adjusted_unit_hits(
                u["r1"], u["r2"], c1f, c1r, c2f, c2r, f1, rc1, f2, rc2,
                search1=mk_search(0, c1f, c1r),
                search2=(mk_search(1, c2f, c2r) if u["r2"] is not None
                         else None))
            qlen = len(u["r1"]) + (len(u["r2"]) if u["r2"] is not None else 0)
            res.append((u["qi"], hs, qlen))
        return res

    def _classify_units_batch(self, unit_hits):
        """Shared fallback tail: collect every SA row across units, resolve
        them in ONE batched device LF-walk, then run the exact host score
        aggregation + taxonomy per unit.  unit_hits: [(qi, hits, qlen)]."""
        mhl = self.param.min_hit_len
        row_parts = []
        spans_all = []
        off = 0
        for qi, hs, qlen in unit_hits:
            spans = []
            for h in hs:
                if h.l < mhl:
                    spans.append(None)
                    continue
                rows = self.rows_for_hit(h)
                spans.append((off, off + len(rows)))
                off += len(rows)
                row_parts.append(rows)
            spans_all.append(spans)

        all_rows = np.concatenate(row_parts) if row_parts else \
            np.zeros(0, np.int64)
        resolved_flat = self._resolve_batch_rows(all_rows)

        fb = {}
        empty = np.zeros(0, np.int64)
        for (qi, hs, qlen), spans in zip(unit_hits, spans_all):
            resolved = [resolved_flat[s[0]:s[1]] if s is not None else empty
                        for s in spans]
            res = ClassifierResult()
            self.classify_from_hits(hs, res, resolved=resolved)
            res.query_length = qlen
            fb[qi] = res
        return fb

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

    # finish-stage worker pool: the result pull and the fallback units' device
    # round trips are latency-bound (tens of ms each over a remote/tunneled
    # device link); running them in worker threads lets batch i's finish
    # overlap batch i+1's upload/compute AND batch i+2's finish latency.
    # A finish does 2-3 sequential device fetches (~25 ms each through the
    # tunnel), so 4 workers / 8 deep keeps the device queue fed; FIFO futures
    # keep output order deterministic.
    PIPELINE_DEPTH = 8

    def _finish_pool(self):
        if not hasattr(self, "_fin_pool"):
            from concurrent.futures import ThreadPoolExecutor
            self._fin_pool = ThreadPoolExecutor(max_workers=4)
        return self._fin_pool

    def _finish_packed_ctx(self, ctx):
        packed, fb = self.finish_packed(ctx)
        return packed, fb, ctx["queries"]

    def _dispatch_packed(self, reads, lengths, nr, Q0, queries):
        """Dispatch from host-prepacked arrays (see _pack_reads) — lets a
        producer thread do the packing so the serving thread only dispatches.
        Nucleotide path only (reads = (pack2, vmask))."""
        mhl = self.param.min_hit_len
        L = reads[0].shape[1] * 4
        H = max(L // (mhl + 1) + 1, 1)
        Q = reads[0].shape[0] // nr
        out = self.dev.fused_classify(
            reads, lengths, nr, mhl, H, self.param.max_result,
            self.param.max_result_per_hit_factor, self.K_OUT,
            Q * self.U_CAP)
        return dict(queries=queries, out=out, nr=nr, Q0=Q0)

    def finish_tsv_ctx(self, ctx, read_ids):
        """Worker-side finish INCLUDING TSV formatting: returns (lines,
        classified_count, n_reads).  Keeps the serving thread to dispatch +
        file writes only."""
        packed, fb = self.finish_packed(ctx)
        lines, ncls = self.format_tsv_batch(packed, fb, ctx["queries"],
                                            read_ids)
        return lines, ncls, len(ctx["queries"])

    def iter_prepacked(self, path, batch_size):
        """Producer-side batches for serve_tsv_prepacked: ONE native C pass
        (native/fastqpack.cpp) parses strict 4-line FASTQ and 2-bit packs
        device-ready arrays; anything unusual falls back to the Python
        reader + _pack_reads mid-stream.  Nucleotide single-end files only
        (the bulk TSV fast path's precondition)."""
        from ..io.fastq_fast import iter_packed_batches, iter_fastq_batches
        it = None
        if not self.protein:
            it = iter_packed_batches(path, batch_size, bucket_q=self.bucket_q)
        if it is not None:
            for ids, queries, reads, lengths, nr, Q0 in it:
                if reads is None:
                    reads, lengths, nr, Q0 = self._pack_reads(queries)[:4]
                yield ids, queries, reads, lengths, nr, Q0
            return
        for ids, queries in iter_fastq_batches(path, batch_size):
            reads, lengths, nr, Q0 = self._pack_reads(queries)[:4]
            yield ids, queries, reads, lengths, nr, Q0

    def serve_tsv_prepacked(self, items):
        """Highest-throughput serving loop: `items` yields
        (read_ids, queries, packed_reads, lengths, nr, Q0) — typically from a
        producer thread running iter_fastq_batches + _pack_reads.  Yields
        (lines, ncls, n_reads) per batch in order; dispatch, result pull,
        fallback handling and TSV formatting all overlap across batches."""
        from collections import deque
        pool = self._finish_pool()
        pend = deque()
        for ids, queries, reads, lengths, nr, Q0 in items:
            ctx = self._dispatch_packed(reads, lengths, nr, Q0, queries)
            pend.append(pool.submit(self.finish_tsv_ctx, ctx, ids))
            if len(pend) >= self.PIPELINE_DEPTH:
                yield pend.popleft().result()
        while pend:
            yield pend.popleft().result()

    def query_pipelined_packed(self, batches):
        """Like query_pipelined but yields (packed, fallback_dict, queries)
        per batch — the array-level fast path for TSV serving."""
        from collections import deque
        pool = self._finish_pool()
        pend = deque()
        for batch in batches:
            if not batch:
                while pend:
                    yield pend.popleft().result()
                yield np.zeros((0, 5 + self.K_OUT), np.int32), {}, []
                continue
            if not self._fused_ok() or self._too_long(batch):
                while pend:
                    yield pend.popleft().result()
                res = super().query_batch(batch)
                yield None, dict(enumerate(res)), batch
                continue
            ctx = self._dispatch_fused(batch)
            pend.append(pool.submit(self._finish_packed_ctx, ctx))
            if len(pend) >= self.PIPELINE_DEPTH:
                yield pend.popleft().result()
        while pend:
            yield pend.popleft().result()

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
        """Software pipeline: batch i+1's upload/compute overlaps batch i's
        result pull + host materialization (worker-thread finish stage)."""
        from collections import deque
        pool = self._finish_pool()
        pend = deque()
        for batch in batches:
            if not batch:
                while pend:
                    yield pend.popleft().result()
                yield []
                continue
            if not self._fused_ok() or self._too_long(batch):
                while pend:
                    yield pend.popleft().result()
                yield super().query_batch(batch)
                continue
            ctx = self._dispatch_fused(batch)
            pend.append(pool.submit(self._finish_fused, ctx))
            if len(pend) >= self.PIPELINE_DEPTH:
                yield pend.popleft().result()
        while pend:
            yield pend.popleft().result()

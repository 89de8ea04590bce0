"""Batched JAX/XLA classification engine — the TPU serving path.

Architecture (vs the per-read loops of the reference, CentrifugerClass.cpp:234-284):
  1. every read contributes forward + reverse-complement strand lanes (and the
     mate's), all packed into one [B, L] uint8 batch (vectorized encoding);
  2. one device `chain_search` computes every semi-maximal hit chain in
     lockstep (DeviceFM.chain_search);
  3. reads whose strands both hit (candidates for the reference's hit-boundary
     adjustment, Classifier.hpp:291-389) take the exact scalar path; the rest
     take the fully vectorized host finalizer (classify/finalize.py) with one
     batched device LF-walk for all SA-range rows.

Results are bit-identical to ClassifierNP (and therefore to the reference
binary) — enforced by the golden TSV tests.
"""

import numpy as np

from .engine_np import ClassifierNP, ClassifierResult, BWTHit
from .finalize import finalize_units, finalize_flat, finalize_prepare
from ..fm.device import DeviceFM
from ..utils import COMP_TABLE


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


def _bucket_size(x, floor=4096):
    """Coarse shape buckets to bound the number of distinct compiles."""
    return max(_next_pow2(x), floor)


class ClassifierJax(ClassifierNP):
    def __init__(self, fm, taxonomy, param, protein=False, dev=None):
        super().__init__(fm, taxonomy, param, protein=protein)
        # dev: optionally a pre-built DeviceFM — or a parallel.sharded
        # .ShardedIndex for sharded-index serving (drop-in: same kernel API)
        self.dev = dev if dev is not None else DeviceFM(fm)
        self.stats = {"fast_units": 0, "slow_units": 0}

    # ------------------------------------------------------------- primitives

    def _encode_lanes(self, raws):
        """Vectorized encode of reads + their revcomps.
        raws: list of uint8 arrays. Returns (codes [2R, L], lengths [2R]):
        lane 2i = forward, lane 2i+1 = revcomp."""
        R = len(raws)
        maxlen = max((len(r) for r in raws), default=1)
        L = max(_round_up(max(maxlen, 32), 64), 64)
        lens = np.fromiter((len(r) for r in raws), np.int32, R)
        flat = np.concatenate(raws) if R else np.zeros(0, np.uint8)
        starts = np.zeros(R + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        fwd = np.full((R, L), 255, np.uint8)
        # scatter reads into the padded matrix
        ridx = np.repeat(np.arange(R), lens)
        cidx = np.arange(len(flat)) - starts[ridx]
        fwd[ridx, cidx] = self.encode[flat]
        # revcomp lanes: complement codes = 3 - code (A<->T, C<->G), reversed
        rc = np.full((R, L), 255, np.uint8)
        rc_codes = np.where(fwd[ridx, cidx] == 255, 255, 3 - fwd[ridx, cidx])
        rc[ridx, lens[ridx] - 1 - cidx] = rc_codes
        codes = np.empty((2 * R, L), np.uint8)
        codes[0::2] = fwd
        codes[1::2] = rc
        lengths = np.repeat(lens, 2).astype(np.int32)
        return codes, lengths

    def _chain_search_dispatch(self, codes, lengths):
        """Dispatch device chain search (async); returns (out handles, B0)."""
        B0, L = codes.shape
        mhl = self.param.min_hit_len
        B = _bucket_size(max(B0, 1))
        H = max(L // (mhl + 1) + 1, 1)
        if B != B0:
            codes = np.concatenate(
                [codes, np.full((B - B0, L), 255, np.uint8)])
            lengths = np.concatenate([lengths, np.zeros(B - B0, np.int32)])
        return self.dev.chain_search(codes, lengths, mhl, H), B0

    def _chain_search_codes(self, codes, lengths):
        """Run device chain search on a [B, L] batch; returns per-lane numpy
        hit arrays (sp, ep, l, off, nhits)."""
        out, B0 = self._chain_search_dispatch(codes, lengths)
        return (np.asarray(out["sp"])[:B0], np.asarray(out["ep"])[:B0],
                np.asarray(out["l"])[:B0], np.asarray(out["off"])[:B0],
                np.asarray(out["nhits"])[:B0])

    def _resolve_dispatch(self, rows):
        """Dispatch the device LF-walk for a flat row array (async);
        returns a handle, or None for an empty row set."""
        if len(rows) == 0:
            return None
        M = _bucket_size(len(rows))
        pad = np.zeros(M, np.int64)
        pad[:len(rows)] = rows
        valid = np.zeros(M, bool)
        valid[:len(rows)] = True
        return self.dev.resolve_rows(pad, valid)

    def _resolve_batch_rows(self, rows):
        """One device LF-walk for a flat row array (blocking)."""
        h = self._resolve_dispatch(rows)
        if h is None:
            return np.zeros(0, np.int64)
        return np.asarray(h)[:len(rows)].astype(np.int64)

    # ------------------------------------------------------------ main entry

    def query_batch(self, queries):
        if self.protein:
            return self._query_batch_protein(queries)
        return self._stage_finalize(self._stage_prep(self._stage_dispatch(queries)))

    def query_pipelined(self, batches):
        """Software-pipelined batch classification (generator).

        Keeps one chain-search batch in flight on the device while the host
        runs strand selection / finalize prep for the previous one — the
        TPU-side replacement for the reference's 3-stage pthread pipeline
        (CentrifugerClass.cpp:555-564, 761-887).  Yields one result list per
        input batch, bit-identical to sequential query_batch calls."""
        from collections import deque
        qa, qb = deque(), deque()
        for batch in batches:
            if self.protein:
                yield self._query_batch_protein(batch)
                continue
            qa.append(self._stage_dispatch(batch))
            if len(qa) >= 2:
                qb.append(self._stage_prep(qa.popleft()))
            if len(qb) >= 2:
                yield self._stage_finalize(qb.popleft())
        while qa:
            qb.append(self._stage_prep(qa.popleft()))
            if len(qb) >= 2:
                yield self._stage_finalize(qb.popleft())
        while qb:
            yield self._stage_finalize(qb.popleft())

    def _stage_dispatch(self, queries):
        """Pipeline stage A: encode strand lanes + async chain-search dispatch."""
        Q = len(queries)
        # strand lanes: [r1 fwd, r1 rc] per query, then [r2 fwd, r2 rc] for
        # paired queries, all in ONE chain-search batch
        raws1 = [q[0] for q in queries]
        raws2 = [q[1] for q in queries if q[1] is not None]
        has_r2 = np.array([q[1] is not None for q in queries])
        codes, lengths = self._encode_lanes(raws1 + raws2)
        out, B0 = self._chain_search_dispatch(codes, lengths)
        return dict(queries=queries, Q=Q, has_r2=has_r2, codes=codes,
                    out=out, B0=B0)

    def _stage_prep(self, ctx):
        """Pipeline stage B: sync chain outputs, strand selection, finalize
        prep, async SA-resolve dispatch."""
        queries, Q, has_r2 = ctx["queries"], ctx["Q"], ctx["has_r2"]
        codes = ctx["codes"]
        out, B0 = ctx["out"], ctx["B0"]
        hsp = np.asarray(out["sp"])[:B0]
        hep = np.asarray(out["ep"])[:B0]
        hlv = np.asarray(out["l"])[:B0]
        hoff = np.asarray(out["off"])[:B0]
        nh = np.asarray(out["nhits"])[:B0]
        H = hsp.shape[1]

        r2_lane0 = np.full(Q, -1, np.int64)  # lane index of r2-fwd per query
        r2_lane0[has_r2] = 2 * Q + 2 * np.arange(int(has_r2.sum()))

        # 2. vectorized strand scores per lane
        mask = np.arange(H)[None, :] < nh[:, None]
        mhl = self.param.min_hit_len
        adjv = self.score_adjust
        lane_score = np.where(mask & (hlv >= mhl),
                              (hlv.astype(np.int64) - adjv) ** 2, 0).sum(axis=1)

        lane_f1 = 2 * np.arange(Q)
        lane_r1 = lane_f1 + 1
        lane_f2 = r2_lane0
        lane_r2 = np.where(r2_lane0 >= 0, r2_lane0 + 1, -1)

        def safe(arr, lanes):
            return np.where(lanes >= 0, arr[np.maximum(lanes, 0)], 0)

        sc_plus = lane_score[lane_f1] + safe(lane_score, lane_r2)
        sc_minus = lane_score[lane_r1] + safe(lane_score, lane_f2)

        needs_adjust = (nh[lane_f1] > 0) & (nh[lane_r1] > 0)
        needs_adjust |= np.where(has_r2,
                                 (safe(nh, lane_f2) > 0) & (safe(nh, lane_r2) > 0),
                                 False)

        # 3. per-unit lane sequence [Q, 4]: plus lanes (fwd r1, rc r2) then
        # minus lanes (rc r1, fwd r2); both on tie (Classifier.hpp:542-562)
        take_plus = sc_plus >= sc_minus
        take_minus = sc_minus >= sc_plus
        seq_lane = np.full((Q, 4), -1, np.int64)
        seq_lane[:, 0] = np.where(take_plus, lane_f1, -1)
        seq_lane[:, 1] = np.where(take_plus, lane_r2, -1)
        seq_lane[:, 2] = np.where(take_minus, lane_r1, -1)
        seq_lane[:, 3] = np.where(take_minus, lane_f2, -1)
        seq_lane[needs_adjust] = -1  # adjustment candidates -> exact path
        seq_strand = np.broadcast_to(np.array([1, 1, -1, -1]), (Q, 4))

        flat_lane = seq_lane.reshape(-1)
        valid_slot = flat_lane >= 0
        slot_unit = np.repeat(np.arange(Q), 4)[valid_slot]
        slot_lane = flat_lane[valid_slot]
        slot_strand = seq_strand.reshape(-1)[valid_slot]

        counts = nh[slot_lane]
        hit_slot = np.repeat(np.arange(len(slot_lane)), counts)
        pos = np.arange(int(counts.sum())) - np.repeat(
            np.cumsum(counts) - counts, counts)
        lanes_r = slot_lane[hit_slot]
        flat = dict(
            uid=slot_unit[hit_slot],
            sp=hsp[lanes_r, pos].astype(np.int64),
            ep=hep[lanes_r, pos].astype(np.int64),
            l=hlv[lanes_r, pos].astype(np.int64),
            off=hoff[lanes_r, pos].astype(np.int64),
            strand=slot_strand[hit_slot].astype(np.int64),
        )
        qlens = [len(r1) + (len(r2) if r2 is not None else 0)
                 for r1, r2 in queries]
        rows, cont = finalize_prepare(self, Q, flat, qlens)
        return dict(queries=queries, Q=Q, cont=cont, rows_n=len(rows),
                    handle=self._resolve_dispatch(rows),
                    needs_adjust=needs_adjust, codes=codes, nh=nh,
                    hsp=hsp, hep=hep, hlv=hlv, hoff=hoff,
                    lane_f1=lane_f1, lane_r1=lane_r1,
                    lane_f2=lane_f2, lane_r2=lane_r2)

    def _stage_finalize(self, ctx):
        """Pipeline stage C: sync resolved seqids, finish per-read records,
        exact scalar path for the rare adjustment candidates."""
        queries, Q = ctx["queries"], ctx["Q"]
        handle = ctx["handle"]
        if handle is None:
            seqids = np.zeros(0, np.int64)
        else:
            seqids = np.asarray(handle)[:ctx["rows_n"]].astype(np.int64)
        results = ctx["cont"](seqids)
        needs_adjust = ctx["needs_adjust"]
        codes = ctx["codes"]
        nh, hsp, hep, hlv, hoff = (ctx["nh"], ctx["hsp"], ctx["hep"],
                                   ctx["hlv"], ctx["hoff"])
        lane_f1, lane_r1, lane_f2, lane_r2 = (ctx["lane_f1"], ctx["lane_r1"],
                                              ctx["lane_f2"], ctx["lane_r2"])

        # 4. exact scalar path for the rare adjustment candidates
        adj_idx = np.flatnonzero(needs_adjust)
        self.stats["fast_units"] += int(Q - len(adj_idx))
        self.stats["slow_units"] += int(len(adj_idx))
        for qi in adj_idx:
            r1, r2 = queries[qi]

            def lane_hits(lane):
                n = int(nh[lane])
                return [(int(hsp[lane, m]), int(hep[lane, m]),
                         int(hlv[lane, m]), int(hoff[lane, m]))
                        for m in range(n)]

            f1 = lane_hits(lane_f1[qi])
            rc1 = lane_hits(lane_r1[qi])
            f2 = lane_hits(lane_f2[qi]) if r2 is not None else None
            rc2 = lane_hits(lane_r2[qi]) if r2 is not None else None
            results[qi] = self._query_exact_unit(
                r1, r2, codes[lane_f1[qi]], codes[lane_r1[qi]],
                None if r2 is None else codes[lane_f2[qi]],
                None if r2 is None else codes[lane_r2[qi]],
                f1, rc1, f2, rc2)
        return results

    def _query_batch_protein(self, queries):
        """Batched translated search: 3 frames x 2 strands per read as device
        lanes, frame selection + strand choice host-side, vectorized finalize.
        (TranslatedSearch, reference Classifier.hpp:451-493: best-scoring frame
        per strand, no hit-boundary adjustment on the protein path.)"""
        from .translate import translate_frames

        lanes = []          # AA code arrays
        lane_of = []        # per (read, strand): list of 3 frame lane ids
        for r1, r2 in queries:
            for raw in ((r1, COMP_TABLE[r1][::-1]) +
                        ((r2, COMP_TABLE[r2][::-1]) if r2 is not None else ())):
                ids = []
                for aa in translate_frames(raw):
                    ids.append(len(lanes))
                    lanes.append(self.encode[aa])
                lane_of.append(ids)

        if not lanes:
            return [self.query(r1, r2) for r1, r2 in queries]
        maxlen = max((len(c) for c in lanes), default=1)
        L = max(_round_up(max(maxlen, 16), 32), 32)
        codes = np.full((len(lanes), L), 255, np.uint8)
        lengths = np.zeros(len(lanes), np.int32)
        for i, c in enumerate(lanes):
            codes[i, :len(c)] = c
            lengths[i] = len(c)
        hits = self._chain_search_codes(codes, lengths)

        def lane_hits(lane):
            sp, ep, hl, off, nh = hits
            n = int(nh[lane])
            return [(int(sp[lane, m]), int(ep[lane, m]), int(hl[lane, m]),
                     int(off[lane, m])) for m in range(n)]

        def best_frame(ids):
            """Frame with max (count * sum-score); ties keep the earlier frame
            (Classifier.hpp:474-487, strict >)."""
            best, tag = 0, 0
            fh = [lane_hits(i) for i in ids]
            for f in range(3):
                sc = len(fh[f]) * sum(self.hit_score(h[2]) for h in fh[f])
                if sc > best:
                    best, tag = sc, f
            return fh[tag]

        fast_units = []
        li = 0
        for r1, r2 in queries:
            plus = best_frame(lane_of[li])       # fwd r1
            minus = best_frame(lane_of[li + 1])  # rc r1
            li += 2
            if r2 is not None:
                plus2 = best_frame(lane_of[li])
                minus2 = best_frame(lane_of[li + 1])
                li += 2
                plus = plus + minus2
                minus = minus + plus2
            sc_plus = sum(self.hit_score(h[2]) for h in plus)
            sc_minus = sum(self.hit_score(h[2]) for h in minus)
            if sc_plus > sc_minus:
                chosen = [(h, 1) for h in plus]
            elif sc_minus > sc_plus:
                chosen = [(h, -1) for h in minus]
            else:
                chosen = [(h, 1) for h in plus] + [(h, -1) for h in minus]
            hd = dict(
                sp=np.array([h[0] for h, s in chosen], np.int64),
                ep=np.array([h[1] for h, s in chosen], np.int64),
                l=np.array([h[2] for h, s in chosen], np.int64),
                off=np.array([h[3] for h, s in chosen], np.int64),
                strand=np.array([s for h, s in chosen], np.int64),
            )
            ql = len(r1) + (len(r2) if r2 is not None else 0)
            fast_units.append(dict(hits=hd, query_length=ql))
        return finalize_units(self, fast_units, self._resolve_batch_rows)

    def _adjusted_unit_hits(self, r1, r2, c1f, c1r, c2f, c2r, f1, rc1, f2, rc2,
                            search1=None, search2=None):
        """SearchForwardAndReverse tail for one unit, reusing device-computed
        chains: boundary adjustment + strand selection.  Returns the chosen
        hits list (Classifier.hpp:291-389, 554-562).  search1/search2
        optionally serve the adjustment's backward searches from a batched
        device dispatch (engine_fused)."""
        strand_hits = [[BWTHit(*h, 0) for h in rc1], [BWTHit(*h, 0) for h in f1]]
        self.adjust_hit_boundary(c1f[:len(r1)], c1r[:len(r1)], len(r1),
                                 strand_hits, search=search1)
        if r2 is not None:
            r2_strand = [[BWTHit(*h, 0) for h in rc2], [BWTHit(*h, 0) for h in f2]]
            self.adjust_hit_boundary(c2f[:len(r2)], c2r[:len(r2)], len(r2),
                                     r2_strand, search=search2)
            for k in range(2):
                strand_hits[k].extend(r2_strand[1 - k])
        strand_score = [0, 0]
        for k in range(2):
            for h in strand_hits[k]:
                h.strand = 2 * k - 1
            strand_score[k] = self.hits_score(strand_hits[k])
        if strand_score[1] > strand_score[0]:
            return strand_hits[1]
        if strand_score[0] > strand_score[1]:
            return strand_hits[0]
        return strand_hits[1] + strand_hits[0]

    def _query_exact_unit(self, r1, r2, c1f, c1r, c2f, c2r, f1, rc1, f2, rc2):
        """Exact scalar path for adjustment-candidate reads, reusing the
        device-computed chains."""
        hits = self._adjusted_unit_hits(r1, r2, c1f, c1r, c2f, c2r,
                                        f1, rc1, f2, rc2)
        result = ClassifierResult()
        self.classify_from_hits(hits, result)
        result.query_length = len(r1) + (len(r2) if r2 is not None else 0)
        return result

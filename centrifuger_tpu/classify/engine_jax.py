"""Batched JAX/XLA classification engine — the TPU serving path.

Architecture (vs the per-read loops of the reference, CentrifugerClass.cpp:234-284):
  1. every read contributes forward + reverse-complement strand lanes (and the
     mate's), all packed into one [B, L] uint8 batch;
  2. one device `chain_search` computes every semi-maximal hit chain in
     lockstep (DeviceFM.chain_search);
  3. the rare hit-boundary adjustment (both strands overlapping, reference
     Classifier.hpp:291-389) runs host-side with scalar searches;
  4. all SA-range rows from all surviving hits resolve in one device LF-walk
     (`resolve_rows`), then host-side scoring/taxonomy finishes per read.

Results are bit-identical to ClassifierNP (and therefore to the reference
binary) — enforced by tests/test_engine_jax.py and the golden TSV tests.
"""

import numpy as np

from .engine_np import ClassifierNP, ClassifierResult, BWTHit
from ..fm.device import DeviceFM
from ..utils import COMP_TABLE


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


class ClassifierJax(ClassifierNP):
    def __init__(self, fm, taxonomy, param, protein=False):
        super().__init__(fm, taxonomy, param, protein=protein)
        self.dev = DeviceFM(fm)

    # -------------------------------------------------------------- batching

    def _chain_search_batch(self, lane_codes):
        """lane_codes: list of uint8 arrays (255-coded). Returns list of hit
        lists [(sp, ep, l, offset), ...] per lane, in chain order."""
        if not lane_codes:
            return []
        mhl = self.param.min_hit_len
        maxlen = max(len(c) for c in lane_codes)
        L = max(_round_up(max(maxlen, 32), 64), 64)
        B = _next_pow2(len(lane_codes))
        H = max(L // (mhl + 1) + 1, 1)
        codes = np.full((B, L), 255, dtype=np.uint8)
        lengths = np.zeros(B, dtype=np.int32)
        for i, c in enumerate(lane_codes):
            codes[i, :len(c)] = c
            lengths[i] = len(c)
        out = self.dev.chain_search(codes, lengths, mhl, H)
        nhits = np.asarray(out["nhits"])
        hsp = np.asarray(out["sp"])
        hep = np.asarray(out["ep"])
        hl = np.asarray(out["l"])
        hoff = np.asarray(out["off"])
        res = []
        for i in range(len(lane_codes)):
            cnt = int(nhits[i])
            res.append([(int(hsp[i, j]), int(hep[i, j]), int(hl[i, j]),
                         int(hoff[i, j])) for j in range(cnt)])
        return res

    def _resolve_batch(self, row_arrays):
        """row_arrays: list of int64 np arrays. One device LF-walk for all."""
        total = sum(len(r) for r in row_arrays)
        if total == 0:
            return [np.zeros(0, dtype=np.int64) for _ in row_arrays]
        flat = np.concatenate(row_arrays).astype(np.int64)
        M = _next_pow2(len(flat))
        rows = np.zeros(M, dtype=np.int64)
        rows[:len(flat)] = flat
        valid = np.zeros(M, dtype=bool)
        valid[:len(flat)] = True
        out = np.asarray(self.dev.resolve_rows(rows.astype(np.int64), valid))
        res = []
        off = 0
        for r in row_arrays:
            res.append(out[off:off + len(r)].astype(np.int64))
            off += len(r)
        return res

    # ------------------------------------------------------------ main entry

    def query_batch(self, queries):
        if self.protein:
            # translated search stays on the host oracle path for now
            return [self.query(r1, r2) for r1, r2 in queries]

        # 1. build strand lanes: per query, lanes in order
        #    [r1 fwd, r1 rc, (r2 fwd, r2 rc)]
        lane_codes = []
        lane_map = []  # per query: (idx_r1fwd, idx_r1rc, idx_r2fwd|None, idx_r2rc|None)
        raws = []
        for r1, r2 in queries:
            rc1 = COMP_TABLE[r1][::-1]
            idxs = [len(lane_codes), len(lane_codes) + 1]
            lane_codes.append(self.encode[r1])
            lane_codes.append(self.encode[rc1])
            if r2 is not None:
                rc2 = COMP_TABLE[r2][::-1]
                idxs += [len(lane_codes), len(lane_codes) + 1]
                lane_codes.append(self.encode[r2])
                lane_codes.append(self.encode[rc2])
            else:
                idxs += [None, None]
            lane_map.append(idxs)
            raws.append((r1, rc1, r2))

        chain_hits = self._chain_search_batch(lane_codes)

        # 2. per read: strand hit lists + boundary adjustment + strand choice
        all_hits = []  # final hit list per query
        for qi, (r1, r2) in enumerate(queries):
            i_f1, i_r1, i_f2, i_r2 = lane_map[qi]
            strand_hits = [
                [BWTHit(*h, 0) for h in chain_hits[i_r1]],
                [BWTHit(*h, 0) for h in chain_hits[i_f1]],
            ]
            codes1 = lane_codes[i_f1]
            rc_codes1 = lane_codes[i_r1]
            self.adjust_hit_boundary(codes1, rc_codes1, len(r1), strand_hits)
            if r2 is not None:
                r2_strand = [
                    [BWTHit(*h, 0) for h in chain_hits[i_r2]],
                    [BWTHit(*h, 0) for h in chain_hits[i_f2]],
                ]
                self.adjust_hit_boundary(lane_codes[i_f2], lane_codes[i_r2],
                                         len(r2), r2_strand)
                for k in range(2):
                    strand_hits[k].extend(r2_strand[1 - k])
            strand_score = [0, 0]
            for k in range(2):
                for h in strand_hits[k]:
                    h.strand = 2 * k - 1
                strand_score[k] = self.hits_score(strand_hits[k])
            if strand_score[1] > strand_score[0]:
                hits = strand_hits[1]
            elif strand_score[0] > strand_score[1]:
                hits = strand_hits[0]
            else:
                hits = strand_hits[1] + strand_hits[0]
            all_hits.append(hits)

        # 3. batched SA resolution for every hit of every read
        row_arrays = []
        hit_row_index = []  # per query: list of row-array indices per hit
        for hits in all_hits:
            idxs = []
            for h in hits:
                if h.l < self.param.min_hit_len:
                    idxs.append(None)
                    continue
                idxs.append(len(row_arrays))
                row_arrays.append(self.rows_for_hit(h))
            hit_row_index.append(idxs)
        resolved_flat = self._resolve_batch(row_arrays)

        # 4. host-side scoring + taxonomy per read
        results = []
        for qi, (r1, r2) in enumerate(queries):
            hits = all_hits[qi]
            resolved = [resolved_flat[j] if j is not None else None
                        for j in hit_row_index[qi]]
            result = ClassifierResult()
            self.classify_from_hits(hits, result, resolved=resolved)
            result.query_length = len(r1) + (len(r2) if r2 is not None else 0)
            results.append(result)
        return results

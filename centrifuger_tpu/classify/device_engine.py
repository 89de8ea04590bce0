"""Fully-fused device classification program.

One jitted program per (Q, L, mates) shape bucket runs the ENTIRE per-read
pipeline on device — encode + revcomp lanes, semi-maximal chain search, strand
selection, SA-range row expansion (with the reference's bidirectional striding
cap), the LF-walk resolve, per-(read, strand, seqid) score aggregation
including adjacent-unique-hit merge chains, and best/second-best selection —
and returns ONE packed [Q, 5+K_out] int32 array.

Motivation (measured on the TPU serving setup): host<->device transfers carry
~10 ms fixed latency each and ~150 MB/s bandwidth, so the round-1 design
(pull [B, H] hit arrays to the host and finalize in NumPy) was transfer-bound.
Here the only per-batch transfers are the raw read bytes up and the compact
result rows down.

Semantics are value-identical to the host engine (classify/engine_np.py) and
therefore to the reference binary:
  * chain search      = GetHitsFromRead x BackwardSearch
                        (reference Classifier.hpp:262-281, FMIndex.hpp:487-510)
  * strand selection  = SearchForwardAndReverse tie rules (Classifier.hpp:554-562)
  * row striding      = the k*hitkFactor bidirectional subset (Classifier.hpp:606-652)
  * merge chains      = adjacent-unique-hit rescore (Classifier.hpp:659-671)
  * best/second       = map-iteration-order ties, k then seqid ascending
                        (Classifier.hpp:696-738)

Reads that need the rare exact paths are flagged for the host: hit-boundary
adjustment candidates (both strands hit, Classifier.hpp:291-389), units whose
row expansion exceeds the device row budget, and units with more best seqids
than the device returns (taxonomy promotion runs host-side from the returned
seqids when they fit).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

I32_MAX = np.int32(2**31 - 1)

FLAG_ADJUST = 1      # both strands hit somewhere -> boundary-adjustment path
FLAG_ROW_OVERFLOW = 2  # unit's expanded SA rows exceed the device row budget


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros(1, x.dtype), c[:-1]]), c


def _changed(a):
    """[R] -> bool flags: element differs from its predecessor (first=True)."""
    d = jnp.ones(a.shape[0], bool)
    return d.at[1:].set(a[1:] != a[:-1])


def _seg_start_index(boundary):
    """Per row: index of its segment's first row (boundary: bool [R])."""
    idx = jnp.arange(boundary.shape[0], dtype=jnp.int32)
    return lax.associative_scan(jnp.maximum, jnp.where(boundary, idx, -1))


def _seg_end_index(boundary):
    """Per row: index of its segment's last row."""
    R = boundary.shape[0]
    idx = jnp.arange(R, dtype=jnp.int32)
    nxt = jnp.concatenate([boundary[1:], jnp.ones(1, bool)])  # last row of seg
    return lax.associative_scan(jnp.minimum,
                                jnp.where(nxt, idx, I32_MAX), reverse=True)


def _seg_cummax(vals, boundary):
    def comb(l, r):
        lf, lv = l
        rf, rv = r
        return (lf | rf, jnp.where(rf, rv, jnp.maximum(lv, rv)))
    _, v = lax.associative_scan(comb, (boundary, vals))
    return v


def _seg_cumsum(vals, boundary):
    def comb(l, r):
        lf, lv = l
        rf, rv = r
        return (lf | rf, jnp.where(rf, rv, lv + rv))
    _, v = lax.associative_scan(comb, (boundary, vals))
    return v


def encode_dna_device(reads, lengths):
    """reads: [U, L] uint8 raw bytes; -> (codes_fwd, codes_rc) int32 with 255
    for characters outside ACGTacgt / beyond length (SequenceCompactor drop
    semantics, reference compactds/SequenceCompactor.hpp:72-78)."""
    U, L = reads.shape
    r = reads.astype(jnp.int32)
    up = jnp.where(r >= ord('a'), r - 32, r)  # uppercase
    code = jnp.full(r.shape, 255, jnp.int32)
    code = jnp.where(up == ord('A'), 0, code)
    code = jnp.where(up == ord('C'), 1, code)
    code = jnp.where(up == ord('G'), 2, code)
    code = jnp.where(up == ord('T'), 3, code)
    inlen = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    code = jnp.where(inlen, code, 255)
    # reverse complement via one flat gather
    idxr = lengths[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    ok = idxr >= 0
    flat = code.reshape(-1)
    g = flat[(jnp.arange(U, dtype=jnp.int32)[:, None] * L
              + jnp.clip(idxr, 0, L - 1)).reshape(-1)].reshape(U, L)
    rc = jnp.where(ok & (g != 255), 3 - g, 255)
    return code, rc


def fused_classify(dev, reads, lengths, nr, mhl, H, max_result,
                   hitk_factor, k_out, r_cap):
    """The device program. All args after `dev` are traced arrays or static
    python ints. reads [U, L] uint8, lengths [U] int32, U = Q * nr.

    Returns dict with:
      packed  [Q, 5 + k_out] int32:
              score, second, hitlen, n_best, flags, sid_0..sid_{k_out-1}
      hits    [B, H, 4] int32 (sp, ep, l, off) - for host fallback paths
      nhits   [B] int32
    """
    U, L = reads.shape
    Q = U // nr
    it = dev.idtype
    max_entries = max_result * hitk_factor

    # ---- encode + strand lanes: lane 2u = fwd, 2u+1 = rc ----
    cf, cr = encode_dna_device(reads, lengths.astype(jnp.int32))
    codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
    lanelens = jnp.repeat(lengths.astype(jnp.int32), 2)
    B = 2 * U

    # ---- chain search ----
    ch = dev._chain_search_impl(codes, lanelens, mhl, H)
    hsp, hep, hlv, hoff = ch["sp"], ch["ep"], ch["l"], ch["off"]
    nhits = ch["nhits"]

    # ---- strand scores + selection (Classifier.hpp:496-569) ----
    adj = 15  # _scoreHitLenAdjust, nucleotide
    hmask = jnp.arange(H, dtype=jnp.int32)[None, :] < nhits[:, None]
    lane_score = jnp.sum(
        jnp.where(hmask & (hlv >= mhl),
                  (hlv.astype(jnp.int32) - adj) ** 2, 0), axis=1)

    q = jnp.arange(Q, dtype=jnp.int32)
    if nr == 2:
        f1, r1, f2, r2 = 4 * q, 4 * q + 1, 4 * q + 2, 4 * q + 3
        sc_plus = lane_score[f1] + lane_score[r2]
        sc_minus = lane_score[r1] + lane_score[f2]
        needs_adjust = ((nhits[f1] > 0) & (nhits[r1] > 0)) | \
                       ((nhits[f2] > 0) & (nhits[r2] > 0))
    else:
        f1, r1 = 2 * q, 2 * q + 1
        f2 = r2 = jnp.full(Q, -1, jnp.int32)
        sc_plus = lane_score[f1]
        sc_minus = lane_score[r1]
        needs_adjust = (nhits[f1] > 0) & (nhits[r1] > 0)

    take_plus = sc_plus >= sc_minus
    take_minus = sc_minus >= sc_plus
    # slot order matches the host finalizer: plus lanes (f1, r2) then minus
    # lanes (r1, f2); k per slot: +1 +1 -1 -1 -> k = 1 1 0 0
    slot_lane = jnp.stack([
        jnp.where(take_plus, f1, -1),
        jnp.where(take_plus, r2, -1),
        jnp.where(take_minus, r1, -1),
        jnp.where(take_minus, f2, -1)], axis=1)          # [Q, 4]
    slot_k = jnp.broadcast_to(jnp.array([1, 1, 0, 0], jnp.int32), (Q, 4))

    # ---- flat unit-hit table [F = Q*4*H] in host-finalizer flat order ----
    S = 4 * H
    F = Q * S
    lane_of_slot = slot_lane.reshape(-1)                  # [Q*4]
    lane_safe = jnp.maximum(lane_of_slot, 0)
    # gather hit rows for each slot: [Q*4, H]
    def slot_gather(a):
        return a[lane_safe].reshape(Q, 4, H).reshape(F)
    f_sp = slot_gather(hsp).astype(jnp.int32)
    f_ep = slot_gather(hep).astype(jnp.int32)
    f_l = slot_gather(hlv).astype(jnp.int32)
    f_off = slot_gather(hoff).astype(jnp.int32)
    f_n = jnp.repeat(nhits[lane_safe], H)
    hit_pos = jnp.tile(jnp.arange(H, dtype=jnp.int32), (Q * 4,))
    present = (jnp.repeat(lane_of_slot, H) >= 0) & (hit_pos < f_n)
    f_k = jnp.repeat(slot_k.reshape(-1), H)
    f_uid = jnp.repeat(q, S)

    # previous present hit within the unit (for mix/merge adjacency)
    fidx = jnp.arange(F, dtype=jnp.int32)
    prev_present = lax.associative_scan(
        jnp.maximum, jnp.where(present, fidx, -1))
    prev_idx = jnp.concatenate([jnp.full(1, -1, jnp.int32), prev_present[:-1]])
    unit_start = f_uid * S
    has_prev = present & (prev_idx >= unit_start)
    prev_safe = jnp.maximum(prev_idx, 0)

    # mixStrand per unit (over the full present-hit list, Classifier.hpp:584-591)
    mix_flag = has_prev & (f_k != f_k[prev_safe])
    mix = jnp.any(mix_flag.reshape(Q, S), axis=1)

    # ---- row expansion with striding (Classifier.hpp:606-652) ----
    rng = f_ep - f_sp + 1
    live = present  # chain search records only hits with l >= mhl, sp <= ep
    simple = rng <= max_entries
    step = (rng + max_entries - 1) // max_entries
    step = jnp.maximum(step, 1)
    cnt_fwd = (rng + step - 1) // step
    cnt_bwd = jnp.minimum((f_ep - f_sp) // step + 1,
                          jnp.maximum(1, max_entries - cnt_fwd))
    counts = jnp.where(live, jnp.where(simple, rng, cnt_fwd + cnt_bwd), 0)
    # per-UNIT row budget u_cap = r_cap // Q: a unit whose expansion exceeds
    # it is flagged for host fallback without perturbing any other unit's rows
    u_cap = r_cap // Q
    R = Q * u_cap
    counts2 = counts.reshape(Q, S)
    wcum = jnp.cumsum(counts2, axis=1)                 # [Q, S] inclusive
    unit_total = wcum[:, -1]
    overflow = unit_total > u_cap
    starts = (f_uid * u_cap + (wcum - counts2).reshape(F)).astype(jnp.int32)

    ridx = jnp.arange(R, dtype=jnp.int32)
    r_q = ridx // u_cap
    r_j = ridx - r_q * u_cap
    row_valid = r_j < jnp.minimum(unit_total[r_q], u_cap)
    # hit within unit: count of unit hits whose cumulative rows <= j
    hit_in_unit = jnp.sum((wcum[r_q] <= r_j[:, None]).astype(jnp.int32),
                          axis=1)
    hit_of_row = jnp.clip(r_q * S + hit_in_unit, 0, F - 1)
    pos = (r_j - (starts[hit_of_row] - r_q * u_cap)).astype(jnp.int32)
    r_sp = f_sp[hit_of_row]
    r_ep = f_ep[hit_of_row]
    r_step = step[hit_of_row].astype(jnp.int32)
    r_cf = cnt_fwd[hit_of_row].astype(jnp.int32)
    r_simple = simple[hit_of_row]
    rows = jnp.where(r_simple, r_sp + pos,
                     jnp.where(pos < r_cf, r_sp + pos * r_step,
                               r_ep - (pos - r_cf) * r_step))
    rows = jnp.where(row_valid, rows, 0)

    # ---- LF-walk resolve (BackwardToSampledSA, FMIndex.hpp:513-524) ----
    seqids = dev._resolve_rows_impl(rows.astype(it), row_valid).astype(jnp.int32)

    # ---- merge-chain ids over hits (needs resolved seqid of 1-row hits) ----
    sid_uniq = seqids[jnp.clip(starts, 0, R - 1)]
    uniq_hit = live & (rng == 1)
    merge_prev = (has_prev & (~mix[f_uid])
                  & uniq_hit & uniq_hit[prev_safe]
                  & (f_k == f_k[prev_safe])
                  & (f_off[prev_safe] + f_l[prev_safe] + 1 == f_off)
                  & (sid_uniq == sid_uniq[prev_safe]))
    chain_of_hit = jnp.cumsum((present & (~merge_prev)).astype(jnp.int32))

    # ---- sort rows by (uid*2+k, sid, hit) ----
    key_a = jnp.where(row_valid, f_uid[hit_of_row] * 2 + f_k[hit_of_row],
                      I32_MAX)
    key_b = jnp.where(row_valid, seqids, I32_MAX)
    key_c = jnp.where(row_valid, hit_of_row, I32_MAX)
    key_a, key_b, key_c = lax.sort((key_a, key_b, key_c), num_keys=3)
    s_valid = key_a != I32_MAX
    s_hit = jnp.clip(key_c, 0, F - 1)
    s_uid = key_a >> 1
    s_sid = key_b
    s_l = f_l[s_hit]
    s_chain = chain_of_hit[s_hit]

    # segment boundaries in sorted order (chain monotone in hit index, so
    # within (uidk, sid) groups chains are contiguous)
    ch_a = _changed(key_a)
    ch_b = _changed(key_b)
    ch_c = _changed(key_c)
    pair_first = (ch_a | ch_b | ch_c) & s_valid   # unique (hit, seqid)
    cb = (ch_a | ch_b | _changed(s_chain)) & s_valid  # chain segment start
    rb = (ch_a | ch_b) & s_valid                       # record segment start
    ub = _changed(s_uid) & s_valid                     # unit segment start

    # ---- chain sums -> chain scores -> record score/hitlen ----
    w_l = jnp.where(pair_first, s_l, 0)
    p1 = jnp.cumsum(w_l)
    cstart = _seg_start_index(cb | (~s_valid))
    p1_before = jnp.where(cstart > 0, p1[jnp.maximum(cstart - 1, 0)], 0)
    last_of_chain = jnp.concatenate([cb[1:] | (~s_valid[1:]), jnp.ones(1, bool)]) \
        & s_valid
    chain_lsum = p1 - p1_before                        # full sum at chain-last
    chain_score = jnp.where(last_of_chain & (chain_lsum >= mhl),
                            (chain_lsum - adj) ** 2, 0)

    p2 = jnp.cumsum(chain_score)
    rstart = _seg_start_index(rb | (~s_valid))
    p2_before = jnp.where(rstart > 0, p2[jnp.maximum(rstart - 1, 0)], 0)
    p1r_before = jnp.where(rstart > 0, p1[jnp.maximum(rstart - 1, 0)], 0)
    last_of_rec = jnp.concatenate([rb[1:] | (~s_valid[1:]), jnp.ones(1, bool)]) \
        & s_valid
    rec_score = jnp.where(last_of_rec, p2 - p2_before, -1)
    rec_hitlen = p1 - p1r_before                       # meaningful at rec-last

    # ---- per-unit best / second / bestlen ----
    useg = ub | (~s_valid)
    uend = _seg_end_index(useg)
    best_prefix = _seg_cummax(rec_score, useg)
    unit_best = best_prefix[uend]                      # broadcast to rows
    qual = last_of_rec & (rec_score == unit_best)
    nbest_prefix = _seg_cumsum(qual.astype(jnp.int32), useg)
    unit_nbest = nbest_prefix[uend]
    qual_rank = nbest_prefix                           # inclusive rank at quals
    rest = jnp.where(last_of_rec & (rec_score < unit_best), rec_score, 0)
    rest_prefix = _seg_cummax(rest, useg)
    unit_rest = rest_prefix[uend]
    unit_second = jnp.where(unit_nbest >= 2, unit_best,
                            jnp.maximum(unit_rest, 0))

    # scatter per-unit scalars (masked at unit-last rows)
    is_ulast = (jnp.arange(R, dtype=jnp.int32) == uend) & s_valid
    out_uid = jnp.where(is_ulast, s_uid, Q)            # Q = drop slot
    score_out = jnp.zeros(Q + 1, jnp.int32).at[out_uid].max(
        jnp.where(is_ulast, jnp.maximum(unit_best, 0), 0))
    second_out = jnp.zeros(Q + 1, jnp.int32).at[out_uid].max(
        jnp.where(is_ulast, unit_second, 0))
    nbest_out = jnp.zeros(Q + 1, jnp.int32).at[out_uid].max(
        jnp.where(is_ulast, unit_nbest, 0))
    # hitlen of the FIRST best record (k asc, sid asc iteration order)
    first_best = qual & (qual_rank == 1)
    hl_uid = jnp.where(first_best, s_uid, Q)
    hitlen_out = jnp.zeros(Q + 1, jnp.int32).at[hl_uid].max(
        jnp.where(first_best, rec_hitlen, 0))

    # ---- best seqids: dedup by sid (first k wins), order (k asc, sid asc) ----
    # sort best-record candidates by (uid, sid, k) to find duplicates
    d_a = jnp.where(qual, s_uid, I32_MAX)
    d_b = jnp.where(qual, s_sid, I32_MAX)
    d_c = jnp.where(qual, key_a & 1, I32_MAX)
    d_a, d_b, d_c = lax.sort((d_a, d_b, d_c), num_keys=3)
    d_valid = d_a != I32_MAX
    dup = d_valid & (~(_changed(d_a) | _changed(d_b)))  # same (uid,sid) again
    n_dup = jnp.zeros(Q + 1, jnp.int32).at[
        jnp.where(d_valid, d_a, Q)].add(dup.astype(jnp.int32))
    # emit list: resort deduped candidates by (uid, k, sid)
    e_a = jnp.where(d_valid & (~dup), d_a, I32_MAX)
    e_b = jnp.where(d_valid & (~dup), d_c, I32_MAX)    # k
    e_c = jnp.where(d_valid & (~dup), d_b, I32_MAX)    # sid
    e_a, e_b, e_c = lax.sort((e_a, e_b, e_c), num_keys=3)
    e_valid = e_a != I32_MAX
    erank = _seg_cumsum(e_valid.astype(jnp.int32),
                        _changed(e_a) | (~e_valid)) - 1
    sid_slot = jnp.where(e_valid & (erank < k_out), erank, k_out)
    sid_uidx = jnp.where(e_valid & (erank < k_out), e_a, Q)
    sids_out = jnp.full((Q + 1, k_out + 1), 0, jnp.int32).at[
        sid_uidx, sid_slot].set(jnp.where(e_valid, e_c, 0))

    nbest_dedup = nbest_out[:Q] - n_dup[:Q]

    flags = (needs_adjust.astype(jnp.int32) * FLAG_ADJUST
             | overflow.astype(jnp.int32) * FLAG_ROW_OVERFLOW)

    packed = jnp.concatenate([
        score_out[:Q, None], second_out[:Q, None], hitlen_out[:Q, None],
        nbest_dedup[:, None], flags[:, None], sids_out[:Q, :k_out]], axis=1)

    hits_packed = jnp.stack([hsp.astype(jnp.int32), hep.astype(jnp.int32),
                             hlv.astype(jnp.int32), hoff.astype(jnp.int32)],
                            axis=2)
    return dict(packed=packed, hits=hits_packed, nhits=nhits)

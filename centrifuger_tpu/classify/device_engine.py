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

Layout (round-3 redesign): every aggregation segment (strand group, seqid
record, merge chain) lives INSIDE one read-unit, and each unit owns a fixed
S = 4*H hit-slot row and a fixed W = u_cap expanded-row row.  So the whole
finalize runs as [Q, S] / [Q, W] per-row ops: minor-axis `lax.sort`s of
16-24-wide rows and log2(W)-step doubling reductions — NOT global sorts and
associative_scans over Q*W rows.  Two reasons, both measured:
  * XLA:TPU compile-time: a cumulative-scan output elementwise-combined with
    a large-table gather result melts the fusion pass (~220 s per program,
    tools/bisect_compile4.py); the doubling form compiles in seconds.
  * runtime: [131072]-row 3-key sorts cost tens of ms; [8192, 16] minor-axis
    sorts are microseconds.

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

FB_CAP = 64          # flagged units whose chains ship with the main result


# ---------------------------------------------------------------- row helpers
# All per-unit scans run along axis 1 (width 16-32) as log2(W) static-shift
# doubling steps.  Deliberately NO lax.associative_scan / lax.cummax: their
# outputs fused with gather results trigger a pathological XLA:TPU fusion-pass
# blowup (measured ~220 s compile; see module docstring).

def _row_shift_right(x, s, fill):
    """[Q, W] -> x shifted right by s along axis 1, filling with `fill`."""
    Q, W = x.shape
    pad = jnp.full((Q, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :W - s]], axis=1)


def _row_cumsum(x):
    """Inclusive cumsum along axis 1."""
    s = 1
    W = x.shape[1]
    while s < W:
        x = x + _row_shift_right(x, s, jnp.zeros((), x.dtype))
        s *= 2
    return x


def _row_cummax(x):
    """Inclusive cummax along axis 1."""
    s = 1
    W = x.shape[1]
    mn = jnp.asarray(np.iinfo(np.int32).min, x.dtype)
    while s < W:
        x = jnp.maximum(x, _row_shift_right(x, s, mn))
        s *= 2
    return x


def _row_seg_cumsum(vals, boundary):
    """Inclusive SEGMENTED cumsum along axis 1; boundary=True starts a new
    segment at that column."""
    v, f = vals, boundary
    s = 1
    W = vals.shape[1]
    zero = jnp.zeros((), vals.dtype)
    while s < W:
        v_sh = _row_shift_right(v, s, zero)
        f_sh = _row_shift_right(f, s, True)
        v = jnp.where(f, v, v_sh + v)
        f = f | f_sh
        s *= 2
    return v


def _row_changed(a):
    """[Q, W] -> bool: column differs from its left neighbor (col 0 = True)."""
    Q, W = a.shape
    d = a[:, 1:] != a[:, :-1]
    return jnp.concatenate([jnp.ones((Q, 1), bool), d], axis=1)


def _rc_lanes(code, lengths):
    """code [U, L] int32 (255 invalid) -> (code, revcomp code) lanes; the
    reverse complement comes from one flat gather."""
    U, L = code.shape
    idxr = lengths[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    ok = idxr >= 0
    flat = code.reshape(-1)
    g = flat[(jnp.arange(U, dtype=jnp.int32)[:, None] * L
              + jnp.clip(idxr, 0, L - 1)).reshape(-1)].reshape(U, L)
    rc = jnp.where(ok & (g != 255), 3 - g, 255)
    return code, rc


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
    return _rc_lanes(code, lengths)


def decode_packed_dna(pack2, vmask, lengths):
    """2-bit-packed reads -> (codes_fwd, codes_rc) int32 lanes.

    pack2: [U, L//4] uint8, 4 bases/byte little-endian 2-bit codes;
    vmask: [U, L//8] uint8, little-endian per-base validity bits (0 = char
    outside the alphabet / beyond length -> code 255).  The host packs reads
    this way (engine_fused._pack_reads) to cut upload bytes 2.7x — the
    serving H2D link is the throughput bound on remote/tunneled devices."""
    U, L4 = pack2.shape
    L = L4 * 4
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    w = jnp.repeat(pack2.astype(jnp.int32), 4, axis=1)        # [U, L]
    code = (w >> ((j & 3) * 2)) & 3
    v = (jnp.repeat(vmask.astype(jnp.int32), 8, axis=1) >> (j & 7)) & 1
    inlen = j < lengths[:, None]
    code = jnp.where((v == 1) & inlen, code, 255)
    return _rc_lanes(code, lengths)


def fused_classify(dev, reads, lengths, nr, mhl, H, max_result,
                   hitk_factor, k_out, r_cap, protein=False):
    """The device program. All args after `dev` are traced arrays or static
    python ints. reads [U, L] uint8, lengths [U] int32, U = Q * nr.

    Returns dict with:
      packed  [Q, 5 + k_out] int32:
              score, second, hitlen, n_best, flags, sid_0..sid_{k_out-1}
      hits    [B, H, 4] int32 (sp, ep, l, off) - for host fallback paths
      nhits   [B] int32

    Nucleotide mode: `reads` is either a raw [U, L] uint8 byte matrix or a
    2-bit-packed (pack2, vmask) pair (see decode_packed_dna); the program
    builds the fwd/rc strand lanes itself.

    Protein mode (translated search, reference Classifier.hpp:451-493):
    `reads` is a pre-encoded AA-code matrix [U*6, L] uint8 (255 invalid) with
    per-read lane order [fwd frame 0..2, rc frame 0..2] and `lengths` the
    per-lane AA lengths; frame and strand choice run on device, and there is
    no hit-boundary adjustment on the protein path.
    """
    if protein:
        codes = reads
        lanelens = lengths.astype(jnp.int32)
        U = codes.shape[0] // 6
        L = codes.shape[1]
    # ---- encode + strand lanes: lane 2u = fwd, 2u+1 = rc ----
    elif isinstance(reads, (tuple, list)):
        pack2, vmask = reads
        U, L = pack2.shape[0], pack2.shape[1] * 4
        cf, cr = decode_packed_dna(pack2, vmask, lengths.astype(jnp.int32))
    else:
        U, L = reads.shape
        cf, cr = encode_dna_device(reads, lengths.astype(jnp.int32))
    Q = U // nr
    it = dev.idtype
    max_entries = max_result * hitk_factor
    rowQ = jnp.arange(Q, dtype=jnp.int32)
    if not protein:
        codes = jnp.stack([cf, cr], axis=1).reshape(2 * U, L)
        lanelens = jnp.repeat(lengths.astype(jnp.int32), 2)

    # ---- chain search ----
    ch = dev._chain_search_impl(codes, lanelens, mhl, H)
    hsp, hep, hlv, hoff = ch["sp"], ch["ep"], ch["l"], ch["off"]
    nhits = ch["nhits"]

    # ---- strand scores + selection (Classifier.hpp:496-569) ----
    adj = 5 if protein else 15  # _scoreHitLenAdjust (Classifier.hpp:807,892)
    hmask = jnp.arange(H, dtype=jnp.int32)[None, :] < nhits[:, None]
    lane_score = jnp.sum(
        jnp.where(hmask & (hlv >= mhl),
                  (hlv.astype(jnp.int32) - adj) ** 2, 0), axis=1)

    if protein:
        # frame choice per (read, strand): max of nhits * score with strict >
        # (best starts 0; ties keep the earlier frame, Classifier.hpp:474-487)
        qscore = nhits * lane_score

        def chosen(lane0):
            sc0, sc1, sc2 = qscore[lane0], qscore[lane0 + 1], qscore[lane0 + 2]
            tag = jnp.zeros_like(sc0)
            best = jnp.where(sc0 > 0, sc0, 0)
            upd = sc1 > best
            tag = jnp.where(upd, 1, tag)
            best = jnp.where(upd, sc1, best)
            upd = sc2 > best
            tag = jnp.where(upd, 2, tag)
            return lane0 + tag

        r1l0 = 6 * nr * rowQ
        f1 = chosen(r1l0)
        r1 = chosen(r1l0 + 3)
        if nr == 2:
            f2 = chosen(r1l0 + 6)
            r2 = chosen(r1l0 + 9)
            sc_plus = lane_score[f1] + lane_score[r2]
            sc_minus = lane_score[r1] + lane_score[f2]
        else:
            f2 = r2 = jnp.full(Q, -1, jnp.int32)
            sc_plus = lane_score[f1]
            sc_minus = lane_score[r1]
        needs_adjust = jnp.zeros(Q, bool)  # no protein boundary adjustment
    elif nr == 2:
        f1, r1, f2, r2 = 4 * rowQ, 4 * rowQ + 1, 4 * rowQ + 2, 4 * rowQ + 3
        sc_plus = lane_score[f1] + lane_score[r2]
        sc_minus = lane_score[r1] + lane_score[f2]
        needs_adjust = ((nhits[f1] > 0) & (nhits[r1] > 0)) | \
                       ((nhits[f2] > 0) & (nhits[r2] > 0))
    else:
        f1, r1 = 2 * rowQ, 2 * rowQ + 1
        f2 = r2 = jnp.full(Q, -1, jnp.int32)
        sc_plus = lane_score[f1]
        sc_minus = lane_score[r1]
        needs_adjust = (nhits[f1] > 0) & (nhits[r1] > 0)

    take_plus = sc_plus >= sc_minus
    take_minus = sc_minus >= sc_plus
    # slot order matches the host finalizer: plus lanes (f1, r2) then minus
    # lanes (r1, f2); k per slot: +1 +1 -1 -1 -> k = 1 1 0 0.  Single-end
    # units have no mate lanes, so only 2 slots (f1, r1; k = 1 0) — this
    # halves every [Q, S] table below.
    if nr == 2:
        slot_lane = jnp.stack([
            jnp.where(take_plus, f1, -1),
            jnp.where(take_plus, r2, -1),
            jnp.where(take_minus, r1, -1),
            jnp.where(take_minus, f2, -1)], axis=1)      # [Q, 4]
        k_pattern = jnp.array([1, 1, 0, 0], jnp.int32)
    else:
        slot_lane = jnp.stack([
            jnp.where(take_plus, f1, -1),
            jnp.where(take_minus, r1, -1)], axis=1)      # [Q, 2]
        k_pattern = jnp.array([1, 0], jnp.int32)
    NS = slot_lane.shape[1]

    # ---- per-unit hit table [Q, S] (slot-major, hit within slot) ----
    S = NS * H
    lane_of_slot = slot_lane.reshape(-1)                  # [Q*NS]
    lane_safe = jnp.maximum(lane_of_slot, 0)

    # ONE gather for all four hit fields (sp, ep, l, off): [Q*NS, H, 4]
    hits4 = jnp.stack([hsp, hep, hlv, hoff], axis=2).astype(jnp.int32)
    f_all = hits4[lane_safe].reshape(Q, NS, H, 4)
    f_sp = f_all[:, :, :, 0].reshape(Q, S)
    f_ep = f_all[:, :, :, 1].reshape(Q, S)
    f_l = f_all[:, :, :, 2].reshape(Q, S)
    f_off = f_all[:, :, :, 3].reshape(Q, S)
    f_n = jnp.broadcast_to(nhits[lane_safe].reshape(Q, NS)[:, :, None],
                           (Q, NS, H)).reshape(Q, S)
    hit_pos = jnp.tile(jnp.arange(H, dtype=jnp.int32), (NS,))[None, :]
    present = (jnp.broadcast_to(slot_lane[:, :, None] >= 0,
                                (Q, NS, H)).reshape(Q, S)) & (hit_pos < f_n)
    f_k = jnp.broadcast_to(k_pattern[None, :, None],
                           (Q, NS, H)).reshape(Q, S)

    # previous present hit within the unit (for mix/merge adjacency)
    colS = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (Q, S))
    prev_idx = _row_shift_right(
        _row_cummax(jnp.where(present, colS, -1)), 1, -1)  # [Q, S]
    has_prev = present & (prev_idx >= 0)
    prev_safe = jnp.maximum(prev_idx, 0)

    baseS = (rowQ * S)[:, None]                           # [Q, 1]
    prev_flat = (baseS + prev_safe).reshape(-1)

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
    W = u_cap
    wcum = _row_cumsum(counts)                            # [Q, S] inclusive
    unit_total = wcum[:, -1]                              # [Q]
    overflow = unit_total > u_cap
    starts_in = wcum - counts                             # [Q, S] row-local

    colW = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (Q, W))
    row_valid = colW < jnp.minimum(unit_total, u_cap)[:, None]
    # hit within unit: count of unit hits whose cumulative rows <= j
    hiu = jnp.sum((wcum[:, None, :] <= colW[:, :, None]).astype(jnp.int32),
                  axis=2)                                 # [Q, W]
    hit_of_row = jnp.clip(hiu, 0, S - 1)
    hf = (baseS + hit_of_row).reshape(-1)                 # flat [Q*W] into [Q*S]
    # ONE gather for all per-hit fields consumed per expanded row
    hrow7 = jnp.stack([f_sp, f_ep, step, cnt_fwd,
                       simple.astype(jnp.int32), starts_in, f_k],
                      axis=2).reshape(Q * S, 7)
    r_all = hrow7[hf].reshape(Q, W, 7)
    r_sp = r_all[:, :, 0]
    r_ep = r_all[:, :, 1]
    r_step = r_all[:, :, 2]
    r_cf = r_all[:, :, 3]
    r_simple = r_all[:, :, 4] != 0
    pos = colW - r_all[:, :, 5]
    rows = jnp.where(r_simple, r_sp + pos,
                     jnp.where(pos < r_cf, r_sp + pos * r_step,
                               r_ep - (pos - r_cf) * r_step))
    rows = jnp.where(row_valid, rows, 0)

    # ---- LF-walk resolve (BackwardToSampledSA, FMIndex.hpp:513-524) ----
    seqids = dev._resolve_rows_impl(
        rows.reshape(-1).astype(it),
        row_valid.reshape(-1)).astype(jnp.int32).reshape(Q, W)

    # ---- merge-chain ids over hits (needs resolved seqid of 1-row hits) ----
    baseW = (rowQ * W)[:, None]                           # [Q, 1]
    sid_uniq = seqids.reshape(-1)[
        (baseW + jnp.clip(starts_in, 0, W - 1)).reshape(-1)].reshape(Q, S)
    uniq_hit = live & (rng == 1)
    # ONE gather for all previous-hit fields (k, off, l, uniq, sid)
    prow5 = jnp.stack([f_k, f_off, f_l, uniq_hit.astype(jnp.int32), sid_uniq],
                      axis=2).reshape(Q * S, 5)
    p_all = prow5[prev_flat].reshape(Q, S, 5)
    f_k_prev = p_all[:, :, 0]
    foff_prev = p_all[:, :, 1]
    fl_prev = p_all[:, :, 2]
    uniq_prev = p_all[:, :, 3] != 0
    sid_uniq_prev = p_all[:, :, 4]

    # mixStrand per unit (over the full present-hit list, Classifier.hpp:584-591)
    mix_flag = has_prev & (f_k != f_k_prev)
    mix = jnp.any(mix_flag, axis=1)                       # [Q]
    merge_prev = (has_prev & (~mix[:, None])
                  & uniq_hit & uniq_prev
                  & (f_k == f_k_prev)
                  & (foff_prev + fl_prev + 1 == f_off)
                  & (sid_uniq == sid_uniq_prev))
    chain_of_hit = _row_cumsum((present & (~merge_prev)).astype(jnp.int32))

    # ---- per-unit sort of expanded rows by (k, sid, hit) ----
    k_g = r_all[:, :, 6]
    key_a = jnp.where(row_valid, k_g, I32_MAX)
    key_b = jnp.where(row_valid, seqids, I32_MAX)
    key_c = jnp.where(row_valid, hit_of_row, I32_MAX)
    key_a, key_b, key_c = lax.sort((key_a, key_b, key_c),
                                   dimension=1, num_keys=3)
    s_valid = key_a != I32_MAX
    s_hit = jnp.clip(key_c, 0, S - 1)
    s_sid = key_b
    sflat = (baseS + s_hit).reshape(-1)
    # ONE gather for (l, chain) of the sorted rows
    srow2 = jnp.stack([f_l, chain_of_hit], axis=2).reshape(Q * S, 2)
    s_all = srow2[sflat].reshape(Q, W, 2)
    s_l = s_all[:, :, 0]
    s_chain = s_all[:, :, 1]

    # segment boundaries in sorted row order (chain monotone in hit index, so
    # within (k, sid) groups chains are contiguous)
    ch_a = _row_changed(key_a)
    ch_b = _row_changed(key_b)
    ch_c = _row_changed(key_c)
    pair_first = (ch_a | ch_b | ch_c) & s_valid   # unique (hit, seqid)
    cb = (ch_a | ch_b | _row_changed(s_chain)) & s_valid  # chain segment start
    rb = (ch_a | ch_b) & s_valid                          # record segment start

    # ---- chain sums -> chain scores -> record score/hitlen ----
    w_l = jnp.where(pair_first, s_l, 0)
    onecol = jnp.ones((Q, 1), bool)
    last_of_chain = jnp.concatenate(
        [cb[:, 1:] | (~s_valid[:, 1:]), onecol], axis=1) & s_valid
    chain_lsum = _row_seg_cumsum(w_l, cb | (~s_valid))
    chain_score = jnp.where(last_of_chain & (chain_lsum >= mhl),
                            (chain_lsum - adj) ** 2, 0)
    last_of_rec = jnp.concatenate(
        [rb[:, 1:] | (~s_valid[:, 1:]), onecol], axis=1) & s_valid
    rec_sum = _row_seg_cumsum(chain_score, rb | (~s_valid))
    rec_score = jnp.where(last_of_rec, rec_sum, -1)
    rec_hitlen = _row_seg_cumsum(w_l, rb | (~s_valid))  # meaningful at rec-last

    # ---- per-unit best / second / bestlen (plain axis-1 reductions) ----
    unit_best = jnp.max(rec_score, axis=1)                # [Q]; -1 if no recs
    qual = last_of_rec & (rec_score == unit_best[:, None])
    unit_nbest = jnp.sum(qual.astype(jnp.int32), axis=1)
    qual_rank = _row_cumsum(qual.astype(jnp.int32))       # inclusive at quals
    first_best = qual & (qual_rank == 1)
    hitlen_out = jnp.max(jnp.where(first_best, rec_hitlen, 0), axis=1)
    rest = jnp.where(last_of_rec & (rec_score < unit_best[:, None]),
                     rec_score, 0)
    unit_rest = jnp.max(rest, axis=1)
    score_out = jnp.maximum(unit_best, 0)
    second_out = jnp.where(unit_nbest >= 2, score_out,
                           jnp.maximum(unit_rest, 0))

    # ---- best seqids: dedup by sid (first k wins), order (k asc, sid asc) ----
    # sort best-record candidates by (sid, k) within the unit row to find dups
    d_b = jnp.where(qual, s_sid, I32_MAX)
    d_c = jnp.where(qual, key_a & 1, I32_MAX)
    d_b, d_c = lax.sort((d_b, d_c), dimension=1, num_keys=2)
    d_valid = d_b != I32_MAX
    dup = d_valid & (~_row_changed(d_b))            # same (unit, sid) again
    n_dup = jnp.sum(dup.astype(jnp.int32), axis=1)
    # emit list: resort deduped candidates by (k, sid); invalid keys sort to
    # the row tail, so after the sort the column index IS the emit rank
    e_b = jnp.where(d_valid & (~dup), d_c, I32_MAX)       # k
    e_c = jnp.where(d_valid & (~dup), d_b, I32_MAX)       # sid
    e_b, e_c = lax.sort((e_b, e_c), dimension=1, num_keys=2)
    e_valid = e_b != I32_MAX
    kw = min(k_out, W)
    sids_out = jnp.zeros((Q, k_out), jnp.int32).at[:, :kw].set(
        jnp.where(e_valid[:, :kw], e_c[:, :kw], 0))

    nbest_dedup = unit_nbest - n_dup

    flags = (needs_adjust.astype(jnp.int32) * FLAG_ADJUST
             | overflow.astype(jnp.int32) * FLAG_ROW_OVERFLOW)

    packed = jnp.concatenate([
        score_out[:, None], second_out[:, None], hitlen_out[:, None],
        nbest_dedup[:, None], flags[:, None], sids_out], axis=1)

    hits_packed = jnp.stack([hsp.astype(jnp.int32), hep.astype(jnp.int32),
                             hlv.astype(jnp.int32), hoff.astype(jnp.int32)],
                            axis=2)

    # compact chain data for the first FB_CAP flagged units, shipped with the
    # main result so the host fallback path needs NO extra device round trip
    # (the full hits tensor stays on device; ~KBs instead of ~MBs pulled)
    lpu = (6 if protein else 2) * nr
    fb_mask = (flags != 0) | (nbest_dedup > k_out)
    fbu = lax.sort(jnp.where(fb_mask, rowQ, I32_MAX))[:FB_CAP]
    # barrier: a sort output feeding a gather's indices melts the XLA:TPU
    # fusion pass (same pathology as the scan x gather blowup, see module
    # docstring); the barrier costs nothing and keeps compiles in seconds
    fbu = lax.optimization_barrier(fbu)
    fbu_safe = jnp.where(fbu == I32_MAX, 0, fbu)
    fb_lanes = (lpu * fbu_safe[:, None]
                + jnp.arange(lpu, dtype=jnp.int32)[None, :]).reshape(-1)
    fb_hits = hits_packed[fb_lanes]
    fb_nh = nhits[fb_lanes].astype(jnp.int32)
    fb_units = jnp.where(fbu == I32_MAX, -1, fbu)

    # ONE flat int32 blob with everything the host finish stage consumes:
    # each extra device->host pull costs a full ~25 ms round trip on a
    # tunneled serving link, so packed + fb_* ship as a single fetch
    host_blob = jnp.concatenate([
        packed.reshape(-1), fb_units, fb_hits.reshape(-1), fb_nh])
    return dict(packed=packed, hits=hits_packed, nhits=nhits,
                fb_units=fb_units, fb_hits=fb_hits, fb_nh=fb_nh,
                host_blob=host_blob)

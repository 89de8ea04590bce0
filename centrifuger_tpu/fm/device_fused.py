"""Fused-row device structures: one rank = one contiguous row gather.

This is the TPU analogue of Rank9's counter/data interleaving (reference
compactds/DS_Rank.hpp:196-197 keeps counts and bits in adjacent cache lines):
each 256-symbol block of a 2-bit packed stream is stored as one uint32 row

    [occ_A, occ_C, occ_G, occ_T, prev_last_word, w0..w15]   (21 words, 84 B)

so a batched rank(c, pos) is a single [B, 21] gather + vectorized popcount.
The `prev_last_word` column makes the symbol at `pos` extractable from the
same row even at the pos % 256 == 255 edge (where the rank row is the next
block), so backward_extend and LF-mapping need no separate access gather.

The indicator bitvector rows are  [cum, prev_last_word, w0..w7]  (10 words).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

OCC_BLOCK = 256
IND_BLOCK = 256  # bits per indicator row

# Wide serving rows: 512-byte rows are the TPU gather sweet spot (measured on
# v5e: XLA's row gather runs ~7x faster for >=64-word rows than for the
# 21-word rows above — tools/r5/probe_w.py), and 512 B = one native tile.
# Each row covers 1920 symbols:
#   [occ_lo_A..occ_lo_T, occ_hi_packed, prev_last_word, w0..w119, pad2]
# occ_hi_packed holds the four occ checkpoints' bits 32-39 as one byte per
# symbol (hi_A | hi_C<<8 | hi_G<<16 | hi_T<<24), giving full 40-bit occ — the
# SAME 512-byte row serves both the int32 fast path (hi word ignored) and
# n >= 2^31 serving up to ~1.1 Tnt.
WIDE_BLOCK = 1920
WIDE_WORDS = 128
WIDE_DATA = 120
WIDE_OFF = 6      # first data word column
WIDE_PREV = 5     # prev-last-word column
WIDE_HI = 4       # packed occ-hi column


def build_fused_stream_wide(ps):
    """ps: host PackedSeq with width==2.  Returns uint32 [rows, 128] wide
    fused rows (vectorized; layout above).  occ checkpoints are recomputed at
    1920-symbol boundaries from per-word SWAR popcounts since PackedSeq's own
    occ directory uses 256-symbol blocks."""
    assert ps.width == 2 and ps.sigma <= 4
    n = ps.n
    assert n < (1 << 40), "wide rows store 40-bit occ checkpoints"
    nrows = n // WIDE_BLOCK + 1
    rows = np.zeros((nrows, WIDE_WORDS), dtype=np.uint32)
    words = ps.words
    need = nrows * WIDE_DATA
    wpad = np.zeros(need, dtype=np.uint32)
    wpad[:min(len(words), need)] = words[:need]
    w2 = wpad.reshape(nrows, WIDE_DATA)
    rows[:, WIDE_OFF:WIDE_OFF + WIDE_DATA] = w2
    rows[1:, WIDE_PREV] = w2[:-1, WIDE_DATA - 1]
    # row-boundary occ: rows r uses words [0, r*120) which all lie within the
    # data region for every r <= n//1920 (1920 is a multiple of 16), so the
    # zero padding never contributes counts for symbol 0
    boundary = np.arange(nrows, dtype=np.int64) * WIDE_DATA
    hi_packed = np.zeros(nrows, dtype=np.uint32)
    for c in range(ps.sigma):
        pat = np.uint32(c * 0x55555555)
        x = ~(wpad ^ pat)
        m = x & (x >> np.uint32(1)) & np.uint32(0x55555555)
        pc = np.bitwise_count(m)
        cum = np.concatenate([np.zeros(1, np.uint64),
                              np.cumsum(pc, dtype=np.uint64)])
        occ = cum[boundary]
        rows[:, c] = (occ & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi_packed |= ((occ >> np.uint64(32)).astype(np.uint32)
                      << np.uint32(8 * c))
    rows[:, WIDE_HI] = hi_packed
    return jnp.asarray(rows)


def build_fused_stream(ps):
    """ps: host PackedSeq with width==2. Returns uint32 [rows, 21].
    Fully vectorized (a per-row Python loop here cost ~9 minutes at 300 Mnt)."""
    assert ps.width == 2 and ps.sigma <= 4
    n = ps.n
    nrows = max(n // OCC_BLOCK + 1, 1)
    rows = np.zeros((nrows, 21), dtype=np.uint32)
    occ = ps.occ  # [nblk, sigma] int64, counts before i*256
    rows[:, :ps.sigma] = occ[:nrows, :ps.sigma].astype(np.uint32)
    words = ps.words
    nw = len(words)
    wpad = np.zeros(nrows * 16, dtype=np.uint32)
    wpad[:min(nw, nrows * 16)] = words[:nrows * 16]
    w2 = wpad.reshape(nrows, 16)
    rows[:, 5:21] = w2
    rows[1:, 4] = w2[:-1, 15]     # previous word of each row (row 0 has none)
    return jnp.asarray(rows)


def build_fused_indicator(bv):
    """bv: host Bitvector. Returns uint32 [rows, 10] (vectorized)."""
    n = bv.n
    nrows = max(n // IND_BLOCK + 1, 1)
    rows = np.zeros((nrows, 10), dtype=np.uint32)
    words = bv.words
    nw = len(words)
    # cum at 256-bit granularity == host cum at RANK_WORDS=8 words
    rows[:, 0] = bv.cum[np.minimum(np.arange(nrows), len(bv.cum) - 1)] \
        .astype(np.uint32)
    wpad = np.zeros(nrows * 8, dtype=np.uint32)
    wpad[:min(nw, nrows * 8)] = words[:nrows * 8]
    w2 = wpad.reshape(nrows, 8)
    rows[:, 2:10] = w2
    rows[1:, 1] = w2[:-1, 7]
    return jnp.asarray(rows)


def _popcount_2bit_prefix(words, c, upto):
    """words: [B, 16] uint32; count symbol c in the first `upto` (0..256)
    2-bit slots."""
    pattern = c[:, None].astype(jnp.uint32) * jnp.uint32(0x55555555)
    x = ~(words ^ pattern)
    m = x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    take = jnp.clip(upto[:, None] - jnp.arange(16, dtype=jnp.int32)[None, :] * 16,
                    0, 16)
    nbits = (take * 2).astype(jnp.uint32)
    mask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.minimum(nbits, 31)) - jnp.uint32(1))
    m = m & (mask & jnp.uint32(0x55555555))
    return jnp.sum(lax.population_count(m), axis=1).astype(jnp.int32)


def build_mega_table(ind_bv, lit_ps, run_ps):
    """Concatenate indicator/lit/run fused rows into one uint32 [R, 21] table
    so a batched rank needs just two gather rounds (indicator, then the
    typ-selected stream).  Returns (table, ind_off, lit_off, run_off)."""
    ind = np.asarray(build_fused_indicator(ind_bv))      # [Ri, 10]
    lit = np.asarray(build_fused_stream(lit_ps))         # [Rl, 21]
    run = np.asarray(build_fused_stream(run_ps))         # [Rr, 21]
    ind_p = np.zeros((ind.shape[0], 21), dtype=np.uint32)
    ind_p[:, :10] = ind
    table = np.concatenate([ind_p, lit, run], axis=0)
    ind_off = 0
    lit_off = ind.shape[0]
    run_off = lit_off + lit.shape[0]
    return jnp.asarray(table), ind_off, lit_off, run_off


class FusedStream:
    """Device 2-bit stream with one-gather rank+access."""

    def __init__(self, ps):
        self.n = ps.n
        self.rows = build_fused_stream(ps)

    def gather(self, pos):
        """pos: [B] int32 in [-1, n-1]. Returns row data [B, 21]."""
        pos1 = jnp.maximum(pos, -1) + 1       # 0..n
        r = pos1 >> 8
        return self.rows[r], pos1

    def rank_sym(self, c, pos):
        """(rank_incl(c, pos), symbol at pos). pos in [-1, n-1]; pos=-1 -> rank 0.
        Symbol is valid for pos >= 0."""
        row, pos1 = self.gather(pos)
        base = jnp.take_along_axis(row[:, :4], c[:, None].astype(jnp.int32),
                                   axis=1)[:, 0].astype(jnp.int32)
        upto = (pos1 & 255).astype(jnp.int32)
        cnt = _popcount_2bit_prefix(row[:, 5:21], c, upto)
        rank = base + cnt
        rank = jnp.where(pos < 0, 0, rank)
        # symbol at pos: in-row word index (pos - row_base*256) >> 4, or the
        # prev_last word when pos lands in the previous block (pos%256 == 255)
        in_row = pos - ((pos1 >> 8) << 8)      # [-1 .. 254] hmm: pos - r*256
        widx = jnp.clip(in_row >> 4, 0, 15)
        w = jnp.where(in_row[:, None] < 0, row[:, 4:5],
                      jnp.take_along_axis(row[:, 5:21], widx[:, None], axis=1))[:, 0]
        sym = (w >> ((pos & 15).astype(jnp.uint32) * 2)) & jnp.uint32(3)
        return rank, sym.astype(jnp.int32)


class FusedIndicator:
    def __init__(self, bv):
        self.n = bv.n
        self.rows = build_fused_indicator(bv)

    def rank1_access(self, bi):
        """(rank1_inclusive(bi), bit at bi) in one gather. bi >= 0."""
        pos1 = bi + 1
        r = pos1 >> 8
        row = self.rows[r]
        base = row[:, 0].astype(jnp.int32)
        within = (pos1 & 255).astype(jnp.int32)       # bits to count in this row
        words = row[:, 2:10]
        take = jnp.clip(within[:, None] - jnp.arange(8, dtype=jnp.int32)[None, :] * 32,
                        0, 32)
        nbits = take.astype(jnp.uint32)
        mask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << jnp.minimum(nbits, 31)) - jnp.uint32(1))
        cnt = jnp.sum(lax.population_count(words & mask), axis=1).astype(jnp.int32)
        rank = base + cnt
        in_row = bi - (r << 8)                         # [-1..254]
        widx = jnp.clip(in_row >> 5, 0, 7)
        w = jnp.where(in_row[:, None] < 0, row[:, 1:2],
                      jnp.take_along_axis(words, widx[:, None], axis=1))[:, 0]
        bit = (w >> (bi & 31).astype(jnp.uint32)) & jnp.uint32(1)
        return rank, bit.astype(jnp.int32)

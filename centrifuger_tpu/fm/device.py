"""Device-resident FM-index and the batched classification kernels (JAX/XLA).

This is the TPU-native serving path.  The reference's per-read serial loops
(FMIndex::BackwardSearch char-by-char chain, FMIndex.hpp:487-510, and the
BackwardToSampledSA LF-walk, FMIndex.hpp:513-524) become fixed-shape batched
programs: thousands of read lanes advance in lockstep under a
`lax.while_loop`, each step performing the run-block BWT ranks as vectorized
gathers + popcounts over bit-packed uint32 arrays in HBM.  Rank values (and
therefore all classification results) are bit-identical to the host engine.

Layout notes (TPU-first):
  * the serving rank table uses 512-byte wide rows — 1920 symbols per row:
    [occ_lo x4, packed occ_hi byte per symbol, prev word, 120 data words]
    (device_fused.build_fused_stream_wide) — the flat-array equivalent of
    Rank9's counter/data interleaving (reference compactds/DS_Rank.hpp:
    196-197) sized to the measured v5e gather sweet spot: random row fetches
    run ~5-7x faster at >=64-word rows than at cache-line-sized rows
    (tools/r5/probe_w.py), and 512 B is one native tile.
  * narrow per-step lookups (packed per-position kmer/char words, ftab
    entries) are ALSO stored as [R, 128] rows: fetch the wide row containing
    the word, column-select arithmetically (~4x a 1-word gather).
  * all row/position arithmetic is int32 when n < 2^31; the int64 variant
    (same wide layout — occ_hi gives 40-bit checkpoints) is selected at
    upload time and keeps the fused fast path.
"""

import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _configure_compilation_cache():
    """Enable the persistent XLA compilation cache (lazily, from
    DeviceFM.__init__ — NOT at import time, so merely importing the package
    never mutates global jax config for embedding applications).

    This jax build does NOT honor the JAX_COMPILATION_CACHE_DIR environment
    variable (config.compilation_cache_dir stays None); it must be set via
    jax.config.update.  Without it every process pays the full multi-minute
    TPU compile of the fused classification program.  Skipped when the user
    already configured a cache dir themselves."""
    if jax.config.jax_compilation_cache_dir:
        return
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
        os.path.join(os.path.expanduser("~"), ".cache", "centrifuger_tpu", "xla")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        if jax.config.jax_persistent_cache_min_compile_time_secs in (None, 1):
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


from .index import FMIndexData
from ..succinct.packed import OCC_BLOCK
from ..succinct.bitvector import RANK_WORDS


def _serve_cache_digest(fm):
    """Cheap staleness guard for the derived serving-table cache."""
    import hashlib
    h = hashlib.sha1()
    h.update(b"wide1920-v2")        # serving-row layout version
    h.update(np.int64(fm.n).tobytes())
    h.update(np.int64(fm.first_isa).tobytes())
    sa = fm.sampled_sa
    h.update(np.ascontiguousarray(sa[:: max(1, len(sa) // 64)]).tobytes())
    return h.hexdigest()


def serve_plain_rows_np(fm):
    """The plain serving layout's fused-row table as a host array.

    512-byte wide rows (device_fused.build_fused_stream_wide): the TPU gather
    sweet spot — measured ~7x the row fetch rate of 84-byte rows on v5e
    (tools/r5/probe_w.py) at ~0.27 bytes/char of HBM.  Derived from the
    run-block BWT (decode + repack); cached on disk next to the index
    (<prefix>.serve_plain_w.npz, digest-guarded) because the decode costs
    minutes at multi-hundred-Mnt scale on low-bandwidth hosts."""
    cache = None
    prefix = getattr(fm, "source_prefix", None)
    if prefix:
        cache = prefix + ".serve_plain_w.npz"
        if os.path.exists(cache):
            try:
                z = np.load(cache)
                if str(z["digest"]) == _serve_cache_digest(fm):
                    return z["rows"]
            except Exception:
                pass
    from .device_fused import build_fused_stream_wide
    from ..succinct.packed import PackedSeq
    full = PackedSeq.from_codes(fm.bwt.decode(), fm.sigma)
    rows = np.asarray(build_fused_stream_wide(full))
    if cache:
        try:
            np.savez(cache, rows=rows, digest=_serve_cache_digest(fm))
        except Exception:
            pass
    return rows


def _swar_match(w, c, width):
    """uint32 word(s) -> low-bit-per-slot mask of symbol slots equal to c."""
    if width == 2:
        pattern = c.astype(jnp.uint32) * jnp.uint32(0x55555555)
        x = ~(w ^ pattern)
        return x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    if width == 4:
        pattern = c.astype(jnp.uint32) * jnp.uint32(0x11111111)
        x = ~(w ^ pattern)
        x = x & (x >> jnp.uint32(1))
        x = x & (x >> jnp.uint32(2))
        return x & jnp.uint32(0x11111111)
    if width == 8:
        pattern = c.astype(jnp.uint32) * jnp.uint32(0x01010101)
        x = w ^ pattern
        z = x | (x >> jnp.uint32(4))
        z = z | (z >> jnp.uint32(2))
        z = z | (z >> jnp.uint32(1))
        return ~z & jnp.uint32(0x01010101)
    raise ValueError(width)


def _slot_mask(width, take):
    low = {2: 0x55555555, 4: 0x11111111, 8: 0x01010101}[width]
    nbits = (take * width).astype(jnp.uint32)
    m = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                  (jnp.uint32(1) << jnp.minimum(nbits, 31)) - jnp.uint32(1))
    return m & jnp.uint32(low)


class DevicePacked:
    """Device mirror of PackedSeq with row-major [nblk, words_per_blk] layout."""

    def __init__(self, ps, idtype):
        self.n = ps.n
        self.width = ps.width
        self.per_word = ps.per_word
        self.wpb = OCC_BLOCK // ps.per_word  # words per occ block
        nblk = ps.occ.shape[0]
        words = np.zeros(nblk * self.wpb, dtype=np.uint32)
        words[:len(ps.words)] = ps.words
        self.words = jnp.asarray(words.reshape(nblk, self.wpb))
        self.occ = jnp.asarray(ps.occ.astype(idtype))
        self.idtype = idtype

    def rank_inclusive(self, c, idx):
        """count of c in [0..idx]; c,idx: [B] arrays. idx must be in-range."""
        pos1 = idx + 1
        blk = pos1 // OCC_BLOCK
        base = self.occ[blk, c]
        rem = (pos1 - blk * OCC_BLOCK).astype(jnp.int32)
        rows = self.words[blk]                      # [B, wpb]
        take = jnp.clip(rem[:, None] - jnp.arange(self.wpb, dtype=jnp.int32)[None, :]
                        * self.per_word, 0, self.per_word)
        m = _swar_match(rows, c[:, None].astype(jnp.uint32), self.width) \
            & _slot_mask(self.width, take)
        cnt = jnp.sum(lax.population_count(m), axis=1).astype(self.idtype)
        return base + cnt

    def access(self, idx):
        word_idx = idx // self.per_word
        blk = word_idx // self.wpb
        w = self.words[blk, word_idx % self.wpb]
        sh = ((idx % self.per_word) * self.width).astype(jnp.uint32)
        return ((w >> sh) & jnp.uint32((1 << self.width) - 1)).astype(jnp.int32)


class DeviceBitvector:
    def __init__(self, bv, idtype):
        nwords = len(bv.words)
        # +1 zero row group so rank at pos1 == n can gather a full row safely
        ngrp = (nwords + RANK_WORDS - 1) // RANK_WORDS + 1
        words = np.zeros(ngrp * RANK_WORDS, dtype=np.uint32)
        words[:nwords] = bv.words
        self.words = jnp.asarray(words.reshape(ngrp, RANK_WORDS))
        self.cum = jnp.asarray(bv.cum.astype(idtype))
        self.n = bv.n
        self.idtype = idtype

    def rank1_inclusive(self, idx):
        pos1 = idx + 1
        wi = pos1 >> 5
        grp = wi // RANK_WORDS
        base = self.cum[grp]
        rows = self.words[grp]                      # [B, RANK_WORDS]
        k = jnp.arange(RANK_WORDS, dtype=wi.dtype)[None, :]
        j = grp[:, None] * RANK_WORDS + k
        full = (j < wi[:, None])
        cnt = jnp.sum(jnp.where(full, lax.population_count(rows), 0), axis=1)
        tail_bits = (pos1 & 31).astype(jnp.uint32)
        tw = rows[jnp.arange(rows.shape[0]), (wi - grp * RANK_WORDS)
                  .astype(jnp.int32).clip(0, RANK_WORDS - 1)]
        tmask = jnp.where(tail_bits > 0,
                          (jnp.uint32(1) << tail_bits) - jnp.uint32(1), jnp.uint32(0))
        cnt = cnt + lax.population_count(tw & tmask)
        return base + cnt.astype(self.idtype)

    def access(self, idx):
        wi = idx >> 5
        grp = wi // RANK_WORDS
        w = self.words[grp, (wi - grp * RANK_WORDS).astype(jnp.int32)]
        return ((w >> (idx & 31).astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.int32)


class DeviceFM:
    """Device mirror of FMIndexData with batched query kernels."""

    def __init__(self, fm: FMIndexData, serve_layout="plain", force_idtype=None):
        _configure_compilation_cache()
        self.fm = fm
        self.n = fm.n
        if force_idtype is not None:
            idtype = np.dtype(force_idtype)
            assert idtype in (np.dtype(np.int32), np.dtype(np.int64))
        else:
            idtype = jnp.int32 if fm.n < (1 << 31) - 8 else jnp.int64
        if np.dtype(idtype) == np.dtype(np.int64) and not jax.config.jax_enable_x64:
            # n >= 2^31: positions/ranks need 64-bit lanes (the reference
            # indexes everything with size_t, compactds/Utils.hpp).  Without
            # this flag jnp silently truncates int64 arrays to int32; it must
            # be set before ANY tracing of these kernels.
            jax.config.update("jax_enable_x64", True)
        idtype = jnp.int64 if np.dtype(idtype) == np.dtype(np.int64) else jnp.int32
        self.idtype = idtype
        self.sigma = fm.sigma
        self.code_bits = fm.code_bits
        self.pw = fm.precompute_width
        self.first_isa = int(fm.first_isa)
        self.last_chr = int(fm.last_chr)
        self.sample_rate = int(fm.sample_rate)
        self.b = fm.bwt.b
        self.b_lt_n = fm.bwt.b < fm.bwt.n

        # fast fused serving: the wide plain-rows layout serves BOTH int32 and
        # int64 (n >= 2^31) indexes; the run-block mega-table fast path is
        # int32-only (its row math is 32-bit)
        self.fast = fm.sigma == 4 and \
            (idtype == jnp.int32 or serve_layout == "plain")
        # serving layout: "plain" decompresses the run-block BWT into one flat
        # wide fused-row table at load time — one 512-byte-row gather per rank
        # instead of the indicator->stream round trip (~0.27 bytes/char in
        # HBM; a TPU-first speed/space tradeoff, the on-disk index stays
        # run-block compressed)
        self.serve_layout = serve_layout
        self.plain_rows = None
        plain_fast = self.fast and serve_layout == "plain"
        if not plain_fast:
            # run-block device mirrors: only the non-plain paths rank/access
            # through them; skipping the build+upload in plain mode saves
            # ~2 bits/char of HBM and minutes of load at multi-Gnt scale
            self.ind = DeviceBitvector(fm.bwt.indicator, idtype)
            self.lit = DevicePacked(fm.bwt.lit, idtype)
            self.run = DevicePacked(fm.bwt.run, idtype)
        else:
            self.ind = self.lit = self.run = None
        self.lit_empty = fm.bwt.lit.n == 0
        self.run_empty = fm.bwt.run.n == 0
        if self.fast:
            if serve_layout == "plain":
                self.plain_rows = jnp.asarray(serve_plain_rows_np(fm))
            else:
                from .device_fused import build_mega_table
                self.mega, self.m_ind, self.m_lit, self.m_run = build_mega_table(
                    fm.bwt.indicator, fm.bwt.lit, fm.bwt.run)

        self.psum = jnp.asarray(fm.psum.astype(idtype))
        self.ftab_start = jnp.asarray(fm.ftab_start.astype(idtype))
        self.ftab_len = jnp.asarray(fm.ftab_len.astype(idtype))
        # interleaved (start, len) rows: the lazy chain loop fetches both with
        # ONE gather per step instead of two.  For int32 indexes the flat
        # interleaved table is additionally reshaped to 128-word (512 B) rows:
        # fetching the wide row containing the two words and column-selecting
        # arithmetically is ~4x faster than a narrow 2-word gather on v5e
        # (tools/r5/probe_wordfetch.py).
        ftab2 = np.stack([fm.ftab_start.astype(idtype),
                          fm.ftab_len.astype(idtype)], axis=1)
        if idtype == jnp.int32:
            self.ftab2 = None
            flat = ftab2.reshape(-1)
            r2 = (len(flat) + 127) // 128
            pad = np.zeros(r2 * 128, ftab2.dtype)
            pad[:len(flat)] = flat
            self.ftab2w = jnp.asarray(pad.reshape(r2, 128))
        else:
            self.ftab2 = jnp.asarray(ftab2)
            self.ftab2w = None
        self.sampled_sa = jnp.asarray(fm.sampled_sa.astype(idtype))
        self.adjusted_sa0 = int(fm.adjusted_sa0)
        if fm.selected_rows is not None and len(fm.selected_rows) > 0:
            self.sel_rows = jnp.asarray(fm.selected_rows.astype(idtype))
            self.sel_vals = jnp.asarray(fm.selected_vals.astype(idtype))
        else:
            self.sel_rows = None
            self.sel_vals = None
        self.has_end_marker = fm.has_end_marker
        if fm.end_marker_sa is not None:
            self.end_marker_sa = jnp.asarray(fm.end_marker_sa.astype(idtype))
        else:
            self.end_marker_sa = None
        # optional per-row LF-walk result: SA resolution as ONE gather.
        # The gather index is int32, so refuse (loudly) any rowmap over an
        # index whose row ids could wrap.
        if getattr(fm, "rowmap", None) is not None:
            if fm.n >= (1 << 31):
                raise ValueError(
                    "rowmap accelerator unsupported for n >= 2^31 (row ids "
                    "would wrap int32); rebuild with --no-row-map")
            self.rowmap = jnp.asarray(fm.rowmap.astype(jnp.int32))
        else:
            self.rowmap = None

        # All index arrays as one pytree, passed as ARGUMENTS to the jitted
        # kernels below.  Closing over them instead would embed them as HLO
        # constants: compile time blows up with index size and the persistent
        # compilation cache misses whenever the index contents change.
        self.arrs = {}
        for k in ("plain_rows", "mega", "psum", "ftab_start", "ftab_len",
                  "ftab2", "ftab2w", "sampled_sa", "sel_rows", "sel_vals",
                  "end_marker_sa", "rowmap"):
            v = getattr(self, k, None)
            if v is not None:
                self.arrs[k] = v
        for sub in ("ind", "lit", "run"):
            so = getattr(self, sub, None)
            if so is None:
                continue
            for f in ("words", "occ", "cum"):
                v = getattr(so, f, None)
                if v is not None:
                    self.arrs["%s_%s" % (sub, f)] = v
        self._jit_cache = {}

    def _bind(self, arrs):
        """Shallow copy of self with array attributes replaced by the (traced)
        values in `arrs` — lets the trace-time methods below stay unchanged
        while the arrays flow in as jit arguments."""
        obj = copy.copy(self)
        for k in ("plain_rows", "mega", "psum", "ftab_start", "ftab_len",
                  "ftab2", "ftab2w", "sampled_sa", "sel_rows", "sel_vals",
                  "end_marker_sa", "rowmap"):
            if k in arrs:
                setattr(obj, k, arrs[k])
        for sub in ("ind", "lit", "run"):
            so = getattr(self, sub, None)
            if so is None:
                continue
            s2 = copy.copy(so)
            for f in ("words", "occ", "cum"):
                key = "%s_%s" % (sub, f)
                if key in arrs:
                    setattr(s2, f, arrs[key])
            setattr(obj, sub, s2)
        return obj

    def _jitted(self, key, traced_fn):
        """Cache a jitted wrapper that rebinds self's arrays from arguments."""
        if key not in self._jit_cache:
            def wrapper(arrs, *args):
                return traced_fn(self._bind(arrs), *args)
            self._jit_cache[key] = jax.jit(wrapper)
        return self._jit_cache[key]

    # ------------------------------------------------------------- primitives

    def bwt_rank(self, c, idx):
        """Sequence_RunBlock::Rank on device (values identical to host)."""
        b = self.b
        bi = idx // b
        typ = self.ind.access(bi)
        if self.b_lt_n:
            r1 = self.ind.rank1_inclusive(bi)
            ranki = jnp.where(typ == 1, r1, bi + 1 - r1)
        else:
            ranki = jnp.ones_like(idx)
        other = (bi + 1) - ranki

        lit_pos = (ranki - 1) * b + idx % b
        ret_lit = self._lit_rank(c, lit_pos)

        if not self.run_empty:
            run_pos = jnp.clip(ranki - 1, 0, self.run.n - 1)
            rb_rank = self._run_rank(c, ranki - 1)
            in_run = self.run.access(run_pos) == c
            ret_run = jnp.where(in_run, (rb_rank - 1) * b + idx % b + 1, rb_rank * b)
        else:
            ret_run = jnp.zeros_like(idx)

        ret = jnp.where(typ == 0, ret_lit, ret_run)
        cross_lit = self._run_rank(c, other - 1) * b
        cross_run = self._lit_rank(c, other * b - 1)
        cross = jnp.where(typ == 0, cross_lit, cross_run)
        return ret + jnp.where(other == 0, 0, cross)

    def _lit_rank(self, c, pos):
        if self.lit_empty:
            return jnp.zeros_like(pos)
        r = self.lit.rank_inclusive(c, jnp.clip(pos, 0, self.lit.n - 1))
        return jnp.where(pos < 0, 0, r)

    def _run_rank(self, c, pos):
        if self.run_empty:
            return jnp.zeros_like(pos)
        r = self.run.rank_inclusive(c, jnp.clip(pos, 0, self.run.n - 1))
        return jnp.where(pos < 0, 0, r)

    def bwt_access(self, idx):
        b = self.b
        bi = idx // b
        typ = self.ind.access(bi)
        r1 = self.ind.rank1_inclusive(bi)
        lit_idx = idx - b * r1
        r0 = bi + 1 - r1
        run_idx = (idx - b * r0) // b
        lit_v = self.lit.access(jnp.clip(lit_idx, 0, max(self.lit.n - 1, 0))) \
            if not self.lit_empty else jnp.zeros_like(idx, dtype=jnp.int32)
        run_v = self.run.access(jnp.clip(run_idx, 0, max(self.run.n - 1, 0))) \
            if not self.run_empty else jnp.zeros_like(idx, dtype=jnp.int32)
        return jnp.where(typ == 0, lit_v, run_v)

    def _loop_any(self, x):
        """Loop-termination reduction; overridden by the sharded view to a
        cross-shard reduction."""
        return jnp.any(x)

    # ---- fused fast path: rank + stored symbol in two gather rounds ----

    def _fused_rank_sym(self, c, pos):
        """(BWT.rank_inclusive(c, pos), stored BWT symbol at pos);
        pos in [-1, n-1], pos=-1 -> rank 0.  Value-equivalent to
        Sequence_RunBlock::Rank + ::Access."""
        if self.plain_rows is not None:
            return self._plain_rank_sym(c, pos)
        return self._runblock_rank_sym(c, pos)

    def _plain_rows_fetch(self, pos):
        """Wide fused-row fetch for positions `pos` (axis-0 gather); the
        sharded view overrides this with an all-to-all routed fetch.  Row ids
        always fit int32 (n < 1920 * 2^31 guaranteed by the 40-bit occ cap),
        so the gather indices stay 32-bit even for int64 indexes."""
        from .device_fused import WIDE_BLOCK
        return self.plain_rows[((pos + 1) // WIDE_BLOCK).astype(jnp.int32)]

    def _plain_rank_sym(self, c, pos):
        """One-gather rank over the flat wide fused-row BWT table."""
        row = self._plain_rows_fetch(pos)
        return self._plain_rank_sym_from_rows(row, c, pos)

    @staticmethod
    def _wide_prefix_count(row, c2, pos1):
        """Count symbol c2 in the first pos1 % WIDE_BLOCK slots of a wide
        row's 120 data words (SWAR + masked popcount, all VPU)."""
        from .device_fused import WIDE_BLOCK, WIDE_DATA, WIDE_OFF
        w = row[:, WIDE_OFF:WIDE_OFF + WIDE_DATA]                 # [B, 120]
        x = ~(w ^ (c2 * jnp.uint32(0x55555555))[:, None])
        m = x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
        upto = (pos1 % WIDE_BLOCK).astype(jnp.int32)
        j = jnp.arange(WIDE_DATA, dtype=jnp.int32)[None, :]
        nb = (jnp.clip(upto[:, None] - 16 * j, 0, 16) * 2).astype(jnp.uint32)
        mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << jnp.minimum(nb, 31)) - jnp.uint32(1))
        return jnp.sum(lax.population_count(m & mask), axis=1, dtype=jnp.int32)

    @staticmethod
    def _wide_sym(row, pos):
        """Stored symbol at pos from its wide row (pos >= -1; the prev-word
        column covers pos1 % WIDE_BLOCK == 0, where pos sits in the previous
        block)."""
        from .device_fused import WIDE_BLOCK, WIDE_DATA, WIDE_OFF, WIDE_PREV
        w = row[:, WIDE_OFF:WIDE_OFF + WIDE_DATA]
        pos1 = pos + 1
        in_row = (pos - (pos1 // WIDE_BLOCK) * WIDE_BLOCK).astype(jnp.int32)
        widx = in_row >> 4
        j = jnp.arange(WIDE_DATA, dtype=jnp.int32)[None, :]
        w_sym = jnp.sum(jnp.where(j == widx[:, None], w, jnp.uint32(0)),
                        axis=1, dtype=jnp.uint32) \
            | jnp.where(in_row < 0, row[:, WIDE_PREV], jnp.uint32(0))
        return ((w_sym >> ((pos & 15).astype(jnp.uint32) * 2)) & jnp.uint32(3)) \
            .astype(jnp.int32)

    def _wide_occ(self, row, c2):
        """occ checkpoint of symbol c2 from a wide row (arithmetic column
        select keeps it in one fused kernel).  int64 indexes extend the u32
        lo word with the packed hi byte (full 40-bit occ)."""
        from .device_fused import WIDE_HI
        lo = (jnp.where(c2 == 0, row[:, 0], 0)
              + jnp.where(c2 == 1, row[:, 1], 0)
              + jnp.where(c2 == 2, row[:, 2], 0)
              + jnp.where(c2 == 3, row[:, 3], 0))
        if self.idtype == jnp.int64:
            hi = (row[:, WIDE_HI] >> (c2 * jnp.uint32(8))) & jnp.uint32(0xFF)
            return (hi.astype(jnp.int64) << 32) | lo.astype(jnp.int64)
        return lo.astype(jnp.int32)

    def _plain_lf(self, p):
        """LF-mapping with ONE wide-row gather: the stored symbol and its rank
        both come from the same fused row (p >= 0)."""
        row = self._plain_rows_fetch(p)
        pos1 = p + 1
        sym = self._wide_sym(row, p)
        c2 = sym.astype(jnp.uint32)
        rank = self._wide_occ(row, c2) + self._wide_prefix_count(row, c2, pos1)
        corr = ((sym == self.last_chr) & (p < self.first_isa)).astype(rank.dtype)
        return self.psum[sym] + rank + corr - 1

    def _plain_rank_sym_from_rows(self, row, c, pos):
        """Rank/sym compute given pre-fetched wide fused rows (shared with the
        sharded-index router, parallel/sharded.py)."""
        pos1 = pos + 1
        c2 = c.astype(jnp.uint32)
        cnt = self._wide_prefix_count(row, c2, pos1)
        rank = jnp.where(pos < 0, 0, self._wide_occ(row, c2) + cnt)
        return rank, self._wide_sym(row, pos)

    def _runblock_rank_sym(self, c, pos):
        """Two gather rounds over the run-block mega-table (HBM-lean layout):
        the indicator row round, then one stacked round for lit+run rows."""
        b = self.b
        posc = jnp.maximum(pos, 0)
        bi = posc // b

        # round 1: indicator row -> rank1 + type bit.  All within-row math is
        # unrolled elementwise (no axis reductions / take_along) so XLA fuses
        # it into a single kernel after the gather.
        ipos1 = bi + 1
        irow = self.mega[self.m_ind + (ipos1 >> 8)]
        ibase = irow[:, 0].astype(jnp.int32)
        within = (ipos1 & 255).astype(jnp.int32)
        iin_row = bi - ((ipos1 >> 8) << 8)
        iwidx = iin_row >> 5
        cnt = jnp.zeros_like(bi)
        iw = jnp.where(iin_row < 0, irow[:, 1], jnp.uint32(0))
        for j in range(8):
            wj = irow[:, 2 + j]
            take = jnp.clip(within - 32 * j, 0, 32).astype(jnp.uint32)
            mask = jnp.where(take >= 32, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << jnp.minimum(take, 31)) - jnp.uint32(1))
            cnt = cnt + lax.population_count(wj & mask).astype(jnp.int32)
            iw = jnp.where(iwidx == j, wj, iw)
        r1 = ibase + cnt
        typ = ((iw >> (bi & 31).astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.int32)

        if self.b_lt_n:
            ranki = jnp.where(typ == 1, r1, bi + 1 - r1)
        else:
            ranki = jnp.ones_like(bi)
        other = (bi + 1) - ranki
        is_lit = typ == 0

        # round 2: one stacked gather for the lit row and the run row
        lit_pos = jnp.where(is_lit, (ranki - 1) * b + posc % b, other * b - 1)
        run_pos = jnp.where(is_lit, other - 1, ranki - 1)
        spos = jnp.concatenate([lit_pos, run_pos])
        sidx = jnp.concatenate([self.m_lit + ((lit_pos + 1) >> 8),
                                self.m_run + ((run_pos + 1) >> 8)])
        srow = self.mega[sidx]
        c2 = jnp.concatenate([c, c]).astype(jnp.uint32)
        pos1 = spos + 1
        # occ base: arithmetic select of column c (stays in one fused kernel)
        sbase = (jnp.where(c2 == 0, srow[:, 0], 0)
                 + jnp.where(c2 == 1, srow[:, 1], 0)
                 + jnp.where(c2 == 2, srow[:, 2], 0)
                 + jnp.where(c2 == 3, srow[:, 3], 0)).astype(jnp.int32)
        upto = (pos1 & 255).astype(jnp.int32)
        pattern = c2 * jnp.uint32(0x55555555)
        sin_row = spos - ((pos1 >> 8) << 8)
        swidx = sin_row >> 4
        scnt = jnp.zeros_like(upto)
        sw = jnp.where(sin_row < 0, srow[:, 4], jnp.uint32(0))
        for j in range(16):
            wj = srow[:, 5 + j]
            x = ~(wj ^ pattern)
            m = x & (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
            take = jnp.clip(upto - 16 * j, 0, 16)
            nb = (take * 2).astype(jnp.uint32)
            mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << jnp.minimum(nb, 31)) - jnp.uint32(1))
            scnt = scnt + lax.population_count(
                m & mask & jnp.uint32(0x55555555)).astype(jnp.int32)
            sw = jnp.where(swidx == j, wj, sw)
        srank = jnp.where(spos < 0, 0, sbase + scnt)
        ssym = ((sw >> ((spos & 15).astype(jnp.uint32) * 2)) & jnp.uint32(3)) \
            .astype(jnp.int32)

        M = pos.shape[0]
        lit_rank, run_rank = srank[:M], srank[M:]
        lit_sym, run_sym = ssym[:M], ssym[M:]

        in_run = run_sym == c
        run_part = jnp.where(in_run, (run_rank - 1) * b + posc % b + 1,
                             run_rank * b)
        ret = jnp.where(is_lit, lit_rank + run_rank * b, run_part + lit_rank)
        sym = jnp.where(is_lit, lit_sym, run_sym)
        return jnp.where(pos < 0, 0, ret), sym

    def rank(self, c, p, inclusive):
        """FMIndex::Rank with displaced-last-char correction (FMIndex.hpp:352-362)."""
        if inclusive:
            r = self.bwt_rank(c, p)
            corr = (c == self.last_chr) & (p < self.first_isa)
        else:
            r = jnp.where(p > 0, self.bwt_rank(c, jnp.maximum(p - 1, 0)), 0)
            corr = (c == self.last_chr) & (p <= self.first_isa)
        return r + corr.astype(r.dtype)

    def backward_extend(self, c, sp, ep):
        """FMIndex::BackwardExtend (reference compactds/FMIndex.hpp:364-379).
        Fast path: 6 fused row gathers total (3 per boundary), with the sp==ep
        shortcut's BWT access coming from the same rows."""
        off = self.psum[c]
        if self.fast:
            if self.plain_rows is not None:
                # TWO separate row gathers (sp-1 and ep): measured faster than
                # one concatenated [2B] gather — XLA pipelines independent
                # gather ops in parallel (tools/r5/probe_w3.py split results)
                r_sp, _ = self._plain_rank_sym(c, sp - 1)
                r_ep, sym_ep = self._plain_rank_sym(c, ep)
            else:
                B = sp.shape[0]
                r2, sym2 = self._fused_rank_sym(jnp.concatenate([c, c]),
                                                jnp.concatenate([sp - 1, ep]))
                r_sp, r_ep = r2[:B], r2[B:]
                sym_ep = sym2[B:]
            corr_excl = ((c == self.last_chr) & (sp <= self.first_isa)).astype(r_sp.dtype)
            corr_incl = ((c == self.last_chr) & (ep < self.first_isa)).astype(r_ep.dtype)
            nsp = off + r_sp + corr_excl
            nep_rank = off + r_ep + corr_incl - 1
            same = sp == ep
            nep = jnp.where(same, nsp + jnp.where(sym_ep == c, 0, -1), nep_rank)
            return nsp, nep
        nsp = off + self.rank(c, sp, inclusive=False)
        r_ep = off + self.rank(c, ep, inclusive=True) - 1
        same = sp == ep
        acc = self.bwt_access(ep)
        nep = jnp.where(same, nsp + jnp.where(acc == c, 0, -1), r_ep)
        return nsp, nep

    def lf(self, p):
        """LF-mapping; fast path derives the stored symbol and its rank from
        one shared set of row gathers."""
        if self.fast:
            if self.plain_rows is not None:
                return self._plain_lf(p)
            # first gather: symbol at p (rank value for a dummy c is discarded)
            _, sym = self._fused_rank_sym(jnp.zeros_like(p), p)
            r, _ = self._fused_rank_sym(sym, p)
            corr = ((sym == self.last_chr) & (p < self.first_isa)).astype(r.dtype)
            return self.psum[sym] + r + corr - 1
        c = self.bwt_access(p)
        return self.psum[c] + self.rank(c, p, inclusive=True) - 1

    def _sampled_sa_fetch(self, slot):
        """Sampled-SA gather; the sharded view routes this to the owning
        shard (parallel/sharded.py)."""
        return self.sampled_sa[slot]

    def _rowmap_fetch(self, rows):
        """Rowmap gather (rows pre-clipped int32); routed when sharded."""
        return self.rowmap[rows]

    def get_sampled_sa(self, rows):
        found = rows == self.first_isa
        val = jnp.where(found, self.adjusted_sa0, 0).astype(self.idtype)
        is_samp = (~found) & (rows % self.sample_rate == 0)
        val = jnp.where(is_samp, self._sampled_sa_fetch(rows // self.sample_rate), val)
        found = found | is_samp
        if self.sel_rows is not None:
            pos = jnp.searchsorted(self.sel_rows, rows)
            pos_c = jnp.minimum(pos, len(self.sel_rows) - 1)
            is_sel = (~found) & (self.sel_rows[pos_c] == rows)
            val = jnp.where(is_sel, self.sel_vals[pos_c], val)
            found = found | is_sel
        elif self.has_end_marker and self.end_marker_sa is not None:
            m = len(self.end_marker_sa)
            is_end = (~found) & (rows < m)
            val = jnp.where(is_end, self.end_marker_sa[jnp.clip(rows, 0, m - 1)], val)
            found = found | is_end
        return found, val

    # --------------------------------------------------------------- kernels

    def resolve_rows(self, rows, valid):
        """Jitted batched LF-walk (arrays passed as arguments)."""
        f = self._jitted("resolve",
                         lambda s, r, v: s._resolve_rows_impl(r, v))
        return f(self.arrs, rows, valid)

    def _sample_stored_here(self, cur):
        """Arithmetic-only mirror of get_sampled_sa's `found` predicate (no
        big-table gathers): first-ISA row, sampled row, genome-boundary
        selected row (small sorted table), or end-marker row."""
        found = (cur == self.first_isa) | (cur % self.sample_rate == 0)
        if self.sel_rows is not None:
            pos = jnp.searchsorted(self.sel_rows, cur)
            pos_c = jnp.minimum(pos, len(self.sel_rows) - 1)
            found = found | (self.sel_rows[pos_c] == cur)
        elif self.has_end_marker and self.end_marker_sa is not None:
            found = found | (cur < len(self.end_marker_sa))
        return found

    def _resolve_rows_impl(self, rows, valid):
        """Batched LF-walk to a stored sample (BackwardToSampledSA).
        rows: [M] int; valid: [M] bool mask for padding lanes.
        With the precomputed rowmap the whole walk is ONE gather.

        The loop body performs ONLY the LF row gather plus arithmetic
        stop checks; the sample VALUE gathers (sampled SA, boundary values,
        end-marker table) run ONCE after the loop on the final rows —
        narrow 4-byte gathers are ~4x slower per row than the wide 512-byte
        row gather on TPU, so keeping them out of the up-to-sample_rate-step
        walk is a big win (measured: resolve 229 ms -> tens of ms at 64k
        lanes on a 300 Mnt index)."""
        if self.rowmap is not None:
            r = self._rowmap_fetch(jnp.clip(rows, 0, self.n - 1).astype(jnp.int32))
            return jnp.where(valid, r, 0).astype(self.idtype)

        # Row-sampled SA gives the walk a geometric tail (measured on a
        # 300 Mnt index: 33% of lanes still walking after 16 steps, 1.4%
        # after 64, all done by 192) — a plain lockstep while_loop pays the
        # FULL lane width for the worst lane's ~170 steps.  Compaction fixes
        # it: after each phase the surviving minority is packed (stable sort)
        # into a 4x smaller buffer, so total gather work tracks M * E[steps]
        # instead of M * max[steps].  Each shrink is preceded by a spill
        # guard (keep stepping 8 at a time while survivors exceed the next
        # capacity) so compaction can never drop a pending lane, and the
        # final phase is an exact while_loop for the rare 100+-step
        # stragglers.  Measured: 65k-lane resolve 214 ms -> ~30 ms.
        it = self.idtype

        def step_n(n_steps, state):
            def body(i, st):
                cur, pend = st
                pend = pend & (~self._sample_stored_here(cur))
                nxt = self.lf(jnp.where(pend, cur, 0))
                return (jnp.where(pend, nxt, cur), pend)
            return lax.fori_loop(0, n_steps, body, state)

        rows = rows.astype(it)
        M = rows.shape[0]
        stopped = jnp.zeros(M, it)
        ids = jnp.arange(M, dtype=jnp.int32)
        cur, pend = rows, valid

        plan = [(16, max(M // 4, 32)), (16, max(M // 16, 32)),
                (32, max(M // 64, 32))]
        for steps, cap in plan:
            if cap >= M:
                continue
            cur, pend = step_n(steps, (cur, pend))
            # spill guard: shrink only once the survivors fit (global
            # reduction in sharded mode keeps every shard in lockstep)
            cur, pend = lax.while_loop(
                lambda st: self._loop_any(
                    jnp.sum(st[1].astype(jnp.int32)) > cap),
                lambda st: step_n(8, st), (cur, pend))
            stopped = stopped.at[ids].set(cur)
            order = jnp.argsort(jnp.where(pend, 0, 1).astype(jnp.int32),
                                stable=True).astype(jnp.int32)
            # barrier: sort output feeding gather indices melts the XLA:TPU
            # fusion pass (see classify/device_engine.py module docstring)
            sel = lax.optimization_barrier(order[:cap])
            ids, cur, pend = ids[sel], cur[sel], pend[sel]
            M = cap

        # exact tail: tiny buffer, cond amortized over 8-step chunks
        cur, pend = lax.while_loop(
            lambda st: self._loop_any(st[1]),
            lambda st: step_n(8, st), (cur, pend))
        stopped = stopped.at[ids].set(cur)
        # every valid lane now rests on a stored row: one value-gather round
        _, val = self.get_sampled_sa(stopped)
        return jnp.where(valid, val, 0).astype(it)

    # chain search -----------------------------------------------------------

    def _precompute_read_tables(self, codes):
        """codes: [B, L] uint8 (255 = invalid). Returns (kfull [B, L+1],
        tailvalid [B, L+1]) where index p refers to the prefix of length p.

        tailvalid is SATURATED at pw — its only consumers compare against pw
        or read values < pw.  Both tables are built from static slices and an
        O(pw) windowed select chain, deliberately avoiding any cumulative
        scan: an associative_scan/cummax output elementwise-combined with a
        large-table gather result sends XLA:TPU's fusion pass into a ~220s
        compile (measured, tools/bisect_compile4.py); this form compiles in
        seconds and runs identically fast."""
        B, L = codes.shape
        valid = codes != 255
        bits = self.code_bits
        pw = self.pw
        # tailvalid[p] = length of the valid run ending at p-1, capped at pw
        vpad = jnp.concatenate([jnp.zeros((B, pw), bool), valid], axis=1)
        tailvalid = jnp.zeros((B, L + 1), jnp.int32)
        for j in range(1, pw + 1):
            vj = vpad[:, pw - j:pw - j + L + 1]
            tailvalid = jnp.where(vj & (tailvalid == j - 1), j, tailvalid)
        # kmer ending at p: sum codes[p-pw+j] << (bits*j); meaningful only
        # for p >= pw (callers gate on posidx >= pw / ms >= pw)
        kdt = jnp.int64 if bits * pw > 31 else jnp.int32
        if L >= pw:
            cc = jnp.where(valid, codes, 0).astype(kdt)
            core = cc[:, 0:L - pw + 1] << 0
            for j in range(1, pw):
                core = core + (cc[:, j:L - pw + j + 1] << (bits * j))
            kfull = jnp.concatenate([jnp.zeros((B, pw), kdt), core], axis=1)
        else:
            kfull = jnp.zeros((B, L + 1), kdt)
        return kfull, tailvalid

    def chain_search(self, codes, lengths, min_hit_len, max_hits):
        """Full semi-maximal hit chains for a batch of reads.

        codes: [B, L] uint8 (255 invalid, padded); lengths: [B] int32.
        Returns dict of [B, H] arrays (sp, ep, l, offset) + nhits [B].
        Implements GetHitsFromRead x BackwardSearch (Classifier.hpp:262-281,
        FMIndex.hpp:487-510) as a lockstep while_loop.
        """
        mhl, H = int(min_hit_len), int(max_hits)
        f = self._jitted(("chain", mhl, H),
                         lambda s, c, l: s._chain_search_impl(c, l, mhl, H))
        return f(self.arrs, codes, lengths)

    def _chain_search_impl(self, codes, lengths, mhl, H):
        """Dispatch.  Chains MUST start through the ftab: starting from the
        full interval and extending char-by-char is NOT equivalent — the
        displaced-last-char BWT rotation (FMIndex.hpp:352-362) makes
        from-scratch extension lossy for suffixes that graze the rotated
        region, and the reference's own searches always begin at ftab depth
        (GetBackwardSearchInitialRange, FMIndex.hpp:388-422).  A round-4
        "noftab" emulation of ftab-failure semantics produced wrong chains on
        real Legionella sequence (tests/test_real_sequence.py) and was
        removed.  The lazy variant gathers ftab entries in-loop ([B] per
        step, overlapped with the wide rank gathers) instead of the eager
        [B*(L+1)] precompute; it requires the per-position (kmer, tailvalid,
        char) pack to fit an int32."""
        if self.code_bits * self.pw + 9 <= 31:
            return self._chain_search_lazyftab_impl(codes, lengths, mhl, H)
        return self._chain_search_ftab_impl(codes, lengths, mhl, H)

    # number of chain-loop body steps per while_loop iteration: amortizes the
    # loop condition (a cross-lane any() reduction) over UNROLL extends.
    # Keep small: every extra unrolled body copy inflates XLA:TPU compile
    # time of the fused program substantially.
    CHAIN_UNROLL = 2

    def _chain_search_lazyftab_impl(self, codes, lengths, mhl, H):
        """Semi-maximal hit chains with EXACT ftab-start semantics and lazy
        in-loop ftab gathers.

        Same state machine as _chain_search_ftab_impl (START jumps to the
        precomputed pw-mer range, EXTEND does one BackwardExtend per char,
        GetBackwardSearchInitialRange failure semantics — reference
        FMIndex.hpp:388-422), but instead of eagerly gathering ftab entries
        for every (lane, position) up front (a [B*(L+1)]-row gather, ~32 ms
        per 16k-lane batch), the loop gathers ftab_start/ftab_len for [B]
        kmers per step.  Those narrow gathers are independent of the wide
        rank-row gathers of extending lanes, so XLA pipelines them in
        parallel; per-position (kmer, tailvalid, prev-char) ship as ONE
        packed int32 table (requires code_bits*pw + 9 <= 31)."""
        B, L = codes.shape
        it = self.idtype
        pw = self.pw
        kfull, tailvalid = self._precompute_read_tables(codes)
        kc = jnp.clip(kfull, 0, self.ftab_len.shape[0] - 1).astype(jnp.int32)
        prev_char = jnp.concatenate(
            [jnp.full((B, 1), 255, jnp.int32), codes.astype(jnp.int32)],
            axis=1)
        char5 = jnp.where(prev_char == 255, 31, prev_char)     # 5 bits
        pk = (kc << 9) | (tailvalid.astype(jnp.int32) << 5) | char5
        pk_flat = pk.reshape(B * (L + 1))
        # wide-row word-fetch layout (see ftab2w note in __init__): pad the
        # flat table to [R, 128] so the in-loop fetch rides the fast 512-byte
        # row-gather path; the word is column-selected arithmetically
        rpk = (B * (L + 1) + 127) // 128
        pk_pad = jnp.zeros(rpk * 128, jnp.int32).at[:B * (L + 1)].set(
            pk_flat).reshape(rpk, 128)
        j128 = jnp.arange(128, dtype=jnp.int32)[None, :]
        lane_base = jnp.arange(B, dtype=jnp.int32) * (L + 1)

        lengths = lengths.astype(jnp.int32)
        state = dict(
            rem=lengths,
            l=jnp.zeros(B, jnp.int32),
            sp=jnp.zeros(B, it),
            ep=jnp.zeros(B, it),
            phase=jnp.zeros(B, jnp.int32),  # 0 = START, 1 = EXTEND
            nhits=jnp.zeros(B, jnp.int32),
            hits=jnp.zeros((B, H, 4), it),  # packed (sp, ep, l, off)
        )
        slots = jnp.arange(H, dtype=jnp.int32)[None, :]

        def cond(st):
            return self._loop_any(st["rem"] >= mhl)

        def step(st):
            active = st["rem"] >= mhl
            start = active & (st["phase"] == 0)
            extend = active & (st["phase"] == 1)
            rem = st["rem"]

            idx = jnp.clip(jnp.where(st["phase"] == 0, rem, rem - st["l"]),
                           0, L)
            q = lane_base + idx
            pkrow = pk_pad[q >> 7]
            # explicit sum dtypes: under jax_enable_x64 an unqualified
            # jnp.sum(int32) promotes to int64 and breaks the loop carry
            pkv = jnp.sum(jnp.where(j128 == (q & 127)[:, None], pkrow, 0),
                          axis=1, dtype=jnp.int32)
            c = pkv & 31
            tv = (pkv >> 5) & 15
            kmer = pkv >> 9
            # lazy ftab fetch, masked to kmer 0 on non-start lanes so the
            # rows stay in-range
            km = jnp.where(start, kmer, 0)
            if self.ftab2w is not None:
                q2 = km * 2                       # even -> both words share
                frow = self.ftab2w[q2 >> 7]       # one 512-byte row
                col = (q2 & 127)[:, None]
                fsp = jnp.sum(jnp.where(j128 == col, frow, 0), axis=1,
                              dtype=it)
                flen = jnp.sum(jnp.where(j128 == col + 1, frow, 0), axis=1,
                               dtype=it)
            else:
                row2 = self.ftab2[km]
                fsp, flen = row2[:, 0], row2[:, 1]
            ftab_ok = (tv >= pw) & (flen > 0) & (idx >= pw)
            fep = fsp + flen - 1
            start_done_now = ftab_ok & (pw >= rem)
            lfail = jnp.where(idx < pw, 0,
                              jnp.where(tv < pw, tv, pw - 1)).astype(jnp.int32)
            start_l = jnp.where(ftab_ok, pw, lfail)

            # ---- EXTEND: one BackwardExtend step ----
            c_invalid = c == 31
            c_safe = jnp.where(c_invalid, 0, c)
            nsp, nep = self.backward_extend(
                jnp.where(extend, c_safe, 0),
                jnp.where(extend, st["sp"], 0),
                jnp.where(extend, st["ep"], 0))
            ext_fail = extend & (c_invalid | (nsp > nep))
            ext_ok = extend & (~ext_fail)
            new_l = st["l"] + 1
            ext_done = ext_ok & (new_l >= rem)   # matched entire prefix

            # ---- merge outcomes ----
            fin_start = start & ((~ftab_ok) | start_done_now)
            fin_ext = ext_fail | ext_done
            fin = fin_start | fin_ext

            fin_l = jnp.where(fin_start, start_l,
                              jnp.where(ext_done, new_l, st["l"]))
            fin_sp = jnp.where(fin_start,
                               jnp.where(start_done_now, fsp,
                                         jnp.ones_like(fsp)), st["sp"])
            fin_ep = jnp.where(fin_start,
                               jnp.where(start_done_now, fep,
                                         jnp.zeros_like(fep)), st["ep"])
            fin_sp = jnp.where(ext_done, nsp, fin_sp)
            fin_ep = jnp.where(ext_done, nep, fin_ep)

            st2 = dict(st)
            cond_hit = fin & (fin_l >= mhl) & (fin_sp <= fin_ep) & \
                (st["nhits"] < H)
            sel = cond_hit[:, None] & (slots == st["nhits"][:, None])
            new = jnp.stack([fin_sp.astype(it), fin_ep.astype(it),
                             fin_l.astype(it),
                             (lengths - rem).astype(it)], axis=-1)[:, None, :]
            st2["hits"] = jnp.where(sel[:, :, None], new, st["hits"])
            st2["nhits"] = st["nhits"] + cond_hit.astype(jnp.int32)

            go_extend = start & ftab_ok & (~start_done_now)
            st2["sp"] = jnp.where(go_extend, fsp,
                                  jnp.where(ext_ok, nsp, st["sp"]))
            st2["ep"] = jnp.where(go_extend, fep,
                                  jnp.where(ext_ok, nep, st["ep"]))
            st2["l"] = jnp.where(go_extend, pw,
                                 jnp.where(ext_ok, new_l, st["l"]))
            st2["phase"] = jnp.where(fin, 0, jnp.where(go_extend, 1,
                                                       st["phase"]))
            st2["rem"] = jnp.where(fin, rem - (fin_l + 1), rem)
            st2["l"] = jnp.where(fin, 0, st2["l"])
            return st2

        def body(st):
            for _ in range(self.CHAIN_UNROLL):
                st = step(st)
            return st

        st = lax.while_loop(cond, body, state)
        h = st["hits"]
        return dict(sp=h[:, :, 0], ep=h[:, :, 1], l=h[:, :, 2], off=h[:, :, 3],
                    nhits=st["nhits"])

    def _chain_search_ftab_impl(self, codes, lengths, mhl, H):
        B, L = codes.shape
        it = self.idtype
        pw = self.pw
        kfull, tailvalid = self._precompute_read_tables(codes)

        # Precompute every START outcome per (lane, position) BEFORE the loop:
        # channel 0/1 = ftab (sp, ep); channel 2 = -1 when the ftab range is
        # usable, else the failed-search length (0 for too-short prefixes,
        # tv for an invalid char inside the window, pw-1 for an empty range;
        # GetBackwardSearchInitialRange, reference FMIndex.hpp:388-422).
        # Inside the loop one take_along gather replaces three.
        posidx = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        kc = jnp.clip(kfull, 0, self.ftab_len.shape[0] - 1)
        p_flen = self.ftab_len[kc]
        p_fsp = self.ftab_start[kc]
        p_ok = (tailvalid >= pw) & (p_flen > 0) & (posidx >= pw)
        lfail = jnp.where(posidx < pw, 0,
                          jnp.where(tailvalid < pw, tailvalid, pw - 1))
        # channel 3: the read character at p-1, so the EXTEND phase shares the
        # same per-lane table lookup as START (one take_along per step)
        prev_char = jnp.concatenate(
            [jnp.full((B, 1), 255, jnp.int32), codes.astype(jnp.int32)], axis=1)
        pre = jnp.stack([jnp.where(p_ok, p_fsp, 1).astype(it),
                         jnp.where(p_ok, p_fsp + p_flen - 1, 0).astype(it),
                         jnp.where(p_ok, -1, lfail).astype(it),
                         prev_char], axis=-1)

        # Flatten the per-(lane, position) table: in-loop lookups must be
        # axis-0 gathers — take_along_axis with per-lane indices on a minor
        # axis is ~1000x slower on TPU (measured: 3 GB/s vs >1 TB/s).
        pre_flat = pre.reshape(B * (L + 1), 4)
        lane_base = jnp.arange(B, dtype=jnp.int32) * (L + 1)

        lengths = lengths.astype(jnp.int32)
        state = dict(
            rem=lengths,
            l=jnp.zeros(B, jnp.int32),
            sp=jnp.zeros(B, it),
            ep=jnp.zeros(B, it),
            phase=jnp.zeros(B, jnp.int32),  # 0 = START, 1 = EXTEND
            nhits=jnp.zeros(B, jnp.int32),
            hits=jnp.zeros((B, H, 4), it),  # packed (sp, ep, l, off)
        )

        lane = jnp.arange(B)
        slots = jnp.arange(H, dtype=jnp.int32)[None, :]

        def record(st, do_record, l, sp, ep):
            """Append hit (l, sp, ep, offset=len-rem) where do_record."""
            cond_hit = do_record & (l >= mhl) & (sp <= ep) & (st["nhits"] < H)
            sel = cond_hit[:, None] & (slots == st["nhits"][:, None])
            st = dict(st)
            new = jnp.stack([sp.astype(it), ep.astype(it), l.astype(it),
                             (lengths - st["rem"]).astype(it)], axis=-1)[:, None, :]
            st["hits"] = jnp.where(sel[:, :, None], new, st["hits"])
            st["nhits"] = st["nhits"] + cond_hit.astype(jnp.int32)
            return st

        def cond(st):
            # _loop_any is a global reduction in sharded mode so every shard
            # runs the same number of iterations (collectives in the body must
            # stay in lockstep)
            return self._loop_any(st["rem"] >= mhl)

        def body(st):
            active = st["rem"] >= mhl
            start = active & (st["phase"] == 0)
            extend = active & (st["phase"] == 1)

            rem = st["rem"]
            # ---- one shared per-lane table lookup for both phases ----
            # START looks up position rem; EXTEND needs the char at rem-1-l,
            # stored in channel 3 of position rem-l
            idx = jnp.clip(jnp.where(st["phase"] == 0, rem, rem - st["l"]), 0, L)
            row4 = pre_flat[lane_base + idx]
            ftab_ok = row4[:, 2] < 0
            fsp = row4[:, 0]
            fep = row4[:, 1]
            # chain already complete at START (consumed whole prefix)?
            start_done_now = ftab_ok & (pw >= rem)
            # consumed positions when the chain ends in this START step
            start_l = jnp.where(ftab_ok, pw, row4[:, 2]).astype(jnp.int32)

            # ---- EXTEND: one BackwardExtend step ----
            c = row4[:, 3].astype(jnp.int32)
            c_invalid = c == 255
            c_safe = jnp.where(c_invalid, 0, c)
            nsp, nep = self.backward_extend(
                jnp.where(extend, c_safe, 0),
                jnp.where(extend, st["sp"], 0),
                jnp.where(extend, st["ep"], 0))
            ext_fail = extend & (c_invalid | (nsp > nep))
            ext_ok = extend & (~ext_fail)
            new_l = st["l"] + 1
            ext_done = ext_ok & (new_l >= rem)   # matched entire prefix

            # ---- merge outcomes ----
            # chain finishing this step (record + consume + back to START):
            fin_start = start & ((~ftab_ok) | start_done_now)
            fin_ext = ext_fail | ext_done
            fin = fin_start | fin_ext

            fin_l = jnp.where(fin_start, start_l, jnp.where(ext_done, new_l, st["l"]))
            fin_sp = jnp.where(fin_start, jnp.where(start_done_now, fsp, 1), st["sp"])
            fin_ep = jnp.where(fin_start, jnp.where(start_done_now, fep, 0), st["ep"])
            # ext_done uses the updated range
            fin_sp = jnp.where(ext_done, nsp, fin_sp)
            fin_ep = jnp.where(ext_done, nep, fin_ep)

            st2 = record(st, fin, fin_l, fin_sp, fin_ep)

            # transition to EXTEND from a successful START
            go_extend = start & ftab_ok & (~start_done_now)

            st2["sp"] = jnp.where(go_extend, fsp, jnp.where(ext_ok, nsp, st2["sp"]))
            st2["ep"] = jnp.where(go_extend, fep, jnp.where(ext_ok, nep, st2["ep"]))
            st2["l"] = jnp.where(go_extend, pw, jnp.where(ext_ok, new_l, st2["l"]))
            st2["phase"] = jnp.where(fin, 0, jnp.where(go_extend, 1, st2["phase"]))
            st2["rem"] = jnp.where(fin, rem - (fin_l + 1), rem)
            st2["l"] = jnp.where(fin, 0, st2["l"])
            return st2

        st = lax.while_loop(cond, body, state)
        h = st["hits"]
        return dict(sp=h[:, :, 0], ep=h[:, :, 1], l=h[:, :, 2], off=h[:, :, 3],
                    nhits=st["nhits"])

    def fused_classify(self, reads, lengths, nr, mhl, H, max_result,
                       hitk_factor, k_out, r_cap, protein=False):
        """One-program classification: encode + chain search + strand select +
        SA-row expansion + LF resolve + score aggregation (see
        classify/device_engine.py).  Returns dict of device arrays."""
        from ..classify.device_engine import fused_classify
        key = ("fusedcls", nr, mhl, H, max_result, hitk_factor, k_out, r_cap,
               protein)
        f = self._jitted(key, lambda s, rd, ln: fused_classify(
            s, rd, ln, nr, mhl, H, max_result, hitk_factor, k_out, r_cap,
            protein=protein))
        return f(self.arrs, reads, lengths)

    def prefix_search(self, codes, ms):
        """Jitted longest-suffix backward search (arrays as arguments)."""
        f = self._jitted("prefix",
                         lambda s, c, m: s._prefix_search_impl(c, m))
        return f(self.arrs, codes, ms)

    def _prefix_search_impl(self, codes, ms):
        """Single longest-suffix backward search of codes[:, :m] per lane
        (FMIndex::BackwardSearch) — used by hit-boundary adjustment.
        Returns (l, sp, ep) per lane."""
        B, L = codes.shape
        it = self.idtype
        pw = self.pw
        kfull, tailvalid = self._precompute_read_tables(codes)
        lane = jnp.arange(B)
        codes_flat = codes.reshape(B * L)
        lane_base = jnp.arange(B, dtype=jnp.int32) * L
        ms = ms.astype(jnp.int32)
        msc = jnp.clip(ms, 0, L)

        too_short = ms < pw
        flat_ms = jnp.arange(B, dtype=jnp.int32) * (L + 1) + msc
        tv = tailvalid.reshape(-1)[flat_ms]
        short_tail = (~too_short) & (tv < pw)
        w = kfull.reshape(-1)[flat_ms]
        w = jnp.clip(w, 0, self.ftab_len.shape[0] - 1)
        fl = self.ftab_len[w]
        ftab_empty = (~too_short) & (~short_tail) & (fl == 0)
        fsp = self.ftab_start[w]
        fep = fsp + fl - 1

        init_l = jnp.where(too_short, 0,
                           jnp.where(short_tail, tv,
                                     jnp.where(ftab_empty, pw - 1, pw)))
        running = (~too_short) & (~short_tail) & (~ftab_empty)
        sp = jnp.where(running, fsp, 1).astype(it)
        ep = jnp.where(running, fep, 0).astype(it)

        def cond(stt):
            l, sp, ep, running = stt
            return jnp.any(running & (l < ms))

        def body(stt):
            l, sp, ep, running = stt
            act = running & (l < ms)
            cpos = jnp.clip(ms - 1 - l, 0, L - 1)
            c = codes_flat[lane_base + cpos].astype(jnp.int32)
            c_invalid = c == 255
            c_safe = jnp.where(c_invalid, 0, c)
            nsp, nep = self.backward_extend(jnp.where(act, c_safe, 0),
                                            jnp.where(act, sp, 0),
                                            jnp.where(act, ep, 0))
            ok = act & (~c_invalid) & (nsp <= nep)
            sp = jnp.where(ok, nsp, sp)
            ep = jnp.where(ok, nep, ep)
            l = jnp.where(ok, l + 1, l)
            running = running & ok
            return l, sp, ep, running

        l, sp, ep, _ = lax.while_loop(cond, body, (init_l, sp, ep, running))
        return l, sp, ep

"""Sharded-index classification: the big FM tables sharded across chips.

For databases whose index exceeds per-chip HBM (SURVEY §2.6 P4: the reference
answers 140 Gnt RefSeq with 43 GB of host RAM, README.md:13; prebuilt GTDB
indexes reach 232 GB, README.md:57-60), the three large tables — the fused-row
rank table, the rowmap resolve accelerator, and the sampled SA — are
row-sharded across the mesh, so per-chip bytes ~= total / D.  The small tables
(F-column partial sums, ftab, genome-boundary selected rows) stay replicated.

Every big-table access from inside the (otherwise unchanged) classification
program is routed to the owning shard with a capacity-free collective pattern:

    all_gather(request ids)  ->  local gather of owned rows (others masked 0)
                             ->  psum_scatter(responses)

On the wire per fetch of M rows: M ids out (all_gather) and M rows back
(reduce-scatter), riding ICI collectives; there is no per-shard send budget to
overflow, so arbitrarily skewed request distributions stay exact.  Loop
terminations become global psum reductions so every shard executes the same
collective sequence in lockstep.  The global (sp, ep) interval arithmetic —
the semantic contract of FMIndex::BackwardExtend (reference
compactds/FMIndex.hpp:364-379) — is untouched: chain hits, resolved seqids,
and the packed classification results are bit-identical to the replicated
path (tests/test_sharded.py on a virtual CPU mesh; __graft_entry__ dryrun).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fm.device import DeviceFM


def _routed_gather(table_local, idx, rps, axis):
    """Fetch rows of a row-sharded table for this chip's requests.

    table_local: the local [rps, ...] shard (inside shard_map);
    idx: [M] global row ids (may be out of range; such rows return 0);
    rps: rows per shard (static).  Returns [M, ...] rows.
    """
    my = lax.axis_index(axis)
    allreq = lax.all_gather(idx, axis)                    # [D, M]
    local = allreq - jnp.asarray(my, allreq.dtype) * rps
    ok = (local >= 0) & (local < rps)
    g = table_local[jnp.clip(local, 0, rps - 1).astype(jnp.int32)]
    mask = ok[..., None] if g.ndim > allreq.ndim else ok
    g = jnp.where(mask, g, 0)
    # exactly one shard contributes a non-zero row per request, so the
    # reduce-scatter sum IS the routed answer
    return lax.psum_scatter(g, axis, scatter_dimension=0, tiled=False)


class _ShardedFMView(DeviceFM):
    """A DeviceFM whose big-table fetches route to the owning shard.

    Constructed inside shard_map per chip; shares every attribute with the
    bound base index but replaces the three sharded tables with routed
    accessors (and poisons the replicated handles so an unrouted access is a
    loud trace-time error, not a silent full-table constant)."""

    def __init__(self, base: DeviceFM, axis, tables, rps):
        self.__dict__.update(base.__dict__)
        self._ax = axis
        self._tables = tables
        self._rps = rps
        poison = _PoisonArray()
        for k in tables:
            setattr(self, k, poison)   # `is not None` checks still pass

    def _plain_rows_fetch(self, pos):
        from ..fm.device_fused import WIDE_BLOCK
        return _routed_gather(self._tables["plain_rows"],
                              (pos + 1) // WIDE_BLOCK,
                              self._rps["plain_rows"], self._ax)

    def _rowmap_fetch(self, rows):
        return _routed_gather(self._tables["rowmap"], rows,
                              self._rps["rowmap"], self._ax)

    def _sampled_sa_fetch(self, slot):
        return _routed_gather(self._tables["sampled_sa"], slot,
                              self._rps["sampled_sa"], self._ax)

    def _loop_any(self, x):
        # global lockstep termination: the routed fetches inside loop bodies
        # are collectives and must execute the same number of times everywhere
        return lax.psum(jnp.any(x).astype(jnp.int32), self._ax) > 0


class _PoisonArray:
    """Passes `is not None` gates but fails loudly on any use."""

    def __getitem__(self, k):
        raise RuntimeError("sharded table accessed without routing")

    def __getattr__(self, k):
        raise RuntimeError("sharded table accessed without routing")


class ShardedIndex:
    """The serving index with its big tables sharded over a mesh axis.

    Runs the FULL fused classification program (classify/device_engine.py)
    under shard_map: read units sharded over `axis` AND index rows sharded
    over `axis` — each chip holds 1/D of the big tables plus its 1/D of the
    batch.  `per_chip_bytes()` exposes the memory contract for asserts.
    """

    SHARDED = ("plain_rows", "rowmap", "sampled_sa")

    def __init__(self, dev_fm: DeviceFM, mesh: Mesh, axis="dp"):
        assert dev_fm.plain_rows is not None, \
            "sharded mode needs the plain serving layout"
        self.dev = dev_fm
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        self.repl_arrs = {k: v for k, v in dev_fm.arrs.items()
                          if k not in self.SHARDED}
        self.tables = {}
        self.rps = {}
        for k in self.SHARDED:
            v = dev_fm.arrs.get(k)
            if v is None:
                continue
            arr = np.asarray(v)
            rps = -(-arr.shape[0] // self.D)
            pad = rps * self.D - arr.shape[0]
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            spec = P(axis, *([None] * (arr.ndim - 1)))
            self.tables[k] = jax.device_put(
                jnp.asarray(arr), NamedSharding(mesh, spec))
            self.rps[k] = rps
        self._jit_cache = {}

    # ------------------------------------------------------ memory accounting

    def per_chip_bytes(self):
        """(max per-chip addressable bytes of the sharded tables, their total
        bytes).  The sharded-mode contract: per_chip ~= total / D."""
        per_chip = 0
        total = 0
        for t in self.tables.values():
            per_chip += max(s.data.nbytes for s in t.addressable_shards)
            total += t.nbytes
        return per_chip, total

    def replicated_bytes(self):
        """Bytes of the small tables every chip keeps (psum/ftab/selected)."""
        return int(sum(np.asarray(v).nbytes for v in self.repl_arrs.values()))

    # ------------------------------------------------------------ SPMD launch

    def _launch(self, key, traced, out_specs, *args, arg_specs):
        """shard_map + jit wrapper with the sharded tables and replicated
        arrays flowing in as arguments (same rationale as DeviceFM._jitted)."""
        if key not in self._jit_cache:
            from jax import shard_map
            axis = self.axis
            rps = self.rps
            dev = self.dev

            def per_chip(tables, arrs, *a):
                view = _ShardedFMView(dev._bind(arrs), axis, tables, rps)
                return traced(view, *a)

            table_specs = {k: P(axis, *([None] * (t.ndim - 1)))
                           for k, t in self.tables.items()}
            repl_specs = jax.tree.map(lambda _: P(), self.repl_arrs)
            fn = shard_map(per_chip, mesh=self.mesh,
                           in_specs=(table_specs, repl_specs) + arg_specs,
                           out_specs=out_specs, check_vma=False)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](self.tables, self.repl_arrs, *args)

    def chain_search(self, codes, lengths, mhl, H):
        """Semi-maximal hit chains, lanes AND index sharded over the axis.
        codes [B, L] uint8 (B divisible by D); bit-identical to
        DeviceFM.chain_search."""
        axis = self.axis
        out_specs = dict(sp=P(axis, None), ep=P(axis, None), l=P(axis, None),
                         off=P(axis, None), nhits=P(axis))
        return self._launch(
            ("chain", int(mhl), int(H)),
            lambda view, c, ln: view._chain_search_impl(c, ln, mhl, H),
            out_specs, codes, lengths,
            arg_specs=(P(axis, None), P(axis)))

    def resolve_rows(self, rows, valid):
        """Routed batched LF-walk resolve (BackwardToSampledSA)."""
        axis = self.axis
        return self._launch(
            "resolve",
            lambda view, r, v: view._resolve_rows_impl(r, v),
            P(axis), rows, valid, arg_specs=(P(axis), P(axis)))

    def fused_classify(self, reads, lengths, nr, mhl, H, max_result,
                       hitk_factor, k_out, r_cap, protein=False):
        """The full one-program classification (encode + chains + strand
        select + row expansion + resolve + score finalize) with units sharded
        over the axis and every big-table access routed.  reads: [U, L] uint8
        (or the 2-bit-packed pair), U = Q * nr, Q divisible by D.  Signature
        matches DeviceFM.fused_classify (r_cap is the GLOBAL row budget;
        per-unit budget r_cap // Q is preserved per shard), so the serving
        engine can use a ShardedIndex as a drop-in device.  Output arrays
        match the replicated path bit-for-bit."""
        from ..classify.device_engine import fused_classify as _fused
        axis = self.axis
        nr, mhl, H = int(nr), int(mhl), int(H)
        U = (reads[0] if isinstance(reads, (tuple, list)) else reads).shape[0]
        lanes_per_read = 6 if protein else 1
        u_cap = int(r_cap) // max(U // lanes_per_read // nr, 1)

        def traced(view, rd, ln):
            u_local = (rd[0] if isinstance(rd, (tuple, list)) else rd).shape[0]
            r = _fused(view, rd, ln, nr, mhl, H, max_result,
                       hitk_factor, k_out,
                       (u_local // lanes_per_read // nr) * u_cap,
                       protein=protein)
            # host_blob concatenates per-shard sections and would not match
            # the host unpacker's layout across shards; the engine falls back
            # to per-array pulls when it is absent
            r.pop("host_blob", None)
            return r

        out_specs = dict(packed=P(axis, None), hits=P(axis, None, None),
                         nhits=P(axis), fb_units=P(axis),
                         fb_hits=P(axis, None, None), fb_nh=P(axis))
        packed_in = isinstance(reads, (tuple, list))
        if packed_in:
            reads = tuple(reads)
            reads_spec = (P(axis, None),) * len(reads)
        else:
            reads_spec = P(axis, None)
        return self._launch(
            ("fusedcls", nr, mhl, H, int(max_result), int(hitk_factor),
             int(k_out), int(u_cap), packed_in, protein),
            traced, out_specs, reads, lengths,
            arg_specs=(reads_spec, P(axis)))

    # attribute delegation so the serving engine can use a ShardedIndex as a
    # drop-in `dev` (engine_fused reads these to pick code paths / fall back)
    @property
    def idtype(self):
        return self.dev.idtype

    @property
    def fast(self):
        return self.dev.fast

    @property
    def plain_rows(self):
        return self.dev.plain_rows

    def prefix_search(self, codes, ms):
        # host-fallback boundary searches: replicated execution is fine (tiny)
        return self.dev.prefix_search(codes, ms)


# Backwards-compatible alias (round-3 API named the chain-search-only router)
ShardedChainSearch = ShardedIndex

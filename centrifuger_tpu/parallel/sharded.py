"""Sharded-index classification: the BWT rank table sharded across chips with
all-to-all query routing.

For databases whose compressed index exceeds per-chip HBM (SURVEY §2.6 P4:
core_nt-scale), the fused-row rank table is split by row blocks across the
mesh; each backward-extend step routes (lane, row) requests to the owning chip
with `ppermute`-based all-to-all, performs the local gather, and routes the
84-byte rows back.  The global (sp, ep) interval arithmetic — the semantic
contract of FMIndex::BackwardExtend (reference compactds/FMIndex.hpp:364-379)
— is unchanged, so results are bit-identical to the replicated path (tested on
a virtual CPU mesh).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fm.device import DeviceFM


class ShardedChainSearch:
    """Chain search with the plain fused-row table row-sharded over `axis`."""

    def __init__(self, dev_fm: DeviceFM, mesh: Mesh, axis="dp"):
        assert dev_fm.plain_rows is not None, "sharded mode needs plain layout"
        self.dev = dev_fm
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        rows = np.asarray(dev_fm.plain_rows)
        R = rows.shape[0]
        self.rows_per_shard = -(-R // self.D)
        pad = self.rows_per_shard * self.D - R
        if pad:
            rows = np.concatenate([rows, np.zeros((pad, 21), np.uint32)])
        self.table = jax.device_put(
            jnp.asarray(rows),
            NamedSharding(mesh, P(axis, None)))

    def _routed_rows(self, pos):
        """Inside shard_map: fetch fused rows for global positions `pos`
        ([M] int32, may be -1) from the owning shards. Returns [M, 21]."""
        axis = self.axis
        D = self.D
        rps = self.rows_per_shard
        M = pos.shape[0]
        row_id = (pos + 1) >> 8
        owner = jnp.clip(row_id // rps, 0, D - 1)

        # capacity binning: stable sort by owner, position within bucket
        order = jnp.argsort(owner, stable=True)
        sorted_owner = owner[order]
        counts = jnp.bincount(owner, length=D)
        cum = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])[:-1]
        rank_in_bucket = jnp.arange(M) - cum[sorted_owner]
        C = M  # worst-case capacity (correctness-first; tighten later)
        send_rows = jnp.zeros((D, C), jnp.int32)
        send_rows = send_rows.at[sorted_owner, rank_in_bucket].set(
            row_id[order].astype(jnp.int32))
        send_valid = jnp.zeros((D, C), bool).at[sorted_owner, rank_in_bucket].set(True)

        # all-to-all: dim 0 is the destination
        req_rows = _a2a(send_rows, axis)
        req_valid = _a2a(send_valid.astype(jnp.int32), axis)

        my_shard = lax.axis_index(axis)
        local = self.table_ref[jnp.clip(req_rows - my_shard * rps, 0,
                                        self.table_ref.shape[0] - 1)]
        local = jnp.where(req_valid[..., None] > 0, local, 0)
        resp = _a2a(local, axis)

        # unscatter back to lane order
        out_sorted = resp[sorted_owner, rank_in_bucket]
        out = jnp.zeros((M, 21), jnp.uint32)
        out = out.at[order].set(out_sorted)
        return out

    def chain_search(self, codes, lengths, mhl, H):
        """codes [B, L] sharded by lanes over the mesh axis."""
        dev = self.dev
        axis = self.axis
        mesh = self.mesh
        table = self.table
        outer_self = self

        from jax import shard_map

        def per_chip(table_local, arrs, codes_l, lengths_l):
            sharded = _ShardedFMView(dev._bind(arrs), outer_self, table_local)
            return sharded._chain_search_impl(codes_l, lengths_l, mhl, H)

        arr_specs = jax.tree.map(lambda _: P(), dev.arrs)
        fn = shard_map(per_chip, mesh=mesh,
                       in_specs=(P(axis, None), arr_specs, P(axis, None), P(axis)),
                       out_specs=P(axis), check_vma=False)
        return jax.jit(fn)(table, dev.arrs, codes, lengths)


def _a2a(x, axis):
    """all_to_all where dim 0 indexes the destination shard."""
    return lax.all_to_all(x, axis, split_axis=0, concat_axis=0)


class _ShardedFMView(DeviceFM):
    """A DeviceFM whose plain-row fetches route through all-to-all."""

    def __init__(self, base: DeviceFM, router: ShardedChainSearch, table_local):
        # share all attributes with the base device index (no copy)
        self.__dict__.update(base.__dict__)
        self._router = router
        router.table_ref = table_local

    def _plain_rows_fetch(self, pos):
        return self._router._routed_rows(pos)

    def _loop_any(self, x):
        # global lockstep termination across shards (the routed gathers are
        # collectives and must execute the same number of times everywhere)
        return lax.psum(jnp.any(x).astype(jnp.int32), self._router.axis) > 0

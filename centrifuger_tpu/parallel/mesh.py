"""Multi-chip sharding for classification (SPMD over a device mesh).

The reference's only parallelism is single-node pthreads over a shared read
batch (CentrifugerClass.cpp:552, :234-284).  The TPU-native equivalents:

  * data parallelism ("dp"): read lanes sharded across chips, the compressed
    index replicated per chip; per-chip XLA kernels run the backward
    search chains; summary statistics merge with psum.
  * sharded-index mode for core_nt-scale databases (parallel/sharded.py):
    the big tables row-sharded per chip with all_gather + psum_scatter
    request routing; per-chip bytes ~= total/D.

`make_mesh` builds a 1-D "dp" mesh; `classify_dp_step` returns a jitted
function whose inputs are batch-sharded and whose captured index arrays are
replicated by XLA.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, devices=None, axis="dp"):
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def classify_dp_step(dev_fm, mesh, min_hit_len, max_hits, axis="dp"):
    """Returns a jitted SPMD classify step: (codes [B,L], lengths [B]) ->
    (nhits [B], hit arrays [B,H], seqids [B,H]) with B sharded over `axis`.

    The per-hit seqid here resolves the hit range's start row — the
    fixed-shape device part of classification; full range resolution and
    taxonomy reduction happen in the host finalizer.
    """
    batch_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))

    def step(codes, lengths):
        out = dev_fm._chain_search_impl(codes, lengths, min_hit_len, max_hits)
        has_hit = (jax.numpy.arange(max_hits)[None, :] < out["nhits"][:, None])
        rows = jax.numpy.where(has_hit, out["sp"], 0)
        seqids = _resolve_matrix(dev_fm, rows, has_hit)
        # global reduction: with the batch sharded over `axis`, jit lowers this
        # sum to a cross-chip all-reduce over ICI
        total_hits = out["nhits"].sum()
        return dict(nhits=out["nhits"], sp=out["sp"], ep=out["ep"],
                    l=out["l"], off=out["off"], seqids=seqids,
                    total_hits=total_hits)

    return jax.jit(step,
                   in_shardings=(batch_sharding, vec_sharding),
                   out_shardings=None)


def _resolve_matrix(dev_fm, rows, valid):
    B, H = rows.shape
    flat = rows.reshape(-1)
    v = valid.reshape(-1)
    out = _resolve_inline(dev_fm, flat, v)
    return out.reshape(B, H)


def _resolve_inline(dev_fm, rows, valid):
    """Inline (non-jitted) resolve for composition inside larger jitted
    programs — delegates to the one implementation (DeviceFM
    ._resolve_rows_impl), so the rowmap fast path and the LF-walk stay in a
    single place."""
    return dev_fm._resolve_rows_impl(rows, valid)

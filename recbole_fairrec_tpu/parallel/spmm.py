"""Sharded graph propagation for FairGo-scale adjacency operators.

Single-chip FairGo propagates a dense [U+I, U+I] row-normalized rating
matrix (ops/spmm.py:propagate — chosen over COO segment-sum because XLA
serializes the scatter-add on TPU). Beyond one chip the natural partition
is BY DESTINATION ROWS: each device holds a [n/S, n] horizontal stripe of
A, computes its output stripe with a local MXU matmul against the
replicated node matrix, and one tiled all-gather over ICI reassembles the
full [n, d] result for the next hop. Per-hop comm is O(n·d) — independent
of nnz and of n² — and per-chip A memory drops 1/S, which is what lets
graphs whose dense operator exceeds one HBM keep the dense fast path.

No reference counterpart (single-GPU torch.sparse.mm, fairgo_pmf.py:201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def pad_rows_to_shards(dense, n_shards):
    """Zero-pad a [n, n] operator's ROWS to a multiple of n_shards.

    Zero rows produce zero output rows, which sit past the real node range
    and are sliced off after the gather — harmless by construction.
    """
    n = dense.shape[0]
    n_pad = -(-n // n_shards) * n_shards
    if n_pad != n:
        dense = jnp.pad(dense, ((0, n_pad - n), (0, 0)))
    return dense


def shard_propagation_matrix(mesh, dense, axis="model"):
    """Place a (row-padded) dense operator with rows split over ``axis``."""
    dense = pad_rows_to_shards(dense, mesh.shape[axis])
    return jax.device_put(dense, NamedSharding(mesh, P(axis, None)))


def sharded_propagate(mesh, dense_padded, x, axis="model"):
    """One hop A @ x with A row-sharded over ``axis``; x replicated.

    Args:
        mesh: device mesh.
        dense_padded: [n_pad, n] operator, n_pad divisible by the axis size
            (see ``pad_rows_to_shards``); rows sharded or replicated —
            shard_map partitions either way.
        x: [n, d] replicated node matrix.

    Returns:
        [n, d] replicated result (padding rows dropped).
    """
    n = x.shape[0]

    def body(a_local, x_full):
        local = jnp.dot(a_local, x_full, precision="highest")
        return jax.lax.all_gather(local, axis, axis=0, tiled=True)

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(), check_vma=False,
    )(dense_padded, x)
    return out[:n]

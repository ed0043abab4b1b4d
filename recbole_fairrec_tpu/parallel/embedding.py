"""Row-sharded embedding tables with explicit ID-bucket exchange.

No reference counterpart (the reference holds one monolithic ``nn.Embedding``
on a single GPU). This is the TPU-native replacement: the table's rows live
split across the ``model`` mesh axis, and a lookup routes each id to its
owning shard.

Two implementations:

* :func:`sharded_gather` — declarative. The table carries a NamedSharding and
  a plain ``table[ids]`` under jit lets XLA insert the gather collectives.
  This is the default path used by the trainer.
* :func:`bucket_allgather_lookup` — explicit shard_map kernel used where the
  collective schedule matters: every shard gathers the full id list
  (all-gather over ICI), looks up the ids it owns, and the partial results
  are psum'd. O(B) id traffic + O(B·d) one-hop result reduction, the classic
  "pull" embedding exchange; id order is preserved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map


def shard_table(mesh, table, axis="model"):
    """Place an embedding table with rows split over ``axis``."""
    return jax.device_put(table, NamedSharding(mesh, P(axis, None)))


def sharded_gather(table, ids):
    """Declarative lookup — correct under any sharding, XLA chooses the
    collectives."""
    return table[ids]


def bucket_allgather_lookup(mesh, table, ids, axis="model", data_axis=None):
    """Explicit pull-style lookup over a row-sharded table.

    Each shard owns rows [lo, hi). All shards receive every id of their data
    slice, mask out the ids they don't own, gather locally, and psum the
    partial results across the model axis. With ``data_axis`` set, the id
    vector stays split over that axis (the classic 2-D layout: each data
    shard pulls only its own rows from every model shard), so the psum rides
    the model axis only and no batch replication happens.
    """
    n_shards = mesh.shape[axis]
    rows_per_shard = table.shape[0] // n_shards
    if table.shape[0] % n_shards:
        raise ValueError(
            f"table rows [{table.shape[0]}] must divide the '{axis}' axis "
            f"size [{n_shards}] — pad the table"
        )

    def kernel(table_shard, ids_slice):
        shard_idx = jax.lax.axis_index(axis)
        lo = shard_idx * rows_per_shard
        local = ids_slice - lo
        owned = (local >= 0) & (local < rows_per_shard)
        safe = jnp.where(owned, local, 0)
        partial = jnp.where(owned[:, None], table_shard[safe], 0.0)
        return jax.lax.psum(partial, axis)

    ids_spec = P(data_axis) if data_axis else P()
    out_spec = P(data_axis, None) if data_axis else P()
    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis, None), ids_spec),
        out_specs=out_spec,
        check_vma=False,
    )(table, ids)


def pad_table_rows(table, n_shards):
    """Pad rows up to a multiple of n_shards (PAD rows never looked up)."""
    rows = table.shape[0]
    target = -(-rows // n_shards) * n_shards
    if target == rows:
        return table, rows
    pad = jnp.zeros((target - rows,) + table.shape[1:], dtype=table.dtype)
    return jnp.concatenate([table, pad], axis=0), rows

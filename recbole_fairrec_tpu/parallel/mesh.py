"""Device mesh + sharding helpers.

No reference counterpart — the reference is single-process single-GPU
(SURVEY.md §2.4). This layer supplies the TPU-native scaling story:

* a ``data × model`` mesh over the slice;
* embedding tables **row-sharded over the model axis** (the analogue of the
  reference's monolithic ``nn.Embedding``), with XLA inserting the
  all-to-all/all-gather collectives for lookups under jit;
* batches sharded over the data axis, gradients psum'd by XLA.

All shardings are expressed declaratively via ``NamedSharding`` so a single
``jax.jit`` traces one SPMD program per topology — no hand-written NCCL-style
calls.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=None, axis_names=("data", "model"), devices=None):
    """Build a Mesh. ``mesh_shape=None`` → all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def param_sharding(mesh, params, embedding_keys=("user_embedding", "item_embedding")):
    """Sharding pytree for model params: embedding tables row-sharded over the
    'model' axis, everything else replicated."""

    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        # row-shard only when rows divide the axis; tiny/ragged tables stay
        # replicated (production tables should be padded to the axis size)
        if (
            top in embedding_keys
            and leaf.ndim >= 2
            and leaf.shape[0] % model_size == 0
        ):
            return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_sharding(mesh, batch):
    """Batch columns sharded over the 'data' axis."""
    return {
        k: NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        for k, v in batch.items()
    }


def replicate(mesh):
    return NamedSharding(mesh, P())


def shard_params(mesh, params, embedding_keys=("user_embedding", "item_embedding")):
    """Place a params pytree onto the mesh with row-sharded tables."""
    shardings = param_sharding(mesh, params, embedding_keys)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

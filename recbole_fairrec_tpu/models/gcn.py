"""Minimal GCN (Kipf & Welling) in JAX — replaces the reference's single
external GNN dependency (torch_geometric.nn.GCN, fairgo_gcn.py:20, :52-57).

Semantics follow torch_geometric's ``GCN``/``GCNConv``:

* per layer: x' = Â (x W) + b with Â = D̃^-1/2 (A+I) D̃^-1/2 (weighted);
* hidden width ``hidden_channels``, ``num_layers`` convs, in→hidden→…→out;
* activation + dropout BETWEEN layers (not after the last);
* Glorot weight init, zero bias.

The normalized adjacency arrives as static COO arrays (precomputed on host by
``ops.spmm.build_gcn_norm_coo``); propagation is gather + segment_sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.spmm import propagate
from .layers import apply_activation, xavier_uniform


def init_gcn(rng, in_channels, hidden_channels, out_channels, num_layers):
    sizes = (
        [in_channels]
        + [hidden_channels] * max(num_layers - 1, 0)
        + [out_channels]
    )
    rngs = jax.random.split(rng, len(sizes) - 1)
    layers = []
    for r, (fi, fo) in zip(rngs, zip(sizes[:-1], sizes[1:])):
        layers.append({"w": xavier_uniform(r, fi, fo), "b": jnp.zeros((fo,))})
    return {"convs": layers}


def apply_gcn(params, x, rows, cols, vals, *, act="relu", dropout=0.0, train=False,
              rng=None, dense=None):
    n = x.shape[0]
    n_layers = len(params["convs"])
    use_dropout = train and dropout > 0.0 and rng is not None
    rngs = jax.random.split(rng, n_layers) if use_dropout else [None] * n_layers
    for i, conv in enumerate(params["convs"]):
        x = propagate(x @ conv["w"], rows, cols, vals, n, dense=dense) + conv["b"]
        if i < n_layers - 1:
            x = apply_activation(act, x)
            if use_dropout:
                keep = 1.0 - dropout
                mask = jax.random.bernoulli(rngs[i], keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
    return x

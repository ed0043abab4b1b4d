"""FairGo_GCN — GCN backbone variant of FairGo.

Parity: recbole/model/fair_recommender/fairgo_gcn.py — during PRETRAIN the
ego embeddings are produced by a GCN over the rating-weighted bipartite edge
list (:52-65, :173-185); finetune filters the raw tables exactly like
FairGo_PMF (the GCN is bypassed, :177). The torch_geometric dependency is
replaced by the in-repo JAX GCN (models/gcn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.spmm import build_gcn_norm_coo
from .fairgo_base import FairGoBase
from .gcn import apply_gcn, init_gcn


class FairGo_GCN(FairGoBase):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.gcn_n_layers = config["gcn_n_layers"]
        self.hidden_channels = config["hidden_channels"]
        self.gcn_dropout = config["gcn_dropout"]
        self.gcn_act = config["gcn_act"]
        self.gcn_rows, self.gcn_cols, self.gcn_vals = build_gcn_norm_coo(
            self.rating_matrix, self.n_users, self.n_items
        )

    def _extra_params(self, rng):
        return {
            "gcn": init_gcn(
                rng, self.embedding_size, self.hidden_channels,
                self.embedding_size, self.gcn_n_layers,
            )
        }

    def _backbone_param_keys(self):
        return ["user_embedding", "item_embedding", "gcn"]

    def _ego_embeddings(self, params, state, train, rng):
        all_embedding = jnp.concatenate(
            [params["user_embedding"], params["item_embedding"]], axis=0
        )
        if self.train_stage == "pretrain":
            dense = state.get("gcn_dense") if isinstance(state, dict) else None
            all_embedding = apply_gcn(
                params["gcn"], all_embedding,
                self.gcn_rows, self.gcn_cols, self.gcn_vals,
                act=self.gcn_act, dropout=self.gcn_dropout, train=train, rng=rng,
                dense=dense,
            )
        return all_embedding

    def _state_constants(self):
        consts = super()._state_constants()
        if self.dense_propagation:
            from ..ops.spmm import coo_to_dense

            n = self.n_users + self.n_items
            consts["gcn_dense"] = jnp.asarray(
                coo_to_dense(self.gcn_rows, self.gcn_cols, self.gcn_vals, n)
            )
        return consts

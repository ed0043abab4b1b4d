"""PFCN_DMF — filters over DMF-style towers with a cosine head.

Parity: recbole/model/fair_recommender/pfcn_dmf.py — user_mlp/item_mlp of
``num_layers`` equal-width layers with normal(0, .01) init (:56-61), filters
applied to the TOWER OUTPUT (:149-166), BPR over cosine·10 (:191-203),
sigmoid(cosine) at predict (:176-183).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import apply_mlp, init_embedding, init_mlp
from .pfcn_base import PFCNBase


def _cosine(a, b, eps=1e-8):
    """torch nn.CosineSimilarity semantics (per-row, clamped norms)."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


class PFCN_DMF(PFCNBase):
    retrieval_monotone = True  # sigmoid/cosine heads preserve dot-product rank
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.num_layers = config["num_layers"]
        self.mlp_dropout = config["mlp_dropout"]
        self.mlp_activation = config["mlp_activation"]
        self.dis_activation_name = config["dis_activation"]
        # PFCN_DMF.yaml has no generic `activation`; filters use the dis one
        if self.activation is None:
            self.activation = self.dis_activation_name

    def _dis_activation(self):
        return self.dis_activation_name

    def _tower_sizes(self):
        return [self.embedding_size] * (self.num_layers + 1)

    def init_params(self, rng):
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        params = {
            "user_embedding": init_embedding(r1, self.n_users, self.embedding_size, "normal"),
            "item_embedding": init_embedding(r2, self.n_items, self.embedding_size, "normal"),
            "user_mlp": init_mlp(r3, self._tower_sizes(), init_method="norm"),
            "item_mlp": init_mlp(r4, self._tower_sizes(), init_method="norm"),
        }
        adv_params, adv_state = self._init_adversarial(r5)
        params.update(adv_params)
        return params, adv_state

    def _backbone_param_keys(self):
        return ["user_embedding", "item_embedding", "user_mlp", "item_mlp"]

    def _tower(self, params, which, x, train, rng):
        out, _ = apply_mlp(
            params[which], x, activation=self.mlp_activation,
            dropout=self.mlp_dropout, train=train, rng=rng,
        )
        return out

    def _user_item_embed(self, params, state, user, item, sst_list, train, rng,
                         sample_weight=None):
        r1, r2, r3 = jax.random.split(rng, 3) if rng is not None else (None, None, None)
        user_e = self._tower(params, "user_mlp", self.lookup(params["user_embedding"], user), train, r1)
        item_e = None
        if item is not None:
            item_e = self._tower(params, "item_mlp", self.lookup(params["item_embedding"], item), train, r2)
        seg = user if (self._ref_bn_emulation and not train) else None
        user_e, state = self._apply_filters(
            params, state, user_e, sst_list, train, r3, sample_weight,
            segments=seg,
        )
        return user_e, item_e, state

    def _pairwise_scores(self, params, state, batch, user, pos_item, neg_item,
                         sst_list, train, rng, sample_weight=None):
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
        user_e, pos_e, state = self._user_item_embed(
            params, state, user, pos_item, sst_list, train, r1, sample_weight
        )
        neg_e = self._tower(params, "item_mlp", self.lookup(params["item_embedding"], neg_item), train, r2)
        pos_s = _cosine(user_e, pos_e) * 10
        neg_s = _cosine(user_e, neg_e) * 10
        return pos_s, neg_s, state

    def predict(self, params, state, batch, sst_list=None):
        user_e, item_e, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], batch[self.ITEM_ID], sst_list, False, None
        )
        return jax.nn.sigmoid(_cosine(user_e, item_e))

    def retrieval_embeddings(self, params, state, batch, sst_list=None):
        """Normalized tower outputs: cosine == dot of unit vectors."""
        user_e, _, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], None, sst_list, False, None
        )
        all_item_e = self._tower(params, "item_mlp", params["item_embedding"], False, None)
        un = user_e / jnp.maximum(jnp.linalg.norm(user_e, axis=-1, keepdims=True), 1e-8)
        inorm = all_item_e / jnp.maximum(
            jnp.linalg.norm(all_item_e, axis=-1, keepdims=True), 1e-8
        )
        return un, inorm

    def full_sort_predict(self, params, state, batch, sst_list=None):
        user_e, _, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], None, sst_list, False, None
        )
        all_item_e = self._tower(params, "item_mlp", params["item_embedding"], False, None)
        # cosine against all items = normalized matmul (MXU-friendly)
        un = user_e / jnp.maximum(jnp.linalg.norm(user_e, axis=-1, keepdims=True), 1e-8)
        inorm = all_item_e / jnp.maximum(
            jnp.linalg.norm(all_item_e, axis=-1, keepdims=True), 1e-8
        )
        return jax.nn.sigmoid(
            jnp.dot(un, inorm.T, precision=self.matmul_precision)
        ).reshape(-1)

"""PFCN_MLP — filters over an MLP interaction scorer.

Parity: recbole/model/fair_recommender/pfcn_mlp.py — score =
MLPLayers([2d] + mlp_hidden + [1]) over concat(user, item) embeddings
(:61-66, :185-187), sigmoid at predict (:169-175), BPR on raw MLP outputs
(:177-193).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import apply_mlp, init_embedding, init_mlp
from .pfcn_base import PFCNBase


class PFCN_MLP(PFCNBase):
    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.dropout = config["dropout"]
        self.mlp_hidden_size_list = list(config["mlp_hidden_size_list"])

    def _scorer_sizes(self):
        return [self.embedding_size * 2] + self.mlp_hidden_size_list + [1]

    def init_params(self, rng):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        params = {
            "user_embedding": init_embedding(r1, self.n_users, self.embedding_size, "normal"),
            "item_embedding": init_embedding(r2, self.n_items, self.embedding_size, "normal"),
            "mlp": init_mlp(r3, self._scorer_sizes(), init_method="torch_linear"),
        }
        adv_params, adv_state = self._init_adversarial(r4)
        params.update(adv_params)
        return params, adv_state

    def _backbone_param_keys(self):
        return ["user_embedding", "item_embedding", "mlp"]

    def _user_item_embed(self, params, state, user, item, sst_list, train, rng,
                         sample_weight=None):
        user_e = self.lookup(params["user_embedding"], user)
        item_e = self.lookup(params["item_embedding"], item) if item is not None else None
        seg = user if (self._ref_bn_emulation and not train) else None
        user_e, state = self._apply_filters(
            params, state, user_e, sst_list, train, rng, sample_weight,
            segments=seg,
        )
        return user_e, item_e, state

    def _mlp_score(self, params, user_e, item_e, train, rng):
        x = jnp.concatenate([user_e, item_e], axis=-1)
        out, _ = apply_mlp(
            params["mlp"], x, activation="relu", dropout=self.dropout, train=train, rng=rng
        )
        return out[:, 0]

    def _pairwise_scores(self, params, state, batch, user, pos_item, neg_item,
                         sst_list, train, rng, sample_weight=None):
        r1, r2, r3 = jax.random.split(rng, 3) if rng is not None else (None, None, None)
        user_e, pos_e, state = self._user_item_embed(
            params, state, user, pos_item, sst_list, train, r1, sample_weight
        )
        neg_e = self.lookup(params["item_embedding"], neg_item)
        pos_s = self._mlp_score(params, user_e, pos_e, train, r2)
        neg_s = self._mlp_score(params, user_e, neg_e, train, r3)
        return pos_s, neg_s, state

    def predict(self, params, state, batch, sst_list=None):
        user_e, item_e, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], batch[self.ITEM_ID], sst_list, False, None
        )
        return jax.nn.sigmoid(self._mlp_score(params, user_e, item_e, False, None))

    def full_sort_predict(self, params, state, batch, sst_list=None):
        """Score every item for each batch user — [B·I] pairs through the MLP.
        (The reference's version repeats by n_users and is broken for partial
        batches, pfcn_mlp.py:213-222; this is the corrected per-batch form.)"""
        user = batch[self.USER_ID]
        user_e, _, _ = self._user_item_embed(params, state, user, None, sst_list, False, None)
        n_items = self.n_items
        u = jnp.repeat(user_e, n_items, axis=0)
        i = jnp.tile(params["item_embedding"], (user_e.shape[0], 1))
        return jax.nn.sigmoid(self._mlp_score(params, u, i, False, None)).reshape(-1)

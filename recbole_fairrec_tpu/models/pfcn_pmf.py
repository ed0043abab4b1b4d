"""PFCN_PMF — counterfactual filters over a plain MF backbone.

Parity: recbole/model/fair_recommender/pfcn_pmf.py — dot-product scores,
sigmoid at predict (:166-175), BPR training (:177-195), filter/discriminator
machinery shared via :class:`PFCNBase`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import init_embedding
from .pfcn_base import PFCNBase


class PFCN_PMF(PFCNBase):
    retrieval_monotone = True  # sigmoid/cosine heads preserve dot-product rank
    def init_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = {
            "user_embedding": init_embedding(r1, self.n_users, self.embedding_size, "normal"),
            "item_embedding": init_embedding(r2, self.n_items, self.embedding_size, "normal"),
        }
        adv_params, adv_state = self._init_adversarial(r3)
        params.update(adv_params)
        return params, adv_state

    def _backbone_param_keys(self):
        return ["user_embedding", "item_embedding"]

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

    def _pairwise_scores(self, params, state, batch, user, pos_item, neg_item,
                         sst_list, train, rng, sample_weight=None):
        user_e, pos_e, state = self._user_item_embed(
            params, state, user, pos_item, sst_list, train, rng, sample_weight
        )
        neg_e = self.lookup(params["item_embedding"], neg_item)
        pos_s = jnp.sum(user_e * pos_e, axis=-1)
        neg_s = jnp.sum(user_e * neg_e, axis=-1)
        return pos_s, neg_s, state

    def predict(self, params, state, batch, sst_list=None):
        user_e, item_e, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], batch[self.ITEM_ID], sst_list, False, None
        )
        return jax.nn.sigmoid(jnp.sum(user_e * item_e, axis=-1))

    def retrieval_embeddings(self, params, state, batch, sst_list=None):
        """(user_repr, item_table) whose dot product ranks identically to
        full_sort_predict (sigmoid is strictly monotone)."""
        user_e, _, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], None, sst_list, False, None
        )
        return user_e, params["item_embedding"]

    def full_sort_predict(self, params, state, batch, sst_list=None):
        user_e, _, _ = self._user_item_embed(
            params, state, batch[self.USER_ID], None, sst_list, False, None
        )
        cd = self.compute_dtype
        scores = jnp.dot(
            user_e.astype(cd), params["item_embedding"].T.astype(cd),
            preferred_element_type=jnp.float32, precision=self.matmul_precision,
        )
        return jax.nn.sigmoid(scores).reshape(-1)

"""PFCN_BiasedMF — filters over MF with user/item/global biases.

Parity: recbole/model/fair_recommender/pfcn_biasedmf.py — score =
u·i + b_u + b_i + b_g, sigmoid head (:168-199, :220-231); global bias starts
at 0.1 (:58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import init_embedding
from .pfcn_base import PFCNBase


class PFCN_BiasedMF(PFCNBase):
    retrieval_monotone = True  # sigmoid/cosine heads preserve dot-product rank
    def init_params(self, rng):
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        params = {
            "user_embedding": init_embedding(r1, self.n_users, self.embedding_size, "normal"),
            "item_embedding": init_embedding(r2, self.n_items, self.embedding_size, "normal"),
            "user_bias": init_embedding(r3, self.n_users, 1, "normal"),
            "item_bias": init_embedding(r4, self.n_items, 1, "normal"),
            "global_bias": jnp.asarray(0.1),
        }
        adv_params, adv_state = self._init_adversarial(r5)
        params.update(adv_params)
        return params, adv_state

    def _backbone_param_keys(self):
        return ["user_embedding", "item_embedding", "user_bias", "item_bias", "global_bias"]

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
        """Reference quirk reproduced (pfcn_biasedmf.py:186-194): the [B] dot
        scores are summed with the [B,1] user/item biases WITHOUT keepdim, so
        the addition broadcasts into a [B,B] matrix — element (i,j) =
        dot(j) + b_u(i) + b_item(i) — and BPR averages over all B² cross
        pairs. PFCNBase.calculate_loss handles the 2-D shape with outer-
        product padding weights, which reduces to the reference's plain mean
        on unpadded batches."""
        user_e, pos_e, state = self._user_item_embed(
            params, state, user, pos_item, sst_list, train, rng, sample_weight
        )
        neg_e = self.lookup(params["item_embedding"], neg_item)
        user_b = params["user_bias"][user]  # [B, 1]
        gb = params["global_bias"]
        pos_dot = jnp.sum(user_e * pos_e, axis=-1)  # [B]
        neg_dot = jnp.sum(user_e * neg_e, axis=-1)
        pos_s = pos_dot[None, :] + user_b + params["item_bias"][pos_item] + gb
        neg_s = neg_dot[None, :] + user_b + params["item_bias"][neg_item] + gb
        return pos_s, neg_s, state

    def predict(self, params, state, batch, sst_list=None):
        user = batch[self.USER_ID]
        item = batch[self.ITEM_ID]
        user_e, item_e, _ = self._user_item_embed(
            params, state, user, item, sst_list, False, None
        )
        score = (
            jnp.sum(user_e * item_e, axis=-1)
            + params["user_bias"][user][:, 0]
            + params["item_bias"][item][:, 0]
            + params["global_bias"]
        )
        return jax.nn.sigmoid(score)

    def retrieval_embeddings(self, params, state, batch, sst_list=None):
        """Bias-augmented retrieval form: user⧺[1] · item⧺[b_i] differs from
        the sigmoid score only by the per-row constant b_u + b_g, so the
        per-user ranking is identical."""
        user = batch[self.USER_ID]
        user_e, _, _ = self._user_item_embed(params, state, user, None, sst_list, False, None)
        ones = jnp.ones((user_e.shape[0], 1), user_e.dtype)
        u = jnp.concatenate([user_e, ones], axis=1)
        t = jnp.concatenate([params["item_embedding"], params["item_bias"]], axis=1)
        return u, t

    def full_sort_predict(self, params, state, batch, sst_list=None):
        user = batch[self.USER_ID]
        user_e, _, _ = self._user_item_embed(params, state, user, None, sst_list, False, None)
        cd = self.compute_dtype
        scores = (
            jnp.dot(user_e.astype(cd), params["item_embedding"].T.astype(cd),
                    preferred_element_type=jnp.float32,
                    precision=self.matmul_precision)
            + params["user_bias"][user]
            + params["item_bias"][:, 0][None, :]
            + params["global_bias"]
        )
        return jax.nn.sigmoid(scores).reshape(-1)

"""FOCF: fairness objectives for collaborative filtering (Yao & Huang, NIPS'17).

Parity: recbole/model/fair_recommender/focf.py — MF backbone with MSE rating
loss (:136-158), five selectable fairness regularizers computed per batch
over item×group mean matrices (:75-134), predictions clamped to
[0, max_rating]/max_rating (:145-150), full-sort = U·Iᵀ (:171-178).

TPU-first redesign: the reference builds the item×group matrices with
``torch.unique`` + ``index_put_(accumulate=True)`` — dynamic shapes. Here the
accumulation is a fixed-shape ``segment_sum`` over ``n_items × n_groups``
segments with a presence mask standing in for the dynamic unique-item list;
the resulting loss value is identical whenever every group appears in the
batch (guaranteed in practice by the item-grouped FOCF dataloader batches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import FairRecommender, batch_weights, wmean
from .layers import init_embedding
from .losses import masked_smooth_l1_loss, smooth_l1_loss
from ..utils import InputType


class FOCF(FairRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.RATING = config["RATING_FIELD"]
        self.SST_FIELD = config["sst_attr_list"][0]
        self.fair_weight = config["fair_weight"]
        self.max_rating = float(jnp.asarray(dataset.inter_feat[self.RATING]).max())
        self.fair_objective = (config["fair_objective"] or "none").strip().lower()
        if self.fair_objective not in ("none", "value", "absolute", "under", "over", "nonparity"):
            raise ValueError(
                "you must set config['fair_objective'] be one of (none,"
                "value,absolute,under,over,nonparity)"
            )
        self.sst_lut, self.n_groups = self._sst_code_map(dataset, self.SST_FIELD)

    # ------------------------------------------------------------------ init

    def init_params(self, rng):
        r1, r2 = jax.random.split(rng)
        params = {
            "user_embedding": init_embedding(r1, self.n_users, self.embedding_size),
            "item_embedding": init_embedding(r2, self.n_items, self.embedding_size),
        }
        return params, {}

    # --------------------------------------------------------------- forward

    def forward(self, params, user, item):
        user_e = self.lookup(params["user_embedding"], user)
        item_e = self.lookup(params["item_embedding"], item)
        pred = jnp.sum(user_e * item_e, axis=-1)
        return pred, user_e, item_e

    def _item_group_means(self, params, pred_scores, batch, w):
        """Per-(item, group) mean predicted and true scores plus an
        item-presence mask (reference get_item_ratings, :75-91). Padding rows
        (w == 0) contribute nothing to any segment."""
        items = batch[self.ITEM_ID]
        sst_col = self.sst_lut[batch[self.SST_FIELD].astype(jnp.int32)]
        seg = items * self.n_groups + sst_col
        n_seg = self.n_items * self.n_groups
        pred_sum = jax.ops.segment_sum(pred_scores * w, seg, num_segments=n_seg)
        true_sum = jax.ops.segment_sum(batch[self.RATING] * w, seg, num_segments=n_seg)
        cnt = jax.ops.segment_sum(w, seg, num_segments=n_seg)
        pred_sum = pred_sum.reshape(self.n_items, self.n_groups)
        true_sum = true_sum.reshape(self.n_items, self.n_groups)
        cnt = cnt.reshape(self.n_items, self.n_groups) + 1e-5
        present = (cnt.sum(axis=1) > 1.0).astype(pred_sum.dtype)  # any real row
        return pred_sum / cnt, true_sum / cnt, present

    def _fair_loss(self, params, pred_scores, batch, w):
        obj = self.fair_objective
        if obj == "nonparity":
            sst_col = self.sst_lut[batch[self.SST_FIELD].astype(jnp.int32)]
            mask0 = (sst_col == 0).astype(pred_scores.dtype) * w
            mask1 = (sst_col == 1).astype(pred_scores.dtype) * w
            avg0 = jnp.sum(pred_scores * mask0) / jnp.maximum(mask0.sum(), 1.0)
            avg1 = jnp.sum(pred_scores * mask1) / jnp.maximum(mask1.sum(), 1.0)
            return smooth_l1_loss(avg0, avg1)

        avg_pred, avg_true, present = self._item_group_means(params, pred_scores, batch, w)
        if obj == "value":
            diff = avg_pred - avg_true
        elif obj == "absolute":
            diff = jnp.abs(avg_pred - avg_true)
        elif obj == "under":
            diff = jnp.maximum(avg_true - avg_pred, 0.0)
        elif obj == "over":
            diff = jnp.maximum(avg_pred - avg_true, 0.0)
        else:
            return 0.0
        gap = jnp.abs(diff[:, 0] - diff[:, 1])
        return masked_smooth_l1_loss(gap, jnp.zeros_like(gap), present)

    # ------------------------------------------------------------------ API

    def loss_batch_fields(self, loss_name, sst_list=None):
        return (self.USER_ID, self.ITEM_ID, self.RATING, self.SST_FIELD,
                "__weight__")

    def calculate_loss(self, params, state, batch, rng=None, sst_list=None):
        users = batch[self.USER_ID]
        items = batch[self.ITEM_ID]
        ratings = batch[self.RATING]
        pred_scores, _, _ = self.forward(params, users, items)
        w = batch_weights(batch, pred_scores)
        rating_loss = wmean((pred_scores - ratings) ** 2, w)
        if self.fair_objective != "none":
            loss = rating_loss + self.fair_weight * self._fair_loss(params, pred_scores, batch, w)
        else:
            loss = rating_loss
        return loss, state

    def predict(self, params, state, batch, sst_list=None):
        pred, _, _ = self.forward(params, batch[self.USER_ID], batch[self.ITEM_ID])
        return jnp.clip(pred, 0.0, self.max_rating) / self.max_rating

    def full_sort_predict(self, params, state, batch, sst_list=None):
        cd = self.compute_dtype
        user_e = params["user_embedding"][batch[self.USER_ID]].astype(cd)
        scores = jnp.dot(
            user_e, params["item_embedding"].T.astype(cd),
            preferred_element_type=jnp.float32, precision=self.matmul_precision,
        )
        return jnp.clip(scores, 0.0, self.max_rating).reshape(-1) / self.max_rating

"""NFCF: neural fair collaborative filtering (Islam et al., WWW'21).

Parity: recbole/model/fair_recommender/nfcf.py — NCF-style scorer
(concat embeddings → MLP → sigmoid, BCE :69-74, :99-110); two-stage flow:

* pretrain (``load_pretrain_path`` unset): plain NCF training;
* debiased finetune (:49-67): load the pretrained checkpoint, compute the
  gender bias direction mean(g1) − mean(g2) over user embeddings, **project
  it out of every user embedding**, freeze user embeddings, re-init item
  embeddings; loss gains ``fair_weight ×`` the differential-fairness penalty
  (:76-97): per-item Dirichlet-smoothed mean positive score per group,
  ε = mean max |log p_i − log p_j|.

TPU-first: the penalty's ``torch.unique`` accumulation becomes a fixed-shape
``segment_sum`` over n_items × n_groups with an item-presence mask; the
frozen user table is expressed as an optax mask (``frozen_param_keys``).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import InputType
from .base import FairRecommender, batch_weights, wmean
from .layers import apply_mlp, init_embedding, init_mlp
from .losses import bce_elementwise


class NFCF(FairRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.LABEL = config["LABEL_FIELD"]
        self.embedding_size = config["embedding_size"]
        self.mlp_hidden_size = list(config["mlp_hidden_size"])
        self.dropout = config["dropout"]
        self.sst_attr = config["sst_attr_list"][0]
        self.fair_weight = config["fair_weight"]
        self.load_pretrain_path = config["load_pretrain_path"]
        self.sst_lut, self.n_groups = self._sst_code_map(dataset, self.sst_attr)
        self._user_feature = dataset.get_user_feature()

    def _mlp_sizes(self):
        return [2 * self.embedding_size] + self.mlp_hidden_size + [1]

    def init_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = {
            "user_embedding": init_embedding(r1, self.n_users, self.embedding_size, "normal"),
            "item_embedding": init_embedding(r2, self.n_items, self.embedding_size, "normal"),
            "mlp": init_mlp(r3, self._mlp_sizes(), init_method="torch_linear"),
        }
        if self.load_pretrain_path is not None:
            params = self._debias_from_pretrain(params, r2)
        return params, {}

    def _debias_from_pretrain(self, params, item_rng):
        """Load NCF weights, remove the gender direction from user embeddings,
        re-init item embeddings (reference reset_params, :49-67)."""
        with open(self.load_pretrain_path, "rb") as f:
            checkpoint = pickle.load(f)
        loaded = checkpoint["params"]
        for key in params:
            if key in loaded:
                params[key] = jax.tree_util.tree_map(jnp.asarray, loaded[key])

        sst_value = np.asarray(self._user_feature[self.sst_attr])[1:]
        sst_unique = np.unique(sst_value)
        g1 = sst_value == sst_unique[0]
        g2 = sst_value == sst_unique[1]

        user_table = np.asarray(params["user_embedding"])[1:].copy()
        e1 = user_table[g1].mean(axis=0)
        e2 = user_table[g2].mean(axis=0)
        bias_dir = (e1 - e2) / np.linalg.norm(e1 - e2)
        proj = (user_table @ bias_dir)[:, None] * bias_dir[None, :]
        user_table = user_table - proj

        new_user = np.asarray(params["user_embedding"]).copy()
        new_user[1:] = user_table
        params["user_embedding"] = jnp.asarray(new_user)
        params["item_embedding"] = init_embedding(
            item_rng, self.n_items, self.embedding_size, "normal"
        )
        return params

    def frozen_param_keys(self):
        return ["user_embedding"] if self.load_pretrain_path is not None else []

    # --------------------------------------------------------------- forward

    def forward(self, params, user, item, train=False, rng=None):
        u = self.lookup(params["user_embedding"], user)
        i = self.lookup(params["item_embedding"], item)
        out, _ = apply_mlp(
            params["mlp"], jnp.concatenate([u, i], axis=-1),
            activation="relu", dropout=self.dropout, train=train, rng=rng,
        )
        return jax.nn.sigmoid(out[:, 0])

    def _differential_fairness(self, batch, score, w):
        """ε-DF penalty over positive rows (reference :76-97), fixed-shape."""
        label = batch[self.LABEL]
        pos_w = w * (label == 1)
        items = batch[self.ITEM_ID]
        sst_col = self.sst_lut[batch[self.sst_attr].astype(jnp.int32)]
        seg = items * self.n_groups + sst_col
        n_seg = self.n_items * self.n_groups
        score_sum = jax.ops.segment_sum(score * pos_w, seg, num_segments=n_seg)
        counts = jax.ops.segment_sum(pos_w, seg, num_segments=n_seg)
        score_sum = score_sum.reshape(self.n_items, self.n_groups)
        counts = counts.reshape(self.n_items, self.n_groups)
        present = (counts.sum(axis=1) > 0).astype(score.dtype)
        n_unique = jnp.maximum(present.sum(), 1.0)

        concentration = 1.0
        alpha = concentration / n_unique
        smoothed = (score_sum + alpha) / (counts + concentration)
        log_p = jnp.log(smoothed)
        eps = jnp.zeros(self.n_items, dtype=score.dtype)
        for i in range(self.n_groups):
            for j in range(i + 1, self.n_groups):
                eps = jnp.maximum(eps, jnp.abs(log_p[:, i] - log_p[:, j]))
        return jnp.sum(eps * present) / n_unique

    # ------------------------------------------------------------------- API

    def loss_batch_fields(self, loss_name, sst_list=None):
        return (self.USER_ID, self.ITEM_ID, self.LABEL, self.sst_attr,
                "__weight__")

    def calculate_loss(self, params, state, batch, rng=None, sst_list=None):
        user = batch[self.USER_ID]
        item = batch[self.ITEM_ID]
        label = batch[self.LABEL]
        output = self.forward(params, user, item, train=True, rng=rng)
        w = batch_weights(batch, output)
        # torch BCELoss value+gradient semantics (saturation-safe); see
        # losses.bce_elementwise
        rec_loss = wmean(bce_elementwise(output, label), w)
        if self.load_pretrain_path is None:
            return rec_loss, state
        fair_loss = self._differential_fairness(batch, output, w)
        return rec_loss + self.fair_weight * fair_loss, state

    def predict(self, params, state, batch, sst_list=None):
        return self.forward(params, batch[self.USER_ID], batch[self.ITEM_ID])

    def full_sort_predict(self, params, state, batch, sst_list=None):
        """Batch users × all items through the MLP (the reference lacks this
        and falls back to repeat-predict, trainer.py:425-433 — same math)."""
        user = batch[self.USER_ID]
        u = params["user_embedding"][user]
        n_items = self.n_items
        uu = jnp.repeat(u, n_items, axis=0)
        ii = jnp.tile(params["item_embedding"], (u.shape[0], 1))
        out, _ = apply_mlp(
            params["mlp"], jnp.concatenate([uu, ii], axis=-1), activation="relu"
        )
        return jax.nn.sigmoid(out[:, 0]).reshape(-1)

"""Shared machinery of the PFCN family (counterfactual filter networks).

Parity: the four reference models pfcn_{mlp,biasedmf,dmf,pmf}.py share this
structure verbatim —

* filter modes (pfcn_mlp.py:68-83): ``cm`` = one filter per attribute
  (outputs summed then divided by the TOTAL filter count, :158-165), ``sm`` =
  one filter per attribute-subset indexed by Σ 2^i (:74-78, :152-157),
  ``none`` = raw embeddings;
* filter MLP shape [d, 2d, d] with BatchNorm + normal(0, .01) init
  (:105-120);
* per-attribute discriminator MLPs [d] + dis_hidden + [1 | n_classes] with
  sigmoid+BCE for binary attrs and CE for multiclass (:122-143, :195-211);
* adversarial loss = backbone_loss − dis_weight · dis_loss (:189-192);
* ``get_sst_embed`` export of filtered user embeddings (:224-232).

sst subsets arrive as **static tuples**, so jit specializes one executable per
subset; group labels are mapped through a precomputed LUT (dynamic
``torch.unique`` is not jittable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import InputType
from .base import FairRecommender, batch_weights, wmean
from .layers import apply_mlp, init_embedding, init_mlp, init_mlp_state
from .losses import bce_elementwise, bpr_loss


def _weighted_bce(probs, targets, w):
    # torch nn.BCELoss value AND gradient semantics (saturation-safe both
    # ways) — see losses.bce_elementwise
    elem = bce_elementwise(probs, targets)
    return wmean(elem.reshape(elem.shape[0], -1).mean(axis=-1), w)


def _weighted_ce(logits, labels, w):
    logp = jax.nn.log_softmax(logits, axis=-1)
    elem = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
    return wmean(elem, w)


class PFCNBase(FairRecommender):
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.sst_attrs = list(config["sst_attr_list"])
        self.filter_mode = config["filter_mode"].lower()
        if self.filter_mode not in ("cm", "sm", "none"):
            raise AssertionError("filter_mode must be cm, sm or none")
        self.filter_num, self.sst_dict = self._get_filter_info()
        # Reference-defect emulation: eval-time filter BN on per-user batch
        # statistics (static model config — part of every jit cache key via
        # the method closures)
        self._ref_bn_emulation = bool(config["reference_bn_eval_emulation"])
        if self.filter_mode != "none":
            self.dis_drop_out = config["dis_dropout"]
            self.dis_weight = config["dis_weight"]
            self.dis_hidden_size_list = list(config["dis_hidden_size_list"])
        self.activation = config["activation"]

        # group LUT + cardinality per attribute (reference _get_sst_size)
        self.sst_lut = {}
        self.sst_size = {}
        for sst in self.sst_attrs:
            lut, k = self._sst_code_map(dataset, sst)
            self.sst_lut[sst] = lut
            self.sst_size[sst] = k

    # ------------------------------------------------------------ structure

    def _get_filter_info(self):
        if self.filter_mode == "cm":
            return len(self.sst_attrs), {s: i + 1 for i, s in enumerate(self.sst_attrs)}
        if self.filter_mode == "sm":
            return 2 ** len(self.sst_attrs) - 1, {
                s: 2**i for i, s in enumerate(self.sst_attrs)
            }
        return 0, {}

    def _filter_sizes(self):
        d = self.embedding_size
        return [d, 2 * d, d]

    def _dis_sizes(self, sst):
        out = self.sst_size[sst]
        if out == 2:
            out = 1
        return [self.embedding_size] + self.dis_hidden_size_list + [out]

    def _dis_activation(self):
        return self.activation

    def _init_adversarial(self, rng):
        """(filters, discriminators) params + states."""
        params, state = {}, {}
        if self.filter_mode == "none":
            return params, state
        rngs = jax.random.split(rng, self.filter_num + len(self.sst_attrs))
        params["filters"] = {}
        state["filters"] = {}
        for i in range(self.filter_num):
            key = f"f{i + 1}"
            params["filters"][key] = init_mlp(
                rngs[i], self._filter_sizes(), init_method="norm", bn=True
            )
            state["filters"][key] = init_mlp_state(self._filter_sizes(), bn=True)
        params["discriminators"] = {}
        state["discriminators"] = {}
        for j, sst in enumerate(self.sst_attrs):
            sizes = self._dis_sizes(sst)
            params["discriminators"][sst] = init_mlp(
                rngs[self.filter_num + j], sizes, init_method="norm", bn=True
            )
            state["discriminators"][sst] = init_mlp_state(sizes, bn=True)
        return params, state

    # -------------------------------------------------------------- filters

    def _apply_filters(self, params, state, user_embed, sst_list, train, rng,
                       sample_weight=None, segments=None):
        """Filtered user embedding per filter_mode; returns (embed, state').

        ``segments`` (eval-only; row→user ids) switches the filter BN to
        per-user-batch statistics — the reference-defect emulation mode
        (``reference_bn_eval_emulation``): the reference's filters are
        unregistered submodules whose BN runs on batch statistics forever
        (pfcn_mlp.py:104-120 + trainer.py:965-1106's one-user eval
        batches), annihilating the user representation at eval. See
        PARITY_RUNS.md §Adjudications."""
        new_state = dict(state)
        if self.filter_mode == "none" or not sst_list:
            return user_embed, new_state
        bn_kw = {}
        if segments is not None and not train:
            bn_kw = {"bn_segments": segments.astype(jnp.int32),
                     "bn_num_segments": self.n_users}
        filt_state = dict(state.get("filters", {}))
        if self.filter_mode == "sm":
            idx = sum(self.sst_dict[s] for s in sst_list)
            key = f"f{idx}"
            out, st = apply_mlp(
                params["filters"][key], user_embed,
                activation=self.activation, state=filt_state[key],
                train=train, rng=rng, sample_weight=sample_weight, **bn_kw,
            )
            filt_state[key] = st
        else:  # cm: average over selected filters, divide by TOTAL count
            out = None
            for s in sst_list:
                key = f"f{self.sst_dict[s]}"
                o, st = apply_mlp(
                    params["filters"][key], user_embed,
                    activation=self.activation, state=filt_state[key],
                    train=train, rng=rng, sample_weight=sample_weight, **bn_kw,
                )
                filt_state[key] = st
                out = o if out is None else out + o
            out = out / self.filter_num
        new_state["filters"] = filt_state
        return out, new_state

    # ------------------------------------------------------- discriminators

    def _dis_loss(self, params, state, user_embed, batch, sst_list, train, rng, w):
        """Σ over attrs of the discriminator objective (reference :195-211)."""
        new_state = dict(state)
        dis_state = dict(state.get("discriminators", {}))
        total = 0.0
        rngs = jax.random.split(rng, len(sst_list)) if rng is not None else [None] * len(sst_list)
        for r, sst in zip(rngs, sst_list):
            labels = self.sst_lut[sst][batch[sst].astype(jnp.int32)]
            out, st = apply_mlp(
                params["discriminators"][sst], user_embed,
                activation=self._dis_activation(), dropout=self.dis_drop_out,
                state=dis_state[sst], train=train, rng=r, sample_weight=w,
            )
            dis_state[sst] = st
            if self.sst_size[sst] == 2:
                probs = jax.nn.sigmoid(out)
                total = total + _weighted_bce(probs, labels.astype(jnp.float32)[:, None], w)
            else:
                total = total + _weighted_ce(out, labels, w)
        new_state["discriminators"] = dis_state
        return total, new_state

    # ----------------------------------------------------- model API pieces

    def _user_item_embed(self, params, state, user, item, sst_list, train, rng,
                         sample_weight=None):
        """Backbone-specific: returns (user_repr, item_repr, state')."""
        raise NotImplementedError

    def _pairwise_scores(self, params, state, batch, user, pos_item, neg_item,
                         sst_list, train, rng, sample_weight=None):
        """Backbone-specific raw (pos_score, neg_score, state') for BPR."""
        raise NotImplementedError

    def loss_batch_fields(self, loss_name, sst_list=None):
        return (self.USER_ID, self.ITEM_ID, self.POS_ITEM_ID, self.NEG_ITEM_ID,
                *self.sst_attrs, "__weight__")

    def calculate_loss(self, params, state, batch, rng=None, sst_list=None):
        user = batch[self.USER_ID]
        pos_item = batch[self.POS_ITEM_ID]
        neg_item = batch[self.NEG_ITEM_ID]
        r1, r2, r3 = (
            jax.random.split(rng, 3) if rng is not None else (None, None, None)
        )
        w = batch_weights(batch, user.astype(jnp.float32))
        pos_s, neg_s, state = self._pairwise_scores(
            params, state, batch, user, pos_item, neg_item, sst_list, True, r1,
            sample_weight=w,
        )
        elem = -jnp.log(1e-10 + jax.nn.sigmoid(pos_s - neg_s))
        if elem.ndim == 2:
            # [B,B] cross-pair scores (PFCN_BiasedMF broadcast quirk):
            # weight each pair by w_i·w_j so padded rows/cols drop out
            w2 = w[:, None] * w[None, :]
            loss = jnp.sum(elem * w2) / jnp.maximum(jnp.sum(w2), 1.0)
        else:
            loss = wmean(elem, w)
        if self.filter_mode != "none":
            dis, state = self._dis_from_batch(params, state, batch, sst_list, True, r2, w)
            return loss - self.dis_weight * dis, state
        return loss, state

    def calculate_dis_loss(self, params, state, batch, rng=None, sst_list=None):
        user = batch[self.USER_ID]
        w = batch_weights(batch, user.astype(jnp.float32))
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
        user_repr, _, state = self._user_item_embed(
            params, state, user, None, sst_list, True, r1, sample_weight=w
        )
        loss, state = self._dis_loss(params, state, user_repr, batch, sst_list, True, r2, w)
        return loss, state

    def _dis_from_batch(self, params, state, batch, sst_list, train, rng, w):
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
        user_repr, _, state = self._user_item_embed(
            params, state, batch[self.USER_ID], None, sst_list, train, r1,
            sample_weight=w,
        )
        return self._dis_loss(params, state, user_repr, batch, sst_list, train, r2, w)

    def get_sst_embed(self, params, state, user_data, sst_list=None):
        user_indices = jnp.arange(1, self.n_users)
        sst_list = tuple(self.sst_attrs) if self.filter_mode == "none" else sst_list
        ret = {}
        for sst in sst_list:
            ret[sst] = np.asarray(user_data[sst])[np.asarray(user_indices) - 1]
        user_repr, _, _ = self._user_item_embed(
            params, state, user_indices, None, sst_list, False, None
        )
        ret["embedding"] = user_repr
        return ret

    def param_groups(self):
        """Reference trainers (trainer.py:1189-1236): optimizer_filter covers
        the backbone + filters; optimizer_dis covers discriminators only."""
        if self.filter_mode == "none":
            return {}
        return {
            "filter": [k for k in self._backbone_param_keys()] + ["filters"],
            "dis": ["discriminators"],
        }

    def _backbone_param_keys(self):
        raise NotImplementedError

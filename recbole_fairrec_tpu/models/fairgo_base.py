"""Shared FairGo machinery (Wu et al., WWW'21 — graph-based fair embeddings).

Parity with recbole/model/fair_recommender/fairgo_pmf.py / fairgo_gcn.py:

* two-stage ``train_stage`` flag: pretrain trains the backbone; finetune
  passes the FULL (U+I) embedding table through per-attribute filter MLPs
  (averaged over ALL filters, :159-171) before scoring;
* ``calculate_dis_loss`` (:190-236): propagate filtered embeddings
  ``n_layers`` hops through the row-normalized bipartite rating matrix,
  aggregate per ``aggr_method`` — WAP (mean of hops), LBA (learned MLP over
  concatenated hops), LVA (per-hop, ``vs_weights``-weighted) — then attack
  BOTH the node embedding and the graph-local embedding with per-attribute
  discriminators (BCE / CE);
* model loss = MSE − fair_weight · dis_loss (:184-187);
* predictions clamped to [0, max_rating]/max_rating (:238-257).

The reference quirk of wrapping the multiclass local discriminator logits in
a sigmoid (:232-234) is reproduced for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmm import build_bipartite_norm_coo, coo_to_dense, propagate
from ..utils import InputType
from .base import FairRecommender, batch_weights, wmean
from .layers import apply_linear, apply_mlp, init_embedding, init_linear, init_mlp
from .pfcn_base import _weighted_bce, _weighted_ce


class FairGoBase(FairRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.RATING = config["RATING_FIELD"]
        self.n_layers = config["n_layers"]
        self.act = config["activation"]
        self.embedding_size = config["embedding_size"]
        self.dis_hidden_size_list = list(config["dis_hidden_size_list"])
        self.filter_hidden_size_list = list(config["filter_hidden_size_list"])
        self.sst_attrs = list(config["sst_attr_list"])
        self.fair_weight = config["fair_weight"]
        self.load_pretrain_weight = config["load_pretrain_weight"]
        self.train_stage = None  # set by FairGoTrainer
        self._consts_cache = None
        self.aggr_method = config["aggr_method"].upper()
        if config["vs_weights"] is not None:
            vs = np.asarray(config["vs_weights"], dtype=np.float32)
            self.vs_weights = jnp.asarray(vs / vs.sum())
            if self.aggr_method == "LVA":
                assert self.n_layers == len(vs), "n_layers should be equal to length of vs_weights"

        self.max_rating = float(np.asarray(dataset.inter_feat[self.RATING]).max())
        self.rating_matrix = dataset.inter_matrix(form="coo", value_field=self.RATING).astype(
            np.float32
        )
        self._preload = None
        if self.load_pretrain_weight:
            self._preload = (
                dataset.get_preload_weight("uid"),
                dataset.get_preload_weight("iid"),
            )

        self.sst_lut = {}
        self.sst_size = {}
        for sst in self.sst_attrs:
            lut, k = self._sst_code_map(dataset, sst)
            self.sst_lut[sst] = lut
            self.sst_size[sst] = k

        # D⁻¹A propagation matrix (static COO arrays)
        self.norm_rows, self.norm_cols, self.norm_vals = build_bipartite_norm_coo(
            self.rating_matrix, self.n_users, self.n_items
        )
        # Dense-propagation gate: auto-enable while the [n, n] f32 matrix
        # stays under ~2 GB (ml-1M: 374 MB). The matrix lives in MODEL
        # STATE so it reaches jitted losses as a traced argument (see
        # ops/spmm.propagate); checkpoints store state without it.
        n_nodes = self.n_users + self.n_items
        cfg_dense = config["dense_propagation"]
        self.dense_propagation = bool(
            n_nodes * n_nodes * 4 <= (2 << 30) if cfg_dense is None else cfg_dense
        )
        # bf16 propagation operand (f32 accumulation): ~3× the f32 matmul
        # rate on the MXU and half the operator's HBM footprint. The filter
        # pass backprops through n_layers dense [n, n] matmuls per step —
        # the framework's one genuinely compute-bound path (measured r5:
        # 3.0 s/epoch at f32, ~38% of the f32 matmul peak). Opt-in: the
        # normalized adjacency entries are O(1e-2) row-normalized weights,
        # so bf16 perturbs propagated embeddings at
        # ≲1e-2 norm-relative — fine for adversarial training, off for parity.
        self.propagation_dtype = (
            jnp.bfloat16
            if (config["propagation_dtype"] or "float32") == "bfloat16"
            else jnp.float32
        )

    # ---------------------------------------------------------------- params

    def _filter_sizes(self):
        d = self.embedding_size
        return [d] + self.filter_hidden_size_list + [d]

    def _dis_sizes(self, sst):
        out = self.sst_size[sst]
        if out == 2:
            out = 1
        return [self.embedding_size] + self.dis_hidden_size_list + [out]

    def init_params(self, rng):
        keys = jax.random.split(rng, 4 + 2 * len(self.sst_attrs))
        params = {
            "user_embedding": init_embedding(
                keys[0], self.n_users, self.embedding_size, "normal", padding_idx=0
            ),
            "item_embedding": init_embedding(
                keys[1], self.n_items, self.embedding_size, "normal", padding_idx=0
            ),
        }
        if self._preload is not None:
            user_emb, item_emb = self._preload
            params["user_embedding"] = jnp.asarray(user_emb, dtype=jnp.float32)
            params["item_embedding"] = jnp.asarray(item_emb, dtype=jnp.float32)
        params["filters"] = {
            sst: init_mlp(k, self._filter_sizes(), init_method="torch_linear")
            for sst, k in zip(self.sst_attrs, keys[2 : 2 + len(self.sst_attrs)])
        }
        params["discriminators"] = {
            sst: init_mlp(k, self._dis_sizes(sst), init_method="torch_linear")
            for sst, k in zip(
                self.sst_attrs, keys[2 + len(self.sst_attrs) : 2 + 2 * len(self.sst_attrs)]
            )
        }
        # LBA aggregation head: Linear(L·d → d) → act → Linear(d → d) → act →
        # Linear(d → d)  (reference :66-70)
        d = self.embedding_size
        r1, r2, r3 = jax.random.split(keys[-1], 3)
        params["aggr"] = {
            "l1": init_linear(r1, self.n_layers * d, d, "torch_linear"),
            "l2": init_linear(r2, d, d, "torch_linear"),
            "l3": init_linear(r3, d, d, "torch_linear"),
        }
        params.update(self._extra_params(keys[-2]))
        return params, self.attach_state_constants({})

    def _extra_params(self, rng):
        return {}

    _STATE_CONSTANT_KEYS = ("prop_dense", "gcn_dense")

    def _state_constants(self):
        if self.dense_propagation:
            n = self.n_users + self.n_items
            return {
                "prop_dense": jnp.asarray(
                    coo_to_dense(self.norm_rows, self.norm_cols, self.norm_vals, n),
                    dtype=self.propagation_dtype,
                )
            }
        return {}

    def attach_state_constants(self, state):
        """Merge the derived propagation constants into a state pytree
        (at init and after checkpoint load; checkpoints store state
        without them)."""
        if self._consts_cache is None:
            self._consts_cache = self._state_constants()
        return {**self._consts_cache, **state}

    def strip_state_constants(self, state):
        return {k: v for k, v in state.items()
                if k not in self._STATE_CONSTANT_KEYS}

    def param_groups(self):
        """Reference FairGo_*Trainer (:837-862): pretrain = backbone;
        filter = filters; dis = discriminators (+aggr under LBA)."""
        groups = {
            "pretrain": self._backbone_param_keys(),
            "filter": ["filters"],
            "dis": ["discriminators"]
            + (["aggr"] if self.aggr_method == "LBA" else []),
        }
        return groups

    def _backbone_param_keys(self):
        return ["user_embedding", "item_embedding"]

    # --------------------------------------------------------------- forward

    def _ego_embeddings(self, params, state, train, rng):
        """Backbone representation of all U+I nodes (stage-aware)."""
        return jnp.concatenate(
            [params["user_embedding"], params["item_embedding"]], axis=0
        )

    def forward(self, params, state, sst_list=None, train=False, rng=None):
        all_embedding = self._ego_embeddings(params, state, train, rng)
        if self.train_stage == "finetune":
            if not sst_list:
                sst_list = tuple(self.sst_attrs)
            temp = None
            for sst in sst_list:
                out, _ = apply_mlp(
                    params["filters"][sst], all_embedding, activation=self.act
                )
                temp = out if temp is None else temp + out
            all_embedding = temp / len(self.sst_attrs)
        return all_embedding[: self.n_users], all_embedding[self.n_users :]

    def _aggr(self, params, hops):
        x = jnp.concatenate(hops, axis=1)
        from .layers import apply_activation

        x = apply_activation(self.act, apply_linear(params["aggr"]["l1"], x))
        x = apply_activation(self.act, apply_linear(params["aggr"]["l2"], x))
        return apply_linear(params["aggr"]["l3"], x)

    # ------------------------------------------------------------------ loss

    def loss_batch_fields(self, loss_name, sst_list=None):
        return (self.USER_ID, self.ITEM_ID, self.RATING, *self.sst_attrs,
                "__weight__")

    def calculate_loss(self, params, state, batch, rng=None, sst_list=None):
        user = batch[self.USER_ID]
        item = batch[self.ITEM_ID]
        rating = batch[self.RATING]
        user_all, item_all = self.forward(params, state, sst_list, True, rng)
        pred = jnp.sum(user_all[user] * item_all[item], axis=-1)
        w = batch_weights(batch, pred)
        mse = wmean((pred - rating) ** 2, w)
        if self.train_stage == "finetune":
            dis, state = self.calculate_dis_loss(params, state, batch, rng, sst_list)
            return mse - self.fair_weight * dis, state
        return mse, state

    def calculate_dis_loss(self, params, state, batch, rng=None, sst_list=None):
        user = batch[self.USER_ID]
        if not sst_list:
            sst_list = tuple(self.sst_attrs)
        user_all, item_all = self.forward(params, state, sst_list, True, rng)
        user_node = user_all[user]
        w = batch_weights(batch, user_node[:, 0])

        all_emb = jnp.concatenate([user_all, item_all], axis=0)
        dense = state.get("prop_dense") if isinstance(state, dict) else None
        hops = []
        x = all_emb
        for _ in range(self.n_layers):
            x = propagate(
                x, self.norm_rows, self.norm_cols, self.norm_vals,
                self.n_users + self.n_items, dense=dense,
            )
            hops.append(x)

        lva_mode = self.aggr_method == "LVA" and self.n_layers > 1
        if self.n_layers == 1:
            user_local = hops[0][: self.n_users][user]
        elif self.aggr_method == "WAP":
            user_local = jnp.mean(jnp.stack(hops, axis=1), axis=1)[: self.n_users][user]
        elif self.aggr_method == "LBA":
            user_local = self._aggr(params, hops)[: self.n_users][user]
        elif lva_mode:
            lva_locals = [h[: self.n_users][user] for h in hops]
        else:
            raise ValueError(f"aggr_method [{self.aggr_method}] not supported")

        node_loss = 0.0
        local_loss = 0.0
        for sst in sst_list:
            labels = self.sst_lut[sst][batch[sst].astype(jnp.int32)]
            dis_params = params["discriminators"][sst]

            def dis_out(x):
                out, _ = apply_mlp(dis_params, x, activation=self.act)
                return out

            if self.sst_size[sst] == 2:
                t = labels.astype(jnp.float32)[:, None]
                node_loss = node_loss + _weighted_bce(jax.nn.sigmoid(dis_out(user_node)), t, w)
                if lva_mode:
                    for i in range(self.n_layers):
                        local_loss = local_loss + self.vs_weights[i] * _weighted_bce(
                            jax.nn.sigmoid(dis_out(lva_locals[i])), t, w
                        )
                else:
                    local_loss = local_loss + _weighted_bce(
                        jax.nn.sigmoid(dis_out(user_local)), t, w
                    )
            else:
                node_loss = node_loss + _weighted_ce(dis_out(user_node), labels, w)
                if lva_mode:
                    for i in range(self.n_layers):
                        # reference wraps these logits in sigmoid (:232) — kept
                        local_loss = local_loss + self.vs_weights[i] * _weighted_ce(
                            jax.nn.sigmoid(dis_out(lva_locals[i])), labels, w
                        )
                else:
                    local_loss = local_loss + _weighted_ce(
                        jax.nn.sigmoid(dis_out(user_local)), labels, w
                    )
        return node_loss + local_loss, state

    # ------------------------------------------------------------------- API

    def predict(self, params, state, batch, sst_list=None):
        user_all, item_all = self.forward(params, state, tuple(self.sst_attrs))
        scores = jnp.sum(
            user_all[batch[self.USER_ID]] * item_all[batch[self.ITEM_ID]], axis=-1
        )
        return jnp.clip(scores.reshape(-1), 0.0, self.max_rating) / self.max_rating

    def full_sort_predict(self, params, state, batch, sst_list=None):
        user_all, item_all = self.forward(params, state, tuple(self.sst_attrs))
        cd = self.compute_dtype
        scores = jnp.dot(
            user_all[batch[self.USER_ID]].astype(cd), item_all.T.astype(cd),
            preferred_element_type=jnp.float32, precision=self.matmul_precision,
        )
        return jnp.clip(scores.reshape(-1), 0.0, self.max_rating) / self.max_rating

    def get_sst_embed(self, params, state, user_data, sst_list=None):
        user_indices = np.arange(1, self.n_users)
        sst_list = tuple(self.sst_attrs) if sst_list is None else tuple(sst_list)
        ret = {}
        for sst in sst_list:
            ret[sst] = np.asarray(user_data[sst])[user_indices - 1]
        user_all, _ = self.forward(params, state, sst_list)
        ret["embedding"] = user_all[user_indices]
        return ret

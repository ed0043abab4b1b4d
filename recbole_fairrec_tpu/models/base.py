"""Model base classes.

Parity: recbole/model/abstract_recommender.py — ``FairRecommender`` fixes the
USER_ID/ITEM_ID/NEG_ITEM_ID fields, n_users/n_items, and the
calculate_loss / predict / full_sort_predict contract (:86-104, :23-75).

TPU-first redesign: models are **stateless descriptors**. Hyperparameters and
dataset statistics are bound at construction (static, hashable by jit);
learnable parameters live in an external pytree created by
:meth:`init_params` and threaded through the pure methods:

    params, state = model.init_params(rng)
    (loss, new_state) = model.calculate_loss(params, state, batch, rng, sst_list)
    scores = model.predict(params, state, batch, sst_list)
    scores = model.full_sort_predict(params, state, batch, sst_list)

``state`` carries non-gradient buffers (BatchNorm running stats). ``batch``
is a dict of jnp arrays. ``sst_list`` is a static tuple of attribute names —
jit caches one executable per distinct subset, mirroring the reference's
per-epoch sst masking without host round-trips inside the step.

``param_groups()`` maps adversarial group names ('filter', 'dis', ...) to
top-level param-tree keys, which the trainers turn into group-restricted
optimizers — optax.multi_transform with set_to_zero() off-group (the
analogue of the reference's per-optimizer param lists, trainer.py:1189-1236).
"""

from __future__ import annotations

from logging import getLogger

import jax.numpy as jnp
import numpy as np

from ..utils import InputType, ModelType, set_color


def batch_weights(batch, like):
    """Per-row validity weights: 1.0 for real rows, 0.0 for the padding rows
    the trainer appends to reach a bucketed static batch shape. ``like`` is
    any [B]-shaped array providing shape/dtype."""
    w = batch.get("__weight__")
    if w is None:
        return jnp.ones_like(like, dtype=jnp.float32)
    return w.astype(jnp.float32)


def wmean(values, weights):
    """Weighted mean that reduces exactly to .mean() when all weights are 1 —
    keeps padded-batch losses identical to the reference's unpadded math."""
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)


class AbstractRecommender:
    type = ModelType.GENERAL
    input_type = InputType.POINTWISE
    # Declared contract for retrieval-form eval (streaming / distributed
    # top-k): True iff the model exposes ``retrieval_embeddings`` AND its
    # full-sort score is a rank-preserving (monotone) transform of the
    # retrieval dot product. The trainer refuses the retrieval eval paths
    # unless this is declared, so a future non-monotone head can never
    # silently produce wrong rankings (VERDICT r2 item 8).
    retrieval_monotone = False

    def __init__(self):
        self.logger = getLogger()
        self.other_parameter_name = []

    # ---------------------------------------------------------- contract

    def init_params(self, rng):
        """Returns (params, state) pytrees."""
        raise NotImplementedError

    def calculate_loss(self, params, state, batch, rng=None, sst_list=None):
        raise NotImplementedError

    def predict(self, params, state, batch, sst_list=None):
        raise NotImplementedError

    def full_sort_predict(self, params, state, batch, sst_list=None):
        raise NotImplementedError

    def param_groups(self):
        """Adversarial optimizer groups: mapping group → list of top-level
        param keys. Default: everything in one group."""
        return {}

    # ------------------------------------------------------------- extras

    def other_parameter(self):
        return {key: getattr(self, key) for key in self.other_parameter_name}

    def load_other_parameter(self, para):
        if para is None:
            return
        for key, value in para.items():
            setattr(self, key, value)

    def count_parameters(self, params):
        import jax

        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

    def __str__(self):
        return set_color(self.__class__.__name__, "blue")


class FairRecommender(AbstractRecommender):
    """Base for fairness-aware models (reference :86-104)."""

    type = ModelType.GENERAL

    def __init__(self, config, dataset):
        super().__init__()
        self.USER_ID = config["USER_ID_FIELD"]
        self.ITEM_ID = config["ITEM_ID_FIELD"]
        self.NEG_ITEM_ID = config["NEG_PREFIX"] + self.ITEM_ID
        self.POS_ITEM_ID = self.ITEM_ID
        self.n_users = dataset.num(self.USER_ID)
        self.n_items = dataset.num(self.ITEM_ID)
        self.config = config
        # bf16 matmuls on the MXU (params stay f32; accumulation f32)
        self.compute_dtype = (
            jnp.bfloat16 if (config["compute_dtype"] == "bfloat16") else jnp.float32
        )
        # float32 means float32: the TPU MXU's DEFAULT matmul precision drops
        # f32 inputs to one bf16 pass (~1e-2 rel error — enough to reorder
        # full-sort rankings vs the torch reference). compute_dtype='bfloat16'
        # opts into the fast path explicitly; otherwise request exact f32.
        self.matmul_precision = (
            None if self.compute_dtype == jnp.bfloat16 else "highest"
        )

    def calculate_dis_loss(self, params, state, batch, rng=None, sst_list=None):
        """Discriminator objective for adversarial models."""
        raise NotImplementedError

    def loss_batch_fields(self, loss_name, sst_list=None):
        """Batch keys the given loss reads — lets the trainer stage only
        those lanes (host→device bytes dominate epoch wall time over the
        TPU tunnel). None = ship every field. A wrong declaration surfaces
        as a trace-time KeyError, which the trainer catches and retries
        with full staging — declarations are an optimization, never a
        correctness dependency."""
        return None

    # Derived device-resident constants carried in MODEL STATE (e.g.
    # FairGo's dense propagation matrix): attach merges them in at init /
    # checkpoint load; strip removes them before serialization. Base
    # models carry none.
    def attach_state_constants(self, state):
        return state

    def strip_state_constants(self, state):
        return state

    def lookup(self, table, ids):
        """Embedding-table row lookup.

        Default: plain indexing — under a mesh the table carries a
        row-sharded NamedSharding and XLA inserts the gather collectives
        (parallel/embedding.py:sharded_gather). With
        config['embedding_exchange'] == 'allgather' and a model axis present,
        the explicit pull-style shard_map exchange is used instead
        (bucket_allgather_lookup): ids ride the ICI, partial lookups psum.
        The trainer sets ``runtime_mesh`` when mesh_shape is configured.
        """
        mesh = getattr(self, "runtime_mesh", None)
        if (
            mesh is not None
            and self.config["embedding_exchange"] == "allgather"
            and mesh.shape.get("model", 1) > 1
            and table.ndim == 2
            and table.shape[0] % mesh.shape["model"] == 0
        ):
            from ..parallel.embedding import bucket_allgather_lookup

            return bucket_allgather_lookup(mesh, table, ids)
        return table[ids]

    def get_sst_embed(self, params, state, user_data, sst_list=None):
        """Export filtered user embeddings + attributes for offline attacker
        evaluation (reference pfcn_mlp.py:224-232)."""
        raise NotImplementedError

    # ------------------------------------------------------------ helpers

    @staticmethod
    def _sst_code_map(dataset, sst_field):
        """Global value→column mapping for a sensitive attribute.

        The reference derives group columns per batch via
        ``torch.unique(..., return_inverse=True)`` (focf.py:77); under jit
        that is a dynamic shape, so the mapping is precomputed globally over
        the user table: sorted non-PAD values → 0..k-1. Equivalent whenever a
        batch contains every group (the per-batch and global sorted orders
        then coincide).
        """
        feat = dataset.get_user_feature()
        if sst_field not in feat:
            # reference error contract (fairgo_pmf.py:96-98 and siblings)
            raise ValueError(
                f"{sst_field} sensitive attribute not in user feature"
            )
        values = np.asarray(feat[sst_field])[1:]  # drop PAD row
        uniq = np.unique(values)
        lut = np.zeros(int(max(uniq.max(), 0)) + 1, dtype=np.int32)
        for i, v in enumerate(uniq):
            lut[int(v)] = i
        return jnp.asarray(lut), len(uniq)

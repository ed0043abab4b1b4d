"""Base Trainer: jitted train step, early stopping, checkpoints, eval driver.

Parity: recbole/trainer/trainer.py — the epoch loop (fit :332-418), optimizer
zoo (:114-153), NaN check (:286-288), checkpoint payload (:221-240), resume
(:258-284), full-sort eval with PAD/history −inf masking (:420-439), sampled
eval scattered into a |U|×|I| −inf matrix (:441-456), split-predict fallback
(:517-531), and sst-embedding export (:242-256).

TPU-first redesign:
* the entire optimizer.zero_grad → loss.backward → step sequence is ONE
  jitted function (`value_and_grad` + optax) — no per-op dispatch, params
  stay resident in HBM across the epoch;
* losses are selected by static name and sst subset, so each (loss, subset)
  pair compiles once and is cached;
* ragged tail batches are padded up to bucketed static shapes with a
  ``__weight__`` row mask so XLA never sees a new shape (models compute
  weighted means, reproducing unpadded math exactly);
* optimizers are optax chains; torch-style weight decay (grad += wd·param
  before the Adam moments) is ``optax.add_decayed_weights`` ahead of the
  scaler.
"""

from __future__ import annotations

import itertools
import os
import pickle
from logging import getLogger
from time import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataloader import FullSortEvalDataLoader
from ..data.interaction import Interaction
from ..evaluator import Collector, Evaluator
from ..utils import (
    EvaluatorType,
    calculate_valid_score,
    dict2str,
    early_stopping,
    ensure_dir,
    get_local_time,
    set_color,
)
from ..utils.loggers import WandbLogger, get_tensorboard

NEG_INF = -np.inf


def restrict_tx(inner, group_keys):
    """Optimizer applying ``inner`` to the given top-level param keys and
    ZEROING every other update. optax.masked alone is wrong here: it passes
    unmasked leaves' updates (i.e. raw gradients) through UNCHANGED, and
    apply_updates would then add +grad to every out-of-group param — a
    full-lr gradient-ASCENT kick per step on params the reference's
    per-optimizer groups never touch. Shared by the adversarial trainers
    and the multichip dryrun (ADVICE r3)."""
    group_keys = set(group_keys)

    def label(params):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "on" if k in group_keys else "off", v
            )
            for k, v in params.items()
        }

    return optax.multi_transform(
        {"on": inner, "off": optax.set_to_zero()}, label
    )


def _flatten_result(result):
    flat = {}
    for k, v in (result or {}).items():
        if isinstance(v, dict):
            flat.update({f"{k}/{kk}": vv for kk, vv in v.items()})
        else:
            flat[k] = v
    return flat


def _bucket(n, quantum=256):
    """Round a batch size up to a shape bucket to bound recompilation."""
    return int(-(-n // quantum) * quantum)


class AbstractTrainer:
    def __init__(self, config, model):
        self.config = config
        self.model = model

    def fit(self, train_data):
        raise NotImplementedError("Method [next] should be implemented.")

    def evaluate(self, eval_data):
        raise NotImplementedError("Method [next] should be implemented.")


class Trainer(AbstractTrainer):
    _ckpt_counter = itertools.count()

    def __init__(self, config, model):
        super().__init__(config, model)
        self.logger = getLogger()
        self.tensorboard = get_tensorboard(self.logger)
        self.wandblogger = WandbLogger(config)
        self.learner = config["learner"]
        self.learning_rate = config["learning_rate"]
        self.epochs = config["epochs"]
        self.eval_step = min(config["eval_step"], self.epochs)
        self.stopping_step = config["stopping_step"]
        self.clip_grad_norm = config["clip_grad_norm"]
        self.valid_metric = config["valid_metric"].lower()
        self.valid_metric_bigger = config["valid_metric_bigger"]
        self.test_batch_size = config["eval_batch_size"]
        self.checkpoint_dir = config["checkpoint_dir"]
        ensure_dir(self.checkpoint_dir)
        # pid + process-local counter uniquify the name: the reference's
        # second-granularity timestamp collides for trainers created within
        # one second (e.g. pretrain→finetune handoffs, test suites)
        saved_model_file = (
            f'{self.config["model"]}-{get_local_time()}'
            f"-{os.getpid()}-{next(self._ckpt_counter)}.pth"
        )
        self.saved_model_file = os.path.join(self.checkpoint_dir, saved_model_file)
        self.weight_decay = config["weight_decay"] or 0.0

        self.start_epoch = 0
        self.cur_step = 0
        self.best_valid_score = -np.inf if self.valid_metric_bigger else np.inf
        self.best_valid_result = None
        self.train_loss_dict = {}

        # parameter + optimizer state
        seed = config["seed"] or 0
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params, self.model_state = model.init_params(init_rng)
        self.optimizer = self._build_optimizer()
        self.opt_state = self.optimizer.init(self.params)

        self.eval_type = config["eval_type"]
        self.eval_collector = Collector(config)
        self.evaluator = Evaluator(config)
        self.item_tensor = None
        self.tot_item_num = None

        self._update_cache = {}
        self._eval_fn_cache = {}
        # (loss, sst, tag) triples that must stage EVERY batch field — set
        # when a model's loss_batch_fields declaration under-declares and
        # the filtered trace KeyErrors (see _run_epoch)
        self._stage_full = set()

        # Optional multi-chip execution: config['mesh_shape'] = [data, model]
        # activates declarative sharding — embedding tables row-sharded over
        # 'model', batches over 'data', gradients psum'd by XLA. No reference
        # counterpart (single-GPU there); see parallel/mesh.py.
        self.mesh = None
        self._param_shardings = None
        if config["mesh_shape"]:
            from ..parallel import make_mesh, param_sharding

            self.mesh = make_mesh(tuple(config["mesh_shape"]))
            self._param_shardings = param_sharding(self.mesh, self.params)
            self.params = jax.tree_util.tree_map(
                jax.device_put, self.params, self._param_shardings
            )
            # models route embedding lookups through the explicit exchange
            # when config['embedding_exchange'] == 'allgather'
            self.model.runtime_mesh = self.mesh
            self.logger.info(f"sharded execution over mesh {dict(self.mesh.shape)}")

    # ------------------------------------------------------------ optimizer

    def _make_tx(self, learner=None, learning_rate=None, weight_decay=None):
        learner = (learner or self.learner).lower()
        lr = self.learning_rate if learning_rate is None else learning_rate
        wd = self.weight_decay if weight_decay is None else weight_decay

        if self.config["reg_weight"] and wd and wd * self.config["reg_weight"] > 0:
            self.logger.warning(
                "The parameters [weight_decay] and [reg_weight] are specified "
                "simultaneously, which may lead to double regularization."
            )

        steps = []
        if self.clip_grad_norm:
            steps.append(optax.clip_by_global_norm(self.clip_grad_norm.get("max_norm", 1.0)))
        if learner == "adam":
            if wd:
                steps.append(optax.add_decayed_weights(wd))
            steps += [optax.scale_by_adam(eps=1e-8), optax.scale(-lr)]
        elif learner == "sgd":
            if wd:
                steps.append(optax.add_decayed_weights(wd))
            steps.append(optax.scale(-lr))
        elif learner == "adagrad":
            if wd:
                steps.append(optax.add_decayed_weights(wd))
            steps += [optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10), optax.scale(-lr)]
        elif learner == "rmsprop":
            if wd:
                steps.append(optax.add_decayed_weights(wd))
            steps += [optax.scale_by_rms(decay=0.99, eps=1e-8), optax.scale(-lr)]
        elif learner == "sparse_adam":
            steps += [optax.scale_by_adam(eps=1e-8), optax.scale(-lr)]
            if wd > 0:
                self.logger.warning("Sparse Adam cannot argument received argument [weight_decay]")
        else:
            self.logger.warning("Received unrecognized optimizer, set default Adam optimizer")
            steps += [optax.scale_by_adam(eps=1e-8), optax.scale(-lr)]
        return optax.chain(*steps)

    def _build_optimizer(self, **kwargs):
        tx = self._make_tx(
            learner=kwargs.get("learner"),
            learning_rate=kwargs.get("learning_rate"),
            weight_decay=kwargs.get("weight_decay"),
        )
        # models may freeze param subtrees (NFCF's debiased user embeddings —
        # reference nfcf.py:66 sets requires_grad=False)
        frozen = getattr(self.model, "frozen_param_keys", lambda: [])()
        if frozen:
            tx = self._restrict_tx(
                tx, [k for k in self.params.keys() if k not in frozen]
            )
        return tx

    def _restrict_tx(self, inner, group_keys):
        return restrict_tx(inner, group_keys)

    def _masked_tx(self, group_keys, **kwargs):
        """Optimizer updating ONLY the given top-level param keys — the optax
        rendering of the reference's per-optimizer param lists."""
        return self._restrict_tx(self._build_optimizer(**kwargs), group_keys)

    # ------------------------------------------------------------ jit steps

    def _make_step(self, loss_name, sst_list, tx):
        """One SGD step as a pure function (shared by the single-dispatch and
        scan-macro-batched executables).

        When device negative sampling is active and the batch does not
        already carry negatives, they are drawn in-step; the scan executable
        instead pre-draws the whole chunk's negatives in one vmapped op (see
        :meth:`_get_scan_update_fn`) and ships batches WITH negatives, which
        this step detects at trace time.
        """
        model = self.model
        loss_method = getattr(model, loss_name)
        used_keys = getattr(self, "_device_used_keys", None)
        inject_negs = (
            used_keys is not None
            and loss_name == "calculate_loss"
            and hasattr(model, "NEG_ITEM_ID")
        )
        if inject_negs:
            from ..ops.neg_sampling import sample_negatives

            uid_field, neg_field = model.USER_ID, model.NEG_ITEM_ID
            n_items = model.n_items

        def step(params, model_state, opt_state, rng, batch):
            if inject_negs and neg_field not in batch:
                rng, neg_rng = jax.random.split(rng)
                negs = sample_negatives(
                    neg_rng, batch[uid_field], used_keys, n_items, num_neg=1
                )
                batch = {**batch, neg_field: negs.astype(jnp.int32)}

            def loss_fn(p):
                loss, new_state = loss_method(p, model_state, batch, rng=rng, sst_list=sst_list)
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return loss, new_params, new_state, new_opt_state

        return step

    def _get_update_fn(self, loss_name, sst_list, tx_tag="main"):
        # train_stage is static model state baked into traces (FairGo's
        # pretrain/finetune switch) — it must key the cache
        key = (loss_name, sst_list, tx_tag, getattr(self.model, "train_stage", None))
        if key in self._update_cache:
            return self._update_cache[key]
        step = self._make_step(loss_name, sst_list, self._tx_by_tag(tx_tag))
        compiled = jax.jit(step, donate_argnums=(0, 2))
        self._update_cache[key] = compiled
        return compiled

    def _get_scan_update_fn(self, loss_name, sst_list, tx_tag, n_steps):
        """``n_steps`` sequential SGD steps fused into ONE device dispatch via
        lax.scan — the exact same per-batch update sequence as n_steps calls
        of the single-step executable, minus n_steps−1 host↔device round
        trips. Built for the TPU-tunnel regime where per-dispatch latency
        (~ms) dwarfs the per-batch compute (~µs)."""
        key = ("scan", loss_name, sst_list, tx_tag, n_steps,
               getattr(self.model, "train_stage", None))
        if key in self._update_cache:
            return self._update_cache[key]
        step = self._make_step(loss_name, sst_list, self._tx_by_tag(tx_tag))
        model = self.model
        used_keys = getattr(self, "_device_used_keys", None)
        hoist_negs = (
            used_keys is not None
            and loss_name == "calculate_loss"
            and hasattr(model, "NEG_ITEM_ID")
        )
        if hoist_negs:
            from ..ops.neg_sampling import sample_negatives

            uid_field, neg_field = model.USER_ID, model.NEG_ITEM_ID
            n_items = model.n_items

        def update(params, model_state, opt_state, rng, stacked):
            # the per-step key chain lives INSIDE the executable: splitting
            # is deterministic, so this reproduces the host loop's sequential
            # jax.random.split(self.rng) bit-for-bit while costing zero
            # host↔device round trips (each host-side split is a ~10 ms
            # device op over the TPU tunnel — 409/epoch was the entire
            # round-2 epoch budget)
            def split_body(k, _):
                k, s = jax.random.split(k)
                return k, s

            rng, step_keys = jax.lax.scan(
                split_body, rng, None, length=n_steps
            )
            if hoist_negs:
                # draw the WHOLE chunk's negatives in one vmapped op before
                # the scan: the 16-round rejection searchsorted then runs on
                # [n_steps * B] lanes at once instead of [B]-sized gathers
                # buried in the scan body (which dominated the epoch: ~5.6 ms
                # of serial small-gather work per 0.06 ms step). Keys mirror
                # the in-step path exactly: step_key -> (loss_rng, neg_rng).
                pairs = jax.vmap(jax.random.split)(step_keys)
                loss_keys, neg_keys = pairs[:, 0], pairs[:, 1]
                negs = jax.vmap(
                    lambda k, u: sample_negatives(k, u, used_keys, n_items, num_neg=1)
                )(neg_keys, stacked[uid_field])
                stacked = {**stacked, neg_field: negs.astype(jnp.int32)}
            else:
                loss_keys = step_keys

            def body(carry, xs):
                params, model_state, opt_state = carry
                step_rng, batch = xs
                loss, params, model_state, opt_state = step(
                    params, model_state, opt_state, step_rng, batch
                )
                return (params, model_state, opt_state), loss

            (params, model_state, opt_state), losses = jax.lax.scan(
                body, (params, model_state, opt_state), (loss_keys, stacked)
            )
            return jnp.sum(losses), params, model_state, opt_state, rng

        compiled = jax.jit(update, donate_argnums=(0, 2))
        self._update_cache[key] = compiled
        return compiled

    # -------------------------------------------------- resident epochs

    def _resident_epoch_ok(self, train_data, loss_name, sst_list, tx_tag):
        """Epoch-resident mode (``device_epoch_shuffle``): the train table
        lives in HBM and each epoch pass is ONE dispatch — device-side
        shuffle, in-scan gathers and negative draws, zero per-epoch
        host→device batch traffic. Covers every (loss, sst-subset,
        optimizer) pass whose loader ships raw interaction rows — i.e. the
        pairwise loaders under device_neg_sampling (the pointwise loaders
        do host-side label expansion / item grouping, which the resident
        table does not reproduce). Opt-in because the shuffle runs on the
        device RNG (threefry) instead of the host numpy stream, so example
        order diverges from the reference's np.random.shuffle (same
        distribution, different draws — trajectory-parity surfaces keep it
        off)."""
        return (
            bool(self.config["device_epoch_shuffle"])
            and getattr(train_data, "device_neg_sampling", False)
            and hasattr(self.model, "NEG_ITEM_ID")
            and self.model.loss_batch_fields(loss_name, sst_list) is not None
        )

    def _resident_tables(self, train_data, fields):
        ds = train_data.dataset
        n = len(ds.inter_feat)
        batch = train_data.batch_size
        n_steps = -(-n // batch)
        n_pad = n_steps * batch
        key = (id(ds), tuple(sorted(fields)), n_pad)
        if getattr(self, "_resident_key", None) != key:
            joined = ds[0 : n]  # user/item features joined onto the rows
            tables = {}
            for f in fields:
                arr = np.asarray(joined[f])
                if arr.dtype == np.int64:
                    arr = arr.astype(np.int32)
                elif arr.dtype == np.float64:
                    arr = arr.astype(np.float32)
                pad = np.zeros(n_pad - n, dtype=arr.dtype)
                tables[f] = jnp.asarray(np.concatenate([arr, pad]))
            w = np.zeros(n_pad, dtype=np.float32)
            w[:n] = 1.0
            tables["__weight__"] = jnp.asarray(w)
            self._resident_key = key
            self._resident_cache = (tables, n_steps, batch, n_pad)
        return self._resident_cache

    def _get_resident_epoch_fn(self, loss_name, sst_list, tx_tag,
                               n_steps, batch_size, n_pad):
        key = ("resident", loss_name, sst_list, tx_tag, n_steps, batch_size,
               n_pad, getattr(self.model, "train_stage", None))
        if key in self._update_cache:
            return self._update_cache[key]
        from ..ops.neg_sampling import sample_negatives

        step = self._make_step(loss_name, sst_list, self._tx_by_tag(tx_tag))
        model = self.model
        used_keys = self._device_used_keys
        uid_field, neg_field = model.USER_ID, model.NEG_ITEM_ID
        n_items = model.n_items
        # only the rec losses read negatives; discriminator passes don't
        need_negs = loss_name == "calculate_loss"

        def epoch(params, model_state, opt_state, rng, tables):
            rng, perm_rng = jax.random.split(rng)
            perm = jax.random.permutation(perm_rng, n_pad).reshape(
                n_steps, batch_size
            )
            stacked = {k: v[perm] for k, v in tables.items()}

            def split_body(k, _):
                k, s = jax.random.split(k)
                return k, s

            rng, step_keys = jax.lax.scan(split_body, rng, None, length=n_steps)
            if need_negs:
                # same key discipline as the staged scan path: step_key ->
                # (loss_rng, neg_rng), negatives pre-drawn for the whole pass
                pairs = jax.vmap(jax.random.split)(step_keys)
                loss_keys, neg_keys = pairs[:, 0], pairs[:, 1]
                negs = jax.vmap(
                    lambda k, u: sample_negatives(k, u, used_keys, n_items, num_neg=1)
                )(neg_keys, stacked[uid_field])
                stacked = {**stacked, neg_field: negs.astype(jnp.int32)}
            else:
                loss_keys = step_keys

            def body(carry, xs):
                params, model_state, opt_state = carry
                step_rng, batch = xs
                loss, params, model_state, opt_state = step(
                    params, model_state, opt_state, step_rng, batch
                )
                return (params, model_state, opt_state), loss

            (params, model_state, opt_state), losses = jax.lax.scan(
                body, (params, model_state, opt_state), (loss_keys, stacked)
            )
            return jnp.sum(losses), params, model_state, opt_state, rng

        compiled = jax.jit(epoch, donate_argnums=(0, 2))
        self._update_cache[key] = compiled
        return compiled

    def _run_epoch_resident(self, train_data, loss_name="calculate_loss",
                            sst_list=None, tx_tag="main"):
        fields = set(self.model.loss_batch_fields(loss_name, sst_list))
        fields.discard(self.model.NEG_ITEM_ID)  # drawn on device
        fields.discard("__weight__")  # added by _resident_tables
        tables, n_steps, batch, n_pad = self._resident_tables(train_data, fields)
        epoch_fn = self._get_resident_epoch_fn(
            loss_name, sst_list, tx_tag, n_steps, batch, n_pad
        )
        loss, self.params, self.model_state, new_opt, self.rng = epoch_fn(
            self.params, self.model_state, self._opt_state_by_tag(tx_tag),
            self.rng, tables,
        )
        self._set_opt_state_by_tag(tx_tag, new_opt)
        total = float(loss)
        self._check_nan(total)
        return total

    def _tx_by_tag(self, tag):
        return self.optimizer

    def _opt_state_by_tag(self, tag):
        return self.opt_state

    def _set_opt_state_by_tag(self, tag, value):
        self.opt_state = value

    # ------------------------------------------------------------- batching

    _EXCLUDE_FIELDS = ()

    def _to_batch(self, interaction: Interaction, pad_to=None, force_weight=False):
        """Interaction → dict of arrays, optionally padded to a static shape
        with a ``__weight__`` validity mask. ``force_weight`` emits the mask
        even for full batches so macro-chunks have a uniform key set."""
        n = len(interaction)
        target = pad_to or n
        batch = {}
        for key, value in interaction.interaction.items():
            arr = np.asarray(value)
            # jax (no-x64) canonicalizes int64→int32 / float64→float32 at
            # device_put anyway; casting host-side halves the staged bytes
            # (wire bytes bound epoch time over the tunnel) at identical
            # device semantics
            if arr.dtype == np.int64:
                arr = arr.astype(np.int32)
            elif arr.dtype == np.float64:
                arr = arr.astype(np.float32)
            if target > n:
                pad_width = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
                arr = np.pad(arr, pad_width, mode="edge")
            batch[key] = arr
        if target > n or force_weight:
            w = np.zeros(target, dtype=np.float32)
            w[:n] = 1.0
            batch["__weight__"] = w
        return batch

    def _put_batch(self, batch, stacked=False):
        """Host batch dict → device. Under a mesh, rows are sharded over the
        'data' axis (axis 1 of a [macro, rows, ...] scan stack, axis 0 of a
        single batch) when they divide evenly, else replicated."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_size = self.mesh.shape["data"]
        row_axis = 1 if stacked else 0
        out = {}
        for k, v in batch.items():
            if v.shape[row_axis] % data_size == 0:
                spec = [None] * v.ndim
                spec[row_axis] = "data"
                spec = P(*spec)
            else:
                spec = P()
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    # ------------------------------------------------------------ training

    def _maybe_enable_device_sampling(self, train_data):
        """Precompute the sorted (uid, iid) key table for in-step negative
        sampling when the loader runs in device_neg_sampling mode."""
        if not getattr(train_data, "device_neg_sampling", False):
            return
        if getattr(self, "_device_used_keys", None) is not None:
            return
        from ..ops.neg_sampling import build_used_table

        ds = train_data.dataset
        self._device_used_keys = build_used_table(
            np.asarray(ds.inter_feat[ds.uid_field]),
            np.asarray(ds.inter_feat[ds.iid_field]),
            ds.user_num,
            ds.item_num,
        )
        self.logger.info("on-device negative sampling enabled")

    def _run_epoch(self, train_data, loss_name="calculate_loss", sst_list=None, tx_tag="main"):
        """One pass over the loader with the given static (loss, subset,
        optimizer) selection — each distinct triple is its own compiled
        executable.

        Consecutive same-shape batches are fused into one lax.scan dispatch
        (identical update sequence, far fewer host↔device round trips).
        ``train_macro_steps: auto`` (default) stages the WHOLE epoch as a
        single dispatch, bounded by the ``train_macro_rows`` row budget; the
        pass is split into near-equal chunks so at most two distinct scan
        lengths ever compile. Odd-shaped tails go through the single-step
        executable unchanged.
        """
        total_loss = None
        self._maybe_enable_device_sampling(train_data)
        if self._resident_epoch_ok(train_data, loss_name, sst_list, tx_tag):
            return self._run_epoch_resident(train_data, loss_name, sst_list, tx_tag)
        canonical = getattr(train_data, "max_batch_rows", None) or train_data.batch_size
        canonical = _bucket(canonical)
        macro = self._macro_steps(len(train_data), canonical)

        # Stage only the lanes this loss reads (host→device bytes dominate
        # epoch time over the tunnel). A wrong declaration KeyErrors at
        # trace time and we retry once with full staging for this triple.
        filter_key = (loss_name, sst_list, tx_tag)
        loss_fields = (
            None if filter_key in self._stage_full
            else self.model.loss_batch_fields(loss_name, sst_list)
        )
        # Snapshot RNG state for the KeyError full-staging retry below: by
        # the time the filtered trace fails, the loader has consumed the
        # numpy stream (negative draws) and run_single split self.rng, so a
        # retry without restore would not be bit-identical to a clean
        # full-staged epoch (ADVICE r4).
        if loss_fields is not None:
            np_rng_snapshot = np.random.get_state()
            jax_rng_snapshot = self.rng

        def _staged(batch):
            if loss_fields is None:
                return batch
            return {k: v for k, v in batch.items()
                    if k in loss_fields or k == "__weight__"}

        def run_single(batch):
            nonlocal total_loss
            self.rng, step_rng = jax.random.split(self.rng)
            update = self._get_update_fn(loss_name, sst_list, tx_tag)
            loss, self.params, self.model_state, new_opt = update(
                self.params, self.model_state, self._opt_state_by_tag(tx_tag),
                step_rng, self._put_batch(_staged(batch)),
            )
            self._set_opt_state_by_tag(tx_tag, new_opt)
            # accumulate on device — a float() here would force a round-trip
            # per step and serialize the dispatch pipeline
            total_loss = loss if total_loss is None else total_loss + loss

        def run_chunk(chunk):
            nonlocal total_loss
            if len(chunk) == 1:
                return run_single(chunk[0])
            stacked = self._put_batch(
                {k: np.stack([b[k] for b in chunk]) for k in _staged(chunk[0])},
                stacked=True,
            )
            # step keys are derived inside the scan by the SAME sequential
            # split chain as the per-step path, so macro batching is
            # bit-identical to running the single update len(chunk) times
            update = self._get_scan_update_fn(loss_name, sst_list, tx_tag, len(chunk))
            loss, self.params, self.model_state, new_opt, self.rng = update(
                self.params, self.model_state, self._opt_state_by_tag(tx_tag),
                self.rng, stacked,
            )
            self._set_opt_state_by_tag(tx_tag, new_opt)
            total_loss = loss if total_loss is None else total_loss + loss

        pending = []
        try:
            for batch_idx, interaction in enumerate(train_data):
                n = len(interaction)
                pad_to = canonical if n <= canonical else _bucket(n)
                # macro mode always carries __weight__ so every batch in a
                # chunk has the same key set (1.0 weights are the identity)
                batch = self._to_batch(
                    interaction, pad_to=pad_to, force_weight=macro > 1
                )
                if macro <= 1:
                    run_single(batch)
                    continue
                if pending and pad_to != pending[0]["__weight__"].shape[0]:
                    run_chunk(pending)
                    pending = []
                pending.append(batch)
                if len(pending) == macro:
                    run_chunk(pending)
                    pending = []
            if pending:
                run_chunk(pending)
        except KeyError as err:
            if loss_fields is None:
                raise
            # under-declared loss_batch_fields: the error fires at trace
            # time of the FIRST update (no optimizer step has applied);
            # restoring the RNG snapshots makes the full-staging retry
            # bit-identical to a clean full-staged epoch
            self.logger.warning(
                f"loss_batch_fields for {filter_key} missed {err}; "
                "restaging epoch with all fields"
            )
            self._stage_full.add(filter_key)
            np.random.set_state(np_rng_snapshot)
            self.rng = jax_rng_snapshot
            # the aborted iteration may have left the cursor at pr_end
            # without the StopIteration that resets it — the retry would
            # then see an empty loader and return None
            train_data.pr = 0
            if getattr(train_data, "shuffle", False):
                # the aborted pass already shuffled the dataset IN PLACE; a
                # second shuffle would compose two permutations and diverge
                # from a clean run's order. Replay the stream the shuffle
                # consumed (Interaction.shuffle = one np.random.permutation)
                # and skip the retry's re-shuffle, so both the row order
                # AND the negative-draw stream equal a clean epoch's.
                np.random.permutation(len(train_data.dataset.inter_feat))
                train_data._skip_next_shuffle = True
            return self._run_epoch(train_data, loss_name, sst_list, tx_tag)
        if total_loss is None:
            return None
        total = float(total_loss)  # single sync per epoch
        self._check_nan(total)
        return total

    def _macro_steps(self, n_batches, rows_per_batch):
        """Batches fused per lax.scan dispatch. 'auto' (default) stages the
        whole pass as one dispatch, bounded by the ``train_macro_rows``
        host→device staging budget; the pass is then split into near-equal
        chunks so at most two distinct scan lengths compile (cold compiles
        cost minutes over the TPU tunnel — ADVICE r2)."""
        if n_batches <= 0:
            return 1
        cfg = self.config["train_macro_steps"]
        if cfg in (None, "auto"):
            budget_rows = int(self.config["train_macro_rows"] or 4_194_304)
            macro_max = max(1, budget_rows // max(rows_per_batch, 1))
        else:
            macro_max = max(1, int(cfg))
        n_chunks = -(-n_batches // macro_max)
        return -(-n_batches // n_chunks)

    def _train_epoch(self, train_data, epoch_idx, loss_func=None, show_progress=False):
        return self._run_epoch(train_data, loss_name=loss_func or "calculate_loss")

    def _check_nan(self, loss):
        if np.isnan(loss):
            raise ValueError("Training loss is nan")

    def _generate_train_loss_output(self, epoch_idx, s_time, e_time, losses):
        des = self.config["loss_decimal_place"] or 4
        output = (
            set_color(f"epoch {epoch_idx} training", "green")
            + " ["
            + set_color("time", "blue")
            + f": {e_time - s_time:.2f}s, "
        )
        if isinstance(losses, tuple):
            output += ", ".join(
                set_color(f"train_loss{i + 1}", "blue") + f": {loss:.{des}f}"
                for i, loss in enumerate(losses)
            )
        else:
            output += set_color("train loss", "blue") + f": {losses:.{des}f}"
        return output + "]"

    def _add_train_loss_to_tensorboard(self, epoch_idx, losses, tag="Loss/Train"):
        if isinstance(losses, tuple):
            for idx, loss in enumerate(losses):
                self.tensorboard.add_scalar(tag + str(idx), loss, epoch_idx)
        else:
            self.tensorboard.add_scalar(tag, losses, epoch_idx)

    def _add_hparam_to_tensorboard(self, best_valid_result):
        hparam_dict = {
            "learner": self.config["learner"],
            "learning_rate": self.config["learning_rate"],
            "train_batch_size": self.config["train_batch_size"],
        }
        for k in list(hparam_dict):
            if hparam_dict[k] is not None and not isinstance(hparam_dict[k], (bool, str, float, int)):
                hparam_dict[k] = str(hparam_dict[k])
        try:
            self.tensorboard.add_hparams(hparam_dict, {"hparam/best_valid_result": best_valid_result})
        except Exception:
            pass

    def _valid_epoch(self, valid_data, show_progress=False):
        valid_result = self.evaluate(valid_data, load_best_model=False, show_progress=show_progress)
        valid_score = calculate_valid_score(valid_result, self.valid_metric)
        return valid_score, valid_result

    # ---------------------------------------------------------- checkpoints

    def _checkpoint_payload(self, epoch):
        cfg = dict(self.config.final_config_dict)
        cfg.pop("device", None)  # live jax Device handle; re-derived on load
        return {
            "config": cfg,
            "epoch": epoch,
            "cur_step": self.cur_step,
            "best_valid_score": self.best_valid_score,
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "model_state": jax.tree_util.tree_map(
                np.asarray, self.model.strip_state_constants(self.model_state)
            ),
            "other_parameter": self.model.other_parameter(),
            "optimizer": jax.tree_util.tree_map(np.asarray, self.opt_state),
        }

    def _save_checkpoint(self, epoch, verbose=True, **kwargs):
        saved_model_file = kwargs.pop("saved_model_file", self.saved_model_file)
        with open(saved_model_file, "wb") as f:
            pickle.dump(self._checkpoint_payload(epoch), f)
        if verbose:
            self.logger.info(set_color("Saving current", "blue") + f": {saved_model_file}")

    def _load_params_from_checkpoint(self, checkpoint):
        self.params = jax.tree_util.tree_map(jnp.asarray, checkpoint["params"])
        self.model_state = self.model.attach_state_constants(
            jax.tree_util.tree_map(jnp.asarray, checkpoint.get("model_state", {}))
        )
        self.model.load_other_parameter(checkpoint.get("other_parameter"))

    def resume_checkpoint(self, resume_file):
        resume_file = str(resume_file)
        self.saved_model_file = resume_file
        with open(resume_file, "rb") as f:
            checkpoint = pickle.load(f)
        self.start_epoch = checkpoint["epoch"] + 1
        self.cur_step = checkpoint["cur_step"]
        self.best_valid_score = checkpoint["best_valid_score"]
        if checkpoint["config"]["model"].lower() != self.config["model"].lower():
            self.logger.warning(
                "Architecture configuration given in config file is different from "
                "that of checkpoint. This may yield an exception while state_dict is "
                "being loaded."
            )
        self._load_params_from_checkpoint(checkpoint)
        self.opt_state = jax.tree_util.tree_map(jnp.asarray, checkpoint["optimizer"])
        self.logger.info(f"Checkpoint loaded. Resume training from epoch {self.start_epoch}")

    def _save_sst_embed(self, data):
        """Export user embeddings + sensitive attrs for offline attackers
        (reference :242-256). The reference reloads the best checkpoint
        unconditionally and crashes under fit(saved=False); here we fall
        back to the current in-memory params with a warning instead."""
        if os.path.isfile(self.saved_model_file):
            with open(self.saved_model_file, "rb") as f:
                checkpoint = pickle.load(f)
            self._load_params_from_checkpoint(checkpoint)
        else:
            self.logger.warning(
                "save_sst_embed: no checkpoint on disk (fit ran with "
                "saved=False); exporting CURRENT params, not best-valid."
            )
        user_features = data.dataset.get_user_feature()
        stored = self.model.get_sst_embed(
            self.params, self.model_state, user_features[1:]
        )
        stored = jax.tree_util.tree_map(np.asarray, stored)
        with open(self.saved_sst_embed_file, "wb") as f:
            pickle.dump(stored, f)

    # ----------------------------------------------------------------- fit

    def fit(self, train_data, valid_data=None, verbose=True, saved=True, show_progress=False, callback_fn=None):
        if saved and self.start_epoch >= self.epochs:
            self._save_checkpoint(-1, verbose=verbose)

        self.eval_collector.data_collect(train_data)
        if self.config["train_neg_sample_args"].get("dynamic", "none") != "none":
            train_data.get_model(self)
        self._maybe_enable_device_sampling(train_data)
        valid_step = 0

        profile_dir = self.config["profile_dir"]
        for epoch_idx in range(self.start_epoch, self.epochs):
            # capture an XLA/device trace of the first trained epoch
            # (SURVEY.md §5: jax.profiler replaces the reference's tqdm
            # GPU-RAM postfix as the tracing story)
            profiling = profile_dir and epoch_idx == self.start_epoch
            if profiling:
                jax.profiler.start_trace(profile_dir)
            training_start_time = time()
            train_loss = self._train_epoch(train_data, epoch_idx, show_progress=show_progress)
            if profiling:
                jax.profiler.stop_trace()
                self.logger.info(f"profiler trace written to {profile_dir}")
            self.train_loss_dict[epoch_idx] = (
                sum(train_loss) if isinstance(train_loss, tuple) else train_loss
            )
            training_end_time = time()
            if verbose:
                self.logger.info(
                    self._generate_train_loss_output(
                        epoch_idx, training_start_time, training_end_time, train_loss
                    )
                )
            self._add_train_loss_to_tensorboard(epoch_idx, train_loss)
            self.wandblogger.log_metrics(
                {"epoch": epoch_idx, "train_loss": train_loss, "train_step": epoch_idx},
                head="train",
            )

            if self.eval_step <= 0 or not valid_data:
                if saved:
                    self._save_checkpoint(epoch_idx, verbose=verbose)
                continue
            if (epoch_idx + 1) % self.eval_step == 0:
                valid_start_time = time()
                valid_score, valid_result = self._valid_epoch(valid_data, show_progress=show_progress)
                self.best_valid_score, self.cur_step, stop_flag, update_flag = early_stopping(
                    valid_score,
                    self.best_valid_score,
                    self.cur_step,
                    max_step=self.stopping_step,
                    bigger=self.valid_metric_bigger,
                )
                valid_end_time = time()
                if verbose:
                    self.logger.info(
                        (set_color(f"epoch {epoch_idx} evaluating", "green") + " ["
                         + set_color("time", "blue") + f": {valid_end_time - valid_start_time:.2f}s, "
                         + set_color("valid_score", "blue") + f": {valid_score:f}]")
                    )
                    self.logger.info(set_color("valid result", "blue") + ": \n" + dict2str(valid_result))
                self.tensorboard.add_scalar("Valid_score", valid_score, epoch_idx)
                self.wandblogger.log_metrics(
                    {**_flatten_result(valid_result), "valid_step": valid_step}, head="valid"
                )

                if update_flag:
                    if saved:
                        self._save_checkpoint(epoch_idx, verbose=verbose)
                    self.best_valid_result = valid_result

                if callback_fn:
                    callback_fn(epoch_idx, valid_score)

                if stop_flag:
                    if verbose:
                        self.logger.info(
                            "Finished training, best eval result in epoch %d"
                            % (epoch_idx - self.cur_step * self.eval_step)
                        )
                    break
                valid_step += 1

        if self.config["save_sst_embed"]:
            self._save_sst_embed(train_data)
        self._add_hparam_to_tensorboard(self.best_valid_score)
        return self.best_valid_score, self.best_valid_result

    # ------------------------------------------------------------ evaluate

    def _get_full_sort_fn(self, sst_list=None):
        key = ("full_sort", sst_list, getattr(self.model, "train_stage", None))
        if key not in self._eval_fn_cache:
            model = self.model

            def score(params, model_state, batch):
                return model.full_sort_predict(params, model_state, batch, sst_list=sst_list)

            self._eval_fn_cache[key] = jax.jit(score)
        return self._eval_fn_cache[key]

    def _get_predict_fn(self, sst_list=None):
        key = ("predict", sst_list, getattr(self.model, "train_stage", None))
        if key not in self._eval_fn_cache:
            model = self.model

            def score(params, model_state, batch):
                return model.predict(params, model_state, batch, sst_list=sst_list)

            self._eval_fn_cache[key] = jax.jit(score)
        return self._eval_fn_cache[key]

    def _full_sort_scores(self, interaction, sst_list=None):
        """Run the jitted full-catalog scorer on a (padded) user batch."""
        n = len(interaction)
        pad_to = getattr(self, "_full_sort_pad", None) or n
        batch = self._to_batch(interaction, pad_to=max(pad_to, n))
        fn = self._get_full_sort_fn(sst_list)
        scores = np.asarray(fn(self.params, self.model_state, batch))
        scores = scores.reshape(-1, self.tot_item_num)[:n]
        return scores.astype(np.float64)

    def _full_sort_batch_eval(self, batched_data, sst_list=None):
        interaction, history_index, positive_u, positive_i = batched_data
        try:
            scores = self._full_sort_scores(interaction, sst_list)
        except NotImplementedError:
            scores = self._predict_all_items_fallback(interaction)
        scores[:, 0] = NEG_INF
        if history_index is not None:
            hist_u, hist_i = history_index
            scores[hist_u, hist_i] = NEG_INF
        return interaction, scores, positive_u, positive_i

    def _predict_all_items_fallback(self, interaction):
        """Score every item via predict() when full_sort_predict is missing
        (reference :425-433)."""
        inter_len = len(interaction)
        new_inter = interaction.repeat_interleave(self.tot_item_num)
        new_inter.update(self.item_tensor.repeat(inter_len))
        batch_size = len(new_inter)
        if batch_size <= self.test_batch_size:
            scores = self._predict_scores(new_inter)
        else:
            scores = self._spilt_predict(new_inter, batch_size)
        return np.asarray(scores, dtype=np.float64).reshape(-1, self.tot_item_num)

    def _predict_scores(self, interaction, sst_list=None):
        # Pad every eval predict batch to ONE canonical shape (the loader's
        # max batch rows) so the scorer compiles exactly once — compiles are
        # expensive (especially over the remote-TPU tunnel) while scoring
        # padded rows is nearly free on the MXU/VPU.
        n = len(interaction)
        cap = getattr(self, "_eval_row_cap", None)
        pad_to = cap if cap and cap >= n else _bucket(n, 8192)
        batch = self._to_batch(interaction, pad_to=pad_to)
        fn = self._get_predict_fn(sst_list)
        out = np.asarray(fn(self.params, self.model_state, batch))
        return out.reshape(-1)[:n]

    def _neg_sample_batch_eval(self, batched_data, sst_list=None):
        interaction, row_idx, positive_u, positive_i = batched_data
        batch_size = len(interaction)
        if batch_size <= self.test_batch_size:
            origin_scores = self._predict_scores(interaction, sst_list)
        else:
            origin_scores = self._spilt_predict(interaction, batch_size, sst_list)

        if self.config["eval_type"] == EvaluatorType.VALUE:
            return interaction, origin_scores, positive_u, positive_i
        col_idx = np.asarray(interaction[self.config["ITEM_ID_FIELD"]])
        batch_user_num = int(positive_u[-1]) + 1
        scores = np.full((batch_user_num, self.tot_item_num), NEG_INF)
        scores[np.asarray(row_idx), col_idx] = origin_scores.reshape(-1)
        return interaction, scores, positive_u, positive_i

    def _spilt_predict(self, interaction, batch_size, sst_list=None):
        num_block = (batch_size + self.test_batch_size - 1) // self.test_batch_size
        results = []
        for i in range(num_block):
            lo = i * self.test_batch_size
            hi = min(lo + self.test_batch_size, batch_size)
            block = interaction[lo:hi]
            results.append(self._predict_scores(block, sst_list))
        return np.concatenate(results, axis=0)

    # ----------------------------------------------------------- fused eval

    def _fused_eval_ok(self):
        """Fused device path covers the topk/positive-score resources; fall
        back to the host path when rank-curve or VALUE resources are needed."""
        r = self.eval_collector.register
        return not (
            r.need("rec.meanrank") or r.need("rec.score") or r.need("data.label")
        ) and self.config["eval_type"] == EvaluatorType.RANKING

    @staticmethod
    def _pad_pairs(u, i, quantum=1024, cap=None):
        """Pad ragged index pairs to a bucketed length; pads target (0, 0)
        with weight 0."""
        n = len(u)
        if cap is None or cap < n:
            cap = max(_bucket(n, quantum), quantum)
        pu = np.zeros(cap, dtype=np.int32)
        pi = np.zeros(cap, dtype=np.int32)
        w = np.zeros(cap, dtype=np.float32)
        pu[:n] = u
        pi[:n] = i
        w[:n] = 1.0
        return pu, pi, w, n

    def _collect_full_sort_fused(self, batched_data, sst_list=None):
        from ..ops.eval_fused import full_sort_eval_step

        interaction, history_index, positive_u, positive_i = batched_data
        n = len(interaction)
        pad_to = max(getattr(self, "_full_sort_pad", None) or n, _bucket(n, 512))
        batch = self._to_batch(interaction, pad_to=pad_to)
        fn = self._get_full_sort_fn(sst_list)
        scores = fn(self.params, self.model_state, batch).reshape(pad_to, self.tot_item_num)

        pu, pi, pw, n_pos = self._pad_pairs(positive_u, positive_i)
        if history_index is not None:
            hu, hi, _, _ = self._pad_pairs(history_index[0], history_index[1])
        else:
            hu = np.zeros(1, dtype=np.int32)
            hi = np.zeros(1, dtype=np.int32)
        topk_idx, rec_topk, pos_score = full_sort_eval_step(
            scores, pu, pi, pw, hu, hi, max(self.config["topk"])
        )

        def emit():
            self._emit_fused_payload(
                interaction, positive_u, positive_i, topk_idx, rec_topk,
                pos_score, n, n_pos,
            )

        return emit

    def _get_sampled_fused_fn(self, sst_list, n_users, row_cap, pos_cap,
                              times, top_k, with_neg):
        """One jitted dispatch for sampled eval: derive every index lane
        from the per-user positive counts, run model predict, scatter into
        the [B, I] matrix and top-k, and gather positive/negative scores.

        Tunnel-aware design (the remote-TPU link runs ~75 MB/s): only the
        item lane ([row_cap] ints) and tiny per-user arrays go over the
        wire — row ids, the user lane, validity, and the positive /
        first-negative-block positions are all reconstructed on device
        from ``counts`` (parity layout: each user's block is its positives
        followed by (times−1)×cnt negatives). The per-row score vector
        never returns to host."""
        key = ("sampled_fused", sst_list, getattr(self.model, "train_stage", None),
               n_users, row_cap, pos_cap, times, top_k, with_neg)
        if key not in self._eval_fn_cache:
            from ..ops.eval_fused import sampled_topk_from_scores

            model = self.model
            n_items = self.tot_item_num
            uid_field = self.config["USER_ID_FIELD"]
            iid_field = self.config["ITEM_ID_FIELD"]

            def step(params, model_state, items, uid_list, counts):
                items = items.astype(jnp.int32)
                rpu = counts * times
                n_rows = rpu.sum()
                n_pos = counts.sum()
                user_slot = jnp.arange(n_users, dtype=jnp.int32)
                row_idx = jnp.repeat(user_slot, rpu, total_repeat_length=row_cap)
                valid = (jnp.arange(row_cap) < n_rows).astype(jnp.float32)
                batch = {uid_field: uid_list[row_idx], iid_field: items}

                starts = jnp.cumsum(rpu) - rpu
                cum_pos = jnp.cumsum(counts) - counts
                pos_u = jnp.repeat(user_slot, counts, total_repeat_length=pos_cap)
                pos_w = (jnp.arange(pos_cap) < n_pos).astype(jnp.float32)
                within = jnp.arange(pos_cap) - cum_pos[pos_u]
                pos_rows = jnp.where(
                    pos_w > 0, starts[pos_u] + within, 0
                ).astype(jnp.int32)
                pos_i = items[pos_rows]

                scores = model.predict(
                    params, model_state, batch, sst_list=sst_list
                ).reshape(-1)
                topk_idx, rec_topk, pos_score = sampled_topk_from_scores(
                    scores, row_idx, items, valid,
                    pos_u, pos_i, pos_w, n_users, n_items, top_k,
                )
                if with_neg:
                    neg_rows = jnp.where(
                        pos_w > 0, pos_rows + counts[pos_u], 0
                    ).astype(jnp.int32)
                    neg_score = scores[neg_rows]
                else:
                    neg_score = jnp.zeros((1,), scores.dtype)
                return topk_idx, rec_topk, pos_score, neg_score

            self._eval_fn_cache[key] = jax.jit(step)
        return self._eval_fn_cache[key]

    def _collect_sampled_fused(self, batched_data, sst_list=None):
        # Models' predict reads only the id fields (verified across the
        # zoo), so the device sees an item lane + per-user counts — not the
        # full multi-field interaction the host scoring path would pad and
        # transfer (~12× the bytes in int64/float64).
        interaction, row_idx, positive_u, positive_i = batched_data
        iid_field = self.config["ITEM_ID_FIELD"]
        items = np.asarray(interaction[iid_field]).astype(np.int32)
        n = len(items)
        cap = getattr(self, "_eval_row_cap", None)
        if cap is None or cap < n:
            cap = max(_bucket(n, 1024), 1024)

        counts_all = np.bincount(positive_u)
        n_users = int(positive_u[-1]) + 1
        n_users_pad = max(
            getattr(self, "_sampled_user_pad", None) or n_users, _bucket(n_users, 512)
        )
        times = n // max(int(counts_all.sum()), 1)
        counts = np.zeros(n_users_pad, dtype=np.int32)
        counts[:n_users] = counts_all
        # per-user uid: first row of each user's block
        uid_list = np.zeros(n_users_pad, dtype=np.int32)
        block_starts = np.concatenate([[0], np.cumsum(counts_all * times)])[:-1]
        uid_list[:n_users] = np.asarray(
            interaction[self.config["USER_ID_FIELD"]]
        )[block_starts]
        items_lane = np.zeros(cap, dtype=np.int32)
        items_lane[:n] = items
        if self.tot_item_num < 2**15:
            items_lane = items_lane.astype(np.int16)  # halve the wire bytes

        n_pos = len(positive_u)
        pos_cap = max(_bucket(n_pos, 1024), 1024)

        r = self.eval_collector.register
        with_neg = bool(r.need("rec.negative_score") or r.need("data.negative_i"))
        fn = self._get_sampled_fused_fn(
            sst_list, n_users_pad, cap, pos_cap, times,
            max(self.config["topk"]), with_neg,
        )
        topk_idx, rec_topk, pos_score, neg_score = fn(
            self.params, self.model_state, items_lane, uid_list, counts
        )

        def emit():
            payload_extra = {}
            if with_neg:
                neg_idx = self._neg_block_positions(items, positive_u)
                if r.need("rec.negative_score"):
                    payload_extra["rec.negative_score"] = np.asarray(neg_score)[:n_pos]
                if r.need("data.negative_i"):
                    payload_extra["data.negative_i"] = items[neg_idx]
            self._emit_fused_payload(
                interaction, positive_u, positive_i, topk_idx, rec_topk, pos_score,
                n_users, n_pos, payload_extra,
            )

        return emit

    @staticmethod
    def _neg_block_positions(items, positive_u):
        """Row positions of each user's first negative block (see
        Collector._first_negative_block for the layout discussion)."""
        k = np.bincount(positive_u)
        k = k[k > 0]
        times = len(items) // max(k.sum(), 1)
        block_starts = np.concatenate([[0], np.cumsum(k * times)])[:-1]
        return np.concatenate(
            [np.arange(s + kj, s + 2 * kj) for s, kj in zip(block_starts, k)]
        )

    def _emit_fused_payload(
        self, interaction, positive_u, positive_i, topk_idx, rec_topk, pos_score,
        n_rows, n_pos, extra=None,
    ):
        r = self.eval_collector.register
        payload = dict(extra or {})
        if r.need("rec.items"):
            payload["rec.items"] = np.asarray(topk_idx)[:n_rows]
        if r.need("rec.topk"):
            payload["rec.topk"] = np.asarray(rec_topk)[:n_rows]
        if r.need("rec.positive_score"):
            payload["rec.positive_score"] = np.asarray(pos_score)[:n_pos]
        self.eval_collector.eval_batch_collect_topk(
            payload, interaction, positive_u, positive_i
        )

    def _macro_batches(self, eval_data, kind):
        """Merge consecutive loader batches into large device dispatches.

        The reference's eval loaders pack whole users, which degenerates to
        ~1 user per batch on skewed datasets (general_dataloader.py:102-117)
        — thousands of tiny device round-trips. Merging preserves per-user
        row-block layout exactly (indices are offset by the running user
        count) while cutting dispatch count by orders of magnitude.
        """
        from ..data.interaction import cat_interactions

        target_scores = self.config["eval_macro_scores"] or 32_000_000
        max_users = max(1, target_scores // max(self.tot_item_num or 1, 1))
        if kind == "full":
            target_rows = None
        else:
            # sampled mode's device cost is the [users, |I|] scatter in
            # sampled_eval_step, so budget users by the same score target as
            # full mode (ml-1M uni100: 2 dispatches instead of 64 — the
            # per-dispatch tunnel RTT dominated the 15 s round-3 eval);
            # rows bound the host→device transfer per dispatch.
            target_rows = self._macro_rows_target()

        if getattr(eval_data, "_macro_sized", False):
            # the loader already emits dispatch-sized whole-user batches
            # (set_macro_rows); re-merging would only copy the arrays
            yield from eval_data
            return

        buf = []
        acc_users = 0
        acc_rows = 0
        for batched_data in eval_data:
            if kind != "full" and batched_data[1] is None:
                yield batched_data  # labeled mode: nothing to merge
                continue
            buf.append(batched_data)
            if kind == "full":
                acc_users += len(batched_data[0])
            else:
                acc_rows += len(batched_data[0])
                acc_users += int(batched_data[2][-1]) + 1
            if acc_users >= max_users or (target_rows and acc_rows >= target_rows):
                yield self._merge_batches(buf, kind)
                buf, acc_users, acc_rows = [], 0, 0
        if buf:
            yield self._merge_batches(buf, kind)

    @staticmethod
    def _merge_batches(buf, kind):
        from ..data.interaction import cat_interactions

        if len(buf) == 1:
            return buf[0]
        inters = [b[0] for b in buf]
        merged_inter = cat_interactions(inters)
        pos_u_parts, pos_i_parts = [], []
        second_parts = []
        offset = 0
        for inter, second, pos_u, pos_i in buf:
            n_users = int(pos_u[-1]) + 1 if kind != "full" else len(inter)
            if kind == "full":
                hist_u, hist_i = second
                second_parts.append((hist_u + offset, hist_i))
            else:
                second_parts.append(second + offset)
            pos_u_parts.append(pos_u + offset)
            pos_i_parts.append(pos_i)
            offset += n_users
        pos_u = np.concatenate(pos_u_parts)
        pos_i = np.concatenate(pos_i_parts)
        if kind == "full":
            hist_u = np.concatenate([p[0] for p in second_parts])
            hist_i = np.concatenate([p[1] for p in second_parts])
            return merged_inter, (hist_u, hist_i), pos_u, pos_i
        row_idx = np.concatenate(second_parts)
        return merged_inter, row_idx, pos_u, pos_i

    # ------------------------------------------------------- streaming eval

    def _get_retrieval_fn(self, sst_list=None):
        key = ("retrieval", sst_list, getattr(self.model, "train_stage", None))
        if key not in self._eval_fn_cache:
            model = self.model

            def fn(params, model_state, batch):
                return model.retrieval_embeddings(params, model_state, batch, sst_list=sst_list)

            self._eval_fn_cache[key] = jax.jit(fn)
        return self._eval_fn_cache[key]

    @staticmethod
    def _pair_membership(row_u, cand_i, key_u, key_i, n_items):
        """bool [B, k']: is (row, candidate) in the (key_u, key_i) pair set."""
        if len(key_u) == 0:
            return np.zeros(cand_i.shape, dtype=bool)
        keys = np.sort(key_u.astype(np.int64) * n_items + key_i.astype(np.int64))
        cand_keys = row_u[:, None].astype(np.int64) * n_items + cand_i.astype(np.int64)
        pos = np.clip(np.searchsorted(keys, cand_keys), 0, len(keys) - 1)
        return keys[pos] == cand_keys

    def _collect_full_sort_streaming(self, batched_data, sst_list=None):
        """Retrieval-form eval: never materializes [B, |I|]. Retrieves
        k' = k + max_history + 1 candidates via the streaming/Pallas top-k,
        then filters PAD + history and builds collector payloads on host.
        Exact for models whose full-sort score is a strictly monotone
        transform of the retrieval dot product."""
        from ..ops.topk import streaming_topk_scores

        interaction, history_index, positive_u, positive_i = batched_data
        B = len(interaction)
        pad_to = max(getattr(self, "_full_sort_pad", None) or B, _bucket(B, 512))
        batch = self._to_batch(interaction, pad_to=pad_to)
        user_repr, item_table = self._get_retrieval_fn(sst_list)(
            self.params, self.model_state, batch
        )

        max_k = max(self.config["topk"])
        k_prime = getattr(self, "_stream_kprime", None) or (max_k + 1)
        use_pallas = (
            self.config["use_pallas"] is not False and jax.default_backend() == "tpu"
        )
        if self._distributed_eval_ok():
            # item-sharded scoring + cross-shard candidate merge over ICI
            from ..parallel.embedding import pad_table_rows
            from ..parallel.eval import distributed_topk_scores

            n_model = self.mesh.shape["model"]
            table, n_valid = pad_table_rows(item_table, n_model)
            _, cand_i = distributed_topk_scores(
                self.mesh, user_repr, table, k_prime, valid_rows=n_valid
            )
            self._last_eval_path = "distributed"
        elif use_pallas:
            from ..ops.pallas.fused_topk import fused_topk_scores

            _, cand_i = fused_topk_scores(
                user_repr, item_table, k_prime, precision="highest"
            )
            self._last_eval_path = "streaming-pallas"
        else:
            _, cand_i = streaming_topk_scores(user_repr, item_table, k_prime)
            self._last_eval_path = "streaming"
        cand_i = np.asarray(cand_i)[:B]

        # host-side PAD + history filtering, then truncate to k (indices at
        # or beyond the catalog are distributed-merge pad sentinels)
        forbidden = (cand_i == 0) | (cand_i >= self.tot_item_num)
        if history_index is not None:
            hist_u, hist_i = history_index
            row_u = np.arange(B)
            forbidden |= self._pair_membership(
                row_u, cand_i, np.asarray(hist_u), np.asarray(hist_i), self.tot_item_num
            )
        order = np.argsort(forbidden, axis=1, kind="stable")  # keep score order
        topk_idx = np.take_along_axis(cand_i, order, axis=1)[:, :max_k]

        r = self.eval_collector.register
        payload = {}
        if r.need("rec.items"):
            payload["rec.items"] = topk_idx
        if r.need("rec.topk"):
            pos_hit = self._pair_membership(
                np.arange(B), topk_idx, np.asarray(positive_u), np.asarray(positive_i),
                self.tot_item_num,
            ).astype(np.int64)
            pos_len = np.bincount(np.asarray(positive_u), minlength=B).reshape(-1, 1)
            payload["rec.topk"] = np.concatenate([pos_hit, pos_len], axis=1)
        if r.need("rec.positive_score"):
            users = np.asarray(interaction[self.config["USER_ID_FIELD"]])[
                np.asarray(positive_u)
            ]
            pair_inter = Interaction(
                {
                    self.config["USER_ID_FIELD"]: users,
                    self.config["ITEM_ID_FIELD"]: np.asarray(positive_i),
                }
            )
            payload["rec.positive_score"] = self._predict_scores(pair_inter, sst_list)
        self.eval_collector.eval_batch_collect_topk(
            payload, interaction, positive_u, positive_i
        )

    def _compute_stream_kprime(self, eval_data):
        """Static candidate count for streaming retrieval: k + the longest
        history any user carries + 1 (PAD)."""
        max_k = max(self.config["topk"])
        return max_k + getattr(eval_data, "max_history_len", 0) + 1

    def _retrieval_eval_capable(self):
        """Retrieval-form eval requires the model to both expose
        ``retrieval_embeddings`` and DECLARE rank-preservation
        (``retrieval_monotone``) — an undeclared head can never silently
        take a path that ranks raw dot products."""
        return (
            getattr(self.model, "retrieval_monotone", False)
            and hasattr(self.model, "retrieval_embeddings")
            and self._fused_eval_ok()
        )

    def _streaming_eval_ok(self):
        return self.config["streaming_eval"] and self._retrieval_eval_capable()

    def _distributed_eval_ok(self):
        """Mesh-mode full-sort eval scores item shards in place and merges
        k·n_shards candidates over ICI (parallel/eval.py) instead of running
        the replicated scorer. Retrieval-form ranking breaks head-score ties
        differently from the dense path (ADVICE r2), so it needs the same
        exactness opt-in as streaming eval: on under a model axis when
        config['distributed_eval'] is True, or by default only when
        streaming_eval is already opted into."""
        cfg = self.config["distributed_eval"]
        opted_in = cfg is True or (cfg is None and self.config["streaming_eval"])
        return (
            self.mesh is not None
            and self.mesh.shape.get("model", 1) > 1
            and opted_in
            and self._retrieval_eval_capable()
        )

    def _macro_rows_target(self):
        """Sampled-eval row budget per dispatch. The pre-r3 key
        ``eval_macro_rows`` is honored as a deprecated alias; the in-code
        fallback matches the overall.yaml default."""
        val = self.config["eval_macro_rows_sampled"]
        if val is None:
            val = self.config["eval_macro_rows"]
        return val or 4_194_304

    @staticmethod
    def _drain_collect(pending):
        """Run deferred collector emits in batch order. A collect call may
        return a closure holding un-forced device outputs; draining after
        the dispatch loop lets the device/tunnel work of batch k overlap
        the host-side build of batch k+1."""
        for emit in pending:
            if callable(emit):
                emit()
        pending.clear()

    def _collect_batch(self, kind, batched_data, sst_list=None):
        """Score one eval batch and feed the collector, fused when possible.
        May return a deferred-emit closure (see _drain_collect)."""
        if kind == "full":
            if self._distributed_eval_ok() or self._streaming_eval_ok():
                return self._collect_full_sort_streaming(batched_data, sst_list)
            if self._fused_eval_ok():
                try:
                    self._last_eval_path = "fused"
                    return self._collect_full_sort_fused(batched_data, sst_list)
                except NotImplementedError:
                    pass
            self._last_eval_path = "host"
            interaction, scores, positive_u, positive_i = self._full_sort_batch_eval(
                batched_data, sst_list
            )
        else:
            if self._fused_eval_ok() and batched_data[1] is not None:
                return self._collect_sampled_fused(batched_data, sst_list)
            interaction, scores, positive_u, positive_i = self._neg_sample_batch_eval(
                batched_data, sst_list
            )
        self.eval_collector.eval_batch_collect(scores, interaction, positive_u, positive_i)

    def evaluate(self, eval_data, load_best_model=False, model_file=None, show_progress=False):
        if not eval_data:
            return

        if load_best_model:
            checkpoint_file = model_file or self.saved_model_file
            with open(checkpoint_file, "rb") as f:
                checkpoint = pickle.load(f)
            self._load_params_from_checkpoint(checkpoint)
            self.logger.info(f"Loading model structure and parameters from {checkpoint_file}")

        if isinstance(eval_data, FullSortEvalDataLoader):
            kind = "full"
            self._full_sort_pad = eval_data.step
            self._stream_kprime = self._compute_stream_kprime(eval_data)
            if self.item_tensor is None:
                self.item_tensor = eval_data.dataset.get_item_feature()
        else:
            kind = "sampled"
            if self._fused_eval_ok() and hasattr(eval_data, "set_macro_rows"):
                eval_data.set_macro_rows(
                    self._macro_rows_target()
                )
            elif hasattr(eval_data, "reset_macro_rows"):
                # a previous fused evaluate may have macro-sized this loader;
                # the host scoring path is not sized for those batches
                eval_data.reset_macro_rows()
            self._sampled_user_pad = eval_data.step
            self._eval_row_cap = eval_data.batch_size
        if self.config["eval_type"] == EvaluatorType.RANKING:
            self.tot_item_num = eval_data.dataset.item_num

        self.eval_collector.model_collect(self.model)
        pending = []
        for batched_data in self._macro_batches(eval_data, kind):
            pending.append(self._collect_batch(kind, batched_data))
        self._drain_collect(pending)
        struct = self.eval_collector.get_data_struct()
        result = self.evaluator.evaluate(struct)
        self.wandblogger.log_eval_metrics(result, head="eval")
        return result

    # ---------------------------------------------------- dynamic negatives

    def score_batch(self, interaction):
        """Used by the dataloader's dynamic hard-negative mining."""
        return self._predict_scores(interaction)

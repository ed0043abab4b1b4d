"""Adversarial trainers: PFCN (filter vs discriminator) and FairGo
(pretrain → adversarial finetune).

Parity: recbole/trainer/trainer.py —

* PFCNTrainer (:865-1236): per epoch draw a random non-empty sensitive-attr
  mask; every ``train_epoch_interval``-th epoch run a filter+backbone pass
  minimizing ``rec_loss − w·dis_loss`` with the filter optimizer, then every
  epoch a discriminator pass minimizing ``dis_loss`` with the dis optimizer;
  validation collects over ALL non-empty attr subsets (:965-1045); final
  evaluate reports per-subset result dicts keyed ``'{filter_mode}-{sst_list}'``
  (:1047-1106); checkpoints carry both optimizer states (:1133-1154).
* FairGoTrainer (:534-862): two-stage — ``pretrain()`` trains the backbone
  (:606-685), saves ``<M>-<d>-pretrain.pth``, then ``reset_params`` flips to
  finetune (:561-579) and the same alternation runs; evaluate() reports both
  ``pretrain-*`` and ``finetune-*`` metric sets (:738-772).

TPU-first: the alternation is two masked-optax update programs selected per
epoch on host — the sst subset is part of the jit cache key, so each subset
compiles once and the inner loop stays host-round-trip free.
"""

from __future__ import annotations

import itertools
import os
import pickle
from time import time

import jax
import numpy as np

from ..data.dataloader import FullSortEvalDataLoader
from ..evaluator import Collector, Evaluator
from ..utils import EvaluatorType, calculate_valid_score, dict2str, early_stopping, set_color
from .trainer import Trainer


def _draw_sst_mask(sst_attrs):
    """Random non-empty subset of sensitive attributes (reference :689-692)."""
    mask = np.zeros(len(sst_attrs))
    while mask.sum() == 0:
        mask = np.random.choice([0, 1], len(sst_attrs))
    return tuple(s for s, m in zip(sst_attrs, mask) if m != 0)


class PFCNTrainer(Trainer):
    def __init__(self, config, model):
        super().__init__(config, model)
        self.filter_mode = config["filter_mode"].lower()
        self.train_epoch_interval = config["train_epoch_interval"]
        if self.filter_mode != "none":
            self.sst_num = len(config["sst_attr_list"])
            self.sst_attrs = list(config["sst_attr_list"])
            groups = model.param_groups()
            self.tx_filter = self._masked_tx(groups["filter"])
            self.tx_dis = self._masked_tx(groups["dis"])
            self.opt_state_filter = self.tx_filter.init(self.params)
            self.opt_state_dis = self.tx_dis.init(self.params)

    # --------------------------------------------------------- optimizer tags

    def _tx_by_tag(self, tag):
        if tag == "filter":
            return self.tx_filter
        if tag == "dis":
            return self.tx_dis
        return self.optimizer

    def _opt_state_by_tag(self, tag):
        if tag == "filter":
            return self.opt_state_filter
        if tag == "dis":
            return self.opt_state_dis
        return self.opt_state

    def _set_opt_state_by_tag(self, tag, value):
        if tag == "filter":
            self.opt_state_filter = value
        elif tag == "dis":
            self.opt_state_dis = value
        else:
            self.opt_state = value

    # --------------------------------------------------------------- training

    def _train_epoch(self, train_data, epoch_idx, loss_func=None, show_progress=False):
        if self.filter_mode == "none":
            return self._run_epoch(train_data, "calculate_loss", None, "main")

        filter_loss, dis_loss = 0.0, 0.0
        sst_list = _draw_sst_mask(self.sst_attrs)
        if epoch_idx % self.train_epoch_interval == 0:
            self.logger.info("Train Filter and Base model")
            filter_loss = self._run_epoch(train_data, "calculate_loss", sst_list, "filter")
        self.logger.info("Train Discriminator")
        dis_loss = self._run_epoch(train_data, "calculate_dis_loss", sst_list, "dis")
        return filter_loss, dis_loss

    # ------------------------------------------------------------- evaluation

    def _sst_subsets(self):
        subsets = []
        for i in range(1, self.sst_num + 1):
            subsets += [tuple(c) for c in itertools.combinations(self.sst_attrs, i)]
        return subsets

    def pfcn_evaluate(self, eval_data, load_best_model=True, model_file=None, show_progress=False):
        """Validation-style eval: collect over every attr subset into ONE
        result dict (reference :965-1045)."""
        if not eval_data:
            return
        if load_best_model:
            self._load_best(model_file)

        kind = self._pick_eval_kind(eval_data)
        pending = []
        for batched_data in self._macro_batches(eval_data, kind):
            if self.filter_mode != "none":
                for sst_list in self._sst_subsets():
                    pending.append(self._collect_batch(kind, batched_data, sst_list))
            else:
                pending.append(self._collect_batch(kind, batched_data))
        self._drain_collect(pending)
        self.eval_collector.model_collect(self.model)
        struct = self.eval_collector.get_data_struct()
        return self.evaluator.evaluate(struct)

    def _valid_epoch(self, valid_data, show_progress=False):
        valid_result = self.pfcn_evaluate(valid_data, load_best_model=False, show_progress=show_progress)
        valid_score = calculate_valid_score(valid_result, self.valid_metric)
        return valid_score, valid_result

    def _pick_eval_kind(self, eval_data):
        if isinstance(eval_data, FullSortEvalDataLoader):
            self._full_sort_pad = eval_data.step
            self._stream_kprime = self._compute_stream_kprime(eval_data)
            if self.item_tensor is None:
                self.item_tensor = eval_data.dataset.get_item_feature()
            kind = "full"
        else:
            kind = "sampled"
            if self._fused_eval_ok() and hasattr(eval_data, "set_macro_rows"):
                eval_data.set_macro_rows(
                    self._macro_rows_target()
                )
            self._sampled_user_pad = eval_data.step
            self._eval_row_cap = eval_data.batch_size
        if self.config["eval_type"] == EvaluatorType.RANKING:
            self.tot_item_num = eval_data.dataset.item_num
        return kind

    def _load_best(self, model_file=None):
        checkpoint_file = model_file or self.saved_model_file
        with open(checkpoint_file, "rb") as f:
            checkpoint = pickle.load(f)
        self._load_params_from_checkpoint(checkpoint)
        self.logger.info(f"Loading model structure and parameters from {checkpoint_file}")

    def evaluate(self, eval_data, load_best_model=True, model_file=None, show_progress=False):
        """Final eval: one result dict PER subset, keyed
        '{filter_mode}-{sst_list}' (reference :1047-1106)."""
        if not eval_data:
            return
        if load_best_model:
            self._load_best(model_file)

        kind = self._pick_eval_kind(eval_data)
        final_result = {}
        if self.filter_mode != "none":
            for sst_list in self._sst_subsets():
                pending = []
                for batched_data in self._macro_batches(eval_data, kind):
                    pending.append(self._collect_batch(kind, batched_data, sst_list))
                self._drain_collect(pending)
                self.eval_collector.model_collect(self.model)
                struct = self.eval_collector.get_data_struct()
                result = self.evaluator.evaluate(struct)
                final_result[f'{self.config["filter_mode"]}-{list(sst_list)}'] = result
        else:
            pending = []
            for batched_data in self._macro_batches(eval_data, kind):
                pending.append(self._collect_batch(kind, batched_data))
            self._drain_collect(pending)
            self.eval_collector.model_collect(self.model)
            struct = self.eval_collector.get_data_struct()
            final_result[str(self.config["filter_mode"])] = self.evaluator.evaluate(struct)
        return final_result

    # ------------------------------------------------------------ checkpoints

    def _checkpoint_payload(self, epoch):
        payload = super()._checkpoint_payload(epoch)
        if self.filter_mode != "none":
            payload["optimizer_filter"] = jax.tree_util.tree_map(np.asarray, self.opt_state_filter)
            payload["optimizer_dis"] = jax.tree_util.tree_map(np.asarray, self.opt_state_dis)
        else:
            payload["optimizer_filter"] = None
            payload["optimizer_dis"] = None
        return payload

    def resume_checkpoint(self, resume_file):
        import jax.numpy as jnp

        resume_file = str(resume_file)
        self.saved_model_file = resume_file
        with open(resume_file, "rb") as f:
            checkpoint = pickle.load(f)
        self.start_epoch = checkpoint["epoch"] + 1
        self.cur_step = checkpoint["cur_step"]
        self.best_valid_score = checkpoint["best_valid_score"]
        self._load_params_from_checkpoint(checkpoint)
        if self.filter_mode != "none":
            self.opt_state_filter = jax.tree_util.tree_map(
                jnp.asarray, checkpoint["optimizer_filter"]
            )
            self.opt_state_dis = jax.tree_util.tree_map(jnp.asarray, checkpoint["optimizer_dis"])
        else:
            self.opt_state = jax.tree_util.tree_map(jnp.asarray, checkpoint["optimizer"])
        self.logger.info(f"Checkpoint loaded. Resume training from epoch {self.start_epoch}")

    def _save_sst_embed(self, data):
        """Per-subset embedding exports (reference :1108-1131). Falls back
        to current params when fit ran with saved=False (the reference
        crashes reloading the never-saved checkpoint there)."""
        if os.path.isfile(self.saved_model_file):
            with open(self.saved_model_file, "rb") as f:
                checkpoint = pickle.load(f)
            self._load_params_from_checkpoint(checkpoint)
        else:
            self.logger.warning(
                "save_sst_embed: no checkpoint on disk (fit ran with "
                "saved=False); exporting CURRENT params, not best-valid."
            )
        user_features = data.dataset.get_user_feature()[1:]
        if self.filter_mode != "none":
            for i in range(1, min(self.sst_num, 3) + 1):
                for attr_list in itertools.combinations(self.config["sst_attr_list"], i):
                    stored = self.model.get_sst_embed(
                        self.params, self.model_state, user_features, tuple(attr_list)
                    )
                    stored = jax.tree_util.tree_map(np.asarray, stored)
                    fname = '{}_embed-{}-[{}].pth'.format(
                        self.config["model"], self.config["filter_mode"], "_".join(attr_list)
                    )
                    with open(os.path.join(self.checkpoint_dir, fname), "wb") as f:
                        pickle.dump(stored, f)
        else:
            stored = self.model.get_sst_embed(self.params, self.model_state, user_features)
            stored = jax.tree_util.tree_map(np.asarray, stored)
            fname = f'{self.config["model"]}_embed-{self.config["filter_mode"]}.pth'
            with open(os.path.join(self.checkpoint_dir, fname), "wb") as f:
                pickle.dump(stored, f)


class FairGoTrainer(Trainer):
    """Two-stage pretrain → adversarial-finetune trainer (reference
    :534-862)."""

    def __init__(self, config, model):
        super().__init__(config, model)
        self.train_epoch_interval = config["train_epoch_interval"]
        self.sst_num = len(config["sst_attr_list"])
        self.sst_attrs = list(config["sst_attr_list"])
        self.load_pretrain_weight = config["load_pretrain_weight"]

        groups = model.param_groups()
        self.tx_pretrain = self._masked_tx(groups["pretrain"])
        self.tx_filter = self._masked_tx(groups["filter"])
        self.tx_dis = self._masked_tx(groups["dis"])
        self.opt_state_pretrain = self.tx_pretrain.init(self.params)
        self.opt_state_filter = self.tx_filter.init(self.params)
        self.opt_state_dis = self.tx_dis.init(self.params)

        if config["pretrain_model_file_path"] is not None:
            self.saved_pretrain_model_file = config["pretrain_model_file_path"]
            with open(config["pretrain_model_file_path"], "rb") as f:
                checkpoint = pickle.load(f)
            self._load_params_from_checkpoint(checkpoint)
            self.logger.info(
                "Loading pretrain model structure and parameters from "
                f'{config["pretrain_model_file_path"]}'
            )
            self.model.train_stage = "finetune"
        elif self.load_pretrain_weight:
            self.model.train_stage = "finetune"
        else:
            self.model.train_stage = "pretrain"
            self.pretrain_epochs = config["pretrain_epochs"]

        fname = "{}-{}_embed-[{}].pth".format(
            config["model"], config["aggr_method"], "_".join(self.sst_attrs)
        )
        self.saved_sst_embed_file = os.path.join(self.checkpoint_dir, fname)

    # ----------------------------------------------------------------- tags

    def _tx_by_tag(self, tag):
        return {
            "pretrain": self.tx_pretrain,
            "filter": self.tx_filter,
            "dis": self.tx_dis,
        }.get(tag, self.optimizer)

    def _opt_state_by_tag(self, tag):
        return {
            "pretrain": self.opt_state_pretrain,
            "filter": self.opt_state_filter,
            "dis": self.opt_state_dis,
        }.get(tag, self.opt_state)

    def _set_opt_state_by_tag(self, tag, value):
        if tag == "pretrain":
            self.opt_state_pretrain = value
        elif tag == "filter":
            self.opt_state_filter = value
        elif tag == "dis":
            self.opt_state_dis = value
        else:
            self.opt_state = value

    # ------------------------------------------------------------------ fit

    def reset_params(self):
        """Counters reset between stages (reference :561-579)."""
        config = self.config
        self.epochs = config["epochs"]
        self.eval_step = min(config["eval_step"], self.epochs)
        self.start_epoch = 0
        self.cur_step = 0
        self.best_valid_score = -np.inf if self.valid_metric_bigger else np.inf
        self.best_valid_result = None
        self.train_loss_dict = {}
        self.eval_collector = Collector(config)
        self.evaluator = Evaluator(config)
        self.item_tensor = None
        self.tot_item_num = None
        self.model.train_stage = "finetune"

    def fit(self, train_data, valid_data=None, verbose=True, saved=True, show_progress=False, callback_fn=None):
        if self.model.train_stage == "pretrain":
            self.pretrain(train_data, valid_data, verbose, saved, show_progress)
            self.reset_params()
            return super().fit(train_data, valid_data, verbose, saved, show_progress, callback_fn)
        if self.model.train_stage == "finetune":
            return super().fit(train_data, valid_data, verbose, saved, show_progress, callback_fn)
        raise ValueError("Please make sure that the 'train_stage' is 'pretrain' or 'finetune'!")

    def save_pretrained_model(self, saved_model_file):
        payload = self._checkpoint_payload(-1)
        payload["optimizer"] = jax.tree_util.tree_map(np.asarray, self.opt_state_pretrain)
        with open(saved_model_file, "wb") as f:
            pickle.dump(payload, f)

    def pretrain(self, train_data, valid_data, verbose=True, saved=True, show_progress=False):
        self.saved_pretrain_model_file = os.path.join(
            self.checkpoint_dir,
            f'{self.config["model"]}-{self.config["dataset"]}-pretrain.pth',
        )
        self.saved_pretrain_sst_file = os.path.join(
            self.checkpoint_dir,
            f'{self.config["model"]}-{self.config["dataset"]}-pretrain_embed[none].pth',
        )
        self.eval_step = min(self.config["eval_step"], self.pretrain_epochs)
        self.logger.info(set_color("Model Pretrain", "yellow"))
        self.eval_collector.data_collect(train_data)

        for epoch_idx in range(self.start_epoch, self.pretrain_epochs):
            training_start_time = time()
            train_loss = self._run_epoch(train_data, "calculate_loss", None, "pretrain")
            self.train_loss_dict[epoch_idx] = train_loss
            training_end_time = time()
            if verbose:
                self.logger.info(
                    self._generate_train_loss_output(
                        epoch_idx, training_start_time, training_end_time, train_loss
                    )
                )

            if self.eval_step <= 0 or not valid_data:
                if saved:
                    self.save_pretrained_model(self.saved_pretrain_model_file)
                continue
            if (epoch_idx + 1) % self.eval_step == 0:
                valid_score, valid_result = self._valid_epoch(valid_data, show_progress=show_progress)
                self.best_valid_score, self.cur_step, stop_flag, update_flag = early_stopping(
                    valid_score, self.best_valid_score, self.cur_step,
                    max_step=self.stopping_step, bigger=self.valid_metric_bigger,
                )
                if verbose:
                    self.logger.info(
                        set_color(f"pretrain epoch {epoch_idx} evaluating", "green")
                        + f" [valid_score: {valid_score:f}]"
                    )
                    self.logger.info(set_color("valid result", "blue") + ": \n" + dict2str(valid_result))
                if update_flag:
                    if saved:
                        self.save_pretrained_model(self.saved_pretrain_model_file)
                    self.best_valid_result = valid_result
                if stop_flag:
                    if verbose:
                        self.logger.info(
                            "Finished pretraining, best eval result in epoch %d"
                            % (epoch_idx - self.cur_step * self.eval_step)
                        )
                    break

        if os.path.isfile(self.saved_pretrain_model_file):
            with open(self.saved_pretrain_model_file, "rb") as f:
                checkpoint = pickle.load(f)
            self._load_params_from_checkpoint(checkpoint)
        else:
            # pretrain(saved=False): the reference crashes torch.loading the
            # never-saved best checkpoint here; continue on current params
            self.logger.warning(
                "pretrain ran with saved=False; finetuning from CURRENT "
                "params, not best-valid."
            )
        if self.config["save_sst_embed"]:
            self._save_sst_embed_direct(train_data, self.saved_pretrain_sst_file)
        return self.best_valid_score, self.best_valid_result

    # ------------------------------------------------------------- training

    def _train_epoch(self, train_data, epoch_idx, loss_func=None, show_progress=False):
        dis_loss, filter_loss = 0.0, 0.0
        sst_list = _draw_sst_mask(self.sst_attrs)
        if epoch_idx % self.train_epoch_interval == 0:
            self.logger.info("Train Filter")
            filter_loss = self._run_epoch(train_data, "calculate_loss", sst_list, "filter")
        self.logger.info("Train Discriminator")
        dis_loss = self._run_epoch(train_data, "calculate_dis_loss", sst_list, "dis")
        return dis_loss, filter_loss

    # ------------------------------------------------------------ evaluation

    def evaluate(self, eval_data, load_best_model=True, model_file=None, show_progress=False):
        """Report pretrain-* and finetune-* metric sets (reference :738-772)."""
        if not eval_data:
            return
        result = {}
        if not load_best_model:
            return super().evaluate(eval_data, show_progress=show_progress)

        if not self.load_pretrain_weight:
            with open(self.saved_pretrain_model_file, "rb") as f:
                checkpoint = pickle.load(f)
            self._load_params_from_checkpoint(checkpoint)
            self.model.train_stage = "pretrain"
            self.logger.info(
                f"Loading pretrain model structure and parameters from {self.saved_pretrain_model_file}"
            )
            for key, value in super().evaluate(eval_data).items():
                result[f"pretrain-{key}"] = value

        checkpoint_file = model_file or self.saved_model_file
        with open(checkpoint_file, "rb") as f:
            checkpoint = pickle.load(f)
        self._load_params_from_checkpoint(checkpoint)
        self.model.train_stage = "finetune"
        self.logger.info(f"Loading model structure and parameters from {checkpoint_file}")
        for key, value in super().evaluate(eval_data).items():
            result[f"finetune-{key}"] = value
        return result

    # ----------------------------------------------------------- checkpoints

    def _checkpoint_payload(self, epoch):
        payload = super()._checkpoint_payload(epoch)
        payload["optimizer_filter"] = jax.tree_util.tree_map(np.asarray, self.opt_state_filter)
        payload["optimizer_dis"] = jax.tree_util.tree_map(np.asarray, self.opt_state_dis)
        payload["train_stage"] = self.model.train_stage
        return payload

    def resume_checkpoint(self, resume_file):
        import jax.numpy as jnp

        resume_file = str(resume_file)
        self.saved_model_file = resume_file
        with open(resume_file, "rb") as f:
            checkpoint = pickle.load(f)
        self.start_epoch = checkpoint["epoch"] + 1
        self.cur_step = checkpoint["cur_step"]
        self.best_valid_score = checkpoint["best_valid_score"]
        self._load_params_from_checkpoint(checkpoint)
        self.opt_state_filter = jax.tree_util.tree_map(jnp.asarray, checkpoint["optimizer_filter"])
        self.opt_state_dis = jax.tree_util.tree_map(jnp.asarray, checkpoint["optimizer_dis"])
        if checkpoint.get("train_stage"):
            self.model.train_stage = checkpoint["train_stage"]
        self.logger.info(f"Checkpoint loaded. Resume training from epoch {self.start_epoch}")

    def _save_sst_embed_direct(self, data, saved_sst_embed_file=None):
        """Export with the CURRENT params (reference :774-782)."""
        user_features = data.dataset.get_user_feature()[1:]
        stored = self.model.get_sst_embed(
            self.params, self.model_state, user_features, tuple(self.sst_attrs)
        )
        stored = jax.tree_util.tree_map(np.asarray, stored)
        path = saved_sst_embed_file or self.saved_sst_embed_file
        with open(path, "wb") as f:
            pickle.dump(stored, f)

    def _save_sst_embed(self, data):
        self._save_sst_embed_direct(data)


class FairGo_PMFTrainer(FairGoTrainer):
    pass


class FairGo_GCNTrainer(FairGoTrainer):
    pass


class PFCN_MLPTrainer(PFCNTrainer):
    pass


class PFCN_BiasedMFTrainer(PFCNTrainer):
    pass


class PFCN_DMFTrainer(PFCNTrainer):
    pass


class PFCN_PMFTrainer(PFCNTrainer):
    pass

"""DataLoader family.

Parity: recbole/data/dataloader/{abstract,general,user,focf}_dataloader.py.
The iterator protocol (``pr`` pointer + ``step``), batch-size derivation, and
batch payloads match the reference:

* ``TrainDataLoader`` — batch = train_batch_size // times rows before
  negative expansion (general_dataloader.py:40-49);
* ``NegSampleEvalDataLoader`` — all rows of one user share a batch, positives
  before negatives; yields (Interaction, row_idx, positive_u, positive_i)
  (:68-158);
* ``FullSortEvalDataLoader`` — yields (user_df, (history_u, history_i),
  positive_u, positive_i) with history = used − positive (:161-253);
* ``FOCFDataLoader`` — item-grouped batches: union of all interactions of
  randomly chosen items until ≥ step rows (focf_dataloader.py:37-51);
* ``UserDataLoader`` — iterates all user ids (user_dataloader.py).

Columns are numpy; device transfer happens in the trainer's jitted step.
"""

from __future__ import annotations

import copy
import math
from logging import getLogger

import numpy as np

from ..utils import FeatureSource, FeatureType, InputType, ModelType
from .interaction import Interaction, cat_interactions


class AbstractDataLoader:
    def __init__(self, config, dataset, sampler, shuffle=False):
        self.config = config
        self.logger = getLogger()
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = self.step = self.model = None
        self.shuffle = shuffle
        self.pr = 0
        self._init_batch_size_and_step()

    def _init_batch_size_and_step(self):
        raise NotImplementedError

    def update_config(self, config):
        self.config = config
        self._init_batch_size_and_step()

    def set_batch_size(self, batch_size):
        if self.pr != 0:
            raise PermissionError("Cannot change dataloader's batch_size while iterating")
        self.batch_size = batch_size

    def __len__(self):
        return math.ceil(self.pr_end / self.step)

    def __iter__(self):
        if self.shuffle:
            self._shuffle()
        return self

    def __next__(self):
        if self.pr >= self.pr_end:
            self.pr = 0
            raise StopIteration()
        return self._next_batch_data()

    @property
    def pr_end(self):
        raise NotImplementedError

    def _shuffle(self):
        raise NotImplementedError

    def _next_batch_data(self):
        raise NotImplementedError

    def get_model(self, model):
        """Register the live model for dynamic (hard) negative sampling."""
        self.model = model

    @property
    def max_batch_rows(self):
        """Upper bound on rows any batch of this loader can produce — the
        trainer pads every batch to this so XLA compiles exactly one train
        shape."""
        return self.batch_size


class NegSampleDataLoader(AbstractDataLoader):
    def __init__(self, config, dataset, sampler, shuffle=True):
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _set_neg_sample_args(self, config, dataset, dl_format, neg_sample_args):
        self.uid_field = dataset.uid_field
        self.iid_field = dataset.iid_field
        self.dl_format = dl_format
        self.neg_sample_args = neg_sample_args
        self.times = 1
        # on-device sampling supported for the pairwise 1-negative shape
        self.device_neg_sampling = bool(
            config["device_neg_sampling"]
            and dl_format == InputType.PAIRWISE
            and neg_sample_args.get("strategy") == "by"
            and neg_sample_args.get("by") == 1
            and neg_sample_args.get("dynamic", "none") in (None, "none")
        )
        if self.neg_sample_args["strategy"] == "by":
            self.neg_sample_num = self.neg_sample_args["by"]
            if self.dl_format == InputType.POINTWISE:
                self.times = 1 + self.neg_sample_num
                self.sampling_func = self._neg_sample_by_point_wise_sampling
                self.label_field = config["LABEL_FIELD"]
                dataset.set_field_property(
                    self.label_field, FeatureType.FLOAT, FeatureSource.INTERACTION, 1
                )
            elif self.dl_format == InputType.PAIRWISE:
                self.times = self.neg_sample_num
                self.sampling_func = self._neg_sample_by_pair_wise_sampling
                self.neg_prefix = config["NEG_PREFIX"]
                self.neg_item_id = self.neg_prefix + self.iid_field
                columns = (
                    [self.iid_field]
                    if dataset.item_feat is None
                    else list(dataset.item_feat.columns)
                )
                for col in columns:
                    dataset.copy_field_property(self.neg_prefix + col, col)
            else:
                raise ValueError(
                    f"`neg sampling by` with dl_format [{self.dl_format}] not been implemented."
                )
        elif self.neg_sample_args["strategy"] != "none":
            raise ValueError(
                f'`neg_sample_args` [{self.neg_sample_args["strategy"]}] is not supported!'
            )

    def _neg_sampling(self, inter_feat: Interaction) -> Interaction:
        if getattr(self, "device_neg_sampling", False):
            # negatives are drawn inside the jitted train step
            # (ops/neg_sampling.py); the loader ships raw positives only
            return inter_feat
        if self.neg_sample_args.get("dynamic", "none") not in (None, "none"):
            return self._dynamic_neg_sampling(inter_feat)
        if self.neg_sample_args["strategy"] == "by":
            user_ids = np.asarray(inter_feat[self.uid_field])
            item_ids = np.asarray(inter_feat[self.iid_field])
            neg_item_ids = self.sampler.sample_by_user_ids(
                user_ids, item_ids, self.neg_sample_num
            )
            return self.sampling_func(inter_feat, neg_item_ids)
        return inter_feat

    def _dynamic_neg_sampling(self, inter_feat: Interaction) -> Interaction:
        """Hard-negative mining: score candidate_num× candidates with the
        current model and keep the max (reference abstract_dataloader.py
        :157-180)."""
        candidate_num = self.neg_sample_args["dynamic"]
        user_ids = np.asarray(inter_feat[self.uid_field])
        item_ids = np.asarray(inter_feat[self.iid_field])
        neg_candidate_ids = self.sampler.sample_by_user_ids(
            user_ids, item_ids, self.neg_sample_num * candidate_num
        )
        interaction = copy.deepcopy(inter_feat)
        interaction = interaction.repeat(self.neg_sample_num * candidate_num)
        interaction.update(Interaction({self.iid_field: neg_candidate_ids}))
        scores = np.asarray(self.model.score_batch(interaction)).reshape(candidate_num, -1)
        indices = scores.argmax(axis=0)
        neg_candidate_ids = neg_candidate_ids.reshape(candidate_num, -1)
        neg_item_ids = neg_candidate_ids[indices, np.arange(neg_candidate_ids.shape[1])].reshape(-1)
        return self.sampling_func(inter_feat, neg_item_ids)

    def _neg_sample_by_pair_wise_sampling(self, inter_feat, neg_item_ids):
        inter_feat = inter_feat.repeat(self.times)
        neg_item_feat = Interaction({self.iid_field: neg_item_ids})
        neg_item_feat = self.dataset.join(neg_item_feat)
        neg_item_feat.add_prefix(self.neg_prefix)
        inter_feat.update(neg_item_feat)
        return inter_feat

    def _neg_sample_by_point_wise_sampling(self, inter_feat, neg_item_ids):
        pos_inter_num = len(inter_feat)
        new_data = inter_feat.repeat(self.times)
        new_data[self.iid_field][pos_inter_num:] = neg_item_ids
        new_data = self.dataset.join(new_data)
        labels = np.zeros(pos_inter_num * self.times, dtype=np.float32)
        labels[:pos_inter_num] = 1.0
        new_data.update(Interaction({self.label_field: labels}))
        return new_data


class TrainDataLoader(NegSampleDataLoader):
    def __init__(self, config, dataset, sampler, shuffle=False):
        self._set_neg_sample_args(
            config, dataset, config["MODEL_INPUT_TYPE"], config["train_neg_sample_args"]
        )
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        batch_size = self.config["train_batch_size"]
        if self.neg_sample_args["strategy"] == "by":
            batch_num = max(batch_size // self.times, 1)
            self.step = batch_num
            self.set_batch_size(batch_num * self.times)
        else:
            self.step = batch_size
            self.set_batch_size(batch_size)

    def update_config(self, config):
        self._set_neg_sample_args(
            config, self.dataset, config["MODEL_INPUT_TYPE"], config["train_neg_sample_args"]
        )
        super().update_config(config)

    @property
    def pr_end(self):
        return len(self.dataset)

    def _shuffle(self):
        self.dataset.shuffle()

    def _next_batch_data(self):
        cur_data = self._neg_sampling(self.dataset[self.pr : self.pr + self.step])
        self.pr += self.step
        return cur_data


class NegSampleEvalDataLoader(NegSampleDataLoader):
    """Sampled eval (e.g. uni100): one user's rows never straddle batches."""

    def __init__(self, config, dataset, sampler, shuffle=False):
        self._set_neg_sample_args(
            config, dataset, InputType.POINTWISE, config["eval_neg_sample_args"]
        )
        if self.neg_sample_args["strategy"] == "by":
            user_num = dataset.user_num
            dataset.sort(by=dataset.uid_field, ascending=True)
            self.uid_list = []
            start, end = {}, {}
            for i, uid in enumerate(np.asarray(dataset.inter_feat[dataset.uid_field])):
                if uid not in start:
                    self.uid_list.append(uid)
                    start[uid] = i
                end[uid] = i
            self.uid2index = np.array([None] * user_num)
            self.uid2items_num = np.zeros(user_num, dtype=np.int64)
            for uid in self.uid_list:
                self.uid2index[uid] = slice(start[uid], end[uid] + 1)
                self.uid2items_num[uid] = end[uid] - start[uid] + 1
            self.uid_list = np.array(self.uid_list)
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        batch_size = self.config["eval_batch_size"]
        if self.neg_sample_args["strategy"] == "by":
            # Greedily pack whole users (each user costs rows × times) until
            # the batch budget is exhausted (reference :102-117).
            inters_num = sorted(self.uid2items_num * self.times, reverse=True)
            batch_num = 1
            new_batch_size = inters_num[0]
            for i in range(1, len(inters_num)):
                if new_batch_size + inters_num[i] > batch_size:
                    break
                batch_num = i + 1
                new_batch_size += inters_num[i]
            self.step = batch_num
            self.set_batch_size(new_batch_size)
        else:
            self.step = batch_size
            self.set_batch_size(batch_size)

    def update_config(self, config):
        self._set_neg_sample_args(
            config, self.dataset, InputType.POINTWISE, config["eval_neg_sample_args"]
        )
        super().update_config(config)

    @property
    def pr_end(self):
        if self.neg_sample_args["strategy"] == "by":
            return len(self.uid_list)
        return len(self.dataset)

    def _shuffle(self):
        self.logger.warning("NegSampleEvalDataLoader can't shuffle")

    def _next_batch_data(self):
        if self.neg_sample_args["strategy"] == "by":
            uid_list = self.uid_list[self.pr : self.pr + self.step]
            data_list, idx_list, positive_u = [], [], []
            positive_i = []
            for idx, uid in enumerate(uid_list):
                index = self.uid2index[uid]
                data_list.append(self._neg_sampling(self.dataset[index]))
                idx_list += [idx] * (self.uid2items_num[uid] * self.times)
                positive_u += [idx] * self.uid2items_num[uid]
                positive_i.append(np.asarray(self.dataset[index][self.iid_field]))
            cur_data = cat_interactions(data_list)
            idx_list = np.array(idx_list, dtype=np.int64)
            positive_u = np.array(positive_u, dtype=np.int64)
            positive_i = np.concatenate(positive_i).astype(np.int64)
            self.pr += self.step
            return cur_data, idx_list, positive_u, positive_i
        cur_data = self._neg_sampling(self.dataset[self.pr : self.pr + self.step])
        self.pr += self.step
        return cur_data, None, None, None


class FullSortEvalDataLoader(AbstractDataLoader):
    def __init__(self, config, dataset, sampler, shuffle=False):
        self.uid_field = dataset.uid_field
        self.iid_field = dataset.iid_field
        self.is_sequential = config["MODEL_TYPE"] == ModelType.SEQUENTIAL
        if not self.is_sequential:
            user_num = dataset.user_num
            self.uid_list = []
            self.uid2items_num = np.zeros(user_num, dtype=np.int64)
            self.uid2positive_item = np.array([None] * user_num)
            self.uid2history_item = np.array([None] * user_num)

            dataset.sort(by=self.uid_field, ascending=True)
            uids = np.asarray(dataset.inter_feat[self.uid_field])
            iids = np.asarray(dataset.inter_feat[self.iid_field])
            # used ids come from the phase sampler as a sorted key array;
            # samplers without accumulated history (Repeatable) contribute none
            used_keys = getattr(sampler, "_used_keys", np.array([], dtype=np.uint64))
            item_num = dataset.item_num

            boundaries = np.nonzero(np.diff(uids, prepend=uids[0] - 1))[0]
            for i, s in enumerate(boundaries):
                e = boundaries[i + 1] if i + 1 < len(boundaries) else len(uids)
                uid = int(uids[s])
                positive = np.unique(iids[s:e])
                lo = np.searchsorted(used_keys, np.uint64(uid) * np.uint64(item_num))
                hi = np.searchsorted(used_keys, np.uint64(uid + 1) * np.uint64(item_num))
                used = (used_keys[lo:hi] % np.uint64(item_num)).astype(np.int64)
                history = np.setdiff1d(used, positive, assume_unique=True)
                self.uid_list.append(uid)
                self.uid2positive_item[uid] = positive.astype(np.int64)
                self.uid2items_num[uid] = len(positive)
                self.uid2history_item[uid] = history
            self.uid_list = np.array(self.uid_list, dtype=np.int64)
            self.user_df = dataset.join(Interaction({self.uid_field: self.uid_list}))
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        batch_size = self.config["eval_batch_size"]
        if not self.is_sequential:
            batch_num = max(batch_size // self.dataset.item_num, 1)
            self.step = batch_num
            self.set_batch_size(batch_num * self.dataset.item_num)
        else:
            self.step = batch_size
            self.set_batch_size(batch_size)

    @property
    def pr_end(self):
        if not self.is_sequential:
            return len(self.uid_list)
        return len(self.dataset)

    def _shuffle(self):
        self.logger.warning("FullSortEvalDataLoader can't shuffle")

    def _next_batch_data(self):
        if not self.is_sequential:
            user_df = self.user_df[self.pr : self.pr + self.step]
            uid_list = np.asarray(user_df[self.uid_field])

            history_item = self.uid2history_item[uid_list]
            positive_item = self.uid2positive_item[uid_list]

            history_u = np.concatenate(
                [np.full(len(h), i, dtype=np.int64) for i, h in enumerate(history_item)]
            ) if len(history_item) else np.array([], dtype=np.int64)
            history_i = (
                np.concatenate(list(history_item)).astype(np.int64)
                if len(history_item)
                else np.array([], dtype=np.int64)
            )
            positive_u = np.concatenate(
                [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(positive_item)]
            )
            positive_i = np.concatenate(list(positive_item)).astype(np.int64)

            self.pr += self.step
            return user_df, (history_u, history_i), positive_u, positive_i
        interaction = self.dataset[self.pr : self.pr + self.step]
        inter_num = len(interaction)
        positive_u = np.arange(inter_num, dtype=np.int64)
        positive_i = np.asarray(interaction[self.iid_field])
        self.pr += self.step
        return interaction, None, positive_u, positive_i


class UserDataLoader(AbstractDataLoader):
    """Yields batches of all user ids (reference user_dataloader.py)."""

    def __init__(self, config, dataset, sampler, shuffle=False):
        if shuffle is False:
            shuffle = True
        self.uid_field = dataset.uid_field
        self.user_list = Interaction({self.uid_field: np.arange(dataset.user_num)})
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        batch_size = self.config["train_batch_size"]
        self.step = batch_size
        self.set_batch_size(batch_size)

    @property
    def pr_end(self):
        return len(self.user_list)

    def _shuffle(self):
        self.user_list.shuffle()

    def _next_batch_data(self):
        cur_data = self.user_list[self.pr : self.pr + self.step]
        self.pr += self.step
        return cur_data


class FOCFDataLoader(TrainDataLoader):
    """Item-grouped batches for FOCF's per-item group-mean penalties.

    Interactions are sorted by item; each batch accumulates *all* rows of
    randomly drawn items until at least ``step`` rows are gathered
    (reference focf_dataloader.py:17-51) so item×group means are computed
    over every occurrence of an item.
    """

    def __init__(self, config, dataset, sampler, shuffle=False):
        super().__init__(config, dataset, sampler, shuffle=False)
        dataset.sort(by=dataset.iid_field, ascending=True)
        iids = np.asarray(dataset.inter_feat[dataset.iid_field])
        self._iids_sorted = iids
        # start/end row of every distinct item id (rows are item-sorted)
        boundaries = np.nonzero(np.diff(iids, prepend=iids[0] - 1))[0]
        self._item_uniques = iids[boundaries]
        self._item_starts = boundaries
        self._item_ends = np.append(boundaries[1:], len(iids))
        self._max_group = int((self._item_ends - self._item_starts).max())

    @property
    def max_batch_rows(self):
        # a batch stops once >= step rows are taken, so the worst case is
        # step-1 rows plus one whole item group
        return self.step - 1 + self._max_group

    @property
    def pr_end(self):
        return len(self.dataset)

    def _shuffle(self):
        pass  # item draw below is already random per batch

    def _next_batch_data(self):
        # Draw distinct random items (fresh pool each batch, as in the
        # reference) and take every interaction of each drawn item until the
        # row budget is met.
        n_groups = len(self._item_uniques)
        perm = np.random.permutation(n_groups)
        rows, taken, i = [], 0, 0
        while taken < self.step and i < n_groups:
            g = perm[i]
            s, e = self._item_starts[g], self._item_ends[g]
            rows.append(np.arange(s, e))
            taken += e - s
            i += 1
        index = np.concatenate(rows)
        cur_data = self._neg_sampling(self.dataset[index])
        self.pr += self.step
        return cur_data

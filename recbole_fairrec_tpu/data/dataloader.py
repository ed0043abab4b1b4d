"""Batch producers for training and evaluation.

Behavioral parity targets (payloads, batch-size rules, RNG call order):
recbole/data/dataloader/{abstract,general,user,focf}_dataloader.py. The
design here is the TPU build's own: loaders are thin cursors over
**precomputed flat segment structures** (`_UserSegments`, CSR-style
positive/history arrays) so per-batch work is array slicing — no per-user
python set/dict walks — and every loader advertises ``max_batch_rows`` so
the trainer can pad each batch to ONE static device shape.

Payload contracts kept bit-compatible with the reference:

* ``TrainDataLoader`` — raw-row batches of ``train_batch_size // times``
  rows, expanded by the negative-sampling strategy (pairwise ``neg_*``
  columns / pointwise pos+neg stacking with 1/0 labels);
* ``NegSampleEvalDataLoader`` — whole-user batches (a user's rows never
  straddle a batch); yields (Interaction, row_idx, positive_u, positive_i);
  negatives drawn through one sampler call PER USER, in user order, so the
  numpy RNG stream matches the reference run for run;
* ``FullSortEvalDataLoader`` — yields (user_df, (history_u, history_i),
  positive_u, positive_i) with history = used − positive;
* ``FOCFDataLoader`` — item-grouped batches (all interactions of randomly
  drawn items until the row budget fills);
* ``UserDataLoader`` — shuffled batches of every user id.

Columns are numpy; device transfer happens in the trainer's jitted step.
"""

from __future__ import annotations

import copy
import math
from logging import getLogger

import numpy as np

from ..utils import FeatureSource, FeatureType, InputType, ModelType
from .interaction import Interaction, cat_interactions


# --------------------------------------------------------------------------
# flat per-user segment structures
# --------------------------------------------------------------------------


class _UserSegments:
    """Row segments of a uid-sorted interaction table, as flat arrays.

    ``uid[j]`` owns rows ``lo[j]:hi[j]`` of the sorted table. Replaces the
    reference's per-user dict/slice bookkeeping with vectorized boundary
    math; every per-batch quantity below is a contiguous slice.
    """

    __slots__ = ("uid", "lo", "hi")

    def __init__(self, uid, lo, hi):
        self.uid, self.lo, self.hi = uid, lo, hi

    @classmethod
    def from_sorted(cls, uids):
        if len(uids) == 0:
            z = np.array([], dtype=np.int64)
            return cls(z, z.copy(), z.copy())
        bounds = np.nonzero(np.diff(uids, prepend=uids[0] - 1))[0]
        return cls(
            uids[bounds].astype(np.int64),
            bounds.astype(np.int64),
            np.append(bounds[1:], len(uids)).astype(np.int64),
        )

    def __len__(self):
        return len(self.uid)

    @property
    def rows(self):
        """Row count per segment."""
        return self.hi - self.lo


def _greedy_user_budget(rows_per_user, budget):
    """How many whole users fit a row budget, sized against the worst case.

    Reference rule (general_dataloader.py:102-117): sort per-user costs
    descending, take users while the running sum stays within ``budget``
    (always at least one). Vectorized: one sort + cumsum + searchsorted.

    Returns (users_per_batch, worst_case_rows).
    """
    desc = np.sort(np.asarray(rows_per_user))[::-1]
    cum = np.cumsum(desc)
    n = max(int(np.searchsorted(cum, budget, side="right")), 1)
    return n, int(cum[n - 1])


# --------------------------------------------------------------------------
# negative-sampling strategy (expansion layout of a raw-row block)
# --------------------------------------------------------------------------


class _NegSpec:
    """Resolved negative-sampling strategy for one loader.

    Owns the expansion factor (``times``) and the block-expansion layout;
    the loader stays a pure cursor. Layout parity:
    abstract_dataloader.py:175-198 (pairwise neg_* columns / pointwise
    whole-block tiling with the item column rewritten and 1/0 labels).
    """

    def __init__(self, config, dataset, dl_format, neg_sample_args):
        self.dl_format = dl_format
        self.args = neg_sample_args
        self.strategy = neg_sample_args.get("strategy", "none")
        self.times = 1
        if self.strategy == "by":
            self.sample_num = neg_sample_args["by"]
            if dl_format == InputType.POINTWISE:
                self.times = 1 + self.sample_num
                self.label_field = config["LABEL_FIELD"]
                dataset.set_field_property(
                    self.label_field, FeatureType.FLOAT, FeatureSource.INTERACTION, 1
                )
            elif dl_format == InputType.PAIRWISE:
                self.times = self.sample_num
                self.neg_prefix = config["NEG_PREFIX"]
                item_cols = (
                    [dataset.iid_field]
                    if dataset.item_feat is None
                    else list(dataset.item_feat.columns)
                )
                for col in item_cols:
                    dataset.copy_field_property(self.neg_prefix + col, col)
            else:
                raise ValueError(
                    f"`neg sampling by` with dl_format [{dl_format}] not been implemented."
                )
        elif self.strategy != "none":
            raise ValueError(f"`neg_sample_args` [{self.strategy}] is not supported!")

    def expand(self, dataset, block, neg_item_ids):
        if self.dl_format == InputType.PAIRWISE:
            return self._pairwise(dataset, block, neg_item_ids)
        return self._pointwise(dataset, block, neg_item_ids)

    def _pairwise(self, dataset, block, neg_item_ids):
        out = block.repeat(self.times)
        neg_feat = dataset.join(Interaction({dataset.iid_field: neg_item_ids}))
        neg_feat.add_prefix(self.neg_prefix)
        out.update(neg_feat)
        return out

    def _pointwise(self, dataset, block, neg_item_ids):
        n_pos = len(block)
        out = block.repeat(self.times)
        out[dataset.iid_field][n_pos:] = neg_item_ids
        out = dataset.join(out)
        labels = np.zeros(n_pos * self.times, dtype=np.float32)
        labels[:n_pos] = 1.0
        out.update(Interaction({self.label_field: labels}))
        return out


# --------------------------------------------------------------------------
# cursor base
# --------------------------------------------------------------------------


class AbstractDataLoader:
    """pr/step cursor protocol (reference abstract_dataloader.py:25-107)."""

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
            if getattr(self, "_skip_next_shuffle", False):
                # one-shot: the trainer's understaged-epoch retry already
                # holds a correctly-shuffled order (see _run_epoch)
                self._skip_next_shuffle = False
            else:
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


class _NegSamplingLoader(AbstractDataLoader):
    """Shared negative-sampling plumbing for train/sampled-eval cursors."""

    def _bind_neg_spec(self, config, dataset, dl_format, neg_sample_args):
        self.uid_field = dataset.uid_field
        self.iid_field = dataset.iid_field
        self.neg_spec = _NegSpec(config, dataset, dl_format, neg_sample_args)
        # on-device sampling supported for the pairwise 1-negative shape
        self.device_neg_sampling = bool(
            config["device_neg_sampling"]
            and dl_format == InputType.PAIRWISE
            and self.neg_spec.strategy == "by"
            and neg_sample_args.get("by") == 1
            and neg_sample_args.get("dynamic", "none") in (None, "none")
        )

    # kept as properties: trainer/tests introspect these
    @property
    def dl_format(self):
        return self.neg_spec.dl_format

    @property
    def times(self):
        return self.neg_spec.times

    @property
    def neg_sample_args(self):
        return self.neg_spec.args

    @property
    def neg_sample_num(self):
        return self.neg_spec.sample_num

    @property
    def neg_item_id(self):
        return self.neg_spec.neg_prefix + self.iid_field

    def _neg_sampling(self, block: Interaction) -> Interaction:
        if getattr(self, "device_neg_sampling", False):
            # negatives are drawn inside the jitted train step
            # (ops/neg_sampling.py); the loader ships raw positives only
            return block
        if self.neg_spec.args.get("dynamic", "none") not in (None, "none"):
            return self._mine_hard_negatives(block)
        if self.neg_spec.strategy == "by":
            users = np.asarray(block[self.uid_field])
            items = np.asarray(block[self.iid_field])
            negs = self.sampler.sample_by_user_ids(users, items, self.neg_spec.sample_num)
            return self.neg_spec.expand(self.dataset, block, negs)
        return block

    def _mine_hard_negatives(self, block: Interaction) -> Interaction:
        """Score candidate_num× candidates with the live model, keep the max
        (reference abstract_dataloader.py:157-180)."""
        candidate_num = self.neg_spec.args["dynamic"]
        users = np.asarray(block[self.uid_field])
        items = np.asarray(block[self.iid_field])
        n_draw = self.neg_spec.sample_num * candidate_num
        candidates = self.sampler.sample_by_user_ids(users, items, n_draw)
        scored = copy.deepcopy(block).repeat(n_draw)
        scored.update(Interaction({self.iid_field: candidates}))
        scores = np.asarray(self.model.score_batch(scored)).reshape(candidate_num, -1)
        grid = candidates.reshape(candidate_num, -1)
        hardest = grid[scores.argmax(axis=0), np.arange(grid.shape[1])].reshape(-1)
        return self.neg_spec.expand(self.dataset, block, hardest)


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------


class TrainDataLoader(_NegSamplingLoader):
    def __init__(self, config, dataset, sampler, shuffle=False):
        self._bind_neg_spec(
            config, dataset, config["MODEL_INPUT_TYPE"], config["train_neg_sample_args"]
        )
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        budget = self.config["train_batch_size"]
        if self.neg_spec.strategy == "by":
            # raw rows per batch so the EXPANDED batch fits the budget
            # (general_dataloader.py:40-49)
            self.step = max(budget // self.neg_spec.times, 1)
            self.set_batch_size(self.step * self.neg_spec.times)
        else:
            self.step = budget
            self.set_batch_size(budget)

    def update_config(self, config):
        self._bind_neg_spec(
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


# --------------------------------------------------------------------------
# sampled evaluation (e.g. uni100)
# --------------------------------------------------------------------------


class NegSampleEvalDataLoader(_NegSamplingLoader):
    """Sampled eval: one user's rows never straddle a batch.

    The uid-sorted table is segmented once (`_UserSegments`); a batch is the
    next ``step`` segments. Negatives are drawn with one sampler call per
    user IN USER ORDER — the numpy RNG stream is part of the reference
    parity surface (general_dataloader.py:119-158) and must not be fused
    into one vectorized draw.
    """

    def __init__(self, config, dataset, sampler, shuffle=False):
        self._bind_neg_spec(
            config, dataset, InputType.POINTWISE, config["eval_neg_sample_args"]
        )
        if self.neg_spec.strategy == "by":
            dataset.sort(by=dataset.uid_field, ascending=True)
            self.segments = _UserSegments.from_sorted(
                np.asarray(dataset.inter_feat[dataset.uid_field])
            )
            self.uid_list = self.segments.uid
        self._expand_cache = {}
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        budget = self.config["eval_batch_size"]
        if self.neg_spec.strategy == "by":
            users, worst = _greedy_user_budget(
                self.segments.rows * self.neg_spec.times, budget
            )
            self.step = users
            self.set_batch_size(worst)
        else:
            self.step = budget
            self.set_batch_size(budget)

    def update_config(self, config):
        self._bind_neg_spec(
            config, self.dataset, InputType.POINTWISE, config["eval_neg_sample_args"]
        )
        super().update_config(config)

    def set_macro_rows(self, target_rows):
        """Raise the cursor step so ONE batch holds as many whole users as
        fit ``target_rows`` expanded rows. Called by the trainer's fused
        eval path: per-user sampler draws and per-user metric math are
        batch-size independent, so macro-sizing here removes thousands of
        tiny slice/join/assembly rounds without touching the RNG stream or
        the metric values. Users split into near-equal chunks so at most
        two padded device shapes arise."""
        if self.neg_spec.strategy != "by" or not len(self.segments):
            return
        rows = (self.segments.hi - self.segments.lo) * self.neg_spec.times
        total = int(rows.sum())
        n_chunks = max(1, -(-total // int(target_rows)))
        step = -(-len(self.segments) // n_chunks)
        worst = max(
            int(rows[k : k + step].sum()) for k in range(0, len(rows), step)
        )
        if step != self.step:
            self._expand_cache.clear()
        self.step = step
        self.set_batch_size(worst)
        # batches are already dispatch-sized: the trainer's macro merger
        # must pass them through instead of re-concatenating
        self._macro_sized = True

    def reset_macro_rows(self):
        """Undo set_macro_rows: restore the config-derived step/batch_size.

        Called by the trainer when an evaluation cannot take the fused
        path — without this, the sticky macro sizing would feed worst-case
        macro batches (millions of rows) to the host scoring path, which
        was never sized for them (ADVICE r4)."""
        if not getattr(self, "_macro_sized", False):
            return
        old_step = self.step
        self._init_batch_size_and_step()
        if self.step != old_step:
            self._expand_cache.clear()
        self._macro_sized = False

    @property
    def pr_end(self):
        if self.neg_spec.strategy == "by":
            return len(self.segments)
        return len(self.dataset)

    def _shuffle(self):
        self.logger.warning("NegSampleEvalDataLoader can't shuffle")

    def _next_batch_data(self):
        if self.neg_spec.strategy != "by":
            cur_data = self._neg_sampling(self.dataset[self.pr : self.pr + self.step])
            self.pr += self.step
            return cur_data, None, None, None

        j0, j1 = self.pr, min(self.pr + self.step, len(self.segments))
        lo, hi = self.segments.lo[j0:j1], self.segments.hi[j0:j1]
        base = int(lo[0])
        times = self.neg_spec.times
        sample_num = self.neg_spec.sample_num

        # Layout parity with _NegSpec._pointwise: per user the positive
        # block tiled `times` times, the item column of the copies
        # rewritten with that user's draws, labels 1 for the first block.
        # tiles[r] = local_start_u + (within-block index mod cnt_u), fully
        # vectorized (no per-user tile+concat). Everything except the
        # negative draws is a pure function of the (static) segment
        # geometry, so the expansion skeleton is cached per batch window —
        # repeated evaluates (every valid epoch) redo only the draws and
        # the item column.
        cache_key = (j0, j1, times)
        skel = self._expand_cache.get(cache_key)
        if skel is None:
            counts = (hi - lo).astype(np.int64)
            tbl = self.dataset[base : int(hi[-1])]  # one joined slice
            users_all = np.asarray(tbl[self.uid_field])
            items_all = np.asarray(tbl[self.iid_field])
            rows_per_user = counts * times
            total = int(rows_per_user.sum())
            block_off = np.concatenate([[0], np.cumsum(rows_per_user)])[:-1]
            within = np.arange(total) - np.repeat(block_off, rows_per_user)
            cnt_rows = np.repeat(counts, rows_per_user)
            tiles = np.repeat(lo - base, rows_per_user) + within % cnt_rows
            fields = {k: np.asarray(v)[tiles] for k, v in tbl.interaction.items()}
            labels = (within < cnt_rows).astype(np.float32)
            local = np.arange(j1 - j0, dtype=np.int64)
            skel = {
                "fields": fields,
                "labels": labels,
                "neg_mask": within >= cnt_rows,
                "users_all": users_all,
                "items_all": items_all,
                "row_idx": np.repeat(local, rows_per_user),
                "positive_u": np.repeat(local, counts),
                # rows are uid-sorted: the batch positives are the slice
                "positive_i": items_all.astype(np.int64),
            }
            # the cached arrays are shared BY REFERENCE across every batch
            # emitted for this window (and across epochs); freeze them so an
            # accidental in-place write fails loudly instead of silently
            # corrupting later batches (ADVICE r4)
            for arr in skel["fields"].values():
                arr.setflags(write=False)
            for key in ("labels", "neg_mask", "users_all", "items_all",
                        "row_idx", "positive_u", "positive_i"):
                skel[key].setflags(write=False)
            self._expand_cache[cache_key] = skel

        # negatives are still drawn with one sampler call per user IN USER
        # ORDER (the numpy RNG stream is reference parity surface,
        # general_dataloader.py:119-158)
        draw_one = getattr(self.sampler, "sample_one_key", None)
        if draw_one is not None:
            # identical draw sequence, ~2× less per-call python overhead
            # (this loop IS the uni100 eval wall-time floor; see bench.py)
            uids = self.segments.uid[j0:j1]
            negs = [
                draw_one(int(u), int(h - l) * sample_num)
                for u, l, h in zip(uids, lo, hi)
            ]
        else:
            users_all_k, items_all_k = skel["users_all"], skel["items_all"]
            negs = [
                self.sampler.sample_by_user_ids(
                    users_all_k[int(l) - base : int(h) - base],
                    items_all_k[int(l) - base : int(h) - base],
                    sample_num,
                )
                for l, h in zip(lo, hi)
            ]

        fields = dict(skel["fields"])
        item_col = skel["fields"][self.iid_field].copy()
        item_col[skel["neg_mask"]] = np.concatenate(negs)
        fields[self.iid_field] = item_col
        out = Interaction(fields)
        out.update(Interaction({self.neg_spec.label_field: skel["labels"]}))
        if self.dataset.item_feat is not None:
            # attach item features for the rewritten negative ids; when
            # there are none, tbl's join already carried every feat column
            out = self.dataset.join(out)

        self.pr += self.step
        return out, skel["row_idx"], skel["positive_u"], skel["positive_i"]


# --------------------------------------------------------------------------
# full-sort evaluation
# --------------------------------------------------------------------------


class FullSortEvalDataLoader(AbstractDataLoader):
    """Full-catalog eval over CSR-flat positive/history structures.

    Per evaluated user the reference keeps python sets (general_dataloader
    .py:161-253); here positives and histories live in two flat (indptr,
    values) array pairs built vectorized at construction, and a batch's
    payload is four contiguous slices — O(1) python work per batch.
    """

    def __init__(self, config, dataset, sampler, shuffle=False):
        self.uid_field = dataset.uid_field
        self.iid_field = dataset.iid_field
        self.is_sequential = config["MODEL_TYPE"] == ModelType.SEQUENTIAL
        if not self.is_sequential:
            dataset.sort(by=self.uid_field, ascending=True)
            uids = np.asarray(dataset.inter_feat[self.uid_field])
            iids = np.asarray(dataset.inter_feat[self.iid_field])
            item_num = np.uint64(dataset.item_num)

            # positives: unique (uid, iid) pairs of this split, CSR by user
            pair_keys = np.unique(
                uids.astype(np.uint64) * item_num + iids.astype(np.uint64)
            )
            pos_uid = (pair_keys // item_num).astype(np.int64)
            self._pos_items = (pair_keys % item_num).astype(np.int64)
            self.uid_list = np.unique(pos_uid)
            self._pos_indptr = np.searchsorted(
                pos_uid, np.append(self.uid_list, self.uid_list[-1] + 1)
            )

            # history: the phase sampler's used pairs minus this split's
            # positives, for evaluated users only (sorted-key set difference)
            used_keys = np.asarray(
                getattr(sampler, "_used_keys", np.array([], dtype=np.uint64)),
                dtype=np.uint64,
            )
            if len(used_keys):
                used_uid = (used_keys // item_num).astype(np.int64)
                keep = np.isin(used_uid, self.uid_list)
                pos_hit = np.searchsorted(pair_keys, used_keys)
                pos_hit = np.clip(pos_hit, 0, len(pair_keys) - 1)
                keep &= pair_keys[pos_hit] != used_keys
                hist_keys = used_keys[keep]
            else:
                hist_keys = used_keys
            hist_uid = (hist_keys // item_num).astype(np.int64)
            self._hist_items = (hist_keys % item_num).astype(np.int64)
            self._hist_indptr = np.searchsorted(
                hist_uid, np.append(self.uid_list, self.uid_list[-1] + 1)
            )

            self.user_df = dataset.join(Interaction({self.uid_field: self.uid_list}))
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        budget = self.config["eval_batch_size"]
        if not self.is_sequential:
            # one user's full-sort row costs |I| scores
            self.step = max(budget // self.dataset.item_num, 1)
            self.set_batch_size(self.step * self.dataset.item_num)
        else:
            self.step = budget
            self.set_batch_size(budget)

    @property
    def pr_end(self):
        if not self.is_sequential:
            return len(self.uid_list)
        return len(self.dataset)

    @property
    def max_history_len(self):
        """Longest history any evaluated user carries (streaming-eval k')."""
        if self.is_sequential or not len(self.uid_list):
            return 0
        return int(np.diff(self._hist_indptr).max(initial=0))

    def history_items(self, uids):
        """History item arrays for the given user ids (case-study surface)."""
        pos = np.searchsorted(self.uid_list, np.asarray(uids))
        return [
            self._hist_items[self._hist_indptr[p] : self._hist_indptr[p + 1]]
            for p in pos
        ]

    def _shuffle(self):
        self.logger.warning("FullSortEvalDataLoader can't shuffle")

    def _next_batch_data(self):
        if self.is_sequential:
            interaction = self.dataset[self.pr : self.pr + self.step]
            positive_u = np.arange(len(interaction), dtype=np.int64)
            positive_i = np.asarray(interaction[self.iid_field])
            self.pr += self.step
            return interaction, None, positive_u, positive_i

        j0, j1 = self.pr, min(self.pr + self.step, len(self.uid_list))
        user_df = self.user_df[j0:j1]
        local = np.arange(j1 - j0, dtype=np.int64)

        p0, p1 = self._pos_indptr[j0], self._pos_indptr[j1]
        positive_u = np.repeat(local, np.diff(self._pos_indptr[j0 : j1 + 1]))
        positive_i = self._pos_items[p0:p1]

        h0, h1 = self._hist_indptr[j0], self._hist_indptr[j1]
        history_u = np.repeat(local, np.diff(self._hist_indptr[j0 : j1 + 1]))
        history_i = self._hist_items[h0:h1]

        self.pr += self.step
        return user_df, (history_u, history_i), positive_u, positive_i


# --------------------------------------------------------------------------
# auxiliary loaders
# --------------------------------------------------------------------------


class UserDataLoader(AbstractDataLoader):
    """Shuffled batches of every user id (reference user_dataloader.py)."""

    def __init__(self, config, dataset, sampler, shuffle=False):
        if shuffle is False:
            shuffle = True
        self.uid_field = dataset.uid_field
        self.user_list = Interaction({self.uid_field: np.arange(dataset.user_num)})
        super().__init__(config, dataset, sampler, shuffle=shuffle)

    def _init_batch_size_and_step(self):
        self.step = self.config["train_batch_size"]
        self.set_batch_size(self.step)

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

    Rows are item-sorted and segmented once; each batch takes every row of
    freshly drawn random items until at least ``step`` rows are gathered
    (reference focf_dataloader.py:17-51), so item×group means always see an
    item's full occurrence set.
    """

    def __init__(self, config, dataset, sampler, shuffle=False):
        super().__init__(config, dataset, sampler, shuffle=False)
        dataset.sort(by=dataset.iid_field, ascending=True)
        self.item_segments = _UserSegments.from_sorted(
            np.asarray(dataset.inter_feat[dataset.iid_field])
        )

    @property
    def max_batch_rows(self):
        # a batch stops once >= step rows are taken, so the worst case is
        # step-1 rows plus one whole item group
        return self.step - 1 + int(self.item_segments.rows.max(initial=0))

    @property
    def pr_end(self):
        return len(self.dataset)

    def _shuffle(self):
        pass  # item draw below is already random per batch

    def _next_batch_data(self):
        seg = self.item_segments
        order = np.random.permutation(len(seg))
        taken = np.cumsum(seg.rows[order])
        n_groups = int(np.searchsorted(taken, self.step, side="left")) + 1
        chosen = order[:n_groups]
        index = np.concatenate(
            [np.arange(seg.lo[g], seg.hi[g]) for g in chosen]
        )
        cur_data = self._neg_sampling(self.dataset[index])
        self.pr += self.step
        return cur_data

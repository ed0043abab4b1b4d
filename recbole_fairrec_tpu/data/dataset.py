"""Atomic-file Dataset: TSV loading + ETL + split.

Behavioral parity with recbole/data/dataset/dataset.py (1800 LoC) — the ETL
pipeline order is identical (:140-158):

    load → filter (nan ids :624, dup :644, value intervals :803,
    inter-by-user/item :847, k-core loop :670) → remap via factorize with
    [PAD]=0 (:952-974) → user/item feat reindex (:488) → fillna (:554) →
    threshold label (:865) → min-max normalize (:577) → preload weights (:501)

The output container is :class:`Interaction` over numpy arrays; downstream
consumers additionally get **CSR history structures** (`history_csr`) built
once here, replacing the reference's per-user python sets — those are what the
TPU eval path scatters into dense masks.
"""

from __future__ import annotations

import copy as _copy
import os
import pickle
from collections import Counter
from logging import getLogger

import numpy as np
import pandas as pd
import scipy.sparse as sp

from ..utils import FeatureSource, FeatureType, ensure_dir, set_color
from .interaction import Interaction


class Dataset:
    def __init__(self, config):
        self.config = config
        self.dataset_name = config["dataset"]
        self.logger = getLogger()
        self._from_scratch()

    # ------------------------------------------------------------------ load

    def _from_scratch(self):
        self._init_schema()
        self._bind_id_fields()
        self._load_atomic_files(self.dataset_name, self.dataset_path)
        self._init_alias()
        self._run_etl()

    def _init_schema(self):
        cfg = self.config
        self.dataset_path = cfg["data_path"]
        # per-field metadata registries (the reference's field2* contract)
        self.field2type, self.field2source = {}, {}
        self.field2id_token, self.field2token_id = {}, {}
        self.field2seqlen = cfg["seq_len"] or {}
        self.alias, self._preloaded_weight = {}, {}
        self.benchmark_filename_list = cfg["benchmark_filename"]

    def _bind_id_fields(self):
        cfg = self.config
        self.uid_field, self.iid_field = cfg["USER_ID_FIELD"], cfg["ITEM_ID_FIELD"]
        self.label_field, self.time_field = cfg["LABEL_FIELD"], cfg["TIME_FIELD"]
        if (self.uid_field is None) ^ (self.iid_field is None):
            raise ValueError(
                "USER_ID_FIELD and ITEM_ID_FIELD need to be set at the same time "
                "or not set at the same time."
            )

    def _load_atomic_files(self, token, dataset_path):
        if not os.path.exists(dataset_path):
            raise FileNotFoundError(
                f"dataset path [{dataset_path}] does not exist; automatic download "
                "is not available in this environment — place the atomic files there"
            )
        if self.benchmark_filename_list is None:
            self.inter_feat = self._load_feat(
                os.path.join(dataset_path, f"{token}.inter"), FeatureSource.INTERACTION
            )
            if self.inter_feat is None:
                raise ValueError(f"File {token}.inter not exist or empty.")
        else:
            # pre-split benchmark files <token>.<name>.inter, concatenated
            # with per-part sizes recorded for build() (reference :273-289)
            parts, sizes = [], []
            for name in self.benchmark_filename_list:
                path = os.path.join(dataset_path, f"{token}.{name}.inter")
                if not os.path.isfile(path):
                    raise ValueError(f"File {path} not exist.")
                part = self._load_feat(path, FeatureSource.INTERACTION)
                parts.append(part)
                sizes.append(len(part))
            self.inter_feat = pd.concat(parts, ignore_index=True)
            self.file_size_list = sizes
        self.user_feat = self._maybe_load(token, dataset_path, FeatureSource.USER, "user")
        self.item_feat = self._maybe_load(token, dataset_path, FeatureSource.ITEM, "item")
        if self.user_feat is not None and self.uid_field is None:
            raise ValueError("uid_field must be set when user_feat exists")
        if self.item_feat is not None and self.iid_field is None:
            raise ValueError("iid_field must be set when item_feat exists")
        self._load_extra_suffixes(token, dataset_path)

    def _maybe_load(self, token, dataset_path, source, suffix):
        path = os.path.join(dataset_path, f"{token}.{suffix}")
        if not os.path.isfile(path):
            return None
        feat = self._load_feat(path, source)
        if feat is None:
            self.logger.warning(f"No columns loaded from {path}")
        return feat

    def _load_extra_suffixes(self, token, dataset_path):
        """Arbitrary extra atomic files, e.g. ``.item_emb`` preload tables
        (reference :328-350)."""
        if self.config["additional_feat_suffix"] is None:
            return
        for suf in self.config["additional_feat_suffix"]:
            if hasattr(self, f"{suf}_feat"):
                raise ValueError(f"{suf}_feat already exists.")
            path = os.path.join(dataset_path, f"{token}.{suf}")
            if not os.path.isfile(path):
                raise ValueError(f"Additional feature file [{path}] not found.")
            setattr(self, f"{suf}_feat", self._load_feat(path, suf))

    def _column_selection(self, source):
        if isinstance(source, FeatureSource):
            source = source.value
        load_cols = unload_cols = None
        if self.config["load_col"] is not None:
            if source not in self.config["load_col"]:
                load_cols = set()
            elif self.config["load_col"][source] == "*":
                load_cols = None
            else:
                load_cols = set(self.config["load_col"][source])
        if self.config["unload_col"] is not None and source in self.config["unload_col"]:
            unload_cols = set(self.config["unload_col"][source])
        if load_cols is not None and unload_cols is not None:
            raise ValueError(
                f"load_col [{load_cols}] and unload_col [{unload_cols}] "
                "can not be set the same time."
            )
        return load_cols, unload_cols

    def _load_feat(self, filepath, source):
        """Read a headered TSV into a DataFrame (reference :385-454)."""
        load_col, unload_col = self._column_selection(source)
        if load_col == set():
            return None

        sep = self.config["field_separator"]
        encoding = self.config["encoding"] or "utf-8"
        with open(filepath, "r", encoding=encoding) as f:
            head = f.readline().rstrip("\n")

        selected = []  # (bare field name, raw header cell, FeatureType)
        for cell in head.split(sep):
            field, ftype_str = cell.split(":")
            try:
                ftype = FeatureType(ftype_str)
            except ValueError:
                raise ValueError(f"Type {ftype_str} from field {field} is not supported.")
            skip = (load_col is not None and field not in load_col) or (
                unload_col is not None and field in unload_col
            )
            if skip:
                continue
            if isinstance(source, FeatureSource) or source != "link":
                register = {field: (ftype, source)}
                for f, (ft, src) in register.items():
                    self.field2type[f], self.field2source[f] = ft, src
                    if not ftype.value.endswith("seq"):
                        self.field2seqlen[f] = 1
            selected.append((field, cell, ftype))
        columns = [f for f, _, _ in selected]
        usecols = [c for _, c, _ in selected]
        dtype = {c: (np.float64 if ft == FeatureType.FLOAT else str)
                 for _, c, ft in selected}

        if not columns:
            self.logger.warning(f"No columns have been loaded from [{source}]")
            return None

        df = self._read_table(filepath, sep, head, columns, usecols, dtype, encoding)

        seq_sep = self.config["seq_separator"]
        for field in columns:
            ftype = self.field2type[field]
            if not ftype.value.endswith("seq"):
                continue
            df[field] = df[field].fillna("")
            if ftype == FeatureType.TOKEN_SEQ:
                df[field] = [
                    np.array(list(filter(None, str(v).split(seq_sep)))) for v in df[field].values
                ]
            else:
                df[field] = [
                    np.array(list(map(float, filter(None, str(v).split(seq_sep)))))
                    for v in df[field].values
                ]
            self.field2seqlen[field] = max(map(len, df[field].values))
        return df

    def _read_table(self, filepath, sep, head, columns, usecols, dtype, encoding):
        """Parse the atomic file: native single-pass reader when available
        (recbole_fairrec_tpu/native/fast_tsv.cpp), pandas otherwise. Identical output values."""
        use_native = (
            self.config["fast_io"] is not False
            and len(sep) == 1
            and (encoding or "utf-8").lower().replace("-", "") in ("utf8", "ascii")
            and not any(ft.value.endswith("seq") for f, ft in self.field2type.items()
                        if f in columns)
        )
        if use_native:
            from .fast_tsv import read_columns

            header_fields = head.split(sep)
            col_indices = [header_fields.index(uc) for uc in usecols]
            col_is_token = [dtype[uc] is str for uc in usecols]
            parsed = read_columns(filepath, sep, col_indices, col_is_token)
            if parsed is not None:
                return pd.DataFrame(dict(zip(columns, parsed)))
        df = pd.read_csv(
            filepath, delimiter=sep, usecols=usecols, dtype=dtype, encoding=encoding
        )
        df.columns = columns
        return df

    # ----------------------------------------------------------------- alias

    def _register_alias(self, alias_name, default_value):
        configured = self.config[f"alias_of_{alias_name}"] or []
        merged = np.array([f for f in default_value if f] + list(configured))
        _, first_pos = np.unique(merged, return_index=True)
        self.alias[alias_name] = merged[np.sort(first_pos)]  # appearance order

    def _init_alias(self):
        self._register_alias("user_id", [self.uid_field])
        self._register_alias("item_id", [self.iid_field])
        for n1, a1 in self.alias.items():
            for n2, a2 in self.alias.items():
                if n1 != n2 and len(np.intersect1d(a1, a2, assume_unique=True)):
                    raise ValueError(
                        f"alias_of_{n1} and alias_of_{n2} should not overlap."
                    )
        rest = self.token_like_fields
        for alias in self.alias.values():
            rest = np.setdiff1d(rest, alias, assume_unique=True)
        self._rest_fields = rest

    # ------------------------------------------------------------ processing

    def _run_etl(self):
        self.feat_name_list = list(self._collect_feat_names())
        if self.benchmark_filename_list is None:
            self._apply_filters()
        self._remap_all_ids()
        self._reindex_entity_feats()
        self._fill_nan()
        self._binarize_label()
        self._normalize()
        self._stage_preload_weights()

    def _collect_feat_names(self):
        candidates = ["inter_feat", "user_feat", "item_feat"] + [
            f"{suf}_feat" for suf in (self.config["additional_feat_suffix"] or [])
        ]
        return [n for n in candidates if getattr(self, n, None) is not None]

    def _apply_filters(self):
        self._drop_nan_ids()
        self._dedup_inters()
        self._apply_value_intervals()
        self._restrict_to_known_entities()
        self._kcore_filter()
        self._reset_index()

    def _drop_nan_ids(self):
        for field, name in zip([self.uid_field, self.iid_field], ["user", "item"]):
            feat = getattr(self, f"{name}_feat")
            if feat is not None:
                nan_rows = feat.index[feat[field].isnull()]
                if len(nan_rows):
                    feat.drop(nan_rows, inplace=True)
            if field is not None:
                nan_rows = self.inter_feat.index[self.inter_feat[field].isnull()]
                if len(nan_rows):
                    self.inter_feat.drop(nan_rows, inplace=True)

    def _dedup_inters(self):
        keep = self.config["rm_dup_inter"]
        if keep is None:
            return
        if self.time_field in self.inter_feat:
            self.inter_feat.sort_values(
                by=[self.time_field], ascending=True, inplace=True
            )
        self.inter_feat.drop_duplicates(
            subset=[self.uid_field, self.iid_field], keep=keep, inplace=True
        )

    @staticmethod
    def _parse_intervals_str(intervals_str):
        """Parse ``"(0,1];[3,4)"`` into endpoint tuples (reference :762-788)."""
        if intervals_str is None:
            return None
        endpoints = []
        for pair_str in str(intervals_str).split(";"):
            pair_str = pair_str.strip()
            lb, rb = pair_str[0], pair_str[-1]
            pair = pair_str[1:-1].split(",")
            if not (len(pair) == 2 and lb in "([" and rb in ")]"):
                continue
            endpoints.append((lb, float(pair[0]), float(pair[1]), rb))
        return endpoints

    @staticmethod
    def _within_intervals(num, intervals):
        result = None
        for lb, lo, hi, rb in intervals:
            ok = (num >= lo) if lb == "[" else (num > lo)
            ok &= (num <= hi) if rb == "]" else (num < hi)
            result = ok if result is None else (result | ok)
        return result if result is not None else True

    def _apply_value_intervals(self):
        val_intervals = self.config["val_interval"] or {}
        for field, interval in val_intervals.items():
            if field not in self.field2type:
                raise ValueError(f"Field [{field}] not defined in dataset.")
            if self.field2type[field] in (FeatureType.FLOAT, FeatureType.FLOAT_SEQ):
                parsed = self._parse_intervals_str(interval)
                for feat in self.field2feats(field):
                    keep = self._within_intervals(feat[field].values, parsed)
                    feat.drop(feat.index[~keep], inplace=True)
            else:
                for feat in self.field2feats(field):
                    outside = ~feat[field].isin(interval)
                    feat.drop(feat.index[outside], inplace=True)

    def _restrict_to_known_entities(self):
        if self.config["filter_inter_by_user_or_item"] is not True:
            return
        keep = pd.Series(True, index=self.inter_feat.index)
        for feat, key in ((self.user_feat, self.uid_field),
                          (self.item_feat, self.iid_field)):
            if feat is not None:
                keep &= self.inter_feat[key].isin(feat[key].values)
        self.inter_feat.drop(self.inter_feat.index[~keep], inplace=True)

    def _kcore_filter(self):
        """Iterative k-core filtering (reference :670-760)."""
        if None in (self.uid_field, self.iid_field):
            return
        user_interval = self._parse_intervals_str(self.config["user_inter_num_interval"])
        item_interval = self._parse_intervals_str(self.config["item_inter_num_interval"])
        if user_interval is None and item_interval is None:
            return

        user_inter_num = (
            Counter(self.inter_feat[self.uid_field].values) if user_interval else Counter()
        )
        item_inter_num = (
            Counter(self.inter_feat[self.iid_field].values) if item_interval else Counter()
        )

        while True:
            ban_users = self._illegal_ids(
                self.uid_field, self.user_feat, user_inter_num, user_interval
            )
            ban_items = self._illegal_ids(
                self.iid_field, self.item_feat, item_inter_num, item_interval
            )
            if not ban_users and not ban_items:
                break
            if self.user_feat is not None:
                drop = self.user_feat[self.uid_field].isin(ban_users)
                self.user_feat.drop(self.user_feat.index[drop], inplace=True)
            if self.item_feat is not None:
                drop = self.item_feat[self.iid_field].isin(ban_items)
                self.item_feat.drop(self.item_feat.index[drop], inplace=True)

            u_col, i_col = (self.inter_feat[self.uid_field],
                            self.inter_feat[self.iid_field])
            dropped = u_col.isin(ban_users) | i_col.isin(ban_items)
            user_inter_num -= Counter(u_col[dropped].values)
            item_inter_num -= Counter(i_col[dropped].values)
            self.inter_feat.drop(self.inter_feat.index[dropped], inplace=True)

    def _illegal_ids(self, field, feat, inter_num, interval):
        if interval is not None:
            ids = {i for i in inter_num if not self._within_intervals(inter_num[i], interval)}
        else:
            ids = set()
        if feat is not None:
            min_num = interval[0][1] if interval else -1
            for i in feat[field].values:
                if inter_num[i] < min_num:
                    ids.add(i)
        return ids

    def _reset_index(self):
        for name in self.feat_name_list:
            feat = getattr(self, name)
            if feat.empty:
                raise ValueError(
                    "Some feat is empty, please check the filtering settings."
                )
            feat.reset_index(drop=True, inplace=True)

    # ----------------------------------------------------------------- remap

    def _remap_all_ids(self):
        for alias in self.alias.values():
            self._factorize_remap(self._remap_targets(alias))
        for field in self._rest_fields:
            self._factorize_remap(self._remap_targets(np.array([field])))

    def _remap_targets(self, field_list):
        return [
            (feat, field, self.field2type[field])
            for field in field_list
            for feat in self.field2feats(field)
        ]

    def _factorize_remap(self, remap_list):
        """pd.factorize remap with [PAD]=0 (reference :952-974)."""
        if not remap_list:
            return
        flat_chunks = []
        for feat, field, ftype in remap_list:
            col = feat[field].values
            if ftype == FeatureType.TOKEN:
                flat_chunks.append(col)
            elif ftype == FeatureType.TOKEN_SEQ:
                flat_chunks.append(
                    np.concatenate(list(col)) if len(feat) else np.array([])
                )
        chunk_bounds = np.cumsum([len(c) for c in flat_chunks])[:-1]
        codes, vocab = pd.factorize(np.concatenate(flat_chunks))
        per_target = np.split(codes + 1, chunk_bounds)  # shift: [PAD] takes 0
        vocab = np.array(["[PAD]", *vocab])
        lookup = {tok: i for i, tok in enumerate(vocab)}

        for (feat, field, ftype), ids in zip(remap_list, per_target):
            self.field2id_token.setdefault(field, vocab)
            self.field2token_id.setdefault(field, lookup)
            if ftype == FeatureType.TOKEN:
                feat[field] = ids
            elif ftype == FeatureType.TOKEN_SEQ:
                row_bounds = np.cumsum(feat[field].agg(len))[:-1]
                feat[field] = np.split(ids, row_bounds)

    def _reindex_entity_feats(self):
        """Reindex user/item feats over the full [0, num) id range."""
        for attr, key, count in (("user_feat", self.uid_field, self.user_num),
                                 ("item_feat", self.iid_field, self.item_num)):
            feat = getattr(self, attr)
            if feat is not None:
                full_range = pd.DataFrame({key: np.arange(count)})
                setattr(self, attr, pd.merge(full_range, feat, on=key, how="left"))

    def _fill_nan(self):
        for name in self.feat_name_list:
            feat = getattr(self, name)
            for field in feat:
                ftype = self.field2type[field]
                if ftype == FeatureType.TOKEN:
                    feat[field] = feat[field].fillna(0)
                elif ftype == FeatureType.FLOAT:
                    feat[field] = feat[field].fillna(feat[field].mean())
                else:
                    dtype = np.int64 if ftype == FeatureType.TOKEN_SEQ else np.float64
                    feat[field] = feat[field].apply(
                        lambda x: np.array([], dtype=dtype) if isinstance(x, float) else x
                    )

    def _binarize_label(self):
        threshold = self.config["threshold"]
        if threshold is None:
            return
        if len(threshold) != 1:
            raise ValueError("Threshold length should be 1.")
        self.set_field_property(
            self.label_field, FeatureType.FLOAT, FeatureSource.INTERACTION, 1
        )
        for field, value in threshold.items():
            if field not in self.inter_feat:
                raise ValueError(f"Field [{field}] not in inter_feat.")
            self.inter_feat[self.label_field] = (
                self.inter_feat[field] >= value
            ).astype(int)

    def _normalize(self):
        if self.config["normalize_field"] is not None and self.config["normalize_all"] is True:
            raise ValueError("normalize_field and normalize_all can't be set at the same time.")
        if self.config["normalize_field"]:
            fields = self.config["normalize_field"]
            for field in fields:
                if field not in self.field2type:
                    raise ValueError(f"Field [{field}] does not exist.")
        elif self.config["normalize_all"]:
            fields = self.float_like_fields
        else:
            return
        for field in fields:
            ftype = self.field2type[field]
            if ftype not in (FeatureType.FLOAT, FeatureType.FLOAT_SEQ):
                continue
            for feat in self.field2feats(field):
                if ftype == FeatureType.FLOAT:
                    arr = feat[field].values.astype(np.float64)
                    mx, mn = arr.max(), arr.min()
                    feat[field] = np.ones_like(arr) if mx == mn else (arr - mn) / (mx - mn)
                else:
                    flat = np.concatenate(list(feat[field].values))
                    mx, mn = flat.max(), flat.min()
                    normed = np.ones_like(flat) if mx == mn else (flat - mn) / (mx - mn)
                    split_point = np.cumsum(feat[field].agg(len))[:-1]
                    feat[field] = np.split(normed, split_point)

    def _stage_preload_weights(self):
        preload_fields = self.config["preload_weight"]
        if preload_fields is None:
            return
        for pid_field, pv_field in preload_fields.items():
            if pid_field not in self.field2source or pv_field not in self.field2source:
                raise ValueError(
                    f"Preload fields [{pid_field}/{pv_field}] must both exist."
                )
            value_ftype = self.field2type[pv_field]
            token_num = self.num(pid_field)
            feat = self.field2feats(pid_field)[0]
            if value_ftype == FeatureType.FLOAT:
                matrix = np.zeros(token_num)
                matrix[feat[pid_field].values] = feat[pv_field].values
            elif value_ftype == FeatureType.FLOAT_SEQ:
                max_len = self.field2seqlen[pv_field]
                matrix = np.zeros((token_num, max_len))
                for pid, prow in zip(feat[pid_field].values, list(feat[pv_field].values)):
                    matrix[pid, : min(len(prow), max_len)] = prow[:max_len]
            else:
                continue
            self._preloaded_weight[pid_field] = matrix

    # ----------------------------------------------------------- field utils

    def field2feats(self, field):
        if field not in self.field2source:
            raise ValueError(f"Field [{field}] not defined in dataset.")
        source = self.field2source[field]
        entity_feat = {self.uid_field: self.user_feat,
                       self.iid_field: self.item_feat}.get(field)
        if field in (self.uid_field, self.iid_field):
            return ([self.inter_feat, entity_feat] if entity_feat is not None
                    else [self.inter_feat])
        src = source.value if isinstance(source, FeatureSource) else source
        return [getattr(self, "inter_feat" if src == "inter" else f"{src}_feat")]

    def fields(self, ftype=None, source=None):
        ftype = set(ftype) if ftype is not None else set(FeatureType)
        source = set(source) if source is not None else set(
            list(FeatureSource) + [s for s in self.field2source.values() if isinstance(s, str)]
        )
        return [f for f, ft in self.field2type.items()
                if ft in ftype and self.field2source[f] in source]

    @property
    def float_like_fields(self):
        return self.fields(ftype=[FeatureType.FLOAT, FeatureType.FLOAT_SEQ])

    @property
    def token_like_fields(self):
        return self.fields(ftype=[FeatureType.TOKEN, FeatureType.TOKEN_SEQ])

    def set_field_property(self, field, field_type, field_source, field_seqlen):
        meta = (field_type, field_source, field_seqlen)
        (self.field2type[field], self.field2source[field],
         self.field2seqlen[field]) = meta

    def copy_field_property(self, dest_field, source_field):
        self.set_field_property(
            dest_field, self.field2type[source_field],
            self.field2source[source_field], self.field2seqlen[source_field],
        )

    def num(self, field):
        ftype = self.field2type.get(field)
        if ftype is None:
            raise ValueError(f"Field [{field}] not defined in dataset.")
        token_like = ftype in (FeatureType.TOKEN, FeatureType.TOKEN_SEQ)
        return (len(self.field2id_token[field]) if token_like
                else self.field2seqlen[field])

    def token2id(self, field, tokens):
        if isinstance(tokens, str):
            try:
                return self.field2token_id[field][tokens]
            except KeyError:
                raise ValueError(f"token [{tokens}] is not existed in {field}")
        if isinstance(tokens, (list, np.ndarray)):
            return np.array([self.token2id(field, t) for t in tokens])
        raise TypeError(f"The type of tokens [{tokens}] is not supported")

    def id2token(self, field, ids):
        vocab = self.field2id_token[field]
        try:
            return vocab[ids]
        except IndexError:
            kind = ("a one-dimensional list-like of ids"
                    if isinstance(ids, (list, np.ndarray)) else "a valid id")
            raise ValueError(f"[{ids}] is not {kind}.")

    # -------------------------------------------------------------- counters

    def counter(self, field):
        col = self.inter_feat[field]
        return Counter(col.tolist() if isinstance(self.inter_feat, Interaction)
                       else list(col.values))

    user_counter = property(lambda self: self.counter(self.uid_field))
    item_counter = property(lambda self: self.counter(self.iid_field))
    user_num = property(lambda self: self.num(self.uid_field))
    item_num = property(lambda self: self.num(self.iid_field))
    inter_num = property(lambda self: len(self.inter_feat))
    sparsity = property(
        lambda self: 1.0 - self.inter_num / (self.user_num * self.item_num)
    )

    def _mean_group_size(self, field):
        ids = np.asarray(self.inter_feat[field])
        return len(ids) / max(len(np.unique(ids)), 1)

    avg_actions_of_users = property(
        lambda self: self._mean_group_size(self.uid_field)
    )
    avg_actions_of_items = property(
        lambda self: self._mean_group_size(self.iid_field)
    )

    # ------------------------------------------------------------- container

    def join(self, df: Interaction) -> Interaction:
        """Attach user/item features onto an interaction batch (reference
        :1256-1269)."""
        for feat, key in ((self.user_feat, self.uid_field),
                          (self.item_feat, self.iid_field)):
            if feat is not None and key in df:
                df.update(feat[df[key]])
        return df

    def __getitem__(self, index):
        df = self.inter_feat[index]
        return self.join(df) if isinstance(df, Interaction) else df

    def __len__(self):
        return len(self.inter_feat)

    def __repr__(self):
        return self.__str__()

    def __str__(self):
        info = [set_color(self.dataset_name, "pink")]
        if self.uid_field:
            info += [
                set_color("The number of users", "blue") + f": {self.user_num}",
                set_color("Average actions of users", "blue") + f": {self.avg_actions_of_users}",
            ]
        if self.iid_field:
            info += [
                set_color("The number of items", "blue") + f": {self.item_num}",
                set_color("Average actions of items", "blue") + f": {self.avg_actions_of_items}",
            ]
        info.append(set_color("The number of inters", "blue") + f": {self.inter_num}")
        if self.uid_field and self.iid_field:
            info.append(set_color("The sparsity of the dataset", "blue") + f": {self.sparsity * 100}%")
        return "\n".join(info)

    def copy(self, new_inter_feat) -> "Dataset":
        clone = _copy.copy(self)
        clone.inter_feat = new_inter_feat
        return clone

    # ----------------------------------------------------------------- build

    def _dataframe_to_interaction(self, data: pd.DataFrame) -> Interaction:
        new_data = {}
        for k in data.columns:
            value = data[k].values
            ftype = self.field2type[k]
            if ftype == FeatureType.TOKEN:
                new_data[k] = np.asarray(value, dtype=np.int64)
            elif ftype == FeatureType.FLOAT:
                new_data[k] = np.asarray(value, dtype=np.float32)
            elif ftype == FeatureType.TOKEN_SEQ:
                seq_data = [np.asarray(d[: self.field2seqlen[k]], dtype=np.int64) for d in value]
                new_data[k] = seq_data
            elif ftype == FeatureType.FLOAT_SEQ:
                seq_data = [np.asarray(d[: self.field2seqlen[k]], dtype=np.float32) for d in value]
                new_data[k] = seq_data
        return Interaction(new_data)

    def _feats_to_interactions(self):
        for name in self.feat_name_list:
            table = getattr(self, name)
            if isinstance(table, pd.DataFrame):
                setattr(self, name, self._dataframe_to_interaction(table))

    def shuffle(self):
        self.inter_feat.shuffle()

    def sort(self, by, ascending=True):
        self.inter_feat.sort(by=by, ascending=ascending)

    def _rows_grouped_by(self, group_by_list):
        buckets = {}
        for row, key in enumerate(group_by_list):
            buckets.setdefault(key, []).append(row)
        return buckets.values()

    @staticmethod
    def _calcu_split_ids(tot, ratios):
        """Per-group split sizes: first part takes the remainder, tiny tail
        ratios are bumped to 1 row (reference :1339-1360)."""
        sizes = [int(r * tot) for r in ratios]
        sizes[0] = tot - sum(sizes[1:])
        for back in range(1, len(ratios)):
            if sizes[0] <= 1:
                break
            if 0 < ratios[-back] * tot < 1:
                sizes[-back], sizes[0] = sizes[-back] + 1, sizes[0] - 1
        return list(np.cumsum(sizes)[:-1])

    def split_by_ratio(self, ratios, group_by=None):
        tot_ratio = sum(ratios)
        ratios = [r / tot_ratio for r in ratios]
        if group_by is None:
            tot_cnt = len(self)
            split_ids = self._calcu_split_ids(tot_cnt, ratios)
            next_index = [
                list(range(start, end))
                for start, end in zip([0] + split_ids, split_ids + [tot_cnt])
            ]
        else:
            grouped = self._rows_grouped_by(np.asarray(self.inter_feat[group_by]))
            next_index = [[] for _ in ratios]
            for group in grouped:
                tot_cnt = len(group)
                split_ids = self._calcu_split_ids(tot_cnt, ratios)
                for index, start, end in zip(next_index, [0] + split_ids, split_ids + [tot_cnt]):
                    index.extend(group[start:end])
        self._drop_unused_columns()
        return [self.copy(self.inter_feat[np.array(idx, dtype=np.int64)]) for idx in next_index]

    def _loo_split_indices(self, grouped_index, leave_one_num):
        parts = [[] for _ in range(leave_one_num + 1)]
        for rows in grouped_index:
            rows = list(rows)
            held_out = min(leave_one_num, len(rows) - 1)
            cut = len(rows) - held_out
            parts[0].extend(rows[:cut])
            for offset, row in enumerate(rows[cut:]):
                parts[offset - held_out].append(row)
        return parts

    def leave_one_out(self, group_by, leave_one_mode):
        if group_by is None:
            raise ValueError("leave one out strategy requires a group field")
        grouped = self._rows_grouped_by(np.asarray(self.inter_feat[group_by]))
        if leave_one_mode == "valid_and_test":
            next_index = self._loo_split_indices(grouped, 2)
        elif leave_one_mode == "valid_only":
            next_index = self._loo_split_indices(grouped, 1) + [[]]
        elif leave_one_mode == "test_only":
            idx = self._loo_split_indices(grouped, 1)
            next_index = [idx[0], [], idx[1]]
        else:
            raise NotImplementedError(f"leave_one_mode [{leave_one_mode}] not implemented.")
        self._drop_unused_columns()
        return [self.copy(self.inter_feat[np.array(i, dtype=np.int64)]) for i in next_index]

    def _drop_unused_columns(self):
        unused_col = self.config["unused_col"] or {}
        for feat_name, cols in unused_col.items():
            feat = getattr(self, f"{feat_name}_feat" if feat_name != "inter" else "inter_feat")
            for field in cols:
                if field in feat:
                    if isinstance(feat, Interaction):
                        feat.drop(column=field)
                    else:
                        feat.drop(columns=field, inplace=True)

    def build(self):
        """Order → group → split per eval_args (reference :1467-1514)."""
        self._feats_to_interactions()

        if self.benchmark_filename_list is not None:
            ends = np.cumsum(self.file_size_list).tolist()
            return [
                self.copy(self.inter_feat[start:end])
                for start, end in zip([0, *ends[:-1]], ends)
            ]

        ordering = self.config["eval_args"]["order"]
        if ordering == "RO":
            self.shuffle()
        elif ordering == "TO":
            self.sort(by=self.time_field)
        else:
            raise NotImplementedError(f"ordering_method [{ordering}] not implemented.")

        split_args = self.config["eval_args"]["split"]
        if not isinstance(split_args, dict) or len(split_args) != 1:
            raise ValueError(f"split_args [{split_args}] should be a single-key dict.")
        split_mode = next(iter(split_args))
        group_by = self.config["eval_args"]["group_by"]
        if split_mode == "RS":
            if not isinstance(split_args["RS"], list):
                raise ValueError(
                    f'The value of "RS" [{split_args}] should be a list.'
                )
            if group_by is None or str(group_by).lower() == "none":
                return self.split_by_ratio(split_args["RS"], group_by=None)
            if group_by == "user":
                return self.split_by_ratio(split_args["RS"], group_by=self.uid_field)
            raise NotImplementedError(f"grouping method [{group_by}] not implemented.")
        if split_mode == "LS":
            return self.leave_one_out(self.uid_field, split_args["LS"])
        raise NotImplementedError(f"splitting_method [{split_mode}] not implemented.")

    # --------------------------------------------------------------- exports

    def get_user_feature(self) -> Interaction:
        if self.user_feat is None:
            return Interaction({self.uid_field: np.arange(self.user_num)})
        feat = self.user_feat
        if isinstance(feat, pd.DataFrame):
            feat = self._dataframe_to_interaction(feat)
            self.user_feat = feat
        return feat

    def get_item_feature(self) -> Interaction:
        if self.item_feat is None:
            return Interaction({self.iid_field: np.arange(self.item_num)})
        feat = self.item_feat
        if isinstance(feat, pd.DataFrame):
            feat = self._dataframe_to_interaction(feat)
            self.item_feat = feat
        return feat

    def get_preload_weight(self, field):
        if field not in self._preloaded_weight:
            raise ValueError(f"Field [{field}] not in preload_weight")
        return self._preloaded_weight[field]

    def inter_matrix(self, form="coo", value_field=None):
        """User×item sparse matrix of the current interactions."""
        if not self.uid_field or not self.iid_field:
            raise ValueError("dataset does not exist uid/iid, thus can not converted to sparse matrix.")
        uids = np.asarray(self.inter_feat[self.uid_field])
        iids = np.asarray(self.inter_feat[self.iid_field])
        if value_field is None:
            data = np.ones(len(uids), dtype=np.float32)
        else:
            if value_field not in self.inter_feat:
                raise ValueError(f"value_field [{value_field}] should be one of inter_feat's features.")
            data = np.asarray(self.inter_feat[value_field], dtype=np.float32)
        mat = sp.coo_matrix((data, (uids, iids)), shape=(self.user_num, self.item_num))
        if form == "coo":
            return mat
        if form == "csr":
            return mat.tocsr()
        raise NotImplementedError(f"sparse matrix format [{form}] has not been implemented.")

    def create_graph(self, source_field, target_field, form="edge_list",
                     value_field=None, feat=None):
        """Relation graph between two token fields (reference
        dataset.py:1586-1631, which exports dgl/pyg objects).

        TPU-native forms — graphs here are consumed by jitted segment-sum /
        SpMM propagation (ops/spmm.py, models/gcn.py), so the canonical
        export is plain index arrays, not a GPU graph library object:

        * ``edge_list`` → (src, tgt, values|None) numpy arrays;
        * ``jax``       → the same as jnp arrays;
        * ``coo``       → scipy COO over the two fields' id spaces.

        ``dgl``/``pyg`` raise NotImplementedError: neither library targets
        TPU; use ``edge_list`` and build the foreign object in user code.
        """
        feat = self.inter_feat if feat is None else feat
        src = np.asarray(feat[source_field])
        tgt = np.asarray(feat[target_field])
        vals = None
        if value_field is not None:
            if value_field not in feat:
                raise ValueError(f"value_field [{value_field}] not in features")
            vals = np.asarray(feat[value_field], dtype=np.float32)
        if form == "edge_list":
            return src, tgt, vals
        if form == "jax":
            import jax.numpy as jnp

            return (
                jnp.asarray(src),
                jnp.asarray(tgt),
                None if vals is None else jnp.asarray(vals),
            )
        if form == "coo":
            data = np.ones(len(src), dtype=np.float32) if vals is None else vals

            def _dim(field, ids):
                # size by the field's id space (consistent with
                # inter_matrix's fixed (user_num, item_num) shape even when
                # the highest-id entities have no interactions); fall back
                # to max+1 for fields without a known token id space
                if self.field2type.get(field) in (FeatureType.TOKEN, FeatureType.TOKEN_SEQ):
                    return self.num(field)
                return int(ids.max(initial=0)) + 1

            return sp.coo_matrix(
                (data, (src, tgt)),
                shape=(_dim(source_field, src), _dim(target_field, tgt)),
            )
        if form in ("dgl", "pyg"):
            raise NotImplementedError(
                f"graph form [{form}] is not supported on the TPU build; "
                "use form='edge_list' and construct the library object "
                "from the index arrays"
            )
        raise NotImplementedError(f"graph form [{form}] has not been implemented.")

    def inter_graph(self, form="edge_list", value_field=None):
        """User→item interaction graph (reference net()/inter_matrix analogue)."""
        return self.create_graph(self.uid_field, self.iid_field, form, value_field)

    def history_item_matrix(self, value_field=None):
        """Per-user padded history arrays (history, value, length)."""
        return self._padded_history("item", value_field)

    def history_user_matrix(self, value_field=None):
        return self._padded_history("user", value_field)

    def _padded_history(self, row, value_field=None):
        uids = np.asarray(self.inter_feat[self.uid_field])
        iids = np.asarray(self.inter_feat[self.iid_field])
        if value_field is None:
            values = np.ones(len(uids), dtype=np.float32)
        else:
            values = np.asarray(self.inter_feat[value_field], dtype=np.float32)
        if row == "item":
            row_ids, col_ids = uids, iids
            row_num = self.user_num
        else:
            row_ids, col_ids = iids, uids
            row_num = self.item_num
        history_len = np.bincount(row_ids, minlength=row_num).astype(np.int64)
        max_len = int(history_len.max()) if row_num else 0
        history = np.zeros((row_num, max_len), dtype=np.int64)
        history_value = np.zeros((row_num, max_len), dtype=np.float32)
        # stable sort by row → within-row slot = rank within its segment
        order = np.argsort(row_ids, kind="stable")
        seg_starts = np.concatenate([[0], np.cumsum(history_len)])[:-1]
        slots = np.arange(len(row_ids)) - seg_starts[row_ids[order]]
        history[row_ids[order], slots] = col_ids[order]
        history_value[row_ids[order], slots] = values[order]
        return history, history_value, history_len

    def save(self):
        save_dir = self.config["checkpoint_dir"]
        ensure_dir(save_dir)
        path = os.path.join(save_dir, f'{self.config["dataset"]}-dataset.pkl')
        with open(path, "wb") as f:
            pickle.dump(self, f)

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("logger", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.logger = getLogger()

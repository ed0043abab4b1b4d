"""Layered configuration system.

Semantics mirror the reference configurator (recbole/config/configurator.py):

* Four layers merged with priority  CLI > config_dict > config files >
  internal property defaults (:48-56, :167-172, :259-263).
* Internal defaults load in order: ``overall.yaml`` → ``model/<M>.yaml`` →
  ``dataset/sample.yaml`` → ``dataset/<d>.yaml`` (:211-257).
* Derived settings: ``MODEL_INPUT_TYPE`` from the model class (:274-286),
  ``eval_type`` from the configured metrics with no RANKING/VALUE mixing
  (:288-300), ``valid_metric_bigger`` (:306-307), train/eval neg-sample args
  (:350-391), full-sort ∧ VALUE rejection (:340-342).

TPU-specific departures: ``device`` is not a torch device — the config records
the requested JAX platform/mesh geometry instead, and string CLI values are
parsed with ``ast.literal_eval`` rather than ``eval`` (same accepted grammar
for the values that actually appear in configs, minus arbitrary code
execution).
"""

from __future__ import annotations

import ast
import os
import re
import sys
from logging import getLogger

import yaml

from ..utils import EvaluatorType, InputType, ModelType, set_color
from ..utils.registry import get_model


_PROPERTIES_DIR = os.path.join(os.path.dirname(os.path.realpath(__file__)), "properties")

# Categories used only for pretty-printing the config dump.
_GENERAL_ARGS = [
    "seed", "state", "reproducibility", "data_path", "checkpoint_dir",
    "show_progress", "save_dataset", "dataset_save_path", "save_dataloaders",
    "dataloaders_save_path", "log_wandb", "use_gpu", "gpu_id", "log_root",
]
_TRAINING_ARGS = [
    "epochs", "train_batch_size", "learner", "learning_rate", "neg_sampling",
    "eval_step", "stopping_step", "clip_grad_norm", "weight_decay",
    "loss_decimal_place", "require_pow", "train_epoch_interval",
    "pretrain_epochs",
]
_EVALUATION_ARGS = [
    "eval_args", "repeatable", "metrics", "topk", "valid_metric",
    "valid_metric_bigger", "eval_batch_size", "metric_decimal_place",
]
_DATASET_ARGS = [
    "field_separator", "seq_separator", "USER_ID_FIELD", "ITEM_ID_FIELD",
    "RATING_FIELD", "TIME_FIELD", "LABEL_FIELD", "threshold", "NEG_PREFIX",
    "load_col", "unload_col", "unused_col", "additional_feat_suffix",
    "rm_dup_inter", "val_interval", "filter_inter_by_user_or_item",
    "user_inter_num_interval", "item_inter_num_interval", "alias_of_user_id",
    "alias_of_item_id", "preload_weight", "normalize_field", "normalize_all",
    "benchmark_filename", "sst_attr_list",
]

_FLOAT_TAG_RE = re.compile(
    r"""^(?:
     [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?\.(?:inf|Inf|INF)
    |\.(?:nan|NaN|NAN))$""",
    re.X,
)


def _build_yaml_loader():
    """YAML loader that resolves bare scientific notation (``1e-3``) as float,
    matching the reference's custom resolver (:90-104)."""

    class _Loader(yaml.FullLoader):
        pass

    _Loader.add_implicit_resolver(
        "tag:yaml.org,2002:float", _FLOAT_TAG_RE, list("-+0123456789.")
    )
    return _Loader


def _coerce(value):
    """Parse a CLI/string value into a Python literal when possible."""
    if not isinstance(value, str):
        return value
    low = value.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    # note: the bare string "none" stays a string — it is a legal value for
    # e.g. filter_mode (reference coerces via eval(), where `none` NameErrors
    # and falls back to the raw string)
    if low in ("~", "null"):
        return None
    try:
        parsed = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value
    if parsed is not None and not isinstance(
        parsed, (str, int, float, list, tuple, dict, bool)
    ):
        return value
    return parsed


class Config:
    """Dict-like configuration with layered merge and derived parameters.

    Args:
        model: model name (str) or model class; if ``None``, searched in the
            external layers under key ``model``.
        dataset: dataset name; same fallback rule.
        config_file_list: list of YAML file paths (lowest external priority).
        config_dict: parameter dict (middle priority).
    """

    def __init__(self, model=None, dataset=None, config_file_list=None, config_dict=None):
        self._yaml_loader = _build_yaml_loader()
        self.parameters = {
            "General": list(_GENERAL_ARGS),
            "Training": list(_TRAINING_ARGS),
            "Evaluation": list(_EVALUATION_ARGS),
            "Dataset": list(_DATASET_ARGS),
        }

        file_cfg = self._load_config_files(config_file_list)
        dict_cfg = {k: _coerce(v) for k, v in (config_dict or {}).items()}
        cmd_cfg = self._load_cmd_line()
        self.external_config_dict = {}
        self.external_config_dict.update(file_cfg)
        self.external_config_dict.update(dict_cfg)
        self.external_config_dict.update(cmd_cfg)

        self.model, self.model_class, self.dataset = self._resolve_model_and_dataset(
            model, dataset
        )
        self.internal_config_dict = self._load_internal_defaults()

        self.final_config_dict = {}
        self.final_config_dict.update(self.internal_config_dict)
        self.final_config_dict.update(self.external_config_dict)

        self._set_default_parameters()
        self._init_device()
        self._set_train_neg_sample_args()
        self._set_eval_neg_sample_args()

    # ------------------------------------------------------------------ load

    def _load_yaml(self, path):
        with open(path, "r", encoding="utf-8") as f:
            return yaml.load(f.read(), Loader=self._yaml_loader)

    def _load_config_files(self, file_list):
        merged = {}
        for path in file_list or []:
            loaded = self._load_yaml(path)
            if loaded:
                merged.update(loaded)
        return merged

    def _load_cmd_line(self):
        """``--key=value`` args; unrecognized forms are warned and skipped."""
        cmd_cfg = {}
        unrecognized = []
        if "ipykernel_launcher" in sys.argv[0] or "pytest" in sys.argv[0]:
            return cmd_cfg
        for arg in sys.argv[1:]:
            if not arg.startswith("--") or len(arg[2:].split("=")) != 2:
                unrecognized.append(arg)
                continue
            name, value = arg[2:].split("=")
            if name in cmd_cfg and cmd_cfg[name] != value:
                raise SyntaxError(f"duplicate command arg '{arg}' with different value")
            cmd_cfg[name] = value
        if unrecognized:
            getLogger().warning(
                "command line args [%s] will not be used", " ".join(unrecognized)
            )
        return {k: _coerce(v) for k, v in cmd_cfg.items()}

    def _resolve_model_and_dataset(self, model, dataset):
        if model is None:
            if "model" not in self.external_config_dict:
                raise KeyError(
                    "model must be given via argument, config file, config dict "
                    "or command line"
                )
            model = self.external_config_dict["model"]
        if isinstance(model, str):
            model_name, model_class = model, get_model(model)
        else:
            model_name, model_class = model.__name__, model

        if dataset is None:
            if "dataset" not in self.external_config_dict:
                raise KeyError(
                    "dataset must be given via argument, config file, config dict "
                    "or command line"
                )
            dataset = self.external_config_dict["dataset"]
        return model_name, model_class, dataset

    def _load_internal_defaults(self):
        internal = {}
        files = [
            os.path.join(_PROPERTIES_DIR, "overall.yaml"),
            os.path.join(_PROPERTIES_DIR, "model", f"{self.model}.yaml"),
            os.path.join(_PROPERTIES_DIR, "dataset", "sample.yaml"),
            os.path.join(_PROPERTIES_DIR, "dataset", f"{self.dataset}.yaml"),
        ]
        for path in files:
            if not os.path.isfile(path):
                continue
            loaded = self._load_yaml(path)
            if loaded:
                internal.update(loaded)
                if path == files[-1]:
                    self.parameters["Dataset"] += [
                        k for k in loaded if k not in self.parameters["Dataset"]
                    ]
        internal["MODEL_TYPE"] = getattr(self.model_class, "type", ModelType.GENERAL)
        return internal

    # --------------------------------------------------------------- derived

    def _set_default_parameters(self):
        cfg = self.final_config_dict
        cfg["dataset"] = self.dataset
        cfg["model"] = self.model
        cfg["data_path"] = os.path.join(cfg.get("data_path", "dataset/"), self.dataset)

        if hasattr(self.model_class, "input_type"):
            cfg["MODEL_INPUT_TYPE"] = self.model_class.input_type
        elif "loss_type" in cfg:
            cfg["MODEL_INPUT_TYPE"] = (
                InputType.POINTWISE if cfg["loss_type"] == "CE" else InputType.PAIRWISE
            )
        else:
            raise ValueError(
                "model must define `input_type` or config must carry `loss_type`"
            )

        metrics = cfg["metrics"]
        if isinstance(metrics, str):
            metrics = [metrics]
            cfg["metrics"] = metrics

        from ..evaluator.register import metric_types, smaller_metrics

        eval_types = set()
        for metric in metrics:
            if metric.lower() not in metric_types:
                raise NotImplementedError(f"There is no metric named '{metric}'")
            eval_types.add(metric_types[metric.lower()])
        if len(eval_types) > 1:
            raise RuntimeError(
                "Ranking metrics and value metrics can not be used at the same time."
            )
        cfg["eval_type"] = eval_types.pop()

        head = cfg["valid_metric"].split("@")[0]
        cfg["valid_metric_bigger"] = head.lower() not in smaller_metrics

        topk = cfg["topk"]
        if isinstance(topk, int):
            topk = [topk]
        if not isinstance(topk, list):
            raise TypeError(f"The topk [{topk}] must be an integer or list")
        for k in topk:
            if k <= 0:
                raise ValueError(f"topk must be positive, got `{k}`")
        cfg["topk"] = topk

        if isinstance(cfg.get("additional_feat_suffix"), str):
            cfg["additional_feat_suffix"] = [cfg["additional_feat_suffix"]]

        defaults = {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "RO",
            "group_by": "user",
            "mode": "full",
        }
        eval_args = cfg.get("eval_args")
        if not isinstance(eval_args, dict):
            raise ValueError(f"eval_args:[{eval_args}] should be a dict.")
        for key, val in defaults.items():
            eval_args.setdefault(key, val)

        if eval_args["mode"] == "full" and cfg["eval_type"] == EvaluatorType.VALUE:
            raise NotImplementedError(
                "Full sort evaluation do not match value-based metrics!"
            )

    def _init_device(self):
        """Select the JAX backend. ``use_gpu: False`` forces the CPU backend
        (the reference's CPU escape hatch, configurator.py:344-348); sharding
        across accelerator devices is handled by the parallel layer."""
        import jax

        cfg = self.final_config_dict
        if cfg.get("use_gpu") is False:
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
        cfg["device"] = jax.devices()[0]
        cfg["backend"] = jax.default_backend()

    def _set_train_neg_sample_args(self):
        neg_sampling = self.final_config_dict.get("neg_sampling")
        if neg_sampling is None:
            self.final_config_dict["train_neg_sample_args"] = {"strategy": "none"}
            return
        if not isinstance(neg_sampling, dict):
            raise ValueError(f"neg_sampling:[{neg_sampling}] should be a dict.")
        distribution = next(iter(neg_sampling))
        if distribution not in ("uniform", "popularity"):
            raise ValueError(
                f"neg_sampling distribution [{distribution}] should be "
                "'uniform' or 'popularity'"
            )
        self.final_config_dict["train_neg_sample_args"] = {
            "strategy": "by",
            "by": neg_sampling[distribution],
            "distribution": distribution,
            "dynamic": neg_sampling.get("dynamic", "none"),
        }

    def _set_eval_neg_sample_args(self):
        mode = self.final_config_dict["eval_args"]["mode"]
        if not isinstance(mode, str):
            raise ValueError(f"mode [{mode}] in eval_args should be a str.")
        if mode == "labeled":
            args = {"strategy": "none", "distribution": "none"}
        elif mode == "full":
            args = {"strategy": "full", "distribution": "uniform"}
        elif mode.startswith("uni"):
            args = {"strategy": "by", "by": int(mode[3:]), "distribution": "uniform"}
        elif mode.startswith("pop"):
            args = {"strategy": "by", "by": int(mode[3:]), "distribution": "popularity"}
        else:
            raise ValueError(f"the mode [{mode}] in eval_args is not supported.")
        self.final_config_dict["eval_neg_sample_args"] = args

    # ------------------------------------------------------------- dict-like

    def __setitem__(self, key, value):
        if not isinstance(key, str):
            raise TypeError("index must be a str.")
        self.final_config_dict[key] = value

    def __getitem__(self, item):
        return self.final_config_dict.get(item)

    def __getattr__(self, item):
        if "final_config_dict" not in self.__dict__:
            raise AttributeError("'Config' object has no attribute 'final_config_dict'")
        if item in self.final_config_dict:
            return self.final_config_dict[item]
        raise AttributeError(f"'Config' object has no attribute '{item}'")

    def __contains__(self, key):
        if not isinstance(key, str):
            raise TypeError("index must be a str.")
        return key in self.final_config_dict

    def __getstate__(self):
        state = dict(self.__dict__)
        # live jax Device handles are not picklable; re-derived on load
        final = dict(state.get("final_config_dict", {}))
        final.pop("device", None)
        state["final_config_dict"] = final
        state.pop("_yaml_loader", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._yaml_loader = _build_yaml_loader()
        try:
            self._init_device()
        except Exception:
            pass

    def __str__(self):
        lines = ["\n"]
        listed = set()
        for category, names in self.parameters.items():
            lines.append(set_color(f"{category} Hyper Parameters:", "pink"))
            for arg, value in self.final_config_dict.items():
                if arg in names:
                    listed.add(arg)
                    lines.append(
                        set_color(str(arg), "cyan") + " = " + set_color(str(value), "yellow")
                    )
            lines.append("")
        lines.append(set_color("Other Hyper Parameters:", "pink"))
        skip = listed | {"model", "dataset", "config_files"}
        for arg, value in self.final_config_dict.items():
            if arg not in skip:
                lines.append(
                    set_color(str(arg), "cyan") + " = " + set_color(str(value), "yellow")
                )
        return "\n".join(lines) + "\n"

    __repr__ = __str__

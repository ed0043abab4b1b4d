"""Config layering and derived-parameter tests (reference contract:
recbole/config/configurator.py precedence rules and eval arg derivation)."""

import os

import pytest

from recbole_fairrec_tpu.config import Config
from recbole_fairrec_tpu.utils import EvaluatorType, InputType


def _cfg(**config_dict):
    return Config(model="FOCF", dataset="ml-100k", config_dict=config_dict)


def test_internal_defaults_loaded():
    c = _cfg()
    assert c["epochs"] == 300
    assert c["train_batch_size"] == 2048
    assert c["learner"] == "adam"
    # FOCF model yaml overrides
    assert c["embedding_size"] == 64
    assert c["fair_objective"] == "none"
    assert c["valid_metric"] == "NDCG@5"
    assert c["topk"] == [5]


def test_config_dict_overrides_internal():
    c = _cfg(epochs=7, embedding_size=16)
    assert c["epochs"] == 7
    assert c["embedding_size"] == 16


def test_config_file_lowest_external_priority(tmp_path):
    f = tmp_path / "f.yaml"
    f.write_text("epochs: 11\nlearning_rate: 0.5\n")
    c = Config(
        model="FOCF", dataset="ml-100k",
        config_file_list=[str(f)], config_dict={"epochs": 13},
    )
    assert c["epochs"] == 13          # dict beats file
    assert c["learning_rate"] == 0.5  # file beats internal


def test_model_input_type_and_eval_type():
    c = _cfg()
    assert c["MODEL_INPUT_TYPE"] == InputType.POINTWISE
    assert c["eval_type"] == EvaluatorType.RANKING


def test_eval_neg_sample_args_modes():
    assert _cfg()["eval_neg_sample_args"] == {
        "strategy": "by", "by": 100, "distribution": "uniform"
    }
    c = _cfg(eval_args={"split": {"RS": [8, 1, 1]}, "order": "RO", "group_by": "user", "mode": "full"})
    assert c["eval_neg_sample_args"]["strategy"] == "full"
    c = _cfg(eval_args={"split": {"RS": [8, 1, 1]}, "order": "RO", "group_by": "user", "mode": "pop42"})
    assert c["eval_neg_sample_args"] == {"strategy": "by", "by": 42, "distribution": "popularity"}


def test_train_neg_sample_args():
    c = _cfg(neg_sampling={"uniform": 3})
    assert c["train_neg_sample_args"]["by"] == 3
    assert c["train_neg_sample_args"]["distribution"] == "uniform"
    c = _cfg()  # FOCF yaml sets neg_sampling: ~
    assert c["train_neg_sample_args"] == {"strategy": "none"}


def test_metric_mixing_rejected():
    with pytest.raises(RuntimeError):
        _cfg(metrics=["NDCG", "RMSE"])


def test_unknown_metric_rejected():
    with pytest.raises(NotImplementedError):
        _cfg(metrics=["NotAMetric"])


def test_smaller_valid_metric_flips_bigger():
    c = _cfg(metrics=["RMSE"], valid_metric="RMSE",
             eval_args={"split": {"RS": [8, 1, 1]}, "order": "RO", "group_by": "user", "mode": "labeled"})
    assert c["valid_metric_bigger"] is False


def test_full_sort_with_value_metric_rejected():
    with pytest.raises(NotImplementedError):
        _cfg(metrics=["RMSE"], valid_metric="RMSE",
             eval_args={"split": {"RS": [8, 1, 1]}, "order": "RO", "group_by": "user", "mode": "full"})


def test_topk_validation():
    with pytest.raises(ValueError):
        _cfg(topk=[-3])
    c = _cfg(topk=7)
    assert c["topk"] == [7]


def test_dict_like_access():
    c = _cfg()
    assert "epochs" in c
    assert c["nonexistent_key"] is None
    assert c.epochs == c["epochs"]
    with pytest.raises(TypeError):
        _ = 3 in c


def test_eval_macro_rows_deprecated_alias(tiny_data_path):
    """The pre-r4 key `eval_macro_rows` still steers the sampled-eval macro
    budget when the new key is unset (ADVICE r3 item 3)."""
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import Dataset
    from recbole_fairrec_tpu.trainer import Trainer
    from recbole_fairrec_tpu.utils import get_model

    cd = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "eval_macro_rows_sampled": None,
        "eval_macro_rows": 12345,
    }
    c = Config(model="PFCN_PMF", dataset="tiny", config_dict=cd)
    ds = Dataset(c)
    model = get_model("PFCN_PMF")(c, ds)
    trainer = Trainer(c, model)
    assert trainer._macro_rows_target() == 12345
    c["eval_macro_rows"] = None
    assert trainer._macro_rows_target() == 4_194_304  # yaml-aligned fallback

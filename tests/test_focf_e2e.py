"""End-to-end smoke: FOCF trains, validates and tests on a tiny dataset
(reference model: recbole/model/fair_recommender/focf.py)."""

import numpy as np
import pytest

from recbole_fairrec_tpu import run_recbole


@pytest.mark.parametrize("fair_objective", ["none", "value", "nonparity"])
def test_focf_end_to_end(tiny_data_path, tmp_path, fair_objective):
    res = run_recbole(
        model="FOCF",
        dataset="tiny",
        config_dict={
            "data_path": str(tiny_data_path),
            "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
            "epochs": 2,
            "train_batch_size": 128,
            "eval_batch_size": 2048,
            "show_progress": False,
            "state": "ERROR",
            "fair_objective": fair_objective,
            "checkpoint_dir": str(tmp_path / "saved"),
            "metrics": ["NDCG", "Recall", "Hit", "MRR", "DifferentialFairness",
                        "GiniIndex", "PopularityPercentage", "ValueUnfairness",
                        "AbsoluteUnfairness", "UnderUnfairness", "OverUnfairness",
                        "NonParityUnfairness"],
        },
    )
    test_result = res["test_result"]
    assert 0.0 <= test_result["ndcg@5"] <= 1.0
    assert "Value Unfairness of sensitive attribute gender" in test_result
    assert np.isfinite(res["best_valid_score"])


def test_focf_training_reduces_loss(tiny_data_path, tmp_path):
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.utils import get_model, get_trainer, init_seed

    c = Config(model="FOCF", dataset="tiny", config_dict={
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
        "train_batch_size": 128, "checkpoint_dir": str(tmp_path / "saved"),
    })
    init_seed(c["seed"], True)
    ds = create_dataset(c)
    train, valid, test = data_preparation(c, ds)
    init_seed(c["seed"], True)
    model = get_model("FOCF")(c, train.dataset)
    trainer = get_trainer(c["MODEL_TYPE"], "FOCF")(c, model)
    losses = [trainer._train_epoch(train, e) for e in range(5)]
    assert losses[-1] < losses[0]

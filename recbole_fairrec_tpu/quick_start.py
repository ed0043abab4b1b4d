"""Public entry points.

Parity: recbole/quick_start/quick_start.py — ``run_recbole`` (:20-71),
``objective_function`` (:74-99), ``load_data_and_model`` (:102-133).
"""

from __future__ import annotations

import pickle
from logging import getLogger

from .config import Config
from .data import create_dataset, data_preparation
from .utils import dict2str, get_model, get_trainer, init_logger, init_seed, set_color


def init_multihost(config_dict=None):
    """Multi-host SPMD bootstrap: call ``jax.distributed.initialize`` before
    any other jax use so every process sees the global device set.

    Activated by ``config_dict['multihost'] = True`` (optionally with
    ``coordinator_address`` / ``num_processes`` / ``process_id``; without
    them jax reads its standard cluster environment variables). No reference
    counterpart — the reference is single-process (SURVEY.md §2.4). Safe
    no-op when already initialized or single-process.
    """
    cfg = config_dict or {}
    if not cfg.get("multihost"):
        return False
    import jax

    kwargs = {
        k: cfg[k]
        for k in ("coordinator_address", "num_processes", "process_id")
        if cfg.get(k) is not None
    }
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return True


def run_recbole(model=None, dataset=None, config_file_list=None, config_dict=None,
                saved=True, callback_fn=None):
    """Train and test a model from config.

    ``callback_fn(epoch_idx, valid_score)`` is forwarded to Trainer.fit
    (per-valid-epoch hook; used by trajectory probes).

    Returns dict with best_valid_score / valid_score_bigger /
    best_valid_result / test_result.
    """
    init_multihost(config_dict)
    config = Config(
        model=model, dataset=dataset, config_file_list=config_file_list, config_dict=config_dict
    )
    init_seed(config["seed"], config["reproducibility"])
    init_logger(config)
    logger = getLogger()
    logger.info(config)

    dataset = create_dataset(config)
    logger.info(dataset)

    train_data, valid_data, test_data = data_preparation(config, dataset)

    init_seed(config["seed"], config["reproducibility"])
    model_obj = get_model(config["model"])(config, train_data.dataset)
    logger.info(model_obj)

    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)

    best_valid_score, best_valid_result = trainer.fit(
        train_data, valid_data, saved=saved, show_progress=config["show_progress"],
        callback_fn=callback_fn,
    )
    test_result = trainer.evaluate(
        test_data, load_best_model=saved, show_progress=config["show_progress"]
    )

    logger.info(set_color("best valid ", "yellow") + f": {best_valid_result}")
    logger.info(set_color("test result", "yellow") + f": {test_result}")

    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }


def objective_function(config_dict=None, config_file_list=None, saved=True):
    """One train+test trial for hyperparameter search (reference :74-99)."""
    config = Config(config_dict=config_dict, config_file_list=config_file_list)
    init_seed(config["seed"], config["reproducibility"])
    import logging

    logging.basicConfig(level=logging.ERROR)
    dataset = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    init_seed(config["seed"], config["reproducibility"])
    model_obj = get_model(config["model"])(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)
    best_valid_score, best_valid_result = trainer.fit(train_data, valid_data, verbose=False, saved=saved)
    test_result = trainer.evaluate(test_data, load_best_model=saved)

    return {
        "model": config["model"],
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }


def load_data_and_model(model_file):
    """Rebuild (config, model, trainer, dataset, loaders) from a checkpoint
    (reference :102-133). Returns the trainer too — in the functional design
    the trainer owns the live params."""
    import os

    with open(model_file, "rb") as f:
        checkpoint = pickle.load(f)
    saved_cfg = dict(checkpoint["config"])
    # data_path was already joined with the dataset name when the checkpoint
    # was written; Config would join again
    saved_cfg["data_path"] = os.path.dirname(saved_cfg["data_path"])
    config = Config(config_dict=saved_cfg)
    init_seed(config["seed"], config["reproducibility"])
    init_logger(config)
    logger = getLogger()
    logger.info(config)

    dataset = create_dataset(config)
    logger.info(dataset)
    train_data, valid_data, test_data = data_preparation(config, dataset)

    init_seed(config["seed"], config["reproducibility"])
    model_obj = get_model(config["model"])(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model_obj)
    trainer._load_params_from_checkpoint(checkpoint)
    trainer.saved_model_file = str(model_file)
    # eval-only flows never run fit(), which is what normally feeds the
    # collector its train-side resources (num_items, popularity counters)
    trainer.eval_collector.data_collect(train_data)

    return config, model_obj, trainer, dataset, train_data, valid_data, test_data

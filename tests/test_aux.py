"""Aux subsystem tests: hyper tuning, case study, checkpoint resume,
load_data_and_model."""

import glob
import os

import numpy as np
import pytest


def _base_cfg(tiny_data_path, tmp_path, **extra):
    cfg = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
        "epochs": 2,
        "train_batch_size": 128,
        "eval_batch_size": 2048,
        "show_progress": False,
        "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "model": "FOCF",
        "dataset": "tiny",
    }
    cfg.update(extra)
    return cfg


def test_hyper_tuning_exhaustive(tiny_data_path, tmp_path):
    from recbole_fairrec_tpu.quick_start import objective_function
    from recbole_fairrec_tpu.trainer.hyper_tuning import HyperTuning

    params_file = tmp_path / "params.hyper"
    params_file.write_text("learning_rate choice [0.01, 0.1]\nembedding_size choice [8]\n")

    fixed = _base_cfg(tiny_data_path, tmp_path, epochs=1)

    def objective(config_dict, config_file_list):
        merged = dict(fixed)
        merged.update(config_dict)
        return objective_function(config_dict=merged, config_file_list=config_file_list, saved=False)

    hp = HyperTuning(objective, params_file=str(params_file), algo="exhaustive")
    assert hp.max_evals == 2
    hp.run()
    assert len(hp.params2result) == 2
    assert hp.best_params is not None
    out = tmp_path / "hyper.result"
    hp.export_result(str(out))
    assert "Valid result" in out.read_text()


def test_hyper_tuning_random_space():
    from recbole_fairrec_tpu.trainer.hyper_tuning import HyperTuning

    seen = []

    def fake_objective(config_dict, config_file_list):
        seen.append(dict(config_dict))
        return {
            "model": "X",
            "best_valid_score": config_dict["learning_rate"],
            "valid_score_bigger": True,
            "best_valid_result": {"m": 1},
            "test_result": {"m": 1},
        }

    hp = HyperTuning(
        fake_objective,
        params_dict={"uniform": {"learning_rate": [0.001, 0.1]}, "choice": {"d": [8, 16]}},
        algo="random",
        max_evals=5,
    )
    hp.run()
    assert len(seen) == 5
    assert all(0.001 <= s["learning_rate"] <= 0.1 for s in seen)


def test_load_data_and_model_roundtrip(tiny_data_path, tmp_path):
    from recbole_fairrec_tpu import load_data_and_model, run_recbole

    run_recbole(config_dict=_base_cfg(tiny_data_path, tmp_path))
    ckpts = glob.glob(str(tmp_path / "saved" / "FOCF-*.pth"))
    assert ckpts
    config, model, trainer, dataset, train_data, valid_data, test_data = load_data_and_model(
        ckpts[0]
    )
    result = trainer.evaluate(test_data, load_best_model=True, model_file=ckpts[0])
    assert "ndcg@5" in result


def test_resume_checkpoint(tiny_data_path, tmp_path):
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.utils import get_model, get_trainer, init_seed

    cfg = _base_cfg(tiny_data_path, tmp_path)
    c = Config(config_dict=cfg)
    init_seed(c["seed"], True)
    ds = create_dataset(c)
    train, valid, test = data_preparation(c, ds)
    init_seed(c["seed"], True)
    model = get_model("FOCF")(c, train.dataset)
    trainer = get_trainer(c["MODEL_TYPE"], "FOCF")(c, model)
    trainer.fit(train, valid, saved=True, verbose=False)
    ckpt = trainer.saved_model_file

    model2 = get_model("FOCF")(c, train.dataset)
    trainer2 = get_trainer(c["MODEL_TYPE"], "FOCF")(c, model2)
    trainer2.resume_checkpoint(ckpt)
    assert trainer2.start_epoch > 0
    # resumed params must equal the checkpoint payload bit-for-bit
    import pickle

    with open(ckpt, "rb") as f:
        saved = pickle.load(f)
    np.testing.assert_array_equal(
        np.asarray(trainer2.params["user_embedding"]),
        np.asarray(saved["params"]["user_embedding"]),
    )


def test_case_study_topk(tiny_data_path, tmp_path):
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.utils import get_model, get_trainer, init_seed
    from recbole_fairrec_tpu.utils.case_study import full_sort_scores, full_sort_topk

    cfg = _base_cfg(
        tiny_data_path, tmp_path,
        eval_args={"split": {"RS": [8, 1, 1]}, "order": "RO", "group_by": "user", "mode": "full"},
    )
    c = Config(config_dict=cfg)
    init_seed(c["seed"], True)
    ds = create_dataset(c)
    train, valid, test = data_preparation(c, ds)
    init_seed(c["seed"], True)
    model = get_model("FOCF")(c, train.dataset)
    trainer = get_trainer(c["MODEL_TYPE"], "FOCF")(c, model)

    uids = test.uid_list[:3]
    scores = full_sort_scores(uids, trainer, test)
    assert scores.shape == (3, ds.item_num)
    assert np.all(scores[:, 0] == -np.inf)  # PAD masked
    # history masked
    for i, hist in enumerate(test.history_items(uids)):
        if len(hist):
            assert np.all(scores[i, hist] == -np.inf)
    topk_scores, topk_idx = full_sort_topk(uids, trainer, test, k=5)
    assert topk_idx.shape == (3, 5)
    assert np.all(np.diff(topk_scores, axis=1) <= 0)


def test_dataloader_cache_roundtrip(tiny_data_path, tmp_path):
    """save_dataloaders=True pickles loaders (incl. Config) and reloads them
    with config-invalidation (reference data/utils.py:75-117)."""
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.data.utils import load_split_dataloaders
    from recbole_fairrec_tpu.utils import init_seed

    cfg = _base_cfg(tiny_data_path, tmp_path, save_dataloaders=True)
    c = Config(config_dict=cfg)
    init_seed(c["seed"], True)
    ds = create_dataset(c)
    data_preparation(c, ds)

    loaded = load_split_dataloaders(c)
    assert loaded is not None
    train2, valid2, test2 = loaded
    batch = next(iter(train2))
    assert len(batch) > 0

    # changed dataset arg invalidates the cache
    cfg2 = dict(cfg)
    cfg2["threshold"] = {"rating": 4.0}
    c2 = Config(config_dict=cfg2)
    assert load_split_dataloaders(c2) is None


@pytest.mark.parametrize("algo", ["anneal", "bayes"])
def test_hyper_tuning_adaptive_algos(algo):
    """anneal/bayes (reference hyper_tuning.py:129+) run the full budget and
    land near the optimum of a smooth synthetic objective."""
    from recbole_fairrec_tpu.trainer.hyper_tuning import HyperTuning

    def objective(config_dict, fixed_config_file_list):
        x = config_dict["x"]
        c = config_dict["c"]
        score = -((x - 0.3) ** 2) - 0.1 * abs(c - 2)
        return {
            "best_valid_score": score,
            "valid_score_bigger": True,
            "best_valid_result": {"score": score},
            "test_result": {"score": score},
        }

    ht = HyperTuning(
        objective,
        params_dict={"uniform": {"x": [0.0, 1.0]}, "choice": {"c": [1, 2, 3]}},
        algo=algo,
        max_evals=40,
        seed=3,
    )
    ht.run()
    # anneal may revisit a point; params2result dedups by param string
    assert len(ht._history) == 40 and len(ht.params2result) >= 30
    assert ht.best_params["c"] == 2
    assert abs(ht.best_params["x"] - 0.3) < 0.15
    assert ht.best_score == pytest.approx(
        max(r["best_valid_score"] for r in ht.params2result.values())
    )


def test_bench_module_imports_and_synthesizes():
    """bench.py bitrot guard: the module (run by the driver on real TPU at
    the end of every round) must import and its dataset synthesis, timing
    helper, and chip-peak table must be sane without touching a device."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    data_path = bench._ensure_dataset()
    ddir = os.path.join(data_path, bench.DS)
    assert os.path.exists(os.path.join(ddir, f"{bench.DS}.inter"))
    mn, p50, mx, n = bench._timed_stats(iter([3.0, 1.0, 2.0]).__next__, n=3)
    assert (mn, p50, mx, n) == (1.0, 2.0, 3.0, 3)
    assert "TPU v5 lite" in bench._CHIP_PEAKS

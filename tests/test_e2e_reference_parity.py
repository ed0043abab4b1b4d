"""End-to-end differential parity vs the reference (read-only at
/root/reference, torch CPU).

The strongest available parity evidence beyond the metric-level tests
(test_reference_parity.py): identical atomic files + fixed benchmark splits
+ identical injected model weights are pushed through BOTH frameworks' FULL
evaluation pipelines — dataset ETL, remap, eval dataloader grouping, history
masking, collector payloads, metric computation — and the resulting metric
dicts must agree key-for-key and value-for-value. Full-sort eval has no RNG,
so any disagreement is a real behavioral divergence.

Covers: Dataset benchmark_filename loading (reference dataset.py:265-282,
:1476-1480), FullSortEvalDataLoader (general_dataloader.py:161-253),
Collector fairness payloads (collector.py:131-205), the 12-metric FOCF suite
(properties/model/FOCF.yaml), and FOCF scoring (focf.py:136-178).
"""

import os

import numpy as np
import pytest

METRICS = [
    "NDCG", "Recall", "Hit", "MRR", "DifferentialFairness", "GiniIndex",
    "PopularityPercentage", "ValueUnfairness", "AbsoluteUnfairness",
    "UnderUnfairness", "OverUnfairness", "NonParityUnfairness",
]

N_USERS, N_ITEMS, EMB = 24, 30, 16


def _write_benchmark_dataset(root, name="bmk", seed=11):
    """Fixed train/valid/test benchmark splits: every user has >=4 train
    rows and exactly one valid and one test row, all ids appearing in train."""
    rng = np.random.RandomState(seed)
    ddir = os.path.join(root, name)
    os.makedirs(ddir, exist_ok=True)
    header = "user_id:token\titem_id:token\trating:float\n"
    splits = {"train": [], "valid": [], "test": []}
    for u in range(1, N_USERS + 1):
        items = rng.choice(np.arange(1, N_ITEMS + 1), size=8, replace=False)
        ratings = rng.randint(1, 6, 8)
        for i, r in zip(items[:6], ratings[:6]):
            splits["train"].append((u, i, r))
        splits["valid"].append((u, items[6], ratings[6]))
        splits["test"].append((u, items[7], ratings[7]))
    # make sure every item id occurs in train so remaps agree across splits
    for i in range(1, N_ITEMS + 1):
        splits["train"].append((1 + i % N_USERS, i, 3))
    for part, rows in splits.items():
        with open(os.path.join(ddir, f"{name}.{part}.inter"), "w") as f:
            f.write(header)
            for u, i, r in rows:
                f.write(f"{u}\t{i}\t{r}\n")
    with open(os.path.join(ddir, f"{name}.user"), "w") as f:
        f.write("user_id:token\tgender:token\n")
        for u in range(1, N_USERS + 1):
            f.write(f"{u}\t{'M' if u % 2 else 'F'}\n")
    return root


@pytest.fixture(scope="module")
def bmk_path(tmp_path_factory):
    return _write_benchmark_dataset(str(tmp_path_factory.mktemp("bmk")))


def _config_dict(data_path, mode):
    # In sampled mode the reference collector slices the batch as
    # [all pos rows, all neg rows] (collector.py:191-205) but its eval loader
    # concatenates PER-USER [pos, neg] blocks (general_dataloader.py:135-150)
    # — the slices are only correct when each batch holds exactly one user.
    # eval_batch_size=101 (1 pos + 100 sampled negs) pins that regime.
    eval_batch_size = 101 if mode == "uni100" else 2048
    return {
        "eval_batch_size": eval_batch_size,
        "data_path": data_path,
        "benchmark_filename": ["train", "valid", "test"],
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
                      "group_by": "user", "mode": mode},
        "metrics": METRICS,
        "embedding_size": EMB,
        "topk": [5],
        "valid_metric": "NDCG@5",
        "use_gpu": False,
        "show_progress": False,
        "state": "ERROR",
        # NOTE: fair_objective deliberately NOT set here: the reference's
        # eval-based config coercion (configurator.py:106-129) mangles the
        # string "value" (it evaluates to the coercion loop's local). The
        # model-YAML default applies in both frameworks; it only affects
        # training, and this test is evaluate-only.
    }


def _weights(n_users, n_items):
    rng = np.random.RandomState(2020)
    wu = rng.normal(0, 0.3, (n_users, EMB)).astype(np.float32)
    wi = rng.normal(0, 0.3, (n_items, EMB)).astype(np.float32)
    return wu, wi


@pytest.fixture(scope="module")
def ref_modules(ref_recbole):
    return ref_recbole


def _run_reference(bmk_path, tmp_path, mode, ref_modules):
    import torch
    from recbole.config import Config as RefConfig
    from recbole.data import create_dataset, data_preparation
    from recbole.trainer import Trainer as RefTrainer
    from recbole.utils import get_model, init_seed

    cfg = _config_dict(bmk_path, mode)
    cfg["checkpoint_dir"] = os.path.join(tmp_path, "ref_saved")
    config = RefConfig(model="FOCF", dataset="bmk", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model = get_model(config["model"])(config, train_data.dataset).to(config["device"])
    wu, wi = _weights(model.n_users, model.n_items)
    with torch.no_grad():
        model.user_embedding_layer.weight.copy_(torch.from_numpy(wu))
        model.item_embedding_layer.weight.copy_(torch.from_numpy(wi))
    trainer = RefTrainer(config, model)
    trainer.eval_collector.data_collect(train_data)  # registers data.num_items etc. (done by fit() in the normal flow)
    init_seed(config["seed"], config["reproducibility"])
    result = trainer.evaluate(test_data, load_best_model=False, show_progress=False)
    meta = {
        "n_users": dataset.user_num,
        "n_items": dataset.item_num,
        "train_rows": len(train_data.dataset.inter_feat),
        "test_rows": len(test_data.dataset.inter_feat),
    }
    return dict(result), meta


def _run_ours(bmk_path, tmp_path, mode):
    import jax.numpy as jnp

    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.utils import get_model, get_trainer, init_seed

    cfg = _config_dict(bmk_path, mode)
    cfg["checkpoint_dir"] = os.path.join(tmp_path, "our_saved")
    config = Config(model="FOCF", dataset="bmk", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model = get_model(config["model"])(config, train_data.dataset)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(config, model)
    wu, wi = _weights(model.n_users, model.n_items)
    trainer.params = {"user_embedding": jnp.asarray(wu), "item_embedding": jnp.asarray(wi)}
    trainer.eval_collector.data_collect(train_data)
    init_seed(config["seed"], config["reproducibility"])
    result = trainer.evaluate(test_data, load_best_model=False, show_progress=False)
    meta = {
        "n_users": dataset.user_num,
        "n_items": dataset.item_num,
        "train_rows": len(train_data.dataset.inter_feat),
        "test_rows": len(test_data.dataset.inter_feat),
    }
    return dict(result), meta


@pytest.mark.parametrize("mode", ["full", "uni100"])
def test_eval_matches_reference(bmk_path, tmp_path, ref_modules, mode):
    ref_result, ref_meta = _run_reference(bmk_path, str(tmp_path), mode, ref_modules)
    our_result, our_meta = _run_ours(bmk_path, str(tmp_path), mode)

    assert our_meta == ref_meta, f"ETL divergence: {our_meta} vs {ref_meta}"
    assert set(our_result) == set(ref_result), (
        f"metric-key divergence: ours-only={set(our_result) - set(ref_result)}, "
        f"reference-only={set(ref_result) - set(our_result)}"
    )
    for key in sorted(ref_result):
        assert our_result[key] == pytest.approx(ref_result[key], abs=2e-4), (
            f"{key}: ours={our_result[key]} reference={ref_result[key]}"
        )


def test_sampled_fused_equals_host_path(tiny_data_path, tmp_path):
    """The fused uni100 device path (counts-derived lanes, one dispatch)
    must produce metric dicts IDENTICAL to the unfused host scatter path
    on the same negative draws (VERDICT r4 uni100 done-criterion)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.trainer import Trainer
    from recbole_fairrec_tpu.utils import get_model, init_seed

    config = Config(model="PFCN_PMF", dataset="tiny", config_dict={
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "filter_mode": "none",
        "metrics": ["NDCG", "Recall", "Hit", "MRR"],
        "topk": [5], "valid_metric": "NDCG@5",
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
                      "group_by": "user", "mode": "uni100"},
        "checkpoint_dir": str(tmp_path), "show_progress": False,
    })
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    _, valid_data, _ = data_preparation(config, dataset)
    model = get_model("PFCN_PMF")(config, valid_data.dataset)
    trainer = Trainer(config, model)

    np.random.seed(123)  # same negative draws for both paths
    fused = dict(trainer.evaluate(valid_data, load_best_model=False))

    trainer._fused_eval_ok = lambda: False  # force the host scatter path
    np.random.seed(123)
    host = dict(trainer.evaluate(valid_data, load_best_model=False))

    assert fused == host, {k: (fused[k], host[k]) for k in fused
                           if fused[k] != host.get(k)}

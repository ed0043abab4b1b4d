"""Interaction container + dataloader behavior tests (the reference test
contract's tests/data/test_dataloader.py role, SURVEY.md §4)."""

import numpy as np
import pytest

from recbole_fairrec_tpu.config import Config
from recbole_fairrec_tpu.data import Dataset, create_samplers, data_preparation, create_dataset
from recbole_fairrec_tpu.data.interaction import Interaction, cat_interactions


def test_interaction_basic_ops():
    inter = Interaction({"a": np.arange(5), "b": np.arange(5) * 2.0})
    assert len(inter) == 5
    assert set(inter.columns) == {"a", "b"}
    sliced = inter[1:3]
    assert len(sliced) == 2
    np.testing.assert_array_equal(sliced["a"], [1, 2])
    picked = inter[np.array([0, 4])]
    np.testing.assert_array_equal(picked["b"], [0.0, 8.0])


def test_interaction_repeat_semantics():
    inter = Interaction({"a": np.array([1, 2])})
    np.testing.assert_array_equal(inter.repeat(3)["a"], [1, 2, 1, 2, 1, 2])
    np.testing.assert_array_equal(inter.repeat_interleave(3)["a"], [1, 1, 1, 2, 2, 2])


def test_interaction_update_prefix_sort():
    inter = Interaction({"a": np.array([3, 1, 2]), "b": np.array([9, 7, 8])})
    other = Interaction({"c": np.array([0, 0, 0])})
    inter.update(other)
    assert "c" in inter
    other2 = Interaction({"x": np.array([5, 5, 5])})
    other2.add_prefix("neg_")
    assert "neg_x" in other2
    inter.sort(by="a")
    np.testing.assert_array_equal(inter["a"], [1, 2, 3])
    np.testing.assert_array_equal(inter["b"], [7, 8, 9])
    inter.sort(by="a", ascending=False)
    np.testing.assert_array_equal(inter["a"], [3, 2, 1])


def test_interaction_unequal_lengths_rejected():
    with pytest.raises(ValueError):
        Interaction({"a": np.arange(3), "b": np.arange(4)})


def test_cat_interactions():
    a = Interaction({"x": np.array([1, 2])})
    b = Interaction({"x": np.array([3])})
    merged = cat_interactions([a, b])
    np.testing.assert_array_equal(merged["x"], [1, 2, 3])
    with pytest.raises(ValueError):
        cat_interactions([a, Interaction({"y": np.array([1])})])


def _prep(tiny_data_path, model="PFCN_PMF", **kw):
    cd = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
        "threshold": {"rating": 3.0},
        **kw,
    }
    c = Config(model=model, dataset="tiny", config_dict=cd)
    ds = create_dataset(c)
    return c, data_preparation(c, ds)


def test_pairwise_train_loader_neg_columns(tiny_data_path):
    c, (train, valid, test) = _prep(tiny_data_path)
    batch = next(iter(train))
    assert "neg_item_id" in batch  # pairwise expansion
    # negatives exclude the user's train positives
    assert (np.asarray(batch["neg_item_id"]) >= 1).all()


def test_pointwise_train_loader_labels(tiny_data_path):
    c, (train, valid, test) = _prep(tiny_data_path, model="NFCF")
    # NFCF is pointwise: label column with 1s then 0s per batch
    batch = next(iter(train))
    labels = np.asarray(batch["label"])
    n_pos = int(labels.sum())
    assert (labels[:n_pos] == 1).all() and (labels[n_pos:] == 0).all()


def test_train_loader_batch_math(tiny_data_path):
    c, (train, valid, test) = _prep(tiny_data_path, train_batch_size=100)
    # pairwise times=1: step=100
    assert train.step == 100
    total = sum(len(b) for b in train)
    assert total == len(train.dataset)


def test_eval_loader_user_grouping(tiny_data_path):
    c, (train, valid, test) = _prep(tiny_data_path)
    for inter, row_idx, pos_u, pos_i in valid:
        # per-user row blocks: each user's rows contiguous, 101 per positive
        counts = np.bincount(np.asarray(row_idx))
        counts = counts[counts > 0]
        assert (counts % 101 == 0).all()


def test_full_sort_loader_structures(tiny_data_path):
    c, (train, valid, test) = _prep(
        tiny_data_path,
        eval_args={"split": {"RS": [8, 1, 1]}, "order": "RO", "group_by": "user", "mode": "full"},
    )
    user_df, (hist_u, hist_i), pos_u, pos_i = next(iter(test))
    # history = used - positive: no overlap with positives of the same user
    pairs_hist = set(zip(hist_u.tolist(), hist_i.tolist()))
    pairs_pos = set(zip(pos_u.tolist(), pos_i.tolist()))
    assert not (pairs_hist & pairs_pos)


def test_user_dataloader(tiny_data_path):
    from recbole_fairrec_tpu.data.dataloader import UserDataLoader

    cd = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
    }
    c = Config(model="FOCF", dataset="tiny", config_dict=cd)
    ds = Dataset(c)
    loader = UserDataLoader(c, ds, None, shuffle=True)
    seen = np.concatenate([np.asarray(b["user_id"]) for b in loader])
    assert sorted(seen.tolist()) == list(range(ds.user_num))


def test_focf_loader_item_grouped(tiny_data_path):
    cd = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
        "train_batch_size": 64,
    }
    c = Config(model="FOCF", dataset="tiny", config_dict=cd)
    ds = create_dataset(c)
    train, valid, test = data_preparation(c, ds)
    batch = next(iter(train))
    # every drawn item appears with ALL its interactions: count in batch ==
    # count in dataset
    items = np.asarray(batch["item_id"])
    all_items = np.asarray(train.dataset.inter_feat["item_id"])
    for it in np.unique(items):
        assert (items == it).sum() == (all_items == it).sum()


def test_device_neg_sampling_end_to_end(tiny_data_path, tmp_path):
    """Opt-in on-device sampling: loader ships raw positives, negatives are
    drawn inside the jitted update, training still converges."""
    from recbole_fairrec_tpu import run_recbole

    res = run_recbole(
        model="PFCN_PMF", dataset="tiny",
        config_dict={
            "data_path": str(tiny_data_path),
            "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
            "threshold": {"rating": 3.0},
            "epochs": 2, "train_batch_size": 128, "eval_batch_size": 2048,
            "show_progress": False, "state": "ERROR",
            "checkpoint_dir": str(tmp_path / "saved"),
            "device_neg_sampling": True,
            "filter_mode": "none", "save_sst_embed": False,
        },
    )
    flat = res["test_result"]["none"] if "none" in res["test_result"] else res["test_result"]
    assert any("ndcg@5" in k for k in flat)


def test_macro_sizing_reset_restores_config_batches(tiny_data_path):
    """set_macro_rows is undone by reset_macro_rows (ADVICE r4): a fused
    evaluate macro-sizes the loader; a later non-fused evaluate must see the
    config-derived step/batch_size again, not worst-case macro batches."""
    c, (train, valid, test) = _prep(tiny_data_path)
    step0, bs0 = valid.step, valid.batch_size
    valid.set_macro_rows(10**9)  # everything in one batch
    assert valid._macro_sized and valid.step >= step0
    batches = list(valid)
    assert len(batches) == 1
    valid.reset_macro_rows()
    assert not valid._macro_sized
    assert (valid.step, valid.batch_size) == (step0, bs0)
    assert len(list(valid)) == -(-valid.pr_end // step0)


def test_device_epoch_shuffle_resident_end_to_end(tiny_data_path, tmp_path):
    """Epoch-resident mode (device_epoch_shuffle): the whole epoch is one
    dispatch — device-side shuffle over the HBM-resident train table,
    in-scan gathers and negative draws. Training completes, improves the
    valid metric path, and actually took the resident executable."""
    import jax

    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.trainer import Trainer
    from recbole_fairrec_tpu.utils import get_model, init_seed

    config = Config(
        model="PFCN_PMF", dataset="tiny",
        config_dict={
            "data_path": str(tiny_data_path),
            "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
            "threshold": {"rating": 3.0},
            "epochs": 3, "train_batch_size": 64, "eval_batch_size": 2048,
            "show_progress": False, "state": "ERROR",
            "checkpoint_dir": str(tmp_path / "saved"),
            "device_neg_sampling": True, "device_epoch_shuffle": True,
            "filter_mode": "none", "save_sst_embed": False,
        },
    )
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, _ = data_preparation(config, dataset)
    model = get_model("PFCN_PMF")(config, train_data.dataset)
    trainer = Trainer(config, model)
    losses = [trainer._train_epoch(train_data, e) for e in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # BPR decreases over resident epochs
    assert any(k[0] == "resident" for k in trainer._update_cache), \
        "resident executable was not used"
    trainer.eval_collector.data_collect(train_data)
    result = trainer.evaluate(valid_data, load_best_model=False)
    assert "ndcg@5" in result


def test_device_epoch_shuffle_adversarial_passes(tiny_data_path, tmp_path):
    """Resident epochs cover the adversarial alternation too: the filter
    pass (BPR − w·dis, filter optimizer, with device negative draws) and
    the discriminator pass (no negatives) each compile to their own
    one-dispatch executables."""
    from recbole_fairrec_tpu import run_recbole
    from recbole_fairrec_tpu.trainer import adversarial

    captured = {}
    orig = adversarial.PFCNTrainer._train_epoch

    def spy(self, train_data, epoch_idx, **kw):
        out = orig(self, train_data, epoch_idx, **kw)
        captured["keys"] = [k for k in self._update_cache if k[0] == "resident"]
        return out

    adversarial.PFCNTrainer._train_epoch = spy
    try:
        run_recbole(
            model="PFCN_PMF", dataset="tiny",
            config_dict={
                "data_path": str(tiny_data_path),
                "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
                "threshold": {"rating": 3.0},
                "epochs": 2, "train_batch_size": 64, "eval_batch_size": 2048,
                "show_progress": False, "state": "ERROR",
                "checkpoint_dir": str(tmp_path / "saved"),
                "device_neg_sampling": True, "device_epoch_shuffle": True,
                "filter_mode": "cm", "save_sst_embed": False,
            },
            saved=False,
        )
    finally:
        adversarial.PFCNTrainer._train_epoch = orig
    tags = {(k[1], k[3]) for k in captured["keys"]}
    assert ("calculate_dis_loss", "dis") in tags, captured["keys"]


def test_understaged_retry_is_bit_identical(tiny_data_path, tmp_path):
    """ADVICE r4 fix: when loss_batch_fields under-declares and the epoch
    restages after the trace-time KeyError, the retried epoch must be
    bit-identical to a clean full-staged run (numpy + jax RNG snapshots
    restored before the retry)."""
    import jax

    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.trainer import Trainer
    from recbole_fairrec_tpu.utils import get_model, init_seed

    def build():
        config = Config(
            model="PFCN_PMF", dataset="tiny",
            config_dict={
                "data_path": str(tiny_data_path),
                "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
                "threshold": {"rating": 3.0},
                "epochs": 1, "train_batch_size": 64, "eval_batch_size": 2048,
                "show_progress": False, "state": "ERROR",
                "checkpoint_dir": str(tmp_path / "saved"),
                "filter_mode": "none", "save_sst_embed": False,
            },
        )
        init_seed(config["seed"], config["reproducibility"])
        dataset = create_dataset(config)
        train_data, _, _ = data_preparation(config, dataset)
        model = get_model("PFCN_PMF")(config, train_data.dataset)
        return Trainer(config, model), train_data, model

    init_seed(2020, True)
    t_clean, data_clean, _ = build()
    loss_clean = t_clean._train_epoch(data_clean, 0)

    init_seed(2020, True)
    t_bad, data_bad, model_bad = build()
    full_fields = model_bad.loss_batch_fields("calculate_loss", None)
    # under-declare: drop the neg item lane so the filtered trace KeyErrors
    model_bad.loss_batch_fields = lambda loss, sst=None: tuple(
        f for f in full_fields if f != model_bad.NEG_ITEM_ID
    )
    loss_bad = t_bad._train_epoch(data_bad, 0)

    assert loss_bad == loss_clean
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        t_clean.params, t_bad.params,
    )

"""Dataset ETL tests: loading, filtering, k-core, remap, threshold labels,
splitting (reference contract: recbole/data/dataset/dataset.py)."""

import numpy as np
import pytest

from recbole_fairrec_tpu.config import Config
from recbole_fairrec_tpu.data import Dataset, create_dataset, data_preparation


def tiny_config(tiny_data_path, **kw):
    cd = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
        "save_dataset": False,
        "checkpoint_dir": str(tiny_data_path) + "/saved",
        **kw,
    }
    return Config(model="FOCF", dataset="tiny", config_dict=cd)


def test_load_and_remap(tiny_data_path):
    c = tiny_config(tiny_data_path)
    ds = Dataset(c)
    uids = np.asarray(ds.inter_feat["user_id"])
    # PAD id 0 reserved; ids contiguous
    assert uids.min() >= 1
    assert ds.user_num == len(ds.field2id_token["user_id"])
    assert ds.field2id_token["user_id"][0] == "[PAD]"
    # user feat reindexed over full range
    assert len(ds.user_feat) == ds.user_num


def test_threshold_label(tiny_data_path):
    c = tiny_config(tiny_data_path, threshold={"rating": 3.0})
    ds = Dataset(c)
    labels = np.asarray(ds.inter_feat["label"])
    ratings = np.asarray(ds.inter_feat["rating"])
    np.testing.assert_array_equal(labels, (ratings >= 3.0).astype(int))


def test_kcore_filtering(tiny_data_path):
    c = tiny_config(tiny_data_path, user_inter_num_interval="[5,inf)", item_inter_num_interval="[5,inf)")
    ds = Dataset(c)
    uids = np.asarray(ds.inter_feat["user_id"])
    iids = np.asarray(ds.inter_feat["item_id"])
    u_counts = np.bincount(uids)
    i_counts = np.bincount(iids)
    assert (u_counts[u_counts > 0] >= 5).all()
    assert (i_counts[i_counts > 0] >= 5).all()


def test_val_interval_filtering(tiny_data_path):
    c = tiny_config(tiny_data_path, val_interval={"rating": "[4,inf)"})
    ds = Dataset(c)
    assert np.asarray(ds.inter_feat["rating"]).min() >= 4


def test_split_grouped_by_user(tiny_data_path):
    c = tiny_config(tiny_data_path)
    ds = Dataset(c)
    total = ds.inter_num
    train, valid, test = ds.build()
    assert len(train) + len(valid) + len(test) == total
    # every valid/test user appears in train
    train_users = set(np.asarray(train.inter_feat["user_id"]).tolist())
    for part in (valid, test):
        users = set(np.asarray(part.inter_feat["user_id"]).tolist())
        assert users <= train_users
    # RS [8,1,1]: train is the big part
    assert len(train) > len(valid) and len(train) > len(test)


def test_leave_one_out_split(tiny_data_path):
    c = tiny_config(
        tiny_data_path,
        eval_args={"split": {"LS": "valid_and_test"}, "order": "RO", "group_by": "user", "mode": "uni100"},
    )
    ds = Dataset(c)
    n_users_with_inter = len(set(np.asarray(ds.inter_feat["user_id"]).tolist()))
    train, valid, test = ds.build()
    # one left-out row per user per eval part (users with >=3 rows)
    assert len(test) <= n_users_with_inter
    assert len(valid) <= n_users_with_inter


def test_history_matrix_and_inter_matrix(tiny_data_path):
    c = tiny_config(tiny_data_path)
    ds = Dataset(c)
    mat = ds.inter_matrix(form="coo", value_field="rating")
    assert mat.shape == (ds.user_num, ds.item_num)
    assert mat.nnz == ds.inter_num
    hist, vals, lens = ds.history_item_matrix()
    assert hist.shape[0] == ds.user_num
    assert lens.sum() == ds.inter_num


def test_data_preparation_loaders(tiny_data_path):
    c = tiny_config(tiny_data_path, threshold={"rating": 3.0})
    ds = create_dataset(c)
    train, valid, test = data_preparation(c, ds)
    batch = next(iter(train))
    assert "gender" in batch  # user features joined
    inter, idx, pos_u, pos_i = next(iter(valid))
    # uni100: each user's row block = positives + 100 negatives each
    assert len(inter) % 101 == 0
    # first user's block starts with that user's positives
    k = int((pos_u == 0).sum())
    assert (np.asarray(inter["item_id"])[:k] == pos_i[:k]).all()


def test_native_reader_matches_pandas(tiny_data_path):
    """The C++ fast reader must produce byte-identical frames to pandas."""
    import pandas as pd
    from recbole_fairrec_tpu.data.fast_tsv import native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")

    c_fast = tiny_config(tiny_data_path, fast_io=True)
    c_slow = tiny_config(tiny_data_path, fast_io=False)
    ds_fast = Dataset(c_fast)
    ds_slow = Dataset(c_slow)
    for name in ("inter_feat", "user_feat"):
        a, b = getattr(ds_fast, name), getattr(ds_slow, name)
        assert list(a.columns) == list(b.columns)
        for col in a.columns:
            np.testing.assert_array_equal(
                np.asarray(a[col].values), np.asarray(b[col].values), err_msg=f"{name}.{col}"
            )


def test_benchmark_filename_splits(tmp_path):
    """Pre-split <name>.<part>.inter files drive build() directly
    (reference dataset.py:273-289, :1476-1479)."""
    import os

    ddir = tmp_path / "bm"
    ddir.mkdir()
    header = "user_id:token\titem_id:token\trating:float\n"
    rows = {
        "train": [(1, 1, 5), (1, 2, 4), (2, 1, 3), (2, 3, 5), (3, 2, 2)],
        "valid": [(1, 3, 4), (2, 2, 1)],
        "test": [(3, 1, 5)],
    }
    for part, rs in rows.items():
        with open(ddir / f"bm.{part}.inter", "w") as f:
            f.write(header)
            for u, i, r in rs:
                f.write(f"{u}\t{i}\t{r}\n")
    c = tiny_config(
        str(tmp_path), dataset="bm",
        benchmark_filename=["train", "valid", "test"],
        load_col={"inter": ["user_id", "item_id", "rating"]},
    )
    c.final_config_dict["dataset"] = "bm"
    c.final_config_dict["data_path"] = str(ddir)
    ds = Dataset(c)
    assert ds.file_size_list == [5, 2, 1]
    train, valid, test = ds.build()
    assert (len(train), len(valid), len(test)) == (5, 2, 1)


def test_graph_exports(tiny_data_path):
    """create_graph/inter_graph: the TPU-native analogue of the reference's
    dgl/pyg exports (reference dataset.py:1586-1631)."""
    import numpy as np
    import pytest
    import scipy.sparse as sp

    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset

    config = Config(model="FOCF", dataset="tiny", config_dict={
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "use_gpu": False, "state": "ERROR",
    })
    ds = create_dataset(config)
    src, tgt, vals = ds.inter_graph(value_field="rating")
    assert len(src) == len(tgt) == len(vals) == len(ds.inter_feat["user_id"])
    assert vals.dtype == np.float32

    jsrc, jtgt, jvals = ds.inter_graph(form="jax", value_field="rating")
    np.testing.assert_array_equal(np.asarray(jsrc), src)

    coo = ds.inter_graph(form="coo")
    assert sp.issparse(coo) and coo.nnz <= len(src)

    with pytest.raises(NotImplementedError, match="edge_list"):
        ds.inter_graph(form="dgl")

"""Multi-device sharding tests on the simulated 8-device CPU mesh —
the CPU stand-in for a TPU slice (SURVEY.md §4, distributed testing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from recbole_fairrec_tpu.parallel import make_mesh, param_sharding, shard_params
from recbole_fairrec_tpu.parallel.embedding import (
    bucket_allgather_lookup,
    pad_table_rows,
    shard_table,
    sharded_gather,
)
from recbole_fairrec_tpu.parallel.eval import distributed_topk_scores


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((4, 2))


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m = make_mesh((2, 4))
    assert m.shape["data"] == 2 and m.shape["model"] == 4


def test_sharded_embedding_matches_dense(mesh):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 64, 37))

    dense = np.asarray(table[ids])

    sharded = shard_table(mesh, table)
    out = jax.jit(sharded_gather)(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), dense, rtol=1e-6)

    out2 = bucket_allgather_lookup(mesh, sharded, ids)
    np.testing.assert_allclose(np.asarray(out2), dense, rtol=1e-6)


def test_pad_table_rows():
    t = jnp.ones((10, 4))
    padded, rows = pad_table_rows(t, 8)
    assert padded.shape == (16, 4) and rows == 10
    assert float(padded[10:].sum()) == 0.0


def test_distributed_topk_matches_dense(mesh):
    rng = np.random.RandomState(1)
    users = jnp.asarray(rng.randn(12, 8).astype(np.float32))
    items = jnp.asarray(rng.randn(64, 8).astype(np.float32))  # 64 = 2 shards × 32

    dense_scores = np.asarray(users) @ np.asarray(items).T
    expect_idx = np.argsort(-dense_scores, axis=1)[:, :5]

    scores, idx = distributed_topk_scores(mesh, users, items, top_k=5)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1), np.sort(expect_idx, axis=1))
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(dense_scores, np.asarray(idx), axis=1),
        rtol=1e-5,
    )


def test_distributed_topk_with_mask(mesh):
    rng = np.random.RandomState(2)
    users = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    items = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    mask = np.zeros((4, 32), dtype=bool)
    mask[:, :16] = True  # forbid the first half of the catalog

    _, idx = distributed_topk_scores(mesh, users, items, top_k=3, mask_cols=jnp.asarray(mask))
    assert (np.asarray(idx) >= 16).all()


def test_sharded_train_step_matches_single_device(mesh):
    """A data+model-parallel FOCF train step must reproduce the single-device
    update (same params, same batch)."""
    import optax

    from recbole_fairrec_tpu.models.focf import FOCF

    class _Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    class _Feat(dict):
        @property
        def columns(self):
            return list(self.keys())

    n_users, n_items = 64, 96
    rng = np.random.RandomState(3)

    class _DS:
        user_num, item_num = n_users, n_items

        def __init__(self):
            self.inter_feat = {
                "rating": rng.randint(1, 6, 500).astype(np.float32),
            }

        def num(self, field):
            return {"user_id": n_users, "item_id": n_items}[field]

        def get_user_feature(self):
            return _Feat(user_id=np.arange(n_users), gender=np.r_[0, rng.randint(1, 3, n_users - 1)])

    cfg = _Cfg(
        USER_ID_FIELD="user_id", ITEM_ID_FIELD="item_id", NEG_PREFIX="neg_",
        RATING_FIELD="rating", sst_attr_list=["gender"], embedding_size=16,
        fair_weight=1.0, fair_objective="value",
    )
    model = FOCF(cfg, _DS())
    params, _ = model.init_params(jax.random.PRNGKey(0))
    tx = optax.chain(optax.scale_by_adam(eps=1e-8), optax.scale(-1e-3))
    opt_state = tx.init(params)

    batch = {
        "user_id": rng.randint(1, n_users, 32),
        "item_id": rng.randint(1, n_items, 32),
        "rating": rng.randint(1, 6, 32).astype(np.float32),
        "gender": rng.randint(1, 3, 32),
    }

    def step(p, o, b):
        def loss_fn(pp):
            loss, _ = model.calculate_loss(pp, {}, b)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return loss, optax.apply_updates(p, updates)

    # single device
    loss_ref, params_ref = jax.jit(step)(params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()})

    # sharded
    p_shard = param_sharding(mesh, params)
    params_s = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    b_shard = {
        k: NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        for k, v in batch.items()
    }
    batch_s = {k: jax.device_put(np.asarray(v), b_shard[k]) for k, v in batch.items()}
    loss_sh, params_sh = jax.jit(step, in_shardings=(p_shard, None, b_shard))(
        params_s, opt_state, batch_s
    )

    assert abs(float(loss_ref) - float(loss_sh)) < 1e-5
    for key in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(
            np.asarray(params_ref[key]), np.asarray(params_sh[key]), atol=1e-5
        )


def test_trainer_with_mesh_end_to_end(tiny_data_path, tmp_path):
    """run_recbole with mesh_shape=[4,2]: full train+eval over the simulated
    8-device mesh."""
    from recbole_fairrec_tpu import run_recbole

    res = run_recbole(
        model="FOCF",
        dataset="tiny",
        config_dict={
            "data_path": str(tiny_data_path),
            "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
            "epochs": 2, "train_batch_size": 128, "eval_batch_size": 2048,
            "show_progress": False, "state": "ERROR",
            "checkpoint_dir": str(tmp_path / "saved"),
            "mesh_shape": [4, 2],
            "fair_objective": "value",
        },
    )
    assert 0.0 <= res["test_result"]["ndcg@5"] <= 1.0

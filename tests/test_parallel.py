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


# ------------------------------------------------------------ round 2: wiring


def test_bucket_allgather_lookup_data_axis(mesh):
    """2-D layout: ids split over 'data', table rows over 'model' — results
    must match the dense gather with no batch replication."""
    rng = np.random.RandomState(5)
    table = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 64, 40))  # 40 % data-axis(4) == 0
    dense = np.asarray(table[ids])
    sharded = shard_table(mesh, table)
    out = bucket_allgather_lookup(mesh, sharded, ids, data_axis="data")
    np.testing.assert_allclose(np.asarray(out), dense, rtol=1e-6)


def test_distributed_topk_valid_rows(mesh):
    """Rows appended by pad_table_rows can never win the top-k."""
    rng = np.random.RandomState(6)
    users = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    real = rng.randn(30, 8).astype(np.float32)
    padded, n_valid = pad_table_rows(jnp.asarray(real), mesh.shape["model"])
    assert padded.shape[0] == 30  # 30 % 2 == 0 already
    # force actual padding with 31 real rows
    padded, n_valid = pad_table_rows(jnp.asarray(np.vstack([real, real[:1]])), 2)
    assert padded.shape[0] == 32 and n_valid == 31

    dense = np.asarray(users) @ np.asarray(padded[:n_valid]).T
    expect_idx = np.argsort(-dense, axis=1)[:, :5]
    scores, idx = distributed_topk_scores(mesh, users, padded, top_k=5, valid_rows=n_valid)
    assert (np.asarray(idx) < n_valid).all()
    np.testing.assert_array_equal(np.sort(np.asarray(idx), 1), np.sort(expect_idx, 1))


def _build_pfcn_none(data_path, tmp_path, extra):
    from recbole_fairrec_tpu.config import Config
    from recbole_fairrec_tpu.data import create_dataset, data_preparation
    from recbole_fairrec_tpu.trainer import Trainer
    from recbole_fairrec_tpu.utils import get_model, init_seed

    cfg = {
        "data_path": str(data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "filter_mode": "none",
        "metrics": ["NDCG", "Recall", "Hit", "MRR"],
        "topk": [5], "valid_metric": "NDCG@5",
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
                      "group_by": "user", "mode": "full"},
        "show_progress": False, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
    }
    cfg.update(extra)
    config = Config(model="PFCN_PMF", dataset="tiny", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, _ = data_preparation(config, dataset)
    model = get_model("PFCN_PMF")(config, train_data.dataset)
    trainer = Trainer(config, model)
    return trainer, valid_data


def test_mesh_evaluate_uses_distributed_topk(tiny_data_path, tmp_path):
    """Under mesh_shape with a model axis, Trainer.evaluate must route
    full-sort scoring through the item-sharded distributed top-k (VERDICT r1
    item 4) and agree with the single-device fused path: identical top-k SET
    (hit/recall bitwise) and rank metrics within head-saturation-tie slack."""
    base_tr, base_eval = _build_pfcn_none(tiny_data_path, tmp_path / "a", {})
    base = dict(base_tr.evaluate(base_eval, load_best_model=False))
    assert base_tr._last_eval_path == "fused"

    mesh_tr, mesh_eval = _build_pfcn_none(
        tiny_data_path, tmp_path / "b",
        {"mesh_shape": [2, 4], "distributed_eval": True},
    )
    dist = dict(mesh_tr.evaluate(mesh_eval, load_best_model=False))
    assert mesh_tr._last_eval_path == "distributed"

    assert set(base) == set(dist)
    for k in base:
        if k.startswith(("recall", "hit")):
            assert base[k] == dist[k], k
        else:
            assert abs(base[k] - dist[k]) < 2e-3, k


def test_model_lookup_allgather_exchange_matches_plain():
    """config['embedding_exchange']='allgather' routes model lookups through
    the explicit shard_map exchange; loss and grads must match the
    declarative path."""
    from recbole_fairrec_tpu.models.pfcn_pmf import PFCN_PMF

    class _Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    class _Feat(dict):
        @property
        def columns(self):
            return list(self.keys())

    n_users, n_items = 32, 40
    rng = np.random.RandomState(7)

    class _DS:
        user_num, item_num = n_users, n_items

        def num(self, field):
            return {"user_id": n_users, "item_id": n_items}[field]

        def get_user_feature(self):
            return _Feat(user_id=np.arange(n_users),
                         gender=np.r_[0, rng.randint(1, 3, n_users - 1)])

    cfg = _Cfg(USER_ID_FIELD="user_id", ITEM_ID_FIELD="item_id",
               NEG_PREFIX="neg_", sst_attr_list=["gender"],
               embedding_size=16, filter_mode="none", activation="leakyrelu")
    model = PFCN_PMF(cfg, _DS())
    params, _ = model.init_params(jax.random.PRNGKey(0))
    batch = {
        "user_id": jnp.asarray(rng.randint(1, n_users, 16)),
        "item_id": jnp.asarray(rng.randint(1, n_items, 16)),
        "neg_item_id": jnp.asarray(rng.randint(1, n_items, 16)),
    }

    def loss_fn(p):
        loss, _ = model.calculate_loss(p, {}, batch)
        return loss

    loss_plain, grads_plain = jax.value_and_grad(loss_fn)(params)

    m = make_mesh((4, 2))
    model.runtime_mesh = m
    cfg["embedding_exchange"] = "allgather"
    params_s = shard_params(m, params)
    loss_x, grads_x = jax.jit(jax.value_and_grad(loss_fn))(params_s)

    assert abs(float(loss_plain) - float(loss_x)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(grads_plain["user_embedding"]),
        np.asarray(grads_x["user_embedding"]), atol=1e-5,
    )


def test_init_multihost_noop():
    from recbole_fairrec_tpu.quick_start import init_multihost

    assert init_multihost({}) is False
    assert init_multihost(None) is False


def test_multihost_two_process():
    """REAL multi-host exercise (VERDICT r2 item 3): two OS processes with a
    local coordinator, each 2 CPU devices → a 4-device global mesh; one
    cross-process psum and one sharded FOCF train step must agree across
    processes."""
    import os
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "WORKER_OK" in out, out

    def grab(tag, out):
        return [l.split()[1] for l in out.splitlines() if l.startswith(tag)]

    # psum over 4 global devices contributing their index: 0+1+2+3
    assert grab("PSUM", outs[0]) == ["6.0"] and grab("PSUM", outs[1]) == ["6.0"]
    # the sharded step's replicated loss must be identical in both processes
    l0, l1 = grab("LOSS", outs[0]), grab("LOSS", outs[1])
    assert l0 and l0 == l1, (l0, l1)


def test_macro_scan_epoch_matches_single_step(tiny_data_path, tmp_path):
    """train_macro_steps fuses k updates into one lax.scan dispatch; the
    resulting params and epoch loss must match the per-step path."""
    def run(macro, sub):
        from recbole_fairrec_tpu.config import Config
        from recbole_fairrec_tpu.data import create_dataset, data_preparation
        from recbole_fairrec_tpu.trainer import Trainer
        from recbole_fairrec_tpu.utils import get_model, init_seed

        config = Config(model="PFCN_PMF", dataset="tiny", config_dict={
            "data_path": str(tiny_data_path),
            "load_col": {"inter": ["user_id", "item_id", "rating"],
                         "user": ["user_id", "gender"]},
            "filter_mode": "none", "train_batch_size": 128,
            "train_macro_steps": macro,
            "show_progress": False, "state": "ERROR",
            "checkpoint_dir": str(tmp_path / sub),
        })
        init_seed(config["seed"], config["reproducibility"])
        dataset = create_dataset(config)
        train_data, _, _ = data_preparation(config, dataset)
        model = get_model("PFCN_PMF")(config, train_data.dataset)
        trainer = Trainer(config, model)
        loss = trainer._train_epoch(train_data, 0)
        return loss, trainer.params

    loss_1, params_1 = run(1, "a")
    loss_k, params_k = run(4, "b")
    assert loss_1 == pytest.approx(loss_k, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(params_1["user_embedding"]),
        np.asarray(params_k["user_embedding"]), atol=1e-5,
    )


def test_sharded_propagation_matches_dense(mesh):
    """Row-sharded A@x over the model axis equals the single-device matmul
    (the FairGo dense-propagation operator beyond one chip)."""
    import jax.numpy as jnp

    from recbole_fairrec_tpu.parallel import (
        shard_propagation_matrix, sharded_propagate,
    )

    rng = np.random.RandomState(5)
    n, d = 37, 16  # deliberately not divisible by the model axis (2)
    A = rng.rand(n, n).astype(np.float32) * (rng.rand(n, n) < 0.2)
    x = rng.randn(n, d).astype(np.float32)

    A_sharded = shard_propagation_matrix(mesh, jnp.asarray(A))
    assert A_sharded.shape[0] % mesh.shape["model"] == 0
    out = np.asarray(sharded_propagate(mesh, A_sharded, jnp.asarray(x)))
    np.testing.assert_allclose(out, A @ x, rtol=1e-5, atol=1e-5)

    # two hops (the FairGo n_layers loop shape)
    out2 = np.asarray(
        sharded_propagate(mesh, A_sharded, sharded_propagate(mesh, A_sharded, jnp.asarray(x)))
    )
    np.testing.assert_allclose(out2, A @ (A @ x), rtol=1e-4, atol=1e-4)

"""Loss-level differential parity vs the torch reference.

Same injected weights + same batch → ``calculate_loss`` / ``calculate_dis_loss``
must agree numerically with the reference implementations
(recbole/model/fair_recommender/*.py). This catches silent training-math
drift that e2e smoke tests cannot (VERDICT round 1, item 4).

Covered surfaces:
* FOCF's five fairness objectives + plain MSE (ref focf.py:75-169)
* PFCN family (MLP/BiasedMF/DMF/PMF) BPR − w·dis and dis loss under
  cm/sm filter modes, binary + multiclass discriminators (ref
  pfcn_mlp.py:177-211 and siblings) — including BiasedMF's [B,B]
  bias-broadcast quirk (pfcn_biasedmf.py:186-194)
* NFCF BCE + ε-differential-fairness penalty (ref nfcf.py:76-110)
* FairGo_PMF pretrain MSE and finetune MSE − w·dis / dis loss for
  WAP / LBA / LVA aggregation (ref fairgo_pmf.py:173-236)

Determinism: dropout is configured to 0 everywhere; BatchNorm runs in train
mode in both frameworks (batch statistics), so forwards are deterministic.
Sensitive attributes are float-coded 0/1 (gender) and 0/1/2 (age) exactly as
the reference's bundled ml-1M .user files, so the reference's raw-value
BCE/CE targets coincide with our LUT-mapped group codes.
"""

import json
import os

import numpy as np
import pytest

import ref_compat

N_USERS, N_ITEMS, EMB, BATCH = 32, 40, 16, 64

METRICS_FAIR = [
    "NDCG", "Recall", "Hit", "MRR", "DifferentialFairness", "GiniIndex",
    "PopularityPercentage", "ValueUnfairness", "AbsoluteUnfairness",
    "UnderUnfairness", "OverUnfairness", "NonParityUnfairness",
]


def _write_dataset(root, name="lpd", seed=5):
    ddir = os.path.join(root, name)
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.RandomState(seed)
    header = "user_id:token\titem_id:token\trating:float\n"
    splits = {"train": [], "valid": [], "test": []}
    for u in range(1, N_USERS + 1):
        items = rng.choice(np.arange(1, N_ITEMS + 1), size=10, replace=False)
        ratings = rng.randint(1, 6, 10)
        for i, r in zip(items[:8], ratings[:8]):
            splits["train"].append((u, i, r))
        splits["valid"].append((u, items[8], ratings[8]))
        splits["test"].append((u, items[9], ratings[9]))
    for i in range(1, N_ITEMS + 1):  # every item id in train
        splits["train"].append((1 + i % N_USERS, i, 3))
    for part, rows in splits.items():
        with open(os.path.join(ddir, f"{name}.{part}.inter"), "w") as f:
            f.write(header)
            for u, i, r in rows:
                f.write(f"{u}\t{i}\t{r}\n")
    with open(os.path.join(ddir, f"{name}.user"), "w") as f:
        f.write("user_id:token\tgender:float\tage:float\n")
        for u in range(1, N_USERS + 1):
            f.write(f"{u}\t{u % 2}\t{u % 3}\n")
    return root


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return _write_dataset(str(tmp_path_factory.mktemp("lpd")))


def _config_dict(data_path, extra):
    cfg = {
        "data_path": data_path,
        "benchmark_filename": ["train", "valid", "test"],
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender", "age"]},
        "embedding_size": EMB,
        "use_gpu": False,
        "show_progress": False,
        "state": "ERROR",
        "dropout": 0.0,
        "dis_dropout": 0.0,
        "mlp_dropout": 0.0,
    }
    cfg.update(extra)
    return cfg


_PACK_CACHE = {}


def _build_pack(framework, model_name, cfg, tmp_root):
    key = (framework, model_name, json.dumps(cfg, sort_keys=True, default=str))
    if key in _PACK_CACHE:
        return _PACK_CACHE[key]
    cfg = dict(cfg)
    cfg["checkpoint_dir"] = os.path.join(tmp_root, f"{framework}_{model_name}_saved")
    if framework == "ref":
        from recbole.config import Config
        from recbole.data import create_dataset, data_preparation
        from recbole.utils import get_model, init_seed
    else:
        from recbole_fairrec_tpu.config import Config
        from recbole_fairrec_tpu.data import create_dataset, data_preparation
        from recbole_fairrec_tpu.utils import get_model, init_seed

    config = Config(model=model_name, dataset="lpd", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model = get_model(config["model"])(config, train_data.dataset)
    pack = {"config": config, "train_ds": train_data.dataset, "model": model}
    _PACK_CACHE[key] = pack
    return pack


def _train_arrays(framework, pack):
    """(uid, iid, rating, label, gender, age) over the train split, numpy."""
    ds = pack["train_ds"]
    feat = ds.inter_feat
    def get(container, field):
        try:
            v = container[field]
        except KeyError:
            return None
        return v.numpy() if framework == "ref" else np.asarray(v)

    user_feat = ds.get_user_feature()
    return (
        get(feat, "user_id"), get(feat, "item_id"), get(feat, "rating"),
        get(feat, "label"), get(user_feat, "gender"), get(user_feat, "age"),
    )


def _make_batch(ref_pack, our_pack, seed=3):
    """Identical batch dict for both frameworks, verified to agree."""
    ref_arrays = _train_arrays("ref", ref_pack)
    our_arrays = _train_arrays("ours", our_pack)
    for idx, (a, b) in enumerate(zip(ref_arrays, our_arrays)):
        assert (a is None) == (b is None)
        if a is not None:
            # user-feature arrays (idx>=4): skip the PAD row — the reference's
            # fillna(inplace=True) no-ops under pandas 2 copy-on-write, so its
            # PAD row keeps NaN where ours holds the documented mean imputation
            s = 1 if idx >= 4 else 0
            np.testing.assert_array_equal(np.asarray(a)[s:], np.asarray(b)[s:])
    uid, iid, rating, label, gender, age = our_arrays
    rng = np.random.RandomState(seed)
    rows = rng.choice(len(uid), BATCH, replace=False)
    batch = {
        "user_id": uid[rows].astype(np.int64),
        "item_id": iid[rows].astype(np.int64),
        "neg_item_id": rng.randint(1, N_ITEMS + 1, BATCH).astype(np.int64),
        "rating": rating[rows].astype(np.float32),
        "gender": gender[uid[rows]].astype(np.float32),
    }
    if label is not None:
        batch["label"] = label[rows].astype(np.float32)
    if age is not None:
        batch["age"] = age[uid[rows]].astype(np.float32)
        assert len(np.unique(batch["age"])) == 3
    assert len(np.unique(batch["gender"])) == 2
    return batch


def _jnp_batch(batch):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()}


# ---------------------------------------------------------------- injection

def _inject(model_name, ref_model, params):
    p = {k: np.asarray(v) if not isinstance(v, dict) else v
         for k, v in params.items()}
    if model_name == "FOCF":
        ref_compat.inject_embedding(ref_model.user_embedding_layer, p["user_embedding"])
        ref_compat.inject_embedding(ref_model.item_embedding_layer, p["item_embedding"])
        return
    if model_name == "NFCF":
        ref_compat.inject_embedding(ref_model.user_embedding, p["user_embedding"])
        ref_compat.inject_embedding(ref_model.item_embedding, p["item_embedding"])
        ref_compat.inject_mlp(ref_model.mlp_layers, params["mlp"])
        return
    if model_name.startswith("FairGo"):
        import torch

        ref_compat.inject_embedding(ref_model.user_embedding_layer, p["user_embedding"])
        ref_compat.inject_embedding(ref_model.item_embedding_layer, p["item_embedding"])
        for sst, mlp in params["filters"].items():
            ref_compat.inject_mlp(ref_model.filter_layer_dict[sst], mlp)
        for sst, mlp in params["discriminators"].items():
            ref_compat.inject_mlp(ref_model.dis_layer_dict[sst], mlp)
        aggr_linears = [m for m in ref_model.aggr_layer if isinstance(m, torch.nn.Linear)]
        for lin, ours in zip(aggr_linears, ("l1", "l2", "l3")):
            ref_compat.inject_linear(lin, params["aggr"][ours])
        return
    # PFCN family
    import torch

    ref_compat.inject_embedding(ref_model.user_embedding_layer
                                if hasattr(ref_model, "user_embedding_layer")
                                else ref_model.user_embedding, p["user_embedding"])
    ref_compat.inject_embedding(ref_model.item_embedding_layer
                                if hasattr(ref_model, "item_embedding_layer")
                                else ref_model.item_embedding, p["item_embedding"])
    if "mlp" in params:
        ref_compat.inject_mlp(ref_model.mlp_layer, params["mlp"])
    if "user_bias" in params:
        ref_compat.inject_embedding(ref_model.user_bias, p["user_bias"])
        ref_compat.inject_embedding(ref_model.item_bias, p["item_bias"])
        with torch.no_grad():
            ref_model.global_bias.copy_(torch.tensor(float(np.asarray(p["global_bias"]))))
    if "user_mlp" in params:
        ref_compat.inject_mlp(ref_model.user_mlp, params["user_mlp"])
        ref_compat.inject_mlp(ref_model.item_mlp, params["item_mlp"])
    if "filters" in params:
        for i in range(1, len(params["filters"]) + 1):
            ref_compat.inject_mlp(ref_model.filter_layer[i], params["filters"][f"f{i}"])
    if "discriminators" in params:
        for sst, mlp in params["discriminators"].items():
            ref_compat.inject_mlp(ref_model.dis_layer_dict[sst], mlp)


def _pair(ref_recbole, data_root, tmp_root, model_name, extra, seed=0):
    """Both models with identical weights + the shared batch."""
    import jax

    cfg = _config_dict(data_root, extra)
    ref_pack = _build_pack("ref", model_name, cfg, tmp_root)
    our_pack = _build_pack("ours", model_name, cfg, tmp_root)
    batch = _make_batch(ref_pack, our_pack)
    our_model = our_pack["model"]
    params, state = our_model.init_params(jax.random.PRNGKey(seed))
    ref_model = ref_pack["model"]
    _inject(model_name, ref_model, params)
    ref_model.train()
    return ref_model, our_model, params, state, batch


REL = 3e-4


# -------------------------------------------------------------------- FOCF

@pytest.mark.parametrize("objective", ["none", "value", "absolute", "under",
                                       "over", "nonparity"])
def test_focf_loss_parity(ref_recbole, data_root, tmp_path_factory, objective):
    tmp_root = str(tmp_path_factory.mktemp("focf"))
    ref_model, our_model, params, state, batch = _pair(
        ref_recbole, data_root, tmp_root, "FOCF",
        {"load_col": {"inter": ["user_id", "item_id", "rating"],
                      "user": ["user_id", "gender"]},
         "fair_weight": 0.7},
    )
    # bypass the reference Config's eval-coercion mangling of the string
    # "value" (configurator.py:106-129) by wiring the objective directly
    ref_model.fair_loss_fun = (None if objective == "none"
                               else getattr(ref_model, f"{objective}_unfairness"))
    our_model.fair_objective = objective

    ref_loss = float(ref_model.calculate_loss(ref_compat.torch_interaction(batch)))
    our_loss, _ = our_model.calculate_loss(params, state, _jnp_batch(batch))
    assert float(our_loss) == pytest.approx(ref_loss, rel=REL, abs=1e-5), objective


# -------------------------------------------------------------------- PFCN

PFCN_CASES = [
    ("PFCN_PMF", "cm", ["gender"]),
    ("PFCN_PMF", "sm", ["gender", "age"]),
    ("PFCN_MLP", "sm", ["gender"]),
    ("PFCN_MLP", "cm", ["gender", "age"]),
    ("PFCN_BiasedMF", "cm", ["gender"]),
    ("PFCN_DMF", "cm", ["gender", "age"]),
]


@pytest.mark.parametrize("model_name,filter_mode,sst_attrs", PFCN_CASES)
def test_pfcn_loss_parity(ref_recbole, data_root, tmp_path_factory,
                          model_name, filter_mode, sst_attrs):
    import torch

    tmp_root = str(tmp_path_factory.mktemp("pfcn"))
    extra = {
        "filter_mode": filter_mode,
        "sst_attr_list": sst_attrs,
        "mlp_hidden_size_list": [24, 12],
        "dis_hidden_size_list": [16, 8],
        "dis_weight": 10.0,
    }
    ref_model, our_model, params, state, batch = _pair(
        ref_recbole, data_root, tmp_root, model_name, extra
    )
    for mlp in getattr(ref_model, "filter_layer", {}).values():
        mlp.train()
    for mlp in getattr(ref_model, "dis_layer_dict", {}).values():
        mlp.train()
    sst_tuple = tuple(sst_attrs)
    interaction = ref_compat.torch_interaction(batch)
    jbatch = _jnp_batch(batch)

    ref_dis = float(ref_model.calculate_dis_loss(interaction, list(sst_tuple)))
    our_dis, _ = our_model.calculate_dis_loss(params, state, jbatch, None, sst_tuple)
    assert float(our_dis) == pytest.approx(ref_dis, rel=REL, abs=1e-5), "dis loss"

    with torch.random.fork_rng():  # dropout is 0 but BN fwd is deterministic
        ref_loss = float(ref_model.calculate_loss(interaction, list(sst_tuple)))
    our_loss, _ = our_model.calculate_loss(params, state, jbatch, None, sst_tuple)
    assert float(our_loss) == pytest.approx(ref_loss, rel=REL, abs=1e-5), "model loss"

    # single-attribute subsets must also agree (PFCN eval enumerates subsets)
    if len(sst_attrs) > 1:
        sub = (sst_attrs[0],)
        ref_dis1 = float(ref_model.calculate_dis_loss(interaction, list(sub)))
        our_dis1, _ = our_model.calculate_dis_loss(params, state, jbatch, None, sub)
        assert float(our_dis1) == pytest.approx(ref_dis1, rel=REL, abs=1e-5)


# -------------------------------------------------------------------- NFCF

@pytest.mark.parametrize("stage", ["pretrain", "finetune"])
def test_nfcf_loss_parity(ref_recbole, data_root, tmp_path_factory, stage):
    tmp_root = str(tmp_path_factory.mktemp("nfcf"))
    ref_model, our_model, params, state, batch = _pair(
        ref_recbole, data_root, tmp_root, "NFCF",
        {"load_col": {"inter": ["user_id", "item_id", "rating"],
                      "user": ["user_id", "gender"]},
         "mlp_hidden_size": [24, 12],
         "threshold": {"rating": 3.0},
         "load_pretrain_path": None,
         "fair_weight": 0.4},
    )
    if stage == "finetune":
        # activate the ε-DF penalty branch without an actual checkpoint load
        ref_model.load_pretrain_path = "<set>"
        our_model.load_pretrain_path = "<set>"
    else:
        ref_model.load_pretrain_path = None
        our_model.load_pretrain_path = None
    ref_loss = float(ref_model.calculate_loss(ref_compat.torch_interaction(batch)))
    our_loss, _ = our_model.calculate_loss(params, state, _jnp_batch(batch))
    assert float(our_loss) == pytest.approx(ref_loss, rel=REL, abs=1e-5), stage


# ------------------------------------------------------------------ FairGo

FAIRGO_CASES = [
    ("pretrain", "WAP"),
    ("finetune", "WAP"),
    ("finetune", "LBA"),
    ("finetune", "LVA"),
]


@pytest.mark.parametrize("stage,aggr", FAIRGO_CASES)
def test_fairgo_pmf_loss_parity(ref_recbole, data_root, tmp_path_factory, stage, aggr):
    tmp_root = str(tmp_path_factory.mktemp("fairgo"))
    extra = {
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "n_layers": 2,
        "aggr_method": aggr,
        "vs_weights": [0.3, 0.7],
        "filter_hidden_size_list": [24],
        "dis_hidden_size_list": [16, 8],
        "fair_weight": 0.5,
        "load_pretrain_weight": False,
        "activation": "leakyrelu",
    }
    ref_model, our_model, params, state, batch = _pair(
        ref_recbole, data_root, tmp_root, "FairGo_PMF", extra
    )
    ref_model.train_stage = stage
    our_model.train_stage = stage
    interaction = ref_compat.torch_interaction(batch)
    jbatch = _jnp_batch(batch)

    ref_loss = float(ref_model.calculate_loss(interaction, ["gender"]))
    our_loss, _ = our_model.calculate_loss(params, state, jbatch, None, ("gender",))
    assert float(our_loss) == pytest.approx(ref_loss, rel=REL, abs=1e-5), "model loss"

    if stage == "finetune":
        ref_dis = float(ref_model.calculate_dis_loss(interaction, ["gender"]))
        our_dis, _ = our_model.calculate_dis_loss(params, state, jbatch, None, ("gender",))
        assert float(our_dis) == pytest.approx(ref_dis, rel=REL, abs=1e-5), "dis loss"


def test_bce_saturation_parity(ref_recbole):
    """Saturated probabilities (exactly 0.0 / 1.0 in f32) must reproduce
    torch nn.BCELoss's -100 log clamp, not 0 * -inf = NaN.

    This is the regime an adversarially-winning PFCN/FairGo filter drives
    the discriminator into (cm runs reached it by epoch ~40 on ml-100k-fair);
    reference survives via torch's clamp (aten BCELoss log clamping), so the
    JAX build must too.
    """
    import jax.numpy as jnp
    import torch

    from recbole_fairrec_tpu.models.losses import bce_loss
    from recbole_fairrec_tpu.models.pfcn_base import _weighted_bce

    probs = np.array([0.0, 1.0, 0.5, 1.0, 0.0], dtype=np.float32)
    targets = np.array([1.0, 0.0, 1.0, 1.0, 0.0], dtype=np.float32)
    ref = float(torch.nn.BCELoss()(torch.tensor(probs), torch.tensor(targets)))

    ours = float(bce_loss(jnp.asarray(probs), jnp.asarray(targets)))
    assert np.isfinite(ours) and ours == pytest.approx(ref, rel=1e-6)

    w = np.ones_like(probs)
    ours_w = float(
        _weighted_bce(jnp.asarray(probs)[:, None], jnp.asarray(targets)[:, None],
                      jnp.asarray(w))
    )
    assert np.isfinite(ours_w) and ours_w == pytest.approx(ref, rel=1e-6)

    # GRADIENT parity through sigmoid: torch's custom BCE backward
    # (p-t)/max(p(1-p),1e-12) chained with sigmoid' zeroes the gradient at
    # exact saturation (the self-limiting property of the adversarial game);
    # naive autodiff through the -100 clamp would emit 0 * inf = NaN here.
    logits = np.array([-30.0, 30.0, 0.3, 30.0, -30.0], dtype=np.float32)
    tl = torch.tensor(logits, requires_grad=True)
    torch.nn.BCELoss()(torch.sigmoid(tl), torch.tensor(targets)).backward()
    import jax

    ours_g = jax.grad(
        lambda x: bce_loss(jax.nn.sigmoid(x), jnp.asarray(targets))
    )(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(ours_g), tl.grad.numpy(), rtol=1e-5,
                               atol=1e-8)
    assert np.isfinite(np.asarray(ours_g)).all()


def test_segment_bn_matches_reference_train_mode_per_user_batches(ref_recbole):
    """Reference-defect emulation core (VERDICT r4 item 3): our eval-time
    per-user-segment BN (layers.apply_mlp bn_segments) must equal the
    reference's train-mode BatchNorm fed each user's rows as its own batch
    — the regime the reference's unregistered filter MLPs
    (pfcn_mlp.py:104-120) + one-user uni100 eval batches
    (general_dataloader.py:68-158) actually run in."""
    import torch
    import jax
    import jax.numpy as jnp

    from recbole.model.layers import MLPLayers
    from recbole_fairrec_tpu.models.layers import apply_mlp, init_mlp, init_mlp_state

    d = 8
    sizes = [d, 2 * d, d]
    params = init_mlp(jax.random.PRNGKey(3), sizes, init_method="norm", bn=True)
    state = init_mlp_state(sizes, bn=True)
    torch_mlp = MLPLayers(sizes, activation="leakyrelu", bn=True, init_method="norm")
    ref_compat.inject_mlp(torch_mlp, params)
    torch_mlp.train()  # the defect: eval() never reaches the filters

    rng = np.random.RandomState(0)
    # three users; each user's rows are its embedding repeated (the filter
    # input during sampled eval), different row counts per user
    counts = [5, 3, 7]
    user_embeds = rng.randn(3, d).astype(np.float32)
    rows = np.concatenate([np.tile(user_embeds[i], (c, 1)) for i, c in enumerate(counts)])
    segments = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])

    ours, _ = apply_mlp(
        params, jnp.asarray(rows), activation="leakyrelu", state=state,
        train=False, bn_segments=jnp.asarray(segments, jnp.int32),
        bn_num_segments=3,
    )

    ref_rows = []
    with torch.no_grad():
        start = 0
        for c in counts:  # one torch batch per user, train-mode BN
            ref_rows.append(torch_mlp(torch.from_numpy(rows[start:start + c])).numpy())
            start += c
    ref = np.concatenate(ref_rows)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6)

    # annihilation: constant rows normalize to beta exactly -> the output is
    # user-independent: leakyrelu(beta_last) for every row
    expect = np.asarray(jnp.where(
        params["bn"][-1]["beta"] >= 0, params["bn"][-1]["beta"],
        0.01 * params["bn"][-1]["beta"]))
    np.testing.assert_allclose(np.asarray(ours), np.tile(expect, (len(rows), 1)), atol=2e-5)

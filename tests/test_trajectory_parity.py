"""Multi-epoch training-trajectory parity vs the torch reference.

VERDICT r2 item 3: the committed parity runs show divergences whose cause was
unadjudicated — NFCF's reference runs collapse on some seeds while ours never
do, and FairGo finetune NonParity differs ~4×. This harness removes every
source of run-to-run randomness (weights injected, batch sequence fixed,
negatives fixed, sst masks fixed, dropout 0) and drives BOTH frameworks
through the same N-epoch optimization schedule with their REAL optimizers:

* NFCF pretrain (plain NCF + BCE, the stage where the reference's collapsed
  seeds already collapse — see runs/parity/NFCF_pre_ref_2022/2023): base
  Trainer single-optimizer loop vs torch adam over all params
  (reference trainer.py:155-204).
* FairGo_PMF finetune (the alternating filter/discriminator game,
  reference trainer.py:687-704): filter pass on interval epochs via
  optimizer_filter, dis pass every epoch via optimizer_dis, masked to the
  same param groups as FairGo_PMFTrainer (reference trainer.py:837-847).

If per-pass losses and post-run parameters agree to float-noise here, the
update dynamics (grad math, adam semantics, masking, alternation order) are
equivalent, and the remaining run-level divergence is attributable to RNG
path + the chaotic adversarial game — that adjudication is recorded in
PARITY_RUNS.md.
"""

import numpy as np
import pytest

import ref_compat
import test_loss_parity as tlp

BATCHES_PER_EPOCH = 6


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return tlp._write_dataset(str(tmp_path_factory.mktemp("traj")))


def _fixed_batches(ref_pack, our_pack, n_epochs, seed=17, with_label=False):
    """One fixed batch sequence consumed by both frameworks every epoch."""
    batches = []
    rng = np.random.RandomState(seed)
    arrays = tlp._train_arrays("ours", our_pack)
    uid, iid, rating, label, gender, age = arrays
    for _ in range(n_epochs * BATCHES_PER_EPOCH):
        rows = rng.choice(len(uid), tlp.BATCH, replace=False)
        batch = {
            "user_id": uid[rows].astype(np.int64),
            "item_id": iid[rows].astype(np.int64),
            "neg_item_id": rng.randint(1, tlp.N_ITEMS + 1, tlp.BATCH).astype(np.int64),
            "rating": rating[rows].astype(np.float32),
            "gender": gender[uid[rows]].astype(np.float32),
        }
        if with_label:
            batch["label"] = (rating[rows] >= 3).astype(np.float32)
        batches.append(batch)
    return batches


def _ref_adam(params, lr):
    import torch

    return torch.optim.Adam(params, lr=lr)


def _ref_pass(ref_model, optimizer, loss_fn_name, batches, sst_list=None):
    """Reference _train_epoch_with_mask body (trainer.py:155-204, 706-736)."""
    ref_model.train()
    total = 0.0
    loss_fn = getattr(ref_model, loss_fn_name)
    for batch in batches:
        interaction = ref_compat.torch_interaction(batch)
        optimizer.zero_grad()
        loss = (loss_fn(interaction) if sst_list is None
                else loss_fn(interaction, list(sst_list)))
        total += float(loss)
        loss.backward()
        optimizer.step()
    return total


def _our_pass(trainer, loss_name, tag, batches, sst_list=None):
    import jax

    total = 0.0
    update = trainer._get_update_fn(loss_name, sst_list, tag)
    for batch in batches:
        trainer.rng, step_rng = jax.random.split(trainer.rng)
        loss, trainer.params, trainer.model_state, new_opt = update(
            trainer.params, trainer.model_state, trainer._opt_state_by_tag(tag),
            step_rng, {k: np.asarray(v) for k, v in batch.items()},
        )
        trainer._set_opt_state_by_tag(tag, new_opt)
        total += float(loss)
    return total


def _max_param_diff(ref_named, our_tree):
    """max |ref − ours| over corresponding leaves (caller pairs them)."""
    diffs = [np.max(np.abs(r - np.asarray(o))) for r, o in zip(ref_named, our_tree)]
    return float(max(diffs))


def test_nfcf_pretrain_trajectory(ref_recbole, data_root, tmp_path_factory):
    """3 epochs × 6 batches of plain-NCF BCE under adam: losses must track."""
    import jax

    tmp_root = str(tmp_path_factory.mktemp("traj_nfcf"))
    extra = {
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "mlp_hidden_size": [24, 12],
        "threshold": {"rating": 3.0},
        "load_pretrain_path": None,
        "fair_weight": 0.4,
    }
    cfg = tlp._config_dict(data_root, extra)
    ref_pack = tlp._build_pack("ref", "NFCF", cfg, tmp_root)
    our_pack = tlp._build_pack("ours", "NFCF", cfg, tmp_root)
    ref_model, our_model = ref_pack["model"], our_pack["model"]

    params, state = our_model.init_params(jax.random.PRNGKey(0))
    tlp._inject("NFCF", ref_model, params)

    from recbole_fairrec_tpu.trainer import Trainer

    trainer = Trainer(our_pack["config"], our_model)
    trainer.params, trainer.model_state = params, state
    trainer.opt_state = trainer.optimizer.init(trainer.params)

    lr = float(our_pack["config"]["learning_rate"])
    ref_opt = _ref_adam(ref_model.parameters(), lr)

    n_epochs = 3
    batches = _fixed_batches(ref_pack, our_pack, n_epochs, with_label=True)
    for epoch in range(n_epochs):
        chunk = batches[epoch * BATCHES_PER_EPOCH:(epoch + 1) * BATCHES_PER_EPOCH]
        ref_total = _ref_pass(ref_model, ref_opt, "calculate_loss", chunk)
        our_total = _our_pass(trainer, "calculate_loss", "main", chunk)
        assert our_total == pytest.approx(ref_total, rel=2e-3), f"epoch {epoch}"

    # post-run parameters: embeddings drive every downstream metric
    ue = ref_model.user_embedding.weight.detach().numpy()
    ie = ref_model.item_embedding.weight.detach().numpy()
    drift = _max_param_diff(
        [ue, ie],
        [trainer.params["user_embedding"], trainer.params["item_embedding"]],
    )
    scale = max(np.abs(ue).max(), np.abs(ie).max())
    assert drift < 5e-3 * max(scale, 1.0), drift


def _fairgo_setup(data_root, tmp_root, learner="adam"):
    import jax

    extra = {
        "load_col": {"inter": ["user_id", "item_id", "rating"],
                     "user": ["user_id", "gender"]},
        "n_layers": 2,
        "aggr_method": "WAP",
        "filter_hidden_size_list": [24],
        "dis_hidden_size_list": [16, 8],
        "fair_weight": 0.5,
        "load_pretrain_weight": False,
        "activation": "leakyrelu",
        "train_epoch_interval": 2,
        "learner": learner,
    }
    cfg = tlp._config_dict(data_root, extra)
    ref_pack = tlp._build_pack("ref", "FairGo_PMF", cfg, tmp_root)
    our_pack = tlp._build_pack("ours", "FairGo_PMF", cfg, tmp_root)
    ref_model, our_model = ref_pack["model"], our_pack["model"]

    params, state = our_model.init_params(jax.random.PRNGKey(1))
    tlp._inject("FairGo_PMF", ref_model, params)
    ref_model.train_stage = "finetune"

    from recbole_fairrec_tpu.utils import get_trainer

    trainer = get_trainer(None, "FairGo_PMF")(our_pack["config"], our_model)
    # the ctor resolves the stage machine to 'pretrain' (no pretrain file);
    # force the finetune stage the way reset_params does (reference :561-579)
    trainer.model.train_stage = "finetune"
    trainer.params, trainer.model_state = params, state
    trainer.opt_state_filter = trainer.tx_filter.init(trainer.params)
    trainer.opt_state_dis = trainer.tx_dis.init(trainer.params)
    return ref_pack, our_pack, ref_model, trainer


def test_adversarial_updates_touch_only_their_group(ref_recbole, data_root, tmp_path_factory):
    """Out-of-group params must be BIT-identical after a group-restricted
    update. Regression for the optax.masked defect: masked() passes unmasked
    leaves' updates (raw gradients) through unchanged, so apply_updates was
    adding a full +grad ascent kick to embeddings/discriminators on every
    filter pass (measured: Δuser_embedding == grad exactly)."""
    import jax

    tmp_root = str(tmp_path_factory.mktemp("traj_groups"))
    ref_pack, our_pack, ref_model, trainer = _fairgo_setup(data_root, tmp_root)
    batch = _fixed_batches(ref_pack, our_pack, 1, seed=29)[0]

    for tag, group in [("filter", {"filters"}), ("dis", {"discriminators"})]:
        before = jax.tree_util.tree_map(np.array, trainer.params)
        loss_name = "calculate_loss" if tag == "filter" else "calculate_dis_loss"
        _our_pass(trainer, loss_name, tag, [batch], ("gender",))
        for key in before:
            changed = any(
                np.any(np.asarray(a) != np.asarray(b))
                for a, b in zip(
                    jax.tree_util.tree_leaves(before[key]),
                    jax.tree_util.tree_leaves(trainer.params[key]),
                )
            )
            if key in group:
                assert changed, f"{tag} update left its own group {key} unchanged"
            else:
                assert not changed, f"{tag} update modified out-of-group {key}"


def test_fairgo_finetune_gradient_parity(ref_recbole, data_root, tmp_path_factory):
    """Per-batch loss AND gradient parity for both alternation objectives —
    the quantities the optimizers actually consume. (Multi-epoch lockstep
    under adam is impossible at f32: adam normalizes each coordinate by
    |g|, so sub-noise gradient components take full ±lr kicks whose sign is
    float noise — measured ~0.9% loss drift ONE step after gradients that
    agree to 7e-5. That amplification is the chaotic adversarial game both
    frameworks exhibit across seeds, not semantic drift; see
    test_fairgo_finetune_trajectory_sgd for the multi-epoch proof under a
    smooth optimizer.)"""
    import jax
    import jax.numpy as jnp
    import torch

    tmp_root = str(tmp_path_factory.mktemp("traj_fairgo_grad"))
    ref_pack, our_pack, ref_model, trainer = _fairgo_setup(data_root, tmp_root)
    our_model, params, state = trainer.model, trainer.params, trainer.model_state

    batch = _fixed_batches(ref_pack, our_pack, 1, seed=23)[0]
    interaction = ref_compat.torch_interaction(batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def zero_ref_grads():
        # the reference's filter/dis dicts are plain python dicts, NOT
        # registered submodules (the same defect VERDICT pinned for PFCN at
        # pfcn_mlp.py:105-143) — model.zero_grad() misses them and grads
        # accumulate across backwards. Harmless in the reference trainer
        # (each optimizer zeroes exactly its own groups before stepping);
        # fatal for a grad comparison, so zero them explicitly.
        ref_model.zero_grad()
        for d in (ref_model.filter_layer_dict, ref_model.dis_layer_dict):
            for m in d.values():
                for p in m.parameters():
                    p.grad = None

    for loss_name in ("calculate_loss", "calculate_dis_loss"):
        zero_ref_grads()
        ref_loss = getattr(ref_model, loss_name)(interaction, ["gender"])
        ref_loss.backward()

        def loss_fn(p):
            l, _ = getattr(our_model, loss_name)(
                p, state, jb, rng=jax.random.PRNGKey(0), sst_list=("gender",)
            )
            return l

        our_loss, our_grads = jax.value_and_grad(loss_fn)(params)
        assert float(our_loss) == pytest.approx(float(ref_loss), rel=3e-4), loss_name

        groups = {
            "filters": ref_model.filter_layer_dict,
            "discriminators": ref_model.dis_layer_dict,
        }
        for gname, ref_dict in groups.items():
            for sst, mlp in ref_dict.items():
                ref_norms = sorted(
                    float(p.grad.abs().max()) for p in mlp.parameters()
                )
                our_norms = sorted(
                    float(np.abs(np.asarray(x)).max())
                    for x in jax.tree_util.tree_leaves(our_grads[gname][sst])
                )
                np.testing.assert_allclose(
                    our_norms, ref_norms, rtol=1e-3, atol=1e-7,
                    err_msg=f"{loss_name}/{gname}/{sst}",
                )
        # embedding grads (flow through both objectives, stepped by neither)
        np.testing.assert_allclose(
            np.asarray(our_grads["user_embedding"]),
            ref_model.user_embedding_layer.weight.grad.numpy(),
            rtol=2e-3, atol=1e-6, err_msg=loss_name,
        )


def test_fairgo_finetune_trajectory_sgd(ref_recbole, data_root, tmp_path_factory):
    """4 alternation epochs (filter every 2nd, dis every epoch, fixed masks)
    under SGD, where update = lr·grad has no per-coordinate renormalization:
    equivalent step semantics ⇒ trajectories must track across epochs."""
    import torch

    tmp_root = str(tmp_path_factory.mktemp("traj_fairgo_sgd"))
    ref_pack, our_pack, ref_model, trainer = _fairgo_setup(
        data_root, tmp_root, learner="sgd"
    )

    lr = float(our_pack["config"]["learning_rate"])
    ref_opt_filter = torch.optim.SGD(
        [{"params": m.parameters()} for m in ref_model.filter_layer_dict.values()],
        lr=lr,
    )
    ref_opt_dis = torch.optim.SGD(
        [{"params": m.parameters()} for m in ref_model.dis_layer_dict.values()],
        lr=lr,
    )

    n_epochs = 4
    interval = 2
    sst = ("gender",)
    batches = _fixed_batches(ref_pack, our_pack, n_epochs, seed=23)
    for epoch in range(n_epochs):
        chunk = batches[epoch * BATCHES_PER_EPOCH:(epoch + 1) * BATCHES_PER_EPOCH]
        if epoch % interval == 0:
            ref_f = _ref_pass(ref_model, ref_opt_filter, "calculate_loss", chunk, sst)
            our_f = _our_pass(trainer, "calculate_loss", "filter", chunk, sst)
            assert our_f == pytest.approx(ref_f, rel=2e-3), f"filter pass, epoch {epoch}"
        ref_d = _ref_pass(ref_model, ref_opt_dis, "calculate_dis_loss", chunk, sst)
        our_d = _our_pass(trainer, "calculate_dis_loss", "dis", chunk, sst)
        assert our_d == pytest.approx(ref_d, rel=2e-3), f"dis pass, epoch {epoch}"

    # embeddings are in neither optimizer's group — must be bit-identical
    np.testing.assert_array_equal(
        np.asarray(trainer.params["user_embedding"]),
        ref_model.user_embedding_layer.weight.detach().numpy(),
    )
    # filters took every interval update — compare trained weights
    # (sorted max-norms: tree_leaves and .parameters() order differently)
    f_ref = [
        p.detach().numpy()
        for m in ref_model.filter_layer_dict.values()
        for p in m.parameters()
    ]
    import jax

    f_ours = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(
            {k: trainer.params["filters"][k] for k in ref_model.filter_layer_dict}
        )
    ]
    ref_norms = sorted(float(np.abs(a).max()) for a in f_ref)
    our_norms = sorted(float(np.abs(a).max()) for a in f_ours)
    np.testing.assert_allclose(our_norms, ref_norms, rtol=1e-3)

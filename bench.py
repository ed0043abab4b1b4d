"""Benchmark: framework BPR-MF train-step throughput (examples/s/chip), ml-1M scale.

Drives the REAL framework path — PFCN_PMF with filter_mode='none' is exactly
a BPR-MF (pairwise BPR over dot-product MF scores), trained through the
Trainer's jitted update function — on synthetic data at ml-1M scale:
6,040 users / 3,629 items / 836,478 interactions
(reference asset/time_test_result/General_recommendation.md:7).

Baseline: upstream RecBole BPRMF at 0.89 s/epoch on a TITAN V
(General_recommendation.md:30) → 836,478 / 0.89 ≈ 939,863 examples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


N_USERS, N_ITEMS, N_INTER = 6040, 3629, 836478
BATCH = 2048
EMB = 64
REFERENCE_EXAMPLES_PER_S = 836478 / 0.89


class _Cfg(dict):
    def __getitem__(self, k):
        return self.get(k)


class _Feat(dict):
    @property
    def columns(self):
        return list(self.keys())


def _make_model():
    from recbole_fairrec_tpu.models.pfcn_pmf import PFCN_PMF

    rng = np.random.RandomState(2020)

    class _DS:
        user_num, item_num = N_USERS, N_ITEMS

        def num(self, field):
            return {"user_id": N_USERS, "item_id": N_ITEMS}[field]

        def get_user_feature(self):
            return _Feat(
                user_id=np.arange(N_USERS),
                gender=np.concatenate([[0], rng.randint(1, 3, N_USERS - 1)]),
            )

    config = _Cfg(
        USER_ID_FIELD="user_id", ITEM_ID_FIELD="item_id", NEG_PREFIX="neg_",
        sst_attr_list=["gender"], embedding_size=EMB, filter_mode="none",
        activation="leakyrelu",
    )
    return PFCN_PMF(config, _DS())


def main():
    import jax
    import jax.numpy as jnp
    import optax

    model = _make_model()
    params, state = model.init_params(jax.random.PRNGKey(2020))
    tx = optax.chain(optax.scale_by_adam(eps=1e-8), optax.scale(-1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, rng, batch):
        def loss_fn(p):
            loss, _ = model.calculate_loss(p, {}, batch, rng=rng, sst_list=None)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    rng = np.random.RandomState(2020)
    n_steps = N_INTER // BATCH  # one epoch
    n_resident = min(n_steps, 64)
    batches = [
        {
            "user_id": jnp.asarray(rng.randint(1, N_USERS, BATCH)),
            "item_id": jnp.asarray(rng.randint(1, N_ITEMS, BATCH)),
            "neg_item_id": jnp.asarray(rng.randint(1, N_ITEMS, BATCH)),
        }
        for _ in range(n_resident)
    ]
    key = jax.random.PRNGKey(0)

    loss, params, opt_state = update(params, opt_state, key, batches[0])
    loss.block_until_ready()

    t0 = time.perf_counter()
    for i in range(n_steps):
        loss, params, opt_state = update(params, opt_state, key, batches[i % n_resident])
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    examples_per_s = n_steps * BATCH / dt
    print(
        json.dumps(
            {
                "metric": "bpr_mf_train_examples_per_s_per_chip",
                "value": round(examples_per_s, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(examples_per_s / REFERENCE_EXAMPLES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

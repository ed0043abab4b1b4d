"""Benchmark: MF train-step throughput (examples/s/chip) on ml-1M scale.

Measures the framework's jitted train step (embedding gather + dot-product
score + loss + Adam update, the BPRMF-equivalent workload) on synthetic
ml-1M-sized data: 6,040 users / 3,629 items / 836,478 interactions
(asset/time_test_result/General_recommendation.md:7 in the reference).

Baseline: upstream RecBole BPRMF at 0.89 s/epoch on a TITAN V
(General_recommendation.md:30) → 836478 / 0.89 ≈ 939,863 examples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

N_USERS, N_ITEMS, N_INTER = 6040, 3629, 836478
BATCH = 2048
EMB = 64
REFERENCE_EXAMPLES_PER_S = 836478 / 0.89


def bpr_mf_update_fn(lr=1e-3):
    tx = optax.chain(optax.scale_by_adam(eps=1e-8), optax.scale(-lr))

    def loss_fn(params, batch):
        u = params["user_embedding"][batch["user"]]
        pos = params["item_embedding"][batch["pos"]]
        neg = params["item_embedding"][batch["neg"]]
        pos_s = jnp.sum(u * pos, axis=-1)
        neg_s = jnp.sum(u * neg, axis=-1)
        return -jnp.log(1e-10 + jax.nn.sigmoid(pos_s - neg_s)).mean()

    @jax.jit
    def update(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, opt_state

    return tx, update


def main():
    rng = np.random.RandomState(2020)
    key = jax.random.PRNGKey(2020)
    k1, k2 = jax.random.split(key)
    params = {
        "user_embedding": jax.random.normal(k1, (N_USERS, EMB)) * 0.01,
        "item_embedding": jax.random.normal(k2, (N_ITEMS, EMB)) * 0.01,
    }
    tx, update = bpr_mf_update_fn()
    opt_state = tx.init(params)

    n_steps = N_INTER // BATCH  # one epoch
    # pre-stage an epoch of batches on device
    n_resident = min(n_steps, 64)
    batches = []
    for _ in range(n_resident):
        batches.append(
            {
                "user": jnp.asarray(rng.randint(1, N_USERS, BATCH)),
                "pos": jnp.asarray(rng.randint(1, N_ITEMS, BATCH)),
                "neg": jnp.asarray(rng.randint(1, N_ITEMS, BATCH)),
            }
        )

    # warmup / compile
    loss, params, opt_state = update(params, opt_state, batches[0])
    loss.block_until_ready()

    t0 = time.perf_counter()
    for i in range(n_steps):
        loss, params, opt_state = update(params, opt_state, batches[i % n_resident])
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

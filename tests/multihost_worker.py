"""Two-process multi-host worker (driven by test_multihost_two_process).

Each process: ``init_multihost`` → global 4-device CPU mesh (2 local devices
x 2 processes) → one cross-process psum → one sharded FOCF train step with
batch rows sharded over the global 'data' axis. Prints machine-readable
PSUM/LOSS lines the parent asserts on.

No reference counterpart — the reference is single-process (SURVEY.md §2.4);
this proves the build-new multi-host capability end to end.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize pins TPU
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    from recbole_fairrec_tpu.quick_start import init_multihost

    assert init_multihost(
        {"multihost": True, "coordinator_address": coord,
         "num_processes": 2, "process_id": pid}
    )
    assert jax.process_count() == 2, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4, devices
    print(f"DEVICES {len(devices)} local {len(jax.local_devices())}", flush=True)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(devices).reshape(4), ("data",))

    # --- one psum across all 4 devices (2 per process) -------------------
    # each device contributes its global index; psum = 0+1+2+3 = 6
    def per_device(idx):
        d = devices[idx.start if isinstance(idx, slice) else 0]
        return None  # unused

    contrib = jax.make_array_from_callback(
        (4,), NamedSharding(mesh, P("data")),
        lambda idx: np.asarray([float(idx[0].start)]),
    )
    summed = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, "data"), mesh=mesh,
            in_specs=P("data"), out_specs=P(),
        )
    )(contrib)
    total = float(np.asarray(summed.addressable_data(0))[0])
    print(f"PSUM {total}", flush=True)

    # --- one sharded train step across processes -------------------------
    import optax

    import __graft_entry__ as g
    from recbole_fairrec_tpu.parallel import replicate

    model, _ = g._make_focf()
    params, _ = model.init_params(jax.random.PRNGKey(0))
    tx = optax.chain(optax.scale_by_adam(eps=1e-8), optax.scale(-1e-3))
    opt_state = tx.init(params)

    rep = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(x.shape, rep, lambda idx: np.asarray(x)[idx]),
        params,
    )
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), rep, lambda idx: np.asarray(x)[idx]
        ) if hasattr(x, "shape") else x,
        opt_state,
        is_leaf=lambda x: hasattr(x, "shape"),
    )

    bs = 16
    rs = np.random.RandomState(0)  # same seed both processes: global batch
    batch_np = {
        "user_id": rs.randint(1, model.n_users, bs),
        "item_id": rs.randint(1, model.n_items, bs),
        "rating": rs.randint(1, 6, bs).astype(np.float32),
        "gender": rs.randint(1, 3, bs),
    }
    row_shard = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_callback(v.shape, row_shard, lambda idx, v=v: v[idx])
        for k, v in batch_np.items()
    }

    def step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = model.calculate_loss(p, {}, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    loss, params, opt_state = jax.jit(step, out_shardings=(rep, rep, None))(
        params, opt_state, batch
    )
    loss_val = float(np.asarray(loss.addressable_data(0)))
    assert np.isfinite(loss_val)
    print(f"LOSS {loss_val:.6f}", flush=True)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()

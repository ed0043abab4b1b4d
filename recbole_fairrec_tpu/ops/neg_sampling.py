"""On-device negative sampling.

The reference rejects candidates against per-user python sets in a host
while-loop (sampler.py:145-197). This op is the jit-resident equivalent: the
used (user, item) pairs are a **sorted uint32/64 key array** resident in HBM,
candidates come from ``jax.random``, membership is a vectorized
``searchsorted``, and rejection is a fixed-trip ``lax.scan`` of masked
resampling.

With per-round collision probability p = used/|I| (≈0.03 for ml-1M), the
probability any sample is still colliding after R rounds is p^R — at R=16
that is ~1e-25 per sample, far below float noise. Samples that somehow remain
colliding are kept (they are valid items, just seen ones) rather than
branching on data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def build_used_keys(user_ids, item_ids, item_num):
    """Host-side: sorted key array for a phase's used (user, item) pairs.
    int32 when the key space fits (TPU default — no-x64 would silently
    truncate int64 anyway); int64 beyond 2^31 keys requires jax x64."""
    keys = np.asarray(user_ids, dtype=np.int64) * int(item_num) + np.asarray(
        item_ids, dtype=np.int64
    )
    keys = np.unique(keys)
    if keys.size == 0 or keys[-1] < 2**31:
        keys = keys.astype(np.int32)
    return jnp.asarray(keys)


# One gather per membership query instead of searchsorted's ~20 dependent
# binary-search gathers — the searchsorted path made in-step sampling ~60×
# slower than the rest of the SGD step (measured 5.3 ms/step vs 0.08 ms at
# ml-1M scale). 64 MB of packed bits covers ~537 M (user, item) pairs.
_BITMAP_BUDGET_BYTES = 64 * 1024 * 1024


def build_used_bitmap(user_ids, item_ids, user_num, item_num):
    """Host-side: [user_num, ceil(item_num/32)] uint32 packed membership bits."""
    words = (int(item_num) + 31) // 32
    bitmap = np.zeros((int(user_num), words), dtype=np.uint32)
    u = np.asarray(user_ids, dtype=np.int64)
    i = np.asarray(item_ids, dtype=np.int64)
    np.bitwise_or.at(bitmap, (u, i >> 5), np.uint32(1) << (i & 31).astype(np.uint32))
    return jnp.asarray(bitmap)


def build_used_table(user_ids, item_ids, user_num, item_num):
    """Membership structure for :func:`sample_negatives`: packed bitmap when
    it fits the budget (single-gather queries), else sorted keys. Either
    return value is accepted by the samplers (dispatch on ndim at trace
    time)."""
    words = (int(item_num) + 31) // 32
    if int(user_num) * words * 4 <= _BITMAP_BUDGET_BYTES:
        return build_used_bitmap(user_ids, item_ids, user_num, item_num)
    return build_used_keys(user_ids, item_ids, item_num)


def _membership_fn(used, item_num):
    """Trace-time dispatch: 2-D ``used`` = packed bitmap, 1-D = sorted keys.
    Returns is_used(tiled_users, items) -> bool[total]."""
    if used.ndim == 2:

        def is_used(tiled_users, items):
            items = items.astype(jnp.int32)
            words = used[tiled_users.astype(jnp.int32), items >> 5]
            return ((words >> (items & 31).astype(jnp.uint32)) & 1).astype(bool)

    else:

        def is_used(tiled_users, items):
            keys = tiled_users * item_num + items.astype(tiled_users.dtype)
            pos = jnp.clip(jnp.searchsorted(used, keys), 0, used.shape[0] - 1)
            return used[pos] == keys

    return is_used


@functools.partial(jax.jit, static_argnames=("item_num", "num_neg", "n_rounds"))
def sample_negatives(rng, user_ids, used_keys, item_num, num_neg=1, n_rounds=16):
    """Uniform negatives excluding used pairs, strided like the reference
    (out[i + k·B] is the k-th negative of user i, sampler.py:152-158).

    Args:
        rng: PRNGKey.
        user_ids: [B] int array.
        used_keys: membership structure from :func:`build_used_table` —
            2-D packed bitmap (one gather per query) or 1-D sorted keys.
        item_num: catalog size (PAD=0 never drawn).
        num_neg: negatives per user.
        n_rounds: static resample rounds.

    Returns:
        [B * num_neg] item ids.
    """
    idx_dtype = used_keys.dtype if used_keys.ndim == 1 else jnp.int32
    tiled_users = jnp.tile(user_ids.astype(idx_dtype), num_neg)
    total = tiled_users.shape[0]
    member = _membership_fn(used_keys, item_num)

    def round_fn(carry, key):
        items, bad = carry
        draws = jax.random.randint(key, (total,), 1, item_num, dtype=idx_dtype)
        items = jnp.where(bad, draws, items)
        bad = bad & member(tiled_users, items)
        return (items, bad), None

    init_items = jnp.zeros(total, dtype=idx_dtype)
    init_bad = jnp.ones(total, dtype=bool)
    (items, _), _ = jax.lax.scan(
        round_fn, (init_items, init_bad), jax.random.split(rng, n_rounds)
    )
    return items


@functools.partial(jax.jit, static_argnames=("item_num", "num_neg", "n_rounds"))
def sample_negatives_repeatable(rng, pos_item_ids, item_num, num_neg=1, n_rounds=16):
    """Repeatable-sampler semantics: exclude only the paired positive
    (sampler.py:373-504)."""
    tiled_pos = jnp.tile(pos_item_ids, num_neg)
    total = tiled_pos.shape[0]

    def round_fn(carry, key):
        items, bad = carry
        draws = jax.random.randint(key, (total,), 1, item_num)
        items = jnp.where(bad, draws, items)
        bad = bad & (items == tiled_pos)
        return (items, bad), None

    (items, _), _ = jax.lax.scan(
        round_fn,
        (jnp.zeros(total, dtype=tiled_pos.dtype), jnp.ones(total, dtype=bool)),
        jax.random.split(rng, n_rounds),
    )
    return items


@functools.partial(jax.jit, static_argnames=("item_num", "num_neg", "n_rounds"))
def sample_negatives_popularity(rng, user_ids, used_keys, alias_prob, alias_idx,
                                alias_values, item_num, num_neg=1, n_rounds=16):
    """Popularity-biased negatives via a device-resident alias table
    (sampler.py:72-120): draw a slot, flip the alias coin, reject used pairs.
    ``item_num`` must match the stride used by :func:`build_used_keys`.
    """
    idx_dtype = used_keys.dtype if used_keys.ndim == 1 else jnp.int32
    tiled_users = jnp.tile(user_ids.astype(idx_dtype), num_neg)
    total = tiled_users.shape[0]
    n_slots = alias_prob.shape[0]
    member = _membership_fn(used_keys, item_num)

    def draw(key):
        k1, k2 = jax.random.split(key)
        slots = jax.random.randint(k1, (total,), 0, n_slots)
        coins = jax.random.uniform(k2, (total,))
        chosen = jnp.where(coins < alias_prob[slots], slots, alias_idx[slots])
        return alias_values[chosen].astype(idx_dtype)

    def round_fn(carry, key):
        items, bad = carry
        draws = draw(key)
        items = jnp.where(bad, draws, items)
        bad = bad & member(tiled_users, items)
        return (items, bad), None

    (items, _), _ = jax.lax.scan(
        round_fn,
        (jnp.zeros(total, dtype=idx_dtype), jnp.ones(total, dtype=bool)),
        jax.random.split(rng, n_rounds),
    )
    return items

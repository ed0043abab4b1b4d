"""Streaming full-catalog top-k (XLA scan formulation).

At production catalog sizes the [B, |I|] score matrix does not fit in HBM
(4096 users × 10M items × 4B = 160 GB). This op streams item tiles through
the MXU and carries a running [B, k] top-k, so peak memory is
O(B·(tile + k)) — the XLA analogue of the Pallas kernel in
``pallas/fused_topk.py``, and the fallback wherever Mosaic is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("top_k", "tile", "mask_pad"))
def streaming_topk_scores(user_emb, item_table, top_k, tile=4096,
                          mask_pad=False):
    """Top-k of ``user_emb @ item_table.T`` without materializing all scores.

    Args:
        user_emb: [B, d].
        item_table: [I, d]; I is padded internally to a tile multiple.
        top_k: static k.
        tile: item-tile width (catalog streamed in chunks of this size).
        mask_pad: exclude the [PAD] item (row 0) like the Pallas kernel and
            approx paths do; default False — the trainer's full-sort eval
            applies its own PAD/history mask downstream.

    Returns:
        (topk_scores [B, k], topk_idx [B, k]) — global item indices; padded
        tail items score −inf and can never win.
    """
    B, d = user_emb.shape
    I = item_table.shape[0]
    n_tiles = -(-I // tile)
    pad = n_tiles * tile - I
    padded = jnp.concatenate(
        [item_table, jnp.zeros((pad, d), item_table.dtype)], axis=0
    ) if pad else item_table
    tiles = padded.reshape(n_tiles, tile, d)

    init = (
        jnp.full((B, top_k), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((B, top_k), dtype=jnp.int32),
    )

    def step(carry, inputs):
        tile_idx, tile_items = inputs
        best_s, best_i = carry
        scores = jnp.dot(
            user_emb, tile_items.T, preferred_element_type=jnp.float32,
            precision="highest",  # exact f32 — rankings must not flip on bf16
        )
        col0 = tile_idx * tile
        local_idx = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        # mask out the padded tail so it can't be selected
        valid = local_idx < I
        if mask_pad:
            valid = valid & (local_idx != 0)
        scores = jnp.where(valid, scores, -jnp.inf)
        cat_s = jnp.concatenate([best_s, scores], axis=1)
        cat_i = jnp.concatenate([best_i, local_idx], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, top_k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    (best_s, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(n_tiles, dtype=jnp.int32), tiles)
    )
    return best_s, best_i


@functools.partial(jax.jit, static_argnames=("top_k", "recall_target", "verify"))
def approx_topk_scores(user_emb, item_table, top_k, recall_target=0.95,
                       verify=False):
    """Approximate-retrieval top-k via the TPU-native partial reduce.

    ``jax.lax.approx_max_k`` lowers to the TPU PartialReduce op, which runs
    at near memory speed — the serving-scale retrieval path where exact
    per-tile k-selection (``streaming_topk_scores`` / the Pallas kernel)
    is VPU-bound on its merge passes. Recall is probabilistic
    (``recall_target``); production recsys retrieval standardly trades
    exactness here and re-scores the candidate set exactly. XLA fuses the
    score matmul into the reduce consumer, so the [B, I] score matrix is
    never fully materialized in HBM (verified on-chip r5).

    Measured (v5e, 2M items × d=128, recall_target 0.95): ~80-84% of rows
    certify exact; verify adds ~0 cost at B=128 (fully fused) and ~2× at
    B=1024 (XLA re-materializes the scores for the second consumer) —
    re-running only uncertified rows through the exact kernel yields
    certified-exact retrieval at a fraction of the exact path's cost.

    ``verify=True`` additionally returns a per-row ``certified`` bool:
    True ⇔ the returned candidates ARE an exact top-k set (up to ties at
    the k-th value). Soundness: let t = the returned k-th score; if the
    number of catalog items scoring strictly above t is ≤ k−1, then every
    item outside the returned set scores ≤ t, so no exact top-k member was
    missed (ties at t are interchangeable). The check is one extra
    row-reduce over the scores (fused); uncertified rows can be re-run
    through an exact path.

    PAD masking matches the exact paths: item 0 can never win.
    """
    scores = jnp.dot(
        user_emb, item_table.T, preferred_element_type=jnp.float32
    )
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(iota == 0, -jnp.inf, scores)
    vals, idx = jax.lax.approx_max_k(scores, top_k, recall_target=recall_target)
    if not verify:
        return vals, idx
    above = jnp.sum((scores > vals[:, -1:]).astype(jnp.int32), axis=1)
    return vals, idx, above <= top_k - 1


def certified_topk_scores(user_emb, item_table, top_k, recall_target=0.95,
                          tile=4096):
    """EXACT top-k at near-approx cost: approx_max_k + per-row exactness
    certificate, then an exact streaming rescue for only the uncertified
    rows (~16-20% at recall_target 0.95, measured v5e @ 2M items).

    Two dispatches worst case; when every row certifies, the rescue is
    skipped entirely (host-side branch on a [B] bool — one small sync).
    Output contract matches ``streaming_topk_scores`` (exact scores +
    indices, PAD item 0 never selected).
    """
    import numpy as np

    vals, idx, certified = approx_topk_scores(
        user_emb, item_table, top_k, recall_target=recall_target, verify=True
    )
    cert_host = np.asarray(certified)
    if cert_host.all():
        return vals, idx
    bad = np.nonzero(~cert_host)[0]
    fix_s, fix_i = streaming_topk_scores(
        user_emb[bad], item_table, top_k, tile=tile, mask_pad=True
    )
    vals = jnp.asarray(vals).at[bad].set(fix_s)
    idx = jnp.asarray(idx).at[bad].set(fix_i)
    return vals, idx

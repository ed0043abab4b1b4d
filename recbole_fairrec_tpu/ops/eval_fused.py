"""Fused on-device evaluation steps.

The reference materializes a [B, |I|] score matrix on host per batch and
recomputes top-k there (trainer.py:420-456 + collector.py:131-205). On TPU
that wastes HBM→host bandwidth; these fused steps keep the score matrix in
HBM, apply PAD/history masking and top-k on device, and return only the
O(B·k) payload:

* ``rec.topk``  — top-k positive-hit matrix ⧺ per-user positive count;
* ``rec.items`` — top-k item ids;
* ``rec.positive_score`` — scores gathered at the positive pairs.

Ragged positive/history lists arrive as padded index arrays; padding rows
target (0, 0) or a sentinel row so they are no-ops (item 0 is the [PAD]
column, already −inf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("top_k",))
def full_sort_eval_step(
    scores, pos_u, pos_i, pos_w, hist_u, hist_i, top_k
):
    """Masked full-sort top-k from a [B, I] score matrix.

    Args:
        scores: [B, I] raw model scores (PAD column included).
        pos_u, pos_i: padded positive pair indices; pos_w 1/0 validity.
        hist_u, hist_i: padded history pairs (pads → (0, 0), harmless since
            column 0 is force-masked).
        top_k: static k.

    Returns:
        (topk_idx [B,k], rec_topk [B,k+1], pos_score [P]) — pos_score aligned
        with the (padded) positive pairs.
    """
    scores = scores.at[:, 0].set(-jnp.inf)
    scores = scores.at[hist_u, hist_i].set(-jnp.inf)

    pos_matrix = jnp.zeros(scores.shape, dtype=jnp.int32)
    pos_matrix = pos_matrix.at[pos_u, pos_i].add(pos_w.astype(jnp.int32))

    _, topk_idx = jax.lax.top_k(scores, top_k)
    pos_len = pos_matrix.sum(axis=1, keepdims=True)
    pos_hit = jnp.take_along_axis(pos_matrix, topk_idx, axis=1)
    rec_topk = jnp.concatenate([pos_hit, pos_len], axis=1)

    pos_score = scores[pos_u, pos_i]
    return topk_idx, rec_topk, pos_score


def sampled_topk_from_scores(
    origin_scores, row_idx, col_idx, valid, pos_u, pos_i, pos_w, n_users, n_items, top_k
):
    """uni100-style top-k math: scatter the sampled candidate scores into a
    device-resident [B, I] −inf matrix (row n_users is a scrap row for
    padding) and rank (parity: trainer.py:441-456). Plain traceable function
    so callers can fuse it behind a model predict inside one jit.
    """
    scores = jnp.full((n_users + 1, n_items), -jnp.inf, dtype=origin_scores.dtype)
    safe_rows = jnp.where(valid > 0, row_idx, n_users)
    scores = scores.at[safe_rows, col_idx].set(origin_scores)
    scores = scores[:n_users]

    pos_matrix = jnp.zeros(scores.shape, dtype=jnp.int32)
    pos_matrix = pos_matrix.at[pos_u, pos_i].add(pos_w.astype(jnp.int32))

    _, topk_idx = jax.lax.top_k(scores, top_k)
    pos_len = pos_matrix.sum(axis=1, keepdims=True)
    pos_hit = jnp.take_along_axis(pos_matrix, topk_idx, axis=1)
    rec_topk = jnp.concatenate([pos_hit, pos_len], axis=1)
    pos_score = scores[pos_u, pos_i]
    return topk_idx, rec_topk, pos_score


sampled_eval_step = functools.partial(
    jax.jit, static_argnames=("n_users", "n_items", "top_k")
)(sampled_topk_from_scores)

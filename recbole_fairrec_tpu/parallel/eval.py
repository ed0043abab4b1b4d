"""Distributed full-catalog scoring + top-k merge.

The "sequence parallelism" axis of this workload (SURVEY.md §5) is the item
catalog: full-sort evaluation is a [B, d] × [d, |I|] matmul plus top-k. Here
the item-embedding matrix is column-split over the ``model`` axis; each chip
scores its item shard on the MXU, takes a LOCAL top-k, and the k·n_shards
candidates are all-gathered and re-ranked — O(B·k·S) merge traffic instead of
O(B·|I|) score traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def distributed_topk_scores(mesh, user_emb, item_table, top_k, axis="model",
                            mask_cols=None, valid_rows=None):
    """Top-k over user·itemᵀ with items sharded across ``axis``.

    Args:
        mesh: device mesh.
        user_emb: [B, d] user representations (replicated over ``axis``).
        item_table: [I, d] item embeddings, rows split over ``axis``
            (I divisible by the axis size — see ``pad_table_rows``).
        top_k: static k.
        mask_cols: optional [B, I] bool mask of forbidden items (history /
            PAD), sharded like the score matrix.
        valid_rows: optional static count of REAL table rows; padding rows
            appended by ``pad_table_rows`` score −inf and can never win.

    Returns:
        (topk_scores [B, k], topk_idx [B, k]) with GLOBAL item indices.
        When the total candidate count is smaller than ``top_k`` (tiny
        catalogs), trailing slots carry score −inf and the out-of-range
        index ``padded_table_rows`` (never a real item id).
    """
    n_shards = mesh.shape[axis]
    rows_per_shard = item_table.shape[0] // n_shards
    use_mask = mask_cols is not None

    # a shard can hold fewer rows than k (tiny catalogs / large k'); its
    # local candidate list is then the whole shard, padded to k with −inf
    local_k = min(top_k, rows_per_shard)

    def body(shard_idx, u, items, mask):
        scores = jnp.dot(u, items.T, preferred_element_type=jnp.float32,
                         precision="highest")
        if mask is not None:
            scores = jnp.where(mask, -jnp.inf, scores)
        col0 = shard_idx * rows_per_shard
        if valid_rows is not None and valid_rows < n_shards * rows_per_shard:
            cols = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(cols < valid_rows, scores, -jnp.inf)
        local_scores, local_idx = jax.lax.top_k(scores, local_k)
        global_idx = local_idx + col0
        # gather every shard's candidates and re-rank
        cand_scores = jax.lax.all_gather(local_scores, axis, axis=1, tiled=True)
        cand_idx = jax.lax.all_gather(global_idx, axis, axis=1, tiled=True)
        if cand_scores.shape[1] < top_k:
            # fewer gathered candidates than k: pad with the out-of-range
            # index sentinel (n_shards * rows_per_shard, one past the last
            # table row) at -inf so padded slots can never be mistaken for
            # real item ids by callers
            pad = top_k - cand_scores.shape[1]
            cand_scores = jnp.pad(cand_scores, ((0, 0), (0, pad)),
                                  constant_values=-jnp.inf)
            cand_idx = jnp.pad(cand_idx, ((0, 0), (0, pad)),
                               constant_values=n_shards * rows_per_shard)
        best_scores, pos = jax.lax.top_k(cand_scores, top_k)
        best_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        return best_scores, best_idx

    if use_mask:
        def kernel(u, items, mask):
            return body(jax.lax.axis_index(axis), u, items, mask)

        fn = shard_map(
            kernel, mesh=mesh,
            in_specs=(P(), P(axis, None), P(None, axis)),
            out_specs=(P(), P()), check_vma=False,
        )
        return fn(user_emb, item_table, mask_cols)

    def kernel(u, items):
        return body(jax.lax.axis_index(axis), u, items, None)

    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()), check_vma=False,
    )
    return fn(user_emb, item_table)

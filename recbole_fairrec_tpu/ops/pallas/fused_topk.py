"""Pallas TPU kernel: fused full-catalog scoring + running top-k.

The eval hot loop is `scores = U · Iᵀ` followed by top-k (reference
trainer.py:420-439 materializes the whole score matrix). This kernel tiles
the item axis on the grid, runs each [B_tile × d] × [d × I_tile] matmul on
the MXU, and merges each tile's scores into a VMEM-resident running top-k —
the [B, |I|] matrix never exists in HBM.

Grid: (user_tiles, item_tiles); the item dimension is sequential
("arbitrary") so the top-k scratch carries across item tiles of one user
tile. The merge is selection-style: k passes of max+mask over the tile's
scores, which is VPU-cheap for the k ≤ 32 this workload uses (lax.top_k
inside Mosaic kernels is not relied on).

PAD masking: global item index 0 is forced to −inf (the reference's
``scores[:, 0] = -inf``). History masking is done by the caller on the
returned candidates (retrieve k + max_history then filter — the standard
streaming-retrieval trick).

Precision: the MXU computes f32 matmuls in bf16 passes by default, which can
flip the order of items whose scores differ by < ~1e-4 (verified on-chip:
top-9/10 identical to a float64 reference, boundary item occasionally
swapped). Pass ``precision="highest"`` for 3-pass exact-f32 ranking at ~3×
matmul cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_topk_kernel(u_ref, items_ref, out_s_ref, out_i_ref, s_scratch, i_scratch,
                       *, top_k, item_tile, n_items, precision):
    i_tile = pl.program_id(1)
    n_item_tiles = pl.num_programs(1)

    @pl.when(i_tile == 0)
    def _():
        s_scratch[:] = jnp.full_like(s_scratch, -jnp.inf)
        i_scratch[:] = jnp.zeros_like(i_scratch)

    scores = jnp.dot(
        u_ref[:], items_ref[:].T,
        preferred_element_type=jnp.float32, precision=precision,
    )
    col0 = i_tile * item_tile
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # force [PAD] column and padded tail to -inf
    valid = (col_ids != 0) & (col_ids < n_items)
    scores = jnp.where(valid, scores, -jnp.inf)

    # phase 1 — tile-local top-k: k selection passes over the lane-aligned
    # [B, item_tile] block (max, argmax-free masking via the max value)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    tile_s = []
    tile_i = []
    for _ in range(top_k):
        best = jnp.max(scores, axis=1)
        # position of the FIRST occurrence of the max
        is_best = scores == best[:, None]
        first_pos = jnp.min(jnp.where(is_best, row_iota, item_tile), axis=1)
        tile_s.append(best)
        tile_i.append(col0 + first_pos)
        scores = jnp.where(row_iota == first_pos[:, None], -jnp.inf, scores)
    tile_s = jnp.stack(tile_s, axis=1)  # [B, k]
    tile_i = jnp.stack(tile_i, axis=1).astype(jnp.int32)

    # phase 2 — merge tile top-k with the running top-k over [B, 2k]
    cand_s = jnp.concatenate([s_scratch[:], tile_s], axis=1)
    cand_i = jnp.concatenate([i_scratch[:], tile_i], axis=1)
    iota2 = jax.lax.broadcasted_iota(jnp.int32, cand_s.shape, 1)
    for j in range(top_k):
        best = jnp.max(cand_s, axis=1)
        is_best = cand_s == best[:, None]
        first_pos = jnp.min(jnp.where(is_best, iota2, 2 * top_k), axis=1)
        picked_i = jnp.sum(
            jnp.where(iota2 == first_pos[:, None], cand_i, 0), axis=1
        )
        s_scratch[:, j] = best
        i_scratch[:, j] = picked_i
        cand_s = jnp.where(iota2 == first_pos[:, None], -jnp.inf, cand_s)

    @pl.when(i_tile == n_item_tiles - 1)
    def _():
        out_s_ref[:] = s_scratch[:]
        out_i_ref[:] = i_scratch[:]


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "user_tile", "item_tile", "interpret", "precision"),
)
def fused_topk_scores(
    user_emb, item_table, top_k, user_tile=256, item_tile=1024, interpret=False,
    precision=None,
):
    """Fused masked score + top-k over the whole catalog.

    Args:
        user_emb: [B, d] (B padded to a multiple of user_tile by the caller
            or here).
        item_table: [I, d].
        top_k: static k (≤ 32 recommended).
        interpret: run in interpreter mode (CPU tests).

    Returns:
        (topk_scores [B, k], topk_idx [B, k]); [PAD] item 0 never selected.
    """
    B, d = user_emb.shape
    I = item_table.shape[0]

    # pad users and items to tile multiples
    Bp = -(-B // user_tile) * user_tile
    Ip = -(-I // item_tile) * item_tile
    if Bp != B:
        user_emb = jnp.concatenate(
            [user_emb, jnp.zeros((Bp - B, d), user_emb.dtype)], axis=0
        )
    if Ip != I:
        item_table = jnp.concatenate(
            [item_table, jnp.zeros((Ip - I, d), item_table.dtype)], axis=0
        )

    grid = (Bp // user_tile, Ip // item_tile)
    kernel = functools.partial(
        _merge_topk_kernel, top_k=top_k, item_tile=item_tile, n_items=I,
        precision=precision,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((item_tile, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((user_tile, top_k), lambda i, j: (i, 0)),
            pl.BlockSpec((user_tile, top_k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, top_k), jnp.float32),
            jax.ShapeDtypeStruct((Bp, top_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((user_tile, top_k), jnp.float32),
            pltpu.VMEM((user_tile, top_k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(user_emb, item_table)
    return out_s[:B], out_i[:B]

"""Sparse matrix–dense matrix products for graph propagation.

The reference propagates FairGo's (|U|+|I|)² row-normalized rating matrix
with ``torch.sparse.mm`` per batch (fairgo_pmf.py:201). On TPU the COO form
becomes gather + ``segment_sum`` — a fixed-shape scatter-add XLA schedules
onto the VPU, and the natural unit for later sharding (edges partitioned by
destination bucket).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def spmm_coo(rows, cols, vals, dense, n_rows):
    """(sparse COO [n_rows × n]) @ dense [n, d] → [n_rows, d]."""
    gathered = dense[cols] * vals[:, None]
    return jax.ops.segment_sum(gathered, rows, num_segments=n_rows)


def coo_to_dense(rows, cols, vals, n):
    """COO arrays → dense float32 [n, n] numpy matrix (host-side)."""
    A = np.zeros((n, n), dtype=np.float32)
    A[np.asarray(rows), np.asarray(cols)] = np.asarray(vals)
    return A


def propagate(x, rows, cols, vals, n, dense=None):
    """One propagation hop: A @ x.

    TPU's XLA lowers the COO segment-sum as a serialized scatter-add
    (~16 ms for ml-1M's 1.35 M edges) while the same product as a dense
    f32 matmul rides the MXU in ~2 ms — and at d=64 the whole framework is
    bandwidth-bound anyway, so the 374 MB dense matrix costs one HBM pass.
    ``precision='highest'`` keeps full f32 accumulation: max|Δ| vs the
    segment-sum is ~2e-6 (float reassociation only). The dense matrix must
    arrive as a traced ARGUMENT (e.g. through model state) — as a closure
    constant it would be inlined into the HLO and rejected by the remote
    compiler.
    """
    if dense is not None:
        if dense.dtype == jnp.bfloat16:
            # bf16 operands, f32 accumulation: ~3× the f32 MXU rate (the
            # propagation_dtype opt-in; fairgo_base documents the numerics)
            return jnp.dot(
                dense, x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return jnp.dot(dense, x, precision="highest")
    return spmm_coo(rows, cols, vals, x, n)


def build_bipartite_norm_coo(rating_coo: sp.coo_matrix, n_users: int, n_items: int):
    """Row-normalized (D⁻¹A) bipartite rating matrix as COO arrays.

    Parity: fairgo_pmf.py:100-127 — A is the (U+I)×(U+I) block matrix with
    ratings in the off-diagonal blocks; D is the row-sum degree (+1e-7).

    Returns (rows, cols, vals) as jnp arrays.
    """
    n = n_users + n_items
    rows = np.concatenate([rating_coo.row, rating_coo.col + n_users])
    cols = np.concatenate([rating_coo.col + n_users, rating_coo.row])
    vals = np.concatenate([rating_coo.data, rating_coo.data]).astype(np.float32)

    # duplicate (row, col) entries collapse to the LAST value, matching the
    # reference's dict construction
    order = np.arange(len(rows))
    key = rows.astype(np.int64) * n + cols.astype(np.int64)
    # keep last occurrence per key
    _, last_idx = np.unique(key[::-1], return_index=True)
    keep = len(rows) - 1 - last_idx
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, rows, vals)
    inv_deg = 1.0 / (deg + 1e-7)
    vals = (vals * inv_deg[rows]).astype(np.float32)
    return jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)


def build_gcn_norm_coo(rating_coo: sp.coo_matrix, n_users: int, n_items: int):
    """Symmetric GCN normalization D̃^-1/2 (A + I) D̃^-1/2 with rating-weighted
    edges and weight-1 self loops (torch_geometric ``gcn_norm`` semantics used
    by the reference's GCN backbone, fairgo_gcn.py:52-65).
    """
    n = n_users + n_items
    rows = np.concatenate([rating_coo.row, rating_coo.col + n_users, np.arange(n)])
    cols = np.concatenate([rating_coo.col + n_users, rating_coo.row, np.arange(n)])
    vals = np.concatenate(
        [rating_coo.data, rating_coo.data, np.ones(n)]
    ).astype(np.float64)

    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, rows, vals)
    inv_sqrt = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    vals = (inv_sqrt[rows] * vals * inv_sqrt[cols]).astype(np.float32)
    return jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)

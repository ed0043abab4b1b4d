"""Loss primitives (parity: recbole/model/loss.py).

All are pure jnp functions returning scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bpr_loss(pos_score, neg_score, gamma=1e-10):
    """−log σ(pos − neg), mean over batch (reference loss.py:21-47)."""
    return -jnp.log(gamma + jax.nn.sigmoid(pos_score - neg_score)).mean()


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


@jax.custom_vjp
def bce_elementwise(pred_prob, target):
    """Elementwise torch nn.BCELoss (aten Loss.cpp semantics).

    Forward: each log term clamped at -100, so exactly-saturated f32 probs
    (p == 0.0 or 1.0, which a winning adversarial filter does produce) give
    a large finite loss, never 0 * -inf = NaN. (An eps-clip on the prob
    cannot achieve this: 1 - 1e-12 rounds back to 1.0 in f32.)

    Backward: torch's custom kernel (p - t) / max(p(1-p), 1e-12) instead of
    autodiff through the clamp — autodiff would evaluate d log(1-p) =
    -1/(1-p) = -inf at p == 1 and multiply it by the clamp's zero selector,
    producing NaN. With the kernel, the chain through sigmoid'(x) = p(1-p)
    = 0 kills the gradient AT exact saturation (the self-limiting property
    that keeps the reference's adversarial alternation finite).
    """
    logp = jnp.maximum(jnp.log(pred_prob), -100.0)
    log1mp = jnp.maximum(jnp.log(1.0 - pred_prob), -100.0)
    return -(target * logp + (1.0 - target) * log1mp)


def _bce_elementwise_fwd(pred_prob, target):
    return bce_elementwise(pred_prob, target), (pred_prob, target)


def _bce_elementwise_bwd(res, g):
    p, t = res
    grad_p = g * (p - t) / jnp.maximum(p * (1.0 - p), 1e-12)
    return grad_p, jnp.zeros_like(t)


bce_elementwise.defvjp(_bce_elementwise_fwd, _bce_elementwise_bwd)


def bce_loss(pred_prob, target):
    """torch nn.BCELoss (mean reduction); see :func:`bce_elementwise`."""
    return jnp.mean(bce_elementwise(pred_prob, target))


def cross_entropy_loss(logits, labels):
    """torch nn.CrossEntropyLoss: softmax CE over integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def smooth_l1_loss(input, target):
    """torch F.smooth_l1_loss with beta=1: 0.5 x² for |x|<1 else |x|−0.5."""
    diff = jnp.abs(input - target)
    return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5))


def masked_smooth_l1_loss(input, target, mask):
    """Smooth-L1 averaged only over ``mask`` rows — used when a fixed-shape
    tensor stands in for the reference's dynamically-sized unique-item list."""
    diff = jnp.abs(input - target)
    elem = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.sum(elem * mask) / denom


def reg_loss(parameters):
    """L2 of a list of parameter tensors (reference RegLoss)."""
    return sum(jnp.linalg.norm(p.reshape(-1)) ** 2 for p in parameters)


def emb_loss(embeddings, norm=2, require_pow=False):
    """Regularization over embedding activations (reference EmbLoss)."""
    total = 0.0
    batch = embeddings[-1].shape[0]
    for emb in embeddings:
        if require_pow:
            total = total + jnp.sum(jnp.abs(emb) ** norm)
        else:
            total = total + jnp.linalg.norm(emb.reshape(-1), ord=norm)
    if require_pow:
        return total / norm / batch
    return total / batch


def emb_margin_loss(embeddings, margin=1.0):
    """Margin-based embedding regularization (reference EmbMarginLoss)."""
    total = 0.0
    for emb in embeddings:
        norm2 = jnp.sum(emb**2, axis=-1, keepdims=True)
        total = total + jnp.sum(jnp.maximum(norm2 - margin, 0.0))
    return total

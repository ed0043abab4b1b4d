"""Functional neural layers (pure, jittable).

Parity: recbole/model/layers.py:30-118 — ``MLPLayers`` stacks
Dropout→Linear→(BatchNorm1d)→activation per layer pair, activation applied
after EVERY layer (including the last), optional normal(0, 0.01) init; and
``activation_layer`` resolves sigmoid/tanh/relu/leakyrelu/none.

TPU-first design: layers are parameter pytrees + pure apply functions, so the
trainer can jit/pjit them and the adversarial trainers can slice param
subtrees for per-group optimizers. BatchNorm running statistics are an
explicit ``state`` pytree threaded through apply (torch semantics: batch
stats at train with momentum-0.1 running update, running stats at eval).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------- init

def xavier_normal(rng, fan_in, fan_out, dtype=jnp.float32):
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return jax.random.normal(rng, (fan_in, fan_out), dtype) * std


def xavier_uniform(rng, fan_in, fan_out, dtype=jnp.float32):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, (fan_in, fan_out), dtype, -limit, limit)


def normal_001(rng, fan_in, fan_out, dtype=jnp.float32):
    return jax.random.normal(rng, (fan_in, fan_out), dtype) * 0.01


def torch_linear_default(rng, fan_in, fan_out, dtype=jnp.float32):
    """torch nn.Linear default: kaiming-uniform(a=√5) ≡ U(±1/√fan_in)."""
    limit = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(rng, (fan_in, fan_out), dtype, -limit, limit)


def normal_1(rng, fan_in, fan_out, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(rng, (fan_in, fan_out), dtype)


_INIT_FNS = {
    "xavier_normal": xavier_normal,
    "xavier_uniform": xavier_uniform,
    "norm": normal_001,
    "normal": normal_1,
    "torch_linear": torch_linear_default,
}


def init_embedding(rng, num, dim, method="xavier_normal", padding_idx=None):
    """Embedding table initialized like torch + the reference's init fns
    (recbole/model/init.py). ``padding_idx`` row is zeroed."""
    table = _INIT_FNS[method](rng, num, dim)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return table


def init_linear(rng, fan_in, fan_out, method="xavier_normal"):
    """Weight [in, out] + bias. Note: torch stores weight as [out, in];
    we keep [in, out] so apply is a plain ``x @ w``. The ``torch_linear``
    method also draws the torch-default uniform bias."""
    r_w, r_b = jax.random.split(rng)
    if method == "torch_linear":
        limit = float(1.0 / np.sqrt(fan_in))
        b = jax.random.uniform(r_b, (fan_out,), jnp.float32, -limit, limit)
    else:
        b = jnp.zeros((fan_out,))
    return {"w": _INIT_FNS[method](r_w, fan_in, fan_out), "b": b}


def apply_linear(params, x):
    return x @ params["w"] + params["b"]


# -------------------------------------------------------------- activation

def apply_activation(name, x):
    if name is None:
        return x
    name = name.lower()
    if name == "none":
        return x
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "leakyrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    raise NotImplementedError(f"activation function {name} is not implemented")


# --------------------------------------------------------------------- MLP

def init_mlp(rng, layer_sizes, init_method="xavier_normal", bn=False):
    """Parameters for an MLPLayers-equivalent stack.

    Returns a dict with ``linear`` (list of {w, b}) and, if ``bn``, per-layer
    ``gamma``/``beta``.
    """
    n = len(layer_sizes) - 1
    rngs = jax.random.split(rng, n)
    params = {"linear": []}
    if bn:
        params["bn"] = []
    for i, (fan_in, fan_out) in enumerate(zip(layer_sizes[:-1], layer_sizes[1:])):
        params["linear"].append(init_linear(rngs[i], fan_in, fan_out, init_method))
        if bn:
            params["bn"].append({"gamma": jnp.ones((fan_out,)), "beta": jnp.zeros((fan_out,))})
    return params


def init_mlp_state(layer_sizes, bn=False):
    """Running-stat state for the BN layers (empty dict when bn=False)."""
    if not bn:
        return {}
    return {
        "bn": [
            {"mean": jnp.zeros((fan_out,)), "var": jnp.ones((fan_out,))}
            for fan_out in layer_sizes[1:]
        ]
    }


def apply_mlp(
    params,
    x,
    *,
    activation="relu",
    dropout=0.0,
    state=None,
    train=False,
    rng=None,
    bn_momentum=0.1,
    bn_eps=1e-5,
    sample_weight=None,
    bn_segments=None,
    bn_num_segments=None,
):
    """Forward an MLPLayers stack.

    Returns ``(y, new_state)`` — ``new_state`` echoes the input state at eval
    or carries updated BN running stats at train. ``sample_weight`` ([B] 1/0)
    restricts BatchNorm batch statistics to real rows — padded rows would
    otherwise poison the variance (a tail batch padded 10× collapses var→0,
    and the resulting amplification overflows deep BN stacks).

    ``bn_segments`` ([B] int ids + static ``bn_num_segments``) switches BN
    to SEGMENT-wise batch statistics (biased var, torch normalization
    semantics) regardless of ``train`` — the reference-defect emulation
    mode: the reference's filter MLPs are unregistered submodules
    (pfcn_mlp.py:104-120), so model.eval() never reaches them and their BN
    runs on batch statistics over each one-user eval batch forever; a
    segment per user reproduces that regime inside one fused dispatch.
    """
    use_bn = "bn" in params
    state = state or {}
    new_bn_state = []
    n_layers = len(params["linear"])
    use_dropout = train and dropout > 0.0 and rng is not None
    drop_rngs = jax.random.split(rng, n_layers) if use_dropout else [None] * n_layers

    for i, lin in enumerate(params["linear"]):
        if use_dropout:
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(drop_rngs[i], keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        x = apply_linear(lin, x)
        if use_bn:
            gamma, beta = params["bn"][i]["gamma"], params["bn"][i]["beta"]
            run = state["bn"][i]
            if bn_segments is not None:
                # per-segment biased mean/var (one segment = one reference
                # eval batch); running stats untouched — the reference's
                # train-mode BN updates them during eval, but they are
                # never read afterwards (the filters never leave train
                # mode), so the update is unobservable
                seg_n = jax.ops.segment_sum(
                    jnp.ones((x.shape[0],), x.dtype), bn_segments,
                    num_segments=bn_num_segments,
                )[:, None]
                seg_sum = jax.ops.segment_sum(
                    x, bn_segments, num_segments=bn_num_segments
                )
                seg_mean = seg_sum / jnp.maximum(seg_n, 1.0)
                seg_var = jax.ops.segment_sum(
                    x * x, bn_segments, num_segments=bn_num_segments
                ) / jnp.maximum(seg_n, 1.0) - seg_mean**2
                mean = seg_mean[bn_segments]
                var = jnp.maximum(seg_var[bn_segments], 0.0)
                new_bn_state.append(run)
            elif train:
                if sample_weight is not None:
                    w = sample_weight.astype(x.dtype)[:, None]
                    n = jnp.maximum(jnp.sum(w), 1.0)
                    mean = jnp.sum(x * w, axis=0) / n
                    var = jnp.sum(w * (x - mean) ** 2, axis=0) / n
                    unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                else:
                    mean = jnp.mean(x, axis=0)
                    var = jnp.var(x, axis=0)
                    n = x.shape[0]
                    unbiased = var * n / max(n - 1, 1)
                new_bn_state.append(
                    {
                        "mean": (1 - bn_momentum) * run["mean"] + bn_momentum * mean,
                        "var": (1 - bn_momentum) * run["var"] + bn_momentum * unbiased,
                    }
                )
            else:
                mean, var = run["mean"], run["var"]
                new_bn_state.append(run)
            x = (x - mean) * jax.lax.rsqrt(var + bn_eps) * gamma + beta
        x = apply_activation(activation, x)
    return x, ({"bn": new_bn_state} if use_bn else {})

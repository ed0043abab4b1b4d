"""General-purpose helpers: seeding, early stopping, time/paths, colored text.

Parity notes: mirrors the behavioral surface of recbole/utils/utils.py in the
reference (init_seed :172-189, early_stopping :97-140, calculate_valid_score
:143-156, dict2str :159-169, get_local_time/ensure_dir :26-48). The JAX build
replaces torch/cuda seeding with a PRNGKey discipline: ``init_seed`` seeds the
host-side generators (python random / numpy, used by the ETL + host samplers)
and returns a ``jax.random.PRNGKey`` that owns all device-side randomness.
"""

from __future__ import annotations

import datetime
import importlib
import os
import random

import numpy as np


def init_seed(seed: int, reproducibility: bool = True):
    """Seed host RNGs and mint the root device PRNG key.

    Unlike the reference (which flips cudnn.deterministic), JAX/XLA on TPU is
    deterministic by construction for a fixed key, so ``reproducibility`` only
    controls whether we reseed the host generators.

    Returns:
        jax.random.PRNGKey: root key for device-side randomness.
    """
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)


def get_local_time() -> str:
    """Current time formatted for checkpoint file names."""
    return datetime.datetime.now().strftime("%b-%d-%Y_%H-%M-%S")


def ensure_dir(dir_path: str) -> None:
    os.makedirs(dir_path, exist_ok=True)


def early_stopping(value, best, cur_step, max_step, bigger=True):
    """Early-stopping counter update.

    Args:
        value: current epoch's validation score.
        best: best score so far.
        cur_step: epochs since the last improvement.
        max_step: patience; stop once cur_step exceeds it.
        bigger: whether larger scores are better.

    Returns:
        (best, cur_step, stop_flag, update_flag)
    """
    stop_flag = False
    update_flag = False
    improved = value > best if bigger else value < best
    if improved:
        cur_step = 0
        best = value
        update_flag = True
    else:
        cur_step += 1
        if cur_step > max_step:
            stop_flag = True
    return best, cur_step, stop_flag, update_flag


def calculate_valid_score(valid_result, valid_metric=None):
    """Pull the validation score out of an eval-result dict.

    The reference lowercases the configured metric name and falls back to
    ``recall@10`` (recbole/trainer/trainer.py:89, utils.py:143-156). Nested
    result dicts (PFCN per-subset results) are searched recursively, taking
    the first hit.
    """
    key = (valid_metric or "recall@10").lower()
    return _search_metric(valid_result, key)


def _search_metric(result, key):
    for k, v in result.items():
        if isinstance(v, dict):
            found = _search_metric(v, key)
            if found is not None:
                return found
        elif str(k).lower() == key:
            return v
    return None


def dict2str(result_dict) -> str:
    """Pretty one-line rendering of a metric dict."""
    parts = []
    for metric, value in result_dict.items():
        if isinstance(value, dict):
            parts.append(f"{metric}: {{{dict2str(value)}}}")
        else:
            parts.append(f"{metric} : {value}")
    return "    ".join(parts)


_ANSI = {
    "black": "30", "red": "31", "green": "32", "yellow": "33",
    "blue": "34", "pink": "35", "cyan": "36", "white": "37",
}


def set_color(log: str, color: str, highlight: bool = True) -> str:
    code = _ANSI.get(color, "37")
    prefix = "1;" if highlight else ""
    return f"\033[{prefix}{code}m{log}\033[0m"


def get_flops_estimate(n_params: int) -> int:
    """Rough FLOPs-per-example estimate used by the profiler output."""
    return 2 * n_params


def get_environment_info():
    """Device inventory summary for logging."""
    import jax

    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "n_devices": len(devs),
        "devices": [str(d) for d in devs],
        "process_count": jax.process_count(),
    }

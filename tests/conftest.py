"""Test harness setup.

Multi-device tests run on a simulated 8-device CPU mesh
(--xla_force_host_platform_device_count), the CPU stand-in for a TPU slice —
see SURVEY.md §4 (distributed testing note).
"""

import os

# Force the CPU backend for tests regardless of the ambient JAX_PLATFORMS
# (the dev environment pins it to a TPU tunnel). Pytest plugins (jaxtyping)
# import jax before this conftest runs and jax snapshots JAX_PLATFORMS at
# import time, so the env var alone is not enough — update the live config
# before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np
import pandas as pd
import pytest


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def ref_recbole(request):
    """The torch reference imported for differential tests, with global-state
    cleanup at session end (ADVICE.md round 1)."""
    import ref_compat

    ref_compat.setup_reference()
    request.addfinalizer(ref_compat.teardown_reference)
    try:
        import recbole.quick_start  # noqa: F401
        import recbole
    except Exception as e:  # pragma: no cover - environment-specific
        pytest.skip(f"reference unavailable: {e}")
    ref_compat.patch_reference_dataset()
    return recbole


@pytest.fixture(scope="session")
def ml100k_path():
    path = os.path.join(REPO_ROOT, "dataset")
    assert os.path.isdir(os.path.join(path, "ml-100k"))
    return path


def make_tiny_dataset(root, name="tiny", n_users=30, n_items=40, n_inter=400, seed=7):
    """Write a small synthetic atomic-file dataset with a binary gender
    attribute; returns its data_path."""
    rng = np.random.RandomState(seed)
    ddir = os.path.join(root, name)
    os.makedirs(ddir, exist_ok=True)
    users = rng.randint(1, n_users + 1, n_inter)
    items = rng.randint(1, n_items + 1, n_inter)
    # dedup user-item pairs
    pairs = sorted(set(zip(users.tolist(), items.tolist())))
    users = np.array([p[0] for p in pairs])
    items = np.array([p[1] for p in pairs])
    ratings = rng.randint(1, 6, len(pairs))
    ts = np.arange(len(pairs)) + 1_000_000
    with open(os.path.join(ddir, f"{name}.inter"), "w") as f:
        f.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
        for u, i, r, t in zip(users, items, ratings, ts):
            f.write(f"{u}\t{i}\t{r}\t{t}\n")
    with open(os.path.join(ddir, f"{name}.user"), "w") as f:
        f.write("user_id:token\tgender:token\tage:float\n")
        for u in range(1, n_users + 1):
            f.write(f"{u}\t{'M' if u % 3 else 'F'}\t{20 + u % 40}\n")
    with open(os.path.join(ddir, f"{name}.item"), "w") as f:
        f.write("item_id:token\tclass:token\n")
        for i in range(1, n_items + 1):
            f.write(f"{i}\tc{i % 5}\n")
    return root


@pytest.fixture()
def tiny_data_path(tmp_path):
    return make_tiny_dataset(str(tmp_path))

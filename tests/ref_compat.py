"""Shared harness for differential tests against the torch reference.

The reference (read-only at /root/reference) is imported in-process on the
torch CPU backend. Setup is reversible (ADVICE.md round 1): sys.path / stub
modules / the np.float compatibility alias are recorded and removed by
:func:`teardown_reference`, which the session fixture in conftest.py
registers as a finalizer.

Also hosts the weight-injection helpers that copy OUR param pytrees into the
reference's torch modules so both frameworks compute from identical weights.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE = "/root/reference"

_state = {"stubs": [], "path_added": False, "np_float_added": False, "done": False}


def setup_reference():
    """Idemptent: make `import recbole` resolve to the reference."""
    if _state["done"]:
        return
    # the reference Config swallows sys.argv and raises on duplicate args
    # (configurator.py:145-165) — pytest's own flags (e.g. two --ignore=)
    # must not leak into it
    _state["argv"] = sys.argv[:]
    sys.argv = sys.argv[:1]
    for mod in ("colorlog", "colorama", "wandb", "hyperopt"):
        try:
            __import__(mod)
        except ImportError:
            stub = types.ModuleType(mod)
            if mod == "colorama":
                stub.init = lambda **kw: None

                class _Fore:
                    def __getattr__(self, name):
                        return ""

                stub.Fore = _Fore()
                stub.Style = _Fore()
            elif mod == "colorlog":
                import logging as _logging

                class _ColoredFormatter(_logging.Formatter):
                    """colorlog.ColoredFormatter minus the colors: strips the
                    %(log_color)s token so the reference's init_logger works."""

                    def __init__(self, fmt=None, datefmt=None, log_colors=None,
                                 **kw):
                        fmt = (fmt or "").replace("%(log_color)s", "")
                        super().__init__(fmt, datefmt)

                stub.ColoredFormatter = _ColoredFormatter
            sys.modules[mod] = stub
            _state["stubs"].append(mod)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
        _state["path_added"] = True
    # the reference predates numpy 2.0; np.float is gone but np.bool exists
    # again in numpy 2 and must NOT be overwritten
    if not hasattr(np, "float"):
        np.float = float
        _state["np_float_added"] = True
    # torch 2.6 flipped torch.load's default to weights_only=True, which
    # rejects the reference's checkpoint dicts (they embed its Config object).
    # The checkpoints are produced locally by these very runs, so restore the
    # legacy default.
    import torch

    if not hasattr(torch, "_ref_compat_orig_load"):
        torch._ref_compat_orig_load = torch.load

        def _load(*a, **kw):
            kw.setdefault("weights_only", False)
            return torch._ref_compat_orig_load(*a, **kw)

        torch.load = _load
        _state["stubs"].append("__torch_load__")
    # scipy removed the private dok_matrix._update the reference uses to bulk
    # fill its rating matrix (fairgo_pmf.py:111). CAUTION: dok no longer
    # keeps its payload in the dict-self (scipy ≥1.13 stores it in an
    # internal dict), so a `dict.update(self, d)` shim silently leaves the
    # matrix EMPTY — FairGo then propagates a zero graph and its local
    # discriminators attack a constant embedding (this bug shaped the
    # round-2 FairGo reference parity runs; see PARITY_RUNS.md). Route
    # through __setitem__, which scipy keeps correct.
    import scipy.sparse as sp

    if not hasattr(sp.dok_matrix, "_update"):
        def _dok_update(self, d):
            for k, v in d.items():
                self[k] = v

        sp.dok_matrix._update = _dok_update
        _state["stubs"].append("__scipy_dok_update__")
    _state["done"] = True


def patch_reference_dataset():
    """Restore Dataset._fill_nan's pandas-1 semantics: under pandas 2
    copy-on-write the reference's chained `feat[field].fillna(inplace=True)`
    (dataset.py:570-572) silently no-ops, leaving the PAD row NaN — which
    leaks into fairness metrics ('sensitive attribute must be binary').
    Call AFTER recbole imports."""
    from recbole.data.dataset import Dataset
    from recbole.utils import FeatureType

    if getattr(Dataset, "_ref_compat_fillnan", False):
        return

    def _fill_nan(self):
        for feat_name in self.feat_name_list:
            feat = getattr(self, feat_name)
            for field in feat:
                ftype = self.field2type[field]
                if ftype == FeatureType.TOKEN:
                    feat[field] = feat[field].fillna(value=0)
                elif ftype == FeatureType.FLOAT:
                    feat[field] = feat[field].fillna(value=feat[field].mean())
                else:
                    dtype = np.int64 if ftype == FeatureType.TOKEN_SEQ else float
                    feat[field] = feat[field].apply(
                        lambda x: np.array([], dtype=dtype) if isinstance(x, float) else x
                    )

    Dataset._fill_nan = _fill_nan
    Dataset._ref_compat_fillnan = True


def teardown_reference():
    """Undo setup_reference so later tests see pristine global state."""
    if not _state["done"]:
        return
    if _state["path_added"] and REFERENCE in sys.path:
        sys.path.remove(REFERENCE)
    for mod in _state["stubs"]:
        if mod == "__torch_load__":
            import torch

            if hasattr(torch, "_ref_compat_orig_load"):
                torch.load = torch._ref_compat_orig_load
                del torch._ref_compat_orig_load
            continue
        if mod == "__scipy_dok_update__":
            import scipy.sparse as sp

            if hasattr(sp.dok_matrix, "_update"):
                del sp.dok_matrix._update
            continue
        sys.modules.pop(mod, None)
    if _state["np_float_added"] and hasattr(np, "float"):
        del np.float
    if _state.get("argv") is not None:
        sys.argv = _state["argv"]
    _state.update(stubs=[], path_added=False, np_float_added=False, done=False,
                  argv=None)


# --------------------------------------------------------- weight injection

def to_np(x):
    return np.asarray(x, dtype=np.float32)


def inject_embedding(torch_embedding, table):
    import torch

    with torch.no_grad():
        torch_embedding.weight.copy_(torch.from_numpy(to_np(table)))


def inject_linear(torch_linear, params):
    """Our linear stores w as [in, out]; torch as [out, in]."""
    import torch

    with torch.no_grad():
        torch_linear.weight.copy_(torch.from_numpy(to_np(params["w"]).T.copy()))
        torch_linear.bias.copy_(torch.from_numpy(to_np(params["b"])))


def inject_mlp(torch_mlp, params):
    """Copy our MLP pytree into a reference MLPLayers module (walks the inner
    Sequential: Dropout → Linear → [BatchNorm1d] → activation per layer)."""
    import torch

    li = bi = 0
    for mod in torch_mlp.mlp_layers:
        if isinstance(mod, torch.nn.Linear):
            inject_linear(mod, params["linear"][li])
            li += 1
        elif isinstance(mod, torch.nn.BatchNorm1d):
            with torch.no_grad():
                mod.weight.copy_(torch.from_numpy(to_np(params["bn"][bi]["gamma"])))
                mod.bias.copy_(torch.from_numpy(to_np(params["bn"][bi]["beta"])))
            bi += 1
    assert li == len(params["linear"]), "linear layer count mismatch"


def torch_interaction(batch):
    """Build a reference Interaction from a dict of numpy arrays."""
    import torch
    from recbole.data.interaction import Interaction

    t = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.integer):
            t[k] = torch.from_numpy(v.astype(np.int64))
        else:
            t[k] = torch.from_numpy(v.astype(np.float32))
    return Interaction(t)

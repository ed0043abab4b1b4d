"""recbole_fairrec_tpu — a TPU-native fairness-aware recommender framework.

A from-scratch JAX/XLA/Pallas re-design with the functional surface of
TangJiakai/RecBole-FairRec: 8 fairness-aware models, fairness-constrained
sampling, 22 evaluation metrics (6 fairness), adversarial alternating
trainers, and a sharded multi-chip execution layer the reference never had.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache — first-run compiles via the remote
    TPU tunnel cost 30-60 s each; caching makes reruns near-instant."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "RECBOLE_FAIRREC_TPU_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/recbole_fairrec_tpu_xla"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass


_enable_compilation_cache()

from .quick_start import load_data_and_model, objective_function, run_recbole

__all__ = ["run_recbole", "objective_function", "load_data_and_model", "__version__"]

"""recbole_fairrec_tpu — a TPU-native fairness-aware recommender framework.

A from-scratch JAX/XLA/Pallas re-design with the functional surface of
TangJiakai/RecBole-FairRec: 8 fairness-aware models, fairness-constrained
sampling, 22 evaluation metrics (6 fairness), adversarial alternating
trainers, and a sharded multi-chip execution layer the reference never had.
"""

__version__ = "0.1.0"

from .quick_start import load_data_and_model, objective_function, run_recbole

__all__ = ["run_recbole", "objective_function", "load_data_and_model", "__version__"]

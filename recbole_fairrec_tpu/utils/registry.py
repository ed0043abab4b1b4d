"""Model / trainer registries.

Parity: mirrors recbole/utils/utils.py:51-94 in the reference — models are
resolved by importing ``models.<name.lower()>`` and fetching the class of the
same name; trainers resolve ``<ModelName>Trainer`` with a fallback to the base
``Trainer``. The fair-model registry searches only the fair family, matching
the reference where the submodule list is ``['fair_recommender']``.
"""

from __future__ import annotations

import importlib

_MODEL_MODULE_ROOT = "recbole_fairrec_tpu.models"
_TRAINER_MODULE = "recbole_fairrec_tpu.trainer"


def get_model(model_name: str):
    """Resolve a model class by name.

    Raises:
        ValueError: when the model does not exist in the fair family.
    """
    module_path = f"{_MODEL_MODULE_ROOT}.{model_name.lower()}"
    try:
        module = importlib.import_module(module_path)
    except ModuleNotFoundError as e:
        raise ValueError(
            f"`model_name` [{model_name}] is not the name of an existing model."
        ) from e
    if not hasattr(module, model_name):
        raise ValueError(
            f"module [{module_path}] exists but lacks class [{model_name}]"
        )
    return getattr(module, model_name)


def get_trainer(model_type, model_name: str):
    """Resolve ``<ModelName>Trainer``, falling back to the base Trainer.

    PFCN_* models share :class:`PFCNTrainer`; FairGo_* share
    :class:`FairGoTrainer` with model-specific param-group subclasses —
    resolution is purely by class name, as in the reference.
    """
    trainer_mod = importlib.import_module(_TRAINER_MODULE)
    name = f"{model_name}Trainer"
    if hasattr(trainer_mod, name):
        return getattr(trainer_mod, name)
    return getattr(trainer_mod, "Trainer")

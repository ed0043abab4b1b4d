from .trainer import AbstractTrainer, Trainer
from .adversarial import (
    FairGo_GCNTrainer,
    FairGo_PMFTrainer,
    FairGoTrainer,
    PFCN_BiasedMFTrainer,
    PFCN_DMFTrainer,
    PFCN_MLPTrainer,
    PFCN_PMFTrainer,
    PFCNTrainer,
)

__all__ = [
    "AbstractTrainer",
    "Trainer",
    "FairGoTrainer",
    "FairGo_PMFTrainer",
    "FairGo_GCNTrainer",
    "PFCNTrainer",
    "PFCN_MLPTrainer",
    "PFCN_BiasedMFTrainer",
    "PFCN_DMFTrainer",
    "PFCN_PMFTrainer",
]

"""FairGo_PMF — PMF backbone variant of FairGo.

Parity: recbole/model/fair_recommender/fairgo_pmf.py — the backbone is the
raw embedding tables (optionally preloaded from ``.user_emb``/``.item_emb``
atomic files, :53-63); everything else in :class:`FairGoBase`.
"""

from __future__ import annotations

from .fairgo_base import FairGoBase


class FairGo_PMF(FairGoBase):
    pass

"""Interaction: the universal field→array batch container.

Parity: recbole/data/interaction.py (:43-368). The reference stores torch
tensors; here columns are **host numpy arrays** — device transfer happens once
per batch at the jit boundary (the trainer feeds numpy straight into jitted
functions, letting JAX manage the host→HBM copy). Sequence fields are stored
as fixed-width padded 2-D arrays, which is also what XLA needs.
"""

from __future__ import annotations

import numpy as np


def _to_array(value):
    if isinstance(value, np.ndarray):
        return value
    if isinstance(value, (list, tuple)):
        first = value[0] if len(value) else None
        if isinstance(first, np.ndarray):  # ragged sequence field -> pad
            maxlen = max((len(v) for v in value), default=0)
            dtype = first.dtype if first is not None else np.int64
            out = np.zeros((len(value), maxlen), dtype=dtype)
            for i, row in enumerate(value):
                out[i, : len(row)] = row
            return out
        return np.asarray(value)
    return np.asarray(value)


class Interaction:
    """Immutable-length dict of equally sized numpy columns."""

    def __init__(self, interaction):
        self.interaction = {}
        if isinstance(interaction, dict):
            for key, value in interaction.items():
                self.interaction[key] = _to_array(value)
        elif isinstance(interaction, Interaction):
            self.interaction = dict(interaction.interaction)
        else:
            raise ValueError(f"Unexpected interaction type: [{type(interaction)}]")
        lengths = {v.shape[0] for v in self.interaction.values()}
        if len(lengths) > 1:
            raise ValueError(f"Unequal column lengths: {lengths}")
        self.length = lengths.pop() if lengths else 0

    # --------------------------------------------------------------- access

    @property
    def columns(self):
        return list(self.interaction.keys())

    def __getitem__(self, index):
        if isinstance(index, str):
            return self.interaction[index]
        # row selection (slice / int array / bool mask)
        return Interaction({k: v[index] for k, v in self.interaction.items()})

    def __setitem__(self, key, value):
        if not isinstance(key, str):
            raise KeyError(f"{type(key)} object does not support item assignment")
        self.interaction[key] = _to_array(value)

    def __delitem__(self, key):
        if key in self.interaction:
            del self.interaction[key]

    def __contains__(self, key):
        return key in self.interaction

    def __len__(self):
        return self.length

    def __iter__(self):
        return iter(self.interaction)

    def __str__(self):
        info = [f"The batch_size of interaction: {self.length}"]
        for k, v in self.interaction.items():
            info.append(f"    {k}, {v.shape}, {v.dtype}")
        return "\n".join(info)

    __repr__ = __str__

    def numpy(self):
        return dict(self.interaction)

    # ------------------------------------------------------------ transforms

    def update(self, new_inter: "Interaction"):
        """Merge columns of ``new_inter`` into self (reference :253-262)."""
        for k, v in new_inter.interaction.items():
            self.interaction[k] = v

    def drop(self, column: str):
        if column not in self.interaction:
            raise ValueError(f"Column [{column}] is not in [{self}].")
        del self.interaction[column]

    def repeat(self, sizes: int) -> "Interaction":
        """Tile the whole batch ``sizes`` times along axis 0 (torch
        Tensor.repeat semantics used at reference :222-236)."""
        return Interaction(
            {k: np.tile(v, (sizes,) + (1,) * (v.ndim - 1)) for k, v in self.interaction.items()}
        )

    def repeat_interleave(self, repeats: int) -> "Interaction":
        return Interaction(
            {k: np.repeat(v, repeats, axis=0) for k, v in self.interaction.items()}
        )

    def add_prefix(self, prefix: str):
        """Rename every column with ``prefix`` (used for neg_ columns)."""
        self.interaction = {prefix + k: v for k, v in self.interaction.items()}

    def sort(self, by, ascending=True):
        """Stable multi-key sort (reference :299-338)."""
        if isinstance(by, str):
            by = [by]
        if isinstance(ascending, bool):
            ascending = [ascending] * len(by)
        if len(by) != len(ascending):
            raise ValueError(f"by [{by}] and ascending [{ascending}] should have same length.")
        # Compose keys via lexsort: first key in `by` is the most significant.
        keys = []
        for b, a in zip(by[::-1], ascending[::-1]):
            key = self.interaction[b]
            if not np.issubdtype(key.dtype, np.number):
                _, key = np.unique(key, return_inverse=True)
            if not a:
                key = -key
            keys.append(key)
        index = np.lexsort(keys)
        self.interaction = {k: v[index] for k, v in self.interaction.items()}

    def shuffle(self):
        index = np.random.permutation(self.length)
        self.interaction = {k: v[index] for k, v in self.interaction.items()}


def cat_interactions(interactions) -> Interaction:
    """Concatenate batches with identical columns (reference :348-368)."""
    if not isinstance(interactions, (list, tuple)) or len(interactions) == 0:
        raise ValueError(f"Interactions [{interactions}] should be a non-empty list.")
    columns = set(interactions[0].columns)
    for inter in interactions:
        if set(inter.columns) != columns:
            raise ValueError("Interactions should have some interactions.")
    return Interaction(
        {
            col: np.concatenate([inter[col] for inter in interactions], axis=0)
            for col in interactions[0].columns
        }
    )

"""One-hot categorical encoder (parity with reference
utils/encoders/categorical.py:13-89), vectorized with pandas mapping
instead of a per-item Python loop.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Generic, Iterable, List, Optional, TypeVar, Union

import numpy as np
import pandas as pd
import scipy.sparse as sps

from .base import SparseEncoderBase

T = TypeVar("T")


class CategoryValueToSparseEncoder(Generic[T], SparseEncoderBase):
    """One-hot encode a list of items into a CSR matrix.

    Parameters
    ----------
    items:
        Training items from which the vocabulary is built.
    min_freq:
        Minimum frequency for an item to enter the vocabulary (default 1).
    handle_unknown:
        "create" → unseen values map to a dedicated ``__UNK__`` column at
        index 0; "ignore" → unseen values produce an all-zero row part;
        "raise" → a KeyError.
    """

    def __init__(
        self,
        items: Iterable[T],
        min_freq: int = 1,
        handle_unknown: str = "create",
    ):
        if handle_unknown not in ("create", "ignore", "raise"):
            raise ValueError(
                "handle_unknown must be one of create/ignore/raise."
            )
        counts = Counter(items)
        vocab = sorted(x for x, freq in counts.items() if freq >= min_freq)
        self.handle_unknown = handle_unknown
        self._item_index_offset = 1 if handle_unknown == "create" else 0
        self._dict: Dict[T, int] = {
            item: i + self._item_index_offset for i, item in enumerate(vocab)
        }
        self.values: List[Union[str, T]] = (
            ["__UNK__"] if handle_unknown == "create" else []
        )
        self.values.extend(vocab)

    def _get_index(self, x: T) -> Optional[int]:
        idx = self._dict.get(x)
        if idx is None:
            if self.handle_unknown == "create":
                return 0
            if self.handle_unknown == "ignore":
                return None
            raise KeyError(f"{x} not found.")
        return idx

    def __getitem__(self, x: T) -> int:
        result = self._get_index(x)
        if result is None:
            raise KeyError(f"{x} not found.")
        return result

    def names(self) -> List[str]:
        return [str(v) for v in self.values]

    def to_sparse(self, items: Iterable[T]) -> sps.csr_matrix:
        ser = pd.Series(list(items))
        mapped = ser.map(self._dict)
        missing = mapped.isna()
        if missing.any():
            if self.handle_unknown == "raise":
                bad = ser[missing].iloc[0]
                raise KeyError(f"{bad} not found.")
            elif self.handle_unknown == "create":
                mapped = mapped.fillna(0)
        known = ~mapped.isna()
        rows = np.flatnonzero(known.to_numpy())
        cols = mapped.to_numpy()[rows].astype(np.int64)
        return sps.csr_matrix(
            (np.ones(rows.shape[0], dtype=np.float64), (rows, cols)),
            shape=(len(ser), len(self)),
        )

    def __len__(self) -> int:
        return len(self._dict) + self._item_index_offset

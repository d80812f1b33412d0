"""Encoder base + DataFrameEncoder composition.

Behavioral parity with reference utils/encoders/base.py:9-83: ordered
column→encoder mapping, hstacked CSR output, ``encoder_shapes`` as the
bridge to ``group_shapes``, prefixed feature names.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections import OrderedDict
from typing import Any, Dict, List

import pandas as pd
import scipy.sparse as sps


class SparseEncoderBase(ABC):
    r"""Base class for encoders into sparse matrices."""

    @abstractmethod
    def to_sparse(self, x: List[Any]) -> sps.csr_matrix:
        raise NotImplementedError  # pragma: no cover

    @abstractmethod
    def __len__(self) -> int:
        raise NotImplementedError  # pragma: no cover

    @abstractmethod
    def names(self) -> List[str]:
        r"""Description of each non-zero entry."""
        raise NotImplementedError  # pragma: no cover


class DataFrameEncoder:
    """Encode a pandas DataFrame into hstacked sparse matrices."""

    def __init__(self) -> None:
        self.col_encoders: Dict[str, SparseEncoderBase] = OrderedDict()

    def all_names(self) -> List[str]:
        return [
            f"{col_name}__{description}"
            for col_name, encoder in self.col_encoders.items()
            for description in encoder.names()
        ]

    @property
    def encoder_shapes(self) -> List[int]:
        r"""Per-column encoded widths — feed these to ``group_shapes``."""
        return [len(enc) for enc in self.col_encoders.values()]

    def add_column(
        self, colname: str, encoder: SparseEncoderBase
    ) -> "DataFrameEncoder":
        r"""Register a (column name, encoder) pair; returns self."""
        self.col_encoders[colname] = encoder
        return self

    def encode_df(self, df: pd.DataFrame) -> sps.csr_matrix:
        r"""Encode the dataframe into one concatenated CSR matrix."""
        matrices = [
            encoder.to_sparse(df[colname])
            for colname, encoder in self.col_encoders.items()
        ]
        return sps.hstack(matrices, format="csr")

"""Sparse feature encoders (parity with reference
src/myfm/utils/encoders/__init__.py:1-11)."""

from .base import DataFrameEncoder, SparseEncoderBase
from .binning import BinningEncoder
from .categorical import CategoryValueToSparseEncoder
from .multi_value import MultipleValuesToSparseEncoder

__all__ = [
    "SparseEncoderBase",
    "DataFrameEncoder",
    "CategoryValueToSparseEncoder",
    "MultipleValuesToSparseEncoder",
    "BinningEncoder",
]

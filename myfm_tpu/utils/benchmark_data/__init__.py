"""Benchmark dataset managers (parity with reference
src/myfm/utils/benchmark_data/__init__.py:1-9)."""

from .loader_base import (
    DataLoaderBase,
    MovieLensBase,
    train_test_split_with_kfold,
)
from .movielens100k_data import MovieLens100kDataManager
from .movielens10M_data import MovieLens10MDataManager
from .movielens1M_data import MovieLens1MDataManager
from .synthetic import SyntheticMovieLensManager

__all__ = [
    "DataLoaderBase",
    "MovieLensBase",
    "train_test_split_with_kfold",
    "MovieLens100kDataManager",
    "MovieLens1MDataManager",
    "MovieLens10MDataManager",
    "SyntheticMovieLensManager",
]

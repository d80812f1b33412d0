"""Dataset download/caching base + deterministic K-fold splitting
(parity with reference utils/benchmark_data/loader_base.py:12-100)."""

from __future__ import annotations

import urllib.request
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional, Tuple
from zipfile import ZipFile

import numpy as np
import pandas as pd


def train_test_split_with_kfold(
    df: pd.DataFrame,
    K: int,
    fold: int,
    random_state: Optional[int] = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Deterministic shuffled K-fold split; fold sizes differ by at most
    one row, earlier folds take the remainder."""
    if not (0 <= fold < K):
        raise ValueError("0 <= fold < K")
    rng = np.random.RandomState(random_state)
    n_data = df.shape[0]
    n_test = n_data // K + (1 if fold < (n_data % K) else 0)
    index = np.arange(n_data)
    rng.shuffle(index)
    df = df.iloc[index]
    start = (n_data // K) * fold + min(n_data % K, fold)
    end = start + n_test
    train = pd.concat([df.iloc[:start], df.iloc[end:]]).reset_index(
        drop=True
    )
    test = df.iloc[start:end].reset_index(drop=True)
    return train, test


class DataLoaderBase(ABC):
    """Zip-backed dataset loader with consent-gated download."""

    zf: ZipFile

    @property
    @abstractmethod
    def DOWNLOAD_URL(self) -> str:
        raise NotImplementedError  # pragma: no cover

    @property
    @abstractmethod
    def DEFAULT_PATH(self) -> Path:
        raise NotImplementedError  # pragma: no cover

    def __init__(self, zippath: Optional[Path] = None):
        zippath = Path(zippath or self.DEFAULT_PATH)
        if not zippath.exists():
            permission = input(
                "Could not find {}.\nCan I download and save it there?[y/N]"
                .format(zippath)
            ).lower()
            if permission == "y":
                print("start download...")
                urllib.request.urlretrieve(self.DOWNLOAD_URL, zippath)
                print("complete")
            else:
                raise RuntimeError("abort.")
        self.zf = ZipFile(zippath)


class MovieLensBase(DataLoaderBase, ABC):
    @abstractmethod
    def load_rating_all(self) -> pd.DataFrame:
        raise NotImplementedError  # pragma: no cover

    def load_rating_kfold_split(
        self, K: int, fold: int, random_state: Optional[int] = 0
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Load all ratings, return the (train, test) of fold ``fold``
        of a K-fold split (the Rendle ML-10M evaluation protocol)."""
        if not (0 <= fold < K):
            raise ValueError("0 <= fold < K")
        return train_test_split_with_kfold(
            self.load_rating_all(), K, fold, random_state
        )

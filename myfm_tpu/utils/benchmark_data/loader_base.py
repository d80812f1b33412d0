"""Zip-backed benchmark-dataset plumbing.

Covers the reference's loader duties
(utils/benchmark_data/loader_base.py:12-100): a consent-gated download
into a well-known cache path, and the deterministic shuffled K-fold
splitter behind the Rendle ML-10M evaluation protocol.  The split is
seed-for-seed identical to the reference's (same RandomState shuffle,
same contiguous fold windows) so published fold RMSEs stay comparable.
"""

from __future__ import annotations

import urllib.request
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional, Tuple
from zipfile import ZipFile

import numpy as np
import pandas as pd


def _fold_window(n_data: int, K: int, fold: int) -> Tuple[int, int]:
    """[start, end) of fold ``fold`` in a length-``n_data`` sequence cut
    into K nearly-equal contiguous windows (earlier folds absorb the
    remainder, so sizes differ by at most one)."""
    sizes = np.full(K, n_data // K, dtype=np.int64)
    sizes[: n_data % K] += 1
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    return int(bounds[fold]), int(bounds[fold + 1])


def train_test_split_with_kfold(
    df: pd.DataFrame,
    K: int,
    fold: int,
    random_state: Optional[int] = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """(train, test) for one fold of a deterministic shuffled K-fold."""
    if not (0 <= fold < K):
        raise ValueError("0 <= fold < K")
    order = np.arange(len(df))
    np.random.RandomState(random_state).shuffle(order)
    start, end = _fold_window(len(df), K, fold)
    in_test = np.zeros(len(df), dtype=bool)
    in_test[start:end] = True
    shuffled = df.iloc[order]
    return (
        shuffled.iloc[~in_test].reset_index(drop=True),
        shuffled.iloc[in_test].reset_index(drop=True),
    )


def _fetch_with_consent(url: str, dest: Path) -> None:
    """Ask on stdin before touching the network; refusal aborts."""
    answer = input(
        f"Could not find {dest}.\n"
        f"Can I download and save it there?[y/N]"
    )
    if answer.lower() != "y":
        raise RuntimeError("abort.")
    print("start download...")
    urllib.request.urlretrieve(url, dest)
    print("complete")


class DataLoaderBase(ABC):
    """Opens (downloading on consent if absent) the dataset zip."""

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
            _fetch_with_consent(self.DOWNLOAD_URL, zippath)
        self.zf = ZipFile(zippath)


class MovieLensBase(DataLoaderBase, ABC):
    @abstractmethod
    def load_rating_all(self) -> pd.DataFrame:
        raise NotImplementedError  # pragma: no cover

    def load_rating_kfold_split(
        self, K: int, fold: int, random_state: Optional[int] = 0
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Load every rating and return fold ``fold`` of the K-fold
        split (the protocol behind the committed benchmark numbers)."""
        if not (0 <= fold < K):
            raise ValueError("0 <= fold < K")
        return train_test_split_with_kfold(
            self.load_rating_all(), K, fold, random_state
        )

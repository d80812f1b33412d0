"""MovieLens-1M data manager (parity with reference
utils/benchmark_data/movielens1M_data.py:9-37)."""

from __future__ import annotations

from io import BytesIO
from pathlib import Path

import pandas as pd

from .loader_base import MovieLensBase


def read_ml1m10m_df(ifs: BytesIO) -> pd.DataFrame:
    r"""Parse the '::'-separated ML-1M/10M ratings with the fast native
    parser: read with single-char sep ':' and keep the even columns."""
    df = pd.read_csv(ifs, sep=":", header=None)[[0, 2, 4, 6]].copy()
    df.columns = ["user_id", "movie_id", "rating", "timestamp"]
    df["timestamp"] = pd.to_datetime(df.timestamp, unit="s")
    return df


class MovieLens1MDataManager(MovieLensBase):
    DOWNLOAD_URL = "http://files.grouplens.org/datasets/movielens/ml-1m.zip"
    DEFAULT_PATH = Path("~/.ml-1m.zip").expanduser()

    def load_rating_all(self) -> pd.DataFrame:
        """All 1M interactions."""
        with BytesIO(self.zf.read("ml-1m/ratings.dat")) as ifs:
            return read_ml1m10m_df(ifs)

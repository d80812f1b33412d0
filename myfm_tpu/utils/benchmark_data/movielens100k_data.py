"""MovieLens-100k data manager (parity with reference
utils/benchmark_data/movielens100k_data.py:10-127): predefined u1..u5
splits, user/movie side information, genre parsing."""

from __future__ import annotations

from io import BytesIO
from pathlib import Path
from typing import List, Tuple

import pandas as pd

from .loader_base import MovieLensBase


class MovieLens100kDataManager(MovieLensBase):
    """Data manager for the MovieLens-100k dataset."""

    @property
    def DOWNLOAD_URL(self) -> str:
        return "http://files.grouplens.org/datasets/movielens/ml-100k.zip"

    @property
    def DEFAULT_PATH(self) -> Path:
        return Path("~/.ml-100k.zip").expanduser()

    def _read_interaction(self, byte_stream: bytes) -> pd.DataFrame:
        with BytesIO(byte_stream) as ifs:
            data = pd.read_csv(
                ifs,
                sep="\t",
                header=None,
                names=["user_id", "movie_id", "rating", "timestamp"],
            )
        data["timestamp"] = pd.to_datetime(data["timestamp"], unit="s")
        return data

    def load_rating_all(self) -> pd.DataFrame:
        """All 100k ratings."""
        return self._read_interaction(self.zf.read("ml-100k/u.data"))

    def load_rating_predefined_split(
        self, fold: int
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """The dataset's predefined uN.base/uN.test split, fold 1..5."""
        if not (1 <= fold <= 5):
            raise ValueError("fold must be in 1..5")
        df_train = self._read_interaction(
            self.zf.read(f"ml-100k/u{fold}.base")
        )
        df_test = self._read_interaction(
            self.zf.read(f"ml-100k/u{fold}.test")
        )
        return df_train, df_test

    def load_user_info(self) -> pd.DataFrame:
        """User meta information (age, gender, occupation, zipcode)."""
        with BytesIO(self.zf.read("ml-100k/u.user")) as ifs:
            return pd.read_csv(
                ifs,
                sep="|",
                header=None,
                names=["user_id", "age", "gender", "occupation", "zipcode"],
            )

    def genres(self) -> List[str]:
        with BytesIO(self.zf.read("ml-100k/u.genre")) as ifs:
            return list(pd.read_csv(ifs, sep="|", header=None)[0])

    def load_movie_info(self) -> pd.DataFrame:
        """Movie meta info; multiple genres joined by '|'."""
        genres = self.genres()
        with BytesIO(self.zf.read("ml-100k/u.item")) as ifs:
            df_mov = pd.read_csv(
                ifs, sep="|", encoding="latin-1", header=None
            )
        df_mov.columns = (
            ["movie_id", "title", "release_date", "unk", "url"] + genres
        )
        df_mov["release_date"] = pd.to_datetime(df_mov.release_date)
        movie_idx, genre_idx = df_mov[genres].values.nonzero()
        genre_strings = (
            pd.DataFrame(
                {
                    "movie_id": df_mov.movie_id.values[movie_idx],
                    "genre": [genres[i] for i in genre_idx],
                }
            )
            .groupby("movie_id")
            .genre.agg("|".join)
            .reindex(df_mov.movie_id)
            .fillna("")
        )
        df_mov["genres"] = genre_strings.values
        return df_mov

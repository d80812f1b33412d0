"""Synthetic rating-data generators (parity with reference
utils/dummy_data.py:10-76): a low-rank user×item score model discretized
through percentile cutpoints into 1..5 ratings, plus identity-matrix
RelationBlocks for testing the relational path."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
from scipy import sparse as sps

from ..relational import RelationBlock


def gen_dummy_rating_df(
    random_seed: int = 0,
    factor_rank: int = 3,
    size: int = 100,
    user_colname: str = "userId",
    item_colname: str = "itemId",
    timestamp_colname: str = "timestamp",
    rating_colname: str = "rating",
) -> pd.DataFrame:
    rng = np.random.RandomState(random_seed)
    n_users = max(size // 3, 10)
    n_items = max(size // 2, 10)
    user_factor = rng.normal(
        0, 1 / np.sqrt(factor_rank), size=(n_users, factor_rank)
    )
    item_factor = rng.normal(0, 1, size=(n_items, factor_rank))

    timestamps = pd.Timestamp("2000-01-01") + pd.to_timedelta(
        rng.randint(-365, 365, size=size), unit="day"
    )
    users = rng.choice(n_users, size=size, replace=True) + 1
    items = rng.choice(n_items, size=size, replace=True) + 1
    df = pd.DataFrame(
        {
            user_colname: users,
            item_colname: items,
            timestamp_colname: timestamps,
        }
    )
    score = (user_factor[users - 1] * item_factor[items - 1]).sum(axis=1)
    cutpoints = np.percentile(score, [20, 40, 60, 80])
    rating = np.ones(size, dtype=np.int64)
    for cp in cutpoints:
        rating += score >= cp
    df[rating_colname] = rating
    return df


def gen_dummy_X(
    random_seed: int = 0,
    factor_rank: int = 3,
    size: int = 100,
) -> Tuple[List[RelationBlock], np.ndarray, List[int]]:
    """Identity-matrix user/item RelationBlocks + ratings + shapes."""
    df = gen_dummy_rating_df(random_seed, factor_rank=factor_rank, size=size)
    blocks: List[RelationBlock] = []
    shapes: List[int] = []
    for colname in ["userId", "itemId"]:
        cat = pd.Categorical(df[colname])
        X = sps.identity(len(cat.categories), dtype=np.float64).tocsr()
        blocks.append(RelationBlock(cat.codes, X))
        shapes.append(X.shape[1])
    return blocks, df["rating"].values, shapes


__all__ = ["gen_dummy_rating_df", "gen_dummy_X"]

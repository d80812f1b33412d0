"""Shared feature engineering for the MovieLens example scripts.

Implements the Rendle "On the Difficulty of Evaluating Baselines"
feature sets (mf / svdpp / timesvd / timesvdpp / timesvdpp_flipped) the
reference builds inside examples/ml-10m-regression.py:71-227 — but
vectorized: the implicit user/movie N-hot matrices are assembled with
one ``csr_matrix`` constructor per block instead of per-row Python
loops.

Returns the main (date) tables, the user/movie RelationBlocks, and the
feature grouping vector.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
from scipy import sparse as sps

from myfm_tpu import RelationBlock
from myfm_tpu.utils.encoders import CategoryValueToSparseEncoder

FEATURE_SETS = ("mf", "svdpp", "timesvd", "timesvdpp", "timesvdpp_flipped")


def feature_flags(feature: str) -> Tuple[bool, bool, bool]:
    """(use_date, use_implicit_user, use_implicit_item)."""
    if feature not in FEATURE_SETS:
        raise ValueError(f"unknown feature set {feature!r}")
    return (
        feature in ("timesvd", "timesvdpp", "timesvdpp_flipped"),
        feature in ("svdpp", "timesvdpp", "timesvdpp_flipped"),
        feature == "timesvdpp_flipped",
    )


def _implicit_matrix(
    keys: np.ndarray,
    implicit_key: np.ndarray,
    implicit_value_index: np.ndarray,
    n_cols: int,
) -> sps.csr_matrix:
    """N-hot matrix: row per entry of ``keys``; row k has 1/sqrt(c)
    at the value-columns co-occurring with keys[k] in the implicit
    source (c = count). Fully vectorized."""
    order = np.argsort(implicit_key, kind="stable")
    sorted_keys = implicit_key[order]
    row_of = np.searchsorted(keys, sorted_keys)
    # drop implicit events whose key is not in `keys`
    valid = (row_of < len(keys)) & (keys[np.clip(row_of, 0, len(keys) - 1)]
                                    == sorted_keys)
    rows = row_of[valid]
    cols = implicit_value_index[order][valid]
    counts = np.bincount(rows, minlength=len(keys))
    data = 1.0 / np.sqrt(np.maximum(counts, 1))[rows]
    return sps.csr_matrix(
        (data, (rows, cols)), shape=(len(keys), n_cols)
    )


def build_feature_blocks(
    df_train: pd.DataFrame,
    df_test: pd.DataFrame,
    feature: str = "timesvdpp_flipped",
    stricter_protocol: bool = True,
):
    """Build (X_date_train, X_date_test, train_blocks, test_blocks,
    grouping) for the Rendle evaluation protocol."""
    use_date, use_iu, use_ii = feature_flags(feature)
    implicit_source = (
        df_train if stricter_protocol
        else pd.concat([df_train, df_test])
    )

    user_enc = CategoryValueToSparseEncoder(
        implicit_source.user_id.values
    )
    movie_enc = CategoryValueToSparseEncoder(
        implicit_source.movie_id.values
    )

    if use_date:
        date_enc = CategoryValueToSparseEncoder(
            implicit_source.timestamp.dt.date.values
        )
        X_date_train = date_enc.to_sparse(df_train.timestamp.dt.date.values)
        X_date_test = date_enc.to_sparse(df_test.timestamp.dt.date.values)
    else:
        date_enc = None
        X_date_train = X_date_test = None

    # implicit co-occurrence index arrays (train-only under the
    # stricter protocol)
    imp_users = implicit_source.user_id.values
    imp_movies = implicit_source.movie_id.values
    imp_user_col = np.fromiter(
        (user_enc[u] for u in imp_users), dtype=np.int64, count=len(imp_users)
    )
    imp_movie_col = np.fromiter(
        (movie_enc[m] for m in imp_movies), dtype=np.int64,
        count=len(imp_movies),
    )

    def user_table(unique_users: np.ndarray) -> sps.csr_matrix:
        X = user_enc.to_sparse(unique_users)
        if not use_iu:
            return X
        imp = _implicit_matrix(
            unique_users, imp_users, imp_movie_col, len(movie_enc)
        )
        return sps.hstack([X, imp], format="csr")

    def movie_table(unique_movies: np.ndarray) -> sps.csr_matrix:
        X = movie_enc.to_sparse(unique_movies)
        if not use_ii:
            return X
        imp = _implicit_matrix(
            unique_movies, imp_movies, imp_user_col, len(user_enc)
        )
        return sps.hstack([X, imp], format="csr")

    train_blocks: List[RelationBlock] = []
    test_blocks: List[RelationBlock] = []
    for source, target in [(df_train, train_blocks),
                           (df_test, test_blocks)]:
        uu, umap = np.unique(source.user_id.values, return_inverse=True)
        target.append(RelationBlock(umap, user_table(uu)))
        mu, mmap = np.unique(source.movie_id.values, return_inverse=True)
        target.append(RelationBlock(mmap, movie_table(mu)))

    group_sizes: List[int] = []
    if use_date:
        group_sizes.append(len(date_enc))
    group_sizes.append(len(user_enc))
    if use_iu:
        group_sizes.append(len(movie_enc))
    group_sizes.append(len(movie_enc))
    if use_ii:
        group_sizes.append(len(user_enc))
    grouping = [
        g for g, size in enumerate(group_sizes) for _ in range(size)
    ]
    return X_date_train, X_date_test, train_blocks, test_blocks, grouping


def load_movielens(scale: str, fold: int, synthetic: bool,
                   random_seed: int = 42,
                   K: int = 10) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """K-fold train/test of the real dataset, or a synthetic stand-in
    of the same schema/scale for zero-egress environments."""
    if synthetic:
        from myfm_tpu.utils.benchmark_data import SyntheticMovieLensManager

        man = SyntheticMovieLensManager(scale, random_seed=random_seed)
        return man.load_rating_kfold_split(K, fold, random_seed)
    if scale == "tiny":
        raise ValueError("scale='tiny' is synthetic-only (--synthetic).")
    from myfm_tpu.utils.benchmark_data import (
        MovieLens1MDataManager,
        MovieLens10MDataManager,
        MovieLens100kDataManager,
    )

    manager = {
        "100k": MovieLens100kDataManager,
        "1m": MovieLens1MDataManager,
        "10m": MovieLens10MDataManager,
    }[scale]()
    return manager.load_rating_kfold_split(K, fold, random_seed)

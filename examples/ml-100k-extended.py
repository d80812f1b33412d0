"""MovieLens-100k with user/movie side information (counterpart of the
reference's examples/ml-100k-extended.ipynb and
doc/source/movielens.rst "with side information": RMSE 0.8855 on real
data, rank 10).

Each RelationBlock row is [one-hot id | side features] — user
age-bin/occupation one-hots, movie release-year bins + genres
multi-hot.  These designs have only ~1 + max-side-nnz colors per
block, so ``sweep_strategy='joint'`` sweeps them in a handful of
fused color steps per iteration.

``--synthetic`` generates schema-compatible side features from a
seeded RNG for zero-egress environments.
"""

import _path  # noqa: F401

import argparse

import numpy as np
import pandas as pd
import scipy.sparse as sps

from myfm_tpu import MyFMRegressor, RelationBlock
from myfm_tpu.utils.encoders import (
    BinningEncoder,
    CategoryValueToSparseEncoder,
    MultipleValuesToSparseEncoder,
)


def real_side_tables(man, unique_users, unique_movies):
    user_info = man.load_user_info().set_index("user_id")
    movie_info = man.load_movie_info().set_index("movie_id")
    age_enc = BinningEncoder(user_info.age.values, n_percentiles=10)
    occ_enc = CategoryValueToSparseEncoder(user_info.occupation)
    year_enc = BinningEncoder(
        pd.to_datetime(movie_info.release_date).dt.year.values,
        n_percentiles=10,
    )
    genre_enc = MultipleValuesToSparseEncoder(
        movie_info.genres, normalize=True
    )
    ui = user_info.reindex(unique_users)
    mi = movie_info.reindex(unique_movies)
    user_side = sps.hstack(
        [age_enc.to_sparse(ui.age.values),
         occ_enc.to_sparse(ui.occupation)],
        format="csr",
    )
    movie_side = sps.hstack(
        [year_enc.to_sparse(
            pd.to_datetime(mi.release_date).dt.year.values
         ),
         genre_enc.to_sparse(mi.genres)],
        format="csr",
    )
    return user_side, movie_side


def synthetic_side_tables(rng, unique_users, unique_movies,
                          n_age=10, n_occ=20, n_year=10, n_genre=19):
    def onehot(keys, n):
        v = rng.randint(0, n, size=len(keys))
        return sps.csr_matrix(
            (np.ones(len(keys)), (np.arange(len(keys)), v)),
            shape=(len(keys), n),
        )

    def multihot(keys, n, k=3):
        rows = np.repeat(np.arange(len(keys)), k)
        cols = rng.randint(0, n, size=len(keys) * k)
        return sps.csr_matrix(
            (np.full(len(rows), 1.0 / np.sqrt(k)), (rows, cols)),
            shape=(len(keys), n),
        )

    user_side = sps.hstack(
        [onehot(unique_users, n_age), onehot(unique_users, n_occ)],
        format="csr",
    )
    movie_side = sps.hstack(
        [onehot(unique_movies, n_year),
         multihot(unique_movies, n_genre)],
        format="csr",
    )
    return user_side, movie_side


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--fold", type=int, default=1)
    p.add_argument("-r", "--rank", type=int, default=10)
    p.add_argument("-i", "--iteration", type=int, default=200)
    p.add_argument("-s", "--seed", type=int, default=42)
    p.add_argument("--strategy", default="joint",
                   choices=("auto", "joint", "serial"))
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--scale", choices=["tiny", "100k"],
                   default="100k",
                   help="synthetic dataset size ('tiny' for smoke tests)")
    args = p.parse_args()
    if args.scale == "tiny" and not args.synthetic:
        p.error("--scale tiny is synthetic-only; add --synthetic")

    man = None
    if args.synthetic:
        from myfm_tpu.utils.benchmark_data import SyntheticMovieLensManager

        sman = SyntheticMovieLensManager(args.scale, random_seed=42)
        df_train, df_test = sman.load_rating_kfold_split(
            5, args.fold - 1, 42
        )
    else:
        from myfm_tpu.utils.benchmark_data import MovieLens100kDataManager

        man = MovieLens100kDataManager()
        df_train, df_test = man.load_rating_predefined_split(
            fold=args.fold
        )

    rng = np.random.RandomState(args.seed)
    unique_users, user_map = np.unique(
        df_train.user_id.values, return_inverse=True
    )
    unique_movies, movie_map = np.unique(
        df_train.movie_id.values, return_inverse=True
    )
    if man is not None:
        user_side, movie_side = real_side_tables(
            man, unique_users, unique_movies
        )
    else:
        user_side, movie_side = synthetic_side_tables(
            rng, unique_users, unique_movies
        )

    user_tbl = sps.hstack(
        [sps.identity(len(unique_users), format="csr"), user_side],
        format="csr",
    )
    movie_tbl = sps.hstack(
        [sps.identity(len(unique_movies), format="csr"), movie_side],
        format="csr",
    )

    def blocks_for(df):
        um = np.searchsorted(unique_users, df.user_id.values)
        mm = np.searchsorted(unique_movies, df.movie_id.values)
        um = np.clip(um, 0, len(unique_users) - 1)
        mm = np.clip(mm, 0, len(unique_movies) - 1)
        return [
            RelationBlock(um, user_tbl),
            RelationBlock(mm, movie_tbl),
        ]

    grouping = (
        [0] * len(unique_users) + [1] * user_side.shape[1]
        + [2] * len(unique_movies) + [3] * movie_side.shape[1]
    )
    y_train = df_train.rating.values.astype(np.float64)
    y_test = df_test.rating.values.astype(np.float64)

    fm = MyFMRegressor(
        rank=args.rank, random_seed=args.seed,
        sweep_strategy=args.strategy,
    )
    fm.fit(
        None, y_train, X_rel=blocks_for(df_train),
        grouping=grouping, n_iter=args.iteration,
        n_kept_samples=max(args.iteration - 5, 5),
    )
    pred = np.clip(
        fm.predict(None, X_rel=blocks_for(df_test)), 1.0, 5.0
    )
    rmse = float(np.sqrt(((pred - y_test) ** 2).mean()))
    mae = float(np.abs(pred - y_test).mean())
    print(f"fold={args.fold} rank={args.rank} strategy={args.strategy}")
    print(f"rmse={rmse:.5f} mae={mae:.5f} "
          f"(reference on real data: 0.8855)")


if __name__ == "__main__":
    main()

"""MovieLens-100k regression benchmark (counterpart of reference
examples/ml-100k-regression.py and doc/source/movielens.rst).

Trains a Bayesian FM on one-hot user/movie ids with feature grouping on
a predefined u{fold}.base/.test split and reports RMSE/MAE.  Reference
numbers (author CPU): rank 8 / 100 iters -> RMSE ~0.896 grouped
(README.md:119-121).

Use ``--synthetic`` to run on a generated ML-100k-shaped dataset when
the real zip cannot be downloaded.
"""

import _path  # noqa: F401  (repo-root import shim)

import argparse

import numpy as np

from myfm_tpu import MyFMRegressor
from myfm_tpu.utils.encoders import CategoryValueToSparseEncoder


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--fold", type=int, default=3,
                   help="predefined split index (1..5)")
    p.add_argument("-r", "--rank", type=int, default=8)
    p.add_argument("-i", "--iteration", type=int, default=100)
    p.add_argument("-s", "--seed", type=int, default=114514)
    p.add_argument("--no-grouping", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="use a synthetic ML-100k-shaped dataset")
    p.add_argument("--scale", choices=["tiny", "100k"],
                   default="100k",
                   help="synthetic dataset size ('tiny' for smoke tests)")
    args = p.parse_args()
    if args.scale == "tiny" and not args.synthetic:
        p.error("--scale tiny is synthetic-only; add --synthetic")

    if args.synthetic:
        from myfm_tpu.utils.benchmark_data import SyntheticMovieLensManager

        man = SyntheticMovieLensManager(args.scale, random_seed=42)
        df_train, df_test = man.load_rating_kfold_split(5, args.fold - 1, 42)
    else:
        from myfm_tpu.utils.benchmark_data import MovieLens100kDataManager

        man = MovieLens100kDataManager()
        df_train, df_test = man.load_rating_predefined_split(fold=args.fold)

    user_enc = CategoryValueToSparseEncoder(df_train.user_id.values)
    movie_enc = CategoryValueToSparseEncoder(df_train.movie_id.values)

    import scipy.sparse as sps

    def encode(df):
        return sps.hstack(
            [
                user_enc.to_sparse(df.user_id.values),
                movie_enc.to_sparse(df.movie_id.values),
            ],
            format="csr",
        )

    X_train, X_test = encode(df_train), encode(df_test)
    y_train = df_train.rating.values.astype(np.float64)
    y_test = df_test.rating.values.astype(np.float64)

    group_shapes = (
        None if args.no_grouping else [len(user_enc), len(movie_enc)]
    )
    fm = MyFMRegressor(rank=args.rank, random_seed=args.seed)
    fm.fit(
        X_train,
        y_train,
        group_shapes=group_shapes,
        n_iter=args.iteration,
        n_kept_samples=max(args.iteration - 5, 5),
    )
    pred = np.clip(fm.predict(X_test), 1.0, 5.0)
    rmse = float(np.sqrt(((pred - y_test) ** 2).mean()))
    mae = float(np.abs(pred - y_test).mean())
    print(f"fold={args.fold} rank={args.rank} iters={args.iteration} "
          f"grouped={not args.no_grouping}")
    print(f"rmse={rmse:.5f} mae={mae:.5f}")


if __name__ == "__main__":
    main()

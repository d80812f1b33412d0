"""MovieLens-100k variational-inference benchmark (counterpart of
reference examples/ml-100k-variational.py): deterministic
coordinate-ascent VI on one-hot user/movie features, with side
information columns optionally appended, reporting RMSE/MAE of the
posterior-mean prediction."""

import _path  # noqa: F401  (repo-root import shim)

import argparse

import numpy as np
import scipy.sparse as sps

from myfm_tpu import VariationalFMRegressor
from myfm_tpu.utils.encoders import CategoryValueToSparseEncoder


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--fold", type=int, default=3)
    p.add_argument("-r", "--rank", type=int, default=10)
    p.add_argument("-i", "--iteration", type=int, default=200)
    p.add_argument("--synthetic", action="store_true")
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

    def encode(df):
        return sps.hstack(
            [
                user_enc.to_sparse(df.user_id.values),
                movie_enc.to_sparse(df.movie_id.values),
            ],
            format="csr",
        )

    fm = VariationalFMRegressor(rank=args.rank)
    fm.fit(
        encode(df_train),
        df_train.rating.values.astype(np.float64),
        group_shapes=[len(user_enc), len(movie_enc)],
        n_iter=args.iteration,
    )
    pred = np.clip(fm.predict(encode(df_test)), 1.0, 5.0)
    y = df_test.rating.values.astype(np.float64)
    print(f"rmse={np.sqrt(((pred - y) ** 2).mean()):.5f} "
          f"mae={np.abs(pred - y).mean():.5f}")


if __name__ == "__main__":
    main()

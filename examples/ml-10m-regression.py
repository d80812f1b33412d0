"""ML-10M Rendle-protocol benchmark (counterpart of reference
examples/ml-10m-regression.py:20-274): 10-fold CV, timesvdpp_flipped
features as user/movie RelationBlocks + a date one-hot main table,
feature grouping, libFM-style streaming evaluation callback with
prediction clipping to [0.5, 5].

Also runs on ML-1M/100k via --scale, and on synthetic stand-ins via
--synthetic for zero-egress environments.
"""

import _path  # noqa: F401  (repo-root import shim)

import argparse
import pickle

import numpy as np

from ml_features import FEATURE_SETS, build_feature_blocks, load_movielens
from myfm_tpu import MyFMOrderedProbit, MyFMRegressor
from myfm_tpu.utils.callbacks import (
    OrderedProbitCallback,
    RegressionCallback,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fold_index", type=int,
                   help="test fold within 10-fold CV (0..9)")
    p.add_argument("-a", "--algorithm", choices=["regression", "oprobit"],
                   default="regression")
    p.add_argument("-i", "--iteration", type=int, default=512)
    p.add_argument("-d", "--dimension", type=int, default=128)
    p.add_argument("-f", "--feature", choices=list(FEATURE_SETS),
                   default="timesvdpp_flipped")
    p.add_argument("--scale", choices=["tiny", "100k", "1m", "10m"],
                   default="10m",
                   help="'tiny' (synthetic only) is a smoke-test size")
    p.add_argument("--stricter_protocol", action="store_true", default=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    if not (0 <= args.fold_index < 10):
        raise ValueError("fold_index must be in range(10).")

    df_train, df_test = load_movielens(
        args.scale, args.fold_index, args.synthetic, args.seed
    )
    if args.algorithm == "oprobit":
        # rating r in {0.5,...,5.0} (or {1..5}) -> ordinal class ids
        classes = np.unique(
            np.concatenate(
                [df_train.rating.values, df_test.rating.values]
            )
        )
        lookup = {v: k for k, v in enumerate(classes)}
        for df_ in (df_train, df_test):
            df_["rating"] = df_.rating.map(lookup).astype(np.int32)
        n_class = len(classes)

    (X_date_train, X_date_test, train_blocks, test_blocks,
     grouping) = build_feature_blocks(
        df_train, df_test, args.feature, args.stricter_protocol
    )
    print(f"train={df_train.shape} test={df_test.shape} "
          f"groups={max(grouping) + 1}")

    trace_path = f"rmse_{args.algorithm}_fold_{args.fold_index}.csv"
    if args.algorithm == "regression":
        fm = MyFMRegressor(rank=args.dimension)
        callback = RegressionCallback(
            args.iteration,
            X_date_test,
            df_test.rating.values.astype(np.float64),
            X_rel_test=test_blocks,
            clip_min=float(df_train.rating.min()),
            clip_max=float(df_train.rating.max()),
            trace_path=trace_path,
        )
    else:
        fm = MyFMOrderedProbit(rank=args.dimension)
        callback = OrderedProbitCallback(
            args.iteration,
            X_date_test,
            df_test.rating.values,
            n_class=n_class,
            X_rel_test=test_blocks,
            trace_path=trace_path,
        )

    fm.fit(
        X_date_train,
        df_train.rating.values,
        X_rel=train_blocks,
        grouping=grouping,
        n_iter=callback.n_iter,
        callback=callback,
        n_kept_samples=1,
    )
    with open(
        f"callback_result_{args.algorithm}_fold_{args.fold_index}.pkl", "wb"
    ) as ofs:
        pickle.dump(callback, ofs)


if __name__ == "__main__":
    main()

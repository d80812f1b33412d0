"""Encoder unit tests (strategy of reference tests/utils/*)."""

import numpy as np
import pandas as pd
import pytest

from myfm_tpu.utils.encoders import (
    BinningEncoder,
    CategoryValueToSparseEncoder,
    DataFrameEncoder,
    MultipleValuesToSparseEncoder,
)


class TestCategorical:
    def test_create_unknown(self):
        enc = CategoryValueToSparseEncoder(["b", "a", "b", "c"])
        assert len(enc) == 4  # __UNK__ + a,b,c
        assert enc.names()[0] == "__UNK__"
        X = enc.to_sparse(["a", "z", "b"]).toarray()
        assert X.shape == (3, 4)
        assert X[0, enc["a"]] == 1
        assert X[1, 0] == 1  # unknown → __UNK__ column
        assert X[2, enc["b"]] == 1
        assert (X.sum(axis=1) == 1).all()

    def test_min_freq(self):
        enc = CategoryValueToSparseEncoder(
            ["a", "a", "b"], min_freq=2
        )
        assert len(enc) == 2  # __UNK__ + a
        X = enc.to_sparse(["b"]).toarray()
        assert X[0, 0] == 1  # b dropped → unknown

    def test_ignore(self):
        enc = CategoryValueToSparseEncoder(
            ["a", "b"], handle_unknown="ignore"
        )
        assert len(enc) == 2
        X = enc.to_sparse(["a", "z"]).toarray()
        assert X[0].sum() == 1
        assert X[1].sum() == 0  # ignored row is empty

    def test_raise(self):
        enc = CategoryValueToSparseEncoder(
            ["a", "b"], handle_unknown="raise"
        )
        with pytest.raises(KeyError):
            enc.to_sparse(["z"])
        X = enc.to_sparse(["b", "a"]).toarray()
        assert X.shape == (2, 2)

    def test_int_items(self):
        enc = CategoryValueToSparseEncoder([3, 1, 2, 1])
        X = enc.to_sparse([1, 2, 3]).toarray()
        assert (X.sum(axis=0)[1:] == 1).all()


class TestBinning:
    def test_basic(self):
        x = np.arange(100, dtype=np.float64)
        enc = BinningEncoder(x, n_percentiles=4)
        X = enc.to_sparse([-5.0, 50.0, 1000.0, np.nan]).toarray()
        assert X.shape[1] == len(enc)
        assert X[0, 1] == 1  # below all percentiles
        assert X[2, -1] == 1  # above all percentiles
        assert X[3, 0] == 1  # NaN column
        assert (X.sum(axis=1) == 1).all()
        assert enc.names()[0] == "NaN"

    def test_tied_percentiles(self):
        # constant-ish data: duplicated percentiles must be deduplicated
        x = np.array([1.0] * 50 + [2.0] * 2)
        enc = BinningEncoder(x, n_percentiles=10)
        X = enc.to_sparse([0.5, 1.0, 3.0]).toarray()
        assert (X.sum(axis=1) == 1).all()
        assert len(enc) == len(enc.percentiles) + 2


class TestMultiValue:
    def test_basic(self):
        enc = MultipleValuesToSparseEncoder(
            ["a,b", "b,c", "a"], normalize=False
        )
        X = enc.to_sparse(["a,b", "c"]).toarray()
        assert X[0].sum() == 2
        assert X[1].sum() == 1

    def test_normalize(self):
        enc = MultipleValuesToSparseEncoder(["a,b", "b,c,d"])
        X = enc.to_sparse(["a,b,c,d"]).toarray()
        nz = X[0][X[0] > 0]
        np.testing.assert_allclose(nz, 0.5)  # 1/sqrt(4)

    def test_empty_and_dupes(self):
        enc = MultipleValuesToSparseEncoder(["a,,a", "b"], normalize=False)
        X = enc.to_sparse(["", "a,a"]).toarray()
        assert X[0].sum() == 0
        assert X[1].sum() == 1  # dupes collapse


def test_dataframe_encoder():
    df = pd.DataFrame(
        {"cat": ["x", "y", "x"], "num": [1.0, 2.0, np.nan]}
    )
    dfe = (
        DataFrameEncoder()
        .add_column("cat", CategoryValueToSparseEncoder(df["cat"]))
        .add_column("num", BinningEncoder(df["num"], n_percentiles=2))
    )
    X = dfe.encode_df(df)
    assert X.shape == (3, sum(dfe.encoder_shapes))
    assert len(dfe.all_names()) == X.shape[1]
    assert dfe.all_names()[0] == "cat____UNK__"
    # row sums: one-hot cat + one-hot bin = 2 per row
    np.testing.assert_allclose(np.asarray(X.sum(axis=1)).ravel(), 2.0)


def test_kfold_split_partition():
    from myfm_tpu.utils.benchmark_data import train_test_split_with_kfold

    df = pd.DataFrame({"v": np.arange(103)})
    tests = []
    for fold in range(7):
        train, test = train_test_split_with_kfold(df, 7, fold, 0)
        assert train.shape[0] + test.shape[0] == 103
        tests.append(test)
    all_test = pd.concat(tests)
    assert sorted(all_test["v"].tolist()) == list(range(103))
    with pytest.raises(ValueError):
        train_test_split_with_kfold(df, 7, 7, 0)


def test_dummy_data():
    from myfm_tpu.utils.dummy_data import gen_dummy_rating_df, gen_dummy_X

    df = gen_dummy_rating_df(size=120)
    assert df.shape[0] == 120
    assert set(df["rating"].unique()) <= {1, 2, 3, 4, 5}
    blocks, y, shapes = gen_dummy_X(size=120)
    assert len(blocks) == 2
    assert y.shape[0] == 120
    assert blocks[0].mapper_size == 120
    assert shapes == [b.feature_size for b in blocks]


def test_synthetic_manager():
    from myfm_tpu.utils.benchmark_data import SyntheticMovieLensManager

    man = SyntheticMovieLensManager(n_rows=5000, n_users=100, n_items=80)
    df = man.load_rating_all()
    assert df.shape[0] == 5000
    assert set(df.columns) == {
        "user_id", "movie_id", "rating", "timestamp"
    }
    train, test = man.load_rating_kfold_split(10, 2)
    assert train.shape[0] + test.shape[0] == 5000

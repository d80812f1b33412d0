"""The _fit template surface: typed validation errors (reference
FMLearningConfig.hpp:48-56 semantics) and the held-out-set default
callback (reference base.py:179-205)."""

import numpy as np
import pytest
import scipy.sparse as sps

from myfm_tpu import MyFMGibbsClassifier, MyFMGibbsRegressor


def _toy(seed=0, n=120, d=4):
    rng = np.random.RandomState(seed)
    X = sps.csr_matrix((rng.rand(n, d) > 0.5).astype(np.float64))
    w = rng.normal(size=d)
    y = X @ w + 0.1 * rng.normal(size=n)
    return X, y


def test_fit_iteration_count_validation():
    X, y = _toy()
    with pytest.raises(ValueError, match="n_iter"):
        MyFMGibbsRegressor(rank=1).fit(X, y, n_iter=0)
    with pytest.raises(ValueError, match="n_kept_samples"):
        MyFMGibbsRegressor(rank=1).fit(X, y, n_iter=5, n_kept_samples=0)
    with pytest.raises(ValueError, match="cannot exceed"):
        MyFMGibbsRegressor(rank=1).fit(X, y, n_iter=5, n_kept_samples=6)


def test_fit_shape_validation():
    X, y = _toy()
    with pytest.raises(ValueError, match="target"):
        MyFMGibbsRegressor(rank=1).fit(X, y[:-1], n_iter=3)
    with pytest.raises(ValueError, match="grouping"):
        MyFMGibbsRegressor(rank=1).fit(X, y, grouping=[0, 0], n_iter=3)
    # group_shapes must also cover every feature
    with pytest.raises(ValueError, match="grouping"):
        MyFMGibbsRegressor(rank=1).fit(
            X, y, group_shapes=[2, 1], n_iter=3
        )


def test_fit_test_set_pairing_required():
    X, y = _toy()
    with pytest.raises(RuntimeError, match="y_test"):
        MyFMGibbsRegressor(rank=1).fit(X, y, X_test=X, n_iter=3)
    with pytest.raises(RuntimeError, match="y_test"):
        MyFMGibbsRegressor(rank=1).fit(X, y, y_test=y, n_iter=3)
    with pytest.raises(ValueError, match="test"):
        MyFMGibbsRegressor(rank=1).fit(
            X, y, X_test=X, y_test=y[:-1], n_iter=3
        )


def test_fit_with_held_out_set_scores_it():
    """The default callback scores the held-out rows every
    callback_default_freq iterations without disturbing the fit."""
    X, y = _toy(seed=1)
    fm = MyFMGibbsRegressor(rank=2, random_seed=3).fit(
        X[:100], y[:100], X_test=X[100:], y_test=y[100:],
        n_iter=12, n_kept_samples=12,
    )
    assert len(fm.predictor_.samples) == 12
    rmse = np.sqrt(np.mean((fm.predict(X[100:]) - y[100:]) ** 2))
    assert rmse < 1.0

    # classification flavour (accuracy/ll metrics path)
    yc = (y > np.median(y)).astype(np.float64)
    clf = MyFMGibbsClassifier(rank=2, random_seed=3).fit(
        X[:100], yc[:100], X_test=X[100:], y_test=yc[100:],
        n_iter=8, n_kept_samples=8,
    )
    p = clf.predict_proba(X[100:])
    assert p.shape == (20,) and np.all((p >= 0) & (p <= 1))

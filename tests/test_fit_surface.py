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


def _tiny_problem(n=120, nu=7, ni=5, seed=3):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    X = sps.hstack(
        [
            sps.csr_matrix(
                (np.ones(n), (np.arange(n), u)), shape=(n, nu)
            ),
            sps.csr_matrix(
                (np.ones(n), (np.arange(n), i)), shape=(n, ni)
            ),
        ],
        format="csr",
    )
    y = rng.normal(size=nu)[u] + rng.normal(size=ni)[i]
    return X, y


def test_async_trace_finalized_to_plain_containers():
    """With the default callback the trainers harvest the trace
    asynchronously (trainer._AsyncDrain); after fit() every container
    must be a plain numpy-backed object — picklable, no device-buffer
    lazies left (round-5 async-loop contract)."""
    import pickle

    from myfm_tpu.containers import FM, FMHyperParameters

    X, y = _tiny_problem()
    fm = MyFMGibbsRegressor(rank=2, random_seed=0)
    fm.fit(X, y, n_iter=12, n_kept_samples=4)
    assert len(fm.history_.hypers) == 12
    for h in fm.history_.hypers:
        assert type(h) is FMHyperParameters
        assert isinstance(h.alpha, float)
    assert len(fm.predictor_.samples) == 4
    for s in fm.predictor_.samples:
        assert type(s) is FM
    pickle.loads(pickle.dumps(fm))  # must round-trip
    # hyper trace is consistent and usable
    df = fm.get_hyper_trace()
    assert df.shape[0] == 12 and np.isfinite(df.values).all()


def test_async_optin_callback_sees_live_values_and_early_stops():
    """A user callback tagged allow_async_trace=True reads lazy views:
    values must be real (finite, correct shapes) and early-stop must
    still finalize the containers."""
    from myfm_tpu.containers import FMHyperParameters

    X, y = _tiny_problem()
    seen = []

    def cb(i, fm, hyper, history):
        if i % 3 == 0:
            seen.append((float(hyper.alpha), float(fm.w0)))
        return (i >= 7), None

    cb.allow_async_trace = True
    fm = MyFMGibbsRegressor(rank=2, random_seed=0)
    fm.fit(X, y, n_iter=50, n_kept_samples=45, callback=cb)
    # stopped at iteration 7 (0-based) -> 8 recorded sweeps
    assert len(fm.history_.hypers) == 8
    assert all(
        type(h) is FMHyperParameters for h in fm.history_.hypers
    )
    assert len(seen) == 3 and np.isfinite(np.asarray(seen)).all()


def test_eager_user_callback_semantics_unchanged():
    """A plain user callback gets eagerly materialized history entries
    every sweep (reference FMTrainer.hpp:78 semantics)."""
    from myfm_tpu.containers import FMHyperParameters

    X, y = _tiny_problem()
    kinds = []

    def cb(i, fm, hyper, history):
        kinds.append(type(history.hypers[-1]))
        return False, None

    fm = MyFMGibbsRegressor(rank=2, random_seed=0)
    fm.fit(X, y, n_iter=5, callback=cb)
    assert all(k is FMHyperParameters for k in kinds)

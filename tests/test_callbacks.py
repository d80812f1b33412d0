"""Device-backed libFM callback scoring (utils/callbacks/libfm.py).

Checks the paths added on top of the reference behavior (reference
utils/callbacks/libfm.py:13-262): the device scorer agrees with the
numpy forward pass, fitted callbacks pickle with their device caches
dropped and keep working after a round-trip, and the ordered-probit
callback's cutpoint-based class probabilities are a valid distribution
matching ``oprobit_predict_proba``.
"""

import pickle

import numpy as np
import scipy.sparse as sps

from myfm_tpu import MyFMGibbsRegressor, MyFMOrderedProbit
from myfm_tpu.utils.callbacks import (
    OrderedProbitCallback,
    RegressionCallback,
)


def _toy(n=120, users=8, items=6, seed=0):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, users, n)
    it = rng.randint(0, items, n)
    X = sps.hstack(
        [
            sps.csr_matrix(
                (np.ones(n), (np.arange(n), u)), shape=(n, users)
            ),
            sps.csr_matrix(
                (np.ones(n), (np.arange(n), it)), shape=(n, items)
            ),
        ]
    ).tocsr()
    y = rng.normal(size=n) + u * 0.1 - it * 0.05
    return X, y


def _spy_views(cb):
    views = []
    orig = cb._measure_score

    def spy(i, fm, hyper):
        views.append(fm)
        return orig(i, fm, hyper)

    cb._measure_score = spy
    return views


def test_device_scoring_matches_numpy_and_pickles():
    X, y = _toy()
    cb = RegressionCallback(6, X, y)
    views = _spy_views(cb)
    MyFMGibbsRegressor(2).fit(
        X, y, n_iter=6, n_kept_samples=6, callback=cb
    )
    assert cb._device_plan is not None  # device path was exercised
    fm_view = views[-1]
    dev = cb._score_on_device(fm_view)
    ref = fm_view.predict_score(X, [])
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)

    # fitted callbacks pickle with device caches dropped ...
    del cb._measure_score  # drop the (unpicklable) test spy
    cb2 = pickle.loads(pickle.dumps(cb))
    assert cb2._device_plan is None
    np.testing.assert_allclose(cb2.predictions, cb.predictions)
    # ... and keep working afterwards (plan rebuilt lazily)
    dev2 = cb2._score_on_device(fm_view)
    np.testing.assert_allclose(dev2, ref, rtol=1e-4, atol=1e-4)


def test_oprobit_callback_device_probs():
    X, y = _toy(seed=7)
    yc = np.digitize(y, np.quantile(y, [0.33, 0.66])).astype(np.int32)
    cb = OrderedProbitCallback(4, X, yc, n_class=3)
    views = _spy_views(cb)
    fm = MyFMOrderedProbit(2).fit(
        X, yc, n_iter=4, n_kept_samples=4, callback=cb
    )
    assert cb._device_plan is not None
    mean = cb.predictions / cb.n_samples
    np.testing.assert_allclose(mean.sum(axis=1), 1.0, atol=1e-8)
    assert np.all(mean >= 0)
    assert len(cb.result_trace) == 4
    assert not np.isnan(cb.result_trace[-1]["rmse_this"])

    # device-path class probabilities == the numpy oprobit forward
    fm_view = views[-1]
    score = cb._score_on_device(fm_view)
    from scipy.special import ndtr

    gamma = np.asarray(fm_view.cutpoints[0], dtype=np.float64)
    cdf = ndtr(gamma[None, :] - score[:, None])
    probs_dev = np.concatenate(
        [cdf[:, :1], np.diff(cdf, axis=1), 1.0 - cdf[:, -1:]], axis=1
    )
    probs_np = fm_view.oprobit_predict_proba(X, [], 0)
    np.testing.assert_allclose(probs_dev, probs_np, rtol=1e-4, atol=1e-4)
    del fm

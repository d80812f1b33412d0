"""Ordered-probit tests (strategy of reference
tests/oprobit/test_oprobit_1dim.py): a rank-0 1-D model must recover
known cutpoints; class probabilities must match a manual recomputation
from samples + cutpoints."""

import numpy as np
from scipy.special import ndtr

from myfm_tpu import MyFMOrderedProbit


def _gen_ordinal(n=1000, seed=0):
    cps = np.array([0.0, 0.5, 1.5])
    rng = np.random.RandomState(seed)
    X = rng.normal(0, 2, size=n)
    score = X * 0.5 + rng.randn(n)
    y = np.zeros(n, dtype=np.int64)
    for cp in cps:
        y += (score > cp).astype(np.int64)
    return X[:, None], y


def test_oprobit_cutpoint_recovery():
    X, y = _gen_ordinal()
    fm = MyFMOrderedProbit(0, fit_w0=False)
    fm.fit(X, y, n_iter=100, n_kept_samples=100)

    assert fm.predictor_ is not None
    assert len(fm.history_.n_mh_accept) == 1
    assert fm.history_.n_mh_accept[0] > 0  # sampler is actually moving

    for cp in fm.cutpoint_samples[-10:]:
        cp1, cp2, cp3 = cp
        assert abs(cp1) < 0.25
        assert abs(cp2 - cp1 - 0.5) < 0.25
        assert abs(cp3 - cp1 - 1.5) < 0.25


def test_oprobit_predict_proba_consistency():
    X, y = _gen_ordinal(n=400, seed=3)
    fm = MyFMOrderedProbit(0, fit_w0=False)
    fm.fit(X, y, n_iter=30, n_kept_samples=20)

    proba = fm.predict_proba(X)
    assert proba.shape == (400, 4)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)

    # manual recomputation from samples + cutpoints
    manual = np.zeros_like(proba)
    for sample in fm.predictor_.samples:
        score = sample.predict_score(X, [])
        cdf = ndtr(sample.cutpoints[0][None, :] - score[:, None])
        ext = np.hstack(
            [np.zeros((400, 1)), cdf, np.ones((400, 1))]
        )
        manual += ext[:, 1:] - ext[:, :-1]
    manual /= len(fm.predictor_.samples)
    np.testing.assert_allclose(manual, proba, rtol=1e-4, atol=1e-6)

    # argmax prediction
    np.testing.assert_array_equal(fm.predict(X), proba.argmax(axis=1))

    # accuracy should beat the majority-class baseline
    acc = (fm.predict(X) == y).mean()
    baseline = np.bincount(y).max() / y.shape[0]
    assert acc > baseline


def test_oprobit_categorical_fast_path():
    """Ordered probit on the entity-space fast path (the
    categorical_sweep TASK_ORDERED branch) end-to-end through the
    estimator, plus the per-iteration MH accept trace."""
    import scipy.sparse as sps

    from myfm_tpu import RelationBlock

    rng = np.random.RandomState(11)
    n, nu, ni = 600, 25, 15
    u, i = rng.randint(0, nu, n), rng.randint(0, ni, n)
    score = rng.normal(size=nu)[u] + rng.normal(size=ni)[i]
    y = np.digitize(score, [-1.0, 0.0, 1.0]).astype(np.int64)
    blocks = [
        RelationBlock(u, sps.identity(nu, format="csr")),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]

    # sweep_strategy='categorical' raises unless the fast path is taken
    fm = MyFMOrderedProbit(
        rank=2, random_seed=4, sweep_strategy="categorical"
    )
    fm.fit(None, y, X_rel=blocks, n_iter=25, n_kept_samples=15)

    proba = fm.predict_proba(None, X_rel=blocks)
    assert proba.shape == (n, 4)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)
    cut = fm.cutpoint_samples
    assert cut.shape[1] == 3 and np.all(np.diff(cut, axis=1) > 0)

    trace = fm.history_.n_mh_accept_trace
    assert len(trace) == 25
    assert all(len(t) == 1 for t in trace)  # one cutpoint group
    assert all(
        b[0] - a[0] in (0, 1) for a, b in zip(trace, trace[1:])
    )
    assert fm.history_.n_mh_accept == trace[-1]

    acc = (fm.predict(None, X_rel=blocks) == y).mean()
    assert acc > np.bincount(y).max() / y.shape[0]

"""Multiple cutpoint groups: independent cutpoint samplers sharing one
FM (the C++ engine's CutpointGroupType capability,
/root/reference/include/myfm/FMLearningConfig.hpp:15 +
OProbitSampler.hpp instantiated per group in FMTrainer.hpp:99-119 —
never exposed by the reference's Python layer, which always uses the
single all-rows group, reference gibbs.py:429-432)."""

import numpy as np
import pytest
import scipy.sparse as sps

from myfm_tpu import MyFMOrderedProbit, RelationBlock


def _two_scale_ordinal(n=2000, seed=0):
    """One latent 1-D score; even rows discretized on a 4-class scale,
    odd rows on a different 3-class scale."""
    rng = np.random.RandomState(seed)
    X = rng.normal(0, 2, size=n)
    score = X * 0.5 + rng.randn(n)
    cps_a = np.array([0.0, 0.5, 1.5])  # K=4
    cps_b = np.array([-1.0, 1.0])  # K=3
    y = np.zeros(n, dtype=np.int64)
    even = np.arange(n) % 2 == 0
    for cp in cps_a:
        y[even] += (score[even] > cp).astype(np.int64)
    for cp in cps_b:
        y[~even] += (score[~even] > cp).astype(np.int64)
    groups = [
        (4, np.where(even)[0].tolist()),
        (3, np.where(~even)[0].tolist()),
    ]
    return X[:, None], y, groups, cps_a, cps_b


def test_two_group_cutpoint_recovery():
    X, y, groups, cps_a, cps_b = _two_scale_ordinal()
    fm = MyFMOrderedProbit(0, fit_w0=False)
    fm.fit(X, y, n_iter=100, n_kept_samples=60,
           cutpoint_groups=groups)

    assert fm.n_cutpoint_groups == 2
    # one accept counter per sampler (reference FMTrainer.hpp:83-85)
    assert len(fm.history_.n_mh_accept) == 2
    assert all(c > 0 for c in fm.history_.n_mh_accept)
    assert all(len(t) == 2 for t in fm.history_.n_mh_accept_trace)

    cut_a = fm.get_cutpoint_samples(0)
    cut_b = fm.get_cutpoint_samples(1)
    assert cut_a.shape[1] == 3 and cut_b.shape[1] == 2
    # each group's posterior concentrates near its own scale
    ma = cut_a[-20:].mean(axis=0)
    mb = cut_b[-20:].mean(axis=0)
    np.testing.assert_allclose(ma, cps_a, atol=0.3)
    np.testing.assert_allclose(mb, cps_b, atol=0.3)


def test_two_group_fast_path():
    """Categorical fast path with two cutpoint scales over relational
    one-hot blocks."""
    n, nu, ni = 1200, 40, 30
    rng = np.random.RandomState(5)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    score = (
        0.8 * rng.normal(size=nu)[u] + 0.8 * rng.normal(size=ni)[i]
    )
    even = np.arange(n) % 2 == 0
    y = np.zeros(n, dtype=np.int64)
    for cp in (-0.5, 0.5):
        y[even] += (score[even] > cp).astype(np.int64)  # K=3
    for cp in (0.0,):
        y[~even] += (score[~even] > cp).astype(np.int64)  # K=2
    groups = [
        (3, np.where(even)[0].tolist()),
        (2, np.where(~even)[0].tolist()),
    ]
    blocks = [
        RelationBlock(u, sps.identity(nu, format="csr")),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]
    fm = MyFMOrderedProbit(
        rank=2, random_seed=7, sweep_strategy="categorical"
    )
    fm.fit(None, y, X_rel=blocks, n_iter=30, n_kept_samples=20,
           cutpoint_groups=groups)

    assert fm.get_cutpoint_samples(0).shape == (20, 2)
    assert fm.get_cutpoint_samples(1).shape == (20, 1)
    assert len(fm.history_.n_mh_accept) == 2
    # cutpoints stay ordered within each group
    assert np.all(np.diff(fm.get_cutpoint_samples(0), axis=1) > 0)
    # predictions on a chosen group's scale
    assert fm.predict_proba(
        None, X_rel=blocks, cutpoint_index=1
    ).shape == (n, 2)
    assert fm.predict(
        None, X_rel=blocks, cutpoint_index=1
    ).max() <= 1


def test_single_group_explicit_equals_default():
    """An explicit all-rows group is the identity encoding: the chain
    must be bit-identical to the default fit."""
    X, y = _simple_ordinal()
    fm1 = MyFMOrderedProbit(2, random_seed=11)
    fm1.fit(X, y, n_iter=12, n_kept_samples=8)
    fm2 = MyFMOrderedProbit(2, random_seed=11)
    fm2.fit(X, y, n_iter=12, n_kept_samples=8,
            cutpoint_groups=[(int(y.max()) + 1,
                              list(range(y.shape[0])))])
    for a, b in zip(fm1.predictor_.samples, fm2.predictor_.samples):
        np.testing.assert_array_equal(a.V, b.V)
        np.testing.assert_array_equal(a.cutpoints[0], b.cutpoints[0])


def _simple_ordinal(n=300, seed=2):
    rng = np.random.RandomState(seed)
    X = rng.normal(0, 1, size=(n, 3))
    score = X @ np.array([0.5, -0.3, 0.2]) + 0.5 * rng.randn(n)
    y = np.digitize(score, [-0.5, 0.5]).astype(np.int64)
    return X, y


def test_group_validation_errors():
    X, y = _simple_ordinal()
    n = y.shape[0]
    fm = MyFMOrderedProbit(1)
    half = list(range(n // 2))
    rest = list(range(n // 2, n))
    with pytest.raises(ValueError, match="overlap"):
        fm.fit(X, y, n_iter=2,
               cutpoint_groups=[(3, half + [0]), (3, [0] + rest)])
    with pytest.raises(ValueError, match="cover every row"):
        fm.fit(X, y, n_iter=2, cutpoint_groups=[(3, half), (3, [])])
    with pytest.raises(ValueError, match="outside"):
        fm.fit(X, y, n_iter=2,
               cutpoint_groups=[(2, half), (3, rest)])
    # a SINGLE explicit group is validated too (not silently accepted)
    with pytest.raises(ValueError, match="cover every row"):
        fm.fit(X, y, n_iter=2, cutpoint_groups=[(3, half)])
    with pytest.raises(ValueError, match="outside"):
        fm.fit(X, y, n_iter=2,
               cutpoint_groups=[(2, list(range(n)))])


def test_two_group_sharded_equals_single_chip():
    """Multi-group oprobit under fit(..., n_devices=2): the class-offset
    encoding plus per-group global MH decisions must reproduce the
    single-chip chain sample-for-sample (fast path, f64)."""
    n, nu, ni = 402, 24, 16  # non-divisible rows -> SPMD padding
    rng = np.random.RandomState(9)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    score = (
        0.8 * rng.normal(size=nu)[u] + 0.8 * rng.normal(size=ni)[i]
    )
    even = np.arange(n) % 2 == 0
    y = np.zeros(n, dtype=np.int64)
    for cp in (-0.5, 0.5):
        y[even] += (score[even] > cp).astype(np.int64)  # K=3
    for cp in (0.0,):
        y[~even] += (score[~even] > cp).astype(np.int64)  # K=2
    groups = [
        (3, np.where(even)[0].tolist()),
        (2, np.where(~even)[0].tolist()),
    ]
    blocks = [
        RelationBlock(u, sps.identity(nu, format="csr")),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]

    fits = {}
    for n_dev in (1, 2):
        fm = MyFMOrderedProbit(
            rank=2, random_seed=7, dtype=np.float64,
            n_devices=(None if n_dev == 1 else n_dev),
        )
        fm.fit(None, y, X_rel=blocks, n_iter=8, n_kept_samples=8,
               cutpoint_groups=groups)
        fits[n_dev] = fm

    a, b = fits[1], fits[2]
    assert len(b.history_.n_mh_accept) == 2
    np.testing.assert_array_equal(
        np.asarray(a.history_.n_mh_accept),
        np.asarray(b.history_.n_mh_accept),
    )
    for g in (0, 1):
        np.testing.assert_allclose(
            a.get_cutpoint_samples(g), b.get_cutpoint_samples(g),
            rtol=1e-8, atol=1e-10,
        )
    for s1, s2 in zip(a.predictor_.samples, b.predictor_.samples):
        np.testing.assert_allclose(s1.V, s2.V, rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(s1.w, s2.w, rtol=1e-7, atol=1e-10)

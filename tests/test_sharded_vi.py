"""Multi-chip CAVI parity: the sharded variational fit must reproduce
the single-chip fit exactly (CAVI is deterministic — per-table partial
Grams psum/psum_scatter to the global statistics, then every device
performs the identical coordinate updates; the only slack is float
reassociation of the reduced partials, ~1e-12 in f64)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
from jax.sharding import Mesh

from myfm_tpu import (
    RelationBlock,
    VariationalFMClassifier,
    VariationalFMRegressor,
)


def _make_problem(seed=0, n=401, nu=23, ni=17, noise=0.3):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    fu = rng.normal(size=(nu, 2)) * 0.7
    fi = rng.normal(size=(ni, 2)) * 0.7
    score = (
        0.4 * rng.normal(size=nu)[u]
        + 0.4 * rng.normal(size=ni)[i]
        + (fu[u] * fi[i]).sum(axis=1)
    )
    y = score + noise * rng.normal(size=n)
    blocks = [
        RelationBlock(u, sps.identity(nu, format="csr")),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]
    return blocks, y, score


def _assert_fit_equal(fm1, fm2):
    a = fm1.predictor_.samples[0]
    b = fm2.predictor_.samples[0]
    np.testing.assert_allclose(a.w0, b.w0, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(a.w, b.w, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(a.V, b.V, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(a.w_var, b.w_var, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(a.V_var, b.V_var, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        fm1.history_.elbos, fm2.history_.elbos, rtol=1e-7
    )


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_vi_regression_parity(n_dev):
    # n=401 rows and entity counts NOT divisible by the mesh:
    # exercises SPMD row padding + the psum (non-reduce-scatter) Gram
    # reduction fallback
    blocks, y, _ = _make_problem(seed=5, n=401, nu=23, ni=17)

    fm1 = VariationalFMRegressor(
        rank=2, random_seed=9, dtype=np.float64
    ).fit(None, y, X_rel=blocks, n_iter=8)
    fm2 = VariationalFMRegressor(
        rank=2, random_seed=9, dtype=np.float64, n_devices=n_dev
    ).fit(None, y, X_rel=blocks, n_iter=8)

    _assert_fit_equal(fm1, fm2)
    p1 = fm1.predict(None, X_rel=blocks)
    p2 = fm2.predict(None, X_rel=blocks)
    np.testing.assert_allclose(p1, p2, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_vi_reduce_scatter_parity(n_dev):
    """Entity counts divisible by the mesh -> each table's [B, D, D]
    Gram is psum_scatter'd by entity window and only the [Bw(,R)]
    update results are all-gathered; the fit must still equal
    single-chip exactly."""
    blocks, y, _ = _make_problem(seed=7, n=555, nu=24, ni=16)

    fm1 = VariationalFMRegressor(
        rank=3, random_seed=3, dtype=np.float64
    ).fit(None, y, X_rel=blocks, n_iter=8)
    fm2 = VariationalFMRegressor(
        rank=3, random_seed=3, dtype=np.float64, n_devices=n_dev
    ).fit(None, y, X_rel=blocks, n_iter=8)
    _assert_fit_equal(fm1, fm2)


@pytest.mark.parametrize("n_dev", [2])
def test_sharded_vi_classification_parity(n_dev):
    """Probit CAVI under SPMD: pad rows must not leak truncated-normal
    moments into (Σe, Σe², e_var_sum, ELBO)."""
    blocks, _, score = _make_problem(seed=11, n=403)
    y = np.where(score > 0, 1.0, -1.0)

    fm1 = VariationalFMClassifier(
        rank=2, random_seed=4, dtype=np.float64
    ).fit(None, (y > 0), X_rel=blocks, n_iter=8)
    fm2 = VariationalFMClassifier(
        rank=2, random_seed=4, dtype=np.float64, n_devices=n_dev
    ).fit(None, (y > 0), X_rel=blocks, n_iter=8)

    _assert_fit_equal(fm1, fm2)
    p1 = fm1.predict_proba(None, X_rel=blocks)
    p2 = fm2.predict_proba(None, X_rel=blocks)
    np.testing.assert_allclose(p1, p2, rtol=1e-7, atol=1e-9)


def test_sharded_vi_callback_and_errors():
    """Estimator surface on the sharded fit: callbacks fire per
    iteration with the ELBO trace; non-categorical designs raise a
    clear error instead of silently training single-chip."""
    blocks, y, _ = _make_problem(seed=13, n=202)

    seen = []

    def cb(it, vfm, hyper, hist):
        seen.append((it, len(hist.elbos)))
        return False, ""

    fm = VariationalFMRegressor(
        rank=2, random_seed=1, dtype=np.float64, n_devices=2
    ).fit(None, y, X_rel=blocks, n_iter=5, callback=cb)
    assert seen == [(i, i + 1) for i in range(5)]
    elbos = fm.history_.elbos
    assert len(elbos) == 5
    # CAVI on a fixed design: ELBO must be monotone non-decreasing
    assert all(b >= a - 1e-7 for a, b in zip(elbos, elbos[1:]))

    # dense (non-categorical) design: multi-chip VI raises
    X = sps.csr_matrix(np.random.RandomState(0).rand(50, 4))
    with pytest.raises(ValueError):
        VariationalFMRegressor(
            rank=2, random_seed=1, n_devices=2
        ).fit(X, np.random.RandomState(1).rand(50), n_iter=2)

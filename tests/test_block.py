"""Blocked ≡ flattened parity — the core RelationBlock contract.

Reference: tests/regression/test_block.py:80-149 and
doc/source/relation-blocks.rst:205-211 — training with RelationBlocks
must produce the *same* samples as training on the expanded matrix.
"""

import pickle

import numpy as np
import pytest
import scipy.sparse as sps

from myfm_tpu import (
    MyFMGibbsClassifier,
    MyFMGibbsRegressor,
    RelationBlock,
)

from .oracle import expand_blocks


def _make_relational_problem(seed=0, n_rows=400, n_users=23, n_items=17):
    """User/item one-hot blocks + per-entity side features + a small
    main table — the canonical collaborative-filtering layout."""
    rng = np.random.RandomState(seed)
    user_of_row = rng.randint(0, n_users, size=n_rows)
    item_of_row = rng.randint(0, n_items, size=n_rows)

    def onehot_plus_side(n, n_side):
        eye = sps.identity(n, format="csr")
        side = sps.csr_matrix(
            (rng.random((n, n_side)) > 0.5) * rng.normal(size=(n, n_side))
        )
        return sps.hstack([eye, side]).tocsr()

    user_X = onehot_plus_side(n_users, 3)
    item_X = onehot_plus_side(n_items, 2)
    blocks = [
        RelationBlock(user_of_row, user_X),
        RelationBlock(item_of_row, item_X),
    ]
    X_main = sps.csr_matrix(
        (rng.random((n_rows, 2)) > 0.7) * rng.normal(size=(n_rows, 2))
    )
    w_true = rng.normal(size=X_main.shape[1])
    score = (
        X_main @ w_true
        + rng.normal(size=n_users)[user_of_row]
        + rng.normal(size=n_items)[item_of_row]
    )
    y = score + 0.3 * rng.normal(size=n_rows)
    return X_main, blocks, y


@pytest.mark.parametrize(
    "strategy,max_unrolled",
    [("auto", 16), ("serial", 16), ("auto", 0), ("serial", 0)],
)
def test_blocked_equals_flattened_regression(strategy, max_unrolled):
    # max_unrolled=0 forces every color through the ColorStack scans
    # (incl. the incremental block-aggregate path of _w_block_stack /
    # _V_block_stack), checked here against the flattened main-table
    # path which computes the same conditionals independently.
    X_main, blocks, y = _make_relational_problem()
    X_flat = expand_blocks(X_main, blocks)

    kwargs = dict(
        rank=2, random_seed=3, dtype=np.float64, sweep_strategy=strategy,
        max_unrolled_colors=max_unrolled,
    )
    fm_blocked = MyFMGibbsRegressor(**kwargs).fit(
        X_main, y, X_rel=blocks, n_iter=12, n_kept_samples=12
    )
    fm_flat = MyFMGibbsRegressor(**kwargs).fit(
        X_flat, y, n_iter=12, n_kept_samples=12
    )

    np.testing.assert_allclose(
        fm_blocked.w0_samples, fm_flat.w0_samples, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        fm_blocked.w_samples, fm_flat.w_samples, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        fm_blocked.V_samples, fm_flat.V_samples, rtol=1e-6, atol=1e-8
    )

    # blocked predict == flattened predict (test_block.py:147-149),
    # including the n_workers code path.
    p_blocked = fm_blocked.predict(X_main, blocks)
    p_flat = fm_flat.predict(X_flat)
    np.testing.assert_allclose(p_blocked, p_flat, rtol=1e-6, atol=1e-8)
    p_workers = fm_blocked.predict(X_main, blocks, n_workers=2)
    np.testing.assert_allclose(p_blocked, p_workers, rtol=1e-12)


def test_blocked_equals_flattened_classification():
    X_main, blocks, y_cont = _make_relational_problem(seed=7)
    y = (y_cont > np.median(y_cont)).astype(np.int64)
    X_flat = expand_blocks(X_main, blocks)
    kwargs = dict(rank=2, random_seed=5, dtype=np.float64)
    fm_blocked = MyFMGibbsClassifier(**kwargs).fit(
        X_main, y, X_rel=blocks, n_iter=10, n_kept_samples=10
    )
    fm_flat = MyFMGibbsClassifier(**kwargs).fit(
        X_flat, y, n_iter=10, n_kept_samples=10
    )
    np.testing.assert_allclose(
        fm_blocked.V_samples, fm_flat.V_samples, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        fm_blocked.predict_proba(X_main, blocks),
        fm_flat.predict_proba(X_flat),
        rtol=1e-6,
        atol=1e-8,
    )


def test_pure_relational_input():
    """X=None with only blocks (reference base.py:229-234)."""
    X_main, blocks, y = _make_relational_problem(seed=9)
    fm = MyFMGibbsRegressor(rank=2).fit(
        None, y, X_rel=blocks, n_iter=8, n_kept_samples=4
    )
    pred = fm.predict(None, blocks)
    assert pred.shape == y.shape
    assert np.isfinite(pred).all()


def test_pickle_roundtrip(tmp_path):
    """Serialization round-trips (reference test_block.py:50-77,141-149)."""
    X_main, blocks, y = _make_relational_problem(seed=11)
    fm = MyFMGibbsRegressor(rank=2, random_seed=1).fit(
        X_main, y, X_rel=blocks, n_iter=8, n_kept_samples=4
    )
    pred_before = fm.predict(X_main, blocks)

    blob = pickle.dumps([fm, blocks])
    fm2, blocks2 = pickle.loads(blob)
    pred_after = fm2.predict(X_main, blocks2)
    np.testing.assert_allclose(pred_before, pred_after, rtol=1e-6)

    path = tmp_path / "model.pkl"
    with open(path, "wb") as f:
        pickle.dump(fm.predictor_, f)
    with open(path, "rb") as f:
        predictor = pickle.load(f)
    np.testing.assert_allclose(
        predictor.predict(X_main, blocks), pred_before, rtol=1e-6
    )


def test_grouping_affects_hyperpriors(stub_weight):
    """Two groups with very different weight scales should learn very
    different per-group lambda_w (the point of feature grouping)."""
    from .conftest import make_sparse_data

    rng = np.random.RandomState(0)
    n = 800
    X_a, _ = make_sparse_data(n, stub_weight, seed=1)
    X_b, _ = make_sparse_data(n, stub_weight, seed=2)
    big_w = np.array([5.0, -5.0, 4.0])
    small_w = np.array([0.01, -0.02, 0.015])
    X = sps.hstack([X_a, X_b]).tocsr()
    y = X_a @ big_w + X_b @ small_w + 0.1 * rng.normal(size=n)

    fm = MyFMGibbsRegressor(rank=0, random_seed=0).fit(
        X, y, group_shapes=[3, 3], n_iter=40, n_kept_samples=20
    )
    assert fm.n_groups_ == 2
    trace = fm.get_hyper_trace()
    lam0 = trace["lambda_w[0]"].iloc[-10:].mean()
    lam1 = trace["lambda_w[1]"].iloc[-10:].mean()
    # group 1 (tiny weights) should have far larger precision
    assert lam1 > lam0 * 10
    # trace has the full column set
    assert "mu_w[1]" in trace.columns

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from myfm_tpu.containers import fm_predict_score_numpy
from myfm_tpu.design import compile_design, greedy_color
from myfm_tpu.ops.forward import predict_score
from myfm_tpu.relational import RelationBlock

from .conftest import make_sparse_data
from .oracle import expand_blocks, fm_oracle_score, FMWeights


def test_forward_matches_oracle(middle_data, stub_weight):
    X, score = middle_data
    plan = compile_design(X, dtype=np.float32)
    got = predict_score(
        plan,
        jnp.asarray(stub_weight.w0, jnp.float32),
        jnp.asarray(stub_weight.w, jnp.float32),
        jnp.asarray(stub_weight.V, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), score, rtol=2e-4, atol=2e-4)


def test_forward_numpy_matches_oracle(middle_data, stub_weight):
    X, score = middle_data
    got = fm_predict_score_numpy(
        stub_weight.w0, stub_weight.w, stub_weight.V, X
    )
    np.testing.assert_allclose(got, score, rtol=1e-10)


def test_forward_with_blocks_matches_flattened(stub_weight):
    rng = np.random.RandomState(42)
    n_rows, n_units, fb = 200, 17, 5
    mapper = rng.randint(0, n_units, size=n_rows)
    block_X = sps.csr_matrix(
        (rng.random((n_units, fb)) > 0.6) * rng.normal(size=(n_units, fb))
    )
    block = RelationBlock(mapper, block_X)
    X_main, _ = make_sparse_data(n_rows, stub_weight, seed=3)

    F = X_main.shape[1] + fb
    rank = 3
    w = rng.normal(size=F)
    V = rng.normal(size=(F, rank))
    w0 = 0.7

    flat = expand_blocks(X_main, [block])
    want = fm_oracle_score(flat, FMWeights(w0, w, V))

    plan = compile_design(X_main, [block], dtype=np.float32)
    got = predict_score(
        plan,
        jnp.asarray(w0, jnp.float32),
        jnp.asarray(w, jnp.float32),
        jnp.asarray(V, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    got_np = fm_predict_score_numpy(w0, w, V, X_main, [block])
    np.testing.assert_allclose(got_np, want, rtol=1e-10)


def test_block_only_forward(stub_weight):
    """X=None with pure relational input (reference base.py:229-234)."""
    rng = np.random.RandomState(0)
    n_rows, n_units, fb = 50, 7, 4
    mapper = rng.randint(0, n_units, size=n_rows)
    block = RelationBlock(
        mapper, sps.csr_matrix(rng.normal(size=(n_units, fb)))
    )
    w = rng.normal(size=fb)
    V = rng.normal(size=(fb, 2))
    flat = expand_blocks(None, [block])
    want = fm_oracle_score(flat, FMWeights(0.1, w, V))
    plan = compile_design(None, [block], dtype=np.float32)
    got = predict_score(
        plan,
        jnp.asarray(0.1, jnp.float32),
        jnp.asarray(w, jnp.float32),
        jnp.asarray(V, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_greedy_color_valid(middle_data):
    X, _ = middle_data
    csc = X.tocsc()
    colors = greedy_color(csc)
    seen = set()
    for feats in colors:
        rows_used = set()
        for f in feats:
            assert f not in seen
            seen.add(f)
            rows = set(csc.indices[csc.indptr[f] : csc.indptr[f + 1]])
            assert not (rows & rows_used), "color has row conflict"
            rows_used |= rows
    assert len(seen) == X.shape[1]


def test_greedy_color_onehot_single_color():
    # A one-hot group must collapse to a single color.
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 20, size=500)
    X = sps.csr_matrix(
        (np.ones(500), (np.arange(500), ids)), shape=(500, 20)
    )
    colors = greedy_color(X.tocsc())
    assert len(colors) == 1


def test_relation_block_validation():
    with pytest.raises(ValueError):
        RelationBlock([0, 5], sps.csr_matrix(np.eye(3)))
    b = RelationBlock([0, 2, 1], sps.csr_matrix(np.eye(3)))
    assert b.mapper_size == 3
    assert b.block_size == 3
    assert b.feature_size == 3

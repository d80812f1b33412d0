"""Engine auto-dispatch resolution (VERDICT r2 item 5).

The reference's user experience is fallback-free: every documented
config runs on its fast engine (relation-blocks.rst:199 measures the
20 it/s contract on the blocked path, ml-10m-regression.py defaults to
rank 128).  These tests pin the rebuild's equivalent promise — `auto`
never resolves to the chromatic `colored` fallback for any
reference-doc design at any rank <= 128 — via the single-source-of-
truth gates (design.joint_auto_candidate / joint_auto_eligible) at the
real ML-100k scale, and end-to-end via the new
``LearningHistory.engine`` witness at test scale.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
))


@pytest.fixture(scope="module")
def ml100k_timesvdpp():
    from ml_features import build_feature_blocks, load_movielens

    df_tr, df_te = load_movielens("100k", 0, synthetic=True)
    X, _, blocks, _, grouping = build_feature_blocks(
        df_tr, df_te, "timesvdpp_flipped"
    )
    return X, blocks, np.asarray(grouping, dtype=np.int32)


@pytest.mark.parametrize("rank", [8, 10, 32, 64, 128])
def test_timesvdpp_100k_candidate_all_ranks(ml100k_timesvdpp, rank):
    """The reference's headline config (relation-blocks.rst:161-199)
    must pass the pre-compile auto->joint gate at every rank up to the
    ml-10m flagship default of 128."""
    from myfm_tpu.design import joint_auto_candidate

    _, _, grouping = ml100k_timesvdpp
    assert joint_auto_candidate(rank, True, np.float32, grouping)


@pytest.mark.parametrize("rank", [10, 128])
def test_timesvdpp_100k_eligible_post_compile(ml100k_timesvdpp, rank):
    """Post-compile: the dense color machinery fits the budget, so
    auto upgrades to the joint engine (no silent colored fallback)."""
    from myfm_tpu.design import compile_design, joint_auto_eligible

    X, blocks, grouping = ml100k_timesvdpp
    plan = compile_design(
        X, blocks, grouping=grouping, dtype=np.float32,
        for_training=True, joint_dense=True, joint_rank=rank,
    )
    assert joint_auto_eligible(plan, rank, np.float32)


def _onehot_problem(n_rows=600, n_u=40, n_i=25, seed=0):
    import scipy.sparse as sps

    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_u, n_rows)
    i = rng.randint(0, n_i, n_rows)
    rows = np.arange(n_rows)
    X = sps.hstack(
        [
            sps.csr_matrix(
                (np.ones(n_rows), (rows, u)), shape=(n_rows, n_u)
            ),
            sps.csr_matrix(
                (np.ones(n_rows), (rows, i)), shape=(n_rows, n_i)
            ),
        ],
        format="csr",
    )
    y = (
        3.0
        + rng.normal(size=n_u)[u]
        + rng.normal(size=n_i)[i]
        + 0.3 * rng.normal(size=n_rows)
    )
    return X, y, [n_u, n_i]


def test_plain_onehot_resolves_fastpath():
    """README.md:115-121 config shape (pure one-hot user+item main
    table): auto must land on the entity-space fast path, witnessed by
    the new LearningHistory.engine field."""
    from myfm_tpu import MyFMGibbsRegressor

    X, y, shapes = _onehot_problem()
    fm = MyFMGibbsRegressor(rank=2, random_seed=3).fit(
        X, y, n_iter=3, n_kept_samples=2, group_shapes=shapes,
    )
    assert fm.history_.engine == "fastpath"


def test_vi_plain_onehot_resolves_fastpath():
    from myfm_tpu import VariationalFMRegressor

    X, y, shapes = _onehot_problem()
    vfm = VariationalFMRegressor(rank=2, random_seed=3).fit(
        X, y, n_iter=3, group_shapes=shapes,
    )
    assert vfm.history_.engine == "fastpath"


def test_vi_tiny_timesvdpp_resolves_ea_fastpath():
    """Entity+attribute VI dispatch end-to-end (VERDICT r3 item 8):
    VariationalFMRegressor on the multi-hot blocked timesvdpp design
    must resolve to the EA fast path through the rank=3R-then-4R
    fallback chain (variational.py:124-150), witnessed by the history
    engine field — never the staged colored path."""
    from ml_features import build_feature_blocks, load_movielens

    from myfm_tpu import VariationalFMRegressor

    df_tr, df_te = load_movielens("tiny", 0, synthetic=True)
    X, _, blocks, _, grouping = build_feature_blocks(
        df_tr, df_te, "timesvdpp_flipped"
    )
    y = df_tr.rating.values.astype(np.float64)
    vfm = VariationalFMRegressor(
        rank=4, random_seed=3, dtype=np.float32
    ).fit(X, y, X_rel=blocks, n_iter=2, grouping=grouping)
    assert vfm.history_.engine == "fastpath"


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_tiny_timesvdpp_never_colored(dtype):
    """Multi-hot blocked design at test scale: groups are too small
    for the f32 joint gate, but the entity+attribute fast path (or,
    for f64, the joint upgrade) must catch it — auto never falls to
    the chromatic engine for the reference's blocked configs."""
    from ml_features import build_feature_blocks, load_movielens

    from myfm_tpu import MyFMGibbsRegressor

    df_tr, df_te = load_movielens("tiny", 0, synthetic=True)
    X, _, blocks, _, grouping = build_feature_blocks(
        df_tr, df_te, "timesvdpp_flipped"
    )
    y = df_tr.rating.values.astype(np.float64)
    fm = MyFMGibbsRegressor(rank=10, random_seed=3, dtype=dtype).fit(
        X, y, X_rel=blocks, n_iter=2, n_kept_samples=1,
        grouping=grouping,
    )
    assert fm.history_.engine in ("fastpath", "joint")


def test_auto_prefers_joint_for_long_chains_at_small_scale():
    """Round-5 rule: at <= 500k rows with n_iter >= 200 and the joint
    candidate gates open, "auto" resolves to the joint engine (its
    ~25 it/s steady beats the fast path's ~11 it/s once the one-time
    plan build amortizes — measured on ML-100k timesvdpp); short
    chains keep the fast path (lower setup wall)."""
    from ml_features import build_feature_blocks, load_movielens

    from myfm_tpu import MyFMGibbsRegressor

    df_tr, df_te = load_movielens("tiny", 0, synthetic=True)
    X, _, blocks, _, grouping = build_feature_blocks(
        df_tr, df_te, "timesvdpp_flipped"
    )
    y = df_tr.rating.values.astype(np.float64)
    # f64: the joint candidate gate is open at any group size
    short = MyFMGibbsRegressor(
        rank=4, random_seed=3, dtype=np.float64
    ).fit(X, y, X_rel=blocks, n_iter=3, n_kept_samples=1,
          grouping=grouping)
    assert short.history_.engine == "fastpath"
    long = MyFMGibbsRegressor(
        rank=4, random_seed=3, dtype=np.float64
    ).fit(X, y, X_rel=blocks, n_iter=200, n_kept_samples=1,
          grouping=grouping)
    assert long.history_.engine == "joint"

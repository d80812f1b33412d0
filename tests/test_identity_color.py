"""Identity-color split of the joint sweep: single-entry features
(one-hot id columns in block space) drawn straight off the Gram must
reproduce the one-hot-machinery draws bit-for-bit (same color ⇒
row-disjoint ⇒ disjoint Gram lanes)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax

import myfm_tpu.design as design_mod
from myfm_tpu import MyFMGibbsRegressor, RelationBlock
from myfm_tpu.design import compile_design
from myfm_tpu.ops.gibbs import GibbsConfig
from myfm_tpu.trainer import GibbsTrainer


def _problem(seed=11, n=500, nu=30, ni=20):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    imp = sps.csr_matrix(
        (rng.random((nu, ni)) > 0.65).astype(np.float64)
    )
    blocks = [
        RelationBlock(u, sps.hstack(
            [sps.identity(nu, format="csr"), imp], format="csr"
        )),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]
    y = (
        rng.normal(size=nu)[u] + rng.normal(size=ni)[i]
        + 0.3 * rng.normal(size=n)
    )
    return blocks, y


def _run_chain(plan, y, n_sweeps=6, rank=3):
    cfg = GibbsConfig(task="regression", joint_rows=True)
    tr = GibbsTrainer(plan, y, cfg, rank, 0.1, 33, np.float64)
    master = jax.random.PRNGKey(7)
    st = tr._initialize(jax.random.fold_in(master, 0))
    for it in range(n_sweeps):
        st = tr._sweep(
            plan, st, tr.y, jax.random.fold_in(master, 1 + it), tr.cfg
        )
    return st


def test_identity_split_matches_onehot_bitwise(monkeypatch):
    blocks, y = _problem()
    compile_kwargs = dict(
        grouping=None, dtype=np.float64, for_training=True,
        joint_dense=True,
    )
    # split disabled: threshold above any color size
    monkeypatch.setattr(design_mod, "IDENTITY_SPLIT_MIN", 10**9)
    plan_off = compile_design(None, blocks, **compile_kwargs)
    assert all(
        dc.id_feat is None
        for b in plan_off.blocks for dc in b.dense_colors
    )
    # split enabled aggressively
    monkeypatch.setattr(design_mod, "IDENTITY_SPLIT_MIN", 1)
    plan_on = compile_design(None, blocks, **compile_kwargs)
    assert any(
        dc.id_feat is not None
        for b in plan_on.blocks for dc in b.dense_colors
    )

    st_off = _run_chain(plan_off, y)
    st_on = _run_chain(plan_on, y)
    # identical chains: the identity draws consume the same per-feature
    # noise and read/update disjoint Gram lanes from the rest draws
    np.testing.assert_allclose(
        np.asarray(st_on.V), np.asarray(st_off.V),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(st_on.w), np.asarray(st_off.w),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(st_on.e), np.asarray(st_off.e),
        rtol=1e-9, atol=1e-11,
    )


def test_identity_split_estimator_blocked_equals_flattened(monkeypatch):
    """The prized invariant survives the split: blocked (identity
    split active) ≡ flattened (colored main-table path)."""
    from tests.test_block import expand_blocks  # local helper

    monkeypatch.setattr(design_mod, "IDENTITY_SPLIT_MIN", 1)
    blocks, y = _problem(seed=4, n=300, nu=18, ni=12)
    X_flat = expand_blocks(None, blocks)
    kwargs = dict(
        rank=2, random_seed=19, dtype=np.float64,
        sweep_strategy="joint",
    )
    fm_blocked = MyFMGibbsRegressor(**kwargs).fit(
        None, y, X_rel=blocks, n_iter=8, n_kept_samples=8
    )
    fm_flat = MyFMGibbsRegressor(**kwargs).fit(
        X_flat, y, n_iter=8, n_kept_samples=8
    )
    np.testing.assert_allclose(
        fm_blocked.V_samples, fm_flat.V_samples, rtol=1e-6, atol=1e-8
    )

"""Joint-row blocked Gibbs (sweep_strategy="joint").

The FM score is exactly linear in one feature's factor row given all
other weights, so p(V_j,: | rest) is an R-dim Gaussian (see
ops/gibbs.py sweep_V_joint).  Tests: the batched Cholesky draw against
a per-feature numpy oracle; the blocked ≡ flattened contract under the
joint sweep (incl. forced ColorStack scans, which also exercises the
incremental [B,R,R] aggregate recurrences); posterior concentration.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from myfm_tpu import MyFMGibbsRegressor
from myfm_tpu.design import ColorPlan
from myfm_tpu.ops.gibbs import _V_joint_color_main

from .oracle import expand_blocks
from .test_block import _make_relational_problem


def _random_color(rng, n_rows=48, n_feat=5, entries_per_feat=6, rank=3):
    """A handmade row-disjoint feature set with its entry arrays."""
    perm = rng.permutation(n_rows)[: n_feat * entries_per_feat]
    rows = np.sort(perm.reshape(n_feat, entries_per_feat), axis=1)
    seg = np.repeat(np.arange(n_feat), entries_per_feat)
    vals = rng.normal(size=n_feat * entries_per_feat) + 2.0
    feat = rng.permutation(12)[:n_feat]
    return rows.ravel(), vals, seg, feat


def _oracle_joint_main(rows, vals, seg, feat, e, q, V, alpha, lam_g,
                       mu_g, noise, g):
    e, q, V = e.copy(), q.copy(), V.copy()
    for s_idx, j in enumerate(feat):
        idx = np.where(seg == s_idx)[0]
        x = vals[idx]
        rr = rows[idx]
        phi = q[rr] - x[:, None] * V[j]
        S = np.einsum("n,nf,ng->fg", x * x, phi, phi)
        lam = lam_g[g[j]]
        mu = mu_g[g[j]]
        A = alpha * S + np.diag(lam)
        rhs = alpha * (
            S @ V[j] - np.einsum("n,n,nf->f", x, e[rr], phi)
        ) + lam * mu
        L = np.linalg.cholesky(A)
        mean = np.linalg.solve(A, rhs)
        v_new = mean + np.linalg.solve(L.T, noise[j])
        delta = v_new - V[j]
        e[rr] += (phi * delta).sum(axis=1) * x
        q[rr] += np.outer(x, delta)
        V[j] = v_new
    return e, q, V


def test_joint_color_main_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    n, F, G, R = 48, 12, 3, 3
    rows, vals, seg, feat = _random_color(rng, n_rows=n, rank=R)
    e = rng.normal(size=n)
    q = rng.normal(size=(n, R))
    V = rng.normal(size=(F, R))
    alpha = 1.7
    lam_g = rng.gamma(2.0, 1.0, size=(G, R))
    mu_g = rng.normal(size=(G, R))
    noise = rng.normal(size=(F, R))
    g = rng.randint(0, G, size=F)

    c = ColorPlan(
        rows=jnp.asarray(rows, jnp.int32),
        vals=jnp.asarray(vals),
        seg=jnp.asarray(seg, jnp.int32),
        feat=jnp.asarray(feat, jnp.int32),
        sx2=jnp.zeros(len(feat)),
    )
    e2, q2, V2 = _V_joint_color_main(
        c, jnp.asarray(e), jnp.asarray(q), jnp.asarray(V),
        jnp.asarray(alpha), jnp.asarray(lam_g), jnp.asarray(mu_g),
        jnp.asarray(noise), jnp.asarray(g, jnp.int32),
    )
    e_o, q_o, V_o = _oracle_joint_main(
        rows, vals, seg, feat, e, q, V, alpha, lam_g, mu_g, noise, g
    )
    np.testing.assert_allclose(np.asarray(V2), V_o, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(e2), e_o, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(q2), q_o, rtol=1e-9)


def _oracle_joint_u_main(rows, vals, seg, feat, e, q, w, V, alpha,
                         lam_w, mu_w, lam_g, mu_g, noise, g):
    """Serial numpy oracle of the merged (R+1)-dim [w_j | V_j] draw."""
    e, q, w, V = e.copy(), q.copy(), w.copy(), V.copy()
    for s_idx, j in enumerate(feat):
        idx = np.where(seg == s_idx)[0]
        x = vals[idx]
        rr = rows[idx]
        phi = q[rr] - x[:, None] * V[j]
        psi = x[:, None] * np.concatenate(
            [np.ones((len(idx), 1)), phi], axis=1
        )
        S = np.einsum("nf,ng->fg", psi, psi)
        lam = np.concatenate([[lam_w[g[j]]], lam_g[g[j]]])
        mu = np.concatenate([[mu_w[g[j]]], mu_g[g[j]]])
        u_old = np.concatenate([[w[j]], V[j]])
        A = alpha * S + np.diag(lam)
        rhs = alpha * (S @ u_old - psi.T @ e[rr]) + lam * mu
        L = np.linalg.cholesky(A)
        u_new = np.linalg.solve(A, rhs) + np.linalg.solve(
            L.T, noise[j]
        )
        delta = u_new - u_old
        e[rr] += psi @ delta
        q[rr] += np.outer(x, delta[1:])
        w[j], V[j] = u_new[0], u_new[1:]
    return e, q, w, V


def test_joint_u_color_main_matches_numpy_oracle():
    from myfm_tpu.ops.joint import _joint_u_color_main

    rng = np.random.RandomState(2)
    n, F, G, R = 48, 12, 3, 3
    rows, vals, seg, feat = _random_color(rng, n_rows=n, rank=R)
    e = rng.normal(size=n)
    q = rng.normal(size=(n, R))
    w = rng.normal(size=F)
    V = rng.normal(size=(F, R))
    alpha = 1.3
    lam_w = rng.gamma(2.0, 1.0, size=G)
    mu_w = rng.normal(size=G)
    lam_g = rng.gamma(2.0, 1.0, size=(G, R))
    mu_g = rng.normal(size=(G, R))
    noise = rng.normal(size=(F, R + 1))
    g = rng.randint(0, G, size=F)

    c = ColorPlan(
        rows=jnp.asarray(rows, jnp.int32),
        vals=jnp.asarray(vals),
        seg=jnp.asarray(seg, jnp.int32),
        feat=jnp.asarray(feat, jnp.int32),
        sx2=jnp.zeros(len(feat)),
    )
    U = jnp.concatenate([jnp.asarray(w)[:, None], jnp.asarray(V)], 1)
    lam_gu = jnp.concatenate(
        [jnp.asarray(lam_w)[:, None], jnp.asarray(lam_g)], 1
    )
    mu_gu = jnp.concatenate(
        [jnp.asarray(mu_w)[:, None], jnp.asarray(mu_g)], 1
    )
    e2, q2, U2 = _joint_u_color_main(
        c, jnp.asarray(e), jnp.asarray(q), U, jnp.asarray(alpha),
        lam_gu, mu_gu, jnp.asarray(noise), jnp.asarray(g, jnp.int32),
    )
    e_o, q_o, w_o, V_o = _oracle_joint_u_main(
        rows, vals, seg, feat, e, q, w, V, alpha, lam_w, mu_w, lam_g,
        mu_g, noise, g,
    )
    np.testing.assert_allclose(np.asarray(U2[:, 0]), w_o, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(U2[:, 1:]), V_o, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(e2), e_o, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(q2), q_o, rtol=1e-9)


def test_unrolled_chol_solve_sample():
    """chol_solve_sample == dense numpy A^{-1}rhs + L^{-T}xi."""
    from myfm_tpu.ops.joint import chol_solve_sample

    rng = np.random.RandomState(7)
    B, D = 17, 6
    M = rng.normal(size=(B, D, D))
    A = np.einsum("bij,bkj->bik", M, M) + 3.0 * np.eye(D)
    rhs = rng.normal(size=(B, D))
    xi = rng.normal(size=(B, D))
    out = np.asarray(
        chol_solve_sample(
            jnp.asarray(A), jnp.asarray(rhs), jnp.asarray(xi)
        )
    )
    for b in range(B):
        L = np.linalg.cholesky(A[b])
        want = np.linalg.solve(A[b], rhs[b]) + np.linalg.solve(
            L.T, xi[b]
        )
        np.testing.assert_allclose(out[b], want, rtol=1e-9, atol=1e-10)


def test_solve_spd_sample_large_rank_linalg_branch():
    """D > 32 routes through batched linalg; same A^{-1}rhs + L^{-T}xi
    contract as the unrolled solver (the explicit sweep_strategy=
    "joint" carries no rank gate, so this branch is reachable from
    the estimators at rank >= 32)."""
    from myfm_tpu.ops.joint import solve_spd_sample

    rng = np.random.RandomState(3)
    B, D = 5, 40
    M = rng.normal(size=(B, D, D))
    A = np.einsum("bij,bkj->bik", M, M) + 5.0 * np.eye(D)
    lam = np.abs(rng.normal(size=(B, D))) + 0.5
    A = A + np.stack([np.diag(lp) for lp in lam])
    rhs = rng.normal(size=(B, D))
    xi = rng.normal(size=(B, D))
    out = np.asarray(
        solve_spd_sample(
            jnp.asarray(A), jnp.asarray(rhs), jnp.asarray(xi),
            jnp.asarray(lam),
        )
    )
    # the eps-scale lambda jitter perturbs the exact solve at ~1e-14
    for b in range(B):
        L = np.linalg.cholesky(A[b])
        want = np.linalg.solve(A[b], rhs[b]) + np.linalg.solve(
            L.T, xi[b]
        )
        np.testing.assert_allclose(out[b], want, rtol=1e-7, atol=1e-9)


def test_solve_spd_sample_rank_deficient_f32_stays_finite():
    """float32, S rank-deficient with alpha*||S|| >> lambda: computed
    Cholesky pivots go negative by ~eps*||A|| without the ridge and
    jnp.linalg.cholesky silently NaNs — the draw must stay finite and
    match a float64 solve in the data directions."""
    from myfm_tpu.ops.joint import solve_spd_sample

    rng = np.random.RandomState(9)
    B, D, k = 4, 40, 7  # S rank 7 << D
    M = rng.normal(size=(B, D, k))
    S = np.einsum("bij,bkj->bik", M, M)
    lam = np.full((B, D), 1e-3)
    A64 = 1e6 * S + np.stack([np.diag(lp) for lp in lam])
    rhs = (1e3 * rng.normal(size=(B, D))).astype(np.float32)
    xi = rng.normal(size=(B, D)).astype(np.float32)
    out = np.asarray(
        solve_spd_sample(
            jnp.asarray(A64, dtype=jnp.float32), jnp.asarray(rhs),
            jnp.asarray(xi), jnp.asarray(lam, dtype=jnp.float32),
        )
    )
    assert np.all(np.isfinite(out)), out
    # data-direction components must agree with the exact f64 solve
    # (null directions are prior-dominated draw noise, not comparable
    # at f32 absolute roundoff)
    for b in range(B):
        L = np.linalg.cholesky(A64[b])
        want = np.linalg.solve(A64[b], rhs[b]) + np.linalg.solve(
            L.T, xi[b]
        )
        U, sv, _ = np.linalg.svd(S[b])
        P_data = U[:, : np.sum(sv > 1e-8 * sv[0])]
        np.testing.assert_allclose(
            P_data.T @ out[b], P_data.T @ want, atol=5e-2
        )


def test_joint_large_rank_end_to_end():
    """Explicit sweep_strategy='joint' at rank 33 ((R+1)-dim draws hit
    the D>32 linalg branch) stays finite and fits a tiny problem."""
    rng = np.random.RandomState(11)
    n, F = 240, 12
    Xd = (rng.random((n, F)) > 0.6) * rng.normal(size=(n, F))
    X = sps.csr_matrix(Xd)
    w_true = rng.normal(size=F)
    y = Xd @ w_true + 0.1 * rng.normal(size=n)
    fm = MyFMGibbsRegressor(
        rank=33, random_seed=2, dtype=np.float64,
        sweep_strategy="joint",
    ).fit(X, y, n_iter=6, n_kept_samples=4)
    pred = fm.predict(X)
    assert np.all(np.isfinite(pred))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 1.5, rmse


@pytest.mark.parametrize("max_unrolled", [16, 0])
def test_joint_blocked_equals_flattened(max_unrolled):
    X_main, blocks, y = _make_relational_problem(seed=17)
    X_flat = expand_blocks(X_main, blocks)
    kwargs = dict(
        rank=3, random_seed=11, dtype=np.float64,
        sweep_strategy="joint", max_unrolled_colors=max_unrolled,
    )
    fm_blocked = MyFMGibbsRegressor(**kwargs).fit(
        X_main, y, X_rel=blocks, n_iter=10, n_kept_samples=10
    )
    fm_flat = MyFMGibbsRegressor(**kwargs).fit(
        X_flat, y, n_iter=10, n_kept_samples=10
    )
    np.testing.assert_allclose(
        fm_blocked.w_samples, fm_flat.w_samples, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        fm_blocked.V_samples, fm_flat.V_samples, rtol=1e-6, atol=1e-8
    )


def test_joint_posterior_concentration():
    """Chains from the joint blocking must concentrate on the same
    posterior as the reference-order sweep (valid Gibbs blocking)."""
    rng = np.random.RandomState(4)
    n, F, R = 900, 30, 2
    Xd = (rng.random((n, F)) > 0.82) * rng.normal(size=(n, F))
    X = sps.csr_matrix(Xd)
    V_true = rng.normal(size=(F, R)) * 0.6
    score = 0.5 * ((Xd @ V_true) ** 2 - (Xd**2) @ (V_true**2)).sum(
        axis=1
    )
    y = score + 0.1 * rng.normal(size=n)

    preds = {}
    for strategy in ("auto", "joint"):
        fm = MyFMGibbsRegressor(
            rank=R, random_seed=6, dtype=np.float64,
            sweep_strategy=strategy,
        ).fit(X, y, n_iter=60, n_kept_samples=40)
        preds[strategy] = fm.predict(X)
        rmse = float(np.sqrt(np.mean((preds[strategy] - score) ** 2)))
        assert rmse < 0.25, (strategy, rmse)
    # both samplers reconstruct the same ground-truth scores
    np.testing.assert_allclose(
        preds["joint"], preds["auto"], atol=0.35
    )


def test_unknown_sweep_strategy_rejected():
    with pytest.raises(ValueError, match="sweep_strategy"):
        MyFMGibbsRegressor(rank=2, sweep_strategy="jiont")


def test_auto_resolves_to_joint_within_gates():
    """'auto' runs the merged joint sweep on a relational design whose
    blocks fit the dense machinery (the reference's RelationBlock
    configs) — the default engine must be the measured-fast one —
    and the upgrade is gated off beyond JOINT_AUTO_MAX_RANK."""
    X_main, blocks, y = _make_relational_problem(seed=23)
    kwargs = dict(rank=3, random_seed=5, dtype=np.float64)
    fm_auto = MyFMGibbsRegressor(sweep_strategy="auto", **kwargs).fit(
        X_main, y, X_rel=blocks, n_iter=8, n_kept_samples=8
    )
    fm_joint = MyFMGibbsRegressor(
        sweep_strategy="joint", **kwargs
    ).fit(X_main, y, X_rel=blocks, n_iter=8, n_kept_samples=8)
    np.testing.assert_allclose(
        fm_auto.V_samples, fm_joint.V_samples, rtol=1e-9, atol=1e-12
    )

    # beyond the rank gate "auto" stays chromatic
    from myfm_tpu.design import JOINT_AUTO_MAX_RANK

    big = JOINT_AUTO_MAX_RANK + 1
    kwargs_big = dict(rank=big, random_seed=5, dtype=np.float64)
    fm_auto_big = MyFMGibbsRegressor(
        sweep_strategy="auto", **kwargs_big
    ).fit(X_main, y, X_rel=blocks, n_iter=4, n_kept_samples=4)
    fm_colored_big = MyFMGibbsRegressor(
        sweep_strategy="colored", **kwargs_big
    ).fit(X_main, y, X_rel=blocks, n_iter=4, n_kept_samples=4)
    np.testing.assert_allclose(
        fm_auto_big.V_samples, fm_colored_big.V_samples,
        rtol=1e-9, atol=1e-12,
    )


def test_auto_resolves_to_joint_mid_rank():
    """Round-3 gate raise (JOINT_AUTO_MAX_RANK 16 → 128): 'auto' must
    take the joint engine — not the ~10-25× slower chromatic fallback —
    for relational designs at ranks the reference supports, including
    the D > 32 batched-linalg solver tier.  Guards the round-2 cliff
    where any rank > 16 silently landed on colored (VERDICT r2 §5)."""
    from myfm_tpu.design import (
        JOINT_AUTO_MAX_RANK,
        JOINT_UNROLL_MAX_RANK,
    )

    assert JOINT_AUTO_MAX_RANK >= 128
    X_main, blocks, y = _make_relational_problem(seed=29)
    # rank 20: above the old gate, unrolled-solver tier trimmed head;
    # rank 33: the batched-linalg draw tier
    for rank in (JOINT_UNROLL_MAX_RANK + 4, 33):
        kwargs = dict(rank=rank, random_seed=7, dtype=np.float64)
        fm_auto = MyFMGibbsRegressor(
            sweep_strategy="auto", **kwargs
        ).fit(X_main, y, X_rel=blocks, n_iter=4, n_kept_samples=4)
        fm_joint = MyFMGibbsRegressor(
            sweep_strategy="joint", **kwargs
        ).fit(X_main, y, X_rel=blocks, n_iter=4, n_kept_samples=4)
        np.testing.assert_allclose(
            fm_auto.V_samples, fm_joint.V_samples,
            rtol=1e-9, atol=1e-12,
        )
        assert np.all(np.isfinite(fm_auto.V_samples))


def test_joint_f32_long_run_stays_bounded():
    """Regression guard for the float32 joint-engine fixes (per-sweep
    q rebuild + residual refresh, λ pivot floor, row-wise rhs): a
    300-sweep float32 run on the canonical relational problem must
    stay finite and prior-bounded.  Before the fixes this class of run
    diverged (|V| → 1e4/NaN) within ~100-200 sweeps."""
    X_main, blocks, y = _make_relational_problem(seed=3)
    traces = []

    def cb(i, fm, hyper, history):
        traces.append(float(np.abs(fm.V).max()))
        return False, None

    fm = MyFMGibbsRegressor(
        rank=4, random_seed=11, dtype=np.float32,
        sweep_strategy="joint",
    ).fit(X_main, y, X_rel=blocks, n_iter=300, n_kept_samples=5,
          callback=cb)
    mx = np.array(traces)
    assert np.isfinite(mx).all()
    assert mx.max() < 10.0  # truth scale is ~1; runaway reached 1e4+

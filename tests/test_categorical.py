"""Tests for the categorical entity-space fast path.

Layers (mirroring the reference's test strategy, SURVEY §4):
1. kernel unit: Pallas tile-Gram (interpret mode) == einsum oracle ==
   brute-force numpy per-entity Grams, across split/pad patterns;
2. table-pass unit: one `_table_pass` == an independent numpy
   re-implementation of the entity-space update rules, exactly (same
   noise);
3. invariant: after a full sweep, the maintained residual equals the
   recomputed score minus the latent target;
4. parity: identity-blocked ≡ grouped-flattened (both resolve to the
   same table decomposition ⇒ identical chains);
5. end-to-end posterior concentration through the public API.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from myfm_tpu import MyFMGibbsRegressor, RelationBlock
from myfm_tpu.design_categorical import (
    compile_categorical_table,
    try_compile_categorical,
)
from myfm_tpu.ops.categorical import (
    _table_pass,
    categorical_sweep,
    init_categorical_state,
)
from myfm_tpu.ops.gibbs import GibbsConfig, init_state
from myfm_tpu.ops.pallas_gram import entity_grams

from .oracle import expand_blocks


def _tile_rows(tab, z):
    D = z.shape[1]
    zpad = np.concatenate([z, np.zeros((1, D), z.dtype)])
    src = np.minimum(np.asarray(tab.src), z.shape[0])
    return jnp.asarray(
        zpad[src].reshape(tab.n_tiles, tab.tile_rows, D)
    )


@pytest.mark.parametrize("T,S", [(16, 2), (64, 8), (1024, 8)])
@pytest.mark.parametrize("seed", [0, 3])
def test_entity_grams_vs_numpy(T, S, seed):
    rng = np.random.RandomState(seed)
    N, B, D = 700, 29, 5
    ent = rng.randint(0, B, N)
    ent[ent == 7] = 8  # an entity with zero rows
    tab = compile_categorical_table(ent, B, 0, N, np.float32, T=T, S=S)
    z = rng.normal(size=(N, D)).astype(np.float32)
    rows_t = _tile_rows(tab, z)
    for use_pallas in (False, True):
        G = np.asarray(
            entity_grams(
                tab, rows_t, tab.tile_entities, D,
                interpret=True, use_pallas=use_pallas,
            )
        )
        for u in range(B):
            rows = z[ent == u].astype(np.float64)
            ref = rows.T @ rows if len(rows) else np.zeros((D, D))
            np.testing.assert_allclose(
                G[u], ref, rtol=2e-4, atol=2e-4,
                err_msg=f"entity {u} pallas={use_pallas}",
            )


def test_table_pass_matches_numpy_oracle():
    """_table_pass == independent numpy implementation, exactly.

    Two one-hot tables; the oracle reconstructs e from the weights
    (like the pass does), then draws per-coordinate with identical
    conditionals and the same noise."""
    rng = np.random.RandomState(1)
    N, B1, B2, R, G_n = 300, 11, 7, 3, 2
    ent1 = rng.randint(0, B1, N)
    ent2 = rng.randint(0, B2, N)
    X1 = sps.csr_matrix(
        (np.ones(N), (np.arange(N), ent1)), shape=(N, B1)
    )
    X2 = sps.csr_matrix(
        (np.ones(N), (np.arange(N), ent2)), shape=(N, B2)
    )
    grouping = np.asarray([0] * B1 + [1] * B2, np.int32)
    plan = try_compile_categorical(
        sps.hstack([X1, X2]).tocsr(), [], grouping, None, np.float64,
        T=32, S=4, rank=R,
    )
    assert plan is not None and len(plan.tables) == 2
    F = B1 + B2

    w = jnp.asarray(rng.normal(size=F))
    V = jnp.asarray(rng.normal(size=(F, R)))
    w0 = 0.4
    tau = rng.normal(size=N)  # latent target
    alpha = 1.7
    lambda_w = jnp.asarray([1.1, 0.7])
    mu_w = jnp.asarray([0.2, -0.1])
    lambda_V = jnp.asarray(rng.random((G_n, R)) + 0.5)
    mu_V = jnp.asarray(rng.normal(size=(G_n, R)) * 0.1)
    noise_w = jnp.asarray(rng.normal(size=F))
    noise_V = jnp.asarray(rng.normal(size=(F, R)))
    cfg = GibbsConfig(task="regression")

    from myfm_tpu.ops.categorical import make_y_tiles

    tau_tiles = make_y_tiles(plan, jnp.asarray(tau))
    w_j, V_j = jnp.asarray(w), jnp.asarray(V)
    for ti in range(2):
        w_j, V_j, moments = _table_pass(
            plan, ti, w_j, V_j, w0, alpha, lambda_w, mu_w, lambda_V,
            mu_V, plan.group_index, noise_w, noise_V, tau_tiles[ti],
            cfg, True, want_moments=(ti == 1),
        )
    w2, V2 = np.asarray(w_j), np.asarray(V_j)

    # ---- numpy oracle ------------------------------------------------
    w_o = np.asarray(w).copy()
    V_o = np.asarray(V).copy()
    gi = np.asarray(plan.group_index)
    nw = np.asarray(noise_w)
    nV = np.asarray(noise_V)
    lw = np.asarray(lambda_w)[gi]
    mw = np.asarray(mu_w)[gi]
    lV = np.asarray(lambda_V)[gi]
    mV = np.asarray(mu_V)[gi]
    ents = [ent1, ent2 + 0]
    offs = [0, B1]
    for ti in range(2):
        # reconstruct e, Q from current weights
        Q_o = V_o[ents[0]] + V_o[B1 + ents[1]]
        QS_o = V_o[ents[0]] ** 2 + V_o[B1 + ents[1]] ** 2
        score = (
            w0 + w_o[ents[0]] + w_o[B1 + ents[1]]
            + 0.5 * (Q_o**2 - QS_o).sum(axis=1)
        )
        e_o = score - tau
        ent = ents[ti]
        off = offs[ti]
        B = [B1, B2][ti]
        for u in range(B):
            f = off + u
            rows = np.nonzero(ent == u)[0]
            quad = alpha * len(rows) + lw[f]
            lin = (
                alpha * (len(rows) * w_o[f] - e_o[rows].sum())
                + lw[f] * mw[f]
            )
            w_new = lin / quad + nw[f] / np.sqrt(quad)
            e_o[rows] += w_new - w_o[f]
            w_o[f] = w_new
        for r in range(R):
            for u in range(B):
                f = off + u
                rows = np.nonzero(ent == u)[0]
                phi = Q_o[rows, r] - V_o[f, r]
                sq = (phi**2).sum()
                quad = alpha * sq + lV[f, r]
                lin = (
                    alpha * (sq * V_o[f, r] - (e_o[rows] * phi).sum())
                    + lV[f, r] * mV[f, r]
                )
                v_new = lin / quad + nV[f, r] / np.sqrt(quad)
                d = v_new - V_o[f, r]
                e_o[rows] += d * phi
                Q_o[rows, r] += d
                V_o[f, r] = v_new

    np.testing.assert_allclose(w2, w_o, rtol=1e-8)
    np.testing.assert_allclose(V2, V_o, rtol=1e-8)
    # exact residual moments from the Gram algebra vs numpy e
    np.testing.assert_allclose(float(moments[0]), e_o.sum(), rtol=1e-8)
    np.testing.assert_allclose(
        float(moments[1]), (e_o**2).sum(), rtol=1e-8
    )


def _cf_problem(seed=0, n=600, n_users=31, n_items=19, noise=0.3):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_users, n)
    i = rng.randint(0, n_items, n)
    y = (
        1.5
        + rng.normal(size=n_users)[u]
        + rng.normal(size=n_items)[i]
        + noise * rng.normal(size=n)
    )
    blocks = [
        RelationBlock(u, sps.identity(n_users, format="csr")),
        RelationBlock(i, sps.identity(n_items, format="csr")),
    ]
    return blocks, y, (n_users, n_items)


def test_sweep_residual_invariant():
    """e after a sweep == recomputed score − y."""
    blocks, y, (n_users, n_items) = _cf_problem()
    plan = try_compile_categorical(
        None, blocks, None, None, np.float64, rank=3
    )
    assert plan is not None
    cfg = GibbsConfig(task="regression")
    key = jax.random.PRNGKey(0)
    core = init_state(plan, 3, 0.1, key, cfg, np.float64)
    yj = jnp.asarray(y)
    state = init_categorical_state(plan, core, yj, key, cfg)
    from myfm_tpu.ops.categorical import make_y_tiles, score_and_q

    y_tiles = make_y_tiles(plan, yj)
    for it in range(3):
        state = categorical_sweep(
            plan, state, yj, y_tiles, jax.random.fold_in(key, it),
            cfg, interpret=True,
        )
    score, _ = score_and_q(
        plan, state.core.w0, state.core.w, state.core.V
    )
    e_true = np.asarray(score - yj)
    np.testing.assert_allclose(float(state.sum_e), e_true.sum(),
                               rtol=1e-8)
    np.testing.assert_allclose(float(state.sum_e2), (e_true**2).sum(),
                               rtol=1e-8)


def test_blocked_equals_grouped_flattened():
    """Identity-blocked and grouped-flattened inputs resolve to the
    same table decomposition ⇒ identical chains."""
    blocks, y, (n_users, n_items) = _cf_problem(seed=4)
    X_flat = expand_blocks(None, blocks)
    kwargs = dict(rank=2, random_seed=11, dtype=np.float64)
    fm_blocked = MyFMGibbsRegressor(**kwargs).fit(
        None, y, X_rel=blocks, n_iter=8, n_kept_samples=8,
        group_shapes=[n_users, n_items],
    )
    fm_flat = MyFMGibbsRegressor(**kwargs).fit(
        X_flat, y, n_iter=8, n_kept_samples=8,
        group_shapes=[n_users, n_items],
    )
    np.testing.assert_allclose(
        fm_blocked.w_samples, fm_flat.w_samples, rtol=1e-8
    )
    np.testing.assert_allclose(
        fm_blocked.V_samples, fm_flat.V_samples, rtol=1e-8
    )


def test_fast_path_posterior_concentration():
    blocks, y, (n_users, n_items) = _cf_problem(seed=2, n=1500)
    fm = MyFMGibbsRegressor(rank=2, random_seed=42).fit(
        None, y, X_rel=blocks, n_iter=60, n_kept_samples=40,
        group_shapes=[n_users, n_items],
    )
    # noise precision 1/0.3² ≈ 11.1 — late alpha samples in [0.5, 2]×
    alphas = np.asarray(
        [h.alpha for h in fm.history_.hypers[-20:]]
    )
    assert 0.5 * 11.1 < alphas.mean() < 2.0 * 11.1
    pred = fm.predict(None, blocks)
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 0.45


def test_fast_path_classifier():
    blocks, y_cont, (n_users, n_items) = _cf_problem(seed=6, n=1500)
    y = (y_cont > np.median(y_cont)).astype(np.int64)
    from myfm_tpu import MyFMGibbsClassifier

    fm = MyFMGibbsClassifier(rank=2, random_seed=1).fit(
        None, y, X_rel=blocks, n_iter=40, n_kept_samples=30,
        group_shapes=[n_users, n_items],
    )
    proba = fm.predict_proba(None, blocks)
    acc = float(((proba > 0.5) == (y > 0)).mean())
    assert acc > 0.85


def test_non_categorical_falls_back():
    """Side features disable the fast path; 'categorical' raises."""
    rng = np.random.RandomState(0)
    X = sps.csr_matrix(rng.normal(size=(50, 4)))
    y = rng.normal(size=50)
    assert (
        try_compile_categorical(X, [], None, None, np.float32) is None
    )
    with pytest.raises(ValueError):
        MyFMGibbsRegressor(
            rank=1, sweep_strategy="categorical"
        ).fit(X, y, n_iter=2)


def test_block_with_categorical_side_attributes_fast_path():
    """Blocks shaped [id | one-hot attributes] split into categorical
    tables via composed entity maps (the ml-100k side-info layout)."""
    rng = np.random.RandomState(0)
    n, nu, ni = 900, 37, 23

    def onehot(vals, k):
        return sps.csr_matrix(
            (np.ones(len(vals)), (np.arange(len(vals)), vals)),
            shape=(len(vals), k),
        )

    u, i = rng.randint(0, nu, n), rng.randint(0, ni, n)
    age = rng.randint(0, 5, nu)
    ub = sps.hstack(
        [sps.identity(nu, format="csr"), onehot(age, 5)]
    ).tocsr()
    ib = sps.identity(ni, format="csr")
    blocks = [RelationBlock(u, ub), RelationBlock(i, ib)]
    grouping = np.asarray(
        [0] * nu + [1] * 5 + [2] * ni, np.int32
    )
    plan = try_compile_categorical(
        None, blocks, grouping, None, np.float64, rank=2
    )
    assert plan is not None and len(plan.tables) == 3
    # the attribute table's entity map composes through the mapper
    np.testing.assert_array_equal(
        np.asarray(plan.tables[1].ent_main), age[u]
    )

    true_age = rng.normal(size=5)
    y = (
        rng.normal(size=nu)[u] + true_age[age[u]]
        + rng.normal(size=ni)[i] + 0.3 * rng.normal(size=n)
    )
    fm = MyFMGibbsRegressor(rank=2, random_seed=1).fit(
        None, y, X_rel=blocks, n_iter=50, n_kept_samples=30,
        grouping=list(grouping),
    )
    pred = fm.predict(None, blocks)
    assert float(np.sqrt(np.mean((pred - y) ** 2))) < 0.5


def test_fused_gram_extra_columns_vs_oracle():
    """q_other may carry extra trailing z-columns (the entity-space VI
    variance sums ride the same Gram); kernel == jnp oracle, and the
    leading [1|e|phi] block must be unchanged by the extension."""
    import jax.numpy as jnp

    from myfm_tpu.ops.pallas_gram import (
        fused_tile_gram,
        fused_tile_gram_reference,
    )

    rng = np.random.RandomState(7)
    K, T, S, R, X = 3, 16, 4, 3, 2
    meta = rng.normal(size=(K, T, 3))
    meta[:, :, 0] = (rng.random((K, T)) > 0.2).astype(float)  # ones
    q_ext = rng.normal(size=(K, T, R + X))
    slot = rng.randint(0, S, size=(K, T)).astype(np.int32)
    wvsl = rng.normal(size=(K, S, 1 + R))
    cont = np.zeros(K, dtype=np.int32)
    last = np.zeros(K, dtype=np.int32)

    args = lambda q: (
        jnp.asarray(meta), jnp.asarray(q), jnp.asarray(slot),
        jnp.asarray(wvsl), jnp.asarray(cont), jnp.asarray(cont),
        jnp.asarray(last), S,
    )
    out_ext, carry_ext = fused_tile_gram(*args(q_ext), interpret=True)
    ref_ext, ref_carry = fused_tile_gram_reference(*args(q_ext))
    D = R + X + 2
    np.testing.assert_allclose(
        np.asarray(out_ext)[:, :D, :],
        np.asarray(ref_ext).reshape(K * S, D, D),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(carry_ext), np.asarray(ref_carry), rtol=1e-10,
        atol=1e-10,
    )

    # the [1|e|phi] block is identical with and without extra columns
    out_base, _ = fused_tile_gram(
        *args(q_ext[:, :, :R]), interpret=True
    )
    Db = R + 2
    np.testing.assert_allclose(
        np.asarray(out_ext)[:, :Db, :Db],
        np.asarray(out_base)[:, :Db, :Db],
        rtol=1e-12,
    )


def test_choose_tiling_cost_model():
    """Dense tables (rows-per-entity >> T) must get a small S — the
    Gram kernel's MXU cost per row scales with ceil(S*Dp/128) — while
    scattered tables keep pad inflation bounded, and every choice
    respects the kernel's REAL modeled VMEM footprint."""
    from myfm_tpu.design_categorical import (
        choose_tiling,
        rank_tilings,
        _packed_rows,
    )
    from myfm_tpu.ops.pallas_gram import (
        GRAM_VMEM_BUDGET,
        fused_gram_vmem_bytes,
    )

    # items-like: ~930 rows per entity
    counts = np.full(10_000, 930, dtype=np.int64)
    T, S, infl = choose_tiling(counts, 1024, 8, rank=32)
    assert S <= 2, (T, S, infl)
    assert infl <= 1.3
    assert fused_gram_vmem_bytes(T, S, 32) <= GRAM_VMEM_BUDGET

    # scattered: one row per entity — S must grow to keep inflation
    # sane, and the returned inflation matches the packing exactly
    counts1 = np.ones(50_000, dtype=np.int64)
    T1, S1, infl1 = choose_tiling(counts1, 1024, 8, rank=32)
    assert S1 >= 16, (T1, S1, infl1)
    assert infl1 == _packed_rows(counts1, T1, S1) / 50_000
    assert fused_gram_vmem_bytes(T1, S1, 32) <= GRAM_VMEM_BUDGET

    # mixed heavy-tail: never worse than the old default on the model,
    # and the packing stays exact for whatever was chosen
    rng = np.random.RandomState(3)
    counts2 = (rng.pareto(1.2, 5_000) * 50 + 1).astype(np.int64)
    T2, S2, infl2 = choose_tiling(counts2, 1024, 8, rank=32)
    n2 = counts2.sum()
    assert infl2 == _packed_rows(counts2, T2, S2) / n2


def test_tiling_vmem_model_rejects_bench_r02_crash_config():
    """Regression for the BENCH_r02 scoped-VMEM OOM: the date table
    (B=1095, ~9.1k rows/entity) was given T=4096/S=2 whose true
    footprint — with Mosaic's 128-lane padding of the narrow [T, 1] /
    [T, 3] / [T, R] operands and double-buffered blocks — measured
    16.04 MiB against the 16 MiB scoped limit.  The footprint model
    must flag that config, and no ranked candidate may exceed the
    budget at any supported rank."""
    from myfm_tpu.design_categorical import rank_tilings
    from myfm_tpu.ops.pallas_gram import (
        GRAM_VMEM_BUDGET,
        fused_gram_vmem_bytes,
    )

    assert fused_gram_vmem_bytes(4096, 2, 32) > GRAM_VMEM_BUDGET
    # and well within reach of the hardware 16 MiB limit (the model
    # must not explain the crash by wild over-estimation)
    assert fused_gram_vmem_bytes(4096, 2, 32) < (17 << 20)

    rng = np.random.RandomState(0)
    counts = rng.multinomial(10_000_054, np.ones(1095) / 1095)
    for rank in (8, 32, 96, 128):
        ranked = rank_tilings(counts, 1024, 8, rank=rank)
        assert ranked, rank
        for T, S, _ in ranked:
            assert (
                fused_gram_vmem_bytes(T, S, rank) <= GRAM_VMEM_BUDGET
            ), (rank, T, S)
        assert (4096, 2) not in {(T, S) for T, S, _ in ranked}


def test_fused_gram_cross_vs_separate_meta():
    """The cross-absorbing kernel (raw cross gathers + packed aux in,
    VPU sums in VMEM) must agree exactly with the separate-meta kernel
    fed the pre-summed operands, carries included."""
    import jax.numpy as jnp

    from myfm_tpu.ops.pallas_gram import (
        fused_tile_gram,
        fused_tile_gram_cross,
        fused_tile_gram_cross_reference,
    )

    rng = np.random.RandomState(11)
    K, T, S, R = 3, 16, 4, 3
    # pad rows (slot == S) sit at the end of each tile, as in the real
    # packing; the kernel derives validity from slot alone
    slot = np.sort(rng.randint(0, S, size=(K, T)), axis=1).astype(
        np.int32
    )
    slot[:, -3:] = S  # a few pad rows per tile
    ones = (slot < S).astype(float)
    tau = rng.normal(size=(K, T)) * ones
    # per-cross extra qs mass beyond Σ V² (the EA-table case, where the
    # gathered qs column is the true Σ x²V² > Σ Ṽ²)
    ds = [np.abs(rng.normal(size=(K, T))) * ones for _ in range(2)]
    gths = []
    for c in range(2):
        core = rng.normal(size=(K, T, 1 + R)) * ones[:, :, None]
        qs = (core[:, :, 1:] ** 2).sum(axis=2) + ds[c]
        gths.append(np.concatenate([core, qs[:, :, None]], axis=2))
    wv_core = rng.normal(size=(K, S, 1 + R))
    # own qs column must equal Σ V² for the separate-meta comparison
    # below (the meta kernel recomputes the own squared sum itself)
    wvsl = np.concatenate(
        [wv_core, (wv_core[:, :, 1:] ** 2).sum(axis=2)[:, :, None]],
        axis=2,
    )
    cont_in = np.array([0, 1, 1], dtype=np.int32)
    cont_out = np.array([1, 1, 0], dtype=np.int32)
    last = np.full(K, S - 1, dtype=np.int32)
    carry0 = rng.normal(size=(R + 2, R + 2))

    aux2 = np.stack([slot.astype(float), tau], axis=1)
    out_c, carry_c = fused_tile_gram_cross(
        jnp.asarray(aux2),
        tuple(jnp.asarray(g) for g in gths),
        jnp.asarray(wvsl), jnp.asarray(cont_in),
        jnp.asarray(cont_out), jnp.asarray(last), S=S,
        carry_in=jnp.asarray(carry0), interpret=True,
    )
    ref_c, ref_carry = fused_tile_gram_cross_reference(
        jnp.asarray(aux2),
        tuple(jnp.asarray(g) for g in gths),
        jnp.asarray(wvsl), jnp.asarray(cont_in),
        jnp.asarray(cont_out), jnp.asarray(last), S,
        carry_in=jnp.asarray(carry0),
    )
    D = R + 2
    np.testing.assert_allclose(
        np.asarray(out_c)[:, :D, :], np.asarray(ref_c),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(carry_c), np.asarray(ref_carry), rtol=1e-10,
        atol=1e-10,
    )

    # equivalence with the separate-meta kernel on pre-summed operands
    # (meta layout: [1+R]-wide own rows, qs recomputed from V; the
    # cross kernel excludes w0 by contract, so meta lin0 = lin − τ)
    lin_o = sum(g[:, :, 0] for g in gths)
    Q_o = sum(g[:, :, 1 : 1 + R] for g in gths)
    qs_o = sum(g[:, :, 1 + R] for g in gths)
    meta = np.stack([ones, lin_o - tau, qs_o], axis=2)
    out_m, carry_m = fused_tile_gram(
        jnp.asarray(meta), jnp.asarray(Q_o), jnp.asarray(slot),
        jnp.asarray(wv_core), jnp.asarray(cont_in),
        jnp.asarray(cont_out), jnp.asarray(last), S=S,
        carry_in=jnp.asarray(carry0), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_m), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(carry_c), np.asarray(carry_m), rtol=1e-10,
        atol=1e-10,
    )


def test_gram_bf16_mode_error_bound_and_recovery():
    """The single-pass bf16 Gram mode (auto at rank >= 64 on TPU) must
    stay within its ~4e-3 theoretical relative error at kernel level,
    and a forced-bf16 fast-path chain must still recover a planted
    one-hot signal (the draw noise dominates the matmul error)."""
    import jax.numpy as jnp
    import scipy.sparse as sps

    from myfm_tpu.ops.pallas_gram import fused_tile_gram

    rng = np.random.RandomState(5)
    K, T, S, R = 2, 32, 4, 6
    meta = rng.normal(size=(K, T, 3)).astype(np.float32)
    meta[:, :, 0] = 1.0
    q = (rng.normal(size=(K, T, R)) * 0.4).astype(np.float32)
    slot = np.sort(rng.randint(0, S, (K, T)), axis=1).astype(np.int32)
    wvsl = (rng.normal(size=(K, S, 1 + R)) * 0.4).astype(np.float32)
    z = np.zeros(K, np.int32)
    ls = np.full(K, S - 1, np.int32)
    args = tuple(
        jnp.asarray(a) for a in (meta, q, slot, wvsl, z, z, ls)
    )
    hi, _ = fused_tile_gram(*args, S=S, interpret=True)
    bf, _ = fused_tile_gram(
        *args, S=S, interpret=True, fast_matmul="bf16"
    )
    scale = float(np.abs(np.asarray(hi)).max())
    err = float(np.abs(np.asarray(bf) - np.asarray(hi)).max())
    assert err <= 2e-2 * scale

    # end-to-end: forced bf16 chain recovers entity effects
    n, n_u, n_i = 1500, 30, 20
    u = rng.randint(0, n_u, n)
    i = rng.randint(0, n_i, n)
    bu = rng.normal(size=n_u)
    bi = rng.normal(size=n_i)
    y = 2.0 + bu[u] + bi[i] + 0.3 * rng.normal(size=n)
    rows = np.arange(n)
    X = sps.hstack(
        [
            sps.csr_matrix((np.ones(n), (rows, u)), shape=(n, n_u)),
            sps.csr_matrix((np.ones(n), (rows, i)), shape=(n, n_i)),
        ],
        format="csr",
    )
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    plan = try_compile_categorical(
        X, [], np.array([0] * n_u + [1] * n_i, np.int32), None,
        np.float32, rank=2,
    )
    assert plan is not None
    cfg = GibbsConfig(task="regression", gram_fast_matmul="bf16")
    tr = CategoricalGibbsTrainer(
        plan, y, cfg, rank=2, init_stdev=0.1, random_seed=7,
        dtype=np.float32,
    )
    pred, hist = tr.run(60, 30)
    yhat = np.zeros(n)
    import jax

    for s in pred.samples:
        from myfm_tpu.ops.categorical import score_rows

        yhat += np.asarray(
            jax.jit(score_rows)(
                plan, jnp.float32(s.w0), jnp.asarray(s.w),
                jnp.asarray(s.V),
            )
        )
    yhat /= len(pred.samples)
    rmse = float(np.sqrt(np.mean((yhat - y) ** 2)))
    assert rmse < 0.45  # noise floor 0.3; colored/f32 runs land ~0.33


@pytest.mark.parametrize("T,S", [(16, 2), (64, 8), (256, 4)])
@pytest.mark.parametrize("seed,masked", [(0, False), (5, True)])
def test_device_derived_src_slot_matches_host_pack(T, S, seed, masked):
    """The single-jit on-device src/slot derivation (TTFS path:
    _plan_tiles + _derive_src_slot_device) must reproduce the host
    packing bit-for-bit, including SPMD pad rows and row-less
    entities."""
    rng = np.random.RandomState(seed)
    N, B = 650, 23
    ent = rng.randint(0, B, N)
    ent[ent == 5] = 6  # entity with zero rows
    if masked:
        ent[rng.rand(N) < 0.1] = B  # SPMD pad rows
    host = compile_categorical_table(
        ent, B, 0, N, np.float32, T=T, S=S,
        derive_src_on_device=False,
    )
    dev = compile_categorical_table(
        ent, B, 0, N, np.float32, T=T, S=S,
        derive_src_on_device=True,
    )
    for field in ("src", "slot", "slot_f", "ent_of_tile_row",
                  "cont_in", "cont_out", "last_slot", "ent_slots",
                  "final_part", "fin_win", "fin_idx", "fin_mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(host, field)),
            np.asarray(getattr(dev, field)),
            err_msg=field,
        )

    # the SPMD shape-padding path (fixed tiling + padded tile count)
    host_p = compile_categorical_table(
        ent, B, 0, N, np.float32, fixed_ts=(T, S),
        pad_tiles_to=host.n_tiles + 3, max_fin_pad=host.max_fin + 1,
        derive_src_on_device=False,
    )
    dev_p = compile_categorical_table(
        ent, B, 0, N, np.float32, fixed_ts=(T, S),
        pad_tiles_to=host.n_tiles + 3, max_fin_pad=host.max_fin + 1,
        derive_src_on_device=True,
    )
    for field in ("src", "slot", "ent_of_tile_row", "final_part",
                  "fin_idx", "fin_mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(host_p, field)),
            np.asarray(getattr(dev_p, field)),
            err_msg=f"padded {field}",
        )

"""The in-kernel joint color tail must reproduce the lax.scan tail
step for step (same statistics, draws, Gram evolution — only float-op
order may differ)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from myfm_tpu.ops.joint import (
    _dense_color_step,
    _update_gram_lanes,
)
from myfm_tpu.ops.pallas_joint_tail import joint_tail_pass


def _random_tail_problem(C, B, Pf, R, seed=0, dtype=np.float64):
    """Random but structurally valid stack: per color each block row
    holds at most one feature slot; Gram is a genuine z-moment sum."""
    rng = np.random.RandomState(seed)
    D = R + 2
    # build a PSD-ish Gram from random z rows
    z = rng.normal(size=(8 * B, D)).astype(dtype)
    z[:, 0] = 1.0
    mapper = rng.randint(0, B, 8 * B)
    G = np.zeros((B, D, D), dtype)
    for n in range(8 * B):
        G[mapper[n]] += np.outer(z[n], z[n])
    G_flat = G.reshape(B, D * D).T.copy()  # [D², B]

    xw = np.zeros((C, B), dtype)
    segb = np.full((C, B), Pf, dtype=np.int32)
    for c in range(C):
        # each feature slot owns a random disjoint subset of block rows
        perm = rng.permutation(B)
        used = 0
        for p in range(Pf):
            k = rng.randint(1, max(2, B // (2 * Pf)))
            rows = perm[used : used + k]
            used += k
            segb[c, rows] = p
            xw[c, rows] = rng.choice([-1.0, 1.0, 0.5]) * (
                1.0 + 0.1 * rng.random(k)
            )
    u0 = rng.normal(size=(C, Pf, R + 1)).astype(dtype) * 0.3
    lam = np.abs(rng.normal(size=(C, Pf, R + 1))).astype(dtype) + 0.5
    mu = rng.normal(size=(C, Pf, R + 1)).astype(dtype) * 0.1
    xi = rng.normal(size=(C, Pf, R + 1)).astype(dtype)
    Atot = rng.normal(size=(R, B)).astype(dtype) * 0.05
    Ct = rng.normal(size=(B,)).astype(dtype) * 0.05
    return G_flat, Atot, Ct, xw, segb, u0, lam, mu, xi


def _scan_reference(G, Atot, Ct, xw, segb, u0, lam, mu, xi, alpha, D):
    """The existing ops/joint step() sequence, color by color."""
    C = xw.shape[0]
    u_all = []
    for c in range(C):
        u_new, a0, A_B = _dense_color_step(
            G, jnp.asarray(xw[c]), jnp.asarray(segb[c]),
            jnp.asarray(u0[c]), jnp.asarray(lam[c]),
            jnp.asarray(mu[c]), jnp.asarray(xi[c]), alpha, D,
        )
        Ct = Ct + a0 + jnp.sum(A_B * Atot, axis=0)
        Atot = Atot + A_B
        G = _update_gram_lanes(G, a0, A_B, D)
        u_all.append(u_new)
    return G, Atot, Ct, jnp.stack(u_all)


@pytest.mark.parametrize("dtype,rtol", [
    (np.float64, 1e-10),
    (np.float32, 2e-4),
])
def test_kernel_tail_matches_scan(dtype, rtol):
    C, B, Pf, R = 7, 37, 4, 3
    D = R + 2
    alpha = 1.3
    G, Atot, Ct, xw, segb, u0, lam, mu, xi = _random_tail_problem(
        C, B, Pf, R, seed=3, dtype=dtype
    )
    want = _scan_reference(
        jnp.asarray(G), jnp.asarray(Atot), jnp.asarray(Ct),
        xw, segb, u0, lam, mu, xi, alpha, D,
    )
    got = joint_tail_pass(
        jnp.asarray(G), jnp.asarray(Atot), jnp.asarray(Ct),
        jnp.asarray(xw), jnp.asarray(segb), jnp.asarray(u0),
        jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(xi),
        alpha, D, interpret=True,
    )
    names = ("G", "Atot", "Ct", "u_new")
    for name, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=rtol,
            err_msg=name,
        )


def test_full_joint_sweep_kernel_equals_scan():
    """Whole jitted gibbs_sweep trajectories (5 sweeps) with the tail
    kernel vs the lax.scan tail must coincide."""
    import dataclasses

    import scipy.sparse as sps

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.relational import RelationBlock
    from myfm_tpu.trainer import GibbsTrainer

    rng = np.random.RandomState(8)
    n, nu, ni = 400, 25, 18
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    # multi-hot implicit features force a nontrivial color tail
    imp = sps.csr_matrix(
        (rng.random((nu, ni)) > 0.7).astype(np.float64)
    )
    blocks = [
        RelationBlock(u, sps.hstack(
            [sps.identity(nu, format="csr"), imp], format="csr"
        )),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]
    y = rng.normal(size=n)
    plan = compile_design(
        None, blocks, grouping=None, dtype=np.float64,
        for_training=True, joint_dense=True, max_unrolled_colors=2,
    )
    assert any(b.dense_stack is not None for b in plan.blocks)

    states = {}
    for tail in (False, "interpret"):
        cfg = GibbsConfig(
            task="regression", joint_rows=True,
            joint_pallas_tail=tail,
        )
        tr = GibbsTrainer(plan, y, cfg, 3, 0.1, 21, np.float64)
        import jax as _jax

        master = _jax.random.PRNGKey(5)
        st = tr._initialize(_jax.random.fold_in(master, 0))
        for it in range(5):
            st = tr._sweep(
                plan, st, tr.y, _jax.random.fold_in(master, 1 + it),
                tr.cfg,
            )
        states[tail] = st
    a, b = states[False], states["interpret"]
    np.testing.assert_allclose(
        np.asarray(b.V), np.asarray(a.V), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(b.w), np.asarray(a.w), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(b.e), np.asarray(a.e), rtol=1e-8, atol=1e-10
    )


def test_kernel_tail_pad_slots_inert(dtype=np.float64):
    """Feature slots with no rows (segb never == p) must leave the
    carried state untouched by that slot."""
    C, B, Pf, R = 3, 16, 3, 2
    D = R + 2
    G, Atot, Ct, xw, segb, u0, lam, mu, xi = _random_tail_problem(
        C, B, Pf, R, seed=9, dtype=dtype
    )
    # wipe slot Pf-1 everywhere: those features own no rows
    segb[segb == Pf - 1] = Pf
    got = joint_tail_pass(
        jnp.asarray(G), jnp.asarray(Atot), jnp.asarray(Ct),
        jnp.asarray(xw), jnp.asarray(segb), jnp.asarray(u0),
        jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(xi),
        1.1, D, interpret=True,
    )
    want = _scan_reference(
        jnp.asarray(G), jnp.asarray(Atot), jnp.asarray(Ct),
        xw, segb, u0, lam, mu, xi, 1.1, D,
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-10, atol=1e-10
        )
    assert np.isfinite(np.asarray(got[3])).all()

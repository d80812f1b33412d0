"""Time the non-scan pieces of the joint sweep individually, and the
full sweep at different unroll factors."""

import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "examples"))

import numpy as np

import jax
import jax.numpy as jnp

from ml_features import build_feature_blocks, load_movielens


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps


def main():
    df_train, df_test = load_movielens("100k", 0, synthetic=True)
    X_date_tr, _, train_blocks, _, grouping = build_feature_blocks(
        df_train, df_test, "timesvdpp_flipped"
    )
    y = df_train.rating.values.astype(np.float64)

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.forward import factor_q, predict_score
    from myfm_tpu.ops.joint import build_block_gram
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import GibbsTrainer

    plan = compile_design(
        X_date_tr, train_blocks, grouping=np.asarray(grouping),
        dtype=np.float32, for_training=True, joint_dense=True,
    )
    rank = 10
    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.normal(size=(plan.n_features, rank)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(plan.n_features,)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(plan.n_rows,)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(plan.n_rows, rank)), jnp.float32)

    fq = jax.jit(lambda V: factor_q(plan, V))
    print(f"factor_q:        {timed(fq, V)*1e3:7.2f} ms")
    ps = jax.jit(lambda w, V: predict_score(plan, 0.1, w, V))
    print(f"predict_score:   {timed(ps, w, V)*1e3:7.2f} ms")
    for bi, b in enumerate(plan.blocks):
        bg = jax.jit(lambda e, q, b=b: build_block_gram(b, e, q))
        print(f"block_gram[{bi}]:   {timed(bg, e, q)*1e3:7.2f} ms")
        am = jax.jit(
            lambda q, b=b: q + jnp.ones(
                (b.block_size, rank), jnp.float32
            )[b.mapper]
        )
        print(f"mapper_gather[{bi}]:{timed(am, q)*1e3:7.2f} ms")

    for unroll in (4, 8, 16):
        cfg = GibbsConfig(
            task="regression", joint_rows=True, joint_unroll=unroll
        )
        tr = GibbsTrainer(plan, y, cfg, rank, 0.1, 42, np.float32)
        cfg = tr.cfg  # resolved joint_pallas_tail (auto-gate on TPU)
        master = jax.random.PRNGKey(42)
        state = tr._initialize(jax.random.fold_in(master, 0))

        def sweep(state, i):
            return tr._sweep(
                plan, state, tr.y, jax.random.fold_in(master, i), cfg
            )

        state = sweep(state, 1)
        float(state.w0)
        t0 = time.time()
        n = 20
        for i in range(n):
            state = sweep(state, 2 + i)
            float(state.w0)
        dt = (time.time() - t0) / n
        print(f"full sweep unroll={unroll:2d}: {dt*1e3:7.1f} ms "
              f"({1/dt:.2f} it/s)")


if __name__ == "__main__":
    main()

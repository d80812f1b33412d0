"""ML-100k timeSVD++-flipped rank-10 sweep throughput (the reference's
only measured headline: 20-22 it/s on the author's CPU,
/root/reference/doc/source/relation-blocks.rst:161-199).

Synthetic ML-100k-shaped data (zero-egress env), timesvdpp_flipped
features, rank 10, fold 0.  Times the jitted sweep with a scalar fetch
per iteration (axon's block_until_ready returns early)."""

import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "examples"))

import numpy as np

import jax

from ml_features import build_feature_blocks, load_movielens


def main(strategy="joint", rank=10, iters=30, unroll=4):
    df_train, df_test = load_movielens("100k", 0, synthetic=True)
    X_date_tr, _, train_blocks, _, grouping = build_feature_blocks(
        df_train, df_test, "timesvdpp_flipped"
    )
    y = df_train.rating.values.astype(np.float64)
    print(
        f"rows={len(y)} blocks="
        f"{[b.data.shape for b in train_blocks]} main="
        f"{X_date_tr.shape if X_date_tr is not None else None}"
    )

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import GibbsTrainer

    t0 = time.time()
    plan = compile_design(
        X_date_tr, train_blocks, grouping=np.asarray(grouping),
        dtype=np.float32, for_training=True,
        joint_dense=(strategy == "joint"),
    )
    n_colors = []
    for tbl in [plan.main] + list(plan.blocks):
        c = len(tbl.colors)
        if tbl.color_stack is not None:
            c += tbl.color_stack.rows.shape[0]
            n_colors.append(
                (c, "stackPe=%d" % tbl.color_stack.rows.shape[1],
                 "stackPf=%d" % tbl.color_stack.feat.shape[1])
            )
        else:
            n_colors.append((c,))
    print(f"compile_design: {time.time()-t0:.1f}s colors={n_colors}")

    cfg = GibbsConfig(
        task="regression", joint_rows=(strategy == "joint"),
        joint_unroll=unroll,
    )
    tr = GibbsTrainer(plan, y, cfg, rank, 0.1, 42, np.float32)
    cfg = tr.cfg  # resolved joint_pallas_tail (auto-gate on TPU)

    master = jax.random.PRNGKey(42)
    state = tr._initialize(jax.random.fold_in(master, 0))
    t0 = time.time()
    state = tr._sweep(plan, state, tr.y, jax.random.fold_in(master, 1),
                      cfg)
    float(state.w0)
    print(f"first sweep (compile): {time.time()-t0:.1f}s")
    # per-iter fetch (tunnel round-trip per sweep: what a tqdm-callback
    # user sees through the axon HTTP tunnel)
    t0 = time.time()
    for it in range(iters):
        state = tr._sweep(
            plan, state, tr.y, jax.random.fold_in(master, 2 + it), cfg
        )
        float(state.w0)  # force through the tunnel
    dt_fetch = (time.time() - t0) / iters
    # chained dispatch, one fetch (device-true sustained throughput:
    # sweeps are data-dependent through the donated state, so the
    # device executes them back-to-back; keys differ so nothing elides)
    keys = [jax.random.fold_in(master, 100 + it) for it in range(iters)]
    t0 = time.time()
    for k in keys:
        state = tr._sweep(plan, state, tr.y, k, cfg)
    float(state.w0)
    dt = (time.time() - t0) / iters
    print(
        f"strategy={strategy} unroll={unroll} rank={rank}: "
        f"{dt*1e3:.0f} ms/sweep = {1/dt:.2f} it/s chained "
        f"({dt_fetch*1e3:.0f} ms = {1/dt_fetch:.2f} it/s with per-iter "
        f"fetch; reference C++: 20-22 it/s)"
    )
    return 1 / dt


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--strategy", default="joint")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--unroll", type=int, default=4)
    a = p.parse_args()
    main(a.strategy, a.rank, a.iters, a.unroll)

"""Validate + time the Pallas joint-tail kernel on real hardware.

Compares the full joint sweep with joint_pallas_tail=True vs False on
the ML-100k timesvdpp synthetic problem: (1) Mosaic compiles, (2) a
few sweeps stay finite and close to the scan path, (3) sustained
sweep throughput for both (scalar-fetch per iteration — the axon
client elides block_until_ready).
"""

import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "examples"))

import numpy as np

import jax

from ml_features import build_feature_blocks, load_movielens


def main(rank=10, iters=40):
    df_train, df_test = load_movielens("100k", 0, synthetic=True)
    X_date_tr, _, train_blocks, _, grouping = build_feature_blocks(
        df_train, df_test, "timesvdpp_flipped"
    )
    y = df_train.rating.values.astype(np.float64)

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import GibbsTrainer

    plan = compile_design(
        X_date_tr, train_blocks, grouping=np.asarray(grouping),
        dtype=np.float32, for_training=True, joint_dense=True,
    )
    results = {}
    for tail in (True, False):
        cfg = GibbsConfig(
            task="regression", joint_rows=True,
            joint_pallas_tail=tail,
        )
        tr = GibbsTrainer(plan, y, cfg, rank, 0.1, 42, np.float32)
        master = jax.random.PRNGKey(42)
        t0 = time.time()
        state = tr._initialize(jax.random.fold_in(master, 0))
        state = tr._sweep(plan, state, tr.y, master, cfg)
        w0 = float(state.w0)
        print(f"tail={tail}: first sweep compiled+ran in "
              f"{time.time()-t0:.1f}s, w0={w0:.4f}", flush=True)
        t0 = time.time()
        for it in range(iters):
            state = tr._sweep(
                plan, state, tr.y,
                jax.random.fold_in(master, 1 + it), cfg,
            )
            w0 = float(state.w0)  # chain + force through the tunnel
        dt = (time.time() - t0) / iters
        assert np.isfinite(np.asarray(state.V)).all()
        results[tail] = (dt, np.asarray(state.V))
        print(f"tail={tail}: {1.0/dt:.2f} it/s ({dt*1e3:.1f} ms/sweep), "
              f"|V|_F={np.linalg.norm(results[tail][1]):.3f}",
              flush=True)
    speedup = results[False][0] / results[True][0]
    print(f"kernel speedup vs scan: {speedup:.2f}x")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))

"""Headline benchmark: Gibbs sweep throughput at ML-10M scale, rank 32.

Workload (BASELINE.json flagship config, network-free): 10M synthetic
MovieLens-shaped ratings (69,878 users × 10,677 items, heavy-tailed
popularity), trained as a Bayesian FM with user/item RelationBlocks
(one-hot entity ids) plus a date one-hot main table, rank 32 — the
structure of the reference's examples/ml-10m-regression.py.

Baseline: the reference C++ engine sweeps the blocked ML-100k problem
at 20 it/s on the author's CPU (doc/source/relation-blocks.rst:199).
Cost scales ~linearly in rows×rank, so its projected ML-10M rank-32
throughput is 20 × (1e5/1e7) × (10/32) ≈ 0.0625 sweeps/s; the
BASELINE.json north star is ≥20× that (≈1.25 sweeps/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sweeps/sec", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

REFERENCE_PROJECTED_SWEEPS_PER_SEC = 0.0625


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_problem(n_rows, rank, seed=0):
    from myfm_tpu import RelationBlock
    from myfm_tpu.utils.benchmark_data import SyntheticMovieLensManager

    t0 = time.time()
    man = SyntheticMovieLensManager(
        "10m", rank=8, random_seed=seed, n_rows=n_rows
    )
    df = man.load_rating_all()
    log(f"data generated in {time.time()-t0:.1f}s rows={len(df)}")

    users = df["user_id"].values - 1
    items = df["movie_id"].values - 1
    n_users = int(users.max()) + 1
    n_items = int(items.max()) + 1
    blocks = [
        RelationBlock(users, sps.identity(n_users, format="csr")),
        RelationBlock(items, sps.identity(n_items, format="csr")),
    ]
    # date one-hot main table (the ML-10M protocol keeps date features
    # in the main table)
    days = (
        (df["timestamp"] - df["timestamp"].min()).dt.days.values
    ).astype(np.int64)
    n_days = int(days.max()) + 1
    X_date = sps.csr_matrix(
        (np.ones(len(days), dtype=np.float64),
         (np.arange(len(days)), days)),
        shape=(len(days), n_days),
    )
    y = df["rating"].values.astype(np.float64)
    grouping = (
        [0] * n_days + [1] * n_users + [2] * n_items
    )
    return X_date, blocks, y, grouping


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_054
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_timed = 20

    import jax
    import jax.numpy as jnp

    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    log(f"jax devices: {jax.devices()}")
    X, blocks, y, grouping = build_problem(n_rows, rank)

    t0 = time.time()
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank,
    )
    assert plan is not None, "flagship workload must hit the fast path"
    log(
        f"design compiled in {time.time()-t0:.1f}s "
        f"(F={plan.n_features}, tables="
        f"{[(t.n_cols, t.n_tiles, t.tile_rows, t.tile_entities) for t in plan.tables]})"
    )

    cfg = GibbsConfig(task="regression")
    trainer = CategoricalGibbsTrainer(
        plan, y, cfg, rank=rank, init_stdev=0.1, random_seed=42,
        dtype=np.float32,
    )
    master = jax.random.PRNGKey(42)
    t0 = time.time()
    state = trainer._initialize(jax.random.fold_in(master, 0))
    _ = float(jnp.sum(state.core.e))
    log(f"init in {time.time()-t0:.1f}s")
    # warmup (compile)
    t0 = time.time()
    state = trainer._sweep(
        plan, state, trainer.y, trainer.y_tiles,
        jax.random.fold_in(master, 1), cfg, trainer._interpret,
    )
    _ = float(jnp.sum(state.core.e))
    log(f"first sweep (compile) in {time.time()-t0:.1f}s")

    # fetch a scalar per sweep: block_until_ready through the axon
    # tunnel returns early on in-flight buffers, and long unfetched
    # async chains degrade pathologically — the per-sweep sync matches
    # the real training loop (which harvests samples every iteration)
    t0 = time.time()
    checksum = 0.0
    for it in range(2, 2 + n_timed):
        state = trainer._sweep(
            plan, state, trainer.y, trainer.y_tiles,
            jax.random.fold_in(master, it), cfg, trainer._interpret,
        )
        checksum = float(state.core.alpha)
    dt = time.time() - t0
    sweeps_per_sec = n_timed / dt
    log(
        f"{n_timed} sweeps in {dt:.2f}s -> {sweeps_per_sec:.2f} sweeps/s; "
        f"alpha={checksum:.3f}"
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"Gibbs sweeps/sec, synthetic ML-10M "
                    f"({n_rows} rows, rank {rank}, user/item "
                    f"RelationBlocks + date one-hot)"
                ),
                "value": round(sweeps_per_sec, 3),
                "unit": "sweeps/sec",
                "vs_baseline": round(
                    sweeps_per_sec / REFERENCE_PROJECTED_SWEEPS_PER_SEC, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

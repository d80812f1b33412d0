"""Phase split of the categorical fast-path sweep: Gram build vs
entity draws, per table.  Usage:
    python scripts/profile_fastpath_phases.py [n_rows] [rank]
"""

import functools
import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/myfm_tpu_xla_cache"
)

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from bench import build_problem
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops import categorical as C
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    print(f"devices: {jax.devices()}", flush=True)
    X, blocks, y, grouping = build_problem(n_rows, rank)
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank,
    )
    assert plan is not None
    print(
        "tables="
        f"{[(t.n_cols, t.n_tiles, t.tile_rows, t.tile_entities, t.chunk_tiles) for t in plan.tables]}",
        flush=True,
    )

    cfg = GibbsConfig(task="regression")
    tr = CategoricalGibbsTrainer(
        plan, y, cfg, rank=rank, init_stdev=0.1, random_seed=42,
        dtype=np.float32,
    )
    master = jax.random.PRNGKey(42)
    state = tr._initialize(jax.random.fold_in(master, 0))
    core = state.core
    w, V, w0 = core.w, core.V, core.w0
    alpha = jnp.asarray(1.0, jnp.float32)
    G_grp = int(plan.group_counts.shape[0])
    lambda_w = jnp.ones((G_grp,), jnp.float32)
    mu_w = jnp.zeros((G_grp,), jnp.float32)
    lambda_V = jnp.ones((G_grp, rank), jnp.float32)
    mu_V = jnp.zeros((G_grp, rank), jnp.float32)
    noise_w = jax.random.normal(master, (plan.n_features,), jnp.float32)
    noise_V = jax.random.normal(
        master, (plan.n_features, rank), jnp.float32
    )

    eff = C.eff_tables(plan, w, V)

    # full sweep baseline
    def full_sweep(st, k):
        return C.categorical_sweep(
            plan, st, tr.y, tr.y_tiles, k, cfg, False
        )

    full_j = jax.jit(full_sweep)
    dt_full = timed(full_j, state, jax.random.fold_in(master, 1))
    print(f"full sweep: {dt_full*1e3:.1f} ms", flush=True)

    # eff_tables alone
    eff_j = jax.jit(lambda w, V: C.eff_tables(plan, w, V))
    dt_eff = timed(eff_j, w, V)
    print(f"eff_tables: {dt_eff*1e3:.1f} ms", flush=True)

    for ti, t in enumerate(plan.tables):
        tau_tile = tr.y_tiles[ti]
        w_t = C._table_slice(w, t)
        V_t = C._table_slice(V, t)
        wv = jnp.concatenate([w_t[:, None], V_t], axis=1)

        def gram_only(w, V, eff, wv):
            return C._build_table_gram(
                plan, ti, w, V, w0, eff, wv, None, tau_tile, cfg,
                False,
            )

        gram_j = jax.jit(gram_only)
        dt_g = timed(gram_j, w, V, eff, wv)
        G = gram_j(w, V, eff, wv)

        g_t = plan.group_index[t.col_offset : t.col_offset + t.n_cols]
        nw_t = noise_w[t.noise_feat]
        nV_t = noise_V[t.noise_feat]

        def draws_only(G, w_t, V_t, nw_t, nV_t, wm):
            return C._entity_draws(
                G, w_t, V_t, g_t, alpha, lambda_w, mu_w, lambda_V,
                mu_V, nw_t, nV_t, cfg, wm,
            )

        dj0 = jax.jit(functools.partial(draws_only, wm=False))
        dt_d = timed(dj0, G, w_t, V_t, nw_t, nV_t)
        dj1 = jax.jit(functools.partial(draws_only, wm=True))
        dt_dm = timed(dj1, G, w_t, V_t, nw_t, nV_t)
        print(
            f"table {ti}: B={t.n_cols:6d} gram={dt_g*1e3:7.1f} ms  "
            f"draws={dt_d*1e3:7.1f} ms  draws+moments={dt_dm*1e3:7.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()

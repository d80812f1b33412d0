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


def _sync(out):
    """block_until_ready through the axon tunnel returns early on
    in-flight buffers (see bench.py); fetching a scalar element forces
    real completion."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
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
    # tr.cfg, NOT cfg: the trainer resolves gram_fast_matmul (auto ->
    # "split"/"bf16"); the raw cfg would profile the HIGHEST 6-pass
    # matmul the real fit() loop never runs (same note as bench.py)
    cfg = tr.cfg
    print(f"gram_fast_matmul={cfg.gram_fast_matmul}", flush=True)
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

    # NB: every jitted wrapper below takes the plan / y arrays as
    # ARGUMENTS — closing over a 10M-row device array bakes it into
    # the HLO as a constant, and the remote-compile tunnel rejects
    # the resulting request body (HTTP 413, observed 2026-08-20).
    full_j = jax.jit(C.categorical_sweep, static_argnums=(5, 6))
    dt_full = timed(
        full_j, plan, state, tr.y, tr.y_tiles,
        jax.random.fold_in(master, 1), cfg, False,
    )
    print(f"full sweep: {dt_full*1e3:.1f} ms", flush=True)

    # eff_tables alone (all-None for pure one-hot designs — skip)
    if any(e is not None for e in eff):
        eff_j = jax.jit(C.eff_tables)
        dt_eff = timed(eff_j, plan, w, V)
        print(f"eff_tables: {dt_eff*1e3:.1f} ms", flush=True)

    def gram_only(plan, ti, w, V, eff, wv, tau_tile):
        return C._build_table_gram(
            plan, ti, w, V, eff, wv, tau_tile, cfg, False,
        )

    gram_j = jax.jit(gram_only, static_argnums=(1,))

    for ti, t in enumerate(plan.tables):
        tau_tile = tr.y_tiles[ti]
        w_t = C._table_slice(w, t)
        V_t = C._table_slice(V, t)
        wv = jnp.concatenate(
            [w_t[:, None], V_t, jnp.sum(V_t * V_t, axis=1)[:, None]],
            axis=1,
        )

        dt_g = timed(gram_j, plan, ti, w, V, eff, wv, tau_tile)
        G = gram_j(plan, ti, w, V, eff, wv, tau_tile)

        g_t = plan.group_index[t.col_offset : t.col_offset + t.n_cols]
        nw_t = noise_w[t.noise_feat]
        nV_t = noise_V[t.noise_feat]

        def draws_only(G, w_t, V_t, g_t, nw_t, nV_t, wm):
            return C._entity_draws(
                G, w0, w_t, V_t, g_t, alpha, lambda_w, mu_w, lambda_V,
                mu_V, nw_t, nV_t, cfg, wm,
            )

        dj0 = jax.jit(functools.partial(draws_only, wm=False))
        dt_d = timed(dj0, G, w_t, V_t, g_t, nw_t, nV_t)
        dj1 = jax.jit(functools.partial(draws_only, wm=True))
        dt_dm = timed(dj1, G, w_t, V_t, g_t, nw_t, nV_t)
        print(
            f"table {ti}: B={t.n_cols:6d} gram={dt_g*1e3:7.1f} ms  "
            f"draws={dt_d*1e3:7.1f} ms  draws+moments={dt_dm*1e3:7.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()

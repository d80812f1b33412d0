"""Profile one categorical fast-path sweep; dump top device ops.

Usage: python scripts/profile_fastpath.py [n_rows] [rank]

Defaults to 1M rows rank 32 (a 10x-reduced flagship bench workload) so
the trace stays small; the per-row cost structure matches 10M.
"""

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


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, os.path.join(_root))
    from bench import build_problem
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    print(f"devices: {jax.devices()}", flush=True)
    X, blocks, y, grouping = build_problem(n_rows, rank)
    t0 = time.time()
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank,
    )
    assert plan is not None
    print(
        f"design compiled in {time.time()-t0:.1f}s; tables="
        f"{[(t.n_cols, t.n_tiles, t.tile_rows, t.tile_entities) for t in plan.tables]}",
        flush=True,
    )

    cfg = GibbsConfig(task="regression")
    tr = CategoricalGibbsTrainer(
        plan, y, cfg, rank=rank, init_stdev=0.1, random_seed=42,
        dtype=np.float32,
    )
    master = jax.random.PRNGKey(42)
    state = tr._initialize(jax.random.fold_in(master, 0))
    state = tr._sweep(
        plan, state, tr.y, tr.y_tiles, jax.random.fold_in(master, 1),
        cfg, tr._interpret,
    )
    float(state.core.alpha)

    # timed (chained dispatch, scalar fetch per sweep)
    t0 = time.time()
    for it in range(5):
        state = tr._sweep(
            plan, state, tr.y, tr.y_tiles,
            jax.random.fold_in(master, 2 + it), cfg, tr._interpret,
        )
        float(state.core.alpha)
    dt = (time.time() - t0) / 5
    print(f"sweep: {dt*1e3:.1f} ms ({1/dt:.2f} sweeps/s at {n_rows} "
          f"rows)", flush=True)

    trace_dir = "/tmp/fastpath_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for it in range(2):
            state = tr._sweep(
                plan, state, tr.y, tr.y_tiles,
                jax.random.fold_in(master, 9 + it), cfg, tr._interpret,
            )
            float(state.core.alpha)

    sys.path.insert(0, os.path.join(_root, "scripts"))
    from profile_joint import top_ops

    top_ops(trace_dir)


if __name__ == "__main__":
    main()

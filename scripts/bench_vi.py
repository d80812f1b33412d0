"""Entity-space VI at flagship scale (synthetic ML-10M, rank 32).

Round-1 colored VI measured 120 s/sweep at this config (STATUS.md);
the entity-space fast path targets ~2-3 s/sweep."""

import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)

import numpy as np

from bench import build_problem, log


def main(n_rows=10_000_054, rank=32, n_timed=5):
    import jax

    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.variational import VariationalConfig
    from myfm_tpu.vi_trainer import CategoricalVITrainer

    X, blocks, y, grouping = build_problem(n_rows, rank)
    t0 = time.time()
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=3 * rank,
    )
    assert plan is not None
    log(f"design compiled in {time.time()-t0:.1f}s")

    cfg = VariationalConfig(task="regression")
    tr = CategoricalVITrainer(
        plan, y, cfg, rank, 0.1, 42, np.float32
    )
    t0 = time.time()
    state = tr._initialize()
    float(state.core.e_var_sum)
    log(f"init in {time.time()-t0:.1f}s")
    t0 = time.time()
    state = tr._sweep(
        tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
    )
    log(f"first sweep (compile) in {time.time()-t0:.1f}s "
        f"elbo={float(state.core.elbo):.4g}")
    t0 = time.time()
    for _ in range(n_timed):
        state = tr._sweep(
            tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
        )
        float(state.core.elbo)
    dt = (time.time() - t0) / n_timed
    log(
        f"VI fast path: {dt:.2f} s/sweep = {1/dt:.3f} sweeps/s "
        f"(colored round-1: 120 s/sweep); final elbo "
        f"{float(state.core.elbo):.6g} alpha {float(state.core.alpha):.3f}"
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_054
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(n, r)

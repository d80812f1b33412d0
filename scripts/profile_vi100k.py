"""Profile one EA VI sweep on the ML-100k timesvdpp features; dump
top device ops.  Usage: python scripts/profile_vi100k.py [rank]
"""

import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "examples"))
sys.path.insert(0, os.path.join(_root, "scripts"))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/myfm_tpu_xla_cache"
)

import numpy as np

import jax


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from bench import _timesvdpp_100k
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.variational import VariationalConfig
    from myfm_tpu.vi_trainer import CategoricalVITrainer

    print(f"devices: {jax.devices()}", flush=True)
    X_date, blocks, y, grouping = _timesvdpp_100k()
    t0 = time.time()
    plan = try_compile_categorical(
        X_date, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=max(4 * rank, 1), allow_side=True,
    )
    assert plan is not None
    print(
        f"design compiled in {time.time()-t0:.1f}s; tables="
        f"{[(t.n_cols, t.n_tiles, t.tile_rows, t.tile_entities) for t in plan.tables]}; "
        f"side colors={[None if s is None else s.stack_feat.shape for s in plan.side]}",
        flush=True,
    )
    cfg = VariationalConfig(task="regression")
    tr = CategoricalVITrainer(plan, y, cfg, rank, 0.1, 42, np.float32)
    state = tr._initialize()
    state = tr._sweep(
        tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
    )
    float(state.core.elbo)
    t0 = time.time()
    n = 10
    for _ in range(n):
        state = tr._sweep(
            tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
        )
        float(state.core.elbo)
    dt = (time.time() - t0) / n
    print(f"sweep: {dt*1e3:.1f} ms ({1/dt:.2f} it/s)", flush=True)

    trace_dir = "/tmp/vi100k_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            state = tr._sweep(
                tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
            )
            float(state.core.elbo)

    from profile_joint import top_ops

    top_ops(trace_dir)


if __name__ == "__main__":
    main()

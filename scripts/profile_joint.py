"""Profile the merged joint sweep on ML-100k timesvdpp; dump top device
ops from the jax.profiler trace."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "examples"))

import numpy as np

import jax

from ml_features import build_feature_blocks, load_movielens


def top_ops(trace_dir, n=40):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # device lanes only: pid names like "/device:TPU:0" appear
            # in metadata; keep all and filter by arg presence
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # ms
            cat = ev.get("args", {})
            if not name or dur <= 0:
                continue
            agg[name] += dur
            total += dur
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:n]
    for k, v in items:
        print(f"{v:10.1f} ms  {k[:110]}")
    print(f"(sum over all events: {total:.1f} ms)")


def main(strategy="joint", rank=10, unroll=4):
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
        dtype=np.float32, for_training=True,
        joint_dense=(strategy == "joint"),
    )
    cfg = GibbsConfig(
        task="regression", joint_rows=(strategy == "joint"),
        joint_unroll=unroll,
    )
    tr = GibbsTrainer(plan, y, cfg, rank, 0.1, 42, np.float32)
    cfg = tr.cfg  # resolved joint_pallas_tail (auto-gate on TPU)
    master = jax.random.PRNGKey(42)
    state = tr._initialize(jax.random.fold_in(master, 0))
    state = tr._sweep(plan, state, tr.y, jax.random.fold_in(master, 1),
                      cfg)
    float(state.w0)

    trace_dir = "/tmp/joint_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for it in range(2):
            state = tr._sweep(
                plan, state, tr.y, jax.random.fold_in(master, 5 + it),
                cfg,
            )
            float(state.w0)
    top_ops(trace_dir)


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))

"""Microbenchmark the fused tile-Gram kernel in isolation.

The categorical fast path spends ~13 us per 1024-row tile in
fused_tile_gram (measured r2: ~13 ms per 1e6 rows at D = 34), while
the in-tile compute is ~1 us of MXU work and ~0.2 us of HBM traffic —
so the sweep is dominated by per-grid-step overhead.  This script maps
kernel time against tile rows T, slots S and chunking to find the
shape that minimizes us/row, plus a profiler trace of one config.

Usage: python scripts/microbench_gram.py [n_rows] [rank]
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

from myfm_tpu.ops.pallas_gram import fused_tile_gram


def make_tiles(n_rows, rank, T, S, rows_per_entity, seed=0):
    """Synthetic entity-sorted tile pack shaped like the ML-10M user
    table (most tiles span few entities, continuation across tiles)."""
    rng = np.random.RandomState(seed)
    K = -(-n_rows // T)
    NT = K * T
    dtype = np.float32
    meta = rng.normal(size=(K, T, 3)).astype(dtype)
    meta[:, :, 0] = 1.0
    q = (rng.normal(size=(K, T, rank)) * 0.1).astype(dtype)
    # entity ids for sorted rows
    ent = np.minimum(
        np.arange(NT) // rows_per_entity, 10**9
    )
    ent_t = ent.reshape(K, T)
    first = ent_t[:, 0]
    slot = (ent_t - first[:, None]).astype(np.int32)
    valid = slot < S
    slot = np.where(valid, slot, S - 1).astype(np.int32)
    cont_in = np.zeros(K, np.int32)
    cont_in[1:] = (ent_t[1:, 0] == ent_t[:-1, -1]).astype(np.int32)
    cont_out = np.zeros(K, np.int32)
    cont_out[:-1] = cont_in[1:]
    last_slot = slot[:, -1].astype(np.int32)
    wvsl = (rng.normal(size=(K, S, 1 + rank)) * 0.1).astype(dtype)
    return (
        jnp.asarray(meta), jnp.asarray(q), jnp.asarray(slot),
        jnp.asarray(wvsl), jnp.asarray(cont_in),
        jnp.asarray(cont_out), jnp.asarray(last_slot),
    )


def bench_config(n_rows, rank, T, S, rows_per_entity, iters=30):
    args = make_tiles(n_rows, rank, T, S, rows_per_entity)

    @jax.jit
    def run(meta, q, slot, wvsl, ci, co, ls):
        out, carry = fused_tile_gram(
            meta, q, slot, wvsl, ci, co, ls, S=S
        )
        # reduce so only a tiny value crosses the tunnel
        return jnp.sum(out[:: max(1, out.shape[0] // 64)]) + jnp.sum(
            carry
        )

    v = float(run(*args))  # compile
    t0 = time.time()
    for _ in range(iters):
        v = float(run(*args))
    dt = (time.time() - t0) / iters
    K = args[0].shape[0]
    print(
        f"T={T:5d} S={S:2d} rpe={rows_per_entity:4d}: "
        f"{dt*1e3:8.2f} ms/pass  {dt/K*1e6:6.2f} us/tile  "
        f"{dt/n_rows*1e9:6.1f} ns/row  (K={K}, chk={v:.3e})",
        flush=True,
    )
    return dt


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"devices: {jax.devices()}  n_rows={n_rows} rank={rank}",
          flush=True)

    for T in (512, 1024, 2048, 4096):
        for S in (4, 8, 16):
            if T * (S * (-(-(rank + 2) // 8) * 8)) * 4 > 14e6:
                continue  # a_ref scratch would blow VMEM
            try:
                bench_config(n_rows, rank, T, S, rows_per_entity=143)
            except Exception as exc:
                print(f"T={T} S={S}: FAILED {type(exc).__name__}: "
                      f"{exc}", flush=True)

    # profile the current production shape
    import glob

    trace_dir = "/tmp/gram_trace"
    args = make_tiles(n_rows, rank, 1024, 8, 143)

    @jax.jit
    def run(meta, q, slot, wvsl, ci, co, ls):
        out, carry = fused_tile_gram(
            meta, q, slot, wvsl, ci, co, ls, S=8
        )
        return jnp.sum(out[::64]) + jnp.sum(carry)

    float(run(*args))
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            float(run(*args))
    print("trace written:",
          glob.glob(trace_dir + "/**/*.json.gz", recursive=True),
          flush=True)


if __name__ == "__main__":
    main()

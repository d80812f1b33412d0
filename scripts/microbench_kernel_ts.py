"""Measure the fused cross Gram kernel's true ns/row across (T, S)
tilings and matmul modes on hardware, with synthetic tiles — isolates
the kernel cost curve from packing/gather effects so the tiling cost
model (design_categorical._gram_ns_per_row) can be refit against
reality instead of theory.

Usage: python scripts/microbench_kernel_ts.py [rank] [n_cross]
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


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(fn, *args, reps=5):
    """Per-call device time with the ~20-40 ms tunnel round trip
    amortized out: chain ``reps`` data-DEPENDENT calls (the caller
    must thread a dependence through *args via ``chain``) and compare
    two chain lengths — (t_2r − t_r)/reps is pure device time.  A
    plain per-rep sync loop measures RTT + kernel and overstated the
    kernel by ~6 ns/row at 4M tile rows (2026-08-20)."""
    out = fn(*args)
    _sync(out)
    out = fn(*args, chain=out[1])  # compile the chained variant
    _sync(out)

    def run(n):
        o = out
        t0 = time.time()
        for _ in range(n):
            o = fn(*args, chain=o[1])
        _sync(o)
        return time.time() - t0

    t1 = run(reps)
    t2 = run(2 * reps)
    return (t2 - t1) / reps


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_cross = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from myfm_tpu.ops.pallas_gram import (
        GRAM_VMEM_BUDGET,
        fused_gram_vmem_bytes,
        fused_tile_gram_cross,
    )
    from myfm_tpu.design_categorical import _gram_ns_per_row

    print(f"devices: {jax.devices()} rank={rank}", flush=True)
    rng = np.random.RandomState(0)
    # tile-rows per measurement; the flat Gram output is
    # S*Dp*D*4/T bytes per tile row, so big-D small-T configs must
    # shrink the target to fit HBM
    N_TARGET = 4_000_000 if rank <= 64 else 1_000_000
    if len(sys.argv) > 4:
        N_TARGET = int(sys.argv[4])

    import functools

    run_j = jax.jit(
        fused_tile_gram_cross,
        static_argnames=("S", "fast_matmul", "tiles_per_step"),
    )

    from myfm_tpu.ops.pallas_gram import gram_tiles_per_step

    # production tilings of the ML-10M rank-32 plan, measured at BOTH
    # G=1 and the production tiles_per_step (G-batched grid steps);
    # override via argv[3] = "T:S,T:S,..." (e.g. the rank-128 plan's)
    tilings = [(1024, 1), (256, 4), (512, 2)]
    if len(sys.argv) > 3:
        tilings = [
            tuple(int(x) for x in t.split(":"))
            for t in sys.argv[3].split(",")
        ]
    for T, S in tilings:
        if fused_gram_vmem_bytes(T, S, rank) > GRAM_VMEM_BUDGET:
            continue
        K = max(1, N_TARGET // T)
        NT = K * T
        slot = np.sort(
            rng.randint(0, S, (K, T)).astype(np.float32), axis=1
        )
        tau = rng.normal(size=(K, T)).astype(np.float32)
        gths = tuple(
            jnp.asarray(
                (rng.normal(size=(K, T, 2 + rank)) * 0.1).astype(
                    np.float32
                )
            )
            for _ in range(n_cross)
        )
        wvsl = jnp.asarray(
            (rng.normal(size=(K, S, 2 + rank)) * 0.1).astype(
                np.float32
            )
        )
        ci = jnp.zeros((K,), jnp.int32)
        co = jnp.zeros((K,), jnp.int32)
        ls = jnp.full((K,), S - 1, jnp.int32)
        aux2_d = jnp.asarray(
            np.stack([slot, tau], axis=1)
        )
        for G in sorted({1, gram_tiles_per_step(T, S, rank)}):
            for mode in ("split", "bf16"):

                def call(aux2, gt, wv, ci_, co_, ls_, chain=None,
                         _mode=mode, _G=G):
                    return run_j(
                        aux2, gt, wv, ci_, co_, ls_, S=S,
                        fast_matmul=_mode, tiles_per_step=_G,
                        carry_in=chain,
                    )

                try:
                    dt = timed(
                        call, aux2_d, gths, wvsl, ci, co, ls,
                    )
                except Exception as exc:
                    print(
                        f"T={T:5d} S={S} G={G} {mode}: FAILED "
                        f"{exc!r:.80}",
                        flush=True,
                    )
                    continue
                model = _gram_ns_per_row(T, S, rank, n_cross)
                print(
                    f"T={T:5d} S={S} G={G} {mode:5s}: {dt*1e3:7.1f} ms "
                    f"{dt/NT*1e9:6.2f} ns/row  "
                    f"(model[split] {model:5.2f})",
                    flush=True,
                )


if __name__ == "__main__":
    main()

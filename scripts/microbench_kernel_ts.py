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
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.time() - t0) / reps


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
    N_TARGET = 4_000_000  # tile-rows per measurement

    import functools

    run_j = jax.jit(
        fused_tile_gram_cross, static_argnames=("S", "fast_matmul")
    )

    tilings = [(1024, 1), (256, 4), (512, 2)]
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
            gths16 = tuple(g.astype(jnp.bfloat16) for g in gths)
            for mode, gt in (
                ("split", gths), ("bf16", gths),
                ("split16", gths16),
            ):
                try:
                    dt = timed(
                        functools.partial(
                            run_j, S=S,
                            fast_matmul=mode.replace("16", ""),
                        ),
                        aux2_d, gt, wvsl, ci, co, ls,
                    )
                except Exception as exc:
                    print(
                        f"T={T:5d} S={S} {mode}: FAILED {exc!r:.80}",
                        flush=True,
                    )
                    continue
                model = _gram_ns_per_row(T, S, rank, n_cross)
                print(
                    f"T={T:5d} S={S} {mode:7s}: {dt*1e3:7.1f} ms "
                    f"{dt/NT*1e9:6.2f} ns/row  "
                    f"(model[split] {model:5.2f})",
                    flush=True,
                )


if __name__ == "__main__":
    main()

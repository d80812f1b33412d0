"""Calibrate the chip's real achievable HBM streaming bandwidth with
plain XLA ops (copy, sum, add) over arrays shaped like the Gram
kernel's operands — is the kernel's ~100 GB/s effective DMA rate a
Mosaic problem or the hardware's actual streaming rate?
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
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    # 2 GB contiguous f32 array, [N, 128] so lanes are dense
    N = 4_000_000
    a = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    nbytes = N * 128 * 4

    sum_j = jax.jit(lambda x: jnp.sum(x))
    dt = timed(sum_j, a)
    print(f"sum [4M,128] (read {nbytes/1e9:.2f} GB): {dt*1e3:7.1f} ms "
          f"-> {nbytes/dt/1e9:6.1f} GB/s read", flush=True)

    add_j = jax.jit(lambda x, y: x + y)
    dt = timed(add_j, a, b)
    print(f"add [4M,128] (r 2x + w 1x = {3*nbytes/1e9:.2f} GB): "
          f"{dt*1e3:7.1f} ms -> {3*nbytes/dt/1e9:6.1f} GB/s", flush=True)

    scale_j = jax.jit(lambda x: x * 1.0001)
    dt = timed(scale_j, a)
    print(f"scale [4M,128] (r+w {2*nbytes/1e9:.2f} GB): {dt*1e3:7.1f} ms "
          f"-> {2*nbytes/dt/1e9:6.1f} GB/s", flush=True)

    # the gather pattern: [NT] random rows from a small [B, 128] source
    B = 69878
    src = jnp.asarray(rng.normal(size=(B + 1, 128)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, B, N).astype(np.int32))
    gat_j = jax.jit(lambda s, i: s[i])
    dt = timed(gat_j, src, idx)
    print(f"gather [4M] rows of [70k,128] (w {nbytes/1e9:.2f} GB): "
          f"{dt*1e3:7.1f} ms -> {nbytes/dt/1e9:6.1f} GB/s write",
          flush=True)

    # big matmul for MXU calibration — CHAINED x10 inside one jit so
    # the ~20 ms tunnel dispatch round-trip amortizes (a single-call
    # measurement reported ~5 TFLOP/s for f32 AND bf16, i.e. mostly
    # dispatch)
    M = 4096
    flops = 2 * M**3
    x = jnp.asarray(
        (rng.normal(size=(M, M)) / np.sqrt(M)).astype(np.float32)
    )

    def chain10(x):
        for _ in range(10):
            x = jax.lax.dot(x, x, preferred_element_type=x.dtype)
            x = x * (1.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-6))
        return x

    mm_j = jax.jit(chain10)
    dt = timed(mm_j, x) / 10
    print(f"matmul {M}^3 f32 x10 chained: {dt*1e3:7.1f} ms/mm -> "
          f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)

    xb = x.astype(jnp.bfloat16)
    dt = timed(jax.jit(chain10), xb) / 10
    print(f"matmul {M}^3 bf16 x10 chained: {dt*1e3:7.1f} ms/mm -> "
          f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()

"""What exactly is the lax.scan per-step floor on this TPU?"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps


def scan_noxs(C, unroll, carry_n=1):
    c0 = jnp.ones((carry_n,), jnp.float32)

    def body(c, _):
        return c * 0.999 + 1e-6, None

    @jax.jit
    def run(c0):
        c, _ = lax.scan(body, c0, None, length=C, unroll=unroll)
        return c

    return timed(run, c0)


def scan_xs(C, unroll, n_leaves, width, carry_n=1024):
    rng = np.random.RandomState(0)
    xs = tuple(
        jnp.asarray(rng.random((C, width)), jnp.float32)
        for _ in range(n_leaves)
    )
    c0 = jnp.ones((carry_n,), jnp.float32)

    def body(c, x):
        acc = c * 0.999
        for xi in x:
            acc = acc + xi[: carry_n] if width >= carry_n else acc + xi.sum()
        return acc, None

    @jax.jit
    def run(c0):
        c, _ = lax.scan(body, c0, xs, unroll=unroll)
        return c

    return timed(run, c0)


def fori(C, carry_n=1024):
    c0 = jnp.ones((carry_n,), jnp.float32)

    @jax.jit
    def run(c0):
        return lax.fori_loop(
            0, C, lambda i, c: c * 0.999 + 1e-6, c0
        )

    return timed(run, c0)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    C = 2048
    scan_noxs(C, 1)  # warmup the worker
    for unroll in (1, 2, 4, 8, 16, 32):
        dt = scan_noxs(C, unroll)
        print(f"scan no-xs   unroll={unroll:3d}: {dt/C*1e6:7.1f} us/step")
    for unroll in (2, 8, 32):
        dt = scan_noxs(C, unroll, carry_n=128 * 1024)
        print(f"scan big-carry unroll={unroll:3d}: {dt/C*1e6:7.1f} us/step")
    dt = fori(C)
    print(f"fori_loop              : {dt/C*1e6:7.1f} us/step")
    for n_leaves in (1, 2, 5):
        for unroll in (2, 8):
            dt = scan_xs(C, unroll, n_leaves, 1024)
            print(
                f"scan xs={n_leaves} w=1024 unroll={unroll:3d}: "
                f"{dt/C*1e6:7.1f} us/step"
            )

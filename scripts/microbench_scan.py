"""Microbenchmark: lax.scan per-step overhead vs unroll factor on TPU.

Measures the wall-clock of a ~700-step scan with (a) a trivial 3-op
body, (b) a joint-draw-like body (gather + segment-sum + batched
Cholesky solves + scatter + aggregate update), under unroll factors
1/2/4/8.  Timing fetches a scalar per repetition (the axon client's
block_until_ready returns early on in-flight buffers).
"""

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
        s = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / reps
    return dt, s


def trivial(C, unroll):
    xs = jnp.arange(C, dtype=jnp.float32)

    def body(c, x):
        return c * 0.999 + x, None

    @jax.jit
    def run(c0):
        c, _ = lax.scan(body, c0, xs, unroll=unroll)
        return c

    return timed(run, jnp.float32(1.0))


def jointlike(C, B, Pe, Pf, R, unroll, seed=0):
    """Resembles the (R+1)-joint block color step."""
    rng = np.random.RandomState(seed)
    D = R + 3  # z = [1, e, q]
    rows = jnp.asarray(rng.randint(0, B, (C, Pe)), jnp.int32)
    vals = jnp.asarray(rng.random((C, Pe)), jnp.float32)
    seg = jnp.asarray(
        np.sort(rng.randint(0, Pf, (C, Pe))), jnp.int32
    )
    feat = jnp.asarray(rng.randint(0, 2600, (C, Pf)), jnp.int32)
    G0 = jnp.asarray(
        np.tile(np.eye(D, dtype=np.float32) * 5.0, (B, 1, 1))
    )
    U0 = jnp.asarray(rng.normal(size=(2600, R + 1)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2600, R + 1)), jnp.float32)
    lam = jnp.ones((2600, R + 1), jnp.float32)

    def body(carry, xs):
        G, U = carry
        r_, v_, s_, f_ = xs
        # gather + weighted pack + one segment sum
        Gm = G[r_]  # [Pe, D, D]
        x2 = (v_ * v_)[:, None, None]
        packed = jnp.concatenate(
            [
                x2 * Gm,
                (v_[:, None] * Gm[:, 1, :])[:, None, :],
                ((v_**3)[:, None] * Gm[:, 0, :])[:, None, :],
                ((v_**4)[:, None] * Gm[:, 0, :])[:, None, :],
            ],
            axis=1,
        )  # [Pe, D+3, D]
        T = jax.ops.segment_sum(
            packed, s_, num_segments=Pf, indices_are_sorted=True
        )
        u_old = U[f_]  # [Pf, R+1]
        S = T[:, : R + 1, : R + 1] + 0.01 * jnp.einsum(
            "pf,pg->pfg", u_old, u_old
        )
        t = T[:, R + 1, : R + 1]
        A = S + jnp.eye(R + 1, dtype=jnp.float32)
        L = jnp.linalg.cholesky(A)
        rhs = jnp.einsum("pfg,pg->pf", S, u_old) - t + lam[f_]
        z1 = jax.scipy.linalg.solve_triangular(L, rhs[..., None], lower=True)
        u_new = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), z1 + noise[f_][..., None],
            lower=False,
        )[..., 0]
        delta = u_new - u_old
        a0 = jnp.zeros((B,), jnp.float32).at[r_].add(
            v_ * delta[s_, 0], mode="drop"
        )
        Av = jnp.zeros((B, R), jnp.float32).at[r_].add(
            v_[:, None] * delta[s_, 1:], mode="drop"
        )
        s_vec = jnp.concatenate(
            [a0[:, None], jnp.zeros((B, 2), jnp.float32), Av], axis=1
        )
        g = jnp.einsum("bij,bj->bi", G, s_vec)
        sgs = jnp.einsum("bi,bi->b", s_vec, g)
        sh = s_vec.at[:, 0].set(0.0)
        p = g + 0.5 * sgs[:, None] * jax.nn.one_hot(1, D, dtype=jnp.float32) \
            + g[:, 0:1] * sh
        r2 = G[:, :, 0] + 0.5 * G[:, 0:1, 0] * sh
        G = G.at[:, 1, :].add(p).at[:, :, 1].add(p)
        G = G.at[:, 3:, :].add(Av[:, :, None] * r2[:, None, :])
        G = G.at[:, :, 3:].add(r2[:, :, None] * Av[:, None, :])
        U = U.at[f_].set(u_new, mode="drop")
        return (G, U), None

    @jax.jit
    def run(G0, U0):
        (G, U), _ = lax.scan(
            body, (G0, U0), (rows, vals, seg, feat), unroll=unroll
        )
        return U

    return timed(run, G0, U0)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    C = 704
    for unroll in (1, 2, 4, 8):
        dt, _ = trivial(C, unroll)
        print(
            f"trivial   C={C} unroll={unroll}: {dt*1e3:8.2f} ms "
            f"({dt/C*1e6:6.1f} us/step)"
        )
    for unroll in (1, 2, 4, 8):
        dt, _ = jointlike(C, 1696, 1024, 256, 10, unroll)
        print(
            f"jointlike C={C} unroll={unroll}: {dt*1e3:8.2f} ms "
            f"({dt/C*1e6:6.1f} us/step)"
        )

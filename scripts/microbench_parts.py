"""Ablate the joint-like scan body: which op dominates the 1.6 ms/step?"""

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
    return (time.time() - t0) / reps


def bench(C=704, B=1696, Pe=1024, Pf=256, R=10, unroll=4, part="all"):
    rng = np.random.RandomState(0)
    D = R + 3
    rows = jnp.asarray(rng.randint(0, B, (C, Pe)), jnp.int32)
    vals = jnp.asarray(rng.random((C, Pe)), jnp.float32)
    seg = jnp.asarray(np.sort(rng.randint(0, Pf, (C, Pe))), jnp.int32)
    feat = jnp.asarray(rng.randint(0, 2600, (C, Pf)), jnp.int32)
    G0 = jnp.asarray(np.tile(np.eye(D, dtype=np.float32) * 5.0, (B, 1, 1)))
    U0 = jnp.asarray(rng.normal(size=(2600, R + 1)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2600, R + 1)), jnp.float32)

    def body(carry, xs):
        G, U = carry
        r_, v_, s_, f_ = xs
        acc = 0.0
        if part in ("all", "gather_pack_seg"):
            Gm = G[r_]
            x2 = (v_ * v_)[:, None, None]
            packed = jnp.concatenate(
                [
                    x2 * Gm,
                    (v_[:, None] * Gm[:, 1, :])[:, None, :],
                    ((v_**3)[:, None] * Gm[:, 0, :])[:, None, :],
                ],
                axis=1,
            )
            T = jax.ops.segment_sum(
                packed, s_, num_segments=Pf, indices_are_sorted=True
            )
            acc = acc + T[:, : R + 1, : R + 1]
        else:
            T = jnp.ones((Pf, D + 2, D), jnp.float32)
        u_old = U[f_]
        if part in ("all", "chol"):
            S = T[:, : R + 1, : R + 1]
            A = S + 20.0 * jnp.eye(R + 1, dtype=jnp.float32)
            L = jnp.linalg.cholesky(A)
            rhs = jnp.einsum("pfg,pg->pf", S, u_old) + 1.0
            z1 = jax.scipy.linalg.solve_triangular(
                L, rhs[..., None], lower=True
            )
            u_new = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, -1, -2), z1 + noise[f_][..., None],
                lower=False,
            )[..., 0]
        else:
            u_new = u_old + 1e-6 * T[:, 0, : R + 1]
        delta = u_new - u_old
        if part in ("all", "scatter_update"):
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
            e1 = jax.nn.one_hot(1, D, dtype=jnp.float32)
            p = g + 0.5 * sgs[:, None] * e1 + g[:, 0:1] * sh
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

    dt = timed(run, G0, U0)
    print(f"part={part:18s}: {dt*1e3:8.2f} ms ({dt/C*1e6:7.1f} us/step)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for part in ("none", "gather_pack_seg", "chol", "scatter_update",
                 "all"):
        bench(part=part)

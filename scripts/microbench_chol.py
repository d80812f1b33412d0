"""In-scan batched small-matrix Cholesky: XLA builtin vs hand-unrolled.

The (R+1)-joint draw needs, per color step, `sample = A^{-1}rhs + L^{-T}xi`
for A = [Pf, R+1, R+1] SPD.  Measures a live (carry-dependent) scan body
doing just that, three ways."""

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


def unrolled_chol_solve_sample(A, rhs, xi):
    """sample = A^{-1} rhs + L^{-T} xi, fully unrolled over the small
    dimension; every intermediate is a [B]-vector op (vectorizes over
    the batch, no XLA loops)."""
    B, D, _ = A.shape
    # Cholesky: L columns built one at a time
    L = []  # L[j] is column j as [B, D] (rows < j are zero)
    for j in range(D):
        col = A[:, :, j]
        for k in range(j):
            col = col - L[k] * L[k][:, j : j + 1]
        dj = jnp.sqrt(col[:, j])
        colj = col / dj[:, None]
        # zero out rows above the diagonal
        mask = (jnp.arange(D) >= j).astype(A.dtype)
        L.append(colj * mask)
    # forward solve L z = rhs
    z = []
    for j in range(D):
        acc = rhs[:, j]
        for k in range(j):
            acc = acc - L[k][:, j] * z[k]
        z.append(acc / L[j][:, j])
    zv = jnp.stack(z, axis=1) + xi
    # back solve L^T s = zv
    s = [None] * D
    for j in reversed(range(D)):
        acc = zv[:, j]
        for k in range(j + 1, D):
            acc = acc - L[j][:, k] * s[k]
        s[j] = acc / L[j][:, j]
    return jnp.stack(s, axis=1)


def bench(method, C=704, Pf=256, D=11, unroll=4):
    rng = np.random.RandomState(0)
    base = jnp.asarray(
        np.tile((np.eye(D) * (D + 1.0)).astype(np.float32), (Pf, 1, 1))
    )
    rhs0 = jnp.asarray(rng.normal(size=(Pf, D)), jnp.float32)
    xi = jnp.asarray(rng.normal(size=(C, Pf, D)), jnp.float32)

    def body(carry, x):
        u = carry
        A = base + jnp.einsum("pf,pg->pfg", u, u) * 0.01
        rhs = rhs0 + u
        if method == "xla":
            L = jnp.linalg.cholesky(A)
            z1 = jax.scipy.linalg.solve_triangular(
                L, rhs[..., None], lower=True
            )
            s = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, -1, -2), z1 + x[..., None], lower=False
            )[..., 0]
        elif method == "unrolled":
            s = unrolled_chol_solve_sample(A, rhs, x)
        elif method == "solve":
            s = jnp.linalg.solve(A, (rhs + x)[..., None])[..., 0]
        return 0.5 * u + 0.01 * s, None

    @jax.jit
    def run(u0):
        out, _ = lax.scan(body, u0, xi, unroll=unroll)
        return out

    dt = timed(run, rhs0)
    print(f"{method:10s} Pf={Pf} D={D}: {dt*1e3:8.2f} ms "
          f"({dt/C*1e6:7.1f} us/step)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench("xla", Pf=8)  # warmup-ish + round-1 comparison point
    for m in ("xla", "unrolled", "solve"):
        for pf in (8, 64, 256):
            bench(m, Pf=pf)

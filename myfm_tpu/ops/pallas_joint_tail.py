"""Pallas TPU kernel: the joint sweep's sequential color tail in ONE
kernel launch.

The merged (R+1)-joint sweep (ops/joint.py) is dominated by its tail:
after the first few large graph colors, ML-100k-timesvdpp-like designs
leave ~1-2k sequential colors holding only 1-8 features each.  As a
``lax.scan`` each color step costs ~15 µs of scan machinery plus ~10
full HBM passes over the [D², B] Gram carry — ~40 µs for ~4 µs of real
work.  This kernel runs ALL tail colors inside one ``pallas_call``:

* the flat lanes-major Gram Ĝ [D², B] (plus the Atot/Ct accumulators)
  lives in VMEM scratch across the sequential TPU grid — zero HBM
  traffic for the carried state and zero per-step dispatch;
* per color the draw statistics come from ONE MXU ``dot_general``
  ``Ĝ [D², B] · Wᵀ [4Pf, B]`` contracted over B (the one-hot weights
  Σx²Ĝ/Σx³Ĝ/Σx⁴Ĝ/ΣxĜ for every feature simultaneously);
* the (R+1)-dim Gaussian draw replicates ops/joint.chol_solve_sample's
  hand-unrolled Cholesky on [Pf]-lane vectors (batch = feature slot);
* the update coefficients return to B-space through one more tiny dot
  ``[2+R, Pf] · [Pf, B]``, and Ĝ ← T Ĝ Tᵀ is applied as D slab
  updates of [D, B] — everything stays lanes-major.

The math is identical to the scan path step for step (same statistics,
same pivot clamp, same noise consumption); only float-op order
differs.  ``interpret=True`` (CPU) unrolls the grid into the jaxpr, so
it is for small test problems only — the production gate in
ops/joint.py uses the kernel on the TPU backend.

Reference context: this replaces the per-coordinate w/V scans of
FMTrainer.hpp:231-486 for the blocked-design tail at full blocking
granularity (the (R+1)-row draws of ops/joint.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _chol_solve_sample_lanes(Svv, rhs, xi, eps8, tiny, floor=None):
    """ops/joint.chol_solve_sample on lists of [Pf]-lane vectors.

    ``Svv``: list of lists, Svv[i][j] a [Pf] vector (i, j < Dp);
    ``rhs``/``xi``: lists of [Pf] vectors.  Returns the solution list.
    Identical recurrences and pivot clamp as the scan path; ``floor``
    is the per-coordinate exact pivot lower bound (the prior λ for
    A = αS + diag(λ) — see chol_solve_sample)."""
    Dp = len(rhs)
    cols = []  # cols[j][i] for i >= j: column j of L
    for j in range(Dp):
        col = [Svv[i][j] for i in range(Dp)]
        for k in range(j):
            ck = cols[k]
            col = [
                col[i] - ck[i - k] * ck[j - k] if i >= j else col[i]
                for i in range(Dp)
            ]
        floor_j = eps8 * jnp.abs(Svv[j][j]) + tiny
        if floor is not None:
            floor_j = jnp.maximum(floor_j, floor[j])
        pivot = jnp.maximum(col[j], floor_j)
        inv_d = jax.lax.rsqrt(pivot)
        colj = [pivot * inv_d] + [
            col[i] * inv_d for i in range(j + 1, Dp)
        ]
        cols.append(colj)
    z = []
    for j in range(Dp):
        acc = rhs[j]
        for k in range(j):
            acc = acc - cols[k][j - k] * z[k]
        z.append(acc / cols[j][0])
    zx = [z[j] + xi[j] for j in range(Dp)]
    s = [None] * Dp
    for j in reversed(range(Dp)):
        acc = zx[j]
        for k in range(j + 1, Dp):
            acc = acc - cols[j][k - j] * s[k]
        s[j] = acc / cols[j][0]
    return s


def _tail_kernel(
    xw_ref,    # [1, 1, B] f32 (leading singleton keeps the blocked
    segb_ref,  # [1, 1, B] int32  last-two dims Mosaic-legal: (1, B))
    u0_ref,    # [1, Dp, Pf] f32 (transposed stacks: minor = feature)
    lam_ref,   # [1, Dp, Pf]
    mu_ref,    # [1, Dp, Pf]
    xi_ref,    # [1, Dp, Pf]
    g_in_ref,  # [D2, B]
    at_in_ref,  # [R, B]
    ct_in_ref,  # [1, B]
    alpha_ref,  # [1, 1]
    # outputs
    u_out_ref,  # [1, Dp, Pf]
    g_out_ref,  # [D2, B]
    at_out_ref,  # [R, B]
    ct_out_ref,  # [1, B]
    # scratch
    g_s,   # [D2, B]
    at_s,  # [R, B]
    ct_s,  # [1, B]
    *,
    D: int,
    Pf: int,
):
    R = D - 2
    Dp = R + 1
    D2 = D * D
    dtype = g_in_ref.dtype
    eps8 = 8.0 * jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        g_s[...] = g_in_ref[...]
        at_s[...] = at_in_ref[...]
        ct_s[...] = ct_in_ref[...]

    xw = xw_ref[0, 0]  # [B]
    segb = segb_ref[0, 0]
    B = xw.shape[0]
    alpha = alpha_ref[0, 0]
    x2 = xw * xw

    # one-hot feature masks, lanes-major [Pf, B]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (Pf, B), 0)
    m_oh = (segb[None, :] == iota_p).astype(dtype)  # [Pf, B]

    # stats weights Wᵀ [4Pf, B]: x²·m | x³·m | x⁴·m | x·m
    WT = jnp.concatenate(
        [
            x2[None, :] * m_oh,
            (x2 * xw)[None, :] * m_oh,
            (x2 * x2)[None, :] * m_oh,
            xw[None, :] * m_oh,
        ],
        axis=0,
    )
    # TT [D², 4Pf] = Ĝ · Wᵀ contracted over B — the one MXU pass
    TT = jax.lax.dot_general(
        g_s[...], WT,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dtype,
        precision=_HI,
    )

    def G2(i, j):  # Σx²Ĝ[i, j] as [Pf]
        return TT[i * D + j, 0:Pf]

    def s3(j):  # Σx³Ĝ[0, j]
        return TT[j, Pf : 2 * Pf]

    x4c = TT[0, 2 * Pf : 3 * Pf]

    def w1(j):  # ΣxĜ[1, j]
        return TT[D + j, 3 * Pf : 4 * Pf]

    v = [u0_ref[0, 1 + r] for r in range(R)]  # v_old rows, [Pf] each
    s3c = s3(0)

    # S [Dp, Dp] of [Pf]-vectors (ops/joint module doc) and t [Dp]
    S = [[None] * Dp for _ in range(Dp)]
    S[0][0] = G2(0, 0)
    for r in range(R):
        S[0][1 + r] = G2(0, 2 + r) - s3c * v[r]
        S[1 + r][0] = S[0][1 + r]
    for r in range(R):
        for r2 in range(r, R):
            val = (
                G2(2 + r, 2 + r2)
                - v[r] * s3(2 + r2)
                - s3(2 + r) * v[r2]
                + x4c * v[r] * v[r2]
            )
            S[1 + r][1 + r2] = val
            S[1 + r2][1 + r] = val
    G2_01 = TT[1, 0:Pf]
    t = [w1(0)] + [w1(2 + r) - G2_01 * v[r] for r in range(R)]

    # A = αS + diag(λ); rhs = α(S·u_old − t) + λ∘μ   (ops/joint._draw_u)
    u0 = [u0_ref[0, i] for i in range(Dp)]
    lam = [lam_ref[0, i] for i in range(Dp)]
    mu = [mu_ref[0, i] for i in range(Dp)]
    xi = [xi_ref[0, i] for i in range(Dp)]
    A = [
        [
            alpha * S[i][j] + (lam[i] if i == j else 0.0)
            for j in range(Dp)
        ]
        for i in range(Dp)
    ]
    rhs = []
    for i in range(Dp):
        acc = S[i][0] * u0[0]
        for j in range(1, Dp):
            acc = acc + S[i][j] * u0[j]
        rhs.append(alpha * (acc - t[i]) + lam[i] * mu[i])

    u_new = _chol_solve_sample_lanes(A, rhs, xi, eps8, tiny, floor=lam)
    for i in range(Dp):
        u_out_ref[0, i] = u_new[i]

    # back to B-space: one dot [2+R, Pf]·[Pf, B]
    dw = u_new[0] - u0[0]
    dv = [u_new[1 + r] - u0[1 + r] for r in range(R)]
    c0 = v[0] * dv[0]
    for r in range(1, R):
        c0 = c0 + v[r] * dv[r]
    DM = jnp.stack([dw, c0] + dv, axis=0)  # [2+R, Pf]
    MB = jax.lax.dot_general(
        DM, m_oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
        precision=_HI,
    )  # [2+R, B]
    a0 = xw * MB[0] - x2 * MB[1]  # [B]
    A_B = xw[None, :] * MB[2:]  # [R, B]

    # Ct += a0 + Σ_r A_B·Atot (old Atot); then Atot += A_B
    ct_s[0] = ct_s[0] + a0 + jnp.sum(A_B * at_s[...], axis=0)
    at_s[...] = at_s[...] + A_B

    # Ĝ ← T Ĝ Tᵀ (ops/joint._update_gram_lanes), slab-wise
    s_rows = jnp.concatenate(
        [a0[None, :], jnp.zeros((1, B), dtype), A_B], axis=0
    )  # [D, B]
    sh = jnp.concatenate(
        [jnp.zeros((2, B), dtype), A_B], axis=0
    )  # ŝ: rows 0,1 zero
    g_rows = []
    col0_rows = []
    for i in range(D):
        slab = g_s[i * D : (i + 1) * D]  # [D, B] — rows Ĝ[i, :]
        g_rows.append(jnp.sum(slab * s_rows, axis=0))  # (Ĝ·s)[i]
        col0_rows.append(slab[0])  # Ĝ[i, 0] (flat row i·D)
    g = jnp.stack(g_rows, axis=0)  # [D, B]
    col0 = jnp.stack(col0_rows, axis=0)  # [D, B]
    sgs = jnp.sum(s_rows * g, axis=0)  # [B]
    p = g + g[0:1] * sh
    p = jnp.concatenate(
        [p[0:1], (p[1] + 0.5 * sgs)[None, :], p[2:]], axis=0
    )
    r_vec = col0 + 0.5 * col0[0:1] * sh  # [D, B]
    for i in range(D):
        corr = sh[i : i + 1] * r_vec + r_vec[i : i + 1] * sh
        if i == 1:
            corr = corr + p
        slab = g_s[i * D : (i + 1) * D]
        slab = slab + corr
        # the j == 1 column term p_i e₁ᵀ: row (i·D + 1) += p[i]
        slab = jnp.concatenate(
            [slab[0:1], (slab[1] + p[i])[None, :], slab[2:]], axis=0
        )
        g_s[i * D : (i + 1) * D] = slab

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        g_out_ref[...] = g_s[...]
        at_out_ref[...] = at_s[...]
        ct_out_ref[...] = ct_s[...]


_HW_CHECK_CACHE: dict = {}


def hw_self_check(verbose: bool = True, dims=None) -> bool:
    """One-time validation of the Mosaic lowering on the live backend.

    Builds a small deterministic tail problem and compares the compiled
    kernel against its own interpret-mode execution (which
    tests/test_pallas_joint_tail.py pins against the lax.scan path).
    ``dims`` is an optional ``(D, Pf, B)`` triple so callers (the
    trainer gate) can validate at their PRODUCTION block dims rather
    than the default stand-in (D = 12 i.e. rank 10, Pf = 8, B = 256)
    — a lowering that works at one shape is not guaranteed at another.
    Returns False — never raises — if the kernel fails to compile,
    crashes, or mismatches, so the auto gate can fall back to the
    scan path.  Result is cached per (backend, dims) for the process."""
    import sys

    try:
        backend = jax.default_backend()
    except Exception:
        return False
    dims = tuple(dims) if dims else (12, 8, 256)  # default stand-in
    cache_key = (backend, dims)
    if cache_key in _HW_CHECK_CACHE:
        return _HW_CHECK_CACHE[cache_key]
    if backend != "tpu":
        _HW_CHECK_CACHE[cache_key] = False
        return False

    import numpy as np

    ok = False
    try:
        D, Pf, B = dims
        C, R = 4, D - 2
        rng = np.random.RandomState(7)
        z = rng.normal(size=(4 * B, D)).astype(np.float32)
        z[:, 0] = 1.0
        mapper = rng.randint(0, B, 4 * B)
        G = np.zeros((B, D, D), np.float32)
        for n in range(4 * B):
            G[mapper[n]] += np.outer(z[n], z[n])
        G_flat = jnp.asarray(G.reshape(B, D * D).T.copy())
        xw = np.zeros((C, B), np.float32)
        segb = np.full((C, B), Pf, dtype=np.int32)
        for c in range(C):
            perm = rng.permutation(B)
            used = 0
            for p in range(Pf):
                k = rng.randint(1, max(2, B // (2 * Pf)))
                rows = perm[used : used + k]
                used += k
                segb[c, rows] = p
                xw[c, rows] = 1.0 + 0.1 * rng.random(k)
        u0 = (rng.normal(size=(C, Pf, R + 1)) * 0.3).astype(np.float32)
        lam = (np.abs(rng.normal(size=(C, Pf, R + 1))) + 0.5).astype(
            np.float32
        )
        mu = (rng.normal(size=(C, Pf, R + 1)) * 0.1).astype(np.float32)
        xi = rng.normal(size=(C, Pf, R + 1)).astype(np.float32)
        Atot = (rng.normal(size=(R, B)) * 0.05).astype(np.float32)
        Ct = (rng.normal(size=(B,)) * 0.05).astype(np.float32)
        args = (
            G_flat, jnp.asarray(Atot), jnp.asarray(Ct),
            jnp.asarray(xw), jnp.asarray(segb), jnp.asarray(u0),
            jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(xi), 1.3,
        )
        got = joint_tail_pass(*args, D=D, interpret=False)
        want = joint_tail_pass(*args, D=D, interpret=True)
        ok = all(
            np.allclose(
                np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4
            )
            for g, w in zip(got, want)
        )
        if verbose and not ok:
            print(
                "myfm_tpu: pallas joint-tail kernel MISMATCHED "
                "interpret mode on this backend; using lax.scan tail",
                file=sys.stderr, flush=True,
            )
    except Exception as exc:  # Mosaic lowering / runtime failure
        if verbose:
            print(
                "myfm_tpu: pallas joint-tail kernel unavailable "
                f"({type(exc).__name__}: {exc}); using lax.scan tail",
                file=sys.stderr, flush=True,
            )
        ok = False
    _HW_CHECK_CACHE[cache_key] = ok
    return ok


@functools.partial(
    jax.jit, static_argnames=("D", "interpret")
)
def joint_tail_pass(
    G,      # [D·D, B] flat lanes-major Gram
    Atot,   # [R, B]
    Ct,     # [B]
    xw,     # [C, B] f32
    segb,   # [C, B] int32
    u0,     # [C, Pf, R+1] pre-gathered weight rows
    lam,    # [C, Pf, R+1]
    mu,     # [C, Pf, R+1]
    xi,     # [C, Pf, R+1]
    alpha,  # scalar
    D: int,
    interpret: bool = False,
):
    """Run every tail color in one kernel.  Returns
    (G, Atot, Ct, u_new [C, Pf, R+1]) with semantics identical to the
    lax.scan over ops/joint step()."""
    C, B = xw.shape
    Pf = u0.shape[1]
    R = D - 2
    dtype = G.dtype
    # minor dim = feature slot so draw vectors are [Pf] on lanes
    u0_t = jnp.swapaxes(u0, 1, 2)
    lam_t = jnp.swapaxes(lam, 1, 2)
    mu_t = jnp.swapaxes(mu, 1, 2)
    xi_t = jnp.swapaxes(xi, 1, 2)
    Dp = R + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(C,),
        in_specs=[
            # xw/segb ride as [C, 1, B] so the per-color block's last
            # two dims are (1, B) — Mosaic requires the second-to-last
            # block dim divide 8 or equal the array dim, which a
            # (1, B) block over [C, B] violates for general C
            pl.BlockSpec((1, 1, B), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, Pf), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, Pf), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, Pf), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dp, Pf), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * D, B), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Dp, Pf), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D * D, B), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((D * D, B), dtype),
            pltpu.VMEM((R, B), dtype),
            pltpu.VMEM((1, B), dtype),
        ],
    )
    u_out, G_out, At_out, Ct_out = pl.pallas_call(
        functools.partial(_tail_kernel, D=D, Pf=Pf),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((C, Dp, Pf), dtype),
            jax.ShapeDtypeStruct((D * D, B), dtype),
            jax.ShapeDtypeStruct((R, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ),
        interpret=interpret,
    )(
        xw.astype(dtype)[:, None, :], segb.astype(jnp.int32)[:, None, :],
        u0_t, lam_t, mu_t,
        xi_t, G, Atot, Ct[None, :],
        jnp.asarray(alpha, dtype).reshape(1, 1),
    )
    return (
        G_out, At_out, Ct_out[0], jnp.swapaxes(u_out, 1, 2)
    )

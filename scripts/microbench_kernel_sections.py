"""Bisect the fused cross Gram kernel's per-row cost by compiling
stripped variants on synthetic tiles (hardware): which section —
operand DMA, cross sums, score, A-build, matmul, carry — owns the
measured ~15-20 ns/row?

Usage: python scripts/microbench_kernel_sections.py [T] [S] [rank]
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def variant_kernel(
    cont_in_ref, cont_out_ref, last_slot_ref,
    *refs, n_cross, level, fast_matmul,
):
    """level:
    0 = DMA only: out written from a constant-ish op on aux
    1 = + matmul of a trivial A (= gth0 widened) — isolates dot+DMA
    2 = + cross sums + score (no A/z build; A from gth0)
    3 = + z fill + A build (masked repeat)  [= full kernel]
    """
    aux_ref = refs[0]
    gth_refs = refs[1 : 1 + n_cross]
    wvsl_ref = refs[1 + n_cross]
    carry_in_ref = refs[2 + n_cross]
    out_ref, carry_out_ref = refs[3 + n_cross : 5 + n_cross]
    a_ref, z_ref, carry_ref = refs[5 + n_cross :]

    _, T, _ = aux_ref.shape
    R = wvsl_ref.shape[2] - 2
    D = R + 2
    T_, Dp = z_ref.shape
    SDp = a_ref.shape[1]
    S = SDp // Dp
    dtype = z_ref.dtype
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = carry_in_ref[...]

    aux = aux_ref[0]
    if level == 0:
        out_ref[0] = (
            jnp.zeros(out_ref.shape[1:], dtype) + aux[0, 1]
            + gth_refs[0][0, 0, 0] + gth_refs[1][0, 0, 0]
            + wvsl_ref[0, 0, 0]
        )
        carry_out_ref[...] = carry_ref[...]
        return

    if level >= 2:
        slot = aux[:, 0].astype(jnp.int32)
        ones = aux[:, 2]
        lin_o = jnp.zeros((T,), dtype)
        qs_o = jnp.zeros((T,), dtype)
        Q_o = jnp.zeros((T, R), dtype)
        for c in range(n_cross):
            gth = gth_refs[c][0]
            lin_o = lin_o + gth[:, 0]
            qs_o = qs_o + gth[:, 1 + R]
            Q_o = Q_o + gth[:, 1 : 1 + R]
        iota_s = jax.lax.broadcasted_iota(
            jnp.int32, (T, wvsl_ref.shape[1]), 1
        )
        m = (slot[:, None] == iota_s).astype(dtype) * ones[:, None]
        own = jax.lax.dot_general(
            m, wvsl_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        qf = Q_o + own[:, 1 : 1 + R]
        score = (
            aux[:, 1] + lin_o + own[:, 0]
            + 0.5 * (jnp.sum(qf * qf, axis=1) - qs_o - own[:, 1 + R])
        )
        e = score * ones

    if level == 3:
        z_ref[...] = jnp.zeros((T, Dp), dtype)
        z_ref[:, 0] = ones
        z_ref[:, 1] = e
        z_ref[:, 2:D] = Q_o
        z = z_ref[...]
        z_til = pltpu.repeat(z[:, :Dp], S, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, S * Dp), 1)
        msk = slot[:, None] == (iota // Dp)
        a_ref[...] = z_til * msk.astype(dtype)
    else:
        # trivial A: first S*Dp lanes of gth0 tiled (bitwise junk but
        # same shapes) — isolates the matmul+DMA from the build
        g0 = gth_refs[0][0]
        a_ref[...] = pltpu.repeat(
            jnp.concatenate(
                [g0, jnp.zeros((T, Dp - g0.shape[1]), dtype)], axis=1
            )[:, :Dp],
            S, axis=1,
        )
        if level >= 2:
            z_ref[...] = jnp.zeros((T, Dp), dtype)
            z_ref[:, 1] = e
        else:
            z_ref[...] = jnp.zeros((T, Dp), dtype)

    zd = z_ref[:, :D]
    a = a_ref[...]
    if fast_matmul == "bf16":
        out_ref[0] = jax.lax.dot_general(
            a.astype(jnp.bfloat16), zd.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )
    else:
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(dtype)).astype(jnp.bfloat16)
        z_hi = zd.astype(jnp.bfloat16)
        z_lo = (zd - z_hi.astype(dtype)).astype(jnp.bfloat16)

        def bdot(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        out_ref[0] = bdot(a_hi, z_hi) + bdot(a_hi, z_lo) + bdot(
            a_lo, z_hi
        )

    @pl.when(cont_in_ref[g] > 0)
    def _():
        out_ref[0, 0:D, :] += carry_ref[...]

    @pl.when(cont_out_ref[g] > 0)
    def _():
        off = pl.multiple_of(last_slot_ref[g] * Dp, 8)
        carry_ref[...] = out_ref[0, pl.ds(off, D), :]

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        carry_out_ref[...] = carry_ref[...]


def run_variant(aux, gths, wvsl, ci, co, ls, S, level, fast_matmul):
    n_cross = len(gths)
    K, T, _ = aux.shape
    W = wvsl.shape[2]
    R = W - 2
    D = R + 2
    Dp = -(-D // 8) * 8
    carry_in = jnp.zeros((D, D), wvsl.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, T, 3), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, T, W), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_cross)
        ]
        + [
            pl.BlockSpec((1, S, W), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S * Dp, D), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, S * Dp), wvsl.dtype),
            pltpu.VMEM((T, Dp), wvsl.dtype),
            pltpu.VMEM((D, D), wvsl.dtype),
        ],
    )
    out, carry_out = pl.pallas_call(
        functools.partial(
            variant_kernel, n_cross=n_cross, level=level,
            fast_matmul=fast_matmul,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, S * Dp, D), wvsl.dtype),
            jax.ShapeDtypeStruct((D, D), wvsl.dtype),
        ),
    )(ci, co, ls, aux, *gths, wvsl, carry_in)
    return out


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rank = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    print(f"devices: {jax.devices()} T={T} S={S} rank={rank}",
          flush=True)
    rng = np.random.RandomState(0)
    N_TARGET = 4_000_000
    K = max(1, N_TARGET // T)
    NT = K * T
    aux = rng.normal(size=(K, T, 3)).astype(np.float32)
    slot = np.sort(rng.randint(0, S, (K, T)).astype(np.float32), axis=1)
    aux[:, :, 0] = slot
    aux[:, :, 2] = 1.0
    gths = tuple(
        jnp.asarray(
            (rng.normal(size=(K, T, 2 + rank)) * 0.1).astype(np.float32)
        )
        for _ in range(2)
    )
    wvsl = jnp.asarray(
        (rng.normal(size=(K, S, 2 + rank)) * 0.1).astype(np.float32)
    )
    ci = jnp.zeros((K,), jnp.int32)
    co = jnp.zeros((K,), jnp.int32)
    ls = jnp.full((K,), S - 1, jnp.int32)
    aux_d = jnp.asarray(aux)

    labels = {
        0: "DMA only (no compute)",
        1: "DMA + A-fill + matmul",
        2: "DMA + cross/score + trivial A + matmul",
        3: "full kernel",
    }
    for level in (0, 1, 2, 3):
        for mode in ("split",) if level != 1 else ("split", "bf16"):
            f = jax.jit(functools.partial(
                run_variant, S=S, level=level, fast_matmul=mode
            ))
            try:
                dt = timed(f, aux_d, gths, wvsl, ci, co, ls)
            except Exception as exc:
                print(f"L{level} {mode}: FAILED {exc!r:.100}", flush=True)
                continue
            print(
                f"L{level} {mode:5s} ({labels[level]}): "
                f"{dt*1e3:7.1f} ms {dt/NT*1e9:6.2f} ns/row",
                flush=True,
            )


if __name__ == "__main__":
    main()

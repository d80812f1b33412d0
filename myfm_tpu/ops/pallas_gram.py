"""Pallas TPU kernel: per-entity Gram matrices over sorted row tiles.

The categorical fast path (ops/categorical.py) needs, per table,

    G_u = sum_{rows n of entity u} z_n z_n^T,   z_n = [1 | e_n | phi_n]

for all B entities at once.  Rows are pre-sorted by entity and packed
into tiles of T rows spanning at most S entities each
(design_categorical._pack_tiles).  Per grid step (one tile) the kernel

1. reconstructs the own-table contribution (own = M @ [w|V] slot
   slice) and z = [1 | e | phi] entirely in VMEM — the fused kernel's
   inputs are just the OTHER tables' gathered sums;
2. materialises A[t, s*D + d] = M[t, s] * z[t, d] with two whole-array
   vector ops (block-tiled z via pltpu.repeat x an iota//D slot
   compare) and computes all S partial Grams with ONE MXU matmul
   A^T @ z -> [S*D, D] at HIGHEST precision (the default TPU matmul
   runs bf16 passes, ~1e-3 relative error — enough to bias the Gibbs
   sufficient statistics; Mosaic does not support HIGH);
3. carries the running Gram of an entity that spans a tile boundary
   into the next tile through a VMEM scratch accumulator (the TPU grid
   is sequential) and across chunked invocations via carry_in/out, so
   every entity's complete Gram lands in one known (tile, slot) —
   consumed per chunk by the caller (design_categorical precomputes
   `final_part` / the `fin_*` windows).

This replaces the reference's per-coordinate residual-cache updates
(include/myfm/FMTrainer.hpp:316-486) as the sweep's dominant compute.
TPU scalar scatter/gather measures ~1000x off memory speed-of-light,
while this formulation is MXU/VPU-bound (~13 ms per 1e6 rows at
D = 34 on v5e with T = 1024).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(
    # scalar-prefetch operands
    cont_in_ref,  # [K] int32 — tile starts with a continued entity
    cont_out_ref,  # [K] int32 — tile's last entity continues into next
    last_slot_ref,  # [K] int32 — slot index of tile's last entity
    # array operands
    slot_ref,  # [1, T, 1] int32
    rows_ref,  # [1, T, D] f32
    carry_in_ref,  # [D, D] f32 — carry entering this chunk of tiles
    # outputs
    out_ref,  # [1, S*D, D] f32
    carry_out_ref,  # [D, D] f32 — carry leaving this chunk
    # scratch
    a_ref,  # [T, S*D] f32
    carry_ref,  # [D, D] f32
):
    _, T, D = rows_ref.shape
    SD = out_ref.shape[1]
    S = SD // D
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = carry_in_ref[...]

    z = rows_ref[0]  # [T, D]
    slot = slot_ref[0, :, 0]  # [T]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    m = (slot[:, None] == iota_s).astype(z.dtype)  # [T, S]
    for s in range(S):
        a_ref[:, s * D : (s + 1) * D] = z * m[:, s][:, None]
    out_ref[0] = jax.lax.dot_general(
        a_ref[...],
        z,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=z.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(cont_in_ref[g] > 0)
    def _():
        # slot 0 continues the previous tile's last entity
        out_ref[0, 0:D, :] += carry_ref[...]

    @pl.when(cont_out_ref[g] > 0)
    def _():
        off = last_slot_ref[g] * D
        carry_ref[...] = out_ref[0, pl.ds(off, D), :]

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        carry_out_ref[...] = carry_ref[...]


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def tile_gram(
    rows: jax.Array,  # [K, T, D] f32 — tile rows (pads are zero rows)
    slot: jax.Array,  # [K, T] int32 — local entity slot per row
    cont_in: jax.Array,  # [K] int32
    cont_out: jax.Array,  # [K] int32
    last_slot: jax.Array,  # [K] int32 — slot of tile's last entity
    S: int,
    carry_in: Optional[jax.Array] = None,  # [D, D]
    interpret: bool = False,
):
    """Returns (flat partial Grams [K*S, D, D], carry_out [D, D]).

    ``carry_in``/``carry_out`` thread an entity's running Gram across
    chunked invocations (ops/categorical.py scans over tile chunks to
    bound HBM working set)."""
    K, T, D = rows.shape
    if carry_in is None:
        carry_in = jnp.zeros((D, D), rows.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, T, 1), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, S * D, D), lambda k, *_: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((D, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, S * D), rows.dtype),
            pltpu.VMEM((D, D), rows.dtype),
        ],
    )
    out, carry_out = pl.pallas_call(
        _gram_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, S * D, D), rows.dtype),
            jax.ShapeDtypeStruct((D, D), rows.dtype),
        ),
        interpret=interpret,
    )(cont_in, cont_out, last_slot, slot.reshape(K, T, 1), rows,
      carry_in)
    return out.reshape(K * S, D, D), carry_out


def _fused_gram_kernel(
    # scalar prefetch
    cont_in_ref,  # [K] int32
    cont_out_ref,  # [K] int32
    last_slot_ref,  # [K] int32
    # array operands
    slot_ref,  # [1, T, 1] int32
    meta_ref,  # [1, T, 3] f32: [ones | lin−tau(+w0) | qs_other]
    q_ref,  # [1, T, R] f32: Q_other (= phi for one-hot tables)
    wvsl_ref,  # [1, S, 1+R] f32: own [w | V] rows per slot
    carry_in_ref,  # [D, D]
    # outputs
    out_ref,  # [1, S*Dp, D]  (Dp = D rounded up to 8: slot stride)
    carry_out_ref,  # [D, D]
    # scratch
    a_ref,  # [T, S*Dp]
    z_ref,  # [T, Dp]  (columns >= D stay zero)
    carry_ref,  # [D, D]
    *,
    interpret_build: bool = False,
    fast_matmul: bool = False,
    out_rows: Optional[int] = None,
):
    """Fused Gram: reconstructs the own-table contribution via a
    one-hot matmul from the tiny per-tile [S, 1+R] weight slice, builds
    z = [1 | e | phi] in VMEM, and accumulates all S partial Grams with
    one MXU matmul.  For one-hot tables phi = q − v_own is exactly the
    OTHER tables' factor sum, so the caller never gathers own rows at
    [N] scale, and no [N, D] z array ever exists in HBM."""
    _, T, _ = meta_ref.shape
    D = out_ref.shape[2]
    S = wvsl_ref.shape[1]
    # q_ref may carry extra trailing z-columns beyond the own-table
    # factor count (e.g. the VI variance sums); the own rank is the
    # weight-slice width minus the linear column.
    R = wvsl_ref.shape[2] - 1
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = carry_in_ref[...]

    slot = slot_ref[0, :, 0]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    meta = meta_ref[0]
    ones = meta[:, 0]
    m = (slot[:, None] == iota_s).astype(meta.dtype) * ones[:, None]
    own = jax.lax.dot_general(  # [T, 1+R] = M @ own-slot weights
        m,
        wvsl_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=meta.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    phi_all = q_ref[0]  # [T, D-2]: Q_other (+ extra z-columns)
    phi = phi_all[:, :R]  # Q_other == q − v_own for one-hot tables
    qf = phi + own[:, 1:]
    score = (
        meta[:, 1]
        + own[:, 0]
        + 0.5
        * (
            jnp.sum(qf * qf, axis=1)
            - meta[:, 2]
            - jnp.sum(own[:, 1:] ** 2, axis=1)
        )
    )
    e = score * ones
    _emit_gram_tail(
        g, slot, ones, e, phi_all,
        cont_in_ref, cont_out_ref, last_slot_ref,
        out_ref, carry_out_ref, a_ref, z_ref, carry_ref,
        interpret_build=interpret_build, fast_matmul=fast_matmul,
        out_rows=out_rows,
    )


def _emit_gram_tail(
    g, slot, ones, e, phi_all,
    cont_in_ref, cont_out_ref, last_slot_ref,
    out_ref, carry_out_ref, a_ref, z_ref, carry_ref,
    *, interpret_build: bool, fast_matmul: bool,
    out_rows: Optional[int] = None,
    is_last=None,
    oi=(0,),
):
    """Shared Gram tail: fill z = [1 | e | phi], build the slot-masked
    A matrix, run the MXU matmul, and thread the cross-tile carry.

    ``oi`` is the static index prefix of the CURRENT TILE inside
    ``out_ref`` ((0,) for [1, S*Dpr, D] blocks, (0, i) for the
    G-batched [1, G, S*Dpr, D] blocks — direct tuple indexing, NOT
    ``ref.at`` sub-refs, which Mosaic rejects on 128-unaligned last
    dims); ``g`` is the tile's GLOBAL index into the scalar-prefetch
    arrays; ``is_last`` (default: last grid step) tells the tail when
    to flush carry_out.

    ``out_rows`` (default: full D) emits only the Gram's first
    ``out_rows`` ROWS (all D columns) — the entity+attribute VI
    consumers never read the variance-column × variance-column block,
    and the rectangle is ~D/out_rows× cheaper to multiply, store, and
    evolve."""
    T, Dp = z_ref.shape
    D = out_ref.shape[-1]
    rows_eff = D if out_rows is None else out_rows
    # slot stride of the A matrix / out rows (8-aligned)
    Dpr = carry_ref.shape[0] if out_rows is not None else Dp
    SDp = a_ref.shape[1]
    S = SDp // Dpr
    dtype = z_ref.dtype
    if Dp > D:
        z_ref[...] = jnp.zeros((T, Dp), dtype)
    z_ref[:, 0] = ones
    z_ref[:, 1] = e
    z_ref[:, 2:D] = phi_all
    # A[t, s*Dpr + d] = z[t, d] * m[t, s], built with two whole-array
    # vector ops instead of S strided slice writes (which dominated
    # kernel time at S = 16).  The slot stride Dpr is 8-aligned so the
    # dynamic carry slice below is provably sublane-aligned.
    z = z_ref[...]
    if interpret_build:
        m = (
            slot[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        ).astype(dtype) * ones[:, None]
        zr = z[:, :Dpr]
        if rows_eff < Dpr:
            zr = zr * (
                jax.lax.broadcasted_iota(jnp.int32, (T, Dpr), 1)
                < rows_eff
            ).astype(dtype)
        a_ref[...] = (m[:, :, None] * zr[:, None, :]).reshape(
            T, S * Dpr
        )
    else:
        # pltpu.repeat is a block-tile repeat ([z|z|..|z]) — exactly
        # the z layout needed; the slot mask comes from an iota//Dpr
        # compare (pad rows have all-zero z, so no extra masking; for
        # a rectangle the same compare also zeroes the stride-pad
        # columns rows_eff..Dpr-1, which hold real z columns there)
        z_til = pltpu.repeat(z[:, :Dpr], S, axis=1)  # [T, S*Dpr]
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, S * Dpr), 1)
        s_of_col = iota // Dpr
        msk = slot[:, None] == s_of_col
        if rows_eff < Dpr:
            msk = jnp.logical_and(msk, iota % Dpr < rows_eff)
        a_ref[...] = z_til * msk.astype(z.dtype)
    mode = (
        fast_matmul
        if isinstance(fast_matmul, str)
        else ("split" if fast_matmul else "highest")
    )
    if mode == "bf16":
        # single-pass bf16 Gram matmul (~4e-3 relative: each operand
        # rounds once to 8 mantissa bits; f32 accumulation).  A THIRD
        # of the split mode's MXU passes — the only way rank-128 Grams
        # (D = 130 spans 2 lane tiles, S*Dp several) clear the systolic
        # pass floor.  Auto-gated by the trainers to Gibbs f32 at
        # rank >= 64 after an on-device self-check: the Gibbs draw adds
        # posterior noise >= 1/sqrt(count) per entity, orders above
        # 4e-3; the deterministic VI fixpoint keeps the split path.
        out_ref[oi] = jax.lax.dot_general(
            a_ref[...].astype(jnp.bfloat16),
            z_ref[:, :D].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )
    elif mode == "split":
        # 3-pass bf16-split Gram matmul: G = A_hi·z_hi + A_hi·z_lo
        # + A_lo·z_hi (the lo·lo term is below f32 epsilon).  Each
        # operand splits into hi = bf16(x) and lo = bf16(x − hi), so
        # the product carries ~16 mantissa bits (~1.5e-5 relative) vs
        # HIGHEST's 6-pass ~2e-7 — at HALF the MXU passes, which are
        # the kernel's measured floor (~6.5 ns/row of the ~7 total at
        # S ≤ 4 on v5e).  Gated by the trainers to float32 on the real
        # TPU: statistical aggregates over 1e2-1e4 rows carry
        # sampling noise orders of magnitude above 1e-5 relative; f64
        # runs and CPU tests keep the HIGHEST path.
        a = a_ref[...]
        zd = z_ref[:, :D]
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(a.dtype)).astype(jnp.bfloat16)
        z_hi = zd.astype(jnp.bfloat16)
        z_lo = (zd - z_hi.astype(zd.dtype)).astype(jnp.bfloat16)

        def bdot(x, y):
            return jax.lax.dot_general(
                x, y,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )

        out_ref[oi] = bdot(a_hi, z_hi) + bdot(a_hi, z_lo) + bdot(
            a_lo, z_hi
        )
    else:
        out_ref[oi] = jax.lax.dot_general(
            a_ref[...],
            z_ref[:, :D],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,  # Mosaic supports
            # only DEFAULT (bf16) and HIGHEST; HIGH raises
            # NotImplementedError
        )

    CR = carry_ref.shape[0]  # D (full) or Dpr (rectangle)

    @pl.when(cont_in_ref[g] > 0)
    def _():
        out_ref[oi + (pl.ds(0, CR), slice(None))] += carry_ref[...]

    @pl.when(cont_out_ref[g] > 0)
    def _():
        off = pl.multiple_of(last_slot_ref[g] * Dpr, 8)
        carry_ref[...] = out_ref[oi + (pl.ds(off, CR), slice(None))]

    if is_last is None:
        is_last = g == pl.num_programs(0) - 1

    @pl.when(is_last)
    def _():
        carry_out_ref[...] = carry_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("S", "interpret", "fast_matmul", "out_rows"),
)
def fused_tile_gram(
    meta: jax.Array,  # [K, T, 3]: [ones | lin−tau(+w0) | qs_other]
    q_other: jax.Array,  # [K, T, R]
    slot: jax.Array,  # [K, T] int32
    wvsl: jax.Array,  # [K, S, 1+R]
    cont_in: jax.Array,
    cont_out: jax.Array,
    last_slot: jax.Array,
    S: int,
    carry_in: Optional[jax.Array] = None,
    interpret: bool = False,
    fast_matmul: bool = False,
    out_rows: Optional[int] = None,
):
    """Returns (flat partial Grams [K*S, Dp, D], carry_out) with
    Dp = D rounded up to a multiple of 8 (rows D..Dp-1 are zero).

    ``q_other`` may carry extra trailing z-columns beyond the own
    factor count (width of ``wvsl`` minus one) — e.g. the VI variance
    sums — which enter the Gram verbatim as additional z entries.

    ``out_rows`` restricts the emitted Grams to their first
    ``out_rows`` ROWS (all D columns): out [K*S, Dpr, D] and carry
    [Dpr, D] with Dpr = roundup(out_rows, 8).  The VI consumers only
    ever read rows [1 | e | q], so the rectangle cuts the matmul,
    store, and downstream traffic by ~D/out_rows."""
    K, T, R = q_other.shape
    D = R + 2
    W = wvsl.shape[2]
    Dp = -(-D // 8) * 8
    if out_rows is None:
        Dpr, CR = Dp, D
    else:
        Dpr = -(-out_rows // 8) * 8
        CR = Dpr
    if carry_in is None:
        carry_in = jnp.zeros((CR, D), q_other.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, T, 1), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, R), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, W), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CR, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S * Dpr, D), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CR, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, S * Dpr), q_other.dtype),
            pltpu.VMEM((T, Dp), q_other.dtype),
            pltpu.VMEM((CR, D), q_other.dtype),
        ],
    )
    out, carry_out = pl.pallas_call(
        functools.partial(
            _fused_gram_kernel, interpret_build=interpret,
            fast_matmul=fast_matmul, out_rows=out_rows,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, S * Dpr, D), q_other.dtype),
            jax.ShapeDtypeStruct((CR, D), q_other.dtype),
        ),
        interpret=interpret,
    )(cont_in, cont_out, last_slot, slot.reshape(K, T, 1), meta,
      q_other, wvsl, carry_in)
    return out.reshape(K * S, Dpr, D), carry_out


def _fused_gram_cross_kernel(
    # scalar prefetch
    cont_in_ref,  # [K] int32
    cont_out_ref,  # [K] int32
    last_slot_ref,  # [K] int32
    # array operands: aux, n_cross gathered cross tables, wvsl, carry
    *refs,
    n_cross: int,
    interpret_build: bool = False,
    fast_matmul: bool = False,
    q_lo: int = 1,
    n_extra: int = 0,
    out_rows: Optional[int] = None,
):
    """Cross-absorbing fused Gram: consumes the OTHER tables' gathered
    [w | V | qs] rows ([T, 2+R] each, straight out of the XLA gathers)
    plus one lane-dense (slot, τ) operand, and performs the cross sums
    (lin, Q, qs) on the VPU in VMEM.

    Operand blocks batch G = aux_ref.shape[1] tiles per grid step (a
    static in-kernel loop): the measured ~2.7 µs per-grid-step
    overhead (DMA issue + semaphores + carry branches) was HALF the
    kernel wall at T = 256 — G amortizes it G-fold for the same
    bytes.

    ``q_lo``/``n_extra`` parametrize the gather layout so the VI path
    shares the kernel: gth columns are [lin-ish.. | z-cols | qs] with
    the z block (R own-factor columns THEN n_extra ride-along columns,
    e.g. the VI σ/sv̄ variance sums) starting at ``q_lo`` and
    qs at column q_lo + R + n_extra.  The Gibbs layout is
    (q_lo=1, n_extra=0); the VI ext layout [w | wvar | V | σ | sv | qs]
    is (q_lo=2, n_extra=2R).  ``out_rows`` emits only the Gram's first
    rows (the VI consumers read the [1 | e | q] rectangle).  This
    removes the [N, R]-scale slice-add materialisations, the meta
    stack, and the slot layout copies that the separate-meta kernel
    forced between the gathers and the matmul (measured ~150 ms of a
    606 ms ML-10M rank-32 sweep); the gather outputs feed the kernel
    as-is (a bitcast, no relayout).

    The kernel is BANDWIDTH-bound, not MXU-bound (measured 2026-08-20:
    split ≈ bf16 ns/row at every tiling, a DMA-only variant at ~80% of
    the full kernel, and ~110-150 GB/s real streaming on this device —
    scripts/microbench_kernel_ts / microbench_kernel_sections /
    microbench_hbm).  Two consequences shape the operand layout:

    - each gathered row carries its squared-factor sum qs = Σᵢx²V²
      PRECOMPUTED in the [B]-sized source ([w | V | qs]) — the
      per-cross square + 128-lane reduction collapses to one lane add;
    - the per-row side data is just (slot, τ), fed as ONE LANE-DENSE
      [K, 2, T] array (8 B/row logical) instead of a 128-lane-padded
      [K, T, c] aux (512 B/row written + read per sweep); the kernel
      transposes the [2, T] pair to row-major with one tiny MXU dot.
      w0 is NOT an operand: e is built without it and the consumers
      apply the exact rank-1 correction (z₁ += w0·z₀) to the Gram
      statistics downstream (_entity_draws / _ea_table_pass)."""
    aux_ref = refs[0]  # [1, G, 2, T]: (slot_f, tau) rows, lane-major
    gth_refs = refs[1 : 1 + n_cross]  # each [1, G, T, W]
    wvsl_ref = refs[1 + n_cross]  # [1, G, S, W_own]
    carry_in_ref = refs[2 + n_cross]
    out_ref, carry_out_ref = refs[3 + n_cross : 5 + n_cross]
    a_ref, z_ref, carry_ref = refs[5 + n_cross :]

    _, G, _, T = aux_ref.shape
    S_own = wvsl_ref.shape[2]
    R = wvsl_ref.shape[3] - 2
    dtype = z_ref.dtype
    gg = pl.program_id(0)

    @pl.when(gg == 0)
    def _():
        carry_ref[...] = carry_in_ref[...]

    eye2 = (
        jax.lax.broadcasted_iota(jnp.int32, (2, 2), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (2, 2), 1)
    ).astype(dtype)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (T, S_own), 1)
    n_z = R + n_extra
    qs_col = q_lo + n_z
    for i in range(G):
        g = gg * G + i  # global tile index (scalar-prefetch arrays)
        # [2, T] lane-major (slot, tau) -> [T, 2] row-major via MXU
        at = jax.lax.dot_general(
            aux_ref[0, i], eye2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, 2]
        slot = at[:, 0].astype(jnp.int32)  # pad rows: slot == S_own
        tau = at[:, 1]
        ones = (slot < S_own).astype(dtype)
        lin_o = jnp.zeros((T,), dtype)
        qs_o = jnp.zeros((T,), dtype)
        Z_o = jnp.zeros((T, n_z), dtype)
        for c in range(n_cross):
            gth = gth_refs[c][0, i]  # [T, ...]: [.. | z-cols | qs]
            lin_o = lin_o + gth[:, 0]
            qs_o = qs_o + gth[:, qs_col]
            if n_z:
                Z_o = Z_o + gth[:, q_lo : q_lo + n_z]
        m = (slot[:, None] == iota_s).astype(dtype)  # pad: all-zero
        own = jax.lax.dot_general(  # [T, 2+R] = M @ own-slot weights
            m,
            wvsl_ref[0, i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        qf = Z_o[:, :R] + own[:, 1 : 1 + R]
        score = (
            lin_o
            - tau
            + own[:, 0]
            + 0.5
            * (jnp.sum(qf * qf, axis=1) - qs_o - own[:, 1 + R])
        )
        e = score * ones
        _emit_gram_tail(
            g, slot, ones, e, Z_o,
            cont_in_ref, cont_out_ref, last_slot_ref,
            out_ref, carry_out_ref, a_ref, z_ref, carry_ref,
            interpret_build=interpret_build, fast_matmul=fast_matmul,
            out_rows=out_rows, oi=(0, i),
            is_last=(
                (gg == pl.num_programs(0) - 1)
                if i == G - 1
                else (gg < 0)  # traced always-False
            ),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "interpret", "fast_matmul", "q_lo", "n_extra", "out_rows",
        "tiles_per_step",
    ),
)
def fused_tile_gram_cross(
    aux2: jax.Array,  # [K, 2, T] f32 lane-dense (slot_f, tau) rows;
    #     slot_f carries S on pad rows (validity is slot_f < S)
    gths,  # tuple of [K, T, 2+R] — others' gathered [w | V | qs] rows
    wvsl: jax.Array,  # [K, S, 2+R] own [w | V | qs] rows per slot
    cont_in: jax.Array,
    cont_out: jax.Array,
    last_slot: jax.Array,
    S: int,
    carry_in: Optional[jax.Array] = None,
    interpret: bool = False,
    fast_matmul: bool = False,
    q_lo: int = 1,
    n_extra: int = 0,
    out_rows: Optional[int] = None,
    tiles_per_step: int = 1,
):
    """Cross-absorbing variant of ``fused_tile_gram``: same flat
    partial-Gram output contract, but the kernel consumes the raw
    cross-table gather outputs (each row carrying its precomputed
    qs = Σx²V² column) plus one lane-dense per-row (slot, τ) operand,
    and packs lin/Q/qs sums on the VPU.  NOTE: e excludes w0 —
    consumers apply the exact rank-1 w0 correction to the Gram
    statistics.  ``tiles_per_step`` batches G tiles per grid step
    (gram_tiles_per_step picks the VMEM-feasible G).

    ``q_lo``/``n_extra``/``out_rows`` select the gather layout and
    output rectangle (see the kernel docstring); the defaults are the
    Gibbs [w | V | qs] layout with the full square Gram."""
    gths = tuple(gths)
    n_cross = len(gths)
    K, _, T = aux2.shape
    W_own = wvsl.shape[2]
    R = W_own - 2
    W_gth = gths[0].shape[2] if gths else W_own
    n_z = R + n_extra
    assert W_gth == q_lo + n_z + 1, (W_gth, q_lo, R, n_extra)
    D = n_z + 2
    Dp = -(-D // 8) * 8
    if out_rows is None:
        Dpr, CR = Dp, D
    else:
        Dpr = -(-out_rows // 8) * 8
        CR = Dpr
    if carry_in is None:
        carry_in = jnp.zeros((CR, D), wvsl.dtype)
    # largest step batch that divides K (callers size chunks in powers
    # of two, so production K hits the full tiles_per_step)
    G = 1
    for cand in range(min(tiles_per_step, K), 0, -1):
        if K % cand == 0:
            G = cand
            break
    KG = K // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(KG,),
        in_specs=[
            pl.BlockSpec((1, G, 2, T), lambda k, *_: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, G, T, W_gth),
                         lambda k, *_: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_cross)
        ]
        + [
            pl.BlockSpec((1, G, S, W_own),
                         lambda k, *_: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CR, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, G, S * Dpr, D),
                         lambda k, *_: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CR, D), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, S * Dpr), wvsl.dtype),
            pltpu.VMEM((T, Dp), wvsl.dtype),
            pltpu.VMEM((CR, D), wvsl.dtype),
        ],
    )
    out, carry_out = pl.pallas_call(
        functools.partial(
            _fused_gram_cross_kernel, n_cross=n_cross,
            interpret_build=interpret, fast_matmul=fast_matmul,
            q_lo=q_lo, n_extra=n_extra, out_rows=out_rows,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((KG, G, S * Dpr, D), wvsl.dtype),
            jax.ShapeDtypeStruct((CR, D), wvsl.dtype),
        ),
        interpret=interpret,
    )(
        cont_in, cont_out, last_slot,
        aux2.reshape(KG, G, 2, T),
        *(gth.reshape(KG, G, T, W_gth) for gth in gths),
        wvsl.reshape(KG, G, S, W_own),
        carry_in,
    )
    return out.reshape(K * S, Dpr, D), carry_out


def fused_tile_gram_cross_reference(
    aux2, gths, wvsl, cont_in, cont_out, last_slot, S,
    carry_in=None, q_lo=1, n_extra=0,
):
    """jnp oracle of fused_tile_gram_cross (flat [K*S, D, D] output —
    note: NOT Dp-strided like the kernel, and always the full square
    Gram; compare via final_part indices scaled accordingly or reshape
    both to [K, S, ...])."""
    slot_f = aux2[:, 0, :]
    tau = aux2[:, 1, :]
    K, T = slot_f.shape
    R = wvsl.shape[2] - 2
    n_z = R + n_extra
    qs_col = q_lo + n_z
    D = n_z + 2
    dtype = wvsl.dtype
    slot = slot_f.astype(jnp.int32)
    ones = (slot < S).astype(dtype)
    lin_o = jnp.zeros((K, T), dtype)
    qs_o = jnp.zeros((K, T), dtype)
    Z_o = jnp.zeros((K, T, n_z), dtype)
    for gth in gths:
        lin_o = lin_o + gth[:, :, 0]
        Z_o = Z_o + gth[:, :, q_lo : q_lo + n_z]
        qs_o = qs_o + gth[:, :, qs_col]
    m = (
        slot[:, :, None] == jnp.arange(S)[None, None, :]
    ).astype(dtype)
    own = jnp.einsum(
        "kts,ksc->ktc", m, wvsl,
        precision=jax.lax.Precision.HIGHEST,
    )
    qf = Z_o[:, :, :R] + own[:, :, 1 : 1 + R]
    score = (
        lin_o
        - tau
        + own[:, :, 0]
        + 0.5
        * (jnp.sum(qf * qf, axis=2) - qs_o - own[:, :, 1 + R])
    )
    e = score * ones
    z = jnp.concatenate(
        [ones[:, :, None], e[:, :, None], Z_o], axis=2
    )
    partial = jnp.einsum(
        "kts,ktd,kte->ksde", m, z, z,
        precision=jax.lax.Precision.HIGHEST,
    )
    if carry_in is None:
        carry_in = jnp.zeros((D, D), aux.dtype)

    def step(carry, xs):
        p, ci, co, lo = xs
        p = p.at[0].add(jnp.where(ci > 0, carry, 0.0))
        new_carry = jnp.where(co > 0, p[lo], carry)
        return new_carry, p

    carry_out, out = jax.lax.scan(
        step, carry_in, (partial, cont_in, cont_out, last_slot)
    )
    return out.reshape(K * S, D, D), carry_out


def _padded_tile_bytes(r: int, c: int, itemsize: int = 4) -> int:
    """Bytes of one [r, c] VMEM buffer after Mosaic tiling: the minor
    (lane) dim pads to 128, the second-minor (sublane) dim to 8."""
    return (-(-r // 8) * 8) * (-(-c // 128) * 128) * itemsize


def fused_gram_vmem_bytes(
    T: int, S: int, q_cols: int, w_cols: Optional[int] = None,
    itemsize: int = 4, n_cross: int = 2, tiles_per_step: int = 1,
    gth_cols: Optional[int] = None,
) -> int:
    """Modeled scoped-VMEM footprint of one fused Gram grid step.
    Every [T, c] operand pads its lane dim to 128 — so the narrow
    ``slot``/``aux`` blocks cost as much as a [T, 128] array — and
    Mosaic double-buffers the per-grid-step input and output blocks.
    The round-2 cost model budgeted only the A-scratch (T*S*Dp*4) and
    missed all of this, shipping a T=4096 tiling whose true footprint
    (~16.9 MB modeled, 16.04 MB measured) blew the 16 MB scoped-VMEM
    limit at compile time (BENCH_r02).

    Models the max of the two kernel layouts sharing a tiling:
    ``fused_tile_gram`` (slot + meta + q — the VI path) and
    ``fused_tile_gram_cross`` (aux + n_cross gathered [T, 2+R] cross
    operands — the Gibbs path)."""
    D = q_cols + 2
    Dp = -(-D // 8) * 8
    if w_cols is None:
        w_cols = 1 + q_cols
    tile = _padded_tile_bytes
    dd = tile(D, D, itemsize)
    # separate-meta layout: slot [T,1], meta [T,3], q [T,q_cols]
    in_meta = (
        tile(T, 1, itemsize)
        + tile(T, 3, itemsize)
        + tile(T, q_cols, itemsize)
    )
    # cross layout: lane-dense (slot, tau) [2, T] + n_cross ×
    # [T, w_cols+1] ([w|V|qs] rows); tiles_per_step = G scales the
    # per-grid-step in/out blocks (the kernel batches G tiles per step
    # to amortize the measured ~2.7 µs grid-step overhead)
    G = tiles_per_step
    if gth_cols is None:
        gth_cols = w_cols + 1  # the Gibbs [w | V | qs] layout
    in_cross = G * (
        tile(2, T, itemsize)
        + n_cross * tile(T, gth_cols, itemsize)
    )
    double_buffered = (
        max(in_meta, in_cross)
        + G * tile(S, w_cols, itemsize)
        + dd
        # outputs: partial Grams G × [S*Dp, D], carry_out [D,D]
        + G * tile(S * Dp, D, itemsize)
        + dd
    )
    scratch = (
        tile(T, S * Dp, itemsize)  # A matrix
        + tile(T, Dp, itemsize)  # z
        + dd  # carry
    )
    return 2 * double_buffered + scratch


# G selection uses a TIGHTER budget than the tiling gate: measured on
# hardware (BENCH round-4), a rank-128 (T=1024, S=1, G=2) config the
# model put at 12.6 MB compiled to 16.27 MB of scoped VMEM — the model
# runs ~3.7 MB optimistic for wide-D multi-tile blocks.  10 MB keeps
# ~6 MB of real headroom; G only amortizes DMA issue, so losing a
# factor of G near the cliff costs little.
GRAM_G_BUDGET = 10 << 20


def gram_tiles_per_step(
    T: int, S: int, q_cols: int, w_cols: Optional[int] = None,
    n_cross: int = 2, max_g: int = 8, gth_cols: Optional[int] = None,
) -> int:
    """Largest power-of-two tile batch G whose modeled footprint fits
    the (conservative) G budget for the cross kernel at (T, S) —
    fewer grid steps and fewer, larger DMAs for the same bytes."""
    g = max_g
    while g > 1:
        if fused_gram_vmem_bytes(
            T, S, q_cols, w_cols, n_cross=n_cross, tiles_per_step=g,
            gth_cols=gth_cols,
        ) <= GRAM_G_BUDGET:
            return g
        g //= 2
    return 1


# Scoped-VMEM budget for choose_tiling candidates: the hardware limit
# is 16 MiB; keep ~2 MiB headroom for Mosaic's own stack allocations
# beyond the modeled buffers.
GRAM_VMEM_BUDGET = 14 << 20
# Configs modeled below this line skip the compile probe: the probe
# exists to catch model gaps near the scoped-VMEM cliff (BENCH_r02
# post-mortem), but a config under ~57% of budget has > 8 MiB of
# modeled headroom — far beyond any observed model error — and each
# probe costs seconds of remote compile in the first-fit latency.
GRAM_PROBE_THRESHOLD = 8 << 20

_gram_probe_cache: dict = {}


def gram_probe_ok(T: int, S: int, q_cols: int,
                  w_cols: Optional[int] = None, dtype=None,
                  n_cross: int = 2) -> bool:
    """Compile-probe both Gram kernels at (T, S, operand widths) on
    the live backend; False if Mosaic rejects either (e.g. scoped-VMEM
    OOM).  The probe grid K MUST be production-sized: measured on v5e,
    the T=4096/S=2 config that OOM'd BENCH_r02 compiles fine at K≤8
    (the pipeliner skips double-buffering on tiny grids) and only
    fails from K=64 up — so a tiny-K probe would green-light the very
    config that crashed.  512 is the ceiling of the sweep's
    chunk_tiles (design_categorical.CHUNK_ROWS / T for every T the
    ranking emits).  Cached per process; off-TPU (tests run the kernel
    in interpret mode) the probe is a no-op True."""
    if jax.default_backend() != "tpu":
        return True
    if w_cols is None:
        w_cols = 1 + q_cols
    if dtype is None:
        dtype = jnp.float32
    key = (jax.default_backend(), T, S, q_cols, w_cols, n_cross,
           jnp.dtype(dtype).name)
    hit = _gram_probe_cache.get(key)
    if hit is not None:
        return hit
    K = 512
    D = q_cols + 2
    ok = True
    kints = (
        jax.ShapeDtypeStruct((K,), jnp.int32),
        jax.ShapeDtypeStruct((K,), jnp.int32),
        jax.ShapeDtypeStruct((K,), jnp.int32),
    )
    try:
        args = (
            jax.ShapeDtypeStruct((K, T, 3), dtype),
            jax.ShapeDtypeStruct((K, T, q_cols), dtype),
            jax.ShapeDtypeStruct((K, T), jnp.int32),
            jax.ShapeDtypeStruct((K, S, w_cols), dtype),
            *kints,
            jax.ShapeDtypeStruct((D, D), dtype),
        )
        jax.jit(
            lambda m, q, sl, w, ci, co, ls, cy: fused_tile_gram(
                m, q, sl, w, ci, co, ls, S=S, carry_in=cy
            )
        ).lower(*args).compile()
        cargs = (
            jax.ShapeDtypeStruct((K, 2, T), dtype),
            tuple(
                jax.ShapeDtypeStruct((K, T, w_cols + 1), dtype)
                for _ in range(n_cross)
            ),
            jax.ShapeDtypeStruct((K, S, w_cols + 1), dtype),
            *kints,
            jax.ShapeDtypeStruct((D, D), dtype),
        )
        g_step = gram_tiles_per_step(T, S, q_cols, w_cols)
        jax.jit(
            lambda a2, gs, w, ci, co, ls, cy: fused_tile_gram_cross(
                a2, gs, w, ci, co, ls, S=S, carry_in=cy,
                tiles_per_step=g_step,
            )
        ).lower(*cargs).compile()
    except Exception:
        ok = False
    _gram_probe_cache[key] = ok
    return ok


_fast_matmul_check_cache: dict = {}


def gram_fast_selfcheck(mode="split", rtol: Optional[float] = None) -> bool:
    """Validate a reduced-precision Gram matmul mode against the
    HIGHEST path ON DEVICE: both compiled for one small random tile
    problem, all Gram entries within ``rtol`` of the 6-pass result.
    Theoretical error: "split" ~1.5e-5 relative (gate 2e-4), "bf16"
    ~4e-3 (gate 2e-2) — an order of magnitude of headroom each.
    False disables the mode.  Cached per backend per process; False
    off-TPU."""
    if rtol is None:
        rtol = {"split": 2e-4, "bf16": 2e-2}[mode]
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    key = (backend, mode)
    hit = _fast_matmul_check_cache.get(key)
    if hit is not None:
        return hit
    if backend != "tpu":
        _fast_matmul_check_cache[key] = False
        return False
    ok = False
    try:
        import numpy as np

        rng = np.random.RandomState(3)
        K, T, S, R = 4, 256, 4, 32
        meta = rng.normal(size=(K, T, 3)).astype(np.float32)
        meta[:, :, 0] = 1.0
        q = (rng.normal(size=(K, T, R)) * 0.3).astype(np.float32)
        slot = rng.randint(0, S, (K, T)).astype(np.int32)
        slot.sort(axis=1)
        wvsl = (rng.normal(size=(K, S, 1 + R)) * 0.3).astype(
            np.float32
        )
        ci = np.zeros(K, np.int32)
        co = np.zeros(K, np.int32)
        ls = np.full(K, S - 1, np.int32)
        args = tuple(
            jnp.asarray(a) for a in (meta, q, slot, wvsl, ci, co, ls)
        )
        hi, _ = fused_tile_gram(*args, S=S)
        fast, _ = fused_tile_gram(*args, S=S, fast_matmul=mode)
        hi = np.asarray(hi)
        fast = np.asarray(fast)
        scale = np.abs(hi).max()
        ok = bool(np.abs(fast - hi).max() <= rtol * scale)
    except Exception:
        ok = False
    _fast_matmul_check_cache[key] = ok
    return ok


def fused_tile_gram_reference(
    meta, q_other, slot, wvsl, cont_in, cont_out, last_slot, S,
    carry_in=None,
):
    """jnp oracle of fused_tile_gram."""
    K, T, R = q_other.shape
    D = R + 2
    ones = meta[:, :, 0]
    m = (
        slot[:, :, None] == jnp.arange(S)[None, None, :]
    ).astype(meta.dtype) * ones[:, :, None]
    own = jnp.einsum(
        "kts,ksc->ktc", m, wvsl,
        precision=jax.lax.Precision.HIGHEST,
    )
    phi = q_other[:, :, : wvsl.shape[2] - 1]
    qf = phi + own[:, :, 1:]
    score = (
        meta[:, :, 1]
        + own[:, :, 0]
        + 0.5
        * (
            jnp.sum(qf * qf, axis=2)
            - meta[:, :, 2]
            - jnp.sum(own[:, :, 1:] ** 2, axis=2)
        )
    )
    e = score * ones
    z = jnp.concatenate(
        [ones[:, :, None], e[:, :, None], q_other], axis=2
    )
    partial = jnp.einsum(
        "kts,ktd,kte->ksde", m, z, z,
        precision=jax.lax.Precision.HIGHEST,
    )
    if carry_in is None:
        carry_in = jnp.zeros((D, D), meta.dtype)

    def step(carry, xs):
        p, ci, co, lo = xs
        p = p.at[0].add(jnp.where(ci > 0, carry, 0.0))
        new_carry = jnp.where(co > 0, p[lo], carry)
        return new_carry, p

    carry_out, out = jax.lax.scan(
        step, carry_in, (partial, cont_in, cont_out, last_slot)
    )
    return out.reshape(K * S, D, D), carry_out


def tile_gram_reference(
    rows: jax.Array,
    slot: jax.Array,
    cont_in: jax.Array,
    cont_out: jax.Array,
    last_slot: jax.Array,
    S: int,
    carry_in: Optional[jax.Array] = None,
):
    """Pure-jnp oracle of tile_gram (tests / CPU fallback)."""
    K, T, D = rows.shape
    m = (slot[:, :, None] == jnp.arange(S)[None, None, :]).astype(
        rows.dtype
    )
    partial = jnp.einsum(
        "kts,ktd,kte->ksde", m, rows, rows,
        precision=jax.lax.Precision.HIGHEST,
    )
    if carry_in is None:
        carry_in = jnp.zeros((D, D), rows.dtype)

    def step(carry, xs):
        p, ci, co, lo = xs
        p = p.at[0].add(jnp.where(ci > 0, carry, 0.0))
        new_carry = jnp.where(co > 0, p[lo], carry)
        return new_carry, p

    carry_out, out = jax.lax.scan(
        step, carry_in, (partial, cont_in, cont_out, last_slot)
    )
    return out.reshape(K * S, D, D), carry_out


def entity_grams(table, rows_tiled, S, D, interpret=False,
                 use_pallas=True):
    """All-entity Grams [B, D, D] for a CategoricalTable's tile rows
    (single-shot variant; the chunked sweep calls tile_gram directly).
    """
    slot = table.slot.reshape(rows_tiled.shape[:2])
    if use_pallas:
        flat, _ = tile_gram(
            rows_tiled, slot, table.cont_in, table.cont_out,
            table.last_slot, S=S, interpret=interpret,
        )
    else:
        flat, _ = tile_gram_reference(
            rows_tiled, slot, table.cont_in, table.cont_out,
            table.last_slot, S,
        )
    return flat[table.final_part]

"""The FM forward pass as pure, jittable segment operations.

Computes ``ŷ(x) = w0 + Σᵢ wᵢxᵢ + ½ Σᵣ[(Σᵢ Vᵢᵣxᵢ)² − Σᵢ Vᵢᵣ²xᵢ²]``
(the q-cache identity of the reference, /root/reference/include/myfm/
FM.hpp:54-136) over the compiled COO design, including RelationBlock
gathers: block scores are computed on unique block rows and gathered to
original rows through the mapper — O(nnz_block + n_rows) per factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..design import DesignPlan

# Upper bound on elements of the per-chunk q matrix; keeps peak memory
# for the pairwise term bounded on large designs.
_CHUNK_ELEMENTS = 1 << 27


def _factor_chunk(rank: int, n_rows: int) -> int:
    return max(1, min(rank, _CHUNK_ELEMENTS // max(n_rows, 1)))


def _table_matvec(coo_row, coo_col, coo_val, n_rows_local, vcols):
    """Segment matvec: out[r, :] = Σ_{entries in row r} val * vcols[col, :]."""
    contrib = coo_val[:, None] * vcols[coo_col, :]
    return jnp.zeros(
        (n_rows_local, vcols.shape[1]), dtype=vcols.dtype
    ).at[coo_row].add(contrib)


def _table_matvec1(coo_row, coo_col, coo_val, n_rows_local, v):
    contrib = coo_val * v[coo_col]
    return jnp.zeros((n_rows_local,), dtype=v.dtype).at[coo_row].add(contrib)


def linear_term(plan: DesignPlan, w: jax.Array) -> jax.Array:
    """Σᵢ wᵢxᵢ per original row (FM.hpp:78-87)."""
    out = _table_matvec1(
        plan.main.coo_row, plan.main.coo_col, plan.main.coo_val,
        plan.n_rows, w,
    )
    for b in plan.blocks:
        lb = _table_matvec1(b.coo_row, b.coo_col, b.coo_val, b.block_size, w)
        out = out + lb[b.mapper]
    return out


def factor_q(plan: DesignPlan, vcols: jax.Array) -> jax.Array:
    """q[n, r] = Σᵢ x_{ni} V_{ir} for a chunk of factor columns [F, C]."""
    q = _table_matvec(
        plan.main.coo_row, plan.main.coo_col, plan.main.coo_val,
        plan.n_rows, vcols,
    )
    for b in plan.blocks:
        qb = _table_matvec(b.coo_row, b.coo_col, b.coo_val, b.block_size, vcols)
        q = q + qb[b.mapper]
    return q


def factor_q_single(plan: DesignPlan, v: jax.Array) -> jax.Array:
    """q[n] for one factor column [F]."""
    q = _table_matvec1(
        plan.main.coo_row, plan.main.coo_col, plan.main.coo_val,
        plan.n_rows, v,
    )
    for b in plan.blocks:
        qb = _table_matvec1(b.coo_row, b.coo_col, b.coo_val, b.block_size, v)
        q = q + qb[b.mapper]
    return q


def _factor_q_sq(plan: DesignPlan, vcols: jax.Array) -> jax.Array:
    """q_S[n, r] = Σᵢ x²_{ni} V²_{ir} (FM.hpp:115-134)."""

    def sq_matvec(coo_row, coo_col, coo_val, n_rows_local):
        contrib = (coo_val * coo_val)[:, None] * (
            vcols[coo_col, :] ** 2
        )
        return jnp.zeros(
            (n_rows_local, vcols.shape[1]), dtype=vcols.dtype
        ).at[coo_row].add(contrib)

    qs = sq_matvec(
        plan.main.coo_row, plan.main.coo_col, plan.main.coo_val, plan.n_rows
    )
    for b in plan.blocks:
        qsb = sq_matvec(b.coo_row, b.coo_col, b.coo_val, b.block_size)
        qs = qs + qsb[b.mapper]
    return qs


def pairwise_term(plan: DesignPlan, V: jax.Array) -> jax.Array:
    """½ Σᵣ (q² − q_S) per row, chunked over factors for bounded memory."""
    rank = V.shape[1]
    out = jnp.zeros((plan.n_rows,), dtype=V.dtype)
    chunk = _factor_chunk(rank, plan.n_rows)
    for r0 in range(0, rank, chunk):
        vc = V[:, r0 : r0 + chunk]
        q = factor_q(plan, vc)
        qs = _factor_q_sq(plan, vc)
        out = out + 0.5 * jnp.sum(q * q - qs, axis=-1)
    return out


def predict_score(
    plan: DesignPlan, w0: jax.Array, w: jax.Array, V: jax.Array
) -> jax.Array:
    """Full FM score per row (reference ``predict_score_write_target``)."""
    score = w0 + linear_term(plan, w)
    if V.shape[1] > 0:
        score = score + pairwise_term(plan, V)
    return score

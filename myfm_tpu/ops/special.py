"""Numerics for probit links: stable normal-CDF math + truncated normals.

Replaces the reference's vendored Faddeeva library and rejection samplers
(/root/reference/include/myfm/util.hpp:15-115,
/root/reference/cpp_source/Faddeeva.cc) with JAX-native, vectorized,
log-space formulations built on ``log_ndtr``/``ndtri`` — the only uses in
the reference are real-axis erf/erfcx for log-CDF tails, which
``log_ndtr`` covers without complex arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtri

LOG_2PI = 1.8378770664093453


def std_cdf(x):
    return jnp.exp(log_ndtr(x))


def log_norm_pdf(x):
    return -0.5 * (x * x + LOG_2PI)


def safe_lcdf(x):
    """log Φ(x), stable in both tails (reference OProbitSampler.hpp:111-139)."""
    return log_ndtr(x)


def safe_lccdf(x):
    """log (1 - Φ(x)) = log Φ(-x)."""
    return log_ndtr(-x)


def safe_ldiff(a, b):
    """log (Φ(b) - Φ(a)) for a < b, cancellation-free.

    Mirrors the role of the reference's erfcx-based ``safe_ldiff``
    (OProbitSampler.hpp:141-236): work in the tail where both CDFs are
    small.  By symmetry Φ(b) − Φ(a) = Φ(−a) − Φ(−b), so flip to the side
    where the arguments are negative and use
    ``log(exp(lb) − exp(la)) = lb + log1p(−exp(la − lb))``.
    """
    flip = (a + b) > 0
    a2 = jnp.where(flip, -b, a)
    b2 = jnp.where(flip, -a, b)
    la = log_ndtr(a2)
    lb = log_ndtr(b2)
    diff = jnp.clip(la - lb, max=-1e-12)
    return lb + jnp.log1p(-jnp.exp(diff))


def _inv_survival(log_sf, dtype):
    """t such that P(N(0,1) > t) = exp(log_sf), stable for tiny sf.

    Clamped at BOTH ends: float32 uniforms can round to 1.0, which
    would drive exp(log_sf) → 1 and ndtri → -inf — an infinite latent
    residual that NaNs the whole chain one sweep later (observed on
    ordered probit, where the outermost classes have no finite bound
    for the final clip to recover with)."""
    tiny = jnp.finfo(dtype).tiny
    eps = jnp.finfo(dtype).eps
    log_sf = jnp.clip(
        log_sf,
        jnp.log(tiny) + 2.0,
        jnp.log1p(-jnp.asarray(4.0 * eps, dtype)),
    )
    return -ndtri(jnp.exp(log_sf))


def truncated_std_normal_lower(key, lower, shape=None, dtype=None):
    """Sample t ~ N(0,1) conditioned on t >= lower (elementwise).

    Inverse-survival method in log space: with u ~ U(0,1),
    ``P(T > t) = u * P(T > lower)`` so
    ``t = -ndtri(exp(log u + log Φ(-lower)))``.  Accurate far into the
    tail (|lower| ≲ 12 in float32), beyond which the distribution is a
    point mass at ``lower`` to machine precision anyway.
    """
    lower = jnp.asarray(lower)
    if dtype is None:
        dtype = lower.dtype
    if shape is None:
        shape = lower.shape
    tiny = jnp.finfo(dtype).tiny
    u = jax.random.uniform(key, shape, dtype=dtype, minval=tiny, maxval=1.0)
    log_sf = jnp.log(u) + log_ndtr(-lower)
    t = _inv_survival(log_sf, dtype)
    return jnp.maximum(t, lower)


def truncated_std_normal_lower_from_u(u, lower):
    """Like truncated_std_normal_lower, from pre-drawn U(0,1) samples
    (used by the SPMD path, which slices a globally drawn uniform vector
    so sharded chains match the single-chip chain bit-for-bit)."""
    dtype = lower.dtype
    log_sf = jnp.log(u) + log_ndtr(-lower)
    t = _inv_survival(log_sf, dtype)
    return jnp.maximum(t, lower)


def truncated_std_normal_onesided(key, bound, greater: jax.Array, u=None):
    """t ~ N(0,1) | (t >= bound) where greater, else (t <= bound)."""
    sign = jnp.where(greater, 1.0, -1.0).astype(bound.dtype)
    if u is None:
        t = truncated_std_normal_lower(key, sign * bound)
    else:
        t = truncated_std_normal_lower_from_u(u, sign * bound)
    return sign * t


def truncated_std_normal_two_sided(key, lower, upper, u=None):
    """t ~ N(0,1) | lower <= t <= upper, via stable inverse CDF.

    Work on the side where both bounds are in the lower tail:
    t = -ndtri(exp(log(sf_u + v·(sf_l − sf_u)))) with survival functions
    evaluated through ``log_ndtr``.  ``u`` optionally supplies the
    uniform draws (the SPMD path slices a globally drawn vector so the
    sharded chain matches the single-chip chain bit-for-bit).
    """
    lower = jnp.asarray(lower)
    dtype = lower.dtype
    flip = (lower + upper) > 0
    lo = jnp.where(flip, -upper, lower)
    hi = jnp.where(flip, -lower, upper)
    # both tails: P(T > lo) >= P(T > hi); interpolate survival values
    lsf_lo = log_ndtr(-lo)
    lsf_hi = log_ndtr(-hi)
    if u is None:
        v = jax.random.uniform(
            key, lower.shape, dtype=dtype,
            minval=jnp.finfo(dtype).tiny, maxval=1.0,
        )
    else:
        v = u
    # log-sf of sample: log( sf_hi + v * (sf_lo - sf_hi) )
    #                 = lsf_lo + log( r + v (1 - r) ), r = exp(lsf_hi - lsf_lo)
    r = jnp.exp(jnp.clip(lsf_hi - lsf_lo, max=0.0))
    log_sf = lsf_lo + jnp.log(r + v * (1.0 - r))
    t = _inv_survival(log_sf, dtype)
    t = jnp.clip(t, lo, hi)
    return jnp.where(flip, -t, t)


def mean_var_truncated_normal_left(mu):
    """(mean, var, logZ) of N(mu,1) truncated to x > 0.

    Parity with the reference ``mean_var_truncated_normal_left``
    (util.hpp:81-97): left-truncation at 0, unit scale.  The hazard
    ratio φ(−μ)/Φ(μ) is computed in log space (no erfcx needed).
    """
    log_z = log_ndtr(mu)
    ratio = jnp.exp(log_norm_pdf(mu) - log_z)  # φ(μ)/Φ(μ)
    mean = mu + ratio
    var = 1.0 - ratio * (ratio + mu)
    return mean, var, log_z


def mean_var_truncated_normal_right(mu):
    """(mean, var, logZ) of N(mu,1) truncated to x < 0 (util.hpp:99-115)."""
    mean_m, var, log_z = mean_var_truncated_normal_left(-mu)
    return -mean_m, var, log_z

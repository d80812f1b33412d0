"""Probe which [2,T] -> [T,2] sublane<->lane transpose lowers in a
Mosaic TPU kernel: jnp.transpose, or an MXU dot with a tiny identity.
"""

import functools
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/myfm_tpu_xla_cache"
)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 256


def k_transpose(x_ref, o_ref, *, how):
    av = x_ref[0]  # [2, T]
    if how == "transpose":
        at = jnp.transpose(av, (1, 0))  # [T, 2]
    elif how == "swap":
        at = jnp.swapaxes(av, 0, 1)
    else:  # dot with eye
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (2, 2), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (2, 2), 1)
        ).astype(av.dtype)
        at = jax.lax.dot_general(
            av, eye,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=av.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    o_ref[0] = at


def run(how):
    x = jnp.asarray(
        np.random.RandomState(0).normal(size=(4, 2, T)).astype(np.float32)
    )
    out = pl.pallas_call(
        functools.partial(k_transpose, how=how),
        grid=(4,),
        in_specs=[pl.BlockSpec((1, 2, T), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, 2), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, T, 2), jnp.float32),
    )(x)
    want = np.transpose(np.asarray(x), (0, 2, 1))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
    return True


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for how in ("transpose", "swap", "dot"):
        try:
            ok = run(how)
            print(f"{how}: OK", flush=True)
        except Exception as exc:
            print(f"{how}: FAILED {exc!r:.160}", flush=True)

"""Mid-training checkpoint/resume for the Gibbs chain.

The reference has no mid-training checkpointing — a ``fit`` is atomic
and persistence is post-hoc pickling (SURVEY §5).  Here the full chain
state (weights, residuals, hyperparameters, cutpoints, the latent
probit target) is a pytree, so checkpointing is a flat npz dump of its
leaves plus the iteration counter; the PRNG needs no state because
every sweep's key is derived as ``fold_in(PRNGKey(seed), 1 + it)``.

Resuming reproduces the exact same chain the uninterrupted run would
have produced (same keys, same state), which the test suite asserts.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Tuple

import numpy as np

import jax


def save_checkpoint(path: str, state: Any, iteration: int) -> None:
    """Atomically write (state pytree, iteration) to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload: Dict[str, np.ndarray] = {
        f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)
    }
    payload["iteration"] = np.asarray(iteration, dtype=np.int64)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any) -> Tuple[Any, int]:
    """Load a checkpoint written by save_checkpoint.

    ``like`` is a state pytree of the same structure (e.g. a freshly
    initialized one) providing the treedef; returns (state, iteration).
    """
    with np.load(path) as data:
        leaves, treedef = jax.tree_util.tree_flatten(like)
        n = len(leaves)
        loaded = [data[f"leaf_{i}"] for i in range(n)]
        iteration = int(data["iteration"])
    import jax.numpy as jnp

    new_leaves = [
        jnp.asarray(a, dtype=np.asarray(ref).dtype)
        for a, ref in zip(loaded, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), iteration

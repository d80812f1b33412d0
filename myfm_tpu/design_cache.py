"""Content-addressed cache of compiled design plans.

Building a training plan is expensive on a remote-device link (the
ML-100k timeSVD++ joint plan costs ~10 s of host packing + uploads;
the 10M categorical plan tens of seconds), and real workflows fit the
same design repeatedly — hyperparameter sweeps, Gibbs-then-oprobit
protocols, bench reruns.  The reference rebuilds its caches per fit
too (BaseFMTrainer ctor, BaseFMTrainer.hpp:58-105), but its C++ build
is microseconds; here the rebuild is the dominant fixed cost of a warm
``fit()``.

Keys are CONTENT fingerprints (blake2b over every table's
shape/indptr/indices/data plus the grouping and compile parameters) —
not object ids — so in-place mutation of a design matrix between fits
can never serve a stale plan.  Hashing costs ~0.1 s per GB of sparse
payload, orders below the build it saves.

The cache holds the last ``_CAPACITY`` plans (device-array pytrees;
a 10M-row categorical plan is a few hundred MB of HBM, so the cap is
small and LRU).  ``clear_plan_cache()`` frees them.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Callable, Optional

import numpy as np
from scipy import sparse as sps

_CAPACITY = 4
_CACHE: "OrderedDict[tuple, object]" = OrderedDict()


def _h_update(h, arr: np.ndarray) -> None:
    a = np.ascontiguousarray(arr)
    h.update(str(a.dtype).encode())
    h.update(str(a.shape).encode())
    h.update(a.tobytes())


def design_fingerprint(X, blocks, grouping) -> str:
    """Content hash of (X, blocks, grouping)."""
    h = hashlib.blake2b(digest_size=16)
    if X is None:
        h.update(b"none")
    else:
        Xc = sps.csr_matrix(X)
        h.update(str(Xc.shape).encode())
        _h_update(h, Xc.indptr)
        _h_update(h, Xc.indices)
        _h_update(h, Xc.data)
    for b in blocks:
        bd = sps.csr_matrix(b.data)
        h.update(str(bd.shape).encode())
        _h_update(h, np.asarray(b.original_to_block))
        _h_update(h, bd.indptr)
        _h_update(h, bd.indices)
        _h_update(h, bd.data)
    if grouping is None:
        h.update(b"nogroup")
    else:
        _h_update(h, np.asarray(grouping))
    return h.hexdigest()


def get_or_build(
    kind: str,
    fingerprint: str,
    params: tuple,
    builder: Callable[[], object],
) -> object:
    """Return the cached plan for (kind, fingerprint, params) or build
    and cache it.  A builder returning None (compile declined) is NOT
    cached — gates may depend on backend state."""
    key = (kind, fingerprint, params)
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    plan = builder()
    if plan is not None:
        _CACHE[key] = plan
        while len(_CACHE) > _CAPACITY:
            _CACHE.popitem(last=False)
    return plan


def clear_plan_cache() -> None:
    _CACHE.clear()

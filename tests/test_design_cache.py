"""Content-addressed design-plan cache (myfm_tpu.design_cache)."""

import numpy as np
import scipy.sparse as sps

from myfm_tpu import MyFMGibbsRegressor, RelationBlock
from myfm_tpu.design_cache import (
    _CACHE,
    clear_plan_cache,
    design_fingerprint,
    get_or_build,
)


def _problem(seed=0, n=150, nu=9, ni=6):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    blocks = [
        RelationBlock(u, sps.identity(nu, format="csr")),
        RelationBlock(i, sps.identity(ni, format="csr")),
    ]
    y = rng.normal(size=nu)[u] + rng.normal(size=ni)[i]
    return blocks, y


def test_repeat_fit_reuses_plan():
    clear_plan_cache()
    blocks, y = _problem()
    fm1 = MyFMGibbsRegressor(rank=2, random_seed=0)
    fm1.fit(None, y, X_rel=blocks, n_iter=4)
    n_after_first = len(_CACHE)
    assert n_after_first >= 1
    plans = list(_CACHE.values())
    fm2 = MyFMGibbsRegressor(rank=2, random_seed=0)
    fm2.fit(None, y, X_rel=blocks, n_iter=4)
    assert len(_CACHE) == n_after_first  # pure hits, nothing rebuilt
    assert [p is q for p, q in zip(plans, _CACHE.values())]
    # identical chains: same plan + same seed
    np.testing.assert_allclose(
        fm1.w_samples, fm2.w_samples, rtol=0, atol=0
    )


def test_content_fingerprint_detects_inplace_mutation():
    """In-place mutation of a design must change the fingerprint — an
    id()-keyed cache would silently reuse the stale plan."""
    rng = np.random.RandomState(1)
    X = sps.random(40, 8, density=0.4, format="csr", random_state=1)
    fp1 = design_fingerprint(X, [], None)
    assert design_fingerprint(X, [], None) == fp1  # deterministic
    X.data[0] += 1.0  # same object, same sparsity, new content
    assert design_fingerprint(X, [], None) != fp1


def test_fingerprint_covers_blocks_and_grouping():
    blocks, _ = _problem(seed=2)
    blocks2, _ = _problem(seed=3)
    fp = design_fingerprint(None, blocks, [0, 1])
    assert design_fingerprint(None, blocks2, [0, 1]) != fp
    assert design_fingerprint(None, blocks, [0, 0]) != fp


def test_none_builds_are_not_cached():
    clear_plan_cache()
    calls = []

    def builder():
        calls.append(1)
        return None

    assert get_or_build("k", "fp", (), builder) is None
    assert get_or_build("k", "fp", (), builder) is None
    assert len(calls) == 2 and len(_CACHE) == 0


def test_lru_eviction():
    clear_plan_cache()
    for i in range(7):
        get_or_build("k", f"fp{i}", (), lambda i=i: f"plan{i}")
    assert len(_CACHE) == 4
    assert get_or_build("k", "fp6", (), lambda: "rebuilt") == "plan6"
    assert get_or_build("k", "fp0", (), lambda: "rebuilt") == "rebuilt"
    clear_plan_cache()

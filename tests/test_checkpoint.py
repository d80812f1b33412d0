"""Checkpoint/resume: an interrupted chain, resumed from disk, must
reproduce the exact chain of an uninterrupted run (keys derive from
(seed, iteration) so no RNG state is stored)."""

import numpy as np
import pytest
import scipy.sparse as sps

from myfm_tpu.design import compile_design
from myfm_tpu.design_categorical import try_compile_categorical
from myfm_tpu.ops.gibbs import GibbsConfig
from myfm_tpu.trainer import CategoricalGibbsTrainer, GibbsTrainer


def _problem(seed=0, n=400, n_users=19, n_items=13):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_users, n)
    i = rng.randint(0, n_items, n)
    X1 = sps.csr_matrix((np.ones(n), (np.arange(n), u)),
                        shape=(n, n_users))
    X2 = sps.csr_matrix((np.ones(n), (np.arange(n), i)),
                        shape=(n, n_items))
    X = sps.hstack([X1, X2]).tocsr()
    y = (
        rng.normal(size=n_users)[u] + rng.normal(size=n_items)[i]
        + 0.3 * rng.normal(size=n)
    )
    grouping = np.asarray([0] * n_users + [1] * n_items, np.int32)
    return X, y, grouping


@pytest.mark.parametrize("path_kind", ["categorical", "colored"])
def test_resume_reproduces_chain(tmp_path, path_kind):
    X, y, grouping = _problem()
    cfg = GibbsConfig(task="regression")
    ckpt = str(tmp_path / "chain.npz")

    def make_trainer():
        if path_kind == "categorical":
            plan = try_compile_categorical(
                X, [], grouping, None, np.float64, rank=2
            )
            assert plan is not None
            return CategoricalGibbsTrainer(
                plan, y, cfg, 2, 0.1, 42, np.float64
            )
        plan = compile_design(X, [], grouping=grouping, dtype=np.float64)
        return GibbsTrainer(plan, y, cfg, 2, 0.1, 42, np.float64)

    # uninterrupted run: 10 sweeps
    pred_full, _ = make_trainer().run(10, 10)

    # interrupted: 6 sweeps with a checkpoint at 6, then resume to 10
    make_trainer().run(6, 1, checkpoint_path=ckpt, checkpoint_every=6)
    pred_resumed, _ = make_trainer().run(
        10, 10, checkpoint_path=ckpt, resume=True
    )

    # the resumed samples are the last 4 of the full chain, exactly
    full_tail = pred_full.samples[-4:]
    for a, b in zip(full_tail, pred_resumed.samples):
        np.testing.assert_allclose(a.w0, b.w0, rtol=1e-12)
        np.testing.assert_allclose(a.w, b.w, rtol=1e-12)
        np.testing.assert_allclose(a.V, b.V, rtol=1e-12)

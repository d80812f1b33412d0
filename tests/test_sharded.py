"""Multi-chip parity: the sharded chain must reproduce the single-chip
chain sample-for-sample (the 'distributed tests' analogue of the
reference's blocked ≡ flattened contract, SURVEY §4)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from myfm_tpu import MyFMGibbsRegressor
from myfm_tpu.ops.gibbs import GibbsConfig
from myfm_tpu.parallel.sharding import ShardedGibbsTrainer

from .test_block import _make_relational_problem


@pytest.mark.parametrize("n_devices", [2, 4])
def test_sharded_equals_single_chip(n_devices):
    X_main, blocks, y = _make_relational_problem(seed=13, n_rows=402)
    # 402 rows: deliberately NOT divisible by 4 to exercise row padding

    fm = MyFMGibbsRegressor(rank=2, random_seed=7, dtype=np.float64).fit(
        X_main, y, X_rel=blocks, n_iter=8, n_kept_samples=8
    )

    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
    trainer = ShardedGibbsTrainer(
        X_main, blocks, y,
        GibbsConfig(task="regression"),
        rank=2, init_stdev=0.1, random_seed=7,
        mesh=mesh, dtype=np.float64,
    )
    samples, _ = trainer.run(8, 8)

    assert len(samples) == 8
    for (w0s, ws, vs), fm_sample in zip(samples, fm.predictor_.samples):
        np.testing.assert_allclose(w0s, fm_sample.w0, rtol=1e-8)
        np.testing.assert_allclose(ws, fm_sample.w, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(vs, fm_sample.V, rtol=1e-6, atol=1e-9)

"""Executable documentation: every ```python block in docs/*.md runs
(the reference smoke-checks its docs with Sphinx doctests in CI,
.github/workflows/doctest.yml; this is the rebuild's equivalent).

Blocks that reference ambient variables (a ratings DataFrame, a
trainer, a fitted estimator) get them from the per-document setup
namespace below — the analogue of Sphinx's hidden testsetup:: code.
"""

import os
import re

import numpy as np
import pytest
import scipy.sparse as sps

DOCS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "docs")
)

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(doc_name):
    with open(os.path.join(DOCS, doc_name)) as f:
        return _BLOCK_RE.findall(f.read())


def _toy_ratings(n=300, nu=20, ni=15, seed=0):
    import pandas as pd

    rng = np.random.RandomState(seed)
    u = rng.randint(0, nu, n)
    i = rng.randint(0, ni, n)
    y = (
        3.0
        + rng.normal(size=nu)[u]
        + rng.normal(size=ni)[i]
        + 0.3 * rng.normal(size=n)
    )
    df = pd.DataFrame(
        {"user_id": u, "movie_id": i, "rating": np.clip(y, 1, 5)}
    )
    return df, y


def _setup_quickstart():
    # second block: a fast-path trainer ready for checkpoint/resume
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.relational import RelationBlock
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    df, y = _toy_ratings()
    blocks = [
        RelationBlock(
            df.user_id.values, sps.identity(20, format="csr")
        ),
        RelationBlock(
            df.movie_id.values, sps.identity(15, format="csr")
        ),
    ]
    plan = try_compile_categorical(
        None, blocks, None, None, np.float64, rank=2
    )
    trainer = CategoricalGibbsTrainer(
        plan, y, GibbsConfig(task="regression"), 2, 0.1, 0, np.float64
    )
    return {"trainer": trainer}


def _setup_relation_blocks():
    import myfm_tpu

    df, y = _toy_ratings()
    return {
        "df": df,
        "y": y,
        # one dense main column so group_shapes covers 3 nonempty
        # feature families exactly as the doc snippet assumes
        "X_main": sps.csr_matrix(
            np.random.RandomState(5).rand(len(df), 1)
        ),
        "user_features_csr": sps.identity(20, format="csr"),
        "item_features_csr": sps.identity(15, format="csr"),
        "fm": myfm_tpu.MyFMGibbsRegressor(rank=2, random_seed=1),
    }


def _setup_ordinal():
    import myfm_tpu

    rng = np.random.RandomState(3)
    x = rng.normal(size=400)
    z = 1.1 * x + rng.normal(size=400)
    K = 4
    y = np.digitize(z, [-0.7, 0.2, 1.0])
    X = sps.csr_matrix(x[:300, None])
    return {
        "myfm_tpu": myfm_tpu,
        "np": np,
        "X": X,
        "y": y[:300],
        "X_test": sps.csr_matrix(x[300:, None]),
        "K": K,
    }


def _setup_multichip():
    import myfm_tpu

    df, y = _toy_ratings(n=240, nu=12, ni=9, seed=5)
    blocks = [
        myfm_tpu.RelationBlock(
            df.user_id.values, sps.identity(12, format="csr")
        ),
        myfm_tpu.RelationBlock(
            df.movie_id.values, sps.identity(9, format="csr")
        ),
    ]
    return {"myfm_tpu": myfm_tpu, "y": y, "blocks": blocks}


_SETUPS = {
    "quickstart.md": _setup_quickstart,
    "relation-blocks.md": _setup_relation_blocks,
    "ordinal-regression.md": _setup_ordinal,
    "movielens.md": lambda: {},
    "api.md": lambda: {},
    "multichip.md": _setup_multichip,
}


@pytest.mark.parametrize("doc_name", sorted(_SETUPS))
def test_doc_code_blocks_execute(doc_name, tmp_path, monkeypatch):
    blocks = _blocks(doc_name)
    if not blocks:
        pytest.skip(f"{doc_name} has no python blocks")
    monkeypatch.chdir(tmp_path)  # checkpoint files land in tmp
    namespace = _SETUPS[doc_name]()
    for i, code in enumerate(blocks):
        try:
            exec(compile(code, f"{doc_name}[block {i}]", "exec"),
                 namespace)
        except Exception as err:  # pragma: no cover
            raise AssertionError(
                f"{doc_name} block {i} failed: {err!r}\n---\n{code}"
            ) from err

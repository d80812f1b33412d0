"""Variational-inference estimators (coordinate-ascent mean field).

API parity with /root/reference/src/myfm/variational.py:28-383.
The VI engine itself lives in ops/variational.py.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np
from scipy import sparse as sps

from .base import (
    ArrayLike,
    ClassifierMixin,
    ConfigBuilder,
    MyFMBase,
    RegressorMixin,
)
from .relational import RelationBlock


def runtime_error_to_optional(fn):
    """Property access returns None before fit (variational.py:28-37)."""

    def wrapped(self):
        try:
            return fn(self)
        except RuntimeError:
            return None

    return property(wrapped)


class MyFMVariationalBase(MyFMBase):
    def _fetch_weights(self):
        if self.predictor_ is None:
            raise RuntimeError("Not fit yet.")
        return self.predictor_.samples[0]

    @runtime_error_to_optional
    def w0_mean(self) -> Optional[float]:
        return self._fetch_weights().w0

    @runtime_error_to_optional
    def w0_var(self) -> Optional[float]:
        return self._fetch_weights().w0_var

    @runtime_error_to_optional
    def w_mean(self) -> Optional[np.ndarray]:
        return self._fetch_weights().w

    @runtime_error_to_optional
    def w_var(self) -> Optional[np.ndarray]:
        return self._fetch_weights().w_var

    @runtime_error_to_optional
    def V_mean(self) -> Optional[np.ndarray]:
        return self._fetch_weights().V

    @runtime_error_to_optional
    def V_var(self) -> Optional[np.ndarray]:
        return self._fetch_weights().V_var

    def _predict_core(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
    ) -> np.ndarray:
        predictor = self._fetch_predictor()
        return predictor.predict(X, X_rel)

    def _train_core(
        self,
        rank: int,
        init_stdev: float,
        X: sps.csr_matrix,
        X_rel: List[RelationBlock],
        y: np.ndarray,
        random_seed: int,
        config: ConfigBuilder,
        callback,
    ):
        from .design import compile_design
        from .ops.variational import VariationalConfig
        from .vi_trainer import CategoricalVITrainer, VariationalTrainer

        cfg = VariationalConfig(
            task=config.task_type,
            alpha_0=config.alpha_0,
            beta_0=config.beta_0,
            gamma_0=config.gamma_0,
            mu_0=config.mu_0,
            reg_0=config.reg_0,
            fit_w0=config.fit_w0,
            fit_linear=config.fit_linear,
        )

        if self.mesh is not None or (self.n_devices or 1) > 1:
            # multi-chip SPMD CAVI (fit(..., n_devices=N) / mesh=...):
            # rows shard over the ('data',) mesh; sharded ≡ single-chip
            # exactly (deterministic updates on psum'd global Grams,
            # tests/test_sharded_vi.py)
            from .parallel.sharding_categorical import (
                ShardedCategoricalVITrainer,
            )

            if self.sweep_strategy not in ("auto", "categorical"):
                raise NotImplementedError(
                    "Multi-chip variational training runs on the "
                    "categorical fast path; use sweep_strategy='auto' "
                    "or 'categorical'."
                )
            trainer = ShardedCategoricalVITrainer(
                X, X_rel, y, cfg, rank, init_stdev, random_seed,
                mesh=self._build_mesh(),
                grouping=np.asarray(config.group_index, dtype=np.int32),
                dtype=self.dtype,
            )
            return trainer.run(config.n_iter, callback)

        from .design_cache import design_fingerprint, get_or_build

        fp = design_fingerprint(X, X_rel, config.group_index)
        cat_plan = None
        if self.sweep_strategy in ("auto", "categorical"):
            from .design_categorical import try_compile_categorical

            # the VI Gram carries 3R+2 z-columns — tile for that width
            cat_plan = get_or_build(
                "cat_vi", fp, (self.dtype.str, rank),
                lambda: try_compile_categorical(
                    X,
                    X_rel,
                    grouping=np.asarray(
                        config.group_index, dtype=np.int32
                    ),
                    n_groups=None,
                    dtype=self.dtype,
                    rank=max(3 * rank, 1),
                ),
            )
            if cat_plan is None:
                # entity+attribute designs (multi-hot / numeric side
                # columns in a block): the EA table's Gram carries
                # 4R+2 z-columns — tile for that width
                cat_plan = get_or_build(
                    "cat_vi_ea", fp, (self.dtype.str, rank),
                    lambda: try_compile_categorical(
                        X,
                        X_rel,
                        grouping=np.asarray(
                            config.group_index, dtype=np.int32
                        ),
                        n_groups=None,
                        dtype=self.dtype,
                        rank=max(4 * rank, 1),
                        allow_side=True,
                    ),
                )
        if cat_plan is not None:
            trainer = CategoricalVITrainer(
                cat_plan, y, cfg, rank, init_stdev, random_seed,
                self.dtype,
            )
            return trainer.run(config.n_iter, callback)
        if self.sweep_strategy == "categorical":
            raise ValueError(
                "sweep_strategy='categorical' requires every table "
                "(main and blocks) to be one-hot per row."
            )

        row_strategy = (
            "serial" if self.sweep_strategy == "serial" else "auto"
        )
        plan = get_or_build(
            "row_vi", fp,
            (self.dtype.str, row_strategy, self.max_unrolled_colors),
            lambda: compile_design(
                X,
                X_rel,
                grouping=np.asarray(
                    config.group_index, dtype=np.int32
                ),
                dtype=self.dtype,
                strategy=row_strategy,
                max_unrolled_colors=self.max_unrolled_colors,
            ),
        )
        trainer = VariationalTrainer(
            plan, y, cfg, rank, init_stdev, random_seed, self.dtype
        )
        return trainer.run(config.n_iter, callback)


class VariationalFMRegressor(RegressorMixin, MyFMVariationalBase):
    r"""Variational-inference FM regressor (deterministic CAVI)."""

    def fit(
        self,
        X: Optional[ArrayLike],
        y: np.ndarray,
        X_rel: List[RelationBlock] = [],
        X_test: Optional[ArrayLike] = None,
        y_test: Optional[np.ndarray] = None,
        X_rel_test: List[RelationBlock] = [],
        n_iter: int = 100,
        n_kept_samples: Optional[int] = None,
        grouping: Optional[List[int]] = None,
        group_shapes: Optional[List[int]] = None,
        callback: Optional[Callable] = None,
        config_builder: Optional[ConfigBuilder] = None,
    ) -> "VariationalFMRegressor":
        self._fit(
            X, y, X_rel=X_rel, X_test=X_test, y_test=y_test,
            X_rel_test=X_rel_test, n_iter=n_iter,
            n_kept_samples=n_kept_samples, grouping=grouping,
            group_shapes=group_shapes, callback=callback,
            config_builder=config_builder,
        )
        return self

    def predict(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
    ) -> np.ndarray:
        """Score with the converged posterior means."""
        return self._predict_core(X, X_rel)


class VariationalFMClassifier(ClassifierMixin, MyFMVariationalBase):
    r"""Variational-inference FM binary classifier (probit link)."""

    def fit(
        self,
        X: Optional[ArrayLike],
        y: np.ndarray,
        X_rel: List[RelationBlock] = [],
        X_test: Optional[ArrayLike] = None,
        y_test: Optional[np.ndarray] = None,
        X_rel_test: List[RelationBlock] = [],
        n_iter: int = 100,
        n_kept_samples: Optional[int] = None,
        grouping: Optional[List[int]] = None,
        group_shapes: Optional[List[int]] = None,
        callback: Optional[Callable] = None,
        config_builder: Optional[ConfigBuilder] = None,
    ) -> "VariationalFMClassifier":
        self._fit(
            X, y, X_rel=X_rel, X_test=X_test, y_test=y_test,
            X_rel_test=X_rel_test, n_iter=n_iter,
            n_kept_samples=n_kept_samples, grouping=grouping,
            group_shapes=group_shapes, callback=callback,
            config_builder=config_builder,
        )
        return self

    def predict(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
    ) -> np.ndarray:
        return self.predict_proba(X, X_rel) > 0.5

    def predict_proba(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
    ) -> np.ndarray:
        return self._predict_core(X, X_rel)

"""Gibbs-sampler estimators: regressor, classifier, ordered probit.

API parity with /root/reference/src/myfm/gibbs.py:32-543.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from scipy import sparse as sps

from .base import (
    REAL,
    ArrayLike,
    ClassifierMixin,
    ConfigBuilder,
    MyFMBase,
    RegressorMixin,
    TASK_ORDERED,
    check_data_consistency,
)
from .containers import FM, FMHyperParameters, LearningHistory
from .design import compile_design
from .ops.gibbs import GibbsConfig
from .relational import RelationBlock
from .trainer import GibbsTrainer


def _encode_ordered_targets(cutpoint_groups, y: np.ndarray):
    """Class-offset target encoding for multiple cutpoint groups.

    The C++ engine supports one independent cutpoint sampler per group
    (FMLearningConfig.hpp:15; the trainer ctor validates the groups
    partition the rows, BaseFMTrainer.hpp:58-105).  The TPU sweeps
    carry the group membership inside the integer target itself: group
    g's classes map to [Σ_{j<g} K_j, Σ_{j<g} K_j + K_g), so no per-row
    group array needs to flow through the jitted programs
    (ops/oprobit.py recovers membership as a range test).

    A single group is validated the same way (its row list must cover
    every row and its targets must lie in [0, n_class)) and passes
    through with offset 0, i.e. unchanged."""
    if len(cutpoint_groups) == 0:
        return y
    y = np.asarray(y)
    n = y.shape[0]
    assigned = np.full(n, -1, dtype=np.int64)
    y_enc = np.array(y, copy=True)
    offset = 0
    for g, (n_class, indices) in enumerate(cutpoint_groups):
        idx = np.asarray(indices, dtype=np.int64)
        if idx.size and (idx.min() < 0 or idx.max() >= n):
            raise ValueError(
                f"cutpoint group {g} contains row indices outside "
                f"[0, {n})."
            )
        if np.any(assigned[idx] != -1):
            raise ValueError(
                f"cutpoint group {g} overlaps an earlier group; the "
                "groups must partition the rows."
            )
        assigned[idx] = g
        cls = y[idx]
        if cls.size and (cls.min() < 0 or cls.max() >= n_class):
            raise ValueError(
                f"cutpoint group {g} has targets outside "
                f"[0, {n_class})."
            )
        y_enc[idx] = cls + offset
        offset += n_class
    if np.any(assigned == -1):
        raise ValueError(
            "cutpoint groups must cover every row; "
            f"{int(np.sum(assigned == -1))} rows are unassigned."
        )
    return y_enc


def _gibbs_config(config: ConfigBuilder,
                  sweep_strategy: str) -> GibbsConfig:
    """One place mapping the builder onto the static sweep config
    (used by both the single-chip and sharded train cores)."""
    n_classes = tuple(int(k) for k, _ in config.cutpoint_groups)
    return GibbsConfig(
        task=config.task_type,
        alpha_0=config.alpha_0,
        beta_0=config.beta_0,
        gamma_0=config.gamma_0,
        mu_0=config.mu_0,
        reg_0=config.reg_0,
        fit_w0=config.fit_w0,
        fit_linear=config.fit_linear,
        nu_oprobit=config.nu_oprobit,
        cutpoint_scale=config.cutpoint_scale,
        n_class=n_classes[0] if n_classes else 0,
        n_classes=n_classes,
        joint_rows=sweep_strategy == "joint",
    )


def _joint_candidate(est, rank, config) -> bool:
    from .design import joint_auto_candidate

    return joint_auto_candidate(
        rank, bool(config.fit_linear), est.dtype, config.group_index
    )


class MyFMGibbsBase(MyFMBase):
    @property
    def w0_samples(self) -> Optional[np.ndarray]:
        r"""Samples for the global bias ``w0``; ``None`` before fit."""
        if self.predictor_ is None:
            return None
        return np.asarray([fm.w0 for fm in self.predictor_.samples])

    @property
    def w_samples(self) -> Optional[np.ndarray]:
        r"""Samples for linear coefficients ``w`` ([sample, feature])."""
        if self.predictor_ is None:
            return None
        return np.asarray([fm.w for fm in self.predictor_.samples])

    @property
    def V_samples(self) -> Optional[np.ndarray]:
        r"""Samples for ``V`` ([sample, feature, factor])."""
        if self.predictor_ is None:
            return None
        return np.asarray([fm.V for fm in self.predictor_.samples])

    def _predict_core(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
        n_workers: Optional[int] = None,
    ) -> np.ndarray:
        predictor = self._fetch_predictor()
        shape = check_data_consistency(X, X_rel)
        if X is None:
            X = sps.csr_matrix((shape, 0), dtype=REAL)
        else:
            X = sps.csr_matrix(X)
        if n_workers is None:
            return predictor.predict(X, X_rel)
        return predictor.predict_parallel(X, X_rel, n_workers)

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
        y = _encode_ordered_targets(config.cutpoint_groups, y)
        if self.mesh is not None or (self.n_devices or 1) > 1:
            return self._train_core_sharded(
                rank, init_stdev, X, X_rel, y, random_seed, config,
                callback,
            )
        from .design_cache import design_fingerprint, get_or_build

        # plan builds cost ~10 s (joint 100k) to ~40 s (categorical
        # 10M) on a remote-device link; repeated fits on the same
        # design (sweeps, protocols, benches) reuse the compiled plan
        # through the content-addressed cache
        fp = design_fingerprint(X, X_rel, config.group_index)
        cat_plan = None
        # "auto" at small scale with a long chain prefers the JOINT
        # engine over the categorical fast path: measured on ML-100k
        # timesvdpp (2026-08-21, clean runs) the fast path sweeps at
        # ~11 it/s steady with ~1 s setup while joint sweeps at
        # ~25 it/s with a ~12 s plan build (free on refits via the
        # plan cache) — the total-wall crossover is ~225 iterations.
        # At flagship scale the fast path dominates both, so the
        # preference is gated to small row counts.
        prefer_joint_small = (
            self.sweep_strategy == "auto"
            and config.n_iter >= 200
            and X.shape[0] <= 500_000
            and _joint_candidate(self, rank, config)
        )
        if self.sweep_strategy in (
            "auto", "categorical"
        ) and not prefer_joint_small:
            from .design_categorical import try_compile_categorical

            cat_plan = get_or_build(
                "cat_gibbs", fp,
                (self.dtype.str, rank, bool(config.fit_linear)),
                lambda: try_compile_categorical(
                    X,
                    X_rel,
                    grouping=np.asarray(
                        config.group_index, dtype=np.int32
                    ),
                    n_groups=None,
                    dtype=self.dtype,
                    rank=rank,
                    # side features are drawn as (R+1)-joint [w|V]
                    # rows, so the entity+attribute extension needs
                    # the linear terms
                    allow_side=bool(config.fit_linear),
                ),
            )
        use_joint = self.sweep_strategy == "joint"
        if cat_plan is None:
            if self.sweep_strategy == "categorical":
                raise ValueError(
                    "sweep_strategy='categorical' requires every table "
                    "(main and blocks) to be one-hot per row, or a "
                    "block of [one-hot | per-entity side-feature] "
                    "column groups within the entity+attribute gates."
                )
            from .design import joint_auto_candidate, joint_auto_eligible

            # "auto" prefers the merged joint sweep (one pass over the
            # colors drawing exact (R+1)-dim rows; 10-25x the chromatic
            # sweep on relational designs) when the rank/dtype/grouping
            # and dense-machinery gates allow it
            want_joint = use_joint or (
                self.sweep_strategy == "auto"
                and joint_auto_candidate(
                    rank, bool(config.fit_linear), self.dtype,
                    config.group_index,
                )
            )
            row_strategy = (
                "auto"
                if self.sweep_strategy in ("joint", "colored")
                else self.sweep_strategy
            )
            plan = get_or_build(
                "row_gibbs", fp,
                (self.dtype.str, row_strategy,
                 self.max_unrolled_colors, want_joint, rank),
                lambda: compile_design(
                    X,
                    X_rel,
                    grouping=np.asarray(
                        config.group_index, dtype=np.int32
                    ),
                    dtype=self.dtype,
                    strategy=row_strategy,
                    max_unrolled_colors=self.max_unrolled_colors,
                    joint_dense=want_joint,
                    joint_rank=rank,
                ),
            )
            use_joint = use_joint or (
                want_joint and joint_auto_eligible(plan, rank,
                                                   self.dtype)
            )
        cfg = _gibbs_config(
            config, "joint" if use_joint else self.sweep_strategy
        )
        if cat_plan is not None:
            from .trainer import CategoricalGibbsTrainer

            trainer = CategoricalGibbsTrainer(
                cat_plan, y, cfg, rank, init_stdev, random_seed,
                self.dtype,
            )
        else:
            trainer = GibbsTrainer(
                plan, y, cfg, rank, init_stdev, random_seed, self.dtype
            )
        return trainer.run(config.n_iter, config.n_kept_samples, callback)

    def _train_core_sharded(
        self, rank, init_stdev, X, X_rel, y, random_seed, config,
        callback,
    ):
        """Multi-chip SPMD training (fit(..., n_devices=N) / mesh=...):
        rows shard over the ('data',) mesh; the sharded chain equals
        the single-chip chain sample-for-sample (tests/test_sharded)."""
        from .parallel.sharding import ShardedGibbsTrainer
        from .parallel.sharding_categorical import (
            ShardedCategoricalGibbsTrainer,
        )

        mesh = self._build_mesh()
        cfg = _gibbs_config(config, self.sweep_strategy)
        grouping = np.asarray(config.group_index, dtype=np.int32)
        trainer = None
        # same small-scale long-chain joint preference as the
        # single-chip core, so fit(..., n_devices=N) keeps resolving
        # to the same engine (single-chip ≡ sharded chain contract)
        prefer_joint_small = (
            self.sweep_strategy == "auto"
            and config.n_iter >= 200
            and X.shape[0] <= 500_000
            and _joint_candidate(self, rank, config)
        )
        if self.sweep_strategy in (
            "auto", "categorical"
        ) and not prefer_joint_small:
            try:
                trainer = ShardedCategoricalGibbsTrainer(
                    X, X_rel, y, cfg, rank, init_stdev, random_seed,
                    mesh=mesh, grouping=grouping, dtype=self.dtype,
                )
            except ValueError:
                if self.sweep_strategy == "categorical":
                    raise
        if trainer is None:
            from .design import joint_auto_candidate

            trainer = ShardedGibbsTrainer(
                X, X_rel, y, cfg, rank, init_stdev, random_seed,
                mesh=mesh, grouping=grouping, dtype=self.dtype,
                strategy=(
                    "auto" if self.sweep_strategy in (
                        "joint", "categorical", "colored"
                    ) else self.sweep_strategy
                ),
                max_unrolled_colors=self.max_unrolled_colors,
                # same auto -> joint upgrade (and the same gate
                # helper) as the single-chip core, so
                # fit(..., n_devices=N) keeps reproducing the
                # single-chip chain sample-for-sample
                joint_auto=(
                    self.sweep_strategy == "auto"
                    and joint_auto_candidate(
                        rank, bool(config.fit_linear), self.dtype,
                        config.group_index,
                    )
                ),
            )
        return trainer.run(
            config.n_iter, config.n_kept_samples, callback
        )

    def get_hyper_trace(self) -> pd.DataFrame:
        """Tidy per-iteration hyperparameter trace (gibbs.py:109-142)."""
        if (self.n_groups_ is None) or (self.history_ is None):
            raise RuntimeError("Sampler not run yet.")
        columns = (
            ["alpha"]
            + ["mu_w[{}]".format(g) for g in range(self.n_groups_)]
            + ["lambda_w[{}]".format(g) for g in range(self.n_groups_)]
            + [
                "mu_V[{},{}]".format(g, r)
                for g in range(self.n_groups_)
                for r in range(self.rank)
            ]
            + [
                "lambda_V[{},{}]".format(g, r)
                for g in range(self.n_groups_)
                for r in range(self.rank)
            ]
        )
        res = []
        for hyper in self.history_.hypers:
            row = np.zeros(len(columns), dtype=np.float64)
            row[0] = hyper.alpha
            cursor = 1
            for hp in [hyper.mu_w, hyper.lambda_w, hyper.mu_V,
                       hyper.lambda_V]:
                row[cursor : cursor + hp.size] = np.asarray(hp).ravel()
                cursor += hp.size
            res.append(row)
        df = pd.DataFrame(np.vstack(res))
        df.columns = columns
        return df


class MyFMGibbsRegressor(RegressorMixin, MyFMGibbsBase):
    r"""Bayesian FM regressor via collapsed Gibbs sampling."""

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
        callback: Optional[
            Callable[
                [int, FM, FMHyperParameters, LearningHistory],
                Tuple[bool, Optional[str]],
            ]
        ] = None,
        config_builder: Optional[ConfigBuilder] = None,
    ) -> "MyFMGibbsRegressor":
        r"""Run Gibbs sampling (see the reference docstring,
        gibbs.py:166-202, for parameter semantics)."""
        self._fit(
            X, y, X_rel=X_rel, X_test=X_test, X_rel_test=X_rel_test,
            y_test=y_test, n_iter=n_iter, n_kept_samples=n_kept_samples,
            grouping=grouping, callback=callback, group_shapes=group_shapes,
            config_builder=config_builder,
        )
        return self

    def predict(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
        n_workers: Optional[int] = None,
    ) -> np.ndarray:
        """Posterior-predictive mean over the kept samples."""
        return self._predict_core(X, X_rel, n_workers=n_workers)


class MyFMGibbsClassifier(ClassifierMixin, MyFMGibbsBase):
    r"""Bayesian FM binary classifier (probit data augmentation)."""

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
        callback: Optional[
            Callable[
                [int, FM, FMHyperParameters, LearningHistory],
                Tuple[bool, Optional[str]],
            ]
        ] = None,
        config_builder: Optional[ConfigBuilder] = None,
    ) -> "MyFMGibbsClassifier":
        self._fit(
            X, y, X_rel=X_rel, X_test=X_test, X_rel_test=X_rel_test,
            y_test=y_test, n_iter=n_iter, n_kept_samples=n_kept_samples,
            grouping=grouping, callback=callback, group_shapes=group_shapes,
            config_builder=config_builder,
        )
        return self

    def predict(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
        n_workers: Optional[int] = None,
    ) -> np.ndarray:
        """Class prediction at threshold 0.5."""
        return self.predict_proba(X, X_rel, n_workers=n_workers) > 0.5

    def predict_proba(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
        n_workers: Optional[int] = None,
    ) -> np.ndarray:
        """P(y=1 | x): posterior mean of per-sample probit probabilities."""
        return self._predict_core(X, X_rel, n_workers=n_workers)


class MyFMOrderedProbit(MyFMGibbsBase):
    """Bayesian FM for ordinal regression (cumulative probit link)."""

    @property
    def _task_type(self) -> str:
        return TASK_ORDERED

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
        callback: Optional[
            Callable[
                [int, FM, FMHyperParameters, LearningHistory],
                Tuple[bool, Optional[str]],
            ]
        ] = None,
        callback_default_freq: int = 5,
        cutpoint_groups: Optional[
            List[Tuple[int, List[int]]]
        ] = None,
    ) -> "MyFMOrderedProbit":
        """Fit the ordinal-probit FM.

        ``cutpoint_groups`` optionally partitions the rows into
        independent cutpoint samplers, each entry ``(n_class,
        row_indices)`` — e.g. two ordinal scales sharing one FM.  The
        C++ engine supports this (FMLearningConfig.hpp:15) though the
        reference's Python layer always uses the single default group
        over all rows (reference gibbs.py:429-432)."""
        config_builder = ConfigBuilder()
        y = np.asarray(y)
        if cutpoint_groups is None:
            n_class = int(y.max()) + 1
            # the default: one cutpoint group over all rows
            # (reference gibbs.py:429-432)
            cutpoint_groups = [(n_class, list(range(y.shape[0])))]
        config_builder.set_cutpoint_groups(cutpoint_groups)
        self.n_cutpoint_groups = len(cutpoint_groups)
        self._fit(
            X, y, X_rel=X_rel, X_test=X_test, y_test=y_test,
            X_rel_test=X_rel_test, n_iter=n_iter,
            n_kept_samples=n_kept_samples, grouping=grouping,
            callback=callback, group_shapes=group_shapes,
            config_builder=config_builder,
            callback_default_freq=callback_default_freq,
        )
        return self

    def _process_y(self, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y)
        assert y.min() >= 0
        return y.astype(np.float64)

    def _prepare_prediction_for_test(self, fm, X, X_rel):
        return fm.oprobit_predict_proba(
            sps.csr_matrix(X, dtype=REAL), X_rel, 0
        )

    def _measure_score(self, prediction, y) -> Dict[str, float]:
        from collections import OrderedDict

        result: Dict[str, float] = OrderedDict()
        result["accuracy"] = float(
            (np.argmax(prediction, axis=1) == y).mean()
        )
        result["log_loss"] = float(
            -np.log(
                prediction[
                    np.arange(prediction.shape[0]), y.astype(np.int64)
                ]
                + 1e-15
            ).mean()
        )
        return result

    def _status_report(self, fm, hyper) -> str:
        log_str = "w0 = {:.2f}, ".format(fm.w0)
        if len(fm.cutpoints) == 1:
            log_str += "cutpoint = {} ".format(
                ["{:.3f}".format(c) for c in list(fm.cutpoints[0])]
            )
        return log_str

    def predict_proba(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
        n_workers: Optional[int] = None,
        cutpoint_index: int = 0,
    ) -> np.ndarray:
        """Per-class probabilities averaged over kept samples [N, K].

        ``cutpoint_index`` selects the cutpoint group whose scale the
        probabilities are computed on (0, the reference default)."""
        predictor = self._fetch_predictor()
        shape = check_data_consistency(X, X_rel)
        if X is None:
            X = sps.csr_matrix((shape, 0), dtype=REAL)
        else:
            X = sps.csr_matrix(X)
        return predictor.predict_parallel_oprobit(
            X, X_rel, n_workers or 1, cutpoint_index
        )

    def predict(
        self,
        X: Optional[ArrayLike],
        X_rel: List[RelationBlock] = [],
        cutpoint_index: int = 0,
    ) -> np.ndarray:
        """argmax class prediction (on cutpoint group
        ``cutpoint_index``'s scale)."""
        return self.predict_proba(
            X, X_rel=X_rel, cutpoint_index=cutpoint_index
        ).argmax(axis=1)

    @property
    def cutpoint_samples(self) -> Optional[np.ndarray]:
        """Samples for the first cutpoint group; ``None`` before fit.
        Use :meth:`get_cutpoint_samples` for other groups."""
        return self.get_cutpoint_samples(0)

    def get_cutpoint_samples(
        self, cutpoint_index: int = 0
    ) -> Optional[np.ndarray]:
        """Samples for cutpoint group ``cutpoint_index``
        ([sample, n_class−1]); ``None`` before fit."""
        if self.predictor_ is None:
            return None
        return np.asarray(
            [
                fm.cutpoints[cutpoint_index]
                for fm in self.predictor_.samples
            ]
        )

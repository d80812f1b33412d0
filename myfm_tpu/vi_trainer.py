"""Variational training loop (reference variational.hpp:192-217)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

import jax

from .containers import (
    VariationalFM,
    VariationalFMHyperParameters,
    VariationalLearningHistory,
)
from .design import DesignPlan
from .ops.variational import (
    VariationalConfig,
    VIState,
    vi_init_state,
    vi_sweep,
    vi_update_e_and_var,
)
from .predictor import VariationalPredictor


def _fetch_vfm(state: VIState) -> VariationalFM:
    return VariationalFM(
        w0=float(state.w0),
        w=np.asarray(state.w),
        V=np.asarray(state.V),
        w0_var=float(state.w0_var),
        w_var=np.asarray(state.w_var),
        V_var=np.asarray(state.V_var),
    )


def _fetch_hyper(state: VIState) -> VariationalFMHyperParameters:
    return VariationalFMHyperParameters(
        alpha=float(state.alpha),
        alpha_rate=float(state.alpha_rate),
        mu_w=np.asarray(state.mu_w),
        mu_w_var=np.asarray(state.mu_w_var),
        lambda_w=np.asarray(state.lambda_w),
        lambda_w_rate=np.asarray(state.lambda_w_rate),
        mu_V=np.asarray(state.mu_V),
        mu_V_var=np.asarray(state.mu_V_var),
        lambda_V=np.asarray(state.lambda_V),
        lambda_V_rate=np.asarray(state.lambda_V_rate),
    )


class VariationalTrainer:
    def __init__(
        self,
        plan: DesignPlan,
        y: np.ndarray,
        cfg: VariationalConfig,
        rank: int,
        init_stdev: float,
        random_seed: int,
        dtype=np.float32,
    ):
        self.plan = plan
        self.cfg = cfg
        self.rank = rank
        self.init_stdev = init_stdev
        self.random_seed = random_seed
        self.dtype = np.dtype(dtype)
        self.y = jax.numpy.asarray(np.asarray(y).astype(self.dtype))
        self._sweep = jax.jit(
            vi_sweep, static_argnums=(3,), donate_argnums=(1,)
        )

    def _initialize(self) -> VIState:
        key = jax.random.PRNGKey(self.random_seed)
        state = vi_init_state(
            self.plan, self.rank, self.init_stdev,
            jax.random.fold_in(key, 0), self.cfg, self.dtype,
        )

        @jax.jit
        def init_e(state, y):
            # reference initialize_e (variational.hpp:234-241):
            # full mean/variance forward, then e -= y for all tasks.
            e, e_var_sum = vi_update_e_and_var(
                self.plan, state.w0, state.w0_var, state.w, state.w_var,
                state.V, state.V_var,
            )
            return e - y, e_var_sum

        e, e_var_sum = init_e(state, self.y)
        return dataclasses.replace(state, e=e, e_var_sum=e_var_sum)

    def run(
        self,
        n_iter: int,
        callback: Optional[Callable] = None,
    ) -> Tuple[VariationalPredictor, VariationalLearningHistory]:
        state = self._initialize()
        history = VariationalLearningHistory(hypers=None, elbos=[])
        for it in range(n_iter):
            state = self._sweep(self.plan, state, self.y, self.cfg)
            history.elbos.append(float(state.elbo))
            if callback is not None:
                should_stop = callback(
                    it, _fetch_vfm(state), _fetch_hyper(state), history
                )
                if should_stop:
                    break
        history.hypers = _fetch_hyper(state)
        predictor = VariationalPredictor(
            self.rank, self.plan.n_features, self.cfg.task, self.dtype
        )
        predictor.samples.append(_fetch_vfm(state))
        return predictor, history

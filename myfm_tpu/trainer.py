"""Training loop driving the jitted Gibbs sweep.

Equivalent of the reference's ``learn_with_callback``
(/root/reference/include/myfm/FMTrainer.hpp:56-87): runs ``n_iter``
sweeps, keeps the last ``n_kept_samples`` weight samples, records the
hyperparameter trace every iteration, invokes the (Python) callback with
early-stop support.

The sweep itself is a single jitted, buffer-donating XLA program; the
Python loop only dispatches it and harvests small host copies.  Weight
samples are staged to host memory as they are kept so the device never
holds the chain (the reference similarly copies FMs into process RAM).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .containers import FM, FMHyperParameters, LearningHistory
from .design import DesignPlan
from .ops import oprobit as oprobit_ops
from .ops.forward import predict_score
from .ops.gibbs import (
    TASK_ORDERED,
    GibbsConfig,
    GibbsState,
    gibbs_sweep,
    init_state,
)
from .predictor import Predictor


class LazyFMView(FM):
    """FM view over device state; fetches arrays to host only on access.

    ``cut_groups`` (static per-group class counts) splits the
    concatenated cutpoint state vector back into the per-group list the
    FM container exposes (reference FM::cutpoints is one vector per
    cutpoint group, FM.hpp:137-162)."""

    def __init__(self, state: GibbsState, cut_groups=()):
        self._state = state
        self._cut_groups = cut_groups
        self._w0 = None
        self._w = None
        self._V = None
        self._cutpoints = None

    @property
    def w0(self):  # type: ignore[override]
        if self._w0 is None:
            self._w0 = float(self._state.w0)
        return self._w0

    @property
    def w(self):  # type: ignore[override]
        if self._w is None:
            self._w = np.asarray(self._state.w)
        return self._w

    @property
    def V(self):  # type: ignore[override]
        if self._V is None:
            self._V = np.asarray(self._state.V)
        return self._V

    @property
    def cutpoints(self):  # type: ignore[override]
        if self._cutpoints is None:
            if self._state.cutpoints is None:
                self._cutpoints = []
            else:
                cat = np.asarray(self._state.cutpoints)
                groups = self._cut_groups or (cat.shape[0] + 1,)
                out, off = [], 0
                for K in groups:
                    out.append(cat[off : off + K - 1])
                    off += K - 1
                self._cutpoints = out
        return self._cutpoints

    def materialize(self) -> FM:
        return FM(self.w0, self.w, self.V, self.cutpoints)


def _fetch_hyper(state: GibbsState) -> FMHyperParameters:
    return FMHyperParameters(
        alpha=float(state.alpha),
        mu_w=np.asarray(state.mu_w),
        lambda_w=np.asarray(state.lambda_w),
        mu_V=np.asarray(state.mu_V),
        lambda_V=np.asarray(state.lambda_V),
    )


def run_mcmc_loop(
    trainer,
    n_iter: int,
    n_kept_samples: int,
    callback=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    core_of=lambda s: s,
) -> Tuple[Predictor, LearningHistory]:
    """Shared MCMC driver (reference learn_with_callback,
    FMTrainer.hpp:56-87): runs the chain, keeps the last
    ``n_kept_samples`` weight samples, records the hyper trace, invokes
    the callback with early-stop, and checkpoints every N sweeps.

    ``trainer`` provides ``_initialize(key)``, ``_sweep_call(state,
    key)``, and the ``rank / n_features / cfg / dtype / random_seed``
    attributes; ``core_of`` maps the trainer's state to its GibbsState
    (identity for the row-space trainers, ``.core`` for the
    categorical fast path)."""
    import os

    from .checkpoint import load_checkpoint, save_checkpoint

    master = jax.random.PRNGKey(trainer.random_seed)
    state = trainer._initialize(jax.random.fold_in(master, 0))
    start_it = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state, start_it = load_checkpoint(checkpoint_path, state)

    predictor = Predictor(
        trainer.rank, trainer.n_features, trainer.cfg.task,
        trainer.dtype,
    )
    history = LearningHistory(engine=getattr(trainer, "engine_name", ""))
    for it in range(start_it, n_iter):
        key = jax.random.fold_in(master, 1 + it)
        state = trainer._sweep_call(state, key)
        core = core_of(state)
        view = LazyFMView(core, trainer.cfg.cutpoint_group_classes)
        if it + n_kept_samples >= n_iter:
            predictor.samples.append(view.materialize())
        history.hypers.append(_fetch_hyper(core))
        if trainer.cfg.task == TASK_ORDERED:
            # cumulative accept count per cutpoint-group sampler
            # (reference FMTrainer.hpp:83-85)
            history.n_mh_accept_trace.append(
                [int(c) for c in np.atleast_1d(
                    np.asarray(core.n_mh_accept)
                )]
            )
        if callback is not None:
            if callback(it, view, history.hypers[-1], history):
                break
        if (
            checkpoint_path
            and checkpoint_every
            and (it + 1) % checkpoint_every == 0
        ):
            save_checkpoint(checkpoint_path, state, it + 1)

    final = core_of(state)
    if trainer.cfg.task == TASK_ORDERED and final.n_mh_accept is not None:
        history.n_mh_accept = [
            int(c)
            for c in np.atleast_1d(np.asarray(final.n_mh_accept))
        ]
    return predictor, history


def _resolve_joint_pallas_tail(
    cfg: GibbsConfig, dtype, plan=None, rank=None
) -> GibbsConfig:
    """Resolve/validate the joint_pallas_tail choice.

    ``True`` (the compiled kernel) requires the TPU backend and
    float32 — Mosaic has no f64 — and is rejected up front with a
    clear error otherwise; ``"interpret"`` runs the kernel in
    interpret mode on any backend (CPU tests; unrolls the grid).
    ``None`` (auto) self-validates the Mosaic lowering once per
    process on the live TPU backend (compiled kernel vs interpret
    mode on a small deterministic problem —
    ops/pallas_joint_tail.hw_self_check) and enables the kernel only
    if it matches; anything else falls back to the lax.scan tail.
    When ``plan``/``rank`` are given, validation runs at the plan's
    actual tail dims (every distinct (D, Pf, B) of its dense stacks)
    instead of the generic stand-in problem."""
    import dataclasses

    if not cfg.joint_rows:
        return cfg
    if cfg.joint_pallas_tail is None:
        use = False
        if np.dtype(dtype) == np.float32:
            from .ops.pallas_joint_tail import hw_self_check

            dims_list = [None]
            if plan is not None and rank is not None:
                dims_list = sorted(
                    {
                        (
                            rank + 2,
                            int(b.dense_stack.feat.shape[-1]),
                            int(b.dense_stack.xw.shape[-1]),
                        )
                        for b in plan.blocks
                        if b.dense_stack is not None
                    }
                ) or []
            # the tail kernel inlines an O(D³) unrolled Cholesky per
            # color — beyond D = 34 (rank 32) the Mosaic compile
            # balloons, and the lax.scan tail with the batched-linalg
            # solver is the sane engine anyway
            use = bool(dims_list) and all(
                d is None or d[0] <= 34 for d in dims_list
            ) and all(hw_self_check(dims=d) for d in dims_list)
        return dataclasses.replace(cfg, joint_pallas_tail=use)
    if cfg.joint_pallas_tail is True:
        if jax.default_backend() != "tpu":
            raise ValueError(
                "joint_pallas_tail=True compiles a Mosaic TPU kernel "
                f"but the active backend is {jax.default_backend()!r};"
                " use joint_pallas_tail='interpret' off-TPU."
            )
        if np.dtype(dtype) != np.float32:
            raise ValueError(
                "joint_pallas_tail=True requires float32 (Mosaic has "
                f"no {np.dtype(dtype).name}); use the lax.scan path "
                "(joint_pallas_tail=False) for f64."
            )
    return cfg


def _resolve_gram_fast_matmul(cfg, dtype, rank=None):
    """Resolve gram_fast_matmul=None (auto) for float32 on the real
    TPU backend, after per-mode on-device self-checks
    (ops/pallas_gram.gram_fast_selfcheck):

    - Gibbs at rank >= 64 (``rank`` given): the single-pass "bf16"
      matmul — at D >= 66 the Gram spans multiple systolic tiles and
      the 3-pass split mode IS the measured sweep floor (rank-128
      flagship: 1.05 sweeps/s at the split bound); bf16's ~4e-3
      relative error sits orders below the draw noise per entity.
    - otherwise the 3-pass bf16-split (~1.5e-5 relative) — also the
      resolution for the deterministic VI paths (``rank=None``), whose
      fixpoint would absorb a bf16 bias directly.

    f64 runs and CPU tests are never switched off HIGHEST."""
    import dataclasses

    if cfg.gram_fast_matmul is not None:
        return cfg
    use = False
    if (
        np.dtype(dtype) == np.float32
        and jax.default_backend() == "tpu"
    ):
        from .ops.pallas_gram import gram_fast_selfcheck

        if rank is not None and rank >= 64 and gram_fast_selfcheck(
            "bf16"
        ):
            use = "bf16"
        else:
            use = gram_fast_selfcheck("split")
    return dataclasses.replace(cfg, gram_fast_matmul=use)


class GibbsTrainer:
    def __init__(
        self,
        plan: DesignPlan,
        y: np.ndarray,
        cfg: GibbsConfig,
        rank: int,
        init_stdev: float,
        random_seed: int,
        dtype=np.float32,
    ):
        self.plan = plan
        cfg = _resolve_joint_pallas_tail(cfg, dtype, plan, rank)
        self.cfg = cfg
        self.rank = rank
        self.init_stdev = init_stdev
        self.random_seed = random_seed
        self.dtype = np.dtype(dtype)
        if cfg.task == TASK_ORDERED:
            # latent class labels stay integer; residuals use z
            self.y_int = jnp.asarray(np.asarray(y, dtype=np.int32))
            self.y = jnp.asarray(np.asarray(y).astype(self.dtype))
        else:
            self.y = jnp.asarray(np.asarray(y).astype(self.dtype))
            self.y_int = None
        self._sweep = jax.jit(
            gibbs_sweep, static_argnums=(4,), donate_argnums=(1,)
        )

    @property
    def n_features(self) -> int:
        return self.plan.n_features

    @property
    def engine_name(self) -> str:
        return "joint" if self.cfg.joint_rows else "colored"

    def _sweep_call(self, state, key):
        y_arg = self.y_int if self.cfg.task == TASK_ORDERED else self.y
        return self._sweep(self.plan, state, y_arg, key, self.cfg)

    def _initialize(self, key) -> GibbsState:
        k_init, k_e = jax.random.split(key)
        state = init_state(
            self.plan, self.rank, self.init_stdev, k_init, self.cfg,
            self.dtype,
        )

        if self.cfg.task == TASK_ORDERED:
            state = oprobit_ops.initialize_oprobit_state(
                self.plan, state, self.y_int, self.cfg, k_e
            )
        else:

            @jax.jit
            def init_e(state, y):
                score = predict_score(
                    self.plan, state.w0, state.w, state.V
                )
                # reference initialize_e (FMTrainer.hpp:99-119):
                # e = score - y for regression and ±1 classification.
                return score - y

            e = init_e(state, self.y)
            state = GibbsState(
                w0=state.w0, w=state.w, V=state.V, e=e,
                alpha=state.alpha, mu_w=state.mu_w,
                lambda_w=state.lambda_w, mu_V=state.mu_V,
                lambda_V=state.lambda_V,
            )
        return state

    def run(
        self,
        n_iter: int,
        n_kept_samples: int,
        callback: Optional[
            Callable[[int, FM, FMHyperParameters, LearningHistory], bool]
        ] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        resume: bool = False,
    ) -> Tuple[Predictor, LearningHistory]:
        """Run the chain.  With ``checkpoint_path`` + ``checkpoint_every``
        the full chain state is dumped every N sweeps; ``resume=True``
        continues from the checkpoint and reproduces the exact chain an
        uninterrupted run would have produced (keys are derived from
        (seed, iteration), so no RNG state needs saving)."""
        return run_mcmc_loop(
            self, n_iter, n_kept_samples, callback, checkpoint_path,
            checkpoint_every, resume,
        )


class CategoricalGibbsTrainer:
    """Gibbs trainer on the entity-space fast path (all tables
    categorical; see ops/categorical.py).  Same run() contract as
    GibbsTrainer."""

    def __init__(
        self,
        plan,  # CategoricalPlan
        y: np.ndarray,
        cfg: GibbsConfig,
        rank: int,
        init_stdev: float,
        random_seed: int,
        dtype=np.float32,
    ):
        import jax as _jax

        from .ops.categorical import (
            categorical_sweep,
            init_categorical_state,
            make_y_tiles,
        )

        self.plan = plan
        cfg = _resolve_joint_pallas_tail(cfg, dtype)
        cfg = _resolve_gram_fast_matmul(cfg, dtype, rank)
        self.cfg = cfg
        self.rank = rank
        self.init_stdev = init_stdev
        self.random_seed = random_seed
        self.dtype = np.dtype(dtype)
        if cfg.task == TASK_ORDERED:
            self.y_int = jnp.asarray(np.asarray(y, dtype=np.int32))
            self.y = jnp.asarray(np.asarray(y).astype(self.dtype))
        else:
            self.y = jnp.asarray(np.asarray(y).astype(self.dtype))
            self.y_int = None
        # per-table tile-order copies of y (regression target path)
        self.y_tiles = make_y_tiles(plan, self.y)
        # Pallas TPU kernels require interpret mode off-TPU (tests run
        # on the forced-CPU backend)
        self._interpret = _jax.default_backend() != "tpu"
        self._init_fn = init_categorical_state
        self._sweep = jax.jit(
            categorical_sweep, static_argnums=(5, 6), donate_argnums=(1,)
        )

    @property
    def n_features(self) -> int:
        return self.plan.n_features

    @property
    def engine_name(self) -> str:
        return "fastpath"

    def _sweep_call(self, state, key):
        y_arg = self.y_int if self.cfg.task == TASK_ORDERED else self.y
        return self._sweep(
            self.plan, state, y_arg, self.y_tiles, key, self.cfg,
            self._interpret,
        )

    def _initialize(self, key):
        k_init, k_e = jax.random.split(key)
        core = init_state(
            self.plan, self.rank, self.init_stdev, k_init, self.cfg,
            self.dtype,
        )
        y_arg = self.y_int if self.cfg.task == TASK_ORDERED else self.y
        return self._init_fn(self.plan, core, y_arg, k_e, self.cfg)

    def run(
        self,
        n_iter: int,
        n_kept_samples: int,
        callback: Optional[
            Callable[[int, FM, FMHyperParameters, LearningHistory], bool]
        ] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        resume: bool = False,
    ) -> Tuple[Predictor, LearningHistory]:
        return run_mcmc_loop(
            self, n_iter, n_kept_samples, callback, checkpoint_path,
            checkpoint_every, resume, core_of=lambda s: s.core,
        )
